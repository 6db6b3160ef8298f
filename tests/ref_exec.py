"""Execute reference code directly from /root/reference as parity oracles.

Round-3 verdict, "What's weak" #5: the parity tests re-implemented the
reference math in torch from *reading* the source — a misreading would
propagate to both sides.  This harness removes that gap for every
reference module importable with CPU torch: it stubs ONLY the third-party
glue the reference imports (detectron2 registries/wrappers, the two
point_rend samplers, fvcore weight init, imageio) and loads the
reference's own files unmodified, so tests compare against the actual
published logic, not a transcription.

The stubs are faithful where their semantics reach the compared numbers
(``point_sample``: the standard grid_sample wrapper; ``Conv2d``/
``get_norm``: conv -> norm -> activation; ``c2_xavier_fill``) and inert
where only import-time presence matters (registries, Instances, OOM
retry).  ``np.int`` (removed in numpy 1.24, used by the reference's
``mask_nms`` — an as-published landmine, SURVEY.md section 2.7) is aliased
to ``int`` so the original code runs.

Usage:
    from tests.ref_exec import load_ref
    mf = load_ref("connectomics.model.arch.maskformer")
    out = mf.mask_post(torch_masks, thres1=0.5, thres2=0.6, bd_flag=True)

The reference package tree has import-unsafe __init__ chains
(``connectomics.model`` pulls the whole legacy zoo incl. modules that
need torchvision); parents marked below load as namespace packages so
leaf modules import directly.  ``connectomics.model.loss`` /
``...model.utils`` execute their real (torch-only) __init__.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types

import numpy as np

REF = "/root/reference"

# packages whose real __init__ is import-unsafe in this image -> loaded as
# namespace packages (their leaf modules import fine individually)
_NAMESPACE_PKGS = (
    "connectomics.model",
    "connectomics.model.arch",
    "connectomics.model.maskformer_block",
    "connectomics.model.maskformer_block.transformer_decoder",
    "connectomics.model.maskformer_block.pixel_decoder",
    "connectomics.model.maskformer_block.meta_arch",
    "connectomics.engine",          # engine/__init__ hard-imports waterz
    "connectomics.engine.solver",
    "connectomics.data",            # data/__init__ imports pyc-only modules
    "connectomics.data.augmentation",
)

_installed = False


def _mk(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    parent, _, child = name.rpartition(".")
    if parent and parent in sys.modules:
        setattr(sys.modules[parent], child, mod)
    return mod


def _mk_if_missing(name: str):
    """Stub only modules this image genuinely lacks — shadowing a REAL
    installed module (e.g. imageio) would break unrelated tests that import
    it after this harness loads."""
    try:
        return importlib.import_module(name), False
    except ImportError:
        return _mk(name), True


def _install_stubs() -> None:
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    # --- numpy compat shims the as-published code needs ------------------
    if not hasattr(np, "int"):
        np.int = int  # mask_nms uses np.int (maskformer.py:361)
    if not hasattr(np, "bool"):
        np.bool = bool
    if not hasattr(np, "float"):
        np.float = float

    # --- detectron2 -------------------------------------------------------
    d2 = _mk("detectron2")
    cfg = _mk("detectron2.config")

    def configurable(init=None, *, from_config=None):
        # passthrough: reference modules are constructed with explicit
        # kwargs in these tests, never from a CfgNode
        if init is not None:
            return init
        return lambda f: f

    cfg.configurable = configurable

    layers = _mk("detectron2.layers")
    bn_mod = _mk("detectron2.layers.batch_norm")

    def get_norm(norm, out_channels):
        if norm is None or norm == "":
            return None
        if isinstance(norm, str):
            return {
                "BN": lambda c: nn.BatchNorm2d(c),
                "SyncBN": lambda c: nn.BatchNorm2d(c),
                "GN": lambda c: nn.GroupNorm(32, c),
                "LN": lambda c: nn.GroupNorm(1, c),
            }[norm](out_channels)
        return norm(out_channels)

    class Conv2d(nn.Conv2d):
        """d2's thin wrapper: conv -> norm -> activation."""

        def __init__(self, *args, **kwargs):
            norm = kwargs.pop("norm", None)
            activation = kwargs.pop("activation", None)
            super().__init__(*args, **kwargs)
            self.norm = norm
            self.activation = activation

        def forward(self, x):
            x = super().forward(x)
            if self.norm is not None:
                x = self.norm(x)
            if self.activation is not None:
                x = self.activation(x)
            return x

    class ShapeSpec:
        def __init__(self, channels=None, height=None, width=None,
                     stride=None):
            self.channels, self.height = channels, height
            self.width, self.stride = width, stride

    layers.Conv2d = Conv2d
    layers.ShapeSpec = ShapeSpec
    layers.get_norm = get_norm
    bn_mod.get_norm = get_norm

    utils = _mk("detectron2.utils")
    reg_mod = _mk("detectron2.utils.registry")

    class Registry:
        def __init__(self, name):
            self._name, self._map = name, {}

        def register(self, obj=None):
            if obj is None:
                return lambda o: self._map.setdefault(o.__name__, o) or o
            self._map[obj.__name__] = obj
            return obj

        def get(self, name):
            return self._map[name]

        __doc__ = ""

    reg_mod.Registry = Registry

    comm = _mk("detectron2.utils.comm")
    comm.get_world_size = lambda: 1

    memory = _mk("detectron2.utils.memory")

    def retry_if_cuda_oom(fn):
        return fn

    memory.retry_if_cuda_oom = retry_if_cuda_oom

    modeling = _mk("detectron2.modeling")
    modeling.META_ARCH_REGISTRY = Registry("META_ARCH")
    modeling.SEM_SEG_HEADS_REGISTRY = Registry("SEM_SEG_HEADS")

    def _unavailable(*a, **k):
        raise NotImplementedError("not available in the exec-stub harness")

    modeling.build_backbone = _unavailable
    modeling.build_sem_seg_head = _unavailable
    backbone_mod = _mk("detectron2.modeling.backbone")

    class Backbone(nn.Module):
        def output_shape(self):
            return {}

    backbone_mod.Backbone = Backbone
    modeling.Backbone = Backbone
    post_mod = _mk("detectron2.modeling.postprocessing")
    post_mod.sem_seg_postprocess = _unavailable

    structures = _mk("detectron2.structures")
    for name in ("Boxes", "ImageList", "Instances", "BitMasks"):
        setattr(structures, name, type(name, (), {}))

    projects = _mk("detectron2.projects")
    pr = _mk("detectron2.projects.point_rend")
    pf = _mk("detectron2.projects.point_rend.point_features")

    def point_sample(input, point_coords, **kwargs):
        # the standard point_rend sampler: [0,1]^2 coords -> grid_sample
        add_dim = False
        if point_coords.dim() == 3:
            add_dim = True
            point_coords = point_coords.unsqueeze(2)
        output = F.grid_sample(input, 2.0 * point_coords - 1.0, **kwargs)
        if add_dim:
            output = output.squeeze(3)
        return output

    def get_uncertain_point_coords_with_randomness(
        coarse_logits, uncertainty_func, num_points, oversample_ratio,
        importance_sample_ratio,
    ):
        # faithful point_rend implementation: oversample, keep the most
        # uncertain fraction, fill the rest uniformly
        num_boxes = coarse_logits.shape[0]
        num_sampled = int(num_points * oversample_ratio)
        point_coords = torch.rand(num_boxes, num_sampled, 2,
                                  device=coarse_logits.device)
        point_logits = point_sample(coarse_logits, point_coords,
                                    align_corners=False)
        point_uncertainties = uncertainty_func(point_logits)
        num_uncertain_points = int(importance_sample_ratio * num_points)
        num_random_points = num_points - num_uncertain_points
        idx = torch.topk(point_uncertainties[:, 0, :],
                         k=num_uncertain_points, dim=1)[1]
        shift = num_sampled * torch.arange(num_boxes, dtype=torch.long,
                                           device=coarse_logits.device)
        idx += shift[:, None]
        point_coords = point_coords.view(-1, 2)[idx.view(-1), :].view(
            num_boxes, num_uncertain_points, 2)
        if num_random_points > 0:
            point_coords = torch.cat(
                [point_coords,
                 torch.rand(num_boxes, num_random_points, 2,
                            device=coarse_logits.device)], dim=1)
        return point_coords

    pf.point_sample = point_sample
    pf.get_uncertain_point_coords_with_randomness = \
        get_uncertain_point_coords_with_randomness

    # --- fvcore -----------------------------------------------------------
    fv = _mk("fvcore")
    fvnn = _mk("fvcore.nn")
    wi = _mk("fvcore.nn.weight_init")

    def c2_xavier_fill(module):
        nn.init.kaiming_uniform_(module.weight, a=1)
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    def c2_msra_fill(module):
        nn.init.kaiming_normal_(module.weight, mode="fan_out",
                                nonlinearity="relu")
        if module.bias is not None:
            nn.init.constant_(module.bias, 0)

    wi.c2_xavier_fill = c2_xavier_fill
    wi.c2_msra_fill = c2_msra_fill
    fvnn.weight_init = wi

    def sigmoid_focal_loss_jit(inputs, targets, alpha=-1, gamma=2,
                               reduction="none"):
        # fvcore.nn.sigmoid_focal_loss (public reference semantics)
        p = torch.sigmoid(inputs)
        ce_loss = F.binary_cross_entropy_with_logits(inputs, targets,
                                                     reduction="none")
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce_loss * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            loss = loss.mean()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    fvnn.sigmoid_focal_loss_jit = sigmoid_focal_loss_jit
    fvnn.sigmoid_focal_loss = sigmoid_focal_loss_jit

    # --- torch compat: attention.py imports _LinearWithBias (removed in
    # torch >= 1.10); it was exactly nn.Linear with bias=True -------------
    import torch.nn.modules.linear as _linear_mod

    if not hasattr(_linear_mod, "_LinearWithBias"):
        _linear_mod._LinearWithBias = nn.Linear

    # attention.py imports the pre-1.5 private override helpers
    if "torch._overrides" not in sys.modules:
        sys.modules["torch._overrides"] = torch.overrides

    layers.DeformConv = type("DeformConv", (), {})  # imported, never run
    layers.ModulatedDeformConv = type("ModulatedDeformConv", (), {})

    # yacs (solver modules type-annotate against CfgNode)
    yacs = _mk("yacs")
    ycfg = _mk("yacs.config")
    ycfg.CfgNode = type("CfgNode", (dict,), {})

    # GPUtil (hard-imported by solver/trainer modules; never exercised —
    # an as-published landmine, SURVEY.md section 2.7)
    gputil = _mk("GPUtil")
    gputil.getGPUs = lambda: []

    # --- the compiled CUDA op module: stubbed to FAIL at call time, which
    # triggers the reference's own bare-except CPU fallback to its
    # ms_deform_attn_core_pytorch (ops/modules/ms_deform_attn.py:116-121) —
    # the fallback is reference code, not ours -----------------------------
    msda = _mk("MultiScaleDeformableAttention")

    def _no_cuda(*a, **k):
        raise RuntimeError("CUDA op not built in this image")

    msda.ms_deform_attn_forward = _no_cuda
    msda.ms_deform_attn_backward = _no_cuda

    # --- numexpr (missing; metrics_bbbc accelerates one boolean AND with
    # it) — a faithful mini-evaluate: numexpr resolves variables from the
    # CALLER's frame when no local_dict is given -------------------------
    ne = _mk("numexpr")

    def ne_evaluate(ex, local_dict=None, global_dict=None, **kw):
        frame = sys._getframe(1)
        ld = dict(frame.f_locals) if local_dict is None else dict(local_dict)
        gd = frame.f_globals if global_dict is None else global_dict
        return eval(ex, {"__builtins__": {}, "np": np, **gd}, ld)

    ne.evaluate = ne_evaluate

    # --- sklearn.metrics.f1_score (binary, the only sklearn use): real in
    # this image; provide the faithful fallback only when absent ----------
    sklm, created = _mk_if_missing("sklearn.metrics")
    if created:
        def f1_score(y_true, y_pred, **kw):
            yt = np.asarray(y_true).ravel().astype(bool)
            yp = np.asarray(y_pred).ravel().astype(bool)
            tp = float(np.count_nonzero(yt & yp))
            fp = float(np.count_nonzero(~yt & yp))
            fn = float(np.count_nonzero(yt & ~yp))
            denom = 2.0 * tp + fp + fn
            return 2.0 * tp / denom if denom else 0.0

        sklm.f1_score = f1_score

    # --- skimage (test_augmentor only calls transform.resize when
    # scale_factors != 1; keep it loud if reached) -------------------------
    ski = _mk("skimage")
    skit = _mk("skimage.transform")
    skit.resize = lambda *a, **k: (_ for _ in ()).throw(
        NotImplementedError("skimage.resize not stubbed"))
    skif = _mk("skimage.filters")

    def _gaussian(image, sigma=1, **kwargs):
        from scipy.ndimage import gaussian_filter

        return gaussian_filter(np.asarray(image, np.float64), sigma)

    skif.gaussian = _gaussian

    # skimage.morphology / measure: scipy-backed equivalents, enough for
    # the data-utils modules to import; the refexec tests only compare
    # code paths that stay in numpy (border semantics of grey morphology
    # differ subtly between skimage and scipy, so those paths are not
    # used as oracles)
    from scipy import ndimage as _ndi

    skmo = _mk("skimage.morphology")

    def _fp(image, footprint):
        if footprint is None:
            return _ndi.generate_binary_structure(np.asarray(image).ndim, 1)
        return np.asarray(footprint) > 0

    skmo.binary_dilation = lambda image, footprint=None, **k: \
        _ndi.binary_dilation(image, structure=_fp(image, footprint))
    skmo.binary_erosion = lambda image, footprint=None, **k: \
        _ndi.binary_erosion(image, structure=_fp(image, footprint),
                            border_value=1)
    skmo.dilation = lambda image, footprint=None, **k: \
        _ndi.grey_dilation(image, footprint=_fp(image, footprint))
    skmo.erosion = lambda image, footprint=None, **k: \
        _ndi.grey_erosion(image, footprint=_fp(image, footprint))

    def _disk(radius):
        y, x = np.mgrid[-radius:radius + 1, -radius:radius + 1]
        return (x * x + y * y <= radius * radius).astype(np.uint8)

    skmo.disk = _disk
    skmo.remove_small_holes = lambda ar, *a, **k: np.asarray(ar, bool)
    skme = _mk("skimage.measure")
    skme.label = lambda image, **k: _ndi.label(
        image, structure=np.ones((3,) * np.asarray(image).ndim))[0]

    # --- tqdm (imported inside agg_jc_index, never iterated here): real in
    # this image; passthrough only when absent ----------------------------
    tqdm_mod, created = _mk_if_missing("tqdm")
    if created:
        tqdm_mod.tqdm = lambda it, *a, **k: it
        tqdm_mod.tqdm_notebook = lambda it, *a, **k: it

    # --- torchvision (missing in this image; utils/misc.py imports it for
    # a single `_is_tracing()` ONNX guard) ---------------------------------
    tv = _mk("torchvision")
    tv._is_tracing = lambda: False

    # --- imageio: REAL in this image (do not shadow it — other tests use
    # it).  maskformer.py calls io.imsave live inside instance_inference
    # (an as-published landmine); tests that execute that path monkeypatch
    # imageio.imsave for their duration instead.  Stub only when absent.
    im, created = _mk_if_missing("imageio")
    if created:
        im.imsave = lambda *a, **k: None
        im.volsave = lambda *a, **k: None
        im.imread = _unavailable


def _install_namespace_pkgs() -> None:
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in _NAMESPACE_PKGS:
        if name in sys.modules:
            continue
        mod = _mk(name)
        mod.__path__ = [REF + "/" + name.replace(".", "/")]
        mod.__package__ = name


def install() -> None:
    global _installed
    if _installed:
        return
    _install_stubs()
    _install_namespace_pkgs()
    # connectomics.model.loss's real __init__ is torch-only and criterion
    # modules do `from connectomics.model.loss import discriminative_loss`
    importlib.import_module("connectomics.model.loss")
    _installed = True


def load_ref(name: str):
    """Import a reference module by dotted name with the stub environment."""
    install()
    return importlib.import_module(name)
