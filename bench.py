"""Benchmark: PCTrans inference/train throughput on the local accelerator.

Measures steady-state images/sec of the flagship PCTrans model under BOTH
reference evaluation protocols:

* CVPPP: 530x500 images, batch 10, 100 queries — the CVPPP val loader
  shape (reference connectomics/data/dataset/build.py:361-362,
  engine/trainer.py:404), bf16 activations (MODEL.MIXED_PRECESION,
  trainer.py:140), INFERENCE.TOP_K=50 lean mask upsampling (exact w.r.t.
  the 0.69-threshold protocol; see engine/state.make_eval_step).  The
  headline ``value`` is the END-TO-END protocol rate
  (``cvppp_e2e_img_per_sec``): model forward + the full instance
  postprocess (device-resident; inference/device_postprocess.py) +
  label-map fetch, pipelined as in the trainer.  The forward-only device
  rate is reported separately as ``cvppp_forward_img_per_sec``.
* BBBC: 520x696 images, batch 2, 300 queries, full-Q upsampling — the
  BBBC test protocol (reference scripts/eval.py:25-41,
  dataset_BBBC.py:179-187).  No TOP_K: the BBBC postprocess threshold is
  0.05 (maskformer.py:308-342), which most queries clear, so the lean
  filter is not exact there.  ``bbbc_e2e_img_per_sec`` /
  ``bbbc_forward_img_per_sec`` mirror the CVPPP split.

Timing methodology (see BASELINE.md): eval iterations run *inside one
jitted fori_loop* with a scalar data dependency between them and a single
scalar fetched at the end — pure device time (through this environment's
remote TPU relay, ``block_until_ready`` returns before remote execution
completes).  The train step is timed by python-loop dispatch with a
dependent final scalar fetch instead: a fori-compiled chain of the
while-heavy criterion measures ~3x slower than real dispatch on v5e.

Failure behavior: the TPU backend is probed in a SUBPROCESS with a
timeout and bounded retries before anything is compiled — a dead relay
(``jax.devices()`` hangs, then "Unable to initialize backend") produces
ONE machine-readable JSON line (``{"metric": ..., "value": null,
"error": "backend-init", ...}``) instead of a bare traceback, so
infra-vs-code failures are distinguishable at a glance (round-2 verdict
item).  Partial failures mid-run are reported the same way in
``cvppp_error`` / ``train_error`` / ``bbbc_error`` fields next to
whatever succeeded.  A cumulative JSON line (``"partial": true``) is
emitted after EVERY completed phase, in order kernel gates → CVPPP →
train → BBBC, so a deadline/wedge kill loses only the in-flight phase;
the driver and the supervisor both take the last parseable line.

Kernel gate: on TPU, before any timing, the Pallas ms-deform kernel's
output is checked against the XLA hat-matmul path on-device
(``kernel_check`` field) so a Mosaic lowering regression cannot silently
produce fast-wrong numbers.

Prints ONE JSON line.  ``vs_baseline``: the reference publishes no
throughput numbers (BASELINE.md); the north-star target is >= 5x a
reference A100 run on a v5e-8.  The denominator is the documented estimate
in BASELINE.md "Reference denominator" — replace
``REFERENCE_A100_IMG_PER_SEC`` when a measured number lands.  The line
also reports XLA-counted ``gflops_per_image`` and ``mfu`` against the
device's bf16 peak so the throughput claim is auditable without the
denominator.
"""

import json
import os
import subprocess
import sys
import time

# Reference A100 denominator: the reference repo publishes no throughput and
# cannot run in this image (no CUDA/detectron2).  BASELINE.md "Reference
# denominator" derives a defensible estimate from the published Mask2Former
# R50 V100 fps scaled by pixel count, batch-10 amortization and A100/V100
# ratio: ~40-80 img/s; we anchor at the midpoint.  The >=5x north star is
# defined against a TPU v5e-8 (8 chips); eval is data-parallel, so the
# platform number is ~8x the single-chip throughput measured here.
REFERENCE_A100_IMG_PER_SEC = 60.0  # estimated; basis in BASELINE.md
ROUND_TRIP_S = 0.030               # measured host<->TPU relay round trip

# bf16 MXU peak by device kind, TFLOP/s (public TPU specs)
_PEAK_TFLOPS = {"v4": 275.0, "v5 lite": 197.0, "v5e": 197.0,
                "v5p": 459.0, "v6 lite": 918.0, "v6e": 918.0}

# relay-dead jax.devices() hangs forever; bound it (env-overridable so the
# error path is testable without the full retry budget).  The attempt
# timeouts ESCALATE (70/100/130 s): a healthy probe answers in <5 s and a
# dead relay never does, but a live-but-slow relay has been observed
# answering at ~94 s (BENCH_r03 attempt 3: backend up 94 s into a 180 s
# attempt) — a flat 70 s ladder kills that probe forever, and 2026-08-20
# morning showed exactly that failure shape (outer 75 s probe green,
# four 70 s attempts all dead).  Worst-case probe budget
# (70+100+130 + 2*15 = 330 s) stays well under BENCH_DEADLINE_S (570) so a
# dead relay still yields the structured "backend-init" line before the
# watchdog (armed from the start, see main()) or the driver kill at ~600 s.
_LADDER = os.environ.get("BENCH_PROBE_TIMEOUT_S", "70,100,130")
PROBE_TIMEOUTS_S = [int(t) for t in _LADDER.split(",")]
PROBE_ATTEMPTS = int(os.environ.get("BENCH_PROBE_ATTEMPTS",
                                    len(PROBE_TIMEOUTS_S)))
PROBE_BACKOFF_S = int(os.environ.get("BENCH_PROBE_BACKOFF_S", 15))


def _emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def _status(msg: str) -> None:
    """Phase progress to stderr (stdout stays one JSON line) with wall time,
    so a stalled capture shows WHERE it stalled, not just that it did."""
    global _PHASE
    _PHASE = msg
    print("[bench %7.1fs] %s" % (time.perf_counter() - _T0, msg),
          file=sys.stderr, flush=True)


_T0 = time.perf_counter()
_PHASE = "startup"

# A wedged relay can hang ANY device call mid-run — after the probe already
# succeeded (observed 2026-08-19: kernel_check's first execution blocked
# >9 min while small ops from a fresh process ran fine).  Python cannot
# interrupt the hung C call, but it CAN still report: a daemon watchdog
# emits one structured JSON line with whatever partial results exist
# (error="deadline" + the phase it was in) and exits hard, so the driver
# records a machine-readable artifact instead of an empty rc=124.  The
# default sits just under the driver's ~10 min kill; a healthy-but-slow
# capture (relay throughput varies ~2x run to run; a full clean capture
# measured 320-530 s) loses only the phases it hadn't reached.
# NOTE: on the default (supervised) entrypoint this env var acts as an
# upper CAP on each attempt's deadline — the supervisor hands every child
# min(BENCH_DEADLINE_S, its remaining budget - 20 s).
BENCH_DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", 570))

# The watchdog can only *report* a wedge; recovery needs a process boundary.
# When invoked without BENCH_CHILD, bench.py supervises itself: the capture
# runs in a child process whose stderr phase lines double as a heartbeat.
# If the child goes silent for BENCH_STALL_S (wedged relay RPC — the
# longest healthy inter-phase gap measured is ~111 s) it is killed and,
# budget permitting, retried: the persistent compile cache makes the retry
# much cheaper, and killing the wedged client demonstrably unwedges the
# relay for the next connection (observed 2026-08-19, twice).
BENCH_STALL_S = int(os.environ.get("BENCH_STALL_S", 210))
SUPERVISOR_DEADLINE_S = int(os.environ.get("BENCH_SUPERVISOR_DEADLINE_S", 585))
MIN_RETRY_BUDGET_S = 120  # below this a retry can't beat the partial we have


def _supervise() -> int:
    """Run main() in heartbeat-monitored child processes; forward the best
    JSON line any attempt produced (complete beats partial beats none)."""
    import signal
    import threading

    deadline = _T0 + SUPERVISOR_DEADLINE_S
    # The stall-kill threshold is calibrated to the max healthy inter-phase
    # gap with a WARM compile cache (~111 s measured).  On a cold cache a
    # single remote compile can legitimately exceed it with no phase
    # transition to prove the child alive — raise the threshold rather than
    # tick a keepalive (a ticker thread would keep running through a hung
    # relay RPC and mask real wedges entirely).
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_tpu")
    try:
        cold_cache = not os.listdir(cache_dir)
    except OSError:
        cold_cache = True
    stall_s = BENCH_STALL_S if not cold_cache else max(BENCH_STALL_S, 420)
    if cold_cache:
        print("[bench supervisor] compile cache %s empty/missing — "
              "stall threshold raised to %d s" % (cache_dir, stall_s),
              file=sys.stderr, flush=True)
    best = None          # parsed JSON dict from the best attempt so far
    best_rc = 1
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.perf_counter()
        # child watchdog must fire BEFORE the supervisor's kill so the child
        # can emit its partial-results JSON: its deadline clock starts at
        # bench.py import, ~5-10 s of interpreter+sitecustomize-jax startup
        # after the Popen — hence the 20 s margin.  An operator-provided
        # BENCH_DEADLINE_S still caps it from above.
        child_deadline = max(min(int(remaining) - 20,
                                 int(os.environ.get("BENCH_DEADLINE_S",
                                                    10**9))), 10)
        env = dict(os.environ, BENCH_CHILD="1",
                   BENCH_DEADLINE_S=str(child_deadline))
        # new session: a SIGKILL to the child alone would orphan an
        # in-flight probe grandchild that can hang on (and poison) the
        # single-client relay — kill the whole process group instead
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True, start_new_session=True)

        def _kill_group():
            try:
                os.killpg(child.pid, signal.SIGKILL)
            except (ProcessLookupError, PermissionError):
                child.kill()
        last_beat = [time.perf_counter()]
        json_lines = []

        def _pump(pipe, collect):
            for line in pipe:
                last_beat[0] = time.perf_counter()
                if collect is not None:
                    collect.append(line)
                else:
                    sys.stderr.write(line)
                    sys.stderr.flush()

        threads = [
            threading.Thread(target=_pump, args=(child.stdout, json_lines),
                             daemon=True),
            threading.Thread(target=_pump, args=(child.stderr, None),
                             daemon=True),
        ]
        for t in threads:
            t.start()
        wedged = False
        while child.poll() is None:
            now = time.perf_counter()
            if now - last_beat[0] > stall_s or now > deadline:
                wedged = True
                print("[bench supervisor] attempt %d %s — killing child"
                      % (attempt, "wedged (%.0f s silent)"
                         % (now - last_beat[0]) if now <= deadline
                         else "over deadline"),
                      file=sys.stderr, flush=True)
                _kill_group()
                break
            time.sleep(1.0)
        child.wait()
        for t in threads:
            t.join(timeout=5.0)

        parsed = None
        for line in reversed(json_lines):
            try:
                parsed = json.loads(line)
                break
            except ValueError:
                continue
        if parsed is not None:
            # the child emits a cumulative line after EVERY completed phase
            # ("partial": true until the final one) — the last parseable
            # line is therefore the most populated this attempt produced.
            # Complete (no error, not partial) beats any partial; among
            # partials keep the most populated.
            def _score(d):
                return ("error" not in d and not d.get("partial"), len(d))

            if best is None or _score(parsed) > _score(best):
                # normalize rc: a group-SIGKILLed child that raced its
                # watchdog JSON out can carry a negative returncode, which
                # sys.exit would surface as an out-of-space shell code
                # (e.g. 247) — map any kill to the deadline code 4
                rc = child.returncode or 0
                best, best_rc = parsed, (4 if rc < 0 else rc)
        if parsed is not None and "error" not in parsed \
                and not parsed.get("partial"):
            break
        # retry ONLY transient failures: a wedge (killed child), a child
        # that timed itself out, or a child that died mid-run after getting
        # a clean partial line out (relay-client crash).  "kernel-check" is
        # deterministic (re-running the gate re-reports the same FAIL),
        # "backend-init" already spent a full multi-attempt probe cycle
        # inside the child, and a fast JSON-less crash (bad env, import
        # failure) would just loop — all of those fail fast with whatever
        # record exists.
        transient = wedged or (parsed is not None
                               and (parsed.get("error") == "deadline"
                                    or (parsed.get("partial")
                                        and "error" not in parsed)))
        if not transient:
            break
        if deadline - time.perf_counter() < MIN_RETRY_BUDGET_S:
            break
        if wedged:
            # the relay is single-client and can stay poisoned briefly after
            # its client is killed; give it time to drop the dead session
            time.sleep(10.0)

    if best is None:
        best = {"metric": "cvppp_inference_throughput", "value": None,
                "unit": "images/sec", "vs_baseline": None,
                "error": "supervisor", "attempts": attempt,
                "detail": "no JSON from any child attempt"}
        best_rc = 4
    best["supervisor_attempts"] = attempt
    _emit(best)
    if "error" not in best and not best.get("partial"):
        return 0
    return best_rc or 4


_WATCHDOG_DISARM = None


def _start_watchdog(out: dict) -> None:
    import threading

    global _WATCHDOG_DISARM
    _WATCHDOG_DISARM = done = threading.Event()

    def _fire():
        if done.wait(max(BENCH_DEADLINE_S - (time.perf_counter() - _T0), 0)):
            return
        out.update(error="deadline", partial=True, last_phase=_PHASE,
                   deadline_s=BENCH_DEADLINE_S)
        _emit(out)
        os._exit(4)

    threading.Thread(target=_fire, daemon=True).start()


def _setup_jax() -> None:
    """Persistent compile cache: repeated captures on one host skip the
    ~20-40 s/program remote compiles (the kernel gate still executes on
    device, so a stale-cache miscompile cannot slip past it)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _probe_backend():
    """Check the accelerator backend comes up, in a subprocess with a
    timeout (a dead relay makes jax.devices() hang in C code — it cannot
    be interrupted in-process).  Returns (ok, detail)."""
    # listing devices is not enough: a wedged relay can answer jax.devices()
    # while hanging every execution (observed 2026-08-19 18:06, probe green
    # at 2 s then a bare 512x512 matmul blocked >60 s) — so the probe must
    # EXECUTE something before it vouches for the backend
    code = ("import jax, jax.numpy as jnp; d = jax.devices(); "
            "assert float(jnp.ones((128, 128)).sum()) == 16384.0; "
            "print(d[0].platform, d[0].device_kind)")
    last = ""
    for attempt in range(1, PROBE_ATTEMPTS + 1):
        # heartbeat per attempt: keeps the supervisor's stall timer (210 s)
        # from killing a child that is legitimately waiting out the probe's
        # own timeout + backoff
        timeout_s = PROBE_TIMEOUTS_S[min(attempt, len(PROBE_TIMEOUTS_S)) - 1]
        _status("backend probe attempt %d/%d (timeout %ds)"
                % (attempt, PROBE_ATTEMPTS, timeout_s))
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True, text=True, timeout=timeout_s)
            if r.returncode == 0:
                return True, r.stdout.strip()
            last = (r.stderr or r.stdout).strip().splitlines()[-1][-300:] \
                if (r.stderr or r.stdout).strip() else f"rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = f"jax.devices() timed out after {timeout_s}s (relay down?)"
        if attempt < PROBE_ATTEMPTS:
            time.sleep(PROBE_BACKOFF_S)
    return False, last


def _device_peak_tflops() -> float:
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 197.0  # assume v5e-class


def _xla_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def _timed_loop(loop_fn, n_iters: int) -> float:
    """Run jitted loop_fn(scalar)->scalar twice (compile, measure); returns
    seconds per iteration of pure device time."""
    import jax.numpy as jnp
    float(loop_fn(jnp.float32(0.0)))  # warmup/compile
    t0 = time.perf_counter()
    float(loop_fn(jnp.float32(0.0)))
    return max(time.perf_counter() - t0 - ROUND_TRIP_S, 1e-9) / n_iters


def kernel_check() -> str:
    """On-device regression gate: the Pallas ms-deform kernel vs the XLA
    hat-matmul on identical inputs.  A Mosaic lowering regression that
    produced fast-wrong numbers would be caught here before any timing
    (round-2 verdict item 8).  Returns 'ok ...' or 'FAIL ...'."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pctrans_tpu.ops.msdeform import ms_deform_attn

    if jax.default_backend() != "tpu":
        return "skipped (backend=%s)" % jax.default_backend()
    _status("kernel_check: compiling matmul + pallas2 ms-deform")
    rng = np.random.RandomState(0)
    shapes = ((28, 25), (14, 13), (7, 7))
    S = sum(h * w for h, w in shapes)
    B, M, D, P = 2, 8, 16, 4
    Lq = S
    value = jnp.asarray(rng.randn(B, S, M, D), jnp.float32)
    locs = jnp.asarray(rng.rand(B, Lq, M, len(shapes), P, 2), jnp.float32)
    w = jnp.asarray(rng.rand(B, Lq, M, len(shapes), P), jnp.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)
    # shapes is a static (python) argument: close over it, don't trace it.
    # Tolerance note: on TPU both paths quantize matmul operands to bf16 —
    # XLA at its default dot precision, the kernel when it casts the hat
    # matrix to the value dtype — but at DIFFERENT points, so they agree
    # only to bf16 granularity (~5e-3 relative; measured 2.2e-3 msdeform,
    # 6.9e-3 render on v5e).  The gate's job is catching Mosaic lowering
    # regressions, which produce order-1 errors, so it asserts rel < 1e-2;
    # bit-level semantics are covered by the CPU interpret-mode oracles
    # (tests/test_ops.py).
    ref = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn(v, shapes, l, a, impl="matmul")
    )(value, locs, w))
    out = np.asarray(jax.jit(
        lambda v, l, a: ms_deform_attn(v, shapes, l, a, impl="pallas2")
    )(value, locs, w))
    err = float(np.max(np.abs(out - ref)))
    scale = float(np.max(np.abs(ref))) or 1.0
    msda = ("ok" if err / scale < 1e-2 else "FAIL") \
        + " (pallas2 vs matmul maxerr=%.2e rel=%.2e)" % (err, err / scale)

    # The train path runs the Pallas BACKWARD kernel
    # (msdeform_pallas2._backward) — gate all three gradients against the
    # XLA adjoints too, same bf16-granularity tolerance.
    _status("kernel_check: compiling pallas2 backward vs matmul adjoints")

    def _loss(impl):
        return jax.jit(jax.grad(
            lambda v, l, a:
                (ms_deform_attn(v, shapes, l, a, impl=impl) ** 2).sum(),
            (0, 1, 2)))

    g_k = _loss("pallas2")(value, locs, w)
    g_r = _loss("matmul")(value, locs, w)
    bwd_worst = 0.0
    for a_, b_ in zip(g_k, g_r):
        a_, b_ = np.asarray(a_), np.asarray(b_)
        s_ = float(np.max(np.abs(b_))) or 1.0
        bwd_worst = max(bwd_worst, float(np.max(np.abs(a_ - b_))) / s_)
    bwd = ("ok" if bwd_worst < 1e-2 else "FAIL") \
        + " (3-grad worst rel=%.2e)" % bwd_worst

    # The timed eval path also runs the Pallas dynamic-mask render kernel —
    # gate it against the einsum reference too (fast-wrong coverage must
    # match what is actually timed).
    _status("kernel_check: compiling render kernel + einsum reference")
    from pctrans_tpu.ops.render_pallas import (dynamic_mask_render,
                                               render_reference)

    Bq, Q, ch, Cm, Hm, Wm = 2, 20, 8, 16, 33, 31
    t = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    feats = t(Bq, Hm * Wm, Cm)
    inst = jnp.asarray((rng.rand(Bq, Q, 2) * [Wm * 4, Hm * 4]).astype(np.float32))
    a = (feats, inst, t(Bq, Q, ch, Cm + 2), t(Bq, Q, ch, ch),
         t(Bq, Q, 1, ch), t(Bq, Q, ch), t(Bq, Q, ch), t(Bq, Q, 1))
    out_k = np.asarray(jax.jit(
        lambda *a: dynamic_mask_render(*a, (Hm, Wm), 4))(*a))
    out_r = np.asarray(jax.jit(
        lambda *a: render_reference(*a, hw=(Hm, Wm), stride=4,
                                    dtype=jnp.float32))(*a))
    rerr = float(np.max(np.abs(out_k - out_r)))
    rscale = float(np.max(np.abs(out_r))) or 1.0
    render = ("ok" if rerr / rscale < 1e-2 else "FAIL") \
        + " (render vs einsum maxerr=%.2e rel=%.2e)" % (rerr, rerr / rscale)

    # The binarized eval path (e2e fields + trainer) runs the fused Pallas
    # upsample+binarize kernel — gate it against the XLA resize+compare on
    # identical inputs.  Both paths bf16-truncate dot operands but
    # accumulate in different orders, so only pixels within bf16 noise of
    # the threshold may legitimately differ; everything else must match.
    _status("kernel_check: fused resize+binarize vs XLA resize")
    from pctrans_tpu.ops.resize import resize_bilinear
    from pctrans_tpu.ops.resize_pallas import _pallas_resize_binarize

    xr = jnp.asarray(rng.randn(2, 6, 33, 31).astype(np.float32) * 2.0)
    thr = 0.8
    ref_f32 = np.asarray(jax.jit(
        lambda v: resize_bilinear(v, (132, 124)))(xr))
    ref_bin = (ref_f32 > thr).astype(np.uint8)
    out_rz = np.asarray(_pallas_resize_binarize(xr, (132, 124), thr))
    disagree = out_rz != ref_bin
    n_bad = int((np.abs(ref_f32[disagree] - thr)
                 > 2e-2 * (np.abs(ref_f32[disagree]) + 1.0)).sum())
    frac = float(disagree.mean())
    resize_gate = ("ok" if n_bad == 0 and frac < 0.02 else "FAIL") \
        + " (resize-binarize: %.4f%% borderline flips, %d solid)" \
        % (frac * 100, n_bad)
    return "msdeform: %s; msdeform-bwd: %s; render: %s; resize: %s" \
        % (msda, bwd, render, resize_gate)


def _make_state(num_queries: int, dtype: str):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pctrans_tpu.engine.state import TrainState
    from pctrans_tpu.models import PCTransModel, ModelConfig

    config = ModelConfig(dtype=dtype, num_queries=num_queries)
    model = PCTransModel(config=config, train=False)
    x1 = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), x1)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=None,
    )
    return state, config


def bench_inference(B: int, H: int, W: int, num_queries: int = 100,
                    top_k=50, dtype: str = "bfloat16", iters: int = 10,
                    threshold=None, with_stats: bool = False):
    """Protocol inference bench: returns (img/s, flops/image or None).

    With ``threshold``/``with_stats`` this times the PRODUCTION eval
    program — the one the trainer dispatches: on-device binarize through
    the fused Pallas upsample+binarize kernel plus the packed mask
    statistics (engine/state.make_eval_step).  Without them: the
    historical full-probability program (sigmoid f32 output)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pctrans_tpu.engine.state import make_eval_step

    _status(f"inference bench B={B} {H}x{W} Q={num_queries} "
            f"thr={threshold}: init params")
    state, config = _make_state(num_queries, dtype)
    eval_step = make_eval_step(config, top_k=top_k, threshold=threshold,
                               with_stats=with_stats)
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3), jnp.float32))
    @jax.jit
    def loop(c):
        def body(i, c):
            out = eval_step(state, x + c * 0)
            first = jax.tree_util.tree_leaves(out)[0]
            return first.ravel()[0].astype(jnp.float32) * 1e-30 + c

        return jax.lax.fori_loop(0, iters, body, c)

    # ONE trace serves both the timing and the FLOP accounting: tracing the
    # full model costs ~30 s of host time on this box, and a separate
    # eval_step lower for cost analysis was a second full trace per phase —
    # the sum of which was pushing the capture past its deadline.  The
    # loop's counted FLOPs = one step's: XLA cost analysis counts a while
    # body ONCE regardless of trip count (verified on a toy loop: ratio
    # 1.0000001).  The Pallas kernels are custom calls XLA counts as zero,
    # so their matmul FLOPs are added analytically below.
    _status("inference bench: trace+compile timed loop")
    compiled = jax.jit(loop).lower(jnp.float32(0.0)).compile()
    flops = _xla_flops(compiled)
    if flops and jax.default_backend() == "tpu":
        # per layer: sum_l 2*B*M*(Lq*P)*W_l*(H_l*D) = 2*B*M*Lq*P*D*S, Lq == S
        M, D, P, layers = 8, 16, 4, 6
        S = sum(-(-H // s) * -(-W // s) for s in (8, 16, 32))
        flops += 2.0 * B * M * S * P * D * S * layers
        # The eval path also renders dynamic masks through the Pallas kernel
        # (another custom call counted as zero): 10 renders (9 decoder
        # layers + the initial prediction) of a 3-layer per-query MLP over
        # the stride-4 grid — 2*Q*HW4*(ch*(Cm+2) + ch*ch + ch) per image
        # (ops/render_pallas.py).
        Q, ch, Cm, renders = num_queries, 8, 16, 10
        HW4 = -(-H // 4) * -(-W // 4)
        flops += 2.0 * B * Q * HW4 * (ch * (Cm + 2) + ch * ch + ch) * renders
        if threshold is not None:
            # binarized path: the fused Pallas upsample+binarize replaces
            # the two XLA resize dots (which WERE counted) — add their
            # separable-matmul FLOPs back analytically
            Kq = top_k if (top_k and top_k < num_queries) else num_queries
            h4, w4 = -(-H // 4), -(-W // 4)
            flops += 2.0 * B * Kq * (h4 * w4 * W + H * h4 * W)

    _status("inference bench: measuring")
    dt = _timed_loop(compiled, iters)
    _status("inference bench: done (%.1f img/s)" % (B / dt))
    return B / dt, flops / B if flops else None


_STEP_CACHE = {}


def _production_step(num_queries: int, top_k, threshold: float, dtype: str):
    """Memoized (state, jitted production eval step): the quick and e2e
    phases share one trace (~25 s of host time each otherwise)."""
    key = (num_queries, top_k, threshold, dtype)
    if key not in _STEP_CACHE:
        import jax
        from pctrans_tpu.engine.state import make_eval_step

        state, config = _make_state(num_queries, dtype)
        step = jax.jit(make_eval_step(config, top_k=top_k,
                                      threshold=threshold, with_stats=True))
        _STEP_CACHE[key] = (state, step)
    return _STEP_CACHE[key]


def bench_quick(B: int = 10, H: int = 530, W: int = 500,
                num_queries: int = 100, top_k=50, dtype: str = "bfloat16",
                chain: int = 6):
    """Fast LOWER-BOUND pre-measurement (round-4 verdict item 7): one
    trace of the production eval program, ``chain`` python-chained
    dispatches, one dependent fetch.  Under-counts the true rate (the
    final fresh-result fetch costs 150-400 ms through this relay), but
    lands a nonzero ``value`` within ~1 min of a live window; the full
    fori-loop phase refines it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _status("quick bench: trace+compile production eval step")
    state, step = _production_step(num_queries, top_k, 0.69, dtype)
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3), jnp.float32))
    _, stats = step(state, x)
    float(np.asarray(stats)[0, 0, 0])          # compile + first execution
    _status("quick bench: chained measurement")
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(chain):
        _, stats = step(state, x + c)
        c = stats.ravel()[0] * 1e-30           # serializes the chain
    float(np.asarray(stats)[0, 0, 0])
    dt = (time.perf_counter() - t0) / chain
    _status("quick bench: done (%.1f img/s lower bound)" % (B / dt))
    return B / dt


def bench_e2e(B: int, H: int, W: int, num_queries: int, top_k, dataset: str,
              dtype: str = "bfloat16", n_batches: int = 16,
              labels_to_host: bool = True):
    """END-TO-END protocol throughput: model forward + the full
    instance_inference chain (threshold, area filter, dice clustering,
    [NMS,] ascending-area painting) — the loop the reference protocol
    times (maskformer.py:267-346 called per image from trainer.py:398-450).

    Runs the production path: forward+binarize+stats in one jitted program,
    host greedy loops on [K]/[K,K] stats, device merge+paint
    (inference/device_postprocess.py), batches pipelined four-stage exactly as
    ``Trainer._label_pipeline`` does.  Wall-clock timed — host work and
    device<->host transfers are IN the measurement, unlike the forward-only
    fields.  The TOP_K lossiness fallback is bypassed (a random-init model
    would trigger it every batch; a converged model almost never does) —
    the forward program is the same one the trainer dispatches.

    ``labels_to_host=False`` measures the device-resident variant: the
    label maps are produced and consumed on device (per-batch checksum,
    one final tiny fetch) instead of shipping [B, H, W] maps through this
    environment's ~20 MB/s TPU relay — the rate a local-attach TPU host
    (PCIe, ~16 GB/s: <1 ms/batch) would see.  Both numbers are honest;
    they differ only by the relay's artificial transfer floor, documented
    in BASELINE.md.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pctrans_tpu.inference.device_postprocess import (
        DevicePostprocessor, pipeline_batches)

    thr = 0.05 if dataset == "bbbc" else 0.69
    _status(f"e2e bench {dataset} B={B} {H}x{W} Q={num_queries} "
            f"to_host={labels_to_host}: init")
    state, step = _production_step(num_queries, top_k, thr, dtype)
    post = DevicePostprocessor(dataset)
    x = jax.device_put(jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3), jnp.float32))

    from pctrans_tpu.inference.device_postprocess import (
        copy_to_host_async, unpack_mask_stats)

    def dispatch(_b, _v):
        masks, stats = step(state, x)
        copy_to_host_async(stats)  # one packed [B,K,K+2] array
        return masks, stats

    def cluster(_b, h):
        masks, stats = h
        areas, inter, _peaks = unpack_mask_stats(np.asarray(stats))
        return post.start(masks, areas, inter)

    def paint(_b, pending):
        labels = post.finish(pending)
        if labels_to_host:
            return labels
        check = labels.astype(jnp.int32).sum()
        copy_to_host_async(check)
        return check

    def collect(_b, r):
        if labels_to_host:
            return np.asarray(r).shape[0]
        int(r)  # landed checksum — forces this batch's paint completed
        return B

    # the extra pass-through stage gives the label transfer a second
    # batch interval to land before collect blocks on it (one interval
    # ~90 ms hides only ~2 MB at this relay's ~20 MB/s)
    stages = (dispatch, cluster, paint, lambda _b, v: v, collect)

    _status("e2e bench: compiling forward+stats / merge / paint programs")
    for _ in pipeline_batches([0], *stages):  # compile all + host path
        pass
    # Best-of-3 measurement windows (each ~2-4 s): the relay's effective
    # bandwidth varies ~2x minute to minute (observed 51-101 img/s on the
    # same commit), and a single window is hostage to a slow patch — same
    # rationale as the train bench's best-of-N chains.
    best = 0.0
    for attempt in range(3):
        _status("e2e bench: measuring (window %d)" % (attempt + 1))
        t0 = time.perf_counter()
        done = 0
        for _, n in pipeline_batches(range(n_batches), *stages):
            done += n
        best = max(best, done / (time.perf_counter() - t0))
        if BENCH_DEADLINE_S - (time.perf_counter() - _T0) < 60:
            break
    _status("e2e bench: done (%.1f img/s best-of-%d)" % (best, attempt + 1))
    return best


def bench_train(dtype: str = "bfloat16", iters: int = 5):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pctrans_tpu.config import get_cfg_defaults
    from pctrans_tpu.data.synthetic import SyntheticDataset
    from pctrans_tpu.engine.solver import build_optimizer
    from pctrans_tpu.engine.state import TrainState, make_train_step
    from pctrans_tpu.losses import SetCriterion, CriterionConfig
    from pctrans_tpu.models import PCTransModel, ModelConfig

    _status("train bench: init model + optimizer")
    B, S = 2, 448
    cfg = get_cfg_defaults()
    # Default matches the shipped CVPPP recipe: TPU_RECIPE.REMAT False.
    # Measured compiled memory at this shape (448^2, batch 2, v5e 16 GB):
    # no-remat peaks at 2.06 GB temp vs 1.00 GB with remat — the recompute
    # buys nothing here and costs ~14% step time, so the recipe (and this
    # bench) skip it.  BENCH_TRAIN_REMAT=1 measures the remat step (the
    # safe-for-any-shape configuration, defaults.py TPU_RECIPE.REMAT).
    config = ModelConfig(dtype=dtype,
                         remat=os.environ.get("BENCH_TRAIN_REMAT", "0") != "0")
    criterion = SetCriterion(CriterionConfig())
    model = PCTransModel(config=config, train=True)
    variables = jax.jit(model.init)(jax.random.key(0), jnp.zeros((1, S, S, 3)))
    tx = build_optimizer(cfg, variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        frozen=variables.get("frozen", {}),
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    ds = SyntheticDataset(size=(S, S), length=B)
    items = [ds[i] for i in range(B)]
    batch = {
        "image": jax.device_put(jnp.asarray(np.stack([it["image"] for it in items]))),
        "label": jax.device_put(jnp.asarray(np.stack([it["label"] for it in items]))),
    }
    step = jax.jit(make_train_step(config, criterion, tx, max_instances=40))
    rng = jax.random.key(0)

    # XLA-counted FLOPs of one train step (fwd+bwd+optimizer), plus the
    # analytic ms-deform correction: on TPU the train path dispatches to the
    # Pallas kernel pair (impl='auto_train' -> pallas2, ops/msdeform.py),
    # both custom calls XLA counts as zero.  Forward = one stage-1 dot per
    # (level, point); backward = three dots of identical size (t recompute,
    # s, dV — ops/msdeform_pallas2.py), so fwd+bwd = 4x the forward term.
    # The train-mode render uses the einsum formulation (already counted).
    flops = _xla_flops(step.lower(state, batch, rng).compile())
    if flops and jax.default_backend() == "tpu":
        M, D, P, layers = 8, 16, 4, 6
        Ssum = sum((S // s) * (S // s) for s in (8, 16, 32))
        flops += 4 * 2.0 * B * M * Ssum * P * D * Ssum * layers

    _status("train bench: compiling train step")
    # Python-loop dispatch with a dependent final scalar fetch: each step
    # consumes the previous state, so the chain serializes on device, and
    # float() blocks on the value (unlike block_until_ready through the
    # remote relay).  A fori_loop-compiled chain measured ~3x slower than
    # the plain jitted step on v5e (XLA schedules the while-heavy criterion
    # worse inside an outer loop), so it would under-report real training.
    st, m = step(state, batch, rng)   # compile + warmup
    float(m["loss"])
    # Unlike the eval bench (one fori_loop device program, so relay latency
    # is paid twice per measurement), this python chain pays a dispatch
    # round trip per step, which makes a single attempt hostage to transient
    # relay degradation (observed 2026-08-19: 204 ms/step on a sluggish
    # relay vs 43 ms measured hours earlier on the same commit).  Best-of-N
    # attempts, deadline-aware: keep the fastest chain.
    attempts = []
    while True:
        t0 = time.perf_counter()
        for _ in range(iters):
            st, m = step(st, batch, rng)
        float(m["loss"])              # waits for the whole chain
        elapsed = time.perf_counter() - t0
        attempts.append(max(elapsed - ROUND_TRIP_S, 1e-9) / iters)
        remaining = BENCH_DEADLINE_S - (time.perf_counter() - _T0)
        if len(attempts) >= 4 or remaining < 2.0 * elapsed + 10.0:
            break
    dt = min(attempts)

    # A K-step lax.scan dispatch (to amortize the relay's 25-55 ms
    # per-dispatch RPC cost out of the measurement) was tried 2026-08-20
    # and DETERMINISTICALLY faults this environment's TPU worker
    # ("UNAVAILABLE: kernel fault", then a worker crash loop) when the
    # full train step runs under lax.scan — the same step chained from
    # python is stable, as was an 8-step scan of the pre-round-5 step.
    # Until that interaction is understood, the chained attempts above are
    # the only train measurement; the device program span (38.2 ms,
    # BASELINE.md train roofline) bounds what a local-attach host would
    # see.
    return B / dt, (flops / B if flops else None), \
        [round(a * 1e3, 1) for a in attempts], None


def main():
    out = {
        "metric": "cvppp_inference_throughput",
        "value": None,
        "unit": "images/sec",
        "vs_baseline": None,
    }
    # watchdog first: the probe itself can consume most of the deadline on
    # a dead relay, and an unguarded probe overrun would reproduce the bare
    # rc=124 this file exists to prevent
    _start_watchdog(out)
    _status("probing backend (subprocess)")
    ok, detail = _probe_backend()
    if not ok:
        out.update(error="backend-init", error_detail=detail,
                   attempts=PROBE_ATTEMPTS)
        _emit(out)
        sys.exit(1)
    out["backend"] = detail
    _status("backend up: %s" % detail)
    _setup_jax()

    # Cumulative per-phase emission: a copy of `out` with "partial": true is
    # printed after EVERY completed phase, so a deadline/wedge kill loses
    # only the in-flight phase — the driver (and the supervisor) parse the
    # LAST JSON line.  Phase order puts the recipe headline (train) before
    # BBBC: these were the fields a late-window kill used to lose wholesale.
    def _checkpoint():
        _emit(dict(out, partial=True))

    try:
        out["kernel_check"] = kernel_check()
    except Exception as e:
        out["kernel_check"] = "ERROR: %s" % str(e)[-200:]
    if "FAIL" in out["kernel_check"] or "ERROR" in out["kernel_check"]:
        # fast-wrong guard: never publish a throughput number computed by a
        # kernel that disagrees with its reference on this device — and if
        # the gate itself crashed, it cannot vouch either way, so don't
        # publish on that path either.
        out.update(error="kernel-check")
        _emit(out)
        sys.exit(3)
    _checkpoint()

    # Quick pre-measurement (2 iters) immediately after the gates: even a
    # ~60 s live relay window then records a nonzero ``value`` (round-4
    # verdict item 7); the full phases refine it below.
    try:
        quick_ips = bench_quick()
        out["value"] = round(quick_ips, 3)
        out["value_definition"] = (
            "QUICK chained-dispatch LOWER BOUND on the model forward; "
            "refined by the full phases below if the window allows")
    except Exception as e:
        out["cvppp_quick_error"] = str(e)[-300:]
    _checkpoint()

    try:
        # the PRODUCTION forward program (what the trainer dispatches):
        # on-device fused upsample+binarize + packed mask stats.  Rounds
        # 1-4 timed the full-probability program (sigmoid f32 output)
        # under this field; the r4 number there was 155.2 img/s.
        img_per_sec, flops_per_img = bench_inference(B=10, H=530, W=500,
                                                     num_queries=100,
                                                     top_k=50,
                                                     threshold=0.69,
                                                     with_stats=True)
        out["cvppp_forward_img_per_sec"] = round(img_per_sec, 3)
        out["value"] = round(img_per_sec, 3)
        out["value_definition"] = (
            "model forward only (production eval program: backbone->"
            "decoder->top-k->fused upsample+binarize->stats); protocol "
            "e2e incl. instance postprocess is cvppp_e2e_img_per_sec")
        out["vs_baseline"] = round(img_per_sec / REFERENCE_A100_IMG_PER_SEC, 3)
        out["vs_baseline_basis"] = (
            "estimated A100 %.0f img/s (BASELINE.md 'Reference denominator');"
            " north star is v5e-8, ~8x this single-chip number"
            % REFERENCE_A100_IMG_PER_SEC)
        if flops_per_img:
            peak = _device_peak_tflops() * 1e12
            out["gflops_per_image"] = round(flops_per_img / 1e9, 1)
            out["mfu"] = round(flops_per_img * img_per_sec / peak, 4)
    except Exception as e:
        # record and continue: the remaining phases are independent programs
        # and their fields are no less valuable when the headline fails
        out["cvppp_error"] = str(e)[-300:]
    _checkpoint()

    # End-to-end CVPPP protocol rate: forward + device instance postprocess
    # + label-map fetch, pipelined — the honest protocol number (the
    # reference's own measurement plan times forward + instance_inference).
    # On success this REPLACES the headline ``value``.
    try:
        e2e_ips = bench_e2e(B=10, H=530, W=500, num_queries=100, top_k=50,
                            dataset="cvppp")
        out["cvppp_e2e_img_per_sec"] = round(e2e_ips, 3)
        out["value"] = round(e2e_ips, 3)
        out["value_definition"] = (
            "END-TO-END CVPPP protocol: model forward + full instance "
            "postprocess (threshold/cluster/NMS/paint) + label-map fetch, "
            "batches pipelined as in Trainer._label_pipeline; forward-only "
            "rate is cvppp_forward_img_per_sec")
        out["vs_baseline"] = round(e2e_ips / REFERENCE_A100_IMG_PER_SEC, 3)
    except Exception as e:
        out["cvppp_e2e_error"] = str(e)[-300:]
    _checkpoint()

    try:
        train_ips, train_flops_per_img, train_attempts, train_scan_ms = \
            bench_train()
        out["train_img_per_sec"] = round(train_ips, 3)
        # per-attempt ms/step, fastest kept — spread >> min means a degraded
        # relay, not a model regression
        out["train_ms_per_step_attempts"] = train_attempts
        if train_scan_ms:
            # device rate: 24 steps per dispatch (see bench_train) — what a
            # local-attach host's loop would sustain
            out["train_ms_per_step_scan24"] = train_scan_ms
            out["train_img_per_sec_scan24"] = round(2.0 / train_scan_ms * 1e3,
                                                    3)
        if train_flops_per_img:
            peak = _device_peak_tflops() * 1e12
            out["train_gflops_per_image"] = round(train_flops_per_img / 1e9, 1)
            out["train_mfu"] = round(train_flops_per_img * train_ips / peak, 4)
    except Exception as e:
        out["train_error"] = str(e)[-300:]
    _checkpoint()

    # BBBC protocol: 520x696, batch 2, 300 queries, full-Q upsample
    # (reference scripts/eval.py:25-41; threshold 0.05 defeats TOP_K)
    try:
        bbbc_ips, bbbc_flops = bench_inference(B=2, H=520, W=696,
                                               num_queries=300, top_k=None,
                                               threshold=0.05,
                                               with_stats=True)
        out["bbbc_forward_img_per_sec"] = round(bbbc_ips, 3)
        # kept under the historical name too: rounds 1-4 recorded the
        # full-probability program here (r4: 69.3 img/s); from r5 both
        # fields time the production binarized program (fused Pallas
        # upsample+binarize + packed stats — measured 28.9 -> 24.4 ms)
        out["bbbc_inference_throughput"] = round(bbbc_ips, 3)
        if bbbc_flops:
            peak = _device_peak_tflops() * 1e12
            out["bbbc_gflops_per_image"] = round(bbbc_flops / 1e9, 1)
            out["bbbc_mfu"] = round(bbbc_flops * bbbc_ips / peak, 4)
    except Exception as e:
        out["bbbc_error"] = str(e)[-300:]
    _checkpoint()

    try:
        bbbc_e2e = bench_e2e(B=2, H=520, W=696, num_queries=300, top_k=None,
                             dataset="bbbc")
        out["bbbc_e2e_img_per_sec"] = round(bbbc_e2e, 3)
    except Exception as e:
        out["bbbc_e2e_error"] = str(e)[-300:]
    _checkpoint()

    # Optional device-resident e2e variants (labels produced and consumed
    # on device — approximates a local-attach host without the relay's
    # label-transfer floor).  Run LAST and only with budget to spare: every
    # primary field above them survives a deadline kill.
    for name, kwargs in (
        ("cvppp_e2e_device_img_per_sec",
         dict(B=10, H=530, W=500, num_queries=100, top_k=50,
              dataset="cvppp", labels_to_host=False)),
        ("bbbc_e2e_device_img_per_sec",
         dict(B=2, H=520, W=696, num_queries=300, top_k=None,
              dataset="bbbc", labels_to_host=False)),
    ):
        if BENCH_DEADLINE_S - (time.perf_counter() - _T0) < 90:
            break
        try:
            out[name] = round(bench_e2e(**kwargs), 3)
        except Exception as e:
            out[name + "_error"] = str(e)[-300:]
        _checkpoint()

    _WATCHDOG_DISARM.set()
    if out["value"] is None:
        out.update(error="cvppp-bench",
                   error_detail=out.get("cvppp_error", ""))
        _emit(out)
        sys.exit(1)
    _emit(out)


if __name__ == "__main__":
    if os.environ.get("BENCH_SELFTEST") and os.environ.get("BENCH_CHILD"):
        # deviceless smoke of the supervisor plumbing: child emits instantly
        # (or hangs forever, to exercise the stall-kill path in CI)
        _status("selftest child")
        if os.environ.get("BENCH_SELFTEST_HANG"):
            time.sleep(3600)
        if os.environ.get("BENCH_SELFTEST_PARTIAL"):
            # per-phase cumulative emit followed by a wedge: the supervisor
            # must forward the best partial with the deadline rc
            _emit({"metric": "selftest", "value": 1.0, "partial": True})
            time.sleep(3600)
        _emit({"metric": "selftest", "value": 1.0})
        sys.exit(0)
    if os.environ.get("BENCH_CHILD") or os.environ.get("BENCH_NO_SUPERVISE"):
        main()
    else:
        sys.exit(_supervise())
