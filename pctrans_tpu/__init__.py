"""pctrans_tpu — a TPU-native reimplementation of the PCTrans framework.

PCTrans ("Position-Guided Transformer with Query Contrast for Biological
Instance Segmentation", ICCVW 2023) is a query-based instance segmenter for
2D biological images (CVPPP leaves, BBBC039 nuclei).  The reference
implementation (qic999/PCTrans) is a PyTorch + CUDA/C++ framework; this
package is a from-scratch JAX / XLA / Pallas rebuild designed for TPUs:

* the compute path is pure-functional flax modules compiled with ``jax.jit``
  over a ``jax.sharding.Mesh`` (data parallelism subsumes the reference's
  DP/DDP; collectives ride ICI);
* all shapes are static: ground-truth instances are padded to
  ``MAX_INSTANCES`` with validity masks, and Hungarian matching runs *inside*
  jit (no per-step host syncs, unlike the reference's 10 CPU
  ``linear_sum_assignment`` calls per train step);
* multi-scale deformable attention is a vectorized JAX gather with an
  optional Pallas TPU kernel;
* evaluation metrics (SBD, |DiC|, AJI, PQ, F1) are vectorized
  contingency-table computations instead of the reference's O(n_in*n_gt*H*W)
  Cython loops.

Layout (mirrors the reference's layer map, SURVEY.md section 1):
  config/     YACS-compatible config tree (reference YAMLs drop in)
  data/       CVPPP / BBBC datasets, augmentations, synthetic fixtures
  models/     backbone, pixel decoder, position-guided transformer decoder
  ops/        point sampling, LAP solver, ms-deform-attn (JAX + Pallas)
  losses/     Hungarian matcher + SetCriterion (masks/refpoints/contrast/...)
  engine/     Trainer, solver (optax), checkpointing (orbax)
  inference/  instance postprocessing + metrics
  parallel/   mesh construction and sharding helpers
"""

__version__ = "0.1.0"
