"""Core array ops: sampling, assignment, deformable attention.

These are the TPU-native equivalents of the reference's native layer
(SURVEY.md section 2.1): the MSDeformAttn CUDA kernel becomes a vectorized
JAX gather (ops/msdeform.py) with an optional Pallas kernel
(ops/msdeform_pallas.py); the per-step CPU ``scipy.optimize.
linear_sum_assignment`` calls become an in-jit shortest-augmenting-path
solver (ops/lap.py); PointRend-style point sampling is ops/point_sample.py.
"""

from .point_sample import grid_sample_bilinear, point_sample, get_uncertain_point_coords
from .lap import linear_sum_assignment
from .msdeform import ms_deform_attn, ms_deform_attn_core
from .resize import resize_bilinear, resize_nearest_torch
