"""Loss stack: Hungarian matcher + SetCriterion (all in-jit, padded shapes)."""

from .matcher import point_matcher_indices
from .criterion import SetCriterion, CriterionConfig, build_criterion
