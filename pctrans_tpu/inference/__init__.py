"""Inference: instance postprocessing (dice clustering, mask NMS, EM
watershed/multicut zoo), sliding-window volumetric inference, and the
metric suites (SBD, AJI/PQ, rand/VOI, 3D AP, CREMI cleft scores)."""
