"""Inference: instance postprocessing and evaluation metrics."""
