"""Data pipelines: CVPPP / BBBC loaders, augmentations, padded target prep."""
