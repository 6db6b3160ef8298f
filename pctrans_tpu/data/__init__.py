"""Data pipelines: CVPPP / BBBC / cellpose / MoNuSeg loaders, volumetric
VolumeDataset / TileDataset, augmentations, target generation, IO."""
