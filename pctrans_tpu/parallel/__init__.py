"""Mesh construction and sharding helpers."""

from .mesh import create_mesh, shard_batch, replicate, batch_sharding, initialize_distributed
