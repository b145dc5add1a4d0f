"""Parallelism layer: device meshes, sharded index placement, collective search.

The reference's scaling story is "add vLLM/API workers behind HTTP" (stated, not
implemented — SURVEY.md §2.6). Here scaling is first-class SPMD: the corpus axis of every
index structure shards over a ``jax.sharding.Mesh``, per-shard top-k rides ICI through
``all_gather``, and a static merge selects global winners. One program, N chips.
"""

from .mesh import corpus_mesh, multislice_mesh, single_device_mesh
from .engine import ShardedEngine

__all__ = ["corpus_mesh", "multislice_mesh", "single_device_mesh", "ShardedEngine"]
