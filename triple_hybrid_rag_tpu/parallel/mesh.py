"""Mesh construction helpers.

Axis convention (BASELINE.json north star; SURVEY.md §2.6):

- ``"shard"`` — corpus axis: postings / embedding rows / chunk-entity rows partitioned
  across chips; collectives (all_gather of per-shard top-k) ride ICI within a slice.
- ``"data"`` — optional query-batch axis for serving throughput (outer product with
  ``"shard"`` on larger meshes).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def corpus_mesh(
    n_shards: Optional[int] = None,
    data_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh with a corpus ``shard`` axis (and optional ``data`` axis).

    Defaults to all visible devices on the shard axis — the v5e-8 layout from
    BASELINE.json (8-way corpus sharding, per-shard exact search, ICI merge).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_shards is None:
        n_shards = len(devices) // data_parallel
    need = n_shards * data_parallel
    if need > len(devices) or n_shards < 1 or data_parallel < 1:
        # n_shards floor-divides to 0 when data_parallel > device count, which
        # previously slipped past this guard into a degenerate Nx0 mesh
        raise ValueError(
            f"mesh {data_parallel}x{n_shards} needs {max(need, data_parallel)} "
            f"devices, have {len(devices)}"
        )
    grid = np.array(devices[:need]).reshape(data_parallel, n_shards)
    return Mesh(grid, ("data", "shard"))


def multislice_mesh(
    n_slices: int,
    shards_per_slice: int,
    data_per_slice: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice production layout: corpus shards stay INSIDE a slice (the
    all_gather top-k merge rides ICI), and slices fold into the ``data`` axis as
    corpus replicas serving disjoint query batches — so the only cross-slice (DCN)
    traffic is batch scatter/gather, never per-query collectives. This is the
    SURVEY.md §2.6 'DCN across slices' contract: replicate over DCN, shard over ICI.

    Device order must enumerate slice-by-slice (JAX's default for multislice jobs).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = n_slices * data_per_slice * shards_per_slice
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_slices * data_per_slice, shards_per_slice)
    return Mesh(grid, ("data", "shard"))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    """1x1 mesh: the sharded engine degenerates cleanly to single-chip execution."""
    device = device or jax.devices()[0]
    return Mesh(np.array([[device]]), ("data", "shard"))


def shard_count(mesh: Mesh) -> int:
    return mesh.shape["shard"]
