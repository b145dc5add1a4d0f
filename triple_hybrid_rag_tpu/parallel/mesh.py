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
    if data_parallel < 1:
        raise ValueError(f"data_parallel must be >= 1, got {data_parallel}")
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
    if n_slices < 1 or shards_per_slice < 1 or data_per_slice < 1:
        raise ValueError(
            f"multislice_mesh({n_slices=}, {shards_per_slice=}, {data_per_slice=}) "
            "needs positive dimensions"
        )
    need = n_slices * data_per_slice * shards_per_slice
    if need > len(devices):
        raise ValueError(f"mesh needs {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_slices * data_per_slice, shards_per_slice)
    # the whole point of this layout is that a shard row NEVER crosses a slice
    # boundary (per-query collectives must ride ICI): on real multislice jobs
    # devices expose slice_index — verify instead of silently building the
    # DCN-spanning mesh this function exists to prevent
    slice_ids = np.array(
        [[getattr(d, "slice_index", 0) or 0 for d in row] for row in grid]
    )
    if (slice_ids != slice_ids[:, :1]).any():
        raise ValueError(
            "a shard row spans slice boundaries (per-query all_gather would ride "
            f"DCN): shards_per_slice={shards_per_slice} does not fit one slice"
        )
    return Mesh(grid, ("data", "shard"))


def single_device_mesh(device: Optional[jax.Device] = None) -> Mesh:
    """1x1 mesh: the sharded engine degenerates cleanly to single-chip execution."""
    device = device or jax.devices()[0]
    return Mesh(np.array([[device]]), ("data", "shard"))


