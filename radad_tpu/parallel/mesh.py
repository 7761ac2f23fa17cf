"""Device-mesh construction for the framework's two parallel axes.

The reference is single-GPU (SURVEY.md §2: no torch.distributed anywhere);
its scaling story is DataLoader workers. The TPU framework scales over a 2-D
``('data', 'index')`` mesh:

  * **'data'** — batch parallelism for DB build / train / eval (the main
    axis; replaces the reference's single-GPU batching);
  * **'index'** — row-sharding of the reference-embedding database, the one
    genuinely distributed component (replaces FAISS-GPU). Queries are
    replicated along 'index'; per-shard top-k candidates merge with one
    ``all_gather`` over ICI (see ``radad_tpu.parallel.sharded_index``).

Model parameters (~6M) are replicated everywhere — TP/PP are structurally
unnecessary at this model size (SURVEY.md §2 "no TP/PP/SP needed for
parity") but the mesh plumbing leaves room to add axes later.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
INDEX_AXIS = "index"


def make_mesh(data: Optional[int] = None, index: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ('data', 'index') mesh. ``data`` defaults to
    n_devices // index."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % index:
            raise ValueError(f"{n} devices not divisible by index={index}")
        data = n // index
    if data * index != n:
        raise ValueError(
            f"mesh {data}x{index} != {n} available devices")
    arr = np.asarray(devices).reshape(data, index)
    return Mesh(arr, (DATA_AXIS, INDEX_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First axis split over 'data', replicated over 'index'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def index_sharding(mesh: Mesh) -> NamedSharding:
    """First axis (DB rows) split over 'index', replicated over 'data'."""
    return NamedSharding(mesh, P(INDEX_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
