"""K-means coarse quantizer for the IVF index mode.

Replaces FAISS's ``IndexIVFFlat`` training (``/root/reference/
vector_database.py:66-76,122-130``): Lloyd's algorithm, run fully on device
as jit-compiled matmul + segment reductions. The inverted "lists" are kept
implicitly as a per-row cell-id array; search masks the flat scan to the
nprobe probed cells (see ``radad_tpu.index.flat._search_device``), which
yields the identical candidate set to list-based IVF while keeping every
shape static for XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("nlist", "iters"))
def kmeans(x: jnp.ndarray, nlist: int, iters: int = 25, seed: int = 0
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lloyd k-means: → (centroids [nlist, D], assignments [N]).

    Initialization: random distinct rows (FAISS default is also sampled
    points). Empty clusters keep their previous centroid. ``iters``
    defaults to 25, FAISS's ``ClusteringParameters.niter`` default — the
    reference's ``IndexIVFFlat.train`` path uses it unchanged
    (vector_database.py:122-130).
    """
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    init_idx = jax.random.choice(key, n, shape=(nlist,), replace=nlist > n)
    cents = x[init_idx]

    def step(cents, _):
        d2 = (jnp.sum(x ** 2, -1, keepdims=True) - 2.0 * x @ cents.T
              + jnp.sum(cents ** 2, -1)[None, :])
        assign = jnp.argmin(d2, axis=-1)
        one_hot = jax.nn.one_hot(assign, nlist, dtype=x.dtype)  # [N, nlist]
        sums = one_hot.T @ x  # [nlist, D]
        counts = jnp.sum(one_hot, axis=0)[:, None]  # [nlist, 1]
        new_cents = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        return new_cents, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    d2 = (jnp.sum(x ** 2, -1, keepdims=True) - 2.0 * x @ cents.T
          + jnp.sum(cents ** 2, -1)[None, :])
    assign = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    return cents, assign
