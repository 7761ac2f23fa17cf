"""Gather-probed IVF search: sublinear low-batch retrieval.

The masked-scan IVF formulation (``flat._search_device`` with
``metric="IVF"``) reads the ENTIRE row buffer per batch regardless of
nprobe — O(N) HBM traffic that a large query batch amortizes but
single-query serving pays in full: at N=1e6, D=5376 bf16 that is a
~10.7 GB read (~tens of ms) per predict call. This module adds the
list-probing formulation FAISS actually uses (the reference's
``IndexIVFFlat``, ``/root/reference/vector_database.py:66-98,175-179``),
restructured for TPU static shapes:

* the inverted lists are a dense ``[nlist, span]`` int32 row table plus a
  small always-scanned overflow list for cells longer than the span cap —
  8–16 MB at nlist=4096, so it rides along with ANY storage mode,
  including the single-buffer 1M-row bf16 capacity mode where no second
  DB copy fits on the chip;
* search gathers only the probed cells' rows straight from the existing
  storage buffer (XLA row gather; each row is a lane-contiguous DMA) and
  scores them in f32 at HIGHEST precision against the stored exact row
  norms — exact w.r.t. the stored rows among the probed candidate set,
  the same contract as the masked scan;
* every shape is static — ``(nprobe, span)`` bound the gather — and
  ``lax.map`` over queries bounds live memory to one query's candidates.

Candidate-set relation to the masked scan: cells are disjoint, the table
row for cell c lists its first ``span`` rows, and the tail spills to the
overflow list that every query scans — so the gathered candidate set is a
SUPERSET of the masked scan's for the same (centroids, cells, nprobe)
(overflow rows of unprobed cells can only add recall). Distances are
HIGHEST-precision f32 on both paths, so results match the masked scan
exactly up to genuinely tied scores.

When it pays: the gather path touches ``B * nprobe * span + overflow``
rows; the masked scan touches all N. ``FlatIndex.search`` auto-selects
the gather path when the former is well under N (low batch), keeping the
batch-amortized masked scan for training-sized batches.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _round8(n: int) -> int:
    return max(8, ((n + 7) // 8) * 8)


def build_cell_table(cells: np.ndarray, n_valid: int, nlist: int,
                     span_cap: Optional[int] = None
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense inverted-list table from a per-row cell assignment.

    → (table [nlist, span] int32 row ids, -1 padded;
       counts [nlist] int32 true cell sizes;
       overflow [V] int32 row ids of cell tails past ``span``, -1 padded).

    ``span`` defaults to the 99.9th-percentile cell size (sublane-rounded)
    so the per-probe gather stays bounded while the overflow holds ~0.1 %
    of rows; pass ``span_cap`` to override.
    """
    cells = np.asarray(cells)[:n_valid].astype(np.int64)
    counts = np.bincount(cells, minlength=nlist).astype(np.int32)
    nonzero = counts[counts > 0]
    if span_cap is not None:
        span = int(span_cap)
    elif nonzero.size:
        span = int(np.quantile(nonzero, 0.999))
    else:
        span = 1
    if nonzero.size:
        span = min(span, int(nonzero.max()))
    span = _round8(span)
    order = np.argsort(cells, kind="stable").astype(np.int32)
    starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    table = np.full((nlist, span), -1, np.int32)
    overflow_parts = []
    for c in np.nonzero(counts)[0]:
        rows = order[starts[c]:starts[c + 1]]
        m = min(len(rows), span)
        table[c, :m] = rows[:m]
        if len(rows) > span:
            overflow_parts.append(rows[span:])
    if overflow_parts:
        ovf = np.concatenate(overflow_parts)
        ovf = np.pad(ovf, (0, _round8(len(ovf)) - len(ovf)),
                     constant_values=-1)
    else:
        ovf = np.full((8,), -1, np.int32)
    return table, counts, ovf.astype(np.int32)


@partial(jax.jit, static_argnames=("k", "nprobe", "exclude_mode"))
def ivf_gather_search(q, vectors, xsq, ids, exclude_ids, centroids,
                      table, overflow, k, *, nprobe,
                      exclude_mode="batch"):
    """Probed-cell gather search (L2, matching the IVF metric contract).

    → (dists [B, k] f32 squared L2, idx [B, k] int32; invalid slots are
    (+inf, -1)) — the same convention as ``flat._search_device``.

    ``exclude_mode`` follows flat.py: "batch" rewrites every excluded
    row's id to a shared sentinel (reference pipeline.py:461-463 batch-
    global exclusion), "self" masks per-query matches only.
    """
    b, d = q.shape
    nlist, span = table.shape
    nprobe_eff = min(int(nprobe), nlist)
    if exclude_mode == "batch":
        row_excl = jnp.any(ids[:, None] == exclude_ids[None, :], axis=1)
        ids = jnp.where(row_excl, jnp.int32(-3), ids)
        exclude_ids = jnp.full_like(exclude_ids, -3)

    hi = jax.lax.Precision.HIGHEST
    # Coarse quantizer: nprobe nearest centroids per query (L2).
    qc = (jnp.sum(q * q, -1, keepdims=True)
          - 2.0 * jax.lax.dot_general(
              q, centroids, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32, precision=hi)
          + jnp.sum(centroids * centroids, -1)[None, :])
    _, probe = jax.lax.top_k(-qc, nprobe_eff)  # [B, nprobe]

    cand = jnp.take(table, probe, axis=0).reshape(b, nprobe_eff * span)
    cand = jnp.concatenate(
        [cand, jnp.broadcast_to(overflow[None, :],
                                (b, overflow.shape[0]))], axis=1)  # [B, C]
    qsq = jnp.einsum("bd,bd->b", q, q, precision=hi)

    def one(args):
        qi, ci, ei, qsq_i = args
        safe = jnp.maximum(ci, 0)
        rows = jnp.take(vectors, safe, axis=0).astype(jnp.float32)  # [C, D]
        qx = jax.lax.dot_general(
            qi[None, :], rows, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi)[0]  # [C]
        csq = jnp.take(xsq, safe)
        scores = -(qsq_i - 2.0 * qx + csq)
        cid = jnp.take(ids, safe)
        bad = (ci < 0) | (cid == ei)
        scores = jnp.where(bad, -jnp.inf, scores)
        top, pos = jax.lax.top_k(scores, k)
        return top, jnp.take(ci, pos)

    top, idx = jax.lax.map(one, (q, cand, exclude_ids, qsq))
    valid = jnp.isfinite(top)
    dists = jnp.where(valid, -top, jnp.inf)
    idx = jnp.where(valid, idx, -1).astype(jnp.int32)
    return dists, idx
