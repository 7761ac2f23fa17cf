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

Chunked refinement (``build_chunk_table`` / ``ivf_gather_search_chunked``):
the span table pads every probed cell to the p99.9 cell size — measured
~77 % padding at 1M rows of clustered data (k-means cells are heavily
imbalanced: span 1048 vs mean 244). The chunk table packs each cell into
fixed 128-row chunks (only the LAST chunk of a cell carries padding) and
a search gathers the probed cells' chunk lists, compacts the valid chunk
ids to a static ``budget`` in probe-rank order, and gathers exactly those
chunks. Queries whose probed cells jointly exceed the budget fall back
in-graph (``lax.cond``) to the dense masked probed scan, so the result
contract is unconditional: the candidate set is ALWAYS every row of every
probed cell — the same set as the masked scan — whatever the budget.
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


def build_chunk_table(cells: np.ndarray, n_valid: int, nlist: int,
                      chunk: int = 128
                      ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Chunked inverted lists: each cell packed into fixed ``chunk``-row
    chunks.

    → (chunk_rows [n_chunks, chunk] int32 row ids, -1 padded — only each
       cell's LAST chunk carries padding;
       cell_chunks [nlist, max_chunks] int32 chunk ids, -1 padded;
       counts [nlist] int32 true cell sizes).

    vs the span table: per-cell padding is < ``chunk`` rows instead of
    (span − count) — at 1M clustered rows that is ~20 % vs ~77 % — at the
    cost of one extra (tiny) indirection through the chunk-id table.
    """
    cells = np.asarray(cells)[:n_valid].astype(np.int64)
    counts = np.bincount(cells, minlength=nlist).astype(np.int32)
    order = np.argsort(cells, kind="stable").astype(np.int32)
    starts = np.zeros(nlist + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    nchunks_per = (counts.astype(np.int64) + chunk - 1) // chunk
    total = max(1, int(nchunks_per.sum()))
    maxc = max(1, int(nchunks_per.max()) if nlist else 1)
    chunk_rows = np.full((total, chunk), -1, np.int32)
    cell_chunks = np.full((nlist, maxc), -1, np.int32)
    nxt = 0
    for c in np.nonzero(counts)[0]:
        rows = order[starts[c]:starts[c + 1]]
        for j in range(int(nchunks_per[c])):
            seg = rows[j * chunk:(j + 1) * chunk]
            chunk_rows[nxt, :len(seg)] = seg
            cell_chunks[c, j] = nxt
            nxt += 1
    return chunk_rows, cell_chunks, counts


def default_chunk_budget(cell_chunks: np.ndarray, counts: np.ndarray,
                         nprobe: int, slack: float = 1.5) -> int:
    """Static chunk budget for the compacted gather.

    Probed cells skew LARGE (the coarse quantizer sends queries where the
    data is), so the budget is sized from the COUNT-WEIGHTED mean of
    per-cell chunk counts — the expected chunks of the cell containing a
    random data point — times ``nprobe`` times ``slack``. Queries whose
    probed cells exceed it fall back to the dense masked scan in-graph,
    so this is a latency knob, not a recall knob.
    """
    ncc = (np.asarray(cell_chunks) >= 0).sum(1).astype(np.float64)
    w = np.asarray(counts, np.float64)
    tot = int(ncc.sum())
    if w.sum() <= 0 or tot == 0:
        return max(8, int(nprobe))
    wmean = float((w * ncc).sum() / w.sum())
    b = int(np.ceil(nprobe * wmean * slack))
    return int(min(max(b, nprobe, 8), tot))


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
        # [B] sentinel vector (NOT full_like): the exclusion list's length
        # is decoupled from the query batch so the host chunked search can
        # pass one call-level union to every chunk
        exclude_ids = jnp.full((q.shape[0],), -3, jnp.int32)

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

    # Static candidate count can undercut k on tiny tables (span rounds
    # to 8); clamp the top_k and pad results to k like the masked scan.
    n_cand = cand.shape[1]
    kk = min(k, n_cand)

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
        top, pos = jax.lax.top_k(scores, kk)
        return top, jnp.take(ci, pos)

    top, idx = jax.lax.map(one, (q, cand, exclude_ids, qsq))
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        top = jnp.pad(top, pad, constant_values=-jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=-1)
    valid = jnp.isfinite(top)
    dists = jnp.where(valid, -top, jnp.inf)
    idx = jnp.where(valid, idx, -1).astype(jnp.int32)
    return dists, idx


@partial(jax.jit, static_argnames=("k", "nprobe", "budget", "n_valid",
                                   "exclude_mode"))
def ivf_gather_search_chunked(q, vectors, xsq, ids, exclude_ids, centroids,
                              chunk_rows, cell_chunks, cells, k, *, nprobe,
                              budget, n_valid, exclude_mode="batch"):
    """Chunk-compacted probed gather search (L2, IVF metric contract).

    → (dists [B, k] f32 squared L2, idx [B, k] int32; invalid slots are
    (+inf, -1)) — same convention as ``ivf_gather_search``.

    The candidate set is unconditionally every row of every probed cell:
    within ``budget`` chunks that set is gathered (probe-rank-major chunk
    order, valid chunks compacted to the front); if ANY query's probed
    cells exceed the budget the whole batch falls back (``lax.cond``) to
    the dense masked probed scan over ``cells`` — storage-dtype GEMM plus
    exact-f32 rescoring of the top max(4k, 32) candidates, flat.py's
    bf16-storage contract.
    """
    b, d = q.shape
    nlist, maxc = cell_chunks.shape
    csz = chunk_rows.shape[1]
    nprobe_eff = min(int(nprobe), nlist)
    pslots = nprobe_eff * maxc
    budget_eff = min(int(budget), pslots)
    if exclude_mode == "batch":
        row_excl = jnp.any(ids[:, None] == exclude_ids[None, :], axis=1)
        ids = jnp.where(row_excl, jnp.int32(-3), ids)
        # [B] sentinel vector (NOT full_like): the exclusion list's length
        # is decoupled from the query batch so the host chunked search can
        # pass one call-level union to every chunk
        exclude_ids = jnp.full((q.shape[0],), -3, jnp.int32)

    hi = jax.lax.Precision.HIGHEST
    qc = (jnp.sum(q * q, -1, keepdims=True)
          - 2.0 * jax.lax.dot_general(
              q, centroids, (((1,), (1,)), ((), ())),
              preferred_element_type=jnp.float32, precision=hi)
          + jnp.sum(centroids * centroids, -1)[None, :])
    _, probe = jax.lax.top_k(-qc, nprobe_eff)  # [B, nprobe]

    cand_ch = jnp.take(cell_chunks, probe, axis=0
                       ).reshape(b, pslots)  # probe-rank-major chunk ids
    ch_valid = cand_ch >= 0
    n_valid_ch = jnp.sum(ch_valid, axis=1)  # [B]
    # Stable valid-first compaction preserving probe-rank order.
    pos = jnp.arange(pslots, dtype=jnp.int32)[None, :]
    key = jnp.where(ch_valid, pos, pos + pslots)
    order = jnp.argsort(key, axis=1)[:, :budget_eff]
    sel = jnp.take_along_axis(cand_ch, order, axis=1)  # [B, budget]
    qsq = jnp.einsum("bd,bd->b", q, q, precision=hi)
    overflowed = jnp.any(n_valid_ch > budget_eff)
    # Static candidate counts can undercut k on tiny tables; clamp the
    # top_k in both branches (they must agree on shape) and pad to k.
    cap = vectors.shape[0]
    kk = min(k, budget_eff * csz, cap)

    def gather_branch(_):
        def one(args):
            qi, si, ei, qsq_i = args
            rows = jnp.take(chunk_rows, jnp.maximum(si, 0), axis=0)
            rows = jnp.where(si[:, None] >= 0, rows, -1
                             ).reshape(budget_eff * csz)  # [C] row ids
            safe = jnp.maximum(rows, 0)
            vs = jnp.take(vectors, safe, axis=0).astype(jnp.float32)
            qx = jax.lax.dot_general(
                qi[None, :], vs, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=hi)[0]
            scores = -(qsq_i - 2.0 * qx + jnp.take(xsq, safe))
            cid = jnp.take(ids, safe)
            bad = (rows < 0) | (cid == ei)
            scores = jnp.where(bad, -jnp.inf, scores)
            top, p = jax.lax.top_k(scores, kk)
            return top, jnp.take(rows, p)

        return jax.lax.map(one, (q, sel, exclude_ids, qsq))

    def scan_branch(_):
        # Dense masked probed scan (flat.py's IVF formulation): membership
        # scatter + per-row gather, storage-dtype GEMM, exact-f32 rescore.
        member = jnp.zeros((b, nlist), jnp.bool_)
        member = member.at[
            jnp.arange(b, dtype=jnp.int32)[:, None], probe].set(True)
        probe_mask = jnp.take(member, cells, axis=1, mode="clip")  # [B, cap]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        qm = q.astype(vectors.dtype)
        qx = jax.lax.dot_general(
            qm, vectors, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = -(qsq[:, None] - 2.0 * qx + xsq[None, :])
        bad = (~probe_mask | (row_ids >= n_valid)[None, :]
               | (ids[None, :] == exclude_ids[:, None]))
        scores = jnp.where(bad, -jnp.inf, scores)
        r = min(max(4 * k, 32), cap)
        cs, ci = jax.lax.top_k(scores, r)  # [B, r]
        # exact f32 rescore of the candidates (restores stored-row order
        # after the storage-dtype scan rounding)
        vs = jnp.take(vectors, ci, axis=0).astype(jnp.float32)  # [B, r, D]
        qx2 = jnp.einsum("bd,brd->br", q, vs, precision=hi)
        s2 = -(qsq[:, None] - 2.0 * qx2 + jnp.take(xsq, ci))
        s2 = jnp.where(jnp.isfinite(cs), s2, -jnp.inf)
        top, p = jax.lax.top_k(s2, kk)
        return top, jnp.take_along_axis(ci, p, axis=1)

    top, idx = jax.lax.cond(overflowed, scan_branch, gather_branch, None)
    if kk < k:
        pad = ((0, 0), (0, k - kk))
        top = jnp.pad(top, pad, constant_values=-jnp.inf)
        idx = jnp.pad(idx, pad, constant_values=-1)
    valid = jnp.isfinite(top)
    dists = jnp.where(valid, -top, jnp.inf)
    idx = jnp.where(valid, idx, -1).astype(jnp.int32)
    return dists, idx
