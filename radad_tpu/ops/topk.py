"""Fused batched distance + top-k selection Pallas kernel for TPU.

This is the framework's replacement for FAISS's brute-force scan
(``/root/reference/vector_database.py:159-182``). One kernel computes the
query×database score tile on the MXU and immediately reduces it to a
per-tile top-k on the VPU, so the full ``[B, N]`` score matrix never touches
HBM — the kernel's HBM traffic is just the database read (unavoidable) plus
``B × num_tiles × k`` candidate outputs, a ~TN/k reduction in score-matrix
bandwidth. A final tiny ``lax.top_k`` over the per-tile candidates merges
globally.

Grid layout: ``(num_db_tiles, num_d_chunks)`` with the feature (D) chunks
innermost. Scores accumulate in a VMEM scratch across D chunks; on the last
chunk the kernel applies validity/self-exclusion masks and runs k rounds of
max+mask (k is small and static — the reference uses top_k=5, config.py:56).

Metrics: "IP" (and cosine, via pre-normalized inputs) returns ``q·x``;
"L2" returns ``-(‖x‖² - 2 q·x)`` — the per-query ``‖q‖²`` constant doesn't
affect ranking and is added back by the caller, keeping the kernel free of
per-query bias rows. Scores are "larger is better" in both cases.

Measured v5e status (chained-execution timing, B=256, N=25.6k, D=5376):
the plain XLA path (``flat_topk_reference``) already runs at ~790 GB/s
effective — HBM-bound speed-of-light for an f32 database — while this
kernel's k-round max/argmax select lowers poorly on the VPU (~127 GB/s).
``FlatIndex`` therefore defaults to the XLA path (round 2: the bf16 scan +
hierarchical tile k-select + fused Pallas rerank in ``index/flat.py`` /
``ops/rerank.py``, 246.8k QPS exact). The round-1 claim that this kernel
would be the substrate for quantized scans is RETIRED: the int8 (SQ8) path
also uses the XLA MXU scan — int8 matmul is already MXU-native — and the
only Pallas-worthy fusion is the candidate rerank's gather+dequant+dot
(``ops/rerank.exact_dot``, 239k QPS measured). This kernel remains as a
correctness-proven (exact set-match vs oracle on real TPU, tests
interpret-mode) single-kernel formulation, reachable via
``FlatIndex(use_pallas=True)``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Plain Python float so kernels see a literal, not a captured jax constant.
NEG_INF = float("-inf")


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_CAND = 128  # candidate columns per tile (lane-aligned); k must be ≤ this


def _topk_tile_kernel(q_ref, x_ref, ids_ref, excl_ref,
                      vals_ref, idx_ref,
                      acc_ref, xsq_ref, *,
                      k: int, metric: str, n_valid: int, tile_n: int,
                      fast_scan: bool):
    i_nt = pl.program_id(0)
    i_dc = pl.program_id(1)
    n_dc = pl.num_programs(1)

    @pl.when(i_dc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        xsq_ref[:] = jnp.zeros_like(xsq_ref)

    q = q_ref[:]  # [B, DC]
    x = x_ref[:]  # [TN, DC]
    # MXU: partial q·xᵀ for this feature chunk. Inputs cast to bf16 with
    # f32 accumulation — single-pass MXU like XLA's default-precision f32
    # matmul (an f32 dot here lowers to the 3-pass bf16x3 algorithm, 3×
    # slower). Callers needing f32-exact order re-rank the top candidates.
    dot_dtype = jnp.bfloat16 if fast_scan else jnp.float32
    acc_ref[:] += jax.lax.dot_general(
        q.astype(dot_dtype), x.astype(dot_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=None if fast_scan else jax.lax.Precision.HIGHEST)
    if metric == "L2":
        xf = x.astype(jnp.float32)
        xsq_ref[:] += jnp.sum(xf * xf, axis=1, keepdims=True).T  # [1, TN]

    @pl.when(i_dc == n_dc - 1)
    def _():
        scores = acc_ref[:]  # [B, TN]
        if metric == "L2":
            scores = 2.0 * scores - xsq_ref[:]  # -(‖x‖² - 2q·x)

        b = scores.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, (b, tile_n), 1)
        global_row = i_nt * tile_n + col
        invalid = global_row >= n_valid
        # Self-exclusion: row id equals the query's excluded id.
        excl = ids_ref[:].reshape(1, tile_n) == excl_ref[:]  # [B,TN] vs [B,1]
        scores = jnp.where(invalid | excl, NEG_INF, scores)

        # k rounds of max + first-match-column select (max/min reduces lower
        # better on the VPU than argmax), accumulated into lane-aligned
        # [B, _CAND] candidate blocks (cols ≥ k stay -inf/-1).
        out_col = jax.lax.broadcasted_iota(jnp.int32, (b, _CAND), 1)
        vals = jnp.full((b, _CAND), NEG_INF, jnp.float32)
        idxs = jnp.full((b, _CAND), -1, jnp.int32)
        big = jnp.int32(tile_n)
        for j in range(k):
            best = jnp.max(scores, axis=1)  # [B]
            at_best = scores >= best[:, None]  # ties collapse to first col
            best_idx = jnp.min(jnp.where(at_best, col, big), axis=1)
            gidx = jnp.where(jnp.isfinite(best), i_nt * tile_n + best_idx, -1)
            vals = jnp.where(out_col == j, best[:, None], vals)
            idxs = jnp.where(out_col == j, gidx[:, None], idxs)
            if j + 1 < k:
                scores = jnp.where(col == best_idx[:, None], NEG_INF, scores)
        vals_ref[0] = vals
        idx_ref[0] = idxs


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "n_valid", "tile_n", "chunk_d",
                     "interpret", "fast_scan"))
def flat_topk(
    q: jnp.ndarray,
    vectors: jnp.ndarray,
    k: int,
    *,
    metric: str = "L2",
    n_valid: Optional[int] = None,
    ids: Optional[jnp.ndarray] = None,
    exclude_ids: Optional[jnp.ndarray] = None,
    tile_n: int = 1024,
    chunk_d: int = 512,
    interpret: bool = False,
    fast_scan: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused top-k scan: → (scores [B,k] larger-better, indices [B,k] i32).

    ``vectors`` is the HBM-resident database ``[N, D]``; ``q`` is ``[B, D]``.
    Rows ≥ ``n_valid`` and rows whose ``ids`` match the query's
    ``exclude_ids`` are masked. Arbitrary B/N/D are handled by zero-padding
    to tile multiples (zero feature padding is exact for both IP and L2).
    """
    if metric not in ("IP", "COSINE", "L2"):
        raise ValueError(f"flat_topk metric must be IP/COSINE/L2, got {metric}")
    if k > _CAND:
        raise ValueError(f"flat_topk supports k ≤ {_CAND}, got {k}")
    kernel_metric = "IP" if metric in ("IP", "COSINE") else "L2"
    b, d = q.shape
    n = vectors.shape[0]
    if n_valid is None:
        n_valid = n
    if ids is None:
        ids = jnp.full((n,), -1, jnp.int32)
    if exclude_ids is None:
        exclude_ids = jnp.full((b,), -2, jnp.int32)

    tile_n = min(tile_n, _round_up(n, 128))
    chunk_d = min(chunk_d, _round_up(d, 128))
    b_pad = _round_up(b, 8)
    n_pad = _round_up(n, tile_n)
    d_pad = _round_up(d, chunk_d)

    qp = jnp.zeros((b_pad, d_pad), jnp.float32).at[:b, :d].set(q)
    xp = vectors
    if (n_pad, d_pad) != vectors.shape:
        xp = jnp.zeros((n_pad, d_pad), jnp.float32).at[:n, :d].set(vectors)
    ids_p = jnp.full((n_pad,), -1, jnp.int32).at[:n].set(ids)
    excl_p = jnp.full((b_pad, 1), -2, jnp.int32).at[:b, 0].set(exclude_ids)

    num_nt = n_pad // tile_n
    num_dc = d_pad // chunk_d

    kernel = functools.partial(
        _topk_tile_kernel, k=k, metric=kernel_metric,
        n_valid=n_valid, tile_n=tile_n, fast_scan=fast_scan)

    vals, idx = pl.pallas_call(
        kernel,
        grid=(num_nt, num_dc),
        in_specs=[
            pl.BlockSpec((b_pad, chunk_d), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # queries
            pl.BlockSpec((tile_n, chunk_d), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),  # db tile
            pl.BlockSpec((tile_n,), lambda i, j: (i,),
                         memory_space=pltpu.VMEM),  # row ids
            pl.BlockSpec((b_pad, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),  # exclude ids
        ],
        out_specs=[
            pl.BlockSpec((1, b_pad, _CAND), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b_pad, _CAND), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_nt, b_pad, _CAND), jnp.float32),
            jax.ShapeDtypeStruct((num_nt, b_pad, _CAND), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b_pad, tile_n), jnp.float32),  # score accumulator
            pltpu.VMEM((1, tile_n), jnp.float32),      # ‖x‖² accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * 4 + b_pad * d_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, xp, ids_p, excl_p)

    # Global merge over per-tile candidates (tiny: [B, num_nt*k]).
    vals = jnp.transpose(vals[:, :, :k], (1, 0, 2)).reshape(b_pad, num_nt * k)
    idx = jnp.transpose(idx[:, :, :k], (1, 0, 2)).reshape(b_pad, num_nt * k)
    merged_vals, merged_pos = jax.lax.top_k(vals, k)
    merged_idx = jnp.take_along_axis(idx, merged_pos, axis=1)
    valid = jnp.isfinite(merged_vals)
    merged_idx = jnp.where(valid, merged_idx, -1)

    out_vals = merged_vals[:b]
    out_idx = merged_idx[:b]
    if kernel_metric == "L2":
        # Add back the per-query ‖q‖² so values are true -(squared L2).
        qsq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        out_vals = jnp.where(jnp.isfinite(out_vals), out_vals - qsq, out_vals)
    return out_vals, out_idx


def flat_topk_reference(q, vectors, k, *, metric="L2", n_valid=None,
                        ids=None, exclude_ids=None):
    """Pure-XLA oracle with identical contract (for tests and CPU runs)."""
    q = jnp.asarray(q, jnp.float32)
    vectors = jnp.asarray(vectors, jnp.float32)
    b = q.shape[0]
    n = vectors.shape[0]
    if n_valid is None:
        n_valid = n
    if metric in ("IP", "COSINE"):
        scores = q @ vectors.T
    else:
        scores = -(jnp.sum(q ** 2, -1, keepdims=True) - 2.0 * q @ vectors.T
                   + jnp.sum(vectors ** 2, -1)[None, :])
    row = jnp.arange(n)
    mask = (row >= n_valid)[None, :]
    if ids is not None and exclude_ids is not None:
        mask = mask | (jnp.asarray(ids)[None, :] == jnp.asarray(exclude_ids)[:, None])
    scores = jnp.where(mask, NEG_INF, scores)
    v, i = jax.lax.top_k(scores, k)
    i = jnp.where(jnp.isfinite(v), i, -1)
    return v, i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Per-tile top-m extraction kernel for the deep-tile candidate select.
#
# The certified search's _hier_candidates (index/flat.py) runs m (=8)
# iterative max/where extraction rounds over the gathered [B, T, 128] tile
# slab. The rounds are sequentially dependent, so XLA cannot fuse across
# them: measured on v5e at ITW scale they cost 0.24 ms of the select
# stage's 0.39 ms (~40 small dispatches over a 3 MB slab — dispatch-bound,
# not FLOP-bound; see NOTES.md "select-stage decomposition"). This kernel
# runs all m rounds over the VMEM-resident slab in ONE dispatch with
# identical semantics (first-lane tie-break, -inf handling, per-tile
# leftover max for the exactness certificate's spill bound).


def _extract_kernel(cand_ref, tsel_ref, vals_ref, rows_ref, left_ref,
                    *, m: int, nt: int):
    cand = cand_ref[:]  # [bb, T, L] f32
    bb, t, lanes_n = cand.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (bb, t, lanes_n), 2)
    big = jnp.int32(lanes_n)
    tsel = tsel_ref[:]  # [bb, T] i32 — which score tile each slab tile is
    vs, rs = [], []
    for j in range(m):
        best = jnp.max(cand, axis=2)  # [bb, T]
        at_best = cand >= best[..., None]
        bidx = jnp.min(jnp.where(at_best, lane, big), axis=2)  # [bb, T]
        sel = jnp.minimum(bidx, lanes_n - 1)
        vs.append(best)
        # strided tile layout: score row = lane * nt + tile index
        rs.append(sel * jnp.int32(nt) + tsel)
        cand = jnp.where(lane == bidx[..., None], NEG_INF, cand)
    # j-major flat layout [bb, m*T] — exactly the order the select stage
    # consumes (top_k over the candidate axis), so no host-side
    # swapaxes/reshape relayout survives this kernel
    vals_ref[:] = jnp.concatenate(vs, axis=1)
    rows_ref[:] = jnp.concatenate(rs, axis=1)
    left_ref[:] = jnp.max(cand, axis=2)


@functools.partial(jax.jit, static_argnames=("m", "nt", "interpret"))
def extract_candidates(cand: jnp.ndarray, tsel: jnp.ndarray, m: int,
                       nt: int, *, interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-tile top-m of ``cand [B, T, L]`` (L = 128 lanes), one dispatch,
    emitting the CANDIDATE LIST directly: flattened j-major values and
    strided-layout score-row indices (``lane * nt + tsel``).

    Returns ``(vals [B, m*T] f32, rows [B, m*T] i32, leftover [B, T]
    f32)`` where ``leftover`` is the per-tile max AFTER the m extractions
    (the in-tile component of the certificate's spill bound). Tie-break:
    lowest lane, exactly like the XLA loop it replaces. All-(-inf) tiles
    yield val=-inf, lane 0 — masked downstream by isfinite, identical to
    the XLA semantics.

    The flat [B, m*T] outputs replace the previous full-width
    ``[B, T, 128]`` vals/lanes pair: at ITW scale (B=256, T=24) that pair
    cost ~25 MB of HBM writes + a slice + two swapaxes relayouts per
    search call, and its scoped-VMEM footprint OOM'd when the search ran
    inside a fori_loop (profiling chains).
    """
    b, t, lanes_n = cand.shape
    assert m <= lanes_n, (m, lanes_n)
    assert tsel.shape == (b, t), (tsel.shape, (b, t))
    # block B so the slab + the m unrolled rounds' live temporaries stay
    # inside the 16 MB scoped-VMEM stack: at bb=128, T=24, m=8 the
    # unrolled max/where rounds hold ~19 MB of [bb, T, 128] temps
    # (measured OOM); the live set scales ~bb·T·m, so the block size must
    # shrink as T and m grow — top_k=20 drives (T=40, m=20) and a fixed
    # bb=64 blew the scoped stack at 31.3 MB (measured, round 5). Budget
    # bb·T·m ≈ 18k units (~14 MB at the measured ~775 B/unit), multiple
    # of 8, floor 8: reproduces bb=64 at the tuned (24, 8) point.
    bb_cap = max(8, (18_000 // max(t * m, 1)) // 8 * 8)
    bb = max(8, min(64, b, bb_cap))
    b_pad = _round_up(b, bb)
    if b_pad != b:
        cand = jnp.concatenate(
            [cand, jnp.full((b_pad - b, t, lanes_n), NEG_INF, cand.dtype)])
        tsel = jnp.concatenate(
            [tsel, jnp.zeros((b_pad - b, t), jnp.int32)])

    vals, rows, left = pl.pallas_call(
        functools.partial(_extract_kernel, m=m, nt=nt),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, t, lanes_n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bb, m * t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, m * t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, t), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, m * t), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m * t), jnp.int32),
            jax.ShapeDtypeStruct((b_pad, t), jnp.float32),
        ],
        interpret=interpret,
    )(cand.astype(jnp.float32), tsel.astype(jnp.int32))
    return vals[:b], rows[:b], left[:b]
