"""ICI-sharded flat-index retrieval via shard_map.

The distributed replacement for FAISS-GPU (SURVEY.md §2 "Index sharding"):
database rows are partitioned across the mesh 'index' axis; each device
scans only its shard (matmul + local top-k on its own HBM slice), then the
per-shard candidates — (score, global row id, neighbor vector, neighbor
label) — are combined with ONE ``all_gather`` over ICI and re-top-k'd.
Gathering the candidate *vectors* along with the scores (k·D floats per
query per shard) avoids a second cross-shard gather for reconstruction.

Communication cost per query batch: S · B_local · k · (D+3) floats over
ICI — for B=256, k=5, D=5376, S=8 shards that's ~27 MB/shard, microseconds
on ICI — versus the reference's per-batch PCIe round-trip to host FAISS.

Query batches ride the 'data' axis; the two axes compose in a single
shard_map over the 2-D mesh.
"""

from __future__ import annotations


from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radad_tpu.parallel.mesh import DATA_AXIS, INDEX_AXIS


class ShardedRetrieval(NamedTuple):
    neighbors: jnp.ndarray  # [B, k, D]
    labels: jnp.ndarray  # [B, k]
    dists: jnp.ndarray  # [B, k] (true distances; +inf on missing)
    indices: jnp.ndarray  # [B, k] global row ids (-1 on missing)


def _local_scores(q, vectors, metric):
    # HIGHEST precision: f32-exact scores. On v5e the scan is HBM-bound,
    # so the extra MXU passes are free (see index/flat.py measurement).
    qx = jax.lax.dot_general(
        q, vectors, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    if metric in ("IP", "COSINE"):
        return qx
    return -(jnp.sum(q ** 2, -1, keepdims=True) - 2.0 * qx
             + jnp.sum(vectors ** 2, -1)[None, :])


def _merge_shard_candidates(vals, gidx, cand_vecs, cand_labs, k, metric):
    """Global candidate merge — ONE all_gather over ICI, then re-top-k.
    Runs inside shard_map; all inputs are per-shard [b, k, ...] locals."""
    g_vals = jax.lax.all_gather(vals, INDEX_AXIS)  # [S, b, k]
    g_idx = jax.lax.all_gather(gidx, INDEX_AXIS)
    g_vecs = jax.lax.all_gather(cand_vecs, INDEX_AXIS)  # [S, b, k, D]
    g_labs = jax.lax.all_gather(cand_labs, INDEX_AXIS)

    s = g_vals.shape[0]
    b = g_vals.shape[1]
    flat_vals = jnp.transpose(g_vals, (1, 0, 2)).reshape(b, s * k)
    flat_idx = jnp.transpose(g_idx, (1, 0, 2)).reshape(b, s * k)
    flat_vecs = jnp.transpose(g_vecs, (1, 0, 2, 3)).reshape(
        b, s * k, g_vecs.shape[-1])
    flat_labs = jnp.transpose(g_labs, (1, 0, 2)).reshape(b, s * k)

    top_vals, pos = jax.lax.top_k(flat_vals, k)  # [b, k]
    sel = lambda arr: jnp.take_along_axis(arr, pos, axis=1)
    out_idx = sel(flat_idx)
    out_labs = sel(flat_labs)
    out_vecs = jnp.take_along_axis(flat_vecs, pos[..., None], axis=1)
    ok = jnp.isfinite(top_vals)
    # Scores carry the full squared distance for L2 (q² - 2qx + x²), so
    # negation gives the true value directly.
    dists = jnp.where(ok, -top_vals if metric == "L2" else top_vals,
                      jnp.inf if metric == "L2" else -jnp.inf)
    return (out_vecs, out_labs, dists, jnp.where(ok, out_idx, -1))


def sharded_retrieve(
    mesh: Mesh,
    q: jnp.ndarray,  # [B, D] — sharded over 'data'
    vectors: jnp.ndarray,  # [cap, D] — sharded over 'index' (rows)
    labels: jnp.ndarray,  # [cap]
    ids: jnp.ndarray,  # [cap] basename ids; -1 on padding rows
    row_valid: jnp.ndarray,  # [cap] bool
    exclude_ids: jnp.ndarray,  # [B] — sharded over 'data'
    *,
    k: int,
    metric: str = "L2",
    centroids: Optional[jnp.ndarray] = None,  # [nlist, D] — replicated
    cells: Optional[jnp.ndarray] = None,  # [cap] i32 — sharded over 'index'
    nprobe: int = 32,
    exclude_mode: str = "batch",
) -> ShardedRetrieval:
    """Exact top-k over the sharded database; recall@k == 1.0 vs the
    single-device scan by construction (per-shard exact top-k + global
    merge cannot drop a true neighbor: each shard contributes its best k).

    With ``centroids``/``cells`` the scan restricts to each query's
    ``nprobe`` nearest coarse cells (IVF mode, index/flat.py parity): the
    probe-cell selection uses the replicated centroids so every shard
    masks against the SAME cell set — the candidate set is identical to
    the single-chip masked-scan IVF.

    ``exclude_mode``: "batch" reproduces the reference's batch-global
    exclusion (pipeline.py:461-463); "self" excludes each query's own id
    only (independent serving requests, predict_batch) — each query's
    exclude id already lives on its 'data' shard, so self mode needs NO
    extra collective (VERDICT r3 #7)."""

    def shard_fn(q_loc, v_loc, lab_loc, ids_loc, valid_loc, excl_loc,
                 *ivf_args):
        rows_per_shard = v_loc.shape[0]
        shard_i = jax.lax.axis_index(INDEX_AXIS)
        scores = _local_scores(q_loc, v_loc, metric)  # [b, rows]
        if exclude_mode == "self":
            # per-row exclusion: [b, rows] compare, purely shard-local
            excl_mat = ids_loc[None, :] == excl_loc[:, None]
            mask = (~valid_loc)[None, :] | excl_mat
        else:
            # Reference parity: exclusion is batch-global (one set from
            # every query's basename, pipeline.py:461-463) — gather the
            # full batch's exclude ids across 'data' ([B] ints, trivial
            # on ICI).
            excl_all = jax.lax.all_gather(excl_loc, DATA_AXIS).reshape(-1)
            row_excl = jnp.any(ids_loc[:, None] == excl_all[None, :],
                               axis=1)
            mask = ((~valid_loc) | row_excl)[None, :]
        if ivf_args:
            cents, cells_loc = ivf_args
            # HIGHEST: probe the same cells as every other IVF path
            # (flat.py masked scan, ivf_gather.py) — see flat.py note.
            qc = (jnp.sum(q_loc ** 2, -1, keepdims=True)
                  - 2.0 * jax.lax.dot_general(
                      q_loc, cents, (((1,), (1,)), ((), ())),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
                  + jnp.sum(cents ** 2, -1)[None, :])  # [b, nlist]
            nprobe_eff = min(nprobe, cents.shape[0])
            _, probe_cells = jax.lax.top_k(-qc, nprobe_eff)
            # [b, nlist] membership scatter + gather by cell id — avoids
            # the O(b·rows·nprobe) broadcast compare (see index/flat.py).
            member = jnp.zeros((q_loc.shape[0], cents.shape[0]),
                               jnp.bool_)
            member = member.at[
                jnp.arange(q_loc.shape[0], dtype=jnp.int32)[:, None],
                probe_cells].set(True)
            probe_mask = jnp.take(member, cells_loc, axis=1,
                                  mode="clip")  # [b, rows]
            mask = mask | ~probe_mask
        scores = jnp.where(mask, -jnp.inf, scores)
        vals, loc_idx = jax.lax.top_k(scores, k)  # [b, k]
        gidx = shard_i * rows_per_shard + loc_idx
        gidx = jnp.where(jnp.isfinite(vals), gidx, -1)
        cand_vecs = jnp.take(v_loc, loc_idx.reshape(-1), axis=0)
        cand_vecs = cand_vecs.reshape(loc_idx.shape + (v_loc.shape[-1],))
        cand_vecs = jnp.where((gidx >= 0)[..., None], cand_vecs, 0.0)
        cand_labs = jnp.where(
            gidx >= 0, jnp.take(lab_loc, loc_idx.reshape(-1)
                                ).reshape(loc_idx.shape), 0.0)
        return _merge_shard_candidates(vals, gidx, cand_vecs, cand_labs,
                                       k, metric)

    in_specs = [P(DATA_AXIS, None), P(INDEX_AXIS, None), P(INDEX_AXIS),
                P(INDEX_AXIS), P(INDEX_AXIS), P(DATA_AXIS)]
    args = [q, vectors, labels, ids, row_valid, exclude_ids]
    if centroids is not None:
        in_specs += [P(), P(INDEX_AXIS)]
        args += [centroids, cells]
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None),
                   P(DATA_AXIS, None), P(DATA_AXIS, None)),
        # outputs are replicated along 'index' by construction (identical
        # post-all_gather merge on every shard); the static checker can't
        # prove that, so disable varying-axis checking for this map.
        check_vma=False,
    )(*args)
    return ShardedRetrieval(*out)


def sharded_retrieve_sq8(
    mesh: Mesh,
    q: jnp.ndarray,  # [B, D] f32 — sharded over 'data'
    codes: jnp.ndarray,  # [cap, D] int8 — sharded over 'index' (rows)
    scales: jnp.ndarray,  # [cap] f32
    norm_sq: jnp.ndarray,  # [cap] f32 (‖x̂‖², dequantized-row norms)
    labels: jnp.ndarray,  # [cap]
    ids: jnp.ndarray,  # [cap]; -1 on padding rows
    exclude_ids: jnp.ndarray,  # [B] — sharded over 'data'
    *,
    k: int,
    metric: str = "L2",
    centroids: Optional[jnp.ndarray] = None,  # [nlist, D] f32 — replicated
    cells: Optional[jnp.ndarray] = None,  # [cap] i32 — sharded with rows
    exclude_mode: str = "batch",
) -> ShardedRetrieval:
    """ICI-sharded int8 retrieval: per-shard int8 MXU scan + f32 rerank of
    the shard's top-R quantized candidates, then the same one-all_gather
    merge as the flat path (VERDICT r1 #4: SQ8 × mesh composition — the
    FAISS-GPU sharding story, vector_database.py:31-53, at int8).

    Exactness: identical contract to the single-chip `_sq8_search` — exact
    f32 order w.r.t. the stored (quantized) rows among candidates whose
    quantized score ranks top-R in their shard. A shard-local top-R is a
    weakly LARGER candidate pool than the single-chip global top-R, so
    recall vs the dequantized-f32 oracle is ≥ the single-chip path's.
    Row validity is carried by ``ids >= 0`` (padding rows store id -1).

    ``centroids``/``cells`` enable residual-SQ8 decoding (x̂ = c_cell +
    s·codes, index/quantized.py module docstring): the centroid table
    replicates over the mesh (nlist·D f32 — ~22 MB), cell ids shard with
    their rows, and each shard adds its rows' exact-f32 q·c_cell term."""
    residual = centroids is not None

    def shard_fn(q_loc, c_loc, s_loc, nsq_loc, lab_loc, ids_loc, excl_loc,
                 *resid_args):
        rows_per_shard = c_loc.shape[0]
        shard_i = jax.lax.axis_index(INDEX_AXIS)
        larger_better = metric in ("IP", "COSINE")

        # Quantize the query batch (replicated along 'index': same q8 on
        # every shard, so global row scores are shard-invariant).
        q_scale = jnp.maximum(jnp.max(jnp.abs(q_loc), -1) / 127.0, 1e-12)
        q8 = jnp.clip(jnp.round(q_loc / q_scale[:, None]), -127, 127
                      ).astype(jnp.int8)
        prod = jax.lax.dot_general(
            q8, c_loc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.float32)
        qx = prod * (q_scale[:, None] * s_loc[None, :])
        hi0 = jax.lax.Precision.HIGHEST
        if residual:
            cents_loc, cells_loc = resid_args
            qcent = jax.lax.dot_general(
                q_loc.astype(jnp.float32), cents_loc,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=hi0)  # [b, nlist]
            safe_cells = jnp.maximum(cells_loc, 0)
            qx = qx + jnp.take(qcent, safe_cells, axis=1)
        if larger_better:
            scores = qx
        else:
            qsq = jnp.sum(q_loc.astype(jnp.float32) ** 2, -1, keepdims=True)
            scores = -(qsq - 2.0 * qx + nsq_loc[None, :])

        if exclude_mode == "self":
            mask = ((ids_loc < 0)[None, :]
                    | (ids_loc[None, :] == excl_loc[:, None]))
        else:
            excl_all = jax.lax.all_gather(excl_loc, DATA_AXIS).reshape(-1)
            row_excl = jnp.any(ids_loc[:, None] == excl_all[None, :],
                               axis=1)
            mask = ((ids_loc < 0) | row_excl)[None, :]
        scores = jnp.where(mask, -jnp.inf, scores)

        r = min(max(4 * k, 32), rows_per_shard)
        cand_scores, cand_idx = jax.lax.top_k(scores, r)  # [b, r]

        # f32 rerank of dequantized candidates vs the unquantized query.
        cand = jnp.take(c_loc, cand_idx.reshape(-1), axis=0
                        ).astype(jnp.float32)
        cand = cand.reshape(cand_idx.shape + (c_loc.shape[-1],))
        cand = cand * jnp.take(s_loc, cand_idx.reshape(-1)
                               ).reshape(cand_idx.shape)[..., None]
        if residual:
            cc = jnp.take(cells_loc, cand_idx.reshape(-1))
            cand = cand + jnp.take(cents_loc, jnp.maximum(cc, 0), axis=0
                                   ).reshape(cand.shape)
        hi = jax.lax.Precision.HIGHEST
        qc = jnp.einsum("bd,brd->br", q_loc, cand, precision=hi)
        if larger_better:
            exact = qc
        else:
            csq = jnp.take(nsq_loc, cand_idx.reshape(-1)
                           ).reshape(cand_idx.shape)
            qsq = jnp.einsum("bd,bd->b", q_loc, q_loc, precision=hi)[:, None]
            exact = -(qsq - 2.0 * qc + csq)
        exact = jnp.where(jnp.isfinite(cand_scores), exact, -jnp.inf)

        vals, pos = jax.lax.top_k(exact, k)  # [b, k] local exact top-k
        loc_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
        gidx = shard_i * rows_per_shard + loc_idx
        gidx = jnp.where(jnp.isfinite(vals), gidx, -1)
        cand_vecs = jnp.take_along_axis(cand, pos[..., None], axis=1)
        cand_vecs = jnp.where((gidx >= 0)[..., None], cand_vecs, 0.0)
        cand_labs = jnp.where(
            gidx >= 0, jnp.take(lab_loc, loc_idx.reshape(-1)
                                ).reshape(loc_idx.shape), 0.0)
        return _merge_shard_candidates(vals, gidx, cand_vecs, cand_labs,
                                       k, metric)

    in_specs = [P(DATA_AXIS, None), P(INDEX_AXIS, None), P(INDEX_AXIS),
                P(INDEX_AXIS), P(INDEX_AXIS), P(INDEX_AXIS), P(DATA_AXIS)]
    args = [q, codes, scales, norm_sq, labels, ids, exclude_ids]
    if residual:
        in_specs += [P(), P(INDEX_AXIS)]  # centroids replicated; cells
        args += [centroids, cells]        # shard with their rows
    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None),
                   P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )(*args)
    return ShardedRetrieval(*out)


def sharded_retrieve_ivf_gather(
    mesh: Mesh,
    q: jnp.ndarray,  # [B, D] — sharded over 'data'
    vectors: jnp.ndarray,  # [cap, D] — sharded over 'index' (rows)
    labels: jnp.ndarray,  # [cap]
    ids: jnp.ndarray,  # [cap]; -1 on padding rows
    exclude_ids: jnp.ndarray,  # [B] — sharded over 'data'
    centroids: jnp.ndarray,  # [nlist, D] — replicated
    cells: jnp.ndarray,  # [cap] i32 — sharded over 'index'
    chunk_rows: jnp.ndarray,  # [S*NC, w] i32 LOCAL row ids — 'index'
    cell_chunks: jnp.ndarray,  # [S*nlist, MC] i32 local chunk ids — 'index'
    n_valid_shard: jnp.ndarray,  # [S] i32 valid rows per shard — 'index'
    *,
    k: int,
    nprobe: int,
    budget: int,
    metric: str = "L2",
    exclude_mode: str = "batch",
) -> ShardedRetrieval:
    """Gather-probed IVF over the sharded database — the multi-chip form of
    ``index/ivf_gather.py::ivf_gather_search_chunked`` (low-batch serving:
    each shard gathers only its probed cells' chunks instead of scanning
    its whole HBM slice, then the same ONE-all_gather merge).

    Exactness contract: identical to the masked sharded IVF
    (``sharded_retrieve`` with centroids/cells) — every shard's candidate
    set is unconditionally ALL its local rows of the query's ``nprobe``
    probed cells. Per-shard chunk tables hold only valid local rows, the
    probe-cell selection uses the replicated centroids (same cell set on
    every shard), and a shard whose probed chunks exceed ``budget`` for
    ANY local query falls back in-graph (``lax.cond``) to its dense
    masked probed scan. Merge of per-shard exact top-k cannot drop a
    global top-k member.
    """
    if metric != "L2":
        raise ValueError("gather-probed IVF is an L2 path (IVF contract)")
    nlist = centroids.shape[0]
    nprobe_eff = min(int(nprobe), nlist)

    def shard_fn(q_loc, v_loc, lab_loc, ids_loc, cells_loc, cr_loc, cc_loc,
                 nv_loc, excl_loc):
        rows_per_shard = v_loc.shape[0]
        b = q_loc.shape[0]
        w = cr_loc.shape[1]
        maxc = cc_loc.shape[1]
        shard_i = jax.lax.axis_index(INDEX_AXIS)
        n_valid = nv_loc[0]
        hi = jax.lax.Precision.HIGHEST

        if exclude_mode == "self":
            # serving: each query excludes only its own id (shard-local)
            row_excl = None
        else:
            # Reference parity: batch-global exclusion
            # (pipeline.py:461-463).
            excl_all = jax.lax.all_gather(excl_loc, DATA_AXIS).reshape(-1)
            row_excl = jnp.any(ids_loc[:, None] == excl_all[None, :],
                               axis=1)

        qsq = jnp.einsum("bd,bd->b", q_loc, q_loc, precision=hi)
        qc = (qsq[:, None]
              - 2.0 * jax.lax.dot_general(
                  q_loc, centroids, (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32, precision=hi)
              + jnp.sum(centroids ** 2, -1)[None, :])
        _, probe = jax.lax.top_k(-qc, nprobe_eff)  # [b, nprobe]

        cand_ch = jnp.take(cc_loc, probe, axis=0).reshape(
            b, nprobe_eff * maxc)
        ch_valid = cand_ch >= 0
        pslots = nprobe_eff * maxc
        budget_eff = min(int(budget), pslots)
        pos = jnp.arange(pslots, dtype=jnp.int32)[None, :]
        key = jnp.where(ch_valid, pos, pos + pslots)
        order = jnp.argsort(key, axis=1)[:, :budget_eff]
        sel = jnp.take_along_axis(cand_ch, order, axis=1)  # [b, budget]
        overflowed = jnp.any(jnp.sum(ch_valid, axis=1) > budget_eff)

        def gather_branch(_):
            def one(args):
                qi, si, qsq_i, excl_i = args
                rows = jnp.take(cr_loc, jnp.maximum(si, 0), axis=0)
                rows = jnp.where(si[:, None] >= 0, rows, -1
                                 ).reshape(budget_eff * w)
                safe = jnp.maximum(rows, 0)
                vs = jnp.take(v_loc, safe, axis=0)
                qx = jax.lax.dot_general(
                    qi[None, :], vs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hi)[0]
                xsq = jnp.einsum("cd,cd->c", vs, vs, precision=hi)
                scores = -(qsq_i - 2.0 * qx + xsq)
                if exclude_mode == "self":
                    bad = (rows < 0) | (jnp.take(ids_loc, safe) == excl_i)
                else:
                    bad = (rows < 0) | jnp.take(row_excl, safe)
                scores = jnp.where(bad, -jnp.inf, scores)
                top, p = jax.lax.top_k(scores, k)
                return top, jnp.where(jnp.isfinite(top),
                                      jnp.take(rows, p), -1)

            return jax.lax.map(one, (q_loc, sel, qsq, excl_loc))

        def scan_branch(_):
            # Dense masked probed scan over the local shard (the masked
            # sharded-IVF formulation): membership scatter + gather.
            scores = _local_scores(q_loc, v_loc, metric)
            member = jnp.zeros((b, nlist), jnp.bool_)
            member = member.at[
                jnp.arange(b, dtype=jnp.int32)[:, None], probe].set(True)
            probe_mask = jnp.take(member, cells_loc, axis=1, mode="clip")
            row_ids = jax.lax.broadcasted_iota(
                jnp.int32, (rows_per_shard, 1), 0)[:, 0]
            if exclude_mode == "self":
                excl_rows = ids_loc[None, :] == excl_loc[:, None]
            else:
                excl_rows = row_excl[None, :]
            bad = (excl_rows | (row_ids >= n_valid)[None, :]
                   | ~probe_mask)
            scores = jnp.where(bad, -jnp.inf, scores)
            vals, loc_idx = jax.lax.top_k(scores, k)
            return vals, jnp.where(jnp.isfinite(vals), loc_idx, -1)

        vals, loc_idx = jax.lax.cond(overflowed, scan_branch,
                                     gather_branch, None)
        safe_loc = jnp.maximum(loc_idx, 0)
        gidx = jnp.where(loc_idx >= 0,
                         shard_i * rows_per_shard + loc_idx, -1)
        cand_vecs = jnp.take(v_loc, safe_loc.reshape(-1), axis=0)
        cand_vecs = cand_vecs.reshape(loc_idx.shape + (v_loc.shape[-1],))
        cand_vecs = jnp.where((gidx >= 0)[..., None], cand_vecs, 0.0)
        cand_labs = jnp.where(
            gidx >= 0, jnp.take(lab_loc, safe_loc.reshape(-1)
                                ).reshape(loc_idx.shape), 0.0)
        return _merge_shard_candidates(vals, gidx, cand_vecs, cand_labs,
                                       k, metric)

    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(INDEX_AXIS, None), P(INDEX_AXIS),
                  P(INDEX_AXIS), P(INDEX_AXIS), P(INDEX_AXIS, None),
                  P(INDEX_AXIS, None), P(INDEX_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None),
                   P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )(q, vectors, labels, ids, cells, chunk_rows, cell_chunks,
      n_valid_shard, exclude_ids)
    return ShardedRetrieval(*out)


def build_sharded_chunk_tables(cells: np.ndarray, n_valid: int, nlist: int,
                               num_shards: int
                               ) -> Tuple[np.ndarray, np.ndarray,
                                          np.ndarray, list]:
    """Per-shard chunk tables for ``sharded_retrieve_ivf_gather``.

    ``cells`` is the CAPACITY-padded assignment (rows beyond ``n_valid``
    are padding and excluded from every table — padding lives only in the
    tail shards since rows pad at the end). Returns host arrays shaped for
    `'index'`-axis sharding: chunk_rows [S*NC, w] (LOCAL row ids),
    cell_chunks [S*nlist, MC], n_valid_shard [S], plus the per-shard
    (cell_chunks, counts) pairs for budget sizing at query time.
    """
    from radad_tpu.index.ivf_gather import build_chunk_table

    cells = np.asarray(cells)
    s = int(num_shards)
    rps = cells.shape[0] // s
    # Common chunk width from the mean LOCAL cell size (pow2 in [8, 128]),
    # mirroring FlatIndex._build_gather_tables.
    mean_cell = max(1.0, n_valid / max(1, s * nlist))
    w = 8
    while w * 2 <= min(128, mean_cell):
        w *= 2
    per = []
    for i in range(s):
        lo = i * rps
        vn = int(np.clip(n_valid - lo, 0, rps))
        per.append(build_chunk_table(cells[lo:lo + rps], vn, nlist,
                                     chunk=w))
    nc = max(cr.shape[0] for cr, _, _ in per)
    mc = max(cc.shape[1] for _, cc, _ in per)
    chunk_rows = np.full((s * nc, w), -1, np.int32)
    cell_chunks = np.full((s * nlist, mc), -1, np.int32)
    budget_stats = []
    for i, (cr, cc, cnt) in enumerate(per):
        chunk_rows[i * nc:i * nc + cr.shape[0]] = cr
        # chunk ids are LOCAL to the shard's [NC, w] slice
        cc_pad = np.full((nlist, mc), -1, np.int32)
        cc_pad[:, :cc.shape[1]] = cc
        cell_chunks[i * nlist:(i + 1) * nlist] = cc_pad
        budget_stats.append((cc_pad, cnt))
    n_valid_shard = np.array(
        [int(np.clip(n_valid - i * rps, 0, rps)) for i in range(s)],
        np.int32)
    return chunk_rows, cell_chunks, n_valid_shard, budget_stats


class ShardedIndex:
    """Host wrapper: pads DB rows to a multiple of the 'index' axis size and
    places each array with its mesh sharding. Drop-in provider of the
    arguments ``sharded_retrieve`` needs inside a pjit-ted train step."""

    def __init__(self, mesh: Mesh, dimension: int, metric: str = "L2"):
        self.mesh = mesh
        self.dimension = dimension
        self.metric = metric.upper()
        self.n = 0
        self.vectors = None
        self.labels = None
        self.ids = None
        self.row_valid = None
        self.paths: list = []
        # gather-probed IVF state (build_ivf)
        self.centroids = None
        self.cells = None
        self.chunk_rows = None
        self.cell_chunks = None
        self.n_valid_shard = None
        self._budget_stats = None

    @property
    def num_shards(self) -> int:
        return self.mesh.shape[INDEX_AXIS]

    def build(self, vectors: np.ndarray, labels: np.ndarray,
              ids: np.ndarray, paths=None) -> None:
        n, d = vectors.shape
        if d != self.dimension:
            raise ValueError(f"dim mismatch: {d} != {self.dimension}")
        if self.metric == "COSINE":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=-1, keepdims=True), 1e-12)
        s = self.num_shards
        cap = ((n + s - 1) // s) * s
        pad = cap - n
        vec_p = np.pad(np.asarray(vectors, np.float32), ((0, pad), (0, 0)))
        lab_p = np.pad(np.asarray(labels, np.float32), (0, pad))
        ids_p = np.pad(np.asarray(ids, np.int32), (0, pad),
                       constant_values=-1)
        valid = np.zeros((cap,), bool)
        valid[:n] = True
        row_shard = NamedSharding(self.mesh, P(INDEX_AXIS, None))
        vec_shard = NamedSharding(self.mesh, P(INDEX_AXIS))
        self.vectors = jax.device_put(vec_p, row_shard)
        self.labels = jax.device_put(lab_p, vec_shard)
        self.ids = jax.device_put(ids_p, vec_shard)
        self.row_valid = jax.device_put(valid, vec_shard)
        self.n = n
        self.paths = list(paths) if paths is not None else []

    def retrieve(self, q: jnp.ndarray, exclude_ids: jnp.ndarray, k: int,
                 exclude_mode: str = "batch") -> ShardedRetrieval:
        if self.metric == "COSINE":
            q = q / jnp.maximum(jnp.linalg.norm(q, -1, keepdims=True), 1e-12)
        return sharded_retrieve(
            self.mesh, q, self.vectors, self.labels, self.ids,
            self.row_valid, exclude_ids, k=k,
            metric=self.metric, exclude_mode=exclude_mode)

    def build_ivf(self, centroids: np.ndarray, cells: np.ndarray) -> None:
        """Attach IVF state for the gather-probed sharded path: the
        replicated coarse quantizer plus per-shard chunk tables over the
        capacity-padded cell assignment (``cells`` covers valid rows; it
        is padded here to match ``build()``'s row padding)."""
        if self.vectors is None:
            raise RuntimeError("build() before build_ivf()")
        cap = self.vectors.shape[0]
        nlist = int(np.asarray(centroids).shape[0])
        cells_p = np.zeros((cap,), np.int32)
        cells_p[: self.n] = np.asarray(cells, np.int32)[: self.n]
        chunk_rows, cell_chunks, n_valid_shard, stats = (
            build_sharded_chunk_tables(cells_p, self.n, nlist,
                                       self.num_shards))
        rep = NamedSharding(self.mesh, P())
        row_shard = NamedSharding(self.mesh, P(INDEX_AXIS, None))
        vec_shard = NamedSharding(self.mesh, P(INDEX_AXIS))
        self.centroids = jax.device_put(
            np.asarray(centroids, np.float32), rep)
        self.cells = jax.device_put(cells_p, vec_shard)
        self.chunk_rows = jax.device_put(chunk_rows, row_shard)
        self.cell_chunks = jax.device_put(cell_chunks, row_shard)
        self.n_valid_shard = jax.device_put(n_valid_shard, vec_shard)
        self._budget_stats = stats

    def gather_budget(self, nprobe: int) -> int:
        """Static chunk budget = max over shards of the count-weighted
        statistic (ivf_gather.default_chunk_budget) — every shard must
        share one shape."""
        from radad_tpu.index.ivf_gather import default_chunk_budget

        return max(default_chunk_budget(cc, cnt, nprobe)
                   for cc, cnt in self._budget_stats)

    def retrieve_gather(self, q: jnp.ndarray, exclude_ids: jnp.ndarray,
                        k: int, nprobe: int, exclude_mode: str = "batch"
                        ) -> ShardedRetrieval:
        """Gather-probed IVF retrieval (low-batch serving): each shard
        touches only its probed cells' chunks. Same candidate set as the
        masked sharded IVF path by construction."""
        if self.chunk_rows is None:
            raise RuntimeError("build_ivf() before retrieve_gather()")
        return sharded_retrieve_ivf_gather(
            self.mesh, q, self.vectors, self.labels, self.ids,
            exclude_ids, self.centroids, self.cells, self.chunk_rows,
            self.cell_chunks, self.n_valid_shard, k=k, nprobe=nprobe,
            budget=self.gather_budget(nprobe), metric=self.metric,
            exclude_mode=exclude_mode)
