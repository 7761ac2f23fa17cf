"""Scalar-quantized (int8) flat index: 4× scan bandwidth on the MXU.

The TPU counterpart of FAISS's SQ8 scalar quantizer family (the reference
exposes FAISS's fp16 option, ``vector_database.py:78-84``; int8 is the next
rung). Rows are stored as symmetric per-row int8 codes + one f32 scale:

    x̂ᵢ = sᵢ · codesᵢ,   sᵢ = max|xᵢ| / 127

The scan quantizes the query batch the same way and runs an **int8×int8
matmul with int32 accumulation on the MXU** — 4× less HBM traffic than f32
and int8 MXU throughput — then rescales:  q·x̂ ≈ s_q·sᵢ·(q8 · codes₈).
A final f32 re-rank over the top-R candidates (dequantized codes vs the
*unquantized* f32 query) removes the query-quantization error, so results
are exact with respect to the stored (rounded) database — the same
exactness contract as the bf16 mode.

L2 uses stored ‖x̂‖² norms; COSINE normalizes rows before quantization.

Residual mode (``residual_nlist > 0``) — FAISS's IVF-SQ ``by_residual``
encoding applied to this flat scan: rows are encoded as int8 of the
residual against their nearest coarse centroid,

    x̂ᵢ = c_{cellᵢ} + sᵢ · codesᵢ,   sᵢ = max|xᵢ − c_{cellᵢ}| / 127

On clustered data the residual's dynamic range is the within-cluster
spread, not the cluster offsets, so the quantization step shrinks ~4×
(measured) and recall vs the f32 oracle recovers (0.9625 → 0.9938 at
100k × 512; plain SQ8's 1M-row recall was the scheme's weak point —
docs/PERFORMANCE.md). Scan cost is unchanged: the extra term
q·c_{cell} is one tiny [B, nlist] f32 GEMM + a per-row gather fused
into the existing [B, N] elementwise, and the centroid table (nlist·D
f32, ~22 MB at 1024 × 5376) rides beside the codes. The centroids are
an ENCODING device only — search still scans every row (no probing),
so this composes with, but does not replace, the IVF index mode.
"""

from __future__ import annotations

import json
import os
import pickle
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PAD = 1024


def _round_up(n: int, m: int = _PAD) -> int:
    return max(m, ((n + m - 1) // m) * m)


def quantize_rows(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """→ (int8 codes, f32 per-row scales)."""
    scale = np.max(np.abs(x), axis=-1) / 127.0
    scale = np.maximum(scale, 1e-12)
    codes = np.clip(np.round(x / scale[:, None]), -127, 127).astype(np.int8)
    return codes, scale.astype(np.float32)


def quantize_refinement(r2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """int4 refinement codec: the SECOND residual level (x minus the int8
    reconstruction) packed two nibbles per byte → (uint8 [N, D/2] packed,
    f32 [N] scales). With per-row symmetric int8 whose error is ±step/2,
    max|r2| ≈ step/2, so the refinement step is ~step/14 — a combined
    ~12-bit code at 1.5 bytes/dim (capacity budget: 8.1 GB at 1M × 5376
    vs bf16's 10.75 GB). This is the "int4 on the residual" capacity-mode
    recall fix (VERDICT r4 #7; FAISS's re-ranking-refinement regime)."""
    assert r2.shape[-1] % 2 == 0, "refinement needs an even dimension"
    scale = np.maximum(np.max(np.abs(r2), axis=-1) / 7.0, 1e-12)
    q4 = np.clip(np.round(r2 / scale[:, None]), -7, 7).astype(np.int8)
    packed = ((q4[:, 0::2] & 0xF) |
              ((q4[:, 1::2] & 0xF) << 4)).astype(np.uint8)
    return packed, scale.astype(np.float32)


def _unpack_nibbles_np(packed: np.ndarray) -> np.ndarray:
    """numpy twin of ``unpack_refinement``'s nibble decode (unscaled):
    packed uint8 [..., D/2] → int8 [..., D]. ONE definition of the
    nibble layout for the host-side consumers (norms, reconstruct)."""
    lo = (packed & 0xF).astype(np.int8)
    hi = (packed >> 4).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    return np.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,))


def unpack_refinement(packed, scales):
    """jnp: packed uint8 [..., D/2] + per-row scales [...] → f32 [..., D]
    refinement values (sign-extended 4-bit two's complement nibbles)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = (packed >> 4).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    vals = jnp.stack([lo, hi], axis=-1).reshape(
        packed.shape[:-1] + (packed.shape[-1] * 2,))
    return vals.astype(jnp.float32) * scales[..., None]


@partial(jax.jit, static_argnames=("k", "metric", "n_valid",
                                   "exclude_mode", "rerank_depth"))
def _sq8_search(q, v_codes, v_scale, v_norm_sq, ids, exclude_ids, k, *,
                metric, n_valid, codes3=None, exclude_mode="batch",
                centroids=None, cells=None, codes2=None, scales2=None,
                rerank_depth=None):
    """int8 MXU scan + f32 rerank of dequantized candidates.

    Two rerank formulations:
      * ``codes3`` present (TPU, lane-aligned D): hierarchical tile
        candidate select (index/flat._hier_candidates) + the fused Pallas
        DMA-gather kernel with in-VMEM dequantization (ops/rerank.py) —
        measured 0.49 ms/batch(256) at ITW scale → ~525k QPS, vs 101k for
        the XLA formulation below (round-1 number, NOTES.md).
      * fallback (CPU / unaligned D): ``lax.top_k`` overfetch + XLA
        take-gather rerank.

    Both are exact w.r.t. the stored (quantized) rows among the candidate
    pool; recall@5 vs the unquantized-f32 oracle is a property of SQ8
    rounding (~0.99 measured on random data).
    """
    cap = v_codes.shape[0]
    larger_better = metric in ("IP", "COSINE")

    # Quantize the query batch symmetrically (per query row).
    q_scale = jnp.maximum(jnp.max(jnp.abs(q), axis=-1) / 127.0, 1e-12)
    q8 = jnp.clip(jnp.round(q / q_scale[:, None]), -127, 127
                  ).astype(jnp.int8)

    # int8 × int8 → int32 on the MXU; rescale to approximate q·x̂.
    prod = jax.lax.dot_general(
        q8, v_codes, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.float32)
    qx = prod * (q_scale[:, None] * v_scale[None, :])
    hi0 = jax.lax.Precision.HIGHEST
    if centroids is not None:
        # residual mode: q·x̂ = q·c_cell + s·(q·codes). The centroid term
        # is EXACT f32 (tiny [B, nlist] GEMM + per-row gather), so only
        # the small residual rides through int8.
        qcent = jax.lax.dot_general(
            q.astype(jnp.float32), centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi0)  # [B, nlist]
        safe_cells = jnp.maximum(cells, 0)
        qx = qx + jnp.take(qcent, safe_cells, axis=1)
    qsq = jnp.sum(q.astype(jnp.float32) ** 2, -1, keepdims=True)
    if larger_better:
        scores = qx
    else:
        scores = -(qsq - 2.0 * qx + v_norm_sq[None, :])

    row = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    invalid = (row >= n_valid)[None, :]
    if exclude_mode == "batch":
        # batch-global exclusion (reference parity, pipeline.py:461-463)
        row_excl = jnp.any(ids[:, None] == exclude_ids[None, :], axis=1)
        mask = invalid | row_excl[None, :]
    else:  # "self": each query excludes only its own file (predict_batch —
        # independent requests must not exclude each other's files)
        mask = invalid | (ids[None, :] == exclude_ids[:, None])
    scores = jnp.where(mask, -jnp.inf, scores)
    hi = jax.lax.Precision.HIGHEST

    if codes3 is not None:
        from radad_tpu.index.flat import _hier_candidates
        from radad_tpu.ops.rerank import exact_dot

        b, d = q.shape
        # spill unused: SQ8 is approximate by contract (int8 rounding),
        # so no exactness certificate applies here.
        cand_scores, cand_idx, _ = _hier_candidates(scores, k)
        safe = jnp.clip(cand_idx, 0, cap - 1)
        sub_pad = codes3.shape[1]  # D padded up for int8 sublane alignment
        q3 = jnp.pad(q.astype(jnp.float32),
                     ((0, 0), (0, sub_pad * 128 - d))
                     ).reshape(b, sub_pad, 128)
        qc_raw = exact_dot(q3, codes3, safe)
        row_scale = jnp.take(v_scale, safe.reshape(-1)).reshape(safe.shape)
        qc = qc_raw * row_scale
        if centroids is not None:
            cand_cells = jnp.take(cells, safe.reshape(-1)
                                  ).reshape(safe.shape)
            qc = qc + jnp.take_along_axis(
                qcent, jnp.maximum(cand_cells, 0), axis=1)
        if codes2 is not None:
            # int4 refinement term on the candidates only (B·R rows):
            # q·r2̂ via an XLA gather + einsum — small beside the O(N)
            # scan; the Pallas kernel stays int8-only.
            ref = unpack_refinement(
                jnp.take(codes2, safe.reshape(-1), axis=0),
                jnp.take(scales2, safe.reshape(-1)))
            qc = qc + jnp.einsum(
                "bd,brd->br", q,
                ref.reshape(safe.shape + (q.shape[1],)), precision=hi)
    else:
        # floor at k: a depth override below k would feed top_k(exact, k)
        # fewer than k candidates (ValueError)
        r = (min(max(int(rerank_depth), k), cap) if rerank_depth
             else min(max(4 * k, 32), cap))
        cand_scores, cand_idx = jax.lax.top_k(scores, r)
        safe = jnp.clip(cand_idx, 0, cap - 1)
        cand = jnp.take(v_codes, safe.reshape(-1), axis=0
                        ).astype(jnp.float32)
        cand = cand.reshape(safe.shape + (v_codes.shape[-1],))
        cand = cand * jnp.take(v_scale, safe.reshape(-1)
                               ).reshape(safe.shape)[..., None]
        if centroids is not None:
            cand_cells = jnp.take(cells, safe.reshape(-1))
            cand = cand + jnp.take(
                centroids, jnp.maximum(cand_cells, 0), axis=0
            ).reshape(cand.shape)
        if codes2 is not None:
            cand = cand + unpack_refinement(
                jnp.take(codes2, safe.reshape(-1), axis=0),
                jnp.take(scales2, safe.reshape(-1))).reshape(cand.shape)
        qc = jnp.einsum("bd,brd->br", q, cand, precision=hi)

    if larger_better:
        exact = qc
    else:
        csq = jnp.take(v_norm_sq, safe.reshape(-1)).reshape(safe.shape)
        exact = -(qsq - 2.0 * qc + csq)
    exact = jnp.where(jnp.isfinite(cand_scores), exact, -jnp.inf)

    top, pos = jax.lax.top_k(exact, k)
    idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    ok = jnp.isfinite(top)
    dists = top if larger_better else -top
    dists = jnp.where(ok, dists, -jnp.inf if larger_better else jnp.inf)
    # Dequantized neighbor vectors for the top-k only (B·k rows — tiny).
    top_safe = jnp.maximum(idx, 0)
    nb = jnp.take(v_codes, top_safe.reshape(-1), axis=0).astype(jnp.float32)
    nb = nb.reshape(top_safe.shape + (v_codes.shape[-1],))
    nb = nb * jnp.take(v_scale, top_safe.reshape(-1)
                       ).reshape(top_safe.shape)[..., None]
    if centroids is not None:
        top_cells = jnp.take(cells, top_safe.reshape(-1))
        nb = nb + jnp.take(centroids, jnp.maximum(top_cells, 0), axis=0
                           ).reshape(nb.shape)
    if codes2 is not None:
        nb = nb + unpack_refinement(
            jnp.take(codes2, top_safe.reshape(-1), axis=0),
            jnp.take(scales2, top_safe.reshape(-1))).reshape(nb.shape)
    neighbors = jnp.where(ok[..., None], nb, 0.0)
    return dists, jnp.where(ok, idx, -1), neighbors


def retrieve_on_device_sq8(tpp, codes, scales, norm_sq, labels, ids,
                           exclude_ids, *, k, metric, n_valid, codes3=None,
                           exclude_mode="batch", centroids=None,
                           cells=None, codes2=None, scales2=None,
                           rerank_depth=None):
    """In-graph SQ8 retrieval with the same contract as
    ``radad_tpu.train.pipeline.retrieve_on_device``: → (neighbors [B,k,D]
    dequantized, labels [B,k], dists [B,k], idx [B,k])."""
    q = tpp
    if metric == "COSINE":
        q = q / jnp.maximum(jnp.linalg.norm(q, -1, keepdims=True), 1e-12)
    dists, idx, neighbors = _sq8_search(
        q, codes, scales, norm_sq, ids, exclude_ids, k,
        metric=metric, n_valid=n_valid, codes3=codes3,
        exclude_mode=exclude_mode, centroids=centroids, cells=cells,
        codes2=codes2, scales2=scales2, rerank_depth=rerank_depth)
    safe = jnp.maximum(idx, 0)
    nlabels = jnp.where(idx >= 0,
                        jnp.take(labels, safe.reshape(-1)).reshape(idx.shape),
                        0.0)
    return neighbors, nlabels, dists, idx


class QuantizedIndex:
    """int8 flat index with the same search contract as FlatIndex."""

    def __init__(self, dimension: int, metric: str = "L2", *,
                 build_accel: bool = True, capacity: Optional[int] = None,
                 residual_nlist: int = 0, kmeans_iters: int = 25,
                 refine_bits: int = 0, rerank_depth: Optional[int] = None):
        metric = metric.upper()
        if metric not in ("L2", "IP", "COSINE"):
            raise ValueError(f"QuantizedIndex metric must be L2/IP/COSINE, "
                             f"got {metric}")
        self.dimension = int(dimension)
        self.metric = metric
        # Residual encoding (module docstring): int8 of x − c_cell against
        # a coarse k-means codebook trained on the first add's sample.
        # 0 = plain per-row SQ8 (the FAISS flat-SQ8 analogue).
        self.residual_nlist = int(residual_nlist)
        self.kmeans_iters = int(kmeans_iters)
        # int4 refinement level (quantize_refinement): 0 = off, 4 = store
        # a packed second residual level (1.5 B/dim total) reranked and
        # reconstructed at ~12-bit fidelity. Capacity-mode recall fix.
        if refine_bits not in (0, 4):
            raise ValueError("refine_bits must be 0 or 4")
        if refine_bits and dimension % 2:
            raise ValueError("refine_bits=4 needs an even dimension")
        self.refine_bits = int(refine_bits)
        # Fallback-rerank candidate depth override (None = max(4k, 32)).
        # Deeper candidates matter at capacity scale where the int8 scan's
        # rounding noise can push a true neighbor past rank 32.
        self.rerank_depth = rerank_depth
        self.codes2: Optional[jnp.ndarray] = None  # [cap, D/2] uint8
        self.scales2: Optional[jnp.ndarray] = None  # [cap] f32
        self.centroids: Optional[jnp.ndarray] = None  # [nlist, D] f32
        self.cells: Optional[jnp.ndarray] = None  # [cap] i32, -1 pad
        self._centroids_host: Optional[np.ndarray] = None
        # Expected final row count. Growth otherwise doubles capacity via
        # jnp.pad, which holds old+new buffers simultaneously — at 1M×5376
        # the 512k→1M codes+codes3 growth step peaks at ~17 GB and OOMs a
        # 16 GB chip. A capacity hint preallocates once so the peak is the
        # final footprint (~12 GB), making chunked 1M-row builds fit.
        self.capacity_hint = int(capacity) if capacity else 0
        # False when mesh-sharded retrieval consumes the canonical arrays
        # (codes3 would be dead HBM on one device).
        self.build_accel = bool(build_accel)
        self.n = 0
        self.codes: Optional[jnp.ndarray] = None  # [cap, D] int8
        self.codes3: Optional[jnp.ndarray] = None  # [cap, D/128, 128] int8
        self.scales: Optional[jnp.ndarray] = None  # [cap] f32
        self.norm_sq: Optional[jnp.ndarray] = None  # [cap] f32 (‖x̂‖²)
        self.labels: Optional[jnp.ndarray] = None
        self.ids: Optional[jnp.ndarray] = None
        self.paths: List[str] = []
        self.metadata: List[dict] = []

    @property
    def ntotal(self) -> int:
        return self.n

    def add(self, vectors: np.ndarray, labels: Sequence[float],
            paths: Sequence[str], metadata: Optional[Sequence[dict]] = None,
            ids: Optional[Sequence[int]] = None) -> None:
        from radad_tpu.data.manifest import file_id
        from radad_tpu.utils.transfer import device_to_host, is_device_array

        if is_device_array(vectors):
            # Quantization runs host-side; pull chunked instead of letting
            # ascontiguousarray do one monolithic device→host transfer
            # (the pipeline passes device-resident embeddings here).
            vectors = device_to_host(vectors)
        vectors = np.ascontiguousarray(vectors, np.float32)
        if self.metric == "COSINE":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=-1, keepdims=True), 1e-12)
        if ids is None:
            ids = [file_id(p) for p in paths]
        cells = None
        if self.residual_nlist > 0:
            cells = self._assign_or_train(vectors)
            # Encode the residual chunked (a full-size second f32 copy of
            # a 1M-row add would be another 21.5 GB of host RAM).
            codes = np.empty(vectors.shape, np.int8)
            scales = np.empty(len(vectors), np.float32)
            for lo in range(0, len(vectors), 100_000):
                hi = min(lo + 100_000, len(vectors))
                resid = vectors[lo:hi] - self._centroids_host[cells[lo:hi]]
                codes[lo:hi], scales[lo:hi] = quantize_rows(resid)
        else:
            codes, scales = quantize_rows(vectors)
        codes2 = scales2 = None
        if self.refine_bits:
            # second residual level, chunked like the first
            codes2 = np.empty((len(vectors), self.dimension // 2), np.uint8)
            scales2 = np.empty(len(vectors), np.float32)
            for lo in range(0, len(vectors), 100_000):
                hi = min(lo + 100_000, len(vectors))
                base = vectors[lo:hi]
                if cells is not None:
                    base = base - self._centroids_host[cells[lo:hi]]
                r2 = base - codes[lo:hi].astype(np.float32) \
                    * scales[lo:hi, None]
                codes2[lo:hi], scales2[lo:hi] = quantize_refinement(r2)
        self.paths.extend(list(paths))
        self.metadata.extend(list(metadata) if metadata is not None
                             else [{}] * len(paths))
        labels = np.asarray(labels, np.float32)
        ids = np.asarray(ids, np.int32)
        if self.n == 0:
            self._install_codes(codes, scales, labels, ids, cells=cells,
                                codes2=codes2, scales2=scales2)
        else:
            self._append_codes(codes, scales, labels, ids, cells=cells,
                               codes2=codes2, scales2=scales2)

    def _assign_or_train(self, vectors: np.ndarray) -> np.ndarray:
        """Coarse codebook for residual encoding: train on the first
        add's ≤50k sample (FAISS's train-on-subset pattern,
        vector_database.py:122-130), then assign every row — incremental
        adds assign against the FROZEN codebook, so existing codes stay
        final (the O(new) append contract)."""
        from radad_tpu.index.flat import _assign_cells
        from radad_tpu.index.ivf import kmeans

        if self.centroids is None:
            sample = vectors[:50_000]
            nlist = max(1, min(self.residual_nlist, len(sample)))
            cents, _ = kmeans(jnp.asarray(sample), nlist,
                              iters=self.kmeans_iters, seed=0)
            self.centroids = cents
            self._centroids_host = np.asarray(cents)
        out = np.empty(len(vectors), np.int32)
        for lo in range(0, len(vectors), 100_000):
            hi = min(lo + 100_000, len(vectors))
            out[lo:hi] = np.asarray(jax.jit(_assign_cells)(
                jnp.asarray(vectors[lo:hi]), self.centroids))
        return out

    def _norms_chunked(self, codes: np.ndarray, scales: np.ndarray,
                       cells: Optional[np.ndarray],
                       codes2: Optional[np.ndarray] = None,
                       scales2: Optional[np.ndarray] = None) -> np.ndarray:
        """‖x̂‖² per row, chunked (a single-shot dequant of 1M × 5376 rows
        is 2 × 21.5 GB of f32 temporaries on the host). Residual mode
        includes the centroid (x̂ = c_cell + s·codes); refine mode adds
        the int4 level so the rerank's norms match its reconstruction."""
        n = codes.shape[0]
        norm_sq = np.empty(n, np.float32)
        for lo in range(0, n, 100_000):
            hi = min(lo + 100_000, n)
            deq = codes[lo:hi].astype(np.float32) * scales[lo:hi, None]
            if cells is not None:
                deq = deq + self._centroids_host[cells[lo:hi]]
            if codes2 is not None:
                ref = _unpack_nibbles_np(codes2[lo:hi])
                deq = deq + ref.astype(np.float32) * scales2[lo:hi, None]
            norm_sq[lo:hi] = np.einsum("md,md->m", deq, deq)
        return norm_sq

    def _append_codes(self, codes: np.ndarray, scales: np.ndarray,
                      labels: np.ndarray, ids: np.ndarray,
                      cells: Optional[np.ndarray] = None,
                      codes2: Optional[np.ndarray] = None,
                      scales2: Optional[np.ndarray] = None) -> None:
        """Incremental device-side append, O(new rows) per call.

        Per-row symmetric quantization is independent across rows and
        idempotent — the row max element always rounds to exactly ±127,
        so re-quantizing a dequantized row reproduces the same (codes,
        scale). Existing rows are therefore final: appends upload only the
        new chunk and update the device buffers in place (FlatIndex.add's
        donation pattern; vector_database.py:108-151's chunked adds). The
        pre-round-3 path dequantized + re-quantized the WHOLE index per
        chunk — O(total²) work and ~4 full f32 copies of the DB in host
        RAM (OOM-killed at 1M rows × 5376 on a 125 GB host)."""
        from radad_tpu.index.flat import _dus

        m = codes.shape[0]
        need = self.n + m
        cap = self.codes.shape[0]
        if need > cap:
            pad = _round_up(max(need, 2 * cap, self.capacity_hint)) - cap

            def pad0(a, fill=0):
                widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, widths, constant_values=fill)

            self.codes = pad0(self.codes)
            self.scales = pad0(self.scales)
            self.norm_sq = pad0(self.norm_sq)
            self.labels = pad0(self.labels)
            self.ids = pad0(self.ids, fill=-1)
            if self.cells is not None:
                self.cells = pad0(self.cells, fill=-1)
            if self.codes3 is not None:
                self.codes3 = pad0(self.codes3)
            if self.codes2 is not None:
                self.codes2 = pad0(self.codes2)
                self.scales2 = pad0(self.scales2)
        norm_sq = self._norms_chunked(codes, scales, cells, codes2, scales2)
        start = jnp.int32(self.n)
        dev = jnp.asarray(codes)
        self.codes = _dus(self.codes, dev, start)
        self.scales = _dus(self.scales, jnp.asarray(scales), start)
        self.norm_sq = _dus(self.norm_sq, jnp.asarray(norm_sq), start)
        self.labels = _dus(self.labels, jnp.asarray(labels), start)
        self.ids = _dus(self.ids, jnp.asarray(ids), start)
        if cells is not None:
            self.cells = _dus(self.cells, jnp.asarray(cells), start)
        if codes2 is not None:
            self.codes2 = _dus(self.codes2, jnp.asarray(codes2), start)
            self.scales2 = _dus(self.scales2, jnp.asarray(scales2), start)
        if self.codes3 is not None:
            sub_pad = self.codes3.shape[1]
            rows3 = jnp.pad(
                dev, ((0, 0), (0, sub_pad * 128 - self.dimension))
            ).reshape(m, sub_pad, 128)
            self.codes3 = _dus(self.codes3, rows3, start)
        self.n = need

    def _install_codes(self, codes: np.ndarray, scales: np.ndarray,
                       labels: np.ndarray, ids: np.ndarray,
                       cells: Optional[np.ndarray] = None,
                       codes2: Optional[np.ndarray] = None,
                       scales2: Optional[np.ndarray] = None) -> None:
        """Install int8 codes directly (no re-quantization — a
        quantize(dequantize(·)) round trip can drift codes whose row max
        rounded below 127; VERDICT r1 weak #6)."""
        n = codes.shape[0]
        norm_sq = self._norms_chunked(codes, scales, cells, codes2, scales2)
        cap = _round_up(max(n, self.capacity_hint))
        pad = cap - n
        if codes2 is not None:
            self.codes2 = jnp.asarray(np.pad(codes2, ((0, pad), (0, 0))))
            self.scales2 = jnp.asarray(np.pad(scales2, (0, pad)))
        if cells is not None:
            self.cells = jnp.asarray(
                np.pad(np.asarray(cells, np.int32), (0, pad),
                       constant_values=-1))
        self.codes = jnp.asarray(np.pad(codes, ((0, pad), (0, 0))))
        self.scales = jnp.asarray(np.pad(scales, (0, pad)))
        self.norm_sq = jnp.asarray(np.pad(norm_sq, (0, pad)))
        self.labels = jnp.asarray(
            np.pad(np.asarray(labels, np.float32), (0, pad)))
        self.ids = jnp.asarray(
            np.pad(np.asarray(ids, np.int32), (0, pad), constant_values=-1))
        self.n = n
        # Gather-layout int8 copy for the fused Pallas rerank (TPU only —
        # see index/flat._accel_eligible and ops/rerank.exact_dot).
        from radad_tpu.index.flat import _accel_eligible

        self.codes3: Optional[jnp.ndarray] = None
        if self.build_accel and _accel_eligible(self.dimension, False):
            # int8 DMA slices need the sublane (sub) dim aligned to 8 —
            # zero-pad D up to a multiple of 1024 for the gather copy only
            # (zero feature columns don't change dot products).
            sub = self.dimension // 128
            sub_pad = ((sub + 7) // 8) * 8
            self.codes3 = jax.jit(
                lambda c: jnp.pad(
                    c, ((0, 0), (0, (sub_pad - sub) * 128))
                ).reshape(cap, sub_pad, 128))(self.codes)

    def search(self, queries, k: int, *, exclude_ids=None):
        q = jnp.asarray(np.ascontiguousarray(queries, np.float32))
        if self.metric == "COSINE":
            q = q / jnp.maximum(jnp.linalg.norm(q, -1, keepdims=True), 1e-12)
        if exclude_ids is None:
            exclude_ids = jnp.full((q.shape[0],), -2, jnp.int32)
        else:
            exclude_ids = jnp.asarray(exclude_ids, jnp.int32)
        d, i, _ = _sq8_search(q, self.codes, self.scales, self.norm_sq,
                              self.ids, exclude_ids, k,
                              metric=self.metric, n_valid=self.n,
                              codes3=self.codes3, centroids=self.centroids,
                              cells=self.cells, codes2=self.codes2,
                              scales2=self.scales2,
                              rerank_depth=self.rerank_depth)
        return np.asarray(d), np.asarray(i).astype(np.int64)

    def reconstruct_batch(self, indices) -> np.ndarray:
        idx = np.asarray(indices)
        safe = np.maximum(idx, 0)
        codes = np.asarray(self.codes)[safe.reshape(-1)].astype(np.float32)
        scales = np.asarray(self.scales)[safe.reshape(-1)]
        out = codes * scales[:, None]
        if self.centroids is not None:
            cell = np.asarray(self.cells)[safe.reshape(-1)]
            out = out + self._centroids_host[np.maximum(cell, 0)]
        if self.codes2 is not None:
            ref = _unpack_nibbles_np(np.asarray(self.codes2)[safe.reshape(-1)])
            s2 = np.asarray(self.scales2)[safe.reshape(-1)]
            out = out + ref.astype(np.float32) * s2[:, None]
        out = out.reshape(idx.shape + (self.dimension,))
        return np.where((idx >= 0)[..., None], out, 0.0).astype(np.float32)

    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        arrays = dict(codes=np.asarray(self.codes)[: self.n],
                      scales=np.asarray(self.scales)[: self.n],
                      labels=np.asarray(self.labels)[: self.n],
                      ids=np.asarray(self.ids)[: self.n])
        if self.centroids is not None:
            arrays["centroids"] = self._centroids_host
            arrays["cells"] = np.asarray(self.cells)[: self.n]
        if self.codes2 is not None:
            arrays["codes2"] = np.asarray(self.codes2)[: self.n]
            arrays["scales2"] = np.asarray(self.scales2)[: self.n]
        # atomic (temp + rename): see FlatIndex.save
        from radad_tpu.utils.atomic_io import (atomic_json_dump,
                                               atomic_pickle_dump,
                                               atomic_savez)

        atomic_savez(os.path.join(directory, "sq8_arrays.npz"), **arrays)
        atomic_json_dump({"dimension": self.dimension, "metric": self.metric,
                          "n": self.n,
                          "residual_nlist": self.residual_nlist,
                          "refine_bits": self.refine_bits},
                         os.path.join(directory, "sq8_meta.json"))
        atomic_pickle_dump({"paths": self.paths, "metadata": self.metadata},
                           os.path.join(directory, "sq8_host.pkl"))

    @classmethod
    def load(cls, directory: str, *,
             build_accel: bool = True) -> "QuantizedIndex":
        with open(os.path.join(directory, "sq8_meta.json")) as f:
            meta = json.load(f)
        data = np.load(os.path.join(directory, "sq8_arrays.npz"))
        idx = cls(meta["dimension"], meta["metric"], build_accel=build_accel,
                  residual_nlist=int(meta.get("residual_nlist", 0)),
                  refine_bits=int(meta.get("refine_bits", 0)))
        with open(os.path.join(directory, "sq8_host.pkl"), "rb") as f:
            host = pickle.load(f)
        idx.paths = list(host["paths"])
        idx.metadata = list(host["metadata"])
        cells = None
        if "centroids" in data:
            idx._centroids_host = np.asarray(data["centroids"], np.float32)
            idx.centroids = jnp.asarray(idx._centroids_host)
            cells = np.asarray(data["cells"], np.int32)
        idx._install_codes(
            data["codes"], data["scales"], data["labels"], data["ids"],
            cells=cells,
            codes2=data["codes2"] if "codes2" in data else None,
            scales2=data["scales2"] if "scales2" in data else None)
        return idx
