"""HBM-resident flat vector index with fused on-device top-k search.

TPU-native replacement for the reference's FAISS wrapper
(``/root/reference/vector_database.py:8-242``). The reference round-trips
every batch GPU→CPU→FAISS→CPU→GPU (pipeline.py:456,522); here the reference
embeddings live in device HBM as a plain ``[capacity, D]`` array and a query
is a single jit-compiled matmul + k-select that composes into the training
step graph — no host transfer at all.

Supported metrics (vector_database.py:56-98 parity):
  * ``L2``      — squared L2 distance, smaller is better (FAISS IndexFlatL2
                  also returns *squared* distances);
  * ``IP``      — inner product, larger is better (IndexFlatIP);
  * ``COSINE``  — IP over L2-normalized rows and queries
                  (vector_database.py:97-105's ``_cosine`` mode);
  * ``IVF``     — L2 with an inverted-file coarse quantizer (see
                  ``radad_tpu.index.ivf``); search restricts to the nprobe
                  nearest cells.

Self-exclusion: the reference overfetches ``k+10`` then filters matches by
file basename in a Python loop (pipeline.py:478-509). Here every row stores
an int32 basename id and exclusion is an on-device mask (distance := +inf)
before the k-select — exact, O(N), no overfetch. An overfetch-parity helper
is kept for tests.

Persistence is array-native (npz + json) instead of FAISS's opaque binary
format (vector_database.py:190-242).

Metadata (paths, speaker ids) stays host-side, parallel to the device
arrays, exactly as the reference keeps Python lists next to the FAISS index
(vector_database.py:15-17).
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

from radad_tpu.ops import topk as topk_ops

import logging

logger = logging.getLogger(__name__)

_PAD = 1024  # capacity quantum: keeps search shapes stable across small adds
_LANES = 128  # TPU lane width: tile size for the hierarchical k-select


def _accel_eligible(dimension: int, use_float16: bool = False) -> bool:
    """The two-stage fast-exact path (bf16 scan + fused Pallas rerank)
    needs lane-aligned rows and a real TPU backend. Works for both f32
    and bf16 (use_float16) storage — the rerank is exact w.r.t. the
    STORED rows either way (``use_float16`` is accepted for signature
    stability; both storage modes are eligible)."""
    del use_float16
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - no devices at all
        return False
    return dimension % _LANES == 0 and backend == "tpu"


def _round_up(n: int, m: int = _PAD) -> int:
    return max(m, ((n + m - 1) // m) * m)


class FlatIndex:
    """Brute-force (exact) index over clip embeddings.

    Device state: ``vectors [cap, D] f32``, ``labels [cap] f32``,
    ``ids [cap] i32`` (basename hash per row, for self-exclusion), with rows
    ``>= n`` masked out of every search. Host state: paths + metadata lists.
    """

    metric_kinds = ("L2", "IP", "COSINE", "IVF")

    def __init__(self, dimension: int, metric: str = "L2", *,
                 nlist: int = 0, nprobe: int = 32,
                 kmeans_iters: int = 25,
                 ivf_balance: float = 0.0,
                 ivf_retrain_on_add: bool = True,
                 use_pallas: Optional[bool] = None,
                 use_float16: bool = False,
                 single_buffer: bool = False,
                 add_batch_size: int = 10000,
                 build_accel: bool = True):
        metric = metric.upper()
        if metric not in self.metric_kinds:
            raise ValueError(f"Unknown index metric: {metric}")
        self.dimension = int(dimension)
        self.metric = metric
        # bf16 database storage — the TPU analogue of FAISS-GPU's
        # GpuIndexFlatConfig.useFloat16 (vector_database.py:78-84): halves
        # HBM traffic for the scan at the cost of bf16-rounded distances
        # (neighbor order is exact w.r.t. the *stored* rounded vectors).
        self.use_float16 = bool(use_float16)
        # Capacity mode (bf16 storage only): keep ONE device buffer — skip
        # the gather-layout rerank copy, whose separate tiling XLA cannot
        # alias with the scan matrix (a jit-side reshape materializes a
        # full relayout: 11.45 GB HLO temp at N=1e6 D=5376 bf16, OOM on a
        # 16 GB v5e). Search stays certified-exact w.r.t. the stored rows;
        # the rerank runs as an XLA take + HIGHEST dot (see
        # _search_fast_exact). This is how a million-row ITW-dimension DB
        # (10.7 GB bf16) fits one chip — FAISS-GPU's useFloat16 regime
        # (/root/reference/vector_database.py:78-84).
        self.single_buffer = bool(single_buffer) and self.use_float16
        self.nlist = int(nlist)  # configured target; see _train_ivf
        self.nlist_effective: int = 0  # trained cell count (≤ nlist)
        self.nprobe = int(nprobe)
        # Lloyd iterations for IVF centroid training; default 25 = FAISS's
        # ClusteringParameters.niter, which the reference's IndexIVFFlat
        # training inherits (vector_database.py:122-130).
        self.kmeans_iters = int(kmeans_iters)
        # Split-refinement strength for centroid training (0 = plain
        # Lloyd = FAISS parity). Balances Voronoi cell sizes, which the
        # gather-probed serving path's latency scales with; the
        # assignment/probe rule stays plain nearest-centroid either way
        # (see index.ivf.kmeans).
        self.ivf_balance = float(ivf_balance)
        # True (default): every add() retrains the coarse quantizer on the
        # merged set — better cells under distribution drift, one k-means
        # per add() call. False: FAISS parity — IndexIVFFlat trains once
        # (the reference trains on a ≤50k subset at creation,
        # vector_database.py:122-130) and add() only ASSIGNS new rows to
        # the existing cells (O(new) device work; the right setting for
        # incremental serving ingestion at capacity scale).
        self.ivf_retrain_on_add = bool(ivf_retrain_on_add)
        # Upload granularity for incremental adds — the reference's
        # config.vector_add_batch_size / add_vectors_batch chunking
        # (vector_database.py:108-151).
        self.add_batch_size = int(add_batch_size)
        # False when the caller consumes the canonical arrays directly
        # (mesh-sharded retrieval): skips building the single-device
        # fast-exact accelerator copies (~1.5x DB of dead HBM otherwise).
        self.build_accel = bool(build_accel)
        self.upload_count = 0  # device uploads of vector rows (test probe)
        self.n = 0
        self._cap = 0
        self.vectors: Optional[jnp.ndarray] = None  # [cap, D] f32 (normalized for COSINE)
        self.labels: Optional[jnp.ndarray] = None  # [cap] f32
        self.ids: Optional[jnp.ndarray] = None  # [cap] i32
        self.norms_sq: Optional[jnp.ndarray] = None  # [cap] f32 exact row norms
        self.scan_bf16: Optional[jnp.ndarray] = None  # [cap, D] bf16 scan copy
        self.resid_bf16: Optional[jnp.ndarray] = None  # [cap, D] bf16 rounding residuals
        self.gather3: Optional[jnp.ndarray] = None  # [cap, D/128, 128] f32
        self.paths: List[str] = []
        self.metadata: List[dict] = []
        # IVF state (row -> cell assignment; rows are NOT reordered)
        self.centroids: Optional[jnp.ndarray] = None  # [nlist, D]
        self.cells: Optional[jnp.ndarray] = None  # [cap] i32
        # Gather-probed IVF (sublinear low-batch search; ivf_gather.py):
        # dense inverted-list table + overflow, built by _train_ivf.
        self.ivf_table: Optional[jnp.ndarray] = None  # [nlist, span] i32
        self.ivf_overflow: Optional[jnp.ndarray] = None  # [V] i32
        # Chunked variant of the same lists (build_chunk_table): kills the
        # span table's padding on imbalanced cells — preferred by search()
        # when it touches fewer rows.
        self.ivf_chunk_rows: Optional[jnp.ndarray] = None  # [NC, 128] i32
        self.ivf_cell_chunks: Optional[jnp.ndarray] = None  # [nlist, MC] i32
        self._ivf_cell_chunks_host: Optional[np.ndarray] = None  # host copy
        self.ivf_counts: Optional[np.ndarray] = None  # [nlist] i32 host
        self._chunk_budget_cache: dict = {}  # np_eff -> static chunk budget
        # Default to the XLA path: measured on v5e, one matmul + lax.top_k
        # runs the flat scan at ~790 GB/s effective — essentially HBM
        # speed-of-light — while the fused Pallas kernel's in-kernel k-select
        # currently lowers poorly on the VPU (~127 GB/s). The kernel remains
        # available (use_pallas=True) and is the substrate for quantized-DB
        # modes where XLA cannot fuse the dequant+scan.
        self.use_pallas = bool(use_pallas) if use_pallas is not None else False
        # Host-level search() splits larger query batches into fixed-shape
        # device calls (see search); 2048 keeps the rerank kernel's SMEM
        # row prefetch (B·r2·4 bytes of a 1 MB budget) and the [2B, cap]
        # scan output comfortably bounded at any DB size.
        self.search_chunk = 2048

    # ------------------------------------------------------------------
    @property
    def ntotal(self) -> int:
        return self.n

    def _normalize(self, x: np.ndarray) -> np.ndarray:
        norms = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.maximum(norms, 1e-12)

    def add(self, vectors: np.ndarray, labels: Sequence[float],
            paths: Sequence[str], metadata: Optional[Sequence[dict]] = None,
            ids: Optional[Sequence[int]] = None, *,
            donate: bool = False) -> None:
        """Append rows (vector_database.py:108-151's add_vectors_batch).

        Incremental and device-side: only the NEW rows are uploaded (in
        ``add_batch_size`` chunks, the reference's 10k default), existing
        device rows are never read back to the host, and the in-place
        update uses jit buffer donation so repeated chunked adds are O(new)
        per call, not O(total). Capacity grows by doubling (padded to the
        1024-row quantum) so search shapes stay cache-stable.

        ``donate=True`` (device-array ``vectors`` only) lets the install
        consume the caller's buffer instead of copying it — mandatory at
        capacity scale, where an un-donated install holds two full DB
        buffers transiently (2 × 10.7 GB at 1M × 5376 bf16 on a 16 GB
        chip). The caller must not touch ``vectors`` afterwards."""
        from radad_tpu.data.manifest import file_id
        from radad_tpu.utils.transfer import device_to_host, is_device_array

        if is_device_array(vectors):
            # Device passthrough: embeddings computed on-device (the
            # pipeline's DB build) are installed without a host round
            # trip — at ITW scale that round trip costs ~60 s through
            # this environment's relay (utils/transfer.py).
            # bf16 rows headed for bf16 storage skip the f32 upcast: at
            # capacity scale that upcast is a 21.5 GB allocation for data
            # the install would round straight back to bf16 (the stored
            # rounded rows ARE the mode's ground truth).
            keep_bf16 = (self.use_float16 and self.metric != "COSINE"
                         and vectors.dtype == jnp.bfloat16)
            if vectors.dtype != jnp.float32 and not keep_bf16:
                vectors = jax.jit(lambda v: v.astype(jnp.float32))(vectors)
            if self.metric == "COSINE":
                vectors = jax.jit(
                    lambda v: v / jnp.maximum(
                        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
                )(vectors)
        else:
            vectors = np.ascontiguousarray(vectors, dtype=np.float32)
            if self.metric == "COSINE":
                vectors = self._normalize(vectors)
        if vectors.ndim != 2 or vectors.shape[1] != self.dimension:
            raise ValueError(
                f"expected [N, {self.dimension}] vectors, got {vectors.shape}")
        n_new = vectors.shape[0]
        if not (len(labels) == len(paths) == n_new):
            raise ValueError("labels/paths length mismatch with vectors")
        if ids is None:
            ids = [file_id(p) for p in paths]
        labels = np.asarray(labels, np.float32)
        ids = np.asarray(ids, np.int32)
        self.paths.extend(list(paths))
        self.metadata.extend(list(metadata) if metadata is not None
                             else [{} for _ in range(n_new)])

        if self.n == 0:
            self.upload_count += 1
            self._install(vectors, labels, ids, donate=donate)
            return
        old_n = self.n
        bs = self.add_batch_size or n_new
        for i in range(0, n_new, bs):
            self._append_chunk(vectors[i:i + bs], labels[i:i + bs],
                               ids[i:i + bs])
        if self.metric == "IVF":
            if self.centroids is None or self.ivf_retrain_on_add:
                # Coarse quantizer retrains on the merged set. The host
                # pull is bounded to the k-means training subset (FAISS
                # caps training at ≤50k rows) — pulling every live row
                # is 21.5 GB at 1M×5376 through a slow link, for rows
                # _train_ivf would slice away anyway.
                self._train_ivf(device_to_host(
                    self.vectors, limit=min(self.n, 50000)))
            else:
                self._extend_ivf(old_n)

    def _grow_to(self, new_cap: int) -> None:
        """Device-side capacity growth (no host transfer)."""
        pad_rows = new_cap - self._cap

        def pad0(a, fill=0):
            widths = [(0, pad_rows)] + [(0, 0)] * (a.ndim - 1)
            return jnp.pad(a, widths, constant_values=fill)

        self.vectors = pad0(self.vectors)
        self.norms_sq = pad0(self.norms_sq)
        self.labels = pad0(self.labels)
        self.ids = pad0(self.ids, fill=-1)
        if self.scan_bf16 is not None:
            self.scan_bf16 = pad0(self.scan_bf16)
            if self.gather3 is not None:
                self.gather3 = pad0(self.gather3)
            if self.resid_bf16 is not None:
                self.resid_bf16 = pad0(self.resid_bf16)
        if self.cells is not None:
            self.cells = pad0(self.cells)
        self._cap = new_cap

    def _append_chunk(self, vec: np.ndarray, lab: np.ndarray,
                      idc: np.ndarray) -> None:
        m = vec.shape[0]
        need = self.n + m
        if need > self._cap:
            self._grow_to(_round_up(max(need, 2 * self._cap)))
        dev = jnp.asarray(vec, self.vectors.dtype)  # the one upload
        self.upload_count += 1
        start = jnp.int32(self.n)
        self.vectors = _dus(self.vectors, dev, start)
        self.norms_sq = _dus(
            self.norms_sq, jnp.sum(jnp.square(dev.astype(jnp.float32)), -1),
            start)
        self.labels = _dus(self.labels, jnp.asarray(lab, jnp.float32), start)
        self.ids = _dus(self.ids, jnp.asarray(idc, jnp.int32), start)
        if self.scan_bf16 is not None:
            if not self.use_float16:  # bf16 storage shares self.vectors
                rows_bf = dev.astype(jnp.bfloat16)
                self.scan_bf16 = _dus(self.scan_bf16, rows_bf, start)
                self.resid_bf16 = _dus(
                    self.resid_bf16,
                    (dev - rows_bf.astype(jnp.float32)
                     ).astype(jnp.bfloat16), start)
            else:
                self.scan_bf16 = self.vectors
            if self.gather3 is not None:
                sub_pad = self.gather3.shape[1]
                rows3 = jnp.pad(
                    dev, ((0, 0), (0, sub_pad * _LANES - self.dimension))
                ).reshape(m, sub_pad, _LANES)
                self.gather3 = _dus(self.gather3, rows3, start)
        self.n = need

    def _install(self, vecs, labels: np.ndarray, ids: np.ndarray,
                 ivf_state: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 donate: bool = False) -> None:
        """Install rows; ``ivf_state=(centroids, cells)`` restores a
        trained coarse quantizer (load path) instead of re-running
        k-means — FAISS's write_index/read_index persists the trained
        quantizer too (vector_database.py:190-216)."""
        self.n = vecs.shape[0]
        self._cap = _round_up(self.n)
        pad = self._cap - self.n
        store_dt = jnp.bfloat16 if self.use_float16 else jnp.float32
        from radad_tpu.utils.transfer import is_device_array

        ivf_train_src = None  # set when the donate path consumes ``vecs``
        if is_device_array(vecs):
            if donate and pad == 0 and vecs.dtype == store_dt:
                # Zero-copy adoption: the caller's buffer IS the index.
                self.vectors = vecs
            elif donate:
                # Pad/cast consuming the input — never two full DB
                # buffers live at once (the capacity-scale requirement).
                # The k-means training slice is materialized FIRST: the
                # donation below deletes ``vecs``.
                if self.metric == "IVF" and ivf_state is None:
                    ivf_train_src = vecs[: min(vecs.shape[0], 50000)]
                self.vectors = jax.jit(
                    lambda v: jnp.pad(v, ((0, pad), (0, 0))).astype(
                        store_dt), donate_argnums=0)(vecs)
            else:
                # Device-resident install: pad/cast in one jit, zero host
                # traffic. NOT donated: the caller keeps its array (the
                # pipeline passes its cached embedding matrix here and
                # slices epoch batches from it afterwards).
                self.vectors = jax.jit(
                    lambda v: jnp.pad(v, ((0, pad), (0, 0))).astype(
                        store_dt))(vecs)
        else:
            self.vectors = jnp.asarray(
                np.pad(vecs, ((0, pad), (0, 0))), store_dt)
        labels_p = np.pad(labels, (0, pad))
        ids_p = np.pad(ids, (0, pad), constant_values=-1)
        # Exact f32 row norms, computed once ON DEVICE: saves a full second
        # DB read per L2 search (measured ~0.7 ms/batch at ITW scale), and
        # never pulls the matrix to the host (the pre-round-3 version did —
        # a ~50 s d2h at ITW scale through this environment's relay).
        self.norms_sq = jax.jit(
            lambda v: jnp.sum(jnp.square(v.astype(jnp.float32)), -1)
        )(self.vectors)
        self.labels = jnp.asarray(labels_p)
        self.ids = jnp.asarray(ids_p)
        # Fast-exact search accelerator arrays (TPU + f32 + lane-aligned D):
        # a bf16 copy for the stage-1 scan (halves the HBM-bound read) and
        # an f32 gather-layout copy for the fused Pallas rerank (stage 2).
        # Measured v5e @ ITW scale: 0.92 ms/batch(256) vs 2.4 ms for the
        # single HIGHEST-precision scan — exact (recall@5 = 1.0 vs the f32
        # numpy oracle, asserted in bench.py).
        self.scan_bf16: Optional[jnp.ndarray] = None
        self.gather3: Optional[jnp.ndarray] = None
        self.resid_bf16: Optional[jnp.ndarray] = None
        if self.build_accel and _accel_eligible(self.dimension):
            # bf16 storage: the stored array IS the scan copy, and the
            # gather source stays bf16 (rerank casts rows to f32 in VMEM —
            # exact w.r.t. the stored rounded vectors, the mode's
            # contract). Sub-f32 dtypes need the gather-layout sublane dim
            # padded to a multiple of 8 (Mosaic DMA slice alignment).
            self.scan_bf16 = (self.vectors if self.use_float16 else jax.jit(
                lambda v: v.astype(jnp.bfloat16))(self.vectors))
            if not self.use_float16:
                # bf16 rounding residuals of the stored f32 rows: the
                # x-side error-correction term of the certified scan
                # (see _search_fast_exact; halves the certificate margin
                # 52 -> ~27 units at ITW scale so heavy-tail queries still
                # certify). bf16 storage: stored rows ARE the truth, r=0.
                self.resid_bf16 = jax.jit(
                    lambda v, s: (v - s.astype(jnp.float32)
                                  ).astype(jnp.bfloat16))(
                    self.vectors, self.scan_bf16)
            if not self.single_buffer:
                sub = self.dimension // _LANES
                sub_pad = (sub if not self.use_float16
                           else ((sub + 7) // 8) * 8)
                self.gather3 = jax.jit(
                    lambda v: jnp.pad(
                        v, ((0, 0), (0, (sub_pad - sub) * _LANES))
                    ).reshape(v.shape[0], sub_pad, _LANES))(self.vectors)
        if self.metric == "IVF" and self.n:
            if ivf_state is not None:
                self._restore_ivf(*ivf_state)
            else:
                self._train_ivf(vecs if ivf_train_src is None
                                else ivf_train_src)

    def _restore_ivf(self, centroids: np.ndarray, cells: np.ndarray
                     ) -> None:
        """Adopt a persisted (centroids, cells) pair: pad the assignment
        to capacity, rebuild the gather tables — no k-means."""
        self.centroids = jnp.asarray(centroids, jnp.float32)
        self.nlist_effective = int(centroids.shape[0])
        cells = np.asarray(cells, np.int32)[: self.n]
        cells_p = np.pad(cells, (0, self._cap - self.n))
        self.cells = jnp.asarray(cells_p)
        self._build_gather_tables(cells_p, self.nlist_effective)

    def _extend_ivf(self, old_n: int) -> None:
        """FAISS-parity incremental add (``ivf_retrain_on_add=False``):
        assign ONLY the rows appended since ``old_n`` to the existing
        trained cells (faiss ``IndexIVFFlat.add`` never retrains) and
        rebuild the inverted-list tables. O(new) device compute; the only
        host traffic is the [cap] int32 cell vector (4 MB at 1M rows)."""
        cells = np.array(self.cells)  # writable host copy
        if cells.shape[0] < self._cap:  # capacity grew since training
            cells = np.pad(cells, (0, self._cap - cells.shape[0]))
        assign_j = jax.jit(_assign_cells)
        chunk = 131_072
        for lo in range(old_n, self.n, chunk):
            hi = min(self.n, lo + chunk)
            cells[lo:hi] = np.asarray(
                assign_j(self.vectors[lo:hi], self.centroids))
        self.cells = jnp.asarray(cells)
        self._build_gather_tables(cells, self.nlist_effective)

    def _build_gather_tables(self, cells: np.ndarray, nlist: int) -> None:
        """Span + chunk inverted-list tables for the gather-probed path
        (ivf_gather.py): 8-16 MB combined at nlist=4096 — cheap enough to
        always keep alongside the masked-scan state."""
        from radad_tpu.index.ivf_gather import (build_cell_table,
                                                build_chunk_table)

        table, _, overflow = build_cell_table(cells, self.n, nlist)
        self.ivf_table = jnp.asarray(table)
        self.ivf_overflow = jnp.asarray(overflow)
        self._chunk_budget_cache = {}  # np_eff -> static budget (host)
        # Chunk width tracks the mean cell size (pow2 in [8, 128]): 128 at
        # 1M/4096 (mean 244), 8 on small/test DBs where a fixed 128 would
        # make budget*chunk exceed the gather-dispatch gate (2*touched<N)
        # and silently force every query onto the O(N) masked scan.
        mean_cell = max(1.0, self.n / max(1, nlist))
        chunk = 8
        while chunk * 2 <= min(128, mean_cell):
            chunk *= 2
        chunk_rows, cell_chunks, counts = build_chunk_table(
            cells, self.n, nlist, chunk=chunk)
        self.ivf_chunk_rows = jnp.asarray(chunk_rows)
        self.ivf_cell_chunks = jnp.asarray(cell_chunks)
        self._ivf_cell_chunks_host = cell_chunks  # budget calc stays host-side
        self.ivf_counts = counts

    def _train_ivf(self, vecs: np.ndarray) -> None:
        from radad_tpu.index.ivf import kmeans

        # Reference default: nlist = max(64, config.ivf_nlist=4096)
        # (vector_database.py:66-68) — clamped here to the training-set
        # size (FAISS hard-errors when nx < k; we degrade gracefully
        # since synthetic/test DBs are often < 4096 rows). The clamp is
        # PER RETRAIN, not permanent: ``self.nlist`` keeps the configured
        # target, so an index that grows past it regains cell granularity
        # at the next retrain (adds retrain the coarse quantizer, same as
        # re-running FAISS ``index.train``); ``self.nlist_effective``
        # exposes the trained cell count.
        nlist = self.nlist or max(64, 4096)
        train = vecs[: min(len(vecs), 50000)]  # FAISS-style capped train set
        if nlist > len(train):
            logger.info("IVF nlist %d > %d training rows; clamping",
                        nlist, len(train))
            nlist = max(1, len(train))
        self.nlist_effective = nlist
        # f32 cast covers bf16-storage installs where the training slice
        # arrives as bf16 device rows (k-means itself runs in f32).
        cents, _ = kmeans(jnp.asarray(train, jnp.float32), nlist,
                          iters=self.kmeans_iters, seed=0,
                          balance=self.ivf_balance)
        self.centroids = cents
        # Chunked assignment: the [N, nlist] distance matrix is 16 GB at
        # 1M rows x nlist=4096 — never materialize it whole.
        cap = self.vectors.shape[0]
        cells = np.empty((cap,), np.int32)
        assign_j = jax.jit(_assign_cells)
        chunk = 131_072
        for lo in range(0, cap, chunk):
            cells[lo:lo + chunk] = np.asarray(
                assign_j(self.vectors[lo:lo + chunk], cents))
        # padded rows get some cell; masked by n anyway
        self.cells = jnp.asarray(cells)
        self._build_gather_tables(cells, nlist)

    def chunk_budget(self, np_eff: int) -> int:
        """Static chunk budget for the gather-probed path at ``np_eff``
        probes — a pure function of the HOST-resident tables, cached so
        the serving hot path (search() and the predict-graph cache key)
        never re-pulls the chunk table device→host per call (~10 ms
        through a relay at nlist=4096)."""
        from radad_tpu.index.ivf_gather import default_chunk_budget

        budget = self._chunk_budget_cache.get(np_eff)
        if budget is None:
            budget = default_chunk_budget(
                self._ivf_cell_chunks_host, self.ivf_counts, np_eff)
            self._chunk_budget_cache[np_eff] = budget
        return budget

    # ------------------------------------------------------------------
    def search(self, queries, k: int, *, exclude_ids=None,
               nprobe: Optional[int] = None,
               gather: Optional[bool] = None,
               _ids=None, _exclude_mode: str = "batch"
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k over the index: → (distances [B,k], indices [B,k]).

        ``indices`` are row ids into the index; invalid slots (k > ntotal)
        return index -1 and distance +inf/-inf, mirroring FAISS's convention
        (vector_database.py:159-182 clamps k to ntotal; we mask instead so
        shapes stay static).
        ``exclude_ids [B]`` masks rows whose stored basename id matches
        (the on-device form of pipeline.py:494-501's self-filter).
        ``nprobe`` overrides the constructor value for this call only (IVF),
        matching the reference's per-search ``index.nprobe`` assignment
        (vector_database.py:175-179). A new value compiles a new search
        graph (nprobe is a static shape parameter).
        ``gather`` (IVF only) forces the gather-probed path (True), the
        masked scan (False), or picks by cost (None, default): the gather
        path touches B*nprobe*span rows instead of all N, so it wins for
        low-batch/serving queries and loses to the batch-amortized scan
        for training-sized batches (see ivf_gather.py).
        """
        if self.n == 0:
            b = np.asarray(queries).shape[0]
            return (np.full((b, k), np.inf, np.float32),
                    np.full((b, k), -1, np.int64))
        qarr = np.ascontiguousarray(queries, dtype=np.float32)
        if qarr.shape[0] > self.search_chunk:
            # FAISS-parity: arbitrary nq in one call. Device graphs scale
            # with B — the rerank kernel's SMEM row prefetch (B·r2 i32 vs
            # a 1 MB SMEM budget) and the [2B, cap] scan output both blow
            # up on whole-split batches (measured: a 25,423-query call
            # OOMs SMEM at ITW scale). Run fixed-shape chunks with a
            # padded tail so ONE compiled graph serves any nq. Exclusion
            # stays CALL-global (one union from the whole call's ids,
            # pipeline.py:461-463 semantics): the union is folded into the
            # stored-id column ONCE here (excluded rows' ids rewritten to
            # the -3 sentinel — the same state the per-chunk "batch" fold
            # would produce), so each chunk skips the O(cap·E) refold and
            # pays only the [B, cap] sentinel compare it does anyway.
            ids_use, ex_mode, ex_chunk = None, "batch", None
            if exclude_ids is not None:
                union = np.unique(np.asarray(exclude_ids, np.int32))
                # Pad to a 1024 quantum (with the matches-nothing -2
                # sentinel) to bound the helper's compile variants.
                union = np.pad(union, (0, -len(union) % 1024),
                               constant_values=-2)
                ids_use = _fold_exclusion_union(
                    self.ids, jnp.asarray(union, jnp.int32))
                ex_mode = "self"
                ex_chunk = np.full((self.search_chunk,), -3, np.int32)
            cs = self.search_chunk
            dd, ii = [], []
            for lo in range(0, qarr.shape[0], cs):
                qc = qarr[lo:lo + cs]
                pad = cs - qc.shape[0]
                if pad:
                    qc = np.pad(qc, ((0, pad), (0, 0)))
                d, i = self.search(qc, k, exclude_ids=ex_chunk,
                                   nprobe=nprobe, gather=gather,
                                   _ids=ids_use, _exclude_mode=ex_mode)
                dd.append(d[:cs - pad])
                ii.append(i[:cs - pad])
            return np.concatenate(dd), np.concatenate(ii)
        ids_arr = self.ids if _ids is None else _ids
        q = jnp.asarray(qarr)
        if self.metric == "COSINE":
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        if exclude_ids is None:
            exclude_ids = jnp.full((q.shape[0],), -2, jnp.int32)
        else:
            exclude_ids = jnp.asarray(exclude_ids, jnp.int32)
        if self.metric == "IVF" and self.ivf_table is not None:
            from radad_tpu.index.ivf_gather import (
                default_chunk_budget, ivf_gather_search,
                ivf_gather_search_chunked)

            np_eff = min(self.nprobe if nprobe is None else int(nprobe),
                         self.ivf_table.shape[0])
            # Overflow rides along with EVERY query's candidates, so it
            # costs B·V rows, not V (latency model only; results exact).
            touched_span = q.shape[0] * (np_eff * self.ivf_table.shape[1]
                                         + self.ivf_overflow.shape[0])
            budget = self.chunk_budget(np_eff)
            touched_chunk = (q.shape[0] * budget
                             * self.ivf_chunk_rows.shape[1])
            touched = min(touched_span, touched_chunk)
            if gather or (gather is None and 2 * touched < self.n):
                if touched_chunk <= touched_span:
                    dists, idx = ivf_gather_search_chunked(
                        q, self.vectors, self.norms_sq, ids_arr,
                        exclude_ids, self.centroids, self.ivf_chunk_rows,
                        self.ivf_cell_chunks, self.cells, k,
                        nprobe=np_eff, budget=budget, n_valid=self.n,
                        exclude_mode=_exclude_mode)
                else:
                    dists, idx = ivf_gather_search(
                        q, self.vectors, self.norms_sq, ids_arr,
                        exclude_ids, self.centroids, self.ivf_table,
                        self.ivf_overflow, k, nprobe=np_eff,
                        exclude_mode=_exclude_mode)
                return np.asarray(dists), np.asarray(idx).astype(np.int64)
        cells = self.cells if self.metric == "IVF" else None
        cents = self.centroids if self.metric == "IVF" else None
        dists, idx = _search_device(
            q, self.vectors, ids_arr, exclude_ids, k,
            metric=self.metric, n_valid=self.n,
            centroids=cents, cells=cells,
            nprobe=self.nprobe if nprobe is None else int(nprobe),
            use_pallas=self.use_pallas, xsq=self.norms_sq,
            scan_bf16=self.scan_bf16, gather3=self.gather3,
            resid_bf16=self.resid_bf16, exclude_mode=_exclude_mode)
        return np.asarray(dists), np.asarray(idx).astype(np.int64)

    def search_device(self, q: jnp.ndarray, k: int, *,
                      exclude_ids: Optional[jnp.ndarray] = None):
        """Pure-JAX search usable *inside* a jit-compiled training step."""
        if exclude_ids is None:
            exclude_ids = jnp.full((q.shape[0],), -2, jnp.int32)
        if self.metric == "COSINE":
            q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        cells = self.cells if self.metric == "IVF" else None
        cents = self.centroids if self.metric == "IVF" else None
        return _search_device(
            q.astype(jnp.float32), self.vectors, self.ids, exclude_ids, k,
            metric=self.metric, n_valid=self.n,
            centroids=cents, cells=cells, nprobe=self.nprobe,
            use_pallas=self.use_pallas, xsq=self.norms_sq,
            scan_bf16=self.scan_bf16, gather3=self.gather3,
            resid_bf16=self.resid_bf16)

    def search_overfetch(self, queries, k: int,
                         exclude_basenames=None) -> Tuple[np.ndarray, np.ndarray]:
        """Reference-parity retrieval: overfetch k+10, filter self-matches by
        file basename on the host, truncate/pad to k — byte-for-byte the
        semantics of pipeline.py:478-515. Exists for exactness tests against
        the on-device masked search (which is the production path)."""
        import os as _os

        exclude = set(exclude_basenames or ())
        k_search = k + (10 if exclude else 0)
        k_search = min(k_search, max(self.n, 1))
        dists, idxs = self.search(queries, k_search)
        b = dists.shape[0]
        out_d = np.full((b, k), np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int64)
        for row in range(b):
            kept = 0
            for dd, ii in zip(dists[row], idxs[row]):
                if ii < 0:
                    continue
                if exclude and _os.path.basename(
                        self.paths[int(ii)]) in exclude:
                    continue
                out_d[row, kept] = dd
                out_i[row, kept] = ii
                kept += 1
                if kept == k:
                    break
        return out_d, out_i

    def reconstruct_batch(self, indices) -> np.ndarray:
        """Fetch raw stored vectors by row index — a plain gather, replacing
        the reference's per-neighbor ``index.reconstruct(ii)`` Python loop
        (pipeline.py:503). Index -1 returns a zero vector."""
        idx = jnp.asarray(indices, jnp.int32)
        safe = jnp.maximum(idx, 0)
        out = jnp.take(self.vectors, safe.reshape(-1), axis=0)
        out = out.reshape(idx.shape + (self.dimension,)).astype(jnp.float32)
        return np.asarray(
            jnp.where((idx >= 0)[..., None], out, 0.0))

    def labels_for(self, indices) -> np.ndarray:
        idx = np.asarray(indices)
        safe = np.maximum(idx, 0)
        lab = np.asarray(self.labels)[safe.reshape(-1)].reshape(idx.shape)
        return np.where(idx >= 0, lab, 0.0).astype(np.float32)

    # ------------------------------------------------------------------
    def save(self, directory: str) -> None:
        """Array-native persistence (replaces faiss.write_index + pickle,
        vector_database.py:190-216). Every file is written atomically
        (temp + rename) so an interrupted save — e.g. the pipeline's
        background save thread dying at interpreter exit — leaves either
        the old complete index or the new one, never a truncated npz
        beside a stale meta."""
        from radad_tpu.utils.atomic_io import (atomic_json_dump,
                                               atomic_pickle_dump,
                                               atomic_savez)
        from radad_tpu.utils.transfer import device_to_host

        os.makedirs(directory, exist_ok=True)
        arrays = dict(
            # limit=n + per-chunk bf16→f32: never materializes a full-
            # capacity f32 copy on device (21.5 GB at 1M×5376 — OOM beside
            # the bf16 buffer) nor pulls the capacity padding.
            vectors=device_to_host(self.vectors, limit=self.n),
            labels=np.asarray(self.labels)[: self.n],
            ids=np.asarray(self.ids)[: self.n],
        )
        if self.centroids is not None:
            # Trained coarse quantizer + row→cell assignment: load()
            # restores both instead of re-running k-means (minutes at
            # 1M rows), mirroring faiss.write_index persisting the
            # trained IVF quantizer.
            arrays["centroids"] = np.asarray(self.centroids)
            arrays["cells"] = np.asarray(self.cells)[: self.n]
        atomic_savez(os.path.join(directory, "index_arrays.npz"), **arrays)
        meta = dict(dimension=self.dimension, metric=self.metric, n=self.n,
                    nlist=self.nlist, nprobe=self.nprobe,
                    use_float16=self.use_float16,
                    single_buffer=self.single_buffer,
                    kmeans_iters=self.kmeans_iters,
                    ivf_balance=self.ivf_balance,
                    ivf_retrain_on_add=self.ivf_retrain_on_add)
        atomic_json_dump(meta, os.path.join(directory, "index_meta.json"))
        atomic_pickle_dump({"paths": self.paths, "metadata": self.metadata},
                           os.path.join(directory, "index_host.pkl"))

    @classmethod
    def load(cls, directory: str, *, use_pallas: Optional[bool] = None,
             build_accel: bool = True) -> "FlatIndex":
        with open(os.path.join(directory, "index_meta.json")) as f:
            meta = json.load(f)
        idx = cls(meta["dimension"], meta["metric"], nlist=meta.get("nlist", 0),
                  nprobe=meta.get("nprobe", 32), use_pallas=use_pallas,
                  use_float16=meta.get("use_float16", False),
                  # capacity mode survives the roundtrip: loading a 1M-row
                  # single-buffer index must not rebuild the gather3
                  # relayout the mode exists to avoid (OOM on one chip)
                  single_buffer=meta.get("single_buffer", False),
                  # training knobs survive the roundtrip so a post-load
                  # add/retrain reproduces the saved quantizer's regime
                  kmeans_iters=int(meta.get("kmeans_iters", 25)),
                  ivf_balance=float(meta.get("ivf_balance", 0.0)),
                  ivf_retrain_on_add=bool(
                      meta.get("ivf_retrain_on_add", True)),
                  build_accel=build_accel)
        data = np.load(os.path.join(directory, "index_arrays.npz"))
        with open(os.path.join(directory, "index_host.pkl"), "rb") as f:
            host = pickle.load(f)
        idx.paths = list(host["paths"])
        idx.metadata = list(host["metadata"])
        ivf_state = None
        if "centroids" in data and "cells" in data:
            ivf_state = (data["centroids"], data["cells"])
        idx._install(data["vectors"], data["labels"], data["ids"],
                     ivf_state=ivf_state)
        return idx


# ----------------------------------------------------------------------
@partial(jax.jit, donate_argnums=(0,))
def _dus(arr, update, start):
    """In-place (donated) dynamic row update — chunked add without copying
    the whole index (vector_database.py:108-151's chunked adds, minus the
    host round-trip AND minus an O(capacity) device copy per chunk)."""
    idx = (start,) + (jnp.int32(0),) * (arr.ndim - 1)
    return jax.lax.dynamic_update_slice(arr, update.astype(arr.dtype), idx)


def _assign_cells(vectors: jnp.ndarray, centroids: jnp.ndarray) -> jnp.ndarray:
    # HIGHEST: FAISS assigns rows to cells in exact f32; default matmul
    # precision flips near-tied assignments on TPU (build-time-only cost).
    d = (jnp.sum(vectors ** 2, -1, keepdims=True)
         - 2.0 * jax.lax.dot_general(
             vectors, centroids, (((1,), (1,)), ((), ())),
             preferred_element_type=jnp.float32,
             precision=jax.lax.Precision.HIGHEST)
         + jnp.sum(centroids ** 2, -1)[None, :])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def _hier_candidates(scores, k, tiles_hint=None, per_tile_hint=None):
    """Exact hierarchical candidate selection over masked scores [B, cap]
    (cap % 128 == 0): per-tile top-m of the top-T tiles by max.

    Provably ⊇ the exact top-min(T, m) of ``scores``: an element beaten by
    fewer than j others (a) has ≤ j-1 tiles whose max beats its tile's max,
    so its tile ranks ≤ j by tile-max, and (b) is beaten by ≤ j-1 elements
    within its own tile, so it survives j rounds of per-tile max-extract.
    With T = max(8, k), m = max(5, k) the set is an exact superset of the
    top-k PLUS T·m − k near-ties of margin for the stage-1 bf16 rounding.
    When MORE than T·m rows tie within bf16 resolution of the k-th
    neighbor, true f32 neighbors can still be displaced — the third
    return value ``spill`` (the max score among NON-candidates, [B]) lets
    the caller certify the result against a rounding-error bound and fall
    back to a full-precision scan when the certificate fails (see
    ``_search_fast_exact``).

    This replaces ``lax.top_k(scores, R)``, whose sort costs ~0.7 ms at
    [256, 25.6k] on v5e — the tile route is ~0.15 ms.

    Returns (cand_scores [B, T*m], cand_rows [B, T*m] i32, spill [B]).
    """
    b, cap = scores.shape
    pad = (-cap) % _LANES  # no-op for FlatIndex (capacity quantum 1024)
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    nt = (cap + pad) // _LANES
    tiles = min(max(8, k) if tiles_hint is None else max(tiles_hint, k),
                nt)
    per_tile = max(5 if per_tile_hint is None else per_tile_hint, k)
    # STRIDED tiles: tile t = rows {t, t+nt, t+2nt, ...} instead of 128
    # consecutive rows. Manifest order inserts near-duplicate rows (same
    # speaker / attack family) contiguously; with consecutive tiles an
    # entire near-tie cluster lands in ONE tile, the m per-tile
    # extractions spill true neighbors, and the exactness certificate
    # falls back to the full-precision scan every batch (2x perf cliff —
    # tests/test_index.py::test_certificate_holds_on_clustered_embeddings).
    # Striding spreads contiguous clusters across tiles by construction,
    # statelessly; the one [B, cap] transpose costs ~0.1 ms at ITW scale.
    st = jnp.swapaxes(scores.reshape(b, _LANES, nt), 1, 2)  # [B, nt, 128]
    tmax = jnp.max(st, axis=-1)  # [B, nt]
    _, tsel = jax.lax.top_k(tmax, tiles)  # [B, T]
    cand = jnp.take_along_axis(st, tsel[:, :, None], axis=1)  # [B, T, 128]
    # Max over UNSELECTED tiles (one component of the spill bound).
    unsel_max = jnp.max(
        jax.vmap(lambda t, s: t.at[s].set(-jnp.inf))(tmax, tsel), axis=-1)

    # m iterative max-extract rounds. Measured alternatives (round 3):
    # per-tile lax.top_k(cand, m+1) in one op is ~2x SLOWER on v5e (the
    # 128-lane sort costs more than m cheap max/where passes), and the m
    # sequentially-dependent XLA rounds cost 0.24 ms of the 0.39 ms select
    # stage at ITW scale (~40 small dispatches XLA cannot fuse across).
    # On TPU a single Pallas dispatch runs all rounds over the
    # VMEM-resident slab with bit-identical semantics AND emits the flat
    # j-major candidate list + strided row indices directly (round 4: the
    # previous [B, T, 128] vals/lanes outputs cost ~25 MB of HBM writes +
    # slice + swapaxes relayouts per call; ops/topk.extract_candidates,
    # parity pinned by tests/test_index.py::test_extract_candidates_
    # kernel_parity).
    if jax.default_backend() == "tpu":
        from radad_tpu.ops.topk import extract_candidates

        vals, rows, leftover = extract_candidates(cand, tsel, per_tile, nt)
        spill = jnp.maximum(jnp.max(leftover, axis=-1), unsel_max)
        return vals, rows, spill

    col = jax.lax.broadcasted_iota(jnp.int32, (b, tiles, _LANES), 2)
    big = jnp.int32(_LANES)
    vals, rows = [], []
    for _ in range(per_tile):
        best = jnp.max(cand, axis=-1)  # [B, T]
        at_best = cand >= best[..., None]
        bidx = jnp.min(jnp.where(at_best, col, big), axis=-1)
        vals.append(best)
        # strided layout: score row index = lane * nt + tile
        rows.append(jnp.minimum(bidx, _LANES - 1) * nt + tsel)
        cand = jnp.where(col == bidx[..., None], -jnp.inf, cand)
    # Max score NOT in the candidate set: the best value still left in the
    # selected tiles after the m extraction rounds, or the best unselected
    # tile's max.
    spill = jnp.maximum(jnp.max(cand, axis=(-2, -1)), unsel_max)  # [B]
    return (jnp.concatenate(vals, axis=-1),
            jnp.concatenate(rows, axis=-1).astype(jnp.int32),
            spill)


def _search_fast_exact(q, scan_bf16, gather3, xsq, mask, k, larger_better,
                       vectors=None, resid_bf16=None, rerank_depth=None,
                       debug_certified=False):
    """Fast exact search over the accelerator arrays.

    ``vectors`` given (production default): CERTIFIED search — one bf16
    MXU scan, deep-tile candidate selection by the sound rounding-error
    upper bound, exact f32 re-scoring of the top candidates via the fused
    Pallas DMA kernel, and a per-batch soundness certificate; an in-graph
    ``lax.cond`` falls back to a HIGHEST-precision scan when adversarial
    near-ties defeat the bound (property-tested in
    tests/test_index.py::test_fast_exact_near_tie_certificate). See the
    inline design comment for the error algebra and the two measured
    designs this replaced.

    ``vectors=None``: the legacy uncertified path (one bf16 scan +
    T=8-tile select + fused Pallas f32 rerank) — exact on benign spectra,
    defeatable by constructed ties; kept as the SQ8 substrate and the
    property-test foil.
    """
    b, d = q.shape
    cap = scan_bf16.shape[0]
    qf = q.astype(jnp.float32)
    qsq = jnp.sum(qf ** 2, -1, keepdims=True)

    if vectors is None:
        # Legacy uncertified path: single bf16 scan + hierarchical select
        # + fused Pallas f32 rerank. Exact on data whose score gaps exceed
        # bf16 rounding (the measured case at every production scale) but
        # provably defeatable by adversarial near-tie spectra — kept for
        # the SQ8 substrate and as the property-test foil.
        from radad_tpu.ops.rerank import exact_dot

        qx = jax.lax.dot_general(
            q.astype(jnp.bfloat16), scan_bf16,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        scores = qx if larger_better else -(qsq - 2.0 * qx + xsq[None, :])
        scores = jnp.where(mask, -jnp.inf, scores)
        cand_vals, cand_rows, _spill = _hier_candidates(scores, k)
        safe = jnp.clip(cand_rows, 0, cap - 1)
        sub_pad = gather3.shape[1]  # D padded for sub-f32 sublane alignment
        q3 = jnp.pad(qf, ((0, 0), (0, sub_pad * _LANES - d))
                     ).reshape(b, sub_pad, _LANES)
        qc = exact_dot(q3, gather3, safe)
        if larger_better:
            exact = qc
        else:
            csq = jnp.take(xsq, safe.reshape(-1)).reshape(safe.shape)
            exact = -(qsq - 2.0 * qc + csq)
        exact = jnp.where(jnp.isfinite(cand_vals), exact, -jnp.inf)
        top_scores, pos = jax.lax.top_k(exact, k)
        top_idx = jnp.take_along_axis(cand_rows, pos, axis=1)
        valid = jnp.isfinite(top_scores)
        dists = top_scores if larger_better else -top_scores
        idx = jnp.where(valid, top_idx, -1).astype(jnp.int32)
        dists = jnp.where(valid, dists,
                          jnp.inf if not larger_better else -jnp.inf)
        return dists, idx

    # --- Certified deep-tile path (production default) -------------------
    # Design forced by measurement (round 3):
    #   * the one-pass bf16 scan's sound worst-case score error is
    #     c·2⁻⁸·‖q‖·‖x_row‖ (~52 distance units at ITW scale) — any row
    #     whose bf16 score is within that margin of the k-th must be
    #     re-scored EXACTLY for a certificate to pass (~15-25 rows on
    #     benign ITW-scale data, spread over ~15-20 lane tiles);
    #   * with the default T=8 tiles the max non-candidate sits at
    #     ~rank 9 → certificate passes for only 16-18/256 queries → the
    #     full-precision fallback runs every batch (measured 4× slower);
    #   * a residual-corrected scan (q·x ≈ q_bf·x_bf + qr_bf·x_bf +
    #     q_bf·r_bf, margins ~2⁻¹⁸-scale) fixes the OUTER boundary but a
    #     rerank-free variant then needs adjacent-rank gaps > 2·margin at
    #     the k-th/k+1-th CANDIDATE boundary — ~20% per-query failure ⇒
    #     the batch-level all() still always fails (measured, again 4×).
    #
    # So: select DEEP (T=24 tiles × m=5 extractions) by the upper-bound
    # score, exactly re-rank the top-R2=48 candidates by upper bound with
    # the fused Pallas DMA kernel (exact scores ⇒ no inner margin at the
    # returned boundary), and certify only the outer boundary: every row
    # not exactly re-scored has UB ≤ max(spill_ub, 49th-candidate UB) ≈
    # score@rank≳40 + margin, which the k-th exact score clears by ~30+
    # units on benign data. Adversarial near-tie spectra (>R2 rows inside
    # the margin) fail the certificate and fall back in-graph to a
    # HIGHEST-precision scan — property-tested in
    # tests/test_index.py::test_fast_exact_near_tie_certificate.
    from radad_tpu.ops.rerank import exact_dot

    # Two-sided rounding correction (round 3, v2). Split the query into
    # hi+lo bf16 halves (q ≈ q_hi + q_lo exactly to 2⁻¹⁸ relative) and
    # scan with THREE corrected terms:
    #     q·x ≈ q_hi·x_bf + q_lo·x_bf + q_hi·r,   r = bf16(x − x_bf)
    # The two q-side terms come from ONE stacked [2B, D] GEMM, so x_bf is
    # still read once; HBM traffic is unchanged vs the one-sided version
    # (x_bf + r reads) and only the MXU work grows by ~50 % (~+0.3 ms at
    # ITW scale). Residual error: q_r2·x + q·x_r2 + q_lo·r + f32
    # accumulation ≤ ~1.6·2⁻¹⁷·‖q‖·‖x_row‖ → margins of ~0.3-0.6 score
    # units at ITW scale.
    #
    # Measured necessity (real TPP embeddings, not gaussians): embedding
    # rows cluster so tightly that the 5th→193rd exact-score gap can be
    # ~6 units while the ONE-SIDED margin (2⁻⁹ scale) is ~50-89 units —
    # the batch certificate failed for ~82 % of real queries and the
    # HIGHEST-precision fallback ran every production batch. With
    # two-sided margins (max 0.35 measured) vs the real 5th→33rd gap
    # (min 13.1), the certificate holds with ≥37× headroom.
    # (experiments/profile_retrieval.py; NOTES.md "near-tie saga, v2".)
    metric_fac = 2.0 if not larger_better else 1.0  # L2 doubles dot error
    q_hi = q.astype(jnp.bfloat16)
    if resid_bf16 is not None or vectors.dtype == jnp.bfloat16:
        q_lo = (qf - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q2 = jnp.concatenate([q_hi, q_lo], axis=0)  # [2B, D]
        out2 = jax.lax.dot_general(
            q2, scan_bf16,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        qx = out2[:b] + out2[b:]
        if resid_bf16 is not None:
            qx = qx + jax.lax.dot_general(
                q_hi, resid_bf16,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        # bf16 storage (resid None): stored rows ARE the truth — the
        # q-split alone leaves only ~2⁻¹⁸-scale error.
        mfac = jnp.float32(metric_fac * 1.3 * 2.0 ** -16)
    else:
        # f32 truth without a residual array (direct test calls): both
        # roundings uncorrected
        qx = jax.lax.dot_general(
            q_hi, scan_bf16,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        mfac = jnp.float32(metric_fac * 1.25 * 2.0 ** -8)
    scores = qx if larger_better else -(qsq - 2.0 * qx + xsq[None, :])
    scores = jnp.where(mask, -jnp.inf, scores)

    qnorm = jnp.sqrt(jnp.maximum(jnp.sum(qf ** 2, -1), 0.0))  # [B]
    rownorm = jnp.sqrt(jnp.maximum(xsq, 0.0))  # [cap]
    margin = mfac * qnorm[:, None] * rownorm[None, :]  # [B, cap]
    ub = jnp.where(mask, -jnp.inf, scores + margin)

    # T=24 tiles × m=8 extractions: pushes the max non-candidate upper
    # bound (spill_ub) past ~rank 35 even when top rows cluster in a few
    # tiles (dataset insertion order puts similar rows in adjacent tiles).
    # Measured at T=24/m=5: 254/256 queries certified with min gap
    # -1.04 units — the two marginal queries made the batch-level all()
    # fail and the fallback ran EVERY batch; deeper extraction buys the
    # last ~35 units of headroom for ~0.05 ms.
    cand_ub, cand_rows, spill_ub = _hier_candidates(
        ub, k, tiles_hint=max(24, 2 * k), per_tile_hint=8)
    r_all = cand_ub.shape[1]  # T·m candidates
    # Exactly re-scored subset. Depth 32 is the default: the rerank
    # kernel's query-block size is 256//R, so R=32 packs 8 queries per
    # grid step (0.12 ms) where R=48 packs 5 (0.50 ms) — and the benign
    # certificate holds with ~30 units of headroom at the rank-33
    # boundary (see experiments/profile_retrieval.py; adversarial
    # spectra still fall back in-graph).
    r2 = min(r_all, max(32, 2 * k) if rerank_depth is None
             else max(rerank_depth, k))
    sel_ub, sel = jax.lax.top_k(cand_ub, min(r2 + 1, r_all))
    if r2 < r_all:
        # max UB among candidates NOT exactly re-scored
        unreranked_ub = sel_ub[:, -1]
        sel_ub, sel = sel_ub[:, :r2], sel[:, :r2]
    else:
        unreranked_ub = jnp.full((b,), -jnp.inf, jnp.float32)
    rows2 = jnp.take_along_axis(cand_rows, sel, axis=1)  # [B, r2]
    safe = jnp.clip(rows2, 0, cap - 1)

    if gather3 is not None:
        sub_pad = gather3.shape[1]  # D padded for sub-f32 sublane alignment
        q3 = jnp.pad(qf, ((0, 0), (0, sub_pad * _LANES - d))
                     ).reshape(b, sub_pad, _LANES)
        qc = exact_dot(q3, gather3, safe)
    else:
        # Single-buffer capacity mode (FlatIndex(single_buffer=True)):
        # no gather-layout copy exists — a second 3-D buffer would double
        # index HBM, and reshaping the 2-D scan matrix inside jit
        # materializes a full relayout copy (measured: an 11.45 GB HLO
        # temp at N=1e6 D=5376 bf16 → OOM on a 16 GB v5e). Re-score the
        # candidates with a plain XLA take + HIGHEST dot on the stored
        # rows instead: same exact-w.r.t.-stored contract, ~0.3 ms extra
        # at rerank depth 32 — noise against the O(N) scan at the scales
        # where this mode matters.
        cv = jnp.take(vectors, safe.reshape(-1), axis=0
                      ).astype(jnp.float32).reshape(safe.shape + (d,))
        qc = jax.lax.dot_general(
            qf, cv, dimension_numbers=(((1,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
    if larger_better:
        exact = qc
    else:
        csq = jnp.take(xsq, safe.reshape(-1)).reshape(safe.shape)
        exact = -(qsq - 2.0 * qc + csq)
    exact = jnp.where(jnp.isfinite(sel_ub), exact, -jnp.inf)

    top_scores, pos = jax.lax.top_k(exact, k)
    top_idx = jnp.take_along_axis(rows2, pos, axis=1)
    valid = jnp.isfinite(top_scores)
    dists = top_scores if larger_better else -top_scores
    idx = jnp.where(valid, top_idx, -1).astype(jnp.int32)
    dists = jnp.where(valid, dists,
                      jnp.inf if not larger_better else -jnp.inf)

    # outer certificate: the k-th EXACT score vs the best upper bound of
    # any row that was not exactly re-scored
    worst_other = jnp.maximum(spill_ub, unreranked_ub)
    certified = jnp.all((top_scores[:, -1] >= worst_other)
                        | ~jnp.isfinite(worst_other))

    if debug_certified:
        # Test hook: also return the certificate verdict so tests can pin
        # that benign/clustered data CERTIFIES (the v1 one-sided margin
        # silently fell back on every real-embedding batch — a perf bug
        # invisible to recall assertions).
        return dists, idx, certified

    def _keep(_):
        return dists, idx

    def _full_rescan(_):
        qxf = jax.lax.dot_general(
            qf, vectors.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        s = qxf if larger_better else -(qsq - 2.0 * qxf + xsq[None, :])
        s = jnp.where(mask, -jnp.inf, s)
        ts, ti = jax.lax.top_k(s, k)
        ok = jnp.isfinite(ts)
        dd = ts if larger_better else -ts
        return (jnp.where(ok, dd,
                          jnp.inf if not larger_better else -jnp.inf),
                jnp.where(ok, ti, -1).astype(jnp.int32))

    return jax.lax.cond(certified, _keep, _full_rescan, None)


@jax.jit
def _fold_exclusion_union(ids, union):
    """Rewrite ids of rows in ``union`` to the -3 sentinel (the state the
    per-call "batch" exclusion fold produces) ONCE, so a chunked search
    can pass exclude_mode="self" + a full(-3) query vector to every chunk
    instead of refolding the O(cap·E) union per chunk."""
    row_excl = jnp.any(ids[:, None] == union[None, :], axis=1)
    return jnp.where(row_excl, jnp.int32(-3), ids)


@partial(jax.jit, static_argnames=("k", "metric", "n_valid", "nprobe",
                                   "use_pallas", "exact", "exclude_mode",
                                   "rerank_depth"))
def _search_device(q, vectors, ids, exclude_ids, k, *, metric, n_valid,
                   centroids=None, cells=None, nprobe=32, use_pallas=False,
                   exact=True, exclude_mode="batch", xsq=None,
                   scan_bf16=None, gather3=None, resid_bf16=None,
                   rerank_depth=None):
    """Fused score + mask + k-select. All shapes static; jit-cached per
    (capacity, B, k, metric).

    ``exact=True`` adds the f32 re-rank stage (neighbor order exact vs an
    f32 oracle, measured ~3 ms/batch at ITW scale); ``exact=False`` returns
    the fast-scan result directly (~0.7 ms, ~0.996 recall@5 from TPU
    fast-matmul rounding on near-ties — metric-equivalent for training).

    ``exclude_mode``: the reference builds ONE exclusion set from the whole
    query batch's basenames and filters every row against it
    (pipeline.py:461-463,494-501) — that is mode "batch" (default, parity).
    Mode "self" excludes only each query's own id."""
    if exclude_mode == "batch":
        # Fold batch-global exclusion into the per-row machinery: rewrite
        # every excluded DB row's id to a sentinel every query matches.
        # The exclusion list's length is deliberately decoupled from the
        # query batch here (the [B] sentinel vector below) so the host
        # chunked path can pass one call-level union to every chunk.
        row_excl = jnp.any(ids[:, None] == exclude_ids[None, :], axis=1)
        ids = jnp.where(row_excl, jnp.int32(-3), ids)
        exclude_ids = jnp.full((q.shape[0],), -3, jnp.int32)
    cap = vectors.shape[0]
    larger_better = metric in ("IP", "COSINE")

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
    invalid_row = row_ids >= n_valid  # [cap]
    excl = ids[None, :] == exclude_ids[:, None]  # [B, cap]

    probe_mask = None
    if metric == "IVF" and centroids is not None:
        # Coarse quantizer: nprobe nearest cells per query; rows outside the
        # probed cells are masked. Same candidate set as list-based IVF —
        # on TPU the masked flat scan is itself the fast path (sequential
        # list gathers would defeat the MXU), so this trades no recall.
        # HIGHEST precision: must probe the SAME cells as the gather-probed
        # paths (ivf_gather.py), which quantize at HIGHEST — default bf16ish
        # matmul precision was measured to flip near-tied centroid ranks and
        # hence the candidate set (FAISS probes in exact f32).
        qc = (jnp.sum(q ** 2, -1, keepdims=True)
              - 2.0 * jax.lax.dot_general(
                  q, centroids, (((1,), (1,)), ((), ())),
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
              + jnp.sum(centroids ** 2, -1)[None, :])  # [B, nlist]
        nprobe_eff = min(nprobe, centroids.shape[0])
        _, probe_cells = jax.lax.top_k(-qc, nprobe_eff)  # [B, nprobe]
        # Membership via a [B, nlist] scatter + per-row gather: O(B·nlist
        # + B·N), not the O(B·N·nprobe) broadcast compare (measured 27 →
        # 131 ms/batch(128) across nprobe 16→1024 at 1M rows before this).
        member = jnp.zeros((q.shape[0], centroids.shape[0]), jnp.bool_)
        member = member.at[
            jnp.arange(q.shape[0], dtype=jnp.int32)[:, None], probe_cells
        ].set(True)  # [B, nlist]
        probe_mask = jnp.take(member, cells, axis=1,
                              mode="clip")  # [B, cap]

    if (exact and scan_bf16 is not None and xsq is not None
            and (not use_pallas or metric == "IVF")):
        # Fast-exact path: bf16 scan + fused Pallas rerank (TPU only; the
        # accelerator arrays exist only when _accel_eligible said so).
        # use_pallas=True opts OUT of this default into the single-kernel
        # flat_topk formulation below (it would otherwise be unreachable
        # on exactly the hardware where it runs) — except for IVF, which
        # flat_topk does not support: IVF keeps the fast-exact path so
        # the combination never silently regresses to the dense scan.
        mask = invalid_row[None, :] | excl
        if probe_mask is not None:
            mask = mask | ~probe_mask
        return _search_fast_exact(q, scan_bf16, gather3, xsq, mask, k,
                                  larger_better, vectors=vectors,
                                  resid_bf16=resid_bf16,
                                  rerank_depth=rerank_depth)

    if use_pallas and metric != "IVF":
        # Fused kernel scan (bf16 MXU) over-fetches R candidates; the shared
        # exact-f32 re-rank below restores f32 neighbor order.
        r = min(max(4 * k, 32), cap)
        cand_scores, cand_idx = topk_ops.flat_topk(
            q, vectors, r, metric=metric, n_valid=n_valid,
            ids=ids, exclude_ids=exclude_ids, fast_scan=True)
        return _rerank_exact(q, vectors, cand_scores, cand_idx, k,
                             larger_better)

    # XLA path. For f32 storage the exact mode runs the full scan straight
    # at Precision.HIGHEST — f32-exact by construction, no candidate
    # re-rank stage. Measured on v5e at ITW scale: 2.4 ms/batch (vs 3.0 ms
    # for fast-scan + candidate re-rank, and 0.7 ms for the non-exact fast
    # scan, which is HBM-bound at ~790 GB/s; HIGHEST is MXU-bound at the
    # multi-pass bf16 rate). For bf16 storage (use_float16) the scan runs
    # in the storage dtype and a small exact-f32 re-rank over
    # R = max(4k, 32) candidates restores neighbor order relative to the
    # stored (rounded) vectors.
    f32_store = vectors.dtype == jnp.float32
    prec = jax.lax.Precision.HIGHEST if (exact and f32_store) else None
    qm = q.astype(vectors.dtype)
    qx = jax.lax.dot_general(
        qm, vectors, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    if metric in ("IP", "COSINE"):
        scores = qx
    else:  # L2 (and IVF over L2): negative squared distance
        if xsq is None:  # precomputed at index build when available
            xsq = jnp.sum(jnp.square(vectors.astype(jnp.float32)), -1)
        scores = -(jnp.sum(q ** 2, -1, keepdims=True) - 2.0 * qx
                   + xsq[None, :])

    neg_inf = jnp.float32(-jnp.inf)
    mask = invalid_row[None, :] | excl
    if probe_mask is not None:
        mask = mask | ~probe_mask
    scores = jnp.where(mask, neg_inf, scores)

    if not exact or f32_store:
        # HIGHEST-precision scores are already f32-exact when exact=True.
        top_scores, top_idx = jax.lax.top_k(scores, k)
        valid = jnp.isfinite(top_scores)
        dists = top_scores if larger_better else -top_scores
        idx = jnp.where(valid, top_idx, -1).astype(jnp.int32)
        dists = jnp.where(valid, dists,
                          jnp.inf if not larger_better else -jnp.inf)
        return dists, idx

    r = min(max(4 * k, 32), cap)
    cand_scores, cand_idx = jax.lax.top_k(scores, r)  # [B, R]
    return _rerank_exact(q, vectors, cand_scores, cand_idx, k, larger_better,
                         xsq=xsq)


def _rerank_exact(q, vectors, cand_scores, cand_idx, k, larger_better,
                  xsq=None):
    """Stage 2: exact-f32 (HIGHEST precision) re-rank of R candidates.

    ``xsq`` (precomputed exact f32 row norms) avoids re-deriving ‖x‖² from
    the gathered candidate vectors."""
    neg_inf = jnp.float32(-jnp.inf)
    safe_idx = jnp.maximum(cand_idx, 0)
    cand_vecs = jnp.take(vectors, safe_idx.reshape(-1), axis=0)
    cand_vecs = cand_vecs.reshape(
        cand_idx.shape + (vectors.shape[-1],)).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    qc = jnp.einsum("bd,brd->br", q, cand_vecs, precision=hi)
    if larger_better:
        exact = qc
    else:
        if xsq is not None:
            csq = jnp.take(xsq, safe_idx.reshape(-1)).reshape(cand_idx.shape)
        else:
            csq = jnp.einsum("brd,brd->br", cand_vecs, cand_vecs,
                             precision=hi)
        qsq = jnp.einsum("bd,bd->b", q, q, precision=hi)[:, None]
        exact = -(qsq - 2.0 * qc + csq)
    exact = jnp.where(jnp.isfinite(cand_scores), exact, neg_inf)

    top_scores, pos = jax.lax.top_k(exact, k)
    top_idx = jnp.take_along_axis(cand_idx, pos, axis=1)
    valid = jnp.isfinite(top_scores)
    dists = top_scores if larger_better else -top_scores
    idx = jnp.where(valid, top_idx, -1).astype(jnp.int32)
    dists = jnp.where(valid, dists, jnp.inf if not larger_better else -jnp.inf)
    return dists, idx
