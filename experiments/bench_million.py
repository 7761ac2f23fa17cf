"""Million-row index benchmark (VERDICT r2 #4): the engine past toy-N.

FAISS's natural regime (and the reference's nlist=4096 default,
/root/reference/vector_database.py:66) is ~1e6 rows. At D=5376 an f32 DB
is 21.5 GB — over one v5e chip's HBM — so the single-chip modes that fit
are exactly the capacity modes built for this: bf16 storage
(use_float16, 10.75 GB) and SQ8 int8 (5.4 GB). This script measures, on
ONE real chip:

  * bf16-storage flat search QPS at N=1e6 + recall@5 vs the host f32
    oracle on a query sample;
  * SQ8 search QPS at N=1e6 + recall@5 vs the same oracle;
  * IVF probe masking over bf16 storage across an nprobe sweep (recall
    vs exhaustive; the masked scan is O(N) by design, so QPS is flat —
    the sweep documents the recall/nprobe tradeoff at real scale).

The sharded-f32 correctness path at 1M rows runs on the virtual CPU mesh
in tests (tests/test_parallel.py::test_sharded_million_rows, reduced D
for host RAM).

Writes one JSON line per mode to stdout; progress to stderr.

Usage:  python experiments/bench_million.py [--rows 1000000] [--d 5376]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def host_oracle_topk(x: np.ndarray, q: np.ndarray, k: int,
                     chunk: int = 200_000):
    """Exact f32 L2 top-k on host, chunked over rows (memory-bounded)."""
    b = q.shape[0]
    best_d = np.full((b, k), np.inf, np.float64)
    best_i = np.full((b, k), -1, np.int64)
    qsq = (q.astype(np.float64) ** 2).sum(-1, keepdims=True)
    for lo in range(0, len(x), chunk):
        xc = x[lo:lo + chunk].astype(np.float32)
        d = (qsq - 2.0 * (q @ xc.T).astype(np.float64)
             + (xc.astype(np.float64) ** 2).sum(-1)[None, :])
        cat_d = np.concatenate([best_d, d], axis=1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(lo, lo + len(xc)),
                                     (b, len(xc)))], axis=1)
        sel = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, axis=1)
        best_i = np.take_along_axis(cat_i, sel, axis=1)
        print(f"# oracle rows {lo + len(xc):,}/{len(x):,}", file=sys.stderr)
    order = np.argsort(best_d, axis=1)
    return (np.take_along_axis(best_d, order, axis=1),
            np.take_along_axis(best_i, order, axis=1))


def _persist(row: dict) -> None:
    """Crash-safe incremental record (the full run takes ~1 h; a late
    failure must not lose earlier rows)."""
    with open("experiments/million_row_bench.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


def recall_at_k(got: np.ndarray, want: np.ndarray) -> float:
    k = want.shape[1]
    return float(np.mean([len(set(got[r, :k]) & set(want[r, :k])) / k
                          for r in range(len(want))]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=1_000_000)
    p.add_argument("--d", type=int, default=5376)
    # 128 (not the ITW-scale 256): at N=1e6 the [2B, N] f32 stacked-GEMM
    # output plus the ub/select temps must fit beside the ~11 GB DB on a
    # 16 GB chip; B=128 leaves ~2.5 GB of headroom. QPS is per-query, so
    # the comparison stays honest (scan FLOPs scale linearly in B).
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--oracle_queries", type=int, default=64)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--skip_sq8", action="store_true")
    p.add_argument("--skip_bf16", action="store_true")
    p.add_argument("--skip_ivf", action="store_true")
    p.add_argument("--skip_flat", action="store_true",
                   help="skip the flat-scan QPS row (IVF-only rerun)")
    p.add_argument("--skip_scan_sweep", action="store_true",
                   help="skip the masked-scan nprobe sweep + masked B=1 "
                        "row (IVF gather-path rerun)")
    p.add_argument("--balance", type=float, default=0.0,
                   help="kmeans split-refinement strength "
                        "(index/ivf.py; 0 = plain Lloyd)")
    p.add_argument("--sq8_refine", type=int, default=0, choices=[0, 4],
                   help="int4 refinement level (+0.5 B/dim, ~12-bit "
                        "rerank fidelity - the capacity-mode recall fix)")
    p.add_argument("--sq8_depth", type=int, default=None,
                   help="SQ8 fallback-rerank candidate depth override")
    p.add_argument("--sq8_residual", type=int, default=0,
                   help="SQ8 residual-encoding codebook size "
                        "(index/quantized.py; 0 = plain per-row SQ8)")
    args = p.parse_args()
    n, d, b, k = args.rows, args.d, args.batch, args.k

    import jax
    import jax.numpy as jnp

    from radad_tpu.index.flat import _search_device
    from radad_tpu.index.quantized import _sq8_search
    from radad_tpu.utils.benchmark import chain_time, warmup

    rng = np.random.default_rng(0)
    print(f"# generating {n:,}x{d} host data (clustered mixture)",
          file=sys.stderr)
    # mixture-of-Gaussians: IVF's regime, and realistic for embeddings
    n_clusters = 1024
    # dtype=float32 at generation time: rng.standard_normal(...,
    # dtype=float32) skips the 43 GB float64 temporary and is ~2x faster
    centers = rng.standard_normal((n_clusters, d),
                                  dtype=np.float32) * np.float32(4.0)
    assign = rng.integers(0, n_clusters, n)
    x = centers[assign]
    x += rng.standard_normal((n, d), dtype=np.float32)
    qi = rng.choice(n, args.oracle_queries, replace=False)
    q_small = x[qi] + np.float32(0.1) * rng.standard_normal(
        (args.oracle_queries, d), dtype=np.float32)
    q_full = np.repeat(q_small, (b + len(q_small) - 1) // len(q_small),
                       axis=0)[:b]

    t0 = time.time()
    oracle_d, oracle_i = host_oracle_topk(x, q_small, k)
    print(f"# host oracle took {time.time() - t0:.0f}s", file=sys.stderr)

    warmup()
    ids = jnp.arange(((n + 1023) // 1024) * 1024, dtype=jnp.int32)
    ids = jnp.where(ids < n, ids % 999_983, -1)
    cap = ids.shape[0]
    excl = jnp.full((b,), -2, jnp.int32)
    results = []

    def bench_mode(name, search_fn, qd, consts, qsmall=None):
        # large arrays ride in via consts — closure capture would bake
        # them into the HLO as constants (relay remote-compile rejects)
        if qsmall is None:
            qsmall = q_small

        def step(qs, *cs):
            vals, idx = search_fn(qs, *cs)
            return qs + 0.0 * (jnp.sum(jnp.where(jnp.isfinite(vals), vals,
                                                 0.0))
                               + 1e-30 * jnp.sum(idx.astype(jnp.float32)))

        dt = chain_time(step, qd, n=args.reps, consts=consts)
        qps = b / dt
        _, idx = jax.jit(search_fn)(jnp.asarray(
            np.pad(qsmall, ((0, b - len(qsmall)), (0, 0)))), *consts)
        rec = recall_at_k(np.asarray(idx)[:len(q_small)], oracle_i)
        row = {"metric": f"1M-row {name} top-{k} retrieval", "rows": n,
               "dim": d, "value": round(qps, 1), "unit": "queries/s",
               "ms_per_batch": round(dt * 1e3, 3),
               "recall_at_5_vs_f32_oracle": round(rec, 4)}
        results.append(row)
        _persist(row)
        print(json.dumps(row))
        print(f"# {name}: {dt*1e3:.2f} ms/batch({b}) -> {qps:,.0f} QPS, "
              f"recall@{k}={rec:.4f}", file=sys.stderr)

    if not args.skip_bf16:
        # bf16 storage mode, SINGLE-BUFFER (FlatIndex(single_buffer=True)
        # semantics): stored rows ARE bf16 (use_float16 contract), ONE
        # [N, D] device buffer (10.7 GB) serves scan and rerank — the
        # certified path reranks via XLA take + HIGHEST dot when
        # gather3=None (index/flat.py). A second gather-layout copy (or a
        # jit-side reshape, which materializes an 11.45 GB relayout temp —
        # measured OOM) does not fit beside it on a 16 GB chip.
        # Host-side bf16 cast halves the h2d bytes through the relay.
        print(f"# uploading bf16 DB single-buffer "
              f"({cap * d * 2 / 1e9:.1f} GB)", file=sys.stderr)
        xbf = jnp.zeros((cap, d), jnp.bfloat16)
        chunk = 50_000
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            xbf = jax.jit(
                lambda buf, c, i: jax.lax.dynamic_update_slice(buf, c, (i, 0)),
                donate_argnums=(0,))(
                xbf, jnp.asarray(x[lo:hi].astype(jnp.bfloat16)), lo)
        xsq = jax.jit(lambda v: jnp.sum(
            jnp.square(v.astype(jnp.float32)), -1))(xbf)

        def search_bf16(qs, xsq, xbf, ids, excl):
            return _search_device(
                qs, xbf, ids, excl, k, metric="L2", n_valid=n, xsq=xsq,
                scan_bf16=xbf, gather3=None)

        if not args.skip_flat:
            bench_mode("bf16-storage flat (single-buffer)", search_bf16,
                       jnp.asarray(q_full), (xsq, xbf, ids, excl))
        if args.skip_ivf:
            del xbf, xsq
        else:
            # IVF nprobe sweep over the bf16 storage: recall vs exhaustive
            from radad_tpu.index.ivf import kmeans
            from radad_tpu.index.flat import _assign_cells

            print(f"# training IVF k-means (nlist=4096, 25 iters, 50k "
                  f"sample, balance={args.balance})", file=sys.stderr)
            train = jnp.asarray(x[:50_000])
            cents, _ = kmeans(train, 4096, iters=25, seed=0,
                              balance=args.balance)
            # chunked assignment: the full [N, nlist] distance matrix is
            # 16 GB at 1M rows — assign 100k rows at a time. Rows come from
            # the DEVICE-resident bf16 buffer (dynamic_slice), not a second
            # 21.5 GB f32 host upload through the relay; bf16 rounding of
            # the rows moves the argmin cell only for boundary ties, which
            # the nprobe sweep's recall numbers absorb by construction.
            achunk = min(100_000, cap)
            assign_j = jax.jit(lambda buf, lo_, c: _assign_cells(
                jax.lax.dynamic_slice(
                    buf, (lo_, 0), (achunk, d)).astype(jnp.float32), c))
            cells_np = np.full((cap,), -1, np.int32)
            for lo in range(0, n, achunk):
                hi = min(lo + achunk, n)
                got = np.asarray(assign_j(xbf, lo, cents))
                cells_np[lo:hi] = got[:hi - lo]
            cells = jnp.asarray(cells_np)
            counts_all = np.bincount(cells_np[cells_np >= 0],
                                     minlength=4096).astype(np.float64)
            cstats = {"metric": f"1M-row IVF cells balance={args.balance}",
                      "rows": n, "nlist": 4096,
                      "weighted_mean_cell":
                          round(float((counts_all ** 2).sum() / n), 1),
                      "mean_cell": round(n / 4096, 1),
                      "p999_cell":
                          round(float(np.quantile(counts_all, 0.999)), 1),
                      "max_cell": int(counts_all.max()),
                      "empty_cells": int((counts_all == 0).sum())}
            results.append(cstats)
            _persist(cstats)
            print(json.dumps(cstats))
            sweep_probes = () if args.skip_scan_sweep else (16, 64, 256,
                                                            1024)
            for nprobe in sweep_probes:
                def search_ivf(qs, xsq, xbf, ids, excl, cents, cells,
                               nprobe=nprobe):
                    return _search_device(
                        qs, xbf, ids, excl, k, metric="IVF", n_valid=n,
                        centroids=cents, cells=cells, nprobe=nprobe,
                        xsq=xsq, scan_bf16=xbf, gather3=None)

                bench_mode(f"bf16 IVF nprobe={nprobe}", search_ivf,
                           jnp.asarray(q_full),
                           (xsq, xbf, ids, excl, cents, cells))

            # Gather-probed IVF (index/ivf_gather.py): the serving story.
            # The masked scan reads all N rows per call regardless of B —
            # at 1M x 5376 bf16 that is a 10.7 GB sweep even for ONE
            # query. The gather path touches B * nprobe * span rows, so
            # B=1 latency drops from O(N) to O(nprobe * span).
            from radad_tpu.index.ivf_gather import (build_cell_table,
                                                    ivf_gather_search)

            table_np, counts_np, ovf_np = build_cell_table(
                cells_np, n, 4096)
            span = table_np.shape[1]
            print(f"# gather table: span={span}, overflow="
                  f"{int((ovf_np >= 0).sum())} rows, "
                  f"table {table_np.nbytes / 1e6:.0f} MB", file=sys.stderr)
            table = jnp.asarray(table_np)
            ovf = jnp.asarray(ovf_np)

            # honest comparison point: the masked scan at B=1 (same
            # nprobe) still sweeps the whole DB
            bal_tag = (f" balance={args.balance}" if args.balance else "")

            def scan_b1(qs, xsq, xbf, ids, excl, cents, cells):
                return _search_device(
                    qs, xbf, ids, excl, k, metric="IVF", n_valid=n,
                    centroids=cents, cells=cells, nprobe=64,
                    xsq=xsq, scan_bf16=xbf, gather3=None)

            ex1 = jnp.full((1,), -2, jnp.int32)

            def step1(qs, *cs):
                vals, idx = scan_b1(qs, *cs)
                return qs + 0.0 * (
                    jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0))
                    + 1e-30 * jnp.sum(idx.astype(jnp.float32)))

            if not args.skip_scan_sweep:
                dt1 = chain_time(step1, jnp.asarray(q_full[:1]),
                                 n=args.reps,
                                 consts=(xsq, xbf, ids, ex1, cents, cells))
                row = {"metric":
                       "1M-row masked-scan IVF nprobe=64 B=1 top-5",
                       "rows": n, "dim": d, "value": round(dt1 * 1e3, 3),
                       "unit": "ms/call", "qps": round(1 / dt1, 1)}
                results.append(row)
                _persist(row)
                print(json.dumps(row))
                print(f"# masked-scan B=1: {dt1*1e3:.2f} ms/call",
                      file=sys.stderr)
            for gb, nprobe in ((1, 16), (1, 64), (8, 64)):
                def search_g(qs, xsq, xbf, ids, excl, cents, table, ovf,
                             nprobe=nprobe):
                    return ivf_gather_search(
                        qs, xbf, xsq, ids, excl, cents, table, ovf, k,
                        nprobe=nprobe)

                exg = jnp.full((gb,), -2, jnp.int32)

                def stepg(qs, *cs):
                    vals, idx = search_g(qs, *cs)
                    return qs + 0.0 * (
                        jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0))
                        + 1e-30 * jnp.sum(idx.astype(jnp.float32)))

                consts = (xsq, xbf, ids, exg, cents, table, ovf)
                dt = chain_time(stepg, jnp.asarray(q_full[:gb]),
                                n=args.reps, consts=consts)
                # recall on the oracle sample, gb queries at a time
                hits = tot = 0
                srch = jax.jit(search_g)
                for lo in range(0, len(q_small), gb):
                    qs = np.pad(q_small[lo:lo + gb],
                                ((0, max(0, gb - (len(q_small) - lo))),
                                 (0, 0)))
                    _, gi = srch(jnp.asarray(qs), *consts)
                    got = np.asarray(gi)
                    for r in range(min(gb, len(q_small) - lo)):
                        hits += len(set(got[r, :k]) & set(oracle_i[lo + r]))
                        tot += k
                rec = hits / tot
                row = {"metric": (f"1M-row gather-probed IVF nprobe="
                                  f"{nprobe} B={gb} top-{k}{bal_tag}"),
                       "rows": n, "dim": d,
                       "value": round(dt * 1e3, 3), "unit": "ms/call",
                       "qps": round(gb / dt, 1),
                       "recall_at_5_vs_f32_oracle": round(rec, 4)}
                results.append(row)
                _persist(row)
                print(json.dumps(row))
                print(f"# gather nprobe={nprobe} B={gb}: "
                      f"{dt*1e3:.2f} ms/call -> {gb/dt:,.0f} QPS, "
                      f"recall@{k}={rec:.4f}", file=sys.stderr)
            # Chunked cell table (ivf_gather_search_chunked): same probed
            # candidate set, but the gather is compacted to a static chunk
            # budget — removes the span table's padding (span = p99.9 cell
            # size vs mean; measured ~77 % padding at this scale).
            from radad_tpu.index.ivf_gather import (build_chunk_table,
                                                    default_chunk_budget,
                                                    ivf_gather_search_chunked)

            chunk_rows_np, cell_chunks_np, counts_np = build_chunk_table(
                cells_np, n, 4096)
            print(f"# chunk table: {chunk_rows_np.shape[0]} chunks x "
                  f"{chunk_rows_np.shape[1]}, max/cell "
                  f"{cell_chunks_np.shape[1]}, "
                  f"{chunk_rows_np.nbytes / 1e6:.0f} MB", file=sys.stderr)
            chunk_rows_d = jnp.asarray(chunk_rows_np)
            cell_chunks_d = jnp.asarray(cell_chunks_np)
            for gb, nprobe in ((1, 16), (1, 64), (8, 64)):
                budget = default_chunk_budget(cell_chunks_np, counts_np,
                                              nprobe)

                def search_c(qs, xsq, xbf, ids, excl, cents, cr, cc, cl,
                             nprobe=nprobe, budget=budget):
                    return ivf_gather_search_chunked(
                        qs, xbf, xsq, ids, excl, cents, cr, cc, cl, k,
                        nprobe=nprobe, budget=budget, n_valid=n)

                exg = jnp.full((gb,), -2, jnp.int32)

                def stepc(qs, *cs):
                    vals, idx = search_c(qs, *cs)
                    return qs + 0.0 * (
                        jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0))
                        + 1e-30 * jnp.sum(idx.astype(jnp.float32)))

                constsc = (xsq, xbf, ids, exg, cents, chunk_rows_d,
                           cell_chunks_d, cells)
                dt = chain_time(stepc, jnp.asarray(q_full[:gb]),
                                n=args.reps, consts=constsc)
                hits = tot = 0
                srch = jax.jit(search_c)
                for lo in range(0, len(q_small), gb):
                    qs = np.pad(q_small[lo:lo + gb],
                                ((0, max(0, gb - (len(q_small) - lo))),
                                 (0, 0)))
                    _, gi = srch(jnp.asarray(qs), *constsc)
                    got = np.asarray(gi)
                    for r in range(min(gb, len(q_small) - lo)):
                        hits += len(set(got[r, :k]) & set(oracle_i[lo + r]))
                        tot += k
                rec = hits / tot
                row = {"metric": (f"1M-row chunked gather-probed IVF "
                                  f"nprobe={nprobe} B={gb} top-{k}"
                                  f"{bal_tag}"),
                       "rows": n, "dim": d, "chunk_budget": budget,
                       "value": round(dt * 1e3, 3), "unit": "ms/call",
                       "qps": round(gb / dt, 1),
                       "recall_at_5_vs_f32_oracle": round(rec, 4)}
                results.append(row)
                _persist(row)
                print(json.dumps(row))
                print(f"# chunked nprobe={nprobe} B={gb} budget={budget}: "
                      f"{dt*1e3:.2f} ms/call -> {gb/dt:,.0f} QPS, "
                      f"recall@{k}={rec:.4f}", file=sys.stderr)
            del chunk_rows_d, cell_chunks_d, constsc
            # Drop EVERY reference to the 10.7 GB bf16 buffer before the
            # SQ8 section — the consts tuples keep it alive otherwise
            # (measured: SQ8 adds OOM at ~200k rows with it resident).
            del table, ovf, consts
            del xbf, xsq, cents, cells

    if not args.skip_sq8:
        rn = args.sq8_residual
        print(f"# quantizing SQ8 DB (5.4 GB codes, residual_nlist={rn})",
              file=sys.stderr)
        from radad_tpu.index.quantized import QuantizedIndex

        # capacity hint: preallocate at 1M rows — the doubling growth's
        # old+new buffer peak OOMs the chip otherwise. build_accel=False:
        # the codes3 gather-layout copy is a SECOND 6.4 GB int8 buffer
        # beside the 5.6 GB codes (plus a full-size build temporary) —
        # measured OOM at 1M×5376. Capacity mode runs single-buffer, like
        # FlatIndex(single_buffer=True): the rerank uses the XLA
        # take-dequant path, whose cost is noise against the O(N) int8
        # scan at this scale.
        qidx = QuantizedIndex(d, "L2", capacity=n, build_accel=False,
                              residual_nlist=rn,
                              refine_bits=args.sq8_refine,
                              rerank_depth=args.sq8_depth)
        chunk = 100_000
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            qidx.add(x[lo:hi], np.zeros(hi - lo, np.float32),
                     [f"r{i}" for i in range(lo, hi)],
                     ids=list(range(lo, hi)))
            print(f"# sq8 add {hi:,}/{n:,}", file=sys.stderr)
        if rn:
            scales_np = np.asarray(qidx.scales)[:n]
            print(f"# residual mean step {scales_np.mean():.5f}",
                  file=sys.stderr)

        def search_sq8(qs, codes, scales, norm_sq, sids, excl, codes3,
                       cents, cls, codes2, scales2):
            dists, idx, _ = _sq8_search(
                qs, codes, scales, norm_sq, sids, excl, k, metric="L2",
                n_valid=n, codes3=codes3, centroids=cents, cells=cls,
                codes2=codes2, scales2=scales2,
                rerank_depth=args.sq8_depth)
            return dists, idx

        consts_sq8 = (qidx.codes, qidx.scales, qidx.norm_sq, qidx.ids,
                      excl, qidx.codes3, qidx.centroids, qidx.cells,
                      qidx.codes2, qidx.scales2)
        tag = "SQ8 int8" + (f" residual_nlist={rn}" if rn else "") + \
            (f" refine4 depth={args.sq8_depth or 'auto'}"
             if args.sq8_refine else "")
        bench_mode(tag, search_sq8, jnp.asarray(q_full), consts_sq8)

    with open("experiments/million_row_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
