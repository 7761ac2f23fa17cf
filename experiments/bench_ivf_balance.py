"""IVF cell-balance A/B on the real chip: plain Lloyd vs split-refined.

The gather-probed serving path's latency scales with the sizes of the
PROBED cells (count-weighted mean cell size Σc²/n — probes go where the
data is), and k-means on clustered data is heavily imbalanced: the 1M-row
record measured span p99.9 = 1048 vs mean 244 (docs/PERFORMANCE.md).
``kmeans(balance>0)`` (index/ivf.py) split-refines the largest cells
after Lloyd. This script measures, at the same 200k × 5376 / nlist=1024
geometry the chunk-table experiment used, for balance ∈ {0, 1}:

  * cell-size stats (count-weighted mean, p99.9, max);
  * chunked-gather table geometry + the static chunk budget;
  * B=1 chunked gather-probed latency at nprobe ∈ {16, 64};
  * recall@5 vs a host f32 oracle on 64 clustered queries.

Writes one JSON line per row to stdout and appends to
``experiments/ivf_balance_bench.jsonl`` (crash-safe incremental).

Usage:  python experiments/bench_ivf_balance.py [--rows 200000]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _persist(row: dict) -> None:
    with open("experiments/ivf_balance_bench.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=200_000)
    p.add_argument("--d", type=int, default=5376)
    p.add_argument("--nlist", type=int, default=1024)
    p.add_argument("--k", type=int, default=5)
    p.add_argument("--oracle_queries", type=int, default=64)
    p.add_argument("--reps", type=int, default=16)
    args = p.parse_args()
    n, d, k, nlist = args.rows, args.d, args.k, args.nlist

    import jax
    import jax.numpy as jnp

    from radad_tpu.index.flat import _assign_cells
    from radad_tpu.index.ivf import kmeans
    from radad_tpu.index.ivf_gather import (build_chunk_table,
                                            default_chunk_budget,
                                            ivf_gather_search_chunked)
    from radad_tpu.utils.benchmark import chain_time, warmup

    rng = np.random.default_rng(0)
    n_clusters = 1024
    print(f"# generating {n:,}x{d} clustered rows", file=sys.stderr)
    centers = rng.standard_normal((n_clusters, d),
                                  dtype=np.float32) * np.float32(4.0)
    x = centers[rng.integers(0, n_clusters, n)]
    x += rng.standard_normal((n, d), dtype=np.float32)
    qi = rng.choice(n, args.oracle_queries, replace=False)
    q = x[qi] + np.float32(0.1) * rng.standard_normal(
        (args.oracle_queries, d), dtype=np.float32)

    # host f32 oracle (exact L2 top-k)
    t0 = time.time()
    d2 = ((q.astype(np.float64) ** 2).sum(-1, keepdims=True)
          - 2.0 * (q @ x.T).astype(np.float64)
          + (x.astype(np.float64) ** 2).sum(-1)[None, :])
    oracle_i = np.argsort(d2, axis=1)[:, :k]
    print(f"# oracle {time.time() - t0:.0f}s", file=sys.stderr)

    warmup()
    xbf = jnp.asarray(x.astype(jnp.bfloat16))
    xsq = jax.jit(lambda v: jnp.sum(
        jnp.square(v.astype(jnp.float32)), -1))(xbf)
    ids = jnp.arange(n, dtype=jnp.int32)
    train = jnp.asarray(x[:50_000])

    for balance in (0.0, 1.0):
        print(f"# training kmeans balance={balance}", file=sys.stderr)
        t0 = time.time()
        cents, _ = kmeans(train, nlist, iters=25, seed=0, balance=balance)
        jax.block_until_ready(cents)
        t_train = time.time() - t0
        cells_np = np.asarray(jax.jit(_assign_cells)(
            jnp.asarray(x), cents))
        counts = np.bincount(cells_np, minlength=nlist).astype(np.float64)
        wmean = float((counts * counts).sum() / n)
        stats = {"metric": f"ivf-balance cells balance={balance}",
                 "rows": n, "nlist": nlist,
                 "train_s": round(t_train, 1),
                 "weighted_mean_cell": round(wmean, 1),
                 "mean_cell": round(n / nlist, 1),
                 "p999_cell": round(float(np.quantile(counts, 0.999)), 1),
                 "max_cell": int(counts.max()),
                 "empty_cells": int((counts == 0).sum())}
        _persist(stats)
        print(json.dumps(stats))
        print(f"# wmean={wmean:.0f} p99.9={stats['p999_cell']} "
              f"max={stats['max_cell']}", file=sys.stderr)

        chunk_rows_np, cell_chunks_np, counts_np = build_chunk_table(
            cells_np, n, nlist)
        chunk_rows_d = jnp.asarray(chunk_rows_np)
        cell_chunks_d = jnp.asarray(cell_chunks_np)
        cells = jnp.asarray(cells_np)

        for nprobe in (16, 64):
            budget = default_chunk_budget(cell_chunks_np, counts_np,
                                          nprobe)

            def search_c(qs, xsq, xbf, ids, excl, cents, cr, cc, cl,
                         nprobe=nprobe, budget=budget):
                return ivf_gather_search_chunked(
                    qs, xbf, xsq, ids, excl, cents, cr, cc, cl, k,
                    nprobe=nprobe, budget=budget, n_valid=n)

            exg = jnp.full((1,), -2, jnp.int32)

            def stepc(qs, *cs):
                vals, idx = search_c(qs, *cs)
                return qs + 0.0 * (
                    jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0))
                    + 1e-30 * jnp.sum(idx.astype(jnp.float32)))

            consts = (xsq, xbf, ids, exg, cents, chunk_rows_d,
                      cell_chunks_d, cells)
            dt = chain_time(stepc, jnp.asarray(q[:1]), n=args.reps,
                            consts=consts)
            hits = tot = 0
            srch = jax.jit(search_c)
            for r in range(len(q)):
                _, gi = srch(jnp.asarray(q[r:r + 1]), *consts)
                hits += len(set(np.asarray(gi)[0, :k]) & set(oracle_i[r]))
                tot += k
            row = {"metric": (f"200k chunked gather-probed IVF "
                              f"balance={balance} nprobe={nprobe} B=1"),
                   "rows": n, "nlist": nlist, "chunk_budget": int(budget),
                   "value": round(dt * 1e3, 3), "unit": "ms/call",
                   "recall_at_5_vs_f32_oracle": round(hits / tot, 4)}
            _persist(row)
            print(json.dumps(row))
            print(f"# balance={balance} nprobe={nprobe}: "
                  f"{dt*1e3:.2f} ms/call budget={budget} "
                  f"recall={hits/tot:.4f}", file=sys.stderr)
        del chunk_rows_d, cell_chunks_d, cells, consts


if __name__ == "__main__":
    main()
