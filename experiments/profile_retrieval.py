"""Per-component profile of the certified-exact retrieval path.

Decomposes `_search_fast_exact`'s certified path (index/flat.py) at ITW
scale on the real TPU: which of scan GEMM / residual GEMM / UB + select /
DMA rerank / certificate + lax.cond owns the 2.07 ms batch latency
(123.6k QPS, bench.py round 3). Also A/Bs two candidate optimizations:

  * stacked scan: one K=2D GEMM over concat([x_bf, resid], axis=1)
    instead of two K=D GEMMs (same bytes/FLOPs, one output round-trip);
  * constant-predicate cond: measures whether XLA's conditional adds a
    copy of the captured f32 vectors operand.

Timing via chain_time (dependent chains; this environment's relay acks
block_until_ready early — utils/benchmark.py).
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radad_tpu.index import flat as F
from radad_tpu.ops.gather import to_gather_layout
from radad_tpu.ops.rerank import exact_dot
from radad_tpu.utils.benchmark import chain_time, warmup


def main():
    n, d, b, k = 25423, 5376, 256, 5
    cap = F._round_up(n)
    warmup()

    key = jax.random.PRNGKey(0)
    xd = jax.jit(lambda k_: jax.random.normal(k_, (cap, d), jnp.float32))(key)
    qd = jax.jit(lambda k_: jax.random.normal(k_, (b, d), jnp.float32))(
        jax.random.PRNGKey(1))
    x_bf = jax.jit(lambda x: x.astype(jnp.bfloat16))(xd)
    resid = jax.jit(lambda x, s: (x - s.astype(jnp.float32)
                                  ).astype(jnp.bfloat16))(xd, x_bf)
    xsq = jax.jit(lambda x: jnp.sum(jnp.square(x), -1))(xd)
    g3 = jax.jit(to_gather_layout)(xd)
    stacked = jax.jit(lambda a, r: jnp.concatenate([a, r], axis=1))(
        x_bf, resid)
    mask_row = jnp.arange(cap) >= n  # [cap] — pad-row mask only
    ids = jnp.arange(cap, dtype=jnp.int32) % 9973
    excl = jnp.arange(b, dtype=jnp.int32) % 9973

    def t(name, fn, *args, consts=()):
        dt = chain_time(fn, *args, n=16, consts=consts)
        print(f"{name:48s} {dt * 1e3:7.3f} ms   {b / dt:10,.0f} QPS")
        return dt

    # 1. scan GEMM alone
    def scan1(q, xb):
        qx = jax.lax.dot_general(q.astype(jnp.bfloat16), xb,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # max over ALL columns: jnp.sum would be rewritten to dot(q, sum(B))
        # and a [:, :d] slice lets XLA narrow the GEMM to 5376 rows
        return q + 1e-30 * jnp.max(qx)
    t("scan GEMM (bf16, K=D)", scan1, qd, consts=(x_bf,))

    # 2. scan + residual (two GEMMs, the production form)
    def scan2(q, xb, r):
        qb = q.astype(jnp.bfloat16)
        qx = jax.lax.dot_general(qb, xb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qx = qx + jax.lax.dot_general(qb, r, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        # max over ALL columns: jnp.sum would be rewritten to dot(q, sum(B))
        # and a [:, :d] slice lets XLA narrow the GEMM to 5376 rows
        return q + 1e-30 * jnp.max(qx)
    t("scan + resid (2 GEMMs)", scan2, qd, consts=(x_bf, resid))

    # 3. stacked single GEMM, K=2D
    def scan_stacked(q, st):
        qb = q.astype(jnp.bfloat16)
        q2 = jnp.concatenate([qb, qb], axis=1)
        qx = jax.lax.dot_general(q2, st, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # max over ALL columns: jnp.sum would be rewritten to dot(q, sum(B))
        # and a [:, :d] slice lets XLA narrow the GEMM to 5376 rows
        return q + 1e-30 * jnp.max(qx)
    t("stacked scan (1 GEMM, K=2D)", scan_stacked, qd, consts=(stacked,))

    # 4. + ub + hier select (T=24, m=8)
    def through_select(q, xb, r, xs):
        qb = q.astype(jnp.bfloat16)
        qf = q.astype(jnp.float32)
        qx = jax.lax.dot_general(qb, xb, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        qx = qx + jax.lax.dot_general(qb, r, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        qsq = jnp.sum(qf ** 2, -1, keepdims=True)
        scores = -(qsq - 2.0 * qx + xs[None, :])
        qnorm = jnp.sqrt(jnp.sum(qf ** 2, -1))
        margin = (jnp.float32(2.0 * 1.3 * 2.0 ** -9)
                  * qnorm[:, None] * jnp.sqrt(xs)[None, :])
        ub = jnp.where(mask_row[None, :], -jnp.inf, scores + margin)
        cu, cr, spill = F._hier_candidates(ub, k, tiles_hint=24,
                                           per_tile_hint=8)
        return q + 1e-30 * (jnp.sum(cu) + jnp.sum(spill))
    t("+ ub + hier select", through_select, qd, consts=(x_bf, resid, xsq))

    # 5. full certified path (production entry, with cond)
    def full(q, x, xb, g, r, xs, i, e):
        v, _ = F._search_device(q, x, i, e, k, metric="L2", n_valid=n,
                                xsq=xs, scan_bf16=xb, gather3=g,
                                resid_bf16=r)
        return q + 1e-30 * jnp.sum(jnp.where(jnp.isfinite(v), v, 0.0))
    t("FULL certified (with cond)", full, qd,
      consts=(xd, x_bf, g3, resid, xsq, ids, excl))

    # 5b. certified body WITHOUT the lax.cond (debug_certified returns the
    #     verdict flag instead of branching): isolates the conditional's
    #     dispatch/copy cost from the certificate computation itself
    def full_nocond(q, xb, g, r, xs):
        mask = mask_row[None, :]
        dists, idx, cert = F._search_fast_exact(
            q, xb, g, xs, mask, k, False, vectors=xb, resid_bf16=r,
            debug_certified=True)
        return q + 1e-30 * (jnp.sum(jnp.where(jnp.isfinite(dists), dists,
                                              0.0))
                            + jnp.float32(cert))
    t("certified body, no cond (debug flag)", full_nocond, qd,
      consts=(x_bf, g3, resid, xsq))

    # 6. core without the cond: replicate the certified body, return
    #    uncertified results directly (no conditional in the graph)
    def core_nocond(q, xb, g, r, xs):
        mask = mask_row[None, :]
        dists, idx = F._search_fast_exact(
            q, xb, g, xs, mask, k, False, vectors=None, resid_bf16=None)
        return q + 1e-30 * jnp.sum(jnp.where(jnp.isfinite(dists), dists, 0.0))
    t("legacy uncertified (T=8, no cond)", core_nocond, qd,
      consts=(x_bf, g3, resid, xsq))

    # 7. rerank only: DMA-gather exact_dot of 48 rows/query
    rows = jnp.tile(jnp.arange(48, dtype=jnp.int32)[None], (b, 1)) * 128
    sub = g3.shape[1]
    q3 = jax.jit(lambda q: jnp.pad(q, ((0, 0), (0, sub * 128 - d))
                                   ).reshape(b, sub, 128))(qd)
    def rr(q3_, g, rw):
        out = exact_dot(q3_, g, rw)
        return q3_ + 1e-30 * jnp.sum(out)
    t("rerank exact_dot (48 rows/query)", rr, q3, consts=(g3, rows))

    for r2 in (32,):
        rows2 = rows[:, :r2]
        t(f"rerank exact_dot ({r2} rows/query)", rr, q3, consts=(g3, rows2))


if __name__ == "__main__":
    main()
