"""A/B profile of the deep-tile UB select stage of the certified search.

The round-3 component budget (NOTES.md) puts "UB + deep-tile select" at
~0.45 ms of the 2.02 ms certified batch — ~13× its HBM floor (one read of
the [B, cap] f32 upper-bound matrix is ~0.04 ms). Candidate causes: the
strided-tile swapaxes is a real 26 MB relayout (write + re-read), and the
ub matrix is materialized as a second [B, cap] array on top of the GEMM
output. This script measures, select-stage-only and scan+select fused:

  A. production `_hier_candidates` on a materialized ub (swapaxes layout);
  B. lane-layout select: tile maxima computed directly on the
     [B, 128, nt] reshape (tile t = rows {t, t+nt, ...} — the SAME strided
     tiles, no transpose), extraction over the sublane axis;
  C. fused-ub select: tile maxima computed in one pass from the raw GEMM
     output qx (scores+margin recomputed on the fly — rank-1 terms), with
     ub re-derived only on the gathered [B, 128, T] tile columns, so the
     full-size ub matrix never exists in HBM.

All variants must return identical (cand_ub set, rows, spill) — asserted
vs A before timing. Timing: chain_time (dependent chains; the relay acks
block_until_ready early — utils/benchmark.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from radad_tpu.index import flat as F
from radad_tpu.utils.benchmark import chain_time, warmup

_LANES = 128


def make_ub(qx, xsq, qsq, qnorm, mask_row, mfac):
    scores = -(qsq - 2.0 * qx + xsq[None, :])
    margin = mfac * qnorm[:, None] * jnp.sqrt(xsq)[None, :]
    return jnp.where(mask_row[None, :], -jnp.inf, scores + margin)


def select_a(qx, xsq, qsq, qnorm, mask_row, mfac, k=5, tiles=24, m=8):
    ub = make_ub(qx, xsq, qsq, qnorm, mask_row, mfac)
    return F._hier_candidates(ub, k, tiles_hint=tiles, per_tile_hint=m)


def select_b(qx, xsq, qsq, qnorm, mask_row, mfac, k=5, tiles=24, m=8):
    """Lane-layout: same strided tiles, no swapaxes relayout."""
    ub = make_ub(qx, xsq, qsq, qnorm, mask_row, mfac)
    b, cap = ub.shape
    nt = cap // _LANES
    tiles = min(tiles, nt)
    sl = ub.reshape(b, _LANES, nt)          # (b, lane, tile): row = lane*nt+tile
    tmax = jnp.max(sl, axis=1)              # [B, nt]
    _, tsel = jax.lax.top_k(tmax, tiles)    # [B, T]
    cand = jnp.take_along_axis(sl, tsel[:, None, :], axis=2)  # [B, 128, T]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES, tiles), 1)
    big = jnp.int32(_LANES)
    vals, rows = [], []
    for _ in range(m):
        best = jnp.max(cand, axis=1)        # [B, T]
        at_best = cand >= best[:, None, :]
        bidx = jnp.min(jnp.where(at_best, lane, big), axis=1)  # [B, T]
        vals.append(best)
        rows.append(jnp.minimum(bidx, _LANES - 1) * nt + tsel)
        cand = jnp.where(lane == bidx[:, None, :], -jnp.inf, cand)
    unsel_max = jnp.max(
        jax.vmap(lambda t, s: t.at[s].set(-jnp.inf))(tmax, tsel), axis=-1)
    spill = jnp.maximum(jnp.max(cand, axis=(1, 2)), unsel_max)
    return (jnp.concatenate(vals, -1),
            jnp.concatenate(rows, -1).astype(jnp.int32), spill)


def select_c(qx, xsq, qsq, qnorm, mask_row, mfac, k=5, tiles=24, m=8):
    """Fused-ub: tile maxima straight off qx; ub recomputed on gathered
    tiles only — the [B, cap] ub matrix never materializes."""
    b, cap = qx.shape
    nt = cap // _LANES
    tiles = min(tiles, nt)
    # one fused pass over qx: ub elementwise + tile-max reduce
    ub3 = make_ub(qx, xsq, qsq, qnorm, mask_row, mfac).reshape(b, _LANES, nt)
    tmax = jnp.max(ub3, axis=1)             # [B, nt] — XLA fuses the
    _, tsel = jax.lax.top_k(tmax, tiles)    # elementwise chain into this
    # gather the raw qx tile columns (3 MB), recompute ub on the small side
    qx3 = qx.reshape(b, _LANES, nt)
    cand_qx = jnp.take_along_axis(qx3, tsel[:, None, :], axis=2)
    xsq3 = xsq.reshape(_LANES, nt)
    mask3 = mask_row.reshape(_LANES, nt)
    cand_xsq = jnp.take_along_axis(
        jnp.broadcast_to(xsq3[None], (b, _LANES, nt)), tsel[:, None, :],
        axis=2)
    cand_mask = jnp.take_along_axis(
        jnp.broadcast_to(mask3[None], (b, _LANES, nt)), tsel[:, None, :],
        axis=2)
    scores = -(qsq[:, :, None] - 2.0 * cand_qx + cand_xsq)
    margin = mfac * qnorm[:, None, None] * jnp.sqrt(cand_xsq)
    cand = jnp.where(cand_mask, -jnp.inf, scores + margin)  # [B, 128, T]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, _LANES, tiles), 1)
    big = jnp.int32(_LANES)
    vals, rows = [], []
    for _ in range(m):
        best = jnp.max(cand, axis=1)
        at_best = cand >= best[:, None, :]
        bidx = jnp.min(jnp.where(at_best, lane, big), axis=1)
        vals.append(best)
        rows.append(jnp.minimum(bidx, _LANES - 1) * nt + tsel)
        cand = jnp.where(lane == bidx[:, None, :], -jnp.inf, cand)
    unsel_max = jnp.max(
        jax.vmap(lambda t, s: t.at[s].set(-jnp.inf))(tmax, tsel), axis=-1)
    spill = jnp.maximum(jnp.max(cand, axis=(1, 2)), unsel_max)
    return (jnp.concatenate(vals, -1),
            jnp.concatenate(rows, -1).astype(jnp.int32), spill)


def main():
    n, d, b, k = 25423, 5376, 256, 5
    cap = F._round_up(n)
    warmup()

    xd = jax.jit(lambda k_: jax.random.normal(k_, (cap, d), jnp.float32))(
        jax.random.PRNGKey(0))
    qd = jax.jit(lambda k_: jax.random.normal(k_, (b, d), jnp.float32))(
        jax.random.PRNGKey(1))
    x_bf = jax.jit(lambda x: x.astype(jnp.bfloat16))(xd)
    resid = jax.jit(lambda x, s: (x - s.astype(jnp.float32)
                                  ).astype(jnp.bfloat16))(xd, x_bf)
    xsq = jax.jit(lambda x: jnp.sum(jnp.square(x), -1))(xd)
    mask_row = jnp.arange(cap) >= n
    mfac = jnp.float32(2.0 * 1.3 * 2.0 ** -16)

    # precomputed GEMM output for select-only timing
    def gemm(q, xb, r):
        qh = q.astype(jnp.bfloat16)
        ql = (q - qh.astype(jnp.float32)).astype(jnp.bfloat16)
        q2 = jnp.concatenate([qh, ql], axis=0)
        o = jax.lax.dot_general(q2, xb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (o[:b] + o[b:]
                + jax.lax.dot_general(qh, r, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32))
    qx = jax.jit(gemm)(qd, x_bf, resid)
    qx.block_until_ready()
    qsq = jnp.sum(qd ** 2, -1, keepdims=True)
    qnorm = jnp.sqrt(jnp.sum(qd ** 2, -1))

    # correctness: B and C must match A exactly (sets per query + spill)
    a = jax.jit(select_a)(qx, xsq, qsq, qnorm, mask_row, mfac)
    for name, fn in (("B", select_b), ("C", select_c)):
        v = jax.jit(fn)(qx, xsq, qsq, qnorm, mask_row, mfac)
        rows_match = all(
            set(np.asarray(a[1])[i]) == set(np.asarray(v[1])[i])
            for i in range(b))
        sp = np.allclose(np.asarray(a[2]), np.asarray(v[2]), rtol=1e-6)
        print(f"# variant {name}: rows match={rows_match} spill match={sp}")
        assert rows_match and sp, name

    def t(name, fn, *args, consts=()):
        dt = chain_time(fn, *args, n=16, consts=consts)
        print(f"{name:44s} {dt * 1e3:7.3f} ms")
        return dt

    def consume(fn):
        def step(q_, qx_, xsq_, qsq_, qnorm_):
            cv, cr, sp = fn(qx_ + 1e-30 * jnp.sum(q_), xsq_, qsq_, qnorm_,
                            mask_row, mfac)
            return q_ + 1e-30 * (jnp.sum(cv) + jnp.sum(sp)
                                 + jnp.sum(cr.astype(jnp.float32)))
        return step

    print("## select-only (qx precomputed)")
    t("A: swapaxes _hier_candidates", consume(select_a), qd,
      consts=(qx, xsq, qsq, qnorm))
    t("B: lane-layout (no transpose)", consume(select_b), qd,
      consts=(qx, xsq, qsq, qnorm))
    t("C: fused-ub lane-layout", consume(select_c), qd,
      consts=(qx, xsq, qsq, qnorm))

    print("## scan GEMM + select (fusion interactions)")
    def scan_plus(fn):
        def step(q, xb, r, xsq_):
            qxx = gemm(q, xb, r)
            qsq_ = jnp.sum(q ** 2, -1, keepdims=True)
            qn_ = jnp.sqrt(jnp.sum(q ** 2, -1))
            cv, cr, sp = fn(qxx, xsq_, qsq_, qn_, mask_row, mfac)
            return q + 1e-30 * (jnp.sum(cv) + jnp.sum(sp)
                                + jnp.sum(cr.astype(jnp.float32)))
        return step
    t("scan + A", scan_plus(select_a), qd, consts=(x_bf, resid, xsq))
    t("scan + B", scan_plus(select_b), qd, consts=(x_bf, resid, xsq))
    t("scan + C", scan_plus(select_c), qd, consts=(x_bf, resid, xsq))


if __name__ == "__main__":
    main()
