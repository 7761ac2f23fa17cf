"""Fused candidate-rerank Pallas kernel: DMA row gather + f32 dot, on-chip.

Stage 2 of the exact two-stage search (see ``radad_tpu.index.flat``): given
per-query candidate row ids from the fast bf16 scan, compute the exact f32
``q · x[row]`` for every (query, candidate) pair WITHOUT materializing the
gathered rows in HBM. XLA's expression of the same computation
(``jnp.take`` + elementwise) costs 3× the HBM traffic — gather-read +
write-back + re-read ≈ 528 MB at ITW scale, measured ~1.6 ms — because the
gather output is a real HBM tensor. Here each candidate row is DMA'd
HBM→VMEM once (double-buffered across query blocks) and reduced against the
query block in VMEM, so traffic is the single unavoidable candidate read
(~176 MB for B=256, R=32, D=5376 ≈ 0.3 ms at the measured 560 GB/s DMA
gather rate).

This is the TPU replacement for the CUDA-side candidate re-scoring FAISS
does inside its IVF/PQ search kernels (/root/reference/vector_database.py
delegates to faiss-gpu; reference file vector_database.py:159-182).

The database must be in gather layout ``[N, D/128, 128]`` f32 (see
``radad_tpu.ops.gather.to_gather_layout``) so single-row HBM slices are
legal DMA sources. Queries are passed pre-reshaped ``[B, D/128, 128]`` so
the kernel never reshapes across the lane dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _rerank_kernel(idx_ref, q_ref, x_hbm, out_ref, buf, sems, *,
                   qb: int, r: int, nsteps: int):
    i = pl.program_id(0)
    slot = jax.lax.rem(i, 2)

    def start_dmas(step, slot_):
        base = step * qb * r

        def body(t, _):
            row = idx_ref[base + t]
            # All of a slot's copies share ONE DMA semaphore (the chip has
            # only ~512 sflag slots); each wait() consumes one completion.
            pltpu.make_async_copy(
                x_hbm.at[row], buf.at[slot_, t], sems.at[slot_]).start()
            return 0

        jax.lax.fori_loop(0, qb * r, body, 0)

    @pl.when(i == 0)
    def _():
        start_dmas(0, 0)

    @pl.when(i + 1 < nsteps)
    def _():
        start_dmas(i + 1, 1 - slot)

    def wait(t, _):
        base = i * qb * r
        row = idx_ref[base + t]
        pltpu.make_async_copy(
            x_hbm.at[row], buf.at[slot, t], sems.at[slot]).wait()
        return 0

    jax.lax.fori_loop(0, qb * r, wait, 0)

    for qi in range(qb):
        qv = q_ref[qi]  # [sub, 128]
        rows = buf[slot, qi * r:(qi + 1) * r]  # [r, sub, 128]
        # int8 sources dequantize (cast) in VMEM — the fused
        # "dequant-inside-the-kernel" step XLA cannot express without
        # materializing the dequantized rows in HBM. Per-row scales are
        # applied by the caller on the tiny [B, R] output.
        rows = rows.astype(jnp.float32)
        # Reduce over the sublane (sub) axis only — a full (1,2) reduction
        # to a 1-D [r] vector has no legal Mosaic output layout. The final
        # lane reduction happens outside the kernel on the tiny output.
        out_ref[qi, :r] = jnp.sum(rows * qv[None], axis=1)  # [r, 128]


@functools.partial(jax.jit, static_argnames=("interpret",))
def exact_dot(q3: jnp.ndarray, x3: jnp.ndarray, idx: jnp.ndarray, *,
              interpret: bool = False) -> jnp.ndarray:
    """``q3 [B, D/128, 128] f32``, ``x3 [N, D/128, 128] f32 or int8``
    (gather layout), ``idx [B, R] i32`` → exact f32 ``q[b] · x[idx[b, r]]``
    as ``[B, R]``.

    int8 sources are dequantized (cast) in VMEM after the DMA — 4× less
    gather traffic than an f32 table; the caller multiplies the output by
    the per-row scales (symmetric SQ8, index/quantized.py).

    Indices must already be clipped to ``[0, N)`` (callers mask invalid
    candidates by score, not by index).
    """
    b, sub, lanes = q3.shape
    n, sub_x, lanes_x = x3.shape
    assert (sub, lanes) == (sub_x, lanes_x) and lanes == _LANES, \
        (q3.shape, x3.shape)
    r = idx.shape[1]
    # VMEM budget: 2 slots × qb × r rows × sub×128 f32 ≤ ~11 MB.
    qb = max(1, min(8, 256 // max(r, 1)))
    b_pad = ((b + qb - 1) // qb) * qb
    r_pad = ((r + 7) // 8) * 8  # sublane tile for the [qb, r, 128] output
    idx_p = jnp.zeros((b_pad, r), jnp.int32).at[:b].set(
        idx.astype(jnp.int32)).reshape(-1)
    q_p = q3 if b_pad == b else jnp.zeros(
        (b_pad, sub, lanes), q3.dtype).at[:b].set(q3)
    nsteps = b_pad // qb

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((qb, sub, lanes), lambda i, idx_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # x3 stays in HBM
        ],
        out_specs=pl.BlockSpec((qb, r_pad, lanes),
                               lambda i, idx_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, qb * r, sub, lanes), x3.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    partial_sums = pl.pallas_call(
        functools.partial(_rerank_kernel, qb=qb, r=r, nsteps=nsteps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, r_pad, lanes), jnp.float32),
        interpret=interpret,
    )(idx_p, q_p, x3)
    return jnp.sum(partial_sums[:b, :r], axis=-1)


def exact_dot_reference(q: jnp.ndarray, x: jnp.ndarray, idx: jnp.ndarray
                        ) -> jnp.ndarray:
    """Pure-XLA oracle with identical contract (tests and CPU fallback).
    ``q [B, D]``, ``x [N, D]`` (2-D layouts), ``idx [B, R]``."""
    cv = jnp.take(x, idx.reshape(-1), axis=0).reshape(
        idx.shape + (x.shape[-1],)).astype(jnp.float32)
    return jax.lax.dot_general(
        q.astype(jnp.float32), cv,
        dimension_numbers=((((1,), (2,))), (((0,), (0,)))),
        precision=jax.lax.Precision.HIGHEST)
