"""Fused multi-head self-attention Pallas kernel (layout-preserving).

Status: OPT-IN, off by default — measured SLOWER than XLA end-to-end.
The hypothesis was that XLA's ``[B, T, H, hd] → [B, H, T, hd]`` head
split/merge relayout copies dominate the tiny attention math at the
encoders' shapes, so a kernel that keeps q/k/v in their natural
``[B, T, D]`` projection layout and slices heads as STATIC lane ranges in
VMEM (where the "transpose" is free) should win. Measured on v5e at the
production shape (B=256 segment rows, T=99, D=768, H=12, bf16, dependent-
chain timing): fused 0.855 ms vs XLA 0.515 ms per attention; gated-bias
fused 1.010 ms vs XLA 0.521 ms (XLA fuses the [B,H,T,T] bias product at
no measurable cost). End-to-end encoder forward at B=256: wav2vec2
104.2 → 95.8 ms/batch and WavLM 109.7 → 100.4 ms/batch by turning the
fused path OFF. Root cause: per-(row, head) dots are [99,64]×[64,99] —
far below MXU tile size — so the kernel trades relayout bandwidth for
worse MXU utilization and loses. Kept as a tested opt-in
(``RADAD_FUSED_ATTENTION=1``) because the VMEM-resident formulation wins
only if T grows well past the encoders' ~99 frames.

Per grid cell (one batch row × one query-row tile): for each head,
``logits = q_h @ k_hᵀ`` (f32 on the MXU), optional fused relative-position
bias, softmax in f32 on the VPU, ``ctx_h = w @ v_h``, written back to the
head's lane range. No [B,H,T,T] logits tensor ever exists in HBM — which
also replaces WavLM's materialized gated bias (``gate[...,None] *
pos_bias`` was a [B,H,T,T] HBM tensor, modeling_wavlm.py semantics; here
the factors ``gate [B,T,H]`` and ``pos_bias [H,T,T]`` fuse into the logits
in VMEM).

Replaces the reference's torch.nn.functional attention path inside HF
encoders (/root/reference/feature_extractor.py:32-41,146-170 delegate to
modeling_wav2vec2/wavlm/whisper attention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 128


def _mha_kernel(q_ref, k_ref, v_ref, out_ref, *, num_heads: int,
                head_dim: int, rows: int):
    for r in range(rows):
        ctxs = []
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            logits = jax.lax.dot_general(
                q_ref[r, :, sl], k_ref[r, :, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [tq, T]
            w = jax.nn.softmax(logits, axis=-1)
            ctxs.append(jax.lax.dot_general(
                w.astype(v_ref.dtype), v_ref[r, :, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # [tq, hd]
        # ONE full-width store per row: per-head 64-lane partial stores are
        # read-modify-writes on shared (8,128) tiles and serialize.
        out_ref[r] = jnp.concatenate(ctxs, axis=-1).astype(out_ref.dtype)


def _mha_bias_kernel(q_ref, k_ref, v_ref, gate_ref, pos_ref, out_ref, *,
                     num_heads: int, head_dim: int, rows: int):
    for r in range(rows):
        ctxs = []
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            logits = jax.lax.dot_general(
                q_ref[r, :, sl], k_ref[r, :, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [tq, T]
            gate = gate_ref[r, :, h:h + 1].astype(jnp.float32)  # [tq, 1]
            logits = logits + gate * pos_ref[h].astype(jnp.float32)
            w = jax.nn.softmax(logits, axis=-1)
            ctxs.append(jax.lax.dot_general(
                w.astype(v_ref.dtype), v_ref[r, :, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        out_ref[r] = jnp.concatenate(ctxs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "interpret"))
def fused_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
              num_heads: int, *, gate: jnp.ndarray = None,
              pos_bias: jnp.ndarray = None,
              interpret: bool = False) -> jnp.ndarray:
    """``q, k, v [B, T, D]`` (q pre-scaled by head_dim**-0.5) → context
    ``[B, T, D]``, softmax over keys in f32.

    Optional gated relative position bias (WavLM): ``gate [B, T, H]`` ×
    ``pos_bias [H, T, T]`` added to the logits per head — the [B,H,T,T]
    product is fused, never materialized.

    Query rows tile at ≤512 per grid cell; k/v blocks stay VMEM-resident
    across a batch row's query tiles (constant index map).
    """
    b, t, d = q.shape
    head_dim = d // num_heads
    assert head_dim * num_heads == d, (d, num_heads)
    tq = min(t, 512)
    nt = -(-t // tq)
    # Rows per program: amortize per-program overhead while keeping the
    # q/k/v/out blocks + f32 logits within a few MB of VMEM.
    rows = 1
    if nt == 1:
        budget = 6 * 1024 * 1024
        per_row = 4 * t * d * q.dtype.itemsize + 8 * t * t
        for r in (8, 4, 2):
            if b % r == 0 and r * per_row <= budget:
                rows = r
                break
    nb = b // rows

    qspec = pl.BlockSpec((rows, tq, d), lambda i, j: (i, j, 0))
    kvspec = pl.BlockSpec((rows, t, d), lambda i, j: (i, 0, 0))
    in_specs = [qspec, kvspec, kvspec]
    args = [q, k, v]
    if gate is not None:
        in_specs.append(pl.BlockSpec((rows, tq, num_heads),
                                     lambda i, j: (i, j, 0)))
        in_specs.append(pl.BlockSpec((num_heads, tq, t),
                                     lambda i, j: (0, j, 0)))
        args += [gate, pos_bias]
        kernel = functools.partial(_mha_bias_kernel, num_heads=num_heads,
                                   head_dim=head_dim, rows=rows)
    else:
        kernel = functools.partial(_mha_kernel, num_heads=num_heads,
                                   head_dim=head_dim, rows=rows)

    return pl.pallas_call(
        kernel,
        grid=(nb, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rows, tq, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, d), q.dtype),
        interpret=interpret,
    )(*args)


def mha_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  num_heads: int, *, gate: jnp.ndarray = None,
                  pos_bias: jnp.ndarray = None,
                  bias_term: jnp.ndarray = None) -> jnp.ndarray:
    """Pure-XLA path with the identical contract (production default, test
    oracle for the fused kernel, CPU fallback). ``bias_term [B, H, T, T]``
    is the pre-materialized additive-bias form (used by torch-parity tests
    that materialize WavLM's gated bias); ``gate``/``pos_bias`` is its
    factored form."""
    b, t, d = q.shape
    hd = d // num_heads

    def split(h):
        return h.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    # bf16 compute mode: emit the QK^T logits in bf16 — halves the one
    # real HBM cost of the core (the [B,H,T,T] logits round-trip; 120 MB
    # at the production shape) and measured 0.480 → 0.371 ms/layer-core
    # on v5e. Softmax still reduces in f32 below. Output deviation is
    # ≤ 4.9e-4 (bf16 resolution at logit scale) — same class as the
    # tanh-GELU bf16 deviation; f32 inputs keep exact f32 logits, so the
    # torch-parity tests are unaffected.
    logits_t = jnp.float32 if q.dtype == jnp.float32 else q.dtype
    logits = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                        preferred_element_type=logits_t
                        ).astype(jnp.float32)
    if gate is not None:
        bias = (gate.transpose(0, 2, 1)[..., None].astype(jnp.float32)
                * pos_bias[None].astype(jnp.float32))
        logits = logits + bias
    if bias_term is not None:
        logits = logits + bias_term.astype(jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    ctx = jnp.einsum("bhts,bhsd->bhtd", w, split(v),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return ctx.transpose(0, 2, 1, 3).reshape(b, t, d)


def use_fused_attention(t: int, d: int) -> bool:
    """Fused path gate. Default False: the XLA path measured faster at
    every production shape (see module docstring). Opt in with
    ``RADAD_FUSED_ATTENTION=1`` (still requires a real TPU backend and a
    [tq, T] f32 logits tile that fits VMEM alongside the q/k/v blocks)."""
    import os
    if os.environ.get("RADAD_FUSED_ATTENTION") != "1":
        return False
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    return backend == "tpu" and t <= 2048
