"""Shared pure-functional transformer blocks for the frozen speech encoders.

The reference wraps HF torch modules (``/root/reference/feature_extractor.py``)
and runs them under ``torch.no_grad``. Here the encoders are *data*: a params
pytree (converted from HF torch checkpoints or randomly initialized) plus
jit-compiled pure functions. Being frozen, they need no Module machinery —
and a pure pytree makes HF weight conversion, donation, and mesh sharding
trivial.

TPU-native choices:
  * per-layer parameters are STACKED along a leading layer axis and the
    encoder stack runs as one ``lax.scan`` — one compiled layer body instead
    of 12 unrolled ones (faster compiles, identical math);
  * matmuls run in a configurable compute dtype (bf16 on TPU); softmax and
    layer norms accumulate in f32;
  * everything is shape-static; the batch axis is the mesh 'data' axis.
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the last axis, computed in f32."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (out * scale + bias).astype(dt)


def linear(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None
           ) -> jnp.ndarray:
    """x @ w (+ b). Weights stored [in, out] (transposed from torch)."""
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """GELU. f32: exact erf — matches torch nn.GELU / HF ACT2FN['gelu'].
    bf16 (opt-in mixed precision): tanh approximation — erf lowers to a
    long transcendental polynomial on the TPU VPU and measured 2.35× the
    cost of the ENTIRE wav2vec2 conv stack (22.6 of 38 ms at B=256
    segments); the tanh form's max abs error (5e-4 on N(0,3) inputs) is
    20× below bf16's own resolution at activation scale (~1.2e-2), so
    exactness there is numerically meaningless."""
    if x.dtype == jnp.bfloat16:
        return jax.nn.gelu(x, approximate=True)
    return jax.nn.gelu(x, approximate=False)


def self_attention(
    x: jnp.ndarray,
    p: dict,
    num_heads: int,
    *,
    bias_term: Optional[jnp.ndarray] = None,
    bias_factors: Optional[tuple] = None,
) -> jnp.ndarray:
    """Multi-head self-attention matching HF's eager path
    (modeling_wav2vec2.py ``eager_attention_forward``): q is pre-scaled by
    head_dim**-0.5, logits optionally add ``bias_term [B, H, T, T]`` or its
    factored form ``bias_factors = (gate [B, T, H], pos_bias [H, T, T])``
    (WavLM's gated relative position bias), softmax in f32.

    The default path is plain XLA — measured fastest at the encoders'
    shapes. ``RADAD_FUSED_ATTENTION=1`` opts into the layout-preserving
    Pallas kernel (radad_tpu.ops.attention), which measured ~2× slower
    here (see that module's docstring for numbers) but avoids ever
    materializing [B,H,T,T] logits in HBM.

    ``p``: {"qw","qb","kw","kb","vw","vb","ow","ob"}; "kb" may be None
    (Whisper's k_proj has no bias).
    """
    from radad_tpu.ops.attention import (fused_mha, mha_reference,
                                         use_fused_attention)

    _, t, d = x.shape
    scaling = (d // num_heads) ** -0.5

    q = linear(x, p["qw"], p["qb"]) * jnp.asarray(scaling, x.dtype)
    k = linear(x, p["kw"], p.get("kb"))
    v = linear(x, p["vw"], p["vb"])

    gate, pos = bias_factors if bias_factors is not None else (None, None)
    if bias_term is None and use_fused_attention(t, d):
        ctx = fused_mha(q, k, v, num_heads, gate=gate, pos_bias=pos)
    else:
        ctx = mha_reference(q, k, v, num_heads, gate=gate, pos_bias=pos,
                            bias_term=bias_term)
    return linear(ctx, p["ow"], p["ob"])


def feed_forward(x: jnp.ndarray, p: dict, act=gelu) -> jnp.ndarray:
    """Linear -> act -> Linear (HF Wav2Vec2FeedForward / Whisper fc1+fc2)."""
    return linear(act(linear(x, p["w1"], p["b1"])), p["w2"], p["b2"])


def post_ln_layer(x: jnp.ndarray, p: dict, num_heads: int, eps: float,
                  bias_term: Optional[jnp.ndarray] = None,
                  bias_factors: Optional[tuple] = None) -> jnp.ndarray:
    """Post-LN encoder layer (Wav2Vec2/WavLM base,
    modeling_wav2vec2.py Wav2Vec2EncoderLayer.forward):
    x = LN(x + attn(x)); x = LN2(x + ffn(x))."""
    h = x + self_attention(x, p["attn"], num_heads, bias_term=bias_term,
                           bias_factors=bias_factors)
    h = layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], eps)
    h = h + feed_forward(h, p["ffn"])
    return layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], eps)


def pre_ln_layer(x: jnp.ndarray, p: dict, num_heads: int, eps: float,
                 bias_term: Optional[jnp.ndarray] = None,
                 bias_factors: Optional[tuple] = None) -> jnp.ndarray:
    """Pre-LN encoder layer (Whisper's WhisperEncoderLayer.forward, and the
    ``do_stable_layer_norm=True`` large variants of Wav2Vec2/WavLM —
    modeling_wav2vec2.py Wav2Vec2EncoderLayerStableLayerNorm):
    x += attn(LN(x)); x += ffn(LN2(x))."""
    h = x + self_attention(
        layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], eps),
        p["attn"], num_heads, bias_term=bias_term,
        bias_factors=bias_factors)
    h = h + feed_forward(
        layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], eps), p["ffn"])
    return h


def scan_layers(x: jnp.ndarray, stacked: dict, layer_fn, *,
                collect_hidden: bool = False):
    """Run a stack of identical layers whose params are stacked on axis 0.

    Returns (final_hidden, all_hidden) where ``all_hidden`` (when collected)
    has shape [L, B, T, D] holding each layer's INPUT (HF appends the
    pre-layer hidden state each iteration, then the final output separately —
    see modeling_wav2vec2.py Wav2Vec2Encoder.forward)."""

    def body(h, layer_params):
        out = layer_fn(h, layer_params)
        return out, (h if collect_hidden else None)

    final, collected = jax.lax.scan(body, x, stacked)
    return final, collected


# ----------------------------------------------------------------------
# Convolution helpers (feature encoder frontends)

def conv1d(x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray],
           stride: int, padding, groups: int = 1) -> jnp.ndarray:
    """1-D convolution, x [B, T, C_in], kernel [K, C_in/groups, C_out]."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out


def instance_norm_channels(x: jnp.ndarray, scale: jnp.ndarray,
                           bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm with num_groups == num_channels (per-channel norm over time),
    as used by the first conv layer of Wav2Vec2/WavLM feature encoders
    (modeling_wav2vec2.py Wav2Vec2GroupNormConvLayer). x: [B, T, C].

    Fused moments with f32 accumulation directly from the compute dtype —
    no materialized f32 upcast of the [B, 6399, 512] layer-1 activation —
    and a fused affine normalize (vs the naive two-pass form: 43→38 ms
    for the conv stack at B=256 on v5e). The moments are SHIFTED
    (var = E[(x−s)²] − E[x−s]²) by s = the per-channel mean of 8 evenly
    spaced time samples: the subtraction fuses into both reductions at
    zero extra HBM traffic, and unlike the raw E[x²]−E[x]² form it does
    not catastrophically cancel on offset inputs (|mean| ≫ std, e.g. a
    DC-biased recording). Averaging 8 spread samples (rather than one
    frame) keeps the shift near the true mean even when a single frame is
    an outlier (a click/pop at clip start) — a one-frame shift would
    re-center the whole clip on the outlier and reintroduce the
    cancellation."""
    t = x.shape[1]
    probe = x[:, :: max(1, t // 8), :][:, :8, :].astype(jnp.float32)
    s = jax.lax.stop_gradient(jnp.mean(probe, axis=1, keepdims=True))
    s = s.astype(x.dtype)
    xs = x - s  # fused into the reductions below, never materialized
    m1s = jnp.mean(xs, axis=1, keepdims=True, dtype=jnp.float32)
    m2s = (jnp.einsum("btc,btc->bc", xs, xs,
                      preferred_element_type=jnp.float32) / t)[:, None, :]
    var = jnp.maximum(m2s - jnp.square(m1s), 0.0)
    m1 = m1s + s.astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    a = (inv * scale).astype(x.dtype)
    b = (bias - m1 * inv * scale).astype(x.dtype)
    return x * a + b


def conv_output_length(length: int, kernel: int, stride: int,
                       padding: int = 0) -> int:
    return (length + 2 * padding - kernel) // stride + 1


# ----------------------------------------------------------------------
# Random initialization (for tests and training-from-scratch)

def init_linear(key, d_in: int, d_out: int, *, bias: bool = True, scale=None):
    k1, k2 = jax.random.split(key)
    if scale is None:
        scale = 1.0 / np.sqrt(d_in)
    p = {"w": jax.random.uniform(k1, (d_in, d_out), jnp.float32,
                                 -scale, scale)}
    p["b"] = (jax.random.uniform(k2, (d_out,), jnp.float32, -scale, scale)
              if bias else None)
    return p


def init_attn(key, d: int, *, k_bias: bool = True) -> dict:
    keys = jax.random.split(key, 4)
    qs = init_linear(keys[0], d, d)
    ks = init_linear(keys[1], d, d, bias=k_bias)
    vs = init_linear(keys[2], d, d)
    os_ = init_linear(keys[3], d, d)
    return {"qw": qs["w"], "qb": qs["b"], "kw": ks["w"], "kb": ks["b"],
            "vw": vs["w"], "vb": vs["b"], "ow": os_["w"], "ob": os_["b"]}


def init_ffn(key, d: int, d_ff: int) -> dict:
    k1, k2 = jax.random.split(key)
    a = init_linear(k1, d, d_ff)
    b = init_linear(k2, d_ff, d)
    return {"w1": a["w"], "b1": a["b"], "w2": b["w"], "b2": b["b"]}


def init_ln(d: int) -> dict:
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def stack_layer_params(layers: list) -> dict:
    """[{leaf...}] * L  ->  {leaf: [L, ...]} for lax.scan."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
