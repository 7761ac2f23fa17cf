"""WavLM encoder (base architecture) as pure-functional JAX.

From-scratch reimplementation of the architecture the reference consumes via
HF ``WavLMModel`` (``/root/reference/feature_extractor.py:117-170``). Same
conv frontend / feature projection / post-LN transformer skeleton as
Wav2Vec2, plus WavLM's **gated relative position bias**: a bucketed relative
position embedding computed once (layer 0 owns the embedding table) and
re-gated at every layer from that layer's hidden states.

Gating math (verified against HF WavLMAttention.forward):
  gate_in  = hidden reshaped to [B, H, T, head_dim]
  proj     = Linear(head_dim→8)(gate_in) viewed [..., 2, 4] summed → [B,H,T,2]
  a, b     = sigmoid(proj) split on last axis
  gate     = a * (b * gru_rel_pos_const - 1) + 2            → [B, H, T, 1]
  bias     = gate * rel_pos_bias[H, T, T]                   → [B, H, T, T]

The bucket function is T5-style bidirectional (num_buckets/2 sign split,
half exact, half log-spaced to max_distance).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radad_tpu.models import encoder_common as C
from radad_tpu.models.wav2vec2 import feature_encoder, positional_conv


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    """Defaults = microsoft/wavlm-base."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = False  # True for wavlm-large (pre-LN)

    @property
    def feature_dim(self) -> int:
        return self.hidden_size

    def frames_for_samples(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = C.conv_output_length(n, k, s)
        return n


def relative_position_buckets(seq_len: int, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style bidirectional bucket matrix [T, T] (host-side, static)."""
    half = num_buckets // 2
    pos = np.arange(seq_len)
    rel = pos[None, :] - pos[:, None]  # memory - context
    buckets = (rel > 0).astype(np.int64) * half
    rel_abs = np.abs(rel)
    max_exact = half // 2
    is_small = rel_abs < max_exact
    # log-spaced buckets for large distances
    with np.errstate(divide="ignore"):
        large = np.log(np.maximum(rel_abs, 1) / max_exact) / math.log(
            max_distance / max_exact) * (half - max_exact)
    large = (max_exact + large).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel_abs, large)
    return buckets  # [T, T] in [0, num_buckets)


def _gated_bias_factors(x: jnp.ndarray, layer_p: dict,
                        num_heads: int) -> jnp.ndarray:
    """Per-layer gate for the shared [H, T, T] position bias, in the
    transpose-free [B, T, H] layout (the bias itself is
    ``gate[b, t, h] * pos_bias[h, t, s]``). The factored form lets the
    opt-in Pallas attention kernel fuse the product into the logits in
    VMEM; on the default XLA path the product is materialized per layer
    but fused by XLA at no measured cost (radad_tpu.ops.attention)."""
    b, t, d = x.shape
    head_dim = d // num_heads
    gate_in = x.reshape(b, t, num_heads, head_dim)  # [B,T,H,hd]
    proj = C.linear(gate_in, layer_p["gate_w"], layer_p["gate_b"])  # [B,T,H,8]
    proj = proj.reshape(b, t, num_heads, 2, 4).sum(-1)  # [B,T,H,2]
    gates = jax.nn.sigmoid(proj)
    gate_a, gate_b = gates[..., 0], gates[..., 1]  # [B,T,H]
    const = layer_p["gate_const"].reshape(1, 1, num_heads).astype(x.dtype)
    return gate_a * (gate_b * const - 1.0) + 2.0  # [B,T,H]


def encode(params: dict, waveform: jnp.ndarray, cfg: WavLMConfig,
           *, dtype=jnp.float32) -> jnp.ndarray:
    """[B, T_samples] → hidden states [L+1, B, T_frames, D]
    (same ordering as wav2vec2.encode)."""
    waveform = waveform.astype(dtype)
    feats = feature_encoder(params, waveform, cfg)
    fp = params["feat_proj"]
    x = C.layer_norm(feats, fp["ln_scale"], fp["ln_bias"], cfg.layer_norm_eps)
    x = C.linear(x, fp["kernel"], fp["bias"])
    x = x + positional_conv(params["pos_conv"], x, cfg)
    enc_ln = params["encoder_ln"]
    eps = cfg.layer_norm_eps
    heads = cfg.num_attention_heads
    if not cfg.do_stable_layer_norm:
        x = C.layer_norm(x, enc_ln["scale"], enc_ln["bias"], eps)

    t = x.shape[1]
    buckets = jnp.asarray(relative_position_buckets(
        t, cfg.num_buckets, cfg.max_bucket_distance))
    pos_bias = params["rel_attn_embed"][buckets]  # [T, T, H]
    pos_bias = pos_bias.transpose(2, 0, 1).astype(dtype)  # [H, T, T]

    if cfg.do_stable_layer_norm:
        # Large variant (WavLMEncoderLayerStableLayerNorm): pre-LN; the
        # per-layer gate reads the SAME LN'd tensor the attention sees
        # (HF computes it inside WavLMAttention from its input).
        def layer_fn(h, p):
            ln_x = C.layer_norm(h, p["ln1"]["scale"], p["ln1"]["bias"], eps)
            gate = _gated_bias_factors(ln_x, p, heads)
            h = h + C.self_attention(ln_x, p["attn"], heads,
                                     bias_factors=(gate, pos_bias))
            return h + C.feed_forward(
                C.layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], eps),
                p["ffn"])
    else:
        def layer_fn(h, p):
            gate = _gated_bias_factors(h, p, heads)
            return C.post_ln_layer(h, p, heads, eps,
                                   bias_factors=(gate, pos_bias))

    final, inputs = C.scan_layers(x, params["layers"], layer_fn,
                                  collect_hidden=True)
    if cfg.do_stable_layer_norm:
        final = C.layer_norm(final, enc_ln["scale"], enc_ln["bias"], eps)
    return jnp.concatenate([inputs, final[None]], axis=0)


def extract_features(params: dict, waveform: jnp.ndarray, cfg: WavLMConfig,
                     *, dtype=jnp.float32) -> jnp.ndarray:
    """Reference uses WavLM's last_hidden_state only
    (feature_extractor.py:146-170)."""
    return encode(params, waveform, cfg, dtype=dtype)[-1].astype(jnp.float32)


def init_params(key, cfg: WavLMConfig) -> dict:
    """Random init (tests / scratch): wav2vec2 skeleton + WavLM extras."""
    from radad_tpu.models import wav2vec2 as W

    base = W.init_params(key, W.Wav2Vec2Config(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=cfg.conv_dim, conv_kernel=cfg.conv_kernel,
        conv_stride=cfg.conv_stride, conv_bias=cfg.conv_bias,
        feat_extract_norm=cfg.feat_extract_norm,
        num_conv_pos_embeddings=cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=cfg.num_conv_pos_embedding_groups))
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), 40))
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    gates = []
    for _ in range(cfg.num_hidden_layers):
        lin = C.init_linear(next(keys), head_dim, 8)
        gates.append({"gate_w": lin["w"], "gate_b": lin["b"],
                      "gate_const": jnp.ones((cfg.num_attention_heads,),
                                             jnp.float32)})
    stacked_gates = C.stack_layer_params(gates)
    base["layers"] = {**base["layers"], **stacked_gates}
    base["rel_attn_embed"] = jax.random.normal(
        next(keys), (cfg.num_buckets, cfg.num_attention_heads),
        jnp.float32) * 0.02
    return base
