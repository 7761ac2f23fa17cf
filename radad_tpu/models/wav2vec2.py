"""Wav2Vec2 encoder (base architecture) as pure-functional JAX.

From-scratch reimplementation of the architecture the reference consumes via
HF ``Wav2Vec2Model`` (``/root/reference/feature_extractor.py:6-52``):
raw waveform → 7-layer strided conv feature encoder (group-norm on the first
layer) → feature projection → convolutional positional embedding →
12-layer post-LN transformer. The reference extracts ``hidden_states`` and
means layers [-4,-3,-2,-1] (feature_extractor.py:32-41); ``encode`` here
returns all hidden states so the caller applies the same layer-select.

Weights load from HF torch checkpoints via
``radad_tpu.models.hf_convert.convert_wav2vec2``; parity against the torch
implementation is tested on random tiny configs in
``tests/test_encoders.py``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radad_tpu.models import encoder_common as C


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters; defaults = facebook/wav2vec2-base-960h."""

    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) or "layer" (large)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5
    do_stable_layer_norm: bool = False  # base models are post-LN

    @property
    def feature_dim(self) -> int:
        return self.hidden_size

    def frames_for_samples(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = C.conv_output_length(n, k, s)
        return n


def feature_encoder(params: dict, waveform: jnp.ndarray,
                    cfg: Wav2Vec2Config) -> jnp.ndarray:
    """Strided conv stack: [B, T_samples] → [B, T_frames, conv_dim[-1]].

    Mirrors Wav2Vec2FeatureEncoder: first layer group-norm (base) or
    per-layer LN (large), GELU after every conv, VALID padding.
    """
    x = waveform[..., None]  # [B, T, 1]
    for i, layer in enumerate(params["conv_layers"]):
        x = C.conv1d(x, layer["kernel"], layer.get("bias"),
                     stride=cfg.conv_stride[i], padding=0)
        if "norm_scale" in layer:
            if cfg.feat_extract_norm == "group" and i == 0:
                x = C.instance_norm_channels(
                    x, layer["norm_scale"], layer["norm_bias"])
            else:  # "layer" mode: LN over channels
                x = C.layer_norm(x, layer["norm_scale"], layer["norm_bias"])
        x = C.gelu(x)
    return x


def positional_conv(params: dict, x: jnp.ndarray,
                    cfg: Wav2Vec2Config) -> jnp.ndarray:
    """Grouped conv positional embedding (Wav2Vec2PositionalConvEmbedding):
    SAME-ish padding k//2 with one trailing element dropped for even k,
    then GELU."""
    k = cfg.num_conv_pos_embeddings
    out = C.conv1d(x, params["kernel"], params["bias"], stride=1,
                   padding=k // 2, groups=cfg.num_conv_pos_embedding_groups)
    if k % 2 == 0:
        out = out[:, :-1, :]
    return C.gelu(out)


def encode(params: dict, waveform: jnp.ndarray, cfg: Wav2Vec2Config,
           *, dtype=jnp.float32) -> jnp.ndarray:
    """Full forward: [B, T_samples] → hidden states [L+1, B, T_frames, D].

    Entry 0 is the transformer input (after pos-conv + LN, matching HF's
    ``output_hidden_states`` ordering); entry i>0 is layer i's output.
    """
    waveform = waveform.astype(dtype)
    feats = feature_encoder(params, waveform, cfg)
    # Feature projection: LN → Linear (Wav2Vec2FeatureProjection)
    fp = params["feat_proj"]
    x = C.layer_norm(feats, fp["ln_scale"], fp["ln_bias"], cfg.layer_norm_eps)
    x = C.linear(x, fp["kernel"], fp["bias"])

    x = x + positional_conv(params["pos_conv"], x, cfg)
    enc_ln = params["encoder_ln"]
    if cfg.do_stable_layer_norm:
        # Large variant (Wav2Vec2EncoderStableLayerNorm): pre-LN layers,
        # encoder LN applied AFTER the stack; hidden states collect the
        # pre-layer inputs, final entry is post-final-LN.
        layer_fn = lambda h, p: C.pre_ln_layer(
            h, p, cfg.num_attention_heads, cfg.layer_norm_eps)
        final, inputs = C.scan_layers(x, params["layers"], layer_fn,
                                      collect_hidden=True)
        final = C.layer_norm(final, enc_ln["scale"], enc_ln["bias"],
                             cfg.layer_norm_eps)
    else:
        # Base variant (Wav2Vec2Encoder): encoder LN BEFORE post-LN layers.
        x = C.layer_norm(x, enc_ln["scale"], enc_ln["bias"],
                         cfg.layer_norm_eps)
        layer_fn = lambda h, p: C.post_ln_layer(
            h, p, cfg.num_attention_heads, cfg.layer_norm_eps)
        final, inputs = C.scan_layers(x, params["layers"], layer_fn,
                                      collect_hidden=True)
    return jnp.concatenate([inputs, final[None]], axis=0)


def extract_features(params: dict, waveform: jnp.ndarray, cfg: Wav2Vec2Config,
                     layers_to_use=(-4, -3, -2, -1),
                     *, dtype=jnp.float32) -> jnp.ndarray:
    """Mean over the selected hidden-state layers → [B, T_frames, D]
    (reference semantics, feature_extractor.py:32-41)."""
    hs = encode(params, waveform, cfg, dtype=dtype)
    n = hs.shape[0]
    idx = jnp.asarray([i % n for i in layers_to_use], jnp.int32)
    return jnp.mean(hs[idx], axis=0).astype(jnp.float32)


def init_params(key, cfg: Wav2Vec2Config) -> dict:
    """Random init with torch-Linear-like scales (for tests / scratch)."""
    keys = iter(jax.random.split(key, 64))
    conv_layers = []
    in_dim = 1
    for i, (out_dim, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"kernel": jax.random.normal(
            next(keys), (k, in_dim, out_dim), jnp.float32) /
            np.sqrt(k * in_dim)}
        if cfg.conv_bias:
            layer["bias"] = jnp.zeros((out_dim,), jnp.float32)
        if (cfg.feat_extract_norm == "group" and i == 0) or \
                cfg.feat_extract_norm == "layer":
            layer["norm_scale"] = jnp.ones((out_dim,), jnp.float32)
            layer["norm_bias"] = jnp.zeros((out_dim,), jnp.float32)
        conv_layers.append(layer)
        in_dim = out_dim

    d = cfg.hidden_size
    fp_lin = C.init_linear(next(keys), cfg.conv_dim[-1], d)
    params = {
        "conv_layers": conv_layers,
        "feat_proj": {
            "ln_scale": jnp.ones((cfg.conv_dim[-1],), jnp.float32),
            "ln_bias": jnp.zeros((cfg.conv_dim[-1],), jnp.float32),
            "kernel": fp_lin["w"], "bias": fp_lin["b"],
        },
        "pos_conv": {
            "kernel": jax.random.normal(
                next(keys),
                (cfg.num_conv_pos_embeddings,
                 d // cfg.num_conv_pos_embedding_groups, d),
                jnp.float32) / np.sqrt(cfg.num_conv_pos_embeddings * d /
                                       cfg.num_conv_pos_embedding_groups),
            "bias": jnp.zeros((d,), jnp.float32),
        },
        "encoder_ln": C.init_ln(d),
    }
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "attn": C.init_attn(next(keys), d),
            "ln1": C.init_ln(d),
            "ffn": C.init_ffn(next(keys), d, cfg.intermediate_size),
            "ln2": C.init_ln(d),
        })
    params["layers"] = C.stack_layer_params(layers)
    return params
