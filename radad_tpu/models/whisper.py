"""Whisper encoder as pure-functional JAX, with on-device log-mel frontend.

From-scratch reimplementation of the path the reference drives through HF
``WhisperFeatureExtractor`` + ``WhisperModel.encoder``
(``/root/reference/feature_extractor.py:54-115``): each audio segment is
zero-padded to 30 s, converted to an 80-bin log-mel spectrogram, and run
through conv1(k3,s1) → GELU → conv2(k3,s2) → GELU → +sinusoidal positions →
N pre-LN transformer layers → final LayerNorm. The reference keeps only
``last_hidden_state`` (d_model features per frame).

Unlike the reference (CPU mel per segment → GPU encoder per segment in a
Python loop, feature_extractor.py:94-113), the whole wave→mel→encoder
pipeline here is one jit graph batched over segments.

``pad_to_seconds=30`` reproduces reference semantics exactly (TPP then pools
over all 1500 frames, mostly padding). ``pad_to_seconds=None`` is the
TPU-fast mode: run only the real frames (positional embeddings are sliced),
a ~15× FLOP cut for 2 s segments — measurably different embeddings, so it is
opt-in, not the parity default.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from radad_tpu.models import encoder_common as C
from radad_tpu.ops.melspec import log_mel_spectrogram


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Defaults = openai/whisper-base encoder."""

    d_model: int = 512
    num_hidden_layers: int = 6
    num_attention_heads: int = 8
    ffn_dim: int = 2048
    num_mel_bins: int = 80
    max_source_positions: int = 1500
    sample_rate: int = 16000
    n_fft: int = 400
    hop_length: int = 160
    layer_norm_eps: float = 1e-5

    @property
    def feature_dim(self) -> int:
        return self.d_model

    def frames_for_samples(self, n_samples: int,
                           pad_to_seconds: Optional[float] = 30.0) -> int:
        if pad_to_seconds is not None:
            n_samples = int(pad_to_seconds * self.sample_rate)
        mel_frames = n_samples // self.hop_length
        return C.conv_output_length(mel_frames, 3, 2, padding=1)


def encode_mel(params: dict, mel: jnp.ndarray, cfg: WhisperConfig,
               *, dtype=jnp.float32) -> jnp.ndarray:
    """Log-mel ``[B, T_mel, 80]`` → last hidden state ``[B, T_mel//2, D]``."""
    x = mel.astype(dtype)
    x = C.gelu(C.conv1d(x, params["conv1"]["kernel"], params["conv1"]["bias"],
                        stride=1, padding=1))
    x = C.gelu(C.conv1d(x, params["conv2"]["kernel"], params["conv2"]["bias"],
                        stride=2, padding=1))
    t = x.shape[1]
    x = x + params["pos_embed"][:t].astype(dtype)

    layer_fn = lambda h, p: C.pre_ln_layer(
        h, p, cfg.num_attention_heads, cfg.layer_norm_eps)
    final, _ = C.scan_layers(x, params["layers"], layer_fn)
    ln = params["final_ln"]
    return C.layer_norm(final, ln["scale"], ln["bias"], cfg.layer_norm_eps)


def extract_features(params: dict, waveform: jnp.ndarray, cfg: WhisperConfig,
                     *, pad_to_seconds: Optional[float] = 30.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Raw segments ``[B, T_samples]`` → encoder features ``[B, T_frames, D]``.

    With the default 30 s padding this matches the reference bit-for-bit in
    spirit: HF pads the raw audio with zeros to 480k samples before the mel
    transform (feature_extractor.py:94-99)."""
    if pad_to_seconds is not None:
        target = int(pad_to_seconds * cfg.sample_rate)
        cur = waveform.shape[-1]
        if cur < target:
            waveform = jnp.pad(
                waveform, [(0, 0)] * (waveform.ndim - 1) + [(0, target - cur)])
        else:
            waveform = waveform[..., :target]
    mel = log_mel_spectrogram(
        waveform, n_fft=cfg.n_fft, hop=cfg.hop_length,
        num_mel=cfg.num_mel_bins, sample_rate=cfg.sample_rate)
    return encode_mel(params, mel, cfg, dtype=dtype).astype(jnp.float32)


def init_params(key, cfg: WhisperConfig) -> dict:
    keys = iter(jax.random.split(key, 32))
    d = cfg.d_model

    def conv_init(k, width, c_in, c_out):
        scale = 1.0 / np.sqrt(width * c_in)
        return {
            "kernel": jax.random.uniform(
                k, (width, c_in, c_out), jnp.float32, -scale, scale),
            "bias": jnp.zeros((c_out,), jnp.float32),
        }

    def sinusoids(length, channels, max_timescale=10000):
        # openai/whisper positional embedding construction
        log_inc = np.log(max_timescale) / (channels // 2 - 1)
        inv = np.exp(-log_inc * np.arange(channels // 2))
        scaled = np.arange(length)[:, None] * inv[None, :]
        return np.concatenate([np.sin(scaled), np.cos(scaled)],
                              axis=1).astype(np.float32)

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append({
            "attn": C.init_attn(next(keys), d, k_bias=False),
            "ln1": C.init_ln(d),
            "ffn": C.init_ffn(next(keys), d, cfg.ffn_dim),
            "ln2": C.init_ln(d),
        })
    return {
        "conv1": conv_init(next(keys), 3, cfg.num_mel_bins, d),
        "conv2": conv_init(next(keys), 3, d, d),
        "pos_embed": jnp.asarray(sinusoids(cfg.max_source_positions, d)),
        "final_ln": C.init_ln(d),
        "layers": C.stack_layer_params(layers),
    }
