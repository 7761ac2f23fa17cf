"""Whisper-compatible log-mel spectrogram as a pure JAX op.

TPU-native replacement for the host-side HF ``WhisperFeatureExtractor`` the
reference calls per segment (``/root/reference/feature_extractor.py:94-103``).
Math parity with openai/whisper + HF:

  * STFT: n_fft=400, hop=160, periodic Hann, center=True with reflect
    padding, last frame dropped → 3000 frames for 30 s @ 16 kHz;
  * mel filterbank: 80 slaney-scale, slaney-normalized triangular filters,
    0–8000 Hz over 201 rfft bins (built host-side in numpy, baked into the
    jit graph as a constant matmul — it lands on the MXU);
  * log compression: log10(clamp(power, 1e-10)), floor at per-clip
    max − 8.0, then (x + 4) / 4.

Runs on device inside the same jit as the encoder, so the whole
wave → mel → transformer path is one fused XLA program (the reference
computes mels on CPU per segment, then ships them to the GPU).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


def _hz_to_mel_slaney(freq):
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = 27.0 / np.log(6.4)
    lin = freq * 3.0 / 200.0
    return np.where(freq >= min_log_hz,
                    min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) * logstep,
                    lin)


def _mel_to_hz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz * 3.0 / 200.0
    logstep = np.log(6.4) / 27.0
    lin = mels * 200.0 / 3.0
    return np.where(mels >= min_log_mel,
                    min_log_hz * np.exp(logstep * (mels - min_log_mel)),
                    lin)


@functools.lru_cache(maxsize=8)
def mel_filter_bank(num_freq_bins: int = 201, num_mel: int = 80,
                    sample_rate: int = 16000, fmin: float = 0.0,
                    fmax: float = 8000.0) -> np.ndarray:
    """Slaney-scale, slaney-normalized triangular filters [num_freq, num_mel]."""
    fft_freqs = np.linspace(0, sample_rate / 2, num_freq_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax),
                          num_mel + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # [M+2, F]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))  # [M, F]
    enorm = 2.0 / (hz_pts[2:num_mel + 2] - hz_pts[:num_mel])
    fb = fb * enorm[:, None]
    return fb.T.astype(np.float32)  # [F, M]


@functools.lru_cache(maxsize=8)
def _hann_window(n_fft: int) -> np.ndarray:
    # periodic Hann (torch.hann_window default)
    i = np.arange(n_fft)
    return (0.5 * (1.0 - np.cos(2.0 * math.pi * i / n_fft))).astype(np.float32)


def log_mel_spectrogram(waveform: jnp.ndarray, *, n_fft: int = 400,
                        hop: int = 160, num_mel: int = 80,
                        sample_rate: int = 16000) -> jnp.ndarray:
    """``waveform [..., T]`` → log-mel features ``[..., num_frames, num_mel]``
    with Whisper's normalization. num_frames = T // hop."""
    pad = n_fft // 2
    x = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)],
                mode="reflect")
    num_frames = waveform.shape[-1] // hop + 1
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]  # [frames, n_fft]
    frames = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=-1)
    frames = frames.reshape(waveform.shape[:-1] + idx.shape)
    window = jnp.asarray(_hann_window(n_fft))
    spec = jnp.fft.rfft(frames.astype(jnp.float32) * window, axis=-1)
    power = jnp.square(spec.real) + jnp.square(spec.imag)  # [..., frames, F]
    power = power[..., :-1, :]  # drop last frame (whisper convention)

    fb = jnp.asarray(mel_filter_bank(n_fft // 2 + 1, num_mel, sample_rate))
    mel = jnp.einsum("...tf,fm->...tm", power, fb)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # floor at per-clip global max - 8 (whisper normalization)
    gmax = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, gmax - 8.0)
    return (log_spec + 4.0) / 4.0
