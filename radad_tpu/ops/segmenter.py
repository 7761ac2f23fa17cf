"""Overlapped fixed-length windowing of audio clips, as a pure JAX op.

TPU-native counterpart of the reference's host-side numpy segmenter
(``/root/reference/segmenter.py:15-49``). Semantics parity:

  * ``segment_samples = int(segment_length * sample_rate)`` (segmenter.py:11)
  * ``hop = int(segment_samples * (1 - overlap))`` (segmenter.py:13)
  * ``num_segments = max(1, (N - L) // hop + 1)`` (segmenter.py:25)
  * windows start at ``i * hop``; anything past the end of the clip is
    zero-padded (segmenter.py:33-38); clips shorter than one window yield a
    single zero-padded window (segmenter.py:41-47).

Because clip length is static under jit (the loader pads/truncates to a fixed
length), the whole op is a single gather with a compile-time index matrix —
no Python loop per segment, no dynamic shapes, batch-friendly. The reference
loops over segments per clip on host CPU; here the batch dimension maps onto
the mesh 'data' axis and the gather fuses into the encoder's first conv.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def num_segments(total_samples: int, segment_samples: int, hop_samples: int) -> int:
    """Reference formula, segmenter.py:25."""
    return max(1, (total_samples - segment_samples) // hop_samples + 1)


@functools.lru_cache(maxsize=64)
def _window_indices(total: int, seg: int, hop: int) -> tuple[np.ndarray, np.ndarray]:
    """Compile-time [S, L] gather indices and validity mask."""
    s = num_segments(total, seg, hop)
    starts = np.arange(s, dtype=np.int64)[:, None] * hop
    offs = np.arange(seg, dtype=np.int64)[None, :]
    idx = starts + offs  # [S, L]
    mask = idx < total
    return np.where(mask, idx, 0), mask


def segment_audio(audio: jnp.ndarray, segment_samples: int, hop_samples: int) -> jnp.ndarray:
    """Window ``audio[..., N]`` into ``[..., S, segment_samples]``.

    Works on any leading batch shape. S is determined by the static trailing
    dimension, so jit sees fixed shapes.
    """
    total = audio.shape[-1]
    idx, mask = _window_indices(total, segment_samples, hop_samples)
    windows = jnp.take(audio, jnp.asarray(idx.reshape(-1)), axis=-1)
    windows = windows.reshape(audio.shape[:-1] + idx.shape)
    return windows * jnp.asarray(mask, dtype=audio.dtype)


def segment_audio_np(audio: np.ndarray, segment_samples: int, hop_samples: int) -> np.ndarray:
    """Host/numpy variant with identical semantics (used by tests and the
    host fallback path)."""
    total = audio.shape[-1]
    idx, mask = _window_indices(total, segment_samples, hop_samples)
    out = audio[..., idx.reshape(-1)].reshape(audio.shape[:-1] + idx.shape)
    return (out * mask.astype(audio.dtype)).astype(audio.dtype)
