"""Segmenter windowing parity vs the reference's numpy math
(segmenter.py:15-49): num_segments formula, hop placement, zero-padding."""

import numpy as np
import pytest

from radad_tpu.ops.segmenter import num_segments, segment_audio, segment_audio_np


def oracle_segment(audio, seg_len, hop):
    """Independent reimplementation of the reference semantics."""
    total = len(audio)
    n = max(1, (total - seg_len) // hop + 1)
    out = []
    for i in range(n):
        start = i * hop
        seg = audio[start:start + seg_len]
        if len(seg) < seg_len:
            seg = np.concatenate([seg, np.zeros(seg_len - len(seg))])
        out.append(seg)
    return np.stack(out)


@pytest.mark.parametrize("total", [48000, 32000, 16000, 100, 33000, 64001])
def test_matches_oracle(total, rng):
    seg, hop = 32000, 16000
    audio = rng.standard_normal(total).astype(np.float32)
    expected = oracle_segment(audio, seg, hop)
    got_np = segment_audio_np(audio, seg, hop)
    got_jax = np.asarray(segment_audio(audio, seg, hop))
    assert got_np.shape == expected.shape
    np.testing.assert_allclose(got_np, expected, rtol=0, atol=0)
    np.testing.assert_allclose(got_jax, expected, rtol=1e-6, atol=1e-6)


def test_default_config_yields_two_segments():
    # 3 s @ 16 kHz, 2 s windows, 0.5 overlap → exactly 2 segments
    assert num_segments(48000, 32000, 16000) == 2


def test_batched():
    rng = np.random.default_rng(0)
    audio = rng.standard_normal((4, 48000)).astype(np.float32)
    out = np.asarray(segment_audio(audio, 32000, 16000))
    assert out.shape == (4, 2, 32000)
    for b in range(4):
        np.testing.assert_allclose(
            out[b], oracle_segment(audio[b], 32000, 16000), rtol=1e-6)


def test_short_audio_zero_pads():
    audio = np.ones(1000, np.float32)
    out = segment_audio_np(audio, 32000, 16000)
    assert out.shape == (1, 32000)
    assert out[0, :1000].sum() == 1000
    assert out[0, 1000:].sum() == 0
