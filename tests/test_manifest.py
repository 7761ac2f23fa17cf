"""Manifest parsing, label normalization, splits, and leakage guard."""

import numpy as np
import pytest

from radad_tpu.data.manifest import (
    Manifest, load_manifests, normalize_label, validate_no_leakage,
)


def test_label_normalization():
    # SPOOF=1, BONAFIDE=0 with the reference's synonym sets (dataset.py:28-29)
    for s in ["spoof", "FAKE", " tts ", "vc", "synthetic"]:
        assert normalize_label(s) == 1
    for s in ["bona-fide", "Bonafide", "genuine", "REAL", "bona fide"]:
        assert normalize_label(s) == 0
    with pytest.raises(ValueError):
        normalize_label("mystery")


def test_split_sizes_and_stratification(synthetic_dataset):
    splits = load_manifests(synthetic_dataset, train_split=0.8, seed=42)
    train, val = splits["train"], splits["val"]
    assert len(train) + len(val) == 24
    assert len(val) == round(0.2 * 24)
    # Stratified: class ratios within 1 sample of the global ratio.
    total_spoof = train.class_counts()["spoof"] + val.class_counts()["spoof"]
    frac = total_spoof / 24
    assert abs(val.class_counts()["spoof"] / len(val) - frac) < 0.2
    validate_no_leakage(train, val)


def test_split_determinism(synthetic_dataset):
    a = load_manifests(synthetic_dataset, seed=42)
    b = load_manifests(synthetic_dataset, seed=42)
    assert a["train"].paths == b["train"].paths
    c = load_manifests(synthetic_dataset, seed=7)
    assert c["train"].paths != a["train"].paths


def test_data_fraction(synthetic_dataset):
    splits = load_manifests(synthetic_dataset, data_fraction=0.5, split=False)
    m = splits["all"]
    assert 10 <= len(m) <= 14  # per-class round(n*0.5), min 1
    assert m.class_counts()["spoof"] >= 1
    assert m.class_counts()["bonafide"] >= 1


def test_pos_weight():
    m = Manifest(paths=("a", "b", "c", "d"),
                 labels=np.array([1, 1, 1, 0], np.float32),
                 speakers=("", "", "", ""),
                 ids=np.zeros(4, np.int32))
    # (neg+1)/(pos+1) = 2/4 = 0.5
    assert abs(m.pos_weight() - 0.5) < 1e-6
    m_all_pos = Manifest(paths=("a",), labels=np.ones(1, np.float32),
                         speakers=("",), ids=np.zeros(1, np.int32))
    assert m_all_pos.pos_weight() == 0.5  # (0+1)/(1+1), clipped range holds


def test_leakage_detection():
    a = Manifest(paths=("/x/f1.wav", "/x/f2.wav"),
                 labels=np.zeros(2, np.float32), speakers=("", ""),
                 ids=np.zeros(2, np.int32))
    b = Manifest(paths=("/y/f2.wav",), labels=np.zeros(1, np.float32),
                 speakers=("",), ids=np.zeros(1, np.int32))
    with pytest.raises(ValueError, match="leakage"):
        validate_no_leakage(a, b)


def test_audio_loading(synthetic_dataset):
    from radad_tpu.data.audio import load_audio

    splits = load_manifests(synthetic_dataset, split=False)
    m = splits["all"]
    audio = load_audio(m.paths[0], sample_rate=16000, duration=3.0)
    assert audio.shape == (48000,)
    assert audio.dtype == np.float32
    # Missing file → zeros, not an exception (dataset.py:151-153 parity)
    missing = load_audio("/nonexistent/file.wav", sample_rate=16000, duration=3.0)
    assert missing.shape == (48000,)
    assert missing.sum() == 0.0
