"""Edge-case and failure-path coverage across the stack."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.config import Config


def test_config_rejects_unknown_key():
    with pytest.raises(ValueError, match="Invalid configuration"):
        Config().replace(nonsense_key=1)


def test_config_json_roundtrip():
    cfg = Config().replace(top_k=7, tpp_levels=(1, 3),
                           asv_params=(("pi_tar", 0.01),))
    back = Config.from_json(cfg.to_json())
    assert back == cfg
    assert back.asv_params_dict() == {"pi_tar": 0.01}
    hash(back)  # hashable → jit-static safe


def test_predict_empty_db(tmp_path, synthetic_dataset):
    """Empty index → zero neighbors, prediction still returned
    (pipeline.py:1039-1040 warns and proceeds)."""
    from radad_tpu.models.encoder import FrozenEncoder
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, init_params
    from radad_tpu.train.pipeline import DetectionPipeline

    acfg = Wav2Vec2Config(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, conv_dim=(8, 8), conv_kernel=(10, 8),
        conv_stride=(8, 8), num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=2)
    enc = FrozenEncoder("wav2vec2", "tiny", acfg,
                        init_params(jax.random.PRNGKey(0), acfg), False,
                        (-1,))
    cfg = Config().replace(data_root=str(tmp_path),
                           use_layer_norm=True, use_batch_norm=False)
    pipe = DetectionPipeline(cfg, encoder=enc)
    wav = os.path.join(synthetic_dataset, "clip_000.wav")
    out = pipe.predict(wav)
    assert out["prediction"] in ("spoof", "bona-fide")
    assert all(f == "" for f in out["retrieved_files"])


def test_eer_single_class_nan():
    from radad_tpu.train.metrics import compute_eer

    eer, thr = compute_eer(np.array([0.1, 0.2]), np.array([1, 1]))
    assert np.isnan(eer) and np.isnan(thr)


def test_corrupt_audio_yields_zeros(tmp_path):
    from radad_tpu.data.audio import load_audio

    bad = str(tmp_path / "corrupt.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFF----WAVEgarbage")
    out = load_audio(bad, sample_rate=16000, duration=3.0)
    assert out.shape == (48000,) and out.sum() == 0.0


def test_unknown_encoder_type():
    from radad_tpu.models.encoder import build_encoder

    with pytest.raises(ValueError, match="Unknown feature extractor"):
        build_encoder(Config().replace(feature_extractor_type="mystery"))


def test_whisper_trimmed_mode(rng):
    """pad_to_seconds=None runs only the real frames (TPU-fast mode)."""
    from radad_tpu.models.whisper import (WhisperConfig, extract_features,
                                          init_params)

    cfg = WhisperConfig(d_model=32, num_hidden_layers=1,
                        num_attention_heads=4, ffn_dim=64, num_mel_bins=8,
                        max_source_positions=1500)
    params = init_params(jax.random.PRNGKey(0), cfg)
    wave = jnp.asarray(rng.standard_normal((1, 32000)).astype(np.float32))
    full = extract_features(params, wave, cfg, pad_to_seconds=30.0)
    trimmed = extract_features(params, wave, cfg, pad_to_seconds=None)
    assert full.shape[1] == 1500  # 30 s / 20 ms
    assert trimmed.shape[1] == 100  # 2 s of frames
    # real-frame region uses the same conv weights; values differ only by
    # edge/normalization effects — sanity: both finite
    assert np.isfinite(np.asarray(full)).all()
    assert np.isfinite(np.asarray(trimmed)).all()


def test_loader_partial_batch_masks(synthetic_dataset):
    from radad_tpu.data.loader import iterate_batches
    from radad_tpu.data.manifest import load_manifests

    m = load_manifests(synthetic_dataset, split=False)["all"]  # 24 clips
    batches = list(iterate_batches(m, 10, duration=1.0))
    assert len(batches) == 3
    assert batches[-1].num_valid == 4
    assert batches[-1].audio[batches[-1].num_valid:].sum() == 0
    # labels/ids padded consistently
    assert (batches[-1].ids[4:] == -1).all()


def test_segment_counts_nonstandard_lengths():
    from radad_tpu.ops.segmenter import num_segments

    # 10 s clip, 2 s windows, 50% overlap → 9 segments
    assert num_segments(160000, 32000, 16000) == 9
    # clip shorter than one window → 1
    assert num_segments(100, 32000, 16000) == 1


def test_device_to_host_limit_and_bf16_dtype():
    """device_to_host: (a) bf16 inputs come back float32 on EVERY path —
    chunked AND the small-array early return (callers must not get a
    size-dependent dtype); (b) limit=n bounds the rows pulled so a
    capacity-padded buffer is never materialized in full on either side."""
    import jax.numpy as jnp

    from radad_tpu.utils.transfer import device_to_host

    x = np.arange(20 * 4, dtype=np.float32).reshape(20, 4)
    xb = jnp.asarray(x).astype(jnp.bfloat16)

    small = device_to_host(xb)  # early-return path (rows <= chunk)
    assert small.dtype == np.float32
    np.testing.assert_allclose(small, x, atol=0.5)  # bf16 rounding

    chunked = device_to_host(xb, rows_per_chunk=8)  # chunked path
    assert chunked.dtype == np.float32
    np.testing.assert_array_equal(small, chunked)

    lim = device_to_host(xb, rows_per_chunk=8, limit=13)
    assert lim.shape == (13, 4) and lim.dtype == np.float32
    np.testing.assert_array_equal(lim, chunked[:13])

    # f32 device arrays: limit on both paths, host ndarray passthrough
    xf = jnp.asarray(x)
    np.testing.assert_array_equal(device_to_host(xf, limit=7), x[:7])
    np.testing.assert_array_equal(
        device_to_host(xf, rows_per_chunk=8, limit=17), x[:17])
    np.testing.assert_array_equal(device_to_host(x, limit=5), x[:5])
    # 1-D bf16 early return also converts
    v = device_to_host(jnp.ones((5,), jnp.bfloat16))
    assert v.dtype == np.float32


def test_async_save_failure_raises_at_join(tmp_path):
    """A failure inside the background DB-save thread must surface at the
    join — 'DB saved' is never silently assumed (the thread used to
    swallow exceptions)."""
    import pytest as _pytest

    from radad_tpu.config import Config
    from radad_tpu.train.pipeline import DetectionPipeline

    cfg = Config().replace(data_root=str(tmp_path),
                           vector_db_path=str(tmp_path / "vdb"))
    pipe = DetectionPipeline.__new__(DetectionPipeline)  # no heavy init
    pipe._save_thread = None
    pipe._save_exc = None
    pipe._join_save()  # no-op without a thread

    import threading

    def boom():
        pipe._save_exc = RuntimeError("disk full")

    pipe._save_thread = threading.Thread(target=boom)
    pipe._save_thread.start()
    with _pytest.raises(RuntimeError, match="async index save failed"):
        pipe._join_save()
    assert pipe._save_thread is None and pipe._save_exc is None
    del cfg


def test_session_mode_generator(tmp_path):
    """Session-mode synthetic data: label-pure sessions, shared speaker,
    sessions.json sidecar consistent with meta.csv
    (experiments/make_synthetic_dataset.py --session_size)."""
    import csv
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "sess")
    subprocess.run(
        [sys.executable,
         os.path.join(repo, "experiments", "make_synthetic_dataset.py"),
         "--out", out, "--n", "48", "--speakers", "5", "--hard",
         "--session_size", "8", "--seed", "3",
         "--families", "inharmonic,quantize"],
        check=True, capture_output=True)
    with open(os.path.join(out, "sessions.json")) as f:
        session_of = json.load(f)
    rows = list(csv.DictReader(open(os.path.join(out, "meta.csv"))))
    assert len(rows) == 48 and len(session_of) == 48
    by_sess = {}
    for r in rows:
        by_sess.setdefault(session_of[r["file"]], []).append(r)
    assert len(by_sess) == 6
    for sess, members in by_sess.items():
        assert len(members) == 8
        # label-pure and speaker-pure within a session
        assert len({m["label"] for m in members}) == 1
        assert len({m["speaker"] for m in members}) == 1
    # both classes present across sessions
    assert len({m[0]["label"] for m in by_sess.values()}) == 2


def test_session_size_requires_hard(tmp_path):
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(repo, "experiments", "make_synthetic_dataset.py"),
         "--out", str(tmp_path / "x"), "--n", "8", "--session_size", "4"],
        capture_output=True)
    assert proc.returncode != 0
