"""Long-audio mode (config.max_duration): valid-window-masked TPP mean.

The reference hard-truncates every clip to 3 s (dataset.py:143-148); the
long-audio mode analyzes up to max_duration seconds with static shapes by
padding batches to the common max length and mean-pooling each clip's TPP
over only the windows that touch real audio (make_embed_fn lengths arg).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.config import Config
from radad_tpu.data.manifest import load_manifests


@pytest.fixture(scope="module")
def tiny_encoder():
    from radad_tpu.models.encoder import FrozenEncoder
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, init_params

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16, 16),
        conv_kernel=(10, 8, 4, 4), conv_stride=(5, 4, 4, 4),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    return FrozenEncoder(
        name="wav2vec2", model_name="tiny-random", arch_cfg=cfg,
        params=params, pretrained=False, layers_to_use=(-2, -1))


def _embed_fn(tiny_encoder, **over):
    from radad_tpu.train.pipeline import make_embed_fn

    cfg = Config().replace(**over)
    return make_embed_fn(tiny_encoder, cfg), cfg


def test_full_length_mask_is_identity(tiny_encoder):
    """lengths == full clip length ⇒ identical to the unmasked parity path."""
    embed, cfg = _embed_fn(tiny_encoder)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((3, cfg.clip_samples))
                        .astype(np.float32))
    lengths = jnp.full((3,), cfg.clip_samples, jnp.int32)
    np.testing.assert_allclose(np.asarray(embed(tiny_encoder.params, audio)),
                               np.asarray(embed(tiny_encoder.params, audio,
                                                lengths)),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_masked_mean_equals_truncated_grid(tiny_encoder):
    """A 4 s clip inside a 6 s batch, masked, must equal the unmasked embed
    of the same clip padded to exactly its own window cover: the valid
    windows (ceil(64000/16000) = 4, the last zero-padded past the clip end)
    are sample-identical in both layouts."""
    from radad_tpu.train.pipeline import grid_cover_samples

    embed, cfg = _embed_fn(tiny_encoder, max_duration=6.0)
    sr, hop, seg = cfg.sample_rate, cfg.hop_samples, cfg.segment_samples
    true_len = 4 * sr
    rng = np.random.default_rng(1)
    wave = rng.standard_normal(true_len).astype(np.float32)

    padded6 = np.zeros((1, 6 * sr), np.float32)
    padded6[0, :true_len] = wave
    got = embed(tiny_encoder.params, jnp.asarray(padded6),
                jnp.asarray([true_len], jnp.int32))

    cover = grid_cover_samples(true_len, seg, hop)  # 3*16000+32000 = 80000
    assert cover == 3 * hop + seg
    padded_cover = np.zeros((1, cover), np.float32)
    padded_cover[0, :true_len] = wave
    want = embed(tiny_encoder.params, jnp.asarray(padded_cover))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    # layout invariance: a 7.5 s layout gives the identical embedding
    padded75 = np.zeros((1, 120000), np.float32)
    padded75[0, :true_len] = wave
    got2 = embed(tiny_encoder.params, jnp.asarray(padded75),
                 jnp.asarray([true_len], jnp.int32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(got2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_short_clip_drops_pure_padding_window(tiny_encoder):
    """A 1 s clip in the 3 s layout has one real window; masked mode counts
    only it (the reference averages in the pure-zero second window)."""
    embed, cfg = _embed_fn(tiny_encoder)
    sr, seg = cfg.sample_rate, cfg.segment_samples
    rng = np.random.default_rng(2)
    wave = rng.standard_normal(sr).astype(np.float32)

    padded3 = np.zeros((1, cfg.clip_samples), np.float32)
    padded3[0, :sr] = wave
    got = embed(tiny_encoder.params, jnp.asarray(padded3),
                jnp.asarray([sr], jnp.int32))

    one_window = np.zeros((1, seg), np.float32)  # S = 1 by construction
    one_window[0, :sr] = wave
    want = embed(tiny_encoder.params, jnp.asarray(one_window))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    unmasked = embed(tiny_encoder.params, jnp.asarray(padded3))
    assert not np.allclose(np.asarray(got), np.asarray(unmasked))


def test_loader_reports_true_lengths(synthetic_dataset):
    from radad_tpu.data.audio import load_audio
    from radad_tpu.data.loader import iterate_batches

    splits = load_manifests(synthetic_dataset)
    m = splits["train"]
    batches = list(iterate_batches(m, 8, duration=6.0, shuffle=False))
    got = np.concatenate([b.lengths for b in batches])[: len(m)]
    want = np.array([min(len(load_audio(p, duration=None, pad=False)),
                         6 * 16000) for p in m.paths])
    np.testing.assert_array_equal(got, want)
    # the synthetic dataset has 1-4 s clips: lengths must actually vary
    assert got.min() < got.max()


@pytest.mark.slow
def test_long_audio_training_end_to_end(synthetic_dataset, tiny_encoder,
                                        tmp_path):
    """Full train/eval/predict pass with max_duration=4.0 (the synthetic
    dataset has clips up to 4 s, so long-audio mode sees real >3 s tails)."""
    from radad_tpu.train.pipeline import DetectionPipeline

    root = str(tmp_path)
    cfg = Config().replace(
        data_root=root, train_data_path=synthetic_dataset,
        vector_db_path=os.path.join(root, "vdb"),
        batch_size=8, eval_batch_size=8, db_batch_size=8,
        num_epochs=1, use_layer_norm=True, use_batch_norm=False,
        max_duration=4.0)
    splits = load_manifests(synthetic_dataset, train_split=cfg.train_split,
                            seed=cfg.random_seed)
    pipe = DetectionPipeline(cfg, encoder=tiny_encoder)
    row = pipe.train(splits["train"], splits["val"])
    assert np.isfinite(row["train_loss"])
    assert row["avg_nnz_neighbor_rate"] > 0.9

    out = pipe.predict(splits["val"].paths[0])  # config-level max_duration
    assert out["prediction"] in ("spoof", "bona-fide")
    assert 0.0 <= out["probability_spoof"] <= 1.0

    # embeddings must differ from the 3 s-truncated parity mode for clips
    # longer than 3 s (the lifted tail changes the TPP mean)
    pipe_parity = DetectionPipeline(cfg.replace(max_duration=None),
                                    encoder=tiny_encoder)
    emb_long = pipe.get_embeddings(splits["train"])
    emb_parity = pipe_parity.get_embeddings(splits["train"])
    from radad_tpu.data.audio import load_audio

    long_rows = [i for i, p in enumerate(splits["train"].paths)
                 if len(load_audio(p, duration=None, pad=False)) > 3 * 16000]
    assert long_rows, "synthetic dataset should contain >3 s clips"
    diffs = np.abs(emb_long[long_rows] - emb_parity[long_rows]).max(axis=1)
    assert (diffs > 1e-6).all()

    # batched predict (the serving path) honors config.max_duration and
    # agrees with single-clip predict on the same files
    paths = list(splits["val"].paths[:2])
    batched = pipe.predict_batch(paths)
    for p, r in zip(paths, batched):
        single = pipe.predict(p)
        assert r["prediction"] == single["prediction"]
        np.testing.assert_allclose(r["logit"], single["logit"],
                                   rtol=1e-4, atol=1e-5)
