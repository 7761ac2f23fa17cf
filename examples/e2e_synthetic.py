"""End-to-end smoke drive of the radad_tpu library on a synthetic dataset.

Writes a tiny WAV dataset + meta.csv to a temp dir, then exercises the
public API: manifest split → audio decode → segmentation → TPP → flat
index build/search (self-excluded) → fusion model forward/loss →
persistence round-trip. Runs on CPU in ~1 minute:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/e2e_synthetic.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import numpy as np
import jax
import jax.numpy as jnp


def main():
    tmp = tempfile.mkdtemp()
    from radad_tpu.data import (
        write_wav, load_manifests, load_audio, validate_no_leakage)

    rng = np.random.default_rng(0)
    for i in range(20):
        sr = 16000
        dur = rng.uniform(1.0, 4.0)
        t = np.arange(int(sr * dur)) / sr
        w = 0.4 * np.sin(2 * np.pi * (200 + 30 * i) * t)
        w = w + 0.01 * rng.standard_normal(len(t))
        write_wav(os.path.join(tmp, f"c{i:02d}.wav"), w.astype(np.float32), sr)
    with open(os.path.join(tmp, "meta.csv"), "w") as f:
        f.write("file,speaker,label\n")
        for i in range(20):
            label = "spoof" if i % 3 else "bona-fide"
            f.write(f"c{i:02d}.wav,spk{i % 4},{label}\n")

    from radad_tpu import Config
    cfg = Config().replace(
        train_data_path=tmp, use_layer_norm=True, use_batch_norm=False)
    splits = load_manifests(tmp, train_split=cfg.train_split,
                            seed=cfg.random_seed)
    train, val = splits["train"], splits["val"]
    validate_no_leakage(train, val)
    print(f"split: {len(train)} train / {len(val)} val, "
          f"pos_weight={train.pos_weight():.3f}")

    from radad_tpu.ops import (
        segment_audio, temporal_pyramid_pool, tpp_output_dim)
    batch = np.stack([
        load_audio(p, sample_rate=cfg.sample_rate, duration=cfg.clip_duration)
        for p in train.paths])
    segs = segment_audio(jnp.asarray(batch), cfg.segment_samples,
                         cfg.hop_samples)
    print("segments", segs.shape)

    # Toy frame features (energy envelope broadcast to D channels) standing
    # in for a frozen encoder, so downstream shapes are realistic.
    D = 32
    frames = segs.reshape(segs.shape[0], segs.shape[1], 100, 320)
    frames = jnp.abs(frames).mean(-1)[..., None] * jnp.ones((D,))
    tpp = temporal_pyramid_pool(
        frames, cfg.tpp_levels, cfg.tpp_pooling_type).mean(axis=1)
    dtpp = tpp_output_dim(cfg.tpp_levels, D)
    print("tpp", tpp.shape)

    from radad_tpu.index import FlatIndex
    idx = FlatIndex(dtpp, "L2", use_pallas=False)
    idx.add(np.asarray(tpp), train.labels, list(train.paths))
    dists, ids = idx.search(np.asarray(tpp), cfg.top_k,
                            exclude_ids=train.ids)
    assert all(i not in ids[i] for i in range(len(train))), "self-match leak"
    neighbors = idx.reconstruct_batch(ids)
    print("neighbors", neighbors.shape)

    from radad_tpu.models import build_radad_model
    import optax
    model = build_radad_model(cfg, tpp_dim=dtpp)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(neighbors), tpp)
    logits = model.apply(variables, jnp.asarray(neighbors), tpp)
    loss = optax.sigmoid_binary_cross_entropy(
        logits, jnp.asarray(train.labels)).mean()
    print("logits", logits.shape, "loss", float(loss))

    idx.save(os.path.join(tmp, "vdb"))
    idx2 = FlatIndex.load(os.path.join(tmp, "vdb"), use_pallas=False)
    _, i2 = idx2.search(np.asarray(tpp), cfg.top_k, exclude_ids=train.ids)
    assert (i2 == ids).all()
    print("E2E SLICE OK")


if __name__ == "__main__":
    main()
