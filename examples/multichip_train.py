"""Multi-chip training recipe: data-parallel batches × ICI-sharded index.

Runs the full retrieval-augmented training loop over a
``('data', 'index')`` mesh using the framework's parallel primitives —
the same code path the driver's ``dryrun_multichip`` validates. On real
hardware this is a pod slice; here it runs on virtual CPU devices:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/multichip_train.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from radad_tpu.config import Config
    from radad_tpu.data import write_wav, load_manifests
    from radad_tpu.models.encoder import FrozenEncoder
    from radad_tpu.models.fusion import build_radad_model
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, init_params
    from radad_tpu.parallel import (ShardedIndex, make_mesh,
                                    make_parallel_train_step, batch_sharding)
    from radad_tpu.train import optim
    from radad_tpu.train.pipeline import make_embed_fn
    from radad_tpu.data.loader import iterate_batches

    n_dev = len(jax.devices())
    index_shards = 2 if n_dev % 2 == 0 else 1
    mesh = make_mesh(data=n_dev // index_shards, index=index_shards)
    print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    # --- synthetic dataset -------------------------------------------------
    tmp = tempfile.mkdtemp()
    rng = np.random.default_rng(0)
    for i in range(64):
        t = np.arange(16000 * 3) / 16000
        f = 150 + 20 * (i % 8)
        w = 0.4 * np.sin(2 * np.pi * f * t)
        if i % 2:
            w = w + 0.25 * np.sin(2 * np.pi * 6.1 * f * t)
        write_wav(os.path.join(tmp, f"c{i:03d}.wav"),
                  w.astype(np.float32), 16000)
    with open(os.path.join(tmp, "meta.csv"), "w") as fh:
        fh.write("file,speaker,label\n")
        for i in range(64):
            fh.write(f"c{i:03d}.wav,s{i % 8},"
                     f"{'spoof' if i % 2 else 'bona-fide'}\n")
    splits = load_manifests(tmp)
    train = splits["train"]

    # --- tiny encoder (pretrained weights load the same way) ---------------
    acfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16, 16),
        conv_kernel=(10, 8, 4, 4), conv_stride=(5, 4, 4, 4),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    enc = FrozenEncoder("wav2vec2", "tiny", acfg,
                        init_params(jax.random.PRNGKey(0), acfg), False,
                        (-2, -1))
    cfg = Config().replace(use_layer_norm=True, use_batch_norm=False,
                           batch_size=16, projection_dropout=0.0,
                           detection_dropout=0.0)
    dtpp = 7 * acfg.hidden_size
    model = build_radad_model(cfg, tpp_dim=dtpp)
    opt = optim.make_optimizer(cfg.learning_rate, cfg.weight_decay)
    embed = jax.jit(make_embed_fn(enc, cfg))

    # --- build the sharded DB ----------------------------------------------
    chunks, valids = [], []
    for batch in iterate_batches(train, cfg.db_batch_size, duration=3.0):
        chunks.append(embed(enc.params, jnp.asarray(batch.audio)))
        valids.append(batch.valid)
    emb = np.asarray(jnp.concatenate(chunks))[np.concatenate(valids)]
    sharded = ShardedIndex(mesh, dtpp, "L2")
    sharded.build(emb, train.labels, train.ids, train.paths)
    print(f"sharded DB: {sharded.n} rows × {index_shards} shards")

    # --- mesh-wide training loop --------------------------------------------
    step = make_parallel_train_step(model, enc, cfg, opt, mesh)
    variables = model.init(jax.random.PRNGKey(1),
                           jnp.zeros((1, cfg.top_k, dtpp)),
                           jnp.zeros((1, dtpp)))
    opt_state = opt.init(variables["params"])
    bsh = batch_sharding(mesh)
    pos_weight = train.pos_weight()
    rng_key = jax.random.PRNGKey(2)
    index_args = (sharded.vectors, sharded.labels, sharded.ids,
                  sharded.row_valid)
    for epoch in range(3):
        t0 = time.time()
        losses = []
        for batch in iterate_batches(train, cfg.batch_size, duration=3.0,
                                     shuffle=True, seed=epoch):
            rng_key, sk = jax.random.split(rng_key)
            audio = jax.device_put(batch.audio, bsh)
            variables, opt_state, metrics = step(
                variables, opt_state, enc.params, index_args,
                audio, jnp.asarray(batch.labels), jnp.asarray(batch.ids),
                jnp.asarray(batch.valid), pos_weight, sk)
            losses.append(metrics["loss"])
        print(f"epoch {epoch + 1}: loss "
              f"{float(jnp.mean(jnp.stack(losses))):.4f} "
              f"({time.time() - t0:.1f}s)")
    print("MULTICHIP TRAIN OK")


if __name__ == "__main__":
    main()
