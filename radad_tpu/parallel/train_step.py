"""Multi-chip training step: data-parallel batch × ICI-sharded index.

Composes the single-chip step (``radad_tpu.train.pipeline``) with the mesh:
audio/labels shard over 'data', the reference DB shards over 'index',
model/optimizer state replicate. Inside one jit program:

  * embed + fusion forward/backward are purely data-parallel — XLA keeps
    them local to each device's batch shard;
  * retrieval runs as an explicit ``shard_map`` (per-shard scan + one
    all_gather candidate merge over ICI);
  * gradients of replicated params from a sharded batch force XLA to insert
    the psum all-reduce over 'data' — the SPMD equivalent of the grad sync
    the reference never needed (single GPU).

This module is exercised on virtual CPU meshes by tests and the driver's
``dryrun_multichip``; the same code runs unchanged on a real pod slice.
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radad_tpu.parallel.mesh import batch_sharding, replicated
from radad_tpu.parallel.sharded_index import sharded_retrieve
from radad_tpu.train import optim
from radad_tpu.train.pipeline import make_embed_fn


def make_parallel_train_step(model, encoder, config, opt, mesh: Mesh,
                             metric: str = "L2"):
    """Build the jitted mesh-wide train step.

    Signature of the returned function:
      step(variables, opt_state, enc_params,
           (vectors, labels, ids, row_valid),   # 'index'-sharded DB
           audio, batch_labels, exclude_ids, valid, pos_weight, rng)
      -> (variables, opt_state, metrics_dict)
    """
    embed = make_embed_fn(encoder, config)
    k = config.top_k

    def step(variables, opt_state, enc_params, index_args, audio,
             batch_labels, exclude_ids, valid, pos_weight, rng):
        vectors, labels, ids, row_valid = index_args
        tpp = embed(enc_params, audio)
        ret = sharded_retrieve(
            mesh, tpp, vectors, labels, ids, row_valid, exclude_ids,
            k=k, metric=metric)
        neighbors = jnp.nan_to_num(ret.neighbors)

        def loss_fn(params):
            vs = {**variables, "params": params}
            logits = model.apply(
                vs, neighbors, tpp, deterministic=False,
                use_running_average=True, rngs={"dropout": rng})
            return optim.pos_weighted_bce(logits, batch_labels, pos_weight,
                                          valid), logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"])
        gnorms = optim.group_grad_norms(grads)
        updates, opt_state = opt.update(grads, opt_state,
                                        variables["params"])
        new_params = optax.apply_updates(variables["params"], updates)
        vmask = valid.astype(jnp.float32)
        metrics = {
            "loss": loss,
            "acc": jnp.sum(((logits > 0).astype(jnp.float32) == batch_labels)
                           * vmask) / jnp.maximum(jnp.sum(vmask), 1.0),
            "grad_norm_projection": gnorms["projection_layer"],
            "grad_norm_fuse": gnorms["fuse"],
            "grad_norm_detection": gnorms["detection_model"],
        }
        return {**variables, "params": new_params}, opt_state, metrics

    rep = replicated(mesh)
    bsh = batch_sharding(mesh)
    row = NamedSharding(mesh, P("index", None))
    vec = NamedSharding(mesh, P("index"))
    # enc_params sharding is None ("respect what the caller placed"): the
    # caller may pass replicated params or TP-sharded params
    # (parallel.tp.shard_encoder_params) — GSPMD partitions the encoder
    # matmuls either way.
    in_shardings = (rep, rep, None, (row, vec, vec, vec),
                    bsh, bsh, bsh, bsh, None, None)
    out_shardings = (rep, rep, rep)
    return jax.jit(step, in_shardings=in_shardings,
                   out_shardings=out_shardings, donate_argnums=(0, 1))
