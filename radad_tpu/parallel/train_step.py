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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radad_tpu.parallel.mesh import batch_sharding, replicated
from radad_tpu.parallel.sharded_index import sharded_retrieve
from radad_tpu.train.pipeline import ACC_KEYS, make_embed_fn, make_step_fns


def make_parallel_train_step(model, encoder, config, opt, mesh: Mesh,
                             metric: str = "L2"):
    """Build the jitted mesh-wide train step.

    The update rule is NOT reimplemented here: the step wraps the same
    ``make_step_fns`` core as ``DetectionPipeline._build_steps`` behind an
    in-step encoder embed, so the production pipeline step and this one
    cannot drift (VERDICT r2 #5; parity pinned by
    tests/test_parallel.py::test_parallel_step_matches_pipeline_step).

    Signature of the returned function:
      step(variables, opt_state, enc_params,
           (vectors, labels, ids, row_valid),   # 'index'-sharded DB
           audio, batch_labels, exclude_ids, valid, pos_weight, rng)
      -> (variables, opt_state, metrics_dict)
    """
    embed = make_embed_fn(encoder, config)

    def retrieve(index_args, tpp, exclude_ids, *, k, metric, n_valid):
        del n_valid  # row_valid mask carries validity on the mesh
        vectors, labels, ids, row_valid = index_args
        ret = sharded_retrieve(
            mesh, tpp, vectors, labels, ids, row_valid, exclude_ids,
            k=k, metric=metric)
        return ret.neighbors, ret.labels, ret.dists, ret.indices

    core_step, _ = make_step_fns(
        model, opt, retrieve, k=config.top_k, metric=metric, n_valid=0,
        grad_checkpoint=config.use_gradient_checkpointing,
        # forward EVERY step-behavior knob the pipeline honors — a knob
        # silently dropped here would make the two paths drift despite
        # sharing the step core (e.g. a mesh-path ablation run would
        # quietly train WITH retrieval)
        ablate_retrieval=config.ablate_retrieval,
        ablate_query=config.ablate_query)

    def step(variables, opt_state, enc_params, index_args, audio,
             batch_labels, exclude_ids, valid, pos_weight, rng):
        tpp = embed(enc_params, audio)
        acc = {key: jnp.float32(0.0) for key in ACC_KEYS}
        new_vars, opt_state, _acc, bm = core_step(
            variables, opt_state, acc, index_args, tpp, batch_labels,
            exclude_ids, valid, pos_weight, rng)
        metrics = {
            "loss": bm["loss"],
            "acc": bm["acc"],
            "grad_norm_projection": bm["gn_proj"],
            "grad_norm_fuse": bm["gn_fuse"],
            "grad_norm_detection": bm["gn_det"],
        }
        return new_vars, opt_state, metrics

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
