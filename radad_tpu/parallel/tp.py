"""Tensor-parallel sharding of the frozen encoder parameters.

At base size (~95M params) the encoder fits one chip and TP is structurally
unnecessary (SURVEY.md §2); this module exists so the mesh story is complete
and larger encoders drop in without new machinery. The approach is
GSPMD-idiomatic: annotate parameter shardings and let XLA partition the
matmuls and insert the collectives —

  * FFN: ``w1 [L, D, F]`` splits on F, ``w2 [L, F, D]`` splits on F
    (Megatron-style column→row split: one reduce per FFN);
  * attention: q/k/v projections split on the output (heads) dim, the
    output projection splits on its input dim;
  * everything else (norms, convs, embeddings) replicates.

Activations stay batch-sharded along 'data'; the TP axis reuses the mesh's
'index' axis (the DB shards and the encoder shards live on the same devices,
active in different phases of the step).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radad_tpu.parallel.mesh import INDEX_AXIS


def encoder_param_specs(params: dict, axis: str = INDEX_AXIS) -> dict:
    """PartitionSpec pytree for a wav2vec2/wavlm-style stacked param tree."""

    def spec_for(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        if "layers" in names:
            last = names[-1]
            if last in ("w1",):  # [L, D, F] — split F (column parallel)
                return P(None, None, axis)
            if last in ("w2",):  # [L, F, D] — split F (row parallel)
                return P(None, axis, None)
            if last in ("b1",):  # [L, F]
                return P(None, axis)
            if last in ("qw", "kw", "vw"):  # [L, D, D] — split heads (out)
                return P(None, None, axis)
            if last in ("qb", "kb", "vb"):  # [L, D]
                return P(None, axis)
            if last == "ow":  # [L, D, D] — split input (row parallel)
                return P(None, axis, None)
        return P()  # replicate

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_encoder_params(params: dict, mesh: Mesh,
                         axis: str = INDEX_AXIS) -> dict:
    """Place encoder params on the mesh with TP shardings (GSPMD does the
    rest inside any jit that consumes them)."""
    specs = encoder_param_specs(params, axis)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params,
        specs)
