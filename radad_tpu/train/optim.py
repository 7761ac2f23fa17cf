"""Optimizer: the reference's three-optimizer scheme as one optax transform.

The reference builds THREE separate ``torch.optim.Adam`` instances (same
lr/weight-decay) for projection / fuse / detection and, per step, unscales,
clips each submodule's gradients to global-norm 1.0, then steps each
optimizer (``/root/reference/pipeline.py:96-108,817-832``). Functionally that
is a single per-group transform; here it is one
``optax.multi_transform`` keyed on the top-level parameter group, each group
chaining: clip_by_global_norm(1.0) → additive weight decay (torch Adam's
``weight_decay`` adds wd·θ to the gradient *before* the moment updates) →
Adam(β=(0.9, 0.999), eps=1e-8) → -lr.

No GradScaler: bf16 on TPU has f32-range exponents, so loss scaling is
unnecessary (the TPU analogue of the reference's AMP+GradScaler plumbing).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

GROUPS = ("projection_layer", "fuse", "detection_model")


def _group_of(path) -> str:
    top = path[0]
    name = getattr(top, "key", getattr(top, "name", str(top)))
    return name if name in GROUPS else "fuse"


def param_labels(params) -> Any:
    """Label each leaf with its top-level submodule group."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(path), params)


def make_optimizer(learning_rate: float, weight_decay: float,
                   clip_norm: float = 1.0) -> optax.GradientTransformation:
    def group_tx():
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )

    return optax.multi_transform(
        {g: group_tx() for g in GROUPS}, param_labels)


def group_grad_norms(grads) -> Dict[str, jnp.ndarray]:
    """Pre-clip global grad norm per submodule group — the reference logs
    these per batch (pipeline.py:825-827,845-855)."""
    norms = {}
    for g in GROUPS:
        if g in grads:
            leaves = jax.tree_util.tree_leaves(grads[g])
            norms[g] = jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                                    for l in leaves))
        else:
            norms[g] = jnp.float32(0.0)
    return norms


def pos_weighted_bce(logits: jnp.ndarray, labels: jnp.ndarray,
                     pos_weight: float,
                     valid: jnp.ndarray = None) -> jnp.ndarray:
    """BCE-with-logits with positive-class weighting, matching
    ``torch.nn.BCEWithLogitsLoss(pos_weight=w)``:
    loss = -[w·y·log σ(x) + (1-y)·log(1-σ(x))], mean over valid rows."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    per = -(pos_weight * labels * log_p + (1.0 - labels) * log_not_p)
    if valid is None:
        return jnp.mean(per)
    valid = valid.astype(jnp.float32)
    return jnp.sum(per * valid) / jnp.maximum(jnp.sum(valid), 1.0)
