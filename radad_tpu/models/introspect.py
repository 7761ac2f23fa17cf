"""Model introspection: parameter/FLOP accounting, attention weights,
activation capture, gradient-based feature importance, probability helpers.

Counterparts of the reference's per-module extras:
  * ``ProjectionLayer.get_flops`` / ``get_attention_weights``
    (``/root/reference/projection.py:124-130,155-160``);
  * ``DetectionModel.get_model_complexity`` / ``get_activations`` /
    ``get_feature_importance`` / ``predict_proba`` / ``predict_batch_proba``
    (``/root/reference/detection_model.py:148-237``).

All pure functions over (model, variables) — no stateful hooks needed; JAX's
functional transforms give activation capture (``flax capture_intermediates``)
and input saliency (``jax.grad`` w.r.t. inputs) directly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def parameter_count(variables) -> Dict[str, int]:
    """Per-submodule and total parameter counts."""
    params = variables["params"] if "params" in variables else variables
    out = {}
    total = 0
    for name, sub in params.items():
        n = sum(int(np.prod(x.shape))
                for x in jax.tree_util.tree_leaves(sub))
        out[name] = n
        total += n
    out["total"] = total
    return out


def projection_flops(batch: int, k: int, input_dim: int, hidden_dim: int,
                     output_dim: int) -> int:
    """Forward FLOPs of the projection layer (projection.py:155-160's
    accounting, corrected to count multiply-adds as 2 ops)."""
    per_neighbor = 2 * (input_dim * hidden_dim + hidden_dim  # attn score
                        + input_dim * hidden_dim + hidden_dim * input_dim)  # cst
    head = 2 * (input_dim * hidden_dim + hidden_dim * output_dim)
    return batch * (k * per_neighbor + head)


def detection_flops(batch: int, dims) -> int:
    dims = list(dims)
    return batch * sum(2 * a * b for a, b in zip(dims[:-1], dims[1:]))


def model_complexity(model, variables, batch: int = 1) -> Dict:
    """Complexity report (detection_model.py:212-237 analogue): params per
    submodule, forward FLOPs, activation memory estimate."""
    counts = parameter_count(variables)
    d = model.tpp_dim
    k = 5
    flops = (projection_flops(batch, k, d, model.projection_hidden_dim,
                              model.projection_output_dim)
             + 2 * batch * (d + model.projection_output_dim)
             * model.projection_output_dim  # fuse
             + detection_flops(batch, [model.projection_output_dim,
                                       *model.detection_hidden_dims, 1]))
    return {
        "parameters": counts,
        "forward_flops": int(flops),
        "param_bytes_f32": counts["total"] * 4,
    }


def attention_weights(model, variables, neighbors: jnp.ndarray
                      ) -> jnp.ndarray:
    """Softmaxed neighbor-attention weights [B, K, 1]
    (projection.py:124-130)."""
    p = variables["params"]["projection_layer"]

    def lin(name, x):
        return x @ p[name]["kernel"] + p[name]["bias"]

    scores = lin("attention_final", jnp.tanh(lin("attention_score",
                                                 neighbors)))
    return jax.nn.softmax(scores.astype(jnp.float32), axis=1)


def activations(model, variables, neighbors, tpp) -> Dict[str, jnp.ndarray]:
    """Capture every submodule's intermediate outputs
    (detection_model.py:171-190 analogue via flax capture_intermediates)."""
    _, state = model.apply(
        variables, neighbors, tpp, deterministic=True,
        use_running_average=True,
        capture_intermediates=True, mutable=["intermediates"])
    flat = {}

    def walk(tree, prefix=""):
        for k, v in tree.items():
            name = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                walk(v, name)
            else:
                flat[name] = v[0] if isinstance(v, tuple) else v

    walk(state["intermediates"])
    return flat


def feature_importance(model, variables, neighbors, tpp) -> jnp.ndarray:
    """|∂logit/∂tpp| averaged over the batch — gradient-based input
    importance (detection_model.py:192-210 analogue, applied to the fused
    model's query features)."""

    def scalar_out(t):
        logits = model.apply(variables, neighbors, t, deterministic=True,
                             use_running_average=True)
        return jnp.sum(logits)

    g = jax.grad(scalar_out)(tpp)
    return jnp.mean(jnp.abs(g), axis=0)


def fuse_batch_norm(model, variables) -> dict:
    """Fold BatchNorm running stats into the preceding Dense for inference
    (detection_model.py:239-270's fuse_inference_model analogue).

    For y = BN(xW + b):  W' = W·(γ/σ),  b' = (b − μ)·(γ/σ) + β, where
    σ = √(var + ε). Returns new ``variables`` whose detection-model norms
    are identity (scale=1, bias=0, stats zeroed) and whose Dense layers
    absorb them — the eval-mode forward is numerically unchanged while
    skipping the normalization work.
    """
    if "batch_stats" not in variables:
        return variables
    import copy

    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    stats = variables["batch_stats"]
    det_p = dict(params["detection_model"])
    det_s = stats.get("detection_model", {})
    eps = 1e-5
    for norm_name, norm_stats in det_s.items():
        # norm_i follows linear_i by construction (fusion.DetectionModel)
        lin_name = norm_name.replace("norm_", "linear_")
        gamma = det_p[norm_name]["scale"]
        beta = det_p[norm_name]["bias"]
        mu = norm_stats["mean"]
        sigma = jnp.sqrt(norm_stats["var"] + eps)
        factor = gamma / sigma
        lin = dict(det_p[lin_name])
        lin["kernel"] = lin["kernel"] * factor[None, :]
        lin["bias"] = (lin["bias"] - mu) * factor + beta
        det_p[lin_name] = lin
        det_p[norm_name] = {"scale": jnp.ones_like(gamma),
                            "bias": jnp.zeros_like(beta)}
    # Identity BN: mean=0 and var=1-ε so that √(var+ε)=1 exactly
    # (scale=1, bias=0 set above).
    new_det_stats = {
        name: {"mean": jnp.zeros_like(s["mean"]),
               "var": jnp.full_like(s["var"], 1.0 - eps)}
        for name, s in det_s.items()}
    new_stats = {**stats, "detection_model": new_det_stats}
    new_params = dict(params)
    new_params["detection_model"] = det_p
    return {**variables, "params": new_params, "batch_stats": new_stats}


def predict_proba(model, variables, neighbors, tpp) -> jnp.ndarray:
    """σ(logit) → P(spoof) per clip (detection_model.py:148-156)."""
    logits = model.apply(variables, neighbors, tpp, deterministic=True,
                         use_running_average=True)
    return jax.nn.sigmoid(logits)


def predict_batch_proba(model, variables, neighbors, tpp,
                        chunk: int = 256) -> np.ndarray:
    """Chunked predict_proba for large batches
    (detection_model.py:158-169)."""
    outs = []
    for i in range(0, neighbors.shape[0], chunk):
        outs.append(np.asarray(predict_proba(
            model, variables, neighbors[i:i + chunk], tpp[i:i + chunk])))
    return np.concatenate(outs)
