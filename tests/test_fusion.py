"""Fusion model (projection + fuse + detection MLP) shape, math, and
parameter-count checks, including a torch-oracle parity test for the
projection layer's attention math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.config import Config
from radad_tpu.models.fusion import (
    DetectionModel, ProjectionLayer, RADADModel, build_radad_model,
)


def test_projection_shapes(rng):
    D, H, O, B, K = 48, 16, 8, 4, 5
    layer = ProjectionLayer(input_dim=D, hidden_dim=H, output_dim=O)
    x = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    out = layer.apply({"params": params}, x)
    assert out.shape == (B, O)


def test_projection_matches_torch_oracle(rng):
    """Exact math parity: port our params into a torch reimplementation of
    projection.py:68-102 and compare outputs."""
    torch = pytest.importorskip("torch")
    D, H, O, B, K = 24, 12, 6, 3, 5
    layer = ProjectionLayer(input_dim=D, hidden_dim=H, output_dim=O)
    x = rng.standard_normal((B, K, D)).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"]
    ours = np.asarray(layer.apply({"params": params}, jnp.asarray(x)))

    def lin(name, t):
        w = torch.from_numpy(np.asarray(params[name]["kernel"]))  # [in, out]
        b = torch.from_numpy(np.asarray(params[name]["bias"]))
        return t @ w + b

    tx = torch.from_numpy(x)
    scores = lin("attention_final", torch.tanh(lin("attention_score", tx)))
    cst = lin("cst_output", torch.relu(lin("cst_hidden", tx)))
    weights = torch.softmax(scores, dim=1)
    summed = (weights * cst).sum(dim=1)
    h = lin("weight_sum", summed)
    ln_w = torch.from_numpy(np.asarray(params["normalization"]["scale"]))
    ln_b = torch.from_numpy(np.asarray(params["normalization"]["bias"]))
    h = torch.nn.functional.layer_norm(h, (H,), ln_w, ln_b, eps=1e-6)
    expected = lin("unified_embedding", h).numpy()
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_detection_model_logits(rng):
    model = DetectionModel(input_dim=16, hidden_dims=(8, 4),
                           use_batch_norm=False, use_layer_norm=True)
    x = jnp.asarray(rng.standard_normal((10, 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (10,)
    assert out.dtype == jnp.float32


def test_radad_model_end_to_end(rng):
    cfg = Config().replace(use_layer_norm=True, use_batch_norm=False)
    D = 7 * 32  # tpp dim for a toy 32-dim encoder
    model = build_radad_model(cfg, tpp_dim=D)
    B, K = 6, cfg.top_k
    neighbors = jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32)
    tpp = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), neighbors, tpp)
    logits = model.apply(variables, neighbors, tpp)
    assert logits.shape == (B,)
    # Dropout active in train mode changes outputs
    logits_train = model.apply(
        variables, neighbors, tpp, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(logits), np.asarray(logits_train))


def test_param_count_matches_reference_scale():
    """w2v2 config: the reference's trainable layers sum to ~6.26M params —
    projection has 4 Linear(5376↔256) blocks ≈ 5.5M (projection.py:29-53),
    fuse is 5504×128 ≈ 0.70M (radad_model.py:26), MLP ≈ 11K."""
    cfg = Config().replace(use_layer_norm=True, use_batch_norm=False)
    model = build_radad_model(cfg, tpp_dim=5376)
    neighbors = jnp.zeros((1, cfg.top_k, 5376))
    tpp = jnp.zeros((1, 5376))
    variables = model.init(jax.random.PRNGKey(0), neighbors, tpp)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    assert 6.0e6 < n_params < 6.6e6


def test_grads_flow(rng):
    cfg = Config().replace(use_layer_norm=True, use_batch_norm=False)
    D = 7 * 16
    model = build_radad_model(cfg, tpp_dim=D)
    neighbors = jnp.asarray(rng.standard_normal((4, 5, D)), jnp.float32)
    tpp = jnp.asarray(rng.standard_normal((4, D)), jnp.float32)
    labels = jnp.asarray([0.0, 1.0, 1.0, 0.0])
    variables = model.init(jax.random.PRNGKey(0), neighbors, tpp)

    def loss_fn(params):
        logits = model.apply({"params": params}, neighbors, tpp)
        import optax
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    grads = jax.grad(loss_fn)(variables["params"])
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(norms))
    assert any(n > 0 for n in norms)
