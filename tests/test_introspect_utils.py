"""Introspection, profiling, and debug utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.config import Config
from radad_tpu.models.fusion import build_radad_model
from radad_tpu.models import introspect as I


@pytest.fixture(scope="module")
def small_model():
    # own rng: the shared ``rng`` fixture is function-scoped (on purpose —
    # see conftest) and cannot back a module-scoped fixture
    rng = np.random.default_rng(42)
    cfg = Config().replace(use_layer_norm=True, use_batch_norm=False)
    d = 7 * 16
    model = build_radad_model(cfg, tpp_dim=d)
    neighbors = jnp.asarray(rng.standard_normal((4, 5, d)), jnp.float32)
    tpp = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), neighbors, tpp)
    return model, variables, neighbors, tpp


def test_parameter_count(small_model):
    model, variables, *_ = small_model
    counts = I.parameter_count(variables)
    assert counts["total"] == sum(
        v for k, v in counts.items() if k != "total")
    assert counts["projection_layer"] > counts["detection_model"]


def test_model_complexity(small_model):
    model, variables, *_ = small_model
    rep = I.model_complexity(model, variables, batch=2)
    assert rep["forward_flops"] > 0
    assert rep["param_bytes_f32"] == rep["parameters"]["total"] * 4


def test_attention_weights(small_model):
    model, variables, neighbors, _ = small_model
    w = I.attention_weights(model, variables, neighbors)
    assert w.shape == (4, 5, 1)
    np.testing.assert_allclose(np.asarray(w).sum(axis=1), 1.0, rtol=1e-5)


def test_activations_capture(small_model):
    model, variables, neighbors, tpp = small_model
    acts = I.activations(model, variables, neighbors, tpp)
    assert any("projection_layer" in k for k in acts)
    assert any("detection_model" in k for k in acts)


def test_feature_importance(small_model):
    model, variables, neighbors, tpp = small_model
    imp = I.feature_importance(model, variables, neighbors, tpp)
    assert imp.shape == (tpp.shape[1],)
    assert float(jnp.sum(imp)) > 0


def test_predict_proba(small_model):
    model, variables, neighbors, tpp = small_model
    p = I.predict_proba(model, variables, neighbors, tpp)
    assert p.shape == (4,)
    assert np.all((np.asarray(p) >= 0) & (np.asarray(p) <= 1))
    pb = I.predict_batch_proba(model, variables, neighbors, tpp, chunk=2)
    np.testing.assert_allclose(pb, np.asarray(p), rtol=1e-6)


def test_profile_fn():
    from radad_tpu.utils.profiling import profile_fn

    f = jax.jit(lambda x: jnp.sum(x ** 2))
    stats = profile_fn(f, jnp.ones((64, 64)), iterations=3, label="square")
    assert stats["median_ms"] > 0
    assert stats["label"] == "square"


def test_debug_sanitize_and_checked():
    from radad_tpu.utils import debug as D

    x = jnp.asarray([1.0, jnp.nan, jnp.inf, -jnp.inf])
    np.testing.assert_array_equal(np.asarray(D.sanitize(x)),
                                  [1.0, 0.0, 0.0, 0.0])

    def f(v):
        D.assert_finite(v, "v")
        return v * 2

    run = D.checked(f)
    np.testing.assert_array_equal(np.asarray(run(jnp.ones(3))), 2.0)
    with pytest.raises(Exception, match="non-finite"):
        run(jnp.asarray([1.0, jnp.nan]))


def test_fuse_batch_norm(rng):
    """BN folding: eval-mode outputs identical before/after fusion."""
    from radad_tpu.models.introspect import fuse_batch_norm

    cfg = Config().replace(use_batch_norm=True, use_layer_norm=False)
    d = 7 * 16
    model = build_radad_model(cfg, tpp_dim=d)
    neighbors = jnp.asarray(rng.standard_normal((4, 5, d)), jnp.float32)
    tpp = jnp.asarray(rng.standard_normal((4, d)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), neighbors, tpp)
    # give BN non-trivial running stats
    import jax as _jax
    variables = dict(variables)
    variables["batch_stats"] = _jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim else x, variables["batch_stats"])
    before = model.apply(variables, neighbors, tpp, deterministic=True,
                         use_running_average=True)
    fused = fuse_batch_norm(model, variables)
    after = model.apply(fused, neighbors, tpp, deterministic=True,
                        use_running_average=True)
    np.testing.assert_allclose(np.asarray(after), np.asarray(before),
                               rtol=1e-4, atol=1e-5)


def test_chain_time_sanity():
    """chain_time returns a positive per-step estimate on CPU."""
    from radad_tpu.utils.benchmark import chain_time

    def step(x, w):
        return x @ w

    w = jnp.eye(64)
    dt = chain_time(step, jnp.ones((64, 64)), n=4, consts=(w,), reps=1)
    # per-step delta of a tiny op can be ~0 (or slightly negative from
    # timer noise); only sanity-check the magnitude
    assert np.isfinite(dt) and abs(dt) < 1.0


def test_profiler_trace(tmp_path):
    """jax.profiler trace context writes a trace directory."""
    import os
    from radad_tpu.utils.profiling import trace, annotate

    with trace(str(tmp_path)):
        with annotate("toy"):
            jnp.sum(jnp.ones((32, 32))).block_until_ready()
    # a plugins/profile dir with at least one file appears
    found = []
    for root, _, files in os.walk(str(tmp_path)):
        found.extend(files)
    assert found, "no trace files written"
