"""Optimizer parity: per-group clip + Adam-with-L2 vs torch semantics,
and the pos-weighted BCE vs torch BCEWithLogitsLoss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.train import optim


def fake_params():
    return {
        "projection_layer": {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))},
        "fuse": {"kernel": jnp.ones((4, 2))},
        "detection_model": {"linear_0": {"kernel": jnp.ones((2, 1))}},
    }


def test_param_labels():
    labels = optim.param_labels(fake_params())
    assert labels["projection_layer"]["w"] == "projection_layer"
    assert labels["fuse"]["kernel"] == "fuse"
    assert labels["detection_model"]["linear_0"]["kernel"] == "detection_model"


def test_per_group_clipping():
    """A huge gradient in one group must not shrink another group's step."""
    params = fake_params()
    opt = optim.make_optimizer(learning_rate=1.0, weight_decay=0.0)
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    grads["projection_layer"]["w"] = jnp.full((4, 4), 1e6)  # exploding
    grads["fuse"]["kernel"] = jnp.full((4, 2), 1e-3)  # tiny
    updates, _ = opt.update(grads, state, params)
    # projection clipped to norm 1.0 → adam normalizes anyway, but finite
    assert np.isfinite(np.asarray(updates["projection_layer"]["w"])).all()
    # fuse group untouched by the projection explosion: adam step ≈ -lr sign
    fuse_step = np.asarray(updates["fuse"]["kernel"])
    assert np.all(np.abs(fuse_step) > 0.1)


def test_matches_torch_adam_sequence():
    """Run 5 steps of our chain vs torch Adam(+clip) on identical grads."""
    torch = pytest.importorskip("torch")
    lr, wd = 1e-2, 1e-3
    w0 = np.random.default_rng(0).standard_normal((3, 3)).astype(np.float32)
    grads_seq = [np.random.default_rng(i + 1).standard_normal((3, 3))
                 .astype(np.float32) * (10 if i == 2 else 1)
                 for i in range(5)]

    # torch: clip then Adam with weight_decay (L2-in-grad)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in grads_seq:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        torch.nn.utils.clip_grad_norm_([tw], max_norm=1.0)
        topt.step()

    params = {"fuse": {"w": jnp.asarray(w0)}}
    opt = optim.make_optimizer(lr, wd)
    state = opt.init(params)
    for g in grads_seq:
        import optax

        updates, state = opt.update({"fuse": {"w": jnp.asarray(g)}}, state,
                                    params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["fuse"]["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_pos_weighted_bce_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    logits = rng.standard_normal(32).astype(np.float32)
    labels = (rng.random(32) > 0.4).astype(np.float32)
    for w in (0.5, 1.0, 3.7):
        ours = float(optim.pos_weighted_bce(
            jnp.asarray(logits), jnp.asarray(labels), w))
        crit = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([w]))
        theirs = float(crit(torch.from_numpy(logits),
                            torch.from_numpy(labels)))
        assert abs(ours - theirs) < 1e-5


def test_bce_valid_mask():
    logits = jnp.asarray([0.0, 0.0, 100.0])
    labels = jnp.asarray([1.0, 0.0, 0.0])
    valid = jnp.asarray([True, True, False])
    masked = float(optim.pos_weighted_bce(logits, labels, 1.0, valid))
    ref = float(optim.pos_weighted_bce(logits[:2], labels[:2], 1.0))
    assert abs(masked - ref) < 1e-6
