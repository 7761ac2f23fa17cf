"""Fused MHA Pallas kernel (ops/attention.py): parity vs the XLA oracle in
interpret mode, with/without the WavLM gated-bias factors, across query-tile
boundaries."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radad_tpu.ops.attention import fused_mha, mha_reference


def _qkv(key, b, t, d, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    return tuple(jax.random.normal(k, (b, t, d), dtype) for k in ks)


@pytest.mark.parametrize("t", [7, 99])
def test_fused_matches_reference(t):
    b, d, h = 3, 128, 4
    q, k, v = _qkv(jax.random.PRNGKey(0), b, t, d)
    got = fused_mha(q, k, v, h, interpret=True)
    want = mha_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_tiles_query_rows():
    """T > 512 exercises the (b, nt) grid with k/v blocks resident."""
    b, t, d, h = 2, 600, 64, 2
    q, k, v = _qkv(jax.random.PRNGKey(1), b, t, d)
    got = fused_mha(q, k, v, h, interpret=True)
    want = mha_reference(q, k, v, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gated_bias_matches_reference():
    b, t, d, h = 2, 37, 128, 4
    key = jax.random.PRNGKey(2)
    q, k, v = _qkv(key, b, t, d)
    gate = jax.random.normal(jax.random.PRNGKey(3), (b, t, h))
    pos = jax.random.normal(jax.random.PRNGKey(4), (h, t, t))
    got = fused_mha(q, k, v, h, gate=gate, pos_bias=pos, interpret=True)
    want = mha_reference(q, k, v, h, gate=gate, pos_bias=pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_reference_matches_materialized_bias():
    """The factored gate×pos form equals the materialized [B,H,T,T] bias
    (HF WavLM semantics: bias[b,h,t,s] = gate[b,h,t] * pos[h,t,s])."""
    b, t, d, h = 2, 11, 64, 2
    q, k, v = _qkv(jax.random.PRNGKey(5), b, t, d)
    gate = jax.random.normal(jax.random.PRNGKey(6), (b, t, h))
    pos = jax.random.normal(jax.random.PRNGKey(7), (h, t, t))
    got = mha_reference(q, k, v, h, gate=gate, pos_bias=pos)

    def split(x):
        return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)

    bias = gate.transpose(0, 2, 1)[..., None] * pos[None]
    logits = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k),
                        preferred_element_type=jnp.float32) + bias
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    want = jnp.einsum("bhts,bhsd->bhtd", w, split(v),
                      preferred_element_type=jnp.float32)
    want = want.transpose(0, 2, 1, 3).reshape(b, t, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_bf16_path():
    b, t, d, h = 2, 50, 128, 4
    q, k, v = _qkv(jax.random.PRNGKey(8), b, t, d, jnp.bfloat16)
    got = fused_mha(q, k, v, h, interpret=True)
    want = mha_reference(q, k, v, h)
    assert got.dtype == jnp.bfloat16
    # the kernel keeps f32 logits in VMEM while the bf16-mode reference
    # rounds logits to bf16 before softmax (the measured-faster HBM form)
    # — both are valid bf16-mode results; tolerance covers the bf16
    # softmax-input rounding on near-tie logits
    np.testing.assert_allclose(np.asarray(got.astype(jnp.float32)),
                               np.asarray(want.astype(jnp.float32)),
                               rtol=0.05, atol=0.12)
