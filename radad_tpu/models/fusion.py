"""Trainable RADAD fusion model: projection over retrieved neighbors,
query/neighbor fusion, and the detection MLP head.

Flax counterparts of the reference's three trainable modules:

  * ``ProjectionLayer`` (``/root/reference/projection.py:8-117``): scalar
    attention scores Linear(D→H)→tanh→Linear(H→1) softmaxed over the K
    neighbors (projection.py:68-71,87), a parallel "CST" channel re-weighting
    Linear(D→H)→ReLU→Linear(H→D) (projection.py:73-76), weighted sum over K
    (projection.py:88-89), then head Linear(D→H)→LayerNorm(fp32,
    eps=1e-6)→Dropout→Linear(H→out) (projection.py:50-53,92-102). Xavier
    uniform weights, zero biases (projection.py:58-66).
  * ``DetectionModel`` (``/root/reference/detection_model.py:41-126``): MLP
    ``in→hidden…→1`` with per-hidden Linear→{BatchNorm|LayerNorm}→ReLU→
    Dropout; He(kaiming-uniform) init (detection_model.py:93-105); output
    squeezed to logits ``[B]``.
  * ``RADADModel`` (``/root/reference/radad_model.py:9-41``): projection on
    neighbors, ``fuse = Linear(D_tpp + D_proj → D_proj)`` over the concat of
    query TPP vector and projected neighbors, detection head on the result.

TPU-native design notes: parameters live in fp32; matmuls run in the config
compute dtype (bf16 by default — the TPU analogue of the reference's AMP
path) with LayerNorms forced to fp32 exactly like the reference's
``norm_in_fp32`` flag (projection.py:21,95-99). Everything is shape-static
and jit/pjit friendly; the whole model is ~3M params so it is replicated
across the mesh and batch-sharded along 'data'.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

# torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) on weights —
# uniform(±sqrt(1/fan_in)) — and uniform(±1/sqrt(fan_in)) on bias. Used for
# the fuse layer, which the reference leaves at torch defaults
# (radad_model.py:26).
torch_default_kernel = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _torch_default_bias(key, shape, dtype=jnp.float32, fan_in: int = 1):
    import jax

    bound = 1.0 / (fan_in ** 0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


he_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
xavier_uniform = nn.initializers.xavier_uniform()


class ProjectionLayer(nn.Module):
    """Attention aggregation of K retrieved neighbor vectors → [B, output_dim]."""

    input_dim: int
    hidden_dim: int = 256
    output_dim: int = 128
    dropout: float = 0.1
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, neighbors: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        # neighbors: [B, K, D]
        x = neighbors.astype(self.compute_dtype)
        dense = lambda feats, name: nn.Dense(
            feats, kernel_init=xavier_uniform, bias_init=nn.initializers.zeros,
            dtype=self.compute_dtype, param_dtype=jnp.float32, name=name)

        # Attention-score path (projection.py:68-71)
        scores = dense(1, "attention_final")(
            jnp.tanh(dense(self.hidden_dim, "attention_score")(x)))  # [B, K, 1]
        # CST channel re-weighting path (projection.py:73-76)
        cst = dense(self.input_dim, "cst_output")(
            nn.relu(dense(self.hidden_dim, "cst_hidden")(x)))  # [B, K, D]

        # Softmax over neighbors in fp32 for stability, then weighted sum
        # (projection.py:87-89).
        weights = nn.softmax(scores.astype(jnp.float32), axis=1).astype(self.compute_dtype)
        summed = jnp.sum(weights * cst, axis=1)  # [B, D]

        # Head: Linear → fp32 LayerNorm → Dropout → Linear
        # (projection.py:50-53, 92-102).
        h = dense(self.hidden_dim, "weight_sum")(summed)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="normalization")(h.astype(jnp.float32))
        h = h.astype(self.compute_dtype)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return dense(self.output_dim, "unified_embedding")(h)

    def attention_weights(self, params, neighbors: jnp.ndarray) -> jnp.ndarray:
        """Softmaxed neighbor attention, for introspection (projection.py:124-130)."""
        def fn(module, x):
            dense = lambda feats, name: nn.Dense(
                feats, dtype=module.compute_dtype, param_dtype=jnp.float32, name=name)
            s = dense(1, "attention_final")(jnp.tanh(dense(module.hidden_dim, "attention_score")(x)))
            return nn.softmax(s.astype(jnp.float32), axis=1)

        return nn.apply(fn, self)({"params": params}, neighbors)


class DetectionModel(nn.Module):
    """MLP classifier head → spoof logits [B]."""

    input_dim: int
    hidden_dims: Sequence[int] = (64, 32)
    dropout: float = 0.1
    use_batch_norm: bool = False
    use_layer_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        x = x.astype(self.compute_dtype)
        dims = list(self.hidden_dims) + [1]
        for i, feats in enumerate(dims):
            x = nn.Dense(
                feats, kernel_init=he_uniform, bias_init=nn.initializers.zeros,
                dtype=self.compute_dtype, param_dtype=jnp.float32,
                name=f"linear_{i}")(x)
            if i < len(dims) - 1:
                if self.use_batch_norm:
                    x = nn.BatchNorm(
                        use_running_average=use_running_average, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                        name=f"norm_{i}")(x.astype(jnp.float32)).astype(self.compute_dtype)
                elif self.use_layer_norm:
                    x = nn.LayerNorm(
                        epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                        name=f"norm_{i}")(x.astype(jnp.float32)).astype(self.compute_dtype)
                x = nn.relu(x)
                if self.dropout > 0:
                    x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return jnp.squeeze(x, axis=-1).astype(jnp.float32)  # logits [B]


class RADADModel(nn.Module):
    """Retrieval-augmented detector: neighbors + query TPP vector → logit."""

    tpp_dim: int
    projection_hidden_dim: int = 256
    projection_output_dim: int = 128
    projection_dropout: float = 0.1
    detection_hidden_dims: Sequence[int] = (64, 32)
    detection_dropout: float = 0.1
    use_batch_norm: bool = False
    use_layer_norm: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.projection_layer = ProjectionLayer(
            input_dim=self.tpp_dim,
            hidden_dim=self.projection_hidden_dim,
            output_dim=self.projection_output_dim,
            dropout=self.projection_dropout,
            compute_dtype=self.compute_dtype,
        )
        fuse_in = self.tpp_dim + self.projection_output_dim

        def fuse_bias(key, shape, dtype=jnp.float32):
            return _torch_default_bias(key, shape, dtype, fan_in=fuse_in)

        self.fuse = nn.Dense(
            self.projection_output_dim, kernel_init=torch_default_kernel,
            bias_init=fuse_bias, dtype=self.compute_dtype, param_dtype=jnp.float32)
        self.detection_model = DetectionModel(
            input_dim=self.projection_output_dim,
            hidden_dims=self.detection_hidden_dims,
            dropout=self.detection_dropout,
            use_batch_norm=self.use_batch_norm,
            use_layer_norm=self.use_layer_norm,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, neighbor_vecs: jnp.ndarray, tpp_vecs: jnp.ndarray, *,
                 deterministic: bool = True,
                 use_running_average: bool = True) -> jnp.ndarray:
        """neighbor_vecs [B, K, D], tpp_vecs [B, D] → logits [B]
        (radad_model.py:32-41)."""
        proj = self.projection_layer(neighbor_vecs, deterministic=deterministic)
        fused = self.fuse(
            jnp.concatenate(
                [tpp_vecs.astype(self.compute_dtype), proj], axis=-1))
        return self.detection_model(
            fused, deterministic=deterministic,
            use_running_average=use_running_average)


def build_radad_model(config, tpp_dim: int) -> RADADModel:
    """Factory wiring the frozen Config into the model, mirroring
    radad_model.py:17-27."""
    return RADADModel(
        tpp_dim=tpp_dim,
        projection_hidden_dim=config.projection_hidden_dim,
        projection_output_dim=config.projection_output_dim,
        projection_dropout=config.projection_dropout,
        detection_hidden_dims=tuple(config.detection_hidden_dims),
        detection_dropout=config.detection_dropout,
        # Same precedence as detection_model.py:54-59: BatchNorm wins when
        # both flags are set (main.py:65-66 turns BN off / LN on for runs).
        use_batch_norm=config.use_batch_norm,
        use_layer_norm=config.use_layer_norm,
        compute_dtype=jnp.dtype(config.compute_dtype)
        if config.use_mixed_precision else jnp.float32,
    )
