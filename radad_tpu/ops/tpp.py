"""Temporal Pyramid Pooling as a statically-shaped JAX op.

Compresses per-frame encoder features ``[..., T, D]`` into a fixed clip
vector ``[..., sum(levels) * D]``. Counterpart of the reference's
``TemporalPyramidPooling`` (``/root/reference/pooling.py:66-103``), which
uses ``torch.nn.functional.adaptive_{max,avg}_pool1d``.

Bin-edge semantics match torch's adaptive pooling exactly: for output size
``level`` over length ``T``, bin ``i`` covers frames
``[floor(i*T/level), ceil((i+1)*T/level))``. Output layout parity with
pooling.py:83-84 and :102-103: within a level the result is bin-major
(``[level, D]`` flattened), and levels concatenate in config order, so the
total dim is ``sum(levels) * D`` (5376 for D=768, levels (1,2,4)).

T is static under jit, so the bins unroll at trace time into a handful of
slice-reduce ops that XLA fuses with the encoder output — no scatter, no
dynamic shapes (the reference's scatter-based variant, pooling.py:13-64, is
dead code there and pointless on TPU).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp


def tpp_output_dim(levels: Sequence[int], feature_dim: int) -> int:
    """pooling.py:119-122."""
    return sum(levels) * feature_dim


def _bin_edges(T: int, level: int) -> Tuple[Tuple[int, int], ...]:
    return tuple(
        (math.floor(i * T / level), math.ceil((i + 1) * T / level))
        for i in range(level)
    )


def temporal_pyramid_pool(
    features: jnp.ndarray,
    levels: Sequence[int] = (1, 2, 4),
    pooling_type: str = "max",
) -> jnp.ndarray:
    """Pool ``features[..., T, D]`` → ``[..., sum(levels)*D]``.

    Accepts any leading batch shape (the pipeline applies it over
    ``[B, S, T, D]`` segment features in one call).
    """
    if pooling_type not in ("max", "avg"):
        raise ValueError(f"Unsupported pooling type: {pooling_type}")
    T = features.shape[-2]
    outs = []
    for level in levels:
        for start, end in _bin_edges(T, level):
            window = features[..., start:end, :]
            if pooling_type == "max":
                outs.append(jnp.max(window, axis=-2))
            else:
                outs.append(jnp.mean(window, axis=-2))
    return jnp.concatenate(outs, axis=-1)
