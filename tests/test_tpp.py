"""Temporal pyramid pooling parity vs torch adaptive_{max,avg}_pool1d —
the exact op the reference uses (pooling.py:66-86) — including output
layout (bin-major within level, levels concatenated in order)."""

import numpy as np
import pytest

from radad_tpu.ops.tpp import temporal_pyramid_pool, tpp_output_dim


def torch_oracle(features, levels, pooling_type):
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(features).t().unsqueeze(0)  # [1, D, T]
    outs = []
    for level in levels:
        if pooling_type == "max":
            pooled = F.adaptive_max_pool1d(x, level)
        else:
            pooled = F.adaptive_avg_pool1d(x, level)
        outs.append(pooled.squeeze(0).t().flatten())
    return torch.cat(outs).numpy()


@pytest.mark.parametrize("T", [99, 100, 149, 7, 4, 1])
@pytest.mark.parametrize("pooling", ["max", "avg"])
def test_matches_torch(T, pooling, rng):
    D = 32
    levels = (1, 2, 4)
    feats = rng.standard_normal((T, D)).astype(np.float32)
    expected = torch_oracle(feats, levels, pooling)
    got = np.asarray(temporal_pyramid_pool(feats, levels, pooling))
    assert got.shape == (tpp_output_dim(levels, D),)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_batched_and_output_dim(rng):
    feats = rng.standard_normal((3, 2, 50, 16)).astype(np.float32)  # [B,S,T,D]
    out = np.asarray(temporal_pyramid_pool(feats, (1, 2, 4), "max"))
    assert out.shape == (3, 2, 7 * 16)
    # Each batch/segment independently equals the unbatched result.
    single = np.asarray(temporal_pyramid_pool(feats[1, 0], (1, 2, 4), "max"))
    np.testing.assert_allclose(out[1, 0], single, rtol=1e-6)


def test_reference_dims():
    # wav2vec2/wavlm: 7*768 = 5376; whisper: 7*512 = 3584 (SURVEY.md §2)
    assert tpp_output_dim((1, 2, 4), 768) == 5376
    assert tpp_output_dim((1, 2, 4), 512) == 3584
