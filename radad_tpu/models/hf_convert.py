"""HF torch checkpoint → radad_tpu param-pytree converters.

The reference downloads pretrained torch models at runtime
(``/root/reference/feature_extractor.py:15-18,75-80,140-144``); here the
conversion is explicit and offline: given a torch ``state_dict`` (from
``torch.load``/safetensors or a live ``transformers`` model), produce the
stacked JAX pytrees consumed by ``radad_tpu.models.{wav2vec2,wavlm,whisper}``.

All dense weights transpose from torch's ``[out, in]`` to ``[in, out]``;
conv weights from ``[out, in, k]`` to ``[k, in, out]``; the weight-normed
positional conv is materialized into a plain kernel (the encoders are frozen,
so the reparameterization serves no purpose on our side).
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _lin(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    w = jnp.asarray(_np(sd[f"{prefix}.weight"]).T)
    out = {"w": w}
    out["b"] = (jnp.asarray(_np(sd[f"{prefix}.bias"]))
                if f"{prefix}.bias" in sd else None)
    return out


def _ln(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _attn(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    q = _lin(sd, f"{prefix}.q_proj")
    k = _lin(sd, f"{prefix}.k_proj")
    v = _lin(sd, f"{prefix}.v_proj")
    o = _lin(sd, f"{prefix}.out_proj")
    return {"qw": q["w"], "qb": q["b"], "kw": k["w"], "kb": k["b"],
            "vw": v["w"], "vb": v["b"], "ow": o["w"], "ob": o["b"]}


def _weight_normed_conv(sd: Mapping, prefix: str) -> np.ndarray:
    """Materialize torch weight_norm(dim=2): w = g * v / ||v||_{dims 0,1}."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = _np(sd[f"{prefix}.parametrizations.weight.original0"])
        v = _np(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        g = _np(sd[f"{prefix}.weight_g"])
        v = _np(sd[f"{prefix}.weight_v"])
    norm = np.sqrt(np.sum(v * v, axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)  # [out, in/groups, k]


def _stack(layers):
    import jax

    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


# ----------------------------------------------------------------------
def _conv_frontend(sd: Mapping, cfg, prefix: str = "feature_extractor"):
    conv_layers = []
    for i in range(len(cfg.conv_dim)):
        layer = {"kernel": jnp.asarray(
            _np(sd[f"{prefix}.conv_layers.{i}.conv.weight"]).transpose(2, 1, 0))}
        if f"{prefix}.conv_layers.{i}.conv.bias" in sd:
            layer["bias"] = jnp.asarray(
                _np(sd[f"{prefix}.conv_layers.{i}.conv.bias"]))
        ln_key = f"{prefix}.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            layer["norm_scale"] = jnp.asarray(_np(sd[ln_key]))
            layer["norm_bias"] = jnp.asarray(
                _np(sd[f"{prefix}.conv_layers.{i}.layer_norm.bias"]))
        conv_layers.append(layer)
    return conv_layers


def _w2v2_common(sd: Mapping, cfg) -> dict:
    """Shared wav2vec2/wavlm skeleton: conv frontend, feature projection,
    positional conv, encoder LN."""
    fp_lin = _lin(sd, "feature_projection.projection")
    fp_ln = _ln(sd, "feature_projection.layer_norm")
    pos_w = _weight_normed_conv(sd, "encoder.pos_conv_embed.conv")
    return {
        "conv_layers": _conv_frontend(sd, cfg),
        "feat_proj": {"ln_scale": fp_ln["scale"], "ln_bias": fp_ln["bias"],
                      "kernel": fp_lin["w"], "bias": fp_lin["b"]},
        "pos_conv": {"kernel": jnp.asarray(pos_w.transpose(2, 1, 0)),
                     "bias": jnp.asarray(
                         _np(sd["encoder.pos_conv_embed.conv.bias"]))},
        "encoder_ln": _ln(sd, "encoder.layer_norm"),
    }


def convert_wav2vec2(sd: Mapping, cfg) -> dict:
    """HF Wav2Vec2Model state_dict → radad_tpu.models.wav2vec2 params."""
    params = _w2v2_common(sd, cfg)
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        ffn1 = _lin(sd, f"{p}.feed_forward.intermediate_dense")
        ffn2 = _lin(sd, f"{p}.feed_forward.output_dense")
        layers.append({
            "attn": _attn(sd, f"{p}.attention"),
            "ln1": _ln(sd, f"{p}.layer_norm"),
            "ffn": {"w1": ffn1["w"], "b1": ffn1["b"],
                    "w2": ffn2["w"], "b2": ffn2["b"]},
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
        })
    params["layers"] = _stack(layers)
    return params


def convert_wavlm(sd: Mapping, cfg) -> dict:
    """HF WavLMModel state_dict → radad_tpu.models.wavlm params."""
    params = _w2v2_common(sd, cfg)
    params["rel_attn_embed"] = jnp.asarray(
        _np(sd["encoder.layers.0.attention.rel_attn_embed.weight"]))
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}"
        ffn1 = _lin(sd, f"{p}.feed_forward.intermediate_dense")
        ffn2 = _lin(sd, f"{p}.feed_forward.output_dense")
        gate_lin = _lin(sd, f"{p}.attention.gru_rel_pos_linear")
        layers.append({
            "attn": _attn(sd, f"{p}.attention"),
            "gate_w": gate_lin["w"], "gate_b": gate_lin["b"],
            "gate_const": jnp.asarray(
                _np(sd[f"{p}.attention.gru_rel_pos_const"]).reshape(-1)),
            "ln1": _ln(sd, f"{p}.layer_norm"),
            "ffn": {"w1": ffn1["w"], "b1": ffn1["b"],
                    "w2": ffn2["w"], "b2": ffn2["b"]},
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
        })
    params["layers"] = _stack(layers)
    return params


def convert_whisper_encoder(sd: Mapping, cfg) -> dict:
    """HF WhisperModel (or WhisperEncoder) state_dict → whisper params.

    Accepts either ``model.encoder.*``/``encoder.*``-prefixed or bare keys.
    """
    for pref in ("model.encoder.", "encoder.", ""):
        if f"{pref}conv1.weight" in sd:
            break
    else:
        raise KeyError("no whisper encoder keys found in state dict")

    def g(key):
        return sd[pref + key]

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{pref}layers.{i}"
        fc1 = _lin(sd, f"{p}.fc1")
        fc2 = _lin(sd, f"{p}.fc2")
        layers.append({
            "attn": _attn(sd, f"{p}.self_attn"),
            "ln1": _ln(sd, f"{p}.self_attn_layer_norm"),
            "ffn": {"w1": fc1["w"], "b1": fc1["b"],
                    "w2": fc2["w"], "b2": fc2["b"]},
            "ln2": _ln(sd, f"{p}.final_layer_norm"),
        })
    return {
        "conv1": {"kernel": jnp.asarray(_np(g("conv1.weight")).transpose(2, 1, 0)),
                  "bias": jnp.asarray(_np(g("conv1.bias")))},
        "conv2": {"kernel": jnp.asarray(_np(g("conv2.weight")).transpose(2, 1, 0)),
                  "bias": jnp.asarray(_np(g("conv2.bias")))},
        "pos_embed": jnp.asarray(_np(g("embed_positions.weight"))),
        "final_ln": _ln(sd, f"{pref}layer_norm"),
        "layers": _stack(layers),
    }


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch ``.bin``/``.pt`` or ``.safetensors`` checkpoint from disk
    into a flat name→array dict (no network access; local files only)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}
