"""Frozen-encoder registry and factory.

Counterpart of the reference's ``build_feature_extractor`` dispatch
(``/root/reference/pipeline.py:54-65``) over
``config.feature_extractor_type`` ∈ {wav2vec2, whisper, wavlm}. Each entry
bundles an architecture config, a jit-compiled segment→features function,
and the output ``feature_dim`` the rest of the pipeline keys off
(feature_extractor.py:19,76,119).

Weights resolve from LOCAL files only (this environment has no network):
``<weights_dir>/<model-name-with-slashes-as-dashes>/{model.safetensors,
pytorch_model.bin}``, else the standard HF cache layout if present, else
random initialization with a loud warning (still useful: the full pipeline,
retrieval dynamics, and benchmarks are weight-agnostic).
"""

from __future__ import annotations

import dataclasses
import glob
import logging
import os

from typing import Any, Optional

import jax
import jax.numpy as jnp

from radad_tpu.models import wav2vec2, wavlm, whisper
from radad_tpu.models import hf_convert

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class FrozenEncoder:
    """A frozen pretrained speech encoder: params + pure apply fns."""

    name: str  # "wav2vec2" | "whisper" | "wavlm"
    model_name: str  # HF-style id, e.g. facebook/wav2vec2-base-960h
    arch_cfg: Any
    params: Any
    pretrained: bool  # False => random init fallback
    layers_to_use: tuple = (-4, -3, -2, -1)  # wav2vec2 only
    compute_dtype: Any = jnp.float32
    whisper_pad_seconds: Any = 30.0  # None = trimmed fast mode

    @property
    def feature_dim(self) -> int:
        return self.arch_cfg.feature_dim

    def frames_per_segment(self, segment_samples: int) -> int:
        return self.arch_cfg.frames_for_samples(segment_samples)

    def segment_features(self, params, segments: jnp.ndarray) -> jnp.ndarray:
        """``segments [..., L]`` → per-frame features ``[..., T, D]`` (f32).

        Pure function of (params, segments): safe to close over in jit.
        Leading batch dims are flattened through the encoder and restored,
        so ``[B, S, L]`` (clips × windows) batches as one encoder call —
        the reference loops windows in Python (feature_extractor.py:94-113).
        """
        lead = segments.shape[:-1]
        flat = segments.reshape((-1, segments.shape[-1]))
        if self.name == "wav2vec2":
            feats = wav2vec2.extract_features(
                params, flat, self.arch_cfg, self.layers_to_use,
                dtype=self.compute_dtype)
        elif self.name == "wavlm":
            feats = wavlm.extract_features(
                params, flat, self.arch_cfg, dtype=self.compute_dtype)
        elif self.name == "whisper":
            feats = whisper.extract_features(
                params, flat, self.arch_cfg,
                pad_to_seconds=self.whisper_pad_seconds,
                dtype=self.compute_dtype)
        else:
            raise ValueError(f"unknown encoder: {self.name}")
        return feats.reshape(lead + feats.shape[1:])


_REGISTRY = {
    "wav2vec2": (wav2vec2.Wav2Vec2Config, wav2vec2.init_params,
                 hf_convert.convert_wav2vec2),
    "wavlm": (wavlm.WavLMConfig, wavlm.init_params, hf_convert.convert_wavlm),
    "whisper": (whisper.WhisperConfig, whisper.init_params,
                hf_convert.convert_whisper_encoder),
}


def _find_local_checkpoint(model_name: str, weights_dir: Optional[str]):
    candidates = []
    flat = model_name.replace("/", "--")
    if weights_dir:
        for fn in ("model.safetensors", "pytorch_model.bin"):
            candidates.append(os.path.join(weights_dir, flat, fn))
            candidates.append(
                os.path.join(weights_dir, model_name.split("/")[-1], fn))
    hf_home = os.environ.get(
        "HF_HOME", os.path.expanduser("~/.cache/huggingface"))
    candidates += glob.glob(os.path.join(
        hf_home, "hub", f"models--{model_name.replace('/', '--')}",
        "snapshots", "*", "model.safetensors"))
    candidates += glob.glob(os.path.join(
        hf_home, "hub", f"models--{model_name.replace('/', '--')}",
        "snapshots", "*", "pytorch_model.bin"))
    for c in candidates:
        if os.path.exists(c):
            return c
    return None


def build_encoder(config, *, weights_dir: Optional[str] = None,
                  seed: int = 0) -> FrozenEncoder:
    """Factory on ``config.feature_extractor_type`` (pipeline.py:54-65)."""
    kind = config.feature_extractor_type
    if kind not in _REGISTRY:
        raise ValueError(
            f"Unknown feature extractor type: {kind!r} "
            f"(expected one of {sorted(_REGISTRY)})")
    cfg_cls, init_fn, convert_fn = _REGISTRY[kind]
    arch_cfg = cfg_cls()
    model_name = {
        "wav2vec2": config.wav2vec2_model_name,
        "wavlm": config.wavlm_model_name,
        "whisper": config.whisper_model_name,
    }[kind]

    if weights_dir is None:
        weights_dir = os.path.join(config.data_root, "weights")
    ckpt = _find_local_checkpoint(model_name, weights_dir)
    if ckpt is not None:
        logger.info("Loading %s weights from %s", kind, ckpt)
        sd = hf_convert.load_state_dict(ckpt)
        params = convert_fn(sd, arch_cfg)
        pretrained = True
    else:
        logger.warning(
            "No local checkpoint for %s (%s) under %s — using RANDOM "
            "encoder weights. Pipeline mechanics are exact; detection "
            "quality requires pretrained weights.", kind, model_name,
            weights_dir)
        params = init_fn(jax.random.PRNGKey(seed), arch_cfg)
        pretrained = False

    dtype = (jnp.dtype(config.compute_dtype)
             if getattr(config, "use_mixed_precision", False)
             else jnp.float32)
    return FrozenEncoder(
        name=kind, model_name=model_name, arch_cfg=arch_cfg, params=params,
        pretrained=pretrained,
        layers_to_use=tuple(config.wav2vec2_layers_to_use),
        compute_dtype=dtype,
        whisper_pad_seconds=getattr(config, "whisper_pad_seconds", 30.0))
