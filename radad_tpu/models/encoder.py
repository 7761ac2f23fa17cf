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
    # Per-segment zero-mean/unit-var waveform normalization, the HF
    # processor's ``do_normalize`` the reference applies before the
    # waveform encoders (feature_extractor.py:27-30 via Wav2Vec2Processor,
    # :152-154 via AutoFeatureExtractor). Resolved by build_encoder from
    # config.input_normalize or the checkpoint's preprocessor_config.json.
    input_normalize: bool = False

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
        if self.input_normalize and self.name != "whisper":
            # HF zero_mean_unit_var_norm (population variance, eps 1e-7),
            # per segment — the reference's segments are equal-length so
            # the processor normalizes each over its full window.
            flat = flat.astype(jnp.float32)
            mean = jnp.mean(flat, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(flat - mean), axis=-1, keepdims=True)
            flat = (flat - mean) / jnp.sqrt(var + 1e-7)
        if self.name in ("wav2vec2", "hubert"):
            # hubert: same architecture family (HF HubertModel state dicts
            # are key-identical to Wav2Vec2Model), same layer-select mean.
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
    # Extension beyond the reference's 3-way factory: HuBERT is
    # architecturally the wav2vec2 family (identical state-dict keys and
    # forward, torch-parity tested in tests/test_encoders.py).
    "hubert": (wav2vec2.Wav2Vec2Config, wav2vec2.init_params,
               hf_convert.convert_wav2vec2),
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


# Architecture presets for well-known HF model ids (matched on the id's
# basename). The reference gets size-variant support for free from HF
# transformers (any name set on config.{wav2vec2,wavlm,whisper}_model_name,
# /root/reference/config.py:42-45, resolves to the right architecture);
# here the same holds via these presets or, preferably, the checkpoint's
# own config.json (see resolve_arch_config).
_LARGE_STABLE = dict(hidden_size=1024, num_hidden_layers=24,
                     num_attention_heads=16, intermediate_size=4096,
                     feat_extract_norm="layer", conv_bias=True,
                     do_stable_layer_norm=True)
_PRESETS = {
    "wav2vec2": {
        "wav2vec2-base": {}, "wav2vec2-base-960h": {},
        # original large: post-LN, group-norm frontend
        "wav2vec2-large-960h": dict(hidden_size=1024, num_hidden_layers=24,
                                    num_attention_heads=16,
                                    intermediate_size=4096),
        # lv60 / robust / xlsr family: pre-LN, per-layer-LN frontend
        "wav2vec2-large-960h-lv60": _LARGE_STABLE,
        "wav2vec2-large-960h-lv60-self": _LARGE_STABLE,
        "wav2vec2-large-robust": _LARGE_STABLE,
        "wav2vec2-large-xlsr-53": _LARGE_STABLE,
    },
    "wavlm": {
        "wavlm-base": {}, "wavlm-base-plus": {}, "wavlm-base-sv": {},
        "wavlm-base-plus-sv": {},
        "wavlm-large": _LARGE_STABLE,
    },
    "hubert": {
        "hubert-base-ls960": {},
        "hubert-large-ls960-ft": _LARGE_STABLE,
        "hubert-xlarge-ls960-ft": dict(_LARGE_STABLE, hidden_size=1280,
                                       num_hidden_layers=48,
                                       intermediate_size=5120),
    },
    "whisper": {
        "whisper-tiny": dict(d_model=384, num_hidden_layers=4,
                             num_attention_heads=6, ffn_dim=1536),
        "whisper-base": {},
        "whisper-small": dict(d_model=768, num_hidden_layers=12,
                              num_attention_heads=12, ffn_dim=3072),
        "whisper-medium": dict(d_model=1024, num_hidden_layers=24,
                               num_attention_heads=16, ffn_dim=4096),
        "whisper-large": dict(d_model=1280, num_hidden_layers=32,
                              num_attention_heads=20, ffn_dim=5120),
        "whisper-large-v2": dict(d_model=1280, num_hidden_layers=32,
                                 num_attention_heads=20, ffn_dim=5120),
        "whisper-large-v3": dict(d_model=1280, num_hidden_layers=32,
                                 num_attention_heads=20, ffn_dim=5120,
                                 num_mel_bins=128),
    },
}

# HF config.json key → our arch-config field (None = same name).
_HF_FIELD_MAP = {
    "wav2vec2": {
        "hidden_size": None, "num_hidden_layers": None,
        "num_attention_heads": None, "intermediate_size": None,
        "conv_dim": tuple, "conv_kernel": tuple, "conv_stride": tuple,
        "conv_bias": None, "feat_extract_norm": None,
        "num_conv_pos_embeddings": None,
        "num_conv_pos_embedding_groups": None, "layer_norm_eps": None,
        "do_stable_layer_norm": None,
    },
    "whisper": {
        "d_model": None, "encoder_layers": "num_hidden_layers",
        "encoder_attention_heads": "num_attention_heads",
        "encoder_ffn_dim": "ffn_dim", "num_mel_bins": None,
        "max_source_positions": None,
    },
}
_HF_FIELD_MAP["wavlm"] = dict(_HF_FIELD_MAP["wav2vec2"],
                              num_buckets=None,
                              max_bucket_distance=None)
_HF_FIELD_MAP["hubert"] = _HF_FIELD_MAP["wav2vec2"]


def resolve_arch_config(kind: str, model_name: str,
                        ckpt_path: Optional[str] = None):
    """Architecture config for ``model_name``: the checkpoint's own
    config.json when available (exact), else a preset matched on the id's
    basename, else the base default with a loud warning for unknown
    non-base names."""
    cfg_cls = _REGISTRY[kind][0]
    if ckpt_path:
        cfg_json = os.path.join(os.path.dirname(ckpt_path), "config.json")
        if os.path.exists(cfg_json):
            import json
            with open(cfg_json) as f:
                hf = json.load(f)
            fields = {f.name for f in dataclasses.fields(cfg_cls)}
            kw = {}
            for hf_key, target in _HF_FIELD_MAP[kind].items():
                if hf_key not in hf:
                    continue
                if target is tuple:
                    kw[hf_key] = tuple(hf[hf_key])
                else:
                    kw[target or hf_key] = hf[hf_key]
            kw = {k: v for k, v in kw.items() if k in fields}
            return cfg_cls(**kw)
    base = model_name.split("/")[-1].lower()
    preset = _PRESETS[kind].get(base)
    if preset is not None:
        return cfg_cls(**preset)
    logger.warning(
        "No architecture preset or config.json for %s %r — assuming the "
        "base architecture. If this is a size variant, place the HF "
        "config.json next to the checkpoint.", kind, model_name)
    return cfg_cls()


def build_encoder(config, *, weights_dir: Optional[str] = None,
                  seed: int = 0) -> FrozenEncoder:
    """Factory on ``config.feature_extractor_type`` (pipeline.py:54-65)."""
    kind = config.feature_extractor_type
    if kind not in _REGISTRY:
        raise ValueError(
            f"Unknown feature extractor type: {kind!r} "
            f"(expected one of {sorted(_REGISTRY)})")
    cfg_cls, init_fn, convert_fn = _REGISTRY[kind]
    model_name = {
        "wav2vec2": config.wav2vec2_model_name,
        "wavlm": config.wavlm_model_name,
        "hubert": getattr(config, "hubert_model_name",
                          "facebook/hubert-base-ls960"),
        "whisper": config.whisper_model_name,
    }[kind]

    if weights_dir is None:
        weights_dir = os.path.join(config.data_root, "weights")
    ckpt = _find_local_checkpoint(model_name, weights_dir)
    arch_cfg = resolve_arch_config(kind, model_name, ckpt)
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
    # Input normalization: explicit config wins; else the checkpoint's own
    # preprocessor_config.json (the file HF's from_pretrained processors
    # read for do_normalize — reference feature_extractor.py:14,131); else
    # off (correct for the reference's default base checkpoints).
    normalize = getattr(config, "input_normalize", None)
    if normalize is None:
        normalize = False
        if ckpt is not None:
            pp_json = os.path.join(os.path.dirname(ckpt),
                                   "preprocessor_config.json")
            if os.path.exists(pp_json):
                import json
                with open(pp_json) as f:
                    normalize = bool(json.load(f).get("do_normalize", False))
                logger.info("input_normalize=%s (from %s)", normalize,
                            pp_json)
            else:
                logger.warning(
                    "No preprocessor_config.json beside %s — assuming "
                    "do_normalize=False. For lv60/xlsr/large-family "
                    "checkpoints place the file next to the weights or set "
                    "config.input_normalize explicitly.", ckpt)
    return FrozenEncoder(
        name=kind, model_name=model_name, arch_cfg=arch_cfg, params=params,
        pretrained=pretrained,
        layers_to_use=tuple(config.wav2vec2_layers_to_use),
        compute_dtype=dtype,
        whisper_pad_seconds=getattr(config, "whisper_pad_seconds", 30.0),
        input_normalize=bool(normalize))
