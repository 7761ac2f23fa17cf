"""Pretrained-weights rehearsal: the FULL from-disk loading leg.

The offline evidence chain for EER parity (full-size executed-reference
A/B, tests/test_encoders_fullsize.py) exercises ``hf_convert`` on
IN-MEMORY torch state dicts. The one leg it never touched — and the only
code that will run differently the day real checkpoints are available —
is the file path: ``--weights_dir`` → ``_find_local_checkpoint`` →
``load_state_dict`` (safetensors / pytorch_model.bin) →
``resolve_arch_config`` (checkpoint's own config.json) → converter →
``FrozenEncoder``. These tests serialize the same full-size torch modules
the A/B builds into REAL HF-layout checkpoint directories (both
serialization formats HF publishes) and drive that exact path, asserting
the loaded params are bit-identical to the in-memory conversion. After
this, the only environment-blocked step left is the download itself
(reference: from_pretrained at feature_extractor.py:19,76,119).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
safetensors_torch = pytest.importorskip("safetensors.torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from radad_tpu.config import Config  # noqa: E402

pytestmark = pytest.mark.slow


def _save_hf_dir(torch_model, dirpath, *, fmt="safetensors",
                 do_normalize=None):
    """Write ``dirpath`` in the layout ``huggingface_hub.snapshot_download``
    produces: weights file + config.json (+ preprocessor_config.json)."""
    os.makedirs(dirpath, exist_ok=True)
    sd = {k: v.contiguous() for k, v in torch_model.state_dict().items()}
    if fmt == "safetensors":
        safetensors_torch.save_file(sd, os.path.join(dirpath,
                                                     "model.safetensors"))
    else:
        torch.save(sd, os.path.join(dirpath, "pytorch_model.bin"))
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        f.write(torch_model.config.to_json_string())
    if do_normalize is not None:
        with open(os.path.join(dirpath, "preprocessor_config.json"),
                  "w") as f:
            json.dump({"do_normalize": do_normalize,
                       "feature_size": 1, "sampling_rate": 16000}, f)


def _assert_trees_equal(got, want, what=""):
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=what), got, want)


@pytest.fixture(scope="module")
def w2v2_base_torch():
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model

    torch.manual_seed(0)
    return Wav2Vec2Model(HFCfg(attn_implementation="eager")).eval()


def test_wav2vec2_fullsize_from_disk_safetensors(tmp_path, rng,
                                                 w2v2_base_torch):
    """model.safetensors on disk → build_encoder(--weights_dir path) →
    params bit-identical to the in-memory conversion, forward parity vs
    the torch oracle. This is the exact call chain the CLI/runner
    ``--weights_dir`` flag executes (models/encoder.py:246-313)."""
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.models.hf_convert import convert_wav2vec2
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, extract_features

    tm = w2v2_base_torch
    wdir = str(tmp_path / "weights")
    _save_hf_dir(tm, os.path.join(wdir, "facebook--wav2vec2-base-960h"),
                 fmt="safetensors", do_normalize=False)

    cfg = Config().replace(data_root=str(tmp_path))
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained, "checkpoint on disk was not picked up"
    assert enc.input_normalize is False
    assert enc.feature_dim == 768

    want = convert_wav2vec2(tm.state_dict(), Wav2Vec2Config())
    _assert_trees_equal(enc.params, want,
                        "safetensors round-trip changed the params")

    x = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    want_feat = np.stack([h.numpy() for h in out.hidden_states])[-4:].mean(0)
    got = np.asarray(extract_features(enc.params, jnp.asarray(x),
                                      enc.arch_cfg, (-4, -3, -2, -1)))
    np.testing.assert_allclose(got, want_feat, atol=5e-5, rtol=1e-4,
                               err_msg="from-disk forward parity")


def test_wav2vec2_fullsize_from_disk_bin(tmp_path, w2v2_base_torch):
    """pytorch_model.bin variant (HF's legacy serialization): loads via
    torch.load(weights_only=True) and converts to the SAME params as the
    safetensors file — both formats exist in the wild and the rehearsal
    must cover both."""
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.models.hf_convert import convert_wav2vec2
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config

    tm = w2v2_base_torch
    wdir = str(tmp_path / "weights_bin")
    _save_hf_dir(tm, os.path.join(wdir, "facebook--wav2vec2-base-960h"),
                 fmt="bin", do_normalize=False)

    cfg = Config().replace(data_root=str(tmp_path))
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained
    want = convert_wav2vec2(tm.state_dict(), Wav2Vec2Config())
    _assert_trees_equal(enc.params, want,
                        "pytorch_model.bin round-trip changed the params")


def test_input_normalize_resolves_from_preprocessor_config(tmp_path,
                                                           w2v2_base_torch):
    """do_normalize=True in the checkpoint's preprocessor_config.json must
    flip the encoder's input normalization (the lv60/xlsr-family contract,
    reference feature_extractor.py:27-30 via Wav2Vec2Processor)."""
    from radad_tpu.models.encoder import build_encoder

    wdir = str(tmp_path / "weights_norm")
    _save_hf_dir(w2v2_base_torch,
                 os.path.join(wdir, "facebook--wav2vec2-base-960h"),
                 fmt="safetensors", do_normalize=True)
    cfg = Config().replace(data_root=str(tmp_path))
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained
    assert enc.input_normalize is True


def test_custom_arch_resolves_from_checkpoint_config_json(tmp_path, rng):
    """A NON-preset model id whose geometry exists only in the checkpoint
    dir's config.json (the from_pretrained behavior for arbitrary ids):
    the architecture must resolve from the file, not a preset, and the
    loaded encoder must match the torch oracle forward."""
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.models.wav2vec2 import extract_features

    kw = dict(hidden_size=256, num_hidden_layers=3, num_attention_heads=4,
              intermediate_size=512, conv_dim=(64,) * 7)
    torch.manual_seed(1)
    tm = Wav2Vec2Model(HFCfg(attn_implementation="eager", **kw)).eval()
    wdir = str(tmp_path / "weights_custom")
    _save_hf_dir(tm, os.path.join(wdir, "acme--w2v2-mid"),
                 fmt="safetensors", do_normalize=False)

    cfg = Config().replace(data_root=str(tmp_path),
                           wav2vec2_model_name="acme/w2v2-mid")
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained
    assert enc.arch_cfg.hidden_size == 256
    assert enc.arch_cfg.num_hidden_layers == 3

    x = (rng.standard_normal((1, 32000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    want = np.stack([h.numpy() for h in out.hidden_states])[-4:].mean(0)
    got = np.asarray(extract_features(enc.params, jnp.asarray(x),
                                      enc.arch_cfg, (-4, -3, -2, -1)))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_wavlm_fullsize_from_disk(tmp_path):
    """wavlm-base full-size from a safetensors checkpoint dir: loaded
    params bit-identical to the in-memory conversion (the forward itself
    is parity-pinned at this scale by test_encoders_fullsize.py)."""
    from transformers import WavLMConfig as HFCfg, WavLMModel
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.models.hf_convert import convert_wavlm
    from radad_tpu.models.wavlm import WavLMConfig

    torch.manual_seed(0)
    tm = WavLMModel(HFCfg(attn_implementation="eager")).eval()
    wdir = str(tmp_path / "weights_wavlm")
    _save_hf_dir(tm, os.path.join(wdir, "microsoft--wavlm-base"),
                 fmt="safetensors", do_normalize=False)

    cfg = Config().replace(data_root=str(tmp_path),
                           feature_extractor_type="wavlm")
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained
    assert enc.feature_dim == 768
    want = convert_wavlm(tm.state_dict(), WavLMConfig())
    _assert_trees_equal(enc.params, want)


def test_whisper_fullsize_from_disk(tmp_path):
    """whisper-base: the checkpoint file on disk holds the FULL
    WhisperModel (encoder+decoder, as HF publishes it); the loader must
    pick out the encoder keys and match the in-memory conversion."""
    from transformers import WhisperConfig as HFCfg, WhisperModel
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.models.hf_convert import convert_whisper_encoder
    from radad_tpu.models.whisper import WhisperConfig

    hf = HFCfg(d_model=512, encoder_layers=6, encoder_attention_heads=8,
               encoder_ffn_dim=2048, num_mel_bins=80,
               max_source_positions=1500, decoder_layers=1,
               decoder_attention_heads=4, decoder_ffn_dim=256,
               attn_implementation="eager")
    torch.manual_seed(0)
    tm = WhisperModel(hf).eval()
    wdir = str(tmp_path / "weights_whisper")
    _save_hf_dir(tm, os.path.join(wdir, "openai--whisper-base"),
                 fmt="safetensors", do_normalize=False)

    cfg = Config().replace(data_root=str(tmp_path),
                           feature_extractor_type="whisper")
    enc = build_encoder(cfg, weights_dir=wdir)
    assert enc.pretrained
    assert enc.feature_dim == 512
    want = convert_whisper_encoder(tm.state_dict(), WhisperConfig())
    _assert_trees_equal(enc.params, want)
