"""Full-size encoder forward-parity vs HF torch (VERDICT r2 #1).

The tiny-config parity tests in test_encoders.py prove the architecture
math; these prove the CONVERSION + architecture at the true scales the
reference consumes (/root/reference/feature_extractor.py:19,76,119):

  * wav2vec2-base     — 768-d, 12 layers, 7-stage conv frontend,
                        128/16 grouped pos-conv (HF Wav2Vec2Config defaults)
  * wavlm-base        — gated relative position bias with the REAL bucket
                        geometry (num_buckets=320, max_distance=800)
  * whisper-base enc  — 80 log-mel bins, full 1500-position table (30 s)
  * hubert-base       — the 4th family (HF HubertConfig defaults)
  * wav2vec2-large-lv60 — the pre-LN (do_stable_layer_norm) + per-layer-LN
                        frontend variant that exists only as a preset here
  * whisper-large-v3  — 128-mel, d_model=1280 geometry (layer count
                        reduced 32→4 for runtime; width/mel/positions real)
  * wavlm-large       — pre-LN + 768→1024 with the 320/800 buckets

Weights are RANDOM (no network in this environment): parity at random
init over these exact shapes means any size-dependent conversion bug
(bucket tables, conv grouping, LN placement) surfaces here, not when
pretrained checkpoints finally load. All marked `slow` — run with
`pytest -m slow tests/test_encoders_fullsize.py`.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow


def _assert_close(got, want, atol, rtol=1e-4, what=""):
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol,
                               err_msg=what)


def test_wav2vec2_base_fullsize_parity(rng):
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model
    from radad_tpu.models.hf_convert import convert_wav2vec2
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, encode, \
        extract_features

    torch.manual_seed(0)
    tm = Wav2Vec2Model(HFCfg(attn_implementation="eager")).eval()
    cfg = Wav2Vec2Config()  # defaults == facebook/wav2vec2-base-960h
    assert tm.config.hidden_size == cfg.hidden_size == 768
    assert tm.config.num_hidden_layers == cfg.num_hidden_layers == 12
    params = convert_wav2vec2(tm.state_dict(), cfg)

    x = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)  # 2 s
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    hs_t = np.stack([h.numpy() for h in out.hidden_states])
    hs_j = np.asarray(encode(params, jnp.asarray(x), cfg))
    assert hs_j.shape == hs_t.shape  # (13, 2, 99, 768)
    _assert_close(hs_j, hs_t, atol=5e-5, what="wav2vec2-base hidden states")

    # reference layer-select mean over [-4..-1] (feature_extractor.py:32-41)
    feat = np.asarray(extract_features(params, jnp.asarray(x), cfg,
                                       (-4, -3, -2, -1)))
    _assert_close(feat, hs_t[-4:].mean(0), atol=5e-5,
                  what="wav2vec2-base layer-select mean")


def test_wav2vec2_large_lv60_fullsize_parity(rng):
    """Pre-LN + layer-norm frontend + conv_bias (the lv60/robust/xlsr
    family preset, models/encoder.py _LARGE_STABLE): 1024-d, 24 layers."""
    from transformers import Wav2Vec2Config as HFCfg, Wav2Vec2Model
    from radad_tpu.models.hf_convert import convert_wav2vec2
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, encode

    kw = dict(hidden_size=1024, num_hidden_layers=24,
              num_attention_heads=16, intermediate_size=4096,
              feat_extract_norm="layer", conv_bias=True,
              do_stable_layer_norm=True)
    torch.manual_seed(0)
    tm = Wav2Vec2Model(HFCfg(attn_implementation="eager", **kw)).eval()
    cfg = Wav2Vec2Config(**kw)
    params = convert_wav2vec2(tm.state_dict(), cfg)

    x = (rng.standard_normal((1, 32000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    hs_t = np.stack([h.numpy() for h in out.hidden_states])
    hs_j = np.asarray(encode(params, jnp.asarray(x), cfg))
    assert hs_j.shape == hs_t.shape  # (25, 1, 99, 1024)
    _assert_close(hs_j, hs_t, atol=1e-4, what="wav2vec2-large-lv60")


def test_wavlm_base_fullsize_parity(rng):
    """The REAL bucket geometry (320 buckets / max_distance 800) — shrunk
    buckets in the tiny test can hide off-by-one bucket-boundary bugs that
    only appear with the log-spaced region at full range."""
    from transformers import WavLMConfig as HFCfg, WavLMModel
    from radad_tpu.models.hf_convert import convert_wavlm
    from radad_tpu.models.wavlm import WavLMConfig, encode

    torch.manual_seed(0)
    tm = WavLMModel(HFCfg()).eval()
    cfg = WavLMConfig()  # defaults == microsoft/wavlm-base incl. 320/800
    assert tm.config.num_buckets == cfg.num_buckets == 320
    assert tm.config.max_bucket_distance == cfg.max_bucket_distance == 800
    params = convert_wavlm(tm.state_dict(), cfg)

    x = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    hs_t = np.stack([h.numpy() for h in out.hidden_states])
    hs_j = np.asarray(encode(params, jnp.asarray(x), cfg))
    assert hs_j.shape == hs_t.shape  # (13, 2, 99, 768)
    _assert_close(hs_j, hs_t, atol=5e-5, what="wavlm-base hidden states")


def test_wavlm_large_fullsize_parity(rng):
    from transformers import WavLMConfig as HFCfg, WavLMModel
    from radad_tpu.models.hf_convert import convert_wavlm
    from radad_tpu.models.wavlm import WavLMConfig, encode

    kw = dict(hidden_size=1024, num_hidden_layers=24,
              num_attention_heads=16, intermediate_size=4096,
              feat_extract_norm="layer", conv_bias=True,
              do_stable_layer_norm=True)
    torch.manual_seed(0)
    tm = WavLMModel(HFCfg(**kw)).eval()
    cfg = WavLMConfig(**kw)
    params = convert_wavlm(tm.state_dict(), cfg)

    x = (rng.standard_normal((1, 24000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    hs_t = np.stack([h.numpy() for h in out.hidden_states])
    hs_j = np.asarray(encode(params, jnp.asarray(x), cfg))
    _assert_close(hs_j, hs_t, atol=1e-4, what="wavlm-large")


def test_hubert_base_fullsize_parity(rng):
    from transformers import HubertConfig as HFCfg, HubertModel
    from radad_tpu.models.hf_convert import convert_wav2vec2
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, encode

    torch.manual_seed(0)
    tm = HubertModel(HFCfg(attn_implementation="eager")).eval()
    cfg = Wav2Vec2Config()  # hubert-base shares the w2v2-base geometry
    params = convert_wav2vec2(tm.state_dict(), cfg)

    x = (rng.standard_normal((1, 32000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(x), output_hidden_states=True)
    hs_t = np.stack([h.numpy() for h in out.hidden_states])
    hs_j = np.asarray(encode(params, jnp.asarray(x), cfg))
    _assert_close(hs_j, hs_t, atol=5e-5, what="hubert-base")


def test_whisper_base_fullsize_parity(rng):
    """Full 30 s mel input: exercises the complete 1500-entry positional
    table, 80 mel bins, and the real 512-d/6-layer geometry."""
    from transformers import WhisperConfig as HFCfg, WhisperModel
    from radad_tpu.models.hf_convert import convert_whisper_encoder
    from radad_tpu.models.whisper import WhisperConfig, encode_mel

    hf = HFCfg(d_model=512, encoder_layers=6, encoder_attention_heads=8,
               encoder_ffn_dim=2048, num_mel_bins=80,
               max_source_positions=1500, decoder_layers=1,
               decoder_attention_heads=4, decoder_ffn_dim=256,
               attn_implementation="eager")
    torch.manual_seed(0)
    tm = WhisperModel(hf).eval()
    cfg = WhisperConfig()  # defaults == openai/whisper-base encoder
    params = convert_whisper_encoder(tm.state_dict(), cfg)

    mel = (rng.standard_normal((1, 80, 3000)) * 0.5).astype(np.float32)
    with torch.no_grad():
        t_out = tm.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    j_out = np.asarray(encode_mel(
        params, jnp.asarray(mel.transpose(0, 2, 1)), cfg))
    assert j_out.shape == t_out.shape  # (1, 1500, 512)
    _assert_close(j_out, t_out, atol=1e-4, what="whisper-base encoder")


def test_whisper_large_v3_geometry_parity(rng):
    """whisper-large-v3's distinguishing geometry: 128 mel bins and
    d_model=1280/20-head layers. Layer count reduced 32→4 for CPU runtime
    (per-layer math is identical across depth; depth adds nothing to
    conversion risk beyond layer stacking, which 4 layers exercise)."""
    from transformers import WhisperConfig as HFCfg, WhisperModel
    from radad_tpu.models.hf_convert import convert_whisper_encoder
    from radad_tpu.models.whisper import WhisperConfig, encode_mel

    hf = HFCfg(d_model=1280, encoder_layers=4, encoder_attention_heads=20,
               encoder_ffn_dim=5120, num_mel_bins=128,
               max_source_positions=1500, decoder_layers=1,
               decoder_attention_heads=4, decoder_ffn_dim=256,
               attn_implementation="eager")
    torch.manual_seed(0)
    tm = WhisperModel(hf).eval()
    cfg = WhisperConfig(d_model=1280, num_hidden_layers=4,
                        num_attention_heads=20, ffn_dim=5120,
                        num_mel_bins=128, max_source_positions=1500)
    params = convert_whisper_encoder(tm.state_dict(), cfg)

    mel = (rng.standard_normal((1, 128, 3000)) * 0.5).astype(np.float32)
    with torch.no_grad():
        t_out = tm.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()
    j_out = np.asarray(encode_mel(
        params, jnp.asarray(mel.transpose(0, 2, 1)), cfg))
    assert j_out.shape == t_out.shape  # (1, 1500, 1280)
    _assert_close(j_out, t_out, atol=2e-4, what="whisper-large-v3 geometry")
