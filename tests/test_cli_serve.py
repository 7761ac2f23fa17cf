"""CLI end-to-end (train → evaluate → predict through the argparse entry)
and web-app API tests against a live server on a random port."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cli_run(synthetic_dataset, tmp_path_factory, monkeypatch_encoder):
    """Train via the CLI main() with a tiny encoder patched in."""
    from radad_tpu import cli

    root = str(tmp_path_factory.mktemp("cli_root"))
    rc = cli.main([
        "--mode", "train", "--data_path", synthetic_dataset,
        "--data_root", root, "--batch_size", "8", "--eval_batch_size", "8",
        "--db_batch_size", "8", "--epochs", "2"])
    assert rc == 0
    return root


@pytest.fixture(scope="module")
def monkeypatch_encoder():
    """Patch build_encoder to a tiny random wav2vec2 for fast CLI/app runs."""
    import radad_tpu.models.encoder as enc_mod
    import jax
    from radad_tpu.models.encoder import FrozenEncoder
    from radad_tpu.models.wav2vec2 import Wav2Vec2Config, init_params

    cfg = Wav2Vec2Config(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=(16, 16, 16, 16),
        conv_kernel=(10, 8, 4, 4), conv_stride=(5, 4, 4, 4),
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tiny = FrozenEncoder(name="wav2vec2", model_name="tiny", arch_cfg=cfg,
                         params=params, pretrained=False,
                         layers_to_use=(-2, -1))
    orig = enc_mod.build_encoder
    enc_mod.build_encoder = lambda *a, **k: tiny
    import radad_tpu.cli as cli_mod
    import radad_tpu.train.pipeline as pipe_mod

    # modules import build_encoder by name
    cli_saved = getattr(cli_mod, "build_encoder", None)
    pipe_saved = pipe_mod.build_encoder
    pipe_mod.build_encoder = enc_mod.build_encoder
    yield tiny
    enc_mod.build_encoder = orig
    pipe_mod.build_encoder = pipe_saved
    if cli_saved is not None:
        cli_mod.build_encoder = cli_saved


def test_cli_flag_mapping():
    """argparse → Config mapping for the round-3 knobs (no pipeline run)."""
    from radad_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        "--mode", "train", "--mixed_precision", "--use_float16",
        "--ivf_no_retrain_on_add", "--ivf_balance", "0.5",
        "--sq8_residual_nlist", "256"])
    cfg = config_from_args(args)
    assert cfg.use_mixed_precision is True
    assert cfg.use_float16 is True
    assert cfg.vector_db_ivf_retrain_on_add is False
    assert cfg.vector_db_ivf_balance == 0.5
    assert cfg.sq8_residual_nlist == 256
    # defaults stay reference-parity when flags are absent
    cfg0 = config_from_args(build_parser().parse_args(["--mode", "train"]))
    assert cfg0.use_mixed_precision is False
    assert cfg0.vector_db_ivf_retrain_on_add is True
    assert cfg0.vector_db_ivf_balance == 0.0


def test_cli_flag_mapping_round4():
    """--model_name / --whisper_fast / --nprobe (reference config.py:42-45
    names the checkpoint; vector_db_nprobe is the duplicate-assignment knob
    at config.py:53/76)."""
    from radad_tpu.cli import build_parser, config_from_args

    args = build_parser().parse_args([
        "--mode", "train", "--feature_extractor", "wavlm",
        "--model_name", "microsoft/wavlm-large", "--nprobe", "64"])
    cfg = config_from_args(args)
    assert cfg.wavlm_model_name == "microsoft/wavlm-large"
    assert cfg.vector_db_nprobe == 64

    args = build_parser().parse_args([
        "--mode", "train", "--feature_extractor", "whisper",
        "--whisper_fast"])
    cfg = config_from_args(args)
    assert cfg.whisper_pad_seconds is None
    # parity default: 30 s padding, default model names untouched
    cfg0 = config_from_args(build_parser().parse_args(["--mode", "train"]))
    assert cfg0.whisper_pad_seconds == 30.0
    assert cfg0.wav2vec2_model_name == "facebook/wav2vec2-base-960h"


def test_cli_evaluate_and_predict(cli_run, synthetic_dataset, capsys):
    from radad_tpu import cli

    rc = cli.main([
        "--mode", "evaluate", "--data_path", synthetic_dataset,
        "--data_root", cli_run, "--batch_size", "8",
        "--eval_batch_size", "8", "--db_batch_size", "8"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "eer_percent" in out

    wav = os.path.join(synthetic_dataset, "clip_001.wav")
    rc = cli.main([
        "--mode", "predict", "--audio_path", wav,
        "--data_path", synthetic_dataset, "--data_root", cli_run])
    assert rc == 0


@pytest.fixture(scope="module")
def server(cli_run, synthetic_dataset, monkeypatch_encoder):
    from radad_tpu.config import Config
    from radad_tpu.serve.app import serve
    from radad_tpu.train.pipeline import DetectionPipeline

    cfg = Config().replace(
        train_data_path=synthetic_dataset, test_data_path=synthetic_dataset,
        data_root=cli_run,
        vector_db_path=os.path.join(cli_run, "vector_db"),
        use_batch_norm=False, use_layer_norm=True)
    pipe = DetectionPipeline(cfg, encoder=monkeypatch_encoder)
    assert pipe.load_models("final_model")
    assert pipe.load_vector_database()
    httpd = serve(cfg, host="127.0.0.1", port=0, pipeline=pipe)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def test_api_list(server):
    status, body = _get(server + "/api/list")
    assert status == 200
    items = json.loads(body)["items"]
    assert len(items) == 24
    assert {"file", "speaker", "label", "duration", "url"} <= set(items[0])


def test_api_dbinfo(server):
    status, body = _get(server + "/api/dbinfo")
    d = json.loads(body)
    assert d["has_index"] and d["ntotal"] > 0
    assert d["index_file_exists"]


def test_audio_serving(server):
    status, body = _get(server + "/audio/clip_000.wav")
    assert status == 200
    assert body[:4] == b"RIFF"
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(server + "/audio/nope.wav")


def test_index_page_and_static(server):
    status, body = _get(server + "/")
    assert status == 200 and b"RADAD-TPU" in body
    status, body = _get(server + "/static/app.js")
    assert status == 200 and b"predict" in body


def _post_multipart(url, fields):
    boundary = "----testboundary42"
    parts = []
    for name, (fname, data) in fields.items():
        head = f'Content-Disposition: form-data; name="{name}"'
        if fname:
            head += f'; filename="{fname}"'
        parts.append(f"--{boundary}\r\n{head}\r\n\r\n".encode() + data
                     + b"\r\n")
    body = b"".join(parts) + f"--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        url, data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def test_api_predict_existing(server):
    status, d = _post_multipart(server + "/api/predict",
                                {"filename": ("", b"clip_001.wav")})
    assert status == 200 and d["ok"]
    assert d["prediction"] in ("spoof", "bona-fide")
    assert 0.0 <= d["probability"] <= 1.0
    assert d["probability"] == d["probability_spoof"]  # real value, not 0.0
    assert len(d["neighbors"]) > 0
    n0 = d["neighbors"][0]
    assert {"file", "speaker", "label", "duration", "distance", "url"} <= set(n0)
    # self-exclusion: queried file not among its own neighbors
    assert all(n["file"] != "clip_001.wav" for n in d["neighbors"])


def test_api_predict_upload(server, synthetic_dataset):
    with open(os.path.join(synthetic_dataset, "clip_002.wav"), "rb") as f:
        data = f.read()
    status, d = _post_multipart(server + "/api/predict",
                                {"file": ("my_upload.wav", data)})
    assert status == 200 and d["ok"]
    assert d["source"]["used_existing"] is False


def test_api_predict_no_input(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post_multipart(server + "/api/predict", {})
    assert e.value.code == 400


def test_concurrent_predicts_batched(server, synthetic_dataset):
    """Concurrent /api/predict requests coalesce through the micro-batcher
    and all return correct, independent payloads."""
    from concurrent.futures import ThreadPoolExecutor

    files = [f"clip_{i:03d}.wav" for i in range(6)]

    def hit(fname):
        return fname, _post_multipart(
            server + "/api/predict", {"filename": ("", fname.encode())})

    with ThreadPoolExecutor(6) as pool:
        results = list(pool.map(hit, files))
    for fname, (status, d) in results:
        assert status == 200 and d["ok"], (fname, d)
        assert d["prediction"] in ("spoof", "bona-fide")
        assert all(n["file"] != fname for n in d["neighbors"])


def test_cli_train_resume(cli_run, synthetic_dataset, monkeypatch_encoder):
    """--resume continues from the final_model checkpoint with optimizer
    state + step (the reference cannot resume, pipeline.py:1112-1134)."""
    import json

    from radad_tpu import cli

    root = cli_run
    with open(os.path.join(root, "models",
                           "final_model_radad.npz.meta.json")) as f:
        step_before = json.load(f)["step"]
    rc = cli.main([
        "--mode", "train", "--data_path", synthetic_dataset,
        "--data_root", root, "--batch_size", "8", "--eval_batch_size", "8",
        "--db_batch_size", "8", "--epochs", "1", "--resume"])
    assert rc == 0
    with open(os.path.join(root, "models",
                           "final_model_radad.npz.meta.json")) as f:
        step_after = json.load(f)["step"]
    assert step_after > step_before  # step counter carried across resume
