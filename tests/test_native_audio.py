"""Native C++ decoder vs the Python WAV stack: bit parity on decode,
tolerance parity on resample, error fallbacks."""

import os

import numpy as np
import pytest

native = pytest.importorskip("radad_tpu.native").audio_native


def _write(path, wave_data, sr, sampwidth=2):
    import wave as wave_mod

    with wave_mod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        if sampwidth == 2:
            pcm = (np.clip(wave_data, -1, 1) * 32767).astype("<i2")
        else:
            raise ValueError
        w.writeframes(pcm.tobytes())


def test_decode_16bit_parity(tmp_path, rng):
    from radad_tpu.data.audio import _decode_wav_python

    path = str(tmp_path / "a.wav")
    sig = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000))
    _write(path, sig, 16000)
    got, sr = native.decode(path)
    ref, sr_ref = _decode_wav_python(path)
    assert sr == sr_ref == 16000
    # int16 normalization differs by 32767 vs 32768 — compare to raw int16
    np.testing.assert_allclose(got * 32768, ref * 32768, atol=1.0)


def test_decode_stereo_mixdown(tmp_path):
    import wave as wave_mod

    path = str(tmp_path / "st.wav")
    left = (np.ones(100) * 16384).astype("<i2")
    right = (np.zeros(100)).astype("<i2")
    inter = np.empty(200, "<i2")
    inter[0::2], inter[1::2] = left, right
    with wave_mod.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(inter.tobytes())
    got, sr = native.decode(path)
    assert sr == 8000 and len(got) == 100
    np.testing.assert_allclose(got, 0.25, atol=1e-3)  # (0.5 + 0) / 2


def test_decode_fixed_resample(tmp_path):
    """Band-limited tone at 8 kHz resampled to 16 kHz must stay a clean
    tone of the same frequency and amplitude."""
    path = str(tmp_path / "r.wav")
    sr_in, freq, dur = 8000, 440.0, 1.0
    t = np.arange(int(sr_in * dur)) / sr_in
    _write(path, 0.5 * np.sin(2 * np.pi * freq * t), sr_in)
    out = native.decode_fixed(path, 16000, 16000)
    assert out.shape == (16000,)
    t2 = np.arange(16000) / 16000.0
    expected = 0.5 * np.sin(2 * np.pi * freq * t2)
    # ignore filter edges
    core = slice(200, -200)
    err = np.abs(out[core] - expected[core]).max()
    assert err < 0.02, err


def test_decode_fixed_pads_and_truncates(tmp_path):
    path = str(tmp_path / "p.wav")
    _write(path, np.ones(8000) * 0.5, 16000)
    out = native.decode_fixed(path, 16000, 16000)
    assert abs(out[:8000].mean() - 0.5) < 1e-3
    assert np.all(out[8000:] == 0)
    out2 = native.decode_fixed(path, 4000, 16000)
    assert out2.shape == (4000,)


def test_duration_probe(tmp_path):
    path = str(tmp_path / "d.wav")
    _write(path, np.zeros(24000), 16000)
    assert abs(native.duration(path) - 1.5) < 1e-6


def test_failure_raises(tmp_path):
    bad = str(tmp_path / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"not a wav at all")
    with pytest.raises(ValueError):
        native.decode(bad)
    with pytest.raises(ValueError):
        native.decode_fixed(str(tmp_path / "missing.wav"), 100, 16000)


def test_decoder_fuzz_malformed_inputs(tmp_path, rng):
    """Adversarial-input contract for the C++ decoder: on arbitrarily
    truncated or byte-mutated WAV files it must either decode (returning
    finite samples within a sane length bound) or raise ValueError —
    never crash the process, hang, or return garbage lengths — and the
    pipeline-facing ``load_audio`` wrapper must map every such failure to
    the zeros fallback (the reference's dataset.py:139-153 contract)."""
    from radad_tpu.data.audio import load_audio

    sig = 0.25 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)
    good = str(tmp_path / "good.wav")
    _write(good, sig, 16000)
    blob = open(good, "rb").read()

    cases = []
    # truncations at awkward offsets (inside header, fmt, data)
    for cut in (1, 4, 11, 12, 20, 36, 44, 45, 100, len(blob) - 1):
        cases.append(blob[:cut])
    # single-byte mutations across the header region + random data bytes
    for _ in range(120):
        pos = int(rng.integers(0, min(len(blob), 2000)))
        b = bytearray(blob)
        b[pos] = int(rng.integers(0, 256))
        cases.append(bytes(b))
    # pathological declared sizes: huge data-chunk length, zero channels,
    # absurd sample rate / bit depth
    for patch_pos, patch in ((40, b"\xff\xff\xff\x7f"),  # data size = 2^31
                             (22, b"\x00\x00"),          # channels = 0
                             (24, b"\x00\x00\x00\x00"),  # rate = 0
                             (34, b"\x00\x00")):         # bits = 0
        b = bytearray(blob)
        b[patch_pos:patch_pos + len(patch)] = patch
        cases.append(bytes(b))

    path = str(tmp_path / "fuzz.wav")
    for i, payload in enumerate(cases):
        with open(path, "wb") as f:
            f.write(payload)
        try:
            audio, sr = native.decode(path)
            audio = np.asarray(audio)
            assert np.isfinite(audio).all(), i
            # a mutated byte can't legitimately multiply the length
            assert audio.size <= 4 * len(blob), (i, audio.size)
            assert 0 < sr < 10_000_000, (i, sr)
        except ValueError:
            pass  # the documented failure mode
        # pipeline contract: never raises, zeros on failure
        out = load_audio(path, sample_rate=16000, duration=0.5)
        assert out.shape == (8000,)
        assert np.isfinite(out).all(), i


def test_load_audio_uses_native(tmp_path):
    """data.audio.load_audio routes through the native decoder when built."""
    import radad_tpu.data.audio as audio_mod

    path = str(tmp_path / "l.wav")
    _write(path, 0.3 * np.ones(48000), 16000)
    audio_mod._native = None  # force re-probe
    out = audio_mod.load_audio(path, sample_rate=16000, duration=3.0)
    assert out.shape == (48000,)
    assert abs(out.mean() - 0.3) < 1e-2
    assert audio_mod._try_load_native()  # native path active


def test_non_wav_without_ffmpeg_returns_zeros(tmp_path, monkeypatch):
    """Parity contract (dataset.py:151-153): an undecodable file yields
    silence, never an exception. Without ffmpeg on PATH, non-WAV formats
    are undecodable."""
    import radad_tpu.data.audio as audio_mod

    monkeypatch.setattr(audio_mod, "have_ffmpeg", lambda: False)
    p = tmp_path / "clip.mp3"
    p.write_bytes(b"\xff\xfbnot really an mp3")
    out = audio_mod.load_audio(str(p), sample_rate=16000, duration=1.0)
    assert out.shape == (16000,) and not out.any()


def test_ffmpeg_decode_roundtrip(tmp_path):
    """When ffmpeg IS available, a non-.wav container decodes through the
    ffmpeg pipe to the same samples as the WAV path."""
    import shutil
    import pytest as _pytest

    if shutil.which("ffmpeg") is None:
        _pytest.skip("ffmpeg not on PATH")
    import numpy as np
    from radad_tpu.data.audio import load_audio, _decode_ffmpeg

    sr = 16000
    t = np.arange(sr) / sr
    wave_f = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    import wave as wave_mod
    wav_path = tmp_path / "tone.wav"
    with wave_mod.open(str(wav_path), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes((wave_f * 32767).astype("<i2").tobytes())
    # same bytes under a non-wav extension → routed through ffmpeg
    flac_path = tmp_path / "tone.weird"
    import subprocess
    subprocess.run(["ffmpeg", "-v", "error", "-i", str(wav_path), "-c:a",
                    "flac", "-f", "flac", str(flac_path)], check=True)
    got, got_sr = _decode_ffmpeg(str(flac_path), sr)
    assert got_sr == sr
    np.testing.assert_allclose(got[:sr], wave_f, atol=2e-4)
    via_loader = load_audio(str(flac_path), sample_rate=sr, duration=1.0)
    np.testing.assert_allclose(via_loader, wave_f, atol=2e-4)
