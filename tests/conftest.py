"""Test harness: force an 8-device virtual CPU platform before JAX loads.

Multi-chip sharding paths (shard_map index merge, data-parallel train step)
are exercised on host CPU devices per SURVEY.md §4's test strategy; the real
TPU is used only by the benchmark harness, never required for tests.
"""

import os

# Force, don't setdefault: the environment may arrive with JAX_PLATFORMS
# pointing at a TPU plugin, and TPU matmuls default to low precision —
# parity tests need CPU f32 math.
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocesses spawned by tests must not dial the TPU relay either: the
# axon plugin registers at interpreter start (sitecustomize) unless this
# is empty, and once registered it pins the platform choice past the
# JAX_PLATFORMS env force above.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# In THIS process the plugin may already be registered (sitecustomize ran
# before pytest imported us), and registration overrides the env var. The
# config knob still wins as long as no backend has been initialized yet —
# pytest collection imports modules but runs no computations.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a session-scoped generator's stream
    # position depends on WHICH tests ran before (pytest selection /
    # ordering), so any data-sensitive test becomes order-dependently
    # flaky (bit us: near-tie neighbor sets under -k selections). Each
    # test now draws the same deterministic stream in isolation.
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory):
    """Tiny on-disk WAV dataset + meta.csv in the reference's schema
    (file,speaker,label with 'spoof'/'bona-fide' strings, meta.csv:1-9)."""
    from radad_tpu.data.audio import write_wav

    root = tmp_path_factory.mktemp("audio_data")
    rng = np.random.default_rng(0)
    rows = []
    n = 24
    for i in range(n):
        sr = 16000
        dur = rng.uniform(1.0, 4.0)
        t = np.arange(int(sr * dur)) / sr
        label = "spoof" if i % 3 else "bona-fide"
        freq = 200 + 50 * (i % 7)
        wave = 0.4 * np.sin(2 * np.pi * freq * t)
        if label == "spoof":  # give classes distinguishable spectra
            wave = wave + 0.3 * np.sin(2 * np.pi * 4 * freq * t)
        wave = wave + 0.01 * rng.standard_normal(len(t))
        fname = f"clip_{i:03d}.wav"
        write_wav(str(root / fname), wave.astype(np.float32), sr)
        rows.append((fname, f"speaker_{i % 5}", label))
    with open(root / "meta.csv", "w") as f:
        f.write("file,speaker,label\n")
        for fname, spk, label in rows:
            f.write(f"{fname},{spk},{label}\n")
    return str(root)
