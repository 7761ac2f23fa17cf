"""Live A/B exactness probes against the ACTUAL reference implementation.

Runs ``experiments/ab_reference.py --probes_only`` in a subprocess (the
harness shims faiss/librosa/torchaudio and monkeypatches
transformers.from_pretrained globally — a subprocess keeps those side
effects out of this pytest session): the reference's own torch code
(/root/reference, imported, never copied) and this framework embed the
same clips with the same frozen tiny-wav2vec2 weights and retrieve
self-excluded top-5 neighbors from DBs built over the same train split.

Asserts the end-to-end contracts that no per-module parity test can pin:
load → segment → encoder → layer-select mean → TPP → segment mean is
elementwise-equal (≤1e-3 relative), and retrieval returns the reference's
neighbors path-for-path. See experiments/ab_reference.json for the
committed full-training A/B record.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not mounted")
def test_reference_ab_probes(tmp_path):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               MPLBACKEND="Agg")
    data = tmp_path / "data"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "make_synthetic_dataset.py"),
         "--out", str(data), "--n", "160"],
        check=True, env=env, timeout=600)
    rec_path = tmp_path / "record.json"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "ab_reference.py"),
         "--data_path", str(data), "--probes_only",
         "--out", str(tmp_path / "ab"), "--record_out", str(rec_path)],
        check=True, env=env, timeout=1800, cwd=REPO)
    rec = json.load(open(rec_path))[-1]

    emb = rec["embedding_parity"]
    assert emb["clips"] >= 32
    assert emb["max_rel_diff"] < 1e-3, emb  # f32 accumulation-order noise

    ret = rec["retrieval_parity"]
    assert ret["set_match"] == 1.0, ret
    assert ret["exact_order_match"] == 1.0, ret
