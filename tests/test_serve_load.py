"""Serving load-test harness smoke (experiments/serve_load_test.py).

The full run measures the live HTTP app against a ~1M-row IVF index on a
real chip (record: experiments/serve_load_test_1m.json). This test runs
the same harness end to end at toy scale on CPU — device-generated rows,
``FlatIndex.add(donate=True)`` zero-copy install, IVF train-once +
``ivf_retrain_on_add=False``, the live ThreadingHTTPServer, warmup,
sequential and concurrent phases — in a subprocess so the server/batcher
threads never leak into this pytest session.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_serve_load_smoke(tmp_path):
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               MPLBACKEND="Agg")
    out = tmp_path / "record.json"
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "experiments", "serve_load_test.py"),
         "--smoke", "--catalog", str(tmp_path / "catalog"),
         "--out", str(out)],
        check=True, env=env, timeout=1200, cwd=REPO)
    rec = json.load(open(out))
    assert rec["rows"] == 2048
    assert rec["sequential"]["requests"] == 4
    assert rec["sequential"]["p50_ms"] > 0
    conc = rec["concurrent_2"]
    assert conc["errors"] == 0
    assert conc["throughput_rps"] > 0
