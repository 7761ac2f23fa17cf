"""Serving load test against a million-row vector DB (one real chip).

The reference's serving story is a Flask dev server doing a single-clip
predict against a ~25k-row FAISS index (app.py:218-345). This script
measures OUR serving stack at FAISS's natural scale: the live HTTP app
(stdlib ThreadingHTTPServer + micro-batcher + the ONE-program jitted
predict graph) answering /api/predict against a ~1M x 5376 IVF index in
bf16 single-buffer capacity mode, routed through the chunked
gather-probed retrieval path (index/ivf_gather.py).

What it builds (all on device — no 10.7 GB host round-trip):

  * ~1M clustered rows generated chunk-by-chunk with jax.random and
    installed via ``FlatIndex.add(donate=True)`` — the zero-copy
    capacity-scale ingestion path;
  * IVF coarse quantizer trained once on a 50k sample (FAISS regime:
    nlist=4096, 25 Lloyd iters, split-refinement balance for serving
    latency), ``ivf_retrain_on_add=False``;
  * a DetectionPipeline with the full-size wav2vec2-base architecture at
    random init (pretrained weights are unavailable offline; serving
    latency is weight-independent) and random-init fusion weights;
  * the real web app via ``serve(cfg, pipeline=...)`` on a loopback
    port, a 48-clip synthetic catalog for request audio.

What it measures (warm, relay-inclusive):

  * sequential /api/predict latency (p50/p95) — the B=1 serving path;
  * closed-loop throughput + latency percentiles at 8 and 16 concurrent
    clients (requests coalesce through the micro-batcher into
    predict_batch buckets);
  * /api/dbinfo correctness at scale.

Writes one JSON object to experiments/serve_load_test_1m.json and
prints progress to stderr.

Usage:  python experiments/serve_load_test.py [--rows 999424]
"""

import argparse
import csv
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ensure_catalog(path: str, n: int = 48) -> str:
    """Small synthetic audio catalog for request payloads (CPU subprocess
    so the generator never dials the TPU relay)."""
    meta = os.path.join(path, "meta.csv")
    if os.path.exists(meta):
        return path
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(__file__), "make_synthetic_dataset.py"),
         "--out", path, "--n", str(n)],
        check=True, env=env)
    return path


def build_million_index(rows: int, d: int, *, nlist: int, nprobe: int,
                        balance: float, seed: int = 0):
    """Clustered rows generated ON DEVICE in chunks, installed zero-copy.

    ``rows`` must be a multiple of 1024 so the donated install adopts the
    buffer without a pad/cast copy (index/flat.py _install)."""
    import jax
    import jax.numpy as jnp

    from radad_tpu.index.flat import FlatIndex

    assert rows % 1024 == 0, "rows must be a multiple of 1024 (zero-copy)"
    chunk = rows
    while chunk > 65536 or rows % chunk:
        # largest divisor of rows that is <= 65536 and keeps the f32
        # generation temp ~1.4 GB
        chunk //= 2
    key = jax.random.PRNGKey(seed)
    key, kc = jax.random.split(key)
    centers = jax.random.normal(kc, (1024, d), jnp.float32) * 4.0

    @jax.jit
    def gen(k, c):
        k1, k2 = jax.random.split(k)
        a = jax.random.randint(k1, (chunk,), 0, c.shape[0])
        x = c[a] + jax.random.normal(k2, (chunk, d), jnp.float32)
        return x.astype(jnp.bfloat16)

    upd = jax.jit(
        lambda buf, x, lo: jax.lax.dynamic_update_slice(buf, x, (lo, 0)),
        donate_argnums=(0,), static_argnums=())
    buf = jnp.zeros((rows, d), jnp.bfloat16)
    for lo in range(0, rows, chunk):
        key, kg = jax.random.split(key)
        buf = upd(buf, gen(kg, centers), lo)
        print(f"# generated {lo + chunk:,}/{rows:,} rows", file=sys.stderr)
    buf.block_until_ready()

    idx = FlatIndex(d, "IVF", nlist=nlist, nprobe=nprobe,
                    kmeans_iters=25, ivf_balance=balance,
                    ivf_retrain_on_add=False, use_float16=True,
                    single_buffer=True, use_pallas=False)
    labels = (np.arange(rows) % 2).astype(np.float32)
    paths = [f"db_{i:07d}.wav" for i in range(rows)]
    ids = (np.arange(rows, dtype=np.int64) + 10_000_000).astype(np.int32)
    t0 = time.time()
    idx.add(buf, labels, paths, ids=ids, donate=True)
    print(f"# index install + IVF train took {time.time() - t0:.0f}s "
          f"(nlist_eff={idx.nlist_effective}, "
          f"budget@{nprobe}={idx.chunk_budget(nprobe)})", file=sys.stderr)
    return idx


def _post_filename(url: str, fname: str, timeout: float = 600.0):
    boundary = "----loadtest42"
    body = (f"--{boundary}\r\nContent-Disposition: form-data; "
            f'name="filename"\r\n\r\n{fname}\r\n--{boundary}--\r\n'
            ).encode()
    req = urllib.request.Request(
        url + "/api/predict", data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    t0 = time.time()
    with urllib.request.urlopen(req, timeout=timeout) as r:
        payload = json.loads(r.read())
        return time.time() - t0, r.status, payload


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def stage_summary(stage_dicts):
    """Per-stage p50/p99 over the ``timings_ms`` dicts the app returns
    (parse / ensure_wav / predict / enrich from the HTTP layer; queue /
    decode / device / payload from the batcher+pipeline)."""
    keys = sorted({k for d in stage_dicts for k in d if k != "batch"})
    out = {}
    for k in keys:
        vals = [d[k] for d in stage_dicts if k in d]
        if vals:
            out[k] = {"p50_ms": round(pct(vals, 50), 2),
                      "p99_ms": round(pct(vals, 99), 2)}
    return out


def run_clients(url, files, n_clients, reqs_per_client):
    """Closed-loop load: each client posts its requests back to back."""
    lat, errs, stages = [], [], []
    lock = threading.Lock()

    def client(ci):
        for i in range(reqs_per_client):
            f = files[(ci * reqs_per_client + i) % len(files)]
            try:
                dt, status, payload = _post_filename(url, f)
                with lock:
                    if status != 200 or not payload.get("ok"):
                        errs.append(payload)
                    else:
                        lat.append(dt)
                        if payload.get("timings_ms"):
                            stages.append(payload["timings_ms"])
            except Exception as e:  # noqa: BLE001 — record, keep loading
                with lock:
                    errs.append(str(e))

    threads = [threading.Thread(target=client, args=(ci,))
               for ci in range(n_clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    return lat, errs, wall, stages


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=999_424,
                   help="multiple of 1024 (zero-copy donated install)")
    p.add_argument("--nlist", type=int, default=4096)
    p.add_argument("--nprobe", type=int, default=16)
    p.add_argument("--balance", type=float, default=1.0)
    p.add_argument("--catalog", type=str, default="/tmp/serve_catalog")
    p.add_argument("--out", type=str,
                   default="experiments/serve_load_test_1m.json")
    p.add_argument("--smoke", action="store_true",
                   help="tiny CPU-runnable pass (small row count, few "
                        "requests) to validate the harness end to end")
    args = p.parse_args()
    if args.smoke:
        args.rows = min(args.rows, 2048)
        args.nlist = min(args.nlist, 64)

    catalog = ensure_catalog(args.catalog)

    from radad_tpu.config import Config
    from radad_tpu.serve.app import serve
    from radad_tpu.train.pipeline import DetectionPipeline

    cfg = Config().replace(
        train_data_path=catalog, test_data_path=catalog,
        data_root=os.path.join(args.catalog, "serve_root"),
        vector_db_path=os.path.join(args.catalog, "serve_root", "vector_db"),
        feature_extractor_type="wav2vec2",
        vector_db_index_type="IVF", vector_db_nlist=args.nlist,
        vector_db_nprobe=args.nprobe, vector_db_ivf_balance=args.balance,
        vector_db_ivf_retrain_on_add=False, use_float16=True,
        use_batch_norm=False, use_layer_norm=True)

    print("# building pipeline (wav2vec2-base arch, random init)",
          file=sys.stderr)
    pipe = DetectionPipeline(cfg)
    d = pipe.tpp_dim
    pipe.index = build_million_index(
        args.rows, d, nlist=args.nlist, nprobe=args.nprobe,
        balance=args.balance)
    pipe._ensure_model_state()

    httpd = serve(cfg, host="127.0.0.1", port=0, pipeline=pipe)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    with urllib.request.urlopen(url + "/api/dbinfo", timeout=120) as r:
        dbinfo = json.loads(r.read())
    assert dbinfo["ntotal"] == args.rows, dbinfo
    print(f"# dbinfo: {dbinfo}", file=sys.stderr)

    with open(os.path.join(catalog, "meta.csv")) as f:
        files = [r["file"] for r in csv.DictReader(f)][:24]

    # ---- warmup: compile the predict-graph buckets the phases will hit
    # (1 sequentially; 2/4/8/16 surface under concurrency).
    print("# warmup: bucket 1 (compiles the 1M-row predict graph)",
          file=sys.stderr)
    t0 = time.time()
    _post_filename(url, files[0])
    print(f"# first request (compile): {time.time() - t0:.0f}s",
          file=sys.stderr)
    for conc in ((2,) if args.smoke else (2, 4, 8, 16)):
        lat, errs, _, _ = run_clients(url, files, conc, 2)
        assert not errs, errs[:2]
        print(f"# warmup conc={conc}: p50 {pct(lat, 50)*1e3:.0f} ms",
              file=sys.stderr)

    record = {
        "metric": "serve /api/predict vs ~1M-row IVF index (v5e, one chip)",
        "rows": args.rows, "dim": d, "nlist": args.nlist,
        "nprobe": args.nprobe, "ivf_balance": args.balance,
        "storage": "bf16 single-buffer (10.7 GB)",
        "encoder": "wav2vec2-base arch (random init)",
        "chunk_budget": pipe.index.chunk_budget(
            min(args.nprobe, pipe.index.ivf_cell_chunks.shape[0])),
    }

    # ---- sequential phase
    seq, seq_stages = [], []
    for i in range(4 if args.smoke else 32):
        dt, status, payload = _post_filename(url, files[i % len(files)])
        assert status == 200 and payload["ok"], payload
        assert len(payload["neighbors"]) > 0
        seq.append(dt)
        if payload.get("timings_ms"):
            seq_stages.append(payload["timings_ms"])
    record["sequential"] = {
        "requests": len(seq),
        "p50_ms": round(pct(seq, 50) * 1e3, 1),
        "p95_ms": round(pct(seq, 95) * 1e3, 1),
        "stages": stage_summary(seq_stages),
    }
    print(f"# sequential: p50 {record['sequential']['p50_ms']} ms, "
          f"p95 {record['sequential']['p95_ms']} ms", file=sys.stderr)

    # ---- concurrent phases (closed-loop)
    for conc, per in (((2, 2),) if args.smoke else ((8, 16), (16, 12))):
        lat, errs, wall, stages = run_clients(url, files, conc, per)
        n = conc * per
        phase = {
            "requests": n, "errors": len(errs),
            "throughput_rps": round((n - len(errs)) / wall, 2),
            "p50_ms": round(pct(lat, 50) * 1e3, 1),
            "p95_ms": round(pct(lat, 95) * 1e3, 1),
            "wall_s": round(wall, 2),
            "stages": stage_summary(stages),
        }
        record[f"concurrent_{conc}"] = phase
        print(f"# conc={conc}: {phase['throughput_rps']} req/s, "
              f"p50 {phase['p50_ms']} ms, p95 {phase['p95_ms']} ms, "
              f"errors {len(errs)}", file=sys.stderr)
        assert not errs, errs[:2]

    httpd.shutdown()
    with open(args.out, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
