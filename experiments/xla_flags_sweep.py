"""Profile-guided XLA flag sweep for the embed hot path (one real chip).

XLA reads tuning flags from the XLA_FLAGS env var at process start, so
each configuration runs in its own subprocess (one TPU client at a time —
this environment's relay wedges under concurrent clients, NOTES.md). The
workload is the dominant compute phase: a wav2vec2-base bf16 encoder
forward at B=256 segments (the DB-build / training embed shape),
chain-timed with the dependent-chain + host-sync harness
(utils/benchmark.py) because the relay acks block_until_ready early.

The sweep includes a CANARY config (absurdly small scoped-VMEM limit)
whose timing MUST regress if client-side XLA_FLAGS actually reach the
compiler through the relay's remote-compile path; if the canary matches
baseline, flags don't propagate in this environment and the sweep result
is recorded as inconclusive rather than as a false null.

Writes one JSON object per config to experiments/xla_flags_sweep.json.

Usage:  python experiments/xla_flags_sweep.py            # parent (CPU)
        (child invocations are internal)
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIGS = [
    ("baseline", ""),
    ("latency_hiding_scheduler",
     "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("scoped_vmem_98mb", "--xla_tpu_scoped_vmem_limit_kib=100352"),
    ("scoped_vmem_32mb", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    # canary: 1 MB scoped VMEM must hurt if flags reach the compiler
    ("CANARY_scoped_vmem_1mb", "--xla_tpu_scoped_vmem_limit_kib=1024"),
]


def child() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radad_tpu.config import Config
    from radad_tpu.models.encoder import build_encoder
    from radad_tpu.train.pipeline import make_embed_fn
    from radad_tpu.utils.benchmark import chain_time, warmup

    cfg = Config().replace(use_mixed_precision=True)
    enc = build_encoder(cfg)  # wav2vec2-base arch, random init
    embed = make_embed_fn(enc, cfg)
    b = 128  # clips -> 256 segments at S=2
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal(
        (b, cfg.clip_samples)).astype(np.float32) * 0.1)
    warmup()

    def step(a, params):
        tpp = embed(params, a, None)
        # feed a data dependency back into the chain state without
        # changing its value materially (1e-30 * max survives XLA's
        # algebraic folding; 0.0 * sum does not — NOTES.md)
        return a + 1e-30 * jnp.max(tpp)

    dt = chain_time(step, audio, n=8, consts=(enc.params,))
    print(json.dumps({"ms_per_batch": round(dt * 1e3, 2),
                      "clips_per_s": round(b / dt, 1)}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--out", default="experiments/xla_flags_sweep.json")
    args = p.parse_args()
    if args.child:
        child()
        return

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    results = []
    for name, flags in CONFIGS:
        env = dict(os.environ)
        # children run on the TPU: restore the relay pool IPs that the
        # parent's CPU-mode prefix blanked (pass the real value via
        # RADAD_SWEEP_POOL_IPS, e.g.
        #   RADAD_SWEEP_POOL_IPS="$PALLAS_AXON_POOL_IPS" \
        #   PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python ...)
        real_pool = env.pop("RADAD_SWEEP_POOL_IPS", None)
        if real_pool:
            env["PALLAS_AXON_POOL_IPS"] = real_pool
        else:
            env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "axon"
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"# running {name}: XLA_FLAGS={flags!r}", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            env=env, cwd=repo, capture_output=True, text=True, timeout=1200)
        row = {"config": name, "xla_flags": flags}
        if proc.returncode == 0 and proc.stdout.strip():
            row.update(json.loads(proc.stdout.strip().splitlines()[-1]))
        else:
            row["error"] = (proc.stderr or "no output")[-800:]
        results.append(row)
        print(json.dumps(row))

    base = next((r for r in results
                 if r["config"] == "baseline" and "ms_per_batch" in r), None)
    canary = next((r for r in results
                   if r["config"].startswith("CANARY")
                   and "ms_per_batch" in r), None)
    parse_deaths = [r["config"] for r in results
                    if "Unknown flag in XLA_FLAGS" in r.get("error", "")]
    verdict = "inconclusive: no baseline measurement"
    if base and parse_deaths:
        # The client-side XLA flag parser FATALs on every xla_tpu_* flag:
        # the client jaxlib is not built with the TPU compiler (compiles
        # happen relay-side), so TPU flags cannot even be SET from the
        # client. Profile-guided XLA flag tuning is structurally
        # unavailable in this environment — a conclusive negative, not a
        # null measurement.
        verdict = (f"xla_tpu_* flags abort the CLIENT at flag parse "
                   f"({len(parse_deaths)}/{len(results) - 1} configs: "
                   f"'Unknown flag in XLA_FLAGS') — TPU compiler flags "
                   f"cannot reach the relay's remote compile from this "
                   f"client; flag tuning structurally unavailable here")
    elif base and canary:
        if canary["ms_per_batch"] > 1.15 * base["ms_per_batch"]:
            verdict = "flags propagate; see per-config deltas"
        else:
            verdict = ("flags do NOT propagate through the relay's "
                       "remote compile (canary matched baseline) — "
                       "sweep inconclusive in this environment")
    out = {"workload": "wav2vec2-base bf16 embed, B=128 clips "
                       "(256 segments), chain-timed",
           "results": results, "verdict": verdict}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"verdict": verdict}))


if __name__ == "__main__":
    main()
