"""Benchmark harness: ITW-scale flat top-k retrieval throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric (BASELINE.json north star): batched flat L2 top-5 query throughput
over an In-the-Wild-scale reference DB (25,423 × 5,376 f32 — the wav2vec2
TPP embedding matrix), with on-device self-exclusion, exactly as executed
inside the training/eval steps. Baseline for ``vs_baseline`` is a host-CPU
flat scan (numpy matmul + argpartition) of the same DB — the "CPU
FAISS-style flat baseline" named by BASELINE.json; the target there
is ≥10×.

Timing methodology: this environment's TPU relay acks block_until_ready
early, so per-op time is measured as the delta between dependent chains of
n and 1 executions, synchronized by small host transfers
(radad_tpu.utils.benchmark). Recall@5 vs a numpy oracle is asserted == 1.0
before timing (exactness is part of the contract).
"""

import json
import sys
import time

import numpy as np


def cpu_baseline_qps(x: np.ndarray, q: np.ndarray, k: int, reps: int = 3
                     ) -> float:
    """Host flat L2 scan: matmul + argpartition (what faiss-cpu FlatL2 does,
    minus its SIMD hand-tuning)."""
    xsq = (x ** 2).sum(-1)
    t0 = time.perf_counter()
    for _ in range(reps):
        scores = q @ x.T
        d = xsq[None, :] - 2 * scores
        idx = np.argpartition(d, k, axis=1)[:, :k]
    dt = (time.perf_counter() - t0) / reps
    return q.shape[0] / dt


def main():
    import jax
    import jax.numpy as jnp

    from radad_tpu.index.flat import _search_device
    from radad_tpu.ops.gather import to_gather_layout
    from radad_tpu.utils.benchmark import chain_time, warmup

    n, d, b, k = 25423, 5376, 256, 5
    rng = np.random.default_rng(0)

    # CPU baseline on host-generated data of identical shape/distribution.
    x_host = rng.standard_normal((n, d)).astype(np.float32)
    q_host = rng.standard_normal((b, d)).astype(np.float32)
    cpu_qps = cpu_baseline_qps(x_host, q_host, k)
    print(f"# cpu baseline: {cpu_qps:,.0f} QPS", file=sys.stderr)

    warmup()

    # Device data generated ON DEVICE — host→device uploads through this
    # environment's TPU relay are slow and high-variance; the scan cost only
    # depends on shapes.
    xd = jax.jit(lambda key: jax.random.normal(key, (n, d), jnp.float32))(
        jax.random.PRNGKey(0))
    qd = jax.jit(lambda key: jax.random.normal(key, (b, d), jnp.float32))(
        jax.random.PRNGKey(1))
    idsd = jnp.arange(n, dtype=jnp.int32) % 9973
    excld = jnp.arange(b, dtype=jnp.int32) % 9973

    # Exactness gate on a host-verifiable subset: recall@5 vs the numpy
    # oracle must be 1.0 (two-stage bf16-scan + fused-Pallas-rerank search,
    # exactly the production FlatIndex path on TPU).
    n_small = 4096
    xs = x_host[:n_small]
    xs_d = jnp.asarray(xs)
    xs_bf = xs_d.astype(jnp.bfloat16)
    v, i_dev = _search_device(
        jnp.asarray(q_host), xs_d,
        jnp.asarray((np.arange(n_small) % 997).astype(np.int32)),
        jnp.asarray((np.arange(b) % 997).astype(np.int32)),
        k, metric="L2", n_valid=n_small,
        xsq=jnp.sum(jnp.square(xs_d), -1),
        scan_bf16=xs_bf,
        gather3=to_gather_layout(xs_d),
        resid_bf16=(xs_d - xs_bf.astype(jnp.float32)
                    ).astype(jnp.bfloat16))
    i_dev = np.asarray(i_dev)
    scores = -(np.sum(q_host ** 2, -1, keepdims=True) - 2 * q_host @ xs.T
               + np.sum(xs ** 2, -1)[None, :])
    # batch-global exclusion semantics (reference pipeline.py:461-463)
    excluded_rows = np.isin(np.arange(n_small) % 997,
                            np.arange(b) % 997)
    scores[:, excluded_rows] = -np.inf
    oracle = np.argsort(-scores, axis=1)[:, :k]
    recall = np.mean([len(set(i_dev[r]) & set(oracle[r])) / k
                      for r in range(b)])
    assert recall == 1.0, f"recall@5 = {recall} != 1.0"
    print(f"# recall@5 vs oracle (n={n_small}): {recall}", file=sys.stderr)

    # Accelerator arrays, built once at index build time in production
    # (FlatIndex._install): exact f32 row norms, bf16 scan copy, f32
    # gather-layout copy for the fused Pallas rerank.
    xsq = jnp.sum(jnp.square(xd), -1)
    x_bf = jax.jit(lambda x: x.astype(jnp.bfloat16))(xd)
    x_r = jax.jit(lambda x, s: (x - s.astype(jnp.float32)
                                ).astype(jnp.bfloat16))(xd, x_bf)
    x3 = jax.jit(to_gather_layout)(xd)

    def step(qs, xd, idsd, excld, xsq, x_bf, x3, x_r):
        vals, _ = _search_device(qs, xd, idsd, excld, k, metric="L2",
                                 n_valid=n, xsq=xsq, scan_bf16=x_bf,
                                 gather3=x3, resid_bf16=x_r)
        return qs + 1e-30 * jnp.sum(jnp.where(jnp.isfinite(vals), vals, 0.0))

    # Median-of-N with spread: single-shot numbers in this environment sit
    # inside a measured ±8 % relay band (same-day spread 110–130k QPS,
    # docs/PERFORMANCE.md) — round-over-round deltas are only falsifiable
    # against the reported spread. TPU reps interleave with fresh CPU
    # baseline reps so both sides sample the same host-load conditions.
    n_reps = 5
    tpu_qps_samples, cpu_qps_samples = [], [cpu_qps]
    for rep in range(n_reps):
        dt = chain_time(step, qd, n=16,
                        consts=(xd, idsd, excld, xsq, x_bf, x3, x_r))
        tpu_qps_samples.append(b / dt)
        print(f"# tpu rep {rep}: {dt * 1000:.3f} ms/batch → "
              f"{b / dt:,.0f} QPS "
              f"({n * d * 4 / dt / 1e9:.0f} GB/s effective)",
              file=sys.stderr)
        if rep < 2:
            cpu_qps_samples.append(cpu_baseline_qps(x_host, q_host, k))
    qps = float(np.median(tpu_qps_samples))
    cpu_med = float(np.median(cpu_qps_samples))
    print(f"# tpu median of {n_reps}: {qps:,.0f} QPS "
          f"(min {min(tpu_qps_samples):,.0f} / max "
          f"{max(tpu_qps_samples):,.0f}); cpu median {cpu_med:,.0f}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "ITW-scale flat L2 top-5 retrieval throughput "
                  "(certified-exact, self-excluded, on-device; round 2's "
                  "higher number lacked the exactness certificate and is "
                  "retired — docs/PERFORMANCE.md)",
        "value": round(qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(qps / cpu_med, 2),
        "spread": {
            "reps": n_reps,
            "min": round(min(tpu_qps_samples), 1),
            "max": round(max(tpu_qps_samples), 1),
            "cpu_baseline_median": round(cpu_med, 1),
            "cpu_baseline_min": round(min(cpu_qps_samples), 1),
            "cpu_baseline_max": round(max(cpu_qps_samples), 1),
        },
    }))


if __name__ == "__main__":
    main()
