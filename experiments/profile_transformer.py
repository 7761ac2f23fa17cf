"""Per-op wall-clock decomposition of the encoder transformer layer
(VERDICT r2 #3: where do the missing MFU percent go at T=99?).

Measures, on the real chip at the production shape (B=256 segments,
T=99 frames, D=768, 12 heads, bf16):

  * the full post-LN layer;
  * attention in isolation, then its two halves (projections vs
    logits+softmax+context core);
  * the FFN, and its GELU alone;
  * the two LayerNorms;
  * a matmul-only proxy (the six GEMMs with no elementwise ops) — the
    layer's speed-of-light given MXU peak.

Each timing is a dependent chain via radad_tpu.utils.benchmark.chain_time
(the relay acks block_until_ready early; see NOTES.md). Prints a table to
stderr and one JSON line to stdout.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from radad_tpu.models import encoder_common as C
    from radad_tpu.utils.benchmark import chain_time, warmup

    b, t, d, heads, dff = 256, 99, 768, 12, 3072
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 16)

    p = {
        "attn": {
            "qw": jax.random.normal(keys[0], (d, d), jnp.float32) * 0.02,
            "qb": jnp.zeros((d,), jnp.float32),
            "kw": jax.random.normal(keys[1], (d, d), jnp.float32) * 0.02,
            "kb": jnp.zeros((d,), jnp.float32),
            "vw": jax.random.normal(keys[2], (d, d), jnp.float32) * 0.02,
            "vb": jnp.zeros((d,), jnp.float32),
            "ow": jax.random.normal(keys[3], (d, d), jnp.float32) * 0.02,
            "ob": jnp.zeros((d,), jnp.float32),
        },
        "ffn": {
            "w1": jax.random.normal(keys[4], (d, dff), jnp.float32) * 0.02,
            "b1": jnp.zeros((dff,), jnp.float32),
            "w2": jax.random.normal(keys[5], (dff, d), jnp.float32) * 0.02,
            "b2": jnp.zeros((d,), jnp.float32),
        },
        "ln1": {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)},
        "ln2": {"scale": jnp.ones((d,), jnp.float32),
                "bias": jnp.zeros((d,), jnp.float32)},
    }
    x0 = jax.random.normal(keys[6], (b, t, d), dt)

    warmup()
    rows = {}

    def bench(name, fn, flops=None, n=30):
        sec = chain_time(fn, x0, n=n, consts=(p,))
        rows[name] = sec
        tfs = (flops / sec / 1e12) if flops else None
        extra = f"  {tfs:6.1f} TF/s" if tfs else ""
        print(f"# {name:34s} {sec * 1e3:7.3f} ms{extra}", file=sys.stderr)
        return sec

    # FLOP counts (fwd, multiply-add = 2 flop)
    f_proj = 4 * 2 * b * t * d * d
    f_core = 2 * 2 * b * heads * t * t * (d // heads)
    f_ffn = 2 * 2 * b * t * d * dff
    f_layer = f_proj + f_core + f_ffn

    def keepdt(y, x):  # keep state shape/dtype for the chain
        return (x + y.astype(x.dtype) * jnp.asarray(1e-3, x.dtype)
                ).astype(x.dtype)

    bench("full post-LN layer",
          lambda x, p: C.post_ln_layer(x, p, heads, 1e-5), f_layer)

    bench("attention (proj + core + out)",
          lambda x, p: keepdt(C.self_attention(x, p["attn"], heads), x),
          f_proj + f_core)

    def projections_only(x, p):
        a = p["attn"]
        q = C.linear(x, a["qw"], a["qb"])
        k = C.linear(x, a["kw"], a["kb"])
        v = C.linear(x, a["vw"], a["vb"])
        o = C.linear(q + k + v, a["ow"], a["ob"])
        return keepdt(o, x)

    bench("attn projections only (4 GEMMs)", projections_only, f_proj)

    def core_only(x, p):
        from radad_tpu.ops.attention import mha_reference
        ctx = mha_reference(x, x, x, heads)
        return keepdt(ctx, x)

    bench("attn core (split+logits+softmax+ctx)", core_only, f_core)

    bench("ffn (GEMM+gelu+GEMM)",
          lambda x, p: keepdt(C.feed_forward(x, p["ffn"]), x), f_ffn)

    def gelu_only(x, p):
        big = jnp.broadcast_to(x[..., :1], (b, t, dff)).astype(x.dtype)
        return keepdt(jnp.sum(C.gelu(big), -1, keepdims=True), x)

    bench("gelu alone on [B,T,3072]", gelu_only)

    def ln_only(x, p):
        h = C.layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], 1e-5)
        return C.layer_norm(h, p["ln2"]["scale"], p["ln2"]["bias"], 1e-5)

    bench("2x layer_norm", ln_only)

    def matmul_proxy(x, p):
        a, f = p["attn"], p["ffn"]
        h = C.linear(x, a["qw"])
        h = C.linear(h, a["kw"])
        h = C.linear(h, a["vw"])
        h = C.linear(h, a["ow"])
        g = C.linear(h, f["w1"])
        return C.linear(g, f["w2"])

    bench("matmul-only proxy (6 GEMMs)", matmul_proxy, f_proj + f_ffn)

    layer = rows["full post-LN layer"]
    stack = layer * 12
    print(f"# 12-layer stack extrapolation: {stack * 1e3:.1f} ms "
          f"({12 * f_layer / stack / 1e12:.1f} TF/s, "
          f"{12 * f_layer / stack / 1e12 / 197 * 100:.0f}% of bf16 peak)",
          file=sys.stderr)
    print(json.dumps({k: round(v * 1e3, 4) for k, v in rows.items()}))


if __name__ == "__main__":
    main()
