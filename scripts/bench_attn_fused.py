"""Kernel-level sweep for the fused temporal-attention layer.

Times ONE temporal attention layer at the serving hot shape
([8, 40, 1024, 64], bf16) for: the pallas2 headpacked kernel (+ XLA
LN/qkv/out/residual glue) vs the pallas3 fused layer at several
pixels-per-matmul settings. 10 chained evals per sync to amortize the
~30 ms tunnel RTT.

Usage: python scripts/bench_attn_fused.py [--pm 1 2 4] [--batch 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pm", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--pack", type=int, nargs="+", default=[32])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--hw", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    from cvpr23_lfdm_tpu.ops.attention_pallas import (
        build_bias_flat,
        fused_temporal_layer,
        headpacked_temporal_attention,
        rotary_tables,
    )
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    b, f, hw, c = args.batch, args.frames, args.hw, args.dim
    heads, d = 8, 32
    hd = heads * d
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, f, hw, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    wqkv = jax.random.normal(key, (c, 3 * hd), jnp.float32) * c**-0.5
    wout = jax.random.normal(key, (hd, c), jnp.float32) * hd**-0.5
    pos_bias = jax.random.normal(key, (heads, f, f), jnp.float32)
    bias_flat = build_bias_flat(pos_bias, b, f, None)
    cos_t, sin_t = rotary_tables(f, heads, d, d**-0.5, jnp.bfloat16)

    STEPS = 10

    def run(fn, label):
        def loop(x):
            def body(carry, _):
                return fn(carry).astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=STEPS)
            return out.mean()

        compiled = jax.jit(loop).lower(x).compile()
        res = time_fn(compiled, x, iters=10, warmup=3)
        ms = res["median_s"] * 1e3 / STEPS
        print(json.dumps({"variant": label, "layer_ms": round(ms, 3)}),
              flush=True)

    # pallas2 baseline: LN + qkv (XLA) -> kernel -> out proj + residual (XLA)
    def pallas2_layer(xx):
        xf = xx.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        xn = ((xx - mean.astype(xx.dtype))
              * jax.lax.rsqrt(var + 1e-5).astype(xx.dtype)
              * gamma.astype(xx.dtype))
        qkv = xn @ wqkv.astype(xx.dtype)
        o = headpacked_temporal_attention(
            qkv, bias_flat, cos_t, sin_t, heads, d
        )
        return xx + o @ wout.astype(xx.dtype)

    run(pallas2_layer, "pallas2+glue")

    for pack in args.pack:
        for pm in args.pm:
            run(
                functools.partial(
                    _fused, fused_temporal_layer, gamma, wqkv, wout,
                    bias_flat, cos_t, sin_t, heads, d, pm, pack,
                ),
                f"fused_pm{pm}_pack{pack}",
            )


def _fused(kern, gamma, wqkv, wout, bias_flat, cos_t, sin_t, heads, d, pm,
           pack, xx):
    return kern(
        xx, gamma, wqkv.astype(xx.dtype), wout.astype(xx.dtype), bias_flat,
        cos_t, sin_t, heads, d, pack=pack, pixels_per_matmul=pm,
    )


if __name__ == "__main__":
    main()
