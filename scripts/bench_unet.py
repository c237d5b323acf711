"""UNet3D eval micro-bench: the DDIM scan's per-step cost in isolation.

The sampler spends ~70% of its time in 10 sequential UNet evals
(scripts/profile_sampler.py breakdown); this bench times ONE eval at the
serving config (bf16, pallas2 attention) for B in {1, 8} so kernel/layout
changes iterate in ~2 min instead of a full bench.py run.

Usage: python scripts/bench_unet.py [--batch 1 8] [--attn pallas2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--attn", default="pallas2")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--trace", action="store_true",
                    help="device-trace one eval and print the top-op table")
    ap.add_argument("--fused-norm", default=None,
                    type=lambda s: s.lower() in ("1", "true", "yes"),
                    help="override the GN+FiLM+SiLU fused-kernel choice")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from cvpr23_lfdm_tpu.models.unet3d import Unet3D
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    unet = Unet3D(dtype=jnp.bfloat16, temporal_attn_impl=args.attn,
                  fused_norm=args.fused_norm)
    f, s = args.frames, args.size
    k = jax.random.PRNGKey(0)
    x1 = jax.random.normal(k, (1, f, s, s, 3), jnp.float32)
    fea1 = jax.random.normal(k, (1, 1, s, s, 256), jnp.float32)
    t1 = jnp.zeros((1,), jnp.int32)
    cond1 = jax.random.normal(k, (1, 768), jnp.float32)
    variables = jax.jit(
        lambda r: unet.init(r, x1, t1, cond1, fea=fea1)
    )(jax.random.PRNGKey(1))

    STEPS = 10  # chained evals per sync: amortizes the ~30 ms tunnel RTT

    for b in args.batch:
        x = jnp.broadcast_to(x1, (b,) + x1.shape[1:])
        fea = jnp.broadcast_to(fea1, (b,) + fea1.shape[1:])
        t = jnp.zeros((b,), jnp.int32)
        cond = jnp.broadcast_to(cond1, (b, 768))

        def loop(v, x, t, c, fe):
            def body(carry, _):
                out = unet.apply(v, carry, t, c, fea=fe)
                return out.astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=STEPS)
            return out.mean()

        compiled = jax.jit(loop).lower(variables, x, t, cond, fea).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        res = time_fn(compiled, variables, x, t, cond, fea, iters=10, warmup=3)
        ms = res["median_s"] * 1e3 / STEPS
        ca = {k: float(v) / STEPS for k, v in ca.items() if isinstance(v, (int, float))}
        if args.trace:
            from cvpr23_lfdm_tpu.utils.profiling import trace
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from profile_sampler import parse_xplane, group_name
            import collections
            log_dir = f"/tmp/unet_trace_b{b}"
            with trace(log_dir):
                for _ in range(3):
                    jax.device_get(compiled(variables, x, t, cond, fea))
            ops = parse_xplane(log_dir)
            groups = collections.defaultdict(float)
            for name, (t_ms, _) in ops.items():
                groups[group_name(name)] += t_ms
            print(f"--- B={b} groups (ms/exec over 3) ---")
            for g, t_ms in sorted(groups.items(), key=lambda kv: -kv[1]):
                print(f"  {t_ms / 3:8.2f}  {g}")
            print(f"--- top {args.top} ops ---")
            for name, (t_ms, cnt) in sorted(
                ops.items(), key=lambda kv: -kv[1][0]
            )[: args.top]:
                print(f"  {t_ms / 3:8.3f}  x{cnt // 3:<4d} {name[:150]}")
        print(json.dumps({
            "batch": b,
            "unet_eval_ms": round(ms, 3),
            "ms_per_sample": round(ms / b, 3),
            "gflops": round(float(ca.get("flops", 0)) / 1e9, 1),
            "hbm_gb": round(float(ca.get("bytes accessed", 0)) / 1e9, 3),
            "hbm_util": round(
                float(ca.get("bytes accessed", 0)) / (ms / 1e3) / 1e9 / 819.0, 3
            ),
        }))


if __name__ == "__main__":
    main()
