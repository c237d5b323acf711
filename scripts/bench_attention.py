"""Microbenchmark: temporal-attention implementations on the real TPU.

Races the XLA einsum path against the Pallas kernels at the UNet's real
shapes (F=40, heads=8, d=32; HW = 32^2 dominates). ms per layer, medians
with true completion syncs (utils/profiling.py).

Usage: python scripts/bench_attention.py [--impls xla,pallas,pallas2]
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cvpr23_lfdm_tpu.models.unet3d import TemporalAttention  # noqa: E402
from cvpr23_lfdm_tpu.utils.profiling import enable_compile_cache, time_fn  # noqa: E402

F, HEADS, DH = 40, 8, 32
SHAPES = [  # (B, HW, dim) — the UNet's temporal-attention sites at MUG scale
    (1, 1024, 64),
    (1, 256, 128),
    (8, 1024, 64),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="xla,pallas,pallas2")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )
    dtype = jnp.dtype(args.dtype)

    for b, hw, dim in SHAPES:
        h = w = int(np.sqrt(hw))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, F, h, w, dim)), dtype)
        pos_bias = jnp.asarray(
            rng.standard_normal((HEADS, F, F)), jnp.float32
        )
        row = [f"B={b} HW={hw} dim={dim}:"]
        for impl in args.impls.split(","):
            attn = TemporalAttention(dim, HEADS, DH, dtype=dtype, impl=impl)
            variables = jax.jit(lambda r, m=attn: m.init(r, x, pos_bias))(
                jax.random.PRNGKey(0)
            )
            reps = 10  # chain layers inside one jit: the tunnel RTT is ~30 ms

            def chained(v, xx, pb, m=attn):
                def body(h, _):
                    return m.apply(v, h, pb), None

                out, _ = jax.lax.scan(body, xx, None, length=reps)
                return out.mean()

            fn = jax.jit(chained)
            t = time_fn(fn, variables, x, pos_bias, iters=10, warmup=3)
            row.append(f"{impl}={t['median_s'] * 1e3 / reps:.2f}ms")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
