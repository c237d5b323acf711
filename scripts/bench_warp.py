"""Variant sweep for the serving decode warp (the 128^2 gather).

The B=8 sampler profile shows the full-res skip+source warp
(`grid_sample([8,128,128,67], [8,5120,128,2])`) costing ~64 ms — it
materializes a [5.2M, 2, 2, 67] patch tensor (~2.8 GB) in HBM. This
sweeps formulations at the exact serving shape to pick the fastest:

  patch    - current: one (2,2,C) window gather + einsum weights
  corner4  - four (1,1,C) row gathers, weighted mul-add chain (fusible)
  flat4    - one gather of 4P row indices on [B, HW, C], weighted reduce
  fchunk   - patch, frames processed in chunks of 10 (smaller live set)

Usage: python scripts/bench_warp.py [--batch 8]
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


def _coords(image, grid):
    """Shared unnormalize/floor/weights (zeros padding, align=False)."""
    b, h, w, c = image.shape
    ix = ((grid[..., 0] + 1.0) * w - 1.0) * 0.5
    iy = ((grid[..., 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def corner4(image, grid):
    b, h, w, c = image.shape
    gh, gw = grid.shape[1:3]
    x0, y0, wx, wy = _coords(image, grid)
    dt = image.dtype

    def gather_rows(yy, xx):
        valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
        lin = (jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)).reshape(b, -1)
        img = image.reshape(b, h * w, c)
        g = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(img, lin)
        return g, valid.reshape(b, -1)

    out = 0.0
    for dy, wyc in ((0, (1 - wy)), (1, wy)):
        for dx, wxc in ((0, (1 - wx)), (1, wx)):
            g, valid = gather_rows(y0 + dy, x0 + dx)
            wgt = (wyc * wxc).reshape(b, -1)
            wgt = jnp.where(valid, wgt, 0.0).astype(dt)
            out = out + g * wgt[..., None]
    return out.reshape(b, gh, gw, c)


def flat4(image, grid):
    b, h, w, c = image.shape
    gh, gw = grid.shape[1:3]
    p = gh * gw
    x0, y0, wx, wy = _coords(image, grid)
    dt = image.dtype
    idx = []
    wgt = []
    for dy, wyc in ((0, (1 - wy)), (1, wy)):
        for dx, wxc in ((0, (1 - wx)), (1, wx)):
            xx = x0 + dx
            yy = y0 + dy
            valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            idx.append(
                (jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)).reshape(b, p)
            )
            wgt.append(jnp.where(valid, wyc * wxc, 0.0).reshape(b, p))
    idx4 = jnp.concatenate(idx, axis=1)
    wgt4 = jnp.concatenate(wgt, axis=1).astype(dt)
    img = image.reshape(b, h * w, c)
    g = jax.vmap(lambda im, ix: jnp.take(im, ix, axis=0))(img, idx4)
    g = g * wgt4[..., None]
    return (
        g.reshape(b, 4, p, c).sum(axis=1).reshape(b, gh, gw, c)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--ch", type=int, default=67)
    args = ap.parse_args()

    from cvpr23_lfdm_tpu.ops.warp import grid_sample
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    b, f, s, c = args.batch, args.frames, args.size, args.ch
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (b, s, s, c), jnp.bfloat16)
    grid = jax.random.uniform(key, (b, f * s, s, 2), jnp.float32, -1.1, 1.1)

    def patch(im, g):
        return grid_sample(im, g)

    def fchunk(im, g):
        gg = g.reshape(b, f, s, s, 2)
        outs = [
            grid_sample(im, gg[:, i : i + 10].reshape(b, 10 * s, s, 2))
            for i in range(0, f, 10)
        ]
        return jnp.concatenate(outs, axis=1)

    # 4 chained executions per sync (distinct grids defeat CSE) amortize
    # the ~30 ms tunnel RTT
    grids = jnp.stack([grid * sc for sc in (1.0, 0.99, 0.98, 0.97)])
    STEPS = grids.shape[0]
    ref = None
    for name, fn in [
        ("patch", patch), ("corner4", corner4), ("flat4", flat4),
        ("fchunk", fchunk),
    ]:
        def loop(im, gs, fn=fn):
            def body(acc, g):
                return acc + fn(im, g).astype(jnp.float32).mean(), None
            out, _ = jax.lax.scan(body, 0.0, gs)
            return out

        compiled = jax.jit(loop).lower(image, grids).compile()
        val = float(jax.device_get(compiled(image, grids)))
        if ref is None:
            ref = val
        res = time_fn(compiled, image, grids, iters=8, warmup=2)
        print(json.dumps({
            "variant": name,
            "ms": round(res["median_s"] * 1e3 / STEPS, 2),
            "val_drift": round(abs(val - ref), 5),
        }), flush=True)


if __name__ == "__main__":
    main()
