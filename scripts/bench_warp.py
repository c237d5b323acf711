"""Variant sweep for the serving decode warp (the 128^2 gather).

The B=8 sampler profile shows the full-res skip+source warp
(`grid_sample([8,128,128,67], [8,5120,128,2])`) costing ~64 ms — it
materializes a [5.2M, 2, 2, 67] patch tensor (~2.8 GB) in HBM. This
sweeps formulations at the exact serving shape to pick the fastest:

  patch    - current: one (2,2,C) window gather + einsum weights
  corner4  - four (1,1,C) row gathers, weighted mul-add chain (fusible)
  flat4    - one gather of 4P row indices on [B, HW, C], weighted reduce
  fchunk   - patch, frames processed in chunks of 10 (smaller live set)
  prepair  - pre-interleave the 2x2 corners into one [H,W,4C] row so each
             output pixel is ONE row gather

Measured (v5e, B=8, bf16, 67ch): patch 85.3 ms, corner4/flat4 ~2.2x worse,
prepair 113.5 ms — the 4C=268-lane row spans 3 vregs and XLA's gather rate
scales with vreg-rows fetched, so widening rows does not help. patch (2
contiguous 2C segments per pixel) is the best XLA form; beating it needs a
non-gather formulation (see ops/warp_pallas.py one-hot MXU warp).

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


def per_scale(args) -> None:
    """Tiled vs XLA-gather decode warp at EVERY generator decode scale
    (the per-(scale, channels) pairs `_decode_warp_stack` actually warps:
    32^2x256 bottleneck, 64^2x128 skip, 128^2x67 skip+source pack), on
    smooth window-fitting flows. Decides the shipped per-scale winner
    (LFAEConfig.warp_tiled_max_res) with data — VERDICT r4 item 2."""
    from cvpr23_lfdm_tpu.ops.warp import grid_sample
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        configure_windows_from_meta, tiled_fit, warp_video_tiled,
    )
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    # measure with the windows serving would actually run (checkpoint-
    # adaptive when the bench ckpt carries them)
    meta_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "bench_ckpt", "meta.json",
    )
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            configure_windows_from_meta(json.load(fh))

    b, f = args.batch, args.frames
    key = jax.random.PRNGKey(0)
    table = {}
    for s, c in ((32, 256), (64, 128), (128, 67)):
        image = jax.random.normal(key, (b, s, s, c), jnp.bfloat16)
        lin = jnp.linspace(-1.0, 1.0, s)
        gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
        base = jnp.stack([gx, gy], -1)[None, None]
        coarse = 0.03 * jax.random.normal(key, (b, f, 8, 8, 2), jnp.float32)
        disp = jax.image.resize(coarse, (b, f, s, s, 2), "linear")
        g5 = base + disp
        assert bool(jax.jit(tiled_fit)(image, g5)), s

        def xla(im, g):
            return grid_sample(im, g.reshape(b, f * s, s, 2)).astype(
                jnp.float32).mean()

        def tl(im, g):
            return warp_video_tiled(im, g).astype(jnp.float32).mean()

        row = {}
        vals = {}
        for name, fn in (("xla", xla), ("tiled", tl)):
            compiled = jax.jit(fn).lower(image, g5).compile()
            vals[name] = float(jax.device_get(compiled(image, g5)))
            res = time_fn(compiled, image, g5, iters=8, warmup=2)
            row[name] = round(res["median_s"] * 1e3, 2)
        assert abs(vals["xla"] - vals["tiled"]) < 1e-3, (s, vals)
        row["winner"] = "tiled" if row["tiled"] < row["xla"] else "xla"
        table[str(s)] = row
        print(json.dumps({"scale": s, "ch": c, **row}), flush=True)
    print(json.dumps({"per_scale": table}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--ch", type=int, default=67)
    ap.add_argument("--per-scale", action="store_true",
                    help="tiled-vs-xla at every decode scale (32/64/128)")
    args = ap.parse_args()

    if args.per_scale:
        per_scale(args)
        return

    from cvpr23_lfdm_tpu.ops.warp import grid_sample
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    b, f, s, c = args.batch, args.frames, args.size, args.ch
    key = jax.random.PRNGKey(0)
    image = jax.random.normal(key, (b, s, s, c), jnp.bfloat16)
    # smooth near-identity grids (what real decode flows look like): the
    # tiled one-hot kernel's windows must fit; random grids fall back
    lin = jnp.linspace(-1.0, 1.0, s)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    base = jnp.stack([gx, gy], -1)[None, None]
    coarse = 0.03 * jax.random.normal(key, (b, f, 8, 8, 2), jnp.float32)
    disp = jax.image.resize(coarse, (b, f, s, s, 2), "linear")
    grid = (base + disp).reshape(b, f * s, s, 2)

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
    def prepair(im, g):
        """Pre-interleave the 2x2 corners into one row per source pixel:
        the bilinear patch becomes a SINGLE row gather (XLA fetches a
        (2,2,C) window as multiple rows)."""
        bb, hh, ww, cc = im.shape
        gh, gw = g.shape[1:3]
        pad = jnp.pad(im, ((0, 0), (0, 1), (0, 1), (0, 0)))
        P = jnp.concatenate(
            [
                pad[:, :-1, :-1], pad[:, :-1, 1:],
                pad[:, 1:, :-1], pad[:, 1:, 1:],
            ],
            axis=-1,
        )  # [B, H, W, 4C] (row y,x holds the (2,2) patch at (y,x))
        x0, y0, wx, wy = _coords(im, g)
        x0c = jnp.clip(x0, 0, ww - 2)
        y0c = jnp.clip(y0, 0, hh - 2)
        lin = (y0c * ww + x0c).reshape(bb, -1)
        Pf = P.reshape(bb, hh * ww, 4 * cc)
        patch = jax.vmap(lambda p, i: jnp.take(p, i, axis=0))(Pf, lin)
        patch = patch.reshape(bb, -1, 2, 2, cc)

        def cellw(c0, i0, frac, size):
            i1 = i0 + 1
            in0 = (i0 >= 0) & (i0 <= size - 1)
            in1 = (i1 >= 0) & (i1 <= size - 1)
            w0 = jnp.where((c0 == i0) & in0, 1.0 - frac,
                           jnp.where((c0 == i1) & in1, frac, 0.0))
            w1 = jnp.where((c0 + 1 == i0) & in0, 1.0 - frac,
                           jnp.where((c0 + 1 == i1) & in1, frac, 0.0))
            return w0, w1

        wx0, wx1 = cellw(x0c, x0, wx, ww)
        wy0, wy1 = cellw(y0c, y0, wy, hh)
        wts = jnp.stack(
            [jnp.stack([wy0 * wx0, wy0 * wx1], -1),
             jnp.stack([wy1 * wx0, wy1 * wx1], -1)], -2,
        ).reshape(bb, -1, 2, 2)
        out = jnp.einsum("bpyxc,bpyx->bpc", patch, wts.astype(im.dtype))
        return out.reshape(bb, gh, gw, cc)

    def pallas_gather(im, g):
        from cvpr23_lfdm_tpu.ops.warp_pallas import warp_gather

        # one warp per (video, frame): fold frames into batch, repeat the
        # shared source (feasibility probe for the lane-gather at n=16k)
        gg = g.reshape(b * f, s, s, 2)
        imr = jnp.repeat(im, f, axis=0)
        return warp_gather(imr, gg).reshape(b, f * s, s, c)

    def tiled(im, g):
        from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video_tiled

        g5 = g.reshape(b, f, s, s, 2)
        return warp_video_tiled(im, g5).reshape(b, f * s, s, c)

    def tiled_cond(im, g):
        from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video

        g5 = g.reshape(b, f, s, s, 2)
        return warp_video(im, g5).reshape(b, f * s, s, c)

    ref = None
    for name, fn in [
        ("patch", patch), ("tiled", tiled), ("tiled_cond", tiled_cond),
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
