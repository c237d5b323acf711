"""Measure the tiled-warp window margins of bench-ckpt sampled flows.

Why: `assets/bench_ckpt`'s fit_report shows fit_rate 1.0 @32 but 0.0
@64/128 — the single joint fit flag (generator.py:186-200) then routes
the WHOLE decode to the XLA gather, so the headline never exercises the
tiled MXU warp even with trained weights. The fit flag is all-or-nothing;
this probe answers "by how much does it miss": it samples videos with the
committed checkpoint and reports, per decode scale, the exact per-tile
window requirement distribution (y-extent, and x-extent after the
8-aligned-origin penalty, ops/warp_pallas.py:266-283) plus what-if fit
rates for candidate window sizes. Output picks the smallest
(_WIN_H, _WIN_W) that fits — or shows the samples are too rough and the
checkpoint needs more training.

Run on TPU (one sampler compile):  python scripts/probe_fit.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TILE = 16
CANDS = [(24, 32), (32, 32), (32, 40), (40, 48), (48, 56), (64, 72)]


def tile_requirements(grid: np.ndarray, res: int) -> dict:
    """Per-tile window requirements of `grid` [N, res, res, 2] in [-1, 1].

    Mirrors ops/warp_pallas._tiled_geometry: valid-corner cover, per-tile
    min/max, y window from the raw extent, x window after flooring the
    origin to a multiple of 8 (the Mosaic sublane-alignment penalty).
    """
    n = grid.shape[0]
    ix = ((grid[..., 0] + 1.0) * res - 1.0) * 0.5
    iy = ((grid[..., 1] + 1.0) * res - 1.0) * 0.5
    x0 = np.floor(ix).astype(np.int64)
    y0 = np.floor(iy).astype(np.int64)

    def cover(c0):
        big, small = res * 4, -1
        v0 = np.where((c0 >= 0) & (c0 <= res - 1), c0, big)
        v1 = np.where((c0 + 1 >= 0) & (c0 + 1 <= res - 1), c0 + 1, big)
        lo = np.minimum(v0, v1)
        v0 = np.where((c0 >= 0) & (c0 <= res - 1), c0, small)
        v1 = np.where((c0 + 1 >= 0) & (c0 + 1 <= res - 1), c0 + 1, small)
        hi = np.maximum(v0, v1)
        return lo, hi

    xlo, xhi = cover(x0)
    ylo, yhi = cover(y0)
    nt = res // TILE

    def tmin(v):
        return v.reshape(n, nt, TILE, nt, TILE).min(axis=(2, 4))

    def tmax(v):
        return v.reshape(n, nt, TILE, nt, TILE).max(axis=(2, 4))

    # required extents per tile (window must be >= extent)
    y_req = (tmax(yhi) - tmin(ylo) + 1).ravel()
    x_req = (tmax(xhi) - (tmin(xlo) // 8) * 8 + 1).ravel()
    q = [50, 90, 99, 100]
    return {
        "y_req_pct": {str(p): float(np.percentile(y_req, p)) for p in q},
        "x_req_pct": {str(p): float(np.percentile(x_req, p)) for p in q},
        "fit_rate_per_video": {
            f"{wh}x{ww}": float(
                np.mean(
                    (
                        (y_req.reshape(n, -1) <= wh)
                        & (x_req.reshape(n, -1) <= ww)
                    ).all(axis=1)
                )
            )
            for wh, ww in CANDS
        },
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.utils.bench_ckpt import load_bench_ckpt

    cfg = mug_config()
    cfg = cfg.replace(
        lfae=dataclasses.replace(
            cfg.lfae, compute_dtype="bfloat16", warp_impl="xla"
        ),
        diffusion=dataclasses.replace(cfg.diffusion, sampling_timesteps=10),
    )
    k_lfae, k_unet = jax.random.split(jax.random.PRNGKey(0))
    lfae_vars = init_lfae_vars(k_lfae, cfg.lfae)
    model0 = FlowDiffusion(cfg.lfae, cfg.diffusion)
    unet_vars = model0.init_unet_vars(k_unet, batch=1)
    loaded = load_bench_ckpt(
        os.path.join(REPO, "assets", "bench_ckpt"), unet_vars, lfae_vars
    )
    assert loaded is not None, "assets/bench_ckpt missing"
    unet_vars, lfae_vars = loaded.unet_vars, loaded.lfae_vars
    cond = jnp.asarray(loaded.cond)[None]
    ref = jnp.asarray(loaded.ref)[None]
    if loaded.meta["objective"] != cfg.diffusion.objective:
        cfg = cfg.replace(diffusion=dataclasses.replace(
            cfg.diffusion, objective=loaded.meta["objective"]))
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)

    def sample_grid(uv, lv, rng, ref, cond):
        out = model.sample_video(uv, lv, rng, ref, cond, cond_scale=1.0)
        return out["vid_grid"]

    jfn = jax.jit(sample_grid)
    grids = []
    for i in range(4):
        g = np.asarray(jax.device_get(
            jfn(unet_vars, lfae_vars, jax.random.PRNGKey(1000 + i), ref, cond)
        ), np.float32)
        b, f, gh, gw, _ = g.shape
        grids.append(g.reshape(b * f, gh, gw, 2))
        print(f"sampled video {i}", flush=True)
    g32 = np.concatenate(grids, 0)

    from cvpr23_lfdm_tpu.ops.resize import resize_bilinear

    report = {}
    for res in (64, 128):
        # the EXACT resize the decode's `prep` uses (generator.py:151-160)
        gr = np.asarray(jax.jit(
            lambda g, r=res: resize_bilinear(g, (r, r))
        )(jnp.asarray(g32)))
        report[str(res)] = tile_requirements(gr, res)
    print(json.dumps(report, indent=1))
    with open(os.path.join(REPO, "assets", "bench_ckpt",
                           "fit_margins.json"), "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    main()
