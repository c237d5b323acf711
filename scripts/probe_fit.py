"""Measure tiled-warp window margins of bench-ckpt sampled flows and
write checkpoint-adaptive windows into the checkpoint's meta.json.

Why: the tiled MXU decode warp (ops/warp_pallas.py) is exact only when
every output tile's bilinear corner spread fits a static source window;
the generator's joint fit flag (generator.py:_decode_core) otherwise
routes the WHOLE decode to the XLA gather. Window size is a property of
the trained model's flow statistics, so hardcoded constants go stale the
moment the checkpoint changes (round-4: windows tuned on 4 probe videos
of a 400-step checkpoint). This probe:

1. samples `--probe-videos` videos with the committed checkpoint across
   ALL dataset class conditionings (DDIM-10, the serving schedule);
2. computes per-tile window requirements at every decode scale with the
   kernel's OWN geometry helpers (`warp_pallas.tile_window_requirements`
   — single source of truth, no reimplementation);
3. picks per-scale windows = p100 requirement + headroom (+4 rows,
   +8 cols rounded to the 8-lane alignment) and writes them to
   `<ckpt>/meta.json["tiled_windows"]`, which `bench.py` / serving load
   via `warp_pallas.configure_windows_from_meta` — windows travel WITH
   the checkpoint;
4. writes the full margin distribution to `<ckpt>/fit_margins.json`.

Run on TPU (one sampler compile):  python scripts/probe_fit.py
  [--probe-videos 32] [--ckpt assets/bench_ckpt]

Flows being fit come from the pixelwise flow predictor the DM imitates
(/root/reference/LFAE/modules/pixelwise_flow_predictor.py:104-131).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CANDS = [(24, 32), (32, 32), (32, 40), (40, 48), (48, 56), (64, 72)]
PCTS = [50, 90, 99, 100]


def summarize(y_req: np.ndarray, x_req: np.ndarray, n_videos: int) -> dict:
    """Requirement percentiles + what-if per-video fit rates."""
    y = y_req.reshape(n_videos, -1)
    x = x_req.reshape(n_videos, -1)
    return {
        "y_req_pct": {str(p): float(np.percentile(y, p)) for p in PCTS},
        "x_req_pct": {str(p): float(np.percentile(x, p)) for p in PCTS},
        "fit_rate_per_video": {
            f"{wh}x{ww}": float(
                np.mean(((y <= wh) & (x <= ww)).all(axis=1))
            )
            for wh, ww in CANDS
        },
    }


def choose_window(y_req: np.ndarray, x_req: np.ndarray, res: int) -> tuple[int, int]:
    """p100 requirement + headroom: +4 rows, +8 cols, cols rounded up to
    the 8-lane alignment, clamped to the frame. Round-4 lesson: the
    64-scale exact-fit window (x p100 == window cols) left ZERO headroom —
    one marginally rougher flow flips the all-or-nothing fit flag and the
    entire decode silently pays the 85 ms gather."""
    wh = min(int(y_req.max()) + 4, res)
    ww = min(int(-(-(int(x_req.max()) + 8) // 8) * 8), res)
    return wh, ww


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--probe-videos", type=int, default=32)
    ap.add_argument("--ckpt", default=os.path.join(REPO, "assets", "bench_ckpt"))
    ap.add_argument("--seed", type=int, default=1000)
    ap.add_argument(
        "--grids-cache", default="",
        help="npz path: reuse sampled flow grids if present, else sample "
        "on TPU and save here (the sampler compile is minutes; the "
        "window/tile analysis is seconds and iterates offline)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.data import get_spec
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.ops.resize import resize_bilinear
    from cvpr23_lfdm_tpu.ops.warp_pallas import tile_window_requirements
    from cvpr23_lfdm_tpu.utils.bench_ckpt import load_bench_ckpt

    cfg = mug_config()
    cfg = cfg.replace(
        lfae=dataclasses.replace(
            cfg.lfae, compute_dtype="bfloat16", warp_impl="xla"
        ),
        diffusion=dataclasses.replace(cfg.diffusion, sampling_timesteps=10),
    )

    conds = None
    if args.grids_cache and os.path.exists(args.grids_cache):
        # offline re-analysis: no checkpoint/model/TPU needed
        dat = np.load(args.grids_cache)
        g32, n_videos = dat["grids"], int(dat["n_videos"])
        print(f"reusing {n_videos} sampled videos from {args.grids_cache}")
    else:
        k_lfae, k_unet = jax.random.split(jax.random.PRNGKey(0))
        lfae_vars = init_lfae_vars(k_lfae, cfg.lfae)
        model0 = FlowDiffusion(cfg.lfae, cfg.diffusion)
        unet_vars = model0.init_unet_vars(k_unet, batch=1)
        loaded = load_bench_ckpt(args.ckpt, unet_vars, lfae_vars)
        assert loaded is not None, f"{args.ckpt} missing"
        unet_vars, lfae_vars = loaded.unet_vars, loaded.lfae_vars
        ref = jnp.asarray(loaded.ref)[None]
        if loaded.meta["objective"] != cfg.diffusion.objective:
            cfg = cfg.replace(diffusion=dataclasses.replace(
                cfg.diffusion, objective=loaded.meta["objective"]))
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)

        # all class conditionings, round-robin (the checkpoint's cond.npy
        # is class 0 only; trained flows vary by cond)
        spec = get_spec("mug")
        try:
            from _common import load_text_embedder

            embedder = load_text_embedder("mug", allow_random=True)
            conds = np.asarray(embedder(list(spec.classes))[0], np.float32)
        except Exception as e:
            print(f"class-cond table unavailable ({e}); using ckpt cond only")
            conds = np.asarray(loaded.cond)[None]
        print(f"{len(conds)} class conds, {args.probe_videos} probe videos",
              flush=True)

        def sample_grid(uv, lv, rng, ref, cond):
            out = model.sample_video(uv, lv, rng, ref, cond, cond_scale=1.0)
            return out["vid_grid"]

        jfn = jax.jit(sample_grid)
        grids = []
        for i in range(args.probe_videos):
            cond = jnp.asarray(conds[i % len(conds)])[None]
            g = np.asarray(jax.device_get(
                jfn(unet_vars, lfae_vars, jax.random.PRNGKey(args.seed + i),
                    ref, cond)
            ), np.float32)
            b, f, gh, gw, _ = g.shape
            grids.append(g.reshape(b * f, gh, gw, 2))
            if (i + 1) % 8 == 0 or i == 0:
                print(f"sampled video {i + 1}/{args.probe_videos}", flush=True)
        g32 = np.concatenate(grids, 0)
        n_videos = len(grids)
        if args.grids_cache:
            np.savez_compressed(
                args.grids_cache, grids=g32, n_videos=n_videos
            )
            print(f"saved grids -> {args.grids_cache}")

    report, windows, tiles = {}, {}, {}
    s = cfg.lfae.frame_shape
    d = cfg.lfae.generator.num_down_blocks
    scales = [s // (2 ** (d - i)) for i in range(d + 1)]
    # the analysis is a handful of tiny reduction graphs — compile them on
    # the LOCAL CPU backend (remote TPU compiles cost minutes each on this
    # tunnel; the math is identical)
    try:
        cpu_ctx = jax.default_device(jax.local_devices(backend="cpu")[0])
    except Exception:
        import contextlib

        cpu_ctx = contextlib.nullcontext()
    cpu_ctx.__enter__()  # rest of main is analysis + file IO
    # tile-shape candidates: requirement scales ~linearly with tile extent
    # while MXU work is linear in window AREA alone, so a smaller tile can
    # buy a much smaller window. T = th*tw stays >= 128 (lane-axis fill).
    TILE_CANDS = [(16, 16), (8, 16), (16, 8)]
    for res in scales:
        if res <= 32:
            continue  # whole-frame window: fit is structural
        # the EXACT resize the decode's `prep` uses (generator.py:149-160)
        gr = np.asarray(jax.jit(
            lambda g, r=res: resize_bilinear(g, (r, r))
        )(jnp.asarray(g32)))
        gr5 = jnp.asarray(gr).reshape(n_videos, -1, res, res, 2)
        best = None
        by_tile = {}
        for cand in TILE_CANDS:
            y_req, x_req = (np.asarray(v) for v in jax.jit(
                tile_window_requirements, static_argnames="tile"
            )(gr5, tile=cand))
            win = choose_window(y_req, x_req, res)
            entry = summarize(y_req, x_req, n_videos)
            entry["chosen_window"] = list(win)
            entry["mxu_cost_area"] = win[0] * win[1]
            by_tile[f"{cand[0]}x{cand[1]}"] = entry
            # minimize window area (= per-pixel MXU MACs); tie -> the
            # larger tile (fewer kernel invocations)
            key = (win[0] * win[1], -cand[0] * cand[1])
            if best is None or key < best[0]:
                best = (key, cand, win)
        _, cand, win = best
        report[str(res)] = by_tile
        windows[str(res)] = list(win)
        tiles[str(res)] = list(cand)
        report[str(res)]["chosen"] = {
            "tile": list(cand), "window": list(win),
        }

    report["probe_videos"] = n_videos
    if conds is not None:
        report["conds"] = len(conds)
    print(json.dumps(report, indent=1))
    with open(os.path.join(args.ckpt, "fit_margins.json"), "w") as fh:
        json.dump(report, fh, indent=1)

    # windows travel with the checkpoint: merge into meta.json
    meta_path = os.path.join(args.ckpt, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
    meta["tiled_windows"] = windows
    meta["tiled_tiles"] = tiles
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=1)
    print(f"windows {windows} tiles {tiles} -> {meta_path}")


if __name__ == "__main__":
    main()
