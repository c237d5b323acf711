"""Window requirements of the LFAE's OWN pseudo-GT flows (no DM sampler).

Separates the two possible causes of large tiled-warp windows on a trained
checkpoint: (a) DDIM-10 residual sampling noise in the DM's flow field vs
(b) inherent roughness of the trained LFAE flows the DM imitates
(reference: the DM regresses the flows of
/root/reference/LFAE/modules/pixelwise_flow_predictor.py:104-131). If GT
requirements are much smaller than sampled-flow requirements, longer DM
training / more DDIM steps will shrink serving windows toward the GT
numbers; if they match, the window size is a property of the data.

CPU-friendly (forward LFAE only): python scripts/probe_gt_flows.py
  [--videos 4] [--ckpt assets/bench_ckpt]
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


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--ckpt", default=os.path.join(REPO, "assets", "bench_ckpt"))
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--motion-scale", type=float, default=0.2)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.data import get_spec
    from cvpr23_lfdm_tpu.data.datasets import DMVideoDataset
    from cvpr23_lfdm_tpu.data.synthetic import make_synthetic_corpus
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.ops.resize import resize_bilinear
    from cvpr23_lfdm_tpu.ops.warp_pallas import tile_window_requirements
    from cvpr23_lfdm_tpu.utils.bench_ckpt import load_bench_ckpt

    cfg = mug_config()
    cfg = cfg.replace(
        lfae=dataclasses.replace(cfg.lfae, warp_impl="xla"),
    )
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
    unet_vars = model.init_unet_vars(jax.random.PRNGKey(1), batch=1)
    loaded = load_bench_ckpt(args.ckpt, unet_vars, lfae_vars)
    assert loaded is not None, f"{args.ckpt} missing"
    lfae_vars = loaded.lfae_vars

    # the same corpus recipe the checkpoint trained on (make_bench_ckpt)
    import tempfile

    root = tempfile.mkdtemp(prefix="gt_flow_corpus_")
    spec = get_spec("mug")
    make_synthetic_corpus(
        root, "mug", num_frames=cfg.diffusion.num_frames,
        size=cfg.lfae.frame_shape, seed=args.seed,
        subjects=list(spec.train_subjects[:2]), classes=None, takes=2,
        motion_scale=args.motion_scale,
    )
    ds = DMVideoDataset(
        spec, root, "train", num_frames=cfg.diffusion.num_frames,
        image_size=cfg.lfae.frame_shape,
    )
    n = min(args.videos, len(ds))

    jgt = jax.jit(model.pseudo_ground_truth)
    grids = []
    for i in range(n):
        item = ds[i]
        vid = jnp.asarray(item["video"])[None]
        gt = jax.device_get(jgt(lfae_vars, vid[:, 0], vid))
        g = np.asarray(gt["vid_grid"], np.float32)
        b, f, gh, gw, _ = g.shape
        grids.append(g.reshape(b * f, gh, gw, 2))
        print(f"gt flows {i + 1}/{n}", flush=True)
    g32 = np.concatenate(grids, 0)

    report = {}
    s = cfg.lfae.frame_shape
    d = cfg.lfae.generator.num_down_blocks
    for res in [s // (2 ** (d - i)) for i in range(d + 1)]:
        if res <= 32:
            continue
        gr = np.asarray(jax.jit(
            lambda g, r=res: resize_bilinear(g, (r, r))
        )(jnp.asarray(g32)))
        gr5 = jnp.asarray(gr).reshape(n, -1, res, res, 2)
        row = {}
        for cand in [(16, 16), (8, 16), (16, 8)]:
            y_req, x_req = (np.asarray(v) for v in jax.jit(
                tile_window_requirements, static_argnames="tile"
            )(gr5, tile=cand))
            row[f"{cand[0]}x{cand[1]}"] = {
                "y_p99": float(np.percentile(y_req, 99)),
                "y_p100": float(y_req.max()),
                "x_p99": float(np.percentile(x_req, 99)),
                "x_p100": float(x_req.max()),
            }
        report[str(res)] = row
        print(json.dumps({res: row}), flush=True)
    print(json.dumps({"gt_flow_requirements": report, "videos": n}))


if __name__ == "__main__":
    main()
