"""LFAE self-reconstruction evaluation entry point.

Replaces LFAE/test_flowautoenc_{mug,mhad,natops}.py: reconstructs held-out
videos from frame 0 and reports per-pixel L1 (`out_loss`, `warp_loss`) to
stdout + JSON (reference :208-215 normalization kept for parity).
"""

from __future__ import annotations

import os

import jax

from _common import (
    apply_lfae_dtype, base_parser, resolve_data_root, setup_platform,
)


def main() -> None:
    p = base_parser("Evaluate LFAE self-reconstruction")
    p.add_argument("--lfae-ckpt", default="", help="orbax dir or torch .pth")
    p.add_argument("--batch-size", type=int, default=10)
    p.add_argument("--num-frames", type=int, default=40)
    p.add_argument("--num-batches", type=int, default=0, help="0 = full split")
    p.add_argument("--save-video", action="store_true")
    p.add_argument("--json-path", default="")
    args = p.parse_args()
    setup_platform(args)

    from cvpr23_lfdm_tpu.config import PRESETS
    from cvpr23_lfdm_tpu.data import DMVideoDataset, get_spec
    from cvpr23_lfdm_tpu.eval import flowautoenc
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.utils.checkpoint import (
        CheckpointManager, load_lfae_from_torch,
    )

    cfg = apply_lfae_dtype(PRESETS[args.dataset](), args)
    root = resolve_data_root(args, cfg.lfae.frame_shape)

    if args.lfae_ckpt.endswith(".pth"):
        lfae_vars = load_lfae_from_torch(args.lfae_ckpt, cfg.lfae)
    elif args.lfae_ckpt:
        state = CheckpointManager(args.lfae_ckpt).restore(None)
        lfae_vars = {"params": state["params"], "batch_stats": state["batch_stats"]}
    else:
        print("warning: no --lfae-ckpt; evaluating RANDOM weights (smoke mode)")
        lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)

    # device-resident weights: host numpy args re-upload per jitted call
    lfae_vars = jax.device_put(lfae_vars)

    dataset = DMVideoDataset(
        get_spec(args.dataset), root, "test",
        num_frames=args.num_frames, image_size=cfg.lfae.frame_shape,
        color_jitter=False, sampling="uniform", seed=args.seed,
    )
    result = flowautoenc.evaluate(
        lfae_vars, cfg.lfae, dataset,
        batch_size=args.batch_size,
        num_batches=args.num_batches or None,
        save_video_dir=os.path.join(args.log_dir, "eval_videos")
        if args.save_video
        else None,
        image_size=cfg.lfae.frame_shape,
    )
    print("loss for prediction: %.5f" % result["out_loss"])
    print("loss for warping: %.5f" % result["warp_loss"])
    json_path = args.json_path or os.path.join(args.log_dir, "flowautoenc_eval.json")
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    flowautoenc.write_json(result, json_path)
    print(f"wrote {json_path}")


if __name__ == "__main__":
    main()
