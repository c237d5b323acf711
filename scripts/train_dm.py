"""Stage-2 DM training entry point.

One parameterized CLI replaces the reference's four near-duplicate ~430-line
scripts (DM/train_video_flow_diffusion_{mug,mhad,natops,mhad_multiGPU}.py).
Multi-chip is not a separate path: the jitted step shards the batch over
the data mesh on however many devices exist.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from _common import (
    apply_lfae_dtype, base_parser, load_text_embedder, resolve_attn_impl,
    resolve_data_root, setup_platform,
)


def main() -> None:
    p = base_parser("Train the flow diffusion model (stage 2)")
    p.add_argument("--lfae-ckpt", default="", help="stage-1 ckpt (orbax dir or torch .pth)")
    p.add_argument("--batch-size", type=int, default=0)
    p.add_argument("--num-steps", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save-img-freq", type=int, default=0, help="0 = preset")
    p.add_argument("--save-vid-freq", type=int, default=0, help="0 = preset")
    p.add_argument("--sample-vid-freq", type=int, default=0, help="0 = preset")
    p.add_argument(
        "--mean", type=float, nargs=3, default=(0.0, 0.0, 0.0),
        help="per-channel pixel mean, 0-255 scale (reference MEAN constant; "
        "every reference script uses (0,0,0))",
    )
    p.add_argument(
        "--objective", choices=("eps", "x0", "v"), default="eps",
        help="denoiser parameterization (eps = reference parity; x0/v "
        "converge faster on low-variance latents — sampling must use the "
        "same objective the checkpoint trained with)",
    )
    args = p.parse_args()
    setup_platform(args)

    from cvpr23_lfdm_tpu.config import PRESETS
    from cvpr23_lfdm_tpu.data import DMVideoDataset, PrefetchLoader, get_spec
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.train.dm_trainer import DMTrainer
    from cvpr23_lfdm_tpu.utils.checkpoint import (
        CheckpointManager, load_lfae_from_torch,
    )

    cfg = PRESETS[args.dataset]()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion,
            temporal_attn_impl=resolve_attn_impl(args, training=True),
            objective=args.objective,
        )
    )
    cfg = apply_lfae_dtype(cfg, args)
    tc = cfg.dm_train
    batch_size = args.batch_size or tc.batch_size
    root = resolve_data_root(args, cfg.lfae.frame_shape)
    embedder = load_text_embedder(args)

    dataset = DMVideoDataset(
        get_spec(args.dataset), root, "train",
        num_frames=cfg.diffusion.num_frames,
        image_size=cfg.lfae.frame_shape,
        sampling=tc.frame_sampling,
        mean=tuple(args.mean),
        seed=args.seed,
    )
    steps_per_epoch = max(1, len(dataset) // batch_size)
    num_steps = args.num_steps or steps_per_epoch * tc.max_epochs

    # frozen stage-1 weights
    if args.lfae_ckpt.endswith(".pth"):
        lfae_vars = load_lfae_from_torch(args.lfae_ckpt, cfg.lfae)
    elif args.lfae_ckpt:
        from cvpr23_lfdm_tpu.utils.checkpoint import CheckpointManager as CM

        lfae_ckpt = CM(args.lfae_ckpt)
        template = jax.device_get(
            init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
        )
        restored = lfae_ckpt.restore(
            {"params": template["params"], "batch_stats": template["batch_stats"]}
        )
        lfae_vars = restored
    else:
        print("warning: no --lfae-ckpt; stage-1 weights are RANDOM (smoke mode)")
        lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)

    trainer = DMTrainer(cfg, steps_per_epoch, lfae_vars)
    trainer.place_lfae()
    ckpt = CheckpointManager(os.path.join(args.log_dir, "dm_ckpt"))

    rng, init_rng = jax.random.split(jax.random.PRNGKey(args.seed))
    state = trainer.init_state(init_rng)
    start_step = 0
    if args.resume and ckpt.has_latest():
        state = ckpt.restore(jax.device_get(state))
        # reference --set-start protocol (DM train :173-181): recompute the
        # start step from the restored counter and run only the remainder
        start_step = int(jax.device_get(state.step))
        print(f"resumed at step {start_step}")

    # the DM pipeline decodes F frames per sample; decode is the bottleneck
    # (cv2 releases the GIL, so threads scale with host cores). Multi-host:
    # each process loads only its shard of the global batch.
    from cvpr23_lfdm_tpu.parallel.distributed import host_shard, is_primary

    shard_i, shard_n, _ = host_shard(batch_size)
    if args.loader == "grain":
        from cvpr23_lfdm_tpu.data.grain_loader import GrainLoader

        loader = GrainLoader(
            dataset, batch_size, num_workers=8, seed=args.seed,
            shard_index=shard_i, shard_count=shard_n,
        )
        extra = ckpt.load_extra() if start_step else None
        if extra and "grain_state" in extra:
            loader.set_state(extra["grain_state"])
    else:
        # batch stream is a pure function of (dataset, seed, batch number):
        # seeking to start_step replays exactly the straight-through stream
        loader = PrefetchLoader(
            dataset, batch_size, num_workers=16, seed=args.seed,
            start_batch=start_step, shard_index=shard_i, shard_count=shard_n,
        )

    def batches():
        for batch in loader:
            cond, none_mask = embedder(batch["text"])
            yield {
                "ref_img": batch["video"][:, 0],
                "real_vid": batch["video"],
                "cond": cond,
                "none_cond_mask": none_mask,
            }

    def checkpoint_fn(s):
        extra = {"seed": args.seed}
        if args.loader == "grain":
            extra["grain_state"] = loader.get_state()
        ckpt.save(s, step=int(jax.device_get(s.step)), extra=extra)

    from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid
    from cvpr23_lfdm_tpu.utils.viz import (
        conf2fig, dm_training_gif, flow2fig, save_gif, save_image,
        tile_grid, to_uint8,
    )

    viz_dir = os.path.join(args.log_dir, "dm_imgs")
    size = cfg.lfae.frame_shape
    id_grid = np.asarray(make_coordinate_grid((cfg.diffusion.img_size,) * 2))

    def viz_fn(cur_state, batch, step):
        """5x2 training grid (reference DM train :252-280): src/tar,
        real-out/real-warp, fake-out/fake-warp, flow/conf."""
        small = {k: v[:1] for k, v in batch.items() if hasattr(v, "ndim")}
        aux = jax.device_get(
            trainer.monitor(cur_state, jax.random.PRNGKey(step), small)
        )
        mid = cfg.diffusion.num_frames // 2
        rows = [
            [to_uint8(small["ref_img"][0]), to_uint8(small["real_vid"][0, mid])],
            [
                to_uint8(aux["out_vid"][0, mid]),
                to_uint8(aux["warped_vid"][0, mid]),
            ],
            [
                to_uint8(aux["fake_out_vid"][0, mid]),
                to_uint8(aux["fake_warped_vid"][0, mid]),
            ],
            [
                flow2fig(aux["vid_grid"][0, mid], id_grid, size),
                np.repeat(
                    conf2fig(aux["vid_conf"][0, mid], size)[..., None], 3, -1
                ),
            ],
        ]
        os.makedirs(viz_dir, exist_ok=True)
        save_image(os.path.join(viz_dir, f"step_{step:07d}.png"), tile_grid(rows))

    vid_dir = os.path.join(args.log_dir, "dm_vidshots")
    sample_dir = os.path.join(args.log_dir, "dm_samples")

    def gif_fn(cur_state, batch, step):
        """Training-batch GIF (reference :282-318): per-frame 5x2 tiles of
        src/tar, real-out/real-warp, fake(pred_x0)-out/-warp, grids, confs."""
        small = {k: v[:1] for k, v in batch.items() if hasattr(v, "ndim")}
        aux = jax.device_get(
            trainer.monitor(cur_state, jax.random.PRNGKey(step), small)
        )
        frames = dm_training_gif(
            small["ref_img"][0], small["real_vid"][0],
            aux["out_vid"][0], aux["warped_vid"][0],
            aux["fake_out_vid"][0], aux["fake_warped_vid"][0],
            aux["vid_grid"][0], aux["fake_vid_grid"][0],
            aux["vid_conf"][0], aux["fake_vid_conf"][0],
            img_size=size,
        )
        os.makedirs(vid_dir, exist_ok=True)
        name = f"B{batch_size:04d}_S{step:06d}.gif"
        save_gif(os.path.join(vid_dir, name), frames)

    def sample_fn(cur_state, batch, step):
        """Mid-training sample_one_video GIF (reference :320-360)."""
        small = {k: v[:1] for k, v in batch.items() if hasattr(v, "ndim")}
        aux = jax.device_get(
            trainer.monitor(cur_state, jax.random.PRNGKey(step), small)
        )
        out = jax.device_get(
            trainer.sample_video(
                cur_state, jax.random.PRNGKey(step + 1),
                jnp.asarray(small["ref_img"]), jnp.asarray(small["cond"]),
                cond_scale=1.0,
            )
        )
        frames = dm_training_gif(
            small["ref_img"][0], small["real_vid"][0],
            aux["out_vid"][0], aux["warped_vid"][0],
            out["out_vid"][0], out["warped_vid"][0],
            aux["vid_grid"][0], out["vid_grid"][0],
            aux["vid_conf"][0], out["vid_conf"][0],
            img_size=size,
        )
        os.makedirs(sample_dir, exist_ok=True)
        name = f"B{batch_size:04d}_S{step:06d}.gif"
        save_gif(os.path.join(sample_dir, name), frames)

    primary = is_primary()  # host-side artifacts/checkpoints: process 0 only
    state = trainer.fit(
        state, batches(), num_steps, rng,
        checkpoint_fn=checkpoint_fn if primary else None,
        checkpoint_every=tc.update_ckpt_freq,
        viz_fn=viz_fn if primary else None,
        viz_every=args.save_img_freq or tc.save_img_freq,
        gif_fn=gif_fn if primary else None,
        gif_every=args.save_vid_freq or tc.save_vid_freq,
        sample_fn=sample_fn if primary else None,
        sample_every=args.sample_vid_freq or tc.sample_vid_freq,
        start_step=start_step,
    )
    if primary:
        ckpt.save(state, step=int(jax.device_get(state.step)))
    print("done")


if __name__ == "__main__":
    main()
