"""Stage-1 LFAE training entry point.

Replaces LFAE/run_{mug,mhad,natops}.py + LFAE/train.py with one CLI over
the typed presets. Supports warm-start from a converted torch checkpoint
(--warm-start, reference run_mug.py:68-70) and crash-resume from the
rolling Orbax checkpoint.
"""

from __future__ import annotations

import os

import jax

from _common import (
    apply_lfae_dtype, base_parser, resolve_data_root, setup_platform,
)


def main() -> None:
    p = base_parser("Train the LFAE (stage 1)")
    p.add_argument("--batch-size", type=int, default=0, help="0 = preset")
    p.add_argument("--num-steps", type=int, default=0, help="0 = preset epochs")
    p.add_argument("--warm-start", default="", help="torch .pth to convert")
    p.add_argument("--vgg-weights", default="", help="torchvision vgg19 .pth")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--save-img-freq", type=int, default=0)
    args = p.parse_args()
    setup_platform(args)

    from cvpr23_lfdm_tpu.config import PRESETS
    from cvpr23_lfdm_tpu.data import (
        ClipAugment, DatasetRepeater, LFAEPairDataset, PrefetchLoader, get_spec,
    )
    from cvpr23_lfdm_tpu.train.lfae_trainer import LFAETrainer
    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features, convert_torchvision_vgg19
    from cvpr23_lfdm_tpu.utils.checkpoint import CheckpointManager, load_lfae_from_torch
    from cvpr23_lfdm_tpu.utils.viz import Visualizer, save_image

    cfg = apply_lfae_dtype(PRESETS[args.dataset](), args)
    tc = cfg.lfae_train
    batch_size = args.batch_size or tc.batch_size
    root = resolve_data_root(args, cfg.lfae.frame_shape)

    dataset = DatasetRepeater(
        LFAEPairDataset(
            get_spec(args.dataset), root, "train",
            frame_shape=cfg.lfae.frame_shape, augment=ClipAugment(),
            seed=args.seed,
        ),
        tc.num_repeats,
    )
    steps_per_epoch = max(1, len(dataset) // batch_size)
    num_steps = args.num_steps or steps_per_epoch * tc.max_epochs

    import jax.numpy as jnp

    if args.vgg_weights:
        from cvpr23_lfdm_tpu.utils.checkpoint import load_torch_state_dicts

        vgg_vars = convert_torchvision_vgg19(load_torch_state_dicts(args.vgg_weights))
    else:
        print("warning: no --vgg-weights; using random-projection perceptual features")
        vgg_vars = jax.jit(
            lambda r: Vgg19Features().init(
                r, jnp.zeros((1, cfg.lfae.frame_shape, cfg.lfae.frame_shape, 3))
            )
        )(jax.random.PRNGKey(0))

    # The reference entry constructs the AVD network alongside the stage-1
    # models even though train() never touches it (run_mug.py:133-138,
    # avd_network unused in the loss) — mirror that for surface parity so
    # its params exist in the run directory for downstream animation use.
    from cvpr23_lfdm_tpu.models.avd_network import AVDNetwork

    avd = AVDNetwork(num_regions=cfg.lfae.num_regions)
    eye = jnp.broadcast_to(jnp.eye(2), (1, cfg.lfae.num_regions, 2, 2))
    region_like = {"shift": jnp.zeros((1, cfg.lfae.num_regions, 2)), "affine": eye}
    avd_vars = jax.jit(avd.init)(
        jax.random.PRNGKey(args.seed), region_like, region_like
    )
    print(
        "avd params:",
        sum(int(x.size) for x in jax.tree_util.tree_leaves(avd_vars)),
    )

    trainer = LFAETrainer(cfg, steps_per_epoch, vgg_vars)
    ckpt = CheckpointManager(os.path.join(args.log_dir, "lfae_ckpt"))

    rng, init_rng = jax.random.split(jax.random.PRNGKey(args.seed))
    if args.warm_start:
        state = trainer.load_state(load_lfae_from_torch(args.warm_start, cfg.lfae))
    else:
        state = trainer.init_state(init_rng)
    start_step = 0
    if args.resume and ckpt.has_latest():
        state = ckpt.restore(jax.device_get(state))
        # reference resume protocol (LFAE/train.py:44-56): recompute the
        # start step from the restored counter, run only the remainder
        start_step = int(jax.device_get(state.step))
        print(f"resumed at step {start_step}")

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
        loader = PrefetchLoader(
            dataset, batch_size, num_workers=6, seed=args.seed,
            start_batch=start_step, shard_index=shard_i, shard_count=shard_n,
        )

    os.makedirs(args.log_dir, exist_ok=True)
    viz_dir = os.path.join(args.log_dir, "lfae_imgs")
    viz = Visualizer()

    def checkpoint_fn(s):
        extra = {"seed": args.seed}
        if args.loader == "grain":
            extra["grain_state"] = loader.get_state()
        ckpt.save(s, step=int(jax.device_get(s.step)), extra=extra)

    save_img_freq = args.save_img_freq or tc.save_img_freq

    def viz_fn(cur_state, batch, step):
        out = trainer.reconstruct(
            cur_state, batch["source"][:1], batch["driving"][:1]
        )
        os.makedirs(viz_dir, exist_ok=True)
        save_image(
            os.path.join(viz_dir, f"step_{step:07d}.png"),
            viz.visualize(batch["source"], batch["driving"], out),
        )

    primary = is_primary()
    state = trainer.fit(
        state, iter(loader), num_steps, rng,
        checkpoint_fn=checkpoint_fn if primary else None,
        checkpoint_every=tc.update_ckpt_freq,
        viz_fn=viz_fn if primary else None, viz_every=save_img_freq,
        start_step=start_step,
    )
    if primary:
        ckpt.save(state, step=int(jax.device_get(state.step)))
    print("done")


if __name__ == "__main__":
    main()
