"""DM held-out evaluation entry point.

Replaces DM/test_video_flow_diffusion_{mug,mhad,natops}.py: for held-out
subjects, run the pseudo-GT forward (reconstruction monitoring losses) and
conditional sampling; write per-video GIFs (real/out/warp/sampled tiles).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from _common import (
    apply_lfae_dtype, base_parser, load_text_embedder, resolve_attn_impl,
    resolve_data_root, resolve_warp_impl, setup_platform,
)


def main() -> None:
    p = base_parser("Evaluate the flow diffusion model on held-out subjects")
    p.add_argument("--lfae-ckpt", default="")
    p.add_argument("--dm-ckpt", default="")
    p.add_argument(
        "--bench-ckpt", default="",
        help="assets/bench_ckpt-style directory (scripts/make_bench_ckpt.py): "
        "loads the trained UNet + LFAE generator subtree, matches the "
        "sampler objective and the measured tiled-warp config to the "
        "checkpoint meta. Overrides --lfae-ckpt/--dm-ckpt",
    )
    p.add_argument("--cond-scale", type=float, default=1.0)
    p.add_argument(
        "--sampling-steps", type=int, default=0,
        help="0 = reference per-dataset default: DDIM 10 for MUG/MHAD "
        "(test_video_flow_diffusion_mug.py:28-33), 200 for NATOPS "
        "(test_..._natops.py:25)",
    )
    p.add_argument("--num-videos", type=int, default=4)
    p.add_argument("--save-video", action="store_true")
    p.add_argument(
        "--i3d-weights", default="",
        help="pytorch_i3d rgb_imagenet.pt for published-scale FVD "
        "(eval/i3d.py); omitted = FVD skipped",
    )
    p.add_argument(
        "--lpips-weights", default="",
        help="official LPIPS checkpoint dir or .pth with vgg16 features + "
        "lin weights (eval/lpips.py); omitted = LPIPS skipped",
    )
    p.add_argument(
        "--random-metric-weights", action="store_true",
        help="run the FULL metric protocol (FVD/cFVD/sFVD + LPIPS) with "
        "SEEDED RANDOM extractor weights: exercises the published-scale "
        "pipeline end-to-end when the official I3D/LPIPS files are absent. "
        "Values are reproducible but NOT comparable to published numbers",
    )
    p.add_argument(
        "--mean", type=float, nargs=3, default=(0.0, 0.0, 0.0),
        help="per-channel pixel mean, 0-255 scale (reference MEAN constant; "
        "every reference script uses (0,0,0))",
    )
    p.add_argument(
        "--objective", choices=("eps", "x0", "v"), default="eps",
        help="denoiser parameterization — must match what --dm-ckpt was "
        "trained with (train_dm.py --objective)",
    )
    args = p.parse_args()
    setup_platform(args)

    import dataclasses

    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import PRESETS
    from cvpr23_lfdm_tpu.data import DMVideoDataset, get_spec
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.utils.checkpoint import (
        CheckpointManager, load_lfae_from_torch, load_unet_from_torch,
    )
    from cvpr23_lfdm_tpu.utils.viz import save_gif, to_uint8

    cfg = PRESETS[args.dataset]()
    steps = args.sampling_steps or (200 if args.dataset == "natops" else 10)
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, sampling_timesteps=steps,
            temporal_attn_impl=resolve_attn_impl(args),
            objective=args.objective,
        ),
        lfae=dataclasses.replace(cfg.lfae, warp_impl=resolve_warp_impl(args)),
    )
    cfg = apply_lfae_dtype(cfg, args)
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    root = resolve_data_root(args, cfg.lfae.frame_shape)

    if args.lfae_ckpt.endswith(".pth"):
        lfae_vars = load_lfae_from_torch(args.lfae_ckpt, cfg.lfae)
    elif args.lfae_ckpt:
        state = CheckpointManager(args.lfae_ckpt).restore(None)
        lfae_vars = {"params": state["params"], "batch_stats": state["batch_stats"]}
    else:
        print("warning: no --lfae-ckpt; RANDOM stage-1 weights (smoke mode)")
        lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)

    if args.dm_ckpt.endswith(".pth"):
        unet_vars = load_unet_from_torch(args.dm_ckpt, cfg.diffusion.use_deconv)
    elif args.dm_ckpt:
        state = CheckpointManager(args.dm_ckpt).restore(None)
        unet_vars = state["unet_vars"]
    else:
        print("warning: no --dm-ckpt; RANDOM UNet weights (smoke mode)")
        unet_vars = model.init_unet_vars(jax.random.PRNGKey(1))

    if args.bench_ckpt:
        from cvpr23_lfdm_tpu.utils.bench_ckpt import apply_bench_ckpt

        applied = apply_bench_ckpt(args.bench_ckpt, cfg, unet_vars, lfae_vars)
        if applied is None:
            raise SystemExit(f"--bench-ckpt {args.bench_ckpt}: not a "
                             "complete bench checkpoint directory")
        cfg, unet_vars, lfae_vars, _cond, _ref, meta = applied
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)
        print(f"bench checkpoint loaded (objective {meta['objective']}, "
              f"tiled_max_res {meta.get('tiled_max_res')})")

    # device-resident weights: host numpy args would re-upload the whole
    # model over the tunnel on EVERY jitted eval call (BENCH_r04's 40x)
    lfae_vars = jax.device_put(lfae_vars)
    unet_vars = jax.device_put(unet_vars)

    embedder = load_text_embedder(args)
    dataset = DMVideoDataset(
        get_spec(args.dataset), root, "test", combos=True,
        num_frames=cfg.diffusion.num_frames, image_size=cfg.lfae.frame_shape,
        color_jitter=False, sampling="uniform", mean=tuple(args.mean),
        seed=args.seed,
    )

    @jax.jit
    def forward(unet_vars, lfae_vars, rng, ref, vid, cond):
        return model.loss(unet_vars, lfae_vars, rng, ref, vid, cond)

    @jax.jit
    def sample(unet_vars, lfae_vars, rng, ref, cond):
        return model.sample_video(
            unet_vars, lfae_vars, rng, ref, cond, args.cond_scale
        )

    from cvpr23_lfdm_tpu.eval.metrics import psnr, ssim

    # published-scale quality metrics, enabled by their weight files
    fvd_extract = lpips_fn = None
    if args.i3d_weights or args.lpips_weights:
        # flat module state dicts (not the reference's nested ckpt layout)
        import torch

        def load_flat(path):
            return torch.load(path, map_location="cpu", weights_only=False)

    if args.i3d_weights:
        from cvpr23_lfdm_tpu.eval.i3d import convert_i3d_checkpoint, i3d_extractor

        fvd_extract = i3d_extractor(
            convert_i3d_checkpoint(load_flat(args.i3d_weights))
        )
    if args.lpips_weights:
        from cvpr23_lfdm_tpu.eval.lpips import (
            convert_lpips_lin, convert_vgg16_features, make_lpips,
        )

        lp = args.lpips_weights
        if os.path.isdir(lp):
            feat_sd = load_flat(os.path.join(lp, "vgg16_features.pth"))
            lin_sd = load_flat(os.path.join(lp, "lpips_vgg_lin.pth"))
        else:  # one file holding {"features": ..., "lin": ...}
            both = load_flat(lp)
            feat_sd, lin_sd = both["features"], both["lin"]
        lpips_fn = make_lpips(
            convert_vgg16_features(feat_sd), convert_lpips_lin(lin_sd)
        )
    if args.random_metric_weights:
        if fvd_extract is None:
            from cvpr23_lfdm_tpu.eval.i3d import i3d_extractor, random_i3d_vars

            fvd_extract = i3d_extractor(
                random_i3d_vars(jax.random.PRNGKey(1234))
            )
        if lpips_fn is None:
            from cvpr23_lfdm_tpu.eval.lpips import random_lpips_for_testing

            lpips_fn = random_lpips_for_testing(jax.random.PRNGKey(1235))
        print(
            "metric extractors: SEEDED RANDOM weights (protocol smoke; "
            "values reproducible, NOT comparable to published numbers)"
        )

    out_dir = os.path.join(args.log_dir, "dm_test")
    os.makedirs(out_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    rec_losses, warp_losses, psnrs, ssims = [], [], [], []
    lpips_vals, real_set, fake_set = [], [], []
    classes, subjects = [], []  # grouping keys for cFVD / sFVD
    fit_counts: dict[str, int] = {}  # tiled-warp branch taken, per scale
    report_fits = resolve_warp_impl(args) == "tiled"
    # one jit wrapper for the whole loop (a fresh jax.jit per video would
    # recompile each iteration — remote compiles are seconds each)
    fit_fn = jax.jit(model.decode_fit_flags) if report_fits else None
    n = min(args.num_videos, len(dataset))

    sharded_out = None
    if args.mesh:
        # multi-chip serving: sample ALL eval videos in one dispatch with
        # the request batch sharded over the data mesh (parallel/serving.py)
        from cvpr23_lfdm_tpu.parallel.serving import (
            sample_video_sharded, serving_mesh,
        )

        mesh = serving_mesh(args.mesh)
        items = [dataset[i] for i in range(n)]
        refs = jnp.stack([jnp.asarray(it["video"][0]) for it in items])
        conds = jnp.stack(
            [jnp.asarray(embedder([it["text"]])[0][0]) for it in items]
        )
        rng, ks = jax.random.split(rng)
        sharded_out = jax.device_get(
            sample_video_sharded(
                model, mesh, unet_vars, lfae_vars, ks, refs, conds,
                args.cond_scale,
            )
        )
        print(f"sampled {n} videos on mesh {args.mesh}")

    for i in range(n):
        item = dataset[i]
        vid = jnp.asarray(item["video"])[None]
        ref = vid[:, 0]
        cond, _ = embedder([item["text"]])
        cond = jnp.asarray(cond)
        rng, k1, k2 = jax.random.split(rng, 3)
        loss, aux = forward(unet_vars, lfae_vars, k1, ref, vid, cond)
        if sharded_out is not None:
            out = {k: v[i : i + 1] for k, v in sharded_out.items()}
        else:
            out = jax.device_get(sample(unet_vars, lfae_vars, k2, ref, cond))
        if report_fits:
            # which warp branch did this decode take? (generator joint fit)
            flags = jax.device_get(fit_fn(jnp.asarray(out["vid_grid"])))
            for k, v in flags.items():
                fit_counts[k] = fit_counts.get(k, 0) + int(v)
        rec_losses.append(float(aux["rec_loss"]))
        warp_losses.append(float(aux["rec_warp_loss"]))
        psnrs.append(float(psnr(vid, jnp.asarray(out["out_vid"]))))
        ssims.append(float(ssim(vid, jnp.asarray(out["out_vid"]))))
        if lpips_fn is not None:
            # frame-wise LPIPS averaged over the video (published protocol)
            lpips_vals.append(
                float(jnp.mean(lpips_fn(vid[0], jnp.asarray(out["out_vid"][0]))))
            )
        if fvd_extract is not None:
            real_set.append(np.asarray(item["video"]))
            fake_set.append(np.asarray(out["out_vid"][0]))
            classes.append(item["text"])
            subjects.append(item["subject"])
        print(
            f"[{i + 1}/{n}] {item['name']}: loss {float(loss):.4f} "
            f"rec {rec_losses[-1]:.4f} warp {warp_losses[-1]:.4f} "
            f"psnr {psnrs[-1]:.2f} ssim {ssims[-1]:.3f}"
        )
        if args.save_video:
            real = np.asarray(item["video"])
            fake = out["out_vid"][0]
            rows = np.concatenate(
                [to_uint8(real), to_uint8(fake)], axis=2
            )  # [F, H, 2W, 3]
            save_gif(os.path.join(out_dir, f"{item['name']}.gif"), rows)
    line = (
        f"mean rec {np.mean(rec_losses):.4f} mean warp {np.mean(warp_losses):.4f} "
        f"mean psnr {np.mean(psnrs):.2f} mean ssim {np.mean(ssims):.3f}"
    )
    if lpips_vals:
        line += f" mean lpips {np.mean(lpips_vals):.4f}"
    if fvd_extract is not None and real_set:
        from cvpr23_lfdm_tpu.eval.metrics import FVD

        fvd = FVD(fvd_extract)
        real_arr, fake_arr = np.stack(real_set), np.stack(fake_set)
        # %.4g: random-extractor smoke values are tiny (deep random I3D
        # logits are near-constant) — fixed-point %.2f rounds them to 0.00
        line += f" fvd {float(fvd(real_arr, fake_arr)):.4g}"
        # the paper's conditional variants (arXiv:2303.13744): FVD within
        # each class (cFVD) / each subject (sFVD), averaged over conditions
        cfvd, _ = fvd.grouped(real_arr, fake_arr, classes, classes)
        sfvd, _ = fvd.grouped(real_arr, fake_arr, subjects, subjects)
        line += f" cfvd {cfvd:.4g} sfvd {sfvd:.4g}"
    if report_fits:
        line += (
            " tiled_fit "
            + "/".join(f"{k}:{v}of{n}" for k, v in sorted(fit_counts.items()))
        )
    print(line)


if __name__ == "__main__":
    main()
