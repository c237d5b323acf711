"""Demo / sampling entry point — the serving path.

Replaces demo/demo_{mug,mhad,natops}.py: given one reference image, sample
a 40-frame video for every class text and write GIFs (ref demo_mug.py:107-146:
out video, warped video, flow lattice, confidence tiles).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from _common import (
    apply_lfae_dtype, base_parser, load_text_embedder, resolve_attn_impl,
    resolve_warp_impl, setup_platform,
)


def main() -> None:
    p = base_parser("Sample videos from a reference image (demo)")
    p.add_argument("--ref-image", default="", help="path to reference image")
    p.add_argument("--lfae-ckpt", default="")
    p.add_argument("--dm-ckpt", default="")
    p.add_argument("--cond-scale", type=float, default=1.0)
    p.add_argument("--sampling-steps", type=int, default=10, help="DDIM steps")
    p.add_argument("--classes", nargs="*", default=None, help="subset of class texts")
    p.add_argument(
        "--mean", type=float, nargs=3, default=(0.0, 0.0, 0.0),
        help="per-channel pixel mean subtracted from the ref image, 0-255 "
        "scale (demo_mug.py:116: ref_img - MEAN, MEAN=(0,0,0))",
    )
    args = p.parse_args()
    setup_platform(args)

    import dataclasses

    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import PRESETS
    from cvpr23_lfdm_tpu.data.io import pad_resize, read_image
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid
    from cvpr23_lfdm_tpu.utils.checkpoint import (
        CheckpointManager, load_lfae_from_torch, load_unet_from_torch,
    )
    from cvpr23_lfdm_tpu.utils.viz import conf2fig, flow2fig, save_gif, to_uint8

    cfg = PRESETS[args.dataset]()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, sampling_timesteps=args.sampling_steps,
            temporal_attn_impl=resolve_attn_impl(args),
        ),
        lfae=dataclasses.replace(cfg.lfae, warp_impl=resolve_warp_impl(args)),
    )
    cfg = apply_lfae_dtype(cfg, args)
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    size = cfg.lfae.frame_shape

    # smoke mode (no checkpoints given): prefer the committed trained-regime
    # bench checkpoint (assets/bench_ckpt, MUG config) over random weights,
    # and accept the deterministic random class-text table — conditioning
    # parity with the reference is meaningless without reference weights.
    smoke = not (args.lfae_ckpt or args.dm_ckpt)
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "bench_ckpt",
    )
    use_bench_ckpt = smoke and args.dataset == "mug" and os.path.isdir(bench_dir)
    if smoke:
        args.allow_random_text = True

    if args.lfae_ckpt.endswith(".pth"):
        lfae_vars = load_lfae_from_torch(args.lfae_ckpt, cfg.lfae)
    elif args.lfae_ckpt:
        state = CheckpointManager(args.lfae_ckpt).restore(None)
        lfae_vars = {"params": state["params"], "batch_stats": state["batch_stats"]}
    else:
        lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
        if not use_bench_ckpt:
            print("warning: no --lfae-ckpt; RANDOM stage-1 weights (smoke mode)")

    if args.dm_ckpt.endswith(".pth"):
        unet_vars = load_unet_from_torch(args.dm_ckpt, cfg.diffusion.use_deconv)
    elif args.dm_ckpt:
        state = CheckpointManager(args.dm_ckpt).restore(None)
        unet_vars = state["unet_vars"]
    else:
        unet_vars = model.init_unet_vars(jax.random.PRNGKey(1))
        if not use_bench_ckpt:
            print("warning: no --dm-ckpt; RANDOM UNet weights (smoke mode)")

    if use_bench_ckpt:
        from cvpr23_lfdm_tpu.ops.warp_pallas import configure_windows_from_meta
        from cvpr23_lfdm_tpu.utils.bench_ckpt import load_bench_ckpt

        loaded = load_bench_ckpt(bench_dir, unet_vars, lfae_vars)
        if loaded is not None:
            unet_vars, lfae_vars = loaded.unet_vars, loaded.lfae_vars
            configure_windows_from_meta(loaded.meta)
            rebuild = loaded.meta["objective"] != cfg.diffusion.objective
            if loaded.meta.get("tiled_max_res") is not None:
                cfg = cfg.replace(lfae=dataclasses.replace(
                    cfg.lfae,
                    warp_tiled_max_res=int(loaded.meta["tiled_max_res"]),
                ))
                rebuild = True
            if rebuild:
                cfg = cfg.replace(diffusion=dataclasses.replace(
                    cfg.diffusion, objective=loaded.meta["objective"]))
                model = FlowDiffusion(cfg.lfae, cfg.diffusion)
            print(f"smoke mode: trained-synthetic weights from {bench_dir}")

    # device-resident weights: host numpy args would re-upload the whole
    # model over the tunnel on EVERY jitted serving call (BENCH_r04's 40x)
    lfae_vars = jax.device_put(lfae_vars)
    unet_vars = jax.device_put(unet_vars)

    if not args.ref_image:
        # bundled example (the reference ships demo/mug_examples/*.png and
        # runs argument-free, demo_mug.py:110-146)
        from cvpr23_lfdm_tpu.parallel.serving import demo_asset_path

        bundled = demo_asset_path(args.dataset)
        if os.path.exists(bundled):
            args.ref_image = bundled
            print(f"using bundled example image {bundled}")
    if args.ref_image:
        img = pad_resize(read_image(args.ref_image), size).astype(np.float32) / 255.0
        img = img - np.asarray(args.mean, np.float32) / 255.0
    else:
        print("warning: no --ref-image; using a synthetic blob frame")
        from cvpr23_lfdm_tpu.data.synthetic import _blob_video

        img = (
            _blob_video(np.random.default_rng(0), 1, size, (0.9, 0.6, 0.4))[0]
            .astype(np.float32)
            / 255.0
        )
    ref_img = jnp.asarray(img)[None]

    embedder = load_text_embedder(args)
    classes = args.classes or list(embedder.classes)

    out_dir = os.path.join(args.log_dir, "demo")
    os.makedirs(out_dir, exist_ok=True)
    h = cfg.diffusion.img_size
    id_grid = np.asarray(make_coordinate_grid((h, h)))

    def write_gif(text: str, out, bi: int) -> None:
        frames = []
        for fi in range(out["out_vid"].shape[1]):
            row = np.concatenate(
                [
                    to_uint8(img),
                    to_uint8(out["out_vid"][bi, fi]),
                    to_uint8(out["warped_vid"][bi, fi]),
                    flow2fig(out["vid_grid"][bi, fi], id_grid, size),
                    np.repeat(
                        conf2fig(out["vid_conf"][bi, fi], size)[..., None], 3, -1
                    ),
                ],
                axis=1,
            )
            frames.append(row)
        name = text.replace(" ", "_").replace("(", "").replace(")", "")
        save_gif(os.path.join(out_dir, f"{name}.gif"), np.stack(frames))
        print(f"sampled {text!r} -> {out_dir}/{name}.gif")

    rng = jax.random.PRNGKey(args.seed)
    if args.mesh:
        # multi-chip serving: ALL classes in one dispatch, the request batch
        # sharded over the data mesh (parallel/serving.py; the reference's
        # multiGPU path never sharded sampling, ..._mhad_multiGPU.py:357)
        from cvpr23_lfdm_tpu.parallel.serving import (
            sample_video_sharded, serving_mesh,
        )

        mesh = serving_mesh(args.mesh)
        conds, _ = embedder(classes)
        refs = jnp.broadcast_to(ref_img, (len(classes),) + ref_img.shape[1:])
        out = jax.device_get(
            sample_video_sharded(
                model, mesh, unet_vars, lfae_vars, rng, refs,
                jnp.asarray(conds), args.cond_scale,
            )
        )
        print(f"sampled {len(classes)} classes on mesh {args.mesh}")
        for bi, text in enumerate(classes):
            write_gif(text, out, bi)
        return

    @jax.jit
    def sample(unet_vars, lfae_vars, rng, ref_img, cond):
        return model.sample_video(
            unet_vars, lfae_vars, rng, ref_img, cond, args.cond_scale
        )

    for text in classes:
        cond, _ = embedder([text])
        rng, srng = jax.random.split(rng)
        out = jax.device_get(sample(unet_vars, lfae_vars, srng, ref_img, jnp.asarray(cond)))
        write_gif(text, out, 0)


if __name__ == "__main__":
    main()
