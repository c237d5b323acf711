"""Full-scale serving-path kernel parity on the REAL TPU.

Runs the MUG-scale sampling pipeline twice on identical weights and an
identical injected noise sequence — once with the XLA attention einsums,
once with the full serving kernel stack (`temporal_attn_impl=pallas3`:
fused whole-layer attention + fused GroupNorm/FiLM/SiLU, plus the tiled
one-hot decode warp `warp_impl=tiled`) — and reports the decoded-video
difference. The interpret-mode unit tests
(test_attention_pallas.py) pin exact math at toy shapes; this checks the
compiled Mosaic kernel at the real shapes/precision the bench ships.

Usage: python scripts/check_kernel_parity.py [--dtype float32|bfloat16]
Exit code 1 if max |diff| exceeds the dtype tolerance.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

IMG, LAT, F = 128, 32, 40
TOL = {"float32": 5e-4, "bfloat16": 5e-2}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="float32", choices=list(TOL))
    args = ap.parse_args()

    if args.dtype == "float32":
        # TPU matmuls default to 1-pass bf16 multiplication even for f32
        # inputs; both impls then make DIFFERENT rounding errors that the
        # 10-step sampler amplifies to ~1e-2. 3-pass fp32 emulation makes
        # the comparison meaningful (and is the right knob for strict
        # reference-parity fp32 serving on TPU).
        import jax as _jax

        _jax.config.update("jax_default_matmul_precision", "highest")

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )
    base = mug_config()
    rng = np.random.RandomState(0)
    ref_img = jnp.asarray(rng.rand(1, IMG, IMG, 3), jnp.float32)
    cond = jnp.asarray(rng.randn(1, base.diffusion.cond_dim), jnp.float32)
    shape = (1, F, LAT, LAT, 3)
    init = jnp.asarray(rng.randn(*shape), jnp.float32)
    noises = jnp.asarray(rng.randn(10, *shape), jnp.float32)

    outs = {}
    for impl in ("xla", "pallas3"):
        cfg = base.replace(
            diffusion=dataclasses.replace(
                base.diffusion, sampling_timesteps=10,
                compute_dtype=args.dtype, temporal_attn_impl=impl,
            ),
            lfae=dataclasses.replace(
                base.lfae, compute_dtype=args.dtype,
                warp_impl="tiled" if impl != "xla" else "xla",
            ),
        )
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)
        k_lfae, k_unet = jax.random.split(jax.random.PRNGKey(0))
        lfae_vars = init_lfae_vars(k_lfae, cfg.lfae)
        unet_vars = model.init_unet_vars(k_unet, batch=1)
        run = jax.jit(
            lambda uv, lv, r, img, c, ini, seq, m=model: m.sample_video(
                uv, lv, r, img, c, 1.0, init_img=ini, noise_seq=seq
            )
        )
        outs[impl] = jax.device_get(
            run(
                unet_vars, lfae_vars, jax.random.PRNGKey(0),
                ref_img, cond, init, noises,
            )
        )

    ok = True
    for key in ("vid_grid", "vid_conf", "out_vid", "warped_vid"):
        d = float(np.max(np.abs(outs["xla"][key] - outs["pallas3"][key])))
        status = "ok" if d <= TOL[args.dtype] else "FAIL"
        ok &= d <= TOL[args.dtype]
        print(f"{key:12s} max|xla - pallas3| = {d:.3e}  [{status}]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
