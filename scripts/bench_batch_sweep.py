"""Serving batch-size sweep: per-call and pipelined fps for B in a list.

Settles the round-3 open question "does batching ever beat pipelined
B=1 on one chip?" (VERDICT round 3, item 5). Runs the exact bench.py
serving graph (DDIM-10, bf16, pallas3 attention, tiled warp, trained
bench_ckpt weights when present) at each batch size and reports

  * per-call fps  — one dispatch, full device_get sync per call
  * pipelined fps — K dispatches enqueued back-to-back, one sync:
    amortizes the ~30 ms axon-tunnel RTT exactly like sequential
    production serving does.

Prints one JSON line per batch size plus a final summary line naming
the winner. Results are recorded in BASELINE.md (round-4 sweep table);
bench.py's headline reports the winning configuration.

Usage: python scripts/bench_batch_sweep.py [--batches 1 2 4 8 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_FRAMES = 40


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8, 16])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--pipe-depth", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.utils.bench_ckpt import apply_bench_ckpt

    cfg = mug_config()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, sampling_timesteps=10, temporal_attn_impl="pallas3"
        ),
        lfae=dataclasses.replace(
            cfg.lfae, compute_dtype="bfloat16", warp_impl="tiled"
        ),
    )
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)

    k_lfae, k_unet, k_img, k_cond, k_s = jax.random.split(jax.random.PRNGKey(0), 5)
    lfae_vars = init_lfae_vars(k_lfae, cfg.lfae)
    unet_vars = model.init_unet_vars(k_unet, batch=1)
    ref1 = jax.random.uniform(k_img, (1, 128, 128, 3), jnp.float32)
    cond1 = jax.random.normal(k_cond, (1, cfg.diffusion.cond_dim), jnp.float32)

    weights = "random"
    applied = apply_bench_ckpt(
        os.path.join(REPO, "assets", "bench_ckpt"), cfg, unet_vars, lfae_vars
    )
    if applied is not None:
        # device-resident weights + checkpoint-matched cfg (objective,
        # measured warp windows, per-scale impl cap) — like bench.py
        cfg, unet_vars, lfae_vars, cond1, ref, _meta = applied
        if ref is not None:
            ref1 = ref
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)
        weights = "trained-synthetic"
    print(f"weights: {weights}", flush=True)

    def sample(uv, lv, rng, ref, cond):
        out = model.sample_video(uv, lv, rng, ref, cond, cond_scale=1.0)
        return out["out_vid"].mean()

    results = {}
    for bb in args.batches:
        ref = jnp.broadcast_to(ref1, (bb,) + ref1.shape[1:])
        cond = jnp.broadcast_to(cond1, (bb,) + cond1.shape[1:])
        t0 = time.perf_counter()
        compiled = (
            jax.jit(sample).lower(unet_vars, lfae_vars, k_s, ref, cond).compile()
        )
        print(f"[B={bb}] compile {time.perf_counter() - t0:.1f}s", flush=True)

        def run():
            return float(
                jax.device_get(compiled(unet_vars, lfae_vars, k_s, ref, cond))
            )

        run(); run()
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        percall = bb * NUM_FRAMES / ts[len(ts) // 2]

        # pipelined: enqueue K, sync once
        run()
        t0 = time.perf_counter()
        outs = [
            compiled(unet_vars, lfae_vars, k_s, ref, cond)
            for _ in range(args.pipe_depth)
        ]
        for o in outs:
            float(jax.device_get(o))
        piped = args.pipe_depth * bb * NUM_FRAMES / (time.perf_counter() - t0)

        results[bb] = {"percall_fps": round(percall, 1), "pipelined_fps": round(piped, 1)}
        print(json.dumps({"batch": bb, "weights": weights, **results[bb]}), flush=True)

    best = max(
        ((b, mode, r[mode]) for b, r in results.items()
         for mode in ("percall_fps", "pipelined_fps")),
        key=lambda x: x[2],
    )
    print(json.dumps({
        "summary": "batch_sweep",
        "weights": weights,
        "winner": {"batch": best[0], "mode": best[1], "fps": best[2]},
        "sweep": results,
    }), flush=True)


if __name__ == "__main__":
    main()
