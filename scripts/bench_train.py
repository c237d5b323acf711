"""Training-step throughput benchmark (compute-only, synthetic batch).

Measures the jitted DM train step (pseudo-GT + UNet fwd/bwd + Adam) and
the LFAE train step at the reference batch sizes on the real chip, with
true completion syncs. Prints one JSON line per stage. The reference
prints comparable per-step wall-clock at run time
(DM/train_video_flow_diffusion_mug.py:228-233); BASELINE.md records the
measured history.

Usage: python scripts/bench_train.py [--stage dm|lfae|both] [--attn-impl ...]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

V5E_PEAK_TFLOPS = 197.0  # bf16 dense
V5E_HBM_GBPS = 819.0


def _cost(compiled) -> tuple[float, float]:
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def bench_dm(
    attn_impl: str, trace_dir: str | None = None,
    lfae_dtype: str = "float32",
) -> None:
    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.train.dm_trainer import DMTrainer
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    cfg = mug_config()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, temporal_attn_impl=attn_impl
        ),
        lfae=dataclasses.replace(cfg.lfae, compute_dtype=lfae_dtype),
    )
    bs = cfg.dm_train.batch_size  # reference MUG: 5
    size = cfg.lfae.frame_shape
    f = cfg.diffusion.num_frames
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
    trainer = DMTrainer(cfg, steps_per_epoch=93, lfae_vars=lfae_vars)
    trainer.place_lfae()
    state = trainer.init_state(jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(2)
    batch = {
        "ref_img": jax.random.uniform(k, (bs, size, size, 3)),
        "real_vid": jax.random.uniform(k, (bs, f, size, size, 3)),
        "cond": jax.random.normal(k, (bs, cfg.diffusion.cond_dim)),
        "none_cond_mask": jnp.zeros((bs,), bool),
    }

    # roofline accounting (VERDICT r2 #6): XLA cost analysis of the
    # compiled step — same method as bench.py's serving MFU
    from cvpr23_lfdm_tpu.parallel.mesh import shard_batch

    sb = shard_batch(batch, trainer.mesh)
    import time as _time

    t0 = _time.perf_counter()
    print(f"[dm] compiling train step (bs={bs}, attn={attn_impl})...",
          flush=True)
    compiled = trainer._train_step.lower(
        state, trainer.lfae_vars, k, sb, with_monitoring=False
    ).compile()
    print(f"[dm] compile {_time.perf_counter() - t0:.1f}s", flush=True)
    flops, nbytes = _cost(compiled)

    carry = {"state": state}

    def step(rng):
        # thread the state: the jitted step donates its input buffers
        s2, metrics = trainer.train_step(carry["state"], rng, batch)
        carry["state"] = s2
        return metrics["loss"]

    t = time_fn(step, k, iters=6, warmup=2)
    sec = t["median_s"]
    if trace_dir:
        # per-op device breakdown (profile_sampler.py's parser)
        from cvpr23_lfdm_tpu.utils.profiling import trace

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_sampler import group_name, parse_xplane

        with trace(trace_dir):
            for _ in range(3):
                step(k)
        ops = parse_xplane(trace_dir)
        import collections

        groups = collections.defaultdict(float)
        for name, (ms, _) in ops.items():
            groups[group_name(name)] += ms
        print("--- groups (ms/step) ---")
        for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
            print(f"  {ms / 3:8.2f}  {g}")
        print("--- top 40 ops (ms/step) ---")
        for name, (ms, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[:40]:
            print(f"  {ms / 3:8.3f}  x{cnt // 3:<4d} {name[:140]}")
    print(
        json.dumps(
            {
                "metric": "dm_train_step_seconds",
                "value": round(sec, 4),
                "batch_size": bs,
                "frames": f,
                "attn_impl": attn_impl,
                "lfae_dtype": lfae_dtype,
                "step_tflop": round(flops / 1e12, 4),
                "achieved_tflops": round(flops / sec / 1e12, 2),
                "mfu": round(flops / sec / 1e12 / V5E_PEAK_TFLOPS, 4),
                "hbm_gb": round(nbytes / 1e9, 2),
                "hbm_util": round(nbytes / sec / 1e9 / V5E_HBM_GBPS, 3),
            }
        )
    )


def bench_lfae() -> None:
    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.train.lfae_trainer import LFAETrainer
    from cvpr23_lfdm_tpu.utils.profiling import time_fn

    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features

    cfg = mug_config()
    bs = 8  # fits one chip; reference uses 100 over 8 GPUs
    size = cfg.lfae.frame_shape
    vgg_vars = jax.jit(
        lambda r: Vgg19Features().init(r, jnp.zeros((1, size, size, 3)))
    )(jax.random.PRNGKey(2))
    trainer = LFAETrainer(cfg, steps_per_epoch=93, vgg_vars=vgg_vars)
    state = trainer.init_state(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    batch = {
        "source": jax.random.uniform(k, (bs, size, size, 3)),
        "driving": jax.random.uniform(k, (bs, size, size, 3)),
    }

    from cvpr23_lfdm_tpu.parallel.mesh import shard_batch

    sb = shard_batch(batch, trainer.mesh)
    compiled = trainer._train_step.lower(state, k, sb).compile()
    flops, nbytes = _cost(compiled)

    carry = {"state": state}

    def step(rng):
        s2, metrics = trainer.train_step(carry["state"], rng, batch)
        carry["state"] = s2
        return metrics["total"]

    t = time_fn(step, k, iters=6, warmup=2)
    sec = t["median_s"]
    print(
        json.dumps(
            {
                "metric": "lfae_train_step_seconds",
                "value": round(sec, 4),
                "batch_size": bs,
                "step_tflop": round(flops / 1e12, 4),
                "achieved_tflops": round(flops / sec / 1e12, 2),
                "mfu": round(flops / sec / 1e12 / V5E_PEAK_TFLOPS, 4),
                "hbm_gb": round(nbytes / 1e9, 2),
                "hbm_util": round(nbytes / sec / 1e9 / V5E_HBM_GBPS, 3),
            }
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="dm", choices=["dm", "lfae", "both"])
    ap.add_argument("--attn-impl", default="pallas2")
    ap.add_argument("--trace", default="", help="xplane trace dir (dm stage)")
    ap.add_argument(
        "--lfae-dtype", default="float32", choices=["float32", "bfloat16"],
        help="frozen pseudo-GT LFAE compute dtype (dm stage)",
    )
    args = ap.parse_args()
    from cvpr23_lfdm_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    )
    if args.stage in ("dm", "both"):
        bench_dm(
            args.attn_impl, trace_dir=args.trace or None,
            lfae_dtype=args.lfae_dtype,
        )
    if args.stage in ("lfae", "both"):
        bench_lfae()


if __name__ == "__main__":
    main()
