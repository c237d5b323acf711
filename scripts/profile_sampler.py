"""Per-op device-time breakdown of the headline sampling graph.

Compiles the exact bench.py serving graph (DDIM-10, bf16, pallas3
attention), captures a device trace over a few executions, parses the
xplane proto directly (tensorflow.tsl xplane_pb2; the axon tunnel
supports device tracing), and prints the top op groups by total device
time for B=1 and B=8. This is the round-3 optimization compass.

Usage: python scripts/profile_sampler.py [--batch 1 8] [--out /tmp/prof]
"""

from __future__ import annotations

import argparse
import collections
import dataclasses
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(log_dir: str) -> dict[str, tuple[float, int]]:
    """Sum device-event durations per HLO op name.

    Returns {name: (total_ms, count)} from the device xplane (TPU lines),
    ignoring async copy markers which overlap real compute.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {log_dir}")
    path = max(paths, key=os.path.getmtime)
    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())

    out: dict[str, list[float]] = collections.defaultdict(lambda: [0.0, 0])
    for plane in space.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, "?")
                if name.startswith("%copy-start") or name.startswith("%copy-done"):
                    continue
                ms = ev.duration_ps / 1e9
                rec = out[name]
                rec[0] += ms
                rec[1] += 1
    return {k: (v[0], v[1]) for k, v in out.items()}


GROUP_RULES = [
    ("temporal_attn_kernel", r"headpacked|packed_temporal|custom-call.*attention"),
    ("warp_onehot_kernel", r"warp_onehot|one_hot_warp"),
    ("warp_gather_kernel", r"warp_gather"),
    ("gather", r"gather"),
    ("scatter", r"scatter"),
    ("conv", r"convolution|conv_general"),
    ("matmul", r"dot|einsum"),
    ("reduce", r"reduce"),
    ("fusion_other", r"fusion"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("while/scan", r"while"),
]


def group_name(name: str) -> str:
    for g, pat in GROUP_RULES:
        if re.search(pat, name):
            return g
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1, 8])
    ap.add_argument("--out", default="/tmp/prof_sampler")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.utils.profiling import trace

    # NOTE: no enable_compile_cache here — serializing the large sampler
    # executable through the axon tunnel has been observed to wedge the
    # compile for tens of minutes
    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars

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

    # trained-regime weights when available (same pickup as bench.py):
    # the tiled decode warp's fit check takes the fast branch only under
    # trained-model flow statistics
    from cvpr23_lfdm_tpu.utils.bench_ckpt import apply_bench_ckpt

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    applied = apply_bench_ckpt(
        os.path.join(repo, "assets", "bench_ckpt"), cfg, unet_vars, lfae_vars
    )
    weights = "random"
    cond_row = None
    ref_row = None
    if applied is not None:
        # device-resident weights + checkpoint-matched cfg (objective,
        # measured warp windows, per-scale impl cap): the trace must
        # profile the exact shipped serving graph
        cfg, unet_vars, lfae_vars, cond_row, ref_row, _meta = applied
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)
        weights = "trained-synthetic"
    print(f"weights: {weights} warp_tiled_max_res: "
          f"{cfg.lfae.warp_tiled_max_res}", flush=True)

    def sample(unet_vars, lfae_vars, rng, ref_img, cond):
        out = model.sample_video(unet_vars, lfae_vars, rng, ref_img, cond, cond_scale=1.0)
        return out["out_vid"].mean()

    for bb in args.batch:
        ref_img = jax.random.uniform(k_img, (bb, 128, 128, 3), jnp.float32)
        cond = jax.random.normal(k_cond, (bb, cfg.diffusion.cond_dim), jnp.float32)
        if cond_row is not None:  # [1, D] from apply_bench_ckpt
            cond = jnp.broadcast_to(cond_row, cond.shape)
        if ref_row is not None:  # [1, H, W, 3]
            ref_img = jnp.broadcast_to(ref_row, ref_img.shape)
        t0 = time.perf_counter()
        compiled = jax.jit(sample).lower(unet_vars, lfae_vars, k_s, ref_img, cond).compile()
        print(f"[B={bb}] compile {time.perf_counter() - t0:.1f}s", flush=True)

        def run():
            return float(jax.device_get(compiled(unet_vars, lfae_vars, k_s, ref_img, cond)))

        run(); run()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            run()
        wall_ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"[B={bb}] wall/exec {wall_ms:.1f} ms -> {bb * 40 / wall_ms * 1e3:.0f} f/s", flush=True)

        log_dir = f"{args.out}_b{bb}"
        with trace(log_dir):
            for _ in range(args.iters):
                run()

        ops = parse_xplane(log_dir)
        total = sum(ms for ms, _ in ops.values())
        groups = collections.defaultdict(float)
        for name, (ms, _) in ops.items():
            groups[group_name(name)] += ms
        print(f"\n===== B={bb}: device total {total / args.iters:.1f} ms/exec "
              f"(wall {wall_ms:.1f}) =====")
        print("--- groups (ms/exec) ---")
        for g, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
            print(f"  {ms / args.iters:8.2f}  {g}")
        print(f"--- top {args.top} ops (ms/exec, count/exec) ---")
        for name, (ms, cnt) in sorted(ops.items(), key=lambda kv: -kv[1][0])[: args.top]:
            print(f"  {ms / args.iters:8.3f}  x{cnt // args.iters:<5d} {name[:140]}")
        with open(f"{args.out}_b{bb}.json", "w") as f:
            json.dump({k: v for k, v in sorted(ops.items(), key=lambda kv: -kv[1][0])}, f, indent=1)
        print(flush=True)


if __name__ == "__main__":
    main()
