"""Headline benchmark: 128x128, 40-frame, DDIM-10 video sampling (MUG demo path).

Measures end-to-end serving latency of the flagship pipeline on one chip:
ref-image encoder feature -> scan-compiled DDIM sampler (10 steps, the
reference's "ddim" test config, DM/test_video_flow_diffusion_mug.py:28-33)
-> frame-batched LFAE flow decode of all 40 frames. Prints ONE JSON line;
`value` is B=1 serving latency expressed as frames/s, plus:

  * `vs_baseline` — measured fps / BASELINE_FPS. BASELINE_FPS is the
    ANALYTIC H100 estimate of the torch reference derived in BASELINE.md
    ("H100 baseline derivation"): measured kernel-launch count x
    documented eager per-op overhead, cross-checked against the measured
    eager-HBM-traffic floor. `vs_h100_ceiling` divides by the
    most-generous bound no eager implementation can beat.
  * `achieved_tflops` / `mfu` — XLA cost-analysis FLOPs of the compiled
    graph over measured wall-clock, vs the v5e bf16 peak (197 TFLOP/s).
  * `hbm_gb_per_video` / `hbm_util` — cost-analysis bytes vs 819 GB/s.
  * `batch8_frames_per_sec` — production-serving throughput at B=8,
    where per-dispatch and tunnel-RTT overheads amortize.
  * `b1_pipelined_fps` — B=1 steady-state with requests enqueued
    back-to-back (one sync at the end): the per-call ~30 ms tunnel RTT
    of `value` is a measurement artifact sequential serving never pays.
  * `b16_pipelined_fps` / `best_vs_baseline` — the round-5 batch sweep's
    winning serving configuration (B=16 pipelined, BASELINE.md table)
    and the best measured throughput relative to the H100 estimate.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

# Analytic H100 estimate of the torch reference (BASELINE.md derivation);
# CEILING is the generous no-implementation-can-beat bound.
BASELINE_FPS = 299.0
BASELINE_FPS_CEILING = 599.0
V5E_PEAK_TFLOPS = 197.0  # bf16 dense
V5E_HBM_GBPS = 819.0
NUM_FRAMES = 40
IMG_SIZE = 128
DDIM_STEPS = 10
WARMUP = 2
ITERS = 10
BATCH_THROUGHPUT = 8


# Health bands (CLAUDE.md round-4: a starved axon proxy makes every device
# call look 10-40x slower — BENCH_r04 recorded 10.68 f/s vs the real ~400s
# because pytest ran concurrently). Out-of-band runs self-label degraded.
RTT_BAND_MS = 100.0
LOAD_BAND = 1.5


def _tunnel_rtt_ms() -> float:
    """Median round-trip of a trivial jitted op, real completion sync."""
    f = jax.jit(lambda x: (x @ x).sum())
    x = jnp.ones((128, 128), jnp.float32)
    float(jax.device_get(f(x)))  # compile + warm
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(jax.device_get(f(x)))
        rtts.append(time.perf_counter() - t0)
    rtts.sort()
    return rtts[len(rtts) // 2] * 1e3


def _host_load1() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main() -> None:
    import os

    from cvpr23_lfdm_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    )
    rtt_pre = _tunnel_rtt_ms()
    load_pre = _host_load1()
    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars

    import dataclasses

    cfg = mug_config()
    cfg = cfg.replace(
        diffusion=dataclasses.replace(
            cfg.diffusion, sampling_timesteps=DDIM_STEPS,
            # head-packed Pallas kernel with matmul-segmented softmax:
            # 3.7 vs 5.4 ms/layer (B=1) and 7.9 vs 37.5 (B=8) against the
            # XLA einsum form (scripts/bench_attention.py)
            temporal_attn_impl="pallas3",
        ),
        # serving precision: bf16 conv/matmul compute, fp32 params+norms
        lfae=dataclasses.replace(
            cfg.lfae, compute_dtype="bfloat16", warp_impl="tiled"
        ),
    )
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)

    k_lfae, k_unet, k_img, k_cond, k_s = jax.random.split(jax.random.PRNGKey(0), 5)
    lfae_vars = init_lfae_vars(k_lfae, cfg.lfae)
    unet_vars = model.init_unet_vars(k_unet, batch=1)

    ref_img = jax.random.uniform(k_img, (1, IMG_SIZE, IMG_SIZE, 3), jnp.float32)
    cond = jax.random.normal(k_cond, (1, cfg.diffusion.cond_dim), jnp.float32)

    # trained-regime weights (scripts/make_bench_ckpt.py): with random
    # weights the sampled flows are noise and the tiled decode warp's fit
    # check falls back to the XLA gather — a regime no trained deployment
    # is in. When the checkpoint exists the headline measures the serving
    # graph under trained-model flow statistics (same compiled graph —
    # the fit check picks the branch at runtime).
    from cvpr23_lfdm_tpu.utils.bench_ckpt import apply_bench_ckpt

    weights = "random"
    applied = apply_bench_ckpt(
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "assets", "bench_ckpt"),
        cfg, unet_vars, lfae_vars,
    )
    if applied is not None:
        # apply_bench_ckpt returns DEVICE-RESIDENT weight trees (jitted
        # calls device_put numpy args on EVERY dispatch — host-resident
        # weights were the actual cause of BENCH_r04's 40x collapse), a
        # cfg rebuilt for the checkpoint's training objective, and the
        # checkpoint's measured tiled-warp windows / per-scale impl cap
        # already installed (configure_windows_from_meta).
        cfg, unet_vars, lfae_vars, cond, ref, _meta = applied
        if ref is not None:
            ref_img = ref
        model = FlowDiffusion(cfg.lfae, cfg.diffusion)
        weights = "trained-synthetic"
    ref_img = jax.device_put(ref_img)
    cond = jax.device_put(cond)

    def sample(unet_vars, lfae_vars, rng, ref_img, cond):
        out = model.sample_video(
            unet_vars, lfae_vars, rng, ref_img, cond, cond_scale=1.0
        )
        # reduce to a scalar so the host sync below transfers 4 bytes; the
        # per-scale fit flags ride along (a few bools) so the JSON can
        # report which warp branch the generator's joint fit cond took —
        # a silent fallback to the XLA gather is visible in the headline
        return out["out_vid"].mean(), model.decode_fit_flags(out["vid_grid"])

    compiled = jax.jit(sample).lower(
        unet_vars, lfae_vars, k_s, ref_img, cond
    ).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns a per-device list
        ca = ca[0]
    graph_flops = float(ca.get("flops", 0.0))
    graph_bytes = float(ca.get("bytes accessed", 0.0))

    def run_once():
        # device_get forces a REAL completion sync; on this image's tunneled
        # backend block_until_ready returns at dispatch-ack, not completion
        m, fits = jax.device_get(
            compiled(unet_vars, lfae_vars, k_s, ref_img, cond)
        )
        return float(m), fits

    # self-defense: every timed argument must be a device-resident
    # jax.Array — a stray numpy leaf re-uploads itself per dispatch and
    # silently turns the bench into a tunnel-bandwidth measurement
    for tree in (unet_vars, lfae_vars, ref_img, cond):
        for leaf in jax.tree_util.tree_leaves(tree):
            assert isinstance(leaf, jax.Array), (
                f"host-resident bench arg leaf: {type(leaf)}"
            )

    fit_flags = {}
    for _ in range(WARMUP):
        _, fits = run_once()
        fit_flags = {k: bool(v) for k, v in fits.items()}

    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        run_once()
        times.append(time.perf_counter() - t0)

    times.sort()
    median = times[len(times) // 2]
    fps = NUM_FRAMES / median

    # pipelined B=1 steady state: enqueue K requests back-to-back and sync
    # once — overlaps the ~30 ms per-call tunnel RTT with device compute
    # (sequential production serving does not pay a host round-trip per
    # video). Same latency path, honest throughput framing.
    k_pipe = 6
    run_once()  # warm queue
    t0 = time.perf_counter()
    outs = [
        compiled(unet_vars, lfae_vars, k_s, ref_img, cond)[0]
        for _ in range(k_pipe)
    ]
    for o in outs:
        float(jax.device_get(o))
    pipe_fps = k_pipe * NUM_FRAMES / (time.perf_counter() - t0)

    # production-serving throughput: B videos per dispatch
    bb = BATCH_THROUGHPUT
    ref_b = jnp.broadcast_to(ref_img, (bb,) + ref_img.shape[1:])
    cond_b = jnp.broadcast_to(cond, (bb,) + cond.shape[1:])
    compiled_b = jax.jit(sample).lower(
        unet_vars, lfae_vars, k_s, ref_b, cond_b
    ).compile()

    def run_batch():
        return float(
            jax.device_get(
                compiled_b(unet_vars, lfae_vars, k_s, ref_b, cond_b)[0]
            )
        )

    run_batch()
    bt = []
    for _ in range(5):
        t0 = time.perf_counter()
        run_batch()
        bt.append(time.perf_counter() - t0)
    bt.sort()
    batch_fps = bb * NUM_FRAMES / bt[len(bt) // 2]

    # best-known serving configuration (round-5 batch sweep, BASELINE.md):
    # B=16 pipelined — per-dispatch overhead amortizes and the sweep's
    # winner crosses 2x the H100 analytic baseline
    bbest = 16
    ref_bb = jnp.broadcast_to(ref_img, (bbest,) + ref_img.shape[1:])
    cond_bb = jnp.broadcast_to(cond, (bbest,) + cond.shape[1:])
    compiled_bb = jax.jit(sample).lower(
        unet_vars, lfae_vars, k_s, ref_bb, cond_bb
    ).compile()

    def run_b16():
        return float(
            jax.device_get(
                compiled_bb(unet_vars, lfae_vars, k_s, ref_bb, cond_bb)[0]
            )
        )

    run_b16(); run_b16()
    t0 = time.perf_counter()
    outs16 = [
        compiled_bb(unet_vars, lfae_vars, k_s, ref_bb, cond_bb)[0]
        for _ in range(3)
    ]
    for o in outs16:
        float(jax.device_get(o))
    b16_pipe_fps = 3 * bbest * NUM_FRAMES / (time.perf_counter() - t0)

    # decode-stage keys: random-weight sampling produces noise flows, so
    # the tiled one-hot warp's fit check falls back to the XLA gather in
    # the headline above. These two keys time the decode stage alone at
    # B=8 with SMOOTH (trained-model-regime) flows, making the production
    # serving win visible: tiled vs xla decode of 8x40 frames.
    lin = jnp.linspace(-1.0, 1.0, 32)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    base_g = jnp.stack([gx, gy], -1)[None, None]
    disp = jax.image.resize(
        0.03 * jax.random.normal(k_s, (bb, NUM_FRAMES, 8, 8, 2)),
        (bb, NUM_FRAMES, 32, 32, 2), "linear",
    )
    smooth_flow = base_g + disp
    smooth_conf = jax.random.uniform(k_s, (bb, NUM_FRAMES, 32, 32, 1))

    decode_ms = {}
    for impl in ("tiled", "xla"):
        lc = dataclasses.replace(
            cfg.lfae, compute_dtype="bfloat16", warp_impl=impl
        )
        m2 = FlowDiffusion(lc, cfg.diffusion)

        def dec(lv, img, fl, cf, m2=m2):
            out, _ = m2.decode_flow_video(lv, img, fl, cf)
            return out.mean()

        cd = jax.jit(dec).lower(
            lfae_vars, ref_b, smooth_flow, smooth_conf
        ).compile()
        runs = []
        for _ in range(6):
            t0 = time.perf_counter()
            float(jax.device_get(cd(lfae_vars, ref_b, smooth_flow, smooth_conf)))
            runs.append(time.perf_counter() - t0)
        runs.sort()
        decode_ms[impl] = runs[len(runs) // 2] * 1e3

    achieved_tflops = graph_flops / median / 1e12
    rtt_post = _tunnel_rtt_ms()
    load_post = _host_load1()
    degraded = (
        rtt_pre > RTT_BAND_MS
        or rtt_post > RTT_BAND_MS
        or load_pre > LOAD_BAND
    )
    print(
        json.dumps(
            {
                "metric": "sampling_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s",
                "weights": weights,
                "degraded": degraded,
                "tunnel_rtt_ms_pre": round(rtt_pre, 1),
                "tunnel_rtt_ms_post": round(rtt_post, 1),
                "host_load1_pre": round(load_pre, 2),
                "host_load1_post": round(load_post, 2),
                "decode_fit": fit_flags,
                "warp_tiled_max_res": cfg.lfae.warp_tiled_max_res,
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "vs_h100_ceiling": round(fps / BASELINE_FPS_CEILING, 3),
                "b1_pipelined_fps": round(pipe_fps, 2),
                "baseline": "h100-analytic, BASELINE.md derivation",
                "batch8_frames_per_sec": round(batch_fps, 2),
                "b16_pipelined_fps": round(b16_pipe_fps, 2),
                "best_vs_baseline": round(
                    max(fps, pipe_fps, batch_fps, b16_pipe_fps) / BASELINE_FPS, 3
                ),
                "model_tflop_per_video": round(graph_flops / 1e12, 4),
                "achieved_tflops": round(achieved_tflops, 2),
                "mfu": round(achieved_tflops / V5E_PEAK_TFLOPS, 4),
                "hbm_gb_per_video": round(graph_bytes / 1e9, 2),
                "hbm_util": round(graph_bytes / median / 1e9 / V5E_HBM_GBPS, 3),
                "decode8_smoothflow_ms_tiled": round(decode_ms["tiled"], 1),
                "decode8_smoothflow_ms_xla": round(decode_ms["xla"], 1),
            }
        )
    )


if __name__ == "__main__":
    main()
