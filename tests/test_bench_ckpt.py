"""bench_ckpt: fp16 save / template-cast load / generator-subtree graft."""

import numpy as np


def _tree(rng, scale=1.0):
    return {
        "params": {
            "generator": {
                "w": rng.standard_normal((3, 4)).astype(np.float32) * scale,
                "pixelwise_flow_predictor": {
                    "w": rng.standard_normal((6,)).astype(np.float32)
                },
            },
            "region_predictor": {"w": rng.standard_normal((2,)).astype(np.float32)},
            "bg_predictor": {"w": rng.standard_normal((2,)).astype(np.float32)},
        },
        "batch_stats": {
            "generator": {
                "m": rng.standard_normal((4,)).astype(np.float32),
                "pixelwise_flow_predictor": {"m": np.zeros((6,), np.float32)},
            },
            "region_predictor": {"m": np.zeros((2,), np.float32)},
            "bg_predictor": {"m": np.zeros((2,), np.float32)},
        },
    }


def test_bench_ckpt_roundtrip_and_graft(tmp_path):
    from cvpr23_lfdm_tpu.utils.bench_ckpt import load_bench_ckpt, save_bench_ckpt

    rng = np.random.default_rng(0)
    lfae = _tree(rng)
    unet = {"params": {"conv": {"k": rng.standard_normal((5, 5)).astype(np.float32)}}}
    cond = rng.standard_normal((768,)).astype(np.float32)
    d = str(tmp_path / "ck")

    assert load_bench_ckpt(d, unet, lfae) is None  # absent -> None

    save_bench_ckpt(d, unet, lfae, cond)
    lfae_tmpl = _tree(np.random.default_rng(1))  # different values
    unet_tmpl = {"params": {"conv": {"k": np.zeros((5, 5), np.float32)}}}
    got = load_bench_ckpt(d, unet_tmpl, lfae_tmpl)
    assert got is not None
    unet2, lfae2, cond2 = got.unet_vars, got.lfae_vars, got.cond
    # pre-ref/meta checkpoint: defaults
    assert got.ref is None
    assert got.meta["objective"] == "eps"

    # fp16 storage round-trip at template dtype
    assert unet2["params"]["conv"]["k"].dtype == np.float32
    np.testing.assert_allclose(
        unet2["params"]["conv"]["k"], unet["params"]["conv"]["k"], atol=2e-3
    )
    np.testing.assert_allclose(cond2, cond)  # cond stays fp32 exact
    # generator grafted from the checkpoint ...
    np.testing.assert_allclose(
        lfae2["params"]["generator"]["w"], lfae["params"]["generator"]["w"],
        atol=2e-3,
    )
    np.testing.assert_allclose(
        lfae2["batch_stats"]["generator"]["m"],
        lfae["batch_stats"]["generator"]["m"], atol=2e-3,
    )
    # ... while the training-only submodules keep the template's values
    np.testing.assert_array_equal(
        lfae2["params"]["region_predictor"]["w"],
        lfae_tmpl["params"]["region_predictor"]["w"],
    )
    # the flow predictor inside the generator is pruned from the save and
    # keeps the template too (serving decodes external flows)
    np.testing.assert_array_equal(
        lfae2["params"]["generator"]["pixelwise_flow_predictor"]["w"],
        lfae_tmpl["params"]["generator"]["pixelwise_flow_predictor"]["w"],
    )

    # ref frame + meta round-trip
    ref = rng.random((8, 8, 3)).astype(np.float32)
    save_bench_ckpt(d, unet, lfae, cond, ref=ref, meta={"objective": "x0"})
    got = load_bench_ckpt(d, unet_tmpl, lfae_tmpl)
    np.testing.assert_array_equal(got.ref, ref)
    assert got.meta["objective"] == "x0"

    # incomplete directory -> None
    import os

    os.remove(os.path.join(d, "cond.npy"))
    assert load_bench_ckpt(d, unet_tmpl, lfae_tmpl) is None


def test_save_bench_ckpt_writer_lock_and_atomicity(tmp_path):
    """A second concurrent writer raises instead of interleaving stale
    weights (round-4 stale-process incident); no temp files survive a
    completed save."""
    import os

    from cvpr23_lfdm_tpu.utils.bench_ckpt import (
        _writer_lock, save_bench_ckpt,
    )

    rng = np.random.default_rng(3)
    lfae = _tree(rng)
    unet = {"params": {"conv": {"k": rng.standard_normal((2, 2)).astype(np.float32)}}}
    cond = rng.standard_normal((4,)).astype(np.float32)
    d = str(tmp_path / "ck")

    save_bench_ckpt(d, unet, lfae, cond, meta={"objective": "x0"})
    assert not [f for f in os.listdir(d) if ".tmp." in f]

    # flock is per-open-file-description, so simulate the second writer in
    # a child process holding the lock
    import multiprocessing as mp

    def hold(lock_dir, started, release):
        from cvpr23_lfdm_tpu.utils.bench_ckpt import _writer_lock as wl

        with wl(lock_dir):
            started.set()
            release.wait(timeout=30)

    ctx = mp.get_context("fork")
    started, release = ctx.Event(), ctx.Event()
    p = ctx.Process(target=hold, args=(d, started, release))
    p.start()
    try:
        assert started.wait(timeout=30)
        import pytest

        with pytest.raises(RuntimeError, match="writer lock held"):
            save_bench_ckpt(d, unet, lfae, cond)
    finally:
        release.set()
        p.join(timeout=30)

    # lock released -> saving works again
    save_bench_ckpt(d, unet, lfae, cond)


def test_apply_bench_ckpt_reconfigures_cfg(tmp_path):
    """The shared apply helper (bench.py / bench_batch_sweep / test_dm
    --bench-ckpt): loads device-resident trees, rewrites cfg to the
    checkpoint's objective + per-scale warp cap, and shapes cond/ref to
    batch-1 rows."""
    import jax

    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.utils.bench_ckpt import (
        apply_bench_ckpt, save_bench_ckpt,
    )

    rng = np.random.default_rng(5)
    lfae = _tree(rng)
    unet = {"params": {"conv": {"k": rng.standard_normal((3, 3)).astype(np.float32)}}}
    cond = rng.standard_normal((768,)).astype(np.float32)
    ref = rng.random((8, 8, 3)).astype(np.float32)
    d = str(tmp_path / "ck")

    cfg = mug_config()
    assert apply_bench_ckpt(d, cfg, unet, lfae) is None  # absent -> None

    save_bench_ckpt(
        d, unet, lfae, cond, ref=ref,
        meta={"objective": "x0", "tiled_max_res": 32},
    )
    applied = apply_bench_ckpt(d, cfg, unet, lfae)
    assert applied is not None
    cfg2, unet2, lfae2, cond2, ref2, meta = applied
    assert cfg2.diffusion.objective == "x0"
    assert cfg2.lfae.warp_tiled_max_res == 32
    assert meta["tiled_max_res"] == 32
    # weight trees are device-resident (host numpy leaves re-upload per
    # jitted dispatch — the BENCH_r04 collapse)
    for leaf in jax.tree_util.tree_leaves((unet2, lfae2)):
        assert isinstance(leaf, jax.Array)
    assert cond2.shape == (1, 768) and ref2.shape == (1, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(cond2)[0], cond)
