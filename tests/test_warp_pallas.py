"""Pallas one-hot warp kernel: parity vs the XLA grid_sample (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr23_lfdm_tpu.ops.warp import grid_sample, warp_with_occlusion
from cvpr23_lfdm_tpu.ops.warp_pallas import warp_gather, warp_onehot


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 16, 8
    img = rng.random((b, h, w, c)).astype(np.float32)
    # warp grid: identity + noise, some samples out of bounds
    lin = np.linspace(-1, 1, h)
    gy, gx = np.meshgrid(lin, lin, indexing="ij")
    grid = np.stack([gx, gy], -1)[None].repeat(b, 0)
    grid = (grid + 0.3 * rng.standard_normal(grid.shape)).astype(np.float32)
    occ = rng.random((b, h, w, 1)).astype(np.float32)
    prev = rng.random((b, h, w, c)).astype(np.float32)
    return img, grid, occ, prev


def test_warp_onehot_matches_grid_sample(data):
    img, grid, occ, prev = data
    ref = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    out = warp_onehot(jnp.asarray(img), jnp.asarray(grid), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_onehot_occlusion_blend(data):
    img, grid, occ, prev = data
    ref = grid_sample(jnp.asarray(img), jnp.asarray(grid)) * occ
    out = warp_onehot(
        jnp.asarray(img), jnp.asarray(grid), jnp.asarray(occ), interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_onehot_previous_blend(data):
    img, grid, occ, prev = data
    ref = warp_with_occlusion(
        jnp.asarray(img), jnp.asarray(grid), jnp.asarray(occ), jnp.asarray(prev)
    )
    out = warp_onehot(
        jnp.asarray(img), jnp.asarray(grid), jnp.asarray(occ), jnp.asarray(prev),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_gather_matches_grid_sample(data):
    img, grid, occ, prev = data
    ref = grid_sample(jnp.asarray(img), jnp.asarray(grid))
    out = warp_gather(jnp.asarray(img), jnp.asarray(grid), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def _grid5(rng, b, f, h, w, jitter, offset=(0.0, 0.0)):
    """Identity-ish per-frame grids with smooth per-frame displacement."""
    liny = np.linspace(-1, 1, h)
    linx = np.linspace(-1, 1, w)
    gy, gx = np.meshgrid(liny, linx, indexing="ij")
    base = np.stack([gx, gy], -1)[None, None]          # [1,1,h,w,2]
    # smooth displacement: per-frame low-freq field upsampled
    coarse = rng.standard_normal((b, f, 4, 4, 2)).astype(np.float32)
    disp = jax.image.resize(jnp.asarray(coarse), (b, f, h, w, 2), "linear")
    g = base + jitter * np.asarray(disp) + np.asarray(offset)
    return g.astype(np.float32)


def test_warp_video_tiled_matches_grid_sample():
    from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video_tiled

    rng = np.random.default_rng(1)
    b, f, h, w, c = 2, 3, 48, 48, 5
    img = rng.random((b, h, w, c)).astype(np.float32)
    g5 = _grid5(rng, b, f, h, w, jitter=0.05)
    ref = grid_sample(jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, w, 2))
    out = warp_video_tiled(jnp.asarray(img), jnp.asarray(g5), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )


def test_warp_video_tiled_full_window_small_frame():
    from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video_tiled

    rng = np.random.default_rng(2)
    b, f, h, w, c = 1, 2, 32, 32, 7
    img = rng.random((b, h, w, c)).astype(np.float32)
    # wild grids: full-frame window path must handle ANY coords incl. OOB
    g5 = (2.4 * rng.random((b, f, h, w, 2)) - 1.2).astype(np.float32)
    ref = grid_sample(jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, w, 2))
    out = warp_video_tiled(jnp.asarray(img), jnp.asarray(g5), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )


def test_warp_video_tiled_oob_zeros():
    """Out-of-image corners contribute exactly zero (padding_mode='zeros')."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import warp_video_tiled

    rng = np.random.default_rng(3)
    b, f, h, w, c = 1, 1, 48, 48, 3
    img = rng.random((b, h, w, c)).astype(np.float32)
    # shift everything toward the left/top border so many samples are OOB
    g5 = _grid5(rng, b, f, h, w, jitter=0.02, offset=(-0.3, -0.25))
    ref = grid_sample(jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, w, 2))
    out = warp_video_tiled(jnp.asarray(img), jnp.asarray(g5), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )


def test_warp_video_fallback_on_wild_grid():
    """warp_video falls back to the XLA gather when tiles don't fit."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import _tiled_geometry, warp_video

    rng = np.random.default_rng(4)
    b, f, h, w, c = 1, 2, 48, 48, 3
    img = rng.random((b, h, w, c)).astype(np.float32)
    wild = (2.0 * rng.random((b, f, h, w, 2)) - 1.0).astype(np.float32)
    _, _, fit, _ = _tiled_geometry(jnp.asarray(img), jnp.asarray(wild))
    assert not bool(fit)  # random coords cannot fit a 24x32 window
    ref = grid_sample(jnp.asarray(img), jnp.asarray(wild).reshape(b, f * h, w, 2))
    out = warp_video(jnp.asarray(img), jnp.asarray(wild), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )

    smooth = _grid5(rng, b, f, h, w, jitter=0.05)
    _, _, fit, _ = _tiled_geometry(jnp.asarray(img), jnp.asarray(smooth))
    assert bool(fit)
    out = warp_video(jnp.asarray(img), jnp.asarray(smooth), interpret=True)
    ref = grid_sample(jnp.asarray(img), jnp.asarray(smooth).reshape(b, f * h, w, 2))
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )


def test_warp_gather_previous_blend(data):
    img, grid, occ, prev = data
    ref = warp_with_occlusion(
        jnp.asarray(img), jnp.asarray(grid), jnp.asarray(occ), jnp.asarray(prev)
    )
    out = warp_gather(
        jnp.asarray(img), jnp.asarray(grid), jnp.asarray(occ), jnp.asarray(prev),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_warp_video_tiled_big_windows():
    """The per-resolution default windows (32x40 @64 incl. one col-vreg of
    headroom, 40x48 @128 — sized from trained-flow margins,
    scripts/probe_fit.py) fit flows the old 24x32 window rejected, and
    stay exactly grid_sample."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import _tiled_geometry, warp_video

    rng = np.random.default_rng(11)
    for h, jitter in ((64, 0.10), (128, 0.05)):
        b, f, c = 1, 2, 3
        img = rng.random((b, h, h, c)).astype(np.float32)
        # displacement ~ the bench-ckpt regime: p99 ~10px @64 / ~20px @128
        g5 = _grid5(rng, b, f, h, h, jitter=jitter, offset=(0.12, -0.1))
        _, _, fit, (wh, ww, _, _) = _tiled_geometry(
            jnp.asarray(img), jnp.asarray(g5)
        )
        assert (wh, ww) == ((32, 40) if h == 64 else (40, 48))
        assert bool(fit), h
        out = warp_video(jnp.asarray(img), jnp.asarray(g5), interpret=True)
        ref = grid_sample(
            jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, h, 2)
        )
        np.testing.assert_allclose(
            np.asarray(out).reshape(b, f * h, h, c), np.asarray(ref),
            atol=1e-5,
        )


def test_warp_video_fit_boundary():
    """Fit check flips exactly at the window capacity: a tile whose
    valid-corner spread equals WH-1 fits; one more pixel falls back."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        _tiled_geometry, _window_for, warp_video,
    )

    rng = np.random.default_rng(7)
    b, f, h, w, c = 1, 1, 48, 48, 3
    _WIN_H = _window_for(h, w)[0]
    img = rng.random((b, h, w, c)).astype(np.float32)

    def grid_with_y_spread(spread_px):
        # identity grid, then stretch ONE tile's y-coords so its corner
        # coverage spans exactly `spread_px + 1` rows
        liny = np.linspace(-1, 1, h, dtype=np.float32)
        gy, gx = np.meshgrid(liny, liny, indexing="ij")
        g = np.stack([gx, gy], -1)[None, None].repeat(f, 1).copy()
        # pixel y=0..15 of tile (0,0): map to source rows 0..spread_px
        ys = np.linspace(0, spread_px, 16, dtype=np.float32)
        # unnormalized iy = ((g+1)*h-1)/2  =>  g = (2*iy+1)/h - 1
        g[0, 0, :16, :16, 1] = ((2 * ys + 1) / h - 1)[:, None]
        return g

    # corners span floor(ys) .. floor(ys)+1: spread = spread_px + 1 rows
    g_fit = grid_with_y_spread(_WIN_H - 2)       # spread WH-1 -> fits
    g_unfit = grid_with_y_spread(_WIN_H + 2.0)   # spread > WH -> fallback
    for g, want in ((g_fit, True), (g_unfit, False)):
        _, _, fit, _ = _tiled_geometry(jnp.asarray(img), jnp.asarray(g))
        assert bool(fit) == want, (want, _WIN_H)
        # either way the result equals grid_sample exactly
        ref = grid_sample(jnp.asarray(img), jnp.asarray(g).reshape(b, f * h, w, 2))
        out = warp_video(jnp.asarray(img), jnp.asarray(g), interpret=True)
        np.testing.assert_allclose(
            np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=2e-5
        )


def test_requirements_match_fit_flag():
    """`tile_window_requirements` is the probe's single source of truth:
    for any candidate window, all-tiles (y_req<=wh)&(x_req<=ww) equals the
    kernel's own `tiled_fit` with that window installed — incl. that the
    geometry's origin clipping never changes fit (ADVICE r4 item 3)."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        set_windows, tile_window_requirements, tiled_fit,
    )

    rng = np.random.default_rng(21)
    b, f, h, w = 1, 2, 64, 64
    try:
        for jitter in (0.02, 0.08, 0.2, 0.6):
            g5 = jnp.asarray(_grid5(rng, b, f, h, w, jitter=jitter))
            y_req, x_req = (np.asarray(v) for v in tile_window_requirements(g5))
            for wh, ww in ((24, 32), (32, 40), (40, 48), (64, 64)):
                want = bool((y_req <= wh).all() and (x_req <= ww).all())
                set_windows({h: (wh, ww)})
                got = bool(tiled_fit(jnp.zeros((b, h, w, 1)), g5))
                assert got == want, (jitter, wh, ww, want)
    finally:
        set_windows(None)


def test_set_windows_override_and_defaults():
    from cvpr23_lfdm_tpu.ops.warp_pallas import _window_for, set_windows

    try:
        set_windows({128: (48, 56)})
        assert _window_for(128, 128) == (48, 56)
        assert _window_for(64, 64) == (32, 40)  # defaults untouched
    finally:
        set_windows(None)
    assert _window_for(128, 128) == (40, 48)


def test_configure_windows_from_meta():
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        _window_for, configure_windows_from_meta, set_windows,
    )

    try:
        configure_windows_from_meta({"tiled_windows": {"64": [40, 48]}})
        assert _window_for(64, 64) == (40, 48)
        configure_windows_from_meta({})  # key absent: no-op
        assert _window_for(64, 64) == (40, 48)
    finally:
        set_windows(None)


def test_window_clamped_to_narrow_frame():
    """h>64 frame narrower than the big window: the clamped window keeps
    warp_video traceable and value-correct (ADVICE r4 medium: the
    unclamped (40,48) slice failed at trace time for w=32)."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import _window_for, warp_video

    h, w = 128, 32
    wh, ww = _window_for(h, w)
    assert wh <= h and ww <= w and ww % 8 == 0
    rng = np.random.default_rng(22)
    b, f, c = 1, 1, 3
    img = rng.random((b, h, w, c)).astype(np.float32)
    g5 = _grid5(rng, b, f, h, w, jitter=0.03)
    out = warp_video(jnp.asarray(img), jnp.asarray(g5), interpret=True)
    ref = grid_sample(jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, w, 2))
    np.testing.assert_allclose(
        np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref), atol=1e-5
    )


def test_decode_fit_flags_reports_branch():
    """FlowDiffusion.decode_fit_flags mirrors the generator's joint-fit
    cond per decode scale: smooth sampled flows -> all True; wild flows ->
    False at the windowed scales, True at the structural 32 scale."""
    from cvpr23_lfdm_tpu.config import mug_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion

    cfg = mug_config()
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    rng = np.random.default_rng(31)
    b, f = 1, 2
    smooth = jnp.asarray(_grid5(rng, b, f, 32, 32, jitter=0.02))
    flags = {k: bool(v) for k, v in model.decode_fit_flags(smooth).items()}
    assert set(flags) == {"32", "64", "128"}
    assert all(flags.values()), flags
    wild = jnp.asarray(
        (2.0 * rng.random((b, f, 32, 32, 2)) - 1.0).astype(np.float32)
    )
    flags = {k: bool(v) for k, v in model.decode_fit_flags(wild).items()}
    assert flags["32"] and not flags["64"] and not flags["128"], flags


def test_rect_tiles_match_grid_sample():
    """Checkpoint-adaptive tile SHAPES: every T>=64 candidate stays exactly
    grid_sample (incl. OOB zeros), and the window requirement shrinks
    monotonically with tile extent along the shrunk axis."""
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        set_tiles, set_windows, tile_window_requirements, tiled_fit,
        warp_video_tiled,
    )

    rng = np.random.default_rng(41)
    b, f, h, w, c = 1, 2, 64, 64, 5
    img = rng.random((b, h, w, c)).astype(np.float32)
    g5 = _grid5(rng, b, f, h, w, jitter=0.06, offset=(-0.15, 0.1))
    ref = grid_sample(jnp.asarray(img), jnp.asarray(g5).reshape(b, f * h, w, 2))
    try:
        for th, tw in ((16, 16), (8, 16), (16, 8), (8, 8)):
            set_tiles({h: (th, tw)})
            set_windows({h: (32, 40)})
            assert bool(tiled_fit(jnp.asarray(img), jnp.asarray(g5))), (th, tw)
            out = warp_video_tiled(
                jnp.asarray(img), jnp.asarray(g5), interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(out).reshape(b, f * h, w, c), np.asarray(ref),
                atol=1e-5, err_msg=f"tile {(th, tw)}",
            )
    finally:
        set_tiles(None)
        set_windows(None)

    # requirements: halving tile_h can only shrink y_req; halving tile_w
    # can only shrink x_req (the 8-aligned-origin penalty is per-tile but
    # never grows when a tile splits)
    y16, x16 = (np.asarray(v) for v in tile_window_requirements(
        jnp.asarray(g5), tile=(16, 16)))
    y8, x8 = (np.asarray(v) for v in tile_window_requirements(
        jnp.asarray(g5), tile=(8, 16)))
    assert y8.max() <= y16.max()
    _, xw8 = (np.asarray(v) for v in tile_window_requirements(
        jnp.asarray(g5), tile=(16, 8)))
    assert xw8.max() <= x16.max()


def test_configure_tiles_from_meta():
    from cvpr23_lfdm_tpu.ops.warp_pallas import (
        _tile_for, configure_windows_from_meta, set_tiles,
    )

    try:
        configure_windows_from_meta(
            {"tiled_windows": {"128": [40, 48]}, "tiled_tiles": {"128": [8, 16]}}
        )
        assert _tile_for(128) == (8, 16)
        assert _tile_for(64) == (16, 16)  # untouched default
    finally:
        set_tiles(None)
        configure_windows_from_meta({"tiled_windows": {}})
