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
