"""Golden tests: grid_sample vs torch.nn.functional.grid_sample."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from cvpr23_lfdm_tpu.ops import grid_sample, warp_with_occlusion
from cvpr23_lfdm_tpu.ops.resize import resize_bilinear


def _torch_grid_sample(img_nhwc, grid, padding_mode, align_corners):
    t_img = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
    t_grid = torch.from_numpy(grid)
    out = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    )
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    rng = np.random.RandomState(1)
    img = rng.randn(2, 9, 11, 3).astype(np.float32)
    # include far out-of-range coords to exercise padding
    grid = rng.uniform(-1.7, 1.7, size=(2, 6, 5, 2)).astype(np.float32)
    ours = np.asarray(
        grid_sample(jnp.asarray(img), jnp.asarray(grid),
                    padding_mode=padding_mode, align_corners=align_corners)
    )
    theirs = _torch_grid_sample(img, grid, padding_mode, align_corners)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_sample_exact_grid_points():
    """Sampling at exact pixel centers reproduces the image."""
    rng = np.random.RandomState(2)
    img = rng.randn(1, 8, 8, 2).astype(np.float32)
    h = w = 8
    # pixel centers in align_corners=False convention: x = (2i+1)/W - 1
    xs = (2 * np.arange(w) + 1) / w - 1
    ys = (2 * np.arange(h) + 1) / h - 1
    grid = np.stack(np.meshgrid(xs, ys), axis=-1).astype(np.float32)[None]
    out = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_warp_with_occlusion_matches_manual():
    rng = np.random.RandomState(3)
    feat = rng.randn(2, 16, 16, 4).astype(np.float32)
    prev = rng.randn(2, 16, 16, 4).astype(np.float32)
    flow = rng.uniform(-1, 1, size=(2, 8, 8, 2)).astype(np.float32)
    occ = rng.uniform(0, 1, size=(2, 8, 8, 1)).astype(np.float32)

    out = np.asarray(warp_with_occlusion(jnp.asarray(feat), jnp.asarray(flow),
                                         jnp.asarray(occ), jnp.asarray(prev)))
    flow_r = np.asarray(resize_bilinear(jnp.asarray(flow), (16, 16)))
    occ_r = np.asarray(resize_bilinear(jnp.asarray(occ), (16, 16)))
    warped = _torch_grid_sample(feat, flow_r, "zeros", False)
    expect = warped * occ_r + prev * (1 - occ_r)
    np.testing.assert_allclose(out, expect, atol=1e-5)


@pytest.mark.parametrize("shape_in,shape_out", [((7, 9), (14, 18)), ((32, 32), (8, 8)), ((8, 8), (128, 128))])
def test_resize_bilinear_matches_torch(shape_in, shape_out):
    rng = np.random.RandomState(4)
    x = rng.randn(2, *shape_in, 3).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), shape_out))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = F.interpolate(t, size=shape_out, mode="bilinear", align_corners=False)
    theirs = np.transpose(theirs.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_grads_match_torch(padding_mode, align_corners):
    """The custom VJP (ops/warp.py: row-scatter d_image + analytic d_grid)
    vs torch autograd through F.grid_sample — every LFAE training warp
    backprops through this."""
    import jax

    rng = np.random.RandomState(4)
    img = rng.randn(2, 7, 9, 5).astype(np.float32)
    # interior + out-of-range coords, away from exact gridlines (the
    # floor() subgradient choice at integer coords is implementation-
    # defined in both frameworks)
    grid = (rng.uniform(-1.5, 1.5, size=(2, 6, 4, 2)) + 0.0137).astype(
        np.float32
    )
    co = rng.randn(2, 6, 4, 5).astype(np.float32)

    gi, gg = jax.grad(
        lambda i, g: jnp.sum(
            grid_sample(
                i, g, padding_mode=padding_mode, align_corners=align_corners
            )
            * co
        ),
        argnums=(0, 1),
    )(jnp.asarray(img), jnp.asarray(grid))

    t_img = torch.from_numpy(np.transpose(img, (0, 3, 1, 2))).requires_grad_()
    t_grid = torch.from_numpy(grid).requires_grad_()
    out = F.grid_sample(
        t_img, t_grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners,
    )
    out.mul(torch.from_numpy(np.transpose(co, (0, 3, 1, 2)))).sum().backward()

    np.testing.assert_allclose(
        np.asarray(gi),
        np.transpose(t_img.grad.numpy(), (0, 2, 3, 1)),
        atol=1e-5,
        err_msg="d_image",
    )
    np.testing.assert_allclose(
        np.asarray(gg), t_grid.grad.numpy(), atol=1e-4, err_msg="d_grid"
    )
