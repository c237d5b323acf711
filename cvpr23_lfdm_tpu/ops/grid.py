"""Normalized coordinate grids and gaussian region rasterization.

Conventions follow the reference LFAE math (LFAE/modules/util.py:22-67):
grids are `[-1, 1]^2` with **align-corners** spacing (`x_i = 2*i/(W-1) - 1`)
and the last axis is `(x, y)` ordering. These grids parameterize backward
warps consumed by :func:`cvpr23_lfdm_tpu.ops.warp.grid_sample`.
"""

from __future__ import annotations

import jax.numpy as jnp


def make_coordinate_grid(spatial_size: tuple[int, int], dtype=jnp.float32) -> jnp.ndarray:
    """`[H, W, 2]` meshgrid over [-1,1]^2, last axis (x, y).

    Matches reference `make_coordinate_grid` (LFAE/modules/util.py:51-67):
    align-corners spacing (endpoints at exactly -1 and 1).
    """
    h, w = spatial_size
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    xx = jnp.broadcast_to(x[None, :], (h, w))
    yy = jnp.broadcast_to(y[:, None], (h, w))
    return jnp.stack([xx, yy], axis=-1)


def region2gaussian(center: jnp.ndarray, covar, spatial_size: tuple[int, int]) -> jnp.ndarray:
    """Rasterize per-region gaussians onto a [-1,1]^2 grid.

    Matches reference `region2gaussian` (LFAE/modules/util.py:22-48).

    Args:
      center: `[..., 2]` gaussian means in normalized (x, y) coords.
      covar: scalar float variance, or `[..., 2, 2]` covariance matrices.
      spatial_size: (H, W) of the output maps.

    Returns:
      `[..., H, W]` gaussian heatmaps (one per leading-dim element).
    """
    h, w = spatial_size
    grid = make_coordinate_grid(spatial_size, dtype=center.dtype)  # [H, W, 2]
    lead = center.shape[:-1]
    mean = center.reshape(lead + (1, 1, 2))
    diff = grid.reshape((1,) * len(lead) + (h, w, 2)) - mean  # [..., H, W, 2]

    if isinstance(covar, (float, int)):
        under_exp = jnp.sum(diff**2, axis=-1) / covar
    else:
        # covar: [..., 2, 2]; quadratic form diff^T covar^{-1} diff, computed
        # with the closed-form 2x2 inverse (no linalg solve / host sync).
        from cvpr23_lfdm_tpu.ops.eig2x2 import inv_2x2

        cinv = inv_2x2(covar).reshape(lead + (1, 1, 2, 2))
        dx, dy = diff[..., 0], diff[..., 1]
        a = cinv[..., 0, 0]
        b = cinv[..., 0, 1]
        c = cinv[..., 1, 0]
        d = cinv[..., 1, 1]
        under_exp = dx * dx * a + dx * dy * (b + c) + dy * dy * d
    return jnp.exp(-0.5 * under_exp)


def to_homogeneous(coords: jnp.ndarray) -> jnp.ndarray:
    """Append a 1-channel: `[..., 2] -> [..., 3]` (util.py:267-272)."""
    ones = jnp.ones(coords.shape[:-1] + (1,), dtype=coords.dtype)
    return jnp.concatenate([coords, ones], axis=-1)


def from_homogeneous(coords: jnp.ndarray) -> jnp.ndarray:
    """Perspective divide: `[..., 3] -> [..., 2]` (util.py:275-276)."""
    return coords[..., :2] / coords[..., 2:3]


def identity_flow_volume(b: int, f: int, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """`[B, F, H, W, 2]` identity backward-warp grid.

    TPU-native analogue of `FlowDiffusion.get_grid`
    (DM/modules/video_flow_diffusion_model.py:232-240) in channel-last
    layout, used by the residual-flow parameterization.
    """
    grid = make_coordinate_grid((h, w), dtype=dtype)
    return jnp.broadcast_to(grid[None, None], (b, f, h, w, 2))
