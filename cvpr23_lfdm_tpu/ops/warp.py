"""Bilinear backward warping (torch `grid_sample` semantics) in pure XLA.

This is the hottest non-conv primitive of the LFAE (reference
LFAE/modules/generator.py:67, pixelwise_flow_predictor.py:100). The XLA
formulation here is a single fused gather + lerp; a Pallas kernel variant
lives in :mod:`cvpr23_lfdm_tpu.ops.warp_pallas` for the fused
warp+occlusion-blend path.

Conventions (torch 1.12 `F.grid_sample` defaults, the ones the reference
relies on): `align_corners=False`, `padding_mode='zeros'`, bilinear.
Grid last axis is (x, y) in [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _reflect(x: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    span = hi - lo
    t = jnp.mod(x - lo, 2.0 * span)
    t = span - jnp.abs(t - span)
    return t + lo


def _resolve_coords(coord, size, align_corners, padding_mode):
    """Unnormalize and apply padding-mode coordinate transform (pre-floor)."""
    ix = _unnormalize(coord, size, align_corners)
    if padding_mode == "reflection":
        if align_corners:
            ix = _reflect(ix, 0.0, float(size - 1))
        else:
            ix = _reflect(ix, -0.5, size - 0.5)
        ix = jnp.clip(ix, 0.0, float(size - 1))
    elif padding_mode == "border":
        ix = jnp.clip(ix, 0.0, float(size - 1))
    return ix


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    *,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear sample `image` at `grid` locations.

    Args:
      image: `[B, H, W, C]` (NHWC).
      grid: `[B, Hg, Wg, 2]`, last axis (x, y) in [-1, 1].
      padding_mode: 'zeros' | 'border' | 'reflection'.
      align_corners: coordinate convention flag.

    Returns:
      `[B, Hg, Wg, C]` warped image.
    """
    if padding_mode not in ("zeros", "border", "reflection"):
        raise ValueError(f"unknown padding_mode {padding_mode!r}")
    b, h, w, c = image.shape
    compute_dtype = grid.dtype

    ix = _resolve_coords(grid[..., 0], w, align_corners, padding_mode)
    iy = _resolve_coords(grid[..., 1], h, align_corners, padding_mode)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(compute_dtype)
    wy = (iy - y0).astype(compute_dtype)

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    if padding_mode == "zeros":
        vx0 = (x0i >= 0) & (x0i <= w - 1)
        vx1 = (x1i >= 0) & (x1i <= w - 1)
        vy0 = (y0i >= 0) & (y0i <= h - 1)
        vy1 = (y1i >= 0) & (y1i <= h - 1)
        corner_mask = (
            (vx0 & vy0).astype(compute_dtype),
            (vx1 & vy0).astype(compute_dtype),
            (vx0 & vy1).astype(compute_dtype),
            (vx1 & vy1).astype(compute_dtype),
        )
    else:
        corner_mask = None

    x0c = jnp.clip(x0i, 0, w - 1)
    x1c = jnp.clip(x1i, 0, w - 1)
    y0c = jnp.clip(y0i, 0, h - 1)
    y1c = jnp.clip(y1i, 0, h - 1)

    flat = image.reshape(b, h * w, c)

    def gather(yy, xx):
        idx = yy * w + xx  # [B, Hg, Wg]
        taken = jnp.take_along_axis(
            flat, idx.reshape(b, -1, 1), axis=1
        )  # [B, Hg*Wg, C]
        return taken.reshape(idx.shape + (c,))

    v00 = gather(y0c, x0c)
    v10 = gather(y0c, x1c)
    v01 = gather(y1c, x0c)
    v11 = gather(y1c, x1c)

    w00 = ((1.0 - wx) * (1.0 - wy))[..., None]
    w10 = (wx * (1.0 - wy))[..., None]
    w01 = ((1.0 - wx) * wy)[..., None]
    w11 = (wx * wy)[..., None]

    if corner_mask is not None:
        w00 = w00 * corner_mask[0][..., None]
        w10 = w10 * corner_mask[1][..., None]
        w01 = w01 * corner_mask[2][..., None]
        w11 = w11 * corner_mask[3][..., None]

    return v00 * w00 + v10 * w10 + v01 * w01 + v11 * w11


def warp_with_occlusion(
    feature: jnp.ndarray,
    flow: jnp.ndarray,
    occlusion: jnp.ndarray | None = None,
    previous: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused `deform_input` + `apply_optical` (generator.py:59-88).

    Warps `feature` by `flow` (resizing flow/occlusion to the feature
    resolution if needed) and blends with `previous` through the occlusion
    map: `warped * occ + previous * (1 - occ)`.

    Args:
      feature: `[B, H, W, C]`.
      flow: `[B, Hf, Wf, 2]` backward warp grid.
      occlusion: optional `[B, Ho, Wo, 1]` in [0, 1].
      previous: optional `[B, H, W, C]` blend partner.
    """
    from cvpr23_lfdm_tpu.ops.resize import resize_bilinear

    b, h, w, _ = feature.shape
    if flow.shape[1:3] != (h, w):
        flow = resize_bilinear(flow, (h, w))
    out = grid_sample(feature, flow)
    if occlusion is not None:
        if occlusion.shape[1:3] != (h, w):
            occlusion = resize_bilinear(occlusion, (h, w))
        if previous is not None:
            out = out * occlusion + previous * (1.0 - occlusion)
        else:
            out = out * occlusion
    return out
