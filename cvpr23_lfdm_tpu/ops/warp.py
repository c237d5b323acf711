"""Bilinear backward warping (torch `grid_sample` semantics) in pure XLA.

This is the hottest non-conv primitive of the LFAE (reference
LFAE/modules/generator.py:67, pixelwise_flow_predictor.py:100). TPU
gathers are latency-bound per gathered row, so the four bilinear corners
are fetched as ONE contiguous 2x2xC patch per output pixel (the corners
are adjacent in memory): one `lax.gather` with a clipped window start and
per-cell weights re-derived so out-of-bounds corners contribute exactly
zero. Measured on v5e this roughly halves warp time vs four row-gathers
(e.g. [40,128,128,64]: 31 ms -> 17 ms). A Pallas one-hot MXU variant
lives in :mod:`cvpr23_lfdm_tpu.ops.warp_pallas` for small grids.

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
    gh, gw = grid.shape[1], grid.shape[2]
    compute_dtype = grid.dtype
    assert h >= 2 and w >= 2, "patch-gather warp needs h, w >= 2"

    ix = _resolve_coords(grid[..., 0], w, align_corners, padding_mode)
    iy = _resolve_coords(grid[..., 1], h, align_corners, padding_mode)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(compute_dtype)
    wy = (iy - y0).astype(compute_dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # window start clipped so the 2x2 patch is always in-bounds; cell
    # weights are re-derived per position so any corner outside the image
    # (or outside the shifted window) contributes exactly zero
    x0c = jnp.clip(x0i, 0, w - 2)
    y0c = jnp.clip(y0i, 0, h - 2)

    def cell_weights(c0, i0, frac, size):
        """Bilinear weight carried by window cells [c0, c0+1]: corner i0
        holds (1-frac), corner i0+1 holds frac, out-of-bounds corners 0."""
        i1 = i0 + 1
        in0 = (i0 >= 0) & (i0 <= size - 1)
        in1 = (i1 >= 0) & (i1 <= size - 1)

        def w_at(cell):
            return jnp.where(
                (cell == i0) & in0,
                1.0 - frac,
                jnp.where((cell == i1) & in1, frac, jnp.zeros_like(frac)),
            )

        return w_at(c0), w_at(c0 + 1)

    wx0, wx1 = cell_weights(x0c, x0i, wx, w)
    wy0, wy1 = cell_weights(y0c, y0i, wy, h)

    starts = jnp.stack(
        [y0c.reshape(b, -1), x0c.reshape(b, -1)], axis=-1
    )  # [B, P, 2]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def one(img, st):
        return jax.lax.gather(
            img, st, dnums, slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    patch = jax.vmap(one)(image, starts)  # [B, P, 2, 2, C]
    wts = jnp.stack(
        [
            jnp.stack([wy0 * wx0, wy0 * wx1], -1),
            jnp.stack([wy1 * wx0, wy1 * wx1], -1),
        ],
        -2,
    ).reshape(b, -1, 2, 2)
    out = jnp.einsum(
        "bpyxc,bpyx->bpc", patch, wts.astype(image.dtype)
    )
    return out.reshape(b, gh, gw, c)


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
