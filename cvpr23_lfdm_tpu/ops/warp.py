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

import functools

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


def _cell_weights(c0, i0, frac, size):
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


def _cell_weight_grads(c0, i0, frac, size):
    """d(cell weight)/d(frac) for the two window cells: -1 on the
    in-bounds i0 cell, +1 on the in-bounds i1 cell, 0 elsewhere."""
    i1 = i0 + 1
    in0 = (i0 >= 0) & (i0 <= size - 1)
    in1 = (i1 >= 0) & (i1 <= size - 1)
    one = jnp.ones_like(frac)
    zero = jnp.zeros_like(frac)

    def g_at(cell):
        return jnp.where(
            (cell == i0) & in0, -one, jnp.where((cell == i1) & in1, one, zero)
        )

    return g_at(c0), g_at(c0 + 1)


def _window(image, grid, padding_mode, align_corners):
    """Shared fwd/bwd geometry: clipped window starts, cell weights, and
    the gathered [B, P, 2, 2, C] patch."""
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
    # window start clipped so the 2x2 patch is always in-bounds; cell
    # weights are re-derived per position so any corner outside the image
    # (or outside the shifted window) contributes exactly zero
    x0c = jnp.clip(x0i, 0, w - 2)
    y0c = jnp.clip(y0i, 0, h - 2)

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
    return patch, (x0c, y0c, x0i, y0i, wx, wy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample(image, grid, padding_mode, align_corners):
    b, h, w, c = image.shape
    gh, gw = grid.shape[1], grid.shape[2]
    patch, (x0c, y0c, x0i, y0i, wx, wy) = _window(
        image, grid, padding_mode, align_corners
    )
    wx0, wx1 = _cell_weights(x0c, x0i, wx, w)
    wy0, wy1 = _cell_weights(y0c, y0i, wy, h)
    wts = jnp.stack(
        [
            jnp.stack([wy0 * wx0, wy0 * wx1], -1),
            jnp.stack([wy1 * wx0, wy1 * wx1], -1),
        ],
        -2,
    ).reshape(b, -1, 2, 2)
    out = jnp.einsum("bpyxc,bpyx->bpc", patch, wts.astype(image.dtype))
    return out.reshape(b, gh, gw, c)


def _grid_sample_fwd(image, grid, padding_mode, align_corners):
    return _grid_sample(image, grid, padding_mode, align_corners), (image, grid)


def _grid_sample_bwd(padding_mode, align_corners, res, d_out):
    """Hand-rolled backward. XLA differentiates the (2,2,C)-window gather
    into a scatter of OVERLAPPING window updates, which the TPU backend
    serializes into a per-pixel while loop (measured 535 ms for a
    [8,128,128] warp — 3x the rest of the LFAE train step combined).
    Here: d_image is ONE row-granular scatter-add of the 4 weighted
    corner contributions, and d_grid is the analytic bilinear-weight
    derivative chained through `_resolve_coords` by `jax.vjp` (so
    border/reflection clipping gradients match autodiff exactly)."""
    image, grid = res
    b, h, w, c = image.shape
    p = grid.shape[1] * grid.shape[2]
    patch, (x0c, y0c, x0i, y0i, wx, wy) = _window(
        image, grid, padding_mode, align_corners
    )
    wx0, wx1 = _cell_weights(x0c, x0i, wx, w)
    wy0, wy1 = _cell_weights(y0c, y0i, wy, h)
    gx0, gx1 = _cell_weight_grads(x0c, x0i, wx, w)
    gy0, gy1 = _cell_weight_grads(y0c, y0i, wy, h)

    do = d_out.reshape(b, p, c)
    # per-cell value·cotangent inner products [B, P] (flatten grid dims)
    flat = lambda t: t.reshape(b, p)
    dW = jnp.einsum("bpyxc,bpc->bpyx", patch, do.astype(patch.dtype))
    dW = dW.astype(grid.dtype)
    wxs = jnp.stack([flat(wx0), flat(wx1)], -1)  # [B, P, 2]
    wys = jnp.stack([flat(wy0), flat(wy1)], -1)
    d_wx_cell = jnp.einsum("bpyx,bpy->bpx", dW, wys)  # [B, P, 2]
    d_wy_cell = jnp.einsum("bpyx,bpx->bpy", dW, wxs)
    d_wx = d_wx_cell[..., 0] * flat(gx0) + d_wx_cell[..., 1] * flat(gx1)
    d_wy = d_wy_cell[..., 0] * flat(gy0) + d_wy_cell[..., 1] * flat(gy1)

    # chain through unnormalize + padding transform (matches autodiff for
    # clip/reflect regions); frac = ix - floor(ix) passes d through
    shape2 = grid.shape[:-1]
    _, vjp_x = jax.vjp(
        lambda g: _resolve_coords(g, w, align_corners, padding_mode),
        grid[..., 0],
    )
    _, vjp_y = jax.vjp(
        lambda g: _resolve_coords(g, h, align_corners, padding_mode),
        grid[..., 1],
    )
    d_gx = vjp_x(d_wx.reshape(shape2).astype(grid.dtype))[0]
    d_gy = vjp_y(d_wy.reshape(shape2).astype(grid.dtype))[0]
    d_grid = jnp.stack([d_gx, d_gy], axis=-1)

    # d_image: 4 weighted corner rows per pixel, one scatter-add
    idx = []
    upd = []
    for dy, wyc in ((0, wy0), (1, wy1)):
        for dx, wxc in ((0, wx0), (1, wx1)):
            idx.append(flat((y0c + dy) * w + (x0c + dx)))
            upd.append(do * flat(wyc * wxc)[..., None].astype(do.dtype))
    idx4 = jnp.concatenate(idx, axis=1)  # [B, 4P]
    upd4 = jnp.concatenate(upd, axis=1)  # [B, 4P, C]

    def one(i, u):
        return jnp.zeros((h * w, c), d_out.dtype).at[i].add(u)

    d_image = jax.vmap(one)(idx4, upd4).reshape(b, h, w, c).astype(image.dtype)
    return d_image, d_grid


_grid_sample.defvjp(_grid_sample_fwd, _grid_sample_bwd)


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
    assert image.shape[1] >= 2 and image.shape[2] >= 2, (
        "patch-gather warp needs h, w >= 2"
    )
    return _grid_sample(image, grid, padding_mode, align_corners)


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
