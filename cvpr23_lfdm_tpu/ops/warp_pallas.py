"""Pallas TPU kernel: fused bilinear warp + occlusion blend via one-hot MXU matmul.

The LFAE's hottest non-conv primitive is `grid_sample` (reference
LFAE/modules/generator.py:67, pixelwise_flow_predictor.py:100). A naive
per-pixel gather is VPU-hostile on TPU; instead the bilinear sample is
recast as a sparse row-stochastic matrix product

    out[p, c] = sum_q W[p, q] * img[q, c],   W has <=4 nonzeros per row,

materialized as a dense [hw, hw] one-hot blend matrix in VMEM and fed to
the MXU. At the latent resolution (32x32 -> W is 1024x1024 fp32 = 4 MB)
this turns the generator's decode-path warps (bottleneck features 256ch,
occlusion blends, the K+1 sparse deforms) into single fused MXU ops.

Semantics match torch grid_sample defaults (align_corners=False,
padding_mode='zeros'): out-of-bounds corners contribute zero weight.
The occlusion blend `out*occ + prev*(1-occ)` (generator.py:69-88) fuses in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest hw for the dense one-hot matrix (hw^2 * 4B; 2048 -> 16 MB is too
# big with the other buffers, 1024 -> 4 MB fits comfortably)
MAX_HW = 1024


def _kernel(img_ref, grid_ref, occ_ref, prev_ref, out_ref, *, h, w, c, blend):
    img = img_ref[0]          # [hw, C]
    flow = grid_ref[0]        # [hw, 2] (x, y) in [-1, 1]
    n = h * w

    # torch align_corners=False unnormalization
    ix = ((flow[:, 0] + 1.0) * w - 1.0) * 0.5
    iy = ((flow[:, 1] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    q = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    qy = q // w
    qx = jax.lax.rem(q, w)

    def corner(xi, yi, wgt):
        # one corner's one-hot blend matrix, matmul'd immediately so only a
        # single [n, n] mask is live at a time (VMEM pressure)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        m = (qx == xi[:, None]) & (qy == yi[:, None])
        wm = jnp.where(m, jnp.where(valid, wgt, 0.0)[:, None], 0.0)
        return jnp.dot(wm, img, preferred_element_type=jnp.float32)

    warped = corner(x0, y0, (1 - wx) * (1 - wy))
    warped += corner(x0 + 1, y0, wx * (1 - wy))
    warped += corner(x0, y0 + 1, (1 - wx) * wy)
    warped += corner(x0 + 1, y0 + 1, wx * wy)
    if blend == "none":
        out_ref[0] = warped
    elif blend == "occlusion":
        out_ref[0] = warped * occ_ref[0]
    else:  # blend == "previous"
        occ = occ_ref[0]
        out_ref[0] = warped * occ + prev_ref[0] * (1.0 - occ)


@functools.partial(jax.jit, static_argnames=("blend", "interpret"))
def warp_onehot(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    occlusion: jnp.ndarray | None = None,
    previous: jnp.ndarray | None = None,
    blend: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bilinear warp (+ optional occlusion blend), Pallas TPU kernel.

    Args:
      image: `[B, H, W, C]` source features.
      grid: `[B, H, W, 2]` backward warp grid, (x, y) in [-1, 1]; output
        resolution must equal input resolution (the generator resizes flow
        before warping, which stays in XLA).
      occlusion: optional `[B, H, W, 1]`.
      previous: optional `[B, H, W, C]` blend partner
        (`warped*occ + previous*(1-occ)`).
      blend: override; inferred from occlusion/previous when None.
    """
    b, h, w, c = image.shape
    n = h * w
    assert n <= MAX_HW, f"one-hot warp limited to hw<={MAX_HW}, got {n}"
    assert grid.shape[:3] == (b, h, w)
    if blend is None:
        blend = (
            "previous"
            if previous is not None
            else ("occlusion" if occlusion is not None else "none")
        )

    img_flat = image.reshape(b, n, c).astype(jnp.float32)
    grid_flat = grid.reshape(b, n, 2).astype(jnp.float32)
    occ_flat = (
        occlusion.reshape(b, n, 1).astype(jnp.float32)
        if occlusion is not None
        else jnp.zeros((b, n, 1), jnp.float32)
    )
    # unused placeholder when there is no blend partner (keeps arity fixed)
    prev_flat = (
        previous.reshape(b, n, c).astype(jnp.float32)
        if previous is not None
        else occ_flat
    )

    kernel = functools.partial(_kernel, h=h, w=w, c=c, blend=blend)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1,) + prev_flat.shape[1:], lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * n * c + 14 * n * n,
            bytes_accessed=4 * (n * c * 2 + n * 2 + n * n),
            transcendentals=0,
        ),
        interpret=interpret,
    )(img_flat, grid_flat, occ_flat, prev_flat)
    return out.reshape(b, h, w, c)


def warp_fits(h: int, w: int) -> bool:
    return h * w <= MAX_HW


# ------------------------------------------------------- tiled one-hot warp
#
# The serving decoder's full-res warps (128^2 x 67ch at generator.py:59-88
# scale) are XLA's gather floor: ~4 fetched rows per output pixel at
# ~0.35 rows/cycle = 64 ms for the B=8 video batch. The windowed one-hot
# form below replaces the gather with MXU matmuls: output is tiled 16x16;
# each tile's bilinear corners live (for any physically smooth flow) in a
# small source window whose origin is the per-tile minimum corner index,
# so the sample is `A[T, S] @ window[S, C]` with the separable bilinear
# one-hot matrix A built on the VPU. Out-of-image corners get zero weight
# (torch padding_mode='zeros' exactly); a cheap XLA fit-check falls back
# to the patch-gather when a tile's corner spread exceeds the window
# (`warp_video` wraps both in `lax.cond`).

_TILE = 16      # default output tile edge (T = 256 pixels per tile)

# Checkpoint-adaptive tile SHAPES: {resolution h -> (tile_h, tile_w)}.
# The window requirement scales ~linearly with tile extent (per-tile corner
# spread ≈ tile·(1+|∂flow|) + roughness), while total MXU work is
# HW·S·C — linear in window AREA and independent of tile size — so a
# checkpoint whose flows demand huge 16x16-tile windows can trade tile
# extent for window area. Keep T = th·tw >= 128 (the matmul's M dim):
# T=64 pads the lane axis to 128 and halves effective MXU throughput.
_TILE_OVERRIDES: dict[int, tuple[int, int]] = {}


def _tile_for(h: int) -> tuple[int, int]:
    return _TILE_OVERRIDES.get(h, (_TILE, _TILE))

# Per-resolution source windows (rows, cols): rows unrestricted (dim-0
# slice), cols 8-aligned origin (sublane slice), so the col requirement
# pays up to a 7-px alignment penalty. Defaults sized from measured
# margins of trained-model sampled flows (scripts/probe_fit.py over
# assets/bench_ckpt: max per-tile requirement y27/x32 @64, y35/x38 @128 —
# the round-3 24x32 window fit 4%/0% of videos). The 64-scale window
# carries one column vreg of headroom (32x40, not the exact-fit 32x32):
# its 100th-pct x requirement equals 32 exactly, and a marginally rougher
# flow would silently flip the joint fit flag and route the WHOLE decode
# back to the XLA gather. Matmul cost is linear in rows*cols.
_WIN_H = 32     # h <= 64 window rows
_WIN_W = 40     # h <= 64 window cols
_WIN_H_BIG = 40  # h > 64 window rows
_WIN_W_BIG = 48  # h > 64 window cols

# Checkpoint-adaptive overrides: {resolution h -> (rows, cols)} set from a
# checkpoint's measured fit margins (assets/bench_ckpt/meta.json
# "tiled_windows", written by scripts/probe_fit.py). Consulted at TRACE
# time — call set_windows() before the enclosing jit compiles.
_WINDOW_OVERRIDES: dict[int, tuple[int, int]] = {}


def set_windows(mapping: dict[int, tuple[int, int]] | None) -> None:
    """Install per-resolution window overrides ({h: (rows, cols)}; None
    clears). Rows are unrestricted; cols must be a multiple of 8 (sublane
    alignment). Clears this module's jit caches so already-compiled
    `warp_video_tiled` calls retrace; callers that jitted a LARGER graph
    around it must configure windows before their first compile."""
    _WINDOW_OVERRIDES.clear()
    if mapping:
        for h, (wh, ww) in mapping.items():
            assert ww % 8 == 0, f"window cols must be 8-aligned, got {ww}"
            _WINDOW_OVERRIDES[int(h)] = (int(wh), int(ww))
    warp_video_tiled.clear_cache()


def set_tiles(mapping: dict[int, tuple[int, int]] | None) -> None:
    """Install per-resolution tile-shape overrides ({h: (th, tw)}; None
    clears). Both extents must divide the frame dims they tile and th*tw
    should be >= 128 (lane-axis fill of the one-hot matmul). Same trace-
    time caveat as `set_windows`."""
    _TILE_OVERRIDES.clear()
    if mapping:
        for h, (th, tw) in mapping.items():
            assert th >= 2 and tw >= 2, (th, tw)
            _TILE_OVERRIDES[int(h)] = (int(th), int(tw))
    warp_video_tiled.clear_cache()


def configure_windows_from_meta(meta: dict | None) -> None:
    """Apply a bench-checkpoint meta dict's `tiled_windows` (+ optional
    `tiled_tiles`) entries ({"64": [32, 40], ...}); windows/tiles then
    travel with the checkpoint instead of being hardcoded here (no-op when
    the keys are absent)."""
    if meta and "tiled_windows" in meta:
        set_windows({int(k): tuple(v) for k, v in meta["tiled_windows"].items()})
    if meta and "tiled_tiles" in meta:
        set_tiles({int(k): tuple(v) for k, v in meta["tiled_tiles"].items()})


def _window_for(h: int, w: int) -> tuple[int, int]:
    if h <= 32:
        return h, w  # whole frame: fit is structural
    if h in _WINDOW_OVERRIDES:
        wh, ww = _WINDOW_OVERRIDES[h]
        return min(wh, h), min(ww, w)
    if h <= 64:
        return min(_WIN_H, h), min(_WIN_W, w)
    # clamp like the small branch: both constants and any tiled-supported
    # frame w are multiples of 8, so the col origin stays 8-aligned
    return min(_WIN_H_BIG, h), min(_WIN_W_BIG, w)


def _tiled_kernel(origin_ref, cpack_ref, src_ref, out_ref, *, h, w, c,
                  wh, ww, th, tw):
    t = th * tw
    j = pl.program_id(1)
    oy = origin_ref[0, j, 0]
    # stored as ox//8: the *8 lets Mosaic prove the sublane-dim slice
    # start is 8-aligned (it cannot infer that from a plain SMEM value)
    ox = origin_ref[0, j, 1] * 8
    win = src_ref[0, pl.ds(oy, wh), pl.ds(ox, ww), :]     # [wh, ww, C]
    win2 = win.reshape(wh * ww, c)

    cp = cpack_ref[0, 0]                                   # [2, T] f32
    # window-local REAL coords; the bilinear one-hot row for window cell q
    # is the tent function relu(1 - |q - e|): exactly (1-frac) at floor(e)
    # and frac at floor(e)+1. Because the window is clamped inside the
    # image, out-of-image corners are out-of-window and get weight zero —
    # torch padding_mode='zeros' for free, with no integer compares.
    ex = cp[0:1, :] - ox.astype(jnp.float32)
    ey = cp[1:2, :] - oy.astype(jnp.float32)
    s = wh * ww
    q = jax.lax.broadcasted_iota(jnp.int32, (s, t), 0)
    qy = (q // ww).astype(jnp.float32)
    qx = (q - (q // ww) * ww).astype(jnp.float32)
    ax = jnp.maximum(0.0, 1.0 - jnp.abs(qx - ex))
    ay = jnp.maximum(0.0, 1.0 - jnp.abs(qy - ey))
    a = (ay * ax).astype(win2.dtype)                       # [S, T]

    out = jax.lax.dot_general(
        a, win2, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # [T, C]
    out_ref[0] = out.reshape(th, tw, c).astype(out_ref.dtype)


def _tile_minmax(v, th, tw):
    """Per-tile min & max over `[N, H, W]` -> two `[N, H//th, W//tw]`."""
    n, h, w = v.shape
    r = v.reshape(n, h // th, th, w // tw, tw)
    return r.min(axis=(2, 4)), r.max(axis=(2, 4))


def _coords_f32(grid, h, w):
    """torch align_corners=False unnormalized sample coords (f32)."""
    g = grid.astype(jnp.float32)
    ix = ((g[..., 0] + 1.0) * w - 1.0) * 0.5
    iy = ((g[..., 1] + 1.0) * h - 1.0) * 0.5
    return ix, iy


def _corner_cover(c0, size):
    """Coverage bounds of the VALID corners {c0, c0+1} per pixel: corners
    outside the image need no window coverage (their weight is zero)."""
    big = jnp.int32(size * 4)
    lo = jnp.minimum(
        jnp.where((c0 >= 0) & (c0 <= size - 1), c0, big),
        jnp.where((c0 + 1 >= 0) & (c0 + 1 <= size - 1), c0 + 1, big),
    )
    hi = jnp.maximum(
        jnp.where((c0 >= 0) & (c0 <= size - 1), c0, -1),
        jnp.where((c0 + 1 >= 0) & (c0 + 1 <= size - 1), c0 + 1, -1),
    )
    return lo, hi


def tiled_supported(h: int, w: int) -> bool:
    th, tw = _tile_for(h)
    return h % th == 0 and w % tw == 0 and h >= 2 and w >= 2


def _tiled_geometry(image, grid5):
    """Shared preamble: packed per-tile coords, window origins, fit flag."""
    b, f, h, w, _ = grid5.shape
    th, tw = _tile_for(h)
    full = h <= 32  # window == whole frame: always fits, origins zero
    wh, ww = _window_for(h, w)
    nty, ntx = h // th, w // tw
    ntiles = nty * ntx
    n = b * f

    ix, iy = _coords_f32(grid5.reshape(n, h, w, 2), h, w)
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)

    # [N, ntiles, 2, T] packed tile-local coords (rows: ix, iy)
    def pack(v):
        r = v.reshape(n, nty, th, ntx, tw)
        return r.transpose(0, 1, 3, 2, 4).reshape(n, ntiles, th * tw)

    cpack = jnp.stack([pack(ix), pack(iy)], axis=2)

    if full:
        origins = jnp.zeros((n, ntiles, 2), jnp.int32)
        fit = jnp.bool_(True)
        return cpack, origins, fit, (wh, ww, nty, ntx)

    xlo, xhi = _corner_cover(x0, w)
    ylo, yhi = _corner_cover(y0, h)
    xlo_t = _tile_minmax(xlo.reshape(n, h, w), th, tw)[0]
    xhi_t = _tile_minmax(xhi.reshape(n, h, w), th, tw)[1]
    ylo_t = _tile_minmax(ylo.reshape(n, h, w), th, tw)[0]
    yhi_t = _tile_minmax(yhi.reshape(n, h, w), th, tw)[1]
    # x origin 8-aligned (clean sublane slice); y origin unrestricted.
    # ox stored divided by 8 so the kernel can multiply it back and give
    # Mosaic a provably-aligned slice start.
    ox8 = jnp.clip(xlo_t // 8, 0, (w - ww) // 8)
    oy = jnp.clip(ylo_t, 0, h - wh)
    fit = jnp.all((xhi_t - ox8 * 8 <= ww - 1) & (yhi_t - oy <= wh - 1))
    origins = jnp.stack(
        [oy.reshape(n, ntiles), ox8.reshape(n, ntiles)], axis=-1
    )
    return cpack, origins, fit, (wh, ww, nty, ntx)


def tile_window_requirements(
    grid5: jnp.ndarray, tile: tuple[int, int] | None = None
):
    """Per-tile window extents the tiled kernel needs for `grid5`
    `[B, F, H, W, 2]`: returns `(y_req, x_req)`, each `[B*F, nty, ntx]`.

    Single source of truth for fit semantics (scripts/probe_fit.py sizes
    checkpoint windows from these): built from the SAME `_coords_f32` /
    `_corner_cover` / `_tile_minmax` helpers `_tiled_geometry` uses, so a
    kernel-geometry change cannot silently diverge from the probe. A tile
    fits window `(wh, ww)` iff `y_req <= wh and x_req <= ww`; the x
    requirement includes the 8-aligned-origin penalty. (`_tiled_geometry`
    additionally clips origins to the image — for any window that
    satisfies these requirements the clip provably cannot un-fit a tile,
    see test_warp_pallas.py's requirements-vs-fit regression.)

    `tile`: (th, tw) to probe a candidate tile shape; None = the shape
    `_tiled_geometry` would use at this resolution."""
    b, f, h, w, _ = grid5.shape
    th, tw = _tile_for(h) if tile is None else tile
    n = b * f
    ix, iy = _coords_f32(grid5.reshape(n, h, w, 2), h, w)
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    xlo, xhi = _corner_cover(x0, w)
    ylo, yhi = _corner_cover(y0, h)
    xlo_t = _tile_minmax(xlo.reshape(n, h, w), th, tw)[0]
    xhi_t = _tile_minmax(xhi.reshape(n, h, w), th, tw)[1]
    ylo_t = _tile_minmax(ylo.reshape(n, h, w), th, tw)[0]
    yhi_t = _tile_minmax(yhi.reshape(n, h, w), th, tw)[1]
    y_req = yhi_t - ylo_t + 1
    x_req = xhi_t - (xlo_t // 8) * 8 + 1
    return y_req, x_req


def _auto_interpret(interpret: bool | None) -> bool:
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_video_tiled(
    image: jnp.ndarray,
    grid5: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Tiled one-hot MXU warp of a shared source over per-frame grids.

    Args:
      image: `[B, H, W, C]` source (one per video).
      grid5: `[B, F, H, W, 2]` sample grids, (x, y) in [-1, 1]
        (torch align_corners=False / padding_mode='zeros' semantics).

    Returns `[B, F, H, W, C]`. Tiles whose corner spread exceeds the
    static window produce zeros for the uncovered corners — call through
    :func:`warp_video` for the fit-checked fallback.
    """
    b, f, h, w, _ = grid5.shape
    c = image.shape[-1]
    assert tiled_supported(h, w), (h, w)
    assert image.shape == (b, h, w, c)
    interpret = _auto_interpret(interpret)
    th, tw = _tile_for(h)
    cpack, origins, _, (wh, ww, nty, ntx) = _tiled_geometry(image, grid5)
    n = b * f

    kernel = functools.partial(
        _tiled_kernel, h=h, w=w, c=c, wh=wh, ww=ww, th=th, tw=tw
    )
    t = th * tw
    out = pl.pallas_call(
        kernel,
        grid=(n, nty * ntx),
        in_specs=[
            # whole per-video origin table in SMEM (tile picked by
            # program_id(1); SMEM blocks need full trailing dims)
            pl.BlockSpec((1, nty * ntx, 2), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2, t), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole source frame resident; same block for F consecutive
            # steps (and all tiles) -> re-DMA'd once per video
            pl.BlockSpec((1, h, w, c), lambda i, j: (i // f, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, c),
            lambda i, j: (i, j // ntx, j % ntx, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), image.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * wh * ww * c,
            bytes_accessed=(
                b * h * w * c * 2 + n * h * w * c * 2 + cpack.size * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(origins, cpack, image)
    return out.reshape(b, f, h, w, c)


def tiled_fit(image: jnp.ndarray, grid5: jnp.ndarray) -> jnp.ndarray:
    """Scalar bool: every output tile's valid-corner spread fits the
    static window (the tiled kernel is then exactly grid_sample). The
    geometry is recomputed inside `warp_video_tiled` — XLA CSEs the two
    copies when both live under one jit."""
    _, _, fit, _ = _tiled_geometry(image, grid5)
    return fit


def warp_video(
    image: jnp.ndarray,
    grid5: jnp.ndarray,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fit-checked tiled warp: MXU one-hot fast path, XLA patch-gather
    fallback when any tile's corner spread exceeds the static window
    (`lax.cond`, so only the taken branch executes)."""
    from cvpr23_lfdm_tpu.ops.warp import grid_sample

    b, f, h, w, _ = grid5.shape

    def xla_path(img, g5):
        out = grid_sample(img, g5.reshape(b, f * h, w, 2))
        return out.reshape(b, f, h, w, -1)

    if not tiled_supported(h, w):
        return xla_path(image, grid5)

    _, _, fit, _ = _tiled_geometry(image, grid5)
    return jax.lax.cond(
        fit,
        lambda img, g5: warp_video_tiled(img, g5, interpret=interpret),
        xla_path,
        image, grid5,
    )


# --------------------------------------------------------------- lane gather


def _gather_kernel(img_ref, flow_ref, occ_ref, prev_ref, out_ref, *, h, w, c, blend):
    """Channels-on-sublanes layout [C, n]; the four bilinear corners are
    dynamic gathers along the lane axis (the one Mosaic supports)."""
    img = img_ref[0]          # [C, n]
    flow = flow_ref[0]        # [2, n]

    ix = ((flow[0:1, :] + 1.0) * w - 1.0) * 0.5   # [1, n]
    iy = ((flow[1:2, :] + 1.0) * h - 1.0) * 0.5
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def corner(xi, yi, wgt):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        lin = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)  # [1, n]
        idx = jnp.broadcast_to(lin, (c, lin.shape[1]))
        g = jnp.take_along_axis(img, idx, axis=1)
        return g * jnp.where(valid, wgt, 0.0)

    out = corner(x0, y0, (1 - wx) * (1 - wy))
    out += corner(x0 + 1, y0, wx * (1 - wy))
    out += corner(x0, y0 + 1, (1 - wx) * wy)
    out += corner(x0 + 1, y0 + 1, wx * wy)

    if blend == "occlusion":
        out = out * occ_ref[0]
    elif blend == "previous":
        occ = occ_ref[0]
        out = out * occ + prev_ref[0] * (1.0 - occ)
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("blend", "interpret"))
def warp_gather(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    occlusion: jnp.ndarray | None = None,
    previous: jnp.ndarray | None = None,
    blend: str | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bilinear warp via lane-axis dynamic gather (memory-bound-optimal
    formulation; no hw cap). Same semantics as :func:`warp_onehot`."""
    b, h, w, c = image.shape
    n = h * w
    assert grid.shape[:3] == (b, h, w)
    if blend is None:
        blend = (
            "previous"
            if previous is not None
            else ("occlusion" if occlusion is not None else "none")
        )

    # channels-last -> channels-on-sublanes (XLA transposes, fast on TPU)
    img_t = image.reshape(b, n, c).swapaxes(1, 2).astype(jnp.float32)  # [B,C,n]
    flow_t = grid.reshape(b, n, 2).swapaxes(1, 2).astype(jnp.float32)  # [B,2,n]
    occ_t = (
        occlusion.reshape(b, n, 1).swapaxes(1, 2).astype(jnp.float32)
        if occlusion is not None
        else jnp.zeros((b, 1, n), jnp.float32)
    )
    prev_t = (
        previous.reshape(b, n, c).swapaxes(1, 2).astype(jnp.float32)
        if previous is not None
        else occ_t
    )

    kernel = functools.partial(_gather_kernel, h=h, w=w, c=c, blend=blend)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1,) + prev_t.shape[1:], lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, c, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * n * c,
            bytes_accessed=4 * (2 * n * c + 2 * n + 4 * n * c),
            transcendentals=0,
        ),
        interpret=interpret,
    )(img_t, flow_t, occ_t, prev_t)
    return out.swapaxes(1, 2).reshape(b, h, w, c)
