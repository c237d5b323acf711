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
