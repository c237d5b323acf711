"""Resize / pooling primitives matching torch 1.12 semantics.

The reference relies on three resize flavors:
* `F.interpolate(mode='nearest', scale_factor=2)` in decoder up-blocks
  (LFAE/modules/util.py:108) -> :func:`upsample_nearest_2x`.
* `F.interpolate(mode='bilinear', align_corners=False)` for flow/occlusion
  rescaling (generator.py:65, 80) -> :func:`resize_bilinear`.
* `nn.AvgPool2d(2)` in encoder down-blocks (util.py:125) ->
  :func:`avg_pool_2x2`.

All NHWC, pure jnp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest upsample of `[..., H, W, C]` (torch nearest: out[i]=in[i//2])."""
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def _source_index(out_size: int, in_size: int, dtype) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """torch `area_pixel_compute_source_index` (align_corners=False, linear)."""
    scale = in_size / out_size
    dst = jnp.arange(out_size, dtype=dtype)
    src = jnp.maximum((dst + 0.5) * scale - 0.5, 0.0)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(dtype)
    return lo, hi, frac


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of `[B, H, W, C]` to `size=(H', W')`.

    Matches `F.interpolate(..., mode='bilinear', align_corners=False)`.
    Separable: one gather+lerp per axis.
    """
    h_out, w_out = size
    b, h, w, c = x.shape
    if (h, w) == (h_out, w_out):
        return x
    dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32

    ylo, yhi, yfrac = _source_index(h_out, h, dtype)
    xlo, xhi, xfrac = _source_index(w_out, w, dtype)

    top = jnp.take(x, ylo, axis=1)
    bot = jnp.take(x, yhi, axis=1)
    xv = top + (bot - top) * yfrac[None, :, None, None]

    left = jnp.take(xv, xlo, axis=2)
    right = jnp.take(xv, xhi, axis=2)
    return left + (right - left) * xfrac[None, None, :, None]


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool of `[B, H, W, C]` (torch AvgPool2d(2))."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return jnp.mean(x, axis=(2, 4))
