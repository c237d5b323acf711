"""Band-limited (anti-aliased) downsampling.

Gaussian blur (separable depthwise conv) followed by stride slicing,
matching reference `AntiAliasInterpolation2d` (LFAE/modules/util.py:217-264):
`sigma = (1/scale - 1)/2`, `ksize = 2*round(4*sigma) + 1`, zero padding,
then `[::int(1/scale)]` subsampling. The kernel is a fixed constant folded
into the compiled program (not a learnable parameter).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel_1d(scale: float) -> np.ndarray:
    """Normalized 1-D gaussian taps for a given downscale factor."""
    sigma = (1.0 / scale - 1.0) / 2.0
    ksize = 2 * round(sigma * 4) + 1
    mean = (ksize - 1) / 2.0
    xs = np.arange(ksize, dtype=np.float64)
    k = np.exp(-((xs - mean) ** 2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


class AntiAliasDownsample:
    """Callable anti-aliased downsampler for NHWC tensors.

    Separable formulation: two 1-D depthwise convolutions (each 1-D kernel
    independently normalized — identical to the reference's normalized 2-D
    product kernel since sum2D = sumX * sumY), then stride slicing.
    """

    def __init__(self, scale: float):
        self.scale = scale
        if scale != 1.0:
            self.kernel = gaussian_kernel_1d(scale)
            ksize = self.kernel.shape[0]
            self.ka = ksize // 2
            self.kb = self.ka - 1 if ksize % 2 == 0 else self.ka
            self.stride = int(round(1.0 / scale))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """`[B, H, W, C] -> [B, H*scale, W*scale, C]`."""
        if self.scale == 1.0:
            return x
        c = x.shape[-1]
        k = jnp.asarray(self.kernel, dtype=x.dtype)
        # Depthwise separable blur. rhs layout HWIO with I=1, O=C.
        kh = jnp.broadcast_to(k[:, None, None, None], (k.shape[0], 1, 1, c))
        kw = jnp.broadcast_to(k[None, :, None, None], (1, k.shape[0], 1, c))
        dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
        pad = (self.ka, self.kb)
        x = jax.lax.conv_general_dilated(
            x, kh, window_strides=(1, 1), padding=[pad, (0, 0)],
            dimension_numbers=dn, feature_group_count=c,
        )
        x = jax.lax.conv_general_dilated(
            x, kw, window_strides=(1, 1), padding=[(0, 0), pad],
            dimension_numbers=dn, feature_group_count=c,
        )
        return x[:, :: self.stride, :: self.stride, :]
