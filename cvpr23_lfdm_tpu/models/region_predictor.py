"""Region predictor: soft-argmax region means + PCA covariance factor.

Reference: LFAE/modules/region_predictor.py:28-117. TPU-native changes:
* anti-aliased 0.25x downscale as a constant-kernel separable conv;
* softmax/soft-argmax fused in fp32;
* the reference's CPU LAPACK SVD (region_predictor.py:16-25 — a per-step
  device round-trip) becomes the closed-form on-device 2x2 factorization
  `sqrt_psd_2x2`.

Returns a dict of region params:
  shift  [B, K, 2]      soft-argmax means in [-1,1] (x, y)
  covar  [B, K, 2, 2]   spatial covariance of each region heatmap
  affine [B, K, 2, 2]   U sqrt(S) factor of covar
  heatmap [B, Hh, Wh, K] softmaxed region maps (channel-last)

With `estimate_affine=True, pca_based=False` the FOMM regression branch
is used instead (region_predictor.py:44-49, 95-107): a 4-channel conv
head (zero weights, identity bias) predicts a per-pixel jacobian that is
heatmap-averaged into `affine`, and `covar = affine @ affine^T`.

The reference's `fast_svd` knob (region_predictor.py:16-19, an optional
external CUDA batched SVD) has no TPU counterpart knob: both its paths
compute the same factorization this module already gets from the
closed-form on-device `sqrt_psd_2x2`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.models.blocks import Hourglass, conv2d
from cvpr23_lfdm_tpu.ops.antialias import AntiAliasDownsample
from cvpr23_lfdm_tpu.ops.eig2x2 import sqrt_psd_2x2
from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid


class RegionPredictor(nn.Module):
    num_regions: int = 10
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    temperature: float = 0.1
    scale_factor: float = 0.25
    pca_based: bool = True
    estimate_affine: bool = True
    pad: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # hourglass conv compute dtype

    @nn.compact
    def __call__(self, image, train: bool = False) -> dict:
        """image: `[B, H, W, 3]` in [0, 1]."""
        if self.scale_factor != 1.0:
            image = AntiAliasDownsample(self.scale_factor)(image)

        feature_map = Hourglass(
            self.block_expansion, self.num_blocks, self.max_features,
            axis_name=self.axis_name, dtype=self.dtype, name="predictor",
        )(image, train)

        pad = self.pad
        prediction = nn.Conv(
            self.num_regions, (7, 7), padding=[(pad, pad), (pad, pad)],
            name="regions",
        )(feature_map)

        b, hh, wh, k = prediction.shape
        logits = prediction.reshape(b, hh * wh, k).astype(jnp.float32)
        region = nn.softmax(logits / self.temperature, axis=1)

        grid = make_coordinate_grid((hh, wh)).reshape(1, hh * wh, 1, 2)
        # soft-argmax mean: sum_z p(z) * z  (region_predictor.py:60-66)
        shift = jnp.sum(region[..., None] * grid, axis=1)  # [B, K, 2]
        out = {"shift": shift, "heatmap": region.reshape(b, hh, wh, k)}

        if self.estimate_affine and not self.pca_based:
            # FOMM regression branch (region_predictor.py:44-49, 95-107):
            # jacobian head zero-init'd to the identity transform, then
            # heatmap-weighted spatial average per region.
            jac_map = nn.Conv(
                4, (7, 7), padding=[(pad, pad), (pad, pad)],
                kernel_init=nn.initializers.zeros,
                bias_init=lambda *a: jnp.array([1.0, 0.0, 0.0, 1.0]),
                name="jacobian",
            )(feature_map)
            jac_map = jac_map.reshape(b, hh * wh, 4).astype(jnp.float32)
            jac = jnp.einsum("bzk,bzc->bkc", region, jac_map)
            jac = jac.reshape(b, k, 2, 2)
            out["affine"] = jac
            out["covar"] = jac @ jnp.swapaxes(jac, -1, -2)
        elif self.pca_based:
            # covar = sum_z p(z) (z - mu)(z - mu)^T  (region_predictor.py:69-73)
            diff = grid - shift[:, None]  # [B, HW, K, 2]
            covar = jnp.einsum("bzk,bzki,bzkj->bkij", region, diff, diff)
            out["covar"] = covar
            out["affine"] = sqrt_psd_2x2(covar)
        return out
