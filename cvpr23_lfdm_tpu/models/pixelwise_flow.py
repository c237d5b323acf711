"""Pixelwise dense flow predictor — the motion bottleneck.

Reference: LFAE/modules/pixelwise_flow_predictor.py:17-137. Pipeline at
1/4 resolution (32x32 for 128^2 input):
  1. difference-of-gaussians heatmaps per region (+ zero background map);
  2. K+1 sparse backward warp grids (per-region affine driving->source
     coordinate transforms + background 3x3 grid);
  3. K+1 deformed copies of the source via one batched bilinear warp
     (folded into a single grid_sample call — no per-region loop);
  4. hourglass -> softmax mask -> convex combination = dense flow;
  5. optional occlusion head (sigmoid).

Outputs channel-last: flow `[B, h, w, 2]`, occlusion `[B, h, w, 1]`.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.models.blocks import Hourglass
from cvpr23_lfdm_tpu.ops.antialias import AntiAliasDownsample
from cvpr23_lfdm_tpu.ops.eig2x2 import inv_2x2
from cvpr23_lfdm_tpu.ops.grid import (
    from_homogeneous,
    make_coordinate_grid,
    region2gaussian,
    to_homogeneous,
)
from cvpr23_lfdm_tpu.ops.warp import grid_sample


class PixelwiseFlowPredictor(nn.Module):
    num_regions: int = 10
    num_channels: int = 3
    block_expansion: int = 64
    num_blocks: int = 5
    max_features: int = 1024
    scale_factor: float = 0.25
    region_var: float = 0.01
    use_covar_heatmap: bool = True
    use_deformed_source: bool = True
    estimate_occlusion_map: bool = True
    revert_axis_swap: bool = True
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # hourglass conv compute dtype

    def _heatmaps(self, spatial_size, driving_params, source_params):
        """Difference-of-gaussians region maps (pixelwise_flow_predictor.py:48-64).

        Returns [B, h, w, K+1] channel-last (background zeros first).
        """
        covar_d = driving_params["covar"] if self.use_covar_heatmap else self.region_var
        covar_s = source_params["covar"] if self.use_covar_heatmap else self.region_var
        g_driving = region2gaussian(driving_params["shift"], covar_d, spatial_size)
        g_source = region2gaussian(source_params["shift"], covar_s, spatial_size)
        heatmap = (g_driving - g_source).transpose(0, 2, 3, 1)  # [B,h,w,K]
        zeros = jnp.zeros(heatmap.shape[:3] + (1,), dtype=heatmap.dtype)
        return jnp.concatenate([zeros, heatmap], axis=-1)

    def _sparse_motions(self, spatial_size, driving_params, source_params, bg_params):
        """K+1 backward warp grids `[B, K+1, h, w, 2]`
        (pixelwise_flow_predictor.py:66-93). Index 0 is the background grid."""
        h, w = spatial_size
        shift_d = driving_params["shift"]
        b, k = shift_d.shape[:2]
        identity = make_coordinate_grid((h, w), dtype=shift_d.dtype)  # [h,w,2]
        coord = identity[None, None] - shift_d[:, :, None, None]  # [B,K,h,w,2]

        if "affine" in driving_params:
            affine = jnp.matmul(
                source_params["affine"], inv_2x2(driving_params["affine"])
            )  # [B,K,2,2]
            if self.revert_axis_swap:
                affine = affine * jnp.sign(affine[:, :, 0:1, 0:1])
            coord = jnp.einsum("bkij,bkhwj->bkhwi", affine, coord)

        driving_to_source = coord + source_params["shift"][:, :, None, None]

        bg_grid = jnp.broadcast_to(identity[None], (b, h, w, 2))
        if bg_params is not None:
            hom = to_homogeneous(bg_grid)  # [B,h,w,3]
            hom = jnp.einsum("bij,bhwj->bhwi", bg_params, hom)
            bg_grid = from_homogeneous(hom)

        return jnp.concatenate([bg_grid[:, None], driving_to_source], axis=1)

    def _deformed_source(self, source, sparse_motions, frames=1):
        """K+1 warped source copies via ONE grid_sample per source
        (pixelwise_flow_predictor.py:95-102): the K+1 grids (and, under
        frame folding, all F frames' grids) fold into the grid-row axis
        instead of repeating the source — TPU batched gathers pay per
        operand-batch, and this was the single most expensive op of the
        DM train step (49 ms at bs 5) as B*(K+1)=2200 tiny-source
        gathers. source `[B, h, w, C]`; sparse_motions
        `[B*frames, K+1, h, w, 2]`. Returns `[B*frames, K+1, h, w, C]`."""
        b, h, w, c = source.shape
        bp, kp1 = sparse_motions.shape[:2]
        grids = sparse_motions.reshape(b, (bp // b) * kp1 * h, w, 2)
        deformed = grid_sample(source, grids)
        return deformed.reshape(bp, kp1, h, w, c)

    @nn.compact
    def __call__(self, source_image, driving_params, source_params,
                 bg_params=None, train: bool = False, frames: int = 1) -> dict:
        """With `frames > 1`, `source_image` is `[B, H, W, C]` while the
        param dicts carry `B*frames` pair entries sharing each video's
        source (pseudo-GT frame folding) — the source is downsampled and
        gathered ONCE per video instead of once per pair."""
        if self.scale_factor != 1.0:
            source_image = AntiAliasDownsample(self.scale_factor)(source_image)
        b, h, w, c = source_image.shape
        kp1 = self.num_regions + 1

        heatmap = self._heatmaps((h, w), driving_params, source_params)
        sparse_motion = self._sparse_motions((h, w), driving_params, source_params, bg_params)
        deformed = self._deformed_source(source_image, sparse_motion, frames)
        b = sparse_motion.shape[0]  # pair batch from here on

        if self.use_deformed_source:
            # reference interleaves per-region [heatmap_k, deformed_k(3ch)]
            # channels (cat on the per-region channel axis then flatten,
            # pixelwise_flow_predictor.py:116-120)
            heat_k = heatmap.transpose(0, 3, 1, 2)[..., None]  # [B,K+1,h,w,1]
            per_region = jnp.concatenate([heat_k, deformed], axis=-1)
            predictor_input = per_region.transpose(0, 2, 3, 1, 4).reshape(
                b, h, w, kp1 * (1 + c)
            )
        else:
            predictor_input = heatmap

        prediction = Hourglass(
            self.block_expansion, self.num_blocks, self.max_features,
            axis_name=self.axis_name, dtype=self.dtype, name="hourglass",
        )(predictor_input, train)

        mask = nn.Conv(kp1, (7, 7), padding=[(3, 3), (3, 3)], name="mask")(prediction)
        mask = nn.softmax(mask.astype(jnp.float32), axis=-1)  # [B,h,w,K+1]
        flow = jnp.einsum("bkhwc,bhwk->bhwc", sparse_motion, mask)

        out = {"optical_flow": flow}
        if self.estimate_occlusion_map:
            occ = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], name="occlusion")(prediction)
            out["occlusion_map"] = nn.sigmoid(occ)
        return out
