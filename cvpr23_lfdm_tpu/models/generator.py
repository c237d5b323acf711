"""Warping generator (Johnson architecture) — the LFAE decoder.

Reference: LFAE/modules/generator.py:17-166. Encoder 64->128->256,
6-ResBlock bottleneck at 1/4 resolution, decoder with per-scale
flow-warped skip connections and occlusion blending, final sigmoid +
occlusion blend with the warped source image.

Three entry points mirroring the reference API:
* `__call__`     — full forward with the internal flow predictor.
* `compute_fea`  — encoder only -> 256ch 1/4-res reference feature
                   (generator.py:130-134), the DM's conditioning input.
* `forward_with_flow` — decode with an externally supplied flow/occlusion
                   (generator.py:136-166), the DM's decoding interface.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.models.blocks import (
    DownBlock2d,
    ResBlock2d,
    SameBlock2d,
    UpBlock2d,
)
from cvpr23_lfdm_tpu.models.pixelwise_flow import PixelwiseFlowPredictor
from cvpr23_lfdm_tpu.ops.warp import warp_with_occlusion


class Generator(nn.Module):
    num_channels: int = 3
    num_regions: int = 10
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    num_bottleneck_blocks: int = 6
    skips: bool = True
    revert_axis_swap: bool = True
    pixelwise_flow_predictor_params: dict | None = None
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # conv compute dtype (bf16 for serving)

    def setup(self):
        if self.pixelwise_flow_predictor_params is not None:
            self.pixelwise_flow_predictor = PixelwiseFlowPredictor(
                num_regions=self.num_regions,
                num_channels=self.num_channels,
                revert_axis_swap=self.revert_axis_swap,
                axis_name=self.axis_name,
                **self.pixelwise_flow_predictor_params,
            )
        else:
            self.pixelwise_flow_predictor = None

        self.first = SameBlock2d(self.block_expansion, 7, axis_name=self.axis_name, dtype=self.dtype)
        self.down_blocks = [
            DownBlock2d(
                min(self.max_features, self.block_expansion * (2 ** (i + 1))),
                3,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )
            for i in range(self.num_down_blocks)
        ]
        self.up_blocks = [
            UpBlock2d(
                min(
                    self.max_features,
                    self.block_expansion * (2 ** (self.num_down_blocks - i - 1)),
                ),
                3,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )
            for i in range(self.num_down_blocks)
        ]
        bottleneck_ch = min(
            self.max_features, self.block_expansion * (2**self.num_down_blocks)
        )
        self.bottleneck = [
            ResBlock2d(bottleneck_ch, 3, axis_name=self.axis_name, dtype=self.dtype, name=f"bottleneck_r{i}")
            for i in range(self.num_bottleneck_blocks)
        ]
        self.final = nn.Conv(
            self.num_channels, (7, 7), padding=[(3, 3), (3, 3)], name="final"
        )

    def _encode(self, source_image, train):
        out = self.first(source_image, train)
        skip_feats = [out]
        for blk in self.down_blocks:
            out = blk(out, train)
            skip_feats.append(out)
        return out, skip_feats

    def _decode(self, bottleneck_feat, skip_feats, source_image, flow, occlusion, train):
        """Shared decoder: warp bottleneck, resblocks, warped-skip upsampling,
        final conv + sigmoid, then occlusion blend with warped source
        (generator.py:111-126). With no flow, reduces to a plain
        autoencoder (reference `apply_optical` None-motion path,
        generator.py:86-88)."""
        has_flow = flow is not None
        out = (
            warp_with_occlusion(bottleneck_feat, flow, occlusion)
            if has_flow
            else bottleneck_feat
        )
        for blk in self.bottleneck:
            out = blk(out, train)
        for i, blk in enumerate(self.up_blocks):
            if self.skips and has_flow:
                out = warp_with_occlusion(skip_feats[-(i + 1)], flow, occlusion, previous=out)
            out = blk(out, train)
        if self.skips and has_flow:
            out = warp_with_occlusion(skip_feats[0], flow, occlusion, previous=out)
        out = nn.sigmoid(self.final(out.astype(jnp.float32)))
        if self.skips and has_flow:
            out = warp_with_occlusion(source_image, flow, occlusion, previous=out)
        return out

    def __call__(self, source_image, driving_params, source_params,
                 bg_params=None, train: bool = False) -> dict:
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        output = {"bottle_neck_feat": bottleneck_feat}

        flow = occlusion = None
        if self.pixelwise_flow_predictor is not None:
            motion = self.pixelwise_flow_predictor(
                source_image, driving_params, source_params, bg_params, train
            )
            flow = motion["optical_flow"]
            occlusion = motion.get("occlusion_map")
            output["optical_flow"] = flow
            output["deformed"] = warp_with_occlusion(source_image, flow)
            if occlusion is not None:
                output["occlusion_map"] = occlusion

        output["prediction"] = self._decode(
            bottleneck_feat, skip_feats, source_image, flow, occlusion, train
        )
        return output

    def compute_fea(self, source_image, train: bool = False) -> jnp.ndarray:
        bottleneck_feat, _ = self._encode(source_image, train)
        return bottleneck_feat

    def forward_with_flow(self, source_image, optical_flow, occlusion_map,
                          train: bool = False) -> dict:
        bottleneck_feat, skip_feats = self._encode(source_image, train)
        prediction = self._decode(
            bottleneck_feat, skip_feats, source_image, optical_flow, occlusion_map, train
        )
        return {
            "prediction": prediction,
            "deformed": warp_with_occlusion(source_image, optical_flow),
            "bottle_neck_feat": bottleneck_feat,
        }
