"""FlowAE — stage-1 inference bundle (region + bg + generator).

Reference: LFAE/modules/flow_autoenc.py:12-61. One linen module so a single
params pytree holds all three subnets; `__call__` is the reference's
`forward` (reconstruct driving frame by warping the reference frame).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.config import LFAEConfig
from cvpr23_lfdm_tpu.models.bg_predictor import BGMotionPredictor
from cvpr23_lfdm_tpu.models.generator import Generator
from cvpr23_lfdm_tpu.models.region_predictor import RegionPredictor


def build_lfae_modules(cfg: LFAEConfig, axis_name: str | None = None):
    """Construct the three stage-1 modules from a typed config."""
    dtype = (
        jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype != "float32" else None
    )
    region = RegionPredictor(
        dtype=dtype,
        num_regions=cfg.num_regions,
        block_expansion=cfg.region_predictor.block_expansion,
        max_features=cfg.region_predictor.max_features,
        num_blocks=cfg.region_predictor.num_blocks,
        temperature=cfg.region_predictor.temperature,
        scale_factor=cfg.region_predictor.scale_factor,
        pca_based=cfg.region_predictor.pca_based,
        estimate_affine=cfg.region_predictor.estimate_affine,
        pad=cfg.region_predictor.pad,
        axis_name=axis_name,
    )
    bg = BGMotionPredictor(
        dtype=dtype,
        block_expansion=cfg.bg_predictor.block_expansion,
        max_features=cfg.bg_predictor.max_features,
        num_blocks=cfg.bg_predictor.num_blocks,
        bg_type=cfg.bg_predictor.bg_type,
        axis_name=axis_name,
    )
    import dataclasses

    pf = dataclasses.asdict(cfg.generator.pixelwise_flow)
    pf["dtype"] = dtype
    generator = Generator(
        dtype=dtype,
        warp_impl=cfg.warp_impl,
        tiled_max_res=cfg.warp_tiled_max_res,
        num_channels=cfg.num_channels,
        num_regions=cfg.num_regions,
        block_expansion=cfg.generator.block_expansion,
        max_features=cfg.generator.max_features,
        num_down_blocks=cfg.generator.num_down_blocks,
        num_bottleneck_blocks=cfg.generator.num_bottleneck_blocks,
        skips=cfg.generator.skips,
        revert_axis_swap=cfg.revert_axis_swap,
        pixelwise_flow_predictor_params=pf,
        axis_name=axis_name,
    )
    return region, bg, generator


def init_lfae_vars(rng, cfg: LFAEConfig) -> dict:
    """Random-init stage-1 variables in the combined layout used by
    FlowDiffusion: {params|batch_stats: {region_predictor, bg_predictor,
    generator}}. (Training runs warm-start or convert from the released
    torch checkpoints instead — see utils/torch_convert.py.)"""
    import jax

    s = cfg.frame_shape
    img = jnp.zeros((1, s, s, cfg.num_channels), jnp.float32)
    # jit the init: eager tracing dispatches thousands of tiny ops, which is
    # pathological over a remote-tunneled TPU device.
    return jax.jit(lambda r: FlowAE(cfg).init(r, img, img, train=False))(rng)


class FlowAE(nn.Module):
    """Composite stage-1 model. `ref`/`dri`: `[B, H, W, 3]` in [0, 1]."""

    cfg: LFAEConfig
    axis_name: str | None = None

    def setup(self):
        self.region_predictor, self.bg_predictor, self.generator = build_lfae_modules(
            self.cfg, self.axis_name
        )

    def __call__(self, ref_img, dri_img, train: bool = False) -> dict:
        source_params = self.region_predictor(ref_img, train)
        driving_params = self.region_predictor(dri_img, train)
        bg_params = self.bg_predictor(ref_img, dri_img, train)
        generated = self.generator(
            ref_img, driving_params, source_params, bg_params, train
        )
        generated["source_region_params"] = source_params
        generated["driving_region_params"] = driving_params
        return generated
