"""Flax (linen) model definitions, NHWC/NDHWC channel-last throughout."""

from cvpr23_lfdm_tpu.models.blocks import (
    SameBlock2d,
    DownBlock2d,
    UpBlock2d,
    ResBlock2d,
    Encoder,
    Decoder,
    Hourglass,
)
from cvpr23_lfdm_tpu.models.region_predictor import RegionPredictor
from cvpr23_lfdm_tpu.models.bg_predictor import BGMotionPredictor
from cvpr23_lfdm_tpu.models.pixelwise_flow import PixelwiseFlowPredictor
from cvpr23_lfdm_tpu.models.generator import Generator
