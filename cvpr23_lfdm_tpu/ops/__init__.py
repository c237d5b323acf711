"""Core numerical primitives (pure functions on jnp arrays).

All ops use channel-last layouts and the reference's normalized-coordinate
conventions ((x, y) in [-1, 1], torch `grid_sample` align_corners=False).
"""

from cvpr23_lfdm_tpu.ops.grid import (
    make_coordinate_grid,
    region2gaussian,
    to_homogeneous,
    from_homogeneous,
)
from cvpr23_lfdm_tpu.ops.warp import grid_sample, warp_with_occlusion
from cvpr23_lfdm_tpu.ops.eig2x2 import sqrt_psd_2x2, eigh_2x2, inv_2x2
from cvpr23_lfdm_tpu.ops.antialias import AntiAliasDownsample, gaussian_kernel_1d
from cvpr23_lfdm_tpu.ops.resize import (
    resize_bilinear,
    upsample_nearest_2x,
    avg_pool_2x2,
)
