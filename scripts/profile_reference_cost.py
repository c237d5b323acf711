"""Measure the torch reference's serving cost model (ops + unfused bytes).

Runs the reference `FlowDiffusion.sample_one_video` (the MUG serving
config: dim-64 UNet, 128x128, 40 frames, DDIM-10 — reference
DM/modules/video_flow_diffusion_model.py:190-216) on CPU under a
`TorchDispatchMode` that records, per aten op, the number of calls and
the bytes of all input+output tensors. Eager execution materializes
every intermediate, so the byte total is the HBM traffic floor of the
reference AS WRITTEN on any GPU (no cross-op fusion), and the op count
is its kernel-launch floor. Both feed the analytic H100 baseline
derivation in BASELINE.md.

Usage: python scripts/profile_reference_cost.py  (~2-5 min of CPU)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np
import torch
from torch.utils._python_dispatch import TorchDispatchMode

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.ref_oracle import install_dm_stubs  # noqa: E402

install_dm_stubs()

from DM.modules import video_flow_diffusion_model as ref_fdm  # noqa: E402
from LFAE.modules import bg_motion_predictor as ref_bg  # noqa: E402
from LFAE.modules import generator as ref_gen  # noqa: E402
from LFAE.modules import region_predictor as ref_rp  # noqa: E402

IMG, LAT, F, COND = 128, 32, 40, 768

# the real MUG LFAE hyperparameters (reference config/mug128.yaml)
REGION_PARAMS = dict(
    block_expansion=32, max_features=1024, num_blocks=5, temperature=0.1,
    scale_factor=0.25, pca_based=True, pad=3,
)
BG_PARAMS = dict(block_expansion=32, max_features=1024, num_blocks=5, bg_type="affine")
PF_PARAMS = dict(
    block_expansion=64, max_features=1024, num_blocks=5, scale_factor=0.25,
    use_deformed_source=True, use_covar_heatmap=True, estimate_occlusion_map=True,
)
GEN_PARAMS = dict(
    block_expansion=64, max_features=512, num_down_blocks=2,
    num_bottleneck_blocks=6, skips=True,
    pixelwise_flow_predictor_params=PF_PARAMS,
)


# metadata-only ops: no kernel launch, no memory traffic (reshape/view on
# contiguous tensors, slicing, dim bookkeeping)
VIEW_OPS = {
    "reshape", "view", "_unsafe_view", "unbind", "detach", "t", "transpose",
    "permute", "expand", "split", "slice", "squeeze", "unsqueeze", "alias",
    "as_strided", "select", "narrow", "chunk", "lift_fresh", "view_as_real",
    "view_as_complex", "_to_copy_meta",
}


class CostRecorder(TorchDispatchMode):
    """Counts aten kernel dispatches and input+output tensor bytes,
    excluding metadata-only view ops (they launch no kernel and move no
    bytes on GPU)."""

    def __init__(self):
        super().__init__()
        self.ops = 0
        self.bytes = 0
        self.view_ops = 0
        self.by_op: dict[str, list[int]] = {}

    def __torch_dispatch__(self, func, types, args=(), kwargs=None):
        out = func(*args, **(kwargs or {}))
        base = func._schema.name.split("::")[-1].split(".")[0]
        if base in VIEW_OPS:
            self.view_ops += 1
            return out
        nbytes = 0

        def acc(x):
            nonlocal nbytes
            if isinstance(x, torch.Tensor):
                nbytes += x.numel() * x.element_size()

        torch.utils._pytree.tree_map(acc, (args, kwargs, out))
        self.ops += 1
        self.bytes += nbytes
        name = str(func)
        rec = self.by_op.setdefault(name, [0, 0])
        rec[0] += 1
        rec[1] += nbytes
        return out


def build_reference() -> ref_fdm.FlowDiffusion:
    torch.manual_seed(0)
    region = ref_rp.RegionPredictor(
        num_regions=10, num_channels=3, estimate_affine=True, **REGION_PARAMS
    )
    bg = ref_bg.BGMotionPredictor(num_channels=3, **BG_PARAMS)
    gen = ref_gen.Generator(
        num_regions=10, num_channels=3, revert_axis_swap=True, **GEN_PARAMS
    )
    tmp = tempfile.mkdtemp()
    ckpt = os.path.join(tmp, "RegionMM.pth")
    torch.save(
        {
            "generator": gen.state_dict(),
            "region_predictor": region.state_dict(),
            "bg_predictor": bg.state_dict(),
        },
        ckpt,
    )
    import yaml

    cfg_path = os.path.join(tmp, "mug128.yaml")
    with open(cfg_path, "w") as fh:
        yaml.safe_dump(
            {
                "model_params": {
                    "num_regions": 10,
                    "num_channels": 3,
                    "estimate_affine": True,
                    "revert_axis_swap": True,
                    "region_predictor_params": REGION_PARAMS,
                    "bg_predictor_params": BG_PARAMS,
                    "generator_params": GEN_PARAMS,
                }
            },
            fh,
        )
    model = ref_fdm.FlowDiffusion(
        img_size=LAT, num_frames=F, sampling_timesteps=10, timesteps=1000,
        dim_mults=(1, 2, 4, 8), is_train=False,
        pretrained_pth=ckpt, config_pth=cfg_path,
    )
    model.eval()
    return model


def main() -> None:
    ref = build_reference()
    rng = np.random.RandomState(3)
    ref.set_sample_input(
        sample_img=torch.from_numpy(
            rng.rand(1, 3, IMG, IMG).astype(np.float32)
        ),
        sample_text=torch.from_numpy(rng.randn(1, COND).astype(np.float32)),
    )
    rec = CostRecorder()
    with torch.no_grad(), rec:
        ref.sample_one_video(cond_scale=1.0)

    top = sorted(rec.by_op.items(), key=lambda kv: -kv[1][1])[:15]
    report = {
        "kernel_ops_per_video": rec.ops,
        "view_ops_per_video": rec.view_ops,
        "eager_bytes_per_video": rec.bytes,
        "eager_gb_per_video": round(rec.bytes / 1e9, 2),
        "top_ops_by_bytes": [
            {"op": k, "calls": v[0], "gb": round(v[1] / 1e9, 3)} for k, v in top
        ],
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
