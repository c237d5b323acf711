"""PyTorch reference checkpoint -> JAX params converter.

Imports the released LFAE (`RegionMM.pth`) and DM (`flowdiff.pth`)
checkpoints (reference README.md:61-68) into this framework's pytrees —
the parity anchors of SURVEY.md §7. Works on raw `state_dict()` mappings
(tensors or numpy arrays); no torch import needed here.

Layout rules:
  Conv2d  OIHW  -> HWIO  (transpose 2,3,1,0)
  Conv3d  OIDHW -> DHWIO (transpose 2,3,4,1,0); (1,k,k) kernels used as 2D
  ConvT2d IO'HW -> flipped HWIO (transposed-conv-as-dilated-conv)
  Linear  [o,i] -> [i,o]
  BN      weight/bias -> scale/bias; running_{mean,var} -> batch_stats
"""

from __future__ import annotations

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def _conv3d_w(t):
    return _np(t).transpose(2, 3, 4, 1, 0)


def _deconv_w(t):
    # torch ConvTranspose2d weight [in, out, kH, kW]; equivalent dilated conv
    # uses the spatially flipped kernel in HWIO.
    w = _np(t)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _linear_w(t):
    return _np(t).transpose(1, 0)


def _set(tree: dict, path: tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_conv(params, path, sd, prefix):
    _set(params, path + ("kernel",), _conv_w(sd[prefix + ".weight"]))
    if prefix + ".bias" in sd:
        _set(params, path + ("bias",), _np(sd[prefix + ".bias"]))


def _convert_bn(params, stats, path, sd, prefix):
    _set(params, path + ("scale",), _np(sd[prefix + ".weight"]))
    _set(params, path + ("bias",), _np(sd[prefix + ".bias"]))
    _set(stats, path + ("mean",), _np(sd[prefix + ".running_mean"]))
    _set(stats, path + ("var",), _np(sd[prefix + ".running_var"]))


def _convert_hourglass(params, stats, base: tuple[str, ...], sd, prefix: str, num_blocks: int):
    for i in range(num_blocks):
        p = base + ("encoder", f"down_{i}")
        t = f"{prefix}.encoder.down_blocks.{i}"
        _convert_conv(params, p + ("conv",), sd, t + ".conv")
        _convert_bn(params, stats, p + ("norm",), sd, t + ".norm")
    for j in range(num_blocks):
        p = base + ("decoder", f"up_{j}")
        t = f"{prefix}.decoder.up_blocks.{j}"
        _convert_conv(params, p + ("conv",), sd, t + ".conv")
        _convert_bn(params, stats, p + ("norm",), sd, t + ".norm")


def convert_region_predictor(sd, num_blocks: int = 5) -> dict:
    """LFAE/modules/region_predictor.py state_dict -> {params, batch_stats}."""
    params, stats = {}, {}
    _convert_hourglass(params, stats, ("predictor",), sd, "predictor", num_blocks)
    _convert_conv(params, ("regions",), sd, "regions")
    return {"params": params, "batch_stats": stats}


def convert_bg_predictor(sd, num_blocks: int = 5) -> dict:
    """LFAE/modules/bg_motion_predictor.py state_dict -> {params, batch_stats}."""
    params, stats = {}, {}
    for i in range(num_blocks):
        p = ("encoder", f"down_{i}")
        t = f"encoder.down_blocks.{i}"
        _convert_conv(params, p + ("conv",), sd, t + ".conv")
        _convert_bn(params, stats, p + ("norm",), sd, t + ".norm")
    if "fc.weight" in sd:
        _set(params, ("fc", "kernel"), _linear_w(sd["fc.weight"]))
        _set(params, ("fc", "bias"), _np(sd["fc.bias"]))
    return {"params": params, "batch_stats": stats}


def convert_generator(sd, num_down_blocks: int = 2, num_bottleneck_blocks: int = 6,
                      pf_num_blocks: int = 5) -> dict:
    """LFAE/modules/generator.py state_dict -> {params, batch_stats}."""
    params, stats = {}, {}
    _convert_conv(params, ("first", "conv"), sd, "first.conv")
    _convert_bn(params, stats, ("first", "norm"), sd, "first.norm")
    for i in range(num_down_blocks):
        _convert_conv(params, (f"down_blocks_{i}", "conv"), sd, f"down_blocks.{i}.conv")
        _convert_bn(params, stats, (f"down_blocks_{i}", "norm"), sd, f"down_blocks.{i}.norm")
        _convert_conv(params, (f"up_blocks_{i}", "conv"), sd, f"up_blocks.{i}.conv")
        _convert_bn(params, stats, (f"up_blocks_{i}", "norm"), sd, f"up_blocks.{i}.norm")
    for i in range(num_bottleneck_blocks):
        base = (f"bottleneck_r{i}",)
        t = f"bottleneck.r{i}"
        _convert_conv(params, base + ("conv1",), sd, t + ".conv1")
        _convert_conv(params, base + ("conv2",), sd, t + ".conv2")
        _convert_bn(params, stats, base + ("norm1",), sd, t + ".norm1")
        _convert_bn(params, stats, base + ("norm2",), sd, t + ".norm2")
    _convert_conv(params, ("final",), sd, "final")

    if any(k.startswith("pixelwise_flow_predictor.") for k in sd):
        base = ("pixelwise_flow_predictor",)
        _convert_hourglass(
            params, stats, base + ("hourglass",), sd,
            "pixelwise_flow_predictor.hourglass", pf_num_blocks,
        )
        _convert_conv(params, base + ("mask",), sd, "pixelwise_flow_predictor.mask")
        if "pixelwise_flow_predictor.occlusion.weight" in sd:
            _convert_conv(params, base + ("occlusion",), sd, "pixelwise_flow_predictor.occlusion")
    return {"params": params, "batch_stats": stats}


def convert_lfae_checkpoint(ckpt: dict, cfg) -> dict:
    """Full stage-1 checkpoint dict (LFAE/train.py:134-142 layout:
    generator/region_predictor/bg_predictor state dicts) -> FlowAE variables.
    """
    region = convert_region_predictor(
        ckpt["region_predictor"], cfg.region_predictor.num_blocks
    )
    bg = convert_bg_predictor(ckpt["bg_predictor"], cfg.bg_predictor.num_blocks)
    gen = convert_generator(
        ckpt["generator"],
        cfg.generator.num_down_blocks,
        cfg.generator.num_bottleneck_blocks,
        cfg.generator.pixelwise_flow.num_blocks,
    )
    return {
        "params": {
            "region_predictor": region["params"],
            "bg_predictor": bg["params"],
            "generator": gen["params"],
        },
        "batch_stats": {
            "region_predictor": region["batch_stats"],
            "bg_predictor": bg["batch_stats"],
            "generator": gen["batch_stats"],
        },
    }
