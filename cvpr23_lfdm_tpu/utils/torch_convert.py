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
    if "jacobian.weight" in sd:  # FOMM regression head (:44-49)
        _convert_conv(params, ("jacobian",), sd, "jacobian")
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


# --------------------------------------------------------------------- Unet3D


def _conv3d_as2d_w(t):
    """(1,k,k) Conv3d weight [O,I,1,k,k] -> 2D HWIO."""
    return _np(t)[:, :, 0].transpose(2, 3, 1, 0)


def _deconv3d_as2d_w(t):
    """(1,4,4) ConvTranspose3d weight [I,O,1,4,4] -> flipped 2D HWIO."""
    w = _np(t)[:, :, 0, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def _convert_block(params, base, sd, prefix):
    """Unet3D `Block` (proj conv + GroupNorm)."""
    _set(params, base + ("proj", "conv", "kernel"), _conv3d_as2d_w(sd[prefix + ".proj.weight"]))
    _set(params, base + ("proj", "conv", "bias"), _np(sd[prefix + ".proj.bias"]))
    _set(params, base + ("norm", "scale"), _np(sd[prefix + ".norm.weight"]))
    _set(params, base + ("norm", "bias"), _np(sd[prefix + ".norm.bias"]))


def _convert_resnet_block(params, base, sd, prefix):
    if prefix + ".mlp.1.weight" in sd:
        _set(params, base + ("mlp", "kernel"), _linear_w(sd[prefix + ".mlp.1.weight"]))
        _set(params, base + ("mlp", "bias"), _np(sd[prefix + ".mlp.1.bias"]))
    _convert_block(params, base + ("block1",), sd, prefix + ".block1")
    _convert_block(params, base + ("block2",), sd, prefix + ".block2")
    if prefix + ".res_conv.weight" in sd:
        _set(params, base + ("res_conv", "kernel"), _conv3d_w(sd[prefix + ".res_conv.weight"]))
        _set(params, base + ("res_conv", "bias"), _np(sd[prefix + ".res_conv.bias"]))


def _convert_prenorm_attn(params, base, sd, prefix, kind):
    """Residual(PreNorm(dim, attn)) wrappers.

    kind: 'temporal' (EinopsToAndFrom->Attention, linear qkv no bias),
          'spatial' (same), 'linear' (SpatialLinearAttention, conv1x1 qkv).
    """
    _set(params, base + ("norm", "gamma"), _np(sd[prefix + ".fn.norm.gamma"]).reshape(-1))
    inner = prefix + (".fn.fn.fn" if kind in ("temporal", "spatial") else ".fn.fn")
    attn = base + ("attn",)
    if kind == "linear":
        # Conv2d 1x1 qkv/out
        _set(params, attn + ("to_qkv", "kernel"), _np(sd[inner + ".to_qkv.weight"])[:, :, 0, 0].transpose(1, 0))
        _set(params, attn + ("to_out", "kernel"), _np(sd[inner + ".to_out.weight"])[:, :, 0, 0].transpose(1, 0))
        _set(params, attn + ("to_out", "bias"), _np(sd[inner + ".to_out.bias"]))
    else:
        _set(params, attn + ("to_qkv", "kernel"), _linear_w(sd[inner + ".to_qkv.weight"]))
        _set(params, attn + ("to_out", "kernel"), _linear_w(sd[inner + ".to_out.weight"]))


def convert_unet3d(sd, num_levels: int = 4, use_deconv: bool = True,
                   latent_channels: int = 3) -> dict:
    """DM/modules/video_flow_diffusion.py Unet3D state_dict -> flax params.

    The reference's single 7x7 init conv over latent+feature channels is
    split by linearity into `init_conv` (latent, keeps the bias) and
    `init_conv_fea` (features, bias-free) — weight-identical outputs."""
    params = {}
    w = _conv3d_as2d_w(sd["init_conv.weight"])  # HWIO
    _set(params, ("init_conv", "conv", "kernel"), w[:, :, :latent_channels, :])
    _set(params, ("init_conv", "conv", "bias"), _np(sd["init_conv.bias"]))
    _set(params, ("init_conv_fea", "conv", "kernel"), w[:, :, latent_channels:, :])
    _convert_prenorm_attn(params, ("init_temporal_attn",), sd, "init_temporal_attn", "temporal")
    _set(
        params,
        ("time_rel_pos_bias", "relative_attention_bias", "embedding"),
        _np(sd["time_rel_pos_bias.relative_attention_bias.weight"]),
    )
    _set(params, ("time_mlp_1", "kernel"), _linear_w(sd["time_mlp.1.weight"]))
    _set(params, ("time_mlp_1", "bias"), _np(sd["time_mlp.1.bias"]))
    _set(params, ("time_mlp_2", "kernel"), _linear_w(sd["time_mlp.3.weight"]))
    _set(params, ("time_mlp_2", "bias"), _np(sd["time_mlp.3.bias"]))
    if "null_cond_emb" in sd:
        _set(params, ("null_cond_emb",), _np(sd["null_cond_emb"]).reshape(-1))

    for i in range(num_levels):
        _convert_resnet_block(params, (f"downs_{i}_block1",), sd, f"downs.{i}.0")
        _convert_resnet_block(params, (f"downs_{i}_block2",), sd, f"downs.{i}.1")
        _convert_prenorm_attn(params, (f"downs_{i}_spatial_attn",), sd, f"downs.{i}.2", "linear")
        _convert_prenorm_attn(params, (f"downs_{i}_temporal_attn",), sd, f"downs.{i}.3", "temporal")
        if f"downs.{i}.4.weight" in sd:
            _set(params, (f"downs_{i}_downsample", "conv", "kernel"), _conv3d_as2d_w(sd[f"downs.{i}.4.weight"]))
            _set(params, (f"downs_{i}_downsample", "conv", "bias"), _np(sd[f"downs.{i}.4.bias"]))

    _convert_resnet_block(params, ("mid_block1",), sd, "mid_block1")
    _convert_prenorm_attn(params, ("mid_spatial_attn",), sd, "mid_spatial_attn", "spatial")
    _convert_prenorm_attn(params, ("mid_temporal_attn",), sd, "mid_temporal_attn", "temporal")
    _convert_resnet_block(params, ("mid_block2",), sd, "mid_block2")

    for i in range(num_levels):
        _convert_resnet_block(params, (f"ups_{i}_block1",), sd, f"ups.{i}.0")
        _convert_resnet_block(params, (f"ups_{i}_block2",), sd, f"ups.{i}.1")
        _convert_prenorm_attn(params, (f"ups_{i}_spatial_attn",), sd, f"ups.{i}.2", "linear")
        _convert_prenorm_attn(params, (f"ups_{i}_temporal_attn",), sd, f"ups.{i}.3", "temporal")
        if use_deconv:
            if f"ups.{i}.4.weight" in sd:
                _set(params, (f"ups_{i}_upsample", "kernel"), _deconv3d_as2d_w(sd[f"ups.{i}.4.weight"]))
                _set(params, (f"ups_{i}_upsample", "bias"), _np(sd[f"ups.{i}.4.bias"]))
        else:
            if f"ups.{i}.4.1.weight" in sd:
                _set(params, (f"ups_{i}_upsample", "conv", "kernel"), _conv3d_as2d_w(sd[f"ups.{i}.4.1.weight"]))
                _set(params, (f"ups_{i}_upsample", "conv", "bias"), _np(sd[f"ups.{i}.4.1.bias"]))

    _convert_resnet_block(params, ("final_block",), sd, "final_conv.0")
    _set(params, ("final_conv", "kernel"), _conv3d_w(sd["final_conv.1.weight"]))
    _set(params, ("final_conv", "bias"), _np(sd["final_conv.1.bias"]))
    _convert_resnet_block(params, ("occlusion_block",), sd, "occlusion_map.0")
    _set(params, ("occlusion_conv", "kernel"), _conv3d_w(sd["occlusion_map.1.weight"]))
    _set(params, ("occlusion_conv", "bias"), _np(sd["occlusion_map.1.bias"]))
    return {"params": params}
