"""End-to-end FlowDiffusion pseudo-ground-truth parity vs the torch oracle.

Pins the full stage-2 data protocol: frames -> frozen LFAE -> latent flow
volume (reference FlowDiffusion.forward pseudo-GT path,
DM/modules/video_flow_diffusion_model.py:116-143) including the latent
codec (residual flow + conf normalization, :146-157) — on identical
weights shipped through the real torch-checkpoint importer
(`load_lfae_from_torch`), exactly the production loading path.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.ref_oracle import aligned_svd, install_dm_stubs

install_dm_stubs()

from LFAE.modules import region_predictor as ref_rp  # noqa: E402
from LFAE.modules import bg_motion_predictor as ref_bg  # noqa: E402
from LFAE.modules import generator as ref_gen  # noqa: E402
from DM.modules import video_flow_diffusion_model as ref_fdm  # noqa: E402

from cvpr23_lfdm_tpu.config import (  # noqa: E402
    BGPredictorConfig, DiffusionConfig, GeneratorConfig, LFAEConfig,
    PixelwiseFlowConfig, RegionPredictorConfig,
)
from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion  # noqa: E402
from cvpr23_lfdm_tpu.utils.checkpoint import load_lfae_from_torch  # noqa: E402

K, IMG = 4, 64  # latent = IMG/4 = 16
B, F = 2, 4
BE, MF, NB = 8, 64, 3

REGION_PARAMS = dict(
    block_expansion=BE, max_features=MF, num_blocks=NB, temperature=0.1,
    scale_factor=0.25, pca_based=True, pad=3,
)
BG_PARAMS = dict(block_expansion=BE, max_features=MF, num_blocks=NB, bg_type="affine")
PF_PARAMS = dict(
    block_expansion=BE, max_features=MF, num_blocks=NB, scale_factor=0.25,
    use_deformed_source=True, use_covar_heatmap=True, estimate_occlusion_map=True,
)
GEN_PARAMS = dict(
    block_expansion=16, max_features=64, num_down_blocks=2,
    num_bottleneck_blocks=2, skips=True,
    pixelwise_flow_predictor_params=PF_PARAMS,
)


def _tiny_lfae_cfg() -> LFAEConfig:
    return LFAEConfig(
        num_regions=K,
        frame_shape=IMG,
        region_predictor=RegionPredictorConfig(num_regions=K, **REGION_PARAMS),
        bg_predictor=BGPredictorConfig(**BG_PARAMS),
        generator=GeneratorConfig(
            block_expansion=16, max_features=64, num_down_blocks=2,
            num_bottleneck_blocks=2, skips=True,
            pixelwise_flow=PixelwiseFlowConfig(region_var=0.01, **PF_PARAMS),
        ),
    )


def _tiny_diff_cfg(**kw) -> DiffusionConfig:
    return DiffusionConfig(
        img_size=IMG // 4, num_frames=F, timesteps=20, sampling_timesteps=5,
        dim=16, dim_mults=(1,), attn_heads=2, attn_dim_head=8, cond_dim=16,
        compute_dtype="float32", **kw,
    )


@pytest.fixture(scope="module")
def lfae_ckpt_path(tmp_path_factory):
    """Random tiny torch LFAE, BN-warmed, saved in the reference's
    RegionMM.pth layout (LFAE/train.py:134-142)."""
    torch.manual_seed(7)
    region = ref_rp.RegionPredictor(
        num_regions=K, num_channels=3, estimate_affine=True, **REGION_PARAMS
    )
    bg = ref_bg.BGMotionPredictor(num_channels=3, **BG_PARAMS)
    gen = ref_gen.Generator(
        num_regions=K, num_channels=3, revert_axis_swap=True, **GEN_PARAMS
    )
    # warm BN running stats so eval-mode normalization is non-trivial
    rng = np.random.RandomState(0)
    x = torch.from_numpy(
        rng.rand(2, 3, IMG, IMG).astype(np.float32)
    )
    region.train(), bg.train(), gen.train()
    with torch.no_grad():
        rp = region(x)
        bg_m = bg(x, x)
        gen(x, rp, rp, bg_m)
    path = tmp_path_factory.mktemp("ckpt") / "RegionMM.pth"
    torch.save(
        {
            "generator": gen.state_dict(),
            "region_predictor": region.state_dict(),
            "bg_predictor": bg.state_dict(),
        },
        str(path),
    )
    return str(path)


@pytest.fixture(scope="module")
def ref_config_path(tmp_path_factory):
    import yaml

    cfg = {
        "model_params": {
            "num_regions": K,
            "num_channels": 3,
            "estimate_affine": True,
            "revert_axis_swap": True,
            "region_predictor_params": REGION_PARAMS,
            "bg_predictor_params": BG_PARAMS,
            "generator_params": GEN_PARAMS,
        }
    }
    path = tmp_path_factory.mktemp("cfg") / "tiny.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


@pytest.fixture(scope="module")
def ref_model(lfae_ckpt_path, ref_config_path):
    """Reference FlowDiffusion with the frozen tiny LFAE loaded from the
    checkpoint (is_train=False -> forward() computes only the pseudo-GT)."""
    torch.manual_seed(8)
    return ref_fdm.FlowDiffusion(
        img_size=IMG // 4, num_frames=F, sampling_timesteps=5, timesteps=20,
        dim_mults=(1,), is_train=False,
        pretrained_pth=lfae_ckpt_path, config_pth=ref_config_path,
    )


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.RandomState(11)
    real_vid = rng.rand(B, F, IMG, IMG, 3).astype(np.float32)
    ref_img = real_vid[:, 0]
    return ref_img, real_vid


def _run_reference(ref_model, inputs, monkeypatch):
    ref_img, real_vid = inputs
    monkeypatch.setattr(ref_rp, "svd", aligned_svd)
    t_vid = torch.from_numpy(np.transpose(real_vid, (0, 4, 1, 2, 3)))
    t_ref = torch.from_numpy(np.transpose(ref_img, (0, 3, 1, 2)))
    ref_model.set_train_input(ref_img=t_ref, real_vid=t_vid, ref_text=["x"] * B)
    with torch.no_grad():
        ref_model.forward()
    return ref_model


def _vol_nhwc(t: torch.Tensor) -> np.ndarray:
    # [B, C, F, h, w] -> [B, F, h, w, C]
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


def test_pseudo_ground_truth_parity(ref_model, lfae_ckpt_path, inputs, monkeypatch):
    ref_img, real_vid = inputs
    ref = _run_reference(ref_model, inputs, monkeypatch)

    lfae_cfg = _tiny_lfae_cfg()
    model = FlowDiffusion(lfae_cfg, _tiny_diff_cfg())
    lfae_vars = jax.tree.map(
        jnp.asarray, load_lfae_from_torch(lfae_ckpt_path, lfae_cfg)
    )
    gt = jax.jit(model.pseudo_ground_truth)(
        lfae_vars, jnp.asarray(ref_img), jnp.asarray(real_vid)
    )

    np.testing.assert_allclose(
        np.asarray(gt["vid_grid"]), _vol_nhwc(ref.real_vid_grid), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(gt["vid_conf"]), _vol_nhwc(ref.real_vid_conf), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(gt["out_vid"]), _vol_nhwc(ref.real_out_vid), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gt["warped_vid"]), _vol_nhwc(ref.real_warped_vid), atol=1e-4
    )
    fea_ref = np.transpose(ref.ref_img_fea.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(gt["ref_fea"]), fea_ref, atol=5e-5)


@pytest.mark.parametrize("use_residual_flow", [False, True])
def test_latent_codec_parity(ref_model, inputs, monkeypatch, use_residual_flow):
    """encode_latent == torch.cat((grid [- identity], conf*2-1), dim=1)
    (video_flow_diffusion_model.py:146-157) and decode_latent inverts it
    (:163-166)."""
    ref = _run_reference(ref_model, inputs, monkeypatch)
    h = IMG // 4
    grid_t, conf_t = ref.real_vid_grid, ref.real_vid_conf
    if use_residual_flow:
        identity = ref.get_grid(B, F, h, h, normalize=True)
        ref_latent = torch.cat((grid_t - identity, conf_t * 2 - 1), dim=1)
    else:
        ref_latent = torch.cat((grid_t, conf_t * 2 - 1), dim=1)

    model = FlowDiffusion(
        _tiny_lfae_cfg(), _tiny_diff_cfg(use_residual_flow=use_residual_flow)
    )
    vid_grid = jnp.asarray(_vol_nhwc(grid_t))
    vid_conf = jnp.asarray(_vol_nhwc(conf_t))
    ours = model.encode_latent(vid_grid, vid_conf)
    np.testing.assert_allclose(
        np.asarray(ours), _vol_nhwc(ref_latent), atol=1e-6
    )
    back_grid, back_conf = model.decode_latent(ours)
    np.testing.assert_allclose(np.asarray(back_grid), np.asarray(vid_grid), atol=1e-6)
    np.testing.assert_allclose(np.asarray(back_conf), np.asarray(vid_conf), atol=1e-6)


def test_pseudo_ground_truth_bf16_close(lfae_ckpt_path, inputs):
    """The opt-in bfloat16 pseudo-GT pass (`--lfae-dtype bfloat16`,
    trades target precision for frozen-LFAE conv throughput) must stay
    within bf16 rounding of the float32 reference numerics — flows and
    conf live in [-1, 1], so absolute drift ~1e-2 is the expected bf16
    envelope, not a silent divergence."""
    ref_img, real_vid = inputs
    lfae_f32 = _tiny_lfae_cfg()
    lfae_bf16 = dataclasses.replace(lfae_f32, compute_dtype="bfloat16")
    vars_f32 = jax.tree.map(
        jnp.asarray, load_lfae_from_torch(lfae_ckpt_path, lfae_f32)
    )

    gt32 = jax.jit(
        FlowDiffusion(lfae_f32, _tiny_diff_cfg()).pseudo_ground_truth
    )(vars_f32, jnp.asarray(ref_img), jnp.asarray(real_vid))
    gt16 = jax.jit(
        FlowDiffusion(lfae_bf16, _tiny_diff_cfg()).pseudo_ground_truth
    )(vars_f32, jnp.asarray(ref_img), jnp.asarray(real_vid))

    for key, atol in [("vid_grid", 2e-2), ("vid_conf", 2e-2),
                      ("ref_fea", 0.15)]:
        a, b = np.asarray(gt16[key], np.float32), np.asarray(gt32[key])
        np.testing.assert_allclose(a, b, atol=atol, err_msg=key)
