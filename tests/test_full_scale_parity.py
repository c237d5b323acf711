"""FULL-SCALE end-to-end generation parity vs the torch reference.

The real MUG serving configuration — dim-64 UNet with mults (1,2,4,8),
128x128 input, 32x32 latent flow, 40 frames, 10-step DDIM, full-size
LFAE decode — run in BOTH frameworks on identical random weights and an
identical injected gaussian sequence, comparing the generated videos
(reference `sample_one_video`,
DM/modules/video_flow_diffusion_model.py:190-216). Also reports the bf16
serving-precision drift against our own fp32 output.

Opt-in (several minutes of CPU): RUN_FULL_PARITY=1 python -m pytest
tests/test_full_scale_parity.py -q
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.ref_oracle import install_dm_stubs, sd_numpy

install_dm_stubs()

from DM.modules import video_flow_diffusion_model as ref_fdm  # noqa: E402
from LFAE.modules import bg_motion_predictor as ref_bg  # noqa: E402
from LFAE.modules import generator as ref_gen  # noqa: E402
from LFAE.modules import region_predictor as ref_rp  # noqa: E402

from cvpr23_lfdm_tpu.config import DiffusionConfig, LFAEConfig  # noqa: E402
from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion  # noqa: E402
from cvpr23_lfdm_tpu.utils import torch_convert as tc  # noqa: E402
from cvpr23_lfdm_tpu.utils.checkpoint import load_lfae_from_torch  # noqa: E402

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_FULL_PARITY") != "1",
    reason="full-scale parity is opt-in: RUN_FULL_PARITY=1 (several min of CPU)",
)

IMG, LAT, F, COND = 128, 32, 40, 768

# the real MUG LFAE (config/mug128.yaml model_params — our LFAEConfig defaults)
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


@pytest.fixture(scope="module")
def full_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    region = ref_rp.RegionPredictor(
        num_regions=10, num_channels=3, estimate_affine=True, **REGION_PARAMS
    )
    bg = ref_bg.BGMotionPredictor(num_channels=3, **BG_PARAMS)
    gen = ref_gen.Generator(
        num_regions=10, num_channels=3, revert_axis_swap=True, **GEN_PARAMS
    )
    # warm the generator's BN running stats via the decode path (the only
    # stage-1 net the sampling path touches)
    rng = np.random.RandomState(1)
    src = torch.from_numpy(rng.rand(1, 3, IMG, IMG).astype(np.float32))
    flow = torch.from_numpy(rng.uniform(-1, 1, (1, LAT, LAT, 2)).astype(np.float32))
    occ = torch.from_numpy(rng.rand(1, 1, LAT, LAT).astype(np.float32))
    gen.train()
    with torch.no_grad():
        gen.forward_with_flow(src, flow, occ)
    gen.eval()
    path = tmp_path_factory.mktemp("full") / "RegionMM.pth"
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
def full_config_yaml(tmp_path_factory):
    import yaml

    cfg = {
        "model_params": {
            "num_regions": 10,
            "num_channels": 3,
            "estimate_affine": True,
            "revert_axis_swap": True,
            "region_predictor_params": REGION_PARAMS,
            "bg_predictor_params": BG_PARAMS,
            "generator_params": GEN_PARAMS,
        }
    }
    path = tmp_path_factory.mktemp("fullcfg") / "mug128.yaml"
    path.write_text(yaml.safe_dump(cfg))
    return str(path)


def test_full_scale_generation_parity(full_ckpt, full_config_yaml, monkeypatch):
    torch.manual_seed(2)
    ref = ref_fdm.FlowDiffusion(
        img_size=LAT, num_frames=F, sampling_timesteps=10, timesteps=1000,
        dim_mults=(1, 2, 4, 8), is_train=False,
        pretrained_pth=full_ckpt, config_pth=full_config_yaml,
    )
    ref.eval()

    rng = np.random.RandomState(3)
    ref_img = rng.rand(1, IMG, IMG, 3).astype(np.float32)
    cond = rng.randn(1, COND).astype(np.float32)
    shape = (1, F, LAT, LAT, 3)
    init = rng.randn(*shape).astype(np.float32)
    noises = rng.randn(10, *shape).astype(np.float32)

    to_vid = lambda x: torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    noise_iter = iter([init] + [noises[i] for i in range(10)])
    fake = lambda *a, **k: to_vid(next(noise_iter))
    monkeypatch.setattr(torch, "randn", fake)
    monkeypatch.setattr(torch, "randn_like", fake)

    ref.set_sample_input(
        sample_img=torch.from_numpy(np.transpose(ref_img, (0, 3, 1, 2))),
        sample_text=torch.from_numpy(cond),  # tensor -> bert bypassed
    )
    with torch.no_grad():
        ref.sample_one_video(cond_scale=1.0)

    vol = lambda t: np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))
    theirs = {
        "vid_grid": vol(ref.sample_vid_grid),
        "vid_conf": vol(ref.sample_vid_conf),
        "out_vid": vol(ref.sample_out_vid),
        "warped_vid": vol(ref.sample_warped_vid),
    }

    lfae_cfg = LFAEConfig()  # the MUG preset IS the default
    diff_cfg = DiffusionConfig(sampling_timesteps=10, compute_dtype="float32")
    model = FlowDiffusion(lfae_cfg, diff_cfg)
    lfae_vars = jax.tree.map(
        jnp.asarray, load_lfae_from_torch(full_ckpt, lfae_cfg)
    )
    unet_vars = jax.tree.map(
        jnp.asarray,
        tc.convert_unet3d(sd_numpy(ref.unet), num_levels=4, use_deconv=True),
    )

    run = jax.jit(
        lambda uv, lv, r, img, c, ini, seq: model.sample_video(
            uv, lv, r, img, c, 1.0, init_img=ini, noise_seq=seq
        )
    )
    ours = jax.device_get(
        run(
            unet_vars, lfae_vars, jax.random.PRNGKey(0),
            jnp.asarray(ref_img), jnp.asarray(cond),
            jnp.asarray(init), jnp.asarray(noises),
        )
    )

    # fp32 parity at the real serving scale
    np.testing.assert_allclose(
        ours["vid_grid"], theirs["vid_grid"], atol=5e-3, err_msg="latent flow"
    )
    np.testing.assert_allclose(
        ours["vid_conf"], theirs["vid_conf"], atol=5e-3, err_msg="confidence"
    )
    np.testing.assert_allclose(
        ours["out_vid"], theirs["out_vid"], atol=1e-2, err_msg="decoded video"
    )
    np.testing.assert_allclose(
        ours["warped_vid"], theirs["warped_vid"], atol=1e-2, err_msg="warped video"
    )

    # bf16 serving-precision drift, reported against our fp32 output
    model_bf16 = FlowDiffusion(
        lfae_cfg, DiffusionConfig(sampling_timesteps=10, compute_dtype="bfloat16")
    )
    run16 = jax.jit(
        lambda uv, lv, r, img, c, ini, seq: model_bf16.sample_video(
            uv, lv, r, img, c, 1.0, init_img=ini, noise_seq=seq
        )
    )
    ours16 = jax.device_get(
        run16(
            unet_vars, lfae_vars, jax.random.PRNGKey(0),
            jnp.asarray(ref_img), jnp.asarray(cond),
            jnp.asarray(init), jnp.asarray(noises),
        )
    )
    drift = float(np.abs(ours16["out_vid"] - ours["out_vid"]).max())
    mean_drift = float(np.abs(ours16["out_vid"] - ours["out_vid"]).mean())
    lat_drift = float(np.abs(ours16["vid_grid"] - ours["vid_grid"]).mean())
    print(
        f"\nbf16 serving drift vs fp32 (random weights): video max {drift:.4f} "
        f"mean {mean_drift:.5f}, latent-flow mean {lat_drift:.5f}"
    )
    # bound the MEAN: single pixels are discontinuous under warping (a bf16
    # eps nudges a latent flow value across a gather boundary), so the max
    # is reported, not bounded. Measured on random weights: mean ~0.033,
    # max ~0.66; trained weights drift less.
    assert mean_drift < 0.1, "bf16 mean drift out of expected envelope"
