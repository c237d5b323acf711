"""Weight-identical parity: Unet3D + GaussianDiffusion vs torch reference."""

import numpy as np
import dataclasses
import jax
import jax.numpy as jnp
import pytest
import torch

from tests.ref_oracle import install_dm_stubs, sd_numpy

install_dm_stubs()

from DM.modules import video_flow_diffusion as ref_dm  # noqa: E402

from cvpr23_lfdm_tpu.models.unet3d import Unet3D  # noqa: E402
from cvpr23_lfdm_tpu.diffusion.schedule import DiffusionSchedule  # noqa: E402
from cvpr23_lfdm_tpu.diffusion.gaussian_diffusion import GaussianDiffusion  # noqa: E402
from cvpr23_lfdm_tpu.utils import torch_convert as tc  # noqa: E402

# tiny but structurally complete: 2 levels, 4 frames, 8x8 latents
DIM, MULTS, HEADS, DH = 16, (1, 2), 2, 8
COND = 16
B, F, HW = 2, 4, 8
CIN = 3 + 6  # latent 3 + fea 6


def _to_torch_video(x_jax_layout: np.ndarray) -> torch.Tensor:
    # [B,F,H,W,C] -> [B,C,F,H,W]
    return torch.from_numpy(np.transpose(x_jax_layout, (0, 4, 1, 2, 3)))


def _from_torch_video(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))


@pytest.fixture(scope="module", params=[True, False], ids=["deconv", "upconv"])
def unet_pair(request):
    use_deconv = request.param
    torch.manual_seed(0)
    ref = ref_dm.Unet3D(
        dim=DIM, cond_dim=COND, out_grid_dim=2, out_conf_dim=1, dim_mults=MULTS,
        channels=CIN, attn_heads=HEADS, attn_dim_head=DH,
        use_bert_text_cond=False, learn_null_cond=False,
        use_deconv=use_deconv, padding_mode="reflect",
    )
    ref.eval()
    ours = Unet3D(
        dim=DIM, cond_dim=COND, dim_mults=MULTS, attn_heads=HEADS,
        attn_dim_head=DH, learn_null_cond=False, use_deconv=use_deconv,
        padding_mode="reflect",
    )
    variables = jax.tree.map(
        jnp.asarray, tc.convert_unet3d(sd_numpy(ref), num_levels=len(MULTS),
                                       use_deconv=use_deconv)
    )
    return ref, ours, variables


def test_unet3d_parity(unet_pair):
    ref, ours, variables = unet_pair
    rng = np.random.RandomState(0)
    x = rng.randn(B, F, HW, HW, CIN).astype(np.float32)
    t = np.array([3, 7], dtype=np.int64)
    cond = rng.randn(B, COND).astype(np.float32)

    with torch.no_grad():
        theirs = ref(
            _to_torch_video(x), torch.from_numpy(t),
            cond=torch.from_numpy(cond), null_cond_prob=0.0,
        )
    out = ours.apply(
        variables, jnp.asarray(x[..., :3]), jnp.asarray(t), jnp.asarray(cond),
        jnp.zeros((B,), bool), fea=jnp.asarray(x[..., 3:]),
    )
    np.testing.assert_allclose(np.asarray(out), _from_torch_video(theirs), atol=2e-4)


def test_unet3d_focus_present_mask(unet_pair):
    """Arrested temporal attention matches the reference's
    focus_present_mask path (video_flow_diffusion.py:342-352)."""
    ref, ours, variables = unet_pair
    rng = np.random.RandomState(2)
    x = rng.randn(B, F, HW, HW, CIN).astype(np.float32)
    t = np.array([1, 9], dtype=np.int64)
    cond = rng.randn(B, COND).astype(np.float32)
    mask = np.array([True, False])

    with torch.no_grad():
        theirs = ref(
            _to_torch_video(x), torch.from_numpy(t),
            cond=torch.from_numpy(cond), null_cond_prob=0.0,
            focus_present_mask=torch.from_numpy(mask),
        )
    out = ours.apply(
        variables, jnp.asarray(x[..., :3]), jnp.asarray(t), jnp.asarray(cond),
        jnp.zeros((B,), bool), focus_present_mask=jnp.asarray(mask),
        fea=jnp.asarray(x[..., 3:]),
    )
    np.testing.assert_allclose(np.asarray(out), _from_torch_video(theirs), atol=2e-4)


def test_unet3d_null_cond_mask(unet_pair):
    """Forced null rows equal the reference's none_cond_mask path."""
    ref, ours, variables = unet_pair
    rng = np.random.RandomState(1)
    x = rng.randn(B, F, HW, HW, CIN).astype(np.float32)
    t = np.array([0, 15], dtype=np.int64)
    cond = rng.randn(B, COND).astype(np.float32)
    mask = np.array([True, False])

    with torch.no_grad():
        theirs = ref(
            _to_torch_video(x), torch.from_numpy(t),
            cond=torch.from_numpy(cond), null_cond_prob=0.0,
            none_cond_mask=mask.tolist(),
        )
    out = ours.apply(
        variables, jnp.asarray(x[..., :3]), jnp.asarray(t), jnp.asarray(cond),
        jnp.asarray(mask), fea=jnp.asarray(x[..., 3:]),
    )
    np.testing.assert_allclose(np.asarray(out), _from_torch_video(theirs), atol=2e-4)


@pytest.fixture(scope="module")
def diffusion_pair(unet_pair):
    ref_unet, ours_unet, variables = unet_pair
    T = 20
    ref_diff = ref_dm.GaussianDiffusion(
        ref_unet, image_size=HW, num_frames=F, channels=3, timesteps=T,
        sampling_timesteps=5, loss_type="l2", use_dynamic_thres=True,
        null_cond_prob=0.0, ddim_sampling_eta=1.0,
    )
    ref_diff.eval()
    mine = GaussianDiffusion(
        schedule=DiffusionSchedule.create(T), timesteps=T, sampling_timesteps=5,
        ddim_sampling_eta=1.0, loss_type="l2", use_dynamic_thres=True,
        null_cond_prob=0.0,
    )

    def denoise(x, t, cond, null_mask, fea):
        return ours_unet.apply(variables, x, t, cond, null_mask, fea=fea)

    return ref_diff, mine, denoise


def test_schedule_matches_reference(diffusion_pair):
    ref_diff, mine, _ = diffusion_pair
    for name in [
        "betas", "alphas_cumprod", "alphas_cumprod_prev", "sqrt_alphas_cumprod",
        "sqrt_one_minus_alphas_cumprod", "sqrt_recip_alphas_cumprod",
        "sqrt_recipm1_alphas_cumprod", "posterior_variance",
        "posterior_log_variance_clipped", "posterior_mean_coef1",
        "posterior_mean_coef2",
    ]:
        np.testing.assert_allclose(
            np.asarray(getattr(mine.schedule, name)),
            getattr(ref_diff, name).numpy(),
            atol=1e-6,
            err_msg=name,
        )


def test_p_losses_parity(diffusion_pair, monkeypatch):
    ref_diff, mine, denoise = diffusion_pair
    rng = np.random.RandomState(2)
    x0 = np.tanh(rng.randn(B, F, HW, HW, 3)).astype(np.float32)
    fea = rng.randn(B, HW, HW, CIN - 3).astype(np.float32)
    noise = rng.randn(B, F, HW, HW, 3).astype(np.float32)
    t = np.array([5, 17], dtype=np.int64)
    cond = rng.randn(B, COND).astype(np.float32)
    texts = ["alpha", "None"]

    # fake bert: "alpha" -> cond[0], "None" -> cond[1] (value irrelevant,
    # row is forced to null); patches reference module-level imports.
    monkeypatch.setattr(ref_dm, "tokenize", lambda txts: txts)
    monkeypatch.setattr(
        ref_dm, "bert_embed",
        lambda txts, return_cls_repr=False: torch.from_numpy(cond),
    )

    fea_torch = torch.from_numpy(np.transpose(fea, (0, 3, 1, 2)))
    fea_rep = fea_torch.unsqueeze(2).repeat(1, 1, F, 1, 1)
    with torch.no_grad():
        ref_loss = ref_diff.p_losses(
            _to_torch_video(x0), torch.from_numpy(t), fea_rep, cond=texts,
            noise=_to_torch_video(noise),
        )
    ref_pred_x0 = _from_torch_video(ref_diff.pred_x0)

    none_mask = jnp.asarray([txt == "None" for txt in texts])
    loss, aux = mine.p_losses(
        denoise, jax.random.PRNGKey(0), jnp.asarray(x0), jnp.asarray(fea),
        cond=jnp.asarray(cond), none_cond_mask=none_mask,
        t=jnp.asarray(t), noise=jnp.asarray(noise),
    )
    np.testing.assert_allclose(float(loss), float(ref_loss), atol=2e-5)
    np.testing.assert_allclose(np.asarray(aux["pred_x0"]), ref_pred_x0, atol=5e-4)


def test_ddim_sample_parity(diffusion_pair, monkeypatch):
    ref_diff, mine, denoise = diffusion_pair
    rng = np.random.RandomState(3)
    fea = rng.randn(1, HW, HW, CIN - 3).astype(np.float32)
    cond = rng.randn(1, COND).astype(np.float32)
    shape = (1, F, HW, HW, 3)
    init = rng.randn(*shape).astype(np.float32)
    t_cur, _ = mine.ddim_times()
    n_steps = int(t_cur.shape[0])
    noises = rng.randn(n_steps, *shape).astype(np.float32)

    # feed the same gaussians to the torch loop
    noise_iter = iter([init] + [noises[i] for i in range(n_steps)])
    fake = lambda *a, **k: _to_torch_video(next(noise_iter))
    monkeypatch.setattr(torch, "randn", fake)
    monkeypatch.setattr(torch, "randn_like", fake)

    fea_torch = torch.from_numpy(np.transpose(fea, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_img = ref_diff.ddim_sample(
            fea_torch, (1, 3, F, HW, HW), cond=torch.from_numpy(cond),
            cond_scale=1.0,
        )
    ours_img = mine.ddim_sample(
        denoise, jax.random.PRNGKey(0), shape, jnp.asarray(fea),
        cond=jnp.asarray(cond), cond_scale=1.0,
        init_img=jnp.asarray(init), noise_seq=jnp.asarray(noises),
    )
    np.testing.assert_allclose(
        np.asarray(ours_img), _from_torch_video(ref_img), atol=2e-3
    )


def test_ddim_cond_scale_2_parity(diffusion_pair, monkeypatch):
    """cond_scale=2 exercises the batched CFG double-eval."""
    ref_diff, mine, denoise = diffusion_pair
    rng = np.random.RandomState(4)
    fea = rng.randn(1, HW, HW, CIN - 3).astype(np.float32)
    cond = rng.randn(1, COND).astype(np.float32)
    shape = (1, F, HW, HW, 3)
    init = rng.randn(*shape).astype(np.float32)
    t_cur, _ = mine.ddim_times()
    n_steps = int(t_cur.shape[0])
    noises = rng.randn(n_steps, *shape).astype(np.float32)

    noise_iter = iter([init] + [noises[i] for i in range(n_steps)])
    fake = lambda *a, **k: _to_torch_video(next(noise_iter))
    monkeypatch.setattr(torch, "randn", fake)
    monkeypatch.setattr(torch, "randn_like", fake)

    fea_torch = torch.from_numpy(np.transpose(fea, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_img = ref_diff.ddim_sample(
            fea_torch, (1, 3, F, HW, HW), cond=torch.from_numpy(cond),
            cond_scale=2.0,
        )
    ours_img = mine.ddim_sample(
        denoise, jax.random.PRNGKey(0), shape, jnp.asarray(fea),
        cond=jnp.asarray(cond), cond_scale=2.0,
        init_img=jnp.asarray(init), noise_seq=jnp.asarray(noises),
    )
    np.testing.assert_allclose(
        np.asarray(ours_img), _from_torch_video(ref_img), atol=2e-3
    )


def test_interpolate_parity(diffusion_pair, monkeypatch):
    """GaussianDiffusion.interpolate vs the reference (:832-846).

    The reference's interpolate is dead code — it calls
    `self.p_sample(img, t)` without the required `fea` argument and would
    TypeError. The oracle here wraps p_sample to supply fea/cond (the
    obvious intended call), which is exactly the repaired semantics our
    implementation ships."""
    ref_diff, mine, denoise = diffusion_pair
    T_INTERP = 7
    rng = np.random.RandomState(6)
    fea = rng.randn(1, HW, HW, CIN - 3).astype(np.float32)
    cond = rng.randn(1, COND).astype(np.float32)
    shape = (1, F, HW, HW, 3)
    x1 = np.tanh(rng.randn(*shape)).astype(np.float32)
    x2 = np.tanh(rng.randn(*shape)).astype(np.float32)
    noise1 = rng.randn(*shape).astype(np.float32)
    noise2 = rng.randn(*shape).astype(np.float32)
    noises = rng.randn(T_INTERP, *shape).astype(np.float32)

    # q_sample(x1), q_sample(x2), then one randn_like per ancestral step
    noise_iter = iter([noise1, noise2] + [noises[i] for i in range(T_INTERP)])
    fake = lambda *a, **k: _to_torch_video(next(noise_iter))
    monkeypatch.setattr(torch, "randn", fake)
    monkeypatch.setattr(torch, "randn_like", fake)

    fea_torch = torch.from_numpy(np.transpose(fea, (0, 3, 1, 2)))
    orig_p_sample = ref_diff.p_sample
    monkeypatch.setattr(
        ref_diff, "p_sample",
        lambda x, t: orig_p_sample(
            x, t, fea_torch, cond=torch.from_numpy(cond), cond_scale=1.0
        ),
    )
    with torch.no_grad():
        ref_img = ref_diff.interpolate(
            _to_torch_video(x1), _to_torch_video(x2), t=T_INTERP, lam=0.3
        )
    ours_img = mine.interpolate(
        denoise, jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(fea), cond=jnp.asarray(cond), cond_scale=1.0,
        t=T_INTERP, lam=0.3,
        noise1=jnp.asarray(noise1), noise2=jnp.asarray(noise2),
        noise_seq=jnp.asarray(noises),
    )
    np.testing.assert_allclose(
        np.asarray(ours_img), _from_torch_video(ref_img), atol=2e-3
    )


def test_ddpm_p_sample_loop_parity(diffusion_pair, monkeypatch):
    ref_diff, mine, denoise = diffusion_pair
    T = mine.timesteps
    rng = np.random.RandomState(5)
    fea = rng.randn(1, HW, HW, CIN - 3).astype(np.float32)
    cond = rng.randn(1, COND).astype(np.float32)
    shape = (1, F, HW, HW, 3)
    init = rng.randn(*shape).astype(np.float32)
    noises = rng.randn(T, *shape).astype(np.float32)

    noise_iter = iter([init] + [noises[i] for i in range(T)])
    fake = lambda *a, **k: _to_torch_video(next(noise_iter))
    monkeypatch.setattr(torch, "randn", fake)
    monkeypatch.setattr(torch, "randn_like", fake)

    fea_torch = torch.from_numpy(np.transpose(fea, (0, 3, 1, 2)))
    with torch.no_grad():
        ref_img = ref_diff.p_sample_loop(
            fea_torch, (1, 3, F, HW, HW), cond=torch.from_numpy(cond),
            cond_scale=1.0,
        )
    ours_img = mine.p_sample_loop(
        denoise, jax.random.PRNGKey(0), shape, jnp.asarray(fea),
        cond=jnp.asarray(cond), cond_scale=1.0,
        init_img=jnp.asarray(init), noise_seq=jnp.asarray(noises),
    )
    np.testing.assert_allclose(
        np.asarray(ours_img), _from_torch_video(ref_img), atol=5e-3
    )
