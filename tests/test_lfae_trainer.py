"""LFAE trainer tests: TPS transform parity + end-to-end train steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cvpr23_lfdm_tpu.train.losses import TPSTransform


# ------------------------------------------------------- TPS parity vs torch


@pytest.fixture(scope="module")
def torch_transform():
    """Reference Transform (LFAE/modules/model.py:82-134) with injected
    parameters so both frameworks use identical randomness."""
    import torch

    rng = np.random.default_rng(0)
    bs, points = 2, 5
    theta = np.eye(2, 3)[None] + 0.05 * rng.standard_normal((bs, 2, 3))
    cparams = 0.005 * rng.standard_normal((bs, points**2))

    class RefTransform:
        def __init__(self):
            from tests.conftest import add_reference_to_path

            add_reference_to_path()
            from LFAE.modules.util import make_coordinate_grid

            self.theta = torch.tensor(theta, dtype=torch.float32)
            self.control_points = make_coordinate_grid(
                (points, points), type=self.theta.type()
            ).unsqueeze(0)
            self.control_params = torch.tensor(
                cparams[:, None], dtype=torch.float32
            )

        def warp(self, coords):
            th = self.theta.unsqueeze(1)
            out = (
                torch.matmul(th[:, :, :, :2], coords.unsqueeze(-1)) + th[:, :, :, 2:]
            ).squeeze(-1)
            dist = (
                coords.view(coords.shape[0], -1, 1, 2)
                - self.control_points.view(1, 1, -1, 2)
            ).abs().sum(-1)
            res = dist**2 * torch.log(dist + 1e-6) * self.control_params
            return out + res.sum(2).view(coords.shape[0], coords.shape[1], 1)

        def jacobian(self, coords):
            from torch.autograd import grad

            coords = coords.requires_grad_(True)
            new = self.warp(coords)
            gx = grad(new[..., 0].sum(), coords, create_graph=True)[0]
            gy = grad(new[..., 1].sum(), coords, create_graph=True)[0]
            return torch.cat([gx.unsqueeze(-2), gy.unsqueeze(-2)], dim=-2)

    jax_t = TPSTransform(
        theta=jnp.asarray(theta, jnp.float32),
        control_points=None,  # filled below from the same grid convention
        control_params=jnp.asarray(cparams, jnp.float32),
    )
    from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid as jax_grid

    jax_t = TPSTransform(
        jax_t.theta, jax_grid((points, points)).reshape(-1, 2), jax_t.control_params
    )
    return RefTransform(), jax_t


def test_tps_warp_matches_reference(torch_transform):
    import torch

    ref, ours = torch_transform
    coords = np.random.default_rng(1).uniform(-1, 1, (2, 7, 2)).astype(np.float32)
    ref_out = ref.warp(torch.tensor(coords)).detach().numpy()
    jax_out = np.asarray(ours.warp_coordinates(jnp.asarray(coords)))
    np.testing.assert_allclose(jax_out, ref_out, atol=1e-5)


def test_tps_jacobian_matches_reference_autograd(torch_transform):
    import torch

    ref, ours = torch_transform
    coords = np.random.default_rng(2).uniform(-0.9, 0.9, (2, 5, 2)).astype(np.float32)
    ref_j = ref.jacobian(torch.tensor(coords)).detach().numpy()
    jax_j = np.asarray(ours.jacobian(jnp.asarray(coords)))
    np.testing.assert_allclose(jax_j, ref_j, atol=1e-4)


# --------------------------------------- equivariance loss end-to-end parity


def test_equivariance_losses_match_reference_end_to_end(monkeypatch):
    """Full composition vs the reference (LFAE/modules/model.py:189-215):
    TPS-warp the driving frame (reflection grid_sample), region-predict it
    with weight-identical nets, compute shift+affine equivariance losses."""
    import torch

    from tests.conftest import add_reference_to_path

    add_reference_to_path()
    from tests.ref_oracle import aligned_svd, sd_numpy, nchw
    from LFAE.modules import region_predictor as ref_rp
    from LFAE.modules.model import Transform

    from cvpr23_lfdm_tpu.models.region_predictor import RegionPredictor
    from cvpr23_lfdm_tpu.train.losses import equivariance_losses
    from cvpr23_lfdm_tpu.utils import torch_convert as tc

    K, IMG, BE, MF, NB = 4, 64, 8, 64, 3
    torch.manual_seed(3)
    ref = ref_rp.RegionPredictor(
        block_expansion=BE, num_regions=K, num_channels=3, max_features=MF,
        num_blocks=NB, temperature=0.1, estimate_affine=True,
        scale_factor=0.25, pca_based=True, pad=3,
    )
    ref.eval()
    monkeypatch.setattr(ref_rp, "svd", aligned_svd)

    ours = RegionPredictor(
        num_regions=K, block_expansion=BE, max_features=MF, num_blocks=NB,
        temperature=0.1, scale_factor=0.25, pca_based=True, pad=3,
    )
    variables = jax.tree.map(
        jnp.asarray, tc.convert_region_predictor(sd_numpy(ref), num_blocks=NB)
    )

    rng = np.random.default_rng(7)
    bs, points = 2, 5
    driving = rng.random((bs, IMG, IMG, 3)).astype(np.float32)
    theta = (np.eye(2, 3)[None] + 0.05 * rng.standard_normal((bs, 2, 3))).astype(
        np.float32
    )
    cparams = (0.005 * rng.standard_normal((bs, points**2))).astype(np.float32)

    # ---- reference path (model.py:189-215)
    t = Transform(bs, sigma_affine=0.05, sigma_tps=0.005, points_tps=points)
    t.theta = torch.from_numpy(theta)
    t.control_params = torch.from_numpy(cparams[:, None])
    with torch.no_grad():
        dri_t = nchw(driving)
        transformed_frame = t.transform_frame(dri_t)
        d_params = ref(dri_t)
        tr_params = ref(transformed_frame)
    shift_ref = torch.abs(
        d_params["shift"] - t.warp_coordinates(tr_params["shift"])
    ).mean()
    jac = t.jacobian(tr_params["shift"].clone().requires_grad_(True))
    affine_tr = torch.matmul(jac, tr_params["affine"])
    value = torch.matmul(torch.inverse(d_params["affine"]), affine_tr)
    value = value * torch.sign(value[:, :, 0:1, 0:1])
    affine_ref = torch.abs(torch.eye(2).view(1, 1, 2, 2) - value).mean()

    # ---- ours
    from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid

    transform = TPSTransform(
        jnp.asarray(theta),
        make_coordinate_grid((points, points)).reshape(-1, 2),
        jnp.asarray(cparams),
    )
    transformed_ours = transform.transform_frame(jnp.asarray(driving))
    d_ours = ours.apply(variables, jnp.asarray(driving), train=False)
    tr_ours = ours.apply(variables, transformed_ours, train=False)
    shift_l, affine_l = equivariance_losses(
        d_ours, tr_ours, transform, revert_axis_swap=True
    )
    np.testing.assert_allclose(float(shift_l), float(shift_ref), atol=2e-4)
    np.testing.assert_allclose(float(affine_l), float(affine_ref), atol=2e-3)


# ----------------------------------------------------------- trainer smoke


def test_lfae_train_steps_run_and_update():
    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.train.lfae_trainer import LFAETrainer
    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features

    cfg = _tiny_config(num_frames=4)
    vgg_vars = jax.jit(
        lambda r: Vgg19Features().init(r, jnp.zeros((1, 64, 64, 3)))
    )(jax.random.PRNGKey(0))
    trainer = LFAETrainer(cfg, steps_per_epoch=10, vgg_vars=vgg_vars)
    state = trainer.init_state(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((8, 64, 64, 3), np.float32),
        "driving": rng.random((8, 64, 64, 3), np.float32),
    }
    old_stats = jax.device_get(state.batch_stats)
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(2), batch)
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(3), batch)
    m = jax.device_get(metrics)
    assert np.isfinite(m["total"])
    assert np.isfinite(m["perceptual"])
    assert int(jax.device_get(state.step)) == 2
    # batch stats actually mutated (train-mode BN)
    new_stats = jax.device_get(state.batch_stats)
    leaf_old = jax.tree_util.tree_leaves(old_stats)[0]
    leaf_new = jax.tree_util.tree_leaves(new_stats)[0]
    assert not np.allclose(leaf_old, leaf_new)


def test_lfae_reconstruct_eval_path():
    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.train.lfae_trainer import LFAETrainer
    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features

    cfg = _tiny_config(num_frames=4)
    vgg_vars = jax.jit(
        lambda r: Vgg19Features().init(r, jnp.zeros((1, 64, 64, 3)))
    )(jax.random.PRNGKey(0))
    trainer = LFAETrainer(cfg, steps_per_epoch=10, vgg_vars=vgg_vars)
    state = trainer.init_state(jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    src = rng.random((2, 64, 64, 3), np.float32)
    dri = rng.random((2, 64, 64, 3), np.float32)
    out = trainer.reconstruct(state, src, dri)
    assert out["prediction"].shape == (2, 64, 64, 3)
    assert np.isfinite(np.asarray(out["prediction"])).all()
