"""Golden tests: eig2x2, antialias downsample, nearest upsample, avg pool."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from tests.conftest import add_reference_to_path
from cvpr23_lfdm_tpu.ops import (
    sqrt_psd_2x2, eigh_2x2, inv_2x2, AntiAliasDownsample,
    upsample_nearest_2x, avg_pool_2x2,
)
from cvpr23_lfdm_tpu.ops.eig2x2 import inv_3x3

add_reference_to_path()
from LFAE.modules import util as ref_util  # noqa: E402


def _random_psd(rng, n):
    m = rng.randn(n, 2, 2).astype(np.float32)
    return m @ m.transpose(0, 2, 1) + 0.01 * np.eye(2, dtype=np.float32)


def test_eigh_2x2_reconstruction_and_order():
    rng = np.random.RandomState(0)
    c = _random_psd(rng, 64)
    u, s = eigh_2x2(jnp.asarray(c))
    u, s = np.asarray(u), np.asarray(s)
    # eigenvalues descending, non-negative
    assert np.all(s[:, 0] >= s[:, 1] - 1e-6)
    assert np.all(s[:, 1] >= -1e-5)
    # U S U^T == C
    rec = np.einsum("nij,nj,nkj->nik", u, s, u)
    np.testing.assert_allclose(rec, c, atol=1e-4)
    # orthonormal columns
    eye = np.einsum("nji,njk->nik", u, u)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(2), eye.shape), atol=1e-5)


def test_eigenvalues_match_torch_svd():
    rng = np.random.RandomState(1)
    c = _random_psd(rng, 64)
    _, s = eigh_2x2(jnp.asarray(c))
    _, s_t, _ = torch.svd(torch.from_numpy(c))
    np.testing.assert_allclose(np.asarray(s), s_t.numpy(), atol=1e-4)


def test_sqrt_psd_outer_product():
    rng = np.random.RandomState(2)
    c = _random_psd(rng, 32)
    a = np.asarray(sqrt_psd_2x2(jnp.asarray(c)))
    np.testing.assert_allclose(a @ a.transpose(0, 2, 1), c, atol=1e-4)


def test_sqrt_psd_affine_product_sign_invariance():
    """The downstream consumer is src_affine @ inv(dri_affine) with the
    revert_axis_swap sign fix (pixelwise_flow_predictor.py:72-74). For
    nearby covariances this product must be close to identity regardless
    of the decomposition's sign convention."""
    rng = np.random.RandomState(3)
    c = _random_psd(rng, 16)
    c2 = c + 1e-3 * rng.randn(*c.shape).astype(np.float32)
    c2 = 0.5 * (c2 + c2.transpose(0, 2, 1))
    a1 = np.asarray(sqrt_psd_2x2(jnp.asarray(c)))
    a2 = np.asarray(sqrt_psd_2x2(jnp.asarray(c2)))
    prod = a1 @ np.asarray(inv_2x2(jnp.asarray(a2)))
    prod = prod * np.sign(prod[:, 0:1, 0:1])
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(2), prod.shape), atol=0.05)


def test_inv_2x2_and_3x3():
    rng = np.random.RandomState(4)
    m2 = rng.randn(10, 2, 2).astype(np.float32) + 2 * np.eye(2, dtype=np.float32)
    m3 = rng.randn(10, 3, 3).astype(np.float32) + 2 * np.eye(3, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(inv_2x2(jnp.asarray(m2))), np.linalg.inv(m2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(inv_3x3(jnp.asarray(m3))), np.linalg.inv(m3), atol=1e-4)


@pytest.mark.parametrize("scale", [0.25, 0.5])
def test_antialias_downsample_matches_reference(scale):
    rng = np.random.RandomState(5)
    x = rng.randn(2, 32, 32, 3).astype(np.float32)
    ours = np.asarray(AntiAliasDownsample(scale)(jnp.asarray(x)))
    ref = ref_util.AntiAliasInterpolation2d(3, scale)
    theirs = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    theirs = np.transpose(theirs.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_upsample_nearest_matches_torch():
    rng = np.random.RandomState(6)
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = np.transpose(F.interpolate(t, scale_factor=2).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(2, 8, 10, 3).astype(np.float32)
    ours = np.asarray(avg_pool_2x2(jnp.asarray(x)))
    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    theirs = np.transpose(F.avg_pool2d(t, 2).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_quantile_nonneg_matches_jnp_and_torch():
    """Sort-free order statistic == jnp.quantile == torch.quantile (the
    reference's dynamic-threshold op, video_flow_diffusion.py:722-726)."""
    from cvpr23_lfdm_tpu.ops.quantile import quantile_nonneg

    rng = np.random.RandomState(8)
    for n, q in [(7, 0.9), (100, 0.9), (1001, 0.995), (4096, 0.5), (33, 0.0)]:
        x = np.abs(rng.randn(3, n)).astype(np.float32)
        if n == 100:
            x = np.round(x, 1)  # duplicates
        ours = np.asarray(jax.jit(lambda a, qq=q: quantile_nonneg(a, qq))(jnp.asarray(x)))
        ref = np.asarray(jnp.quantile(jnp.asarray(x), q, axis=-1))
        np.testing.assert_allclose(ours, ref, atol=2e-6)
        theirs = torch.quantile(torch.from_numpy(x), q, dim=-1).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-6)
