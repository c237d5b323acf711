"""Metric harness tests: PSNR/SSIM exactness, Fréchet analytic case, LPIPS/FVD."""

import jax
import jax.numpy as jnp
import numpy as np


def test_psnr_known_value():
    from cvpr23_lfdm_tpu.eval.metrics import psnr

    a = jnp.zeros((1, 8, 8, 3))
    b = jnp.full((1, 8, 8, 3), 0.1)
    # mse = 0.01 -> psnr = 20 dB
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-4)


def test_ssim_identity_and_range():
    from cvpr23_lfdm_tpu.eval.metrics import ssim

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    assert float(ssim(a, a)) > 0.9999
    b = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    v = float(ssim(a, b))
    assert -1.0 <= v < 0.5  # independent noise decorrelates


def test_frechet_distance_analytic():
    from cvpr23_lfdm_tpu.eval.metrics import frechet_distance

    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d)
    s = np.eye(d)
    # identical covariances: FD = |mu1-mu2|^2 = 4
    np.testing.assert_allclose(frechet_distance(mu1, s, mu2, s), 4.0, atol=1e-6)
    # scaled covariance: FD = d*(1 + 4 - 2*2) = d
    np.testing.assert_allclose(
        frechet_distance(mu1, s, mu1, 4 * s), d * 1.0, atol=1e-6
    )


def test_fvd_separates_distributions():
    from cvpr23_lfdm_tpu.eval.metrics import FVD

    rng = np.random.default_rng(0)

    def extractor(videos):  # mean/std features
        v = np.asarray(videos)
        return jnp.asarray(
            np.stack([v.mean((1, 2, 3, 4)), v.std((1, 2, 3, 4))], axis=1)
        )

    fvd = FVD(extractor)
    real = rng.random((16, 4, 8, 8, 3)).astype(np.float32)
    same = rng.random((16, 4, 8, 8, 3)).astype(np.float32)
    shifted = np.clip(same + 0.3, 0, 1)
    assert fvd(real, same) < fvd(real, shifted)


def test_lpips_zero_on_identity_and_positive():
    from cvpr23_lfdm_tpu.eval.metrics import lpips_distance
    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features

    vgg = Vgg19Features()
    vars_ = jax.jit(lambda r: vgg.init(r, jnp.zeros((1, 32, 32, 3))))(
        jax.random.PRNGKey(0)
    )
    apply = lambda x: vgg.apply(vars_, x)
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    assert float(lpips_distance(apply, a, a)) < 1e-8
    assert float(lpips_distance(apply, a, b)) > 0.0


def test_vgg_video_extractor_shape():
    from cvpr23_lfdm_tpu.eval.metrics import vgg_video_extractor
    from cvpr23_lfdm_tpu.train.vgg import Vgg19Features

    vgg = Vgg19Features()
    vars_ = jax.jit(lambda r: vgg.init(r, jnp.zeros((1, 32, 32, 3))))(
        jax.random.PRNGKey(0)
    )
    ex = vgg_video_extractor(lambda x: vgg.apply(vars_, x))
    out = ex(jnp.zeros((2, 4, 32, 32, 3)))
    assert out.shape[0] == 2 and out.ndim == 2
