"""Quality metrics: PSNR / SSIM / LPIPS-style / FVD (Fréchet video distance).

The reference repo computes only per-pixel L1 (SURVEY.md §6); FVD/cFVD/sFVD
live in the paper. This harness provides the quantitative side:

* PSNR / SSIM — exact, dependency-free (video = mean over frames).
* LPIPS-style perceptual distance over Vgg19Features activations with
  pluggable per-layer linear weights (true LPIPS when the learned lin
  weights are imported; unit-normalized uniform weighting otherwise).
* FVD — Fréchet distance between feature distributions from a pluggable
  video feature extractor (the standard I3D logits when converted weights
  are supplied; any `[B, F, H, W, 3] -> [B, D]` callable works).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------- PSNR


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean PSNR over leading dims; inputs [..., H, W, C] in [0, max_val]."""
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return jnp.mean(10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12)))


# ------------------------------------------------------------------- SSIM


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
    k1: float = 0.01, k2: float = 0.03,
) -> jnp.ndarray:
    """Standard Wang et al. SSIM with an 11x11 gaussian window, channels and
    leading dims averaged. Inputs `[..., H, W, C]`."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    kern = _gaussian_kernel()

    lead = a.shape[:-3]
    h, w, c = a.shape[-3:]
    af = a.reshape((-1, h, w, c)).astype(jnp.float32)
    bf = b.reshape((-1, h, w, c)).astype(jnp.float32)

    def blur(x):
        # separable gaussian, VALID
        x = jax.vmap(
            lambda img: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, kern, mode="valid"), 0, img
            )
        )(x)
        x = jax.vmap(
            lambda img: jnp.apply_along_axis(
                lambda v: jnp.convolve(v, kern, mode="valid"), 1, img
            )
        )(x)
        return x

    mu_a, mu_b = blur(af), blur(bf)
    var_a = blur(af * af) - mu_a**2
    var_b = blur(bf * bf) - mu_b**2
    cov = blur(af * bf) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)


# ------------------------------------------------------------- LPIPS-style


def lpips_distance(
    vgg_apply: Callable,
    a: jnp.ndarray,
    b: jnp.ndarray,
    lin_weights: list[jnp.ndarray] | None = None,
) -> jnp.ndarray:
    """Perceptual distance: unit-normalize each VGG activation over channels,
    per-layer (weighted) squared difference, spatial mean, sum over layers —
    the LPIPS recipe (Zhang et al.). `a`/`b`: [B, H, W, 3] in [0, 1]."""
    feats_a = vgg_apply(a)
    feats_b = vgg_apply(b)
    total = 0.0
    for li, (fa, fb) in enumerate(zip(feats_a, feats_b)):
        na = fa / jnp.sqrt(jnp.sum(fa**2, axis=-1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb**2, axis=-1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        if lin_weights is not None:
            d = d * lin_weights[li][None, None, None, :]
            total += jnp.mean(jnp.sum(d, axis=-1))
        else:
            total += jnp.mean(d)  # plain mean per layer
    return total


# -------------------------------------------------------------------- FVD


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """Fréchet distance between two gaussians (FID/FVD formula)."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def feature_statistics(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


@dataclasses.dataclass
class FVD:
    """Fréchet video distance over a pluggable extractor.

    `extractor`: `[B, F, H, W, 3] in [0,1] -> [B, D]` features. The standard
    metric uses I3D (Kinetics-400) logits — supply converted weights via
    `i3d_extractor(...)`; for relative comparisons any fixed extractor is
    consistent."""

    extractor: Callable

    def __call__(self, real_videos, fake_videos, batch_size: int = 8) -> float:
        def run(videos):
            outs = []
            for i in range(0, len(videos), batch_size):
                outs.append(
                    np.asarray(self.extractor(jnp.asarray(videos[i : i + batch_size])))
                )
            return np.concatenate(outs)

        mu_r, s_r = feature_statistics(run(real_videos))
        mu_f, s_f = feature_statistics(run(fake_videos))
        return frechet_distance(mu_r, s_r, mu_f, s_f)


def vgg_video_extractor(vgg_apply: Callable, layer: int = 3) -> Callable:
    """Fallback video feature extractor when I3D weights are unavailable:
    spatial+temporal mean-pooled VGG activations of every frame. Fixed and
    deterministic — valid for relative FVD comparisons, NOT the published
    I3D-FVD scale."""

    def extract(videos: jnp.ndarray) -> jnp.ndarray:
        b, f = videos.shape[:2]
        frames = videos.reshape((b * f,) + videos.shape[2:])
        feats = vgg_apply(frames)[layer]
        pooled = feats.mean(axis=(1, 2))
        return pooled.reshape(b, f, -1).mean(axis=1)

    return extract
