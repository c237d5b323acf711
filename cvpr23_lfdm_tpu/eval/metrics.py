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
    # scipy <1.17 returns (X, errest) with disp=False; 1.17 deprecates
    # `disp` and returns X alone on some inputs — accept both
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if isinstance(covmean, tuple):
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def feature_statistics(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(0)
    # n=1 has no sample covariance; use zeros (a point mass) instead of
    # np.cov's NaNs so degenerate eval groups yield a finite distance
    if feats.shape[0] < 2:
        return mu, np.zeros((feats.shape[1], feats.shape[1]))
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def extract_features(
    extractor: Callable, videos, batch_size: int = 8
) -> np.ndarray:
    """Run a `[B, F, H, W, 3] -> [B, D]` extractor over a video set in
    fixed-size batches (one XLA program; the ragged tail pads by repetition
    and crops, keeping shapes static)."""
    n = len(videos)
    outs = []
    for i in range(0, n, batch_size):
        chunk = np.asarray(videos[i : i + batch_size])
        take = len(chunk)
        if take < batch_size:  # pad to the compiled batch shape
            reps = np.concatenate([chunk] * -(-batch_size // take))[:batch_size]
            outs.append(np.asarray(extractor(jnp.asarray(reps)))[:take])
        else:
            outs.append(np.asarray(extractor(jnp.asarray(chunk))))
    return np.concatenate(outs)


@dataclasses.dataclass
class FVD:
    """Fréchet video distance over a pluggable extractor.

    `extractor`: `[B, F, H, W, 3] in [0,1] -> [B, D]` features. The standard
    metric uses I3D (Kinetics-400) logits — supply converted weights via
    `i3d_extractor(...)`; for relative comparisons any fixed extractor is
    consistent."""

    extractor: Callable

    def __call__(self, real_videos, fake_videos, batch_size: int = 8) -> float:
        mu_r, s_r = feature_statistics(
            extract_features(self.extractor, real_videos, batch_size)
        )
        mu_f, s_f = feature_statistics(
            extract_features(self.extractor, fake_videos, batch_size)
        )
        return frechet_distance(mu_r, s_r, mu_f, s_f)

    def grouped(
        self,
        real_videos,
        fake_videos,
        real_groups,
        fake_groups,
        batch_size: int = 8,
    ) -> tuple[float, dict[str, float]]:
        """Condition-grouped FVD — the paper's cFVD/sFVD protocol
        (arXiv:2303.13744 Tables 1-3): partition both sets by a condition
        label (class text -> cFVD, subject id -> sFVD), compute the Fréchet
        distance within each condition, and average over conditions. A
        generator that matches the marginal distribution but scrambles the
        conditioning scores ~0 on plain FVD yet large here.

        Features are extracted ONCE per set and sliced per group. Groups
        present in only one set are skipped (reported as NaN per-group).
        Returns `(mean over valid groups, {group: value})`."""
        fr = extract_features(self.extractor, real_videos, batch_size)
        ff = extract_features(self.extractor, fake_videos, batch_size)
        real_groups = [str(g) for g in real_groups]
        fake_groups = [str(g) for g in fake_groups]
        if len(real_groups) != len(fr) or len(fake_groups) != len(ff):
            raise ValueError("one group label per video required")
        per: dict[str, float] = {}
        for g in sorted(set(real_groups) | set(fake_groups)):
            ri = [i for i, x in enumerate(real_groups) if x == g]
            fi = [i for i, x in enumerate(fake_groups) if x == g]
            if not ri or not fi:
                per[g] = float("nan")
                continue
            mu_r, s_r = feature_statistics(fr[ri])
            mu_f, s_f = feature_statistics(ff[fi])
            per[g] = frechet_distance(mu_r, s_r, mu_f, s_f)
        valid = [v for v in per.values() if np.isfinite(v)]
        return float(np.mean(valid)) if valid else float("nan"), per


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
