"""Closed-form 2x2 symmetric-PSD matrix math.

The reference region predictor factorizes a per-region 2x2 covariance with
LAPACK SVD forced onto the **CPU** (LFAE/modules/region_predictor.py:16-25),
a per-step device round-trip. A 2x2 symmetric PSD matrix has a closed-form
eigendecomposition (trace/determinant), so the whole thing stays on-device
and fuses into the surrounding XLA program.

For symmetric PSD `C`, SVD and eigendecomposition coincide: `C = U S U^T`
with `S` sorted descending. The reference consumes `affine = U sqrt(S)`
(region_predictor.py:109-113); column-sign ambiguity is resolved by a
deterministic convention (largest-magnitude component non-negative) and is
further neutralized downstream by `revert_axis_swap`
(pixelwise_flow_predictor.py:73-74).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def eigh_2x2(covar: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Eigendecomposition of symmetric 2x2 matrices.

    Args:
      covar: `[..., 2, 2]` symmetric (uses [0,0], [0,1], [1,1] entries).

    Returns:
      (u, s): `u [..., 2, 2]` orthonormal eigenvectors as columns,
      `s [..., 2]` eigenvalues sorted descending. Convention: each
      eigenvector's largest-|.| component is non-negative.
    """
    a = covar[..., 0, 0]
    b = 0.5 * (covar[..., 0, 1] + covar[..., 1, 0])
    c = covar[..., 1, 1]

    half_tr = 0.5 * (a + c)
    # radius of the eigenvalue circle
    rad = jnp.sqrt(jnp.maximum(0.25 * (a - c) ** 2 + b * b, 0.0))
    s1 = half_tr + rad
    s2 = half_tr - rad

    # Eigenvector for s1: (b, s1 - a) or (s1 - c, b); pick the better-
    # conditioned of the two (larger norm) to avoid 0/0 at b ~= 0.
    v1a = jnp.stack([b, s1 - a], axis=-1)
    v1b = jnp.stack([s1 - c, b], axis=-1)
    n1a = jnp.sum(v1a * v1a, axis=-1, keepdims=True)
    n1b = jnp.sum(v1b * v1b, axis=-1, keepdims=True)
    v1 = jnp.where(n1a >= n1b, v1a, v1b)
    # Degenerate (isotropic) case: fall back to e1.
    e1 = jnp.zeros_like(v1).at[..., 0].set(1.0)
    norm1 = jnp.sqrt(jnp.sum(v1 * v1, axis=-1, keepdims=True))
    v1 = jnp.where(norm1 > _EPS, v1 / jnp.maximum(norm1, _EPS), e1)

    # Deterministic sign: largest-|.| component non-negative.
    lead = jnp.where(jnp.abs(v1[..., 0]) >= jnp.abs(v1[..., 1]), v1[..., 0], v1[..., 1])
    sign = jnp.where(lead < 0, -1.0, 1.0)[..., None]
    v1 = v1 * sign

    # v2 orthogonal to v1, same sign convention.
    v2 = jnp.stack([-v1[..., 1], v1[..., 0]], axis=-1)
    lead2 = jnp.where(jnp.abs(v2[..., 0]) >= jnp.abs(v2[..., 1]), v2[..., 0], v2[..., 1])
    sign2 = jnp.where(lead2 < 0, -1.0, 1.0)[..., None]
    v2 = v2 * sign2

    u = jnp.stack([v1, v2], axis=-1)  # columns are eigenvectors
    s = jnp.stack([s1, s2], axis=-1)
    return u, s


def sqrt_psd_2x2(covar: jnp.ndarray) -> jnp.ndarray:
    """`U sqrt(S)` factor of a symmetric PSD 2x2 (the reference's 'affine').

    Satisfies `out @ out.T == covar` (region_predictor.py:109-113).
    """
    u, s = eigh_2x2(covar)
    return u * jnp.sqrt(jnp.maximum(s, 0.0))[..., None, :]


def inv_2x2(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of `[..., 2, 2]` matrices."""
    a = m[..., 0, 0]
    b = m[..., 0, 1]
    c = m[..., 1, 0]
    d = m[..., 1, 1]
    det = a * d - b * c
    inv_det = 1.0 / det
    row0 = jnp.stack([d, -b], axis=-1)
    row1 = jnp.stack([-c, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2) * inv_det[..., None, None]


def inv_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form adjugate inverse of `[..., 3, 3]` matrices."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    ca = e * i - f * h
    cb = -(d * i - f * g)
    cc = d * h - e * g
    det = a * ca + b * cb + c * cc
    adj = jnp.stack(
        [
            jnp.stack([ca, -(b * i - c * h), b * f - c * e], axis=-1),
            jnp.stack([cb, a * i - c * g, -(a * f - c * d)], axis=-1),
            jnp.stack([cc, -(a * h - b * g), a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]
