"""LFAE reconstruction losses: perceptual pyramid + equivariance.

Reference: LFAE/modules/model.py:63-217. The random TPS transform's
jacobian — computed there with `torch.autograd.grad`
(model.py:129-134) — is obtained here with `jax.jacfwd` (forward-mode is
exact and cheap for the 2->2 map), fully inside the compiled step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from cvpr23_lfdm_tpu.ops.antialias import AntiAliasDownsample
from cvpr23_lfdm_tpu.ops.eig2x2 import inv_2x2
from cvpr23_lfdm_tpu.ops.grid import make_coordinate_grid
from cvpr23_lfdm_tpu.ops.warp import grid_sample


def image_pyramid(x: jnp.ndarray, scales: tuple[float, ...]) -> dict[float, jnp.ndarray]:
    """Anti-aliased multi-scale pyramid (model.py:63-79). NHWC."""
    return {s: AntiAliasDownsample(s)(x) for s in scales}


@dataclasses.dataclass(frozen=True)
class TPSTransform:
    """Random affine+TPS warp for the equivariance constraint
    (model.py:82-134). Holds the per-batch random parameters."""

    theta: jnp.ndarray  # [B, 2, 3]
    control_points: jnp.ndarray | None  # [P^2, 2]
    control_params: jnp.ndarray | None  # [B, P^2]

    @staticmethod
    def sample(
        rng: jax.Array, bs: int, sigma_affine: float,
        sigma_tps: float | None = None, points_tps: int | None = None,
    ) -> "TPSTransform":
        k1, k2 = jax.random.split(rng)
        theta = jnp.eye(2, 3)[None] + sigma_affine * jax.random.normal(k1, (bs, 2, 3))
        cp = cpar = None
        if sigma_tps is not None and points_tps is not None:
            cp = make_coordinate_grid((points_tps, points_tps)).reshape(-1, 2)
            cpar = sigma_tps * jax.random.normal(k2, (bs, points_tps**2))
        return TPSTransform(theta, cp, cpar)

    def warp_coordinates(self, coords: jnp.ndarray) -> jnp.ndarray:
        """coords `[B, N, 2]` -> warped `[B, N, 2]` (model.py:108-127)."""
        out = (
            jnp.einsum("bij,bnj->bni", self.theta[:, :, :2], coords)
            + self.theta[:, None, :, 2]
        )
        if self.control_points is not None:
            # TPS kernel with the reference's L1 radial distance
            dist = jnp.abs(
                coords[:, :, None, :] - self.control_points[None, None]
            ).sum(-1)  # [B, N, P]
            basis = dist**2 * jnp.log(dist + 1e-6)
            out = out + jnp.einsum("bnp,bp->bn", basis, self.control_params)[..., None]
        return out

    def jacobian(self, coords: jnp.ndarray) -> jnp.ndarray:
        """d(warp)/d(coords) `[B, N, 2, 2]` via forward-mode autodiff
        (replaces torch autograd.grad, model.py:129-134)."""

        def single(theta, cpar, xy):
            def f(p):
                out = theta[:, :2] @ p + theta[:, 2]
                if self.control_points is not None:
                    dist = jnp.abs(p[None, :] - self.control_points).sum(-1)
                    basis = dist**2 * jnp.log(dist + 1e-6)
                    out = out + jnp.sum(basis * cpar)
                return out

            return jax.jacfwd(f)(xy)

        cpar = (
            self.control_params
            if self.control_params is not None
            else jnp.zeros((coords.shape[0], 1))
        )
        return jax.vmap(
            lambda th, cp, pts: jax.vmap(lambda xy: single(th, cp, xy))(pts)
        )(self.theta, cpar, coords)

    def transform_frame(self, frame: jnp.ndarray) -> jnp.ndarray:
        """Warp `[B, H, W, C]` by the inverse-parameterized grid
        (model.py:102-106), reflection padding."""
        b, h, w, _ = frame.shape
        grid = make_coordinate_grid((h, w)).reshape(1, h * w, 2)
        grid = jnp.broadcast_to(grid, (b, h * w, 2))
        warped = self.warp_coordinates(grid).reshape(b, h, w, 2)
        return grid_sample(frame, warped, padding_mode="reflection")


def perceptual_pyramid_loss(
    vgg_apply, pred: jnp.ndarray, target: jnp.ndarray,
    scales: tuple[float, ...], weights: tuple[float, ...],
) -> jnp.ndarray:
    """Multi-scale VGG L1 (model.py:178-187)."""
    pyr_pred = image_pyramid(pred, scales)
    pyr_tgt = image_pyramid(target, scales)
    total = 0.0
    for s in scales:
        feats_pred = vgg_apply(pyr_pred[s])
        feats_tgt = vgg_apply(pyr_tgt[s])
        for w, fp, ft in zip(weights, feats_pred, feats_tgt):
            total += w * jnp.mean(jnp.abs(fp - jax.lax.stop_gradient(ft)))
    return total


def equivariance_losses(
    driving_params: dict,
    transformed_params: dict,
    transform: TPSTransform,
    revert_axis_swap: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shift + affine equivariance (model.py:189-215)."""
    warped_shift = transform.warp_coordinates(transformed_params["shift"])
    shift_loss = jnp.mean(jnp.abs(driving_params["shift"] - warped_shift))

    jac = transform.jacobian(transformed_params["shift"])  # [B, K, 2, 2]
    affine_transformed = jnp.matmul(jac, transformed_params["affine"])
    value = jnp.matmul(inv_2x2(driving_params["affine"]), affine_transformed)
    if revert_axis_swap:
        value = value * jnp.sign(value[:, :, 0:1, 0:1])
    eye = jnp.eye(2)
    affine_loss = jnp.mean(jnp.abs(eye - value))
    return shift_loss, affine_loss
