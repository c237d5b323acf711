"""Optimizers and LR schedules matching the reference recipes."""

from __future__ import annotations

import optax


def multistep_adam(
    lr: float,
    betas: tuple[float, float],
    epoch_milestones: tuple[int, ...],
    steps_per_epoch: int,
    gamma: float = 0.1,
) -> optax.GradientTransformation:
    """Adam + torch MultiStepLR (x`gamma` at epoch milestones).

    Reference: LFAE/train.py:38-58 (Adam 2e-4, betas (0.5, 0.999)) and
    DM train scripts (Adam 2e-4, betas (0.9, 0.99), milestones per dataset).
    """
    boundaries = {int(m) * steps_per_epoch: gamma for m in epoch_milestones}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    return optax.chain(
        optax.scale_by_adam(b1=betas[0], b2=betas[1]),
        optax.scale_by_schedule(schedule),
        optax.scale(-1.0),
    )
