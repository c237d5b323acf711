"""Stage-1 (LFAE) trainer: reconstruction + equivariance, mesh-parallel.

Reference: LFAE/train.py:35-162 + LFAE/modules/model.py:141-217. One
jit-compiled train step updates all three nets (Adam 2e-4, betas
(0.5, 0.999), MultiStepLR x0.1 at epoch milestones, train.py:38-58) with
BatchNorm batch statistics carried as a mutable flax collection — under
pjit data parallelism the batch-stat means compile to ICI all-reduces,
replacing thread-based SyncBN (sync_batchnorm/batchnorm.py:48-125).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterator

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax
from flax import struct

from cvpr23_lfdm_tpu.config import ExperimentConfig
from cvpr23_lfdm_tpu.models.flow_autoenc import FlowAE, build_lfae_modules
from cvpr23_lfdm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from cvpr23_lfdm_tpu.train.losses import (
    TPSTransform,
    equivariance_losses,
    perceptual_pyramid_loss,
)
from cvpr23_lfdm_tpu.train.optim import multistep_adam
from cvpr23_lfdm_tpu.train.vgg import Vgg19Features


class LFAEReconstruction(nn.Module):
    """Training forward (model.py:164-171, 189-195): reconstruction plus the
    region prediction of a TPS-warped driving frame. Submodule names match
    FlowAE, so variables interchange with the inference bundle and the
    checkpoint converter."""

    cfg: Any
    axis_name: str | None = None

    def setup(self):
        self.region_predictor, self.bg_predictor, self.generator = build_lfae_modules(
            self.cfg, self.axis_name
        )

    def __call__(self, source, driving, transform: TPSTransform, train: bool = True):
        source_params = self.region_predictor(source, train)
        driving_params = self.region_predictor(driving, train)
        bg_params = self.bg_predictor(source, driving, train)
        generated = self.generator(
            source, driving_params, source_params, bg_params, train
        )
        transformed_frame = transform.transform_frame(driving)
        transformed_params = self.region_predictor(transformed_frame, train)
        return generated, driving_params, transformed_params


class LFAETrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


@dataclasses.dataclass
class LFAETrainer:
    cfg: ExperimentConfig
    steps_per_epoch: int
    vgg_vars: Any  # Vgg19Features variables (imported or random-projection)
    mesh: Any = None

    def __post_init__(self):
        tc = self.cfg.lfae_train
        self.model = LFAEReconstruction(self.cfg.lfae)
        self.vgg = Vgg19Features()
        self.tx = multistep_adam(
            tc.lr, (0.5, 0.999), tc.epoch_milestones, self.steps_per_epoch
        )
        if self.mesh is None:
            self.mesh = make_mesh()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        fae = FlowAE(self.cfg.lfae)
        self._reconstruct = jax.jit(
            lambda params, stats, src, dri: fae.apply(
                {"params": params, "batch_stats": stats}, src, dri, False
            )
        )

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array) -> LFAETrainState:
        from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars

        variables = init_lfae_vars(rng, self.cfg.lfae)
        opt_state = self.tx.init(variables["params"])
        state = LFAETrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt_state,
        )
        self.vgg_vars = replicate(self.vgg_vars, self.mesh)
        return replicate(state, self.mesh)

    def load_state(self, variables: dict, rng: jax.Array | None = None) -> LFAETrainState:
        """Warm-start from converted torch variables (run_mug.py:68-70)."""
        opt_state = self.tx.init(variables["params"])
        state = LFAETrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables["batch_stats"],
            opt_state=opt_state,
        )
        self.vgg_vars = replicate(self.vgg_vars, self.mesh)
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------ step

    def _losses(self, params, batch_stats, rng, source, driving):
        tc = self.cfg.lfae_train
        transform = TPSTransform.sample(
            rng, source.shape[0], tc.sigma_affine, tc.sigma_tps, tc.points_tps
        )
        (generated, driving_params, transformed_params), mutated = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            source, driving, transform, True,
            mutable=["batch_stats"],
        )
        perceptual = perceptual_pyramid_loss(
            lambda x: self.vgg.apply(self.vgg_vars, x),
            generated["prediction"], driving,
            tc.scales, tc.perceptual_weights,
        )
        shift_l, affine_l = equivariance_losses(
            driving_params, transformed_params, transform,
            self.cfg.lfae.revert_axis_swap,
        )
        losses = {
            "perceptual": perceptual,
            "equivariance_shift": tc.equivariance_shift_weight * shift_l,
            "equivariance_affine": tc.equivariance_affine_weight * affine_l,
        }
        total = sum(losses.values())
        return total, (losses, mutated["batch_stats"], generated)

    def _train_step_impl(self, state: LFAETrainState, rng, batch):
        def loss_fn(params):
            return self._losses(
                params, state.batch_stats, rng, batch["source"], batch["driving"]
            )

        grads, (losses, new_stats, _) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        metrics = {**losses, "total": sum(losses.values())}
        return new_state, metrics

    def train_step(self, state, rng, batch):
        batch = shard_batch(
            {"source": batch["source"], "driving": batch["driving"]}, self.mesh
        )
        return self._train_step(state, rng, batch)

    # ------------------------------------------------------------------ eval

    def reconstruct(self, state: LFAETrainState, source, driving):
        """Self-reconstruction (FlowAE.forward, eval mode) — the
        test_flowautoenc metric path."""
        return self._reconstruct(state.params, state.batch_stats, source, driving)

    # ------------------------------------------------------------------ loop

    def fit(
        self,
        state: LFAETrainState,
        batches: Iterator[dict],
        num_steps: int,
        rng: jax.Array,
        log_every: int = 10,
        checkpoint_fn=None,
        checkpoint_every: int = 5000,
        viz_fn=None,
        viz_every: int = 0,
        start_step: int = 0,
    ) -> LFAETrainState:
        """`start_step`: resume protocol (LFAE/train.py:44-56) — run only
        the remaining steps; per-step RNG is `fold_in(rng, global_step)`
        so a resumed run replays the straight-through noise stream."""
        from cvpr23_lfdm_tpu.parallel.mesh import device_prefetch

        batches = device_prefetch(
            batches, self.mesh, keys=("source", "driving")
        )
        t0 = time.perf_counter()
        for i in range(start_step, num_steps):
            step_rng = jax.random.fold_in(rng, i)
            batch = next(batches)
            if viz_fn and viz_every and (i + 1) % viz_every == 0:
                viz_fn(state, batch, i + 1)
            state, metrics = self.train_step(state, step_rng, batch)
            if log_every and (i + 1) % log_every == 0:
                m = jax.device_get(metrics)
                dt = (time.perf_counter() - t0) / log_every
                print(
                    f"lfae step {int(jax.device_get(state.step))}: "
                    f"total {m['total']:.4f} perc {m['perceptual']:.4f} "
                    f"shift {m['equivariance_shift']:.4f} "
                    f"affine {m['equivariance_affine']:.4f} ({dt:.3f}s/step)",
                    flush=True,
                )
                t0 = time.perf_counter()
            if checkpoint_fn and (i + 1) % checkpoint_every == 0:
                checkpoint_fn(state)
        return state
