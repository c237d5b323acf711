"""Unified DM trainer: one parameterized loop for MUG/MHAD/NATOPS.

Replaces the reference's four ~430-line near-duplicate scripts
(DM/train_video_flow_diffusion_{mug,mhad,natops,mhad_multiGPU}.py) with a
single jit-compiled train step over a `data` mesh. The multi-GPU variant
is not a separate code path: the same step runs on 1..N chips — batch
sharded over the mesh, gradients all-reduced by XLA over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cvpr23_lfdm_tpu.config import ExperimentConfig
from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion
from cvpr23_lfdm_tpu.parallel.mesh import (
    make_mesh, replicate, shard_batch, shard_variables,
)
from cvpr23_lfdm_tpu.train.optim import multistep_adam


class DMTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    unet_vars: Any
    opt_state: Any


@dataclasses.dataclass
class DMTrainer:
    """Owns the FlowDiffusion model, optimizer, mesh, and compiled steps."""

    cfg: ExperimentConfig
    steps_per_epoch: int
    lfae_vars: Any  # frozen stage-1 variables
    mesh: Any = None

    def __post_init__(self):
        self.model = FlowDiffusion(self.cfg.lfae, self.cfg.diffusion)
        self.tx = multistep_adam(
            self.cfg.dm_train.lr,
            self.cfg.dm_train.adam_betas,
            self.cfg.dm_train.epoch_milestones,
            self.steps_per_epoch,
        )
        if self.mesh is None:
            self.mesh = make_mesh()
        self._train_step = jax.jit(
            self._train_step_impl, donate_argnums=(0,),
            static_argnames=("with_monitoring",),
        )
        self._sample = jax.jit(
            self._sample_impl, static_argnames=("cond_scale",)
        )
        # monitoring forward: full aux dict incl. pseudo-GT and pred_x0
        # reconstructions (the reference's periodic image/GIF dump inputs,
        # DM train scripts :252-360)
        self._monitor = jax.jit(
            lambda uv, lv, rng, ref, vid, cond: self.model.loss(
                uv, lv, rng, ref, vid, cond, with_monitoring=True
            )[1]
        )

    # ------------------------------------------------------------------ init

    def init_state(self, rng: jax.Array) -> DMTrainState:
        """Replicated on a pure-`data` mesh; on a mesh with a `model` axis
        the UNet params + Adam moments are tensor-sharded under the
        `parallel.mesh.UNET_TP_RULES` partition table (dp x tp training —
        the reference's DataParallel ceiling has no equivalent)."""
        unet_vars = self.model.init_unet_vars(rng)
        opt_state = self.tx.init(unet_vars["params"])
        state = DMTrainState(
            step=jnp.zeros((), jnp.int32), unet_vars=unet_vars, opt_state=opt_state
        )
        if "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1:
            # optax moment trees mirror the param tree -> same specs apply
            return DMTrainState(
                step=replicate(state.step, self.mesh),
                unet_vars=shard_variables(state.unet_vars, self.mesh),
                opt_state=shard_variables(state.opt_state, self.mesh),
            )
        return replicate(state, self.mesh)

    def place_lfae(self):
        self.lfae_vars = replicate(self.lfae_vars, self.mesh)

    # ------------------------------------------------------------------ step

    def _train_step_impl(
        self, state: DMTrainState, lfae_vars, rng, batch, with_monitoring=False
    ):
        """One optimization step (video_flow_diffusion_model.py:181-188:
        backward on the diffusion loss only, `only_use_flow`).

        `with_monitoring` adds the 40-frame pred_x0 decode + rec losses —
        logging-only and ~25% of the step cost (the reference pays it every
        step, DM train :158-179), so it compiles as a separate variant and
        runs only on log steps."""

        def loss_fn(params):
            unet_vars = {**state.unet_vars, "params": params}
            loss, aux = self.model.loss(
                unet_vars,
                lfae_vars,
                rng,
                batch["ref_img"],
                batch["real_vid"],
                batch["cond"],
                batch.get("none_cond_mask"),
                with_monitoring=with_monitoring,
                only_use_flow=self.cfg.dm_train.only_use_flow,
            )
            return loss, aux

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.unet_vars["params"])
        updates, opt_state = self.tx.update(grads, state.opt_state)
        params = optax.apply_updates(state.unet_vars["params"], updates)
        new_state = state.replace(
            step=state.step + 1,
            unet_vars={**state.unet_vars, "params": params},
            opt_state=opt_state,
        )
        metrics = {
            "loss": aux["loss"],
            "grad_norm": optax.global_norm(grads),
        }
        if with_monitoring:
            metrics["rec_loss"] = aux["rec_loss"]
            metrics["rec_warp_loss"] = aux["rec_warp_loss"]
        return new_state, metrics

    def train_step(
        self, state: DMTrainState, rng, batch, with_monitoring: bool = False
    ) -> tuple[DMTrainState, dict]:
        batch = shard_batch(batch, self.mesh)
        return self._train_step(
            state, self.lfae_vars, rng, batch, with_monitoring=with_monitoring
        )

    # ------------------------------------------------------------------ sample

    def _sample_impl(self, unet_vars, lfae_vars, rng, sample_img, cond, cond_scale=1.0):
        return self.model.sample_video(
            unet_vars, lfae_vars, rng, sample_img, cond, cond_scale
        )

    def monitor(self, state: DMTrainState, rng, batch) -> dict:
        """Run the monitoring forward on a (small) batch; returns aux with
        real/fake videos, latent flows and confidences."""
        return self._monitor(
            state.unet_vars, self.lfae_vars, rng,
            batch["ref_img"], batch["real_vid"], batch["cond"],
        )

    def sample_video(self, state: DMTrainState, rng, sample_img, cond, cond_scale=1.0):
        return self._sample(
            state.unet_vars, self.lfae_vars, rng, sample_img, cond,
            cond_scale=cond_scale,
        )

    # ------------------------------------------------------------------ loop

    def fit(
        self,
        state: DMTrainState,
        batches: Iterator[dict],
        num_steps: int,
        rng: jax.Array,
        log_every: int = 10,
        checkpoint_fn=None,
        checkpoint_every: int = 2000,
        viz_fn=None,
        viz_every: int = 0,
        gif_fn=None,
        gif_every: int = 0,
        sample_fn=None,
        sample_every: int = 0,
        start_step: int = 0,
    ) -> DMTrainState:
        """Step-count-based loop (reference DM train scripts :213-390).
        Periodic hooks, each `fn(state, batch, step)`:
          viz_fn    -- still-image grid (reference :252-280)
          gif_fn    -- training-batch GIF dump (reference :282-318)
          sample_fn -- mid-training `sample_one_video` GIF (reference :320-360)

        `start_step` is the resume protocol (reference `--set-start`
        recomputing `start_step` from the restored counter, DM train
        :173-181): the loop runs only the REMAINING `num_steps -
        start_step` steps, and the per-step RNG is `fold_in(rng, step)`
        over the global step index — a resumed run draws the exact noise
        stream a straight-through run would have.
        """
        from cvpr23_lfdm_tpu.parallel.mesh import device_prefetch

        batches = device_prefetch(batches, self.mesh)
        t0 = time.perf_counter()
        for i in range(start_step, num_steps):
            step_rng = jax.random.fold_in(rng, i)
            batch = next(batches)
            if viz_fn and viz_every and (i + 1) % viz_every == 0:
                viz_fn(state, batch, i + 1)
            if gif_fn and gif_every and (i + 1) % gif_every == 0:
                gif_fn(state, batch, i + 1)
            if sample_fn and sample_every and (i + 1) % sample_every == 0:
                sample_fn(state, batch, i + 1)
            log_now = bool(log_every and (i + 1) % log_every == 0)
            state, metrics = self.train_step(
                state, step_rng, batch, with_monitoring=log_now
            )
            if log_now:
                m = jax.device_get(metrics)
                dt = time.perf_counter() - t0
                print(
                    f"step {int(jax.device_get(state.step))}: "
                    f"loss {m['loss']:.4f} rec {m['rec_loss']:.4f} "
                    f"warp {m['rec_warp_loss']:.4f} ({dt / log_every:.3f}s/step)",
                    flush=True,
                )
                t0 = time.perf_counter()
            if checkpoint_fn and (i + 1) % checkpoint_every == 0:
                checkpoint_fn(state)
        return state
