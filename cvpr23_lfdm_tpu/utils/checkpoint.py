"""Checkpointing: Orbax snapshots + rolling latest, and torch .pth import.

Replaces the reference's `torch.save` dict checkpoints (LFAE/train.py:134-152,
DM train :362-377): step-numbered snapshots plus a rolling "latest" refreshed
every `update_ckpt_freq` steps — the crash-resume story (SURVEY.md §5) — but
with Orbax's atomic-rename durability and sharded-array support.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Snapshots under `<dir>/step_<N>` + rolling `<dir>/latest`."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self.max_to_keep = max_to_keep

    def _path(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def save(self, state: Any, step: int | None = None, rolling: bool = True) -> str:
        """Save a snapshot; with `rolling`, also refresh `latest`."""
        if step is None and not rolling:
            raise ValueError("save() needs a step, rolling=True, or both")
        state = jax.device_get(state)
        if step is not None:
            path = self._path(f"step_{int(step):08d}")
            self._ckptr.save(path, state, force=True)
            self._gc()
        if rolling:
            path = self._path("latest")
            self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        return path

    def restore(self, target: Any, name: str = "latest") -> Any:
        """Restore into the structure of `target` (an abstract or concrete
        pytree of the same shape/dtypes)."""
        return self._ckptr.restore(self._path(name), target)

    def latest_step(self) -> int | None:
        steps = [
            int(d.split("_")[1])
            for d in os.listdir(self.directory)
            if d.startswith("step_")
        ]
        return max(steps) if steps else None

    def has_latest(self) -> bool:
        return os.path.isdir(self._path("latest"))

    def _gc(self):
        steps = sorted(
            d for d in os.listdir(self.directory) if d.startswith("step_")
        )
        import shutil

        for d in steps[: -self.max_to_keep]:
            shutil.rmtree(os.path.join(self.directory, d), ignore_errors=True)


def load_torch_state_dicts(path: str) -> dict:
    """Load a reference `.pth` checkpoint into plain numpy state dicts.

    Handles the LFAE layout {generator, region_predictor, bg_predictor,
    optimizer, epoch, example} (LFAE/train.py:134-142) and the DM layout
    {diffusion, optimizer_diff, example} (DM train :365-369).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    out = {}
    for key, value in ckpt.items():
        if isinstance(value, dict) and value and all(
            hasattr(v, "detach") for v in value.values()
        ):
            out[key] = {k: v.detach().cpu().numpy() for k, v in value.items()}
        elif isinstance(value, (int, float, np.ndarray)):
            out[key] = value
    return out


def load_lfae_from_torch(path: str, lfae_cfg) -> dict:
    """Reference RegionMM.pth -> FlowAE/FlowDiffusion lfae_vars."""
    from cvpr23_lfdm_tpu.utils.torch_convert import convert_lfae_checkpoint

    return convert_lfae_checkpoint(load_torch_state_dicts(path), lfae_cfg)


def load_unet_from_torch(path: str, use_deconv: bool = True) -> dict:
    """Reference flowdiff.pth -> Unet3D variables. The torch state dict
    prefixes UNet params with `denoise_fn.` inside the diffusion wrapper."""
    from cvpr23_lfdm_tpu.utils.torch_convert import convert_unet3d

    sds = load_torch_state_dicts(path)
    sd = sds["diffusion"]
    unet_sd = {
        k[len("denoise_fn.") :]: v
        for k, v in sd.items()
        if k.startswith("denoise_fn.")
    }
    return convert_unet3d(unet_sd, use_deconv=use_deconv)
