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

    def save(
        self,
        state: Any,
        step: int | None = None,
        rolling: bool = True,
        extra: dict | None = None,
    ) -> str:
        """Save a snapshot; with `rolling`, also refresh `latest`.

        `extra` is a small JSON-serializable sidecar (host-side resume
        state: data-loader iterator position, host RNG seed, ...) written
        atomically next to the Orbax directory as `<name>.extra.json`;
        bytes values are base64-encoded.
        """
        if step is None and not rolling:
            raise ValueError("save() needs a step, rolling=True, or both")
        state = jax.device_get(state)
        if step is not None:
            path = self._path(f"step_{int(step):08d}")
            self._ckptr.save(path, state, force=True)
            self._gc()
            if extra is not None:
                self._write_extra(f"step_{int(step):08d}", extra)
        if rolling:
            path = self._path("latest")
            self._ckptr.save(path, state, force=True)
            if extra is not None:
                self._write_extra("latest", extra)
        self._ckptr.wait_until_finished()
        return path

    def _write_extra(self, name: str, extra: dict) -> None:
        import base64
        import json

        def enc(v):
            if isinstance(v, bytes):
                return {"__bytes_b64__": base64.b64encode(v).decode("ascii")}
            return v

        tmp = self._path(f".{name}.extra.json.tmp")
        with open(tmp, "w") as f:
            json.dump({k: enc(v) for k, v in extra.items()}, f)
        os.replace(tmp, self._path(f"{name}.extra.json"))

    def load_extra(self, name: str = "latest") -> dict | None:
        """Sidecar saved alongside `name`, or None if absent."""
        import base64
        import json

        path = self._path(f"{name}.extra.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            raw = json.load(f)

        def dec(v):
            if isinstance(v, dict) and "__bytes_b64__" in v:
                return base64.b64decode(v["__bytes_b64__"])
            return v

        return {k: dec(v) for k, v in raw.items()}

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
            d
            for d in os.listdir(self.directory)
            if d.startswith("step_") and not d.endswith(".extra.json")
        )
        import contextlib
        import shutil

        for d in steps[: -self.max_to_keep]:
            shutil.rmtree(os.path.join(self.directory, d), ignore_errors=True)
            with contextlib.suppress(OSError):
                os.remove(os.path.join(self.directory, d + ".extra.json"))


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
