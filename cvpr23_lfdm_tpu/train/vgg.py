"""VGG19 feature extractor for the perceptual pyramid loss.

Reference: LFAE/modules/model.py:19-60 — torchvision VGG19 slices ending at
relu{1..5}_1, ImageNet-normalized input. This image has no torchvision /
no egress, so weights are pluggable: `convert_torchvision_vgg19` imports a
`vgg19.features` state_dict (from a file the user supplies); otherwise the
loss falls back to fixed random features (a random-projection perceptual
loss — still a valid training signal, but NOT equivalent to ImageNet
features; parity runs must import real weights).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# conv layer plan per slice: (out_channels, torchvision feature index)
_SLICES = [
    [(64, 0)],                                   # -> relu1_1
    [(64, 2), "pool", (128, 5)],                 # -> relu2_1
    [(128, 7), "pool", (256, 10)],               # -> relu3_1
    [(256, 12), (256, 14), (256, 16), "pool", (512, 19)],  # -> relu4_1
    [(512, 21), (512, 23), (512, 25), "pool", (512, 28)],  # -> relu5_1
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _max_pool_2x2(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


class Vgg19Features(nn.Module):
    """Returns [relu1_1 ... relu5_1] activations (NHWC, input in [0,1])."""

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        outs = []
        for si, plan in enumerate(_SLICES):
            for item in plan:
                if item == "pool":
                    x = _max_pool_2x2(x)
                else:
                    ch, idx = item
                    x = nn.Conv(
                        ch, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv_{idx}"
                    )(x)
                    x = nn.relu(x)
            outs.append(x)
        return outs


def convert_torchvision_vgg19(features_sd: dict) -> dict:
    """torchvision `vgg19.features` state_dict -> Vgg19Features params."""
    params = {}
    for plan in _SLICES:
        for item in plan:
            if item == "pool":
                continue
            _, idx = item
            w = features_sd[f"{idx}.weight"]
            b = features_sd[f"{idx}.bias"]
            w = w if isinstance(w, np.ndarray) else w.detach().cpu().numpy()
            b = b if isinstance(b, np.ndarray) else b.detach().cpu().numpy()
            params[f"conv_{idx}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": b,
            }
    return {"params": params}
