"""LPIPS (learned perceptual distance) on the published scale.

The official metric (Zhang et al., richzhang/PerceptualSimilarity,
net='vgg') is: scaling layer -> VGG16 slices relu{1_2,2_2,3_3,4_3,5_3}
-> channel-unit-normalize -> squared diff -> learned 1x1 "lin" weights
-> spatial mean -> sum over layers. This is a pure-JAX NHWC rebuild with
converters for both weight files.

Offline weight drop (no egress in this environment): on a machine with
internet,

    import torchvision, lpips, torch
    torch.save(torchvision.models.vgg16(weights='DEFAULT').features.state_dict(), 'vgg16_features.pth')
    torch.save(lpips.LPIPS(net='vgg').state_dict(), 'lpips_vgg.pth')

then `lpips_fn = make_lpips(convert_vgg16_features(...), convert_lpips_lin(...))`.
Numerics are pinned by tests/test_metrics.py against a torch oracle run
from the same (random) state dicts.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# official LPIPS ScalingLayer constants (expects input in [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features conv indices per LPIPS slice
_SLICES = [
    [(64, 0), (64, 2)],                       # -> relu1_2
    ["pool", (128, 5), (128, 7)],             # -> relu2_2
    ["pool", (256, 10), (256, 12), (256, 14)],  # -> relu3_3
    ["pool", (512, 17), (512, 19), (512, 21)],  # -> relu4_3
    ["pool", (512, 24), (512, 26), (512, 28)],  # -> relu5_3
]
LPIPS_CHANNELS = (64, 128, 256, 512, 512)


def _max_pool_2x2(x):
    b, h, w, c = x.shape
    return jnp.max(x.reshape(b, h // 2, 2, w // 2, 2, c), axis=(2, 4))


class Vgg16Features(nn.Module):
    """LPIPS backbone. Input `[B, H, W, 3]` ALREADY scaled to [-1, 1];
    returns the five slice activations."""

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        x = (x - _SHIFT) / _SCALE
        outs = []
        for plan in _SLICES:
            for item in plan:
                if item == "pool":
                    x = _max_pool_2x2(x)
                else:
                    ch, idx = item
                    x = nn.relu(
                        nn.Conv(
                            ch, (3, 3), padding=[(1, 1), (1, 1)],
                            name=f"conv_{idx}",
                        )(x)
                    )
            outs.append(x)
        return outs


def convert_vgg16_features(features_sd: dict) -> dict:
    """torchvision `vgg16.features` state_dict -> Vgg16Features params."""

    def to_np(v):
        return v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()

    params = {}
    for plan in _SLICES:
        for item in plan:
            if item == "pool":
                continue
            _, idx = item
            params[f"conv_{idx}"] = {
                "kernel": to_np(features_sd[f"{idx}.weight"]).transpose(2, 3, 1, 0),
                "bias": to_np(features_sd[f"{idx}.bias"]),
            }
    return {"params": params}


def convert_lpips_lin(lpips_sd: dict) -> list[np.ndarray]:
    """Official LPIPS state dict -> the five learned per-channel weights
    (`lin{i}.model.1.weight` [1, C, 1, 1] -> [C])."""

    def to_np(v):
        return v if isinstance(v, np.ndarray) else v.detach().cpu().numpy()

    out = []
    for i, ch in enumerate(LPIPS_CHANNELS):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in lpips_sd:
                w = to_np(lpips_sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"lin weights for slice {i} not found")
        assert w.shape == (ch,), (w.shape, ch)
        out.append(w.astype(np.float32))
    return out


def make_lpips(
    vgg16_vars: dict, lin_weights: list[np.ndarray]
) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Published-scale LPIPS: `fn(a, b) -> [B]` distances.

    `a`/`b`: `[B, H, W, 3]` in [0, 1] (mapped to the official [-1, 1]
    domain internally)."""
    model = Vgg16Features()
    lins = [jnp.asarray(w) for w in lin_weights]

    @jax.jit
    def distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        fa = model.apply(vgg16_vars, a * 2.0 - 1.0)
        fb = model.apply(vgg16_vars, b * 2.0 - 1.0)
        total = 0.0
        for w, xa, xb in zip(lins, fa, fb):
            na = xa / jnp.sqrt(jnp.sum(xa**2, -1, keepdims=True) + 1e-10)
            nb = xb / jnp.sqrt(jnp.sum(xb**2, -1, keepdims=True) + 1e-10)
            d = jnp.sum((na - nb) ** 2 * w, axis=-1)  # lin 1x1 conv
            total = total + jnp.mean(d, axis=(-2, -1))  # spatial average
        return total

    return distance


def random_lpips_for_testing(rng: jax.Array) -> Callable:
    """Random-weight LPIPS (smoke / relative comparisons only)."""
    k1, k2 = jax.random.split(rng)
    vgg_vars = Vgg16Features().init(k1, jnp.zeros((1, 64, 64, 3)))
    lins = [
        np.abs(np.asarray(jax.random.normal(jax.random.fold_in(k2, i), (c,))))
        for i, c in enumerate(LPIPS_CHANNELS)
    ]
    return make_lpips(vgg_vars, lins)
