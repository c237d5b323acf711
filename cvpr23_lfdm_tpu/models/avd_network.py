"""AVD (Animation-via-Disentanglement) network.

Reference: LFAE/modules/avd_network.py:13-90 — id/pose MLP encoders over
flattened region params (shift 2 + affine 4 per region) and a decoder that
reconstructs region params; `revert_axis_swap` sign-corrects the id affine
against the pose affine. Constructed by the LFAE entry scripts
(run_mug.py:133-138) but unused in the training loss — provided here for
capability parity (cross-identity animation).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.ops.eig2x2 import inv_2x2


class _MLP(nn.Module):
    """Linear-BN-ReLU stack (avd_network.py:24-61)."""

    features: tuple[int, ...]
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"fc_{i}")(x)
            x = nn.BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=jnp.float32, name=f"bn_{i}"
            )(x, use_running_average=not train)
            x = nn.relu(x)
        return nn.Dense(self.out_features, name="out")(x)


def region_params_to_emb(params: dict) -> jnp.ndarray:
    """{shift [B,K,2], affine [B,K,2,2]} -> [B, 6K] (avd_network.py:63-69)."""
    b, k = params["shift"].shape[:2]
    return jnp.concatenate(
        [params["shift"], params["affine"].reshape(b, k, 4)], axis=-1
    ).reshape(b, -1)


def emb_to_region_params(emb: jnp.ndarray, num_regions: int) -> dict:
    """[B, 6K] -> {shift, affine} (avd_network.py:71-75)."""
    b = emb.shape[0]
    emb = emb.reshape(b, num_regions, 6)
    return {
        "shift": emb[..., :2],
        "affine": emb[..., 2:].reshape(b, num_regions, 2, 2),
    }


class AVDNetwork(nn.Module):
    num_regions: int = 10
    id_bottle_size: int = 64
    pose_bottle_size: int = 64
    revert_axis_swap: bool = True

    @nn.compact
    def __call__(self, x_id: dict, x_pose: dict, train: bool = False) -> dict:
        if self.revert_axis_swap:
            affine = jnp.matmul(x_id["affine"], inv_2x2(x_pose["affine"]))
            sign = jnp.sign(affine[:, :, 0:1, 0:1])
            x_id = {"affine": x_id["affine"] * sign, "shift": x_id["shift"]}

        hidden = (256, 512, 1024)
        pose_emb = _MLP(hidden, self.pose_bottle_size, name="pose_encoder")(
            region_params_to_emb(x_pose), train
        )
        id_emb = _MLP(hidden, self.id_bottle_size, name="id_encoder")(
            region_params_to_emb(x_id), train
        )
        rec = _MLP((1024, 512, 256), (2 + 4) * self.num_regions, name="decoder")(
            jnp.concatenate([pose_emb, id_emb], axis=1), train
        )
        out = emb_to_region_params(rec, self.num_regions)
        out["covar"] = jnp.matmul(
            out["affine"], jnp.swapaxes(out["affine"], -1, -2)
        )
        return out
