"""Background motion predictor: global 3x3 transform from an image pair.

Reference: LFAE/modules/bg_motion_predictor.py:15-57. Encoder over
concat(source, driving), global mean pool of the coarsest scale, FC head
initialized to the identity transform.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.models.blocks import Encoder


def _identity_bias(bg_type: str):
    import numpy as np

    if bg_type == "perspective":
        return np.array([1, 0, 0, 0, 1, 0, 0, 0], dtype=np.float32)
    if bg_type == "affine":
        return np.array([1, 0, 0, 0, 1, 0], dtype=np.float32)
    return np.zeros(2, dtype=np.float32)


class BGMotionPredictor(nn.Module):
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    bg_type: str = "affine"  # zero | shift | affine | perspective
    axis_name: str | None = None
    dtype: jnp.dtype | None = None  # encoder conv compute dtype

    @nn.compact
    def __call__(self, source, driving, train: bool = False) -> jnp.ndarray:
        """`[B, H, W, 3]` x2 -> `[B, 3, 3]` transform (identity rows appended)."""
        assert self.bg_type in ("zero", "shift", "affine", "perspective")
        b = source.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (b, 3, 3))
        if self.bg_type == "zero":
            return eye

        feats = Encoder(
            self.block_expansion, self.num_blocks, self.max_features,
            axis_name=self.axis_name, dtype=self.dtype, name="encoder",
        )(jnp.concatenate([source, driving], axis=-1), train)
        pooled = jnp.mean(feats[-1].astype(jnp.float32), axis=(1, 2))

        n_out = {"shift": 2, "affine": 6, "perspective": 8}[self.bg_type]
        pred = nn.Dense(
            n_out,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _identity_bias(self.bg_type), dtype
            ),
            name="fc",
        )(pooled)

        if self.bg_type == "shift":
            out = eye.at[:, :2, 2].set(pred)
        elif self.bg_type == "affine":
            out = eye.at[:, :2, :].set(pred.reshape(b, 2, 3))
        else:  # perspective
            out = eye.at[:, :2, :].set(pred[:, :6].reshape(b, 2, 3))
            out = out.at[:, 2, :2].set(pred[:, 6:].reshape(b, 2))
        return out
