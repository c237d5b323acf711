"""LFAE conv building blocks (reference LFAE/modules/util.py:70-214), NHWC.

TPU-first deviations from the reference's layer zoo:
* NHWC layout (TPU conv-friendly) instead of NCHW.
* BatchNorm carries an optional `axis_name`; when set, batch statistics are
  reduced with `lax.pmean` across the data mesh axis — a one-line TPU-native
  replacement for the 650-LoC thread-based SyncBN package
  (sync_batchnorm/batchnorm.py:48-125).
* Down/upsampling via reshape-mean / repeat (no windowed reductions needed).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from cvpr23_lfdm_tpu.ops.resize import avg_pool_2x2, upsample_nearest_2x


def batch_norm(axis_name: str | None = None, name: str | None = None) -> nn.BatchNorm:
    """Torch-semantics BatchNorm2d (momentum .1, eps 1e-5, affine).

    Call as `bn(x, use_running_average=not train)`. Under pjit-style data
    parallelism batch statistics are global automatically (the mean over a
    sharded batch axis compiles to an ICI all-reduce); `axis_name` is only
    needed for shard_map/pmap-style SPMD — either way this replaces the
    reference's thread-based SyncBN (sync_batchnorm/batchnorm.py:48-125).
    """
    return nn.BatchNorm(
        momentum=0.9, epsilon=1e-5, axis_name=axis_name, dtype=jnp.float32, name=name
    )


def conv2d(features: int, kernel_size: int | tuple[int, int], name: str | None = None,
           dtype=None):
    """Torch-default Conv2d: symmetric zero pad (k//2 when odd), with bias."""
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    pad = [(k // 2, k // 2) for k in kernel_size]
    return nn.Conv(features, kernel_size, padding=pad, dtype=dtype, name=name)


class SameBlock2d(nn.Module):
    """conv -> BN -> ReLU, resolution preserved (util.py:135-150)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, name="conv", dtype=self.dtype)(x)
        x = batch_norm(self.axis_name, name="norm")(x, use_running_average=not train)
        return nn.relu(x).astype(self.dtype or x.dtype)


class DownBlock2d(nn.Module):
    """conv -> BN -> ReLU -> avgpool2 (util.py:115-132)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv2d(self.features, self.kernel_size, name="conv", dtype=self.dtype)(x)
        x = batch_norm(self.axis_name, name="norm")(x, use_running_average=not train)
        x = nn.relu(x).astype(self.dtype or x.dtype)
        return avg_pool_2x2(x)


class UpBlock2d(nn.Module):
    """nearest-2x -> conv -> BN -> ReLU (util.py:95-112)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_nearest_2x(x)
        x = conv2d(self.features, self.kernel_size, name="conv", dtype=self.dtype)(x)
        x = batch_norm(self.axis_name, name="norm")(x, use_running_average=not train)
        return nn.relu(x).astype(self.dtype or x.dtype)


class ResBlock2d(nn.Module):
    """BN -> ReLU -> conv -> BN -> ReLU -> conv -> +x (util.py:70-92)."""

    features: int
    kernel_size: int = 3
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = batch_norm(self.axis_name, name="norm1")(x, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.features, self.kernel_size, name="conv1", dtype=self.dtype)(out)
        out = batch_norm(self.axis_name, name="norm2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = conv2d(self.features, self.kernel_size, name="conv2", dtype=self.dtype)(out)
        return (out + x).astype(self.dtype or x.dtype)


def _encoder_channels(block_expansion: int, num_blocks: int, max_features: int) -> list[int]:
    return [min(max_features, block_expansion * (2 ** (i + 1))) for i in range(num_blocks)]


class Encoder(nn.Module):
    """Hourglass encoder: stack of DownBlocks, returns all scales
    (input included) coarsest-last (util.py:153-172)."""

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> list[jnp.ndarray]:
        outs = [x]
        for i, ch in enumerate(_encoder_channels(self.block_expansion, self.num_blocks, self.max_features)):
            outs.append(
                DownBlock2d(ch, 3, axis_name=self.axis_name, dtype=self.dtype, name=f"down_{i}")(outs[-1], train)
            )
        return outs


class Decoder(nn.Module):
    """Hourglass decoder with skip concatenation (util.py:175-199).

    Output channels = block_expansion + in_features of the encoder input.
    """

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        feats = list(feats)
        out = feats.pop()
        for j, i in enumerate(reversed(range(self.num_blocks))):
            ch = min(self.max_features, self.block_expansion * (2**i))
            out = UpBlock2d(ch, 3, axis_name=self.axis_name, dtype=self.dtype, name=f"up_{j}")(out, train)
            out = jnp.concatenate([out, feats.pop()], axis=-1)
        return out


class Hourglass(nn.Module):
    """Encoder + decoder (util.py:202-214)."""

    block_expansion: int
    num_blocks: int = 3
    max_features: int = 256
    axis_name: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        feats = Encoder(
            self.block_expansion, self.num_blocks, self.max_features,
            axis_name=self.axis_name, dtype=self.dtype, name="encoder",
        )(x, train)
        return Decoder(
            self.block_expansion, self.num_blocks, self.max_features,
            axis_name=self.axis_name, dtype=self.dtype, name="decoder",
        )(feats, train)

    @staticmethod
    def out_filters(block_expansion: int, in_features: int) -> int:
        return block_expansion + in_features
