"""Fused GroupNorm + FiLM + SiLU Pallas kernel (serving forward).

The 3D UNet's `Block` (reference DM/modules/video_flow_diffusion.py:196-211:
conv -> GroupNorm(8) -> (scale, shift) -> SiLU) appears ~32 times per UNet
eval. Hypothesis was that XLA's stats reduce + apply passes cost ~2 reads
+ 1 write per activation; measured on v5e the kernel LOSES (UNet eval B=1
7.0 -> 9.1 ms, B=8 39.7 -> 47.3): XLA fuses the GN stats into the
producing conv's epilogue and the normalize/FiLM/SiLU into the consumer,
so the real XLA cost is ~1 read and this custom call only inserts HBM
materialization boundaries. Kept as a documented negative result behind
`Unet3D.fused_norm` (default OFF); parity-tested vs the flax Block.

Forward-only: training keeps the flax GroupNorm (autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, gamma_ref, beta_ref, scale_ref, shift_ref, o_ref, *,
            groups, eps, film):
    f, h, w, c = x_ref.shape[1:]
    n = f * h * w
    x = x_ref[0].reshape(n, c)
    xf = x.astype(jnp.float32)

    # per-channel sums (sublane reduce), then segment to groups and back
    # via tiny static indicator matmuls (no lane-split reshapes)
    s_c = jnp.sum(xf, axis=0, keepdims=True)          # [1, C]
    ss_c = jnp.sum(xf * xf, axis=0, keepdims=True)    # [1, C]
    rows = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    seg = (rows * groups // c == cols).astype(jnp.float32)  # [C, G]
    cnt = float(n * c // groups)
    mean_g = jnp.dot(s_c, seg, preferred_element_type=jnp.float32) / cnt
    ms_g = jnp.dot(ss_c, seg, preferred_element_type=jnp.float32) / cnt
    var_g = ms_g - mean_g * mean_g                     # [1, G]
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, seg.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, seg.T, preferred_element_type=jnp.float32)

    g = gamma_ref[:].astype(jnp.float32)[None, :]
    b = beta_ref[:].astype(jnp.float32)[None, :]
    mul = inv_c * g                                    # [1, C] fp32
    add = b - mean_c * mul
    if film:
        i = pl.program_id(0)
        sc = scale_ref[i, :].astype(jnp.float32)[None, :] + 1.0
        sh = shift_ref[i, :].astype(jnp.float32)[None, :]
        mul = mul * sc
        add = add * sc + sh
    y = xf * mul + add
    y = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)
    o_ref[0] = y.reshape(f, h, w, c)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "interpret"))
def groupnorm_film_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    scale: jnp.ndarray | None = None,
    shift: jnp.ndarray | None = None,
    groups: int = 8,
    eps: float = 1e-5,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """`silu(GroupNorm(x) * (scale+1) + shift)` in one VMEM pass.

    Args:
      x: `[B, F, H, W, C]`; gamma/beta: `[C]` GroupNorm affine params.
      scale/shift: optional `[B, C]` FiLM conditioning (broadcast F,H,W).

    Returns `[B, F, H, W, C]` in x.dtype. Statistics are fp32 per
    (batch, group) over (F, H, W, C/groups) — flax GroupNorm-identical.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bsz, f, h, w, c = x.shape
    assert c % groups == 0, (c, groups)
    film = scale is not None
    if scale is None:
        scale = jnp.zeros((bsz, c), jnp.float32)
        shift = jnp.zeros((bsz, c), jnp.float32)
    assert scale.shape == (bsz, c) and shift.shape == (bsz, c)
    # f32 tables: bf16 would make the kernel's dynamic row load need
    # 2-aligned sublane indices (Mosaic packing)
    scale = scale.astype(jnp.float32)
    shift = shift.astype(jnp.float32)

    kernel = functools.partial(_kernel, groups=groups, eps=eps, film=film)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, f, h, w, c), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            # whole [B, C] tables (VMEM block rules need full trailing
            # dims); the kernel row-indexes by program_id(0)
            pl.BlockSpec((bsz, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, h, w, c), lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=10 * x.size,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=x.size,
        ),
        interpret=interpret,
    )(x, gamma, beta, scale, shift)
