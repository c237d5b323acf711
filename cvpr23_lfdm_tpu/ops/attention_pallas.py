"""Pallas TPU kernel: packed temporal attention.

The UNet's hotspot (~75% of an eval) is temporal attention: per (pixel,
head) a full [F, F] attention over F~40 frames with d=32. XLA's batched
form both underfills the MXU (40x40x32 matmuls) and — decisively — pays
lane-padding HBM traffic: every [.., F] / [.., d] tensor pads its 40/32
lanes to 128, so one layer moves ~2.3 GB (measured by XLA cost analysis)
instead of the ~0.2 GB of real data.

This kernel avoids both:
* qkv streams in the Dense layout `[.., F, 3*heads*d]` whose 768 lanes are
  unpadded; heads are split by static lane slices INSIDE VMEM.
* P pixels pack into one `[P*F, d]` tile per head, so the sim matrix is a
  single MXU matmul; cross-pixel entries are masked to -inf through a
  precomputed additive bias, and the softmax never leaves VMEM.

Rotary embedding and the q-scale are folded into elementwise cos/sin
tables applied to the whole qkv tensor on the XLA side (v columns get
cos=1, sin=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -0.7 * float(np.finfo(np.float32).max)


def pick_pack(hw: int, f: int, target_rows: int = 256) -> int:
    """Largest power-of-2 P dividing hw with P*F <= target rows."""
    best = 1
    p = 1
    while p <= hw:
        if hw % p == 0 and p * f <= target_rows:
            best = p
        p *= 2
    return best


def _kernel(qkv_ref, bias_ref, o_ref, *, heads, dim_head, p, f):
    """qkv block [1, P, F, 3*h*d]; bias [1, h, PF, PF]; out [1, P, F, h*d]."""
    blk = qkv_ref[0]          # [P, F, 3hd]
    pf = p * f
    d = dim_head
    hd = heads * d
    for hh in range(heads):
        q = blk[:, :, hh * d : (hh + 1) * d].reshape(pf, d)
        k = blk[:, :, hd + hh * d : hd + (hh + 1) * d].reshape(pf, d)
        v = blk[:, :, 2 * hd + hh * d : 2 * hd + (hh + 1) * d].reshape(pf, d)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + bias_ref[0, hh]
        s = s - jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        prob = jax.nn.softmax(s, axis=-1)
        o = jnp.dot(
            prob.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, :, hh * d : (hh + 1) * d] = o.reshape(p, f, d).astype(
            o_ref.dtype
        )


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "pack", "interpret")
)
def packed_temporal_attention(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    heads: int,
    dim_head: int,
    pack: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blocked masked attention over the frame axis.

    Args:
      qkv: `[B, HW, F, 3*heads*d]` — q|k|v concatenated on the last axis,
        rotary and q-scale already applied.
      bias: `[B, heads, P*F, P*F]` fp32 additive bias (rel-pos bias tiled
        over the PxP pixel grid, cross-pixel entries -inf; focus-present
        rows keep only the frame diagonal).
      pack: P pixels per tile; must divide HW.

    Returns `[B, HW, F, heads*d]`.
    """
    b, hw, f, thd = qkv.shape
    hd = heads * dim_head
    assert thd == 3 * hd, (thd, heads, dim_head)
    p = pack
    assert hw % p == 0, (hw, p)
    blocks = hw // p
    pf = p * f

    kernel = functools.partial(
        _kernel, heads=heads, dim_head=dim_head, p=p, f=f
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, blocks),
        in_specs=[
            pl.BlockSpec(
                (1, p, f, thd), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, heads, pf, pf), lambda i, j: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, p, f, hd), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hw, f, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=b * blocks * heads * (2 * pf * pf * dim_head * 2),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2 + bias.size * 4,
            transcendentals=b * blocks * heads * pf * pf,
        ),
        interpret=interpret,
    )(qkv, bias)
    return out


def rotary_tables(
    f: int, heads: int, dim_head: int, scale: float, dtype
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fold rotary + q-scale into full-width qkv tables `[F, 3*h*d]`:
    q columns get scale*cos/scale*sin, k columns cos/sin, v columns 1/0."""
    rot_dim = min(32, dim_head)
    freqs = 1.0 / (10000.0 ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    ang = np.repeat(np.outer(np.arange(f, dtype=np.float64), freqs), 2, -1)
    cos1 = np.ones((f, dim_head))
    sin1 = np.zeros((f, dim_head))
    cos1[:, :rot_dim] = np.cos(ang)
    sin1[:, :rot_dim] = np.sin(ang)
    cos_h = np.tile(cos1, (1, heads))
    sin_h = np.tile(sin1, (1, heads))
    ones = np.ones_like(cos_h)
    zeros = np.zeros_like(sin_h)
    cos_t = np.concatenate([scale * cos_h, cos_h, ones], axis=-1)
    sin_t = np.concatenate([scale * sin_h, sin_h, zeros], axis=-1)
    return jnp.asarray(cos_t, dtype), jnp.asarray(sin_t, dtype)


def rotate_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved rotary partner: (x0,x1,...) -> (-x1,x0,...), applied
    uniformly over the last axis (v columns neutralized by sin=0)."""
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def build_bias(
    pos_bias: jnp.ndarray,
    batch: int,
    pack: int,
    f: int,
    focus_present_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Rel-pos bias + block-diagonal mask (+ focus self-only rows) as one
    additive `[B, heads, P*F, P*F]` fp32 tensor."""
    heads = pos_bias.shape[0]
    p = pack
    pf = p * f
    block_mask = (
        jnp.kron(jnp.eye(p, dtype=jnp.float32), jnp.ones((f, f), jnp.float32)) > 0
    )
    tiled = jnp.tile(pos_bias.astype(jnp.float32), (1, p, p))  # [h, PF, PF]
    base = jnp.where(block_mask[None], tiled, NEG_INF)
    out = jnp.broadcast_to(base[None], (batch, heads, pf, pf))
    if focus_present_mask is not None:
        self_mask = jnp.eye(pf, dtype=bool)
        focused = jnp.where(self_mask[None], tiled, NEG_INF)
        out = jnp.where(
            focus_present_mask[:, None, None, None], focused[None], out
        )
    return out
