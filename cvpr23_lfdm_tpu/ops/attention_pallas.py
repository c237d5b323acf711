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


def _headpacked_kernel(
    qkv_ref, bias_ref, cos_ref, sin_ref, o_ref, *, heads, dim_head, p, f
):
    """qkv block [1, F, P, 3hd]; bias [1, F, heads*F]; cos/sin [F, 3hd];
    out [1, F, P, hd].

    Per pixel: all `heads` attentions in ONE matmul pair. K and V are
    tiled `heads`x along rows and masked so row (g, j) carries only head
    g's d-columns — `S[i, g*F+j] = q_g[i] . k_g[j]` lands heads side by
    side on the lane axis (heads*F lanes, dense), and the same masked
    tiling makes `A @ V_exp` scatter each head's output back to its own
    d-columns. No [.., d=32]- or [.., F=40]-minor tensor ever reaches
    HBM, which is where the XLA form loses (~2.3 GB/layer lane-padding
    at HW=1024)."""
    hd = heads * dim_head
    hf = heads * f
    dtype = qkv_ref.dtype
    cos = cos_ref[:].astype(jnp.float32)  # [F, 3hd]
    sin = sin_ref[:].astype(jnp.float32)
    blk = _apply_rotary_fp32(
        qkv_ref[0].astype(jnp.float32), cos, sin, hd
    ).astype(dtype)  # [F, P, 3hd]

    bias = bias_ref[0]  # [F, heads*F] fp32
    # row (g, j) of the tiled K/V keeps only head g's d-columns
    rows = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 1)
    mask = (rows // f) == (cols // dim_head)
    maskf = mask.astype(dtype)

    for pp in range(p):
        x = blk[:, pp, :]  # [F, 3hd]
        q = x[:, :hd]
        kv = jnp.concatenate([x[:, hd:]] * heads, axis=0)  # [heads*F, 2hd]
        k8 = jnp.where(mask, kv[:, :hd], 0)
        v8 = jnp.where(mask, kv[:, hd:], 0)
        s = jax.lax.dot_general(
            q, k8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F, heads*F]
        s = s + bias
        # Segmented softmax WITHOUT per-head lane slicing (measured 3x the
        # whole kernel's cost as 8 sliced [F, F] softmaxes): subtracting the
        # GLOBAL row max is a uniform shift, so per-segment softmax is
        # unchanged; each head's denominator then lands on its own
        # d-columns by multiplying exp(s) with the SAME block mask the
        # values use — the softmax normalization becomes MXU work.
        m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - m).astype(dtype)  # [F, heads*F]
        num = jnp.dot(e, v8, preferred_element_type=jnp.float32)  # [F, hd]
        den = jnp.dot(e, maskf, preferred_element_type=jnp.float32)
        # a head whose logits sit >~88 below the GLOBAL row max underflows
        # its whole segment to 0; clamp so it degrades to 0 output, not NaN
        den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
        o_ref[0, :, pp, :] = (num / den).astype(o_ref.dtype)


def _apply_rotary_fp32(x, cos, sin, hd):
    """Forward rotary fold on `[F, P, 3hd]` (fp32 rolls; see kernel)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 3 * hd), 2)
    even = (lane % 2) == 0
    rot = jnp.where(
        even, -pltpu.roll(x, 3 * hd - 1, axis=2), pltpu.roll(x, 1, axis=2)
    )
    return x * cos[:, None, :] + rot * sin[:, None, :]


def _headpacked_bwd_kernel(
    qkv_ref, bias_ref, cos_ref, sin_ref, do_ref, dqkv_ref, dbias_ref,
    *, heads, dim_head, p, f,
):
    """Recompute-based backward of `_headpacked_kernel`.

    Same head-packed structure: softmax backward's per-segment row sums
    come from matmuls against `kron(I_h, ones(F,F))`, and the tiled
    dk8/dv8 collapse back to per-frame dk/dv through a tile-of-identity
    matmul. dbias accumulates across pixels and grid columns (the bias
    block revisits (i, 0, 0); TPU grids run sequentially)."""
    hd = heads * dim_head
    hf = heads * f
    dtype = qkv_ref.dtype
    cos = cos_ref[:].astype(jnp.float32)
    sin = sin_ref[:].astype(jnp.float32)
    blk = _apply_rotary_fp32(qkv_ref[0].astype(jnp.float32), cos, sin, hd)
    blk = blk.astype(dtype)
    bias = bias_ref[0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 1)
    mask = (rows // f) == (cols // dim_head)
    maskf = mask.astype(dtype)
    # same-segment lane matrix [hf, hf] and the untile matrix [f, hf]
    r1 = jax.lax.broadcasted_iota(jnp.int32, (hf, hf), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (hf, hf), 1)
    blockff = ((r1 // f) == (c1 // f)).astype(jnp.float32)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (f, hf), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (f, hf), 1)
    untile = (jax.lax.rem(c2, f) == r2).astype(dtype)

    dbias_acc = jnp.zeros((f, hf), jnp.float32)
    for pp in range(p):
        x = blk[:, pp, :]
        q = x[:, :hd]
        kv = jnp.concatenate([x[:, hd:]] * heads, axis=0)
        k8 = jnp.where(mask, kv[:, :hd], 0)
        v8 = jnp.where(mask, kv[:, hd:], 0)
        s = jax.lax.dot_general(
            q, k8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)  # [F, hf] fp32
        dl = jnp.dot(
            e.astype(dtype), blockff.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        prob = e / jnp.maximum(dl, jnp.finfo(jnp.float32).tiny)
        probt = prob.astype(dtype)
        do = do_ref[0, :, pp, :]  # [F, hd]
        dp = jax.lax.dot_general(
            do, v8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F, hf]
        c = jnp.dot(
            (prob * dp).astype(dtype), blockff.astype(dtype),
            preferred_element_type=jnp.float32,
        )
        ds = prob * (dp - c)  # [F, hf] fp32
        dbias_acc = dbias_acc + ds
        dst = ds.astype(dtype)
        dq = jnp.dot(dst, k8, preferred_element_type=jnp.float32)
        dk8 = jax.lax.dot_general(
            dst, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [hf, hd]
        dk = jnp.dot(
            untile, (dk8.astype(dtype) * maskf),
            preferred_element_type=jnp.float32,
        )
        dv8 = jax.lax.dot_general(
            probt, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv = jnp.dot(
            untile, (dv8.astype(dtype) * maskf),
            preferred_element_type=jnp.float32,
        )
        dx = jnp.concatenate([dq, dk, dv], axis=1)  # [F, 3hd] fp32
        # rotary adjoint: <rot(x), y> = <x, -rot(y)>
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 3 * hd), 1)
        even = (lane % 2) == 0
        rot = jnp.where(
            even, -pltpu.roll(dx, 3 * hd - 1, axis=1),
            pltpu.roll(dx, 1, axis=1),
        )
        dqkv_ref[0, :, pp, :] = (dx * cos - rot * sin).astype(dqkv_ref.dtype)

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dbias_ref[0] = dbias_acc.astype(dbias_ref.dtype)

    @pl.when(j != 0)
    def _acc():
        dbias_ref[0] = dbias_ref[0] + dbias_acc.astype(dbias_ref.dtype)


def _headpacked_call(qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret):
    b, f, hw, thd = qkv.shape
    hd = heads * dim_head
    assert thd == 3 * hd, (thd, heads, dim_head)
    p = min(pack, hw)
    assert hw % p == 0, (hw, p)

    kernel = functools.partial(
        _headpacked_kernel, heads=heads, dim_head=dim_head, p=p, f=f
    )
    return pl.pallas_call(
        kernel,
        grid=(b, hw // p),
        in_specs=[
            pl.BlockSpec(
                (1, f, p, thd), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, heads * f), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f, thd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f, thd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, p, hd), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, hw, hd), qkv.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=b * hw * heads * (2 * f * f * dim_head * 2),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * hw * heads * f * f,
        ),
        interpret=interpret,
    )(qkv, bias_flat, cos_t, sin_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _headpacked_diff(qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret):
    return _headpacked_call(
        qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret
    )


def _headpacked_diff_fwd(qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret):
    out = _headpacked_call(
        qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret
    )
    return out, (qkv, bias_flat, cos_t, sin_t)


def _headpacked_diff_bwd(heads, dim_head, pack, interpret, res, do):
    qkv, bias_flat, cos_t, sin_t = res
    b, f, hw, thd = qkv.shape
    hd = heads * dim_head
    p = min(pack, hw)
    kernel = functools.partial(
        _headpacked_bwd_kernel, heads=heads, dim_head=dim_head, p=p, f=f
    )
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(b, hw // p),
        in_specs=[
            pl.BlockSpec(
                (1, f, p, thd), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, heads * f), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f, thd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f, thd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, f, p, hd), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, f, p, thd), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, f, heads * f), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, f, hw, thd), qkv.dtype),
            jax.ShapeDtypeStruct((b, f, heads * f), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        interpret=interpret,
    )(qkv, bias_flat, cos_t, sin_t, do)
    return dqkv, dbias, jnp.zeros_like(cos_t), jnp.zeros_like(sin_t)


_headpacked_diff.defvjp(_headpacked_diff_fwd, _headpacked_diff_bwd)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "pack", "interpret")
)
def headpacked_temporal_attention(
    qkv: jnp.ndarray,
    bias_flat: jnp.ndarray,
    cos_t: jnp.ndarray,
    sin_t: jnp.ndarray,
    heads: int,
    dim_head: int,
    pack: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Head-packed temporal attention, natural `[B, F, HW, 3*h*d]` layout.

    Differentiable (custom VJP with a recompute-based backward kernel),
    so it serves BOTH sampling and the DM training step.

    Args:
      qkv: `[B, F, HW, 3*heads*d]` raw to_qkv output (rotary NOT applied —
        it is folded inside the kernel via cos_t/sin_t).
      bias_flat: `[B, F, heads*F]` fp32 additive bias,
        `bias_flat[b, i, g*F + j] = pos_bias[g, i, j]` (+ focus-present
        handling), see :func:`build_bias_flat`.
      cos_t/sin_t: `[F, 3*heads*d]` rotary tables with the q-scale folded
        (:func:`rotary_tables`).

    Returns `[B, F, HW, heads*d]`.
    """
    return _headpacked_diff(
        qkv, bias_flat, cos_t, sin_t, heads, dim_head, pack, interpret
    )


def _fused_layer_kernel(
    x_ref, gamma_ref, wqkv_ref, wout_ref, bias_ref, cos_ref, sin_ref,
    o_ref, att_ref, *, heads, dim_head, p, pm, f, c, eps,
):
    """Whole PreNorm-residual temporal attention layer in one kernel.

    x block [1, F, P, C] -> LayerNorm(C) -> qkv = xn @ Wqkv -> rotary ->
    head-packed attention (pm pixels per matmul, frame-major M rows) ->
    out = o @ Wout -> x + out. The XLA pipeline materializes the
    [B, F, HW, 3hd] qkv tensor in HBM twice (write + kernel read,
    ~1 GB/layer at B=8 HW=1024) plus LN/residual round-trips; here every
    intermediate lives in VMEM (att_ref scratch holds the attention
    output so the out-projection runs as ONE [F*P, hd] matmul).
    """
    hd = heads * dim_head
    hf = heads * f
    dtype = x_ref.dtype
    x = x_ref[0]  # [F, P, C]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = (xn * gamma_ref[:].astype(jnp.float32)).astype(dtype)

    wqkv = wqkv_ref[:].astype(dtype)  # [C, 3hd]
    qkv = jax.lax.dot_general(
        xn.reshape(f * p, c), wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(f, p, 3 * hd)
    cos = cos_ref[:].astype(jnp.float32)  # [F, 3hd]
    sin = sin_ref[:].astype(jnp.float32)
    blk = _apply_rotary_fp32(qkv, cos, sin, hd).astype(dtype)  # [F, P, 3hd]

    bias = bias_ref[0]  # [F, hf] fp32
    # k/v row (g, j) keeps only head g's d-columns (see _headpacked_kernel)
    rows = jax.lax.broadcasted_iota(jnp.int32, (pm * hf, hd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (pm * hf, hd), 1)
    mask = (rows % hf // f) == (cols // dim_head)
    maskf = mask.astype(dtype)

    if pm == 1:
        bias_pm = bias
    else:
        # queries frame-major [F*pm]; keys/values pixel-major [pm*hf]:
        # bias_pm[i*pm + px, px'*hf + g*F + j] = bias[i, g*F+j] iff px==px'
        r = jax.lax.broadcasted_iota(jnp.int32, (f * pm, pm * hf), 0)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (f * pm, pm * hf), 1)
        same_px = (r % pm) == (cidx // hf)
        btile = jnp.concatenate([bias] * pm, axis=1)  # [F, pm*hf]
        btile = btile.reshape(f, 1, pm * hf)
        btile = jnp.concatenate([btile] * pm, axis=1).reshape(f * pm, pm * hf)
        bias_pm = jnp.where(same_px, btile, NEG_INF)

    for p0 in range(0, p, pm):
        if pm == 1:
            xq = blk[:, p0, :]  # [F, 3hd]
            q = xq[:, :hd]
            kv = jnp.concatenate([xq[:, hd:]] * heads, axis=0)  # [hf, 2hd]
        else:
            xq = blk[:, p0 : p0 + pm, :]  # [F, pm, 3hd]
            q = xq[..., :hd].reshape(f * pm, hd)  # frame-major rows
            kv = jnp.concatenate(
                [
                    jnp.concatenate([xq[:, i, hd:]] * heads, axis=0)
                    for i in range(pm)
                ],
                axis=0,
            )  # [pm*hf, 2hd] pixel-major rows
        k8 = jnp.where(mask, kv[:, :hd], 0)
        v8 = jnp.where(mask, kv[:, hd:], 0)
        s = jax.lax.dot_general(
            q, k8, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [F*pm, pm*hf]
        s = s + bias_pm
        m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
        e = jnp.exp(s - m).astype(dtype)
        num = jnp.dot(e, v8, preferred_element_type=jnp.float32)
        den = jnp.dot(e, maskf, preferred_element_type=jnp.float32)
        den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
        o = (num / den).astype(dtype)  # [F*pm, hd]
        if pm == 1:
            att_ref[:, p0, :] = o
        else:
            att_ref[:, p0 : p0 + pm, :] = o.reshape(f, pm, hd)

    wout = wout_ref[:].astype(dtype)  # [hd, C]
    proj = jax.lax.dot_general(
        att_ref[:].reshape(f * p, hd), wout,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(f, p, c)
    o_ref[0] = x + proj.astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "dim_head", "pack", "pixels_per_matmul",
                     "eps", "interpret"),
)
def fused_temporal_layer(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    wqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bias_flat: jnp.ndarray,
    cos_t: jnp.ndarray,
    sin_t: jnp.ndarray,
    heads: int,
    dim_head: int,
    pack: int = 32,
    pixels_per_matmul: int = 1,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """`x + to_out(attn(rotary(to_qkv(LN(x)))))` as one Pallas pass.

    Serving fast path for the whole PreNormResidual temporal-attention
    layer (video_flow_diffusion.py:132-138 + 286-363). Forward-only: the
    training step keeps the `pallas2` headpacked custom-VJP path.

    Args:
      x: `[B, F, HW, C]` layer input (residual source).
      gamma: `[C]` ChannelLayerNorm scale.
      wqkv: `[C, 3*heads*d]` to_qkv kernel; wout: `[heads*d, C]` to_out.
      bias_flat: `[B, F, heads*F]` (:func:`build_bias_flat`).
      cos_t/sin_t: `[F, 3*heads*d]` rotary tables (:func:`rotary_tables`).
      pixels_per_matmul: pm pixels batched into each attention matmul
        (M = pm*F query rows, N = pm*heads*F lanes); must divide `pack`.

    Returns `[B, F, HW, C]`.
    """
    b, f, hw, c = x.shape
    hd = heads * dim_head
    p = min(pack, hw)
    assert hw % p == 0, (hw, p)
    pm = pixels_per_matmul
    while p % pm:
        pm //= 2
    kernel = functools.partial(
        _fused_layer_kernel, heads=heads, dim_head=dim_head, p=p, pm=pm,
        f=f, c=c, eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, hw // p),
        in_specs=[
            pl.BlockSpec(
                (1, f, p, c), lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, 3 * hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (hd, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, f, heads * f), lambda i, j: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (f, 3 * hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (f, 3 * hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, f, p, c), lambda i, j: (i, 0, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, hw, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((f, p, hd), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * hw * c * (3 + 1) * hd
            + b * hw * heads * (2 * f * f * dim_head * 2) * pm,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=b * hw * heads * f * f * pm,
        ),
        interpret=interpret,
    )(x, gamma, wqkv, wout, bias_flat, cos_t, sin_t)


def _fused_linear_kernel(
    x_ref, gamma_ref, wqkv_ref, wout_ref, bout_ref, o_ref,
    *, heads, dim_head, fp, n, c, eps,
):
    """Whole PreNorm-residual spatial linear-attention layer in one kernel.

    x block [1, FP, N, C] (FP frames of N=H*W pixels). Per frame:
    q-softmax over each head's d lanes (per-head max via static lane
    slices; denominator via block-mask matmul), k-softmax over pixels,
    context = k^T v and out = q @ context as same-head-masked full-rank
    matmuls (cross-head blocks are discarded MXU work, far cheaper than
    per-head [.., 32]-minor relayouts). Ends with the biased out
    projection + residual. Reference math: video_flow_diffusion.py:240-265.
    """
    d = dim_head
    hd = heads * d
    dtype = x_ref.dtype
    lane = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 0)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (hd, hd), 1)
    block = ((lane // d) == (lane2 // d))
    blockf = block.astype(dtype)

    x = x_ref[0]  # [FP, N, C]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = (xn * gamma_ref[:].astype(jnp.float32)).astype(dtype)

    wqkv = wqkv_ref[:].astype(dtype)
    qkv = jax.lax.dot_general(
        xn.reshape(fp * n, c), wqkv,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(fp, n, 3 * hd)  # fp32

    wout = wout_ref[:].astype(dtype)
    bout = bout_ref[:].astype(jnp.float32)

    for ff in range(fp):
        q = qkv[ff, :, :hd]      # [N, hd] fp32
        k = qkv[ff, :, hd : 2 * hd]
        v = qkv[ff, :, 2 * hd :].astype(dtype)
        # q: per-head softmax over d lanes (static slices for the max)
        mh = jnp.concatenate(
            [
                jnp.broadcast_to(
                    jnp.max(q[:, g * d : (g + 1) * d], axis=-1, keepdims=True),
                    (n, d),
                )
                for g in range(heads)
            ],
            axis=1,
        )
        eq = jnp.exp(q - mh).astype(dtype)
        den = jnp.dot(eq, blockf, preferred_element_type=jnp.float32)
        den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
        qn = (eq.astype(jnp.float32) / den).astype(dtype) * (d**-0.5)
        # k: softmax over pixels
        km = jnp.max(k, axis=0, keepdims=True)
        ek = jnp.exp(k - km)
        ksum = jnp.sum(ek, axis=0, keepdims=True)
        kn = (ek / ksum).astype(dtype)
        context = jax.lax.dot_general(
            kn, v, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [hd, hd]
        context = jnp.where(block, context, 0.0).astype(dtype)
        out = jnp.dot(qn, context, preferred_element_type=jnp.float32)
        proj = jax.lax.dot_general(
            out.astype(dtype), wout,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bout
        o_ref[0, ff] = x[ff] + proj.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("heads", "dim_head", "eps", "interpret")
)
def fused_spatial_linear_layer(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    wqkv: jnp.ndarray,
    wout: jnp.ndarray,
    bout: jnp.ndarray,
    heads: int,
    dim_head: int,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """`x + to_out(linear_attn(to_qkv(LN(x))))` as one Pallas pass.

    Serving fast path for the PreNormResidual spatial linear-attention
    layer. Frames are packed per grid step so deep-level blocks stay
    MXU-sized.

    Args:
      x: `[B, F, HW, C]`; gamma: `[C]`; wqkv: `[C, 3*heads*d]`;
      wout: `[heads*d, C]`; bout: `[C]` (to_out bias).

    Returns `[B, F, HW, C]`.
    """
    b, f, hw, c = x.shape
    hd = heads * dim_head
    # pack frames so each block carries >=2048 rows (amortizes dispatch)
    fp = 1
    while fp < f and (fp * 2) * hw <= 4096 and f % (fp * 2) == 0:
        fp *= 2
    kernel = functools.partial(
        _fused_linear_kernel, heads=heads, dim_head=dim_head, fp=fp, n=hw,
        c=c, eps=eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, f // fp),
        in_specs=[
            pl.BlockSpec(
                (1, fp, hw, c), lambda i, j: (i, j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (c, 3 * hd), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (hd, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, fp, hw, c), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, f, hw, c), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * hw * c * 4 * hd + 4 * b * f * hw * hd * hd,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=2 * b * f * hw * hd,
        ),
        interpret=interpret,
    )(x, gamma, wqkv, wout, bout)


def build_bias_flat(
    pos_bias: jnp.ndarray,
    batch: int,
    f: int,
    focus_present_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Rel-pos bias (+ focus self-only rows) as `[B, F, heads*F]` fp32:
    `out[b, i, g*F + j] = pos_bias[g, i, j]`, or -inf off the frame
    diagonal for focused batch entries.

    The bias is pre-shifted so every (head, query-row)'s max is 0: the
    head-packed kernels subtract one GLOBAL row max across all heads
    before exp, so a head whose logits sit ~88+ below another head's
    would underflow its whole segment to zero. Softmax is invariant to a
    per-(head, row) constant, so this shift is free and exact; it removes
    the bias-driven part of the cross-head spread entirely (the learned
    T5 bias levels are unbounded across heads). The residual spread from
    q.k magnitudes is bounded by scale*|q||k| in practice."""
    heads = pos_bias.shape[0]
    pos_bias = pos_bias - jax.lax.stop_gradient(
        jnp.max(pos_bias, axis=-1, keepdims=True)
    )
    flat = pos_bias.transpose(1, 0, 2).reshape(f, heads * f)  # [i, g*F+j]
    out = jnp.broadcast_to(flat[None].astype(jnp.float32), (batch, f, heads * f))
    if focus_present_mask is not None:
        self_only = jnp.where(
            jnp.tile(jnp.eye(f, dtype=bool), (1, heads)).reshape(f, heads * f)[
                None
            ],
            flat[None].astype(jnp.float32),
            NEG_INF,
        )
        out = jnp.where(focus_present_mask[:, None, None], self_only, out)
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
