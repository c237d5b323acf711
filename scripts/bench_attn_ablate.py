"""Cycle attribution for the fused temporal-attention kernel.

Times ablated copies of `_fused_layer_kernel` at the serving hot shape
([8, 40, 1024, 64] bf16): each variant removes one piece of the
per-pixel inner loop; (full - variant) attributes device time to that
piece. Variants are NOT numerically meaningful — timing only.

Usage: python scripts/bench_attn_ablate.py [--variants full loop ...]

Measured (v5e, round 3): full 8.64 ms/layer in this harness; removing the
whole per-pixel loop -3.78; hoisting kv build+transpose -0.87; skipping
the score matmul -2.53 (its pure-MXU cost ~1.7 after subtracting the
hoisted build); exp -0.76; den matmul -0.66. The kt/kt_vm transposed-k8
forms are 2.1 ms WORSE; a per-step [F,P,hd]->[hd,P,F] k-transpose variant
fails Mosaic lowering (3D transpose of the minor axis). Conclusion: the
head-packed formulation sits ~1 ms/layer above its own matmul floor, and
the M=40-row matmuls are ~84%-per-MXU efficient — the remaining per-pixel
VPU glue (kv concat+mask ~0.9) is the only recoverable slice.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cvpr23_lfdm_tpu.ops.attention_pallas import (
    _apply_rotary_fp32,
    build_bias_flat,
    rotary_tables,
)
from cvpr23_lfdm_tpu.utils.profiling import time_fn

HEADS, D = 8, 32
HD = HEADS * D


def make_kernel(ablate):
    def kernel(x_ref, gamma_ref, wqkv_ref, wout_ref, bias_ref, cos_ref,
               sin_ref, o_ref, att_ref, *, p, f, c, eps=1e-5):
        hd, hf = HD, HEADS * f
        dtype = x_ref.dtype
        x = x_ref[0]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
        xn = ((xf - mean) * jax.lax.rsqrt(var + eps)
              * gamma_ref[:].astype(jnp.float32)).astype(dtype)
        qkv = jax.lax.dot_general(
            xn.reshape(f * p, c), wqkv_ref[:].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(f, p, 3 * hd)
        if ablate == "rotary":
            blk = qkv.astype(dtype)
        else:
            blk = _apply_rotary_fp32(
                qkv, cos_ref[:].astype(jnp.float32),
                sin_ref[:].astype(jnp.float32), hd
            ).astype(dtype)
        bias = bias_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (hf, hd), 1)
        mask = (rows // f) == (cols // D)
        maskf = mask.astype(dtype)
        if ablate == "loop":
            att_ref[:] = blk[:, :, :hd]
        else:
            if ablate == "kvbuild":
                kv0 = jnp.concatenate([blk[:, 0, hd:]] * HEADS, axis=0)
                k80 = jnp.where(mask, kv0[:, :hd], 0)
                v80 = jnp.where(mask, kv0[:, hd:], 0)
            subr = jax.lax.broadcasted_iota(jnp.int32, (hd, f), 0)
            for pp in range(p):
                xq = blk[:, pp, :]
                q = xq[:, :hd]
                if ablate == "kvbuild":
                    k8, v8 = k80, v80
                else:
                    if ablate in ("kt", "kt_vm"):
                        kt = xq[:, hd : 2 * hd].T  # [hd, F]
                        k8t = jnp.concatenate(
                            [
                                jnp.where(subr // D == g, kt, 0)
                                for g in range(HEADS)
                            ],
                            axis=1,
                        )  # [hd, hf]
                        kv = jnp.concatenate([xq[:, 2 * hd :]] * HEADS, axis=0)
                        v8 = jnp.where(mask, kv, 0)
                    else:
                        kv = jnp.concatenate([xq[:, hd:]] * HEADS, axis=0)
                        k8 = jnp.where(mask, kv[:, :hd], 0)
                        v8 = jnp.where(mask, kv[:, hd:], 0)
                if ablate == "sim":
                    s = jnp.broadcast_to(bias, (f, hf))
                elif ablate in ("kt", "kt_vm"):
                    s = jnp.dot(
                        q, k8t, preferred_element_type=jnp.float32
                    ) + bias
                else:
                    s = jax.lax.dot_general(
                        q, k8, dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + bias
                if ablate == "softmax":
                    e = s.astype(dtype)
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    e = jnp.exp(s - m).astype(dtype)
                if ablate == "kt_vm":
                    vm = jnp.concatenate([v8, maskf], axis=1)  # [hf, 2hd]
                    nd = jnp.dot(e, vm, preferred_element_type=jnp.float32)
                    num, den = nd[:, :hd], nd[:, hd:]
                    den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
                    o = (num / den).astype(dtype)
                else:
                    num = jnp.dot(e, v8, preferred_element_type=jnp.float32)
                    if ablate == "den":
                        o = num.astype(dtype)
                    else:
                        den = jnp.dot(
                            e, maskf, preferred_element_type=jnp.float32
                        )
                        den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny)
                        o = (num / den).astype(dtype)
                att_ref[:, pp, :] = o
        proj = jax.lax.dot_general(
            att_ref[:].reshape(f * p, hd), wout_ref[:].astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(f, p, c)
        o_ref[0] = x + proj.astype(dtype)

    return kernel


def call(ablate, x, gamma, wqkv, wout, bias_flat, cos_t, sin_t, pack=32):
    b, f, hw, c = x.shape
    p = min(pack, hw)
    kernel = functools.partial(make_kernel(ablate), p=p, f=f, c=c)
    return pl.pallas_call(
        kernel,
        grid=(b, hw // p),
        in_specs=[
            pl.BlockSpec((1, f, p, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * HD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HD, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f, HEADS * f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 3 * HD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, 3 * HD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, f, p, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f, hw, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((f, p, HD), x.dtype)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(x, gamma, wqkv, wout, bias_flat, cos_t, sin_t)


def main() -> None:
    b, f, hw, c = 8, 40, 1024, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, f, hw, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    wqkv = (jax.random.normal(key, (c, 3 * HD), jnp.float32) * c**-0.5)
    wout = (jax.random.normal(key, (HD, c), jnp.float32) * HD**-0.5)
    pos_bias = jax.random.normal(key, (HEADS, f, f), jnp.float32)
    bias_flat = build_bias_flat(pos_bias, b, f, None)
    cos_t, sin_t = rotary_tables(f, HEADS, D, D**-0.5, jnp.bfloat16)
    STEPS = 10
    base = None
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--variants", nargs="+",
        default=["full", "loop", "kvbuild", "sim", "softmax", "den", "kt",
                 "kt_vm"],
    )
    variants = ap.parse_args().variants
    for ab in variants:
        def loop(x, ab=ab):
            def body(carry, _):
                out = call(ab, carry, gamma, wqkv, wout, bias_flat,
                           cos_t, sin_t)
                return out.astype(carry.dtype), None
            out, _ = jax.lax.scan(body, x, None, length=STEPS)
            return out.mean()

        compiled = jax.jit(loop).lower(x).compile()
        val = float(jax.device_get(compiled(x)))
        res = time_fn(compiled, x, iters=10, warmup=3)
        ms = res["median_s"] * 1e3 / STEPS
        if ab == "full":
            base = ms
        print(json.dumps({
            "variant": ab, "layer_ms": round(ms, 3),
            "delta_vs_full": round(base - ms, 3), "val": round(val, 6),
        }), flush=True)


if __name__ == "__main__":
    main()
