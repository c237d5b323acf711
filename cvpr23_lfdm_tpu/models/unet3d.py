"""Conditional 3D UNet for latent-flow diffusion (epsilon predictor).

Reference: DM/modules/video_flow_diffusion.py:70-588 (itself derived from
lucidrains/video-diffusion-pytorch). TPU-native redesign:

* NDHWC layout `[B, F, H, W, C]`; factorized space/time attention with the
  tiny 40-token temporal axis batched over `(B, H*W)` — a shape XLA maps
  straight onto the MXU, no ring/sequence tricks needed (SURVEY.md §5).
* All "(1, k, k)" pseudo-3D convs are expressed as 2D convs over the
  folded `(B*F)` batch — identical math, better TPU conv layouts.
* Classifier-free guidance null-masking is passed in as an explicit
  boolean mask (computed by the diffusion wrapper under the training PRNG),
  keeping this module pure.
* `cond_scale` sampling path batches {cond, null} into one UNet call
  instead of two sequential evals (video_flow_diffusion.py:511-526).

Parameterization matches the reference exactly (dim 64, mults (1,2,4,8),
8 heads x 32 dim_head, FiLM cond = time(256) + text(768), two output heads:
2ch flow noise + 1ch occlusion noise).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoidal_pos_emb(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """video_flow_diffusion.py:141-153. `t: [B] -> [B, dim]`."""
    half = dim // 2
    scale = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-scale * jnp.arange(half, dtype=jnp.float32))
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _rel_pos_bucket(rel: np.ndarray, num_buckets: int = 32, max_distance: int = 32) -> np.ndarray:
    """T5 relative-position bucketing (video_flow_diffusion.py:84-102).

    Static numpy: frame count is a compile-time constant.
    """
    ret = np.zeros_like(rel)
    n = -rel
    num_buckets //= 2
    ret += (n < 0).astype(np.int64) * num_buckets
    n = np.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        np.log(np.maximum(n, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(np.int64)
    val_large = np.minimum(val_large, num_buckets - 1)
    ret += np.where(is_small, n, val_large)
    return ret


class RelativePositionBias(nn.Module):
    """Learned T5-style temporal attention bias -> `[heads, F, F]`."""

    heads: int = 8
    num_buckets: int = 32
    max_distance: int = 32

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        pos = np.arange(n, dtype=np.int64)
        rel = pos[None, :] - pos[:, None]  # k_pos - q_pos
        buckets = jnp.asarray(_rel_pos_bucket(rel, self.num_buckets, self.max_distance))
        values = nn.Embed(self.num_buckets, self.heads, name="relative_attention_bias")(buckets)
        return values.transpose(2, 0, 1)


def _rotary_freqs(dim: int, n: int, theta: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Interleaved rotary angle tables `[n, dim]` (lucidrains convention)."""
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    angles = np.outer(np.arange(n, dtype=np.float64), freqs)  # [n, dim/2]
    angles = np.repeat(angles, 2, axis=-1)  # interleave pairs
    return jnp.asarray(np.cos(angles), jnp.float32), jnp.asarray(np.sin(angles), jnp.float32)


def _rotate_half_interleaved(x: jnp.ndarray) -> jnp.ndarray:
    x2 = x.reshape(x.shape[:-1] + (-1, 2))
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack([-b, a], axis=-1).reshape(x.shape)


def apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x: `[..., n, d]`; cos/sin `[n, d]`."""
    return x * cos + _rotate_half_interleaved(x) * sin


class ChannelLayerNorm(nn.Module):
    """Channel-only LayerNorm, gamma-scaled, biased variance, eps inside
    sqrt (video_flow_diffusion.py:170-179).

    Mixed precision: statistics reduce in fp32 (XLA fuses the cast into
    the reduction), but under a bf16 policy the normalize itself stays in
    bf16 — the fp32 round-trip materialized 2x-4x the activation bytes of
    the whole layer (profile: the B=8 scan was normalization-glue-bound)."""

    dim: int
    eps: float = 1e-5

    def setup(self):
        self.gamma = self.param("gamma", nn.initializers.ones, (self.dim,))

    def scale(self) -> jnp.ndarray:
        """Raw gamma, for fused kernels that fold the norm in."""
        return self.gamma

    def __call__(self, x):
        gamma = self.gamma
        if x.dtype == jnp.float32:
            mean = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.var(x, axis=-1, keepdims=True)
            return (x - mean) / jnp.sqrt(var + self.eps) * gamma
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return (x - mean.astype(x.dtype)) * inv * gamma.astype(x.dtype)


class _DenseKernel(nn.Module):
    """Raw Dense kernel parameter (no bias), layout-identical to
    `nn.Dense(features, use_bias=False)` — fused kernels consume the weight
    directly instead of calling the layer."""

    features: int
    in_features: int
    use_bias: bool = False

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )

    def get(self) -> jnp.ndarray:
        return self.kernel

    def get_bias(self) -> jnp.ndarray:
        return self.bias


class TemporalAttention(nn.Module):
    """Full attention over the frame axis, batched over pixels.

    Reference `EinopsToAndFrom('b c f h w', 'b (h w) f c', Attention(...))`
    with rotary embeddings + relative position bias
    (video_flow_diffusion.py:286-363, 397-399).
    Input `[B, F, H, W, C]`.
    """

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    use_rotary: bool = True
    impl: str = "xla"  # "xla" | "pallas" (packed-tile TPU kernel)

    @nn.compact
    def __call__(self, x, pos_bias=None, focus_present_mask=None,
                 prenorm_gamma=None):
        b, f, h, w, c = x.shape
        hidden = self.heads * self.dim_head

        if self.impl.startswith("pallas3"):
            # fused whole-layer path: PreNormResidual passes its norm gamma
            # in and this returns x + to_out(attn(to_qkv(LN(x)))) from ONE
            # Pallas kernel (attention_pallas.fused_temporal_layer)
            assert prenorm_gamma is not None, (
                "pallas3 fuses the prenorm layer; use it via PreNormResidual"
            )
            return self._fused_layer(
                x, prenorm_gamma, pos_bias, focus_present_mask,
                interpret=self.impl == "pallas3_interpret",
            )

        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)

        if self.impl.startswith("pallas2"):
            out = self._headpacked_attention(
                qkv.reshape(b, f, h * w, 3 * hidden),
                pos_bias, focus_present_mask,
                interpret=self.impl == "pallas2_interpret",
            )
            out = out.reshape(b, f, h, w, hidden)
            return nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype, name="to_out"
            )(out)

        if self.impl.startswith("pallas"):
            out = self._packed_attention(
                qkv.reshape(b, f, h * w, 3 * hidden),
                pos_bias, focus_present_mask,
                interpret=self.impl == "pallas_interpret",
            )
            out = out.reshape(b, f, h, w, hidden)
            return nn.Dense(
                self.dim, use_bias=False, dtype=self.dtype, name="to_out"
            )(out)

        # natural layout [B, F, HW, h, d] — einsums below carry the frame
        # axis in place, letting XLA fold the permutations into the matmuls
        # instead of materializing transposed copies (this attention is the
        # UNet's HBM-bound hotspot: 9 layers x [*, 40, 40] sims)
        qkv = qkv.reshape(b, f, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        q = q * (self.dim_head**-0.5)
        if self.use_rotary:
            cos, sin = _rotary_freqs(min(32, self.dim_head), f)
            # rotary tables indexed by the frame axis (axis 1 here)
            cos = cos.astype(q.dtype)[None, :, None, None, :]
            sin = sin.astype(q.dtype)[None, :, None, None, :]
            q = q * cos + _rotate_half_interleaved(q) * sin
            k = k * cos + _rotate_half_interleaved(k) * sin

        # softmax numerics in fp32 for the fp32 policy; in compute dtype
        # under bf16 (40 logits after max-subtraction — safe)
        acc = jnp.float32 if self.dtype == jnp.float32 else self.dtype
        sim = jnp.einsum(
            "bixhd,bjxhd->bxhij", q, k, preferred_element_type=acc
        )
        if pos_bias is not None:
            sim = sim + pos_bias[None, None].astype(acc)
        if focus_present_mask is not None:
            # present-only ("arrested") attention for masked batch entries
            # (video_flow_diffusion.py:342-352): keys restricted to the
            # query's own frame -> attention output collapses to v
            self_mask = jnp.eye(f, dtype=bool)[None, None, None]
            keep = jnp.where(
                focus_present_mask[:, None, None, None, None], self_mask, True
            )
            sim = jnp.where(keep, sim, jnp.finfo(jnp.float32).min)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = nn.softmax(sim.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bxhij,bjxhd->bixhd", attn, v)
        out = out.reshape(b, f, h, w, hidden)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)

    def _fused_layer(self, x, gamma, pos_bias, focus_present_mask, interpret):
        """pallas3: the whole prenorm layer (LN + qkv + rotary + attention
        + out-proj + residual) in one kernel. Parameter tree matches the
        Dense modules of the unfused paths (to_qkv/kernel, to_out/kernel)."""
        from cvpr23_lfdm_tpu.ops.attention_pallas import (
            build_bias_flat, fused_temporal_layer, rotary_tables,
        )

        b, f, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        wqkv = _DenseKernel(3 * hidden, c, name="to_qkv").get()
        wout = _DenseKernel(c, hidden, name="to_out").get()
        if pos_bias is None:
            pos_bias = jnp.zeros((self.heads, f, f), jnp.float32)
        bias_flat = build_bias_flat(pos_bias, b, f, focus_present_mask)
        scale = self.dim_head**-0.5
        cdt = self.dtype
        if self.use_rotary:
            cos_t, sin_t = rotary_tables(f, self.heads, self.dim_head, scale, cdt)
        else:
            cos_t = jnp.broadcast_to(
                jnp.concatenate(
                    [jnp.full((hidden,), scale), jnp.ones((2 * hidden,))]
                ).astype(cdt)[None],
                (f, 3 * hidden),
            )
            sin_t = jnp.zeros((f, 3 * hidden), cdt)
        out = fused_temporal_layer(
            x.reshape(b, f, h * w, c).astype(cdt),
            gamma.astype(jnp.float32),
            wqkv.astype(cdt), wout.astype(cdt),
            bias_flat, cos_t.astype(cdt), sin_t.astype(cdt),
            self.heads, self.dim_head,
            # pack=32: the isolated-layer sweep preferred 64 by ~7% at
            # B=8, but in the full UNet pack=64 cost +0.6 ms/eval at B=1
            # and was a wash at B=8 (scripts/bench_unet.py)
            pack=32, interpret=interpret,
        )
        return out.reshape(b, f, h, w, c).astype(x.dtype)

    def _headpacked_attention(self, qkv, pos_bias, focus_present_mask, interpret):
        """Head-packed kernel path: qkv [B,F,HW,3hd] natural layout ->
        [B,F,HW,hd]. Rotary + q-scale fold INSIDE the kernel; no XLA-side
        transposes or padded intermediates (attention_pallas.py)."""
        from cvpr23_lfdm_tpu.ops.attention_pallas import (
            build_bias_flat, headpacked_temporal_attention, rotary_tables,
        )

        b, f = qkv.shape[0], qkv.shape[1]
        if pos_bias is None:
            pos_bias = jnp.zeros((self.heads, f, f), jnp.float32)
        bias_flat = build_bias_flat(pos_bias, b, f, focus_present_mask)
        scale = self.dim_head**-0.5
        if self.use_rotary:
            cos_t, sin_t = rotary_tables(
                f, self.heads, self.dim_head, scale, qkv.dtype
            )
        else:
            hd = self.heads * self.dim_head
            cos_t = jnp.broadcast_to(
                jnp.concatenate(
                    [jnp.full((hd,), scale), jnp.ones((2 * hd,))]
                ).astype(qkv.dtype)[None],
                (f, 3 * hd),
            )
            sin_t = jnp.zeros((f, 3 * hd), qkv.dtype)
        return headpacked_temporal_attention(
            qkv, bias_flat, cos_t, sin_t, self.heads, self.dim_head,
            interpret=interpret,
        )

    def _packed_attention(self, qkv, pos_bias, focus_present_mask, interpret):
        """Packed-tile kernel path: qkv [B,F,HW,3*h*d] -> [B,F,HW,h*d].

        Rotary + q-scale fold into one elementwise pass over the unpadded
        768-lane qkv tensor; the kernel splits heads by lane slices in VMEM
        (the XLA form pays ~2.3 GB/layer of lane-padding HBM traffic on the
        40/32-lane intermediates — measured via cost_analysis)."""
        from cvpr23_lfdm_tpu.ops.attention_pallas import (
            build_bias, packed_temporal_attention, pick_pack, rotary_tables,
            rotate_pairs,
        )

        b, f, hw, _ = qkv.shape
        pack = pick_pack(hw, f)
        if pos_bias is None:
            pos_bias = jnp.zeros((self.heads, f, f), jnp.float32)
        bias = build_bias(pos_bias, b, pack, f, focus_present_mask)
        scale = self.dim_head**-0.5
        if self.use_rotary:
            cos_t, sin_t = rotary_tables(
                f, self.heads, self.dim_head, scale, qkv.dtype
            )
            qkv = qkv * cos_t[None, :, None, :] + rotate_pairs(qkv) * sin_t[
                None, :, None, :
            ]
        else:
            hd = self.heads * self.dim_head
            qscale = jnp.concatenate(
                [jnp.full((hd,), scale), jnp.ones((2 * hd,))]
            ).astype(qkv.dtype)
            qkv = qkv * qscale
        qkv = qkv.swapaxes(1, 2)  # [B, HW, F, 3hd]
        out = packed_temporal_attention(
            qkv, bias, self.heads, self.dim_head, pack, interpret=interpret
        )
        return out.swapaxes(1, 2)  # [B, F, HW, h*d]


class SpatialAttention(nn.Module):
    """Full attention over pixels, batched over frames (mid-block only).

    Reference `EinopsToAndFrom('b c f h w', 'b f (h w) c', Attention(...))`
    without rotary/pos-bias (video_flow_diffusion.py:473).
    """

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        hidden = self.heads * self.dim_head
        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(b, f, h * w, 3, self.heads, self.dim_head)
        qkv = qkv.transpose(3, 0, 1, 4, 2, 5)  # [3, B, F, heads, HW, d]
        q, k, v = qkv[0], qkv[1], qkv[2]
        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bfhid,bfhjd->bfhij", q, k).astype(jnp.float32)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bfhij,bfhjd->bfhid", attn, v)
        out = out.transpose(0, 1, 3, 2, 4).reshape(b, f, h, w, hidden)
        return nn.Dense(self.dim, use_bias=False, dtype=self.dtype, name="to_out")(out)


class SpatialLinearAttention(nn.Module):
    """Softmax-kernel linear attention per frame
    (video_flow_diffusion.py:240-265)."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"  # "xla" | "pallas3" (fused whole-layer kernel)

    @nn.compact
    def __call__(self, x, prenorm_gamma=None):
        b, f, h, w, c = x.shape
        hd = self.dim_head
        hidden = self.heads * hd

        if self.impl.startswith("pallas3"):
            from cvpr23_lfdm_tpu.ops.attention_pallas import (
                fused_spatial_linear_layer,
            )

            assert prenorm_gamma is not None, (
                "pallas3 fuses the prenorm layer; use it via PreNormResidual"
            )
            wqkv = _DenseKernel(3 * hidden, c, name="to_qkv").get()
            to_out = _DenseKernel(c, hidden, use_bias=True, name="to_out")
            cdt = self.dtype
            out = fused_spatial_linear_layer(
                x.reshape(b, f, h * w, c).astype(cdt),
                prenorm_gamma.astype(jnp.float32),
                wqkv.astype(cdt), to_out.get().astype(cdt),
                to_out.get_bias(),
                self.heads, hd,
                interpret=self.impl == "pallas3_interpret",
            )
            return out.reshape(b, f, h, w, c).astype(x.dtype)

        qkv = nn.Dense(hidden * 3, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        # Head-packed dense-lane form: every tensor keeps the full
        # heads*d=hidden lane axis — the per-head [.., heads, 32]-minor
        # split/transpose form paid ~20 ms/eval of pure layout copies at
        # B=8 (32 lanes pad to 128). Per-head structure is enforced by
        # block-diagonal [hidden, hidden] masks instead: the q-softmax
        # denominator and the (k^T v) context pick up only same-head
        # terms. The full-rank context matmul computes 8x discarded
        # cross-head blocks — ~0.1 ms/eval of MXU time, far below the
        # relayout cost it removes.
        qkv = qkv.reshape(b, f, h * w, 3 * hidden)
        q = qkv[..., :hidden]
        k = qkv[..., hidden : 2 * hidden]
        v = qkv[..., 2 * hidden :]

        lane = np.arange(hidden)
        block = jnp.asarray(lane[:, None] // hd == lane[None, :] // hd)

        # q: softmax over each head's d-lanes. The max is PER HEAD via a
        # lane-windowed reduce (window=stride=d keeps the minor axis minor
        # — no [.., heads, d] split relayout), so a head sitting far below
        # the global row max cannot underflow its whole segment.
        qf = q.astype(jnp.float32)
        mh = jax.lax.reduce_window(
            jax.lax.stop_gradient(qf), -jnp.inf, jax.lax.max,
            (1,) * (qf.ndim - 1) + (hd,), (1,) * (qf.ndim - 1) + (hd,),
            "VALID",
        )  # [..., heads]
        # expand back to lanes by one-hot matmul (a lane-repeat would
        # force a split-minor relayout)
        expand = jnp.asarray(
            (np.arange(self.heads)[:, None] == lane[None, :] // hd),
            jnp.float32,
        )
        mh = jnp.einsum("...h,hd->...d", mh, expand)
        cdt = jnp.float32 if x.dtype == jnp.float32 else x.dtype
        eq = jnp.exp((qf - mh).astype(cdt))
        den = jnp.einsum(
            "...d,de->...e", eq, block.astype(cdt),
            preferred_element_type=jnp.float32,
        )  # same-head sum, per lane
        den = jnp.maximum(den, jnp.finfo(jnp.float32).tiny).astype(cdt)
        q = (eq / den).astype(x.dtype) * (hd**-0.5)
        # k: softmax over n — fp32 max/sum reductions, exp in compute dtype
        kf = k.astype(jnp.float32)
        km = jnp.max(jax.lax.stop_gradient(kf), axis=-2, keepdims=True)
        ek = jnp.exp((kf - km).astype(cdt))
        ksum = jnp.sum(ek.astype(jnp.float32), axis=-2, keepdims=True)
        k = (ek / ksum.astype(cdt)).astype(x.dtype)

        context = jnp.einsum(
            "bfnd,bfne->bfde", k, v, preferred_element_type=jnp.float32
        )
        context = jnp.where(block, context, 0.0).astype(x.dtype)
        out = jnp.einsum(
            "bfde,bfnd->bfne", context, q, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        out = out.reshape(b, f, h, w, hidden)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class PreNormResidual(nn.Module):
    """x + attn(LN(x)) (video_flow_diffusion.py:132-138, 182-190).

    Constructs the inner attention itself (child scope "attn") so parameters
    nest under this wrapper's name.
    """

    dim: int
    attn_cls: type
    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, **kwargs):
        norm = ChannelLayerNorm(self.dim, name="norm")
        attn = self.attn_cls(
            self.dim, self.heads, self.dim_head, dtype=self.dtype, name="attn"
        )
        if getattr(attn, "impl", "").startswith("pallas3"):
            # fused whole-layer kernel: norm + attention + residual in one
            # pass; the norm module only contributes its gamma parameter
            return attn(x, prenorm_gamma=norm.scale(), **kwargs)
        return x + attn(norm(x), **kwargs)


def conv_2plus1d(features: int, k: int, name: str | None = None,
                 padding_mode: str = "zeros", dtype=jnp.float32,
                 use_bias: bool = True):
    """(1, k, k) pseudo-3D conv as a frame-batched 2D conv wrapper."""
    pad = k // 2

    class _Conv(nn.Module):
        @nn.compact
        def __call__(self, x):
            b, f, h, w, c = x.shape
            y = x.reshape(b * f, h, w, c)
            if padding_mode == "reflect" and pad > 0:
                y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
                y = nn.Conv(features, (k, k), padding="VALID", dtype=dtype, use_bias=use_bias, name="conv")(y)
            else:
                y = nn.Conv(features, (k, k), padding=[(pad, pad), (pad, pad)], dtype=dtype, use_bias=use_bias, name="conv")(y)
            return y.reshape(b, f, h, w, features)

    return _Conv(name=name)


class _GNParams(nn.Module):
    """GroupNorm affine params, layout-identical to `nn.GroupNorm` —
    the fused GN+FiLM+SiLU kernel consumes them directly."""

    dim: int

    def setup(self):
        self.gn_scale = self.param("scale", nn.initializers.ones, (self.dim,))
        self.gn_bias = self.param("bias", nn.initializers.zeros, (self.dim,))

    def get(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        return self.gn_scale, self.gn_bias


class Block(nn.Module):
    """conv(1,3,3) -> GroupNorm(8) -> FiLM -> SiLU
    (video_flow_diffusion.py:196-211)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    # serving fast path: whole GN+FiLM+SiLU chain as one VMEM-pass Pallas
    # kernel (forward-only; param tree unchanged — the GroupNorm module
    # still owns scale/bias)
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x, scale_shift=None):
        x = conv_2plus1d(self.dim_out, 3, name="proj", dtype=self.dtype)(x)
        if self.fused_norm:
            from cvpr23_lfdm_tpu.ops.norm_pallas import groupnorm_film_silu

            gn = _GNParams(self.dim_out, name="norm")
            gamma, beta = gn.get()
            scale = shift = None
            if scale_shift is not None:
                scale = scale_shift[0].reshape(x.shape[0], self.dim_out)
                shift = scale_shift[1].reshape(x.shape[0], self.dim_out)
            return groupnorm_film_silu(
                x, gamma, beta, scale, shift, groups=self.groups
            )
        # GroupNorm statistics in fp32 (flax computes stats in fp32
        # internally); under a bf16 policy the normalize stays in bf16 —
        # the explicit fp32 round-trip was pure extra HBM traffic
        x = nn.GroupNorm(
            num_groups=self.groups, epsilon=1e-5, dtype=self.dtype, name="norm"
        )(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1.0).astype(self.dtype) + shift.astype(self.dtype)
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two FiLM blocks + 1x1x1 residual conv
    (video_flow_diffusion.py:214-237)."""

    dim_out: int
    groups: int = 8
    dtype: jnp.dtype = jnp.float32
    fused_norm: bool = False

    @nn.compact
    def __call__(self, x, cond_emb=None):
        scale_shift = None
        if cond_emb is not None:
            t = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="mlp")(
                nn.silu(cond_emb)
            )
            t = t[:, None, None, None, :]  # broadcast over F,H,W
            scale_shift = jnp.split(t, 2, axis=-1)
        h = Block(self.dim_out, self.groups, self.dtype, self.fused_norm,
                  name="block1")(x, scale_shift)
        h = Block(self.dim_out, self.groups, self.dtype, self.fused_norm,
                  name="block2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1, 1), dtype=self.dtype, name="res_conv")(x)
        return (h + x).astype(self.dtype)


class Downsample(nn.Module):
    """(1,4,4)/(1,2,2) strided conv (video_flow_diffusion.py:166-167)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        y = x.reshape(b * f, h, w, c)
        y = nn.Conv(self.dim, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")(y)
        return y.reshape(b, f, h // 2, w // 2, self.dim)


class Upsample(nn.Module):
    """ConvTranspose (1,4,4)/(1,2,2) pad 1, or nearest + (1,3,3) reflect conv
    (video_flow_diffusion.py:156-163)."""

    dim: int
    use_deconv: bool = True
    padding_mode: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        y = x.reshape(b * f, h, w, c)
        if self.use_deconv:
            # torch ConvTranspose2d(k=4, s=2, p=1) == conv over 2x-dilated
            # input with padding k-1-p=2 and flipped kernel; we own the
            # parameter layout so the flip is folded into initialization.
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (4, 4, c, self.dim),
            )
            bias = self.param("bias", nn.initializers.zeros, (self.dim,))
            dn = jax.lax.conv_dimension_numbers(
                y.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
            )
            y = jax.lax.conv_general_dilated(
                y.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(1, 1), padding=[(2, 2), (2, 2)],
                lhs_dilation=(2, 2), dimension_numbers=dn,
            ) + bias.astype(self.dtype)
            return y.reshape(b, f, 2 * h, 2 * w, self.dim)
        else:
            y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
            if self.padding_mode == "reflect":
                y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                y = nn.Conv(self.dim, (3, 3), padding="VALID", dtype=self.dtype, name="conv")(y)
            else:
                y = nn.Conv(self.dim, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="conv")(y)
            return y.reshape(b, f, 2 * h, 2 * w, self.dim)


class Unet3D(nn.Module):
    """The denoiser. Input `[B, F, H, W, C_in]` (C_in = 3 latent + 256 ref
    feature channels), output `[B, F, H, W, 3]` (2 flow + 1 conf noise).

    Reference: DM/modules/video_flow_diffusion.py:368-588.
    """

    dim: int = 64
    cond_dim: int = 768
    out_grid_dim: int = 2
    out_conf_dim: int = 1
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    attn_heads: int = 8
    attn_dim_head: int = 32
    use_sparse_linear_attn: bool = True
    resnet_groups: int = 8
    learn_null_cond: bool = False
    use_deconv: bool = True
    padding_mode: str = "zeros"
    use_final_activation: bool = False
    dtype: jnp.dtype = jnp.float32  # compute dtype (params stay fp32)
    temporal_attn_impl: str = "xla"  # "xla" | "pallas" (packed-tile kernel)
    # None = follow temporal_attn_impl (fused on pallas3 serving)
    fused_norm: bool | None = None

    @nn.compact
    def __call__(self, x, time, cond=None, null_cond_mask=None,
                 focus_present_mask=None, fea=None):
        """Args:
          x: `[B, F, H, W, 3]` noisy latent volume (or the full
            latent+feature concat when `fea` is None).
          time: `[B]` int/float diffusion timestep.
          cond: `[B, cond_dim]` text embedding (None for uncond model).
          null_cond_mask: `[B]` bool; True replaces cond with the null
            embedding (classifier-free guidance dropout / "None" texts).
          focus_present_mask: `[B]` bool; True arrests temporal attention to
            the present frame (video_flow_diffusion.py:542-552).
          fea: `[B, Ff, H, W, Cf]` reference-image features, Ff in {1, F}.
            Kept SEPARATE from x so the 7x7 init convolution splits by
            linearity: the feature half is loop-invariant during sampling
            (hoisted out of the scan by XLA) and frame-invariant when
            Ff == 1 — the reference instead re-convolves the concatenated
            259-channel input every step (video_flow_diffusion.py:410,546),
            ~27% of the UNet's FLOPs.
        """
        import functools as _ft

        b, f, h, w, _ = x.shape
        dim = self.dim
        heads = self.attn_heads
        temporal_cls = _ft.partial(
            TemporalAttention, impl=self.temporal_attn_impl
        )
        # the fused-layer serving impl extends to the spatial linear
        # attention layers (same whole-layer fusion win)
        sla_cls = (
            _ft.partial(SpatialLinearAttention, impl=self.temporal_attn_impl)
            if self.temporal_attn_impl.startswith("pallas3")
            else SpatialLinearAttention
        )
        # fused GN+FiLM+SiLU kernel exists (ops/norm_pallas.py) but is OFF
        # by default: measured on v5e it LOSES (B=1 7.0->9.1 ms, B=8
        # 39.7->47.3 per UNet eval) — XLA already fuses the GN stats pass
        # into the producing conv's epilogue and the normalize into the
        # consumer, so a custom call only adds materialization boundaries
        fused = bool(self.fused_norm)
        x = x.astype(self.dtype)

        pos_bias = RelativePositionBias(
            heads=heads, max_distance=32, name="time_rel_pos_bias"
        )(f)

        x = conv_2plus1d(dim, 7, name="init_conv", dtype=self.dtype)(x)
        if fea is not None:
            fea_out = conv_2plus1d(
                dim, 7, name="init_conv_fea", dtype=self.dtype, use_bias=False
            )(fea.astype(self.dtype))
            x = x + fea_out.astype(x.dtype)  # broadcasts over F when Ff == 1
        r = x
        x = PreNormResidual(
            dim, temporal_cls, heads, self.attn_dim_head, self.dtype,
            name="init_temporal_attn",
            # reference quirk: the init attention does NOT receive the focus
            # mask (video_flow_diffusion.py:549)
        )(x, pos_bias=pos_bias)

        # time conditioning MLP (video_flow_diffusion.py:422-428)
        time_dim = dim * 4
        t = sinusoidal_pos_emb(time, dim)
        t = nn.Dense(time_dim, name="time_mlp_1")(t)
        t = nn.gelu(t, approximate=False)
        t = nn.Dense(time_dim, name="time_mlp_2")(t)  # cond MLP stays fp32

        if cond is not None:
            if self.learn_null_cond:
                null_emb = self.param(
                    "null_cond_emb", nn.initializers.normal(1.0), (self.cond_dim,)
                )
            else:
                null_emb = jnp.zeros((self.cond_dim,), dtype=jnp.float32)
            if null_cond_mask is None:
                null_cond_mask = jnp.zeros((b,), dtype=bool)
            cond = jnp.where(null_cond_mask[:, None], null_emb[None, :], cond)
            t = jnp.concatenate([t, cond.astype(t.dtype)], axis=-1)

        dims = [dim] + [dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_levels = len(in_out)

        hs = []
        for ind, (_, dim_out) in enumerate(in_out):
            is_last = ind >= n_levels - 1
            x = ResnetBlock(dim_out, self.resnet_groups, self.dtype, fused, name=f"downs_{ind}_block1")(x, t)
            x = ResnetBlock(dim_out, self.resnet_groups, self.dtype, fused, name=f"downs_{ind}_block2")(x, t)
            if self.use_sparse_linear_attn:
                # reference quirk: linear attn dim_head is always the
                # default 32 (video_flow_diffusion.py:464)
                x = PreNormResidual(
                    dim_out, sla_cls, heads, 32, self.dtype,
                    name=f"downs_{ind}_spatial_attn",
                )(x)
            x = PreNormResidual(
                dim_out, temporal_cls, heads, self.attn_dim_head, self.dtype,
                name=f"downs_{ind}_temporal_attn",
            )(x, pos_bias=pos_bias, focus_present_mask=focus_present_mask)
            hs.append(x)
            if not is_last:
                x = Downsample(dim_out, self.dtype, name=f"downs_{ind}_downsample")(x)

        mid_dim = dims[-1]
        x = ResnetBlock(mid_dim, self.resnet_groups, self.dtype, fused, name="mid_block1")(x, t)
        # reference quirk: mid spatial attention always uses dim_head=32
        # (Attention default not forwarded, video_flow_diffusion.py:473)
        x = PreNormResidual(
            mid_dim, SpatialAttention, heads, 32, self.dtype,
            name="mid_spatial_attn",
        )(x)
        x = PreNormResidual(
            mid_dim, temporal_cls, heads, self.attn_dim_head, self.dtype,
            name="mid_temporal_attn",
        )(x, pos_bias=pos_bias, focus_present_mask=focus_present_mask)
        x = ResnetBlock(mid_dim, self.resnet_groups, self.dtype, fused, name="mid_block2")(x, t)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind >= n_levels - 1
            x = jnp.concatenate([x, hs.pop()], axis=-1)
            x = ResnetBlock(dim_in, self.resnet_groups, self.dtype, fused, name=f"ups_{ind}_block1")(x, t)
            x = ResnetBlock(dim_in, self.resnet_groups, self.dtype, fused, name=f"ups_{ind}_block2")(x, t)
            if self.use_sparse_linear_attn:
                x = PreNormResidual(
                    dim_in, sla_cls, heads, 32, self.dtype,
                    name=f"ups_{ind}_spatial_attn",
                )(x)
            x = PreNormResidual(
                dim_in, temporal_cls, heads, self.attn_dim_head, self.dtype,
                name=f"ups_{ind}_temporal_attn",
            )(x, pos_bias=pos_bias, focus_present_mask=focus_present_mask)
            if not is_last:
                x = Upsample(
                    dim_in, self.use_deconv, self.padding_mode, self.dtype,
                    name=f"ups_{ind}_upsample",
                )(x)

        # two heads, each ResnetBlock(dim*2 -> dim) + 1x1x1 conv
        # (video_flow_diffusion.py:493-509)
        x = jnp.concatenate([x, r], axis=-1)
        grid = ResnetBlock(dim, self.resnet_groups, self.dtype, fused, name="final_block")(x)
        grid = nn.Conv(self.out_grid_dim, (1, 1, 1), name="final_conv")(grid)
        if self.use_final_activation:
            grid = jnp.tanh(grid)
        conf = ResnetBlock(dim, self.resnet_groups, self.dtype, fused, name="occlusion_block")(x)
        conf = nn.Conv(self.out_conf_dim, (1, 1, 1), name="occlusion_conv")(conf)
        # eps prediction back in fp32 (heads' convs default to fp32 compute)
        return jnp.concatenate([grid, conf], axis=-1).astype(jnp.float32)
