"""Packed temporal attention kernel: parity vs the XLA path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr23_lfdm_tpu.models.unet3d import TemporalAttention


@pytest.mark.parametrize("hw,f", [(16, 5), (64, 7)])
def test_packed_attention_matches_xla(hw, f):
    heads, dh, dim = 2, 8, 16
    h = w = int(np.sqrt(hw))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, f, h, w, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)

    ref_attn = TemporalAttention(dim, heads, dh, impl="xla")
    variables = jax.jit(lambda r: ref_attn.init(r, x, pos_bias))(
        jax.random.PRNGKey(0)
    )
    ref = ref_attn.apply(variables, x, pos_bias)

    pal_attn = TemporalAttention(dim, heads, dh, impl="pallas_interpret")
    out = pal_attn.apply(variables, x, pos_bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_attention_focus_mask():
    heads, dh, dim, f = 2, 8, 16, 5
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, f, 4, 4, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)
    mask = jnp.asarray([True, False])

    attn_x = TemporalAttention(dim, heads, dh, impl="xla")
    variables = jax.jit(lambda r: attn_x.init(r, x, pos_bias))(
        jax.random.PRNGKey(0)
    )
    ref = attn_x.apply(variables, x, pos_bias, mask)
    attn_p = TemporalAttention(dim, heads, dh, impl="pallas_interpret")
    out = attn_p.apply(variables, x, pos_bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("hw,f", [(16, 5), (64, 7)])
@pytest.mark.parametrize("rotary", [True, False])
def test_headpacked_attention_matches_xla(hw, f, rotary):
    heads, dh, dim = 2, 8, 16
    h = w = int(np.sqrt(hw))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, f, h, w, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)

    ref_attn = TemporalAttention(dim, heads, dh, impl="xla", use_rotary=rotary)
    variables = jax.jit(lambda r: ref_attn.init(r, x, pos_bias))(
        jax.random.PRNGKey(0)
    )
    ref = ref_attn.apply(variables, x, pos_bias)

    hp_attn = TemporalAttention(
        dim, heads, dh, impl="pallas2_interpret", use_rotary=rotary
    )
    out = hp_attn.apply(variables, x, pos_bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_headpacked_attention_focus_mask():
    heads, dh, dim, f = 2, 8, 16, 5
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, f, 4, 4, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)
    mask = jnp.asarray([True, False])

    attn_x = TemporalAttention(dim, heads, dh, impl="xla")
    variables = jax.jit(lambda r: attn_x.init(r, x, pos_bias))(
        jax.random.PRNGKey(0)
    )
    ref = attn_x.apply(variables, x, pos_bias, mask)
    attn_p = TemporalAttention(dim, heads, dh, impl="pallas2_interpret")
    out = attn_p.apply(variables, x, pos_bias, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("impl", ["pallas2_interpret", "pallas3_interpret"])
def test_headpacked_attention_extreme_head_bias_gap(impl):
    """A head whose bias level sits ~300 below another head's must still
    produce a valid softmax (the global-row-max trick alone would
    underflow its whole segment to zero output): build_bias_flat
    pre-shifts each (head, row) to max 0, which is softmax-invariant."""
    import functools
    import flax.linen as nn

    from cvpr23_lfdm_tpu.models.unet3d import PreNormResidual

    heads, dh, dim, f = 2, 8, 16, 5
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, f, 4, 4, dim)), jnp.float32)
    pos_bias = jnp.asarray(
        rng.standard_normal((heads, f, f)), jnp.float32
    ) + jnp.asarray([300.0, 0.0])[:, None, None]

    if impl.startswith("pallas3"):

        class Wrap(nn.Module):
            impl: str

            @nn.compact
            def __call__(self, x):
                return PreNormResidual(
                    dim, functools.partial(TemporalAttention, impl=self.impl),
                    heads, dh, name="layer",
                )(x, pos_bias=pos_bias, focus_present_mask=None)

        m_x, m_p = Wrap("xla"), Wrap(impl)
        variables = jax.jit(lambda r: m_x.init(r, x))(jax.random.PRNGKey(0))
        ref, out = m_x.apply(variables, x), m_p.apply(variables, x)
    else:
        attn_x = TemporalAttention(dim, heads, dh, impl="xla")
        variables = jax.jit(lambda r: attn_x.init(r, x, pos_bias))(
            jax.random.PRNGKey(0)
        )
        ref = attn_x.apply(variables, x, pos_bias)
        out = TemporalAttention(dim, heads, dh, impl=impl).apply(
            variables, x, pos_bias
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_pick_pack():
    from cvpr23_lfdm_tpu.ops.attention_pallas import pick_pack

    assert pick_pack(1024, 40) == 4   # 4*40=160 <= 256
    assert pick_pack(1024, 40, target_rows=512) == 8
    assert pick_pack(16, 5) == 16     # 16*5=80
    assert pick_pack(1, 40) == 1


@pytest.mark.parametrize("rotary", [True, False])
def test_headpacked_attention_grads_match_xla(rotary):
    """Custom-VJP backward kernel == XLA autodiff (weights + pos_bias)."""
    heads, dh, dim, f = 2, 8, 16, 5
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, f, 4, 4, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)

    attn_x = TemporalAttention(dim, heads, dh, impl="xla", use_rotary=rotary)
    variables = jax.jit(lambda r: attn_x.init(r, x, pos_bias))(
        jax.random.PRNGKey(0)
    )

    def loss(attn):
        def inner(v, pb, xx):
            out = attn.apply(v, xx, pb)
            return jnp.sum(out * jnp.cos(out * 3))  # nontrivial cotangent

        return jax.grad(inner, argnums=(0, 1, 2))(variables, pos_bias, x)

    gx = loss(attn_x)
    gp = loss(
        TemporalAttention(
            dim, heads, dh, impl="pallas2_interpret", use_rotary=rotary
        )
    )
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.parametrize("hw,f,focus", [(16, 5, False), (64, 7, False), (32, 5, True)])
def test_fused_temporal_layer_matches_xla(hw, f, focus):
    """pallas3 whole-layer kernel (LN + qkv + rotary + attn + out + residual)
    == the unfused xla PreNormResidual, identical param tree."""
    import functools
    import flax.linen as nn

    from cvpr23_lfdm_tpu.models.unet3d import PreNormResidual

    heads, dh, dim = 2, 8, 16
    h, w = 4, hw // 4
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, f, h, w, dim)), jnp.float32)
    pos_bias = jnp.asarray(rng.standard_normal((heads, f, f)), jnp.float32)

    class Wrap(nn.Module):
        impl: str

        @nn.compact
        def __call__(self, x, focus_mask=None):
            return PreNormResidual(
                dim, functools.partial(TemporalAttention, impl=self.impl),
                heads, dh, name="layer",
            )(x, pos_bias=pos_bias, focus_present_mask=focus_mask)

    m_x, m_p = Wrap("xla"), Wrap("pallas3_interpret")
    variables = jax.jit(lambda r: m_x.init(r, x))(jax.random.PRNGKey(0))
    v2 = m_p.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    mask = jnp.asarray([True, False]) if focus else None
    ref = m_x.apply(variables, x, mask)
    out = m_p.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_spatial_linear_layer_matches_xla():
    """pallas3 fused linear-attention layer == unfused xla PreNormResidual."""
    import functools
    import flax.linen as nn

    from cvpr23_lfdm_tpu.models.unet3d import (
        PreNormResidual, SpatialLinearAttention,
    )

    heads, dh, dim, f = 2, 8, 16, 8
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, f, 4, 8, dim)), jnp.float32)

    class Wrap(nn.Module):
        impl: str

        @nn.compact
        def __call__(self, x):
            return PreNormResidual(
                dim,
                functools.partial(SpatialLinearAttention, impl=self.impl),
                heads, dh, name="layer",
            )(x)

    m_x, m_p = Wrap("xla"), Wrap("pallas3_interpret")
    variables = jax.jit(lambda r: m_x.init(r, x))(jax.random.PRNGKey(0))
    v2 = m_p.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    ref = m_x.apply(variables, x)
    out = m_p.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_groupnorm_film_silu_matches_block():
    """ops/norm_pallas GN+FiLM+SiLU kernel == the unfused flax Block,
    identical param tree (fused_norm flips only the compute path)."""
    from cvpr23_lfdm_tpu.models.unet3d import Block

    rng = np.random.default_rng(5)
    b, f, h, w, c = 2, 5, 8, 8, 16
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((b, 1, 1, 1, c)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((b, 1, 1, 1, c)), jnp.float32)

    m_x = Block(c, groups=8)
    m_p = Block(c, groups=8, fused_norm=True)
    variables = jax.jit(lambda r: m_x.init(r, x))(jax.random.PRNGKey(0))
    v2 = m_p.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(variables) == (
        jax.tree_util.tree_structure(v2)
    )
    for ss in (None, (scale, shift)):
        ref = m_x.apply(variables, x, ss)
        out = m_p.apply(variables, x, ss)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5
        )


def test_fused_groupnorm_random_affine():
    """Kernel handles non-trivial gamma/beta and bf16 inputs."""
    from cvpr23_lfdm_tpu.ops.norm_pallas import groupnorm_film_silu

    rng = np.random.default_rng(6)
    b, f, h, w, c = 1, 3, 8, 8, 32
    x = jnp.asarray(rng.standard_normal((b, f, h, w, c)), jnp.float32)
    gamma = jnp.asarray(rng.standard_normal((c,)), jnp.float32)
    beta = jnp.asarray(rng.standard_normal((c,)), jnp.float32)

    import flax.linen as nn

    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    ref = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    ref = nn.silu(ref)
    out = groupnorm_film_silu(x, gamma, beta, groups=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    xb = x.astype(jnp.bfloat16)
    outb = groupnorm_film_silu(xb, gamma, beta, groups=8)
    np.testing.assert_allclose(
        np.asarray(outb, np.float32), np.asarray(ref), atol=0.03
    )
