"""Multi-chip data-parallel serving (parallel/serving.py) on the 8-device
virtual CPU mesh: the sharded `sample_video` dispatch must match the
single-device graph to ulp-level tolerance. Same threefry bits (a pure
function of key + shape, sharding-independent) and no collectives in the
forward; the residual ~1e-5 fp32 drift is XLA fusing the per-device
batch-1 program differently than the batch-8 program (reduction order
inside fusions) — measured max |diff| 3.6e-5 over a 2-step sample, not a
semantic divergence. The reference never sharded sampling — its multiGPU
trainer bypasses DataParallel for `sample_one_video`
(DM/train_video_flow_diffusion_mhad_multiGPU.py:357)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr23_lfdm_tpu.parallel.serving import (
    parse_mesh_spec,
    sample_video_sharded,
    serving_mesh,
)


def _tiny_model_and_vars(num_frames=2, steps=2):
    from __graft_entry__ import _init_vars, _tiny_config
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion

    cfg = _tiny_config(num_frames=num_frames, sampling_timesteps=steps)
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    lfae_vars, unet_vars = _init_vars(model, cfg, batch=1)
    return cfg, model, lfae_vars, unet_vars


def test_parse_mesh_spec():
    assert parse_mesh_spec("") == {}
    assert parse_mesh_spec("dp=8") == {"dp": 8}
    assert parse_mesh_spec("dp=4,tp=2") == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("zz=2")
    with pytest.raises(ValueError):
        serving_mesh(f"dp={len(jax.devices()) + 1}")
    m = serving_mesh("dp=4,tp=2")
    assert m.axis_names == ("data", "model") and m.shape["model"] == 2
    m = serving_mesh("dp=4,sp=2")
    assert m.axis_names == ("data", "space")


def test_sharded_sampling_bit_identical():
    cfg, model, lfae_vars, unet_vars = _tiny_model_and_vars()
    s = cfg.lfae.frame_shape
    b = 8
    k = jax.random.PRNGKey(0)
    refs = jax.random.uniform(
        jax.random.PRNGKey(1), (b, s, s, 3), jnp.float32
    )
    conds = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.diffusion.cond_dim), jnp.float32
    )

    @jax.jit
    def single(uv, lv, key, ref, cond):
        return model.sample_video(uv, lv, key, ref, cond, cond_scale=1.0)

    ref_out = jax.device_get(single(unet_vars, lfae_vars, k, refs, conds))

    mesh = serving_mesh("dp=8")
    sh_out = jax.device_get(
        sample_video_sharded(
            model, mesh, unet_vars, lfae_vars, k, refs, conds, 1.0
        )
    )
    assert set(sh_out) == set(ref_out)
    for key in ref_out:
        np.testing.assert_allclose(
            np.asarray(sh_out[key]), np.asarray(ref_out[key]),
            atol=2e-4, rtol=0,
            err_msg=f"sharded serving output {key!r} differs",
        )


@pytest.mark.parametrize("spec", ["dp=4,tp=2", "dp=4,sp=2"])
def test_sharded_sampling_tp_sp_matches_single_device(spec):
    """Tensor- and spatially-partitioned serving produce the same videos
    as the single-device graph (GSPMD value-preservation; only
    fusion-order fp32 drift remains)."""
    cfg, model, lfae_vars, unet_vars = _tiny_model_and_vars()
    s = cfg.lfae.frame_shape
    b = 4
    k = jax.random.PRNGKey(0)
    refs = jax.random.uniform(
        jax.random.PRNGKey(1), (b, s, s, 3), jnp.float32
    )
    conds = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.diffusion.cond_dim), jnp.float32
    )

    @jax.jit
    def single(uv, lv, key, ref, cond):
        return model.sample_video(uv, lv, key, ref, cond, cond_scale=1.0)

    ref_out = jax.device_get(single(unet_vars, lfae_vars, k, refs, conds))
    mesh = serving_mesh(spec)
    sh_out = jax.device_get(
        sample_video_sharded(
            model, mesh, unet_vars, lfae_vars, k, refs, conds, 1.0
        )
    )
    assert set(sh_out) == set(ref_out)
    for key in ref_out:
        np.testing.assert_allclose(
            np.asarray(sh_out[key]), np.asarray(ref_out[key]),
            atol=2e-4, rtol=0,
            err_msg=f"{spec} serving output {key!r} differs",
        )


def test_sharded_sampling_pads_ragged_batch():
    cfg, model, lfae_vars, unet_vars = _tiny_model_and_vars()
    s = cfg.lfae.frame_shape
    b = 5  # not a multiple of the mesh size -> edge-pad + strip
    refs = jax.random.uniform(
        jax.random.PRNGKey(1), (b, s, s, 3), jnp.float32
    )
    conds = jax.random.normal(
        jax.random.PRNGKey(2), (b, cfg.diffusion.cond_dim), jnp.float32
    )
    mesh = serving_mesh("dp=8")
    out = jax.device_get(
        sample_video_sharded(
            model, mesh, unet_vars, lfae_vars, jax.random.PRNGKey(0),
            refs, conds, 1.0,
        )
    )
    assert out["out_vid"].shape[:2] == (b, cfg.diffusion.num_frames)
    assert np.isfinite(out["out_vid"]).all()


def test_demo_assets_bundled():
    import os

    from cvpr23_lfdm_tpu.parallel.serving import demo_asset_path

    for ds in ("mug", "mhad", "natops"):
        assert os.path.exists(demo_asset_path(ds)), (
            f"bundled demo image missing for {ds}"
        )
