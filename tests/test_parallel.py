"""Multi-device tests on the 8-device virtual CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cvpr23_lfdm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh((4, 2), ("data", "model"))
    assert mesh2.axis_names == ("data", "model")


def test_sharded_batchnorm_equals_global_stats():
    """The reference's SyncBN (sync_batchnorm/batchnorm.py:48-125) computes
    GLOBAL batch statistics across replicas. Under pjit the same falls out
    of sharded-batch reduction: stats from a jitted step over a
    batch-sharded input must equal single-device stats."""
    import flax.linen as nn

    bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8, 8, 4)).astype(np.float32)
    variables = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)

    def step(v, x):
        out, mutated = bn.apply(
            v, x, use_running_average=False, mutable=["batch_stats"]
        )
        return out, mutated["batch_stats"]

    # single device
    out_ref, stats_ref = jax.jit(step)(variables, x)

    # 8-way batch-sharded
    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = replicate(variables, mesh)
    out_sh, stats_sh = jax.jit(step)(vs, xs)

    np.testing.assert_allclose(
        np.asarray(stats_sh["mean"]), np.asarray(stats_ref["mean"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats_sh["var"]), np.asarray(stats_ref["var"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_sh), np.asarray(out_ref), atol=1e-4
    )


def test_sharded_grads_match_single_device():
    """Data-parallel gradient all-reduce: grads of a mean loss over a
    sharded batch equal single-device grads (the DataParallel gather +
    mean path, multiGPU train :252-258)."""
    w = jnp.ones((4, 4))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 4)).astype(np.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    g_ref = jax.jit(jax.grad(loss))(w, x)

    mesh = make_mesh()
    xs = jax.device_put(x, batch_sharding(mesh))
    ws = jax.device_put(w, NamedSharding(mesh, P()))
    g_sh = jax.jit(jax.grad(loss))(ws, xs)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-5)


def test_sampling_under_data_mesh():
    """Serving scale-out: sample_video jits with the request batch sharded
    over the data mesh (per-chip B=1 is this chip's best config; multi-chip
    throughput scales by sharding requests)."""
    from __graft_entry__ import _tiny_config, _init_vars
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion

    cfg = _tiny_config(num_frames=4)
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    lfae_vars, unet_vars = _init_vars(model, cfg, batch=1)

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    lfae_vars = jax.device_put(lfae_vars, repl)
    unet_vars = jax.device_put(unet_vars, repl)
    rng = np.random.default_rng(0)
    size = cfg.lfae.frame_shape
    ref = jax.device_put(
        jnp.asarray(rng.random((8, size, size, 3)), jnp.float32),
        batch_sharding(mesh),
    )
    cond = jax.device_put(
        jnp.asarray(rng.standard_normal((8, cfg.diffusion.cond_dim)), jnp.float32),
        batch_sharding(mesh),
    )

    out = jax.jit(
        lambda uv, lv, k, r, c: model.sample_video(uv, lv, k, r, c, 1.0)
    )(unet_vars, lfae_vars, jax.random.PRNGKey(0), ref, cond)
    out = jax.device_get(out)
    assert out["out_vid"].shape == (8, 4, size, size, 3)
    assert np.isfinite(out["out_vid"]).all()


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {"a": np.zeros((8, 3), np.float32)}
    sb = shard_batch(batch, mesh)
    assert sb["a"].sharding.spec == P("data")


def test_sampling_under_model_parallel_mesh():
    """Model-parallel serving: UNet weight matrices sharded over a `model`
    axis (attention to_qkv/to_out columns, conv output channels). GSPMD
    inserts the collectives; the sampled video must match the replicated
    run exactly (sharding never changes semantics)."""
    from __graft_entry__ import _tiny_config, _init_vars
    from cvpr23_lfdm_tpu.diffusion.flow_diffusion import FlowDiffusion

    cfg = _tiny_config(num_frames=4)
    model = FlowDiffusion(cfg.lfae, cfg.diffusion)
    lfae_vars, unet_vars = _init_vars(model, cfg, batch=1)

    rng = np.random.default_rng(1)
    size = cfg.lfae.frame_shape
    ref = jnp.asarray(rng.random((1, size, size, 3)), jnp.float32)
    cond = jnp.asarray(
        rng.standard_normal((1, cfg.diffusion.cond_dim)), jnp.float32
    )
    run = jax.jit(
        lambda uv, lv, k, r, c: model.sample_video(uv, lv, k, r, c, 1.0)[
            "out_vid"
        ]
    )

    mesh = make_mesh((2, 4), ("model", "data"))
    repl = NamedSharding(mesh, P())

    def shard_param(path, x):
        # shard the LAST axis over `model` where divisible — covers Dense
        # kernels (in, out) and conv kernels (kh, kw, in, out)
        if x.ndim >= 2 and x.shape[-1] % 2 == 0:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, repl)

    uv_tp = jax.tree_util.tree_map_with_path(shard_param, unet_vars)
    lv_repl = jax.device_put(lfae_vars, repl)

    baseline = jax.device_get(
        run(
            jax.device_put(unet_vars, repl), lv_repl,
            jax.random.PRNGKey(0), ref, cond,
        )
    )
    sharded = jax.device_get(
        run(uv_tp, lv_repl, jax.random.PRNGKey(0), ref, cond)
    )
    # resharded matmuls reduce in a different order; the 10-step sampler
    # amplifies the fp32 noise to ~6e-5
    np.testing.assert_allclose(sharded, baseline, atol=5e-4)


def test_tp_rules_cover_unet_params():
    """The partition table assigns a model-axis spec to every large UNet
    matrix (attention qkv/out, FiLM MLPs, conv output channels) and
    replicates norms/heads."""
    from cvpr23_lfdm_tpu.parallel.mesh import tp_spec

    assert tp_spec("downs_0_temporal_attn/attn/to_qkv/kernel", (64, 768), 2) == P(None, "model")
    assert tp_spec("mid_temporal_attn/attn/to_out/kernel", (256, 64), 2) == P("model", None)
    assert tp_spec("downs_0_block1/block1/proj/conv/kernel", (3, 3, 64, 128), 2) == P(None, None, None, "model")
    assert tp_spec("downs_0_block1/mlp/kernel", (1024, 256), 2) == P(None, "model")
    assert tp_spec("final_conv/kernel", (1, 1, 1, 64, 2), 2) == P()
    assert tp_spec("init_temporal_attn/norm/gamma", (64,), 2) == P()
    # indivisible -> replicate, never crash
    assert tp_spec("x/to_qkv/kernel", (64, 7), 2) == P()


def test_dm_train_step_under_tp_mesh_matches_dp():
    """One DM train step on a (model=2, data=4) mesh with tensor-sharded
    UNet params + Adam moments equals the pure-DP step (GSPMD collectives
    change layout, never values)."""
    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.train.dm_trainer import DMTrainer

    cfg = _tiny_config(num_frames=2)
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
    rng = np.random.default_rng(0)
    size = cfg.lfae.frame_shape
    vid = rng.random((8, 2, size, size, 3), np.float32)
    batch = {
        "ref_img": vid[:, 0],
        "real_vid": vid,
        "cond": rng.standard_normal((8, cfg.diffusion.cond_dim)).astype(np.float32),
        "none_cond_mask": np.zeros((8,), bool),
    }

    results = {}
    for name, mesh in (
        ("dp", make_mesh()),
        ("tp", make_mesh((2, 4), ("model", "data"))),
    ):
        trainer = DMTrainer(cfg, steps_per_epoch=4, lfae_vars=lfae_vars, mesh=mesh)
        trainer.place_lfae()
        state = trainer.init_state(jax.random.PRNGKey(1))
        if name == "tp":
            specs = {
                str(s.sharding.spec)
                for s in jax.tree_util.tree_leaves(state.unet_vars["params"])
            }
            assert any("model" in sp for sp in specs), "nothing was TP-sharded"
        state, metrics = trainer.train_step(state, jax.random.PRNGKey(2), batch)
        results[name] = (
            jax.device_get(metrics["loss"]),
            jax.device_get(state.unet_vars["params"]),
        )

    np.testing.assert_allclose(results["dp"][0], results["tp"][0], atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(results["dp"][1]),
        jax.tree_util.tree_leaves(results["tp"][1]),
    ):
        np.testing.assert_allclose(a, b, atol=2e-4)
