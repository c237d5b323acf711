"""DM trainer: end-to-end train steps + sampling on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np


def _setup():
    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.train.dm_trainer import DMTrainer

    cfg = _tiny_config(num_frames=4)
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
    trainer = DMTrainer(cfg, steps_per_epoch=10, lfae_vars=lfae_vars)
    trainer.place_lfae()
    state = trainer.init_state(jax.random.PRNGKey(1))
    return cfg, trainer, state


def _batch(cfg, bs=8):
    rng = np.random.default_rng(0)
    size = cfg.lfae.frame_shape
    f = cfg.diffusion.num_frames
    vid = rng.random((bs, f, size, size, 3), np.float32)
    return {
        "ref_img": vid[:, 0],
        "real_vid": vid,
        "cond": rng.standard_normal((bs, cfg.diffusion.cond_dim)).astype(np.float32),
        "none_cond_mask": np.zeros((bs,), bool),
    }


def test_monitoring_does_not_change_grads():
    """The pred_x0 decode is stop-gradient'd (flow_diffusion.py:213);
    running it on log steps only (dm_trainer.py) must leave the gradient
    bit-identical to the every-step reference cadence."""
    cfg, trainer, state = _setup()
    batch = {k: v[:2] for k, v in _batch(cfg).items()}
    lfae_vars = trainer.lfae_vars
    rng = jax.random.PRNGKey(7)

    def grads(with_monitoring):
        def loss_fn(params):
            unet_vars = {**state.unet_vars, "params": params}
            return trainer.model.loss(
                unet_vars, lfae_vars, rng,
                batch["ref_img"], batch["real_vid"], batch["cond"],
                batch["none_cond_mask"],
                with_monitoring=with_monitoring, only_use_flow=True,
            )[0]

        return jax.device_get(
            jax.jit(jax.grad(loss_fn))(state.unet_vars["params"])
        )

    g_fast, g_mon = grads(False), grads(True)
    for a, b in zip(jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_mon)):
        np.testing.assert_array_equal(a, b)


def test_dm_train_and_sample():
    cfg, trainer, state = _setup()
    batch = _batch(cfg)
    params_before = jax.device_get(
        jax.tree_util.tree_leaves(state.unet_vars["params"])[0]
    )
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(2), batch)
    assert "rec_loss" not in metrics  # fast variant skips the decode
    state, metrics = trainer.train_step(
        state, jax.random.PRNGKey(3), batch, with_monitoring=True
    )
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"]) and np.isfinite(m["rec_loss"])
    assert int(jax.device_get(state.step)) == 2
    params_after = jax.device_get(
        jax.tree_util.tree_leaves(state.unet_vars["params"])[0]
    )
    assert not np.allclose(params_before, params_after)

    # monitoring forward
    aux = jax.device_get(
        trainer.monitor(state, jax.random.PRNGKey(4), {k: v[:1] for k, v in batch.items()})
    )
    assert aux["fake_out_vid"].shape == (1, 4, 64, 64, 3)

    # sampling (tiny DDPM: 50 steps at 16^2)
    out = jax.device_get(
        trainer.sample_video(
            state, jax.random.PRNGKey(5),
            jnp.asarray(batch["ref_img"][:1]), jnp.asarray(batch["cond"][:1]),
            cond_scale=2.0,  # exercises the batched CFG path
        )
    )
    assert out["out_vid"].shape == (1, 4, 64, 64, 3)
    assert np.isfinite(out["out_vid"]).all()
    assert out["vid_conf"].min() >= 0.0 and out["vid_conf"].max() <= 1.0


def test_pseudo_gt_decode_free_matches():
    """`pseudo_ground_truth(with_decode=False)` (non-log train steps)
    returns bit-identical flow/conf/ref_fea to the decoded form and
    omits exactly the reconstruction keys."""
    cfg, trainer, state = _setup()
    batch = {k: v[:2] for k, v in _batch(cfg).items()}
    full = jax.device_get(
        jax.jit(trainer.model.pseudo_ground_truth)(
            trainer.lfae_vars, batch["ref_img"], batch["real_vid"]
        )
    )
    lean = jax.device_get(
        jax.jit(
            lambda lv, r, v: trainer.model.pseudo_ground_truth(
                lv, r, v, with_decode=False
            )
        )(trainer.lfae_vars, batch["ref_img"], batch["real_vid"])
    )
    assert set(full) - set(lean) == {"out_vid", "warped_vid"}
    for k in lean:
        np.testing.assert_array_equal(full[k], lean[k])
