"""Tests: checkpoint roundtrip, visualization, AVD network, logging."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_checkpoint_roundtrip(tmp_path):
    from flax import struct

    from cvpr23_lfdm_tpu.utils.checkpoint import CheckpointManager

    class S(struct.PyTreeNode):
        step: jnp.ndarray
        w: jnp.ndarray

    state = S(step=jnp.asarray(7), w=jnp.arange(12.0).reshape(3, 4))
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(state, step=7)
    assert mgr.has_latest()
    restored = mgr.restore(jax.device_get(state))
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.w), np.asarray(state.w))

    # rolling + gc
    for s in (8, 9, 10):
        mgr.save(state.replace(step=jnp.asarray(s)), step=s)
    assert mgr.latest_step() == 10
    kept = sorted(d for d in os.listdir(tmp_path / "ckpt") if d.startswith("step_"))
    assert len(kept) == 2


def test_flow_to_color_and_figs():
    from cvpr23_lfdm_tpu.utils.viz import conf2fig, flow2fig, flow_to_color, grid2fig

    rng = np.random.default_rng(0)
    flow = rng.standard_normal((32, 32, 2)).astype(np.float32)
    img = flow_to_color(flow)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8

    id_grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, 32), np.linspace(-1, 1, 32), indexing="xy"),
        axis=-1,
    ).astype(np.float32)
    fig = flow2fig(id_grid + 0.1 * flow, id_grid, img_size=64)
    assert fig.shape == (64, 64, 3)

    conf = conf2fig(rng.random((32, 32, 1)).astype(np.float32), 64)
    assert conf.shape == (64, 64) and conf.dtype == np.uint8

    lattice = grid2fig(id_grid, grid_size=32, img_size=64)
    assert lattice.shape[-1] == 3


def test_visualizer_board():
    from cvpr23_lfdm_tpu.utils.viz import Visualizer

    rng = np.random.default_rng(0)
    b, h, w, k = 1, 32, 32, 5
    out = {
        "prediction": rng.random((b, h, w, 3)).astype(np.float32),
        "deformed": rng.random((b, h, w, 3)).astype(np.float32),
        "occlusion_map": rng.random((b, 8, 8, 1)).astype(np.float32),
        "driving_region_params": {"shift": rng.uniform(-1, 1, (b, k, 2))},
        "source_region_params": {"shift": rng.uniform(-1, 1, (b, k, 2))},
    }
    src = rng.random((b, h, w, 3)).astype(np.float32)
    dri = rng.random((b, h, w, 3)).astype(np.float32)
    board = Visualizer().visualize(src, dri, out)
    assert board.shape == (h, w * 5, 3) and board.dtype == np.uint8


def test_avd_network_shapes():
    from cvpr23_lfdm_tpu.models.avd_network import AVDNetwork

    rng = np.random.default_rng(0)
    b, k = 3, 10
    params = lambda: {
        "shift": jnp.asarray(rng.uniform(-1, 1, (b, k, 2)), jnp.float32),
        "affine": jnp.asarray(
            np.eye(2)[None, None] + 0.1 * rng.standard_normal((b, k, 2, 2)),
            jnp.float32,
        ),
    }
    net = AVDNetwork(num_regions=k)
    x_id, x_pose = params(), params()
    variables = jax.jit(lambda r: net.init(r, x_id, x_pose))(jax.random.PRNGKey(0))
    out = net.apply(variables, x_id, x_pose)
    assert out["shift"].shape == (b, k, 2)
    assert out["affine"].shape == (b, k, 2, 2)
    assert out["covar"].shape == (b, k, 2, 2)
    # covar is symmetric PSD by construction
    np.testing.assert_allclose(
        np.asarray(out["covar"]), np.asarray(out["covar"]).swapaxes(-1, -2), atol=1e-6
    )


def test_natops_segmentation_parser(tmp_path):
    from cvpr23_lfdm_tpu.data.preprocess import natops_parse_segmentation

    # miniature segmentation.txt: 20 subjects x 24 actions x 2 clips
    lines = []
    for s in range(1, 21):
        lines.append(f"// Subject {s}")
        for a in range(1, 25):
            lines.append(f"{s},{a},2")
            lines.append(f"1:{10 * a},{10 * a + 5}")
            lines.append(f"2:{10 * a + 6},{10 * a + 9}")
    path = tmp_path / "segmentation.txt"
    path.write_text("\n".join(lines))
    seg = natops_parse_segmentation(str(path))
    assert len(seg) == 20 and len(seg[1]) == 24
    assert seg[3][5] == [(50, 55), (56, 59)]


def test_dm_training_gif_tiles():
    """5x2 per-frame tile layout (reference DM train :282-318)."""
    from cvpr23_lfdm_tpu.utils.viz import dm_training_gif

    rng = np.random.default_rng(0)
    F, H, h = 3, 32, 8
    vid = lambda: rng.random((F, H, H, 3), np.float32)
    grid = lambda: rng.uniform(-1, 1, (F, h, h, 2)).astype(np.float32)
    conf = lambda: rng.random((F, h, h, 1), np.float32)
    frames = dm_training_gif(
        rng.random((H, H, 3), np.float32), vid(), vid(), vid(), vid(), vid(),
        grid(), grid(), conf(), conf(), img_size=H,
    )
    assert frames.shape == (F, 2 * H, 5 * H, 3)
    assert frames.dtype == np.uint8
