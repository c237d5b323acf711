"""Protocol-faithful crash-resume: exact batch-stream replay + trainer state.

The reference resumes by recomputing `start_step` from the saved example
counter and running only the remainder (LFAE/train.py:44-56,
DM/train_video_flow_diffusion_mug.py:173-181) — but its torch DataLoader
workers reseed per run, so the post-resume batch stream differs. Here the
visit-keyed RNG (`datasets.visit_rng`) + seekable loaders make resume
replay EXACTLY the straight-through run: same batches, same noise, same
LR schedule, bit-identical parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpr23_lfdm_tpu.data import (
    DatasetRepeater,
    DMVideoDataset,
    LFAEPairDataset,
    PrefetchLoader,
    get_spec,
)
from cvpr23_lfdm_tpu.data.synthetic import make_synthetic_corpus


@pytest.fixture(scope="module")
def mug_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mug_resume")
    make_synthetic_corpus(str(root), "mug", num_frames=10)
    return str(root)


def _take(loader, n):
    it = iter(loader)
    return [next(it) for _ in range(n)]


# ----------------------------------------------------------- dataset visits


def test_visit_rng_is_identity_keyed(mug_root):
    """Same (seed, epoch, index) -> identical sample regardless of the
    calling thread; different epochs -> different augmentation draws."""
    from concurrent.futures import ThreadPoolExecutor

    data = DMVideoDataset(
        get_spec("mug"), mug_root, "train", num_frames=4, image_size=32,
        sampling="very_random", seed=7,
    )
    ref = data.sample(1, epoch=3)
    with ThreadPoolExecutor(4) as pool:
        out = list(pool.map(lambda _: data.sample(1, epoch=3), range(8)))
    for item in out:
        np.testing.assert_array_equal(item["video"], ref["video"])
    other = data.sample(1, epoch=4)
    assert not np.array_equal(other["video"], ref["video"])


# ----------------------------------------------------------- thread loader


def test_prefetch_loader_stream_is_run_deterministic(mug_root):
    data = LFAEPairDataset(
        get_spec("mug"), mug_root, "train", frame_shape=32, seed=3
    )
    mk = lambda: PrefetchLoader(data, batch_size=2, num_workers=3, seed=11)
    a = _take(mk(), 6)
    b = _take(mk(), 6)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["source"], y["source"])
        np.testing.assert_array_equal(x["driving"], y["driving"])
        assert x["name"] == y["name"]


def test_prefetch_loader_seek_replays_straight_stream(mug_root):
    """start_batch=k reproduces batches k.. of a from-scratch run,
    including a mid-epoch seek (4 videos / bs 2 -> 2 batches per epoch)."""
    data = DMVideoDataset(
        get_spec("mug"), mug_root, "train", num_frames=4, image_size=32,
        seed=5,
    )
    straight = _take(
        PrefetchLoader(data, batch_size=2, num_workers=2, seed=9), 7
    )
    for k in (1, 2, 5):
        seeked = _take(
            PrefetchLoader(
                data, batch_size=2, num_workers=2, seed=9, start_batch=k
            ),
            7 - k,
        )
        for x, y in zip(straight[k:], seeked):
            np.testing.assert_array_equal(x["video"], y["video"])
            assert x["name"] == y["name"]


def test_repeater_visits_are_distinct_within_epoch(mug_root):
    """DatasetRepeater gives every repeat of a video its own stream
    (visit = epoch * num_repeats + repeat index)."""
    inner = DMVideoDataset(
        get_spec("mug"), mug_root, "train", num_frames=4, image_size=32,
        sampling="very_random", seed=0,
    )
    rep = DatasetRepeater(inner, num_repeats=3)
    n = len(inner)
    a = rep.sample(0, epoch=0)
    b = rep.sample(n, epoch=0)  # same video, second repeat
    assert a["name"] == b["name"]
    assert not np.array_equal(a["video"], b["video"])
    # and the repeat stream differs from the next epoch's first visit
    c = rep.sample(0, epoch=1)
    assert not np.array_equal(b["video"], c["video"])


# ------------------------------------------------------------ grain loader


def test_grain_loader_run_to_run_deterministic(mug_root):
    """Visit-keyed RNG makes the multiprocess stream identical across
    runs/restarts — the round-2 pid-mixing bug made Grain worker streams
    non-reproducible. (Batch COMPOSITION is per-worker-count: grain
    batches inside each worker, so compare at a fixed worker count.)"""
    from cvpr23_lfdm_tpu.data.grain_loader import GrainLoader

    data = DMVideoDataset(
        get_spec("mug"), mug_root, "train", num_frames=4, image_size=32,
        sampling="very_random", seed=2,
    )
    a = _take(GrainLoader(data, batch_size=2, num_workers=2, seed=4), 5)
    b = _take(GrainLoader(data, batch_size=2, num_workers=2, seed=4), 5)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x["video"], y["video"])
        assert x["name"] == y["name"]


def test_grain_loader_state_roundtrip(mug_root):
    """get_state/set_state resumes the exact batch stream mid-epoch."""
    from cvpr23_lfdm_tpu.data.grain_loader import GrainLoader

    data = DMVideoDataset(
        get_spec("mug"), mug_root, "train", num_frames=4, image_size=32,
        seed=2,
    )
    mk = lambda: GrainLoader(data, batch_size=2, num_workers=0, seed=8)
    ref_loader = mk()
    _ = _take(ref_loader, 3)
    saved = ref_loader.get_state()
    expect = _take(ref_loader, 4)

    fresh = mk()
    fresh.set_state(saved)
    got = _take(fresh, 4)
    for x, y in zip(expect, got):
        np.testing.assert_array_equal(x["video"], y["video"])
        assert x["name"] == y["name"]


# -------------------------------------------------------- trainer resume


def _dm_setup():
    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars
    from cvpr23_lfdm_tpu.train.dm_trainer import DMTrainer

    cfg = _tiny_config(num_frames=2)
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg.lfae)
    trainer = DMTrainer(cfg, steps_per_epoch=2, lfae_vars=lfae_vars)
    trainer.place_lfae()
    return cfg, trainer


def _dm_stream(cfg, start=0, bs=8):
    size = cfg.lfae.frame_shape
    f = cfg.diffusion.num_frames
    i = start
    while True:
        rng = np.random.default_rng(10_000 + i)
        vid = rng.random((bs, f, size, size, 3), np.float32)
        yield {
            "ref_img": vid[:, 0],
            "real_vid": vid,
            "cond": rng.standard_normal(
                (bs, cfg.diffusion.cond_dim)
            ).astype(np.float32),
            "none_cond_mask": np.zeros((bs,), bool),
        }
        i += 1


def test_dm_trainer_resume_bit_identical(tmp_path):
    """Straight 4-step run == 2 steps + crash + restore + 2 more steps:
    same final step counter, LR schedule position (opt_state), parameters
    and noise stream — the reference's --set-start semantics, made exact."""
    from cvpr23_lfdm_tpu.utils.checkpoint import CheckpointManager

    cfg, trainer = _dm_setup()
    key = jax.random.PRNGKey(42)

    state = trainer.init_state(jax.random.PRNGKey(1))
    straight = trainer.fit(
        state, _dm_stream(cfg), num_steps=4, rng=key, log_every=0
    )
    p_straight = jax.device_get(straight.unet_vars["params"])

    # crashed run: checkpoint at step 2, "crash", restore, run remainder
    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state = trainer.init_state(jax.random.PRNGKey(1))
    state = trainer.fit(
        state, _dm_stream(cfg), num_steps=2, rng=key, log_every=0,
        checkpoint_fn=lambda s: ckpt.save(
            s, step=int(jax.device_get(s.step)), extra={"seed": 42}
        ),
        checkpoint_every=2,
    )
    del state  # crash

    template = jax.device_get(trainer.init_state(jax.random.PRNGKey(1)))
    restored = ckpt.restore(template)
    start_step = int(jax.device_get(restored.step))
    assert start_step == 2
    assert ckpt.load_extra() == {"seed": 42}
    resumed = trainer.fit(
        restored, _dm_stream(cfg, start=start_step), num_steps=4, rng=key,
        log_every=0, start_step=start_step,
    )
    assert int(jax.device_get(resumed.step)) == 4
    p_resumed = jax.device_get(resumed.unet_vars["params"])
    for a, b in zip(
        jax.tree_util.tree_leaves(p_straight),
        jax.tree_util.tree_leaves(p_resumed),
    ):
        np.testing.assert_array_equal(a, b)


def test_checkpoint_extra_bytes_roundtrip(tmp_path):
    from cvpr23_lfdm_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state = {"w": np.ones((2,), np.float32)}
    ckpt.save(state, step=1, extra={"grain_state": b"\x00\x01binary", "n": 3})
    out = ckpt.load_extra()
    assert out["grain_state"] == b"\x00\x01binary"
    assert out["n"] == 3
    assert ckpt.load_extra("step_00000001") == out
