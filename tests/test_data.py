"""Data pipeline tests: samplers, augmentation parity, datasets, loader."""

import numpy as np
import pytest

from cvpr23_lfdm_tpu.data import (
    ClipAugment,
    DatasetRepeater,
    DMVideoDataset,
    LFAEPairDataset,
    PrefetchLoader,
    get_spec,
)
from cvpr23_lfdm_tpu.data.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_hue,
    adjust_saturation,
)
from cvpr23_lfdm_tpu.data.io import pad_resize
from cvpr23_lfdm_tpu.data.sampling import (
    random_indices,
    sample_indices,
    uniform_indices,
    very_random_indices,
)
from cvpr23_lfdm_tpu.data.synthetic import make_synthetic_corpus


# --------------------------------------------------------------- samplers


def test_uniform_indices_matches_reference_linspace():
    # datasets_mug.py:67-68
    np.testing.assert_array_equal(
        uniform_indices(100, 40), np.linspace(0, 99, 40, dtype=int)
    )


def test_random_indices_properties():
    rng = np.random.default_rng(0)
    for total in (40, 41, 100, 301):
        idx = random_indices(rng, total, 40)
        assert idx.shape == (40,)
        assert idx[0] == 0 and idx[-1] == total - 1  # endpoints anchored
        assert (np.diff(idx) >= 0).all()
        assert (idx >= 0).all() and (idx < total).all()


def test_very_random_indices_pins_frame0():
    rng = np.random.default_rng(0)
    idx = very_random_indices(rng, 55, 40)
    assert idx[0] == 0
    assert (np.diff(idx[1:]) >= 0).all()


def test_short_video_edge_pads():
    # datasets_mug.py:79-81
    idx = sample_indices(np.random.default_rng(0), 7, 12, "uniform")
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4, 5, 6, 6, 6, 6, 6, 6])


# --------------------------------------------------------- jitter parity


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    return rng.random((16, 16, 3)).astype(np.float32)


def test_adjust_ops_identity_at_factor_1(img):
    np.testing.assert_allclose(adjust_brightness(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_contrast(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_saturation(img, 1.0), img, atol=1e-6)
    np.testing.assert_allclose(adjust_hue(img, 0.0), img, atol=1e-5)


def test_adjust_ops_match_torchvision_semantics(img):
    """Parity with torch reference math (float path)."""
    import torch

    t = torch.from_numpy(img).permute(2, 0, 1)  # CHW

    def gray(x):
        return (
            0.299 * x[0] + 0.587 * x[1] + 0.114 * x[2]
        ).unsqueeze(0)

    # brightness: x * f
    np.testing.assert_allclose(
        adjust_brightness(img, 1.2),
        (t * 1.2).clamp(0, 1).permute(1, 2, 0).numpy(),
        atol=1e-6,
    )
    # contrast: blend with mean gray
    f = 0.8
    ref = (f * t + (1 - f) * gray(t).mean()).clamp(0, 1)
    np.testing.assert_allclose(
        adjust_contrast(img, f), ref.permute(1, 2, 0).numpy(), atol=1e-5
    )
    # saturation: blend with per-pixel gray
    ref = (f * t + (1 - f) * gray(t)).clamp(0, 1)
    np.testing.assert_allclose(
        adjust_saturation(img, f), ref.permute(1, 2, 0).numpy(), atol=1e-5
    )


def test_adjust_hue_roundtrip(img):
    out = adjust_hue(adjust_hue(img, 0.25), -0.25)
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_clip_augment_shares_draw_across_frames():
    rng = np.random.default_rng(3)
    clip = np.tile(np.random.default_rng(1).random((1, 8, 8, 3)), (4, 1, 1, 1)).astype(
        np.float32
    )
    out = ClipAugment(time_flip=False, horizontal_flip=False)(rng, clip)
    # identical input frames must stay identical after a shared jitter draw
    for f in range(1, 4):
        np.testing.assert_allclose(out[f], out[0], atol=1e-6)


# ------------------------------------------------------------ pad_resize


def test_pad_resize_aspect_and_padding():
    img = np.full((60, 120, 3), 200, np.uint8)
    out = pad_resize(img, 128)
    assert out.shape == (128, 128, 3)
    # long side 120 -> 128; short side 60 -> 64, centered with 32px zero bands
    assert (out[:32] == 0).all() and (out[-32:] == 0).all()
    assert (out[40:80] > 0).all()


# ------------------------------------------------------------- datasets


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    roots = {}
    for ds in ("mug", "mhad", "natops"):
        root = tmp_path_factory.mktemp(ds)
        kwargs = {}
        if ds == "natops":
            # crop box is y[10:239] x[30:290]: need frames big enough
            kwargs = dict(size=320)
        make_synthetic_corpus(str(root), ds, num_frames=10, **kwargs)
        roots[ds] = str(root)
    return roots


@pytest.mark.parametrize("ds", ["mug", "mhad", "natops"])
def test_dm_video_dataset(corpora, ds):
    spec = get_spec(ds)
    data = DMVideoDataset(
        spec, corpora[ds], split="train", num_frames=8, image_size=64,
        sampling="very_random",
    )
    assert len(data) == 4  # 2 subjects x 2 classes x 1 take
    item = data[0]
    assert item["video"].shape == (8, 64, 64, 3)
    assert item["video"].dtype == np.float32
    assert 0.0 <= item["video"].min() and item["video"].max() <= 1.0
    assert item["text"] in spec.classes


def test_dm_dataset_combos_mode(corpora):
    spec = get_spec("mug")
    data = DMVideoDataset(
        spec, corpora["mug"], split="train", combos=True, num_frames=4,
        image_size=32, color_jitter=False, sampling="uniform",
    )
    combos = {(e.subject, e.class_name) for e in data.entries}
    assert len(combos) == len(data.entries) == 4


def test_lfae_pair_dataset(corpora):
    spec = get_spec("mug")
    data = LFAEPairDataset(spec, corpora["mug"], split="train", frame_shape=64)
    item = data[1]
    assert item["source"].shape == (64, 64, 3)
    assert item["driving"].shape == (64, 64, 3)
    assert item["source"].dtype == np.float32


def test_mug_session_subject_layout(tmp_path):
    make_synthetic_corpus(
        str(tmp_path), "mug", subjects=["002", "008"],
        classes=["anger"], num_frames=4,
    )
    spec = get_spec("mug")
    entries = spec.list_videos(str(tmp_path), ["002", "008"])
    names = sorted(e.name for e in entries)
    # session subjects are listed TWICE, reproducing the reference's
    # `for session_name in ["session0", "session0"]` (datasets_mug.py:41)
    assert names == [
        "002_session0_anger_take000",
        "002_session0_anger_take000",
        "008_anger_take000",
    ]


def test_dm_dataset_mean_subtraction(corpora):
    """mean knob: (x - mean)/255 protocol (datasets_mug.py:109-113)."""
    spec = get_spec("mug")
    kw = dict(
        split="train", num_frames=4, image_size=32, color_jitter=False,
        sampling="uniform", seed=3,
    )
    base = DMVideoDataset(spec, corpora["mug"], **kw)
    shifted = DMVideoDataset(spec, corpora["mug"], mean=(128, 128, 128), **kw)
    a, b = base[0]["video"], shifted[0]["video"]
    np.testing.assert_allclose(b, a - 128.0 / 255.0, atol=1e-6)


def test_natops_crop_applied(corpora):
    spec = get_spec("natops")
    data = DMVideoDataset(
        spec, corpora["natops"], split="train", num_frames=2, image_size=64,
        color_jitter=False, sampling="uniform",
    )
    item = data[0]  # crop (229 x 260) -> pad-resize keeps content
    assert item["video"].shape == (2, 64, 64, 3)


def test_loader_propagates_worker_failure():
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise IOError("corrupt frame")

    loader = PrefetchLoader(Broken(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="worker failed"):
        next(iter(loader))


def test_loader_producer_exits_when_iterator_abandoned():
    """Abandoning an iterator mid-epoch must not leave the producer thread
    blocked on a full queue (it re-checks the stop event while putting)."""
    import threading
    import time

    class Tiny:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"x": np.zeros((2,), np.float32)}

    before = threading.active_count()
    it = iter(PrefetchLoader(Tiny(), batch_size=4, num_workers=2, prefetch=2))
    next(it)  # producer running, queue fills up behind us
    it.close()  # abandon: generator finally-block sets the stop event
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_loader_rejects_empty_dataset():
    with pytest.raises(ValueError, match="empty dataset"):
        PrefetchLoader([], batch_size=2)


def test_dataset_rng_thread_isolation(corpora):
    """Concurrent __getitem__ calls must not corrupt RNG state."""
    from concurrent.futures import ThreadPoolExecutor

    spec = get_spec("mug")
    data = DMVideoDataset(
        spec, corpora["mug"], num_frames=6, image_size=32,
        sampling="very_random", seed=0,
    )
    with ThreadPoolExecutor(8) as pool:
        out = list(pool.map(lambda i: data[i % len(data)], range(64)))
    for item in out:
        assert item["video"].shape == (6, 32, 32, 3)
        assert np.isfinite(item["video"]).all()


def test_flowautoenc_evaluate_covers_full_split(corpora):
    """ceil-batch counting + ragged frame chunking: every held-out video is
    scored exactly once (the reference evaluates the whole split)."""
    import jax

    from __graft_entry__ import _tiny_config
    from cvpr23_lfdm_tpu.eval import flowautoenc
    from cvpr23_lfdm_tpu.models.flow_autoenc import init_lfae_vars

    cfg = _tiny_config(num_frames=5).lfae
    lfae_vars = init_lfae_vars(jax.random.PRNGKey(0), cfg)
    spec = get_spec("mug")
    dataset = DMVideoDataset(
        spec, corpora["mug"], split="train", num_frames=5,
        image_size=cfg.frame_shape, color_jitter=False, sampling="uniform",
    )
    assert len(dataset) == 4
    scored = []
    orig = flowautoenc.make_reconstruct_fn

    def counting(c):
        run = orig(c)

        def wrapped(v, ref, vid):
            scored.append(vid.shape)
            return run(v, ref, vid)

        return wrapped

    flowautoenc.make_reconstruct_fn = counting
    try:
        # batch 3 over 4 videos -> ceil = 2 batches (3 + 1);
        # frame_chunk 2 over 5 frames -> ragged 1-frame tail chunk runs
        # at its natural size (no repeated-frame padding waste)
        result = flowautoenc.evaluate(
            lfae_vars, cfg, dataset, batch_size=3, frame_chunk=2
        )
    finally:
        flowautoenc.make_reconstruct_fn = orig
    assert np.isfinite(result["out_loss"]) and np.isfinite(result["warp_loss"])
    assert sum(s[0] for s in scored[::3]) == 4  # 3 chunks per batch


def test_loader_and_repeater(corpora):
    spec = get_spec("mug")
    data = DatasetRepeater(
        LFAEPairDataset(spec, corpora["mug"], split="train", frame_shape=32),
        num_repeats=3,
    )
    assert len(data) == 12
    loader = PrefetchLoader(data, batch_size=4, num_workers=2, seed=0)
    it = iter(loader)
    batch = next(it)
    assert batch["source"].shape == (4, 32, 32, 3)
    assert len(batch["name"]) == 4
    batch2 = next(it)
    assert batch2["source"].shape == (4, 32, 32, 3)


def test_grain_loader(corpora):
    """Grain-backed loader yields PrefetchLoader-compatible batches, both
    in-process and with worker processes (pickled dataset)."""
    from cvpr23_lfdm_tpu.data.grain_loader import GrainLoader

    spec = get_spec("mug")
    ds = DMVideoDataset(
        spec, corpora["mug"], "train", num_frames=6, image_size=32,
        sampling="very_random", seed=3,
    )
    for workers in (0, 2):
        loader = GrainLoader(ds, batch_size=2, num_workers=workers, seed=5)
        it = iter(loader)
        seen = set()
        for _ in range(3):
            batch = next(it)
            assert batch["video"].shape == (2, 6, 32, 32, 3)
            assert batch["video"].dtype == np.float32
            assert isinstance(batch["text"], list) and len(batch["text"]) == 2
            seen.update(batch["name"])
        assert len(seen) > 1  # shuffled across the corpus


# ------------------------------------------- geometric augmentation (round 3)


def _rotate_bruteforce(img, angle_deg):
    """Loop-based oracle for skimage `rotate(img, angle)` semantics
    (augmentation.py:199-204): inverse map src = R(+angle)(dst - c) + c in
    (x, y) with center (cols/2 - 0.5, rows/2 - 0.5), bilinear, zero fill."""
    h, w, c = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    a = np.deg2rad(angle_deg)
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            sx = np.cos(a) * (x - cx) - np.sin(a) * (y - cy) + cx
            sy = np.sin(a) * (x - cx) + np.cos(a) * (y - cy) + cy
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros((c,), np.float64)
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    xi, yi = x0 + dx, y0 + dy
                    if 0 <= xi < w and 0 <= yi < h:
                        acc += wx * wy * img[yi, xi]
            out[y, x] = acc
    return out


def test_rotate_clip_matches_bruteforce():
    from cvpr23_lfdm_tpu.data.augment import rotate_clip

    rng = np.random.default_rng(0)
    # non-square: exercises the per-axis centering
    clip = rng.random((2, 9, 13, 3)).astype(np.float32)
    for angle in (0.0, 14.5, -30.0, 90.0):
        got = rotate_clip(clip, angle)
        for f in range(2):
            np.testing.assert_allclose(
                got[f], _rotate_bruteforce(clip[f], angle), atol=1e-5
            )


def test_random_resize_clip_scale_range():
    """RandomResize (augmentation.py:105-133): one uniform factor in
    `ratio`, floor-to-int sizes, shared by all frames."""
    from cvpr23_lfdm_tpu.data.augment import random_resize_clip

    clip = np.random.default_rng(1).random((3, 20, 30, 3)).astype(np.float32)
    sizes = set()
    for seed in range(20):
        out = random_resize_clip(
            np.random.default_rng(seed), clip, ratio=(0.75, 4.0 / 3.0)
        )
        h, w = out.shape[1:3]
        assert int(20 * 0.75) <= h <= int(20 * 4 / 3)
        assert int(30 * 0.75) <= w <= int(30 * 4 / 3)
        # aspect preserved up to the int() floor
        assert abs(h / 20 - w / 30) < 0.05
        sizes.add((h, w))
    assert len(sizes) > 5  # actually random


def test_pad_clip_edge_and_gate():
    """pad_clip (augmentation.py:113-118): centered edge padding, applied
    only when target >= image extent (the `h < im_h` gate)."""
    from cvpr23_lfdm_tpu.data.augment import pad_clip

    clip = np.arange(2 * 3 * 4 * 1, dtype=np.float32).reshape(2, 3, 4, 1)
    out = pad_clip(clip, 5, 4)
    assert out.shape == (2, 5, 4, 1)
    np.testing.assert_array_equal(out[:, 0], out[:, 1])  # edge replicate
    # target smaller than the image: no padding at all
    assert pad_clip(clip, 2, 2).shape == clip.shape


def test_random_crop_clip_shared_window():
    """RandomCrop (augmentation.py:136-172): one window for all frames;
    output always (h, w) even from smaller inputs (edge pad first)."""
    from cvpr23_lfdm_tpu.data.augment import random_crop_clip

    rng = np.random.default_rng(3)
    base = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    clip = np.concatenate([base, base], axis=0)  # identical frames
    out = random_crop_clip(rng, clip, 8)
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_array_equal(out[0], out[1])  # same window per frame
    # crop larger than image: pad path
    out2 = random_crop_clip(rng, clip, (20, 20))
    assert out2.shape == (2, 20, 20, 3)


def test_clip_augment_geometric_pipeline():
    """Full AllAugmentationTransform order (flip -> rotation -> resize ->
    crop -> jitter) produces valid clips; geometric stages default off."""
    from cvpr23_lfdm_tpu.data.augment import ClipAugment

    clip = np.random.default_rng(5).random((4, 24, 24, 3)).astype(np.float32)
    aug = ClipAugment(
        rotation_degrees=15.0, resize_ratio=(0.9, 1.1), crop_size=24
    )
    out = aug(np.random.default_rng(7), clip)
    assert out.shape == (4, 24, 24, 3)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0
    # defaults leave the frame geometry untouched
    out_default = ClipAugment()(np.random.default_rng(8), clip)
    assert out_default.shape == clip.shape


def test_lfae_pair_dataset_id_sampling(corpora):
    """id_sampling indexes identities and draws a random take per visit
    (frames_dataset.py:120-127); pairs_list is accepted (dead in the
    reference too, frames_dataset.py:89,94)."""
    spec = get_spec("mug")
    flat = LFAEPairDataset(
        spec, corpora["mug"], "train", frame_shape=32, augment=None
    )
    ds = LFAEPairDataset(
        spec, corpora["mug"], "train", frame_shape=32, augment=None,
        id_sampling=True, pairs_list="unused.csv", seed=1,
    )
    subjects = {e.subject for e in flat.entries}
    assert len(ds) == len(subjects)  # identities, not takes
    assert len(flat) > len(ds)
    # deterministic per visit; take varies across visits of one identity
    a = ds.sample(0, epoch=0)
    a2 = ds.sample(0, epoch=0)
    assert a["name"] == a2["name"]
    names = {ds.sample(0, epoch=e)["name"] for e in range(16)}
    assert len(names) > 1
    subj = ds.identities[0]
    assert all(n in {e.name for e in ds._takes[subj]} for n in names)


def test_paired_dataset_random_pairs(corpora):
    """Cross-product subsample mode (frames_dataset.py:205-210):
    deterministic under seed, items are prefixed driving_/source_ dicts."""
    from cvpr23_lfdm_tpu.data import PairedDataset

    spec = get_spec("mug")
    base = LFAEPairDataset(
        spec, corpora["mug"], "train", frame_shape=32, augment=None
    )
    ds = PairedDataset(base, number_of_pairs=4, seed=3)
    ds2 = PairedDataset(base, number_of_pairs=4, seed=3)
    assert len(ds) == 4
    assert ds.pairs == ds2.pairs  # seeded, not global-RNG-dependent
    # pairs index within the truncated cross-product square
    m = min(4, len(base))
    assert all(0 <= i < m and 0 <= j < m for i, j in ds.pairs)
    item = ds[0]
    assert "driving_source" in item and "source_source" in item
    assert item["driving_source"].shape == (32, 32, 3)


def test_paired_dataset_pairs_list_csv(corpora, tmp_path):
    """CSV mode (frames_dataset.py:211-222): rows filtered to known video
    names, order preserved, name->index mapping correct."""
    from cvpr23_lfdm_tpu.data import PairedDataset

    spec = get_spec("mug")
    base = LFAEPairDataset(
        spec, corpora["mug"], "train", frame_shape=32, augment=None,
        pairs_list=str(tmp_path / "pairs.csv"),
    )
    names = [e.name for e in base.entries]
    csv_path = tmp_path / "pairs.csv"
    csv_path.write_text(
        "source,driving\n"
        f"{names[0]},{names[1]}\n"
        f"not_a_video,{names[0]}\n"   # dropped: unknown source
        f"{names[1]},{names[0]}\n"
    )
    ds = PairedDataset(base, number_of_pairs=10, seed=0)
    assert ds.pairs == [(1, 0), (0, 1)]  # (driving_idx, source_idx)
    item = ds[0]
    assert item["driving_name"] == names[1]
    assert item["source_name"] == names[0]


def test_read_image_cache(tmp_path, monkeypatch):
    """Decoded-frame LRU: hit returns the identical read-only array; the
    byte budget evicts oldest-first; 0 disables caching entirely."""
    import cv2

    from cvpr23_lfdm_tpu.data import io as dio

    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, np.full((8, 8, 3), i * 10, np.uint8))
        paths.append(p)

    dio.clear_image_cache()
    a = dio.read_image(paths[0])
    assert not a.flags.writeable
    assert dio.read_image(paths[0]) is a  # cache hit
    np.testing.assert_array_equal(a, np.full((8, 8, 3), 0, np.uint8))

    # budget of exactly two 8x8x3 frames -> reading a third evicts the LRU
    monkeypatch.setenv("LFDM_IMAGE_CACHE_MB", str(2 * 8 * 8 * 3 / 2**20))
    dio.clear_image_cache()
    a0 = dio.read_image(paths[0])
    a1 = dio.read_image(paths[1])
    dio.read_image(paths[2])
    assert dio.read_image(paths[1]) is a1  # still cached
    assert dio.read_image(paths[0]) is not a0  # evicted (oldest)

    monkeypatch.setenv("LFDM_IMAGE_CACHE_MB", "0")
    dio.clear_image_cache()
    b = dio.read_image(paths[0])
    assert b.flags.writeable  # uncached arrays stay mutable
    assert dio.read_image(paths[0]) is not b
