"""Native C++ data-path: build + parity vs the cv2/numpy reference path."""

import numpy as np
import pytest

from cvpr23_lfdm_tpu.data import native
from cvpr23_lfdm_tpu.data.augment import (
    adjust_brightness,
    adjust_contrast,
    adjust_saturation,
)
from cvpr23_lfdm_tpu.data.io import pad_resize

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable (no toolchain)"
)


def test_pad_resize_batch_matches_cv2():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 60, 120, 3), np.uint8)
    out = native.pad_resize_batch(frames, 64)
    ref = np.stack([pad_resize(f, 64) for f in frames]).astype(np.float32) / 255.0
    assert out.shape == (3, 64, 64, 3)
    # cv2 INTER_AREA uses fixed-point arithmetic; allow ~1.5 LSB
    assert np.abs(out - ref).max() < 2.0 / 255.0


def test_pad_resize_batch_upscale():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 20, 30, 3), np.uint8)
    out = native.pad_resize_batch(frames, 64)
    ref = np.stack([pad_resize(f, 64) for f in frames]).astype(np.float32) / 255.0
    assert np.abs(out - ref).max() < 3.0 / 255.0


def test_jitter_bcs_matches_numpy():
    rng = np.random.default_rng(2)
    clip = rng.random((4, 16, 16, 3)).astype(np.float32)
    fb, fc, fs = 1.15, 0.85, 1.1
    ref = adjust_saturation(adjust_contrast(adjust_brightness(clip, fb), fc), fs)
    out = native.jitter_bcs(clip.copy(), fb, fc, fs)
    np.testing.assert_allclose(out, ref, atol=1e-5)
