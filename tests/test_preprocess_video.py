"""Preprocessing video paths: synthetic avi -> frame-folder trees."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_avi(path, num_frames=8, size=(32, 24), fps=20):
    fourcc = cv2.VideoWriter_fourcc(*"MJPG")
    w = cv2.VideoWriter(str(path), fourcc, fps, size)
    rng = np.random.default_rng(0)
    for i in range(num_frames):
        frame = np.full((size[1], size[0], 3), i * 10 % 255, np.uint8)
        frame[:4, :4] = rng.integers(0, 255, (4, 4, 3), np.uint8)
        w.write(frame)
    w.release()


def test_natops_split_videos(tmp_path):
    from cvpr23_lfdm_tpu.data.preprocess import natops_split_videos

    root = tmp_path / "data"
    (root / "gesture01").mkdir(parents=True)
    _write_avi(root / "gesture01" / "g01s01.avi", num_frames=10)
    # segmentation: subject 1 has 2 clips for action 1 (others empty)
    lines = []
    for s in range(1, 21):
        lines.append(f"// Subject {s}")
        for a in range(1, 25):
            lines.append(f"{s},{a},2")
            if s == 1 and a == 1:
                lines.append("1:2,4")
                lines.append("2:6,9")
    (root / "segmentation.txt").write_text("\n".join(lines))

    out = tmp_path / "split"
    natops_split_videos(str(root), str(out))
    clips = sorted(os.listdir(out))
    assert clips == ["g01s01p01", "g01s01p02"]
    # clip 1: frames 2..4 (1-based) -> 3 frames
    assert len(os.listdir(out / "g01s01p01")) == 3
    assert len(os.listdir(out / "g01s01p02")) == 4


def test_mhad_crop_images(tmp_path):
    import scipy.io

    from cvpr23_lfdm_tpu.data.preprocess import MHAD_RGB_CROP, mhad_crop_images

    root = tmp_path
    (root / "RGB").mkdir()
    (root / "Depth").mkdir()
    _write_avi(root / "RGB" / "a1_s1_t1_color.avi", num_frames=4, size=(640, 480))
    scipy.io.savemat(
        str(root / "Depth" / "a1_s1_t1_depth.mat"),
        {"d_depth": np.zeros((240, 320, 4), np.uint16)},
    )
    # a video without a depth file must be skipped (reference gate)
    _write_avi(root / "RGB" / "a2_s1_t1_color.avi", num_frames=2, size=(640, 480))

    out = tmp_path / "crop_image"
    mhad_crop_images(str(root), str(out))
    assert sorted(os.listdir(out)) == ["a1_s1_t1"]
    frames = sorted(os.listdir(out / "a1_s1_t1"))
    assert len(frames) == 4
    import imageio.v2 as imageio

    img = imageio.imread(out / "a1_s1_t1" / frames[0])
    c = MHAD_RGB_CROP
    assert img.shape == (c["y_max"] - c["y_min"], c["x_max"] - c["x_min"], 3)
