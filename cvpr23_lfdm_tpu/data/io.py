"""Host-side image IO and the reference's aspect-preserving pad-resize.

Reference: misc.py:96-110 (`resize`) — scale so the LONG side equals
`desired_size` (aspect preserved), then zero-pad the short side centered.
Used identically by the LFAE pair datasets (LFAE/mug_dataset.py:14-28)
and the DM video datasets (DM/datasets_mug.py:108).
"""

from __future__ import annotations

import os

import numpy as np


def pad_resize(im: np.ndarray, desired_size: int, interpolation: str = "area") -> np.ndarray:
    """cv2-based aspect-pad resize (misc.py:96-110). `im`: [H, W, C]."""
    import cv2

    inter = {
        "area": cv2.INTER_AREA,
        "linear": cv2.INTER_LINEAR,
        "nearest": cv2.INTER_NEAREST,
    }[interpolation]
    old_size = im.shape[:2]
    ratio = float(desired_size) / max(old_size)
    new_size = tuple(int(x * ratio) for x in old_size)
    im = cv2.resize(im, (new_size[1], new_size[0]), interpolation=inter)
    delta_w = desired_size - new_size[1]
    delta_h = desired_size - new_size[0]
    top, bottom = delta_h // 2, delta_h - (delta_h // 2)
    left, right = delta_w // 2, delta_w - (delta_w // 2)
    return cv2.copyMakeBorder(
        im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=[0, 0, 0]
    )


def read_image(path: str) -> np.ndarray:
    """Read an image file to uint8 [H, W, 3] RGB.

    cv2 first: it releases the GIL during decode, so the loader's thread
    pool actually scales (imageio/PIL serializes); imageio fallback for
    formats cv2 can't read."""
    import cv2

    # IGNORE_ORIENTATION: the reference's imageio.imread does NOT apply
    # EXIF rotation (DM/datasets_mug.py:90) — keep raw-pixel parity
    img = cv2.imread(path, cv2.IMREAD_COLOR | cv2.IMREAD_IGNORE_ORIENTATION)
    if img is not None:
        return np.ascontiguousarray(img[:, :, ::-1])
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path))
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[-1] == 4:
        img = img[..., :3]
    return img


def list_frames(video_dir: str) -> list[str]:
    """Sorted jpg/png frame paths of a frame-folder video
    (DM/datasets_mug.py:60-63)."""
    names = sorted(
        x for x in os.listdir(video_dir) if x.endswith(("jpg", "png", "jpeg"))
    )
    return [os.path.join(video_dir, n) for n in names]
