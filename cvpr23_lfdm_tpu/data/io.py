"""Host-side image IO and the reference's aspect-preserving pad-resize.

Reference: misc.py:96-110 (`resize`) — scale so the LONG side equals
`desired_size` (aspect preserved), then zero-pad the short side centered.
Used identically by the LFAE pair datasets (LFAE/mug_dataset.py:14-28)
and the DM video datasets (DM/datasets_mug.py:108).
"""

from __future__ import annotations

import os
import threading
from collections import OrderedDict

import numpy as np

# ---------------------------------------------------------------- cache
#
# Process-wide LRU of decoded frames. Training visits every frame of a
# video corpus once per epoch and PNG/JPEG decode dominates host time on
# small machines (measured: the DM trainer at MUG scale is ~10x slower
# than its TPU step when 160 frames/step decode on one core). The loader
# is a THREAD pool (loader.py), so one shared cache serves all workers.
# Budget via LFDM_IMAGE_CACHE_MB (default 2048; 0 disables). Cached
# arrays are marked read-only — every consumer copies (stack/resize/
# astype) before writing.

_CACHE_LOCK = threading.Lock()
_IMAGE_CACHE: "OrderedDict[str, np.ndarray]" = OrderedDict()
_IMAGE_CACHE_BYTES = 0


def _cache_limit_bytes() -> int:
    return int(float(os.environ.get("LFDM_IMAGE_CACHE_MB", "2048")) * 2**20)


def clear_image_cache() -> None:
    global _IMAGE_CACHE_BYTES
    with _CACHE_LOCK:
        _IMAGE_CACHE.clear()
        _IMAGE_CACHE_BYTES = 0


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
    """Read an image file to uint8 [H, W, 3] RGB, LRU-cached decoded.

    cv2 first: it releases the GIL during decode, so the loader's thread
    pool actually scales (imageio/PIL serializes); imageio fallback for
    formats cv2 can't read. Returned cached arrays are READ-ONLY views —
    copy before writing (all in-tree consumers already do)."""
    global _IMAGE_CACHE_BYTES

    limit = _cache_limit_bytes()
    if limit > 0:
        with _CACHE_LOCK:
            img = _IMAGE_CACHE.get(path)
            if img is not None:
                _IMAGE_CACHE.move_to_end(path)
                return img
    img = _read_image_uncached(path)
    if limit > 0 and img.nbytes <= limit:
        img.flags.writeable = False
        with _CACHE_LOCK:
            if path not in _IMAGE_CACHE:
                _IMAGE_CACHE[path] = img
                _IMAGE_CACHE_BYTES += img.nbytes
                while _IMAGE_CACHE_BYTES > limit:
                    _, old = _IMAGE_CACHE.popitem(last=False)
                    _IMAGE_CACHE_BYTES -= old.nbytes
    return img


def _read_image_uncached(path: str) -> np.ndarray:
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
