"""Host-side clip augmentation in pure numpy.

Reference: LFAE/augmentation.py (torch_videovision transforms applied to a
clip = list of frames sharing one random draw) and the DM datasets' inline
color jitter (DM/datasets_mug.py:93-105). The torchvision `adjust_*`
semantics are reimplemented in float:

  brightness: img * f
  contrast:   f * img + (1 - f) * mean(gray(img))
  saturation: f * img + (1 - f) * gray(img)
  hue:        HSV hue rotated by f (f in [-0.5, 0.5])

All functions operate on float32 arrays in [0, 1] shaped [H, W, 3] (or a
clip [F, H, W, 3]); each takes an explicit `np.random.Generator`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

_GRAY = np.array([0.299, 0.587, 0.114], np.float32)  # ITU-R 601-2 (PIL "L")


def adjust_brightness(img: np.ndarray, f: float) -> np.ndarray:
    return np.clip(img * f, 0.0, 1.0)


def adjust_contrast(img: np.ndarray, f: float) -> np.ndarray:
    # per-frame mean gray: the reference jitters frames individually
    # (PIL images, DM/datasets_mug.py:102-105), so a clip [F, H, W, 3]
    # blends each frame against its own mean
    mean = (img @ _GRAY).mean(axis=(-2, -1), keepdims=True)[..., None]
    return np.clip(f * img + (1.0 - f) * mean, 0.0, 1.0)


def adjust_saturation(img: np.ndarray, f: float) -> np.ndarray:
    gray = (img @ _GRAY)[..., None]
    return np.clip(f * img + (1.0 - f) * gray, 0.0, 1.0)


def _rgb_to_hsv(img: np.ndarray):
    maxc = img.max(-1)
    minc = img.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    safe = np.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = np.where(r == maxc, bc - gc, np.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = np.where(delta > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = np.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = (i.astype(np.int32) % 6)[..., None]
    out = np.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
        [
            np.stack([v, t, p], -1), np.stack([q, v, p], -1),
            np.stack([p, v, t], -1), np.stack([p, q, v], -1),
            np.stack([t, p, v], -1), np.stack([v, p, q], -1),
        ],
    )
    return out


def adjust_hue(img: np.ndarray, f: float) -> np.ndarray:
    h, s, v = _rgb_to_hsv(img)
    h = (h + f) % 1.0
    return np.clip(_hsv_to_rgb(h, s, v), 0.0, 1.0).astype(np.float32)


def color_jitter_clip(
    rng: np.random.Generator,
    clip: np.ndarray,
    brightness: float,
    contrast: float,
    saturation: float,
    hue: float,
    shuffle_order: bool = True,
) -> np.ndarray:
    """One factor draw shared by every frame (augmentation.py:261-293,
    DM/datasets_mug.py:93-105). The LFAE path shuffles the op order
    (augmentation.py:282); the DM path uses fixed B,C,S,H order
    (`shuffle_order=False`)."""
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda x, f=f: adjust_brightness(x, f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda x, f=f: adjust_contrast(x, f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda x, f=f: adjust_saturation(x, f))
    if hue > 0:
        f = rng.uniform(-hue, hue)
        ops.append(lambda x, f=f: adjust_hue(x, f))
    if shuffle_order:
        order = rng.permutation(len(ops))
        ops = [ops[i] for i in order]
    out = clip
    for op in ops:
        out = op(out)
    return out.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ClipAugment:
    """Composed clip augmentation (augmentation.py:323-345). MUG/MHAD/NATOPS
    configs enable flips + jitter only (config/mug128.yaml:28-36)."""

    time_flip: bool = True
    horizontal_flip: bool = True
    brightness: float = 0.1
    contrast: float = 0.1
    saturation: float = 0.1
    hue: float = 0.1

    def __call__(self, rng: np.random.Generator, clip: np.ndarray) -> np.ndarray:
        """clip: [F, H, W, 3] float32 in [0, 1]."""
        # reference's if/elif: a time flip suppresses the horizontal check
        if self.time_flip and rng.random() < 0.5:
            clip = clip[::-1]
        elif self.horizontal_flip and rng.random() < 0.5:
            clip = clip[:, :, ::-1]
        if self.brightness or self.contrast or self.saturation or self.hue:
            clip = color_jitter_clip(
                rng, np.ascontiguousarray(clip),
                self.brightness, self.contrast, self.saturation, self.hue,
                shuffle_order=True,
            )
        return np.ascontiguousarray(clip)
