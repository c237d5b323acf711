"""Helpers for golden tests against the torch reference in /root/reference.

The reference is imported read-only as an *oracle*; weights are randomly
initialized in torch, exported, converted with
`cvpr23_lfdm_tpu.utils.torch_convert`, and both frameworks are run on the
same inputs.

`aligned_svd` replaces the reference's LAPACK SVD with a numpy closed-form
eigendecomposition using THIS framework's deterministic sign convention
(largest-|.| component non-negative). The SVD column signs are the one
genuinely arbitrary choice in the whole pipeline (see
cvpr23_lfdm_tpu/ops/eig2x2.py docstring); pinning the oracle to our
convention lets every other numeric path be compared exactly.
"""

from __future__ import annotations

import numpy as np
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()


def install_dm_stubs():
    """Make reference DM modules importable on this image.

    Missing deps get minimal functional stands-in implementing the public
    semantics the reference relies on:
    * `einops_exts.rearrange_many` — mapped `einops.rearrange`.
    * `rotary_embedding_torch.RotaryEmbedding` — interleaved rotary
      (lucidrains convention: pairwise (-x2, x1), theta 10000).
    * `torchvision.transforms` — only referenced by gif helpers; inert stub.
    Also no-ops `.cuda()` since the reference hard-codes it.
    """
    import sys
    import types

    import torch as _torch
    from einops import rearrange as _rearrange

    if "einops_exts" not in sys.modules:
        ee = types.ModuleType("einops_exts")
        ee.rearrange_many = lambda xs, *a, **k: [_rearrange(x, *a, **k) for x in xs]
        sys.modules["einops_exts"] = ee

    if "rotary_embedding_torch" not in sys.modules:
        ret = types.ModuleType("rotary_embedding_torch")

        class RotaryEmbedding:
            def __init__(self, dim, theta=10000):
                self.freqs = 1.0 / (
                    theta ** (_torch.arange(0, dim, 2).float() / dim)
                )

            def rotate_queries_or_keys(self, t):
                n = t.shape[-2]
                angles = _torch.outer(_torch.arange(n).float(), self.freqs)
                f = _torch.repeat_interleave(angles, 2, dim=-1)

                def rot_half(x):
                    x2 = x.reshape(*x.shape[:-1], -1, 2)
                    a, b = x2.unbind(-1)
                    return _torch.stack((-b, a), dim=-1).reshape(x.shape)

                return t * f.cos() + rot_half(t) * f.sin()

        ret.RotaryEmbedding = RotaryEmbedding
        sys.modules["rotary_embedding_torch"] = ret

    # torchvision stub is owned by tests/conftest.py::_install_reference_stubs
    # (registered before any reference import)

    if "tqdm" not in sys.modules:
        tq = types.ModuleType("tqdm")
        tq.tqdm = lambda it, *a, **k: it
        sys.modules["tqdm"] = tq

    # CPU-only image: the reference hard-codes .cuda() on tensors and
    # whole modules (video_flow_diffusion_model.py:38-56)
    _torch.Tensor.cuda = lambda self, *a, **k: self
    _torch.nn.Module.cuda = lambda self, *a, **k: self


def numpy_eigh_2x2_aligned(c: np.ndarray):
    """Numpy mirror of cvpr23_lfdm_tpu.ops.eig2x2.eigh_2x2 (same convention)."""
    a = c[..., 0, 0]
    b = 0.5 * (c[..., 0, 1] + c[..., 1, 0])
    d = c[..., 1, 1]
    half_tr = 0.5 * (a + d)
    rad = np.sqrt(np.maximum(0.25 * (a - d) ** 2 + b * b, 0.0))
    s1, s2 = half_tr + rad, half_tr - rad
    v1a = np.stack([b, s1 - a], -1)
    v1b = np.stack([s1 - d, b], -1)
    n1a = (v1a**2).sum(-1, keepdims=True)
    n1b = (v1b**2).sum(-1, keepdims=True)
    v1 = np.where(n1a >= n1b, v1a, v1b)
    norm = np.sqrt((v1**2).sum(-1, keepdims=True))
    e1 = np.zeros_like(v1)
    e1[..., 0] = 1.0
    v1 = np.where(norm > 1e-12, v1 / np.maximum(norm, 1e-12), e1)
    lead = np.where(np.abs(v1[..., 0]) >= np.abs(v1[..., 1]), v1[..., 0], v1[..., 1])
    v1 = v1 * np.where(lead < 0, -1.0, 1.0)[..., None]
    v2 = np.stack([-v1[..., 1], v1[..., 0]], -1)
    lead2 = np.where(np.abs(v2[..., 0]) >= np.abs(v2[..., 1]), v2[..., 0], v2[..., 1])
    v2 = v2 * np.where(lead2 < 0, -1.0, 1.0)[..., None]
    u = np.stack([v1, v2], -1)
    s = np.stack([s1, s2], -1)
    return u.astype(c.dtype), s.astype(c.dtype)


def aligned_svd(covar: torch.Tensor, fast: bool = False):
    """Drop-in for LFAE.modules.region_predictor.svd with our sign convention."""
    c = covar.detach().cpu().numpy()
    u, s = numpy_eigh_2x2_aligned(c)
    ut = torch.from_numpy(u).to(covar.dtype)
    st = torch.from_numpy(s).to(covar.dtype)
    return ut, st, ut  # symmetric PSD: V == U


def sd_numpy(module: torch.nn.Module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))
