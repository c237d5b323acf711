"""Deterministic numpy state dicts + committed golden values for the
published-scale metric extractors (eval/i3d.py, eval/lpips.py).

Why: the extractors are parity-pinned against live-torch oracles built from
random state dicts (test_metrics.py), but with torch absent those tests
skip and a silent numerical regression would pass. The golden tests compare
against TINY COMMITTED ARRAYS (`tests/golden/metrics_golden.npz`) computed
from the same deterministic weights — torch-free regression detection
(round-3 verdict, weak #5).

The builders are numpy-only and draw in the exact order the round-3 torch
builders did, so the live-torch oracle tests reuse them (wrapping leaves in
torch.tensor) and stay value-identical to their round-3 form.

Regenerate (after an INTENDED extractor change, with the oracle tests
green): `python tests/metrics_fixtures.py`
"""

from __future__ import annotations

import os

import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "metrics_golden.npz")


# ------------------------------------------------------------------ I3D

def rand_unit3d_sd_np(rng, prefix, cin, cout, k, bn=True, bias=False) -> dict:
    """Random pytorch_i3d-layout params (numpy) for one Unit3D."""
    sd = {
        f"{prefix}.conv3d.weight": (
            rng.standard_normal((cout, cin, k, k, k)).astype("float32") * 0.1
        )
    }
    if bias:
        sd[f"{prefix}.conv3d.bias"] = rng.standard_normal(cout).astype("float32")
    if bn:
        sd[f"{prefix}.bn.weight"] = (
            1.0 + 0.1 * rng.standard_normal(cout).astype("float32")
        )
        sd[f"{prefix}.bn.bias"] = 0.1 * rng.standard_normal(cout).astype("float32")
        sd[f"{prefix}.bn.running_mean"] = (
            0.1 * rng.standard_normal(cout).astype("float32")
        )
        sd[f"{prefix}.bn.running_var"] = (1.0 + 0.1 * rng.random(cout)).astype(
            "float32"
        )
    return sd


def i3d_random_sd_np(seed: int = 0, rng=None) -> dict:
    """Full pytorch_i3d-layout random state dict (numpy leaves). Pass `rng`
    to continue an existing stream (the torch oracle test draws its probe
    video from the same stream, value-identical to the round-3 builder)."""
    from cvpr23_lfdm_tpu.eval.i3d import _MIXED

    if rng is None:
        rng = np.random.default_rng(seed)
    sd = {}
    sd.update(rand_unit3d_sd_np(rng, "Conv3d_1a_7x7", 3, 64, 7))
    sd.update(rand_unit3d_sd_np(rng, "Conv3d_2b_1x1", 64, 64, 1))
    sd.update(rand_unit3d_sd_np(rng, "Conv3d_2c_3x3", 64, 192, 3))
    cin = 192
    for name, c in _MIXED:
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b0", cin, c[0], 1))
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b1a", cin, c[1], 1))
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b1b", c[1], c[2], 3))
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b2a", cin, c[3], 1))
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b2b", c[3], c[4], 3))
        sd.update(rand_unit3d_sd_np(rng, f"{name}.b3b", cin, c[5], 1))
        cin = c[0] + c[2] + c[4] + c[5]
    sd.update(rand_unit3d_sd_np(rng, "logits", cin, 400, 1, bn=False, bias=True))
    return sd


# ---------------------------------------------------------------- LPIPS

LPIPS_VGG_PLAN = {
    0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
    10: (128, 256), 12: (256, 256), 14: (256, 256),
    17: (256, 512), 19: (512, 512), 21: (512, 512),
    24: (512, 512), 26: (512, 512), 28: (512, 512),
}


def lpips_random_sds_np(seed: int = 2):
    """(vgg16 features sd, lin sd) with numpy leaves, plus the fixed input
    pair the round-3 oracle test used (same rng stream)."""
    from cvpr23_lfdm_tpu.eval.lpips import LPIPS_CHANNELS

    rng = np.random.default_rng(seed)
    feat_sd = {}
    for idx, (cin, cout) in LPIPS_VGG_PLAN.items():
        feat_sd[f"{idx}.weight"] = (
            rng.standard_normal((cout, cin, 3, 3)).astype("float32") * 0.05
        )
        feat_sd[f"{idx}.bias"] = 0.1 * rng.standard_normal(cout).astype("float32")
    lin_sd = {
        f"lin{i}.model.1.weight": rng.random((1, c, 1, 1)).astype("float32")
        for i, c in enumerate(LPIPS_CHANNELS)
    }
    a = rng.random((2, 32, 32, 3)).astype(np.float32)
    b = rng.random((2, 32, 32, 3)).astype(np.float32)
    return feat_sd, lin_sd, a, b


# --------------------------------------------------------------- golden

def golden_i3d_inputs():
    rng = np.random.default_rng(7)
    real = rng.random((4, 9, 32, 32, 3)).astype(np.float32)
    fake = (rng.random((4, 9, 32, 32, 3)).astype(np.float32)) ** 2
    return real, fake


def compute_golden() -> dict:
    """Run the shipped extractors on the deterministic weights/inputs."""
    import jax
    import jax.numpy as jnp

    from cvpr23_lfdm_tpu.eval.i3d import convert_i3d_checkpoint, i3d_extractor
    from cvpr23_lfdm_tpu.eval.lpips import (
        convert_lpips_lin, convert_vgg16_features, make_lpips,
    )
    from cvpr23_lfdm_tpu.eval.metrics import FVD

    i3d_vars = convert_i3d_checkpoint(i3d_random_sd_np())
    extract = i3d_extractor(i3d_vars, resize_to=None)
    real, fake = golden_i3d_inputs()
    feats_real = np.asarray(extract(real))
    fvd = FVD(extract)
    fvd_val = float(fvd(real, fake))

    feat_sd, lin_sd, a, b = lpips_random_sds_np()
    lpips_fn = make_lpips(
        convert_vgg16_features(feat_sd), convert_lpips_lin(lin_sd)
    )
    lpips_vals = np.asarray(lpips_fn(jnp.asarray(a), jnp.asarray(b)))
    del jax
    return {
        "i3d_feats_real": feats_real.astype(np.float32),
        "i3d_fvd": np.float64(fvd_val),
        "lpips_vals": lpips_vals.astype(np.float32),
    }


def main() -> None:
    golden = compute_golden()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    np.savez(GOLDEN_PATH, **golden)
    print(
        f"wrote {GOLDEN_PATH}: i3d feats {golden['i3d_feats_real'].shape} "
        f"fvd {float(golden['i3d_fvd']):.4f} lpips {golden['lpips_vals']}"
    )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # this image boots jax onto the tunneled TPU; golden values are
    # generated (and verified by tests) on the CPU backend
    import jax

    jax.config.update("jax_platforms", "cpu")
    main()
