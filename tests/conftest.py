"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding code is tested on CPU via
`--xla_force_host_platform_device_count=8` — the JAX-native substitute for a
TPU pod (SURVEY.md §4). Must run before jax initializes its backends.
"""

import os
import sys

# Hard-set (the image exports JAX_PLATFORMS=axon and registers the axon
# PJRT plugin from sitecustomize, which routes everything to the tunneled
# TPU; unit tests must be fast, fp32, and 8-device). jax was already
# imported at interpreter boot, so env vars are too late — use the config
# API, which is honored until backends are initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

# Make the reference repo importable for golden-value tests. The reference
# modules import a few packages absent from this image; register tiny stubs
# so the modules load (tests that need the real math implement it locally).
REFERENCE_ROOT = "/root/reference"


def _install_reference_stubs():
    import types

    if "skimage" not in sys.modules:
        skimage = types.ModuleType("skimage")
        draw = types.ModuleType("skimage.draw")
        draw.disk = lambda *a, **k: (None, None)
        skimage.draw = draw
        sys.modules["skimage"] = skimage
        sys.modules["skimage.draw"] = draw
    if "torchvision" not in sys.modules:
        # reference LFAE/modules/model.py imports torchvision.models (VGG19)
        # and DM/modules/video_flow_diffusion.py imports .transforms (gif
        # helpers); neither is exercised by the parity tests
        tv = types.ModuleType("torchvision")
        models = types.ModuleType("torchvision.models")
        transforms = types.ModuleType("torchvision.transforms")

        def _unavailable(*a, **k):
            raise RuntimeError("torchvision stub: weights unavailable")

        models.vgg19 = _unavailable
        # the reference calls T.ToTensor() at import time (a default arg,
        # video_flow_diffusion.py:940) — must construct, never run
        transforms.ToTensor = type("ToTensor", (), {"__call__": _unavailable})
        transforms.ToPILImage = type("ToPILImage", (), {"__call__": _unavailable})
        tv.models = models
        tv.transforms = transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.transforms"] = transforms


def reference_importable() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


def add_reference_to_path():
    _install_reference_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
