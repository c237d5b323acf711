"""VGG19 perceptual-feature importer parity vs the reference Vgg19.

torchvision is absent from this image, so the oracle builds
`vgg19.features` as a plain torch nn.Sequential (the exact torchvision
layer plan, random weights) and patches it into the REFERENCE's Vgg19
wrapper (LFAE/modules/model.py:19-60) — exercising the reference's own
slice boundaries and ImageNet normalization against our
`convert_torchvision_vgg19` + `Vgg19Features`.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from tests.conftest import add_reference_to_path

add_reference_to_path()

from LFAE.modules import model as ref_model  # noqa: E402

from cvpr23_lfdm_tpu.train.vgg import (  # noqa: E402
    Vgg19Features, convert_torchvision_vgg19,
)

# torchvision vgg19().features layer plan, indices 0..29 (all our slices use)
_TV_PLAN = [
    ("conv", 3, 64), ("relu",), ("conv", 64, 64), ("relu",), ("pool",),
    ("conv", 64, 128), ("relu",), ("conv", 128, 128), ("relu",), ("pool",),
    ("conv", 128, 256), ("relu",), ("conv", 256, 256), ("relu",),
    ("conv", 256, 256), ("relu",), ("conv", 256, 256), ("relu",), ("pool",),
    ("conv", 256, 512), ("relu",), ("conv", 512, 512), ("relu",),
    ("conv", 512, 512), ("relu",), ("conv", 512, 512), ("relu",), ("pool",),
    ("conv", 512, 512), ("relu",),
]


def _build_tv_features() -> torch.nn.Sequential:
    torch.manual_seed(42)
    layers = []
    for item in _TV_PLAN:
        if item[0] == "conv":
            layers.append(torch.nn.Conv2d(item[1], item[2], 3, padding=1))
        elif item[0] == "relu":
            layers.append(torch.nn.ReLU(inplace=False))
        else:
            layers.append(torch.nn.MaxPool2d(2, 2))
    return torch.nn.Sequential(*layers)


def test_vgg19_importer_parity(monkeypatch):
    features = _build_tv_features()

    class _FakeVgg:
        pass

    fake = _FakeVgg()
    fake.features = features
    # reference does `models.vgg19(pretrained=True).features` (model.py:26)
    monkeypatch.setattr(ref_model.models, "vgg19", lambda **kw: fake)
    ref = ref_model.Vgg19(requires_grad=False)
    ref.eval()

    rng = np.random.RandomState(0)
    x = rng.rand(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    variables = jax.tree.map(
        jnp.asarray,
        convert_torchvision_vgg19(
            {k: v for k, v in features.state_dict().items()}
        ),
    )
    ours = Vgg19Features().apply(variables, jnp.asarray(x))

    assert len(ours) == len(theirs) == 5
    for si, (a, b) in enumerate(zip(ours, theirs)):
        b = np.transpose(b.numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(
            np.asarray(a), b, atol=1e-5, err_msg=f"slice {si + 1}"
        )
