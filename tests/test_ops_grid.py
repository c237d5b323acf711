"""Golden tests: coordinate grids + gaussian rasterization vs reference torch."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests.conftest import add_reference_to_path
from cvpr23_lfdm_tpu.ops import make_coordinate_grid, region2gaussian

add_reference_to_path()
from LFAE.modules import util as ref_util  # noqa: E402


@pytest.mark.parametrize("hw", [(32, 32), (26, 26), (7, 13)])
def test_make_coordinate_grid_matches_reference(hw):
    ours = np.asarray(make_coordinate_grid(hw))
    theirs = ref_util.make_coordinate_grid(hw, torch.float32).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_grid_orientation():
    g = np.asarray(make_coordinate_grid((4, 8)))
    # last axis is (x, y); x varies along W, y along H; corners at +-1
    assert g[0, 0, 0] == -1 and g[0, -1, 0] == 1
    assert g[0, 0, 1] == -1 and g[-1, 0, 1] == 1
    assert np.all(g[0, :, 1] == -1)  # y constant along a row


@pytest.mark.parametrize("scalar_covar", [True, False])
def test_region2gaussian_matches_reference(scalar_covar):
    rng = np.random.RandomState(0)
    b, k = 2, 5
    center = rng.uniform(-0.8, 0.8, size=(b, k, 2)).astype(np.float32)
    if scalar_covar:
        covar = 0.01
        covar_t = 0.01
    else:
        m = rng.randn(b, k, 2, 2).astype(np.float32)
        covar = (m @ m.transpose(0, 1, 3, 2) + 0.05 * np.eye(2, dtype=np.float32))
        covar_t = torch.from_numpy(covar)
    ours = np.asarray(region2gaussian(jnp.asarray(center), covar if scalar_covar else jnp.asarray(covar), (16, 16)))
    theirs = ref_util.region2gaussian(torch.from_numpy(center), covar_t, (16, 16)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)
