"""Pallas kernel tests (interpret mode on CPU; real-TPU runs in bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_dbl_tpu.kernels.preprocess import letterbox_normalize, letterbox_normalize_xla


@pytest.mark.parametrize("in_hw,out_hw", [((100, 160), (128, 128)), ((64, 64), (96, 96)), ((200, 100), (160, 160))])
def test_letterbox_kernel_matches_xla(in_hw, out_hw):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, *in_hw, 3), dtype=np.uint8)
    ref = np.asarray(letterbox_normalize_xla(jnp.asarray(img), out_hw))
    out = np.asarray(letterbox_normalize(jnp.asarray(img), out_hw, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_letterbox_geometry_properties():
    img = np.full((1, 50, 100, 3), 255, np.uint8)  # wide white image
    out = np.asarray(letterbox_normalize(jnp.asarray(img), (100, 100), interpret=True))
    # 2:1 aspect: content occupies central 50 rows, padding above/below
    assert np.allclose(out[0, 0, :, :], 114 / 255, atol=1e-6)  # top pad
    assert np.allclose(out[0, 50, :, :], 1.0, atol=1e-6)  # content row
