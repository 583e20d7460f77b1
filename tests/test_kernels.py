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


@pytest.mark.parametrize("in_hw,out_hw", [((100, 160), (128, 128)), ((64, 64), (96, 96)), ((200, 100), (160, 160))])
def test_letterbox_onehot_matches_xla(in_hw, out_hw):
    """Separable one-hot-matmul letterbox == the XLA twin (same half-pixel
    bilinear, same pad geometry)."""
    from yolo_dbl_tpu.kernels.preprocess import letterbox_normalize_onehot

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (2, *in_hw, 3), dtype=np.uint8)
    ref = np.asarray(letterbox_normalize_xla(jnp.asarray(img), out_hw))
    out = np.asarray(letterbox_normalize_onehot(jnp.asarray(img), out_hw))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_letterbox_geometry_properties():
    img = np.full((1, 50, 100, 3), 255, np.uint8)  # wide white image
    out = np.asarray(letterbox_normalize(jnp.asarray(img), (100, 100), interpret=True))
    # 2:1 aspect: content occupies central 50 rows, padding above/below
    assert np.allclose(out[0, 0, :, :], 114 / 255, atol=1e-6)  # top pad
    assert np.allclose(out[0, 50, :, :], 1.0, atol=1e-6)  # content row


@pytest.mark.parametrize("in_hw,out_hw", [((100, 160), (128, 128)), ((480, 640), (320, 320))])
def test_letterbox_kernel_matches_host_letterbox(in_hw, out_hw):
    """Device path parity with the host cv2 letterbox the predictor used to
    run (data/augment.py:letterbox, scaleup=False): same geometry, bilinear
    resize within u8-rounding tolerance (cv2 rounds to uint8, we stay float)."""
    from yolo_dbl_tpu.data.augment import letterbox

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (*in_hw, 3), dtype=np.uint8)
    host, gain, pad = letterbox(img, out_hw, scaleup=False)
    dev = np.asarray(letterbox_normalize(
        jnp.asarray(img[None]), out_hw, scaleup=False, interpret=True))[0]
    assert host.shape[:2] == dev.shape[:2]
    diff = np.abs(host.astype(np.float32) / 255.0 - dev)
    # interior bilinear parity: ≤1 u8 step; allow a tiny outlier tail from
    # cv2's fixed-point arithmetic
    assert np.quantile(diff, 0.999) <= 1.5 / 255, float(diff.max())
    # geometry identical: pad region exactly 114/255 in both
    from yolo_dbl_tpu.kernels.preprocess import letterbox_geometry
    r, nh, nw, top, left = letterbox_geometry(*in_hw, *out_hw, scaleup=False)
    assert abs(r - gain) < 1e-9 and (left, top) == tuple(int(p) for p in pad)
    if top > 0:
        assert np.allclose(dev[:top], 114 / 255) and (host[:top] == 114).all()


def test_letterbox_scaleup_flag():
    img = np.full((1, 32, 32, 3), 200, np.uint8)
    up = np.asarray(letterbox_normalize(jnp.asarray(img), (64, 64), scaleup=True, interpret=True))
    noup = np.asarray(letterbox_normalize(jnp.asarray(img), (64, 64), scaleup=False, interpret=True))
    assert np.allclose(up, 200 / 255, atol=1e-6)           # fills the canvas
    assert np.allclose(noup[0, 0, 0], 114 / 255, atol=1e-6)  # padded border
    assert np.allclose(noup[0, 32, 32], 200 / 255, atol=1e-6)  # centered content


# ---------------------------------------------------------------- sampling

def _rand_coords(rng, b, n, h, w):
    """Coords spanning in-bounds, border and out-of-bounds regions."""
    gy = rng.uniform(-1.5, h + 0.5, (b, n)).astype(np.float32)
    gx = rng.uniform(-1.5, w + 0.5, (b, n)).astype(np.float32)
    return gy, gx


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_sampling_kernel_matches_gather(padding_mode):
    """Pallas separable sampler == gather path == one-hot path."""
    from yolo_dbl_tpu.kernels.sampling import sample_bilinear_separable
    from yolo_dbl_tpu.ops.resample import sample_bilinear_pixel, _sample_bilinear_onehot

    rng = np.random.default_rng(0)
    b, h, w, c = 3, 12, 9, 5
    n = 50
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    gy, gx = _rand_coords(rng, b, n, h, w)
    ref = np.asarray(sample_bilinear_pixel(x, jnp.asarray(gy), jnp.asarray(gx),
                                           padding_mode, prefer_onehot=False))
    oh = np.asarray(_sample_bilinear_onehot(x, jnp.asarray(gy), jnp.asarray(gx), padding_mode))
    out = np.asarray(sample_bilinear_separable(x, jnp.asarray(gy), jnp.asarray(gx),
                                               padding_mode, True))
    np.testing.assert_allclose(oh, ref, atol=1e-5)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sampling_kernel_padded_tile():
    """N not a multiple of the tile: padded rows must not leak."""
    from yolo_dbl_tpu.kernels.sampling import sample_bilinear_separable, _TILE_N
    from yolo_dbl_tpu.ops.resample import sample_bilinear_pixel

    rng = np.random.default_rng(1)
    b, h, w, c = 2, 8, 8, 4
    n = _TILE_N + 7  # forces one full + one ragged tile
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    gy, gx = _rand_coords(rng, b, n, h, w)
    ref = np.asarray(sample_bilinear_pixel(x, jnp.asarray(gy), jnp.asarray(gx),
                                           "border", prefer_onehot=False))
    out = np.asarray(sample_bilinear_separable(x, jnp.asarray(gy), jnp.asarray(gx),
                                               "border", True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sampling_kernel_grad_matches_onehot():
    """custom_vjp backward == autodiff through the one-hot formulation."""
    from yolo_dbl_tpu.kernels.sampling import sample_bilinear_separable
    from yolo_dbl_tpu.ops.resample import _sample_bilinear_onehot

    rng = np.random.default_rng(2)
    b, h, w, c, n = 2, 6, 6, 3, 20
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    gy, gx = map(jnp.asarray, _rand_coords(rng, b, n, h, w))

    def loss_pallas(x, gy, gx):
        return (sample_bilinear_separable(x, gy, gx, "border", True) ** 2).sum()

    def loss_ref(x, gy, gx):
        return (_sample_bilinear_onehot(x, gy, gx, "border") ** 2).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gy, gx)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gy, gx)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)
