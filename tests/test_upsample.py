"""Shape/property tests for the upsampler pool (reference test.py catalogue)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.nn import upsample as U
from yolo_dbl_tpu.nn.blocks import DySample
from yolo_dbl_tpu.ops.resample import bilinear_upsample

C = 32
X = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, C))


def _run(module, x=X):
    v = module.init(jax.random.PRNGKey(1), x)
    return np.asarray(module.apply(v, x))


UP2X = [
    U.CARAFE(C),
    U.CARAFE_XiaLiPKU(C),
    U.CARAFE_simplified(C),
    U.DLU(C),
    U.EUCB(C),
    U.MEUM(C),
    DySample(C),
]


@pytest.mark.parametrize("module", UP2X, ids=lambda m: type(m).__name__)
def test_upsamplers_double_resolution(module):
    out = _run(module)
    assert out.shape == (2, 16, 16, C)
    assert np.isfinite(out).all()


SAME_RES = [U.SCAM(C), U.CAA(C), U.Multibranch(C), U.FEM(C, C), U.C3k2_EFE(C, n=1)]


@pytest.mark.parametrize("module", SAME_RES, ids=lambda m: type(m).__name__)
def test_same_resolution_modules(module):
    out = _run(module)
    assert out.shape == X.shape
    assert np.isfinite(out).all()


def test_spdconv_halves_resolution():
    out = _run(U.SPDConv(C, 2 * C))
    assert out.shape == (2, 4, 4, 2 * C)


def test_ffm_concat():
    m2 = U.FFM_Concat2(1, C, C)
    v = m2.init(jax.random.PRNGKey(0), [X, X])
    out = m2.apply(v, [X, X])
    assert out.shape == (2, 8, 8, 2 * C)
    m3 = U.FFM_Concat3(1, C, C, C)
    v = m3.init(jax.random.PRNGKey(0), [X, X, X])
    out = m3.apply(v, [X, X, X])
    assert out.shape == (2, 8, 8, 3 * C)
    # at init all weights are 1 → normalized weight per channel = 1/(3C)
    np.testing.assert_allclose(np.asarray(out[..., :C]), np.asarray(X) / (3 * C), rtol=1e-3)


def test_carafe_uniform_kernel_equals_nearest_for_flat_input():
    """With a constant input, any normalized reassembly must reproduce it
    away from the zero-padded border (k_up//2*scale = 4 hi-res pixels)."""
    x = jnp.full((1, 8, 8, 8), 3.14)
    m = U.CARAFE_XiaLiPKU(8)
    v = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(v, x))
    assert out.shape == (1, 16, 16, 8)
    np.testing.assert_allclose(out[:, 4:12, 4:12], 3.14, atol=1e-4)


def test_bilinear_upsample_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    for ac in (True, False):
        ours = np.asarray(bilinear_upsample(jnp.asarray(x), 2, align_corners=ac))
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2, mode="bilinear", align_corners=ac
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5, err_msg=f"align_corners={ac}")


def test_unfold_matches_torch():
    torch = pytest.importorskip("torch")
    from yolo_dbl_tpu.nn.upsample.carafe import _unfold_patches

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, 4)).astype(np.float32)
    for k, d in [(3, 1), (5, 2)]:
        ours = np.asarray(_unfold_patches(jnp.asarray(x), k, d))  # (B,H,W,C,k²)
        ref = torch.nn.functional.unfold(
            torch.from_numpy(x).permute(0, 3, 1, 2), kernel_size=k, dilation=d, padding=(k // 2) * d
        )  # (B, C*k², H*W)
        ref = ref.reshape(2, 4, k * k, 6, 6).permute(0, 3, 4, 1, 2).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6, err_msg=f"k={k} d={d}")


def test_fade_and_sapa_dual_input():
    from yolo_dbl_tpu.nn.upsample import FADE, FADELite, SAPA

    en = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, C))
    de = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, C))
    for cls in (FADE, FADELite):
        m = cls(C)
        v = m.init(jax.random.PRNGKey(2), [en, de])
        out = m.apply(v, [en, de])
        assert out.shape == (1, 16, 16, C), cls.__name__
        assert np.isfinite(np.asarray(out)).all()
    m = SAPA(C)
    v = m.init(jax.random.PRNGKey(2), [en, de])
    out = m.apply(v, [en, de])
    assert out.shape == (1, 16, 16, C)


def test_sapa_uniform_attention_averages():
    """With zero q/k embeddings, SAPA attention is uniform → output is the
    patch mean of the lo-res input (away from zero-padded borders)."""
    from yolo_dbl_tpu.nn.upsample import SAPA

    x = jnp.full((1, 8, 8, 4), 2.0)
    y = jnp.zeros((1, 16, 16, 4))
    m = SAPA(4, embedding_dim=8)
    v = m.init(jax.random.PRNGKey(0), [y, x])
    out = np.asarray(m.apply(v, [y, x]))
    np.testing.assert_allclose(out[:, 6:10, 6:10], 2.0, atol=1e-4)


def test_batch3_modules():
    from yolo_dbl_tpu.nn.upsample import C3k2_EAMC, CARAFEplusplus, LDA_AQU, M2C2f

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, C))
    for m, expect in [
        (M2C2f(C, n=1, use_attn=True), (1, 8, 8, C)),
        (C3k2_EAMC(C, n=1), (1, 8, 8, C)),
        (CARAFEplusplus(C, up_down_type="up"), (1, 16, 16, C)),
        (CARAFEplusplus(C, up_down_type="down"), (1, 4, 4, C)),
        (LDA_AQU(C), (1, 16, 16, C)),
    ]:
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        assert out.shape == expect, type(m).__name__
        assert np.isfinite(np.asarray(out)).all(), type(m).__name__


def test_haar_wavelet_roundtrip():
    from yolo_dbl_tpu.nn.upsample.pig import inverse_wavelet_transform, wavelet_transform

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    sub = wavelet_transform(x)
    assert sub.shape == (2, 4, 4, 3, 4)
    rec = inverse_wavelet_transform(sub)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)
    # LL subband of a constant image is 2x the constant (orthonormal Haar), others 0
    const = jnp.full((1, 4, 4, 1), 3.0)
    s = wavelet_transform(const)
    np.testing.assert_allclose(np.asarray(s[..., 0]), 6.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s[..., 1:]), 0.0, atol=1e-5)


def test_pig_family():
    from yolo_dbl_tpu.nn.upsample.pig import C2f_PIG, C2f_WT, InceptionDWConv2d, WTConv2d

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, C))
    for m in [WTConv2d(C), InceptionDWConv2d(C), C2f_PIG(C, n=1), C2f_WT(C, n=1)]:
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        assert out.shape == x.shape, type(m).__name__
        assert np.isfinite(np.asarray(out)).all(), type(m).__name__
