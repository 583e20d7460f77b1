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


@pytest.mark.compileheavy
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


def test_anyup_and_jafar_shapes():
    """AnyUp/JAFAR attention upsamplers emit requested resolution, preserve
    channel count, and the AnyUp window mask localizes attention."""
    from yolo_dbl_tpu.nn.upsample import AnyUp, AnyUpPack, JAFAR
    from yolo_dbl_tpu.nn.upsample.attn_up import window_attention_bias

    img = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 48))
    m = AnyUp(input_dim=3, qk_dim=64)
    v = m.init(jax.random.PRNGKey(2), img, feats, (32, 32))
    y = m.apply(v, img, feats, (32, 32))
    assert y.shape == (1, 32, 32, 48) and bool(jnp.isfinite(y).all())
    # attention mixes raw values -> rows are convex combos (bounded by extremes)
    assert float(y.max()) <= float(feats.max()) + 1e-5
    assert float(y.min()) >= float(feats.min()) - 1e-5

    j = JAFAR(input_dim=3, qk_dim=64, v_dim=48)
    vj = j.init(jax.random.PRNGKey(3), img, feats, (16, 16))
    yj = j.apply(vj, img, feats, (16, 16))
    assert yj.shape == (1, 16, 16, 48) and bool(jnp.isfinite(yj).all())

    p = AnyUpPack(in_channels=48, qk_dim=64)
    vp = p.init(jax.random.PRNGKey(4), feats)
    assert p.apply(vp, feats).shape == feats.shape

    bias = window_attention_bias(16, 16, 8, 8, 0.1)
    assert bias.shape == (256, 64)
    # corner query only attends near the corner of the low-res grid
    row0 = np.asarray(bias[0]).reshape(8, 8)
    assert np.isfinite(row0[0, 0]) and not np.isfinite(row0[7, 7])


@pytest.mark.compileheavy
def test_loftup_and_dlupack():
    """LoftUp: image-res output; DLUPack: x2 CARAFE with deformable kernels
    (zero-init offsets -> output within the input value range)."""
    from yolo_dbl_tpu.nn.upsample import DLUPack, LoftUp

    img = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 24, 3))
    lr = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 6, 32))
    m = LoftUp(dim=32, n_freqs=8)
    v = m.init(jax.random.PRNGKey(2), lr, img)
    y = m.apply(v, lr, img)
    assert y.shape == (1, 24, 24, 32) and bool(jnp.isfinite(y).all())

    d = DLUPack(channels=32)
    vd = d.init(jax.random.PRNGKey(3), lr)
    yd = d.apply(vd, lr)
    assert yd.shape == (1, 12, 12, 32)
    # softmax kernels -> convex combination of the neighborhood
    assert float(yd.max()) <= float(lr.max()) + 1e-5
    assert float(yd.min()) >= float(lr.min()) - 1e-5


@pytest.mark.compileheavy
def test_fga_sfau_eqsr():
    """FGA (×2/×4), SFAU (guided fusion), EQSR (HAT SR) forward shapes."""
    from yolo_dbl_tpu.nn.upsample import EQSR, FGA, SFAU

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 32))
    f = FGA(dim=32, out_dim=16, upscale=2)
    v = f.init(jax.random.PRNGKey(1), x)
    y = f.apply(v, x)
    assert y.shape == (1, 16, 16, 16) and bool(jnp.isfinite(y).all())
    f4 = FGA(dim=32, out_dim=16, upscale=4)
    v4 = f4.init(jax.random.PRNGKey(2), x)
    assert f4.apply(v4, x).shape == (1, 32, 32, 16)

    ms = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    pan = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 1))
    sf = SFAU(y_channels=1, x_channels=4)
    vs = sf.init(jax.random.PRNGKey(5), ms, pan)
    fin, sapa, enc = sf.apply(vs, ms, pan)
    assert fin.shape == sapa.shape == enc.shape == (1, 16, 16, 4)
    # softmaxed local attention -> bounded by value extremes
    assert float(sapa.max()) <= float(ms.max()) + 1e-4

    img = jax.random.uniform(jax.random.PRNGKey(6), (1, 16, 16, 3))
    e = EQSR(embed_dim=48, depths=(2,), num_heads=(4,), window_size=8,
             upscale=2, num_feat=32)
    ve = e.init(jax.random.PRNGKey(7), img)
    ye = e.apply(ve, img)
    assert ye.shape == (1, 32, 32, 3) and bool(jnp.isfinite(ye).all())


def test_carafe_pack_shapes():
    """CARAFEPack (reference CARAFE_official.py:260): 2x content-aware
    reassembly keeps channels, doubles spatial dims; kernels are softmax-
    normalized per group."""
    from yolo_dbl_tpu.nn.upsample import CARAFEPack

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    m = CARAFEPack(16, scale_factor=2, up_kernel=5, compressed_channels=8)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 16, 16, 16)
    assert np.isfinite(np.asarray(out)).all()
    # softmax-normalized kernels: constant input stays constant in the
    # interior (borders see the unfold's zero padding, as in the CUDA op)
    xc = jnp.ones((1, 8, 8, 16))
    oc = np.asarray(m.apply(v, xc))
    np.testing.assert_allclose(oc[:, 4:-4, 4:-4], 1.0, rtol=1e-5)


def test_resblock_cbam_shapes():
    from yolo_dbl_tpu.nn.upsample import ResBlock_CBAM

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 16))
    m = ResBlock_CBAM(16, 16)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (2, 8, 8, 16)
    # stride-2 + expansion variant projects the residual
    m2 = ResBlock_CBAM(16, 16, stride=2, downsampling=True, expansion=2)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    out2 = m2.apply(v2, x)
    assert out2.shape == (2, 4, 4, 32)


def test_onehot_chunk_unroll_matches_map(monkeypatch):
    """The unrolled one-hot chunk loop (inference default on TPU) is the
    same math as the lax.map path — chunk boundaries must not change
    results. Force multi-chunk by shrinking the chunk budget."""
    from yolo_dbl_tpu.ops import resample as R

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 6, 5))
    gy = jax.random.uniform(jax.random.PRNGKey(1), (8, 9, 9), minval=-1.0, maxval=6.0)
    gx = jax.random.uniform(jax.random.PRNGKey(2), (8, 9, 9), minval=-1.0, maxval=6.0)
    per_image = 81 * 36 * 4
    for pad in ("border", "zeros"):
        unchunked = R._sample_bilinear_onehot(x, gy, gx, pad)  # ch==b fast path
        monkeypatch.setattr(R, "_ONEHOT_CHUNK_BYTES", per_image * 2)  # ch=2, 4 chunks
        chunked_map = R._sample_bilinear_onehot(x, gy, gx, pad, prefer_unroll=False)
        chunked_unroll = R._sample_bilinear_onehot(x, gy, gx, pad, prefer_unroll=True)
        monkeypatch.setattr(R, "_ONEHOT_CHUNK_BYTES", 256 * 1024 * 1024)
        np.testing.assert_allclose(np.asarray(chunked_map), np.asarray(chunked_unroll),
                                   rtol=0, atol=0)
        np.testing.assert_allclose(np.asarray(chunked_unroll), np.asarray(unchunked),
                                   rtol=1e-5, atol=1e-5)
