"""Structures pool tests: shapes + YAML reachability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.nn import structures as S

C = 32
X = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, C))


def _run(module, x=X):
    v = module.init(jax.random.PRNGKey(1), x)
    return np.asarray(module.apply(v, x))


SAME_SHAPE = [
    S.PConv(C),
    S.FasterBlock(C),
    S.ScConv(C),
    S.MBConv(C, 1, 2.0, True),
    S.RepViTBlock(2 * C, C),
    S.UIB(C, 3, 3),
    S.GhostModuleV2(C, mode="attn"),
    S.GhostModuleV3(C),
    S.GhostBottleneckV2(2 * C, C),
    S.GhostBottleneckV3(C, 2 * C),
    S.SwinStage(C, C, depth=2, num_heads=4, window_size=4),
    S.APConvPinwheel(C, 3, 1),
]


@pytest.mark.parametrize("module", SAME_SHAPE, ids=lambda m: type(m).__name__)
def test_same_shape_structures(module):
    out = _run(module)
    assert out.shape == X.shape
    assert np.isfinite(out).all()


def test_mbconv_stride2():
    out = _run(S.MBConv(2 * C, 2, 4.0, True))
    assert out.shape == (2, 8, 8, 2 * C)


def test_patch_embed_and_merging():
    out = _run(S.PatchEmbed(embed_dim=48, patch_size=4))
    assert out.shape == (2, 4, 4, 48)
    out2 = _run(S.PatchMerging(C, 2 * C))
    assert out2.shape == (2, 8, 8, 2 * C)


def test_swin_odd_input():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 13, 11, C))
    m = S.SwinStage(C, C, depth=2, num_heads=4, window_size=4)
    v = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(v, x)
    assert out.shape == (1, 13, 11, C)


def test_extract_layer():
    m = S.ExtractLayer(1)
    v = m.init(jax.random.PRNGKey(0), [X, 2 * X])
    np.testing.assert_allclose(np.asarray(m.apply(v, [X, 2 * X])), 2 * np.asarray(X))


def test_structures_yaml_reachable():
    from yolo_dbl_tpu.nn.tasks import DetectionModel

    cfg = {
        "nc": 3,
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "FasterBlock", [16]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "ScConv", [32]],
            [-1, 1, "Conv", [64, 3, 2]],   # P3
            [-1, 1, "UIB", [64, 3, 3]],
            [-1, 1, "Conv", [128, 3, 2]],  # P4
            [-1, 1, "SwinStage", [128, 2, 4, 4]],
            [-1, 1, "Conv", [256, 3, 2]],  # P5
            [-1, 1, "RepViTBlock", [512, 256]],
        ],
        "head": [[[5, 7, 9], 1, "Detect", ["nc"]]],
    }
    m = DetectionModel(cfg, nc=3)
    v = jax.eval_shape(lambda: m.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    n = sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))
    assert n > 0
    assert m.strides == (8, 16, 32)


def test_giraffe_neck():
    from yolo_dbl_tpu.nn.structures import GiraffeNeckV2

    xs = [
        jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 32)),
        jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 64)),
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 128)),
    ]
    m = GiraffeNeckV2((32, 64, 128), (32, 64, 128), depth=1 / 3)
    v = m.init(jax.random.PRNGKey(3), xs)
    p3, p4, p5 = m.apply(v, xs)
    assert p3.shape == (1, 16, 16, 32)
    assert p4.shape == (1, 8, 8, 64)
    assert p5.shape == (1, 4, 4, 128)


def test_mobile_batch2():
    from yolo_dbl_tpu.nn.structures import (
        MFA,
        MQA,
        GGhostStage,
        RepGhostBottleneck,
        RepLKBlock,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, C))
    for m, expect in [
        (MQA(C, num_heads=4, key_dim=16, kv_strides=2), (1, 16, 16, C)),
        (RepGhostBottleneck(2 * C, C, se_ratio=0.25), (1, 16, 16, C)),
        (RepGhostBottleneck(2 * C, 2 * C, stride=2), (1, 8, 8, 2 * C)),
        (RepLKBlock(C, k=13, small_kernel=5), (1, 16, 16, C)),
        (GGhostStage(C, blocks=3, group_width=16), (1, 16, 16, C)),
    ]:
        v = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(v, x)
        assert out.shape == expect, type(m).__name__
        assert np.isfinite(np.asarray(out)).all(), type(m).__name__
    xs = [jax.random.normal(jax.random.PRNGKey(i), (1, 2 ** (4 - i), 2 ** (4 - i), 16)) for i in range(3)]
    m = MFA(64, output_resolution=8)
    v = m.init(jax.random.PRNGKey(5), xs)
    assert m.apply(v, xs).shape == (1, 8, 8, 64)


@pytest.mark.compileheavy
def test_mobilenetv3_parity_and_forward():
    """MobileNetV3 large/small: exact param parity with the torch reference
    (verified live: 5483032 / 2542856) and a forward pass."""
    from yolo_dbl_tpu.nn.structures import mobilenetv3_large, mobilenetv3_small

    m = mobilenetv3_small(num_classes=10)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 10) and bool(jnp.isfinite(y).all())
    big = mobilenetv3_large()
    vb = jax.eval_shape(lambda: big.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
    assert sum(p.size for p in jax.tree_util.tree_leaves(vb["params"])) == 5483032
    sm = mobilenetv3_small()
    vs = jax.eval_shape(lambda: sm.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))
    assert sum(p.size for p in jax.tree_util.tree_leaves(vs["params"])) == 2542856
