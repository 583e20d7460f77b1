"""Model compiler and module tests: spec golden values, shapes, param parity."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.nn.tasks import DetectionModel, parse_model_spec, yaml_model_load


def count_params(model, imgsz=256):
    v = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3)))
    )
    return sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))


def test_dbl_spec_channels():
    d = yaml_model_load("yolov13s_DBL.yaml")
    spec = parse_model_spec(d, ch=3)
    c2s = [l.c2 for l in spec.layers]
    # hand-derived from the reference parse_model rules at width=0.5
    assert c2s[:12] == [16, 32, 32, 64, 64, 128, 128, 256, 256, 256, 512, 512]
    assert c2s[12] == 256  # HyperACE
    assert c2s[14] == 512  # DownsampleConv doubles
    assert c2s[26] == 128 and c2s[30] == 256 and c2s[34] == 512  # detect inputs
    det = spec.layers[-1]
    assert det.name == "Detect" and det.args[1] == [128, 256, 512] and det.args[2] is False
    # outer-repeat expansion with depth 0.5
    assert spec.layers[6].n == 4   # 8 Bottleneck -> 4
    assert spec.layers[11].n == 2  # 4 LSKblock -> 2


def test_scale_char_resolution():
    d = yaml_model_load("yolov13n_DBL.yaml")
    assert d["scale"] == "n"
    spec = parse_model_spec(d, ch=3)
    assert spec.layers[0].c2 == 8  # 32 * 0.25


@pytest.mark.compileheavy
def test_param_parity_with_reference_counts():
    """Golden param counts captured from the torch reference (see refstub);
    ours = reference − 16 (frozen DFL projection folded analytically)."""
    golden = {
        ("yolov13s_DBL.yaml", 3): 9426044,
        ("yolov13n.yaml", 80): 2512583,
        ("yolov13s.yaml", 80): 9092391,
        ("yolov8n.yaml", 80): 3157200,
        ("yolov8s.yaml", 80): 11166560,
        ("yolov5s.yaml", 80): 9153152,
        ("yolov3.yaml", 80): 103754144,
        ("yolov12n.yaml", 80): 2572336,
        ("yolov12s.yaml", 80): 9164288,
        ("yolov6n.yaml", 80): 4500080,
        ("yolov8n-ghost.yaml", 80): 1865316,
        ("yolov8n-p2.yaml", 80): 3354144,
        ("yolov8n-p6.yaml", 80): 4984352,
        ("yolov8n-ghost-p2.yaml", 80): 2033944,
        ("yolov8n-ghost-p6.yaml", 80): 2901100,
    }
    for (name, nc), ref in golden.items():
        m = DetectionModel(name, nc=nc)
        assert count_params(m) == ref - 16, name


@pytest.mark.skipif(not Path("/root/reference").exists(), reason="reference not mounted")
def test_param_parity_live_reference():
    from . import refstub

    ref = refstub.load_reference_model(
        "/root/reference/models/YOLO/ultralytics/cfg/models/v13/yolov13_DBL.yaml", "s", nc=3
    )
    ref_n = sum(p.numel() for p in ref.parameters())
    ours = count_params(DetectionModel("yolov13s_DBL.yaml", nc=3))
    assert ours == ref_n - 16


def test_forward_shapes_tiny():
    """Full DBL graph executes; use small input to keep CPU compile quick."""
    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    feats = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [(1, 8, 8, 67), (1, 4, 4, 67), (1, 2, 2, 67)]
    pred = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 7, 8 * 8 + 4 * 4 + 2 * 2)
    # decoded boxes are finite and within a sane multiple of the image
    assert bool(jnp.isfinite(pred).all())


@pytest.mark.compileheavy
def test_yolov6_forward_and_relu_override():
    """v6: ConvTranspose2d head executes; `activation: nn.ReLU()` reaches
    every Conv in the trace (first conv output is non-negative)."""
    m = DetectionModel("yolov6n.yaml", nc=80)
    assert m.yaml.get("activation") == "nn.ReLU()"
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    feats = m.apply(v, x)
    assert [f.shape for f in feats] == [(1, 8, 8, 144), (1, 4, 4, 144), (1, 2, 2, 144)]
    from yolo_dbl_tpu.harness.features import extract_features

    f0 = extract_features(m, v, x, layer_indices=[0])
    assert float(np.min(f0["m0"])) >= 0.0  # ReLU, not SiLU
    assert float(np.min(f0["m0/bn"])) < 0.0  # pre-activation goes negative


@pytest.mark.compileheavy
def test_yolov7_builds_and_decodes():
    """v7 (MP/SPPCSPC/IDetect) builds; trunk params match the official count
    (37620125 + 2557 unfused implicit ia/im params); anchor decode is sane."""
    m = DetectionModel("yolov7.yaml", nc=80)
    assert m.head_name == "IDetect" and m.strides == (8, 16, 32)
    assert count_params(m) == 37620125 + 2557
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    feats = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in feats] == [(1, 8, 8, 3, 85), (1, 4, 4, 3, 85), (1, 2, 2, 3, 85)]
    pred = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 84, 3 * (64 + 16 + 4))
    assert bool(jnp.isfinite(pred).all())
    # scores are probabilities (obj * cls of sigmoids)
    assert float(pred[:, 4:].min()) >= 0.0 and float(pred[:, 4:].max()) <= 1.0


@pytest.mark.compileheavy
def test_rtdetr_yamls_param_parity_and_forward():
    """RT-DETR configs: golden counts captured from the live torch reference
    (exact — no DFL fold in DETR heads); rtdetr-l runs forward + postprocess."""
    golden = {
        "rtdetr-l.yaml": 32970476,
        "rtdetr-x.yaml": 67467852,
        "rtdetr-resnet50.yaml": 42925132,
        "rtdetr-resnet101.yaml": 61917260,
    }
    for name, want in golden.items():
        m = DetectionModel(name, nc=80)
        assert m.head_name == "RTDETRDecoder"
        assert count_params(m) == want, name
    m = DetectionModel("rtdetr-l.yaml", nc=80)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    dets = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert dets.shape == (1, 84, 6)  # 84 tokens < 300 queries at 64px
    assert bool(jnp.isfinite(dets).all())


@pytest.mark.compileheavy
def test_conv_transpose2d_shapes():
    """Torch nn.ConvTranspose2d formula: out = (in-1)*s - 2p + k."""
    from yolo_dbl_tpu.nn.common import ConvTranspose2d

    for k, s, p in [(2, 2, 0), (4, 2, 1), (3, 2, 1), (3, 1, 1), (2, 3, 0)]:
        mod = ConvTranspose2d(8, k, s, p)
        x = jnp.zeros((1, 5, 7, 4))
        y = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
        want = lambda n: (n - 1) * s - 2 * p + k
        assert y.shape == (1, want(5), want(7), 8), (k, s, p, y.shape)


@pytest.mark.compileheavy
def test_batchnorm_updates_in_train_mode():
    m = DetectionModel("yolov13n_DBL.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    _, mutated = m.apply(v, x, train=True, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
    old = jax.tree_util.tree_leaves(v["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    changed = any(not np.allclose(a, b) for a, b in zip(old, new))
    assert changed


@pytest.mark.compileheavy
def test_variant_zoo_param_parity():
    """Golden counts from the live torch reference across all variant yamls
    (ours = ref − 16, analytic DFL fold). FFCA-YOLO-L is runnable here only
    (its C3_Faster module is absent upstream) — forward smoke instead."""
    golden = {
        "yolov3-tiny.yaml": 12173248,
        "yolov3-spp.yaml": 104803744,
        "yolov3_edit1.yaml": 114223008,
        "yolov3_edit5.yaml": 1601960,
        "yolov5-p6.yaml": 4334896,
        "FFCA-YOLO.yaml": 8485818 + 16,  # live ref 8485834
        "yolov9s.yaml": 7318368,
        "yolov9m.yaml": 20216160,
        "yolov9c.yaml": 25590912,
        "yolov9e.yaml": 58206592,
        "yolov9c-seg.yaml": 27897120,
        "yolov9e-seg.yaml": 60512800,
        "yolov10n.yaml": 2775520,
        "yolov10x.yaml": 31808960,
        "YOLO-EMAC.yaml": 13008930,
        "yolov13_DBL2.yaml": 26846739,
        "yolov13_edit9.yaml": 2216171,
        "yolov13_v3edit6.yaml": 2490946,
    }
    for name, ref in golden.items():
        m = DetectionModel(name, nc=80)
        assert count_params(m) == ref - 16, name
    # FFCA-YOLO-L builds (module absent upstream); golden is ours-only
    assert count_params(DetectionModel("FFCA-YOLO-L.yaml", nc=80)) == 5258778


@pytest.mark.compileheavy
def test_v9e_and_v3tiny_forward():
    """CBLinear/CBFuse dual-branch (v9e) and maxpool/zeropad layers (v3-tiny)
    execute with correct stride sets."""
    m = DetectionModel("yolov9e.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    out = m.apply(v, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in out] == [(1, 8, 8, 67), (1, 4, 4, 67), (1, 2, 2, 67)]
    t = DetectionModel("yolov3-tiny.yaml", nc=3)
    assert t.strides == (16, 32)
    vt = t.init(jax.random.PRNGKey(0), imgsz=64)
    outs = t.apply(vt, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape for f in outs] == [(1, 4, 4, 67), (1, 2, 2, 67)]


@pytest.mark.compileheavy
def test_yolo11_family_param_parity():
    """yolo11 family (reference cfg/models/11/): golden counts from the live
    torch reference in this image. Detect-head models are ref − 16 (analytic
    DFL fold); cls is exact. IRSTE differs additionally by the reference's
    dead parameters, both documented divergences in nn/upsample/misc.py:
    SobelConv's mis-shaped Conv3d weights (18·c_ per EFE; the torch edge
    branch computes zeros) and FGM's declared-but-unused 3×3 conv (20·ce)."""
    golden = {
        "yolo11n.yaml": 2624080,
        "yolo11n-seg.yaml": 2876848,
        "yolo11n-pose.yaml": 2908507,
        "yolo11n-obb.yaml": 2695747,
    }
    for name, ref in golden.items():
        assert count_params(DetectionModel(name, nc=80)) == ref - 16, name
    # IRSTE at scale n: ref 3051968; dead params 18*(16+32+64+128) [SobelConv
    # x 4 C3k2_EFE stages] + 20*80 [FGM unused conv at Multibranch(320)]
    m = DetectionModel("yolo11n-C3k2_EFE-IRSTE.yaml", nc=80)
    assert count_params(m) == 3051968 - 16 - 18 * (16 + 32 + 64 + 128) - 20 * 80


@pytest.mark.compileheavy
def test_yolo11_cls_and_torchvision_backbone():
    """yolo11-cls matches the live reference exactly (1,543,914 @ n, nc=10);
    the TorchVision block (reference nn/modules/block.py:1123) builds the
    native resnet18 trunk (canonical 11,176,512 params) + Classify head, and
    produces logits."""
    from yolo_dbl_tpu.nn.tasks import ClassificationModel

    m = ClassificationModel("yolo11n-cls.yaml", nc=10)
    assert count_params(m) == 1543914
    r = ClassificationModel("yolo11-cls-resnet18.yaml", nc=10)
    # trunk 11,176,512 (torchvision resnet18 minus fc) + Classify(512→1280→10)
    assert count_params(r) == 11176512 + (512 * 1280 + 1280 * 2) + (1280 * 10 + 10)
    v = r.init(jax.random.PRNGKey(0), imgsz=64)
    out = r.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert out.shape == (1, 10)
    assert bool(jnp.isfinite(out).all())


@pytest.mark.compileheavy
@pytest.mark.skipif(not Path("/root/reference").exists(), reason="reference not mounted")
def test_reference_yamls_build_verbatim():
    """Migration check: the reference's own YAML files (verbatim paths, no
    adaptation) compile through our parse_model — the v13 family (all 9,
    incl. the DBL pair and experiment configs) and the 11 family."""
    ref = Path("/root/reference/models/YOLO/ultralytics/cfg/models")
    for y in sorted((ref / "v13").glob("*.yaml")):
        d = yaml_model_load(str(y))
        spec = parse_model_spec(d, ch=3)
        assert len(spec.layers) > 5, y.name
    for name in ["yolo11.yaml", "yolo11-seg.yaml", "yolo11-C3k2_EFE-IRSTE.yaml"]:
        d = yaml_model_load(str(ref / "11" / name))
        assert len(parse_model_spec(d, ch=3).layers) > 5, name
    # full module construction for the flagship, from the reference file
    d = yaml_model_load(str(ref / "v13" / "yolov13_DBL.yaml"))
    d["scale"] = "s"
    m = DetectionModel(d, nc=3)
    assert count_params(m) == 9426044 - 16  # matches the adapted-config build


def test_index_module_spec():
    """Index (reference conv.py:362): list-output selector; c2 = args[0]
    unscaled (tasks.py:1115). Maps to ExtractLayer at build time."""
    d = {"nc": 3, "backbone": [[-1, 1, "Conv", [16, 3, 2]], [-1, 1, "Index", [16, 1]]],
         "head": [[-1, 1, "Classify", [3]]]}
    spec = parse_model_spec(d, ch=3)
    layer = spec.layers[1]
    assert layer.name == "Index" and layer.c2 == 16 and layer.args == [16, 16, 1]
