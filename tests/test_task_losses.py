"""Task models (pose/obb/cls) and their losses: parity, decode, training signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.nn.tasks import ClassificationModel, DetectionModel
from yolo_dbl_tpu.losses.extra import dist2rbox, kpts_decode, obb_loss, pose_loss
from yolo_dbl_tpu.losses.tal import (
    rotated_task_aligned_assign,
    select_candidates_in_gts,
    select_candidates_in_rotated_gts,
)


def _count(model):
    v = jax.eval_shape(
        lambda: model.module.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)))
    )
    return sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))


def test_task_model_param_parity():
    """Golden counts from the live torch reference (pose/obb: −16 DFL fold)."""
    assert _count(DetectionModel("yolov8-pose.yaml")) == 3295470 - 16
    assert _count(DetectionModel("yolov8-obb.yaml")) == 3228867 - 16
    assert _count(ClassificationModel("yolov8-cls.yaml")) == 2719288


def test_classification_model_forward():
    m = ClassificationModel("yolov8-cls.yaml", nc=10)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    p = m.predict(v, jnp.zeros((2, 64, 64, 3)))
    assert p.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, atol=1e-5)


def test_rotated_candidates_match_axis_aligned_at_zero_angle():
    anc = jnp.array([[4.0, 4.0], [12.0, 4.0], [20.0, 20.0]])
    xyxy = jnp.array([[[2.0, 2.0, 10.0, 10.0]]])  # (B=1, M=1, 4)
    rbox = jnp.array([[[6.0, 6.0, 8.0, 8.0, 0.0]]])  # same box as xywhr
    a = select_candidates_in_gts(anc, xyxy)
    b = select_candidates_in_rotated_gts(anc, rbox)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rotated_candidates_rotate_with_box():
    # a thin box along x; the anchor at (10, 2.5) leaves it when rotated 90°
    anc = jnp.array([[10.0, 2.5], [2.5, 10.0]])
    flat = jnp.array([[[10.0, 2.5, 18.0, 2.0, 0.0]]])
    tall = jnp.array([[[10.0, 2.5, 18.0, 2.0, jnp.pi / 2]]])
    assert np.asarray(select_candidates_in_rotated_gts(anc, flat))[0, 0].tolist() == [1.0, 0.0]
    m = np.asarray(select_candidates_in_rotated_gts(anc, tall))[0, 0]
    assert m[0] == 1.0  # center still inside (rotation about its own center)


def test_dist2rbox_zero_angle_matches_dist2bbox_xywh():
    from yolo_dbl_tpu.ops.anchors import dist2bbox

    anc = jnp.array([[8.0, 8.0]])
    dist = jnp.array([[[2.0, 3.0, 4.0, 1.0]]])  # ltrb
    r = dist2rbox(dist, jnp.zeros((1, 1, 1)), anc[None])
    ref = dist2bbox(dist, anc[None], xywh=True)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref), atol=1e-6)


def _pose_batch(b=2, m=4, imgsz=64, k=17):
    rng = np.random.default_rng(0)
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, :2] = [[0.4, 0.4, 0.3, 0.3], [0.7, 0.6, 0.2, 0.25]]
    cls = np.zeros((b, m), np.int64)
    mask = np.zeros((b, m), np.float32)
    mask[:, :2] = 1.0
    kpts = np.zeros((b, m, k, 3), np.float32)
    kpts[:, :2, :, 0] = rng.uniform(0.3, 0.8, (b, 2, k))
    kpts[:, :2, :, 1] = rng.uniform(0.3, 0.8, (b, 2, k))
    kpts[:, :2, :, 2] = 2.0  # visible
    # random pixels: at exactly-zero logits the stable BCE kink has zero
    # subgradient, which would make the grad-flow assertion vacuous
    img = rng.standard_normal((b, imgsz, imgsz, 3)).astype(np.float32)
    return {"img": img, "gt_boxes": boxes, "gt_cls": cls, "gt_mask": mask, "gt_kpts": kpts}


@pytest.mark.compileheavy
def test_pose_loss_runs_and_grads():
    m = DetectionModel("yolov8-pose.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    batch = _pose_batch()

    def loss_fn(params):
        det, kpts = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                            batch["img"])
        total, items = pose_loss(det, kpts, batch, m.strides, m.nc)
        return total, items

    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(items["kpt"]) >= 0 and float(items["kobj"]) >= 0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def _obb_batch(b=2, m=4, imgsz=64):
    boxes = np.zeros((b, m, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.25, 0.4]
    boxes[:, 1] = [0.3, 0.6, 0.3, 0.2, 1.0]
    cls = np.zeros((b, m), np.int64)
    mask = np.zeros((b, m), np.float32)
    mask[:, :2] = 1.0
    img = np.random.default_rng(1).standard_normal((b, imgsz, imgsz, 3)).astype(np.float32)
    return {"img": img, "gt_boxes": boxes, "gt_cls": cls, "gt_mask": mask}


@pytest.mark.compileheavy
def test_obb_loss_runs_and_grads():
    m = DetectionModel("yolov8-obb.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    batch = _obb_batch()

    def loss_fn(params):
        det, angles = m.apply({"params": params, "batch_stats": v["batch_stats"]},
                              batch["img"])
        total, items = obb_loss(det, angles, batch, m.strides, m.nc)
        return total, items

    (total, items), grads = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(total))
    assert float(items.box) >= 0 and float(items.cls) >= 0
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_obb_tiny_boxes_filtered():
    """Sub-2px rotated GTs contribute nothing (reference loss.py:661 filter)."""
    m = DetectionModel("yolov8-obb.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(1), imgsz=64)
    batch = _obb_batch()
    tiny = {**batch}
    tb = batch["gt_boxes"].copy()
    tb[:, :2, 2:4] = 0.01  # 0.64 px wide/tall
    tiny["gt_boxes"] = tb
    det, angles = m.apply({"params": v["params"], "batch_stats": v["batch_stats"]}, batch["img"])
    _, items = obb_loss(det, angles, tiny, m.strides, m.nc)
    assert float(items.box) == 0.0  # no assignable GTs -> no box loss


@pytest.mark.compileheavy
def test_trainer_dispatches_pose_loss():
    """make_train_step routes Pose models through pose_loss (kpt metric key)."""
    from yolo_dbl_tpu.engine.train_state import build_optimizer, create_train_state
    from yolo_dbl_tpu.engine.trainer import make_train_step
    from yolo_dbl_tpu.cfg import get_cfg

    m = DetectionModel("yolov8-pose.yaml", nc=1)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    cfg = get_cfg(overrides={"optimizer": "SGD", "epochs": 1, "imgsz": 64, "batch": 2})
    tx, _ = build_optimizer(v["params"], 1, cfg, steps_per_epoch=2)
    state = create_train_state(v, tx)
    step = jax.jit(make_train_step(m, cfg, tx))
    batch = {k: jnp.asarray(val) for k, val in _pose_batch().items()}
    state2, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert "kpt_loss" in metrics and np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


def test_obb_predict_and_rotated_nms():
    """OBB predict → (B, 4+nc+1, A); rotated fast-NMS suppresses duplicates."""
    from yolo_dbl_tpu.ops.nms import non_max_suppression_rotated

    m = DetectionModel("yolov8-obb.yaml", nc=3)
    v = m.init(jax.random.PRNGKey(0), imgsz=64)
    pred = m.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 4 + 3 + 1, 84)
    angles = np.asarray(pred[:, -1])
    assert (angles >= -np.pi / 4 - 1e-5).all() and (angles <= 3 * np.pi / 4 + 1e-5).all()

    # synthetic: two near-identical rboxes + one distinct; NMS keeps 2
    p = np.full((1, 6, 8), 0.0, np.float32)
    p[0, :4, 0] = [20, 20, 10, 6]; p[0, 4, 0] = 0.9
    p[0, :4, 1] = [20.5, 20, 10, 6]; p[0, 4, 1] = 0.8   # duplicate of 0
    p[0, :4, 2] = [50, 50, 8, 8]; p[0, 4, 2] = 0.7
    p[0, 5, :3] = 0.3  # angles
    dets, counts = non_max_suppression_rotated(jnp.asarray(p), conf_thres=0.25,
                                               iou_thres=0.45, max_det=8, nc=1)
    assert int(counts[0]) == 2
    kept = np.asarray(dets[0, :2])
    assert {round(float(x)) for x in kept[:, 0]} == {20, 50}


def _detr_batch(b=2, m=8):
    boxes = np.zeros((b, m, 4), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.3]
    boxes[:, 1] = [0.25, 0.7, 0.2, 0.2]
    cls = np.zeros((b, m), np.int64); cls[:, 1] = 2
    mask = np.zeros((b, m), np.float32); mask[:, :2] = 1.0
    return {"gt_boxes": boxes, "gt_cls": cls, "gt_mask": mask}


def test_hungarian_match_prefers_close_boxes():
    from yolo_dbl_tpu.losses.detr import hungarian_match

    batch = _detr_batch(b=1)
    q = 16
    pb = np.full((1, q, 4), 0.1, np.float32)
    pb[0, 5] = [0.5, 0.5, 0.4, 0.3]   # exact match for gt 0
    pb[0, 11] = [0.25, 0.7, 0.2, 0.2] # exact match for gt 1
    ps = np.full((1, q, 3), -4.0, np.float32)
    ps[0, 5, 0] = 4.0
    ps[0, 11, 2] = 4.0
    idx = hungarian_match(jnp.asarray(pb), jnp.asarray(ps),
                          jnp.asarray(batch["gt_boxes"]), jnp.asarray(batch["gt_cls"]),
                          jnp.asarray(batch["gt_mask"]))
    assert int(idx[0, 0]) == 5 and int(idx[0, 1]) == 11


def test_rtdetr_loss_runs_and_improves_with_matching_preds():
    from yolo_dbl_tpu.losses.detr import rtdetr_loss

    rng = np.random.default_rng(0)
    b, L, q, nc, m = 2, 3, 32, 3, 8
    batch = _detr_batch(b=b, m=m)

    def mk(good):
        dec_b = rng.uniform(0.2, 0.8, (b, L, q, 4)).astype(np.float32)
        dec_s = rng.normal(-3, 0.5, (b, L, q, nc)).astype(np.float32)
        enc_b = rng.uniform(0.2, 0.8, (b, q, 4)).astype(np.float32)
        enc_s = rng.normal(-3, 0.5, (b, q, nc)).astype(np.float32)
        if good:
            for arrs in [dec_b[:, l] for l in range(L)] + [enc_b]:
                arrs[:, 0] = batch["gt_boxes"][:, 0]
                arrs[:, 1] = batch["gt_boxes"][:, 1]
            for arrs in [dec_s[:, l] for l in range(L)] + [enc_s]:
                arrs[:, 0, 0] = 4.0
                arrs[:, 1, 2] = 4.0
        return tuple(jnp.asarray(t) for t in (dec_b, dec_s, enc_b, enc_s))

    bad_total, _ = rtdetr_loss(mk(False), batch, nc)
    good_total, items = rtdetr_loss(mk(True), batch, nc)
    assert np.isfinite(float(bad_total)) and np.isfinite(float(good_total))
    assert float(good_total) < float(bad_total)
    assert float(items["giou"]) < 0.1  # exact boxes -> ~zero giou loss


def test_rtdetr_loss_grads_flow():
    from yolo_dbl_tpu.losses.detr import rtdetr_loss

    rng = np.random.default_rng(1)
    b, L, q, nc, m = 1, 2, 16, 3, 4
    batch = _detr_batch(b=b, m=m)
    args = (rng.uniform(0.2, 0.8, (b, L, q, 4)).astype(np.float32),
            rng.normal(0, 0.5, (b, L, q, nc)).astype(np.float32),
            rng.uniform(0.2, 0.8, (b, q, 4)).astype(np.float32),
            rng.normal(0, 0.5, (b, q, nc)).astype(np.float32))

    def f(*outs):
        total, _ = rtdetr_loss(outs, batch, nc)
        return total

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(*map(jnp.asarray, args))
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


@pytest.mark.compileheavy
def test_world_model_parity_and_predict():
    """YOLO-World: golden counts from the live torch WorldModel (−16 DFL);
    predict responds to text — nc follows the installed embeddings."""
    from yolo_dbl_tpu.nn.tasks import WorldModel

    m = WorldModel("yolov8s-world.yaml", nc=80)
    assert _count(m) == 13383496 - 16
    m2 = WorldModel("yolov8s-worldv2.yaml", nc=80)
    assert _count(m2) == 12759880 - 16

    small = WorldModel("yolov8n-world.yaml", nc=4)
    v = small.init(jax.random.PRNGKey(0), imgsz=64)
    pred = small.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred.shape == (1, 4 + 4, 84)
    assert bool(jnp.isfinite(pred).all())
    # new prompts change the class dimension
    emb = np.random.default_rng(0).standard_normal((6, 512)).astype(np.float32)
    small.set_classes(emb, names=[f"c{i}" for i in range(6)])
    pred6 = small.predict(v, jnp.zeros((1, 64, 64, 3)))
    assert pred6.shape == (1, 4 + 6, 84)


def test_fastsam_everything_and_prompts():
    from yolo_dbl_tpu.models.fastsam import FastSAM, adjust_bboxes_to_image_border

    fs = FastSAM(scale="n")
    v = fs.init(jax.random.PRNGKey(0), imgsz=64)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    res = fs.everything(v, img, conf=0.0, iou=0.9, max_det=16)
    assert res["boxes"].shape == (16, 6) and res["masks"].shape == (16, 64, 64)
    sel = FastSAM.prompt(res, bboxes=[[8, 8, 40, 40]])
    assert sel["boxes"].shape[0] >= 1  # bbox prompt picks the best-IoU mask
    with pytest.raises(NotImplementedError):
        FastSAM.prompt(res, texts=["a photo of a cat"])
    snapped = adjust_bboxes_to_image_border(np.array([[5.0, 30.0, 620.0, 600.0]]), (640, 640))
    np.testing.assert_allclose(snapped, [[0.0, 30.0, 620.0, 600.0]])


def test_nas_postprocess():
    from yolo_dbl_tpu.models.nas import NAS, nas_postprocess

    boxes = np.zeros((1, 8, 4), np.float32)
    boxes[0, 0] = [10, 10, 30, 30]
    boxes[0, 1] = [11, 10, 30, 30]   # duplicate
    boxes[0, 2] = [50, 50, 70, 72]
    scores = np.full((1, 8, 2), 0.01, np.float32)
    scores[0, 0, 0] = 0.9
    scores[0, 1, 0] = 0.8
    scores[0, 2, 1] = 0.7
    dets, counts = nas_postprocess(boxes, scores, conf=0.25, iou=0.45, max_det=8)
    assert int(counts[0]) == 2
    with pytest.raises(FileNotFoundError):
        NAS("yolo_nas_s")


@pytest.mark.parametrize("task,model_yaml,extra_key", [
    ("segment", "yolov8n-seg.yaml", "gt_masks"),
    ("pose", "yolov8n-pose.yaml", "gt_kpts"),
    ("obb", "yolov8n-obb.yaml", None),
])
@pytest.mark.compileheavy
def test_task_dataloader_and_train_step(tmp_path, task, model_yaml, extra_key):
    """Task datasets load real labels; one jitted train step runs through the
    task-dispatched loss with the loader's padded batch."""
    from yolo_dbl_tpu.cfg import get_cfg
    from yolo_dbl_tpu.data.build import DataLoader
    from yolo_dbl_tpu.data.dataset import YOLODataset
    from yolo_dbl_tpu.engine.train_state import build_optimizer, create_train_state
    from yolo_dbl_tpu.engine.trainer import make_train_step
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / task, task=task, imgsz=96)
    ds = YOLODataset(root, split="train", imgsz=96, task=task)
    loader = DataLoader(ds, batch_size=2, imgsz=96, max_gt=8, task=task, prefetch=0)
    batch = next(iter(loader))
    assert batch["img"].shape == (2, 96, 96, 3)
    if task == "obb":
        assert batch["gt_boxes"].shape == (2, 8, 5)
        assert float(batch["gt_mask"].sum()) > 0
    else:
        assert extra_key in batch
        if task == "segment":
            assert batch["gt_masks"].shape == (2, 8, 24, 24)
            assert float(batch["gt_masks"].sum()) > 0  # polygons rasterized
        else:
            assert batch["gt_kpts"].shape == (2, 8, 17, 3)

    m = DetectionModel(model_yaml, nc=2)
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    cfg = get_cfg(overrides={"optimizer": "SGD", "epochs": 1, "imgsz": 96, "batch": 2})
    tx, _ = build_optimizer(v["params"], 2, cfg, steps_per_epoch=2)
    state = create_train_state(v, tx)
    step = jax.jit(make_train_step(m, cfg, tx))
    jb = {k: jnp.asarray(val) for k, val in batch.items() if k not in ("labels", "indices")}
    state2, metrics = step(state, jb, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1


@pytest.mark.compileheavy
def test_sam_architecture():
    """SAM: ViT-B total matches the torch reference exactly (93,735,472,
    verified live incl. prompt/mask branches); prompt flows produce masks at
    img/4 with IoU predictions."""
    from yolo_dbl_tpu.models.sam import SAMModel, build_sam

    m = build_sam("b")
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3)),
                                      jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32)))
    assert sum(p.size for p in jax.tree_util.tree_leaves(v["params"])) == 93735472

    tiny = SAMModel(encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=4,
                    encoder_global_attn_indexes=(1,), img_size=256)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3))
    pts = jnp.array([[[128.0, 128.0]]])
    lbl = jnp.array([[1]])
    vt = tiny.init(jax.random.PRNGKey(1), img, pts, lbl)
    masks, iou = tiny.apply(vt, img, pts, lbl)
    assert masks.shape == (1, 3, 64, 64) and iou.shape == (1, 3)
    assert bool(jnp.isfinite(masks).all())
    # box prompt, single-mask mode
    mb, ib = tiny.apply(vt, img, boxes=jnp.array([[[32.0, 32.0, 200.0, 200.0]]]),
                        multimask_output=False)
    assert mb.shape == (1, 1, 64, 64)
    # precomputed-embedding prompting (the predictor flow)
    emb = tiny.apply(vt, img, method="encode_image")
    mp, _ = tiny.apply(vt, emb, pts, lbl, method="prompt")
    assert mp.shape == (1, 3, 64, 64)


def test_triton_client_against_mock_server():
    """TritonRemoteModel speaks KServe-v2 REST to a local mock."""
    import http.server
    import json
    import threading

    from yolo_dbl_tpu.utils.triton import TritonRemoteModel

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _send(self, obj):
            body = json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            self._send({"name": "toy",
                        "inputs": [{"name": "x", "datatype": "FP32", "shape": [-1, 4]}],
                        "outputs": [{"name": "y", "datatype": "FP32", "shape": [-1, 4]}]})

        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            data = np.asarray(req["inputs"][0]["data"], np.float32)
            self._send({"outputs": [{"name": "y", "datatype": "FP32",
                                     "shape": req["inputs"][0]["shape"],
                                     "data": (data * 2).tolist()}]})

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        model = TritonRemoteModel(f"http://127.0.0.1:{port}/toy")
        assert model.input_names == ["x"] and model.output_names == ["y"]
        x = np.arange(8, dtype=np.float32).reshape(2, 4)
        (y,) = model(x)
        np.testing.assert_allclose(y, x * 2)
    finally:
        srv.shutdown()


@pytest.mark.compileheavy
def test_auto_annotate(tmp_path):
    """Detector + SAM auto-annotation writes YOLO-segment label files."""
    import cv2

    from yolo_dbl_tpu.data.annotator import auto_annotate
    from yolo_dbl_tpu.models.sam import SAMModel

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    im = np.full((128, 128, 3), 40, np.uint8)
    cv2.rectangle(im, (30, 30), (90, 90), (220, 60, 60), -1)
    cv2.imwrite(str(img_dir / "a.jpg"), im)

    det = DetectionModel("yolov8n.yaml", nc=2)
    dv = det.init(jax.random.PRNGKey(0), imgsz=128)
    sam = SAMModel(encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=4,
                   encoder_global_attn_indexes=(1,), img_size=128)
    sv = sam.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)),
                  boxes=jnp.zeros((1, 1, 4)))
    out = auto_annotate(img_dir, det, dv, sam, sv, conf=0.0, imgsz=128, max_det=4)
    f = out / "a.txt"
    assert f.exists()
    for line in f.read_text().splitlines():
        vals = line.split()
        assert len(vals) >= 7 and len(vals) % 2 == 1  # cls + (x, y) pairs


@pytest.mark.parametrize("task,model_yaml,key", [
    ("segment", "yolov8n-seg.yaml", "mask_mAP50"),
    ("pose", "yolov8n-pose.yaml", "pose_mAP50"),
    ("obb", "yolov8n-obb.yaml", "rbox_mAP50"),
])
def test_task_validators(tmp_path, task, model_yaml, key):
    """Seg/pose/obb validators produce their dual-branch metrics."""
    from yolo_dbl_tpu.data.build import DataLoader
    from yolo_dbl_tpu.data.dataset import YOLODataset
    from yolo_dbl_tpu.engine.validator import (OBBValidator, PoseValidator,
                                               SegmentationValidator)
    from .fixtures import make_task_dataset

    root = make_task_dataset(tmp_path / task, task=task, imgsz=96, n_val=2)
    ds = YOLODataset(root, split="val", imgsz=96, task=task)
    loader = DataLoader(ds, batch_size=2, imgsz=96, max_gt=8, task=task,
                        prefetch=0, shuffle=False, drop_last=False)
    m = DetectionModel(model_yaml, nc=2)
    v = m.init(jax.random.PRNGKey(0), imgsz=96)
    cls = {"segment": SegmentationValidator, "pose": PoseValidator, "obb": OBBValidator}[task]
    val = cls(m, conf=0.001)
    out = val(v, loader)
    assert key in out and f"{key.split('_')[0]}_mAP50-95" in out
    assert "mAP50" in out and np.isfinite(out["fitness"])
    assert out["images"] == 2


@pytest.mark.compileheavy
def test_sam2_architecture_and_memory():
    """SAM2: component param counts match the live torch reference exactly
    (Hiera-T 26,849,472 / FPN 369,664 / MemoryAttention 5,922,304 /
    MemoryEncoder 1,384,608); image prompting and the video memory loop run."""
    from yolo_dbl_tpu.models.sam2 import (FpnNeck, Hiera, MemoryAttention,
                                          MemoryEncoder, build_sam2)

    def count(mod, *args, **kw):
        v = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), *args, **kw))
        return sum(p.size for p in jax.tree_util.tree_leaves(v["params"]))

    h = Hiera(embed_dim=96, num_heads=1, stages=(1, 2, 7, 2), global_att_blocks=(5, 7, 9),
              window_pos_embed_bkg_spatial_size=(7, 7), window_spec=(8, 4, 14, 7))
    assert count(h, jnp.zeros((1, 256, 256, 3))) == 26849472
    f = FpnNeck(d_model=256, backbone_channel_list=(768, 384, 192, 96))
    feats = [jnp.zeros((1, 64, 64, 96)), jnp.zeros((1, 32, 32, 192)),
             jnp.zeros((1, 16, 16, 384)), jnp.zeros((1, 8, 8, 768))]
    assert count(f, feats) == 369664
    assert count(MemoryAttention(), jnp.zeros((1, 64, 256)), jnp.zeros((1, 128, 64)),
                 jnp.zeros((1, 64, 256)), jnp.zeros((1, 128, 64))) == 5922304
    assert count(MemoryEncoder(out_dim=64), jnp.zeros((1, 16, 16, 256)),
                 jnp.zeros((1, 256, 256, 1))) == 1384608

    # image prompting + the video memory loop at tiny scale
    m = build_sam2("t", image_size=256)
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3))
    pts = jnp.array([[[128.0, 128.0]]])
    lbl = jnp.array([[1]])
    v = m.init(jax.random.PRNGKey(1), img, pts, lbl)
    masks, iou, sam_tokens, obj_logits = m.apply(v, img, pts, lbl)
    assert masks.shape == (1, 3, 64, 64) and iou.shape == (1, 3)
    assert sam_tokens.shape == (1, 3, 256) and obj_logits.shape == (1, 1)

    enc = m.apply(v, img, method="encode_image")
    src = enc["vision_features"]  # (1, 16, 16, 256)
    vpos = enc["vision_pos_enc"][-1]
    full_mask = jax.image.resize(masks[:, :1].transpose(0, 2, 3, 1), (1, 256, 256, 1), "bilinear")
    mem, mpos = m.apply(v, src, full_mask, method="encode_memory")
    assert mem.shape == (1, 16, 16, 64)
    bank = jnp.concatenate([mem.reshape(1, -1, 64)] * 2, axis=1)  # two frames
    bank_pos = jnp.concatenate([mpos.reshape(1, -1, 64)] * 2, axis=1)
    cond = m.apply(v, src, vpos, bank, bank_pos, method="condition_on_memory")
    assert cond.shape == src.shape and bool(jnp.isfinite(cond).all())


@pytest.mark.compileheavy
def test_mobile_sam_tinyvit():
    """MobileSAM TinyViT: exact param parity with the live torch reference
    (6,065,532 incl. classifier head) and a forward pass to the SAM neck."""
    from yolo_dbl_tpu.models.tinyvit import build_mobile_sam_encoder

    m = build_mobile_sam_encoder(img_size=1024)
    v = jax.eval_shape(lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 3))))
    assert sum(p.size for p in jax.tree_util.tree_leaves(v["params"])) == 6065532

    small = build_mobile_sam_encoder(img_size=256)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 256, 256, 3))
    vs = small.init(jax.random.PRNGKey(1), x)
    feat = small.apply(vs, x)
    assert feat.shape == (1, 16, 16, 256) and bool(jnp.isfinite(feat).all())
    feat2, logits = small.apply(vs, x, with_head=True)
    assert logits.shape == (1, 1000)


def test_sam_predictor_facade():
    """SAMPredictor: set_image once, prompt repeatedly in original pixels."""
    from yolo_dbl_tpu.models.sam import SAMModel, SAMPredictor

    m = SAMModel(encoder_embed_dim=96, encoder_depth=2, encoder_num_heads=4,
                 encoder_global_attn_indexes=(1,), img_size=256)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3)),
               jnp.zeros((1, 1, 2)), jnp.zeros((1, 1), jnp.int32))
    p = SAMPredictor(m, v).set_image(
        np.random.default_rng(0).uniform(0, 255, (200, 300, 3)).astype(np.uint8))
    masks, iou = p.predict(points=[[150, 100]], labels=[1])
    assert masks.shape == (3, 200, 300) and iou.shape == (3,)
    mb, _ = p.predict(boxes=[[50, 40, 250, 160]], multimask_output=False)
    assert mb.shape == (1, 200, 300)
