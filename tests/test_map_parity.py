"""mAP-level fidelity vs the live torch reference (VERDICT r2 #4).

Two layers of evidence that our evaluator isn't self-certifying:

1. Metric-math parity: identical synthetic detection/GT sets through the
   reference's `ap_per_class` (utils/metrics.py:537) and our
   DetMetrics/ap_per_class — mAP50 / mAP50-95 must agree.
2. End-to-end parity: ported yolov13s_DBL weights, same letterboxed fixture
   images through (a) the torch reference model + its non_max_suppression
   (utils/ops.py:167) + its TP matching + ap_per_class, and (b) our
   DetectionValidator — detection sets and mAP must agree.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from yolo_dbl_tpu.nn.tasks import DetectionModel  # noqa: E402
from yolo_dbl_tpu.utils.metrics import DetMetrics  # noqa: E402
from yolo_dbl_tpu.utils.port import port_state_dict  # noqa: E402

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not Path("/root/reference").exists(), reason="reference not mounted"),
]


def _ref_metrics():
    from . import refstub

    refstub.install_stubs()
    if refstub.REF_ROOT not in sys.path:
        sys.path.insert(0, refstub.REF_ROOT)
    from ultralytics.utils import metrics as ref_metrics  # noqa: E402

    return ref_metrics


def _torch_greedy_nms():
    """Real greedy NMS to stand in for the stubbed torchvision.ops.nms."""
    import torch

    def nms(boxes, scores, iou_thres):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a_i + a_r - inter + 1e-9)
            order = rest[iou <= iou_thres]
        return torch.as_tensor(keep, dtype=torch.long)

    return nms


def _synthetic_eval_set(seed=0, n_images=12, nc=3):
    """Detections with controlled TP/FP mix so mAP lands mid-range."""
    rng = np.random.default_rng(seed)
    per_image = []
    for _ in range(n_images):
        m = rng.integers(1, 5)
        gt = np.zeros((m, 4))
        gt[:, :2] = rng.uniform(0, 400, (m, 2))
        gt[:, 2:] = gt[:, :2] + rng.uniform(40, 120, (m, 2))
        gt_cls = rng.integers(0, nc, m)
        dets = []
        for j in range(m):
            if rng.random() < 0.75:  # true positive with jitter
                jitter = rng.uniform(-8, 8, 4)
                conf = rng.uniform(0.4, 0.95)
                cls = gt_cls[j] if rng.random() < 0.9 else rng.integers(0, nc)
                dets.append([*(gt[j] + jitter), conf, cls])
        for _ in range(rng.integers(0, 4)):  # false positives
            xy = rng.uniform(0, 450, 2)
            wh = rng.uniform(30, 90, 2)
            dets.append([*xy, *(xy + wh), rng.uniform(0.05, 0.6), rng.integers(0, nc)])
        dets = np.asarray(dets, np.float64).reshape(-1, 6)
        dets = dets[np.argsort(-dets[:, 4])]
        per_image.append((dets, gt, gt_cls))
    return per_image


def _ref_match(ref_metrics, dets, gt, gt_cls, thresholds):
    """Reference DetectionValidator._process_batch (val.py:209): IoU between
    GT and dets, greedy unique matching per threshold via match_predictions
    semantics (validator.py match_predictions)."""
    import torch

    if len(dets) == 0:
        return np.zeros((0, len(thresholds)), bool)
    iou = ref_metrics.box_iou(torch.from_numpy(gt), torch.from_numpy(dets[:, :4])).numpy()
    correct_class = gt_cls[:, None] == dets[:, 5][None, :].astype(int)
    iou = iou * correct_class
    tp = np.zeros((len(dets), len(thresholds)), bool)
    for ti, t in enumerate(thresholds):
        matches = np.nonzero(iou >= t)
        matches = np.array(matches).T
        if matches.shape[0]:
            if matches.shape[0] > 1:
                matches = matches[iou[matches[:, 0], matches[:, 1]].argsort()[::-1]]
                matches = matches[np.unique(matches[:, 1], return_index=True)[1]]
                matches = matches[np.unique(matches[:, 0], return_index=True)[1]]
            tp[matches[:, 1].astype(int), ti] = True
    return tp


def _ref_map(ref_metrics, per_image, thresholds):
    tps, confs, pcls, tcls = [], [], [], []
    for dets, gt, gt_cls in per_image:
        tps.append(_ref_match(ref_metrics, dets, gt, gt_cls, thresholds))
        confs.append(dets[:, 4])
        pcls.append(dets[:, 5])
        tcls.append(gt_cls)
    out = ref_metrics.ap_per_class(
        np.concatenate(tps), np.concatenate(confs), np.concatenate(pcls),
        np.concatenate(tcls))
    ap = out[5]  # (nc_seen, 10)
    return float(ap[:, 0].mean()), float(ap.mean())


def test_ap_math_matches_reference():
    """Identical detection sets through both metric stacks (ref
    metrics.py:537 vs utils/metrics.py ap_per_class)."""
    ref_metrics = _ref_metrics()
    per_image = _synthetic_eval_set()
    ours = DetMetrics(nc=3)
    for dets, gt, gt_cls in per_image:
        ours.update(dets, gt, gt_cls)
    res = ours.results()
    ref50, ref5095 = _ref_map(ref_metrics, per_image, DetMetrics.IOU_THRESHOLDS)
    assert res["mAP50"] > 0.3, "fixture should land mid-range"
    assert abs(res["mAP50"] - ref50) < 1e-6, (res["mAP50"], ref50)
    assert abs(res["mAP50-95"] - ref5095) < 1e-6, (res["mAP50-95"], ref5095)


def test_e2e_validator_matches_reference_stack(tmp_path):
    """Ported DBL weights, same pixels → both full eval stacks agree:
    per-image detection sets (boxes <0.5 px, conf <1e-3) and mAP50-95."""
    import torch

    from . import refstub
    from .fixtures import make_shapes_dataset
    from .test_forward_parity import REF_V13, _patch_ref_dysample
    from yolo_dbl_tpu.data.build import DataLoader
    from yolo_dbl_tpu.data.dataset import YOLODataset
    from yolo_dbl_tpu.engine.validator import DetectionValidator

    ref_metrics = _ref_metrics()
    from ultralytics.utils import ops as ref_ops  # noqa: E402
    import torchvision

    torchvision.ops.nms = _torch_greedy_nms()

    torch.manual_seed(0)
    ref = refstub.load_reference_model(f"{REF_V13}/yolov13_DBL.yaml", "s", nc=3)
    _patch_ref_dysample()
    ref = ref.float().eval()

    model = DetectionModel("yolov13s_DBL.yaml", nc=3)
    variables = model.init(jax.random.PRNGKey(0), imgsz=128)
    variables = port_state_dict(ref.state_dict(), variables, strict=True)

    data = make_shapes_dataset(tmp_path / "ds", n_train=1, n_val=6, imgsz=128)
    ds = YOLODataset(data, split="val", imgsz=128)
    loader = DataLoader(ds, batch_size=6, imgsz=128, augment=False, shuffle=False,
                        drop_last=False)

    conf_t, iou_t = 0.001, 0.7
    ours = DetectionValidator(model, conf=conf_t, iou=iou_t)
    our_out = ours(variables, loader)

    # reference stack on the SAME letterboxed pixels
    ref_det_metrics = []
    for batch in loader:
        img = batch["img"]
        img_f = img.astype(np.float32) / 255.0 if img.dtype == np.uint8 else img
        with torch.inference_mode():
            t_out = ref(torch.from_numpy(img_f.transpose(0, 3, 1, 2)))
        t_pred = t_out[0] if isinstance(t_out, (tuple, list)) else t_out
        kept = ref_ops.non_max_suppression(
            torch.as_tensor(np.asarray(t_pred)), conf_thres=conf_t, iou_thres=iou_t,
            max_det=300, multi_label=False)
        imgsz = img.shape[1]
        from yolo_dbl_tpu.ops.boxes import xywh2xyxy

        for i, k in enumerate(kept):
            m = batch["gt_mask"][i].astype(bool)
            gt = np.asarray(xywh2xyxy(jnp.asarray(batch["gt_boxes"][i][m] * imgsz)))
            gcls = batch["gt_cls"][i][m]
            ref_det_metrics.append((k.numpy().astype(np.float64), gt, gcls))

    ref50, ref5095 = _ref_map(ref_metrics, ref_det_metrics, DetMetrics.IOU_THRESHOLDS)
    assert abs(our_out["mAP50-95"] - ref5095) < 0.01, (our_out["mAP50-95"], ref5095)
    assert abs(our_out["mAP50"] - ref50) < 0.01, (our_out["mAP50"], ref50)
