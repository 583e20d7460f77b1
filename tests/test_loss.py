"""TAL assigner and detection-loss tests with hand-built targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dbl_tpu.losses.detection import _bce_with_logits, _df_loss, detection_loss
from yolo_dbl_tpu.losses.tal import select_candidates_in_gts, task_aligned_assign
from yolo_dbl_tpu.ops.anchors import make_anchors


def test_candidates_in_gts():
    anc = jnp.array([[1.0, 1.0], [5.0, 5.0], [9.0, 9.0]])
    gts = jnp.array([[[0.0, 0.0, 6.0, 6.0]]])  # one gt, batch 1
    mask = select_candidates_in_gts(anc, gts)
    np.testing.assert_array_equal(mask[0, 0], [1.0, 1.0, 0.0])


def _synthetic_assign(nc=4, m=3):
    """One perfect GT at a known anchor; padded GT rows masked out."""
    anc, strides = make_anchors([(8, 8)], [8])
    a = anc.shape[0]
    gt_boxes = jnp.zeros((1, m, 4)).at[0, 0].set(jnp.array([8.0, 8.0, 24.0, 24.0]))
    gt_labels = jnp.zeros((1, m), jnp.int32).at[0, 0].set(2)
    mask_gt = jnp.zeros((1, m)).at[0, 0].set(1.0)
    # predictions: every anchor predicts a 16x16 box centered on itself
    centers = anc * 8.0
    pd_boxes = jnp.concatenate([centers - 8.0, centers + 8.0], -1)[None]
    scores = jnp.full((1, a, nc), 0.1).at[:, :, 2].set(0.9)
    return scores, pd_boxes, anc * 8.0, gt_labels, gt_boxes, mask_gt


def test_tal_assigns_center_anchor():
    scores, pd_boxes, anc_pix, gt_labels, gt_boxes, mask_gt = _synthetic_assign()
    tl, tb, ts, fg, tgi = task_aligned_assign(
        scores, pd_boxes, anc_pix, gt_labels, gt_boxes, mask_gt, topk=10, num_classes=4
    )
    fg = np.asarray(fg[0])
    assert fg.sum() > 0
    # all foreground anchors must lie inside the gt box
    anc_np = np.asarray(anc_pix)
    inside = (anc_np[:, 0] > 8) & (anc_np[:, 0] < 24) & (anc_np[:, 1] > 8) & (anc_np[:, 1] < 24)
    assert np.all(~fg | inside)
    # the anchor exactly at gt center (16, 16) must be assigned
    center_idx = int(np.argmin(np.abs(anc_np - 16.0).sum(-1)))
    assert fg[center_idx]
    # targets carry the right class and box
    np.testing.assert_array_equal(np.asarray(tl[0])[fg], 2)
    np.testing.assert_allclose(np.asarray(tb[0])[center_idx], [8, 8, 24, 24], atol=1e-5)
    # padded gts assigned to nobody
    assert np.asarray(ts).max() <= 1.0


def test_tal_no_gt():
    scores, pd_boxes, anc_pix, gt_labels, gt_boxes, _ = _synthetic_assign()
    mask_gt = jnp.zeros_like(gt_labels, dtype=jnp.float32)
    _, _, ts, fg, _ = task_aligned_assign(
        scores, pd_boxes, anc_pix, gt_labels, gt_boxes, mask_gt, topk=10, num_classes=4
    )
    assert not bool(fg.any())
    assert float(ts.sum()) == 0.0


def test_bce_matches_torch_formula():
    logits = jnp.array([-3.0, -0.5, 0.0, 2.0])
    targets = jnp.array([0.0, 1.0, 0.5, 1.0])
    ours = _bce_with_logits(logits, targets)
    # float64 numpy evaluation of the BCEWithLogits formula (verified equal to
    # torch.nn.functional.binary_cross_entropy_with_logits)
    x = np.asarray(logits, np.float64)
    z = np.asarray(targets, np.float64)
    ref = np.maximum(x, 0) - x * z + np.log1p(np.exp(-np.abs(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_df_loss_minimized_at_target():
    """DFL CE is minimized when the predicted distribution puts its mass on
    the target's two adjacent bins with the interpolation weights."""
    reg_max = 16
    target = jnp.array([[3.0, 7.0, 0.0, 14.0]])  # integer targets: all mass at floor
    ideal = jax.nn.one_hot(jnp.floor(target).astype(int), reg_max) * 20.0
    loss_sharp = _df_loss(ideal, target, reg_max)
    uniform = jnp.zeros((1, 4, reg_max))
    loss_uniform = _df_loss(uniform, target, reg_max)
    assert float(loss_sharp.mean()) < float(loss_uniform.mean())
    # fractional target: optimal distribution is (wl, wr) on (floor, ceil)
    frac = jnp.array([[6.3]])
    opt = jnp.log(jnp.array([0.7, 0.3]) + 1e-9)
    logits = jnp.full((1, 1, reg_max), -30.0).at[0, 0, 6].set(opt[0]).at[0, 0, 7].set(opt[1])
    near = jnp.full((1, 1, reg_max), -30.0).at[0, 0, 6].set(jnp.log(0.5)).at[0, 0, 7].set(jnp.log(0.5))
    assert float(_df_loss(logits, frac, reg_max).mean()) < float(_df_loss(near, frac, reg_max).mean())


@pytest.mark.compileheavy
def test_detection_loss_runs_and_descends():
    """Gradient descent on raw maps directly should reduce the loss."""
    rng = jax.random.PRNGKey(0)
    b, nc = 2, 3
    shapes = [(8, 8), (4, 4), (2, 2)]
    strides = (8, 16, 32)
    feats = [jax.random.normal(jax.random.fold_in(rng, i), (b, h, w, 64 + nc)) * 0.1 for i, (h, w) in enumerate(shapes)]
    batch = {
        "gt_boxes": jnp.tile(jnp.array([[[0.5, 0.5, 0.4, 0.4]]]), (b, 1, 1)),
        "gt_cls": jnp.ones((b, 1), jnp.int32),
        "gt_mask": jnp.ones((b, 1)),
    }

    def loss_of(fs):
        total, _ = detection_loss(fs, batch, strides, nc)
        return total

    l0 = float(loss_of(feats))
    grads = jax.grad(loss_of)(feats)
    feats2 = [f - 0.5 * g for f, g in zip(feats, grads)]
    l1 = float(loss_of(feats2))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0


def test_e2e_and_classification_losses():
    from yolo_dbl_tpu.losses.extra import classification_loss, e2e_detect_loss

    rng = jax.random.PRNGKey(0)
    feats = {
        "one2many": [jax.random.normal(rng, (1, 8, 8, 67)) * 0.1,
                     jax.random.normal(rng, (1, 4, 4, 67)) * 0.1,
                     jax.random.normal(rng, (1, 2, 2, 67)) * 0.1],
    }
    feats["one2one"] = feats["one2many"]
    batch = {
        "gt_boxes": jnp.array([[[0.5, 0.5, 0.4, 0.4]]]),
        "gt_cls": jnp.zeros((1, 1), jnp.int32),
        "gt_mask": jnp.ones((1, 1)),
    }
    total, items = e2e_detect_loss(feats, batch, (8, 16, 32), 3)
    assert np.isfinite(float(total))
    # perfect logits → near-zero CE; uniform → log(nc)
    labels = jnp.array([0, 1, 2])
    sharp = jax.nn.one_hot(labels, 3) * 30
    assert float(classification_loss(sharp, labels)) < 1e-3
    assert float(classification_loss(jnp.zeros((3, 3)), labels)) == pytest.approx(np.log(3), abs=1e-5)


def test_probiou_properties():
    from yolo_dbl_tpu.losses.extra import probiou

    a = jnp.array([10.0, 10.0, 4.0, 2.0, 0.3])
    assert float(probiou(a, a)) == pytest.approx(1.0, abs=1e-3)
    far = jnp.array([100.0, 100.0, 4.0, 2.0, 0.3])
    assert float(probiou(a, far)) < 0.05
    # rotation changes similarity
    rot = jnp.array([10.0, 10.0, 4.0, 2.0, 0.3 + np.pi / 2])
    assert float(probiou(a, rot)) < float(probiou(a, a))


def test_keypoint_loss_zero_at_match():
    from yolo_dbl_tpu.losses.extra import keypoint_loss

    kpts = jnp.array([[[3.0, 4.0], [5.0, 6.0]]])
    mask = jnp.ones((1, 2))
    area = jnp.array([100.0])
    assert float(keypoint_loss(kpts, kpts, mask, area)) == pytest.approx(0.0, abs=1e-6)
    off = kpts + 5.0
    assert float(keypoint_loss(off, kpts, mask, area)) > 0.1


def test_crop_mask_loss():
    from yolo_dbl_tpu.losses.extra import crop_mask_loss

    pred = jnp.full((1, 8, 8), 10.0)  # predicts all-ones
    gt = jnp.ones((1, 8, 8))
    boxes = jnp.array([[1.0, 1.0, 6.0, 6.0]])
    w = jnp.ones((1,))
    assert float(crop_mask_loss(pred, gt, boxes, w)) < 1e-3
    gt_zero = jnp.zeros((1, 8, 8))
    assert float(crop_mask_loss(pred, gt_zero, boxes, w)) > 1.0


def test_kth_largest_matches_topk_kth_value():
    """_kth_largest (sort-free TAL threshold, losses/tal.py) equals
    lax.top_k's k-th value on distinct inputs; with duplicates it returns
    the k-th largest DISTINCT value (documented tie semantics), so the
    `>= kth` threshold admits a superset of sorted top-k."""
    from yolo_dbl_tpu.losses.tal import _kth_largest

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.permuted(np.arange(48.0 * 100).reshape(4, 12, 100),
                                 axis=-1).astype(np.float32))
    for k in (1, 10, 37):
        want = jax.lax.top_k(x, k)[0][..., -1:]
        got = _kth_largest(x, k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))

    # duplicates: [5,5,5,2,1], k=3 -> sorted kth is 5; distinct-kth is 1
    d = jnp.asarray([[5.0, 5.0, 5.0, 2.0, 1.0]])
    assert float(_kth_largest(d, 3)[0, 0]) == 1.0
    # threshold >= kth still admits all top values (superset of exact top-k)
    assert int((d >= _kth_largest(d, 3)).sum()) == 5


def test_tal_threshold_and_exact_agree_on_distinct_metrics():
    """The sort-free threshold path (TPU default) and the exact top-k path
    assign identically when align metrics are distinct and positive."""
    from yolo_dbl_tpu.losses.tal import task_aligned_assign

    rng = np.random.default_rng(1)
    b, a, nc, m = 2, 64, 3, 4
    anc = jnp.asarray(rng.uniform(0, 64, (a, 2)).astype(np.float32))
    ps = jnp.asarray(rng.uniform(0.01, 1, (b, a, nc)).astype(np.float32))
    pb = jnp.concatenate([anc[None] - 8, anc[None] + 8], -1) * jnp.ones((b, 1, 1))
    gt = jnp.asarray(np.tile([[8.0, 8.0, 56.0, 56.0]], (b, m, 1)).astype(np.float32))
    lab = jnp.zeros((b, m), jnp.int32)
    mask = jnp.asarray(np.tile([1.0, 1.0, 0.0, 0.0], (b, 1)).astype(np.float32))

    outs = [task_aligned_assign(ps, pb, anc, lab, gt, mask, topk=10,
                                num_classes=nc, exact_topk=e)
            for e in (True, False)]
    for t, f in zip(outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(t), np.asarray(f), atol=1e-6)
