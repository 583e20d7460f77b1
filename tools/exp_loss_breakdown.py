"""Decompose detection_loss's 67.8 ms forward at b48 (round 4).

tools/exp_train_breakdown.py --batch 48 measured loss_fwd 67.8 ms +
grad_loss 22.2 ms = ~35% of the 260 ms b48 train step — the largest single
cost after round 3. The (B, M, A) assigner tensors are only ~26 MB each, so
HBM traffic cannot explain it; the suspects are op LOWERINGS:

  * jax.lax.top_k over A=8400 per (B, M) row — XLA:TPU lowers top_k as a
    full sort (bitonic, VPU-serial) when k is not tiny relative to n;
  * take_along_axis gathers (bbox_scores per-GT class pick, DFL two-bin
    cross-entropy) — gathers are scatter-class on TPU;
  * the CIoU chain (long elementwise sequences, f32).

Each piece is slope-timed at the real shapes. Run on the chip:
    python tools/exp_loss_breakdown.py [--batch 48]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

R_LO, R_HI = 2, 8


def slope_time(name, fn, make_input):
    xs_hi = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls),
        *[make_input(jax.random.PRNGKey(i)) for i in range(R_HI)])
    xs_hi = jax.block_until_ready(xs_hi)
    xs_lo = jax.tree_util.tree_map(lambda l: l[:R_LO], xs_hi)

    def many(xs):
        def body(acc, x):
            out = fn(*x)  # make_input always returns a tuple of args
            return acc + sum(jnp.sum(l.astype(jnp.float32))
                             for l in jax.tree_util.tree_leaves(out)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    jit = jax.jit(many)

    def best_of(xs, tries=5):
        jit(xs).item()
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            jit(xs).item()
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(xs_lo)
    t_hi = best_of(xs_hi)
    ms = (t_hi - t_lo) / (R_HI - R_LO) * 1e3
    print(f"{name:44s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    args = ap.parse_args()
    b = args.batch
    print(f"# devices: {jax.devices()}  batch={b}", file=sys.stderr)

    from yolo_dbl_tpu.losses.detection import _df_loss, detection_loss
    from yolo_dbl_tpu.losses.tal import task_aligned_assign
    from yolo_dbl_tpu.ops.boxes import bbox_iou

    m, nc, reg_max = 16, 3, 16
    strides = (8, 16, 32)
    imgsz = 640
    a = sum((imgsz // s) ** 2 for s in strides)  # 8400
    feat_shapes = [(b, imgsz // s, imgsz // s, 4 * reg_max + nc) for s in strides]

    def mkfeats(k):
        return tuple(jax.random.normal(jax.random.fold_in(k, i), s, jnp.float32)
                     for i, s in enumerate(feat_shapes))

    batch0 = {
        "img": jnp.zeros((b, imgsz, imgsz, 3), jnp.float32),
        "gt_boxes": jnp.tile(jnp.asarray([[[0.5, 0.5, 0.4, 0.4]]], jnp.float32), (b, m, 1)),
        "gt_cls": jnp.zeros((b, m), jnp.int32),
        "gt_mask": jnp.pad(jnp.ones((b, 2), jnp.float32), ((0, 0), (0, m - 2))),
    }

    slope_time("detection_loss full fwd",
               lambda *f: detection_loss(list(f), batch0, strides, nc)[0], mkfeats)

    # --- assigner at its real input shapes --------------------------------
    anc = jax.random.uniform(jax.random.PRNGKey(9), (a, 2), jnp.float32) * imgsz

    def mk_assign(k):
        return (jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(k, 0), (b, a, nc), jnp.float32)),
                jax.random.uniform(jax.random.fold_in(k, 1), (b, a, 4), jnp.float32) * imgsz)

    gt_bboxes = jnp.tile(jnp.asarray([[[100., 100., 400., 400.]]], jnp.float32), (b, m, 1))
    gt_labels = jnp.zeros((b, m), jnp.int32)
    mask_gt = jnp.pad(jnp.ones((b, 2), jnp.float32), ((0, 0), (0, m - 2)))

    slope_time("task_aligned_assign",
               lambda ps, pb: task_aligned_assign(ps, pb, anc, gt_labels,
                                                  gt_bboxes, mask_gt, topk=10,
                                                  num_classes=nc),
               mk_assign)

    # --- the individual suspects -------------------------------------------
    def mk_metric(k):
        return (jax.random.uniform(k, (b, m, a), jnp.float32),)

    slope_time("lax.top_k(k=10) over (B,M,8400)",
               lambda x: jax.lax.top_k(x, 10)[0], mk_metric)

    def kth_iterative(x, k=10):
        """k-th largest per row via k max+mask passes (no sort)."""
        cur = x
        for _ in range(k - 1):
            mx = cur.max(axis=-1, keepdims=True)
            cur = jnp.where(cur >= mx, -jnp.inf, cur)
        return cur.max(axis=-1, keepdims=True)

    slope_time("kth-largest via 10 max+mask passes",
               lambda x: kth_iterative(x), mk_metric)

    def mk_iou(k):
        return (jax.random.uniform(jax.random.fold_in(k, 0), (b, m, 1, 4), jnp.float32) * imgsz,
                jax.random.uniform(jax.random.fold_in(k, 1), (b, 1, a, 4), jnp.float32) * imgsz)

    slope_time("bbox_iou CIoU (B,M,A)",
               lambda g, p: bbox_iou(g, p, xywh=False, CIoU=True), mk_iou)

    def mk_dfl(k):
        return (jax.random.normal(jax.random.fold_in(k, 0), (b, a, 4, reg_max), jnp.float32),
                jax.random.uniform(jax.random.fold_in(k, 1), (b, a, 4), jnp.float32) * (reg_max - 1))

    slope_time("_df_loss (take_along_axis form)", _df_loss, mk_dfl)

    def df_loss_onehot(pred_dist, target, reg_max=16):
        """Same math, gather-free: two-bin CE via iota-compare one-hots."""
        target = jnp.clip(target, 0, reg_max - 1 - 0.01)
        tl = jnp.floor(target)
        wl = tl + 1.0 - target
        logp = jax.nn.log_softmax(pred_dist, axis=-1)
        iota = jnp.arange(reg_max, dtype=target.dtype)
        oh_l = (iota == tl[..., None]).astype(logp.dtype)
        oh_r = (iota == jnp.minimum(tl + 1, reg_max - 1)[..., None]).astype(logp.dtype)
        ce_l = -(logp * oh_l).sum(-1)
        ce_r = -(logp * oh_r).sum(-1)
        return (ce_l * wl + ce_r * (1.0 - wl)).mean(axis=-1)

    slope_time("_df_loss (one-hot compare form)", df_loss_onehot, mk_dfl)

    def mk_bce(k):
        return (jax.random.normal(jax.random.fold_in(k, 0), (b, a, nc), jnp.float32),
                jax.random.uniform(jax.random.fold_in(k, 1), (b, a, nc), jnp.float32))

    from yolo_dbl_tpu.losses.detection import _bce_with_logits
    slope_time("BCE (B,A,nc)", _bce_with_logits, mk_bce)

    def mk_ps(k):
        return (jax.random.uniform(k, (b, nc, a), jnp.float32),)

    labels = jnp.zeros((b, m, 1), jnp.int32)
    slope_time("take_along_axis class pick (B,nc,A)",
               lambda ps: jnp.take_along_axis(ps, labels, axis=1), mk_ps)


if __name__ == "__main__":
    main()
