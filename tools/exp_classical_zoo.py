"""Classical-zoo e2e inference on the real TPU chip (BASELINE.json configs
2-3: "SSD300 inference: prior-box decode + NMS" and "Faster-RCNN ResNet-FPN
two-stage inference (RPN proposals + RoIAlign)").

Protocol = bench.py round 3: lax.scan over K distinct batches in one
dispatch, every output host-fetched; median of 3 timed trials after one
discarded cold trial. Both predict paths are fully on-device (decode + NMS
inside the jit), matching the north-star "prior-box decode ... RPN +
RoIAlign ... on TPU" requirement.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/exp_classical_zoo.py
"""

from __future__ import annotations

import statistics
import time

import jax
import jax.numpy as jnp


def bench_scan(fn, variables, shape, k, dtype=jnp.bfloat16, trials=3):
    def scan_fn(v, stacked):
        def body(_, x):
            return None, fn(v, x)

        _, outs = jax.lax.scan(body, None, stacked)
        return outs

    jfn = jax.jit(scan_fn)
    stacked = jax.block_until_ready(
        jax.random.uniform(jax.random.PRNGKey(0), (k, *shape), dtype=dtype))
    jax.block_until_ready(jfn(variables, stacked))  # compile

    def trial():
        t0 = time.perf_counter()
        outs = jfn(variables, stacked)
        leaves = jax.tree_util.tree_leaves(outs)
        _ = leaves[-1].sum().item()  # force remote completion via host fetch
        jax.block_until_ready(leaves)
        return shape[0] * k / (time.perf_counter() - t0)

    _ = trial()
    ts = [trial() for _ in range(trials)]
    del stacked
    return statistics.median(ts), ts


def main():
    from yolo_dbl_tpu.models.ssd import SSDDetector
    from yolo_dbl_tpu.models.faster_rcnn import FasterRCNN

    print(f"devices: {jax.devices()}", flush=True)

    # SSD300-VGG16, b128@300 bf16 (reference: torchvision ssd300_vgg16 path,
    # models/SSD; priors+decode+NMS all inside the jit here)
    ssd = SSDDetector(num_classes=3, backbone="vgg16", image_size=300,
                      dtype=jnp.bfloat16)
    v = ssd.init(jax.random.PRNGKey(0), batch=2)
    ssd._compute_priors(v)

    def ssd_infer(var, img):
        return ssd.predict(var, img)

    med, ts = bench_scan(ssd_infer, v, (128, 300, 300, 3), k=8)
    print(f"SSD300-VGG16 b128@300 bf16 e2e (decode+NMS on device): "
          f"{med:8.1f} img/s  {['%.0f' % t for t in ts]}", flush=True)
    del v

    # Faster-RCNN ResNet50, b16@512 f32 (two-stage: RPN propose -> RoIAlign
    # -> heads -> per-class decode + NMS, all on device)
    fr = FasterRCNN(num_classes=3, image_size=512)
    vf = fr.init(jax.random.PRNGKey(0), batch=2)

    def frcnn_infer(var, img):
        return fr.predict(var, img)

    med, ts = bench_scan(frcnn_infer, vf, (16, 512, 512, 3), k=8,
                         dtype=jnp.float32)
    print(f"FasterRCNN-R50 b16@512 f32 e2e (RPN+RoIAlign+NMS on device): "
          f"{med:8.1f} img/s  {['%.0f' % t for t in ts]}", flush=True)


if __name__ == "__main__":
    main()
