"""Model export — TPU-native deployment formats.

Equivalent of the reference's Exporter (engine/exporter.py:107,181 — 16
torch formats: torchscript/onnx/openvino/tensorrt/coreml/tf*/paddle/...).
The JAX-native deployment story is different and simpler: the jitted
inference function IS the deployable artifact. Supported formats:

  * stablehlo   — serialized StableHLO via jax.export (the portable IR that
                  TensorRT/ONNX occupied for torch; loadable from any
                  XLA-compatible runtime);
  * saved_model — TensorFlow SavedModel via jax2tf (covers the reference's
                  saved_model/pb/tflite/tfjs family: those convert FROM
                  SavedModel with stock TF tooling);
  * tflite     — TFLite flatbuffer through the jax2tf → TFLiteConverter path
                  (float, int8-PTQ, or dynamic-range quantized);
  * pb         — frozen TensorFlow GraphDef (variables folded to constants),
                  the reference's 'pb' row;
  * deploy     — the framework's own pickle of params + model yaml
                  (reference torchscript/.pt analogue).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

FORMATS = ("stablehlo", "saved_model", "tflite", "pb", "deploy")


class Exporter:
    def __init__(self, model, variables, imgsz: int = 640, batch: int = 1, with_nms: bool = False,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300):
        self.model = model
        self.variables = variables
        self.imgsz = imgsz
        self.batch = batch
        self.with_nms = with_nms
        self.conf, self.iou, self.max_det = conf, iou, max_det

    def _infer_fn(self):
        model, variables = self.model, self.variables

        if self.with_nms:
            from ..ops.nms import non_max_suppression

            def fn(img):
                pred = model.predict(variables, img)
                return non_max_suppression(
                    pred, conf_thres=self.conf, iou_thres=self.iou, max_det=self.max_det
                )

        else:

            def fn(img):
                return model.predict(variables, img)

        return fn

    def _example_input(self):
        return jnp.zeros((self.batch, self.imgsz, self.imgsz, 3), jnp.float32)

    def export_stablehlo(self, path, platforms=("cpu", "tpu")) -> Path:
        """Serialize to portable StableHLO bytes (jax.export), multi-platform
        lowered so the artifact runs on CPU and TPU alike."""
        from jax import export as jax_export

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        fn = jax.jit(self._infer_fn())
        exported = jax_export.export(fn, platforms=list(platforms))(
            jax.ShapeDtypeStruct((self.batch, self.imgsz, self.imgsz, 3), jnp.float32)
        )
        path.write_bytes(exported.serialize())
        return path

    def export_saved_model(self, path) -> Path:
        """TensorFlow SavedModel via jax2tf."""
        import tensorflow as tf
        from jax.experimental import jax2tf

        path = Path(path)
        tf_fn = tf.function(
            jax2tf.convert(self._infer_fn(), with_gradient=False,
                           native_serialization_platforms=("cpu", "tpu")),
            input_signature=[tf.TensorSpec((self.batch, self.imgsz, self.imgsz, 3), tf.float32)],
            autograph=False,
        )
        module = tf.Module()
        module.serve = tf_fn
        tf.saved_model.save(module, str(path), signatures={"serving_default": tf_fn})
        return path

    def export_tflite(self, path, int8: bool = False, representative_data=None,
                      n_calib: int = 8, weights_only: bool = False) -> Path:
        """TFLite flatbuffer via the jax2tf concrete function.

        int8=True runs post-training quantization with a representative
        dataset (the reference's `int8` tflite mode — exporter.py:118 flag,
        exporter.py:1173 representative_dataset_gen feeding img/255 batches).
        Weights + activations are quantized where the toolchain supports it,
        with float I/O and float fallback for the remaining select-TF ops —
        the quantized-serving analogue for TPU-world deployment. Full-PTQ
        accuracy depends on calibration data that matches the trained
        activation ranges; pass real frames via representative_data.

        weights_only=True does dynamic-range quantization instead (int8
        weights, float activations — the reference's `half`-ish middle
        ground): ~4x smaller artifact with near-float accuracy and no
        calibration requirement.

        Args:
            representative_data: iterable of (H, W, 3) or (B, H, W, 3)
                float [0,1] arrays for calibration; random frames if None.
            n_calib: number of random calibration samples when no data given.
        """
        import numpy as np
        import tensorflow as tf
        from jax.experimental import jax2tf

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        tf_fn = tf.function(
            jax2tf.convert(self._infer_fn(), with_gradient=False,
                           native_serialization_platforms=("cpu",)),
            input_signature=[tf.TensorSpec((self.batch, self.imgsz, self.imgsz, 3), tf.float32)],
            autograph=False,
        )
        converter = tf.lite.TFLiteConverter.from_concrete_functions([tf_fn.get_concrete_function()])
        converter.target_spec.supported_ops = [
            tf.lite.OpsSet.TFLITE_BUILTINS,
            tf.lite.OpsSet.SELECT_TF_OPS,
        ]
        if weights_only:
            converter.optimizations = [tf.lite.Optimize.DEFAULT]
        elif int8:
            batch, imgsz = self.batch, self.imgsz

            def rep_gen():
                if representative_data is not None:
                    for arr in representative_data:
                        arr = np.asarray(arr, np.float32)
                        if arr.ndim == 3:
                            arr = arr[None]
                        if arr.shape[0] != batch:  # tile/trim to the fixed batch
                            arr = np.resize(arr, (batch, *arr.shape[1:]))
                        yield [arr]
                else:
                    rng = np.random.default_rng(0)
                    for _ in range(n_calib):
                        yield [rng.random((batch, imgsz, imgsz, 3), np.float32)]

            converter.optimizations = [tf.lite.Optimize.DEFAULT]
            converter.representative_dataset = rep_gen
        path.write_bytes(converter.convert())
        return path

    def export_pb(self, path) -> Path:
        """Frozen TensorFlow GraphDef (.pb) — the reference's `pb` format
        (exporter.py:181 table row 'TensorFlow GraphDef'): the jax2tf
        concrete function with all variables folded to constants, loadable
        via tf.import_graph_def (nn/autobackend.py handles load-back)."""
        import tensorflow as tf
        from jax.experimental import jax2tf
        from tensorflow.python.framework.convert_to_constants import (
            convert_variables_to_constants_v2,
        )

        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        tf_fn = tf.function(
            jax2tf.convert(self._infer_fn(), with_gradient=False,
                           native_serialization_platforms=("cpu",)),
            input_signature=[tf.TensorSpec((self.batch, self.imgsz, self.imgsz, 3), tf.float32)],
            autograph=False,
        )
        frozen = convert_variables_to_constants_v2(tf_fn.get_concrete_function())
        tf.io.write_graph(frozen.graph.as_graph_def(), str(path.parent), path.name,
                          as_text=False)
        return path

    def export_deploy(self, path) -> Path:
        from ..utils.checkpoint import save_deploy

        save_deploy(path, self.variables, model_yaml=getattr(self.model, "yaml", {}),
                    nc=getattr(self.model, "nc", None))
        return Path(path)

    def __call__(self, fmt: str = "stablehlo", path: Optional[str] = None) -> Path:
        if fmt not in FORMATS:
            raise ValueError(f"format '{fmt}' not supported; choose from {FORMATS}")
        path = path or f"model.{fmt}"
        return getattr(self, f"export_{fmt}")(path)


def load_stablehlo(path):
    """Rehydrate an exported StableHLO artifact into a callable."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call
