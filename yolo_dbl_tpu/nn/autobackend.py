"""Uniform inference wrapper over deployment formats.

Equivalent of the reference's AutoBackend (nn/autobackend.py:158-489 — 13
torch-ecosystem backends). The JAX deployment surface is narrower by design
(engine/exporter.py): native deploy checkpoints, serialized StableHLO, and
TF SavedModel all load into one callable with a `warmup` like the
reference's.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


class AutoBackend:
    """AutoBackend(weights).__call__(img) → (B, 4+nc, A) decoded predictions."""

    def __init__(self, weights: str, imgsz: int = 640):
        self.path = Path(weights)
        self.imgsz = imgsz
        suffix = self.path.suffix.lower()
        self.format: str
        self.nc: Optional[int] = None
        self.names = {}
        if suffix in (".ckpt", ".pkl", ".bin"):
            from ..engine.model import YOLO

            y = YOLO(str(self.path))
            self.nc = y.nc
            self.names = y.names
            model, variables = y.model, y._ensure_variables(imgsz)
            self._fn = jax.jit(lambda img: model.predict(variables, img))
            self.format = "deploy"
        elif suffix in (".stablehlo", ".hlo"):
            from ..engine.exporter import load_stablehlo

            self._fn = load_stablehlo(self.path)
            self.format = "stablehlo"
        elif self.path.is_dir() and (self.path / "saved_model.pb").exists():
            import tensorflow as tf

            loaded = tf.saved_model.load(str(self.path))
            serve = loaded.signatures["serving_default"]
            # serving signatures are keyword-only (input name from the spec)
            kw_name = next(iter(serve.structured_input_signature[1]))

            def fn(img):
                out = serve(**{kw_name: tf.constant(np.asarray(img, np.float32))})
                return jnp.asarray(next(iter(out.values())))

            self._fn = fn
            self.format = "saved_model"
        elif suffix == ".tflite":
            import tensorflow as tf

            interp = tf.lite.Interpreter(model_path=str(self.path))
            interp.allocate_tensors()
            inp = interp.get_input_details()[0]
            outs = interp.get_output_details()

            def fn(img):
                interp.set_tensor(inp["index"], np.asarray(img, np.float32))
                interp.invoke()
                res = [interp.get_tensor(d["index"]) for d in outs]
                return jnp.asarray(res[0] if len(res) == 1 else
                                   max(res, key=lambda a: a.size))

            self._fn = fn
            self.format = "tflite"
        elif suffix == ".pb":
            # frozen GraphDef (Exporter.export_pb; reference AutoBackend pb
            # branch, nn/autobackend.py 'graph_def'): import and prune to the
            # placeholder input and the terminal Identity outputs
            import tensorflow as tf

            gd = tf.compat.v1.GraphDef()
            gd.ParseFromString(self.path.read_bytes())
            wrapped = tf.compat.v1.wrap_function(
                lambda: tf.compat.v1.import_graph_def(gd, name=""), [])
            g = wrapped.graph
            inputs = [op.outputs[0] for op in g.get_operations() if op.type == "Placeholder"]
            consumed = {t.name for op in g.get_operations() for t in op.inputs}
            outputs = [op.outputs[0] for op in g.get_operations()
                       if op.type == "Identity" and op.outputs[0].name not in consumed]
            serve = wrapped.prune(inputs, outputs or [g.get_operations()[-1].outputs[0]])

            def fn(img):
                res = serve(tf.constant(np.asarray(img, np.float32)))
                res = [np.asarray(r) for r in (res if isinstance(res, (list, tuple)) else [res])]
                return jnp.asarray(res[0] if len(res) == 1 else
                                   max(res, key=lambda a: a.size))

            self._fn = fn
            self.format = "pb"
        elif suffix == ".yaml":
            # bare config → random-init model (reference AutoBackend pt-from-yaml path)
            from ..nn.tasks import DetectionModel

            m = DetectionModel(str(self.path))
            v = m.init(jax.random.PRNGKey(0), imgsz=imgsz)
            self.nc = m.nc
            self._fn = jax.jit(lambda img: m.predict(v, img))
            self.format = "yaml"
        else:
            raise ValueError(f"unsupported weights format: {weights}")

    def warmup(self, shape=(1, 640, 640, 3)):
        out = self._fn(jnp.zeros(shape, jnp.float32))
        jax.block_until_ready(out)
        return self

    def __call__(self, img):
        return self._fn(img)
