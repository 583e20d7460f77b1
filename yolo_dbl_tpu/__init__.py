"""yolo_dbl_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework
with the capabilities of player4771/YOLO-DBL.

The compute path is pure JAX compiled by XLA; models are built from the same
YAML format as the reference's vendored ultralytics fork, executed as a single
traced graph instead of a per-layer Python loop.
"""

__version__ = "0.1.0"

from .nn.tasks import DetectionModel

__all__ = ["DetectionModel", "__version__"]
