"""Triton Inference Server client.

Equivalent of the reference's utils/triton.py TritonRemoteModel (:9): call a
remote model by name with numpy inputs, get numpy outputs. The reference
requires the `tritonclient` package; this implementation speaks Triton's
KServe-v2 REST protocol directly over stdlib HTTP (binary tensor extension
not used — JSON payloads), so it works without extra dependencies and can be
pointed at any v2-compatible server.
"""

from __future__ import annotations

import json
import urllib.request
from typing import List, Sequence
from urllib.parse import urlsplit

import numpy as np

_DTYPES = {
    "FP32": np.float32, "FP16": np.float16, "FP64": np.float64,
    "INT64": np.int64, "INT32": np.int32, "INT16": np.int16, "INT8": np.int8,
    "UINT8": np.uint8, "BOOL": np.bool_,
}
_NP2TRITON = {v: k for k, v in _DTYPES.items()}


class TritonRemoteModel:
    """Remote Triton model callable with numpy arrays (reference triton.py:9).

    >>> model = TritonRemoteModel("http://localhost:8000/yolo")
    >>> out = model(np.zeros((1, 3, 640, 640), np.float32))
    """

    def __init__(self, url: str, endpoint: str = "", scheme: str = ""):
        if not endpoint and not scheme:
            parts = urlsplit(url)
            endpoint = parts.path.strip("/").split("/")[0]
            scheme = parts.scheme or "http"
            url = parts.netloc
        self.endpoint = endpoint
        self.scheme = scheme or "http"
        self.url = url
        self.base = f"{self.scheme}://{self.url}/v2/models/{self.endpoint}"
        meta = self._get(f"{self.base}")
        self.input_names: List[str] = [i["name"] for i in meta["inputs"]]
        self.input_formats: List[str] = [i["datatype"] for i in meta["inputs"]]
        self.np_input_formats = [_DTYPES[f] for f in self.input_formats]
        self.output_names: List[str] = [o["name"] for o in meta["outputs"]]
        self.metadata = meta

    @staticmethod
    def _get(url):
        with urllib.request.urlopen(url, timeout=30) as r:
            return json.loads(r.read())

    @staticmethod
    def _post(url, payload):
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def __call__(self, *inputs: np.ndarray) -> Sequence[np.ndarray]:
        assert len(inputs) == len(self.input_names), (
            f"model {self.endpoint} expects {len(self.input_names)} inputs, got {len(inputs)}")
        payload = {"inputs": [], "outputs": [{"name": n} for n in self.output_names]}
        for name, fmt, np_fmt, x in zip(self.input_names, self.input_formats,
                                        self.np_input_formats, inputs):
            x = np.asarray(x, np_fmt)
            payload["inputs"].append({
                "name": name, "shape": list(x.shape), "datatype": fmt,
                "data": x.reshape(-1).tolist(),
            })
        resp = self._post(f"{self.base}/infer", payload)
        outs = []
        for o in resp["outputs"]:
            arr = np.asarray(o["data"], _DTYPES[o["datatype"]]).reshape(o["shape"])
            outs.append(arr)
        return outs
