"""Native (C++) runtime components.

`loader` — the data-loader core: JPEG/PNG decode + letterbox + collate over
a persistent worker pool (counterpart of the reference's torch-DataLoader
C++ worker pool + cv2 native imread/resize). Built on first use with g++;
everything degrades gracefully to the pure-Python path when a toolchain is
unavailable (`loader.is_available()`).
"""

from . import loader  # noqa: F401
