"""Host-side image decode/encode (the pipeline's disk edges).

Equivalent of the reference's stb-based IO (UtilsOpenCL.cpp:88-123):

* ``load_image``  ≙ opencl::utils::load_image — decode any PIL-supported
  format, force RGBA (stbi_load with 4 requested channels);
* ``write_image`` ≙ opencl::utils::write_image — PNG encode;
* ``write_greyscale_image`` ≙ the float-array → min-max-normalized
  greyscale PNG helper (UtilsOpenCL.cpp:97-123), used by weight
  visualization and debugging.

These run on host; device transfer happens implicitly when the arrays
enter a jitted function (the only host↔device crossings in the pipeline,
matching the reference's single upload/readback per image).
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image(path: str) -> np.ndarray:
    """Decode an image file to uint8 RGBA (H, W, 4) — native libjpeg/libpng
    codecs when built, PIL otherwise (and for formats the native layer
    doesn't handle)."""
    try:
        from .. import native

        if native.available():
            return native.decode_rgba(path)
    except (IOError, OSError):
        pass  # unsupported format or native decode failure → PIL
    with Image.open(path) as im:
        return np.asarray(im.convert("RGBA"), dtype=np.uint8)


def write_image(path: str, rgb: np.ndarray) -> None:
    """Encode a uint8 (H, W, 3) array as PNG/JPEG by extension (native
    libpng/libjpeg encoders when built, PIL otherwise)."""
    arr = np.ascontiguousarray(rgb, dtype=np.uint8)
    lower = path.lower()
    try:
        from .. import native

        if native.available():
            if lower.endswith(".png"):
                native.encode_png(path, arr)
                return
            if lower.endswith((".jpg", ".jpeg")):
                native.encode_jpeg(path, arr)
                return
    except (IOError, OSError):
        pass
    Image.fromarray(arr, mode="RGB").save(path)


def write_greyscale_image(path: str, data: np.ndarray) -> None:
    """Min-max-normalize a float array (H, W) to 0..255 greyscale and
    write it (UtilsOpenCL.cpp:97-123)."""
    arr = np.asarray(data, dtype=np.float32)
    lo, hi = float(arr.min()), float(arr.max())
    if hi > lo:
        norm = (arr - lo) / (hi - lo)
    else:
        norm = np.full_like(arr, 0.5)
    Image.fromarray((norm * 255.0).astype(np.uint8), mode="L").save(path)
