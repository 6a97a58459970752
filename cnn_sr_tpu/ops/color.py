"""Color-space ops: luma extraction, mean subtraction, luma swap.

TPU-native equivalents of the reference's pre/post-processing kernels:

* ``extract_luma``  ≙ extract_luma.cl:5-21 — Rec.601 luma
  ``0.299·R + 0.587·G + 0.114·B`` from uint8 RGBA, optionally /255;
* ``subtract_mean`` ≙ DataPipeline::subtract_mean (DataPipeline.cpp:268-280:
  ``sum`` kernel + host divide + ``sub_from_all``) — here a single fused
  jnp expression with a deterministic XLA reduction instead of the
  reference's float-atomic tree reduction;
* ``swap_luma``     ≙ swap_luma.cl:19-69 — recombine the net's new luma
  (0..1) with the original image's chroma via the fixed YCbCr matrices
  (the ±128 chroma offsets cancel and are skipped, as in the reference),
  clamp to 0..255, truncate to uint8 (OpenCL convert_uint defaults to
  round-toward-zero); pixels outside the centered luma window copy the
  original image (the valid-conv padding border).

All are jit-friendly pure functions on arrays; image decode/encode lives
in ``cnn_sr_tpu.ops.image``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Rec.601 matrices (swap_luma.cl:7-16; http://www.equasys.de/colorconversion.html)
RGB2Y = jnp.array([0.299, 0.587, 0.114], dtype=jnp.float32)
RGB2CB = jnp.array([-0.1687, -0.3312, 0.5], dtype=jnp.float32)
RGB2CR = jnp.array([0.5, -0.4186, -0.0813], dtype=jnp.float32)
# YCbCr -> RGB rows (swap_luma.cl:14-16)
YCBCR2R = jnp.array([1.0, 0.0, 1.4], dtype=jnp.float32)
YCBCR2G = jnp.array([1.0, -0.343, -0.711], dtype=jnp.float32)
YCBCR2B = jnp.array([1.0, 1.765, 0.0], dtype=jnp.float32)


def extract_luma(image: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """uint8 RGB(A) (H, W, C>=3) → float32 luma (H, W).

    ``normalize=True`` divides by 255 (the ``-D NORMALIZE`` kernel
    instance; the pipeline always uses the normalized one for model
    input — Main_cl.cpp:303-318).
    """
    rgb = image[..., :3].astype(jnp.float32)
    luma = rgb @ RGB2Y
    if normalize:
        luma = luma / 255.0
    return luma


def subtract_mean(luma: jnp.ndarray):
    """Subtract the per-image mean. Returns ``(zero_mean_luma, mean)``.

    Applied to model *inputs only* (never ground truth) — Main_cl.cpp:141,
    230. The mean is returned because write-out needs nothing from it in
    the reference (swap_luma consumes the raw 0..1 net output), but
    callers may want it for diagnostics.
    """
    mean = jnp.mean(luma)
    return luma - mean, mean


def swap_luma(
    original_rgb: jnp.ndarray,
    new_luma: jnp.ndarray,
) -> jnp.ndarray:
    """Recombine net-output luma with the original image's chroma.

    ``original_rgb``: uint8 (H, W, C>=3); ``new_luma``: float (lh, lw) in
    0..1. Returns uint8 (H, W, 3). The luma window is centered with
    offset ``(W - lw) // 2`` on BOTH axes (the reference computes the
    padding from the width only — swap_luma.cl:24); border pixels pass
    the original image through (swap_luma.cl:37-42).
    """
    h, w = original_rgb.shape[0], original_rgb.shape[1]
    lh, lw = new_luma.shape[0], new_luma.shape[1]
    pad = (w - lw) // 2  # width-derived padding, per the reference

    rgbf = original_rgb[..., :3].astype(jnp.float32)
    y_new = jnp.zeros((h, w), dtype=jnp.float32)
    y_new = lax.dynamic_update_slice(y_new, new_luma.astype(jnp.float32), (pad, pad))
    y_new = y_new * 255.0

    cb = rgbf @ RGB2CB
    cr = rgbf @ RGB2CR
    ycc = jnp.stack([y_new, cb, cr], axis=-1)
    r = ycc @ YCBCR2R
    g = ycc @ YCBCR2G
    b = ycc @ YCBCR2B
    combined = jnp.stack([r, g, b], axis=-1)
    combined = jnp.clip(combined, 0.0, 255.0)
    # OpenCL convert_uint: round toward zero (truncate)
    combined = jnp.trunc(combined).astype(jnp.uint8)

    rows = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = (
        (rows >= pad) & (rows < pad + lh) & (cols >= pad) & (cols < pad + lw)
    )[..., None]
    return jnp.where(inside, combined, original_rgb[..., :3])


def swap_rgb(original_rgb: jnp.ndarray, new_rgb: jnp.ndarray) -> jnp.ndarray:
    """Full-RGB variant of ``swap_luma`` for 3-channel models: paste the
    net's 0..1 RGB output (lh, lw, 3) into the center of the original
    image, truncating to uint8; border passes through."""
    h, w = original_rgb.shape[0], original_rgb.shape[1]
    lh, lw = new_rgb.shape[0], new_rgb.shape[1]
    pad = (w - lw) // 2

    out = jnp.trunc(jnp.clip(new_rgb * 255.0, 0.0, 255.0)).astype(jnp.uint8)
    canvas = original_rgb[..., :3]
    canvas = lax.dynamic_update_slice(canvas, out, (pad, pad, 0))
    return canvas
