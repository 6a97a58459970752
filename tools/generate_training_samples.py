#!/usr/bin/env python
"""Generate paired training samples from a directory of images.

Equivalent of the reference's generate_training_samples.py:14-74 — this
script IS the degradation model the network learns to invert:

* for each input image: take a random ``out_size``² crop →
  ``sample_N_large.jpg`` (the ground truth);
* downscale the crop by ``--degrade-factor`` and upscale back to
  ``out_size`` with a high-quality resampler (Lanczos, PIL's successor
  to the deprecated ANTIALIAS) → ``sample_N_small.jpg`` (the degraded
  input). The net learns small-luma → large-luma.

Usage:
    python tools/generate_training_samples.py -i raw_dir -o samples_dir -s 128 -d 2
"""

from __future__ import annotations

import argparse
import os
import random
import sys

from PIL import Image


def _degrade_pil(large, out_size, degrade_factor):
    small_size = max(1, int(out_size / degrade_factor))
    small = large.resize((small_size, small_size), Image.LANCZOS)
    return small.resize((out_size, out_size), Image.LANCZOS)


def _degrade_jax(large, out_size, degrade_factor):
    """On-device degradation via the framework's jitted resize ops
    (ops/resize.degrade) — the 'input pipeline fused on-device' variant."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax.numpy as jnp

    from cnn_sr_tpu.ops.resize import degrade

    arr = jnp.asarray(np.asarray(large), jnp.float32)
    soft = degrade(arr, degrade_factor, method="lanczos")
    out = np.clip(np.round(np.asarray(soft)), 0, 255).astype("uint8")
    return Image.fromarray(out, "RGB")


def process_image(in_path, out_dir, img_id, out_size, degrade_factor, rng,
                  backend="pil", fmt="jpg"):
    with Image.open(in_path) as im:
        if im.width < out_size or im.height < out_size:
            raise ValueError(
                f"Image '{os.path.basename(in_path)}' is smaller than the "
                f"requested out-size {out_size}"
            )
        x = rng.randint(0, im.width - out_size)
        y = rng.randint(0, im.height - out_size)
        large = im.convert("RGB").crop((x, y, x + out_size, y + out_size))

    large_path = os.path.join(out_dir, f"sample_{img_id}_large.{fmt}")
    small_path = os.path.join(out_dir, f"sample_{img_id}_small.{fmt}")
    large.save(large_path)

    if backend == "jax":
        small = _degrade_jax(large, out_size, degrade_factor)
    else:
        small = _degrade_pil(large, out_size, degrade_factor)
    small.save(small_path)
    return large_path, small_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="Create paired *_large/*_small training samples by "
        "cropping and degrade-resampling input images."
    )
    p.add_argument("--in-dir", "-i", required=True, help="input directory")
    p.add_argument("--out-dir", "-o", required=True, help="output directory")
    p.add_argument("--out-size", "-s", required=True, type=int,
                   help="size of output (square) samples")
    p.add_argument("--degrade-factor", "-d", type=float, default=2,
                   help="downscale factor used to produce the degraded image")
    p.add_argument("--seed", type=int, default=None, help="crop RNG seed")
    p.add_argument("--backend", choices=["pil", "jax"], default="pil",
                   help="degradation backend: PIL (host) or the framework's "
                   "on-device jitted resize")
    p.add_argument("--format", choices=["jpg", "png"], default="jpg",
                   dest="fmt",
                   help="sample file format: jpg (reference parity) or png "
                   "(lossless — JPEG ringing on edge-dense content puts an "
                   "unlearnable-noise floor under training)")
    args = p.parse_args(argv)

    rng = random.Random(args.seed)
    files = sorted(
        f for f in os.listdir(args.in_dir)
        if os.path.isfile(os.path.join(args.in_dir, f))
    )
    os.makedirs(args.out_dir, exist_ok=True)

    created = []
    for img_id, name in enumerate(files):
        try:
            created.append(
                process_image(
                    os.path.join(args.in_dir, name), args.out_dir,
                    img_id, args.out_size, args.degrade_factor, rng,
                    backend=args.backend, fmt=args.fmt,
                )
            )
        except (OSError, ValueError) as e:
            print(f"cannot create train samples for '{name}': {e}")

    if not created:
        print("No files were created")
        return 1
    print(f"created {len(created)} sample pairs")
    return 0


if __name__ == "__main__":
    sys.exit(main())
