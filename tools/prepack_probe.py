#!/usr/bin/env python
"""A/B probe: deep-stack producer-side prepack threshold.

Measures the 7-layer RGB 1080p pipeline with
``fused_forward(prepack_max_deep=...)`` ∈ {128 (shipped), 192 (adds the
k=64 layers), 384 (adds the k=128 layer)} in INTERLEAVED rounds (the
tunnel drifts percent-level between sessions — same-session pairings
only). Prepacking trades the consumer's per-chunk patch build (f
shifted-slice stores + the src re-read) for (f−1)·k extra act lanes at
the producer's store; past 128 lanes the extra is no longer covered by
the ref's existing lane pad, so VMEM grows — this probe answers whether
the traffic saving pays for it.

Usage: python tools/prepack_probe.py [--iters 20] [--rounds 3]
Serialize with other TPU jobs (docs/BENCHMARKS.md).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cnn_sr_tpu.ops.color import swap_rgb
from cnn_sr_tpu.ops.pallas_fused import fused_forward
from cnn_sr_tpu.utils.config import parse_config
from cnn_sr_tpu.utils.params_io import random_parameters


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--thresholds", type=int, nargs="*",
                   default=[128, 192, 384])
    args = p.parse_args(argv)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = parse_config(json.load(open(
        os.path.join(here, "configs", "waifu2x_7layer_rgb.json"))))
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1080, 1920, 4), dtype=np.uint8))

    runners = {}
    for thr in args.thresholds:
        @jax.jit
        def run(im, thr=thr):
            def body(c, _):
                rgb = c[..., :3].astype(jnp.float32) / 255.0
                mean = jnp.mean(rgb, axis=(0, 1), keepdims=True)
                y = fused_forward(params, (rgb - mean)[None],
                                  input_int8=True,
                                  prepack_max_deep=thr)[0]
                out = swap_rgb(c, y)
                return c.at[0, 0, 0].set(out[0, 0, 0]), ()
            return jax.lax.scan(body, im, None, length=args.iters)[0]
        runners[thr] = run

    # compile + warm all variants first (compile cost must not land in
    # round 0's timing), then interleave timed rounds
    for thr, run in runners.items():
        t0 = time.perf_counter()
        try:
            _ = np.asarray(run(img)[0, 0, 0])
        except Exception as e:  # noqa: BLE001 — report, drop variant
            print(json.dumps({"thr": thr, "error": repr(e)[:200]}),
                  flush=True)
            runners[thr] = None
            continue
        print(f"# thr={thr} compiled+warm in "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    times = {thr: [] for thr in runners}
    for r in range(args.rounds):
        for thr, run in runners.items():
            if run is None:
                continue
            t0 = time.perf_counter()
            _ = np.asarray(run(img)[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            times[thr].append(dt)
            print(json.dumps({"round": r, "thr": thr,
                              "ms": round(dt * 1e3, 2),
                              "mpix_s": round(1080 * 1920 / dt / 1e6, 1)}),
                  flush=True)
    for thr, ts in times.items():
        if ts:
            m = min(ts)
            print(json.dumps({"thr": thr, "best_ms": round(m * 1e3, 2),
                              "best_mpix_s":
                              round(1080 * 1920 / m / 1e6, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
