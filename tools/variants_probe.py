#!/usr/bin/env python
"""Interleaved A/B of fused_forward keyword variants on the real chip.

Generalizes prepack_probe.py: each VARIANT is `name=json-kwargs`, e.g.

    python tools/variants_probe.py --config rgb \
        'vpu={"mm_last": false}' 'mm={"mm_last": true}'

All variants run the full image pipeline (luma or RGB ends per config)
in dependency-chained scans, compiled+warmed first, then timed in
interleaved rounds (the tunnel drifts percent-level between sessions —
only same-session pairings are comparable; docs/BENCHMARKS.md).
Serialize with other TPU jobs. The fixed ~30 ms dispatch cost adds
~30/iters ms to every reading — deltas between variants are unaffected.
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

from cnn_sr_tpu.ops.color import extract_luma, subtract_mean, swap_luma, swap_rgb
from cnn_sr_tpu.ops.pallas_fused import fused_forward
from cnn_sr_tpu.utils.config import parse_config
from cnn_sr_tpu.utils.params_io import random_parameters


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("variants", nargs="+",
                   help="name=json-kwargs for fused_forward")
    p.add_argument("--config", choices=("flagship", "rgb", "915"),
                   default="rgb")
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.config == "rgb":
        cfg = parse_config(json.load(open(
            os.path.join(here, "configs", "waifu2x_7layer_rgb.json"))))
    elif args.config == "915":
        cfg = parse_config(json.load(open(
            os.path.join(here, "configs", "srcnn_9-1-5.json"))))
    else:
        sys.path.insert(0, here)
        from __graft_entry__ import _flagship
        cfg = _flagship()
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (1080, 1920, 4), dtype=np.uint8))
    rgb_mode = cfg.channels == 3

    runners = {}
    for spec in args.variants:
        name, _, js = spec.partition("=")
        kw = json.loads(js) if js else {}

        @jax.jit
        def run(im, kw=kw):
            def body(c, _):
                if rgb_mode:
                    rgb = c[..., :3].astype(jnp.float32) / 255.0
                    mean = jnp.mean(rgb, axis=(0, 1), keepdims=True)
                    y = fused_forward(params, (rgb - mean)[None],
                                      input_int8=True, **kw)[0]
                    out = swap_rgb(c, y)
                else:
                    luma = extract_luma(c, normalize=True)
                    luma0, _ = subtract_mean(luma)
                    y = fused_forward(params, luma0[None, ..., None],
                                      input_int8=True, **kw)[0, ..., 0]
                    out = swap_luma(c, y)
                return c.at[0, 0, 0].set(out[0, 0, 0]), ()
            return jax.lax.scan(body, im, None, length=args.iters)[0]
        runners[name] = run

    for name in list(runners):
        t0 = time.perf_counter()
        try:
            _ = np.asarray(runners[name](img)[0, 0, 0])
        except Exception as e:  # noqa: BLE001 — report, drop variant
            print(json.dumps({"variant": name, "error": repr(e)[:200]}),
                  flush=True)
            runners[name] = None
            continue
        print(f"# {name} compiled+warm in {time.perf_counter() - t0:.0f}s",
              flush=True)

    times = {name: [] for name in runners}
    for r in range(args.rounds):
        for name, run in runners.items():
            if run is None:
                continue
            t0 = time.perf_counter()
            _ = np.asarray(run(img)[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.iters
            times[name].append(dt)
            print(json.dumps({"round": r, "variant": name,
                              "ms": round(dt * 1e3, 2),
                              "mpix_s": round(1080 * 1920 / dt / 1e6, 1)}),
                  flush=True)
    for name, ts in times.items():
        if ts:
            m = min(ts)
            print(json.dumps({"variant": name, "best_ms": round(m * 1e3, 2),
                              "best_mpix_s":
                              round(1080 * 1920 / m / 1e6, 1)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
