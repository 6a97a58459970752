#!/usr/bin/env python
"""A/B probe: dy-packed small-n dots threshold (``dypack_max_n``) on TPU.

Runs the 7-layer RGB model at 1080p with dypack_max_n in {0, 32, 64}
(0 = separated-phase dots everywhere — the shipped sep default;
the threshold gates on each layer's n: 32 dy-packs the n=32 middles
[32→32], 64 additionally the n=64 ones [32→64, 64→64]; n=128 layers
are ineligible — ⌈3·128/128⌉ == 3 saves nothing) and reports ms/frame
via the dependency-chained scan + host readback recipe
(docs/BENCHMARKS.md). Serialize: nothing else may use the TPU.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/dypack_probe.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--thresholds", type=int, nargs="+", default=[0, 32, 64])
    p.add_argument("--config", choices=("flagship", "rgb"), default="rgb")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    if args.config == "rgb":
        cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "waifu2x_7layer_rgb.json")
        with open(cfg_path) as fh:
            cfg = parse_config(json.load(fh))
        chans = 3
    else:
        from __graft_entry__ import _flagship
        cfg = _flagship()
        chans = 1
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0)
                    .random((1, 1080, 1920, chans), np.float32) - 0.5)

    def bench(thr: int) -> float:
        @jax.jit
        def chained(a):
            def body(c, _):
                y = pallas_fused.fused_forward(
                    params, c, input_int8=True, dypack_max_n=thr)
                return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
            return lax.scan(body, a, None, length=args.iters)[0]

        _ = np.asarray(chained(x)[0, 0, 0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(chained(x)[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    # interleave A/B repeats so tunnel drift cannot masquerade as a win
    results = {t: [] for t in args.thresholds}
    for rep in range(3):
        for t in args.thresholds:
            ms = bench(t)
            results[t].append(ms)
            print(f"rep {rep} dypack_max_n={t:<4} {ms:7.2f} ms/frame",
                  flush=True)
    print("\nbest-of-3:")
    for t in args.thresholds:
        print(f"  dypack_max_n={t:<4} {min(results[t]):7.2f} ms/frame")
    return 0


if __name__ == "__main__":
    sys.exit(main())
