#!/usr/bin/env python
"""A/B probe: plane first-layer block height (``l1_rows``) on TPU.

The raw-plane first layer builds conv1's operands per R-row x 128-col
block (lane rolls + MXU identity-dot transpose). R=16 (S=24 slab at
f1<=9) halves the transpose passes and cuts roll traffic ~25% per row
vs the original R=8/S=16 at identical main-dot pass counts. Reports
ms/frame per config via the dependency-chained scan + host readback
recipe (docs/BENCHMARKS.md). Serialize: nothing else may use the TPU.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/l1rows_probe.py
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
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--rows", type=int, nargs="+", default=[8, 16])
    p.add_argument("--configs", nargs="+", default=["flagship", "rgb"])
    p.add_argument("--reps", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    def load(name):
        if name == "rgb":
            cfg_path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs", "waifu2x_7layer_rgb.json")
            with open(cfg_path) as fh:
                return parse_config(json.load(fh)), 3
        from __graft_entry__ import _flagship
        return _flagship(), 1

    def bench(params, x, rows: int) -> float:
        @jax.jit
        def chained(a):
            def body(c, _):
                y = pallas_fused.fused_forward(
                    params, c, input_int8=True, l1_rows=rows)
                return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
            return lax.scan(body, a, None, length=args.iters)[0]

        _ = np.asarray(chained(x)[0, 0, 0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(chained(x)[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    for name in args.configs:
        cfg, chans = load(name)
        pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
        params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
                  for l in pnp]
        x = jnp.asarray(np.random.default_rng(0)
                        .random((1, 1080, 1920, chans), np.float32) - 0.5)
        results = {r: [] for r in args.rows}
        # interleave so tunnel drift cannot masquerade as a win
        for rep in range(args.reps):
            for r in args.rows:
                ms = bench(params, x, r)
                results[r].append(ms)
                print(f"{name} rep {rep} l1_rows={r:<3} {ms:7.2f} ms/frame",
                      flush=True)
        for r in args.rows:
            print(f"  {name} l1_rows={r:<3} best {min(results[r]):7.2f} "
                  f"ms/frame", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
