#!/usr/bin/env python
"""On-chip A/B: plane-l1 block geometry R=16/S=24 vs the tight R=6/S=14.

ROADMAP (a) / VERDICT r4 #2: the flagship stage budget pinned plane-l1
at 0.69 ms vs a ~0.38 ms charged floor. At R=16 the main dot's K is
c·f₁·S = 216 → TWO 128-deep MXU K-blocks per pass; R=6/S=14 gives
K=126 → ONE, halving the per-row main-dot charge at the cost of
sublane-unaligned slab reads (r8 steps of 6) and (9·14/6)/(9·24/16) ≈
1.55× the per-row roll traffic. Whether Mosaic's relayout for the
unaligned reads eats the dot win is exactly what this measures.

Interleaved rounds, two-length marginal (the wino_ab methodology).
``--no-int8`` probes the f32 window first (int8 windows tile (32,128);
unaligned sublane slices there are the riskier lowering).

Run serialized:

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/l1_probe.py --no-int8
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/l1_probe.py
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=("flagship", "rgb"),
                   default="flagship")
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--no-int8", action="store_true")
    p.add_argument("--rows", type=str, default=None,
                   help="comma-separated l1_rows variants (negative = "
                        "exact tight geometry; default per config: "
                        "flagship 16,-6; rgb 16,-12)")
    p.add_argument("--parity", action="store_true")
    args = p.parse_args(argv)

    import json

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    if args.config == "rgb":
        with open(os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "configs", "waifu2x_7layer_rgb.json")) as fh:
            cfg = parse_config(json.load(fh))
        channels = 3
        if args.rows is None:
            args.rows = "16,-12"
    else:
        from __graft_entry__ import _flagship

        cfg = _flagship()
        channels = 1
        if args.rows is None:
            args.rows = "16,-6"
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, args.height, args.width, channels), np.float32) - 0.5)

    def make(rows):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(a, n):
            def body(c, _):
                y = pallas_fused.fused_forward(
                    params, c, input_int8=not args.no_int8,
                    wino=True, wino5=True, l1_rows=rows)
                return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
            return lax.scan(body, a, None, length=n)[0]
        return chained

    rows_list = [int(r) for r in args.rows.split(",")]
    variants = {}
    for rows in rows_list:
        try:
            fn = make(rows)
            short, long_ = max(1, args.iters // 3), args.iters
            for n in (short, long_):
                np.asarray(fn(x, n)[0, 0, 0, 0])
            variants[f"R{rows}"] = fn
            print(f"built R{rows}", flush=True)
        except Exception as e:  # Mosaic may reject the unaligned reads
            print(f"SKIP R{rows}: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    if args.parity and len(variants) > 1:
        outs = {}
        for rows in rows_list:
            if f"R{rows}" in variants:
                outs[rows] = np.asarray(pallas_fused.fused_forward(
                    params, x, input_int8=not args.no_int8,
                    wino=True, wino5=True, l1_rows=rows))
        base = outs[rows_list[0]]
        for rows, y in list(outs.items())[1:]:
            print(f"parity R{rows} vs R{rows_list[0]}: "
                  f"max|diff| = {np.abs(y - base).max():.3e}")

    short, long_ = max(1, args.iters // 3), args.iters

    def run(fn, n) -> float:
        t0 = time.perf_counter()
        _ = np.asarray(fn(x, n)[0, 0, 0, 0])
        return time.perf_counter() - t0

    results = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            ts, tl = run(fn, short), run(fn, long_)
            ms = (tl - ts) / (long_ - short) * 1e3
            results[name].append(ms)
            print(f"round {r} {name:4s}: {ms:7.2f} ms/frame", flush=True)
    mpx = args.height * args.width / 1e6
    for name, ms in results.items():
        if ms:
            print(f"{name:4s}: best {min(ms):6.2f} ms/frame = "
                  f"{mpx / min(ms) * 1e3:6.1f} MPix/s  (all: "
                  + ", ".join(f"{m:.2f}" for m in ms) + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
