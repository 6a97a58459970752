#!/usr/bin/env python
"""Interleaved on-chip A/B: parity-domain kernel mode vs the baseline.

Measures the MARGINAL per-frame cost (two scan lengths, slope — the
docs/BENCHMARKS.md methodology that subtracts the tunnel's fixed
dispatch latency), alternating A/B within each round so tunnel drift
hits both equally. ``--config rgb`` (default): the 7-layer RGB frame,
``wino=False`` (sep path) vs ``wino=True`` (F(2x2,3x3) parity chain).
``--config flagship``: SRCNN 9-5-5 1080p luma, the shipping packed-dx
path vs ``wino5=True`` (f==5 quad-direct chain + f'=3 parity exit —
VERDICT r4 #1). ``--config 915``: SRCNN 9-1-5 luma, wino-only base vs
the f=1 block-diag chain (``wino5=True`` arms it; VERDICT r4 weak #3's
sweep config).

Run serialized (never concurrently with another TPU process):

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/wino_ab.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=("rgb", "flagship", "915"),
                   default="rgb")
    p.add_argument("--rounds", type=int, default=4)
    p.add_argument("--iters", type=int, default=12,
                   help="long scan length (short = iters//3)")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--no-int8", action="store_true")
    p.add_argument("--parity", action="store_true",
                   help="also print wino-vs-sep max|diff| on chip")
    p.add_argument("--sweep", type=int, default=0, metavar="N",
                   help="randomized odd-shape parity sweep: N random "
                        "(H, W) frames incl. odd widths and near-"
                        "receptive-field sizes, wino vs sep on chip "
                        "(VERDICT r3 weak #3); exits nonzero on any "
                        "mismatch > --sweep-tol")
    p.add_argument("--sweep-seed", type=int, default=None,
                   help="sweep RNG seed (default: derived from date so "
                        "repeat runs in one day reuse the compile cache)")
    p.add_argument("--sweep-tol", type=float, default=None,
                   help="max allowed |diff| (default per config: rgb "
                        "1e-6 — measured envelope 1.7e-8; flagship "
                        "1e-5 — the wino5 bf16-exit path's measured "
                        "envelope is ~3e-6; 915 5e-6 — measured "
                        "envelope 5.9e-7 over 6 odd shapes + 1080p, "
                        "2026-08-21)")
    args = p.parse_args(argv)

    import json

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
        channels = 3
        ab = (("sep", dict(wino=False)), ("wino", dict(wino=True)))
    elif args.config == "915":
        # SRCNN 9-1-5 (matrix row 1) — the f=1 block-diag + plane
        # quad-256 chain (VERDICT r4 weak #3: the thinnest on-chip
        # robustness evidence of the three families; this config arms
        # the randomized odd-shape sweep on the wino1 path)
        cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "srcnn_9-1-5.json")
        with open(cfg_path) as fh:
            cfg = parse_config(json.load(fh))
        channels = 1
        ab = (("base", dict(wino=True, wino5=False)),
              ("wino1", dict(wino=True, wino5=True)))
    else:  # flagship 9-5-5 (n1=64, n2=32) luma — the driver's config
        from __graft_entry__ import _flagship

        cfg = _flagship()
        channels = 1
        # wino5=False must be EXPLICIT: since the 2026-08-21 default
        # flip it auto-resolves ON for compiled TPU runs, and an
        # unpinned "base" silently A/Bs wino5 against itself (caught
        # when the first sweep read bit-exact 0.0 everywhere)
        ab = (("base", dict(wino=True, wino5=False)),
              ("wino5", dict(wino=True, wino5=True)))
    if args.sweep_tol is None:
        args.sweep_tol = {"rgb": 1e-6, "flagship": 1e-5,
                          "915": 5e-6}[args.config]
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, args.height, args.width, channels), np.float32) - 0.5)

    import functools

    def make(**kw):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(a, n):
            def body(c, _):
                y = pallas_fused.fused_forward(
                    params, c, input_int8=not args.no_int8, **kw)
                return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
            return lax.scan(body, a, None, length=n)[0]
        return chained

    (name_a, kw_a), (name_b, kw_b) = ab
    variants = {name_a: make(**kw_a), name_b: make(**kw_b)}
    short, long_ = max(1, args.iters // 3), args.iters

    if args.parity:
        ya = np.asarray(pallas_fused.fused_forward(
            params, x, input_int8=not args.no_int8, **kw_a))
        yb = np.asarray(pallas_fused.fused_forward(
            params, x, input_int8=not args.no_int8, **kw_b))
        print(f"parity max|diff| = {np.abs(ya - yb).max():.3e}")

    if args.sweep:
        # Randomized odd/ragged-geometry parity sweep: the shipped-ON
        # wino default's safety evidence beyond the two 1080p/540p spot
        # shapes — odd W (parity-domain raggedness), odd H, and sizes
        # near the stack's receptive field (shrink + a few rows), where
        # the tile-evenness fallbacks engage. Each shape compiles fresh,
        # so sizes stay ≤ ~600p to keep tunnel compiles quick.
        import datetime

        seed = (args.sweep_seed if args.sweep_seed is not None
                else int(datetime.date.today().strftime("%Y%m%d")))
        srng = np.random.default_rng(seed)
        shrink = sum(l["w"].shape[0] - 1 for l in params)
        shapes = []
        for i in range(args.sweep):
            if i % 3 == 2:  # every third: near the receptive field
                # offsets start at 9: fused_forward falls back to the
                # XLA path at dims <= shrink + 8 (entry.py size guard),
                # and a fallback-vs-fallback row validates nothing
                h = shrink + int(srng.integers(9, 32))
                w = shrink + int(srng.integers(9, 32))
            else:
                h = int(srng.integers(96, 600))
                w = int(srng.integers(96, 1024))
            if i % 2 == 0:
                w |= 1  # force odd width (ragged parity domain)
            else:
                h |= 1
            shapes.append((h, w))
        print(f"sweep seed {seed}: {shapes}")
        worst, failures = 0.0, []
        for (h, w) in shapes:
            xs = jnp.asarray(
                srng.random((1, h, w, channels), np.float32) - 0.5)
            ya = np.asarray(pallas_fused.fused_forward(
                params, xs, input_int8=not args.no_int8, **kw_a))
            yb = np.asarray(pallas_fused.fused_forward(
                params, xs, input_int8=not args.no_int8, **kw_b))
            d = float(np.abs(ya - yb).max())
            worst = max(worst, d)
            status = "ok" if d <= args.sweep_tol else "FAIL"
            if status == "FAIL":
                failures.append((h, w, d))
            print(f"  {h:4d}x{w:<4d}: max|{name_b}-{name_a}| = "
                  f"{d:.3e}  {status}")
        print(f"sweep worst = {worst:.3e} over {len(shapes)} shapes "
              f"(tol {args.sweep_tol:g})")
        if failures:
            print(f"SWEEP FAILURES: {failures}")
            return 1

    if args.rounds == 0:
        return 0  # --parity-only / --sweep-only runs

    def run(fn, n) -> float:
        from functools import partial
        f = partial(fn, n=n)
        t0 = time.perf_counter()
        _ = np.asarray(f(x)[0, 0, 0, 0])
        return time.perf_counter() - t0

    # warmup/compile both variants, both lengths
    for name, fn in variants.items():
        for n in (short, long_):
            run(fn, n)

    results = {k: [] for k in variants}
    for r in range(args.rounds):
        for name, fn in variants.items():
            ts = run(fn, short)
            tl = run(fn, long_)
            ms = (tl - ts) / (long_ - short) * 1e3
            results[name].append(ms)
            print(f"round {r} {name:5s}: {ms:7.2f} ms/frame "
                  f"(short {ts*1e3:.0f} ms, long {tl*1e3:.0f} ms)")
    mpx = args.height * args.width / 1e6
    for name, ms in results.items():
        best = min(ms)
        print(f"{name:5s}: best {best:6.2f} ms/frame = "
              f"{mpx / best * 1e3:6.1f} MPix/s  (all: "
              + ", ".join(f"{m:.2f}" for m in ms) + ")")
    return 0


if __name__ == "__main__":
    sys.exit(main())
