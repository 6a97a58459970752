#!/usr/bin/env python
"""Post-wino5 stage budget for the FLAGSHIP 9-5-5 frame (ROADMAP (a)).

The round-3 verdict's weak #1 asked for a flagship stage budget at the
wino_ab standard of evidence; the wino5 chain then moved the frame
272 → 432 MPix/s, and the residual (~4.6 ms vs the ~2.0 ms charged-MXU
floor) was never budgeted. This probe measures, with the marginal
(two-scan-length) methodology and interleaved rounds, the wino5 chain's
per-stage costs by skip-set subtraction:

  full        the shipping wino5 chain (plane l1 → f=5 quad → f'=3 exit)
  -l1_store   l1 dots kept, the quad-256 parity store replaced
  -l1         plane first layer skipped outright
  -mid        the f=5 quad-direct conv2 skipped
  -last       the parity mm exit skipped
  last_dot    exit Z dot replaced with an input-dependent fill
  last_comb   exit dy' combine + out store skipped
  -dma        the double-buffered window copies skipped
  empty       all of the above (grid walk + XLA ends)

full − variant = that stage's marginal (an upper bound on its exclusive
cost: skipping a stage also removes whatever overlap Mosaic found for
it). Cross-compile subtraction carries ±0.3-1 ms of mud — sanity-check
stage claims against the FLOP floor (conv2 charged-quad ≈ 1.55 ms at
bf16 peak; l1 ≈ 0.18; exit N-underfilled ≈ 0.26) and re-measure any
candidate win with a same-program interleaved A/B before believing it.

Run serialized:

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/flagship_stages.py
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
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--iters", type=int, default=12,
                   help="long scan length (short = iters//3; min 2 — "
                        "the marginal needs two distinct lengths)")
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--no-int8", action="store_true")
    p.add_argument("--only", type=str, default="",
                   help="comma-separated variant subset (always incl. full)")
    args = p.parse_args(argv)
    if args.iters < 2:
        p.error("--iters must be >= 2 (the marginal divides by "
                "long - short)")

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.params_io import random_parameters
    from __graft_entry__ import _flagship

    cfg = _flagship()
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, args.height, args.width, 1), np.float32) - 0.5)

    def build(skip):
        pallas_fused.set_debug_skip(skip)
        try:
            @functools.partial(jax.jit, static_argnames=("n",))
            def chained(a, n):
                def body(c, _):
                    y = pallas_fused.fused_forward(
                        params, c, input_int8=not args.no_int8,
                        wino=True, wino5=True)
                    return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
                return lax.scan(body, a, None, length=n)[0]
            short, long_ = max(1, args.iters // 3), args.iters
            for n in (short, long_):
                np.asarray(chained(x, n)[0, 0, 0, 0])
            return lambda n: chained(x, n)
        finally:
            pallas_fused.set_debug_skip(frozenset())

    VARIANTS = [
        ("full", frozenset()),
        ("-l1_store", frozenset({"l1_store"})),
        ("-l1", frozenset({"l1"})),
        ("-mid", frozenset({"mid"})),
        ("-last", frozenset({"last"})),
        ("last_dot", frozenset({"last_dot"})),
        ("last_comb", frozenset({"last_combine"})),
        ("last_extr", frozenset({"last_extract"})),
        ("-dma", frozenset({"dma"})),
        ("empty", frozenset({"l1", "mid", "last", "dma"})),
    ]
    if args.only:
        keep = set(args.only.split(",")) | {"full"}
        VARIANTS = [(n, s) for n, s in VARIANTS if n in keep]
    variants = {}
    for name, skip in VARIANTS:
        try:
            variants[name] = build(skip)
            print(f"built {name}", flush=True)
        except Exception as e:  # a skip mode a compiler pass rejects
            print(f"SKIP {name}: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    short, long_ = max(1, args.iters // 3), args.iters

    def run(fn, n):
        t0 = time.perf_counter()
        _ = np.asarray(fn(n)[0, 0, 0, 0])
        return time.perf_counter() - t0

    best = {}
    for r in range(args.rounds):
        for name, fn in variants.items():
            ms = (run(fn, long_) - run(fn, short)) / (long_ - short) * 1e3
            best[name] = min(best.get(name, 1e9), ms)
            print(f"round {r} {name:10s}: {ms:7.2f} ms/frame", flush=True)
    print()
    full = best.get("full")
    for name, ms in best.items():
        line = f"{name:10s}: best {ms:7.2f} ms/frame"
        if full is not None and name != "full":
            line += f"   (full - this = {full - ms:+6.2f} ms)"
        print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
