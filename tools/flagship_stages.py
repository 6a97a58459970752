#!/usr/bin/env python
"""Per-stage budget for the fused parity-chain frame (skip-set marginals).

``--config flagship`` (default): the SRCNN 9-5-5 1080p wino5 chain
(plane l1 → f=5 quad → f'=3 exit) — ROADMAP (a), built round 4.
``--config rgb``: the 7-layer waifu2x chain (plane-l1 quad-256 store →
k=32 quad dots → k=64 j-paired → k=128 unpaired Winograd → parity mm
exit) — VERDICT r4 missing #1: the RGB frame's last full per-layer
split predates the quad/j-paired/xt chain; at ~12.2 ms it sits ~3.5 ms
above its useful-FLOP floor and this probe names which stage holds it.

Measures, with the marginal (two-scan-length) methodology and
interleaved rounds, per-stage costs by skip-set subtraction:

  full        the shipping chain
  -l1_store   l1 dots kept, the parity store replaced
  -l1         plane first layer skipped outright
  -mid        ALL f>1 middle layers skipped
  -L{i}       exactly kernel layer i skipped (rgb: L1..L5 per middle)
  -last       the parity mm exit skipped
  last_dot    exit Z dot replaced with an input-dependent fill
  last_comb   exit dy' combine + out store skipped
  last_extr   exit combine kept, extraction + stores skipped
  -dma        the double-buffered window copies skipped
  empty       all of the above (grid walk + XLA ends)

full − variant = that stage's marginal (an upper bound on its exclusive
cost: skipping a stage also removes whatever overlap Mosaic found for
it). Cross-compile subtraction carries ±0.3-1 ms of mud — sanity-check
stage claims against the useful-FLOP floors the tool prints (direct
conv MACs at bf16 peak — NOT the formulation's charged passes, which
for zero-padded layouts like the f=5 quad count structural zeros as
work; state both when documenting) and re-measure any candidate win
with a same-program interleaved A/B before believing it.

Run serialized:

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/flagship_stages.py
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/flagship_stages.py --config rgb
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# bf16 MXU peak for the floor print (v5e ≈ 197 TFLOP/s)
PEAK_TFLOPS = 197.0


def _floor_table(params, h, w):
    """Useful-FLOP floor per layer: direct-conv MACs at bf16 peak.
    This is the formulation-independent lower bound — a Winograd
    formulation can beat it (fewer MACs), a zero-padded quad layout
    charges more; both comparisons belong in docs next to the
    measured marginals."""
    shrink = 0
    rows = []
    total = 0.0
    for i, l in enumerate(params):
        f, _, k, n = l["w"].shape
        shrink += f - 1
        oh, ow = h - shrink, w - shrink
        flops = 2.0 * oh * ow * f * f * k * n
        ms = flops / (PEAK_TFLOPS * 1e12) * 1e3
        total += ms
        rows.append((i, f, k, n, flops, ms))
    print("useful-FLOP floors (direct-conv MACs @ bf16 peak "
          f"{PEAK_TFLOPS:.0f} TFLOP/s):")
    for i, f, k, n, flops, ms in rows:
        print(f"  L{i}: f={f} {k:4d}->{n:<4d} {flops / 1e9:7.2f} GFLOP "
              f"= {ms:6.3f} ms")
    print(f"  total: {total:.3f} ms/frame\n")


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", choices=("flagship", "rgb"),
                   default="flagship")
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
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    if args.config == "rgb":
        with open(os.path.join(ROOT, "configs",
                               "waifu2x_7layer_rgb.json")) as fh:
            cfg = parse_config(json.load(fh))
        channels = 3
    else:
        from __graft_entry__ import _flagship

        cfg = _flagship()
        channels = 1
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, args.height, args.width, channels), np.float32) - 0.5)

    _floor_table(pnp, args.height, args.width)

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
    if args.config == "rgb":
        # per-middle-layer marginals: kernel layer index == model layer
        # index with the plane first layer (L0 = l1, L6 = last); the
        # _store twins keep a layer's dots/combine and skip only its
        # (possibly dx'-packed) store
        VARIANTS[4:4] = [(f"-L{i}", frozenset({f"L{i}"}))
                         for i in range(1, len(params) - 1)]
        VARIANTS[9:9] = [(f"-L{i}s", frozenset({f"L{i}_store"}))
                         for i in range(1, len(params) - 1)]
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
