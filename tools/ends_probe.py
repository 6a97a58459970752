#!/usr/bin/env python
"""Pin the TRUE XLA-ends cost of the fused RGB frame with the marginal
(two-scan-length) methodology.

kernel_triage's single-point skip-mode subtraction produced a physically
impossible split (all-compute-skipped ≈ 13 ms marginal, yet the frame's
1.2 TFLOP needs ≥6 ms of MXU at bf16 peak) — per-mode compiles and
tunnel drift make cross-program subtraction mud. This probe measures,
with the same interleaved marginal methodology as tools/wino_ab.py:

  full       fused_forward (sep path, int8 planes)
  empty      same program with _DEBUG_SKIP = all compute + dma (the
             kernel body reduced to the grid walk + out-block copies)
  wino_empty same, wino=True (adds the parity-recombine XLA tail)

full − empty = in-kernel compute+DMA; empty = XLA ends + launch + grid.
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
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--stages", action="store_true",
                   help="per-stage marginals (L4/L5/last), sep vs wino")
    args = p.parse_args(argv)

    import json

    import jax
    import jax.numpy as jnp
    from jax import lax

    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "waifu2x_7layer_rgb.json")
    with open(cfg_path) as fh:
        cfg = parse_config(json.load(fh))
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0).random(
        (1, 1080, 1920, 3), np.float32) - 0.5)

    SKIP_ALL = frozenset({"l1", "mid", "last", "dma"})

    def build(skip, wino):
        return build_on(skip, wino, params, x)

    def build_on(skip, wino, params_, x_):
        pallas_fused.set_debug_skip(skip)
        try:
            @functools.partial(jax.jit, static_argnames=("n",))
            def chained(a, n):
                def body(c, _):
                    y = pallas_fused.fused_forward(
                        params_, c, input_int8=True, wino=wino)
                    return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
                return lax.scan(body, a, None, length=n)[0]
            short, long_ = max(1, args.iters // 3), args.iters
            for n in (short, long_):
                np.asarray(chained(x_, n)[0, 0, 0, 0])
            return lambda n: chained(x_, n)
        finally:
            pallas_fused.set_debug_skip(frozenset())

    # scaling diagnostics: half-height and 1-channel variants localize
    # whether the "empty" cost scales with size, channels, or neither
    x540 = x[:, :544]
    params_1ch = [dict(l) for l in params]
    params_1ch[0] = {"w": params[0]["w"][:, :, :1], "b": params[0]["b"]}
    params_1ch[-1] = {"w": params[-1]["w"][..., :1],
                      "b": params[-1]["b"][:1]}
    x1 = x[..., :1]

    if args.stages:
        # per-stage marginals, sep vs wino: the L4 delta carries the
        # parity store (store_act runs in the producer's stage), the L5
        # delta the wino/sep formulation, "last" the exit vs mm_last
        variants = {}
        for wino in (False, True):
            tag = "wino" if wino else "sep"
            variants[f"{tag}_full"] = build(frozenset(), wino)
            for st in ("L4", "L5", "last"):
                variants[f"{tag}_-{st}"] = build(frozenset({st}), wino)
    else:
        variants = {
            "full": build(frozenset(), False),
            "empty": build(SKIP_ALL, False),
            "wino_empty": build(SKIP_ALL, True),
            "empty540": build_on(SKIP_ALL, False, params, x540),
            "empty_1ch": build_on(SKIP_ALL, False, params_1ch, x1),
        }

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
    for name, ms in best.items():
        print(f"{name:10s}: best {ms:7.2f} ms/frame")
    if "full" in best and "empty" in best:
        print(f"kernel compute+dma ≈ {best['full'] - best['empty']:.2f} ms; "
              f"XLA ends + grid ≈ {best['empty']:.2f} ms; "
              f"wino recombine tax ≈ "
              f"{best['wino_empty'] - best['empty']:.2f} ms")
    if args.stages:
        for tag in ("sep", "wino"):
            full = best[f"{tag}_full"]
            for st in ("L4", "L5", "last"):
                print(f"{tag} {st}: {full - best[f'{tag}_-{st}']:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
