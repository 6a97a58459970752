#!/usr/bin/env python
"""Microbench: sep dots vs position-packed (xpack) dots at RGB shapes.

The 7-layer RGB stack's small-n middle layers run separated-phase dots
(``pallas_fused._sep_layers``): f=3 dots of (M, f·k) @ (f·k, n) at
n/128 lane utilization. The xpack idea packs P = 128/n consecutive x
positions per 128-lane group so every dot runs (M/P, 128) @ (128, P·n)
at full lanes — dx taps become M-row/group offsets — halving the MXU
cycle slots on the k==n and k<n layers:

  32→32 : sep 3·M slots (18.75% util) → xpack 3dy·2g·(M/4) = 1.5·M
  32→64 : sep 3·M slots (37.5%)       → xpack 3dy·1·(M/2)  = 1.5·M
  64→64 : sep 3·2·M slots (37.5%)     → xpack 3dy·2g·(M/2) = 3·M

This probe measures ONLY the dot+store pattern, isolated from the
fused kernel: per grid step each variant computes the SAME 196,608
output elements from VMEM-resident operands and stores them once, so
store volume cancels and the dot-slot difference is the signal. If the
xpack wins here track the slot model, the fused-kernel redesign is
worth building; if they vanish (dots already hidden behind stores at
these shapes), it is not.

Methodology per docs/BENCHMARKS.md: serialize (nothing else on the
TPU), warmup then timed run, host readback to defeat async dispatch.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/xpack_probe.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 6144  # output positions per step (≙ one 24-row × 256-col chunk)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=4096,
                   help="grid steps per timed call")
    p.add_argument("--rounds", type=int, default=3,
                   help="interleaved A/B rounds")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16

    # variant: (name, a_shape, [w shapes], out_shape, body)
    # Every body writes out = relu(acc) with acc f32, out bf16.
    def sep_body(f, fk, n):
        def body(a_ref, *refs):
            out_ref = refs[-1]
            wrefs = refs[:-1]
            acc = None
            for dy in range(f):
                y = jax.lax.dot_general(
                    a_ref[...], wrefs[dy][...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            out_ref[...] = jnp.maximum(acc, 0.0).astype(dt)
        return body

    def xpack_body(ndots):
        def body(a_ref, *refs):
            out_ref = refs[-1]
            wrefs = refs[:-1]
            acc = None
            for d in range(ndots):
                y = jax.lax.dot_general(
                    a_ref[...], wrefs[d][...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = y if acc is None else acc + y
            out_ref[...] = jnp.maximum(acc, 0.0).astype(dt)
        return body

    variants = [
        # 32→32: sep = 3 dots (M, 96)@(96, 32); xpack = 6 dots
        # (M/4, 128)@(128, 128) [3 dy × 2 groups]
        ("sep_32to32", (M, 96), [(96, 32)] * 3, (M, 32), sep_body(3, 96, 32)),
        ("xpack_32to32", (M // 4, 128), [(128, 128)] * 6, (M // 4, 128),
         xpack_body(6)),
        # 32→64: sep = 3 dots (M, 96)@(96, 64); xpack = 3 dots
        # (M/2, 128)@(128, 128) [1 overlap-group per dy]
        ("sep_32to64", (M, 96), [(96, 64)] * 3, (M, 64), sep_body(3, 96, 64)),
        ("xpack_32to64", (M // 2, 128), [(128, 128)] * 3, (M // 2, 128),
         xpack_body(3)),
        # 64→64: sep = 3 dots (M, 192)@(192, 64); xpack = 6 dots
        # (M/2, 128)@(128, 128) [3 dy × 2 col-chunks]
        ("sep_64to64", (M, 192), [(192, 64)] * 3, (M, 64),
         sep_body(3, 192, 64)),
        ("xpack_64to64", (M // 2, 128), [(128, 128)] * 6, (M // 2, 128),
         xpack_body(6)),
    ]

    rng = np.random.default_rng(0)

    def build(name, a_shape, w_shapes, out_shape, body):
        a = jnp.asarray(rng.random(a_shape, np.float32) - 0.5, dt)
        ws = [jnp.asarray(rng.random(s, np.float32) - 0.5, dt)
              for s in w_shapes]

        fn = pl.pallas_call(
            body,
            grid=(args.reps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]
            * (1 + len(ws)),
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        )
        jfn = jax.jit(lambda a_, ws_: fn(a_, *ws_))
        return jfn, a, ws

    built = {v[0]: build(*v) for v in variants}

    def bench(name) -> float:
        jfn, a, ws = built[name]
        _ = np.asarray(jfn(a, ws)[0, 0])  # warmup + compile
        t0 = time.perf_counter()
        _ = np.asarray(jfn(a, ws)[0, 0])
        return (time.perf_counter() - t0) / args.reps * 1e6

    results = {v[0]: [] for v in variants}
    for rep in range(args.rounds):
        for name in results:
            us = bench(name)
            results[name].append(us)
            print(f"rep {rep} {name:<14} {us:8.3f} us/step", flush=True)
    print("\nbest-of-rounds (us/step, same output elements per pair):")
    for name in results:
        print(f"  {name:<14} {min(results[name]):8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
