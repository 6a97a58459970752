#!/usr/bin/env python
"""Microbench v2: xpack (row-group packed) dots with KERNEL-REALISTIC
operand reads, vs the shipping sep formulation, at the 7-layer RGB
middle-layer shapes.

xpack packs G=4 consecutive activation ROWS per 128-lane group:
ref[g, x, p*k + c] = act[4g + p, x, c], p in 0..G+f-2 (the f-1 slot
overlap replaces sep's row halo). dy-taps become in-group lane slots,
dx-taps stay sublane shifts, and each dot computes q in 0..G-1 output
rows at lane q*n + cn from the banded weight
W_dx[(p,c),(q,cn)] = w[dy=p-q, dx, c, cn] (zero outside 0 <= p-q < f).
Out-lane chunks j (128 lanes each) only touch input slots
2j .. 2j+G/Pj+f-2, so their contraction slices stay narrow.

Open Mosaic questions this probe answers at production shapes
(ow=256 cols, 24-row chunks, bf16, f=3):

* 32->32: ONE dot per dx with a 192-lane contraction (slots 0..5 x
  k=32) -- does Mosaic run it as 2 clean MXU passes? (xpk32t32 vs the
  explicit 128+64 split xpk32t32s.)
* 64->64: two out-chunks read input lanes 0:256 and 128:384 -- both
  128-aligned; cost vs sep's full-lane reads? (xpk64t64.)
* 32->64: out-chunk j=1 needs lanes 64:192 (64-offset, NOT
  128-aligned: xpk32t64o) -- or a +64-lane duplicated-slot layout
  makes both chunks aligned (xpk32t64d). Which wins?

Per grid step every variant computes the SAME 96 output rows x 256
cols x n channels from VMEM-resident operands and stores them once
(f32 accumulate, +bias-free relu, bf16 store), so only the dot
formulation and operand addressing differ. sep numbers are the
shipping kernel's pattern (3 row-shifted full-lane dots at n/128
lane use).

Methodology per docs/BENCHMARKS.md: serialized, warmup, timed rep,
host readback.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/xpack_probe2.py
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OW = 256      # output cols per chunk (production tile_w)
CH = 24       # output rows per chunk (production deep chunk)
NCHUNK = 4    # chunks per grid step -> 96 output rows/step
G = 4         # packed rows per lane group
F = 3


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    rows_out = NCHUNK * CH          # 96
    grows = rows_out // G           # 24 group rows
    gch = CH // G                   # 6 group rows per chunk

    def sep_body(k, n):
        fk = F * k

        def body(a_ref, w_ref, out_ref):
            for ci in range(NCHUNK):
                c0 = ci * CH
                y = None
                for dy in range(F):
                    yg = jax.lax.dot_general(
                        a_ref[c0 + dy : c0 + dy + CH, 0:OW, 0:fk]
                        .reshape(CH * OW, fk),
                        w_ref[dy * fk : (dy + 1) * fk],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = yg if y is None else y + yg
                out_ref[c0 : c0 + CH] = jnp.maximum(
                    y.reshape(CH, OW, n), 0.0).astype(dt)
        return body

    def xpk_body(k, n, jslices, lanes_in):
        # jslices: list of (lane0, width) contraction windows, one per
        # 128-lane out chunk; weights stacked per (dx, j) at row
        # stride 256 (contraction widths go up to 256).
        def body(a_ref, w_ref, out_ref):
            nj = len(jslices)
            for ci in range(NCHUNK):
                g0 = ci * gch
                for j, (l0, lw) in enumerate(jslices):
                    y = None
                    for dx in range(F):
                        wi = dx * nj + j
                        yg = jax.lax.dot_general(
                            a_ref[g0 : g0 + gch, dx : dx + OW,
                                  l0 : l0 + lw]
                            .reshape(gch * OW, lw),
                            w_ref[wi * 256 : wi * 256 + lw],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        y = yg if y is None else y + yg
                    out_ref[g0 : g0 + gch, :, j * 128 : (j + 1) * 128] = (
                        jnp.maximum(y.reshape(gch, OW, 128), 0.0)
                        .astype(dt))
        return body

    # variant: (name, a_shape, w_shape, out_shape, body)
    variants = [
        # ---- 32->32 ----
        ("sep32t32", (rows_out + F - 1, OW + 8, 96), (3 * 96, 32),
         (rows_out, OW, 32), sep_body(32, 32)),
        # one 192-contraction dot per dx (slots 0..5 x 32)
        ("xpk32t32", (grows + 1, OW + 8, 192), (3 * 256, 128),
         (grows, OW, 128), xpk_body(32, 32, [(0, 192)], 192)),
        # explicit 128+64 split of the same contraction (body below)
        ("xpk32t32s", (grows + 1, OW + 8, 192), (6 * 128, 192),
         (grows, OW, 128), None),
        # ---- 32->64 ----
        ("sep32t64", (rows_out + F - 1, OW + 8, 96), (3 * 96, 64),
         (rows_out, OW, 64), sep_body(32, 64)),
        # j=1 reads lanes 64:192 (64-offset)
        ("xpk32t64o", (grows + 1, OW + 8, 192), (6 * 256, 128),
         (grows, OW, 256), xpk_body(32, 64, [(0, 128), (64, 128)], 192)),
        # duplicated-slot layout: both chunks 128-aligned
        ("xpk32t64d", (grows + 1, OW + 8, 256), (6 * 256, 128),
         (grows, OW, 256), xpk_body(32, 64, [(0, 128), (128, 128)], 256)),
        # ---- 64->64 ----
        ("sep64t64", (rows_out + F - 1, OW + 8, 192), (3 * 192, 64),
         (rows_out, OW, 64), sep_body(64, 64)),
        # two 256-contraction chunks at lane offsets 0 / 128
        ("xpk64t64", (grows + 1, OW + 8, 384), (6 * 256, 128),
         (grows, OW, 256), xpk_body(64, 64, [(0, 256), (128, 256)], 384)),
    ]
    # xpk32t32s needs a custom body (split contraction, shared out lanes)

    def xpk32t32s_body(a_ref, w_ref, out_ref):
        for ci in range(NCHUNK):
            g0 = ci * gch
            y = None
            for dx in range(F):
                for si, (l0, lw) in enumerate([(0, 128), (128, 64)]):
                    wi = dx * 2 + si
                    yg = jax.lax.dot_general(
                        a_ref[g0 : g0 + gch, dx : dx + OW, l0 : l0 + lw]
                        .reshape(gch * OW, lw),
                        w_ref[wi * 128 : wi * 128 + lw],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = yg if y is None else y + yg
            out_ref[g0 : g0 + gch] = jnp.maximum(
                y.reshape(gch, OW, 128), 0.0).astype(dt)

    variants[2] = ("xpk32t32s", (grows + 1, OW + 8, 192), (6 * 128, 128),
                   (grows, OW, 128), xpk32t32s_body)

    rng = np.random.default_rng(0)

    def build(name, a_shape, w_shape, out_shape, body):
        a = jnp.asarray(rng.random(a_shape, np.float32) - 0.5, dt)
        w = jnp.asarray(rng.random(w_shape, np.float32) - 0.5, dt)
        fn = pl.pallas_call(
            body,
            grid=(args.reps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(
                out_shape, lambda i: (0,) * len(out_shape),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, dt),
        )
        return jax.jit(fn), a, w

    built = {v[0]: build(*v) for v in variants}

    def bench(name) -> float:
        jfn, a, w = built[name]
        _ = np.asarray(jfn(a, w)[0, 0])  # warmup + compile
        t0 = time.perf_counter()
        _ = np.asarray(jfn(a, w)[0, 0])
        return (time.perf_counter() - t0) / args.reps * 1e6

    results = {v[0]: [] for v in variants}
    for rep in range(args.rounds):
        for name in results:
            us = bench(name)
            results[name].append(us)
            print(f"rep {rep} {name:<11} {us:8.3f} us/step", flush=True)
    print("\nbest-of-rounds (us/step; every variant = 96 out rows x "
          "256 cols from VMEM refs):")
    for name in results:
        print(f"  {name:<11} {min(results[name]):8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
