#!/usr/bin/env python
"""Microbench: XLA parity-recombine formulations for the wino_mm exit.

The Winograd mode's kernel emits per-channel outputs in the PARITY
domain — (2, 2, H/2, W/2) quadrant planes o[p, q, i, j] = y[2i+p, 2j+q]
— because stride-2 lane stores have no Mosaic lowering at tile_w-wide
memrefs. The XLA-side recombine to (H, W) is a relayout whose minor dim
ends up size 2 (the classic TPU-hostile shape). This probe measures the
candidate formulations on chip so the kernel mode can ship the cheapest:

  t0  transpose(2,0,3,1) + reshape            (what shipped first)
  t1  per-parity-row: stack cols last, reshape, then stack rows axis 1
  t2  strided scatter: y.at[p::2, q::2].set(o[p, q])
  t3  dilate via pad-to-(…,2) + reshape, add four
  t4  dynamic-slice-free concat: cols via interleave-with-where on a
      repeat, rows via free reshape

Each variant recombines 3 channels of (2, 2, 540, 968) f32 (the 1080p
RGB geometry) inside one jit with a scan chain + host readback.
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
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--hh", type=int, default=540)
    p.add_argument("--wh", type=int, default=968)
    args = p.parse_args(argv)

    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    hh, wh = args.hh, args.wh
    rng = np.random.default_rng(0)
    os_ = [jnp.asarray(rng.random((2, 2, hh, wh), np.float32))
           for _ in range(3)]

    def t0(o):
        return o.transpose(2, 0, 3, 1).reshape(2 * hh, 2 * wh)

    def t1(o):
        zs = [jnp.stack([o[p_, 0], o[p_, 1]], axis=-1).reshape(hh, 2 * wh)
              for p_ in range(2)]
        return jnp.stack(zs, axis=1).reshape(2 * hh, 2 * wh)

    def t2(o):
        y = jnp.zeros((2 * hh, 2 * wh), jnp.float32)
        for p_ in range(2):
            for q_ in range(2):
                y = y.at[p_::2, q_::2].set(o[p_, q_])
        return y

    def t3(o):
        y = None
        for p_ in range(2):
            for q_ in range(2):
                zc = jnp.pad(o[p_, q_][..., None],
                             ((0, 0), (0, 0), (q_, 1 - q_))
                             ).reshape(hh, 2 * wh)
                zr = jnp.pad(zc[:, None, :],
                             ((0, 0), (p_, 1 - p_), (0, 0))
                             ).reshape(2 * hh, 2 * wh)
                y = zr if y is None else y + zr
        return y

    def t4(o):
        lane = lax.broadcasted_iota(jnp.int32, (hh, 2 * wh), 1)
        zs = []
        for p_ in range(2):
            e = jnp.repeat(o[p_, 0], 2, axis=-1)
            d = jnp.repeat(o[p_, 1], 2, axis=-1)
            zs.append(jnp.where(lane % 2 == 0, e, d))
        return jnp.stack(zs, axis=1).reshape(2 * hh, 2 * wh)

    variants = {"t0_transpose": t0, "t1_stack": t1, "t2_scatter": t2,
                "t3_pad_add": t3, "t4_where": t4}

    # correctness first (vs numpy)
    o_np = np.asarray(os_[0])
    y_ref = np.zeros((2 * hh, 2 * wh), np.float32)
    for p_ in range(2):
        for q_ in range(2):
            y_ref[p_::2, q_::2] = o_np[p_, q_]
    for name, fn in variants.items():
        y = np.asarray(jax.jit(fn)(os_[0]))
        ok = np.array_equal(y, y_ref)
        print(f"{name}: {'OK' if ok else 'MISMATCH'}")
        if not ok:
            del variants[name]

    def make(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def chained(o3, n):
            def body(c, _):
                ys = [fn(o) for o in c]
                return [o.at[0, 0, 0, 0].set(y[0, 0] + y[1, 1])
                        for o, y in zip(c, ys)], ()
            return lax.scan(body, o3, None, length=n)[0]
        return chained

    fns = {k: make(fn) for k, fn in variants.items()}

    def run(fn, n):
        t0_ = time.perf_counter()
        _ = np.asarray(fn(os_, n)[0][0, 0, 0, 0])
        return time.perf_counter() - t0_

    short, long_ = args.iters // 4, args.iters
    for name, fn in fns.items():
        run(fn, short), run(fn, long_)
    best = {}
    for r in range(args.rounds):
        for name, fn in fns.items():
            ms = (run(fn, long_) - run(fn, short)) / (long_ - short) * 1e3
            best[name] = min(best.get(name, 1e9), ms)
            print(f"round {r} {name:14s}: {ms:6.3f} ms (3ch)")
    print()
    for name, ms in sorted(best.items(), key=lambda kv: kv[1]):
        print(f"{name:14s}: best {ms:6.3f} ms per 3-channel recombine")
    return 0


if __name__ == "__main__":
    sys.exit(main())
