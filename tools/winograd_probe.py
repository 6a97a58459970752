#!/usr/bin/env python
"""Microbench: Winograd F(2x2, 3x3) vs the shipping sep formulation at
the 7-layer RGB big-layer shapes (64->128, 128->128), kernel-realistic.

Rationale: the deep layers dominate the RGB frame (fresh triage:
64->128 2.55 ms, 128->128 4.09 ms of ~16.6 marginal) and run near
their MXU lane ceilings (128->128 at ~147 TFLOP/s effective, ~75% of
the v5e ~197 peak) — direct-formulation packing is exhausted (sep beat
all-phase, dypack, xpack; docs/BENCHMARKS.md). Winograd attacks the
MAC count itself: F(2x2,3x3) computes a 2x2 output tile from a 4x4
input tile with 16 multiplies instead of 36 (2.25x), turning each
layer into 16 position-matmuls (T, k) @ (k, n) over T = (rows/2 x
cols/2) tiles — full MXU K-fill at k >= 128, no dy/dx taps at all.

The stride-2 tile decomposition is the classic TPU blocker; here it is
solved by a PARITY-SPLIT producer layout: activations stored as
(row-parity, row/2, col/2, col-parity*k + c). Every Winograd tap
d[2i+a, 2j+b] then reads a CONTIGUOUS row slice of one parity plane
(rows a//2 + i), a sublane offset of b//2 in (0, 1), and a k-aligned
lane group (b%2) — no strided access anywhere. (Reference conv loop:
/root/reference/src/kernel/layer_uber_kernel.cl:59-95 — same math,
direct form.)

Variants (all per-step work = one 24-row x 256-col output chunk):
  sep{k}      shipping pattern: 3 row-shifted (6144, 3k)@(3k, n) dots
  winoD{k}    dot stage only, V pre-materialized: 16 (1536, k)@(k, n)
              dots + Y output-transform adds + parity store. Upper
              bound for the formulation (input transform free).
  wino{k}     realistic: parity-plane reads, in-kernel input transform
              (V[a,b] = 4 signed adds), 16 dots, incremental A^T M A
              accumulation (4 f32 accumulators), ReLU, parity store.

--check runs each wino variant once against a numpy direct-conv oracle
on the same random activation block (max-abs printed; bf16 dots give
~1e-2 on unit-scale data, f32 transforms are exact).

Methodology per docs/BENCHMARKS.md: serialized, warmup, timed reps,
host readback, interleaved rounds.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/winograd_probe.py
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
TR, TC = CH // 2, OW // 2   # Winograd tile grid: 12 x 128
T = TR * TC                 # 1536 tiles per chunk

BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float32)
G = np.array([[1, 0, 0],
              [.5, .5, .5],
              [.5, -.5, .5],
              [0, 0, 1]], np.float32)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float32)


def transform_weights(g, dtype):
    """g: (3, 3, k, n) -> (16, k, n): U = G g G^T per (cin, cout)."""
    u = np.einsum("ai,bj,ijkn->abkn", G, G, g.astype(np.float32))
    return u.reshape(16, *g.shape[2:]).astype(dtype)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--check", action="store_true",
                   help="one-step numeric check vs a numpy direct conv")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    F = 3

    def sep_body(k, n, inner=1):
        fk = F * k

        def body(a_ref, w_ref, out_ref):
            for _ in range(inner):
                y = None
                for dy in range(F):
                    yg = jax.lax.dot_general(
                        a_ref[dy : dy + CH, 0:OW, 0:fk]
                        .reshape(CH * OW, fk),
                        w_ref[dy * fk : (dy + 1) * fk],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = yg if y is None else y + yg
                out_ref[0:CH] = jnp.maximum(
                    y.reshape(CH, OW, n), 0.0).astype(dt)
        return body

    # ---- Winograd helpers (shared by both wino variants) ----

    def accum_y(ys, a, b, m):
        # incremental Y[p,q] += At[p,a] * At[q,b] * m  (coeffs in 0,+-1)
        for pq in range(4):
            c = float(AT[pq // 2, a] * AT[pq % 2, b])
            if c != 0.0:
                ys[pq] = m * c if ys[pq] is None else ys[pq] + m * c
        return ys

    def store_y(ys, out_ref, n, t0):
        # out_ref parity layout: (2, 2, TR, TC, n); Y[p,q][t] is the
        # output pixel (2i+p, 2j+q) -> plane (p, q) row i col j.
        for pq in range(4):
            out_ref[pq // 2, pq % 2, t0 : t0 + TRG] = jnp.maximum(
                ys[pq].reshape(-1, TC, n), 0.0).astype(dt)

    # tile-row group size: bounds the f32 accumulator live set (4 x
    # TRG*TC*n f32 must fit scoped VMEM with the dot transients — a
    # whole-chunk TR=12 group OOMed at k=n=128, 18.7M > 16M limit)
    TRG = 6

    def winoD_body(k, n, inner=1):
        # a_ref: (16, T, k) pre-materialized V planes
        def body(a_ref, w_ref, out_ref):
            for t0 in list(range(0, TR, TRG)) * inner:
                ys = [None] * 4
                for pos in range(16):
                    m = jax.lax.dot_general(
                        a_ref[pos, t0 * TC : (t0 + TRG) * TC],
                        w_ref[pos * k : (pos + 1) * k],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ys = accum_y(ys, pos // 4, pos % 4, m)
                store_y(ys, out_ref, n, t0)
        return body

    def wino_body(k, n, inner=1):
        # a_ref parity layout: (2, RH, CWP, 2k); input rows 0..25 ->
        # plane r%2 row r//2; input cols 0..257 -> sublane c//2, lane
        # group (c%2)*k. Tap d[2i+a, 2j+b] = plane[a%2][a//2 + i,
        # b//2 + j, (b%2)k : (b%2+1)k] — contiguous rows, sublane
        # offset b//2, k-aligned lanes.
        def tap(a_ref, i_off, j_off, t0):
            a, b = i_off, j_off
            r0 = a // 2 + t0
            return a_ref[a % 2, r0 : r0 + TRG,
                         b // 2 : b // 2 + TC,
                         (b % 2) * k : (b % 2 + 1) * k]

        def body(a_ref, w_ref, out_ref):
            for t0 in list(range(0, TR, TRG)) * inner:
                ys = [None] * 4
                for pos in range(16):
                    pa, pb = pos // 4, pos % 4
                    v = None
                    for i in range(4):
                        ci = BT[pa, i]
                        if ci == 0:
                            continue
                        for j in range(4):
                            c = ci * BT[pb, j]
                            if c == 0:
                                continue
                            d = tap(a_ref, i, j, t0)
                            t = d if c > 0 else -d
                            v = t if v is None else v + t
                    m = jax.lax.dot_general(
                        v.reshape(TRG * TC, k),
                        w_ref[pos * k : (pos + 1) * k],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ys = accum_y(ys, pa, pb, m)
                store_y(ys, out_ref, n, t0)
        return body

    def winoF_body(k, n, inner=1):
        # factored transform: R[a][jb] = B^T-row combos of the row
        # taps (16 single adds, 16 tap reads), then V[a][b] = column
        # combos of R (16 single adds) — vs the direct form's 48 adds
        # and 64 reads. Same parity a_ref layout as wino_body.
        def tap(a_ref, i_off, j_off, t0):
            a, b = i_off, j_off
            r0 = a // 2 + t0
            return a_ref[a % 2, r0 : r0 + TRG,
                         b // 2 : b // 2 + TC,
                         (b % 2) * k : (b % 2 + 1) * k]

        def body(a_ref, w_ref, out_ref):
            for t0 in list(range(0, TR, TRG)) * inner:
                ys = [None] * 4
                for pa in range(4):
                    i1, i2 = [i for i in range(4) if BT[pa, i] != 0]
                    rs = []
                    for jb in range(4):
                        d1 = tap(a_ref, i1, jb, t0)
                        d2 = tap(a_ref, i2, jb, t0)
                        d1 = d1 if BT[pa, i1] > 0 else -d1
                        rs.append(d1 + d2 if BT[pa, i2] > 0 else d1 - d2)
                    for pb in range(4):
                        j1, j2 = [j for j in range(4) if BT[pb, j] != 0]
                        v = (rs[j1] if BT[pb, j1] > 0 else -rs[j1])
                        v = v + rs[j2] if BT[pb, j2] > 0 else v - rs[j2]
                        pos = pa * 4 + pb
                        m = jax.lax.dot_general(
                            v.reshape(TRG * TC, k),
                            w_ref[pos * k : (pos + 1) * k],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        ys = accum_y(ys, pa, pb, m)
                store_y(ys, out_ref, n, t0)
        return body

    def repack_body(k, n, inner=1):
        # sep dots + PARITY-SPLIT store: the sep->wino boundary cost.
        # Mosaic cannot strided-slice *values* (shape-changing gathers
        # don't lower), but it does lower strided *ref* loads
        # (tpu.strided_load) — for 32-bit data only, so the scratch
        # stays f32 and the bf16 cast happens at the parity store.
        fk = F * k

        def body(a_ref, w_ref, out_ref, s_ref):
            for _ in range(inner):
                y = None
                for dy in range(F):
                    yg = jax.lax.dot_general(
                        a_ref[dy : dy + CH, 0:OW, 0:fk]
                        .reshape(CH * OW, fk),
                        w_ref[dy * fk : (dy + 1) * fk],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    y = yg if y is None else y + yg
                s_ref[...] = jnp.maximum(y.reshape(CH, OW, n), 0.0)
                for p in range(2):
                    for q in range(2):
                        out_ref[p, q] = s_ref[p::2, q::2].astype(dt)
        return body

    # parity a_ref geometry: 26 input rows -> 13 per plane; 258 input
    # cols -> 129 per parity, padded to a 16-sublane multiple (144)
    RH, CWP = 13, 144

    def specs(k, n, kind):
        if kind in ("sep", "repack"):
            out = (CH, OW, n) if kind == "sep" else (2, 2, TR, TC, n)
            return (CH + F - 1, OW + 8, F * k), (F * F * k, n), out
        if kind == "winoD":
            return (16, T, k), (16 * k, n), (2, 2, TR, TC, n)
        return (2, RH, CWP, 2 * k), (16 * k, n), (2, 2, TR, TC, n)

    BODIES = {"sep": sep_body, "winoD": winoD_body, "wino": wino_body,
              "winoF": winoF_body, "repack": repack_body}
    KINDS = ("sep", "winoD", "wino", "winoF", "repack")

    variants = []
    for k, n in ((64, 128), (128, 128), (128, 64)):
        for inner in (1, 2):
            sfx = "" if inner == 1 else "x2"
            for kind in KINDS:
                variants.append(
                    (f"{kind}{k}.{n}{sfx}", BODIES[kind](k, n, inner),
                     specs(k, n, "winoD" if kind == "winoD" else
                           ("sep" if kind == "sep" else
                            ("repack" if kind == "repack" else "wino")))))

    if args.check:
        # remote Pallas compiles run minutes each — build only the
        # variants the checker drives (inner=1 wino/winoF/repack)
        variants = [v for v in variants
                    if not v[0].endswith("x2")
                    and not v[0].startswith(("sep", "winoD"))]

    rng = np.random.default_rng(0)
    built = {}
    for name, body, (a_s, w_s, o_s) in variants:
        a = jnp.asarray(rng.random(a_s, np.float32) - 0.5, dt)
        w = jnp.asarray(rng.random(w_s, np.float32) - 0.5, dt)
        n_out = o_s[-1]
        scratch = ([pltpu.VMEM((CH, OW, n_out), jnp.float32)]
                   if name.startswith("repack") else [])
        fn = pl.pallas_call(
            body,
            grid=(args.reps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(o_s, lambda *i, _n=len(o_s): (0,) * _n,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(o_s, dt),
            scratch_shapes=scratch,
            interpret=jax.default_backend() == "cpu",
        )
        built[name] = (jax.jit(fn), a, w, o_s)

    if args.check:
        _check(built, rng, np, jnp, dt)
        return 0

    def bench(name) -> float:
        jfn, a, w, o_s = built[name]

        def run():
            out = jfn(a, w)
            return np.asarray(out[(0,) * (len(o_s) - 1)][:1])  # tiny readback

        _ = run()   # warmup + compile
        t0 = time.perf_counter()
        _ = run()
        return (time.perf_counter() - t0) / args.reps * 1e6

    results = {v[0]: [] for v in variants}
    for rep in range(args.rounds):
        for name in results:
            us = bench(name)
            results[name].append(us)
            print(f"rep {rep} {name:<11} {us:8.3f} us/step", flush=True)
    print("\nMARGINAL us per 24x256-output chunk (t_x2 - t_x1, "
          "best-of-rounds each; cancels the flat per-step overhead):")
    for k, n in ((64, 128), (128, 128), (128, 64)):
        for kind in KINDS:
            t1 = min(results[f"{kind}{k}.{n}"])
            t2 = min(results[f"{kind}{k}.{n}x2"])
            print(f"{kind}{k}.{n:<4} {t2 - t1:8.3f}")
    return 0


def _check(built, rng, np, jnp, dt):
    """One-step numeric check of the variants vs direct conv."""
    for k, n in ((64, 128), (128, 128), (128, 64)):
        # one common activation block: 26 rows x 258 cols x k
        act = (rng.random((26, 258, k), np.float32) - 0.5).astype(np.float32)
        g = (rng.random((3, 3, k, n), np.float32) - 0.5).astype(np.float32)
        # direct valid conv oracle (float64): out 24 x 256 x n
        ref = np.zeros((CH, OW, n))
        a64 = act.astype(np.float64)
        for dy in range(3):
            for dx in range(3):
                ref += np.einsum(
                    "rxk,kn->rxn",
                    a64[dy : dy + CH, dx : dx + OW], g[dy, dx])
        ref = np.maximum(ref, 0.0)
        refmax = np.abs(ref).max()

        def unparity(out):
            y = np.zeros((CH, OW, n))
            for p in range(2):
                for q in range(2):
                    y[p::2, q::2] = out[p, q, : CH // 2, : OW // 2]
            return y

        # parity-split a_ref: (2, RH, CWP, 2k)
        RH, CWP = 13, 144
        pa = np.zeros((2, RH, CWP, 2 * k), np.float32)
        for r in range(26):
            for cpar in range(2):
                cols = act[r, cpar::2]            # (129, k)
                pa[r % 2, r // 2, : cols.shape[0],
                   cpar * k : (cpar + 1) * k] = cols
        u = transform_weights(g, np.float32).reshape(16 * k, n)
        for kind in ("wino", "winoF"):
            jfn = built[f"{kind}{k}.{n}"][0]
            out = np.asarray(jfn(jnp.asarray(pa, dt), jnp.asarray(u, dt)),
                             np.float64)
            y = unparity(out)
            err = np.abs(y - ref).max()
            rel = err / max(refmax, 1e-9)
            print(f"{kind}{k}.{n} check: max_abs={err:.4f} rel={rel:.4f} "
                  f"(bf16 dots; ref_max={refmax:.2f})")

        # repack: sep-layout inputs (dx pre-packed lanes), parity store
        sa = np.zeros((CH + 2, OW + 8, 3 * k), np.float32)
        for dx in range(3):
            sa[:, :OW, dx * k : (dx + 1) * k] = act[:, dx : dx + OW]
        sw = g.reshape(9 * k, n)
        jfn = built[f"repack{k}.{n}"][0]
        out = np.asarray(jfn(jnp.asarray(sa, dt), jnp.asarray(sw, dt)),
                         np.float64)
        y = unparity(out)
        err = np.abs(y - ref).max()
        print(f"repack{k}.{n} check: max_abs={err:.4f} "
              f"rel={err / max(refmax, 1e-9):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
