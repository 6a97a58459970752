#!/usr/bin/env python
"""Chunk-level probe: denser f=5 conv2 formulations (VERDICT r4 #3).

The flagship's top stage is conv2-quad (f=5, k=64, n=32): 9 half-res
tap dots (M, 4k=256) @ (256, 4n=128) per row group — 18 MXU K-passes
per M. Its quad weight layout is 69% filled ((5/6)² — the (tap,
input-parity) → (output-parity) combos whose dy or dx falls outside
the 5×5 footprint are structural zeros), and the measured stage cost
(2.40 ms) sits ~0.85 ms above even the CHARGED floor. Two distinct
hypotheses, both measured here:

* **zeros are removable** → a denser formulation wins. Candidates:
  - ``w55f``: an ACTUAL F(2x2,5x5) probe with the transform folded
    into the weights (the k=64 j-paired fold one f up — the round-4
    analysis-only rejection, now priced): 1-D row Winograd (B6ᵀ row
    combos, NON-unit coeffs on the VPU) × direct cols folded into the
    weights. Pass math says 6 row-combos × 3 K-blocks × 1 N-block =
    18 passes — equal to quad — PLUS the VPU row combos and a
    half-empty N (2n=64 charges 128 lanes at n=32), so the analysis
    predicts a loss; this probe replaces the prediction with a number.
  - Pass-count analysis for every K-regroup (shared/p-specific tap
    split, position-split N): at N = 4n = 128 exactly one N-block,
    EVERY K row is live for some output column, so no K-row
    elimination exists; regroups shuffle the same 18-pass total
    (documented in docs/BENCHMARKS.md with this probe's results).
* **the gap is scheduling, not fill** → fewer/larger dots win at the
  same pass count. Candidates:
  - ``quadp``: taps K-concatenated in PAIRS — 5 dots (M, 512) @
    (512, 128) instead of 9+8 accumulate adds (4 lane-concats).
  - ``quad1``: ONE dot (M, 2304) @ (2304, 128) (8 lane-concats,
    zero accumulate adds).

All variants produce the 4-parity output planes of the shipping chain
and check against a numpy direct conv (``--check``). Reference math:
layer_uber_kernel.cl:59-95 at F_SPATIAL_SIZE=5.

Methodology per docs/BENCHMARKS.md: serialized, warmup, x1/x2 inner
marginal, interleaved rounds.

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/wino5_probe.py
    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/wino5_probe.py --check
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K, N = 64, 32           # conv2: 64 -> 32
F = 5
TG = (F + 1) // 2       # 3 half-res taps per axis
K4, N4 = 4 * K, 4 * N   # quad lanes
TR, TC = 12, 128        # output half-res rows x cols per chunk
TRG = 6                 # row group (shipping)
TCP = 136               # input col sublanes (TC + 2, padded to 8)
M = TRG * TC

# ---- F(2,5) matrices: 6-point family {0, 1, -1, 2, -2, inf} ----
# B6 is the shared t=6 input transform (identical to F(4x4,3x3)'s —
# same points, same tile); G25 evaluates the degree-4 weight poly at
# the points with the family's Lavin-Gray normalization; AT25 keeps
# the first two interpolation rows. Verified against a direct conv in
# _matrices_check() (run under --check).
B6 = np.array([
    [4, 0, -5, 0, 1, 0],
    [0, -4, -4, 1, 1, 0],
    [0, 4, -4, -1, 1, 0],
    [0, -2, -1, 2, 1, 0],
    [0, 2, -1, -2, 1, 0],
    [0, 4, 0, -5, 0, 1]], np.float64)
_PTS = [0.0, 1.0, -1.0, 2.0, -2.0]
_NRM = [0.25, -1 / 6, -1 / 6, 1 / 24, 1 / 24]
G25 = np.zeros((6, 5))
for _i, (_a, _n) in enumerate(zip(_PTS, _NRM)):
    G25[_i] = _n * np.asarray([_a ** j for j in range(5)])
G25[5, 4] = 1.0
AT25 = np.array([[1, 1, 1, 1, 1, 0],
                 [0, 1, -1, 2, -2, 1]], np.float64)


def _matrices_check():
    rng = np.random.default_rng(0)
    w = rng.standard_normal(5)
    d = rng.standard_normal(6)
    got = AT25 @ ((G25 @ w) * (B6 @ d))
    want = np.asarray([np.dot(d[j:j + 5], w) for j in range(2)])
    err = np.abs(got - want).max()
    assert err < 1e-9, f"F(2,5) matrices wrong: {err}"


def quad_weights(g):
    """g: (5, 5, K, N) -> (9*K4, N4) shipping quad layout: block for
    tap (ro, co) maps input parity (rp, cp) to output parity (p, q)
    with w[2ro+rp-p, 2co+cp-q] (zero outside the footprint)."""
    wq = np.zeros((TG * TG, 4, K, 4, N), np.float32)
    for ro in range(TG):
        for co in range(TG):
            for rp in range(2):
                for cp in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * ro + rp - p
                            dx = 2 * co + cp - q
                            if 0 <= dy < F and 0 <= dx < F:
                                wq[ro * TG + co, 2 * rp + cp, :,
                                   2 * p + q, :] = g[dy, dx]
    return wq.reshape(TG * TG * K4, N4)


def w55f_weights(g):
    """g: (5, 5, K, N) -> (6, 6*K, 2*N): per row-combo a, the
    col-direct weights of the row-transformed filter u_a = G25 @ g
    over dy. K rows are (co, cp, c) raw half-res col taps; N cols are
    (q, n) output col parity x channel; entry u_a[2co+cp-q] with the
    (5/6)-fill col zeros."""
    u = np.einsum("ad,dxkn->axkn", G25, g.astype(np.float64))  # (6,5,K,N)
    w = np.zeros((6, TG, 2, K, 2, N), np.float64)
    for a in range(6):
        for co in range(TG):
            for cp in range(2):
                for q in range(2):
                    dx = 2 * co + cp - q
                    if 0 <= dx < F:
                        w[a, co, cp, :, q, :] = u[a, dx]
    return w.reshape(6, TG * 2 * K, 2 * N).astype(np.float32)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=1024)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--check", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.bfloat16
    _matrices_check()

    def store_y(ys, out_ref, t0, rows):
        for pq in range(4):
            out_ref[pq // 2, pq % 2, t0 : t0 + rows] = jnp.maximum(
                ys[pq].reshape(rows, TC, N), 0.0).astype(dt)

    def quad_body(group_k, inner=1):
        # group_k: taps K-concatenated in groups of group_k (1 = the
        # shipping 9-dot form; 2 = quadp; 9 = quad1)
        def body(a_ref, w_ref, out_ref):
            taps = [(ro, co) for ro in range(TG) for co in range(TG)]
            for t0 in list(range(0, TR, TRG)) * inner:
                rows = min(TRG, TR - t0)
                mrow = rows * TC
                s_all = None
                for g0 in range(0, 9, group_k):
                    grp = taps[g0 : g0 + group_k]
                    ops = [
                        a_ref[t0 + ro : t0 + ro + rows,
                              co : co + TC, 0:K4]
                        .reshape(mrow, K4).astype(dt)
                        for ro, co in grp
                    ]
                    op = (ops[0] if len(ops) == 1
                          else jnp.concatenate(ops, axis=1))
                    mdot = jax.lax.dot_general(
                        op, w_ref[g0 * K4 : (g0 + len(grp)) * K4],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s_all = mdot if s_all is None else s_all + mdot
                store_y([s_all[:, pq * N : (pq + 1) * N]
                         for pq in range(4)], out_ref, t0, rows)
        return body

    def w55f_body(inner=1):
        # 1-D row Winograd x col-direct-folded: per row-combo a, the
        # B6 row combos (NON-unit coeffs -> VPU multiplies) feed one
        # (M, 6K) @ (6K, 2N) dot whose N carries the output col
        # parity; AT25 row accumulation (coeff 2/-2 also non-unit).
        def body(a_ref, w_ref, out_ref):
            for t0 in list(range(0, TR, TRG)) * inner:
                rows = min(TRG, TR - t0)
                mrow = rows * TC
                ys = [None] * 4
                for a in range(6):
                    v = None
                    for ti in range(6):
                        c = float(B6[a, ti])
                        if c == 0.0:
                            continue
                        rp = ti % 2
                        tap = a_ref[
                            t0 + ti // 2 : t0 + ti // 2 + rows,
                            0:TCP, 2 * rp * K : 2 * (rp + 1) * K]
                        tap = tap if c == 1.0 else tap * c
                        v = tap if v is None else v + tap
                    # Mosaic cannot lane-concat slices at different
                    # sublane offsets ("offset mismatch on non-concat
                    # dim"),
                    # so the (M, 6K) operand splits into 3 K-slice
                    # dots — identical MXU pass count (3x1 K-blocks)
                    mdot = None
                    for co in range(TG):
                        op = (v[:, co : co + TC, :]
                              .reshape(mrow, 2 * K).astype(dt))
                        d = jax.lax.dot_general(
                            op, w_ref[(a * TG + co) * 2 * K
                                      : (a * TG + co + 1) * 2 * K],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        mdot = d if mdot is None else mdot + d
                    for pz in range(2):
                        c = float(AT25[pz, a])
                        if c == 0.0:
                            continue
                        for q in range(2):
                            m = mdot[:, q * N : (q + 1) * N]
                            m = m if c == 1.0 else m * c
                            i = 2 * pz + q
                            ys[i] = m if ys[i] is None else ys[i] + m
                store_y(ys, out_ref, t0, rows)
        return body

    VARIANTS = {
        "quad": (quad_body, dict(group_k=1), "quad"),
        "quadp": (quad_body, dict(group_k=2), "quad"),
        "quad1": (quad_body, dict(group_k=9), "quad"),
        "w55f": (w55f_body, {}, "w55f"),
    }

    rng = np.random.default_rng(0)
    g = (rng.random((F, F, K, N), np.float32) - 0.5).astype(np.float32)
    # quad image: half-res (TR+2, TCP, 4K) f32 (the chain stores acts
    # in the stream dtype; f32 here biases ALL variants identically
    # and keeps the w55f combos exact)
    a_np = (rng.random((TR + 2, TCP, K4), np.float32) - 0.5)
    a_dev = jnp.asarray(a_np)
    wq = jnp.asarray(quad_weights(g), dt)
    wf = jnp.asarray(w55f_weights(g).reshape(6 * TG * 2 * K, 2 * N), dt)

    o_s = (2, 2, TR, TC, N)
    built = {}
    for name, (maker, kw, wkind) in VARIANTS.items():
        for inner in (1, 2):
            body = maker(inner=inner, **kw)
            fn = pl.pallas_call(
                body,
                grid=(args.reps,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(
                    o_s, lambda *i, _n=len(o_s): (0,) * _n,
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(o_s, dt),
                interpret=jax.default_backend() == "cpu",
            )
            w = wq if wkind == "quad" else wf
            sfx = "" if inner == 1 else "x2"
            built[name + sfx] = (jax.jit(fn), w)

    if args.check:
        # oracle: reconstruct the full-res block from the quad image,
        # direct-conv it, re-split into parity planes
        fullk = np.zeros((2 * (TR + 2), 2 * TCP, K), np.float32)
        for rp in range(2):
            for cp in range(2):
                fullk[rp::2, cp::2] = a_np[:, :, (2 * rp + cp) * K
                                           : (2 * rp + cp + 1) * K]
        want = np.zeros((2, 2, TR, TC, N), np.float32)
        out_full = np.zeros((2 * TR, 2 * TC, N), np.float32)
        for dy in range(F):
            for dx in range(F):
                out_full += np.einsum(
                    "rck,kn->rcn",
                    fullk[dy : dy + 2 * TR, dx : dx + 2 * TC], g[dy, dx])
        out_full = np.maximum(out_full, 0.0)
        for p in range(2):
            for q in range(2):
                want[p, q] = out_full[p::2, q::2]
        for name, (fn, w) in built.items():
            if name.endswith("x2"):
                continue
            got = np.asarray(fn(a_dev, w)).astype(np.float32)
            err = np.abs(got - want).max()
            rel = err / np.abs(want).max()
            print(f"{name:6s} max|err| {err:.3e}  (rel {rel:.2e})")
        return 0

    def bench(name) -> float:
        fn, w = built[name]

        def run():
            out = fn(a_dev, w)
            return np.asarray(out[0, 0, 0, :1])

        _ = run()
        t0 = time.perf_counter()
        _ = run()
        return (time.perf_counter() - t0) / args.reps * 1e6

    results = {n: [] for n in built}
    for rep in range(args.rounds):
        for name in results:
            us = bench(name)
            results[name].append(us)
            print(f"rep {rep} {name:8s} {us:8.3f} us/step", flush=True)
    print("\nMARGINAL us per 24x256-output chunk (x2 - x1, best each):")
    for name in VARIANTS:
        t1, t2 = min(results[name]), min(results[name + "x2"])
        print(f"{name:8s} {t2 - t1:8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
