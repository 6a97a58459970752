"""Micro-benchmark: im2col patch-array build variants on the real chip.

The fused inference path's dominant remaining stage is the XLA-side
patch-array build (`ops.pallas_fused._im2col_patches`): a stack of
shifted 2D slices + a minor-dim transpose into the lane-padded
(oh, ow, C) layout, measured write-bound on the padded output
(docs/BENCHMARKS.md "dy-packed patch build"). This probe times build
variants in isolation with the repo's dependency-chained `lax.scan`
methodology to answer layout/dtype questions without paying a full
pipeline recompile per hypothesis:

  int8    — shipped form: quantize to int8 BEFORE the stack, transpose
            int8 (TPU transposes of 8-bit data may be pack-emulated;
            this is the hypothesis under test)
  bf16    — stack/transpose in bf16, quantize to int8 AFTER (2x the
            transpose bytes, native 16-bit relayout)
  f32     — stack/transpose in f32, quantize after (4x bytes)
  stack8  — int8 stack WITHOUT the transpose (isolates stack vs
            transpose cost; output layout is unusable, timing only)
  int8pad — shipped build PLUS the kernel wrapper's tail pad to the
            grid-aligned spatial size and 128 lanes (what
            `_fused_tail_single` actually feeds the window DMA) —
            minus int8 isolates the tail pad's full-copy cost
  t2d     — int8 planes sliced at 128-aligned padded width, collapsed
            to (C, oh·ow_pad) and moved with ONE 2D transpose, then
            reshaped back — tests whether a single clean 2D relayout
            beats the rank-3 minor-dim transpose (output width is
            already tail-aligned; timing-comparable to int8, shape
            differs)
  plane8  — quantize each input CHANNEL as a dense 2D plane first,
            then stack shifted slices of the 2D int8 planes — avoids
            any (H, W, 1) int8 temp (which lane-pads 1 → 128 if XLA
            materializes it) and quantizes each pixel once instead of
            once per shifted slice

Usage: python tools/patchbuild_probe.py [--hw 1080x1920] [--f 9]
           [--c 1] [--dpack 5] [--iters 20] [--variants int8,bf16,...]

Prints one line per variant: name, ms/build, relative to the first.
Serialize with other TPU jobs (CLAUDE.md); probe tunnel health first
if numbers look 15-20x off.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("CNN_SR_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="1080x1920")
    ap.add_argument("--f", type=int, default=9)
    ap.add_argument("--c", type=int, default=1)
    ap.add_argument("--dpack", type=int, default=5,
                    help="dy-taps packed in lanes (0 = full f); flagship auto uses 5")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="int8,bf16,f32,stack8,int8pad,t2d,plane8")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))
    f, c, dpack = args.f, args.c, args.dpack

    dcnt = dpack if 0 < dpack < f else f
    gcnt = -(-f // dcnt)
    row_pad = gcnt * dcnt - f

    def build(x, mode: str):
        # mirrors ops.pallas_fused._im2col_patches (kept in sync by the
        # equivalence check below), parameterized by where the int8
        # quantization happens relative to the stack+transpose
        oh = x.shape[0] - f + 1 + (gcnt - 1) * dcnt
        ow = x.shape[1] - f + 1
        if row_pad:
            x = jnp.pad(x, ((0, row_pad), (0, 0), (0, 0)))
        if mode == "t2d":
            # slice planes at 128-aligned padded width so the
            # (C, oh, ow_pad) -> (C, oh*ow_pad) collapse is free, then
            # one 2D transpose does the whole minor-dim move
            ow_pad = -(-ow // 128) * 128
            x = jnp.pad(x, ((0, 0), (0, ow_pad + f - 1 - x.shape[1]), (0, 0)))
            xb = jnp.round(jnp.clip(x, -1.0, 1.0) * 127.0).astype(jnp.int8)
            planes = jnp.stack(
                [
                    xb[dy : dy + oh, dx : dx + ow_pad, ch]
                    for dy in range(dcnt)
                    for dx in range(f)
                    for ch in range(c)
                ],
                axis=0,
            )
            cc = planes.shape[0]
            flat = planes.reshape(cc, oh * ow_pad)
            return flat.T.reshape(oh, ow_pad, cc)
        if mode == "plane8":
            chans = [
                jnp.round(jnp.clip(x[:, :, ch], -1.0, 1.0) * 127.0).astype(jnp.int8)
                for ch in range(c)
            ]
            planes = jnp.stack(
                [
                    chans[ch][dy : dy + oh, dx : dx + ow]
                    for dy in range(dcnt)
                    for dx in range(f)
                    for ch in range(c)
                ],
                axis=0,
            )
            return planes.transpose(1, 2, 0)
        if mode in ("int8", "stack8"):
            xb = jnp.round(jnp.clip(x, -1.0, 1.0) * 127.0).astype(jnp.int8)
        elif mode == "bf16":
            xb = x.astype(jnp.bfloat16)
        else:
            xb = x
        planes = jnp.stack(
            [
                xb[dy : dy + oh, dx : dx + ow, ch]
                for dy in range(dcnt)
                for dx in range(f)
                for ch in range(c)
            ],
            axis=0,
        )
        if mode == "stack8":
            return planes  # (C, oh, ow) int8 — no transpose (timing only)
        out = planes.transpose(1, 2, 0)
        if mode not in ("int8", "int8pad"):
            out = jnp.round(jnp.clip(out.astype(jnp.float32), -1.0, 1.0)
                            * 127.0).astype(jnp.int8)
        if mode == "int8pad":
            # approximate _fused_tail_single's window geometry (64x256
            # tiles, flagship shrink=8 tail, int8 sublane alignment;
            # ignores the dy-pack row extension — cost probe only)
            th, tw, shrink = 64, 256, 8
            gh = -(-(out.shape[0] - shrink) // th)
            gw = -(-(out.shape[1] - shrink) // tw)
            win_h = th + shrink
            win_w = -(-(tw + shrink) // 32) * 32
            ph = max(0, (gh - 1) * th + win_h - out.shape[0])
            pw = max(0, (gw - 1) * tw + win_w - out.shape[1])
            out = jnp.pad(out, ((0, ph), (0, pw),
                                (0, 128 - out.shape[2])))
        return out

    @functools.partial(jax.jit, static_argnames=("mode",))
    def chained(x, mode):
        def body(carry, _):
            out = build(carry, mode)
            nxt = carry.at[0, 0, 0].set(out[0, 0, 0].astype(jnp.float32) / 127.0)
            return nxt, ()

        final, _ = jax.lax.scan(body, x, None, length=args.iters)
        return final

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (h, w, c)).astype(np.float32)))

    # correctness: every transposing variant must match the shipped int8
    # build within 1 quantization LSB (bf16/f32 variants quantize AFTER
    # the cast, so values that land exactly between int8 steps can round
    # one step differently — 1/254 on unit scale, inside the bf16 stream
    # path's own rounding envelope)
    small = jnp.asarray(rng.uniform(-1, 1, (4 * f, 4 * f, c)).astype(np.float32))
    names = [v for v in args.variants.split(",") if v]
    ref = None
    for v in names:
        if v in ("stack8", "int8pad", "t2d"):  # different output shapes
            continue
        got = np.asarray(build(small, v)).astype(np.int32)
        if ref is None:
            ref = got
        else:
            np.testing.assert_allclose(got, ref, atol=1, err_msg=v)
    if ref is not None and "t2d" in names:
        got = np.asarray(build(small, "t2d")).astype(np.int32)
        np.testing.assert_array_equal(
            got[: ref.shape[0], : ref.shape[1], :], ref, err_msg="t2d")

    base = None
    for v in names:
        fn = lambda: jax.block_until_ready(chained(x, v))
        fn()  # compile
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        if base is None:
            base = dt
        print(f"{v:7s} {dt:8.3f} ms/build   x{dt / base:.3f} vs {names[0]}")


if __name__ == "__main__":
    main()
