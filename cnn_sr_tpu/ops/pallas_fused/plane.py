"""Raw-plane first layer: in-register im2col (trace-time helper).

Called from ``kernel._fused_tail_single`` when the input is the raw
(C, H, W) image plane. Per R-row × 128-col block: f₁·c lane-rolls of an
S-row E slab build F[(ch,dx,t), i] = E_ch[t, i+dx]; ONE MXU
identity-dot transposes F to (i, K); ONE (128, K) @ (K, R·n) dot
against H[(ch,dx,t),(r,n)] = w1[t−r, dx, ch] computes all R rows × n
channels (taps with t−r outside [0, f₁) hit H's zero rows, so slab
overreads are safe). R=16 (S=24 at f₁≤9) halves the transpose passes
and cuts roll traffic 25% vs the original R=8/S=16. This replaces the
XLA patch-array build AND its 128-lane-padded window DMA outright
(docs/BENCHMARKS.md). Reference math: layer_uber_kernel.cl:59-95 at
layer 1 (single/few-channel input).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def plane_first_layer(src, w_ref, b_ref, act_ref, *, f1, c_in, oh, nblk,
                      l1_r, l1_s, n, cons_wino, cons_quad, cnt, wtgt,
                      act_dt, dtype, skip):
    """Run the plane first layer and store into ``act_ref``.

    ``cons_wino``: the consumer is a wino-family layer — the identity
    dot's selection matrix is PERMUTED so the block's output columns
    come out parity-sorted (rows 0:64 ← even cols, 64:128 ← odd) and
    the col-parity split is two PLAIN stores of slab halves riding the
    already-paid MXU transpose. ``cons_quad`` = the consumer reads the
    rank-3 quad image (4n lane groups; f==3/k==32 and every f==5
    consumer), else rank-4 parity planes. ``cnt``/``wtgt``:
    prepack copy count and target width for normal consumers (1/width
    when not prepacked). ``skip``: the trace-time _DEBUG_SKIP set.
    """
    ri_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    if cons_wino:
        # PERMUTED transpose: the identity-dot's selection
        # matrix orders the block's output cols
        # parity-sorted (rows 0:64 ← even cols 2r, rows
        # 64:128 ← odd cols 2r+1), so the col-parity split
        # of the parity store below is two PLAIN stores of
        # slab halves — the permutation rides the already-
        # paid MXU transpose for free. Row parity is just
        # (r8 + r) % 2.
        eye = (((ri_ < 64) & (ci_ == 2 * ri_))
               | ((ri_ >= 64) & (ci_ == 2 * ri_ - 127))
               ).astype(dtype)
    else:
        eye = (ri_ == ci_).astype(dtype)
    for r8 in range(0, oh, l1_r):
        rows = min(l1_r, oh - r8)
        for wb in range(nblk):
            wc = wb * 128
            fparts = []
            for ci in range(c_in):
                ef = src[ci, r8 : r8 + l1_s, wc : wc + 256
                         ].astype(jnp.float32)
                for dx in range(f1):
                    # lane rotates support 32-bit data only
                    fparts.append(
                        pltpu.roll(ef, (256 - dx) % 256,
                                   axis=1)[:, 0:128]
                        .astype(dtype))
            fmat = jnp.concatenate(fparts, axis=0)
            ft = jax.lax.dot_general(
                eye, fmat,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            yb = jax.lax.dot_general(
                ft, w_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            yb = jnp.maximum(yb + b_ref[...], 0.0).astype(act_dt)
            if "l1_store" in skip:  # triage-only gate
                # full-row store ((1,1,1) stores into packed
                # bf16 refs fail Mosaic lowering)
                act_ref[0:1] = jnp.broadcast_to(
                    jnp.max(yb.astype(jnp.float32))
                    .reshape((1,) * len(act_ref.shape))
                    .astype(act_dt),
                    (1,) + act_ref.shape[1:])
                continue
            for r in range(rows):
                # slab (128 cols-in-sublanes, n-in-lanes)
                # matches the act ref's (W, C) tile layout
                slab = yb[:, r * n : (r + 1) * n]
                if cons_wino:
                    # parity store (permuted slab halves):
                    # orig cols wc+2s / wc+2s+1 → half-res
                    # col wc/2 + s, col-parity lane group
                    rr = r8 + r
                    rp_, qr = rr % 2, rr // 2
                    x0q = wc // 2
                    qw = (act_ref.shape[1]
                          if cons_quad
                          else act_ref.shape[2])
                    x1q = min(x0q + 64, qw)
                    if x1q <= x0q:
                        continue
                    for cp_ in range(2):
                        half = slab[cp_ * 64
                                    : cp_ * 64 + (x1q - x0q)]
                        if cons_quad:
                            # rank-3 quad image: lane
                            # group (2·rp + cp)·n
                            act_ref[
                                qr, x0q:x1q,
                                (2 * rp_ + cp_) * n
                                : (2 * rp_ + cp_ + 1) * n,
                            ] = half
                        else:
                            # rank-4 parity planes: plane
                            # rp, lane group cp·n
                            act_ref[
                                rp_, qr, x0q:x1q,
                                cp_ * n : (cp_ + 1) * n,
                            ] = half
                    continue
                for c in range(cnt):
                    x0, s0 = wc - c, 0
                    if x0 < 0:
                        s0, x0 = -x0, 0
                    x1 = min(x0 + 128 - s0, wtgt)
                    if x1 <= x0:
                        continue
                    act_ref[
                        r8 + r, x0:x1, c * n : (c + 1) * n
                    ] = slab[s0 : s0 + (x1 - x0)]
