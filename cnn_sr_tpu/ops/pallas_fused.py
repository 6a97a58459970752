"""Fused inference path: XLA im2col first layer + Pallas all-VMEM tail.

TPU-native replacement for the reference's per-layer "uber kernel"
dispatches (layer_uber_kernel.cl; ConfigBasedDataPipeline.cpp:200-241),
shaped by measurements on v5e (1080p SRCNN 9-5-5):

* XLA's native conv lowering collapses on SRCNN's channel shapes
  (37 ms for 1→64 f9, 32 ms for 32→1 f5 at DEFAULT precision);
* a pure-XLA im2col/matmul formulation (models/fast_forward.py) is
  2.4x faster but bound by patch materialization in HBM
  (~20 GB/frame for the K=320 middle layer);
* an all-Pallas kernel hits a wall on the FIRST layer (single-channel 2D
  data cannot be moved into the lane dimension, forcing a VPU path whose
  accumulator round-trips dominate), and f32 in-kernel matmuls run at
  multi-pass-emulation speed (measured 52 ms/frame).

Hence the hybrid, bf16-streaming design: **layer 1 runs as one XLA
im2col matmul** (patches are f₁² single-channel columns, K=81 feeds the
MXU well) and **layers 2..L run in one Pallas kernel** over spatial
tiles with every patch and activation resident in VMEM, streamed as
bfloat16 and accumulated in float32:

* per grid step, one aligned DMA pulls a ``(tile + halo)`` window of the
  layer-1 activation (lane dim = channels padded to 128 — physically
  free, HBM tiles pad lanes anyway; the kernel slices the real C back);
* middle layers: shared-patch im2col + output-stationary shift-add,
  scheduled in rolling row chunks — patches for kernel row dy+1 are a
  one-row shift of dy's, so a patch row feeds ONE ``(rows·ow, f·k) @
  (f·k, f·n)`` bf16 MXU matmul computing every dy-phase at once
  (weights for all f kernel rows packed along N), and the f phase
  planes are combined by static shifted adds fused into the bias+ReLU.
  vs f separate ``@ (f·k, n)`` matmuls this reads patches once instead
  of f times and runs ⌈f·n/128⌉ MXU column passes instead of f at
  n/128 utilization. Patches and phase outputs (Z) materialize only
  ``chunk_rows`` (+f−1 for Z) rows at a time: each chunk builds its
  patch rows, lands its Z rows after the f−1 rows rolled over from the
  previous chunk, and immediately emits its output rows — full-height
  Z scratch made deep stacks scoped-VMEM-bound (7-layer RGB at 64×128
  carried ~90 MB and 64×256 blew the 100 MB budget);
* the last layer (n_out = 1) would waste 127/128 MXU lanes, so patches
  are multiplied by the broadcast weight row and lane-reduced on the
  VPU in f32.

bf16 streaming error on 0..1 luma is ~1e-3 RMS — a <0.01 dB effect on
PSNR-vs-reference (contract: 0.05 dB), gated by tests; pass
``dtype=jnp.float32`` for exact parity at ~3x the cost.

Weight layout is the reference's HWIO ``(f, f, k, n)``
(layer_uber_kernel.cl:3-12). ``fused_forward`` is a drop-in for
``models.forward`` on single-output-channel models with a few-channel
first layer; anything else falls back to the XLA conv path.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.fast_forward import _conv_first

# Default row-chunk of the middle layers' rolling all-phase matmul:
# bounds BOTH the per-dot operand/result stack transients and the
# persistent Z/patch scratch (chunk_rows+f−1 resp. chunk_rows rows per
# f>1 layer). Deep stacks (>4 layers) run 24: the historical 16 was
# set when every deep layer carried Z+patch scratch; after sep +
# full prepack freed that VMEM, 24 measured best (tools/tile_probe.py
# 64×256 chunk 16/24/32 = 24.0/22.85/23.3 ms, 2×-confirmed 2026-08-18).
_MM_CHUNK_ROWS = 32
_MM_CHUNK_ROWS_DEEP = 24

# Perf-triage knob (tools/kernel_triage.py): stages named here are
# SKIPPED OUTRIGHT (their outputs stay uninitialized VMEM garbage) so
# their cost can be measured by subtraction. NEVER set in production.
# Keys gate code paths, not model layers: "l1" = all f==1 layers and
# the plane first layer (on 9-1-5 also its 1x1 middle layer),
# "mid"/"patch" = f>1 middle layers / their patch build ("patch" is a
# no-op for pre-packed consumers — shallow stacks — whose patch stores
# live in the producer's store, gated by that producer's stage key),
# "last" = the VPU last layer, "dma" = the window copies. Finer keys
# for sub-stage triage: "l1_store" keeps l1's dots but replaces its
# (prepack) stores with a one-element max-store; "mid_dot" skips the
# all-phase matmul (note: gated with `not in`, the dot is the default);
# "mid_combine" skips phase combine AND output store; "mid_store" keeps
# the combine but replaces the store with a one-element max-store.
# Per-layer keys "L{li}" (li = 0-based index into the KERNEL's layer
# list, i.e. dims) skip exactly that layer — note skipping a pre-packed
# consumer's producer also skips the consumer's patch stores (they live
# in the producer's store), and "L{n_layers-1}" is spelled "last".
_DEBUG_SKIP: frozenset = frozenset()

# Trace-time observability for tests: True when the last TRACED
# _fused_tail_single call had to pad/convert its input (the folded-conv1
# path pre-builds at the padded geometry, so this must stay False there
# — a geometry drift between _window_pads and the kernel would silently
# reintroduce a quarter-GB pad copy per frame). Only updated when a
# call actually traces (cache hits skip tracing).
_LAST_TAIL_PADDED: bool = False


def _sep_layers(dims, n_layers, prepack_max_deep, sep_max_n):
    """Middle layers that run as SEPARATED-PHASE dots (``sep_max_n``):
    f row-shifted ``(rows·ow, f·k) @ (f·k, n)`` dots against per-dy
    weight slabs, accumulated in f32 — no Z scratch, no phase combine.
    Eligible: f==3 middle layers with a pre-packed input (mirror of the
    kernel's prepack rule — the shifted operand rows must already be
    patch rows) and n ≤ sep_max_n. The all-phase form pays a full-width
    Z store plus f misaligned n-lane slice reads per row; at f=3 those
    dominate the layer (sep_probe 2026-08-18, 7-layer RGB: monotone win
    at EVERY n, 22.26 → 19.54 ms/frame at thr 128). MXU column passes
    grow ⌈f·n/128⌉ → f·⌈n/128⌉ — at f=5 that penalty wins instead
    (flagship 9-5-5 middle: 10.75 → 13.25 ms), hence the f==3 gate.
    Shared by the kernel and ``fused_forward`` (weight prep) so the two
    cannot drift."""
    if sep_max_n <= 0:
        return frozenset()
    fs = [d[0] for d in dims]
    ks = [d[1] for d in dims]
    ns = [d[2] for d in dims]
    return frozenset(
        li for li in range(1, n_layers - 1)
        if fs[li] == 3 and ns[li] <= sep_max_n
        and (n_layers <= 4 or fs[li] * ks[li] <= prepack_max_deep)
    )


# Winograd F(2x2,3x3) layer mode (tools/winograd_probe.py): eligible
# f==3 middle layers run 16 position-matmuls (tiles, k) @ (k, n) over
# 2x2 output tiles — 16 multiplies per tile instead of the direct
# form's 36 (2.25x fewer MACs, full MXU K-fill at k == 128). Measured
# marginals at the RGB deep shapes (6-round interleaved, 2026-08-20):
# (k,n)=(128,128) sep 9.94 vs winoF 4.46 us/chunk (-55%), (128,64)
# -43%; k=64 LOSES (half-filled K) — hence the k==128 gate. The
# stride-2 tile decomposition runs in a PARITY domain: activations
# live as (row/2, col/2, (2·rowpar + colpar)·k + c) so every Winograd
# tap d[2i+a, 2j+b] is a contiguous row/sublane/lane-group slice.
# Parity entry (producer side) is a measured-~free repack: f32 scratch
# + four stride-2 quadrant loads (Mosaic lowers 32-bit strided ref ops
# when the memref's last dim is exactly 128 — tools/strided_store_probe
# .py); parity exit folds into a half-resolution mm_last whose parity
# out blocks one XLA transpose recombines.
_WINO_TRG = 6  # parity-row group per step: bounds the 4 f32 Y
#                accumulators (4·TRG·TC·n f32 must fit scoped VMEM —
#                a 12-row group OOMed at k=n=128, 18.7M > 16M)
_WINO_BT = ((1, 0, -1, 0), (0, 1, 1, 0), (0, -1, 1, 0), (0, 1, 0, -1))
_WINO_AT = ((1, 1, 1, 0), (0, 1, -1, -1))


def _wino_tc(ws, li):
    """Winograd tile-column count for wino layer ``li``: the half-res
    output width rounded UP to 16 — the (rows, tc, k) → (rows·tc, k)
    operand collapse before each of the 16 position dots is only a free
    relayout-less view when tc fills whole bf16 sublane tiles (the same
    8-alignment lesson as the ws chain, one tile size up). The probe
    ran TC=128 and won; an unaligned 132 made every dot pay a
    tile-shuffling copy (measured 28.6 vs 18.2 ms full-kernel,
    2026-08-20). Extra columns read over-allocated garbage lanes and
    emit garbage outputs that stay in their own columns."""
    return -(-(ws[li + 1] // 2) // 16) * 16


def _wino_w_in(ws, li):
    """Width of wino layer ``li``'s parity-plane input ref: must hold
    the producer's parity store (ws[li]//2 cols, 8-aligned) AND the tap
    over-read (tc + 1 cols, 8-aligned ⇒ tc + 8 at 16-multiple tc)."""
    return max(-(-(ws[li] // 2) // 8) * 8, _wino_tc(ws, li) + 8)


def _wino_layers(dims, n_layers, mm_last, min_li=1):
    """Middle layers running Winograd F(2x2,3x3) in the parity domain.

    Eligible (computed back to front): f == 3, k ∈ {32, 64, 128}, and
    a consumer that reads parity — either another wino-family layer or
    the last layer under ``mm_last`` with f == 3 and n_out ≤ 16 (its
    half-res all-phase dot carries 2·4·n_out Z lanes). Three per-k dot
    regimes share the parity domain:

    * k == 128: 16 unpaired position dots, rank-4 (2, H/2, W, 2k)
      parity planes (row parity = plane, col parity = lane group).
    * k == 64: j-PAIRED dots with the col transform folded into the
      weights (8 full (128, 2n) dots) over the same rank-4 layout
      (2k == 128 lanes per plane).
    * k == 32: direct QUAD-parity all-phase — all four parities in the
      lanes of ONE rank-3 (H/2, W, 4k == 128) image, 4 raw-tap dots
      (128, 4n) against direct conv weights (no Winograd math: at this
      k the win is pure K/N parity packing; Winograd's MAC saving
      can't beat the packing loss — docs/BENCHMARKS.md).

    Entry stores (``store_act``) cover producers with n ∈ {32, 64,
    128} via the 128-lane-memref strided-quadrant pattern; wino→wino
    boundaries store parity directly; the plane first layer
    parity-stores via its PERMUTED identity-dot transpose (col-parity-
    sorted output columns → plain split stores), so min_li is 1 for
    every first-layer form. Tile evenness is the caller's gate. Shared
    by the kernel and ``fused_forward`` weight prep."""
    fs = [d[0] for d in dims]
    ks = [d[1] for d in dims]
    ns = [d[2] for d in dims]
    elig: set = set()
    last_ok = mm_last and fs[-1] == 3 and ns[-1] <= 16
    for li in range(n_layers - 2, min_li - 1, -1):
        cons_ok = (li + 1 in elig) or (li + 2 == n_layers and last_ok)
        if fs[li] == 3 and ks[li] in (32, 64, 128) and cons_ok:
            elig.add(li)
    return frozenset(elig)


def _wino_weights(w, dtype):
    """(3,3,k,n) HWIO → the kernel's position-slab layout.

    k == 128: (16k, n) — rows (4a+b)·k + c hold the Winograd-
    transformed U = G g Gᵀ per (c, n); position pos = 4a+b matches the
    kernel's ``w_ref[pos·k : (pos+1)·k]`` slabs.

    k == 64 (j-PAIRED, col-transform-folded): (8·128, 2n) — the col
    transform and the per-col-parity output combine FOLD INTO THE
    WEIGHTS, so the dots consume the row-combined rs values directly:

        S_pa[:, q·n + nn] = Σ_j Σ_c rs[pa][j][c] · W̃[pa][j][c, q·n+nn]
        W̃[pa][j] = Σ_pb AT[q][pb] · BT[pb][j] · U[pa][pb]
        Y[p, q]  = Σ_pa AT[p][pa] · S_pa[:, q·n:(q+1)·n]

    Slab pa·2 + jp (128 rows) holds W̃[pa][2·jp] in rows 0:64 and
    W̃[pa][2·jp+1] in rows 64:128 — exactly matching the paired rs
    operand [rs(2jp) | rs(2jp+1)] that one 128-lane parity-plane tap
    read produces (both col parities per read, j = tile col). The dot
    CONTRACTS the j pair (both halves carry real weights — no
    block-diagonal zero waste) and splits the output col parity q into
    the N columns. No V stage, no rolls/casts: the first attempt
    paired positions instead and its f32 roll+select V mixing measured
    +2 ms/frame on chip (2026-08-21) — folding beats mixing."""
    f, _, k, n = w.shape
    g_m = jnp.asarray(
        [[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]], jnp.float32)
    u = jnp.einsum("ai,bj,ijkn->abkn", g_m, g_m,
                   jnp.asarray(w, jnp.float32))
    if k == 32:
        # QUAD direct layout (16k, 4n) = 4 slabs of (128, 4n): slab
        # ro·2 + co, row (2rp + cp)·k + c ↦ tap (i, j) = (2ro+rp,
        # 2co+cp), col (2p + q)·n + nn = w[i−p, j−q, c, nn] (zero
        # outside the 3x3 footprint). No Winograd transform — folding
        # BOTH transforms degenerates to the direct conv in
        # quad-parity form, and at k == 32 the packing (4k == 128 K
        # lanes, 4 output parities in N) is the whole win.
        wf = jnp.asarray(w, jnp.float32)
        wq = jnp.zeros((4, 4, k, 4, n), jnp.float32)
        for ro in range(2):
            for co in range(2):
                for rp in range(2):
                    for cp in range(2):
                        i, j = 2 * ro + rp, 2 * co + cp
                        for p_ in range(2):
                            for q_ in range(2):
                                dy, dx = i - p_, j - q_
                                if 0 <= dy < 3 and 0 <= dx < 3:
                                    wq = wq.at[
                                        ro * 2 + co, 2 * rp + cp, :,
                                        2 * p_ + q_, :,
                                    ].set(wf[dy, dx])
        return wq.reshape(16 * k, 4 * n).astype(dtype)
    if k == 64:
        at = jnp.asarray(_WINO_AT, jnp.float32)
        bt = jnp.asarray(_WINO_BT, jnp.float32)
        # (pa, j, c, q, n): Σ_pb AT[q,pb]·BT[pb,j]·U[pa,pb,c,nn]
        w_j = jnp.einsum("qb,bj,abkn->ajkqn", at, bt, u)
        return w_j.reshape(16 * k, 2 * n).astype(dtype)
    return u.reshape(16 * k, n).astype(dtype)


def _wino_mm_weights(w, dtype):
    """(3,3,k,m) last-layer HWIO → the parity-domain all-phase layout
    (2·4k, 2·4m): the 3x3 full-res conv becomes an f'=2 conv over the
    half-res 4k-lane parity image. Row dx'·4k + (2a+b)·k + c, column
    dy'·4m + (2p+q)·m + j holds w[2·dy' + a − p, 2·dx' + b − q, c, j]
    (zero outside the 3x3 footprint): (a, b) the tap's row/col parity,
    (p, q) the output pixel's parity, (dy', dx') the half-res offsets.

    BIAS TRAP (kernel-mode contract): the layer's (m,) bias is NOT
    reshaped here — the kernel's parity output lanes are (2p+q)·m + j
    (4m wide, produced as two dy'-phase Z halves that get summed), so
    the bias must be broadcast/tiled to the 4 parity lanes and added
    ONCE, after the dy' combine — adding it per Z dot would double-
    count it (mirrors how the shipping mm_last adds bias post-
    reduction)."""
    f, _, k, m = w.shape
    if f != 3:
        # the 0<=dy<f footprint guard below only reaches dy,dx in 0..3:
        # an f=5 layer would silently lose its outer taps
        raise ValueError(f"wino_mm requires f==3 last layer, got f={f}")
    wf = jnp.asarray(w, jnp.float32)
    wp = jnp.zeros((2, 4, k, 2, 4, m), jnp.float32)
    for dyp in range(2):
        for dxp in range(2):
            for a in range(2):
                for b in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * dyp + a - p
                            dx = 2 * dxp + b - q
                            if 0 <= dy < f and 0 <= dx < f:
                                wp = wp.at[dxp, 2 * a + b, :,
                                           dyp, 2 * p + q, :].set(wf[dy, dx])
    return wp.reshape(8 * k, 8 * m).astype(dtype)


# dypack (dy-packed small-n dots) and xpack (packed-row banded dots)
# were fully built, correctness-pinned, and measured as full-kernel
# LOSSES on chip (dypack 19.1→21.1 ms RGB; xpack 25.3 vs 17.9 ms
# despite +17-24% dot-level microbenches) — quarantined out of the
# production kernel in round 3. The probes and post-mortems remain the
# record: tools/dypack_probe.py, tools/xpack_probe{,2}.py,
# docs/BENCHMARKS.md "Investigated and rejected".


def _window_pads(dims, h, w_dim, tile_h, tile_w, win_dt, dtype,
                 l1_gpack: int = 1, l1_dstep: int = 0):
    """Bottom/right padding _fused_tail_single would apply to an (h, w)
    input so its window DMA grid tiles cleanly. Exposed so callers can
    build the patch array AT the padded geometry (cheap 2D pads before
    the im2col stack + a leading-dim zero-plane pad) instead of paying
    a full-array `jnp.pad` copy on the finished ~quarter-GB array —
    measured 2.85 ms/frame of an 11.6 ms flagship frame (tools/
    patchbuild_probe.py int8pad vs int8, 2026-08-17). MUST mirror the
    geometry block at the top of ``_fused_tail_single``."""
    fs = [d[0] for d in dims]
    shrinks = [f - 1 for f in fs]
    shrink = sum(shrinks)
    l1_ext = (l1_gpack - 1) * l1_dstep if (fs and fs[0] == 1) else 0
    grid_h = -(-(h - shrink - l1_ext) // tile_h)
    grid_w = -(-(w_dim - shrink) // tile_w)
    sub_align = {jnp.dtype(jnp.int8): 32,
                 jnp.dtype(jnp.bfloat16): 16}.get(jnp.dtype(win_dt), 8)
    win_h = tile_h + shrink + l1_ext
    ws = [tile_w]
    for s in reversed(shrinks):
        ws.append(-(-(ws[-1] + s) // 8) * 8)
    win_w = -(-ws[-1] // sub_align) * sub_align
    pad_h = (grid_h - 1) * tile_h + win_h - h
    pad_w = (grid_w - 1) * tile_w + win_w - w_dim
    return max(0, pad_h), max(0, pad_w)


def _plane_rows(l1_rows: int, f1: int):
    """(R, S) for the plane first layer: R output rows per transpose
    block (`l1_rows`, clamped to what the slab supports) and S slab
    rows. A block computing R rows reads taps t ∈ [r, r+f₁) for
    r < R, so S = 8·⌈(R+f₁−1)/8⌉ and the largest legal 8-multiple R
    for a given S is 8·⌊(S−f₁+1)/8⌋ (slab rows past the taps multiply
    zero H rows). R=8/S=16 is the historical fixed geometry."""
    r = max(8, l1_rows // 8 * 8)
    s = -(-(r + f1 - 1) // 8) * 8
    return 8 * ((s - f1 + 1) // 8), s


def _plane_win_hp(oh, l1_f: int, l1_rows: int, sub: int):
    """Plane-window row count: l1 emits ``oh`` rows in R-row groups and
    the LAST group (start R·(⌈oh/R⌉−1)) still loads a full S-row E slab,
    so the window carries R·⌈oh/R⌉ − R + S rows, rounded up to the
    window dtype's sublane alignment. ONE definition shared by
    ``_plane_pads`` and the kernel geometry — these must never drift
    (a mismatch silently reintroduces a per-frame pad copy)."""
    rr, ss = _plane_rows(l1_rows, l1_f)
    return -(-(rr * (-(-oh // rr)) - rr + ss) // sub) * sub


def _plane_pads(dims, out_h, out_w, tile_h, tile_w, win_dt,
                l1_f: int = 9, l1_rows: int = 8):
    """Window geometry for the PLANE-input first layer (``l1_plane``):
    the kernel consumes the raw (C, H, W) image plane and builds conv1's
    operands in-register (lane rolls + one MXU identity-dot transpose
    per R-row × 128-col block), so there is no patch array at all — the
    window is the plane itself plus the conv halo. Returns the padded
    plane target (H_t, W_t) and the DMA window (win_hp, win_wp).
    MUST mirror the plane-geometry block in ``_fused_tail_single``."""
    fs = [d[0] for d in dims]
    shrink = sum(f - 1 for f in fs)
    grid_h = -(-out_h // tile_h)
    grid_w = -(-out_w // tile_w)
    sub = {jnp.dtype(jnp.int8): 32,
           jnp.dtype(jnp.bfloat16): 16}.get(jnp.dtype(win_dt), 8)
    # l1 emits oh = tile_h + shrink rows (the plane dims[0] entry has
    # f=1; conv1's own shrink is absorbed by the window); taps past f₁
    # hit zero H rows and rows past the image read the bottom pad
    win_hp = _plane_win_hp(tile_h + shrink, l1_f, l1_rows, sub)
    ws = [tile_w]
    for s in reversed([f - 1 for f in fs]):
        ws.append(-(-(ws[-1] + s) // 8) * 8)
    # kernel ws[1] (the l1 output width the kernel derives nblk from) is
    # this un-reversed chain's second-to-last entry; the last entry is
    # the kernel's ws[0] — equal only because plane dims[0] has f=1
    ws1 = ws[-2] if len(ws) >= 2 else ws[-1]
    nblk = -(-ws1 // 128)
    win_wp = (nblk - 1) * 128 + 256
    return ((grid_h - 1) * tile_h + win_hp,
            (grid_w - 1) * tile_w + win_wp, win_hp, win_wp)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "tile_h", "tile_w", "interpret", "dtype",
                     "chunk_rows", "pack_last", "l1_gpack", "l1_dstep",
                     "out_hw", "l1_plane", "l1_f", "l1_rows",
                     "prepack_max_deep", "mm_last", "sep_max_n",
                     "pipe_combine", "wino_on"),
)
def _fused_tail_single(wbs, a, dims, tile_h: int, tile_w: int,
                       interpret: bool = False, dtype=jnp.bfloat16,
                       chunk_rows: int = _MM_CHUNK_ROWS,
                       pack_last: int = 1, l1_gpack: int = 1,
                       l1_dstep: int = 0, out_hw=None,
                       l1_plane: int = 0, l1_f: int = 0,
                       l1_rows: int = 8,
                       prepack_max_deep: int = 384,
                       mm_last: bool = False, sep_max_n: int = 0,
                       pipe_combine: bool = True,
                       wino_on: bool = False):
    """Run layers 2..L over a (H, W, k) activation → n_out planes of
    (H−s, W−s) float32 (stacked by the caller).

    ``wbs``: flat [w2, b2, ..., wL, bL] pre-reshaped weights
    (see ``_prepare_tail_weights``) in ``dtype`` (biases f32);
    ``dims``: static ((f, k, n), ...) per tail layer.

    ``l1_gpack`` = G > 1 turns on the dy-packed folded first layer
    (requires ``dims[0]`` f == 1 and a dy-packed input from
    ``_im2col_patches``): the patch array packs only ``l1_dstep`` = D
    dy-taps in its lanes (D·f₁·c planes instead of f₁²·c — the XLA-side
    shifted-slice stack is shuffle-bound, ∝ plane count) and the kernel
    covers all f₁ dy-taps with G row-shifted K=D·f₁·c dots accumulated
    in f32 (weight slab g holds rows dy ∈ [g·D, g·D+D), zeros past f₁).
    Layer 1 then consumes (G−1)·D extra input ROWS; columns pack fully.

    ``pack_last`` = P > 1 turns on the packed-dx last layer: the
    producer layer stores P column-shifted copies of its output in the
    lane groups of the last layer's input ref (lane c·k+j holds
    act[y, x+c, j] — the ref's 128-lane pad is already paid, so the
    copies are free VMEM-wise), and each last-layer FMA then covers P
    dx-taps at once (f·⌈f/P⌉ FMAs instead of f² at k/128 lane
    utilization); the final lane reduction sums over (c, j) — i.e. over
    both the packed dx-group and k — which is exactly the conv sum.
    """
    n_layers = len(wbs) // 2
    fs = [d[0] for d in dims]
    ks = [d[1] for d in dims]
    ns = [d[2] for d in dims]
    shrinks = [f - 1 for f in fs]
    shrink = sum(shrinks)
    # dy-packed first layer: (G−1)·D extra rows consumed by layer 1
    # (row-only — dx taps are fully lane-packed, widths are untouched)
    l1_ext = (l1_gpack - 1) * l1_dstep if (fs and fs[0] == 1) else 0

    plane = l1_plane > 0  # raw-plane first layer: a is (C, Hp, Wp)
    if plane:
        c_in = l1_plane
        h, w_dim = a.shape[1], a.shape[2]
        out_h, out_w = out_hw  # required: plane pads hide the true size
    else:
        h, w_dim, c_in = a.shape
        if out_hw is None:
            out_h, out_w = h - shrink - l1_ext, w_dim - shrink
        else:
            # input pre-padded to the window geometry (``_window_pads``):
            # the true output size can't be recovered from a.shape (the W
            # pad includes the window's sublane-roundup overhang), so the
            # caller passes it; the pad check below then reads zero pad.
            out_h, out_w = out_hw
    grid = (pl.cdiv(out_h, tile_h), pl.cdiv(out_w, tile_w))
    # the input window streams in the array's own dtype: int8 patch
    # arrays / planes (quantized folded-conv1 inputs) ride half the DMA
    # bytes and cast to `dtype` at the matmul operand
    win_dt = a.dtype if a.dtype == jnp.int8 else (
        jnp.float32 if plane else dtype)
    # 3D (H, W, C) arrays tile the last two dims → the DMA window needs
    # W-dim (sublane) 8-alignment and a 128-multiple lane (channel) size;
    # H is untiled (any offset). Channel padding is physically free.
    # packed-dtype W tiling: (8, 128)·(32/bits) sublanes per tile
    sub_align = {jnp.dtype(jnp.int8): 32,
                 jnp.dtype(jnp.bfloat16): 16}.get(jnp.dtype(win_dt), 8)
    win_h = tile_h + shrink + l1_ext
    # Per-layer buffer widths, computed back-to-front and padded to
    # sublane (8) multiples: an 8-aligned width makes the im2col collapse
    # (ph, ow, f·k) → (ph·ow, f·k) a free relayout-less view (each 2D
    # plane fills whole sublane tiles) instead of a tile-shuffling copy
    # that blew the scoped-VMEM budget. The few garbage right-edge
    # columns compute throwaway outputs sliced off by the next layer.
    ws = [tile_w]
    for s in reversed(shrinks):
        ws.append(-(-(ws[-1] + s) // 8) * 8)
    ws.reverse()
    win_w = -(-ws[0] // sub_align) * sub_align
    global _LAST_TAIL_PADDED
    if plane:
        # plane-window geometry (mirror of ``_plane_pads``): each R-row
        # out group loads an S-row E slab — the last group (start
        # R·(⌈oh/R⌉−1)) a full one — so the window carries
        # R·⌈oh/R⌉ − R + S rows; columns carry 256 lanes past the last
        # 128-col block of l1's output width
        # f=1 MIDDLE layers (9-1-5) still matmul the full source width
        for li in range(1, n_layers - 1):
            if fs[li] == 1:
                ws[li + 1] = ws[li]
        nblk = -(-ws[1] // 128)
        l1_r, l1_s = _plane_rows(l1_rows, l1_f)
        win_hp = _plane_win_hp(tile_h + shrink, l1_f, l1_rows, sub_align)
        win_wp = (nblk - 1) * 128 + 256
        need_h = (grid[0] - 1) * tile_h + win_hp
        need_w = (grid[1] - 1) * tile_w + win_wp
        _LAST_TAIL_PADDED = (a.shape[1] < need_h or a.shape[2] < need_w
                             or a.dtype != win_dt)
        if _LAST_TAIL_PADDED:
            ap = jnp.pad(a, ((0, 0),
                             (0, max(0, need_h - a.shape[1])),
                             (0, max(0, need_w - a.shape[2])))
                         ).astype(win_dt)
        else:
            ap = a
        c_pad = c_in  # no lane-channel padding: channels are planes
    else:
        # f=1 layers (pre-im2col'd first layers and SRCNN 9-1-5's middle)
        # matmul the FULL source width so the operand is a free collapse
        # of the source ref itself — propagate the full width downstream
        ws[0] = win_w
        for li in range(n_layers - 1):
            if fs[li] == 1:
                ws[li + 1] = ws[li]
        c_pad = -(-c_in // 128) * 128
        pad_h = (grid[0] - 1) * tile_h + win_h - h
        pad_w = (grid[1] - 1) * tile_w + win_w - w_dim
        # the window streams in `win_dt` (3D refs allow dynamic indexing
        # on the untiled H dim even when packed; only 2D sublane indexing
        # is barred). Callers that pre-build the array at the padded
        # geometry (``_window_pads`` + ``_im2col_patches(pad_to=...)``)
        # skip this full-array pad copy entirely.
        _LAST_TAIL_PADDED = (pad_h > 0 or pad_w > 0 or c_pad != c_in
                             or a.dtype != win_dt)
        if _LAST_TAIL_PADDED:
            ap = jnp.pad(
                a, ((0, max(0, pad_h)), (0, max(0, pad_w)),
                    (0, c_pad - c_in))
            ).astype(win_dt)
        else:
            ap = a

    hs = [win_h]
    for li, s in enumerate(shrinks):
        hs.append(hs[-1] - s - (l1_ext if li == 0 else 0))

    n_out = ns[-1]
    # activations feeding MXU layers stream in `dtype` (their consumers
    # cast patches to `dtype` anyway — identical values, half the VMEM);
    # the last layer's input stays f32 for the VPU tap accumulation —
    # unless the last layer itself runs on the MXU (``mm_last``)
    act_dts = [dtype if (mm_last or li + 1 < n_layers - 1)
               else jnp.float32
               for li in range(n_layers - 1)]
    # Producer-side patch pre-packing (shallow stacks): an f>1 middle
    # layer's patch scratch is just f column-shifted copies of its
    # producer's output, so the producer stores those copies directly
    # from its in-register value (f lane-group stores, same pattern as
    # the packed-dx last layer) and the consumer's matmul operand is a
    # free collapse of the pre-packed ref itself — no per-chunk patch
    # build, no re-read of the activation. Costs (f−1)·k extra act
    # lanes per consumer — every consumer on shallow stacks; on deep
    # (scoped-VMEM-bound) stacks up to f·k ≤ prepack_max_deep lanes.
    # The shipped 384 covers the whole 7-layer RGB stack: measured
    # 25.9 → 24.85 ms/frame over the old 128-lane gate (thr 128/192/384
    # = 25.9/25.3/24.85, interleaved A/B ×3 rounds, 2026-08-18,
    # tools/prepack_probe.py) — the raw-plane first layer freed the
    # VMEM the wider act refs need. Models with f·k > 384 (no
    # production config) keep the rolling patch build.
    prepack = frozenset(
        li for li in range(1, n_layers - 1)
        if fs[li] > 1
        and (n_layers <= 4 or fs[li] * ks[li] <= prepack_max_deep)
    ) | (frozenset({n_layers - 1}) if mm_last else frozenset())
    # mm_last: the last layer runs through the all-phase MXU machinery
    # (its producer MUST prepack — the wrapper guarantees eligibility);
    # phase-combine + per-channel extraction happen in one masked lane
    # reduction over the full-width Z window (see the kernel), so the
    # historical "1-lane reads of a lane-padded Z" failure mode of
    # conv3-as-matmul never appears (docs/BENCHMARKS.md).
    # a first f=1 layer reads the whole lane-padded window: widen its
    # weight rows with zeros to match (pad lanes are zeros from `ap`).
    # dy-packed (G>1): wbs[0] is G stacked (k_d, n) slabs — pad EACH
    # slab to c_pad rows so slab g starts at row g·c_pad
    if fs and fs[0] == 1 and l1_gpack > 1:
        wbs = list(wbs)
        w0 = wbs[0].reshape(l1_gpack, -1, ns[0])
        wbs[0] = jnp.pad(
            w0, ((0, 0), (0, c_pad - w0.shape[1]), (0, 0))
        ).reshape(l1_gpack * c_pad, ns[0])
    elif fs and fs[0] == 1 and wbs[0].shape[0] < c_pad:
        wbs = list(wbs)
        wbs[0] = jnp.pad(wbs[0], ((0, c_pad - wbs[0].shape[0]), (0, 0)))
    # Winograd F(2x2,3x3) layers (see _wino_layers / the mode comment
    # above): their input ref holds PARITY PLANES, their output feeds
    # either another wino layer (parity planes again) or the last layer
    # as a dx'-prepacked 4k-lane parity image consumed by the half-res
    # parity all-phase exit (``wino_mm``). Wino layers leave the sep and
    # prepack sets and carry no Z/patch scratch of their own.
    wino = (_wino_layers(dims, n_layers, mm_last,
                         min_li=1)
            if wino_on else frozenset())
    # the chain always reaches the last layer (eligibility is computed
    # back to front from the mm exit), so a nonempty set implies the
    # parity-exit last layer
    wino_mm = bool(wino)
    # separated-phase layers (see _sep_layers): no Z scratch at all.
    sep = _sep_layers(dims, n_layers, prepack_max_deep, sep_max_n) - wino
    # wino layers read parity planes, not patches; the wino_mm last
    # layer's input is the dx'-packed parity image its producer stores
    prepack = prepack - wino
    if wino_mm:
        prepack = prepack - frozenset({n_layers - 1})
    # z scratch for every f>1 MXU layer (incl. the last under mm_last,
    # excl. separated-phase and wino layers — wino accumulates AᵀMA in
    # registers; the wino_mm last layer keeps a (half-res) Z); patch
    # scratch only for the ones whose input is not pre-packed
    n_mxu = n_layers if mm_last else n_layers - 1
    pz_idx = {li: i for i, li in enumerate(
        li for li in range(n_mxu)
        if fs[li] > 1 and li not in sep and li not in wino)}
    pp_idx = {li: i for i, li in enumerate(
        li for li in range(n_mxu)
        if fs[li] > 1 and li not in prepack and li not in wino
        and not (wino_mm and li == n_layers - 1))}
    # producer-side parity-split scratch: one f32 (chunk, w, 128) buffer
    # per wino layer whose producer is a NORMAL kernel layer (strided
    # stride-2 ref loads need f32 and an exactly-128-lane memref —
    # tools/strided_store_probe.py); wino→wino boundaries store parity
    # planes directly from the (already parity-separated) Y values
    ps_idx = {li: i for i, li in enumerate(
        li for li in sorted(wino)
        if li - 1 not in wino and not (plane and li == 1))}
    # Software-pipelined combine (full-height Z, lagged one chunk): the
    # rolling schedule's combine reads the SAME chunk's freshly-stored Z
    # — a RAW hazard stalling the VPU on the MXU, and the next dot
    # behind both. Eligible: shallow stacks (≤4 layers: at most one Z
    # layer, full height fits easily) and the mm_last layer on deep
    # stacks (its Z is f·n_out lanes — kilobyte rows). Deep non-sep
    # middles (no production config) keep the rolling window.
    pipe_z = frozenset(
        li for li in pz_idx
        if n_layers <= 4 or (mm_last and li == n_layers - 1)
    ) if pipe_combine else frozenset()

    def kernel(a_hbm, *refs):
        wrefs = refs[: 2 * n_layers]
        out_refs = refs[2 * n_layers : 2 * n_layers + n_out]
        scratch = refs[2 * n_layers + n_out :]
        a_vmem, sem = scratch[0], scratch[1]
        act_refs = scratch[2 : 2 + (n_layers - 1)]
        n_pz = len(pz_idx)
        n_pp = len(pp_idx)
        z_refs = scratch[2 + (n_layers - 1) : 2 + (n_layers - 1) + n_pz]
        p_refs = scratch[2 + (n_layers - 1) + n_pz :
                         2 + (n_layers - 1) + n_pz + n_pp]
        ps_refs = scratch[2 + (n_layers - 1) + n_pz + n_pp :]

        i = pl.program_id(0)
        j = pl.program_id(1)
        n_j = pl.num_programs(1)
        n_total = pl.num_programs(0) * n_j
        g = i * n_j + j

        def get_dma(slot, g2):
            i2 = g2 // n_j
            j2 = g2 % n_j
            if plane:
                src_at = a_hbm.at[
                    :, pl.ds(i2 * tile_h, win_hp), pl.ds(j2 * tile_w, win_wp)
                ]
            else:
                src_at = a_hbm.at[
                    pl.ds(i2 * tile_h, win_h), pl.ds(j2 * tile_w, win_w), :
                ]
            return pltpu.make_async_copy(
                src_at,
                a_vmem.at[slot],
                sem.at[slot],
            )

        # double-buffered windows: prefetch tile g+1 while computing g
        slot = jax.lax.rem(g, 2)

        if "dma" not in _DEBUG_SKIP:
            @pl.when(g == 0)
            def _():
                get_dma(0, 0).start()

            @pl.when(g + 1 < n_total)
            def _():
                get_dma(jax.lax.rem(g + 1, 2), g + 1).start()

            get_dma(slot, g).wait()

        def store_act(li, r0, r1, v):
            # producer of a packed-dx last layer / of a pre-packed middle
            # layer: store C column-shifted copies in the lane groups
            # (lane-group stores at n-multiples, the same pattern as the
            # patch build's dx·k stores)
            n = ns[li]
            if li + 1 in wino:
                # parity-split store for a wino consumer: rows/cols
                # de-interleave into (row-parity plane, col-parity lane
                # group) — f32 scratch + four stride-2 quadrant loads
                # (measured ~free vs the flat store: 9.28 vs 9.94
                # us/chunk, tools/winograd_probe.py `repack`). Chunk
                # starts are even (chunk_rows and every emit boundary
                # are even when f is odd and oh is even — both gated).
                m = r1 - r0
                s_ref = ps_refs[ps_idx[li + 1]]
                w_half = ws[li + 1] // 2
                if n == 32:
                    # quad entry: all four parities into the lanes of
                    # the consumer's rank-3 quad image — same 128-lane
                    # scratch + two-stride quadrant reads as below
                    s_ref[0:m, :, 0:32] = v.astype(jnp.float32)
                    for p_r in range(2):
                        for q_c in range(2):
                            act_refs[li][
                                r0 // 2 : r0 // 2 + m // 2, 0:w_half,
                                (2 * p_r + q_c) * n
                                : (2 * p_r + q_c + 1) * n,
                            ] = s_ref[p_r : m : 2, q_c :: 2][
                                :, :, 0:32].astype(act_dts[li])
                    return
                if n == 64:
                    # k == 64 entry: Mosaic strided ops need the
                    # MEMREF's last dim to be 128, so the scratch is
                    # allocated at 128 lanes with the value in the
                    # lower 64 (upper half never read back as data) —
                    # the quadrant reads are then the exact two-stride
                    # pattern proven at k == 128, followed by a lane
                    # slice on the loaded VALUE (a cheap mask; a
                    # stride on the value itself lowers to an
                    # unsupported >2D gather).
                    s_ref[0:m, :, 0:64] = v.astype(jnp.float32)
                    for p_r in range(2):
                        for q_c in range(2):
                            act_refs[li][
                                p_r, r0 // 2 : r0 // 2 + m // 2,
                                0:w_half, q_c * n : (q_c + 1) * n,
                            ] = s_ref[p_r : m : 2, q_c :: 2][
                                :, :, 0:64].astype(act_dts[li])
                    return
                s_ref[0:m] = v.astype(jnp.float32)
                for p_r in range(2):
                    for q_c in range(2):
                        act_refs[li][
                            p_r, r0 // 2 : r0 // 2 + m // 2, 0:w_half,
                            q_c * n : (q_c + 1) * n,
                        ] = s_ref[p_r : m : 2, q_c :: 2].astype(
                            act_dts[li])
                return
            if li == n_layers - 2 and pack_last > 1:
                cnt = pack_last
                vv = jnp.pad(v, ((0, 0), (0, cnt - 1), (0, 0)))
                wout = v.shape[1]
            elif li + 1 in prepack:
                cnt = fs[li + 1]
                vv = v
                wout = ws[li + 2]
            else:
                act_refs[li][r0:r1] = v
                return
            for c in range(cnt):
                act_refs[li][r0:r1, :, c * n : (c + 1) * n] = vv[
                    :, c : c + wout, :
                ]

        # ---- middle layers: shared-patch im2col + shift-add matmul ----
        # Patches for dy+1 are a one-row shift of dy's, so ONE extended
        # patch buffer of height ph=oh+f−1 is built (f static stores).
        # ONE (ph·ow, f·k) @ (f·k, f·n) matmul then produces Z where
        # Z[r, dy·n:(dy+1)·n] is patch-row r's contribution to output row
        # r−dy; out[i] = Σ_dy Z[i+dy, dy-block] — f static shifted adds
        # fused into the bias+ReLU. Patches feed the MXU once (vs f×) and
        # the matmul runs at f·n lanes wide (vs f dispatches n wide).
        ch = chunk_rows
        for li in range(n_mxu):
            if f"L{li}" in _DEBUG_SKIP or (
                    li == n_layers - 1 and "last" in _DEBUG_SKIP):
                continue  # triage: per-layer subtraction (act garbage)
            f, k, n = fs[li], ks[li], ns[li]
            oh, ow = hs[li + 1], ws[li + 1]
            src = a_vmem.at[slot] if li == 0 else act_refs[li - 1]
            w_ref, b_ref = wrefs[2 * li], wrefs[2 * li + 1]
            act_dt = act_dts[li] if li < n_layers - 1 else jnp.float32

            if li in wino:
                # ---- Winograd F(2x2,3x3) layer (parity domain) ----
                # src holds parity planes (2, H/2, W/2p, 2k): plane =
                # row parity, lane group = col parity, so every tap
                # d[2i+a, 2j+b] is a contiguous (rows, TC, k) slice.
                # Factored transform (winoF, tools/winograd_probe.py):
                # per BᵀdB row-parity pa, 4 single-add row combos R[jb],
                # then per col pb one combo V = ±R[j1] ± R[j2]; 16
                # position dots (rows·TC, k) @ (k, n) at full MXU K-fill
                # (k == 128 gate); AᵀMA accumulates incrementally into
                # the 4 parity Y accumulators (coeffs 0/±1). Measured
                # −55% vs sep at (128,128), −43% at (128,64) per chunk.
                if "mid" in _DEBUG_SKIP:
                    continue  # triage
                tr_l, tc_l = oh // 2, _wino_tc(ws, li)
                last_cons = wino_mm and li == n_layers - 2

                def wtap(a_p, b_p, t0, rows, *, src=src, k=k,
                         tc_l=tc_l):
                    return src[a_p % 2, a_p // 2 + t0 : a_p // 2 + t0
                               + rows, b_p // 2 : b_p // 2 + tc_l,
                               (b_p % 2) * k : (b_p % 2 + 1) * k]

                cons_quad = (not last_cons) and ks[li + 1] == 32

                def emit_ys(ys, t0, rows, *, li=li, n=n, tc_l=tc_l,
                            last_cons=last_cons, act_dt=act_dt,
                            b_ref=b_ref, cons_quad=cons_quad):
                    for pq in range(4):
                        val = jnp.maximum(
                            ys[pq].reshape(rows, tc_l, n) + b_ref[...],
                            0.0).astype(act_dt)
                        if last_cons:
                            # dx'-packed parity image for the mm exit:
                            # lane dx'·4n + (2p+q)·n + j, 2 col-shifted
                            # copies (the f'=2 all-phase prepack)
                            wlast = act_refs[li].shape[1]
                            assert wlast + 1 <= tc_l
                            for dxp in range(2):
                                act_refs[li][
                                    t0 : t0 + rows, :,
                                    dxp * 4 * n + pq * n
                                    : dxp * 4 * n + (pq + 1) * n,
                                ] = val[:, dxp : dxp + wlast]
                        elif cons_quad:
                            # next layer is a k==32 QUAD consumer: all
                            # four parities in the lanes of its rank-3
                            # image — lane group (2p + q)·n
                            wt = min(tc_l, act_refs[li].shape[1])
                            act_refs[li][
                                t0 : t0 + rows, 0:wt,
                                pq * n : (pq + 1) * n,
                            ] = val[:, 0:wt]
                        else:
                            # next wino layer's parity planes: plane =
                            # row parity p, lane group = col parity q.
                            # Clip to the ref (16-aligned tc can exceed
                            # it); unwritten tail cols are garbage that
                            # only feeds garbage output columns.
                            wt = min(tc_l, act_refs[li].shape[2])
                            act_refs[li][
                                pq // 2, t0 : t0 + rows, 0:wt,
                                (pq % 2) * n : (pq % 2 + 1) * n,
                            ] = val[:, 0:wt]

                if k == 32:
                    # ---- QUAD direct parity all-phase (k==32) ----
                    # src is the rank-3 quad image (H/2, W_in, 4k):
                    # one 128-lane read at (row off ro, col off co)
                    # delivers ALL FOUR parities of taps (2ro+rp,
                    # 2co+cp) — 4 raw-tap dots against the direct-conv
                    # quad weights (no transform stage at all), output
                    # col groups = the 4 output parities. Pure packing
                    # win: 4·⌈4n/128⌉ M-passes vs sep's 12 per tile.
                    for t0 in range(0, tr_l, _WINO_TRG):
                        rows = min(_WINO_TRG, tr_l - t0)
                        mrow = rows * tc_l
                        s_all = None
                        for ro in range(2):
                            for co in range(2):
                                r_op = src[
                                    t0 + ro : t0 + ro + rows,
                                    co : co + tc_l, 0:128,
                                ].reshape(mrow, 128)
                                mdot = jax.lax.dot_general(
                                    r_op.astype(dtype),
                                    w_ref[(ro * 2 + co) * 128
                                          : (ro * 2 + co + 1) * 128],
                                    dimension_numbers=(((1,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.float32)
                                s_all = (mdot if s_all is None
                                         else s_all + mdot)
                        emit_ys([s_all[:, pq * n : (pq + 1) * n]
                                 for pq in range(4)], t0, rows)
                    continue

                if k == 64:
                    # ---- j-PAIRED k==64 path (col transform folded
                    # into the weights — see _wino_weights) ----
                    # One 128-lane parity-plane read at col jp delivers
                    # tile-cols (2jp, 2jp+1) in its lane halves, so the
                    # BᵀdB row combos rs[pa] come out j-PAIRED in bf16
                    # with plain adds. Each pa then needs just 2 dots
                    # (M, 128) @ (128, 2n): the contraction sums the j
                    # pair, the N columns carry the output col parity q
                    # (the col transform and AT[q] combine live in the
                    # weights), and the row combine is the usual AᵀMA
                    # accumulation over pa. Full MXU K-fill — the
                    # probe's k=64 loss was pure K-underfill.
                    for t0 in range(0, tr_l, _WINO_TRG):
                        rows = min(_WINO_TRG, tr_l - t0)
                        mrow = rows * tc_l

                        def tpair(i_p, jp, *, src=src, t0=t0,
                                  rows=rows, tc_l=tc_l, mrow=mrow):
                            # full-lane read: both col parities of
                            # tile-cols (2jp, 2jp+1) in lane halves
                            return src[
                                i_p % 2, i_p // 2 + t0
                                : i_p // 2 + t0 + rows,
                                jp : jp + tc_l, 0:128,
                            ].reshape(mrow, 128)

                        ys = [None] * 4
                        for pa in range(4):
                            i1, i2 = [i for i in range(4)
                                      if _WINO_BT[pa][i] != 0]
                            s_pa = None
                            for jp in range(2):
                                d1 = tpair(i1, jp)
                                d2 = tpair(i2, jp)
                                d1 = d1 if _WINO_BT[pa][i1] > 0 else -d1
                                rsp = (d1 + d2 if _WINO_BT[pa][i2] > 0
                                       else d1 - d2)
                                mdot = jax.lax.dot_general(
                                    rsp.astype(dtype),
                                    w_ref[(pa * 2 + jp) * 128
                                          : (pa * 2 + jp + 1) * 128],
                                    dimension_numbers=(((1,), (0,)),
                                                       ((), ())),
                                    preferred_element_type=jnp.float32)
                                s_pa = mdot if s_pa is None else s_pa + mdot
                            for pq in range(4):
                                c = _WINO_AT[pq // 2][pa]
                                if c == 0:
                                    continue
                                mh = s_pa[:, (pq % 2) * n
                                          : (pq % 2 + 1) * n]
                                t = mh if c > 0 else -mh
                                ys[pq] = (t if ys[pq] is None
                                          else ys[pq] + t)
                        emit_ys(ys, t0, rows)
                    continue

                for t0 in range(0, tr_l, _WINO_TRG):
                    rows = min(_WINO_TRG, tr_l - t0)
                    ys = [None] * 4
                    for pa in range(4):
                        i1, i2 = [i for i in range(4)
                                  if _WINO_BT[pa][i] != 0]
                        rs = []
                        for jb in range(4):
                            d1 = wtap(i1, jb, t0, rows)
                            d2 = wtap(i2, jb, t0, rows)
                            d1 = d1 if _WINO_BT[pa][i1] > 0 else -d1
                            rs.append(d1 + d2 if _WINO_BT[pa][i2] > 0
                                      else d1 - d2)
                        for pb in range(4):
                            j1, j2 = [j for j in range(4)
                                      if _WINO_BT[pb][j] != 0]
                            v = (rs[j1] if _WINO_BT[pb][j1] > 0
                                 else -rs[j1])
                            v = (v + rs[j2] if _WINO_BT[pb][j2] > 0
                                 else v - rs[j2])
                            pos = pa * 4 + pb
                            mdot = jax.lax.dot_general(
                                v.reshape(rows * tc_l, k),
                                w_ref[pos * k : (pos + 1) * k],
                                dimension_numbers=(((1,), (0,)),
                                                   ((), ())),
                                preferred_element_type=jnp.float32)
                            for pq in range(4):
                                c = (_WINO_AT[pq // 2][pa]
                                     * _WINO_AT[pq % 2][pb])
                                if c != 0:
                                    t = mdot if c > 0 else -mdot
                                    ys[pq] = (t if ys[pq] is None
                                              else ys[pq] + t)
                    emit_ys(ys, t0, rows)
                continue

            if wino_mm and li == n_layers - 1:
                # ---- parity-domain all-phase exit (wino_mm) ----
                # src: (H/2, W/2, 8k) dx'-packed parity image; w_ref the
                # (8k, 8m) _wino_mm_weights layout. Z lanes are
                # dy'·4m + (2p+q)·m + j; combine sums the two dy' phase
                # slices, adds bias ONCE post-combine (the (m,) bias
                # broadcasts over the 4 parity lanes — adding per Z dot
                # would double-count it), and lands half-res parity out
                # blocks one XLA transpose recombines in the wrapper.
                # Linear (no ReLU): reference layer L,
                # ConfigBasedDataPipeline.cpp:66.
                if "last" in _DEBUG_SKIP:
                    continue  # triage
                z_ref = z_refs[pz_idx[li]]
                trh = hs[li] // 2
                ohh = tile_h // 2
                w2 = act_refs[li - 1].shape[1]
                m4 = 4 * n
                k8 = 8 * k
                for c0 in range(0, trh, ch):
                    ce = min(c0 + ch, trh)
                    z_ref[c0:ce] = jnp.dot(
                        src[c0:ce, 0:w2, 0:k8]
                        .reshape((ce - c0) * w2, k8),
                        w_ref[...],
                        preferred_element_type=jnp.float32,
                    ).reshape(ce - c0, w2, 2 * m4).astype(z_ref.dtype)
                for c0 in range(0, ohh, ch):
                    ce = min(c0 + ch, ohh)
                    m_r = ce - c0
                    accz = (z_ref[c0:ce, :, 0:m4].astype(jnp.float32)
                            + z_ref[c0 + 1 : ce + 1, :, m4 : 2 * m4]
                            .astype(jnp.float32))
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (m_r, w2, m4), 2)
                    for cc in range(n):
                        for pq in range(4):
                            val = jnp.sum(
                                jnp.where(lane == pq * n + cc,
                                          accz, 0.0),
                                axis=-1) + b_ref[cc]
                            out_refs[cc][pq // 2, pq % 2, c0:ce, :] = (
                                val[:, 0 : tile_w // 2])
                continue

            if plane and li == 0:
                if "l1" in _DEBUG_SKIP:
                    continue  # triage: leave act garbage
                # ---- raw-plane first layer: in-register im2col ----
                # Per R-row × 128-col block: f₁·c lane-rolls of an S-row
                # E slab build F[(ch,dx,t), i] = E_ch[t, i+dx]; ONE MXU
                # identity-dot transposes F to (i, K); ONE (128, K) @
                # (K, R·n) dot against H[(ch,dx,t),(r,n)] = w1[t−r,dx,ch]
                # computes all R rows × n channels (taps with t−r outside
                # [0, f₁) hit H's zero rows, so slab overreads are safe).
                # R=16 (S=24 at f₁≤9) halves the transpose passes and
                # cuts roll traffic 25% vs the original R=8/S=16.
                # This replaces the XLA patch-array build AND its 128-
                # lane-padded window DMA outright (docs/BENCHMARKS.md).
                f1 = l1_f
                cons_wino = 1 in wino
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
                # store_act's consumer-packing selection, in slab form
                # (li==0 can never be the pack_last producer: the fused
                # path requires >= 3 layers)
                if li + 1 in prepack:
                    cnt, wtgt = fs[li + 1], ws[li + 2]
                else:
                    cnt, wtgt = 1, ws[li + 1]
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
                        if "l1_store" in _DEBUG_SKIP:  # triage-only gate
                            # full-row store ((1,1,1) stores into packed
                            # bf16 refs fail Mosaic lowering)
                            act_refs[li][0:1] = jnp.broadcast_to(
                                jnp.max(yb.astype(jnp.float32))
                                .reshape((1,) * len(act_refs[li].shape))
                                .astype(act_dt),
                                (1,) + act_refs[li].shape[1:])
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
                                qw = (act_refs[li].shape[1]
                                      if ks[1] == 32
                                      else act_refs[li].shape[2])
                                x1q = min(x0q + 64, qw)
                                if x1q <= x0q:
                                    continue
                                for cp_ in range(2):
                                    half = slab[cp_ * 64
                                                : cp_ * 64 + (x1q - x0q)]
                                    if ks[1] == 32:
                                        # rank-3 quad image: lane
                                        # group (2·rp + cp)·n
                                        act_refs[li][
                                            qr, x0q:x1q,
                                            (2 * rp_ + cp_) * n
                                            : (2 * rp_ + cp_ + 1) * n,
                                        ] = half
                                    else:
                                        # rank-4 parity planes: plane
                                        # rp, lane group cp·n
                                        act_refs[li][
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
                                act_refs[li][
                                    r8 + r, x0:x1, c * n : (c + 1) * n
                                ] = slab[s0 : s0 + (x1 - x0)]
                continue

            if f == 1:
                if "l1" in _DEBUG_SKIP:
                    continue  # triage: leave act garbage, measure the rest
                # 1x1 layer (pre-im2col'd first layer / 9-1-5's middle):
                # the matmul operand is a free full-width collapse of the
                # source ref itself — no patch scratch, no phase combine.
                # dy-packed first layer (G>1): G row-shifted dots against
                # the per-dy-group weight slabs, accumulated in f32
                kk = c_pad if li == 0 else ks[li]
                gcnt = l1_gpack if li == 0 else 1
                for c0 in range(0, oh, ch):
                    ce = min(c0 + ch, oh)
                    y = None
                    for gi in range(gcnt):
                        r0 = c0 + gi * l1_dstep
                        opnd = src[r0 : r0 + (ce - c0), 0:ow, 0:kk]
                        if opnd.dtype != dtype:  # int8 window → dtype operand
                            opnd = opnd.astype(dtype)
                        yg = jnp.dot(
                            opnd.reshape((ce - c0) * ow, kk),
                            w_ref[gi * kk : (gi + 1) * kk]
                            if gcnt > 1 else w_ref[...],
                            preferred_element_type=jnp.float32,
                        )
                        y = yg if y is None else y + yg
                    if "l1_store" in _DEBUG_SKIP:  # triage-only gate
                        act_refs[li][0:1] = jnp.broadcast_to(
                            jnp.max(y.astype(jnp.float32))
                                .reshape(1, 1, 1).astype(act_dt),
                            (1,) + act_refs[li].shape[1:])
                    else:
                        store_act(li, c0, ce, jnp.maximum(
                            y.reshape(ce - c0, ow, n) + b_ref[...], 0.0
                        ).astype(act_dt))
                continue

            if li in sep:
                if "mid" in _DEBUG_SKIP:
                    continue  # triage: sep layers are "mid" stages too
                # ---- separated-phase dots (small-n middle layers) ----
                # out[i] = Σ_dy P[i+dy] @ w[dy]: f row-shifted dots
                # against per-dy weight slabs (rows dy·f·k..(dy+1)·f·k
                # of the (f²·k, n) weight), accumulated in f32 values —
                # no Z scratch, no phase combine (see _sep_layers). The
                # prepacked input ref holds patch rows 0..oh+f−2, so
                # shifting the operand window by dy is a plain row
                # offset; chunks are independent (no roll-over).
                fk = f * k
                for c0 in range(0, oh, ch):
                    ce = min(c0 + ch, oh)
                    m = ce - c0
                    y = None
                    if "mid_dot" not in _DEBUG_SKIP:
                        for dy in range(f):
                            yg = jnp.dot(
                                src[c0 + dy : ce + dy, 0:ow, 0:fk]
                                .reshape(m * ow, fk),
                                w_ref[dy * fk : (dy + 1) * fk],
                                preferred_element_type=jnp.float32,
                            )
                            y = yg if y is None else y + yg
                    else:  # triage: store-side cost only — the value
                        # must DEPEND on the input (an all-constant y
                        # makes Mosaic constant-fold the downstream
                        # prepack stores and crash the remote compiler)
                        y = jnp.broadcast_to(
                            src[c0 : c0 + 1, 0:1, 0:1]
                            .astype(jnp.float32).reshape(1, 1),
                            (m * ow, n))
                    yv = jnp.maximum(
                        y.reshape(m, ow, n) + b_ref[...], 0.0
                    ).astype(act_dt)
                    if "mid_combine" in _DEBUG_SKIP:
                        continue  # triage (sep has no combine: ≙ store)
                    if "mid_store" in _DEBUG_SKIP:  # triage-only gate
                        act_refs[li][c0 : c0 + 1] = jnp.broadcast_to(
                            jnp.max(yv.astype(jnp.float32))
                                .reshape(1, 1, 1).astype(act_dt),
                            (1,) + act_refs[li].shape[1:])
                    else:
                        store_act(li, c0, ce, yv)
                continue

            z_ref = z_refs[pz_idx[li]]
            pre = li in prepack  # input ref already holds the patches
            p_ref = None if pre else p_refs[pp_idx[li]]
            ph = oh + f - 1
            piped = li in pipe_z
            if "mid" in _DEBUG_SKIP:
                continue  # triage
            # Two chunk schedules (see ``pipe_z``):
            # * ROLLING: Z never materializes at full height. Patch rows
            #   [zs, ze) are built into a ch-row scratch, ONE
            #   (len·ow, f·k) @ (f·k, f·n) dot lands them at z_ref rows
            #   [f−1, f−1+len), the f−1 trailing Z rows of the previous
            #   chunk — rolled to rows [0, f−1) — complete the
            #   shifted-add window, and the chunk immediately emits its
            #   output rows. Cuts Z from (oh+f−1) to (ch+f−1) rows (deep
            #   stacks were scoped-VMEM-bound) — but the combine reads
            #   the SAME chunk's freshly-stored Z: a RAW hazard that
            #   stalls the VPU on the MXU every chunk.
            # * PIPELINED: full-height Z; chunk c's dot lands at rows
            #   [zs, ze) and the combine emits only rows fully covered
            #   by chunks < c — the VPU combine of the previous chunk
            #   overlaps the current chunk's matmul.
            # Chunked dots in both: per-dot operand/result transients
            # stay small (a full-height dot's stack alone blew the
            # scoped-VMEM budget).

            def emit(o0, o1, zrow0, *, z_ref=z_ref, f=f, n=n, ow=ow,
                     b_ref=b_ref, li=li, act_dt=act_dt):
                # combine Z rows into output rows [o0, o1); ``zrow0`` =
                # the z_ref row holding Z row o0. Z is stored in the
                # stream dtype (one rounding per phase partial; halves
                # the layer's dominant VMEM traffic) and the f-phase
                # combine accumulates in f32. (A full-width single band
                # load with value-level phase slices measured FLAT vs
                # these narrow ref slices on both model families,
                # 2026-08-17 — Mosaic already coalesces the tile reads.)
                m = o1 - o0
                if m <= 0 or "mid_combine" in _DEBUG_SKIP:
                    return
                if mm_last and li == n_layers - 1:
                    # MXU last layer: the f·n-lane Z window holds phase
                    # dy's channel j at lane dy·n+j. Masked adds align
                    # the phases (full-width reads — no partial-lane
                    # slicing), then ONE masked lane reduction per
                    # output channel extracts channel j; bias is added
                    # post-reduction. No ReLU (reference layer L is
                    # linear — ConfigBasedDataPipeline.cpp:66).
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (m, ow, f * n), 2)
                    accz = jnp.zeros((m, ow, f * n), jnp.float32)
                    for dy in range(f):
                        accz = accz + jnp.where(
                            lane // n == dy,
                            z_ref[zrow0 + dy : zrow0 + dy + m].astype(
                                jnp.float32),
                            0.0)
                    for c in range(n):
                        out_refs[c][o0:o1, :] = jnp.sum(
                            jnp.where(lane % n == c, accz, 0.0),
                            axis=-1) + b_ref[c]
                    return
                val = z_ref[zrow0 : zrow0 + m, :, 0:n].astype(jnp.float32)
                for dy in range(1, f):
                    val = val + z_ref[
                        zrow0 + dy : zrow0 + dy + m, :,
                        dy * n : (dy + 1) * n,
                    ].astype(jnp.float32)
                if "mid_store" in _DEBUG_SKIP:  # triage-only gate
                    # keep the combine alive (a dead val would be DCE'd)
                    act_refs[li][o0 : o0 + 1] = jnp.broadcast_to(
                        jnp.max(val.astype(jnp.float32))
                                .reshape(1, 1, 1).astype(act_dt),
                        (1,) + act_refs[li].shape[1:])
                else:
                    store_act(li, o0, o1, jnp.maximum(
                        val + b_ref[...], 0.0).astype(act_dt))

            done = 0
            prev_ze = 0
            for zs in range(0, ph, ch):
                ze = min(zs + ch, ph)
                if not piped and zs > 0:
                    # previous chunk's Z rows [zs−(f−1), zs) sit at
                    # [ch, ch+f−1); roll them to the window head
                    z_ref[0 : f - 1] = z_ref[ch : ch + f - 1]
                if not pre and "patch" not in _DEBUG_SKIP:
                    for dx in range(f):
                        p_ref[0 : ze - zs, :, dx * k : (dx + 1) * k] = src[
                            zs:ze, dx : dx + ow, 0:k
                        ].astype(dtype)
                operand = (src[zs:ze, 0:ow, 0 : f * k] if pre
                           else p_ref[0 : ze - zs])
                base = zs if piped else f - 1
                if "mid_dot" not in _DEBUG_SKIP:  # triage-only gate
                    z_ref[base : base + ze - zs] = jnp.dot(
                        operand.reshape((ze - zs) * ow, f * k),
                        w_ref[...],
                        preferred_element_type=jnp.float32,
                    ).reshape(ze - zs, ow, f * n).astype(z_ref.dtype)
                else:
                    # triage: replace the dot with an input-dependent
                    # broadcast — Z must still be written (reads of a
                    # never-written full-height scratch crash the
                    # remote compiler) and must not be constant (an
                    # all-constant Z constant-folds the combine)
                    z_ref[base : base + ze - zs] = jnp.broadcast_to(
                        operand[0:1, 0:1, 0:1].astype(z_ref.dtype)
                        .reshape(1, 1, 1),
                        (ze - zs, ow, f * n))
                if piped:
                    # lagged: rows whose Z window lies in chunks < this
                    o1p = min(oh, prev_ze - (f - 1))
                    emit(done, o1p, done)
                    done = max(done, o1p)
                    prev_ze = ze
                else:
                    # out rows whose full f-row Z window is now resident
                    o0 = max(0, zs - (f - 1))
                    o1 = ze - (f - 1)
                    emit(o0, o1, o0 - zs + f - 1)
            if piped:
                emit(done, oh, done)  # drain after the last dot

        if mm_last:
            return  # the last layer already ran through the MXU path

        # ---- last layer: n_out=1, row-block accumulation on the VPU ----
        # Patch-building would read the source activation f² times through
        # VMEM; instead each 8-row output block loads its (8+f−1)-row band
        # ONCE as a value and applies all f² taps as shifted in-register
        # FMAs, with a single lane reduction at the end.
        fL, kL, nL = fs[-1], ks[-1], ns[-1]
        owL = ws[-1]
        src = a_vmem.at[slot] if n_layers == 1 else act_refs[n_layers - 2]
        wL_ref, bL_ref = wrefs[-2], wrefs[-1]
        RB = 8

        if "last" in _DEBUG_SKIP:
            return  # triage: outputs stay garbage

        QL = -(-fL // pack_last)

        def last_rowblock(rb, _):
            # the band stays f32: a bf16 band compiles (dynamic row
            # indexing on a packed 3D ref's untiled leading dim is legal,
            # unlike the historical 2D lesson) but measured ~2% slower —
            # the whole-band f32 convert's register pressure outweighs
            # the halved loads (175.0 vs 178.4 MPix/s, 2026-08-17)
            band = src[pl.ds(rb * RB, RB + fL - 1), 0 : owL + fL - 1,
                       0 : pack_last * kL]
            # one 2D output ref per channel (a lane-index store into one
            # (th, tw, n_out) ref would need unsupported 1-lane writes);
            # the band value is loaded once and reused by every channel
            for ch in range(nL):
                acc3 = jnp.zeros((RB, owL, band.shape[-1]), jnp.float32)
                for dy in range(fL):
                    for q in range(QL):
                        # packed: lane c·k+j of band col x holds
                        # act[·, x+c, j], so this FMA covers dx-taps
                        # q·P..q·P+P−1; wL is (f·Q, n_out, P·k) with the
                        # matching per-tap weight rows (zeros past f).
                        # P=1 degenerates to the plain per-(dy,dx) form.
                        acc3 = acc3 + (
                            band[dy : dy + RB,
                                 q * pack_last : q * pack_last + owL, :]
                            * wL_ref[dy * QL + q][ch : ch + 1, :].astype(jnp.float32)
                        )
                out_refs[ch][pl.ds(rb * RB, RB), :] = (
                    jnp.sum(acc3, axis=-1) + bL_ref[ch]
                )
            return 0

        jax.lax.fori_loop(0, tile_h // RB, last_rowblock, 0)

    scratch_shapes = [
        # double-buffered windows: raw (C, H, W) planes in plane mode
        # (kilobytes), lane-padded patch windows otherwise
        pltpu.VMEM((2, c_in, win_hp, win_wp) if plane
                   else (2, win_h, win_w, c_pad), win_dt),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    for li in range(n_layers - 1):  # middle-layer activations
        # (all slicing of act refs is static, so packed `dtype` storage is
        # legal; the last layer's f32 input keeps VPU accumulation exact)
        # the packed-dx producer widens its lane dim to P·n — VMEM-free,
        # the ref's lane pad to 128 was already paid; a pre-packed
        # producer stores the consumer's patches outright: f·n lanes at
        # the consumer's output width
        if li + 1 in wino:
            # a wino layer's parity-plane input: (row parity, row/2,
            # col/2 — sized for the producer store AND the 16-aligned
            # tap over-read (_wino_w_in), col-parity lane groups of k);
            # a k == 32 consumer packs ALL FOUR parities into the lanes
            # of one rank-3 image instead (lane (2rp+cp)·k + c == 128)
            shape = ((hs[li + 1] // 2, _wino_w_in(ws, li + 1),
                      4 * ns[li])
                     if ns[li] == 32 else
                     (2, hs[li + 1] // 2,
                      _wino_w_in(ws, li + 1), 2 * ns[li]))
        elif li in wino:
            # wino output feeding the mm exit: dx'-packed 4k-lane
            # parity image at half resolution
            shape = (hs[li + 1] // 2,
                     -(-(ws[li + 2] // 2) // 8) * 8, 8 * ns[li])
        elif li + 1 in prepack:
            shape = (hs[li + 1], ws[li + 2], fs[li + 1] * ns[li])
        else:
            lanes = ns[li] * (pack_last if li == n_layers - 2 else 1)
            shape = (hs[li + 1], ws[li + 1], lanes)
        scratch_shapes.append(pltpu.VMEM(shape, act_dts[li]))
    # Z / patch scratch, f>1 layers only: pipelined layers carry a
    # full-height Z (oh+f−1 rows — lagged combine reads chunks behind
    # the dot), rolling layers (ch+f−1) rows (see the chunk schedules)
    for li in pz_idx:  # all-phase matmul outputs (Z), stream dtype
        if wino_mm and li == n_layers - 1:
            # parity-exit Z: half-res rows, f'=2 phases of 4m lanes
            scratch_shapes.append(pltpu.VMEM(
                (hs[li] // 2, -(-(ws[li + 1] // 2) // 8) * 8,
                 8 * ns[li]), dtype))
            continue
        rows = (hs[li + 1] + fs[li] - 1 if li in pipe_z
                else chunk_rows + fs[li] - 1)
        scratch_shapes.append(
            pltpu.VMEM((rows, ws[li + 1], fs[li] * ns[li]), dtype)
        )
    for li in pp_idx:  # patch chunk buffers (non-pre-packed consumers)
        scratch_shapes.append(
            pltpu.VMEM((chunk_rows, ws[li + 1], fs[li] * ks[li]), dtype)
        )
    for li in ps_idx:  # producer-side parity-split scratch (f32)
        # always 128 lanes: Mosaic strided ops require the memref's
        # last dim to be exactly 128 — k == 64 entries use the lower
        # half and waste the (physically lane-padded anyway) upper half
        scratch_shapes.append(
            pltpu.VMEM((chunk_rows, ws[li], 128), jnp.float32)
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers),
        out_specs=[
            # wino_mm: outputs stay in the parity domain — (2, 2, H/2,
            # W/2) planes per channel; one XLA transpose below
            # recombines (stride-2 stores into a full-res 2D out ref
            # have no Mosaic lowering at tile_w lanes)
            pl.BlockSpec((2, 2, tile_h // 2, tile_w // 2),
                         lambda i, j: (0, 0, i, j),
                         memory_space=pltpu.VMEM)
            if wino_mm else
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[
            jax.ShapeDtypeStruct(
                (2, 2, grid[0] * (tile_h // 2), grid[1] * (tile_w // 2)),
                jnp.float32)
            if wino_mm else
            jax.ShapeDtypeStruct((grid[0] * tile_h, grid[1] * tile_w),
                                 jnp.float32)
        ] * n_out,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # v5e carries 128 MB VMEM/core; leave ~12 MB for XLA's own
            # buffers outside the kernel (100 MB left deep-stack tiles
            # scoped-OOM — the compiler reports the exact overage)
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ap, *wbs)
    if wino_mm:
        # parity recombine: y[2i+p, 2j+q] = o[p, q, i, j] — per parity
        # row p, stack the two col-parity planes on a NEW last axis and
        # reshape (hh, wh, 2) → (hh, 2wh), then stack rows on axis 1
        # (free C-order reshape). Measured 0.10 ms/frame on chip vs
        # 2.14 ms for the single transpose(2,0,3,1)+reshape and 37 ms
        # for strided scatters (tools/recombine_probe.py, 2026-08-21) —
        # the one-axis-at-a-time form avoids the combined row+col+
        # parity-major relayout. In-kernel stride-2 lane stores stay
        # impossible (no Mosaic lowering at tile_w-wide memrefs).
        def _parity_recombine(o):
            hh, wh = o.shape[2], o.shape[3]
            zs = [jnp.stack([o[p_, 0], o[p_, 1]], axis=-1)
                  .reshape(hh, 2 * wh) for p_ in range(2)]
            return jnp.stack(zs, axis=1).reshape(2 * hh, 2 * wh)

        out = [_parity_recombine(o) for o in out]
    if n_out == 1:
        return out[0][:out_h, :out_w][..., None]
    return jnp.stack([o[:out_h, :out_w] for o in out], axis=-1)


def _quantize_planes(x, k: int):
    """Per-channel int8 quantization of an (N, H, W, k) image: x·127,
    clipped to ±1, round-to-nearest, each channel converted as a dense
    2D plane (a small-k rank-4 temp would lane-pad k → 128 if XLA
    materializes it). The ONE int8 contract shared by the plane and
    patch-array paths — the 1/127 scale folds into the conv1 weights."""
    return [
        jnp.round(jnp.clip(x[..., c], -1.0, 1.0) * 127.0).astype(jnp.int8)
        for c in range(k)
    ]


def _im2col_patches(x, f: int, dtype, int8: bool = False,
                    dpack: int = 0, pad_to=None):
    """(N, H, W, k) → (N, H−f+1, W−f+1, f²·k) patches, channel index
    (dy·f + dx)·k + c — the same flattening as HWIO weights reshaped to
    (f²·k, n). Feeds the kernel's folded first layer (a 1x1 matmul).

    ``dpack`` = D with 0 < D < f builds the dy-PACKED array instead:
    only D dy-taps in lanes (channel (d·f + dx)·k + c = x[y+d, x+dx, c],
    D·f·k planes instead of f²·k — the shifted-slice stack below is the
    measured build bottleneck, shuffle-bound and ∝ plane count) at
    height H−f+1+(G−1)·D with G = ⌈f/D⌉; the kernel covers dy-taps
    [g·D, g·D+D) from patch rows y+g·D (see ``_fused_tail_single``
    ``l1_gpack``). Rows past the source (G·D > f) are zero-filled and
    only ever multiplied by the slabs' zero tail weights.

    Built as a stack of 2D planes + transpose: slicing (…, H, W, 1)
    views directly would materialize f²·k single-channel temps that TPU
    lane-pads 128× (observed 500 MB each → HBM OOM under lax.scan);
    2D (H, W) slices tile cleanly and only the final array pays the
    one expected lane pad.

    ``int8=True`` stores the patches as int8 (input × 127, clipped to
    ±1, round-to-nearest): callers whose input is mean-subtracted
    normalized luma/RGB — strictly inside (−1, 1) — halve the patch
    array's HBM bytes, the transpose work, and the kernel's window DMA;
    the 1/127 scale folds into the folded first layer's weights. The
    quantization step (1/254 on unit scale) sits below the bf16 stream
    path's own rounding envelope.

    ``pad_to`` = (H_t, W_t, C_t) builds the array directly AT the fused
    kernel's padded window geometry (``_window_pads``): the spatial pads
    ride the input plane (fused into the shifted-slice reads), and the
    channel pad appends zero planes on the UNTILED leading axis before
    the transpose — no relayout, and the transpose's physical output is
    identical (the minor dim was lane-padded to 128 either way). This
    replaces the kernel wrapper's full-array pad copy. Kernel-side
    values are unchanged: the padded lanes multiply zero weight rows,
    and the padded rows/cols only feed outputs the caller crops."""
    dcnt = dpack if 0 < dpack < f else f
    gcnt = -(-f // dcnt)
    oh = x.shape[1] - f + 1 + (gcnt - 1) * dcnt
    ow = x.shape[2] - f + 1
    row_pad = gcnt * dcnt - f
    c_target = 0
    if pad_to is not None:
        h_t, w_t, c_target = pad_to
        row_pad += h_t - oh
        oh, ow = h_t, w_t
    col_pad = ow - (x.shape[2] - f + 1)
    if row_pad or col_pad:
        x = jnp.pad(x, ((0, 0), (0, row_pad), (0, col_pad), (0, 0)))
    # convert each channel as a dense (N, H, W) plane FIRST (leading dims
    # are untiled), not the rank-4 (N, H, W, k) array: a small-k
    # converted temp lane-pads k -> 128 if XLA materializes it, and the
    # per-plane form also converts each pixel once instead of once per
    # shifted slice
    k = x.shape[3]
    if int8:
        chans = _quantize_planes(x, k)
    else:
        chans = [x[..., c].astype(dtype) for c in range(k)]
    planes = jnp.stack(
        [
            chans[c][:, dy : dy + oh, dx : dx + ow]
            for dy in range(dcnt)
            for dx in range(f)
            for c in range(k)
        ],
        axis=1,
    )  # (N, D·f·k, oh, ow) — 2D-tiled slices, no channel padding
    if c_target > planes.shape[1]:
        # zero planes on the untiled channel axis (appends memory, no
        # relayout); their lanes hit zero weight rows in the kernel
        planes = jnp.pad(
            planes, ((0, 0), (0, c_target - planes.shape[1]), (0, 0), (0, 0)))
    return planes.transpose(0, 2, 3, 1)


def _prepare_tail_weights(params, dtype, pack_last: int = 1,
                          mm_last: bool = False,
                          sep_prep: frozenset = frozenset(),
                          wino_prep: frozenset = frozenset(),
                          wino_mm: bool = False,
                          ) -> List[jnp.ndarray]:
    """Reshape layers 2..L from HWIO (f, f, k, n): middle → all-phase
    (f·k, f·n) with column block dy holding kernel-row dy's (f·k, n),
    or stacked per-dy slabs (f²·k, n) for separated-phase layers
    (``sep_prep``, indices into THIS params list — see _sep_layers;
    a plain reshape, rows (dy, dx, c) with c fastest matching the
    prepacked patch lanes); last → (f², n, k), or packed-dx
    (f·⌈f/P⌉, n, P·k) when ``pack_last`` = P > 1 (row dy·Q+q, lane
    c·k+j = w[dy, q·P+c, j, n], zeros for taps past f), or the
    middle-style all-phase (f·k, f·n) when ``mm_last`` (the last layer
    runs on the MXU). Winograd-mode layers (``wino_prep`` indices /
    ``wino_mm`` for the last layer) take the (16k, n) pos-slab /
    (8k, 8m) parity all-phase layouts instead — see _wino_weights,
    _wino_mm_weights. Weights in ``dtype``, biases f32."""
    n_layers = len(params)
    wbs: List[jnp.ndarray] = []
    for li, l in enumerate(params):
        w = jnp.asarray(l["w"], jnp.float32)
        f, _, k, n = w.shape
        if li in wino_prep and li != n_layers - 1:
            # Winograd F(2x2,3x3) layer: (16k, n) pos slabs (U = GgGᵀ
            # per (c, n) — see _wino_weights / tests/test_winograd_prep)
            wbs.append(_wino_weights(w, dtype))
        elif li == n_layers - 1 and wino_mm:
            # parity-domain half-res all-phase last layer (8k, 8m) —
            # the wino chain's exit (see _wino_mm_weights)
            wbs.append(_wino_mm_weights(w, dtype))
        elif li in sep_prep and li != n_layers - 1:
            wbs.append(w.reshape(f * f * k, n).astype(dtype))
        elif li == n_layers - 1 and mm_last:
            wbs.append(
                w.reshape(f, f * k, n).transpose(1, 0, 2)
                .reshape(f * k, f * n).astype(dtype)
            )
        elif li == n_layers - 1 and pack_last > 1:
            q_cnt = -(-f // pack_last)
            wt = w.transpose(0, 1, 3, 2)  # (f, dx, n, k)
            wt = jnp.pad(wt, ((0, 0), (0, q_cnt * pack_last - f),
                              (0, 0), (0, 0)))
            wbs.append(
                wt.reshape(f, q_cnt, pack_last, n, k)
                .transpose(0, 1, 3, 2, 4)
                .reshape(f * q_cnt, n, pack_last * k)
            )
        elif li == n_layers - 1:
            # (f, f, k, n) → (f², n, k), kept f32 (the last layer runs on
            # the VPU in f32; rows are indexed statically per tap/channel)
            wbs.append(w.reshape(f * f, k, n).transpose(0, 2, 1))
        else:
            wbs.append(
                w.reshape(f, f * k, n).transpose(1, 0, 2)
                .reshape(f * k, f * n).astype(dtype)
            )
        wbs.append(jnp.asarray(l["b"], jnp.float32))
    return wbs


def _plane_h_weights(w1, b1, dtype, int8: bool, l1_rows: int = 8):
    """First-layer weights for the plane-input kernel: H such that
    ``Y[i, r·n+j] = Σ_{ch,dx,t} F[(ch,dx,t), i] · H[(ch,dx,t), r·n+j]``
    computes ``y[r, i, j] = Σ_{dy,dx,ch} E[r+dy, i+dx, ch]·w1[dy,dx,ch,j]``
    — row (ch·f+dx)·S + t carries ``w1[t−r, dx, ch]`` for 0 ≤ t−r < f
    and zeros elsewhere (slab rows past the taps multiply garbage plane
    rows by zero). R/S per ``_plane_rows`` (requires f ≤ 9 at R=8's
    16-row slab). The int8 plane's 1/127 scale folds in here."""
    f1, _, c1, n1 = w1.shape
    rr, ss = _plane_rows(l1_rows, f1)
    wm = (w1 / 127.0 if int8 else w1).astype(jnp.float32)
    slabs = [
        jnp.pad(wm, ((r, ss - f1 - r), (0, 0), (0, 0), (0, 0)))
        .transpose(2, 1, 0, 3).reshape(c1 * f1 * ss, n1)
        for r in range(rr)
    ]
    return (jnp.concatenate(slabs, axis=1).astype(dtype),
            jnp.tile(jnp.asarray(b1, jnp.float32), rr))


def fused_forward(params, x, tile_h: int = 0, tile_w: int = 0,
                  dtype=jnp.bfloat16, chunk_rows: int = 0,
                  input_int8: bool = False, l1_dstep: int = -1,
                  plane_input: bool | None = None,
                  prepack_max_deep: int = 384,
                  mm_last: bool | None = None,
                  sep_max_n: int | None = None,
                  l1_rows: int = 16,
                  pipe_combine: bool = True,
                  wino: bool | None = None):
    """Fused multi-layer forward: (N, H, W, C) → (N, H−s, W−s, n_out).

    ALL conv layers run in one Pallas kernel, streamed in ``dtype``
    (default bf16) with f32 accumulation. The first layer has three
    forms, most- to least-preferred:

    * **raw-plane** (``plane_input``, the compiled-TPU default for
      f₁ ≤ 9): XLA only quantizes/pads the (C, H, W) image plane — no
      patch array — and the kernel builds conv1's matmul operands
      in-register (lane rolls + one MXU identity-dot transpose per
      8-row × 128-col block; see the kernel's plane branch).
      ``plane_input=None`` resolves to True on TPU and False in
      interpret mode (the per-block unrolling makes interpret walks ~4x
      slower); int8 planes additionally need a 32-multiple ``tile_h``
      (sublane DMA alignment) and fall back to the patch form otherwise.
    * **folded patch array** (f₁²·c ≤ 256): XLA builds the im2col patch
      array (``_im2col_patches``) and the kernel runs conv1 as a 1x1
      matmul whose lanes ride the window DMA's 128-lane padding.
    * **XLA im2col first layer** (f₁²·c > 256), the kernel running
      layers 2..L only.

    Models outside the kernel's envelope (≤4 output channels, ≥3
    layers, few-channel first layer, 8-multiple middle channels) fall
    back to the plain XLA conv path.

    ``input_int8=True`` (bf16 stream path) stores the plane / patch
    array as int8 — see ``_quantize_planes``. Callers must guarantee
    inputs in [−1, 1] (mean-subtracted normalized luma/RGB always are);
    values outside clip.

    ``sep_max_n`` routes f==3 middle layers with n ≤ sep_max_n through
    separated-phase per-dy dots instead of the all-phase Z + combine
    (see ``_sep_layers``; None = auto = 128, 0 = off).

    ``l1_rows`` sets the plane first layer's block height R (output
    rows per identity-dot transpose; see ``_plane_rows``). R=16 (S=24
    slab at f₁ ≤ 9) halves transpose passes and cuts roll traffic 25%
    at identical main-dot pass counts — measured a win on every
    pairing: flagship 9.6-10.1 → 9.2-9.4 ms, RGB −0.1 ms (interleaved
    A/B ×3, tools/variants_probe.py 2026-08-18).

    ``wino`` routes eligible layers (f==3, k==128, consumer chain
    reaching an mm-eligible f==3 last layer with ≤16 outputs — see
    ``_wino_layers``) through Winograd F(2x2,3x3) in the parity domain:
    2.25x fewer MACs at full MXU K-fill, parity-split producer stores,
    and a half-res parity all-phase last layer whose out planes one XLA
    transpose recombines. None = auto = off pending on-chip A/B
    (the dypack/xpack discipline; probe: −55%/chunk at (128,128),
    tools/winograd_probe.py).
    """
    from ..models import forward as _xla_forward

    # default tiles: best measured 64x256 on SRCNN 9-5-5 (width bounded
    # by scoped VMEM: per-layer activations + rolling Z/patch chunks at
    # lane-padded widths); deep stacks halve the chunk to fit — their
    # Z/patch scratch count scales with the f>1 layer count
    if tile_h <= 0:
        tile_h = 64
    if tile_w <= 0:
        # deep stacks in full f32 double every window/act/patch buffer:
        # 64×256 ran the chip out of total VMEM (132.3/128 MB measured);
        # 128-wide fits with room
        tile_w = 128 if (len(params) > 4 and dtype == jnp.float32) else 256
    if chunk_rows <= 0:
        chunk_rows = (_MM_CHUNK_ROWS if len(params) <= 4
                      else _MM_CHUNK_ROWS_DEEP)
    chunk_rows = max(8, chunk_rows // 8 * 8)
    tile_h = max(8, tile_h // 8 * 8)
    tile_w = max(128, tile_w // 128 * 128)  # out block lane dim: 128-multiple

    shrink = sum(l["w"].shape[0] - 1 for l in params)
    mids_ok = all(l["w"].shape[2] % 8 == 0 for l in params[1:])
    if (
        params[-1]["w"].shape[3] > 4
        or len(params) < 3
        or params[0]["w"].shape[2] > 4
        or not mids_ok
        or x.shape[1] <= shrink + 8
        or x.shape[2] <= shrink + 8
    ):
        return _xla_forward(params, x)

    w1 = jnp.asarray(params[0]["w"], jnp.float32)
    b1 = jnp.asarray(params[0]["b"], jnp.float32)
    interpret = jax.default_backend() == "cpu"  # pallas needs interpret mode off-TPU

    f1, _, c1, n1 = params[0]["w"].shape
    kpack = f1 * f1 * c1
    # packed-dx last layer: P shifted copies fill the producer ref's
    # (already-paid) 128-lane pad, P taps per last-layer FMA
    fL, kL = params[-1]["w"].shape[0], params[-1]["w"].shape[2]
    pack_last = max(1, min(fL, 128 // kL))
    # MXU last layer: when no dx-pack fits (k > 64 → pack_last == 1)
    # the unpacked VPU tap loop pays f²·n_out FMAs per band; routing the
    # last layer through the all-phase matmul + masked-reduction combine
    # is cheaper IF its producer can prepack the operand (f·k lanes).
    # None = auto: on exactly in that regime.
    if mm_last is None:
        mm_last = fL > 1 and pack_last == 1
    if mm_last and (
        fL == 1  # nothing to phase-pack
        or (len(params) > 4 and fL * kL > prepack_max_deep)  # can't prepack
    ):
        mm_last = False  # ineligible: keep the VPU path
    if mm_last:
        pack_last = 1
    tail_dims = tuple(
        (l["w"].shape[0], l["w"].shape[2], l["w"].shape[3])
        for l in params[1:]
    )
    # separated-phase f==3 middle layers (see _sep_layers): None = auto
    # = 128, i.e. every eligible layer — measured a monotone win on the
    # 7-layer RGB stack and a no-op on f≠3 middles like the flagship's
    # (tools/sep_probe.py 2026-08-18). Kernels with a folded/plane
    # first layer index tail layer t as li = t+1, the XLA-conv1
    # fallback as li = t. Layer 0's dims entry never affects the set
    # (middle layers only), so one folded set serves both the plane and
    # patch first-layer forms.
    if sep_max_n is None:
        sep_max_n = 128
    # Winograd mode (see _wino_layers): None = auto = ON for compiled
    # TPU runs after the measured interleaved win (15.56 vs sep 16.04
    # ms/frame, 4/4 rounds, 2026-08-21 — the one-axis-at-a-time parity
    # recombine closed the integration gap; docs/BENCHMARKS.md).
    # Interpret mode (CPU tests) keeps sep: the 16-position unroll
    # makes interpret walks several times slower, mirroring the
    # plane_input auto rule; dedicated wino tests pass wino=True.
    # min_li is 1 for every first-layer form (the plane l1
    # parity-stores via its permuted transpose); each branch below
    # computes its prep set with the SAME shared function the kernel
    # uses.
    if wino is None:
        wino = not interpret
    wino = bool(wino)
    sep_fold = _sep_layers(((1, f1 * f1 * c1, n1),) + tail_dims,
                           len(params), prepack_max_deep, sep_max_n)
    sep_prep_fold = frozenset(li - 1 for li in sep_fold)
    sep_prep_tail = _sep_layers(tail_dims, len(params) - 1,
                                prepack_max_deep, sep_max_n)
    l1_gpack = 1
    l1_plane = l1_f = 0
    if plane_input is None:
        # default ON for compiled TPU runs; interpret mode (CPU tests)
        # keeps the patch path — the plane branch's per-block unrolling
        # makes interpret walks ~4x slower at the default tile size.
        # Dedicated small-tile tests pass plane_input=True explicitly.
        plane_input = not interpret
    use_int8 = input_int8 and dtype != jnp.float32
    # raw-plane eligibility: f₁ ≤ 9 (S−R+1 == 9 at every _plane_rows
    # geometry: R=8/S=16 and R=16/S=24 alike — the E slab must cover
    # all dy taps) and, for int8 planes, a 32-multiple tile_h — the plane
    # DMA's sublane (H) offset is i·tile_h and packed int8 tiles need
    # 32-row alignment (the patch path's sublane offset was j·tile_w,
    # always 128-aligned, so this constraint is new here)
    if plane_input and f1 <= 9 and (not use_int8 or tile_h % 32 == 0):
        # raw-plane first layer: no patch array at all — the kernel DMAs
        # the (C, H, W) image plane (kilobyte windows vs the ~300 MB
        # lane-padded patch array) and builds conv1's matmul operands
        # in-register via lane rolls + one MXU identity-dot transpose
        # per 8-row × 128-col block (see the kernel's plane branch).
        win_dt = jnp.int8 if use_int8 else jnp.float32
        h_w, b8 = _plane_h_weights(w1, b1, dtype, use_int8, l1_rows)
        l1_s = _plane_rows(l1_rows, f1)[1]
        dims = ((1, c1 * f1 * l1_s, n1),) + tail_dims
        wino_set = (_wino_layers(dims, len(params), mm_last, min_li=1)
                    if wino else frozenset())
        wbs = [h_w, b8] + _prepare_tail_weights(
            params[1:], dtype, pack_last, mm_last,
            sep_prep_fold - frozenset(li - 1 for li in wino_set),
            wino_prep=frozenset(li - 1 for li in wino_set),
            wino_mm=bool(wino_set))
        out_hw = (x.shape[1] - shrink, x.shape[2] - shrink)
        need_h, need_w, _, _ = _plane_pads(
            dims, out_hw[0], out_hw[1], tile_h, tile_w, win_dt,
            f1, l1_rows)
        if use_int8:
            chans = _quantize_planes(x, c1)
        else:
            chans = [x[..., c].astype(jnp.float32) for c in range(c1)]
        a1 = jnp.pad(jnp.stack(chans, axis=1),
                     ((0, 0), (0, 0),
                      (0, need_h - x.shape[1]), (0, need_w - x.shape[2])))
        l1_plane, l1_f = c1, f1
        l1_dstep = 0
    elif kpack <= 256:
        # fold layer 1 into the kernel as a pre-im2col'd 1x1 matmul
        w1m = w1 / 127.0 if use_int8 else w1  # fold the int8 scale
        # dy-packed build: pack only D dy-taps (D·f₁·c planes instead
        # of f₁²·c in the shifted-slice stack) and let the kernel run
        # G = ⌈f₁/D⌉ row-shifted dots. Measured 2026-08-17 (interleaved
        # A/B, docs/BENCHMARKS.md): +1.5% on the flagship at D=5/G=2
        # (fewer stack reads; the array lane-pads to 128 either way so
        # DMA bytes are unchanged), FLAT on deep RGB for every D —
        # plane count alone doesn't pay because the build is
        # write-bound on the lane-padded output. Auto (−1): G=2 split
        # only when the packed lanes still fit ONE 128-lane group;
        # 0/f₁ → full pack.
        if l1_dstep < 0:
            d_half = -(-f1 // 2)
            l1_dstep = d_half if (f1 >= 7 and d_half * f1 * c1 <= 128) else 0
        if 0 < l1_dstep < f1:
            dcnt = l1_dstep
            l1_gpack = -(-f1 // dcnt)
            kd = dcnt * f1 * c1
            wp = jnp.pad(
                w1m, ((0, l1_gpack * dcnt - f1), (0, 0), (0, 0), (0, 0))
            )
            wbs = [wp.reshape(l1_gpack, kd, n1)
                   .reshape(l1_gpack * kd, n1).astype(dtype), b1]
            dims = ((1, kd, n1),) + tail_dims
        else:
            l1_dstep = 0
            wbs = [w1m.reshape(kpack, n1).astype(dtype), b1]
            dims = ((1, kpack, n1),) + tail_dims
        wino_set = (_wino_layers(dims, len(params), mm_last, min_li=1)
                    if wino else frozenset())
        wbs += _prepare_tail_weights(
            params[1:], dtype, pack_last, mm_last,
            sep_prep_fold - frozenset(li - 1 for li in wino_set),
            wino_prep=frozenset(li - 1 for li in wino_set),
            wino_mm=bool(wino_set))
        # build the patch array directly at the kernel's padded window
        # geometry: kills the tail's full-array pad copy (~2.85 ms/frame
        # measured on the flagship — see _window_pads)
        win_dt = jnp.int8 if use_int8 else dtype
        dcnt = l1_dstep if 0 < l1_dstep < f1 else f1
        gcnt = -(-f1 // dcnt)
        oh = x.shape[1] - f1 + 1 + (gcnt - 1) * dcnt
        ow = x.shape[2] - f1 + 1
        pad_h, pad_w = _window_pads(dims, oh, ow, tile_h, tile_w, win_dt,
                                    dtype, l1_gpack, l1_dstep)
        c_t = -(-(dcnt * f1 * c1) // 128) * 128
        a1 = _im2col_patches(x, f1, dtype, int8=use_int8, dpack=l1_dstep,
                             pad_to=(oh + pad_h, ow + pad_w, c_t))
        # the padded array no longer encodes the true output size (the W
        # pad carries the window's sublane-roundup overhang) — pass it
        out_hw = (x.shape[1] - shrink, x.shape[2] - shrink)
    else:
        dims = tail_dims
        wino_set = (_wino_layers(dims, len(dims), mm_last, min_li=1)
                    if wino else frozenset())
        wbs = _prepare_tail_weights(params[1:], dtype, pack_last,
                                    mm_last, sep_prep_tail - wino_set,
                                    wino_prep=wino_set,
                                    wino_mm=bool(wino_set))
        a1 = _conv_first(x, w1, b1, relu=True, dtype=dtype)
        out_hw = None
    outs = [
        _fused_tail_single(wbs, a1[i], dims, tile_h, tile_w,
                           interpret=interpret, dtype=dtype,
                           chunk_rows=chunk_rows, pack_last=pack_last,
                           l1_gpack=l1_gpack, l1_dstep=l1_dstep,
                           out_hw=out_hw, l1_plane=l1_plane, l1_f=l1_f,
                           l1_rows=l1_rows,
                           prepack_max_deep=prepack_max_deep,
                           mm_last=mm_last, sep_max_n=sep_max_n,
                           pipe_combine=pipe_combine, wino_on=wino)
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs)
