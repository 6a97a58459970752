"""Eligibility rules and window/tile geometry for the fused kernel.

Every rule here is shared by the kernel (``kernel.py``) and the weight
prep / entry (``weights.py`` / ``entry.py``) so the two sides cannot
drift — the single-definition contract VERDICT r3 weak #4 asked for.
"""

from __future__ import annotations

import jax.numpy as jnp

# Default row-chunk of the middle layers' rolling all-phase matmul:
# bounds BOTH the per-dot operand/result stack transients and the
# persistent Z/patch scratch (chunk_rows+f−1 resp. chunk_rows rows per
# f>1 layer). Deep stacks (>4 layers) run 24: the historical 16 was
# set when every deep layer carried Z+patch scratch; after sep +
# full prepack freed that VMEM, 24 measured best (tools/tile_probe.py
# 64×256 chunk 16/24/32 = 24.0/22.85/23.3 ms, 2×-confirmed 2026-08-18).
_MM_CHUNK_ROWS = 32
_MM_CHUNK_ROWS_DEEP = 24

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


def _wino_quad(f, k):
    """Input format a parity-domain layer (f, k) reads: True = the
    rank-3 QUAD image (H/2, W, 4k lanes — all four parities in lane
    groups), False = rank-4 j-paired parity planes (2, H/2, W, 2k).
    Every f == 5 layer is quad (its 3×3 half-res tap sweep wants all
    four parities per read; 4k ≤ 256 = 2 K-tiles at the eligible k),
    as is every f == 1 layer (a 1×1 conv commutes with parity packing
    — one block-diagonal (4k, 4n) dot computes all four parities);
    at f == 3 only k == 32 packs into one 128-lane group."""
    return f in (1, 5) or k == 32


def _wino_layers(dims, n_layers, mm_last, min_li=1, f5=False):
    """Middle layers running in the parity domain (Winograd F(2x2,3x3)
    at f==3; direct QUAD-parity dots at f==5 — see ``f5``).

    Eligible (computed back to front): f == 3 with k ∈ {32, 64, 128}
    (or, when ``f5``, f == 5 with k ∈ {32, 64}), and a consumer that
    reads parity — either another wino-family layer or the last layer
    as the half-res parity all-phase exit. The f==3 exit additionally
    requires ``mm_last`` (its non-wino fallback is the mm path and the
    two modes were measured together); an f==5 last layer has no
    mm_last mode at all (pack_last > 1 at its k ≤ 64), so its exit is
    gated only by ``f5``. n_out ≤ 16 bounds the exit Z lanes
    (⌈f/2⌉·4·n_out). Per-shape dot regimes sharing the parity domain:

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
    * f == 5 (``f5``): direct QUAD-parity dots over the 3×3 half-res
      tap sweep — 9 position dots (M, 4k) @ (4k, 4n) accumulating in
      registers (no Z, no phase combine). Pass math at k=64/n=32:
      18 K-passes per 512 px vs the all-phase form's 24 (−25%), with
      the direct-conv numerics of the quad path (F(2x2,5x5)'s non-unit
      transform coefficients would force VPU multiplies — the k=32
      lesson, packing alone pays, applies one f up).

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
    last_ok = ns[-1] <= 16 and (
        (mm_last and fs[-1] == 3) or (f5 and fs[-1] == 5))
    for li in range(n_layers - 2, min_li - 1, -1):
        cons_ok = (li + 1 in elig) or (li + 2 == n_layers and last_ok)
        ok3 = fs[li] == 3 and ks[li] in (32, 64, 128)
        ok5 = f5 and fs[li] == 5 and ks[li] in (32, 64)
        # f == 1 (the 9-1-5 middle): a 1×1 conv in the parity domain
        # is ONE block-diagonal quad dot — it joins so the chain can
        # reach the half-res exit (gated with f5: same umbrella)
        ok1 = (f5 and fs[li] == 1 and ks[li] in (32, 64)
               and 4 * ns[li] <= 128)
        if (ok3 or ok5 or ok1) and cons_ok:
            elig.add(li)
    return frozenset(elig)

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
    zero H rows). R=8/S=16 is the historical fixed geometry; R=16/S=24
    the shipping one.

    ``l1_rows < 8`` (or any NEGATIVE value −R) opts into the EXACT
    tight geometry R, S=R+f₁−1 with no 8-rounding (ROADMAP (a) /
    VERDICT r4 #2): at f₁=9/c=1, R=6 gives S=14 and a main-dot K of
    c·f₁·S = 126 ≤ 128 — ONE MXU K-block instead of two, halving the
    per-row main-dot charge. The cost is sublane-UNALIGNED slab reads
    (r8 steps of R∤8) and more roll traffic per row; measured a 4/4
    interleaved win on the flagship int8 config (tools/l1_probe.py,
    2026-08-21). ``fused_forward`` resolves its auto default to the
    largest such R when c·f₁·S fits one K-block (the negative spelling
    lets exact R ≥ 8, e.g. the RGB stack's R=12/S=14, pass through
    the 8-multiple legacy branch untouched)."""
    if l1_rows < 0:
        return -l1_rows, -l1_rows + f1 - 1
    if 0 < l1_rows < 8:
        return l1_rows, l1_rows + f1 - 1
    if l1_rows == 0:
        l1_rows = 16  # entry resolves auto before this; safe fallback
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
