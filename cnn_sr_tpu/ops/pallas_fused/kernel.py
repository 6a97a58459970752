"""The fused multi-layer Pallas kernel (``_fused_tail_single``).

One kernel runs layers 1..L over spatial tiles with every activation
resident in VMEM, streamed in the caller's ``dtype`` with f32
accumulation — the TPU-native replacement for the reference's per-layer
"uber kernel" dispatches (layer_uber_kernel.cl;
ConfigBasedDataPipeline.cpp:200-241). Mode selection (plane/sep/wino/
prepack/mm_last) mirrors ``rules`` exactly; the wino and plane branch
bodies live in ``wino_kernel`` / ``plane``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import debug
from .plane import plane_first_layer
from .scratch import build_scratch_shapes
from .rules import (_MM_CHUNK_ROWS, _plane_rows, _plane_win_hp,
                    _sep_layers, _wino_layers, _wino_quad, _wino_tc)
from .wino_kernel import parity_entry_store, wino_layer, wino_mm_exit

@functools.partial(
    jax.jit,
    static_argnames=("dims", "tile_h", "tile_w", "interpret", "dtype",
                     "chunk_rows", "pack_last", "l1_gpack", "l1_dstep",
                     "out_hw", "l1_plane", "l1_f", "l1_rows",
                     "prepack_max_deep", "mm_last", "sep_max_n",
                     "pipe_combine", "wino_on", "wino5_on",
                     "exit_noz", "exit_raw", "exit_xt", "exit_up",
                     "wino_trg", "wino_qgrp"),
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
                       wino_on: bool = False,
                       wino5_on: bool = False,
                       exit_noz: bool = False,
                       exit_raw: bool = False,
                       exit_xt: int = 0,
                       exit_up: bool = False,
                       wino_trg: int = 0,
                       wino_qgrp: int = 1):
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
    # triage skip set, bound ONCE at trace time (debug.set_debug_skip
    # clears the jit cache so a new set always re-traces)
    skip = debug._DEBUG_SKIP
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
        debug._LAST_TAIL_PADDED = (
            a.shape[1] < need_h or a.shape[2] < need_w
            or a.dtype != win_dt)
        if debug._LAST_TAIL_PADDED:
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
        debug._LAST_TAIL_PADDED = (pad_h > 0 or pad_w > 0 or c_pad != c_in
                             or a.dtype != win_dt)
        if debug._LAST_TAIL_PADDED:
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
                         min_li=1, f5=wino5_on)
            if wino_on else frozenset())
    # the chain always reaches the last layer (eligibility is computed
    # back to front from the mm exit), so a nonempty set implies the
    # parity-exit last layer
    wino_mm = bool(wino)
    fp_ex = (fs[-1] + 1) // 2  # exit half-res phases (2 at f=3, 3 at f=5)
    # un-packed exit (``wino_exit_up``): the producer stores the plain
    # quad image once and the exit's K-slice dots read the dx' shifts
    # — needs the Z-based exit (noz keeps the packed read layout)
    exit_up = bool(exit_up) and wino_mm and not exit_noz
    # activations feeding MXU layers stream in `dtype` (their consumers
    # cast patches to `dtype` anyway — identical values, half the VMEM);
    # the last layer's input stays f32 for the VPU tap accumulation —
    # unless the last layer itself runs on the MXU (``mm_last``) or as
    # the parity exit (``wino_mm``)
    act_dts = [dtype if (mm_last or wino_mm or li + 1 < n_layers - 1)
               else jnp.float32
               for li in range(n_layers - 1)]
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
    n_mxu = n_layers if (mm_last or wino_mm) else n_layers - 1
    pz_idx = {li: i for i, li in enumerate(
        li for li in range(n_mxu)
        if fs[li] > 1 and li not in sep and li not in wino
        and not (wino_mm and exit_noz and li == n_layers - 1))}
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

    n_ob = 1 if (wino_mm and exit_raw) else n_out

    def kernel(a_hbm, *refs):
        wrefs = refs[: 2 * n_layers]
        out_refs = refs[2 * n_layers : 2 * n_layers + n_ob]
        scratch = refs[2 * n_layers + n_ob :]
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

        if "dma" not in skip:
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
                # parity-split store for a wino consumer (see
                # ``wino_kernel.parity_entry_store``)
                parity_entry_store(
                    act_refs[li], ps_refs[ps_idx[li + 1]], v, n=n,
                    r0=r0, m=r1 - r0, w_half=ws[li + 1] // 2,
                    act_dt=act_dts[li],
                    quad=_wino_quad(fs[li + 1], ks[li + 1]))
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
            if f"L{li}" in skip or (
                    li == n_layers - 1 and "last" in skip):
                continue  # triage: per-layer subtraction (act garbage)
            f, k, n = fs[li], ks[li], ns[li]
            oh, ow = hs[li + 1], ws[li + 1]
            src = a_vmem.at[slot] if li == 0 else act_refs[li - 1]
            w_ref, b_ref = wrefs[2 * li], wrefs[2 * li + 1]
            act_dt = act_dts[li] if li < n_layers - 1 else jnp.float32

            if li in wino:
                # ---- Winograd F(2x2,3x3) layer (parity domain) ----
                # Three per-k dot regimes (quad / j-paired / unpaired)
                # — bodies and the measured record live in
                # ``wino_kernel.wino_layer``.
                if "mid" in skip:
                    continue  # triage
                feeds_exit = wino_mm and li == n_layers - 2
                last_cons = feeds_exit and not exit_up
                if feeds_exit and exit_up:
                    # un-packed exit: the plain quad store must cover
                    # the exit ref's full width (incl. the dx' halo) —
                    # the same geometry bound the packed store asserts
                    assert act_refs[li].shape[1] <= _wino_tc(ws, li)
                wino_layer(
                    src, w_ref, b_ref, act_refs[li], f=f, k=k, n=n,
                    tr_l=oh // 2, tc_l=_wino_tc(ws, li),
                    last_cons=last_cons, exit_fp=fp_ex,
                    cons_quad=(feeds_exit and exit_up)
                    or ((not feeds_exit)
                        and _wino_quad(fs[li + 1], ks[li + 1])),
                    act_dt=act_dt, dtype=dtype,
                    trg=(wino_trg if wino_trg > 0 else 6),
                    quad_group=wino_qgrp,
                    skip=(frozenset({"mid_store"})
                          if ("mid_store" in skip
                              or f"L{li}_store" in skip)
                          else frozenset()))
                continue

            if wino_mm and li == n_layers - 1:
                # ---- parity-domain all-phase exit (wino_mm): see
                # ``wino_kernel.wino_mm_exit`` ----
                if "last" in skip:
                    continue  # triage
                wino_mm_exit(
                    src, w_ref, b_ref,
                    None if exit_noz else z_refs[pz_idx[li]],
                    out_refs, k=k, n=n, fp=fp_ex, trh=hs[li] // 2,
                    ohh=tile_h // 2, ch=ch, tile_w=tile_w, skip=skip,
                    noz=exit_noz, raw=exit_raw, xt=exit_xt, up=exit_up)
                continue

            if plane and li == 0:
                if "l1" in skip:
                    continue  # triage: leave act garbage
                # ---- raw-plane first layer: in-register im2col (see
                # ``plane.plane_first_layer``) ----
                # store_act's consumer-packing selection, in slab form
                # (li==0 can never be the pack_last producer: the fused
                # path requires >= 3 layers)
                if li + 1 in prepack:
                    cnt_, wtgt_ = fs[li + 1], ws[li + 2]
                else:
                    cnt_, wtgt_ = 1, ws[li + 1]
                plane_first_layer(
                    src, w_ref, b_ref, act_refs[li], f1=l1_f,
                    c_in=c_in, oh=oh, nblk=nblk, l1_r=l1_r, l1_s=l1_s,
                    n=n, cons_wino=1 in wino,
                    cons_quad=1 in wino
                    and _wino_quad(fs[1], ks[1]),
                    cnt=cnt_, wtgt=wtgt_, act_dt=act_dt, dtype=dtype,
                    skip=skip)
                continue

            if f == 1:
                if "l1" in skip:
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
                    if "l1_store" in skip:  # triage-only gate
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
                if "mid" in skip:
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
                    if "mid_dot" not in skip:
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
                    if "mid_combine" in skip:
                        continue  # triage (sep has no combine: ≙ store)
                    if "mid_store" in skip:  # triage-only gate
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
            if "mid" in skip:
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
                if m <= 0 or "mid_combine" in skip:
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
                if "mid_store" in skip:  # triage-only gate
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
                if not pre and "patch" not in skip:
                    for dx in range(f):
                        p_ref[0 : ze - zs, :, dx * k : (dx + 1) * k] = src[
                            zs:ze, dx : dx + ow, 0:k
                        ].astype(dtype)
                operand = (src[zs:ze, 0:ow, 0 : f * k] if pre
                           else p_ref[0 : ze - zs])
                base = zs if piped else f - 1
                if "mid_dot" not in skip:  # triage-only gate
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

        if mm_last or wino_mm:
            return  # the last layer already ran on the MXU / parity exit

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

        if "last" in skip:
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

    scratch_shapes = build_scratch_shapes(
        plane=plane, c_in=c_in,
        win_hp=win_hp if plane else 0, win_wp=win_wp if plane else 0,
        win_h=win_h, win_w=win_w, c_pad=c_pad, win_dt=win_dt,
        n_layers=n_layers, fs=fs, ks=ks, ns=ns, hs=hs, ws=ws,
        act_dts=act_dts, wino=wino, wino_mm=wino_mm, prepack=prepack,
        pack_last=pack_last, fp_ex=fp_ex, pz_idx=pz_idx, pp_idx=pp_idx,
        ps_idx=ps_idx, pipe_z=pipe_z, chunk_rows=chunk_rows,
        dtype=dtype, exit_up=exit_up)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers),
        out_specs=(
            # exit_raw: ONE half-res lane-packed output — the combined
            # Z lanes (pq·m + cc at lane groups of 4m) stored densely;
            # the per-channel/parity extraction happens in XLA below
            # (a handful of 2-MB plane slices — bandwidth-trivial)
            [pl.BlockSpec((tile_h // 2, tile_w // 2, 128),
                          lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)]
            if wino_mm and exit_raw else [
                # wino_mm: outputs stay in the parity domain — (2, 2,
                # H/2, W/2) planes per channel; one XLA transpose below
                # recombines (stride-2 stores into a full-res 2D out
                # ref have no Mosaic lowering at tile_w lanes)
                pl.BlockSpec((2, 2, tile_h // 2, tile_w // 2),
                             lambda i, j: (0, 0, i, j),
                             memory_space=pltpu.VMEM)
                if wino_mm else
                pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
            ] * n_out),
        out_shape=(
            [jax.ShapeDtypeStruct(
                (grid[0] * (tile_h // 2), grid[1] * (tile_w // 2), 128),
                jnp.float32)]
            if wino_mm and exit_raw else [
                jax.ShapeDtypeStruct(
                    (2, 2, grid[0] * (tile_h // 2),
                     grid[1] * (tile_w // 2)), jnp.float32)
                if wino_mm else
                jax.ShapeDtypeStruct((grid[0] * tile_h, grid[1] * tile_w),
                                     jnp.float32)
            ] * n_out),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            # v5e carries 128 MB VMEM/core; leave ~12 MB for XLA's own
            # buffers outside the kernel (100 MB left deep-stack tiles
            # scoped-OOM — the compiler reports the exact overage)
            vmem_limit_bytes=116 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ap, *wbs)
    if wino_mm and exit_raw:
        # lane-packed raw exit output: o[I, J, (2p+q)·m + cc] — slice
        # each channel's four parity planes from the lanes (2-MB copies)
        # and recombine with the same one-axis-at-a-time trick
        o = out[0]

        def _recombine_raw(cc):
            hh, wh = o.shape[0], o.shape[1]
            zs = [jnp.stack([o[:, :, (2 * p_ + 0) * n_out + cc],
                             o[:, :, (2 * p_ + 1) * n_out + cc]],
                            axis=-1).reshape(hh, 2 * wh)
                  for p_ in range(2)]
            return jnp.stack(zs, axis=1).reshape(2 * hh, 2 * wh)

        out = [_recombine_raw(cc) for cc in range(n_out)]
    elif wino_mm:
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
