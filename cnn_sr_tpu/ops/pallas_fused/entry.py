"""Public entry: ``fused_forward`` — mode resolution + input builds.

Resolves the first-layer form (raw-plane / folded patch array / XLA
im2col), the per-layer mode sets (sep / wino / prepack / mm_last /
pack_last) via the shared ``rules``, prepares weights via ``weights``,
and dispatches the single fused kernel per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...models.fast_forward import _conv_first
from .kernel import _fused_tail_single
from .rules import (
    _MM_CHUNK_ROWS,
    _MM_CHUNK_ROWS_DEEP,
    _plane_pads,
    _plane_rows,
    _sep_layers,
    _window_pads,
    _wino_layers,
)
from .weights import (
    _im2col_patches,
    _plane_h_weights,
    _prepare_tail_weights,
    _quantize_planes,
)

def fused_forward(params, x, tile_h: int = 0, tile_w: int = 0,
                  dtype=jnp.bfloat16, chunk_rows: int = 0,
                  input_int8: bool = False, l1_dstep: int = -1,
                  plane_input: bool | None = None,
                  prepack_max_deep: int = 384,
                  mm_last: bool | None = None,
                  sep_max_n: int | None = None,
                  l1_rows: int = 0,
                  pipe_combine: bool = True,
                  wino: bool | None = None,
                  wino5: bool | None = None,
                  wino_exit_noz: bool = False,
                  wino_exit_raw: bool = False,
                  wino_exit_xt: int = -1,
                  wino_exit_up: int = -1,
                  wino_trg: int = 0,
                  wino_quad_group: int = 0):
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
    rows per identity-dot transpose; see ``_plane_rows``). 0 = auto
    (default): the largest EXACT R (S = R+f₁−1, no 8-rounding) whose
    main-dot K = c·f₁·S fits ONE 128-deep MXU K-block — flagship
    R=6/S=14 (K=126, vs R=16/S=24's two-block K=216), RGB R=12/S=14.
    Halves the main-dot charge; measured 4/4 interleaved wins on both
    shipping configs despite the sublane-unaligned slab reads
    (tools/l1_probe.py 2026-08-21: flagship int8 −0.2..−0.5 ms, RGB
    −0.3 ms; VERDICT r4 #2). Positive values pin the legacy 8-multiple
    geometries (16 = the old default, measured 2026-08-18); negative
    −R pins an exact geometry.

    ``wino`` routes eligible layers (f==3, k==128, consumer chain
    reaching an mm-eligible f==3 last layer with ≤16 outputs — see
    ``_wino_layers``) through Winograd F(2x2,3x3) in the parity domain:
    2.25x fewer MACs at full MXU K-fill, parity-split producer stores,
    and a half-res parity all-phase last layer whose out planes one XLA
    transpose recombines. None = auto = ON for compiled TPU runs
    (measured interleaved wins — docs/BENCHMARKS.md); interpret mode
    resolves to off. ``wino5`` extends the chain to f ∈ {1, 5} layers
    (also auto-ON on TPU); ``wino_exit_noz``/``wino_exit_raw`` are
    measured-loss exit variants kept correctness-pinned (ship off).
    ``wino_exit_xt`` replaces the exit combine's per-(channel, parity)
    masked lane extraction with an MXU transpose-extract (1 = HIGHEST
    f32 selection dot, 2 = Mosaic swapaxes, 3 = hi/lo bf16 split dots
    — see ``wino_kernel._xt_extract``; −1 = auto).
    ``wino_exit_up`` stores the exit producer's output as the plain
    quad image ONCE (instead of fp dx'-shifted lane copies — the RGB
    L5_store 0.89 ms/frame marginal) and moves the dx' structure into
    the exit's fp K-slice dots at col offsets — identical MXU pass
    count, 1/fp the producer store traffic (see ``wino_mm_exit`` ``up``;
    −1 = auto).
    """
    from ...models import forward as _xla_forward

    # default tiles: best measured 64x256 on SRCNN 9-5-5 (width bounded
    # by scoped VMEM: per-layer activations + rolling Z/patch chunks at
    # lane-padded widths); deep stacks halve the chunk to fit — their
    # Z/patch scratch count scales with the f>1 layer count
    if tile_h <= 0:
        # deep bf16 WINO-chain stacks prefer taller tiles since the
        # R=12 tight l1 landed: 128 measured −0.44 ms on the RGB frame
        # (11.28 vs 11.72, 2/2 interleaved rounds, variants_probe
        # 2026-08-21) while the 3-layer flagship prefers 64 (5.30 vs
        # 5.73) — the deep stack amortizes per-tile edge work over
        # more rows, the shallow one loses VMEM locality. The SEP path
        # (wino=False) keeps 64: its per-layer patch scratch scales
        # with tile_h and 128 fails the scoped-VMEM budget (measured —
        # the wino chain's half-res parity buffers are what make 128
        # fit). f32 deep stacks keep 64 likewise (they already halve
        # tile_w for headroom).
        wino_eff = (wino if wino is not None
                    else jax.default_backend() != "cpu")
        tile_h = 128 if (len(params) > 4 and wino_eff
                         and dtype != jnp.float32) else 64
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
    # f==5 parity chain (quad-direct dots + f'=3 parity exit — see
    # _wino_layers ``f5``): None = auto = ON for compiled TPU runs
    # after the measured interleaved win (flagship 9-5-5 1080p:
    # wino5 4.57 vs base 7.39 ms/frame marginal, 4/4 rounds, on-chip
    # parity 3.0e-6 — tools/wino_ab.py --config flagship, 2026-08-21).
    # Interpret mode keeps the packed-dx path (same auto rule as
    # ``wino``); dedicated tests pass wino5=True. Requires ``wino``
    # (the chain machinery).
    if wino5 is None:
        wino5 = not interpret
    wino5 = bool(wino5) and wino
    # exit transpose-extract (see _xt_extract): −1 = auto = the HIGHEST
    # selection dot (xt=1, f32-exact) for compiled TPU runs after the
    # measured interleaved wins (4/4 rounds each, tools/variants_probe
    # 2026-08-21): flagship 6.29-6.66 → 5.65-5.75 ms and RGB 13.48-13.52
    # → 12.17-12.30 ms full-pipeline — the stage budget had pinned the
    # VPU extraction at ~1.0 of the flagship's 4.6 ms kernel marginal
    # (tools/flagship_stages.py last_extr). Interpret keeps the
    # masked-reduction form (the oracle formulation the tests pin).
    if wino_exit_xt < 0:
        wino_exit_xt = 0 if interpret else 1
    # quad tap-group size (see wino_kernel.wino_layer): K-concatenate
    # this many taps per dot. The FULL concat measured −52% per chunk
    # at the conv2 f=5 shape standalone (wino5_probe quad1 2.68 vs
    # quad 5.60 us) but FLAT on the full flagship pipeline (5.30 vs
    # 5.32 ms best, 4 interleaved rounds — Mosaic already overlaps the
    # per-tap dots; the dypack/xpack lesson again) and the RGB kernel's
    # f=3 concat fails Mosaic lowering (sublane-offset mismatch on the
    # lane concat). Auto = 1 (per-tap dots); the knob remains for
    # probing. docs/BENCHMARKS.md 2026-08-21.
    if wino_quad_group <= 0:
        wino_quad_group = 1
    if wino_exit_raw or wino_exit_noz:
        # the raw/noz A/B exits keep their own store layouts (raw: one
        # 3D lane-packed out ref) that the xt path's 4-index parity
        # stores would corrupt — the variant knobs win over the auto xt
        wino_exit_xt = 0
    # un-packed exit (see wino_mm_exit ``up``): −1 = auto = ON for
    # compiled TPU runs after measured interleaved wins on ALL THREE
    # chains (tools/variants_probe.py full-pipeline, 2026-08-22:
    # RGB 11.25-11.28 → 10.84-11.03 ms 4/4 rounds; flagship 5.31-5.33
    # → 4.86-4.89 4/4; 9-1-5 best 3.31 → 2.90, 3/4 with one tunnel-
    # window outlier). Interpret keeps the packed form (the oracle
    # formulation the tests pin). Requires the Z-based exit.
    if wino_exit_up < 0:
        wino_exit_up = 0 if interpret else 1
    wino_exit_up = int(bool(wino_exit_up)) if not wino_exit_noz else 0
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
    if l1_rows == 0:
        # auto (VERDICT r4 #2): the largest EXACT R whose slab keeps
        # the main-dot K = c·f₁·(R+f₁−1) inside ONE 128-deep MXU
        # K-block (flagship 9-5-5: R=6/S=14, K=126; RGB f₁=3/c=3:
        # R=12/S=14, K=126) — measured 4/4 interleaved wins on both
        # (tools/l1_probe.py 2026-08-21). Capped at 16 (the measured
        # R≥24 sweep said taller blocks stop paying) and falling back
        # to the legacy R=16/S=24 when no R ≥ 4 fits the block.
        r_tight = 128 // (c1 * f1) - f1 + 1
        l1_rows = -min(r_tight, 16) if r_tight >= 4 else 16
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
        wino_set = (_wino_layers(dims, len(params), mm_last, min_li=1,
                                 f5=wino5)
                    if wino else frozenset())
        if wino_set:
            pack_last = 1  # the parity exit replaces the packed-dx VPU
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
        wino_set = (_wino_layers(dims, len(params), mm_last, min_li=1,
                                 f5=wino5)
                    if wino else frozenset())
        if wino_set:
            pack_last = 1
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
        wino_set = (_wino_layers(dims, len(dims), mm_last, min_li=1,
                                 f5=wino5)
                    if wino else frozenset())
        if wino_set:
            pack_last = 1
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
                           pipe_combine=pipe_combine, wino_on=wino,
                           wino5_on=wino5, exit_noz=wino_exit_noz,
                           exit_raw=wino_exit_raw,
                           exit_xt=wino_exit_xt,
                           exit_up=bool(wino_exit_up),
                           wino_trg=wino_trg,
                           wino_qgrp=wino_quad_group)
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs)
