"""Scratch-buffer shape derivation for ``_fused_tail_single``.

One function so the VMEM layout (windows, per-layer activations, Z /
patch / parity-split scratch) reads as a unit; every rule mirrors the
kernel's mode sets exactly (they are passed in, not recomputed).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from .rules import _wino_quad, _wino_w_in


def build_scratch_shapes(*, plane, c_in, win_hp, win_wp, win_h, win_w,
                         c_pad, win_dt, n_layers, fs, ks, ns, hs, ws,
                         act_dts, wino, wino_mm, prepack, pack_last,
                         fp_ex, pz_idx, pp_idx, ps_idx, pipe_z,
                         chunk_rows, dtype, exit_up=False):
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
                     if _wino_quad(fs[li + 1], ks[li + 1]) else
                     (2, hs[li + 1] // 2,
                      _wino_w_in(ws, li + 1), 2 * ns[li]))
        elif li in wino:
            # wino output feeding the mm exit: dx'-packed parity image
            # at half resolution (fp_ex copies of 4·n lanes) — or, for
            # the UN-PACKED exit (``exit_up``), the plain rank-3 quad
            # image widened by the fp_ex − 1 col-shift halo the exit's
            # K-slice dots read (one copy, 1/fp_ex the store traffic)
            wz = -(-(ws[li + 2] // 2) // 8) * 8
            shape = ((hs[li + 1] // 2,
                      -(-(wz + fp_ex - 1) // 8) * 8, 4 * ns[li])
                     if exit_up else
                     (hs[li + 1] // 2, wz, fp_ex * 4 * ns[li]))
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
            # parity-exit Z: half-res rows, f'=fp_ex phases of 4m lanes
            scratch_shapes.append(pltpu.VMEM(
                (hs[li] // 2, -(-(ws[li + 1] // 2) // 8) * 8,
                 fp_ex * 4 * ns[li]), dtype))
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
    return scratch_shapes
