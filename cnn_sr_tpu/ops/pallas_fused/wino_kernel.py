"""Winograd/parity-domain kernel branches (trace-time helpers).

Called from ``kernel._fused_tail_single``'s layer loop with explicit
refs/statics — the bodies are the round-3 measured formulations
unchanged (docs/BENCHMARKS.md "Winograd kernel mode"):

* k == 32: direct QUAD-parity all-phase — 4 raw-tap dots on one rank-3
  (H/2, W, 4k == 128) image, no transform (packing alone pays at k=32);
* k == 64: j-PAIRED dots with the col transform FOLDED INTO THE WEIGHTS
  (2 dots (M, 128) @ (128, 2n) per pa — no V stage, no rolls);
* k == 128: 16 unpaired position dots at full MXU K-fill;
* exit: half-res parity all-phase mm over the dx'-packed parity image.

Reference math being accelerated: layer_uber_kernel.cl:59-95 (f==3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .rules import _WINO_AT, _WINO_BT, _WINO_TRG


def wino_layer(src, w_ref, b_ref, act_ref, *, f, k, n, tr_l, tc_l,
               last_cons, cons_quad, exit_fp, act_dt, dtype,
               trg=_WINO_TRG, quad_group=1, skip=frozenset()):
    """One parity-domain middle layer (Winograd family at f==3, direct
    QUAD dots at f==5).

    ``src`` holds parity planes (2, H/2, W/2p, 2k) — plane = row parity,
    lane group = col parity (f==3, k == 64/128) — or the rank-3 quad
    image (H/2, W_in, 4k) at f==3/k==32 and every f==5 layer; every tap
    d[2i+a, 2j+b] is a contiguous (rows, TC, k) slice. f==3 factored
    transform: per BᵀdB row-parity pa, 4 single-add row combos R[jb],
    then per col pb one combo V = ±R[j1] ± R[j2]; position dots at full
    MXU K-fill; AᵀMA accumulates incrementally into the 4 parity Y
    accumulators (coeffs 0/±1). Measured −55% vs sep at (128,128),
    −43% at (128,64) per chunk. f==5: 3×3 half-res tap sweep of direct
    quad dots (M, 4k) @ (4k, 4n) — no transform (see _wino_weights).
    ``act_ref`` is the consumer's input ref; ``last_cons`` = the
    consumer is the parity mm exit (dx'-packed store, ``exit_fp``
    col-shifted copies), ``cons_quad`` = the consumer reads the rank-3
    quad image.
    """

    def wtap(a_p, b_p, t0, rows):
        return src[a_p % 2, a_p // 2 + t0 : a_p // 2 + t0
                   + rows, b_p // 2 : b_p // 2 + tc_l,
                   (b_p % 2) * k : (b_p % 2 + 1) * k]

    def emit_ys(ys, t0, rows):
        for pq in range(4):
            val = jnp.maximum(
                ys[pq].reshape(rows, tc_l, n) + b_ref[...],
                0.0).astype(act_dt)
            if "mid_store" in skip:  # triage-only: keep the dots and
                # combine, replace the (possibly dx'-packed) store
                # with a one-element max-store — isolates the wino
                # store/prepack traffic by subtraction
                act_ref[(0,) * (len(act_ref.shape) - 1)
                        + (slice(0, 1),)] = jnp.max(
                    val.astype(jnp.float32)).reshape(1).astype(act_dt)
                continue
            if last_cons:
                # dx'-packed parity image for the mm exit:
                # lane dx'·4n + (2p+q)·n + j, exit_fp col-shifted
                # copies (the f'=fp all-phase prepack)
                wlast = act_ref.shape[1]
                assert wlast + exit_fp - 1 <= tc_l
                for dxp in range(exit_fp):
                    act_ref[
                        t0 : t0 + rows, :,
                        dxp * 4 * n + pq * n
                        : dxp * 4 * n + (pq + 1) * n,
                    ] = val[:, dxp : dxp + wlast]
            elif cons_quad:
                # next layer is a k==32 QUAD consumer: all
                # four parities in the lanes of its rank-3
                # image — lane group (2p + q)·n
                wt = min(tc_l, act_ref.shape[1])
                act_ref[
                    t0 : t0 + rows, 0:wt,
                    pq * n : (pq + 1) * n,
                ] = val[:, 0:wt]
            else:
                # next wino layer's parity planes: plane =
                # row parity p, lane group = col parity q.
                # Clip to the ref (16-aligned tc can exceed
                # it); unwritten tail cols are garbage that
                # only feeds garbage output columns.
                wt = min(tc_l, act_ref.shape[2])
                act_ref[
                    pq // 2, t0 : t0 + rows, 0:wt,
                    (pq % 2) * n : (pq % 2 + 1) * n,
                ] = val[:, 0:wt]

    if f in (1, 5) or k == 32:
        # ---- QUAD direct parity all-phase (f==3/k==32 and every
        # f==5 layer) ----
        # src is the rank-3 quad image (H/2, W_in, 4k): one 4k-lane
        # read at (row off ro, col off co) delivers ALL FOUR parities
        # of taps (2ro+rp, 2co+cp) — T² raw-tap dots (T = ⌈f/2⌉)
        # against the direct-conv quad weights (no transform stage at
        # all), output col groups = the 4 output parities. Pure
        # packing win: at f=3/k=32, 4·⌈4n/128⌉ M-passes vs sep's 12
        # per tile; at f=5/k=64, 9 dots × 2 K-passes per 512 px vs
        # the all-phase form's 24 (−25%).
        t_g = (f + 1) // 2
        k4 = 4 * k
        # ``quad_group``: taps K-CONCATENATED in groups of this size —
        # one (M, g·4k) dot per group instead of g accumulate dots.
        # The full 9-tap concat measured −52% per chunk at the conv2
        # shape (tools/wino5_probe.py quad1 2.68 vs quad 5.60 us,
        # 2026-08-21): fewer, larger dots schedule better on Mosaic at
        # identical MXU pass counts.
        taps = [(ro, co) for ro in range(t_g) for co in range(t_g)]
        grp = max(1, quad_group)
        for t0 in range(0, tr_l, trg):
            rows = min(trg, tr_l - t0)
            mrow = rows * tc_l
            s_all = None
            for g0 in range(0, len(taps), grp):
                gtaps = taps[g0 : g0 + grp]
                ops = [
                    src[t0 + ro : t0 + ro + rows,
                        co : co + tc_l, 0:k4]
                    .reshape(mrow, k4).astype(dtype)
                    for ro, co in gtaps
                ]
                r_op = (ops[0] if len(ops) == 1
                        else jnp.concatenate(ops, axis=1))
                mdot = jax.lax.dot_general(
                    r_op,
                    w_ref[g0 * k4 : (g0 + len(gtaps)) * k4],
                    dimension_numbers=(((1,), (0,)),
                                       ((), ())),
                    preferred_element_type=jnp.float32)
                s_all = (mdot if s_all is None
                         else s_all + mdot)
            emit_ys([s_all[:, pq * n : (pq + 1) * n]
                     for pq in range(4)], t0, rows)
        return

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
        for t0 in range(0, tr_l, trg):
            rows = min(trg, tr_l - t0)
            mrow = rows * tc_l

            def tpair(i_p, jp, *, t0=t0, rows=rows, mrow=mrow):
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
        return

    # ---- unpaired k==128 path: 16 position dots ----
    # AᵀMA accumulation is FACTORED per pa: zq[q] = Σ_pb AT[q,pb]·M_pb
    # first (4 f32 adds), then ys[2p+q] += AT[p,pa]·zq[q] (Σ nz_pa·2 =
    # 12 adds over the 4 pa) — 28 full-width accumulate adds per group
    # vs the direct form's 36 (the per-(pos, pq) coefficient walk).
    # Same coefficients, same f32 precision, fewer VPU passes; the RGB
    # budget pinned this branch (L5) at ~3x its wino-charged floor
    # with the in-register transform the named cause.
    for t0 in range(0, tr_l, trg):
        rows = min(trg, tr_l - t0)
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
            zq = [None, None]
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
                for q in range(2):
                    c = _WINO_AT[q][pb]
                    if c != 0:
                        t = mdot if c > 0 else -mdot
                        zq[q] = (t if zq[q] is None
                                 else zq[q] + t)
            for p in range(2):
                c = _WINO_AT[p][pa]
                if c == 0:
                    continue
                for q in range(2):
                    t = zq[q] if c > 0 else -zq[q]
                    pq = 2 * p + q
                    ys[pq] = (t if ys[pq] is None
                              else ys[pq] + t)
        emit_ys(ys, t0, rows)


def parity_entry_store(act_ref, s_ref, v, *, n, r0, m, w_half, act_dt,
                       quad=False):
    """Parity-split store for a wino consumer: rows/cols de-interleave
    into (row-parity plane, col-parity lane group) — f32 scratch + four
    stride-2 quadrant loads (measured ~free vs the flat store: 9.28 vs
    9.94 us/chunk, tools/winograd_probe.py `repack`). Chunk starts are
    even (chunk_rows and every emit boundary are even when f is odd and
    oh is even — both gated). ``s_ref``: the producer's 128-lane f32
    parity-split scratch; ``act_ref``: the consumer's input ref;
    ``quad``: the consumer reads the rank-3 quad image (4n lane
    groups) instead of rank-4 parity planes."""
    if quad:
        # quad entry: all four parities into the lane groups of the
        # consumer's rank-3 quad image — 128-lane scratch (value in
        # the lower n lanes when n < 128) + two-stride quadrant reads
        s_ref[0:m, :, 0:n] = v.astype(jnp.float32)
        for p_r in range(2):
            for q_c in range(2):
                act_ref[
                    r0 // 2 : r0 // 2 + m // 2, 0:w_half,
                    (2 * p_r + q_c) * n
                    : (2 * p_r + q_c + 1) * n,
                ] = s_ref[p_r : m : 2, q_c :: 2][
                    :, :, 0:n].astype(act_dt)
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
                act_ref[
                    p_r, r0 // 2 : r0 // 2 + m // 2,
                    0:w_half, q_c * n : (q_c + 1) * n,
                ] = s_ref[p_r : m : 2, q_c :: 2][
                    :, :, 0:64].astype(act_dt)
        return
    s_ref[0:m] = v.astype(jnp.float32)
    for p_r in range(2):
        for q_c in range(2):
            act_ref[
                p_r, r0 // 2 : r0 // 2 + m // 2, 0:w_half,
                q_c * n : (q_c + 1) * n,
            ] = s_ref[p_r : m : 2, q_c :: 2].astype(act_dt)


def _xt_extract(accb, tw2, xt):
    """MXU transpose-extract for the exit combine (``xt`` modes).

    The per-(channel, parity) masked lane reductions are a lane→dense-2D
    relayout the VPU pays per element (measured 1.0 of the flagship's
    4.6 ms — tools/flagship_stages.py last_extr, 2026-08-21). Instead,
    ONE dot contracts the w2 SUBLANE dim against an identity selection
    (w2, tw2): out (m, m4, tw2) carries the parity/channel lanes in
    SUBLANES and the output columns in LANES, so every out-plane store
    becomes a plain sublane slice. The selection has exactly one
    nonzero per output column, so the contraction sums a single term:

    * xt=1: f32 dot at Precision.HIGHEST (exact; Mosaic multi-pass),
    * xt=2: ``jnp.swapaxes`` (Mosaic's own relayout, for A/B),
    * xt=3: hi/lo bf16 split — two bf16 selection dots reconstruct the
      f32 value to ~2⁻¹⁶ relative (hi carries the top 8 mantissa bits
      exactly through the one-term contraction, lo the next 8).
    """
    m_r, w2, m4 = accb.shape
    if xt == 2:
        return jnp.swapaxes(accb, 1, 2)
    ri = jax.lax.broadcasted_iota(jnp.int32, (w2, tw2), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w2, tw2), 1)
    dn = (((1,), (0,)), ((), ()))
    if xt == 3:
        eyew = (ri == ci).astype(jnp.bfloat16)
        hi = accb.astype(jnp.bfloat16)
        lo = (accb - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (jax.lax.dot_general(
                    hi, eyew, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    lo, eyew, dimension_numbers=dn,
                    preferred_element_type=jnp.float32))
    return jax.lax.dot_general(
        accb, (ri == ci).astype(jnp.float32), dimension_numbers=dn,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def wino_mm_exit(src, w_ref, b_ref, z_ref, out_refs, *, k, n, fp, trh,
                 ohh, ch, tile_w, skip=frozenset(), noz=False,
                 raw=False, xt=0, up=False):
    """Parity-domain all-phase exit (wino_mm last layer).

    ``src``: (H/2, W/2, fp·4k) dx'-packed parity image; ``w_ref`` the
    (fp·4k, fp·4m) _wino_mm_weights layout (``fp`` = ⌈f/2⌉ half-res
    phases: 2 at f==3, 3 at f==5). Z lanes are dy'·4m + (2p+q)·m + j;
    combine sums the fp dy' phase slices, adds bias ONCE post-combine
    (the (m,) bias broadcasts over the 4 parity lanes — adding per Z dot
    would double-count it), and lands half-res parity out blocks one XLA
    transpose recombines in the wrapper. Linear (no ReLU): reference
    layer L, ConfigBasedDataPipeline.cpp:66. ``trh`` = input half-res
    rows, ``ohh`` = tile_h // 2 output half-rows, ``ch`` = chunk rows.

    ``up`` (UN-PACKED exit, ``wino_exit_up``): ``src`` is the plain
    rank-3 QUAD image (H/2, W/2 + fp − 1, 4k) — the producer stores ONE
    copy (the same plain quad store L4 pays, measured free) instead of
    the fp dx'-shifted lane copies (measured 0.89 ms/frame on RGB L5 —
    the ``L5_store`` skip-key marginal, docs/BENCHMARKS.md 2026-08-21).
    The dx' structure moves into the CONSUMER's reads: Z accumulates fp
    K-slice dots (M, 4k) @ w_ref[dxp·4k:(dxp+1)·4k] with the operand
    col-shifted by dxp — the _wino_mm_weights K layout is dx'-major, so
    the SAME packed weight serves both forms, and the total K-block
    pass count is identical (fp · 4k/128 == (fp·4k)/128). The shifted
    sublane reads are the quad tap-sweep pattern the f==5 branch
    already ships.
    """
    w2 = z_ref.shape[1] if up else src.shape[1]
    m4 = 4 * n
    kf = fp * 4 * k
    lane = None
    if noz:
        # ---- no-Z variant: dot straight into registers, combine via
        # VALUE row/lane slices ---- each chunk dots (m_r + fp − 1)
        # input rows once (fp−1-row overlap with the next chunk, ~6%
        # recompute at ch=32) and the dy' phase combine slices the
        # VALUE: rows dyp..dyp+m_r (sublane slice) at lanes
        # dyp·4m..(dyp+1)·4m — no Z scratch, no 128-lane-padded Z
        # store/read roundtrip, identical K-pass count. The sep-dots
        # lesson ("accumulate in values, skip the scratch") applied to
        # the exit.
        for c0 in range(0, ohh, ch):
            ce = min(c0 + ch, ohh)
            m_r = ce - c0
            rows = m_r + fp - 1
            val = jnp.dot(
                src[c0 : c0 + rows, 0:w2, 0:kf]
                .reshape(rows * w2, kf),
                w_ref[...],
                preferred_element_type=jnp.float32,
            ).reshape(rows, w2, fp * m4)
            accz = val[0:m_r, :, 0:m4]
            for dyp in range(1, fp):
                accz = accz + val[dyp : dyp + m_r, :,
                                  dyp * m4 : (dyp + 1) * m4]
            if lane is None or lane.shape[0] != m_r:
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (m_r, w2, m4), 2)
            for cc in range(n):
                for pq in range(4):
                    v = jnp.sum(
                        jnp.where(lane == pq * n + cc, accz, 0.0),
                        axis=-1) + b_ref[cc]
                    out_refs[cc][pq // 2, pq % 2, c0:ce, :] = (
                        v[:, 0 : tile_w // 2])
        return
    assert not (up and noz), "wino_exit_up requires the Z-based exit"
    for c0 in range(0, trh, ch):
        ce = min(c0 + ch, trh)
        if "last_dot" in skip:  # triage-only: input-dependent Z fill
            z_ref[c0:ce] = jnp.broadcast_to(
                src[c0:c0 + 1, 0:1, 0:1].astype(z_ref.dtype)
                .reshape(1, 1, 1), (ce - c0, w2, fp * m4))
            continue
        if up:
            # un-packed exit: fp accumulated K-slice dots, operand
            # col-shifted by dx' (see the docstring)
            acc = None
            for dxp in range(fp):
                mdot = jnp.dot(
                    src[c0:ce, dxp : dxp + w2, 0 : 4 * k]
                    .reshape((ce - c0) * w2, 4 * k),
                    w_ref[dxp * 4 * k : (dxp + 1) * 4 * k],
                    preferred_element_type=jnp.float32,
                )
                acc = mdot if acc is None else acc + mdot
            z_ref[c0:ce] = acc.reshape(
                ce - c0, w2, fp * m4).astype(z_ref.dtype)
            continue
        z_ref[c0:ce] = jnp.dot(
            src[c0:ce, 0:w2, 0:kf]
            .reshape((ce - c0) * w2, kf),
            w_ref[...],
            preferred_element_type=jnp.float32,
        ).reshape(ce - c0, w2, fp * m4).astype(z_ref.dtype)
    if "last_combine" in skip:  # triage-only: skip combine + out store
        return
    for c0 in range(0, ohh, ch):
        ce = min(c0 + ch, ohh)
        m_r = ce - c0
        accz = z_ref[c0:ce, :, 0:m4].astype(jnp.float32)
        for dyp in range(1, fp):
            accz = accz + z_ref[
                c0 + dyp : ce + dyp, :, dyp * m4 : (dyp + 1) * m4
            ].astype(jnp.float32)
        if "last_extract" in skip:  # triage-only: keep the dy' Z
            # accumulation, skip the per-(channel, parity) masked
            # extraction + out stores (accz kept alive via a max-store)
            out_refs[0][0, 0, c0:ce, :] = jnp.broadcast_to(
                jnp.max(accz).reshape(1, 1), (m_r, out_refs[0].shape[3]))
            continue
        if raw:  # checked before xt: raw's single 3D lane-packed out
            # ref is incompatible with the xt path's 4-index parity
            # stores (entry.py also forces xt=0 whenever raw/noz is set)
            # lane-packed raw store: the combined Z lanes (pq·m + cc)
            # land densely in ONE half-res out ref (bias tiled over the
            # 4 parity lane groups, added once — post dy' combine); the
            # per-(channel, parity) extraction moves to XLA, where a
            # plane slice is a 2-MB copy instead of 4·m full-width
            # masked lane reductions per chunk on the VPU
            bt = jnp.tile(b_ref[...], 4)
            out_refs[0][c0:ce, :, 0:m4] = (
                accz[:, 0 : tile_w // 2] + bt)
            continue
        if xt:
            # ---- MXU transpose-extract (see _xt_extract): bias is
            # still added ONCE post-combine, broadcast over the 4
            # parity lane groups; every store is a sublane slice ----
            accb = accz + jnp.tile(b_ref[...], 4)
            t = _xt_extract(accb, tile_w // 2, xt)
            for cc in range(n):
                for pq in range(4):
                    out_refs[cc][pq // 2, pq % 2, c0:ce, :] = (
                        t[:, pq * n + cc, 0 : tile_w // 2])
            continue
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
