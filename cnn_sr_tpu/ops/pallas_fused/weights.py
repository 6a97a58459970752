"""Weight preparation + XLA-side input builds for the fused kernel.

Layout transforms from the reference's HWIO ``(f, f, k, n)`` weights
(layer_uber_kernel.cl:3-12) into the kernel's per-mode operand layouts,
plus the int8 plane quantization and the im2col patch-array build.
Numpy oracles in tests/test_winograd_prep.py pin every layout against
the reference conv formula.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from .rules import _WINO_AT, _WINO_BT, _plane_rows

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
    if f in (1, 5) or k == 32:
        # QUAD direct layout (T²·4k, 4n), T = ⌈f/2⌉ slab-grid side
        # (T=1/1 slab at f==1 — the block-diagonal 1×1 case —
        # T=2/4 slabs at f==3, T=3/9 slabs at f==5): slab ro·T + co,
        # row (2rp + cp)·k + c ↦ tap (i, j) = (2ro+rp, 2co+cp), col
        # (2p + q)·n + nn = w[i−p, j−q, c, nn] (zero outside the f×f
        # footprint). No Winograd transform — folding BOTH transforms
        # degenerates to the direct conv in quad-parity form: at
        # k == 32 the packing (4k == 128 K lanes, 4 output parities in
        # N) is the whole win, and at f == 5 the 3×3 half-res tap
        # sweep with 4k ≤ 256 K-lanes beats both the all-phase form
        # (−25% K-passes at k=64/n=32) and F(2x2,5x5)'s non-unit
        # transform coefficients (oracle: tests/test_winograd_prep).
        t_g = (f + 1) // 2
        wf = jnp.asarray(w, jnp.float32)
        wq = jnp.zeros((t_g * t_g, 4, k, 4, n), jnp.float32)
        for ro in range(t_g):
            for co in range(t_g):
                for rp in range(2):
                    for cp in range(2):
                        i, j = 2 * ro + rp, 2 * co + cp
                        for p_ in range(2):
                            for q_ in range(2):
                                dy, dx = i - p_, j - q_
                                if 0 <= dy < f and 0 <= dx < f:
                                    wq = wq.at[
                                        ro * t_g + co, 2 * rp + cp, :,
                                        2 * p_ + q_, :,
                                    ].set(wf[dy, dx])
        return wq.reshape(t_g * t_g * 4 * k, 4 * n).astype(dtype)
    g_m = jnp.asarray(
        [[1, 0, 0], [.5, .5, .5], [.5, -.5, .5], [0, 0, 1]], jnp.float32)
    u = jnp.einsum("ai,bj,ijkn->abkn", g_m, g_m,
                   jnp.asarray(w, jnp.float32))
    if k == 64:
        at = jnp.asarray(_WINO_AT, jnp.float32)
        bt = jnp.asarray(_WINO_BT, jnp.float32)
        # (pa, j, c, q, n): Σ_pb AT[q,pb]·BT[pb,j]·U[pa,pb,c,nn]
        w_j = jnp.einsum("qb,bj,abkn->ajkqn", at, bt, u)
        return w_j.reshape(16 * k, 2 * n).astype(dtype)
    return u.reshape(16 * k, n).astype(dtype)


def _wino_mm_weights(w, dtype):
    """(f,f,k,m) last-layer HWIO (f ∈ {3, 5}) → the parity-domain
    all-phase layout (fp·4k, fp·4m), fp = ⌈f/2⌉: the f×f full-res conv
    becomes an f'=fp conv over the half-res 4k-lane parity image. Row
    dx'·4k + (2a+b)·k + c, column
    dy'·4m + (2p+q)·m + j holds w[2·dy' + a − p, 2·dx' + b − q, c, j]
    (zero outside the f×f footprint): (a, b) the tap's row/col parity,
    (p, q) the output pixel's parity, (dy', dx') the half-res offsets.

    BIAS TRAP (kernel-mode contract): the layer's (m,) bias is NOT
    reshaped here — the kernel's parity output lanes are (2p+q)·m + j
    (4m wide, produced as two dy'-phase Z halves that get summed), so
    the bias must be broadcast/tiled to the 4 parity lanes and added
    ONCE, after the dy' combine — adding it per Z dot would double-
    count it (mirrors how the shipping mm_last adds bias post-
    reduction)."""
    f, _, k, m = w.shape
    if f not in (3, 5):
        # the footprint guard below only reaches dy,dx in [0, 2fp):
        # other f would silently lose taps
        raise ValueError(f"wino_mm requires f in (3, 5), got f={f}")
    fp = (f + 1) // 2  # half-res offsets dy', dx' ∈ [0, fp)
    wf = jnp.asarray(w, jnp.float32)
    wp = jnp.zeros((fp, 4, k, fp, 4, m), jnp.float32)
    for dyp in range(fp):
        for dxp in range(fp):
            for a in range(2):
                for b in range(2):
                    for p in range(2):
                        for q in range(2):
                            dy = 2 * dyp + a - p
                            dx = 2 * dxp + b - q
                            if 0 <= dy < f and 0 <= dx < f:
                                wp = wp.at[dxp, 2 * a + b, :,
                                           dyp, 2 * p + q, :].set(wf[dy, dx])
    return wp.reshape(fp * 4 * k, fp * 4 * m).astype(dtype)

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
