"""Numpy oracles re-deriving the reference kernels' math with explicit loops.

These play the role of the reference's out-of-process oracle scripts
(LayerTest_script.R, LayerDeltasTest_script.py, BackpropagationTest_script.py,
LumaTests_script.py — SURVEY.md §4): independent, loop-level
implementations of the device math, written directly from the indexing
formulas documented in the .cl kernels — NOT from the production JAX
code — so a bug in layout/gradient plumbing cannot hide in both.

Conventions: images are (h, w, c) float32; weights are (f, f, k, n)
(the reference's flat ``[a,b,k,n]``-ordered, n-fastest layout reshaped —
layer_uber_kernel.cl:3-12).
"""

from __future__ import annotations

import numpy as np


def conv_forward(inp, w, b, relu):
    """VALID stride-1 cross-correlation + bias (+ReLU).

    layer_uber_kernel.cl:59-95: out[j,i,n] = Σ_{dy,dx,k}
    inp[j+dy, i+dx, k] · w[dy,dx,k,n] + b[n].
    """
    h, w_in, k = inp.shape
    f, _, _, n = w.shape
    oh, ow = h - f + 1, w_in - f + 1
    out = np.zeros((oh, ow, n), dtype=np.float64)
    for j in range(oh):
        for i in range(ow):
            acc = np.zeros(n, dtype=np.float64)
            for dy in range(f):
                for dx in range(f):
                    for kk in range(k):
                        acc += inp[j + dy, i + dx, kk] * w[dy, dx, kk, :]
            out[j, i, :] = acc + b
    if relu:
        out = np.maximum(out, 0.0)
    return out.astype(np.float32)


def conv_forward_vec(inp, w, b, relu):
    """Vectorized twin of ``conv_forward`` for flagship-scale shapes —
    the SAME formula (layer_uber_kernel.cl:59-95) expressed as numpy
    sliding windows + einsum instead of the quintuple loop, still
    independent of production code. Pinned against the loop version in
    tests/test_model.py::test_vectorized_oracle_matches_loop."""
    f = w.shape[0]
    win = np.lib.stride_tricks.sliding_window_view(
        inp.astype(np.float64), (f, f), axis=(0, 1)
    )  # (oh, ow, k, f, f)
    out = np.einsum("jikyx,yxkn->jin", win, w.astype(np.float64),
                    optimize=True) + b
    if relu:
        out = np.maximum(out, 0.0)
    return out.astype(np.float32)


def swap_luma_vec(original_rgb, new_luma):
    """Vectorized twin of ``swap_luma`` (same swap_luma.cl:19-69 math,
    array-at-once). Pinned against the loop version in tests."""
    h, w = original_rgb.shape[:2]
    lh, lw = new_luma.shape
    pad = (w - lw) // 2
    out = original_rgb[..., :3].astype(np.uint8).copy()
    px = original_rgb[pad:pad + lh, pad:pad + lw, :3].astype(np.float64)
    Y = new_luma.astype(np.float64) * 255.0
    cb = -0.1687 * px[..., 0] - 0.3312 * px[..., 1] + 0.5 * px[..., 2]
    cr = 0.5 * px[..., 0] - 0.4186 * px[..., 1] - 0.0813 * px[..., 2]
    rgb = np.stack(
        [Y + 1.4 * cr, Y - 0.343 * cb - 0.711 * cr, Y + 1.765 * cb], axis=-1)
    out[pad:pad + lh, pad:pad + lw] = np.trunc(
        np.clip(rgb, 0.0, 255.0)).astype(np.uint8)
    return out


def swap_rgb_vec(original_rgb, new_rgb):
    """RGB-family writeback: paste trunc(clip(y*255)) into the center,
    border passthrough (ops/color.py:swap_rgb contract)."""
    h, w = original_rgb.shape[:2]
    lh, lw = new_rgb.shape[:2]
    pad = (w - lw) // 2
    out = original_rgb[..., :3].astype(np.uint8).copy()
    out[pad:pad + lh, pad:pad + lw] = np.trunc(
        np.clip(new_rgb.astype(np.float64) * 255.0, 0.0, 255.0)
    ).astype(np.uint8)
    return out


def last_layer_delta(y, gt):
    """last_layer_delta.cl:40-47: delta = (y − gt_center_crop) · (y > 0).

    ``y``: (oh, ow) net output; ``gt``: (gh, gw) ground truth. The crop
    offset is ``(gw − ow) // 2`` applied to both axes
    (last_layer_delta.cl:30-36)."""
    oh, ow = y.shape
    gh, gw = gt.shape
    pad = (gw - ow) // 2
    crop = gt[pad : pad + oh, pad : pad + ow]
    return ((y - crop) * (y > 0)).astype(np.float32)


def layer_deltas(delta_next, y_cur, w_next):
    """layer_deltas.cl:79-118: delta for the layer below.

    delta_cur[j,i,c] = Σ_{dy,dx,m} w_next[dy,dx,c,m] ·
    delta_next[j−dy, i−dx, m] · (y_cur[j,i,c] > 0), with out-of-range
    next-layer positions contributing 0.
    """
    h, w_dim, c_cnt = y_cur.shape
    f = w_next.shape[0]
    nh, nw, m_cnt = delta_next.shape
    out = np.zeros((h, w_dim, c_cnt), dtype=np.float64)
    for j in range(h):
        for i in range(w_dim):
            for dy in range(f):
                for dx in range(f):
                    jj, ii = j - dy, i - dx
                    if 0 <= jj < nh and 0 <= ii < nw:
                        for m in range(m_cnt):
                            out[j, i, :] += (
                                w_next[dy, dx, :, m] * delta_next[jj, ii, m]
                            )
            out[j, i, :] *= y_cur[j, i, :] > 0
    return out.astype(np.float32)


def backprop_grads(delta, layer_input, f):
    """backpropagate.cl:87-113: weight/bias gradients for one sample.

    grad_w[dy,dx,k,n] = Σ_{row,col} delta[row,col,n] ·
    input[row+dy, col+dx, k];  grad_b[n] = Σ delta[:,:,n].
    """
    oh, ow, n = delta.shape
    _, _, k = layer_input.shape
    gw = np.zeros((f, f, k, n), dtype=np.float64)
    gb = np.zeros(n, dtype=np.float64)
    for row in range(oh):
        for col in range(ow):
            d = delta[row, col, :]
            gb += d
            for dy in range(f):
                for dx in range(f):
                    inp = layer_input[row + dy, col + dx, :]
                    gw[dy, dx, :, :] += np.outer(inp, d)
    return gw.astype(np.float32), gb.astype(np.float32)


def update_params(w, b, gw, gb, prev_dw, prev_db, momentum, weight_decay, lr, bs):
    """update_parameters.cl:17-32. Returns (w', b', prev_dw', prev_db')."""
    delta_w = momentum * prev_dw + lr * gw + weight_decay * w
    delta_b = momentum * prev_db + lr * gb
    return (
        (w - delta_w / bs).astype(np.float32),
        (b - delta_b / bs).astype(np.float32),
        delta_w.astype(np.float32),
        delta_b.astype(np.float32),
    )


def extract_luma(rgba, normalize):
    """extract_luma.cl:17-21."""
    px = rgba[..., :3].astype(np.float64)
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    if normalize:
        luma = luma / 255.0
    return luma.astype(np.float32)


def swap_luma(original_rgb, new_luma):
    """swap_luma.cl:19-69, loop-per-pixel with truncating uint conversion."""
    h, w = original_rgb.shape[:2]
    lh, lw = new_luma.shape
    pad = (w - lw) // 2  # width-derived, as in the kernel (swap_luma.cl:24)
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            px = original_rgb[y, x, :3].astype(np.float64)
            ly, lx = y - pad, x - pad
            if 0 <= ly < lh and 0 <= lx < lw:
                Y = float(new_luma[ly, lx]) * 255.0
                cb = -0.1687 * px[0] - 0.3312 * px[1] + 0.5 * px[2]
                cr = 0.5 * px[0] - 0.4186 * px[1] - 0.0813 * px[2]
                r = Y + 1.4 * cr
                g = Y - 0.343 * cb - 0.711 * cr
                bl = Y + 1.765 * cb
                rgb = np.clip([r, g, bl], 0.0, 255.0)
                out[y, x] = np.trunc(rgb).astype(np.uint8)
            else:
                out[y, x] = px.astype(np.uint8)
    return out
