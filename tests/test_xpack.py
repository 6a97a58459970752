"""Packed-row (xpack) kernel mode: math + parity tests.

xpack packs G=4 consecutive activation rows per 128-lane group
(``cnn_sr_tpu/ops/pallas_fused.py`` — ``_xpack_weights`` et al.;
measured rationale in ``tools/xpack_probe2.py``). The first tests here
validate the banded-weight construction and the chunked dot/store
indexing in PURE NUMPY against the loop oracle
(``tests/oracles.py:conv_forward`` — the reference kernel's formula,
layer_uber_kernel.cl:59-95), before any Pallas machinery runs.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from cnn_sr_tpu.ops import pallas_fused as pf

import oracles

G = pf._XPACK_G
F = 3


def pack_rows(act: np.ndarray) -> np.ndarray:
    """(H, W, k) → (⌈H/G⌉, W, (G+F−1)·k): X[g, x, p·k+c] =
    act[G·g+p, x, c]; rows past H stay zero (the kernel leaves them
    garbage — valid outputs never read them, zeros make that checkable
    here)."""
    h, w, k = act.shape
    gh = -(-h // G)
    slots = G + F - 1
    out = np.zeros((gh, w, slots * k), act.dtype)
    for g in range(gh):
        for p in range(slots):
            y = G * g + p
            if y < h:
                out[g, :, p * k : (p + 1) * k] = act[y]
    return out


def xpack_layer_numpy(xp: np.ndarray, w: np.ndarray, b: np.ndarray,
                      relu: bool, oh: int, ow: int) -> np.ndarray:
    """Run one xpack layer exactly as the kernel will — per-(j, dx)
    dots against ``_xpack_weights`` slices — and return the PACKED
    output (⌈oh/G⌉, ow, G·n) with lanes (q·n + cn)."""
    f, _, k, n = w.shape
    pj = pf._xpack_pj(n)
    nj = G // pj
    slots = pj + f - 1
    wb = np.asarray(pf._xpack_weights(jnp.asarray(w), jnp.float32))
    gh = -(-oh // G)
    out = np.zeros((gh, ow, G * n), np.float32)
    for j in range(nj):
        l0 = j * pj * k
        acc = np.zeros((gh, ow, pj * n), np.float32)
        for dx in range(f):
            opnd = xp[:gh, dx : dx + ow, l0 : l0 + slots * k]
            wblk = wb[dx * slots * k : (dx + 1) * slots * k]
            acc = acc + opnd @ wblk
        acc = acc + np.tile(b, pj)
        if relu:
            acc = np.maximum(acc, 0.0)
        out[:, :, j * pj * n : (j + 1) * pj * n] = acc
    return out


def unpack_rows(xo: np.ndarray, oh: int, n: int) -> np.ndarray:
    """Packed output (gh, ow, G·n) → rows (oh, ow, n)."""
    gh, ow, _ = xo.shape
    out = np.zeros((oh, ow, n), xo.dtype)
    for y in range(oh):
        out[y] = xo[y // G, :, (y % G) * n : (y % G + 1) * n]
    return out


@pytest.mark.parametrize("k,n,oh", [
    (8, 8, 12),    # tiny, ragged-free
    (8, 16, 11),   # ragged oh (gh·G > oh)
    (16, 8, 10),   # n < 8-lane... pj = 4 capped by G
    (8, 32, 9),    # pj = 4
])
def test_xpack_single_layer_matches_oracle(k, n, oh):
    """One packed layer (pack → banded dots → unpack) reproduces the
    loop oracle's conv (layer_uber_kernel.cl:59-95 formula) exactly in
    f64-free f32 — the weight band, slot indexing, and q/lane layout
    are all exercised."""
    rng = np.random.default_rng(7)
    h, w_in = oh + F - 1, 20
    ow = w_in - F + 1
    act = rng.standard_normal((h, w_in, k), np.float32)
    w = rng.standard_normal((F, F, k, n)).astype(np.float32) * 0.3
    b = rng.standard_normal(n).astype(np.float32) * 0.1

    ref = oracles.conv_forward_vec(act, w, b, relu=True)
    xp = pack_rows(act)
    got = unpack_rows(xpack_layer_numpy(xp, w, b, True, oh, ow),
                      oh, n)[:, :ow]
    np.testing.assert_allclose(got, ref[:oh], rtol=1e-5, atol=1e-5)


def test_xpack_two_layer_chain_matches_oracle():
    """Chained packed layers with the producer→consumer store pattern
    (direct 128-lane block + boundary row-shifted block) match two
    oracle convs — validates that packed output lanes (q·n+c) feed the
    next layer's slot lanes (p·k+c) with only the two static copies
    the kernel performs."""
    rng = np.random.default_rng(3)
    k, n1, n2 = 8, 16, 8
    h, w_in = 15, 18
    act = rng.standard_normal((h, w_in, k), np.float32)
    w1 = rng.standard_normal((F, F, k, n1)).astype(np.float32) * 0.3
    b1 = rng.standard_normal(n1).astype(np.float32) * 0.1
    w2 = rng.standard_normal((F, F, n1, n2)).astype(np.float32) * 0.3
    b2 = rng.standard_normal(n2).astype(np.float32) * 0.1

    a1 = oracles.conv_forward_vec(act, w1, b1, relu=True)
    ref = oracles.conv_forward_vec(a1, w2, b2, relu=True)

    oh1, ow1 = h - F + 1, w_in - F + 1
    oh2, ow2 = oh1 - F + 1, ow1 - F + 1
    y1 = xpack_layer_numpy(pack_rows(act), w1, b1, True, oh1, ow1)

    # producer→consumer store: main slots are a direct lane copy of the
    # packed output; boundary slots p ∈ {G, G+1} of group g are the
    # first (f−1)·n lanes of group g+1
    gh1 = y1.shape[0]
    x2 = np.zeros((gh1, ow1, (G + F - 1) * n1), np.float32)
    x2[:, :, : G * n1] = y1
    x2[: gh1 - 1, :, G * n1 : (G + F - 1) * n1] = y1[1:, :, : (F - 1) * n1]

    got = unpack_rows(xpack_layer_numpy(x2, w2, b2, True, oh2, ow2),
                      oh2, n2)[:, :ow2]
    np.testing.assert_allclose(got, ref[:oh2], rtol=1e-4, atol=1e-4)


# ---- fused-kernel parity (interpret mode) ----

import jax.numpy as jnp  # noqa: E402

from cnn_sr_tpu.models import forward  # noqa: E402
from cnn_sr_tpu.ops.pallas_fused import fused_forward  # noqa: E402


def _params(rng, specs):
    return [
        {
            "w": jnp.asarray(
                rng.standard_normal((f, f, k, n)).astype(np.float32)
                * 0.1),
            "b": jnp.asarray(
                rng.standard_normal((n,)).astype(np.float32) * 0.05),
        }
        for (f, k, n) in specs
    ]


@pytest.mark.parametrize("h,w", [(44, 150), (57, 131)])
def test_xpack_kernel_matches_xla_3layer(h, w):
    """Folded f==1 entry (group-reshape store) + one packed middle +
    packed last layer with masked (q, cn) extraction — vs the XLA
    path, exact in f32."""
    rng = np.random.default_rng(0)
    params = _params(rng, [(3, 1, 8), (3, 8, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, h, w, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128,
                      dtype=jnp.float32, xpack=True)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_xpack_kernel_rgb_stack_bf16_and_f32():
    """RGB-shaped mini stack (3 in/out channels, n covering all three
    production pj classes 4/2/1) across ragged group tails."""
    rng = np.random.default_rng(1)
    params = _params(rng, [(3, 3, 8), (3, 8, 16), (3, 16, 32),
                           (3, 32, 3)])
    x = jnp.asarray(rng.standard_normal((1, 45, 140, 3))
                    .astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128,
                      dtype=jnp.float32, xpack=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    yb = fused_forward(params, x, tile_h=16, tile_w=128, xpack=True)
    assert float(jnp.abs(yb - y_ref).max()) < 0.05


def test_xpack_kernel_plane_entry():
    """Raw-plane first layer storing straight into the packed ref
    (per-row slab targets (g, p) instead of f₂ dx-copies)."""
    rng = np.random.default_rng(2)
    params = _params(rng, [(3, 1, 8), (3, 8, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 44, 150, 1))
                    .astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128,
                      dtype=jnp.float32, xpack=True, plane_input=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_xpack_ineligible_stacks_fall_back():
    """xpack=True on a non-f3 tail (flagship shape) must quietly keep
    the default machinery — identical output to xpack=False."""
    rng = np.random.default_rng(3)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 44, 150, 1))
                    .astype(np.float32))
    y0 = fused_forward(params, x, tile_h=16, tile_w=128,
                       dtype=jnp.float32)
    y1 = fused_forward(params, x, tile_h=16, tile_w=128,
                       dtype=jnp.float32, xpack=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
