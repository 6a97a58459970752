"""Winograd F(2x2,3x3) groundwork: weight-prep + eligibility oracles.

The round-2 winograd probe (tools/winograd_probe.py) measured the
F(2x2,3x3) position-matmul formulation 55% cheaper per chunk than the
shipping sep dots at the RGB (k,n)=(128,128) shape, and the weight-prep
helpers landed in ``cnn_sr_tpu/ops/pallas_fused/`` (``_wino_layers``,
``_wino_weights``, ``_wino_mm_weights``) ahead of the kernel mode.
These tests pin that math in PURE NUMPY against the reference kernel's
conv formula (layer_uber_kernel.cl:59-95 via
``tests/oracles.py:conv_forward_vec``) so the kernel-side work can
build on proven layouts:

* the F(2x2,3x3) identity itself with the module's B^T/A^T constants,
* ``_wino_weights`` (16k, n) pos-slab layout driving a full tiled conv,
* ``_wino_mm_weights`` (8k, 8m): the parity-domain ALL-PHASE last
  layer — a 3x3 full-res conv expressed as an f'=2 all-phase dot over
  the half-res 4k-lane parity image, row-phase combined like the
  shipping mm_last,
* ``_wino_layers`` eligibility (k==128 gate, consumer chain, mm_last
  exit, min_li producer gate).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from cnn_sr_tpu.ops import pallas_fused as pf

import oracles

RNG = np.random.default_rng(20260820)

# canonical F(2x2,3x3) transform matrices (Lavin & Gray 2015, eq. 5)
BT = np.array([[1, 0, -1, 0],
               [0, 1, 1, 0],
               [0, -1, 1, 0],
               [0, 1, 0, -1]], np.float64)
G = np.array([[1, 0, 0],
              [.5, .5, .5],
              [.5, -.5, .5],
              [0, 0, 1]], np.float64)
AT = np.array([[1, 1, 1, 0],
               [0, 1, -1, -1]], np.float64)


def parity_pack(y: np.ndarray) -> np.ndarray:
    """(H, W, k) → (H/2, W/2, 4k) parity image: P[I, J, (2a+b)·k + c]
    = y[2I+a, 2J+b, c] — the producer-side layout the kernel mode will
    store (row parity a, col parity b; H, W even)."""
    h, w, k = y.shape
    p = np.zeros((h // 2, w // 2, 4 * k), y.dtype)
    for a in range(2):
        for b in range(2):
            p[:, :, (2 * a + b) * k:(2 * a + b + 1) * k] = y[a::2, b::2]
    return p


def test_wino_constants_satisfy_f2x2_3x3_identity():
    """The module's B^T/A^T constants + the G inside _wino_weights
    compute the exact F(2x2,3x3) algorithm: A^T[(B^T d B) ⊙ (G g G^T)]A
    equals the direct 2x2-of-3x3 valid correlation for random scalars."""
    assert np.array_equal(np.asarray(pf._WINO_BT, np.float64), BT)
    assert np.array_equal(np.asarray(pf._WINO_AT, np.float64), AT)
    d = RNG.standard_normal((4, 4))
    g = RNG.standard_normal((3, 3))
    direct = np.array([[np.sum(d[p:p + 3, q:q + 3] * g)
                        for q in range(2)] for p in range(2)])
    wino = AT @ ((BT @ d @ BT.T) * (G @ g @ G.T)) @ AT.T
    np.testing.assert_allclose(wino, direct, atol=1e-12)


@pytest.mark.parametrize("k,n", [(5, 4), (8, 16)])
def test_wino_weights_tiled_conv_matches_oracle(k, n):
    """A full stride-2-tiled F(2x2,3x3) pass using the (16k, n) layout
    from ``_wino_weights`` — V built with the module's B^T, M as 16
    per-position (tiles, k) @ (k, n) dots against the pos-slab rows,
    Y via incremental A^T M A — reproduces the reference conv + bias +
    ReLU (conv_forward_vec) on a random activation block."""
    h, w_cols = 10, 12
    act = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((3, 3, k, n)) * 0.3).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)

    u = np.asarray(pf._wino_weights(jnp.asarray(w), jnp.float32))
    assert u.shape == (16 * k, n)

    bt = np.asarray(pf._WINO_BT, np.float64)
    at = np.asarray(pf._WINO_AT, np.float64)
    oh, ow = h - 2, w_cols - 2
    out = np.zeros((oh, ow, n), np.float64)
    for ti in range(oh // 2):
        for tj in range(ow // 2):
            d = act[2 * ti:2 * ti + 4, 2 * tj:2 * tj + 4].astype(np.float64)
            v = np.einsum("ai,bj,ijc->abc", bt, bt, d)
            m = np.einsum(
                "abc,abcn->abn", v, u.reshape(4, 4, k, n).astype(np.float64))
            out[2 * ti:2 * ti + 2, 2 * tj:2 * tj + 2] = np.einsum(
                "pa,qb,abn->pqn", at, at, m)
    out = np.maximum(out + b, 0.0).astype(np.float32)

    ref = oracles.conv_forward_vec(act, w, b, relu=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_wino_weights_quad_k32_tiled_conv_matches_oracle():
    """k == 32 QUAD direct layout: 4 raw-tap reads per tile — lane
    (2rp+cp)·k + c of read (ro, co) holds d[2ro+rp, 2co+cp, c] — dotted
    against the 4 slabs and summed reproduce the conv directly (no
    Winograd transform; output col groups are the 4 output parities)."""
    k, n = 32, 8
    h, w_cols = 10, 12
    act = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((3, 3, k, n)) * 0.3).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)

    wp = np.asarray(pf._wino_weights(jnp.asarray(w), jnp.float32))
    assert wp.shape == (16 * k, 4 * n)
    slabs = wp.reshape(4, 4 * k, 4 * n).astype(np.float64)

    oh, ow = h - 2, w_cols - 2
    out = np.zeros((oh, ow, n), np.float64)
    for ti in range(oh // 2):
        for tj in range(ow // 2):
            d = act[2 * ti:2 * ti + 4, 2 * tj:2 * tj + 4].astype(np.float64)
            s = np.zeros(4 * n)
            for ro in range(2):
                for co in range(2):
                    r_op = np.zeros(4 * k)
                    for rp in range(2):
                        for cp in range(2):
                            r_op[(2 * rp + cp) * k:(2 * rp + cp + 1) * k] = \
                                d[2 * ro + rp, 2 * co + cp]
                    s = s + r_op @ slabs[ro * 2 + co]
            for p in range(2):
                for q in range(2):
                    out[2 * ti + p, 2 * tj + q] = \
                        s[(2 * p + q) * n:(2 * p + q + 1) * n]
    out = np.maximum(out + b, 0.0).astype(np.float32)

    ref = oracles.conv_forward_vec(act, w, b, relu=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_wino_weights_paired_k64_tiled_conv_matches_oracle():
    """k == 64 j-paired layout (col transform folded into the
    weights): a full stride-2-tiled pass — row combos rs[pa][j] via
    the module's Bᵀ, 8 dots of [rs(2jp)|rs(2jp+1)] (tiles, 128)
    against the (pa·2+jp) slabs, row-phase Y via AT[p][pa] only (the
    col phase q lives in the slab's N columns) — reproduces the
    reference conv + bias + ReLU on a random activation block."""
    k, n = 64, 8
    h, w_cols = 10, 12
    act = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((3, 3, k, n)) * 0.3).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)

    wp = np.asarray(pf._wino_weights(jnp.asarray(w), jnp.float32))
    assert wp.shape == (16 * k, 2 * n)
    slabs = wp.reshape(8, 2 * k, 2 * n).astype(np.float64)

    bt = np.asarray(pf._WINO_BT, np.float64)
    at = np.asarray(pf._WINO_AT, np.float64)
    oh, ow = h - 2, w_cols - 2
    out = np.zeros((oh, ow, n), np.float64)
    for ti in range(oh // 2):
        for tj in range(ow // 2):
            d = act[2 * ti:2 * ti + 4, 2 * tj:2 * tj + 4].astype(np.float64)
            y_par = np.zeros((2, 2, n))
            for pa in range(4):
                s_pa = np.zeros(2 * n)
                for jp in range(2):
                    # paired operand: [rs(2jp) | rs(2jp+1)] over c
                    rs_a = sum(bt[pa][i] * d[i, 2 * jp] for i in range(4))
                    rs_b = sum(bt[pa][i] * d[i, 2 * jp + 1]
                               for i in range(4))
                    opnd = np.concatenate([rs_a, rs_b])  # (2k,)
                    s_pa = s_pa + opnd @ slabs[pa * 2 + jp]
                for p in range(2):
                    for q in range(2):
                        y_par[p, q] += at[p][pa] * s_pa[q * n:(q + 1) * n]
            out[2 * ti:2 * ti + 2, 2 * tj:2 * tj + 2] = y_par
    out = np.maximum(out + b, 0.0).astype(np.float32)

    ref = oracles.conv_forward_vec(act, w, b, relu=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)


@pytest.mark.parametrize("k,m", [(6, 3), (4, 16)])
def test_wino_mm_weights_parity_allphase_matches_oracle(k, m):
    """The (8k, 8m) parity all-phase layout from ``_wino_mm_weights``
    computes the 3x3 full-res conv at half resolution: Z[I] = the two
    dx'-shifted parity-row dots, output = the dy'-row-phase combine
    Z[I][dy'=0] + Z[I+1][dy'=1] (the shipping mm_last convention), with
    lanes (2p+q)·m + j holding output pixel (2I+p, 2J+q, j)."""
    h, w_cols = 12, 14
    y = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((3, 3, k, m)) * 0.3).astype(np.float32)

    wp = np.asarray(pf._wino_mm_weights(jnp.asarray(w), jnp.float32))
    assert wp.shape == (8 * k, 8 * m)

    pimg = parity_pack(y).astype(np.float64)          # (H/2, W/2, 4k)
    hh, hw = pimg.shape[:2]
    # all-phase operand: A[I, J, dx'·4k + lane] = P[I, J + dx', lane]
    a_op = np.concatenate([pimg[:, :hw - 1], pimg[:, 1:]], axis=-1)
    z = a_op @ wp.astype(np.float64)                  # (H/2, W/2-1, 8m)
    out_par = z[:hh - 1, :, :4 * m] + z[1:, :, 4 * m:]

    ref = oracles.conv_forward_vec(
        y, w, np.zeros(m, np.float32), relu=False).astype(np.float64)
    oh, ow = ref.shape[:2]
    got = np.zeros_like(ref)
    for p in range(2):
        for q in range(2):
            got[p::2, q::2] = out_par[
                :oh // 2, :ow // 2, (2 * p + q) * m:(2 * p + q + 1) * m]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_prepare_tail_weights_routes_wino_layouts():
    """``_prepare_tail_weights(..., wino_prep=..., wino_mm=True)``
    emits the (16k, n) pos-slab layout for wino middle layers and the
    (8k, 8m) parity all-phase layout for the last layer, leaving
    non-wino layers and all biases untouched."""
    def layer(f, k, n):
        return {"w": RNG.standard_normal((f, f, k, n)).astype(np.float32),
                "b": RNG.standard_normal(n).astype(np.float32)}

    params = [layer(3, 4, 6), layer(3, 6, 6), layer(3, 6, 2)]
    wbs = pf._prepare_tail_weights(
        params, jnp.float32, mm_last=True,
        wino_prep=frozenset({1}), wino_mm=True)
    assert len(wbs) == 6
    # layer 0: untouched by wino → default middle all-phase (f·k, f·n)
    assert wbs[0].shape == (3 * 4, 3 * 6)
    # layer 1: wino pos slabs; layer 2: parity all-phase exit
    np.testing.assert_array_equal(
        np.asarray(wbs[2]),
        np.asarray(pf._wino_weights(jnp.asarray(params[1]["w"]),
                                    jnp.float32)))
    np.testing.assert_array_equal(
        np.asarray(wbs[4]),
        np.asarray(pf._wino_mm_weights(jnp.asarray(params[2]["w"]),
                                       jnp.float32)))
    for li in range(3):
        np.testing.assert_array_equal(np.asarray(wbs[2 * li + 1]),
                                      params[li]["b"])
        assert wbs[2 * li + 1].dtype == jnp.float32
    # without the wino flags the same call keeps the shipping layouts
    base = pf._prepare_tail_weights(params, jnp.float32, mm_last=True)
    assert base[2].shape == (3 * 6, 3 * 6)      # middle all-phase
    assert base[4].shape == (3 * 6, 3 * 2)      # mm_last all-phase


RGB7 = [(3, 3, 32), (3, 32, 32), (3, 32, 64), (3, 64, 64),
        (3, 64, 128), (3, 128, 128), (3, 128, 3)]


def test_wino_layers_eligibility():
    """k ∈ {32, 64, 128} gate, the mm_last f==3/n≤16 exit, consumer
    chaining, and the min_li producer gate — on the 7-layer RGB dims
    and synthetic chains."""
    # production 7-layer RGB: ALL five middles chain into the mm_last
    # 128→3 exit (k=32 quad, k=64 j-paired, k=128 unpaired)
    assert pf._wino_layers(RGB7, 7, mm_last=True) == \
        frozenset({1, 2, 3, 4, 5})
    # no mm_last exit → nothing chains
    assert pf._wino_layers(RGB7, 7, mm_last=False) == frozenset()
    # wide or large-f last layer blocks the exit
    wide = RGB7[:-1] + [(3, 128, 32)]
    assert pf._wino_layers(wide, 7, mm_last=True) == frozenset()
    f5 = RGB7[:-1] + [(5, 128, 3)]
    assert pf._wino_layers(f5, 7, mm_last=True) == frozenset()
    # chains propagate back through consecutive k==128 f==3 layers and
    # stop at a k!=128 producer or the min_li gate
    chain = [(3, 1, 128), (3, 128, 128), (3, 128, 128),
             (3, 128, 128), (3, 128, 3)]
    assert pf._wino_layers(chain, 5, mm_last=True) == frozenset({1, 2, 3})
    assert pf._wino_layers(chain, 5, mm_last=True, min_li=2) == \
        frozenset({2, 3})
    # an f==5 middle breaks the chain below it
    broken = [(3, 1, 128), (3, 128, 128), (5, 128, 128),
              (3, 128, 128), (3, 128, 3)]
    assert pf._wino_layers(broken, 5, mm_last=True) == frozenset({3})


@pytest.mark.parametrize("k,n", [(32, 8), (64, 32)])
def test_wino_weights_quad_f5_tiled_conv_matches_oracle(k, n):
    """f == 5 QUAD direct layout (9·4k, 4n): the 3×3 half-res tap
    sweep — lane (2rp+cp)·k + c of read (ro, co) holds
    d[2(t+ro)+rp, 2(u+co)+cp, c] — dotted against the 9 slabs and
    summed reproduces the 5×5 conv directly (no transform; output col
    groups are the 4 output parities). The f==5 arm of the round-4
    flagship chain (VERDICT r3 #1, layer_uber_kernel.cl:59-95 at
    F_SPATIAL_SIZE=5)."""
    h, w_cols = 14, 16
    act = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((5, 5, k, n)) * 0.3).astype(np.float32)
    b = RNG.standard_normal(n).astype(np.float32)

    wp = np.asarray(pf._wino_weights(jnp.asarray(w), jnp.float32))
    assert wp.shape == (9 * 4 * k, 4 * n)
    slabs = wp.reshape(9, 4 * k, 4 * n).astype(np.float64)

    oh, ow = h - 4, w_cols - 4
    out = np.zeros((oh, ow, n), np.float64)
    for ti in range(oh // 2):
        for tj in range(ow // 2):
            d = act[2 * ti:2 * ti + 6, 2 * tj:2 * tj + 6]
            s = np.zeros(4 * n)
            for ro in range(3):
                for co in range(3):
                    r_op = np.zeros(4 * k)
                    for rp in range(2):
                        for cp in range(2):
                            r_op[(2 * rp + cp) * k:(2 * rp + cp + 1) * k] = \
                                d[2 * ro + rp, 2 * co + cp]
                    s = s + r_op @ slabs[ro * 3 + co]
            for p in range(2):
                for q in range(2):
                    out[2 * ti + p, 2 * tj + q] = \
                        s[(2 * p + q) * n:(2 * p + q + 1) * n]
    out = np.maximum(out + b, 0.0).astype(np.float32)

    ref = oracles.conv_forward_vec(act, w, b, relu=True)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_wino_mm_weights_f5_parity_allphase_matches_oracle():
    """The (12k, 12m) f==5 parity all-phase exit layout: Z[I] = three
    dx'-shifted parity-row dots, output = the 3-phase dy' row combine
    Σ_dy' Z[I+dy'][dy' slice] — the f'=3 generalization of the f==3
    exit convention (lanes (2p+q)·m + j hold output (2I+p, 2J+q, j))."""
    k, m = 8, 1
    h, w_cols = 16, 18
    y = RNG.standard_normal((h, w_cols, k)).astype(np.float32)
    w = (RNG.standard_normal((5, 5, k, m)) * 0.3).astype(np.float32)

    wp = np.asarray(pf._wino_mm_weights(jnp.asarray(w), jnp.float32))
    assert wp.shape == (12 * k, 12 * m)

    pimg = parity_pack(y).astype(np.float64)          # (H/2, W/2, 4k)
    hh, hw = pimg.shape[:2]
    # all-phase operand: A[I, J, dx'·4k + lane] = P[I, J + dx', lane]
    a_op = np.concatenate(
        [pimg[:, dxp:hw - 2 + dxp] for dxp in range(3)], axis=-1)
    z = a_op @ wp.astype(np.float64)                  # (H/2, W/2-2, 12m)
    m4 = 4 * m
    out_par = (z[:hh - 2, :, 0:m4] + z[1:hh - 1, :, m4:2 * m4]
               + z[2:, :, 2 * m4:3 * m4])

    ref = oracles.conv_forward_vec(
        y, w, np.zeros(m, np.float32), relu=False).astype(np.float64)
    oh, ow = ref.shape[:2]
    got = np.zeros_like(ref)
    for p in range(2):
        for q in range(2):
            got[p::2, q::2] = out_par[
                :oh // 2, :ow // 2, (2 * p + q) * m:(2 * p + q + 1) * m]
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_wino_layers_eligibility_f5():
    """The ``f5`` gate: f==5 middles (k ∈ {32, 64}) + the f==5 parity
    exit chain ONLY when f5=True; f5=False (the shipping default until
    the on-chip A/B) leaves every f==5 dims set empty and the f==3
    chains untouched."""
    flagship = ((1, 81, 64), (5, 64, 32), (5, 32, 1))
    assert pf._wino_layers(flagship, 3, mm_last=False, f5=True) == \
        frozenset({1})
    assert pf._wino_layers(flagship, 3, mm_last=False) == frozenset()
    # n1=32 variant (quad-128 conv2)
    f915b = ((1, 81, 32), (5, 32, 8), (5, 8, 1))
    assert pf._wino_layers(f915b, 3, mm_last=False, f5=True) == \
        frozenset({1})
    # f==5 k=128 stays ineligible (4 K-tiles per tap — not built)
    big = ((1, 81, 128), (5, 128, 32), (5, 32, 1))
    assert pf._wino_layers(big, 3, mm_last=False, f5=True) == frozenset()
    # f5 exit requires n_out <= 16 like the f3 exit
    wide = ((1, 81, 64), (5, 64, 32), (5, 32, 32))
    assert pf._wino_layers(wide, 3, mm_last=False, f5=True) == frozenset()
    # the f==3 RGB chain is unchanged under the flag
    assert pf._wino_layers(RGB7, 7, mm_last=True, f5=True) == \
        frozenset({1, 2, 3, 4, 5})
    assert pf._wino_layers(RGB7, 7, mm_last=False, f5=True) == frozenset()
