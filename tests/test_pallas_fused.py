"""Pallas fused-forward kernel tests (interpret mode on CPU): must match
the XLA path exactly across tile geometries, including odd image sizes
and the 9-5-5 flagship shape class.

Slow lane: interpret-mode Pallas walks dominate the suite (~5 min for
this file alone), so the default ``pytest tests/`` run skips it — run
``pytest tests/ -m ""`` (or ``-m slow``) for the full lane. Fast-lane
kernel coverage remains via tests/test_api.py's fused-path tests, which
drive ``fused_forward`` end-to-end at small shapes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnn_sr_tpu.models import forward
from cnn_sr_tpu.ops.pallas_fused import fused_forward

pytestmark = pytest.mark.slow


def _params(rng, specs):
    return [
        {
            "w": jnp.asarray(rng.standard_normal((f, f, k, n)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.standard_normal((n,)).astype(np.float32) * 0.05),
        }
        for (f, k, n) in specs
    ]


@pytest.mark.parametrize("h,w", [(60, 150), (97, 131)])
def test_fused_matches_xla_3layer(h, w):
    rng = np.random.default_rng(0)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, h, w, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    # bf16 streaming path: ~1e-3 scale error acceptable
    yb = fused_forward(params, x, tile_h=16, tile_w=128)
    assert float(jnp.abs(yb - y_ref).max()) < 0.05


def test_fused_matches_xla_4layer():
    rng = np.random.default_rng(1)
    params = _params(rng, [(5, 1, 8), (3, 8, 8), (3, 8, 16), (3, 16, 1)])
    x = jnp.asarray(rng.standard_normal((1, 40, 140, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_fused_batch_dim():
    rng = np.random.default_rng(2)
    params = _params(rng, [(3, 1, 8), (3, 8, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((2, 40, 135, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_fallback_paths():
    rng = np.random.default_rng(3)
    # RGB input (C=3) → falls back to XLA
    params = _params(rng, [(3, 3, 4), (3, 4, 3)])
    x = jnp.asarray(rng.standard_normal((1, 30, 30, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_forward(params, x)), np.asarray(forward(params, x)),
        rtol=1e-5, atol=1e-5,
    )
    # tiny image → falls back
    params = _params(rng, [(9, 1, 4), (5, 4, 1)])
    x = jnp.asarray(rng.standard_normal((1, 18, 18, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_forward(params, x)), np.asarray(forward(params, x)),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("pipe", [True, False])
def test_fused_multichunk_rolling_z(pipe):
    """Tile heights that push the mid layers past one Z chunk
    (_MM_CHUNK_ROWS=32) exercise BOTH chunk schedules: pipe=True the
    pipelined lagged combine (full-height Z, the shallow-stack
    default), pipe=False the rolling window — full chunks, a short
    tail chunk, and the f−1-row roll between them (still the shipped
    path for deep non-sep f>1 middles, so it must keep coverage)."""
    rng = np.random.default_rng(5)
    # f=5 mids at tile_h=64: ph=72 → chunks 32+32+8 (rolling: f−1=4-row
    # rolls; piped: combine lags one chunk + a drain)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 90, 150, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=64, tile_w=128, dtype=jnp.float32,
                      pipe_combine=pipe)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_fused_deep_rolling_z_multichunk():
    """Deep-stack rolling coverage: a 5-layer model whose f=5 middles
    are neither sep-eligible (f≠3) nor pipelined (deep stack, not the
    last layer) runs the rolling-window schedule with multiple chunks
    per layer (chunk_rows=8 < ph) — the only remaining production
    path through the roll, pinned here since shallow stacks default
    to the pipelined schedule and deep f=3 stacks to sep."""
    rng = np.random.default_rng(11)
    params = _params(
        rng, [(3, 1, 8), (5, 8, 8), (5, 8, 8), (5, 8, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 60, 140, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=32, tile_w=128, dtype=jnp.float32,
                      chunk_rows=8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_deep_stack_multichunk():
    """waifu2x-mini: 7 layers of f=3 at tile_h=48 → per-layer ph runs
    60..50, i.e. 32-row chunk + tails of varying length, per layer."""
    rng = np.random.default_rng(6)
    params = _params(
        rng,
        [(3, 3, 8), (3, 8, 8), (3, 8, 8), (3, 8, 8),
         (3, 8, 16), (3, 16, 16), (3, 16, 3)],
    )
    x = jnp.asarray(rng.standard_normal((1, 70, 140, 3)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=48, tile_w=128, dtype=jnp.float32)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)


def test_fused_packed_dx_last_layer_groups():
    """The packed-dx last layer (producer stores P column-shifted lane
    groups; each FMA covers P dx-taps) across its group shapes:
    k=32 → P=4, Q=2 (the flagship class: a full group + a ragged one
    whose pad taps must stay zero); k=8, f=3 → P=3, Q=1 (P·k < 128
    lanes); f=1 last layer → packing disabled (P=1)."""
    rng = np.random.default_rng(7)
    # flagship class: k=32 last layer, f=5 → P=4, Q=2
    params = _params(rng, [(9, 1, 8), (5, 8, 32), (5, 32, 1)])
    x = jnp.asarray(rng.standard_normal((1, 70, 150, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    # f=3, k=8 → P=3: 24 live lanes, no ragged group
    params = _params(rng, [(5, 1, 8), (3, 8, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 50, 140, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_forward(params, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32)),
        np.asarray(forward(params, x)), rtol=1e-5, atol=1e-5,
    )
    # f=1 last layer: pack_last must degenerate to 1
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (1, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 60, 140, 1)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fused_forward(params, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32)),
        np.asarray(forward(params, x)), rtol=1e-5, atol=1e-5,
    )


def test_fused_int8_input():
    """input_int8: the patch array stores quantized int8 (x·127) with
    the 1/127 scale folded into the folded first layer's weights. On
    unit-scale inputs the quantization sits under the bf16 envelope;
    f32 mode must ignore the flag entirely."""
    rng = np.random.default_rng(8)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    x = jnp.asarray((rng.random((1, 70, 150, 1)) - 0.45).astype(np.float32))
    y_ref = forward(params, x)
    yi = fused_forward(params, x, tile_h=16, tile_w=128, input_int8=True)
    assert float(jnp.abs(yi - y_ref).max()) < 0.02
    # f32 ignores the knob: exact parity
    yf = fused_forward(params, x, tile_h=16, tile_w=128,
                       dtype=jnp.float32, input_int8=True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # out-of-range inputs clip — callers must pre-normalize; the bf16
    # path without the knob stays unclipped
    xb = x * 3.0
    yi2 = fused_forward(params, xb, tile_h=16, tile_w=128, input_int8=True)
    assert float(jnp.abs(yi2 - forward(params, xb)).max()) > 0.02  # clipped
    yb2 = fused_forward(params, xb, tile_h=16, tile_w=128)
    assert float(jnp.abs(yb2 - forward(params, xb)).max()) < 0.15


def test_fused_rgb_output():
    """n_out=3 (RGB model family) through the fused kernel."""
    rng = np.random.default_rng(4)
    params = _params(rng, [(3, 3, 8), (3, 8, 8), (3, 8, 16), (3, 16, 3)])
    x = jnp.asarray(rng.standard_normal((1, 40, 140, 3)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-4)
    yb = fused_forward(params, x, tile_h=16, tile_w=128)
    assert float(jnp.abs(yb - y_ref).max()) < 0.1


@pytest.mark.parametrize("D", [3, 4, 5])
def test_fused_dy_packed_first_layer(D):
    """dy-packed folded first layer (``l1_dstep``): the patch array
    packs only D dy-taps in lanes and the kernel covers all f1 taps
    with G row-shifted dots — must match the full-pack path exactly,
    including the G·D > f1 zero-tail case (D=4 → 12 > 9) and int8."""
    rng = np.random.default_rng(7)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    x = jnp.asarray((rng.random((1, 70, 150, 1)) - 0.45).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                      l1_dstep=D)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    yi = fused_forward(params, x, tile_h=16, tile_w=128, input_int8=True,
                       l1_dstep=D)
    assert float(jnp.abs(yi - y_ref).max()) < 0.02


def test_fused_dy_packed_rgb_deep():
    """dy-pack on a deep RGB stack: f1=9, c1=3 → full pack is 243
    channels (256 padded window lanes); D=4 fits 108 in one 128-lane
    group. Exact parity in f32."""
    rng = np.random.default_rng(8)
    params = _params(rng, [(9, 3, 8), (3, 8, 8), (3, 8, 8), (3, 8, 8),
                           (3, 8, 8), (3, 8, 8), (5, 8, 3)])
    x = jnp.asarray(rng.standard_normal((1, 60, 140, 3)).astype(np.float32))
    y_ref = forward(params, x)
    for D in (3, 4):
        y = fused_forward(params, x, tile_h=16, tile_w=128,
                          dtype=jnp.float32, l1_dstep=D)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)


def test_fused_deep_channel_last_layer_unpacked():
    """k>64 last layers on the VPU path (mm_last=False): no dx-pack
    fits (pack_last degenerates to 1 with f>1), so the tap loop runs
    unpacked at full 128-lane utilization. Kept as the fallback path —
    mm_last routes these shapes through the MXU by default. Covers RGB
    (n_out=3) and luma (n_out=1)."""
    rng = np.random.default_rng(9)
    # RGB deep stack: last layer k=72 > 64 → pack_last=1
    params = _params(rng, [(3, 3, 8), (3, 8, 72), (3, 72, 3)])
    x = jnp.asarray(rng.standard_normal((1, 60, 140, 3)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=48, tile_w=128, dtype=jnp.float32,
                      mm_last=False)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)
    # bf16 streaming stays within the usual envelope
    yb = fused_forward(params, x, tile_h=48, tile_w=128, mm_last=False)
    assert float(jnp.abs(yb - y_ref).max()) < 0.15
    # luma n_out=1, f=5 last layer with k=80
    params = _params(rng, [(9, 1, 8), (5, 8, 80), (5, 80, 1)])
    x = jnp.asarray(rng.standard_normal((1, 70, 150, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                      mm_last=False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-4)


def test_fused_mm_last_layer():
    """MXU last layer (mm_last): the last layer runs through the
    all-phase matmul with a producer-prepacked operand; phase-combine +
    channel extraction happen in one masked lane reduction. Auto-on for
    k>64/f>1 last layers; must match the VPU path exactly. Covers the
    production 7-layer-RGB shape class (deep, n_out=3), a shallow
    n_out=1 case, and chunk boundaries (tile_h > chunk_rows)."""
    rng = np.random.default_rng(21)
    cases = [
        # deep RGB-like stack, k=72 last (prepack-eligible: f·k=216)
        ([(3, 3, 8), (3, 8, 8), (3, 8, 16), (3, 16, 16), (3, 16, 72),
          (3, 72, 3)], (1, 60, 140, 3), 48),
        # shallow luma, k=80 f=5 last
        ([(9, 1, 8), (5, 8, 80), (5, 80, 1)], (1, 70, 150, 1), 16),
    ]
    for specs, xshape, th in cases:
        params = _params(rng, specs)
        x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
        y_ref = forward(params, x)
        y_vpu = fused_forward(params, x, tile_h=th, tile_w=128,
                              dtype=jnp.float32, mm_last=False)
        y_mm = fused_forward(params, x, tile_h=th, tile_w=128,
                             dtype=jnp.float32, mm_last=True)
        assert y_mm.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_ref),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(y_mm), np.asarray(y_vpu),
                                   rtol=1e-5, atol=1e-5)
        # rolling-schedule mm_last (pipe_combine=False): same combine
        # through the rolled Z window rather than the lagged full-height
        # one — the non-default schedule must not drift
        y_roll = fused_forward(params, x, tile_h=th, tile_w=128,
                               dtype=jnp.float32, mm_last=True,
                               pipe_combine=False)
        np.testing.assert_allclose(np.asarray(y_roll), np.asarray(y_mm),
                                   rtol=1e-6, atol=1e-6)


def test_prepadded_build_skips_tail_pad():
    """The folded-conv1 path must build the patch array AT the kernel's
    padded window geometry — _window_pads drifting from the kernel's own
    geometry block would silently reintroduce a quarter-GB pad copy per
    frame. `_LAST_TAIL_PADDED` records the traced decision."""
    from cnn_sr_tpu.ops import pallas_fused as pf

    rng = np.random.default_rng(11)
    cases = [
        # (specs, x shape, dtype kwargs) — flagship-like (dy-pack fires
        # at f1=9), 9-1-5-like (f2=1 middle), RGB-like 3ch, f32 mode
        ([(9, 1, 16), (5, 16, 8), (5, 8, 1)], (1, 70, 90, 1), {}),
        ([(9, 1, 16), (1, 16, 8), (5, 8, 1)], (1, 66, 82, 1), {}),
        ([(3, 3, 8), (3, 8, 8), (3, 8, 3)], (1, 40, 52, 3), {}),
        ([(5, 1, 8), (3, 8, 8), (3, 8, 1)], (1, 44, 60, 1),
         {"dtype": jnp.float32}),
    ]
    for specs, xshape, kw in cases:
        params = _params(rng, specs)
        x = jnp.asarray(rng.standard_normal(xshape).astype(np.float32))
        y_ref = forward(params, x)
        pf._fused_tail_single.clear_cache()  # force a trace
        y = fused_forward(params, x, tile_h=16, tile_w=128, **kw)
        assert not pf._LAST_TAIL_PADDED, (specs, kw)
        tol = 0.05 if kw.get("dtype") is not jnp.float32 else 2e-5
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), atol=tol)


@pytest.mark.parametrize("h,w,l1_rows", [
    # both sizes at the production R=16 and historical R=8 geometries;
    # the taller 24/32 sweep candidates at one size only (interpret-mode
    # runtime — each case costs ~25 s on the CPU mesh)
    (44, 150, 8), (57, 131, 8),
    (44, 150, 16), (57, 131, 16),
    (57, 131, 24), (57, 131, 32),
    # tight R=6/S=14 geometry (K = f1*S = 126 <= 128: one MXU K-block,
    # halved main-dot charge — ROADMAP (a)); sublane-unaligned slab
    # reads are exact in interpret mode, Mosaic lowering is probed on
    # chip (tools/l1_probe.py)
    (44, 150, 6), (57, 131, 6),
])
def test_fused_plane_input_matches_xla(h, w, l1_rows):
    """Raw-plane first layer (in-kernel im2col via lane rolls + MXU
    identity-dot transpose — ops/pallas_fused/plane.py): must
    match the XLA path like the patch-array build it replaces, at the
    four swept block heights (R=16/S=24 is the compiled-TPU default;
    R=8/S=16 the historical geometry; R=24/S=32 and R=32/S=40 are the
    taller sweep candidates — per-row roll traffic scales (R+8)/R).
    At tile_h=16, oh=24: one full + one PARTIAL R=16 group per tile
    (production flagship tiles hit the partial branch every tile:
    oh=72, 72 % 16 == 8). The int8 leg runs tile_h=32 — the smallest
    height the int8-plane sublane-alignment gate admits, so it actually
    exercises the int8 PLANE path rather than silently falling back to
    the folded patch build."""
    rng = np.random.default_rng(7)
    params = _params(rng, [(9, 1, 8), (5, 8, 8), (5, 8, 1)])
    # int8 path precondition: inputs in [-1, 1] (mean-subtracted
    # normalized luma always is; values outside clip)
    x = jnp.asarray(rng.uniform(-1, 1, (1, h, w, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                      plane_input=True, l1_rows=l1_rows)
    assert y.shape == y_ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # int8 plane quantization: 1/254 input step through the conv stack
    yi = fused_forward(params, x, tile_h=32, tile_w=128, input_int8=True,
                       plane_input=True, l1_rows=l1_rows)
    assert float(jnp.abs(yi - y_ref).max()) < 0.06


def test_fused_plane_input_rgb_and_915():
    rng = np.random.default_rng(8)
    # RGB first layer (c=3, f=3) + prepacked middle + RGB output
    params = _params(rng, [(3, 3, 8), (3, 8, 8), (3, 8, 3)])
    x = jnp.asarray(rng.standard_normal((1, 40, 140, 3)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=8, tile_w=128, dtype=jnp.float32,
                      plane_input=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
    # 9-1-5 shape class: f=1 MIDDLE layer downstream of the plane conv
    params = _params(rng, [(9, 1, 8), (1, 8, 8), (5, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 44, 140, 1)).astype(np.float32))
    y_ref = forward(params, x)
    y = fused_forward(params, x, tile_h=8, tile_w=128, dtype=jnp.float32,
                      plane_input=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_plane_build_skips_tail_pad():
    """Plane-mode analog of test_prepadded_build_skips_tail_pad:
    fused_forward must pre-pad the raw plane at exactly the kernel's
    window geometry (`_plane_pads` drifting from the kernel's plane
    block would silently add a per-frame pad copy)."""
    from cnn_sr_tpu.ops import pallas_fused as pf

    rng = np.random.default_rng(12)
    cases = [
        ([(9, 1, 16), (5, 16, 8), (5, 8, 1)], (1, 70, 90, 1), {}),
        ([(9, 1, 16), (1, 16, 8), (5, 8, 1)], (1, 66, 82, 1), {}),
        ([(3, 3, 8), (3, 8, 8), (3, 8, 3)], (1, 40, 52, 3),
         {"dtype": jnp.float32}),
    ]
    for specs, xshape, kw in cases:
        params = _params(rng, specs)
        x = jnp.asarray(rng.uniform(-1, 1, xshape).astype(np.float32))
        y_ref = forward(params, x)
        pf._fused_tail_single.clear_cache()  # force a trace
        y = fused_forward(params, x, tile_h=8, tile_w=128,
                          plane_input=True, input_int8=True, **kw)
        assert not pf._LAST_TAIL_PADDED, (specs, kw)
        tol = 0.06 if kw.get("dtype") is not jnp.float32 else 2e-5
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), atol=tol)


def test_fused_deep_prepack_threshold():
    """Deep stacks (>4 layers) gate producer-side prepacking at
    f·k ≤ prepack_max_deep; raising the threshold must not change the
    result (same math, patch build replaced by producer stores). k=48
    middles sit just past the shipped 128-lane gate (f·k=144)."""
    rng = np.random.default_rng(13)
    params = _params(
        rng, [(3, 1, 8), (3, 8, 48), (3, 48, 48), (3, 48, 8), (3, 8, 1)])
    x = jnp.asarray(rng.standard_normal((1, 44, 140, 1)).astype(np.float32))
    y_ref = forward(params, x)
    for thr in (128, 144):
        y = fused_forward(params, x, tile_h=16, tile_w=128,
                          dtype=jnp.float32, prepack_max_deep=thr)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)


def test_fused_sep_dots_layers():
    """Separated-phase dots (sep_max_n): small-n middle layers run f
    row-shifted per-dy-slab dots instead of the all-phase Z + combine —
    same math, so results must match the XLA forward at every
    threshold, on both a shallow 3-layer stack and a deep RGB-style
    stack (mm_last last layer), with multi-chunk tiles."""
    rng = np.random.default_rng(21)
    # shallow: one 16->8 middle layer (sep at thr>=8)
    p3 = _params(rng, [(3, 1, 16), (3, 16, 8), (3, 8, 1)])
    x3 = jnp.asarray(rng.standard_normal((1, 40, 136, 1)).astype(np.float32))
    y_ref3 = forward(p3, x3)
    # deep: mixed-n middles so thresholds carve different sep sets
    pd = _params(rng, [(3, 3, 8), (3, 8, 16), (3, 16, 16),
                       (3, 16, 32), (3, 32, 3)])
    xd = jnp.asarray(rng.standard_normal((1, 44, 140, 3)).astype(np.float32))
    y_refd = forward(pd, xd)
    for thr in (8, 16, 128):
        y3 = fused_forward(p3, x3, tile_h=16, tile_w=128,
                           dtype=jnp.float32, sep_max_n=thr)
        np.testing.assert_allclose(
            np.asarray(y3), np.asarray(y_ref3), rtol=1e-5, atol=1e-5)
        yd = fused_forward(pd, xd, tile_h=16, tile_w=128,
                           dtype=jnp.float32, sep_max_n=thr)
        np.testing.assert_allclose(
            np.asarray(yd), np.asarray(y_refd), rtol=1e-5, atol=1e-5)
        yp = fused_forward(pd, xd, tile_h=16, tile_w=128,
                           dtype=jnp.float32, sep_max_n=thr,
                           plane_input=True)
        np.testing.assert_allclose(
            np.asarray(yp), np.asarray(y_refd), rtol=1e-5, atol=1e-5)
    # auto default (sep_max_n=None → 128): every f==3 middle separated
    ya = fused_forward(pd, xd, tile_h=16, tile_w=128, dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ya), np.asarray(y_refd), rtol=1e-5, atol=1e-5)
    # f≠3 middles are ineligible regardless of threshold: a 5x5-middle
    # stack under the default must match too (all-phase path retained)
    p5 = _params(rng, [(5, 1, 16), (5, 16, 8), (5, 8, 1)])
    x5 = jnp.asarray(rng.standard_normal((1, 48, 144, 1)).astype(np.float32))
    y5 = fused_forward(p5, x5, tile_h=16, tile_w=128, dtype=jnp.float32,
                       sep_max_n=128)
    np.testing.assert_allclose(
        np.asarray(y5), np.asarray(forward(p5, x5)), rtol=1e-5, atol=1e-5)
