"""Winograd F(2x2,3x3) KERNEL MODE (``fused_forward(wino=True)``).

The weight-prep math is pinned separately in test_winograd_prep.py;
these tests drive the full kernel mode end-to-end in interpret mode
against the XLA conv forward: parity-split producer store, factored
BᵀdB transform + 16 position dots + incremental AᵀMA, the dx'-packed
parity image feeding the half-res parity all-phase exit, and the XLA
parity recombine. Reference math being accelerated:
/root/reference/src/kernel/layer_uber_kernel.cl:59-95 at f=3.

Eligibility contract (``_wino_layers``): f==3, k==128 exactly, and a
consumer chain reaching an mm-eligible f==3 last layer with n_out<=16.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from cnn_sr_tpu.models import forward  # noqa: E402
from cnn_sr_tpu.ops.pallas_fused import (  # noqa: E402
    _wino_layers,
    fused_forward,
)

pytestmark = pytest.mark.slow  # interpret-mode Pallas: slow lane


def _params(rng, spec):
    return [
        {
            "w": jnp.asarray(
                rng.standard_normal((f, f, k, n)).astype(np.float32) * 0.1
            ),
            "b": jnp.asarray(rng.standard_normal(n).astype(np.float32) * 0.1),
        }
        for f, k, n in spec
    ]


def test_wino_layers_eligibility():
    """k ∈ {32, 64, 128} + f==3 + chain-to-mm-exit, computed back to
    front (k==32 quad, k==64 j-paired, k==128 unpaired dots)."""
    # RGB-like: ALL five middles chain (k=32 quad, k=64 j-paired,
    # k=128 unpaired)
    dims = ((3, 3, 32), (3, 32, 32), (3, 32, 64), (3, 64, 64),
            (3, 64, 128), (3, 128, 128), (3, 128, 3))
    assert _wino_layers(dims, 7, mm_last=True) == \
        frozenset({1, 2, 3, 4, 5})
    # chain: two k==128 layers, both eligible
    dims2 = ((1, 81, 16), (3, 16, 128), (3, 128, 128), (3, 128, 128),
             (3, 128, 2))
    assert _wino_layers(dims2, 5, mm_last=True) == frozenset({2, 3})
    # k==64 chains too now; a k not in {64, 128} breaks the chain
    dims3 = ((1, 81, 128), (3, 128, 64), (3, 64, 128), (3, 128, 128),
             (3, 128, 2))
    assert _wino_layers(dims3, 5, mm_last=True) == frozenset({1, 2, 3})
    dims3b = ((1, 81, 128), (3, 128, 48), (3, 48, 128), (3, 128, 128),
              (3, 128, 2))
    assert _wino_layers(dims3b, 5, mm_last=True) == frozenset({3})
    # no mm exit -> nothing (the parity domain has no other way out)
    assert _wino_layers(dims, 7, mm_last=False) == frozenset()
    # n_out too wide for the masked-reduction exit
    dims4 = ((1, 81, 128), (3, 128, 128), (3, 128, 32))
    assert _wino_layers(dims4, 3, mm_last=True) == frozenset()
    # min_li=2 (plane first layer: its producer can't parity-store)
    dims5 = ((1, 324, 128), (3, 128, 128), (3, 128, 128), (3, 128, 2))
    assert _wino_layers(dims5, 4, mm_last=True) == frozenset({1, 2})
    assert _wino_layers(dims5, 4, mm_last=True, min_li=2) == frozenset({2})


def test_wino_kernel_single_layer_f32():
    """sep producer -> wino layer -> parity mm exit (the production RGB
    boundary structure) matches the XLA forward exactly in f32."""
    rng = np.random.default_rng(7)
    p = _params(rng, [(3, 2, 16), (3, 16, 128), (3, 128, 128), (3, 128, 2)])
    x = jnp.asarray(rng.standard_normal((1, 28, 140, 2)).astype(np.float32))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    # wino=False same config stays on the sep path and matches too
    y0 = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                  dtype=jnp.float32, wino=False))
    np.testing.assert_allclose(y0, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_kernel_chain_multitile():
    """wino->wino parity-plane boundary + a multi-tile (2x3) grid:
    plane stores, halo windows, and the parity recombine all compose."""
    rng = np.random.default_rng(11)
    p = _params(rng, [(3, 1, 16), (3, 16, 128), (3, 128, 128),
                      (3, 128, 128), (3, 128, 2)])
    x = jnp.asarray(rng.standard_normal((1, 48, 280, 1)).astype(np.float32))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_kernel_bf16_and_int8_track_sep():
    """Production wiring (bf16 stream / int8 input): wino must track the
    sep baseline within the stream dtype's own rounding envelope (the
    std-normal input is outside int8's [-1,1] contract, so f32 is not
    the right oracle there — same discipline as the historical dypack
    test)."""
    rng = np.random.default_rng(13)
    p = _params(rng, [(3, 3, 8), (3, 8, 128), (3, 128, 128), (3, 128, 3)])
    x = jnp.asarray((rng.random((1, 30, 140, 3)).astype(np.float32) - 0.5))
    yb0 = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128, wino=False))
    yb1 = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128, wino=True))
    np.testing.assert_allclose(yb1, yb0, rtol=3e-2, atol=3e-2)
    y4a = np.asarray(fused_forward(p, x, tile_h=32, tile_w=128,
                                   input_int8=True, wino=True))
    y4b = np.asarray(fused_forward(p, x, tile_h=32, tile_w=128,
                                   input_int8=True, wino=False))
    np.testing.assert_allclose(y4a, y4b, rtol=3e-2, atol=3e-2)


def test_wino_kernel_plane_first_layer():
    """plane_input=True (the compiled-TPU default) + wino compose; the
    plane first layer's slab stores bypass store_act, so min_li=2 keeps
    a layer-1 wino candidate OFF the parity path there."""
    rng = np.random.default_rng(17)
    p = _params(rng, [(3, 3, 8), (3, 8, 128), (3, 128, 128), (3, 128, 3)])
    x = jnp.asarray((rng.random((1, 30, 140, 3)).astype(np.float32) - 0.5))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True,
                                 plane_input=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_ineligible_configs_fall_through():
    """wino=True on ineligible models is a no-op (identical to off):
    flagship-like f=5 last layer, and k!=128 middles."""
    rng = np.random.default_rng(19)
    # f=5 last: no mm parity exit
    p5 = _params(rng, [(3, 1, 16), (3, 16, 128), (5, 128, 1)])
    x = jnp.asarray(rng.standard_normal((1, 32, 144, 1)).astype(np.float32))
    y_ref = np.asarray(forward(p5, x))
    y = np.asarray(fused_forward(p5, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)
    # k=48 middles: outside the k ∈ {64, 128} gate
    p48 = _params(rng, [(3, 1, 16), (3, 16, 48), (3, 48, 48), (3, 48, 1)])
    y_ref = np.asarray(forward(p48, x))
    y = np.asarray(fused_forward(p48, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_kernel_paired_k64_chain():
    """The k==64 position-paired path, end to end at f32: sep producer
    (n=64 → the row-parity-into-lane-halves entry store), a 64→64 and
    a 64→128 paired wino layer, the 128→128 unpaired layer, and the
    parity mm exit — the production 7-layer RGB boundary structure —
    against the XLA forward, multi-tile."""
    rng = np.random.default_rng(23)
    p = _params(rng, [(3, 2, 16), (3, 16, 64), (3, 64, 64),
                      (3, 64, 128), (3, 128, 128), (3, 128, 2)])
    x = jnp.asarray(rng.standard_normal((1, 44, 280, 2)).astype(np.float32))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_kernel_quad_k32_chain():
    """The k==32 QUAD path end to end at f32: store_act quad entry
    (n=32 producer), quad→quad and quad→rank-4 boundary stores, then
    the j-paired and unpaired layers into the parity exit — the full
    RGB ladder in miniature, multi-tile."""
    rng = np.random.default_rng(29)
    p = _params(rng, [(3, 2, 32), (3, 32, 32), (3, 32, 64),
                      (3, 64, 128), (3, 128, 128), (3, 128, 2)])
    x = jnp.asarray(rng.standard_normal((1, 44, 280, 2)).astype(np.float32))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_kernel_plane_quad_store():
    """plane_input=True with an ELIGIBLE layer 1 (k=32): the plane
    first layer's PERMUTED identity-dot transpose parity-stores the
    quad image directly (col-parity-sorted slab halves), min_li == 1."""
    rng = np.random.default_rng(31)
    p = _params(rng, [(3, 3, 32), (3, 32, 32), (3, 32, 64),
                      (3, 64, 128), (3, 128, 128), (3, 128, 2)])
    x = jnp.asarray((rng.random((1, 44, 280, 3)).astype(np.float32) - 0.5))
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True,
                                 plane_input=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino_pretrained_rgb_psnr_tracks_sep():
    """Quality gate on REAL weights: the trained 7-layer RGB checkpoint
    (the exact config whose 128->128 layer is wino-eligible) run through
    the production bf16 wiring with wino on vs off must agree to >=60 dB
    PSNR on the upscaled output — the same-distribution analog of the
    on-chip parity self-test (bench.py) for this mode."""
    import json as _json

    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import load_parameters_file

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = parse_config(_json.load(open(os.path.join(
        repo, "configs", "waifu2x_7layer_rgb.json"))))
    params, _ = load_parameters_file(
        os.path.join(repo, "pretrained", "waifu2x_7layer_rgb_synthetic.json"),
        cfg.layer_specs())
    params = [{"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])}
              for p in params]
    rng = np.random.default_rng(23)
    rgb = rng.random((64, 160, 3)).astype(np.float32)
    x = jnp.asarray((rgb - rgb.mean(axis=(0, 1)))[None])
    y_ref = np.asarray(fused_forward(params, x, tile_h=16, tile_w=128,
                                     dtype=jnp.float32, wino=False))

    def psnr_vs_ref(y):
        mse = float(np.mean((y - y_ref) ** 2))
        peak = float(np.abs(y_ref).max())
        return 99.0 if mse == 0 else 10 * np.log10(peak ** 2 / mse)

    y0 = np.asarray(fused_forward(params, x, tile_h=16, tile_w=128,
                                  input_int8=True, wino=False))
    y1 = np.asarray(fused_forward(params, x, tile_h=16, tile_w=128,
                                  input_int8=True, wino=True))
    p_sep, p_win = psnr_vs_ref(y0), psnr_vs_ref(y1)
    # wino must not add error beyond the bf16 stream's own envelope:
    # within 1.5 dB of the sep path's PSNR-vs-f32 and >=40 dB absolute
    # (on-chip 1080p measured 48.3 vs 49.0 dB — docs/BENCHMARKS.md)
    assert p_win >= min(p_sep - 1.5, 60.0) and p_win >= 40.0, (
        p_sep, p_win)


def test_wino5_kernel_flagship_chain():
    """The f==5 parity chain (quad-direct conv2 + f'=3 parity exit) on
    flagship-shaped 9-5-5 models matches the XLA forward exactly in
    f32, for both the folded-patch and raw-plane first layers and both
    production k regimes (quad-256 at n1=64, quad-128 at n1=32).
    VERDICT r3 #1; reference math layer_uber_kernel.cl:59-95 at
    F_SPATIAL_SIZE=5."""
    rng = np.random.default_rng(21)
    for n1, n2 in ((64, 32), (32, 8)):
        p = _params(rng, [(9, 1, n1), (5, n1, n2), (5, n2, 1)])
        x = jnp.asarray(
            rng.standard_normal((1, 44, 150, 1)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        for kw in ({"plane_input": False},
                   {"plane_input": True, "l1_rows": 8}):
            y = np.asarray(fused_forward(
                p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                wino=True, wino5=True, **kw))
            np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4,
                                       err_msg=f"n1={n1} {kw}")


def test_wino5_kernel_odd_geometry():
    """Odd H and W (ragged parity domain) through the f==5 chain."""
    rng = np.random.default_rng(23)
    p = _params(rng, [(9, 1, 32), (5, 32, 8), (5, 8, 1)])
    x = jnp.asarray(
        rng.standard_normal((1, 41, 139, 1)).astype(np.float32) * 0.4)
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True, wino5=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino5_interpret_default_keeps_packed_dx():
    """In interpret mode (these tests' backend), ``wino5=None``
    resolves OFF — the f==5 model stays on the packed-dx path with
    identical output. (On compiled TPU the auto default is ON after
    the measured interleaved win; the production default's parity is
    gated on-chip by bench.py and the wino_ab sweep, not here.)"""
    rng = np.random.default_rng(25)
    p = _params(rng, [(9, 1, 32), (5, 32, 8), (5, 8, 1)])
    x = jnp.asarray(
        rng.standard_normal((1, 40, 140, 1)).astype(np.float32) * 0.4)
    y_ref = np.asarray(forward(p, x))
    y = np.asarray(fused_forward(p, x, tile_h=16, tile_w=128,
                                 dtype=jnp.float32, wino=True))
    np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4)


def test_wino5_bf16_int8_track_default():
    """Production wiring (bf16 stream + int8 plane input): the f==5
    chain must track the shipping packed-dx path within the stream
    dtype's rounding envelope (same discipline as the f==3 chain's
    bf16/int8 test)."""
    rng = np.random.default_rng(27)
    p = _params(rng, [(9, 1, 32), (5, 32, 8), (5, 8, 1)])
    x = jnp.asarray(np.clip(
        rng.standard_normal((1, 44, 150, 1)).astype(np.float32) * 0.3,
        -1, 1))
    base = np.asarray(fused_forward(p, x, tile_h=32, tile_w=128,
                                    input_int8=True, plane_input=True,
                                    wino=True))
    y5 = np.asarray(fused_forward(p, x, tile_h=32, tile_w=128,
                                  input_int8=True, plane_input=True,
                                  wino=True, wino5=True))
    assert np.max(np.abs(y5 - base)) < 0.05, np.max(np.abs(y5 - base))


def test_exit_noz_matches_default():
    """The no-Z parity exit (dot into registers + value row/lane-slice
    combine, ``wino_exit_noz``) is f32-exact against both the Z-based
    exit and the XLA forward, on the f==5 and f==3 chains incl. odd
    geometry."""
    rng = np.random.default_rng(31)
    for spec, ch in (([(9, 1, 32), (5, 32, 8), (5, 8, 1)], 1),
                     ([(3, 2, 16), (3, 16, 128), (3, 128, 128),
                       (3, 128, 2)], 2)):
        p = _params(rng, spec)
        x = jnp.asarray(
            rng.standard_normal((1, 43, 141, ch)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        for noz in (False, True):
            y = np.asarray(fused_forward(
                p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                wino=True, wino5=True, wino_exit_noz=noz))
            np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4,
                                       err_msg=f"{spec} noz={noz}")


def test_exit_raw_matches_default():
    """The raw-lane parity exit (``wino_exit_raw``: one lane-packed
    half-res out ref + XLA-side channel/parity extraction) is f32-exact
    against the default exit on both chains incl. odd geometry."""
    rng = np.random.default_rng(33)
    for spec, ch in (([(9, 1, 32), (5, 32, 8), (5, 8, 1)], 1),
                     ([(3, 2, 16), (3, 16, 128), (3, 128, 128),
                       (3, 128, 2)], 2)):
        p = _params(rng, spec)
        x = jnp.asarray(
            rng.standard_normal((1, 43, 141, ch)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        y = np.asarray(fused_forward(
            p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
            wino=True, wino5=True, wino_exit_raw=True))
        np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"{spec}")

def test_exit_xt_matches_default():
    """The MXU transpose-extract exit combine (``wino_exit_xt``) matches
    the default masked-reduction exit on the f==5 and f==3 chains incl.
    odd geometry: xt=1 (HIGHEST selection dot) and xt=2 (swapaxes) are
    f32-exact; xt=3 (hi/lo bf16 split dots) reconstructs to ~2^-16
    relative."""
    rng = np.random.default_rng(37)
    for spec, ch in (([(9, 1, 32), (5, 32, 8), (5, 8, 1)], 1),
                     ([(3, 2, 16), (3, 16, 128), (3, 128, 128),
                       (3, 128, 2)], 2)):
        p = _params(rng, spec)
        x = jnp.asarray(
            rng.standard_normal((1, 43, 141, ch)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        for xt in (1, 2, 3):
            y = np.asarray(fused_forward(
                p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                wino=True, wino5=True, wino_exit_xt=xt))
            tol = 1e-4 if xt != 3 else 3e-4
            np.testing.assert_allclose(y, y_ref, rtol=tol, atol=tol,
                                       err_msg=f"{spec} xt={xt}")



def test_exit_up_matches_default():
    """The UN-PACKED exit (``wino_exit_up``: plain quad producer store
    + fp K-slice dots at col offsets in the exit) is f32-exact against
    the packed default on the f==5 (fp=3), f==3 (fp=2) and 9-1-5
    chains incl. odd geometry, and composes with the xt combine."""
    rng = np.random.default_rng(43)
    for spec, ch in (([(9, 1, 32), (5, 32, 8), (5, 8, 1)], 1),
                     ([(3, 2, 16), (3, 16, 128), (3, 128, 128),
                       (3, 128, 2)], 2),
                     ([(9, 1, 32), (1, 32, 16), (5, 16, 1)], 1)):
        p = _params(rng, spec)
        x = jnp.asarray(
            rng.standard_normal((1, 43, 141, ch)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        for xt in (0, 1):
            y = np.asarray(fused_forward(
                p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                wino=True, wino5=True, wino_exit_up=1, wino_exit_xt=xt))
            np.testing.assert_allclose(y, y_ref, rtol=1e-4, atol=1e-4,
                                       err_msg=f"{spec} up xt={xt}")


def test_wino1_915_chain():
    """The f==1 parity extension: a 1×1 middle (9-1-5's conv2) joins
    the chain as ONE block-diagonal quad dot, so the f==5 last layer
    exits at half resolution. f32-exact vs the XLA forward for both
    first-layer forms and both production k regimes; off without
    wino5."""
    rng = np.random.default_rng(41)
    for n1, n2 in ((64, 32), (32, 16)):
        p = _params(rng, [(9, 1, n1), (1, n1, n2), (5, n2, 1)])
        x = jnp.asarray(
            rng.standard_normal((1, 44, 150, 1)).astype(np.float32) * 0.4)
        y_ref = np.asarray(forward(p, x))
        for kw in ({"plane_input": False},
                   {"plane_input": True, "l1_rows": 8}):
            for wino5 in (False, True):
                y = np.asarray(fused_forward(
                    p, x, tile_h=16, tile_w=128, dtype=jnp.float32,
                    wino=True, wino5=wino5, **kw))
                np.testing.assert_allclose(
                    y, y_ref, rtol=1e-4, atol=1e-4,
                    err_msg=f"n1={n1} {kw} wino5={wino5}")
    # eligibility: the f==1 middle requires the f5 umbrella + 4n <= 128
    from cnn_sr_tpu.ops.pallas_fused import _wino_layers
    d = ((1, 81, 64), (1, 64, 32), (5, 32, 1))
    assert _wino_layers(d, 3, mm_last=False, f5=True) == frozenset({1})
    assert _wino_layers(d, 3, mm_last=False) == frozenset()
    wide = ((1, 81, 64), (1, 64, 64), (5, 64, 1))
    assert _wino_layers(wide, 3, mm_last=False, f5=True) == frozenset()
