"""Fused Pallas forward kernel: the whole conv stack over VMEM tiles.

TPU-native replacement for the reference's per-layer "uber kernel"
dispatches (layer_uber_kernel.cl; ConfigBasedDataPipeline.cpp:200-241).
Instead of materializing every layer's activations in HBM (the
reference's per-layer GPU buffers — ~0.5 GB for 1080p SRCNN 9-5-5), the
image is cut into spatial tiles and each tile runs ALL layers
back-to-back inside VMEM; HBM traffic is exactly input-window reads plus
final-output writes.

Per-layer compute strategy (shaped by Mosaic's constraints: DMA slices
need (8, 128)-aligned offsets/sizes, 2D data cannot be cheaply moved
into the lane dimension, unaligned slices must be canonicalized through
a scratch ref, and fully unrolled taps blow up compile time — hence
``fori_loop`` over the kernel rows with ref accumulators):

* **first layer (C_in = 1)**: f² broadcast multiply-accumulates on the
  VPU — each shifted window is canonicalized through a 2D scratch, then
  expanded along lanes and FMA'd against the (f², n₁) weight rows;
* **middle layers** (k → n): per-dy im2col on the MXU — f column-shifted
  channel blocks of a row band are stored side by side into a
  (oh, ow, f·k) patch scratch, lane-preservingly reshaped to (M, f·k),
  and contracted as (M, f·k) @ (f·k, n) matmuls accumulated over dy.
  For SRCNN 9-5-5's layer 2 (K = 320) this is where ~87% of the FLOPs
  run;
* **last layer (n_out = 1)**: the same patch build, but an MXU matmul
  with N = 1 would waste 127/128 lanes, so patches are multiplied by the
  broadcast weight row and lane-reduced on the VPU.

Weights are pre-reshaped on host to ``(f², n)`` / ``(f, f·k, n)`` /
``(f, f·k)`` from the reference's HWIO ``(f, f, k, n)`` layout
(layer_uber_kernel.cl:3-12); the public ``fused_forward`` is a drop-in
for ``models.forward`` on single-channel (luma) models and falls back to
the XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret")
)
def _fused_forward_single(wbs, x, tile_h: int, tile_w: int,
                          interpret: bool = False):
    """x: (H, W) float32 single plane → (H−s, W−s) float32.

    ``wbs``: flat list [w1(f1², n1), b1, w2(f2, f2·k2, n2), b2, ...,
    wL(fL, fL·kL), bL] of pre-reshaped weights.
    """
    n_layers = len(wbs) // 2
    fs, ks, ns = [], [], []
    for li in range(n_layers):
        w = wbs[2 * li]
        if li == 0:
            f = int(round(w.shape[0] ** 0.5))
            fs.append(f); ks.append(1); ns.append(w.shape[1])
        elif li == n_layers - 1:
            f = w.shape[0]
            fs.append(f); ks.append(w.shape[1] // f); ns.append(1)
        else:
            f = w.shape[0]
            fs.append(f); ks.append(w.shape[1] // f); ns.append(w.shape[2])
    shrinks = [f - 1 for f in fs]
    shrink = sum(shrinks)

    h, w_dim = x.shape
    out_h, out_w = h - shrink, w_dim - shrink
    grid = (pl.cdiv(out_h, tile_h), pl.cdiv(out_w, tile_w))
    # DMA slices of HBM memrefs need (8, 128)-aligned offsets AND sizes:
    # tile_h/tile_w are multiples of (8, 128); the window is tile + halo
    # rounded up
    win_h = -(-(tile_h + shrink) // 8) * 8
    win_w = -(-(tile_w + shrink) // 128) * 128
    pad_h = (grid[0] - 1) * tile_h + win_h - h
    pad_w = (grid[1] - 1) * tile_w + win_w - w_dim
    xp = jnp.pad(x, ((0, max(0, pad_h)), (0, max(0, pad_w))))

    # per-layer spatial extents inside one tile (compute region = top-left
    # tile + halo corner of the aligned DMA window)
    hs, ws = [tile_h + shrink], [tile_w + shrink]
    for s in shrinks:
        hs.append(hs[-1] - s)
        ws.append(ws[-1] - s)

    def kernel(x_hbm, *refs):
        wrefs = refs[: 2 * n_layers]
        out_ref = refs[2 * n_layers]
        scratch = refs[2 * n_layers + 1 :]
        x_vmem, sem, s2d_ref = scratch[0], scratch[1], scratch[2]
        act_refs = scratch[3 : 3 + (n_layers - 1)]
        p_refs = scratch[3 + (n_layers - 1) : 3 + (n_layers - 1) + (n_layers - 1)]

        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_h, win_h), pl.ds(j * tile_w, win_w)],
            x_vmem,
            sem,
        )
        dma.start()
        dma.wait()

        # ---- layer 1: C_in=1, VPU broadcast MACs (fori over dy) ----
        # Dynamic sublane offsets on 2D VMEM need multiple-of-8 proofs, so
        # instead of slicing at row dy we keep a ROLLING copy of the window
        # (one static roll-by-1 per fori step) and always read row 0.
        f1, n1 = fs[0], ns[0]
        oh1, ow1 = hs[1], ws[1]
        w1_ref, b1_ref = wrefs[0], wrefs[1]
        a1 = act_refs[0]
        a1[...] = jnp.zeros((oh1, ow1, n1), jnp.float32)
        xroll_ref = scratch[-1]
        xroll_ref[...] = x_vmem[...]

        def l1_body(dy, _):
            for dx in range(f1):
                s2d_ref[...] = xroll_ref[0:oh1, dx : dx + ow1]
                wv = w1_ref[pl.ds(dy * f1 + dx, 1), :]  # (1, n1)
                a1[...] = a1[...] + s2d_ref[...][:, :, None] * wv
            # roll rows up by one (shift must be non-negative: size-1 ≡ -1)
            xroll_ref[...] = pltpu.roll(xroll_ref[...], win_h - 1, axis=0)
            return 0

        jax.lax.fori_loop(0, f1, l1_body, 0)
        a1[...] = jnp.maximum(a1[...] + b1_ref[...], 0.0)

        # ---- middle layers: per-dy im2col MXU matmuls ----
        for li in range(1, n_layers - 1):
            f, k, n = fs[li], ks[li], ns[li]
            oh, ow = hs[li + 1], ws[li + 1]
            src = act_refs[li - 1]
            dst = act_refs[li]
            p_ref = p_refs[li - 1]
            w_ref, b_ref = wrefs[2 * li], wrefs[2 * li + 1]
            dst[...] = jnp.zeros((oh, ow, n), jnp.float32)

            def mid_body(dy, _, f=f, k=k, n=n, oh=oh, ow=ow,
                         src=src, dst=dst, p_ref=p_ref, w_ref=w_ref):
                for dx in range(f):
                    p_ref[:, :, dx * k : (dx + 1) * k] = src[
                        pl.ds(dy, oh), dx : dx + ow, :
                    ]
                y = jnp.dot(
                    p_ref[...].reshape(oh * ow, f * k),
                    w_ref[dy],
                    preferred_element_type=jnp.float32,
                )
                dst[...] = dst[...] + y.reshape(oh, ow, n)
                return 0

            jax.lax.fori_loop(0, f, mid_body, 0)
            dst[...] = jnp.maximum(dst[...] + b_ref[...], 0.0)

        # ---- last layer: n_out=1, patches + lane reduce on VPU ----
        fL, kL = fs[-1], ks[-1]
        ohL, owL = hs[-1], ws[-1]
        src = act_refs[-1]
        p_ref = p_refs[-1]
        wL_ref, bL_ref = wrefs[-2], wrefs[-1]
        out_ref[...] = jnp.zeros((tile_h, tile_w), jnp.float32)

        def last_body(dy, _):
            for dx in range(fL):
                p_ref[:, :, dx * kL : (dx + 1) * kL] = src[
                    pl.ds(dy, ohL), dx : dx + owL, :
                ]
            wrow = wL_ref[pl.ds(dy, 1), :]  # (1, f·k)
            out_ref[...] = out_ref[...] + jnp.sum(p_ref[...] * wrow, axis=-1)
            return 0

        jax.lax.fori_loop(0, fL, last_body, 0)
        out_ref[...] = out_ref[...] + bL_ref[0]

    scratch_shapes = [
        pltpu.VMEM((win_h, win_w), jnp.float32),   # input window
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((hs[1], ws[1]), jnp.float32),   # conv1 slice canonicalizer
    ]
    for li in range(n_layers - 1):  # activations of layers 1..L-1
        scratch_shapes.append(
            pltpu.VMEM((hs[li + 1], ws[li + 1], ns[li]), jnp.float32)
        )
    for li in range(1, n_layers):   # patch buffers for layers 2..L
        scratch_shapes.append(
            pltpu.VMEM((hs[li + 1], ws[li + 1], fs[li] * ks[li]), jnp.float32)
        )
    # rolling copy of the input window for layer 1 (must stay LAST —
    # the kernel addresses it as scratch[-1])
    scratch_shapes.append(pltpu.VMEM((win_h, win_w), jnp.float32))

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * n_layers),
        out_specs=pl.BlockSpec(
            (tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid[0] * tile_h, grid[1] * tile_w), jnp.float32
        ),
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, *wbs)
    return out[:out_h, :out_w]


def _prepare_weights(params) -> List[jnp.ndarray]:
    """Host-side reshape from HWIO (f, f, k, n) to the kernel's layouts:
    layer 1 → (f², n1); middle → (f, f·k, n); last → (f, f·k)."""
    n_layers = len(params)
    wbs: List[jnp.ndarray] = []
    for li, l in enumerate(params):
        w = jnp.asarray(l["w"], jnp.float32)
        f, _, k, n = w.shape
        if li == 0:
            wbs.append(w.reshape(f * f, n))
        elif li == n_layers - 1:
            wbs.append(w.reshape(f, f * k))
        else:
            wbs.append(w.reshape(f, f * k, n))
        wbs.append(jnp.asarray(l["b"], jnp.float32))
    return wbs


def fused_forward(params, x, tile_h: int = 32, tile_w: int = 128):
    """Fused multi-layer forward: (N, H, W, 1) → (N, H−s, W−s, 1).

    Drop-in for ``models.forward`` on luma models with a single output
    channel and ≥3 layers. ``tile_h``/``tile_w`` are rounded to the
    (8, 128) DMA alignment. Falls back to the XLA path otherwise.
    """
    from ..models import forward as _xla_forward

    tile_h = max(8, tile_h // 8 * 8)
    tile_w = max(128, tile_w // 128 * 128)

    shrink = sum(l["w"].shape[0] - 1 for l in params)
    if (
        x.shape[-1] != 1
        or params[0]["w"].shape[2] != 1
        or params[-1]["w"].shape[3] != 1
        or len(params) < 3
        or x.shape[1] <= shrink + 8
        or x.shape[2] <= shrink + 8
    ):
        return _xla_forward(params, x)

    wbs = _prepare_weights(params)
    interpret = jax.default_backend() == "cpu"  # pallas needs interpret mode off-TPU
    outs = [
        _fused_forward_single(wbs, x[i, ..., 0], tile_h, tile_w,
                              interpret=interpret)
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs)[..., None]
