"""Fused Pallas forward kernel: the whole conv stack over VMEM tiles.

TPU-native replacement for the reference's per-layer "uber kernel"
dispatches (layer_uber_kernel.cl; ConfigBasedDataPipeline.cpp:200-241).
Instead of materializing every layer's activations in HBM (the
reference's per-layer GPU buffers — ~0.5 GB for 1080p SRCNN 9-5-5), the
image is cut into spatial tiles and each tile runs ALL layers
back-to-back inside VMEM; HBM traffic is exactly input-window reads plus
final-output writes.

Per-layer compute strategy (shaped by what Mosaic supports — notably:
slices at unaligned offsets must be canonicalized through a VMEM scratch
store before concat/expand ops, and 2D data cannot be cheaply moved into
the lane dimension):

* **first layer (C_in = 1)**: f² broadcast multiply-accumulates on the
  VPU — each shifted window is stored to a 2D scratch (canonicalizing
  its layout), then expanded along lanes and MAC'd against the f²
  weight vectors (one (oh, ow, n₁) FMA per tap);
* **middle layers** (k → n, both ≥ 8): per-dy im2col on the MXU — the f
  column-shifted channel blocks of one row band are stored side by side
  into a (oh, ow, f·k) scratch, lane-preservingly reshaped to
  (M, f·k), and hit the MXU as (M, f·k) @ (f·k, n) matmuls accumulated
  over dy. For SRCNN 9-5-5's layer 2 (K = 320) this is where ~87% of
  the model's FLOPs run;
* **last layer (n_out = 1)**: same per-dy patch build, but an
  (M, f·k) @ (f·k, 1) matmul would waste 127/128 MXU lanes, so the
  patches are multiplied by the broadcast weight row and lane-reduced
  on the VPU instead.

Weight layout is the reference's HWIO ``(f, f, k, n)``
(layer_uber_kernel.cl:3-12); the kernel is a drop-in for
``models.forward`` on single-channel (luma) models and falls back to the
XLA path otherwise.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_first_vpu(x_win, w1, b1, relu, oh, ow, s2d_ref):
    """C_in=1 conv: f² canonicalize-then-broadcast MACs.

    ``x_win``: (wh, ww) window values; ``w1``: (f, f, 1, n);
    ``s2d_ref``: (oh, ow) VMEM scratch used to canonicalize shifted
    slices. Returns (oh, ow, n) float32.
    """
    f, _, _, n = w1.shape
    acc = jnp.zeros((oh, ow, n), dtype=jnp.float32)
    for dy in range(f):
        for dx in range(f):
            s2d_ref[...] = x_win[dy : dy + oh, dx : dx + ow]
            acc = acc + s2d_ref[...][:, :, None] * w1[dy, dx, 0, :]
    y = acc + b1
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _conv_mid_mxu(act_ref, w, b, relu, oh, ow, p_ref):
    """k→n conv on the MXU via per-dy im2col patches.

    ``act_ref``: (ih, iw, k) VMEM scratch holding the input activation;
    ``p_ref``: (oh, ow, f·k) VMEM patch scratch. Returns (M, n) float32
    (caller reshapes)."""
    f, _, k, n = w.shape
    m = oh * ow
    acc = jnp.zeros((m, n), dtype=jnp.float32)
    for dy in range(f):
        for dx in range(f):
            p_ref[:, :, dx * k : (dx + 1) * k] = act_ref[dy : dy + oh, dx : dx + ow, :]
        acc = acc + jnp.dot(
            p_ref[...].reshape(m, f * k),
            w[dy].reshape(f * k, n),
            preferred_element_type=jnp.float32,
        )
    y = acc + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


def _conv_last_vpu(act_ref, w, b, relu, oh, ow, p_ref):
    """k→1 conv: per-dy patches, broadcast-multiply + lane reduction.

    ``act_ref``: (ih, iw, k); ``p_ref``: (oh, ow, f·k). Returns
    (oh, ow) float32."""
    f, _, k, _ = w.shape
    acc = jnp.zeros((oh, ow), dtype=jnp.float32)
    for dy in range(f):
        for dx in range(f):
            p_ref[:, :, dx * k : (dx + 1) * k] = act_ref[dy : dy + oh, dx : dx + ow, :]
        wrow = w[dy].reshape(f * k)
        acc = acc + jnp.sum(p_ref[...] * wrow, axis=-1)
    y = acc + b[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@functools.partial(
    jax.jit, static_argnames=("tile_h", "tile_w", "interpret")
)
def _fused_forward_single(params_flat, x, tile_h: int, tile_w: int,
                          interpret: bool = False):
    """x: (H, W) float32 single plane → (H−s, W−s) float32."""
    n_layers = len(params_flat) // 2
    weights = [params_flat[2 * i] for i in range(n_layers)]
    biases = [params_flat[2 * i + 1] for i in range(n_layers)]
    shrinks = [w.shape[0] - 1 for w in weights]
    shrink = sum(shrinks)
    h, w_dim = x.shape
    out_h, out_w = h - shrink, w_dim - shrink

    grid = (pl.cdiv(out_h, tile_h), pl.cdiv(out_w, tile_w))
    # DMA slices of HBM memrefs must be (8, 128)-aligned in offset AND
    # size: tile_h/tile_w are multiples of (8, 128) (enforced by the
    # caller), and the copied window is the tile + halo rounded up
    win_h = -(-(tile_h + shrink) // 8) * 8
    win_w = -(-(tile_w + shrink) // 128) * 128
    pad_h = (grid[0] - 1) * tile_h + win_h - h
    pad_w = (grid[1] - 1) * tile_w + win_w - w_dim
    xp = jnp.pad(x, ((0, max(0, pad_h)), (0, max(0, pad_w))))

    # per-layer spatial extents inside one tile (the compute region is the
    # top-left (tile + halo) corner of the aligned DMA window)
    hs, ws = [tile_h + shrink], [tile_w + shrink]
    for s in shrinks:
        hs.append(hs[-1] - s)
        ws.append(ws[-1] - s)

    def kernel(x_hbm, *refs):
        wrefs = refs[: 2 * n_layers]
        out_ref = refs[2 * n_layers]
        scratch = refs[2 * n_layers + 1 :]
        x_vmem, sem = scratch[0], scratch[1]
        s2d_ref = scratch[2]
        act_refs = scratch[3 : 3 + (n_layers - 1)]
        p_refs = scratch[3 + (n_layers - 1) :]

        i = pl.program_id(0)
        j = pl.program_id(1)
        dma = pltpu.make_async_copy(
            x_hbm.at[pl.ds(i * tile_h, win_h), pl.ds(j * tile_w, win_w)],
            x_vmem,
            sem,
        )
        dma.start()
        dma.wait()

        a = None
        for li in range(n_layers):
            w = wrefs[2 * li][...]
            b = wrefs[2 * li + 1][...]
            relu = li != n_layers - 1
            oh, ow = hs[li + 1], ws[li + 1]
            if li == 0:
                a = _conv_first_vpu(x_vmem[...], w, b, relu, oh, ow, s2d_ref)
                act_refs[0][...] = a
            elif li == n_layers - 1:
                out_ref[...] = _conv_last_vpu(
                    act_refs[li - 1], w, b, relu, oh, ow, p_refs[li - 1]
                )
            else:
                y = _conv_mid_mxu(
                    act_refs[li - 1], w, b, relu, oh, ow, p_refs[li - 1]
                )
                act_refs[li][...] = y.reshape(oh, ow, w.shape[3])

    scratch_shapes = [
        pltpu.VMEM((win_h, win_w), jnp.float32),   # input window
        pltpu.SemaphoreType.DMA(()),
        pltpu.VMEM((hs[1], ws[1]), jnp.float32),   # conv1 slice canonicalizer
    ]
    for li in range(n_layers - 1):  # activation buffers for layers 1..L-1
        scratch_shapes.append(
            pltpu.VMEM((hs[li + 1], ws[li + 1], weights[li].shape[3]), jnp.float32)
        )
    for li in range(1, n_layers):  # patch buffers for layers 2..L
        f = weights[li].shape[0]
        k = weights[li].shape[2]
        scratch_shapes.append(
            pltpu.VMEM((hs[li + 1], ws[li + 1], f * k), jnp.float32)
        )

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
    )(xp, *params_flat)
    return out[:out_h, :out_w]


def fused_forward(params, x, tile_h: int = 40, tile_w: int = 128):
    """Fused multi-layer forward: (N, H, W, 1) → (N, H−s, W−s, 1).

    Drop-in for ``models.forward`` on luma models with a single output
    channel. ``tile_h``/``tile_w`` are rounded to the (8, 128) DMA
    alignment the hardware requires. Falls back to the XLA path for
    other configurations or images smaller than one tile halo.
    """
    from ..models import forward as _xla_forward

    tile_h = max(8, tile_h // 8 * 8)
    tile_w = max(128, tile_w // 128 * 128)

    shrink = sum(l["w"].shape[0] - 1 for l in params)
    if (
        x.shape[-1] != 1
        or params[-1]["w"].shape[3] != 1
        or len(params) < 2
        or x.shape[1] <= shrink + 8
        or x.shape[2] <= shrink + 8
    ):
        return _xla_forward(params, x)

    params_flat: List[jnp.ndarray] = []
    for l in params:
        params_flat.append(jnp.asarray(l["w"], jnp.float32))
        params_flat.append(jnp.asarray(l["b"], jnp.float32))

    interpret = jax.default_backend() == "cpu"  # pallas needs interpret mode off-TPU
    outs = [
        _fused_forward_single(params_flat, x[i, ..., 0], tile_h, tile_w,
                              interpret=interpret)
        for i in range(x.shape[0])
    ]
    return jnp.stack(outs)[..., None]
