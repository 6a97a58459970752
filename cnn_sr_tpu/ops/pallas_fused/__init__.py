"""Fused inference path: XLA im2col first layer + Pallas all-VMEM tail.

TPU-native replacement for the reference's per-layer "uber kernel"
dispatches (layer_uber_kernel.cl; ConfigBasedDataPipeline.cpp:200-241),
shaped by measurements on v5e (1080p SRCNN 9-5-5) — the design record
lives in docs/BENCHMARKS.md, the package layout is:

* ``rules``       — eligibility + window/tile geometry (defined ONCE,
                    shared by kernel and weight prep so they can't drift)
* ``weights``     — HWIO → per-mode weight layouts, int8 quantization,
                    im2col patch build
* ``kernel``      — ``_fused_tail_single``: the single fused Pallas
                    kernel (DMA, store_act, f==1 / sep / all-phase
                    layers, VPU + mm_last last layers, pallas_call)
* ``plane``       — the raw-plane first layer branch (in-register
                    im2col via lane rolls + MXU identity-dot transpose)
* ``wino_kernel`` — the Winograd/parity-domain branches (quad k=32,
                    j-paired k=64, unpaired k=128, parity entry store,
                    half-res parity mm exit)
* ``entry``       — ``fused_forward``: mode resolution + dispatch
* ``debug``       — triage skip state (``set_debug_skip``) and
                    trace-time observability flags

The hybrid, bf16-streaming design: **layer 1 runs in-kernel from the
raw image plane** (or as a folded pre-im2col'd 1x1 matmul) and **all
layers run in one Pallas kernel** over spatial tiles with every patch
and activation resident in VMEM, streamed as bfloat16 and accumulated
in float32. Weight layout is the reference's HWIO ``(f, f, k, n)``
(layer_uber_kernel.cl:3-12). ``fused_forward`` is a drop-in for
``models.forward`` on few-output-channel models with a few-channel
first layer; anything else falls back to the XLA conv path.
"""

from . import debug as _debug
from .debug import set_debug_skip
from .entry import fused_forward
from .kernel import _fused_tail_single
from .rules import (
    _MM_CHUNK_ROWS,
    _MM_CHUNK_ROWS_DEEP,
    _WINO_AT,
    _WINO_BT,
    _WINO_TRG,
    _plane_pads,
    _plane_rows,
    _plane_win_hp,
    _sep_layers,
    _window_pads,
    _wino_layers,
    _wino_tc,
    _wino_w_in,
)
from .weights import (
    _im2col_patches,
    _plane_h_weights,
    _prepare_tail_weights,
    _quantize_planes,
    _wino_mm_weights,
    _wino_weights,
)

__all__ = [
    "fused_forward",
    "set_debug_skip",
    "_fused_tail_single",
    "_im2col_patches",
    "_prepare_tail_weights",
    "_sep_layers",
    "_wino_layers",
    "_wino_weights",
    "_wino_mm_weights",
]


def __getattr__(name):
    # live delegation of the mutable debug state: tests read
    # ``pallas_fused._LAST_TAIL_PADDED`` / ``pallas_fused._DEBUG_SKIP``
    # and must see the CURRENT value in ``debug`` (a static re-export
    # would freeze the import-time value). Writers use
    # ``set_debug_skip`` — assigning the attribute on this package
    # would shadow this hook and silently stop propagating.
    if name == "_DEBUG_SKIP":
        return _debug._DEBUG_SKIP
    if name == "_LAST_TAIL_PADDED":
        return _debug._LAST_TAIL_PADDED
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
