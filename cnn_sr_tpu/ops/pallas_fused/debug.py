"""Mutable trace-time instrumentation state for the fused kernel.

One tiny module so the kernel (reader), the package ``__init__``
(attribute delegation), and the triage tools (writers) share a single
source of truth without import cycles.
"""

from __future__ import annotations

# Perf-triage knob (tools/kernel_triage.py): stages named here are
# SKIPPED OUTRIGHT (their outputs stay uninitialized VMEM garbage) so
# their cost can be measured by subtraction. NEVER set in production.
# Keys gate code paths, not model layers: "l1" = all f==1 layers and
# the plane first layer (on 9-1-5 also its 1x1 middle layer),
# "mid"/"patch" = f>1 middle layers / their patch build ("patch" is a
# no-op for pre-packed consumers — shallow stacks — whose patch stores
# live in the producer's store, gated by that producer's stage key),
# "last" = the VPU last layer, "dma" = the window copies. Finer keys
# for sub-stage triage: "l1_store" keeps l1's dots but replaces its
# (prepack) stores with a one-element max-store; "mid_dot" skips the
# all-phase matmul (note: gated with `not in`, the dot is the default);
# "mid_combine" skips phase combine AND output store; "mid_store" keeps
# the combine but replaces the store with a one-element max-store (on
# wino-chain layers this covers the possibly dx'-packed parity store;
# "L{li}_store" does the same for exactly kernel layer li — how the
# L5 exit-prepack store was pinned at 0.89 ms, docs/BENCHMARKS.md);
# "last_extract" (parity exit only) keeps the dy' Z accumulation but
# skips the per-(channel, parity) extraction + out stores.
# Per-layer keys "L{li}" (li = 0-based index into the KERNEL's layer
# list, i.e. dims) skip exactly that layer — note skipping a pre-packed
# consumer's producer also skips the consumer's patch stores (they live
# in the producer's store), and "L{n_layers-1}" is spelled "last".
_DEBUG_SKIP: frozenset = frozenset()

# Trace-time observability for tests: True when the last TRACED
# _fused_tail_single call had to pad/convert its input (the folded-conv1
# path pre-builds at the padded geometry, so this must stay False there
# — a geometry drift between _window_pads and the kernel would silently
# reintroduce a quarter-GB pad copy per frame). Only updated when a
# call actually traces (cache hits skip tracing).
_LAST_TAIL_PADDED: bool = False


def set_debug_skip(skip: frozenset) -> None:
    """Set the triage skip set AND clear the kernel's jit cache (the
    skip set is read at trace time, so a stale cache would silently
    ignore it). The supported way for tools to drive triage modes —
    assigning ``pallas_fused._DEBUG_SKIP`` directly stopped propagating
    when the module became a package."""
    global _DEBUG_SKIP
    _DEBUG_SKIP = frozenset(skip)
    from .kernel import _fused_tail_single

    _fused_tail_single.clear_cache()
