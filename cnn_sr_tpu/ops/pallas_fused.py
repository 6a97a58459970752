"""Fused Pallas forward kernel for the inference hot path (in progress).

Target design (BASELINE.json north star, ≥50 MPix/s/chip on v5e): tile
the image into VMEM-resident row bands; for each band compute all conv
layers back-to-back without spilling activations to HBM, expressing each
conv as an im2col matmul so the MXU does the FLOPs. Until the kernel
lands, this module delegates to the XLA conv path (which already fuses
bias/ReLU and is the correctness baseline the Pallas kernel must match).
"""

from __future__ import annotations

from ..models import forward as _xla_forward


def fused_forward(params, x):
    """Fused multi-layer forward. Currently the XLA path; the Pallas
    band-fused kernel will replace this behind the same signature."""
    return _xla_forward(params, x)
