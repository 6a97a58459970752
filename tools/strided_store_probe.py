#!/usr/bin/env python
"""Lowering probe: do Mosaic strided f32 ref STORES (out[p::2, q::2] = v)
and strided f32 ref LOADS (in[a::2, b::2]) compile and run correctly on
the real chip? Decides the Winograd integration shape: if both lower,
the wino layer reads/writes STANDARD layout directly and no parity-plane
activation layout (tools/winograd_probe.py) is needed anywhere.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, K = 24, 256, 128


def main() -> int:
    def body(a_ref, out_ref):
        # strided loads of the four parity quadrants, recombined via
        # strided stores into the (identical) standard layout + 1.0
        for p in range(2):
            for q in range(2):
                v = a_ref[p::2, q::2]
                out_ref[p::2, q::2] = v + 1.0

    fn = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, C, K), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    rng = np.random.default_rng(0)
    a = rng.standard_normal((R, C, K)).astype(np.float32)
    out = np.asarray(jax.jit(fn)(jnp.asarray(a)))
    err = np.abs(out - (a + 1.0)).max()
    print(f"strided load+store roundtrip: max_abs_err={err}")
    return 0 if err == 0.0 else 1


if __name__ == "__main__":
    sys.exit(main())
