#!/usr/bin/env python
"""Lowering probe for the ROW-PAIR exit extension (ROADMAP r5s2 (b)).

The parity exit's Z dot underfills N (fp·4m ≤ 24 lanes of 128 on the
shipping configs), so every K-block pass charges 128 output lanes for
≤24 useful ones. A row-pair extension would compute TWO output rows
per dot — Z lanes (rp, dy', pq, j) = 2·fp·4m ≤ 128, row taps fp+1 per
pair instead of 2·fp → −25% (f=3) / −33% (f=5) exit-dot K-passes per
output row. Its operand for tap rt is a LEADING-DIM STRIDE-2 slice of
the (H/2, W, 4k) exit src (src[rt : rt+2m : 2]) — this probe answers
whether Mosaic lowers that read for a bf16 ref at the exit's exact
lane geometry (4k = 128), and at 64 lanes (the 9-1-5's exit k=16 →
4k=64), before any kernel work is committed.

Run serialized with other TPU jobs:

    JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache python tools/rowpair_probe.py
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 64, 128


def _case(lanes: int, dt, m: int = 16):
    """stride-2 leading-dim reads of both row parities + a dot with
    the collapsed operand — the exact shape the row-pair exit needs."""

    def body(a_ref, w_ref, out_ref):
        for rt in range(2):
            v = a_ref[rt : rt + 2 * m : 2, 0:W, 0:lanes]
            y = jnp.dot(
                v.reshape(m * W, lanes).astype(jnp.bfloat16),
                w_ref[...],
                preferred_element_type=jnp.float32,
            )
            out_ref[rt * m : (rt + 1) * m] = y.reshape(m, W, lanes)

    fn = pl.pallas_call(
        body,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2 * m, W, lanes), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )
    rng = np.random.default_rng(0)
    a = rng.standard_normal((H, W, lanes)).astype(np.float32)
    wm = rng.standard_normal((lanes, lanes)).astype(np.float32)
    out = np.asarray(jax.jit(fn)(
        jnp.asarray(a, dt), jnp.asarray(wm, jnp.bfloat16)))
    refd = np.einsum(
        "rmwk,kn->rmwn",
        np.stack([a[rt : rt + 2 * m : 2] for rt in range(2)])
        .astype(jnp.bfloat16).astype(np.float32),
        wm.astype(jnp.bfloat16).astype(np.float32),
    ).reshape(2 * m, W, lanes)
    err = np.abs(out - refd).max() / max(1e-6, np.abs(refd).max())
    return err


def main() -> int:
    ok = True
    for lanes in (128, 64):
        for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            try:
                err = _case(lanes, dt)
                verdict = "OK" if err < 2e-2 else f"WRONG ({err:.2e})"
                ok &= err < 2e-2
            except Exception as e:  # lowering failure is the answer
                verdict = f"FAILS: {type(e).__name__}: {str(e)[:120]}"
                ok = False
            print(f"stride-2 leading-dim read, {name} {lanes}-lane: "
                  f"{verdict}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
