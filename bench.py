"""Benchmark: single-image upscaling throughput on the flagship config.

Measures the BASELINE.json headline: MPix/s/chip running SRCNN 9-5-5
(n1=64, n2=32) luma upscaling on a 2x-upscaled 1080p frame (1920x1080),
end-to-end on device (uint8 RGBA in HBM → luma pipeline → 3 convs →
swap-luma → uint8 RGB in HBM). Steady-state: median over timed runs
after warmup. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MPix/s", "vs_baseline": N}
vs_baseline is against the 50 MPix/s/chip target (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from cnn_sr_tpu.api import _upscale_luma_jit
    from cnn_sr_tpu.utils.params_io import random_parameters

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    h, w = 1080, 1920

    cfg = _flagship()
    params_np = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(p["w"]), "b": jnp.asarray(p["b"])} for p in params_np]

    rng = np.random.default_rng(0)
    rgba = jax.device_put(
        jnp.asarray(rng.integers(0, 256, (h, w, 4), dtype=np.uint8))
    )

    def run():
        return _upscale_luma_jit(params, rgba, use_pallas=use_pallas)

    # try the pallas path; fall back to XLA if it fails to compile/run
    try:
        out = jax.block_until_ready(run())
    except Exception as e:
        if not use_pallas:
            raise
        print(f"# pallas path failed ({type(e).__name__}: {e}); XLA fallback",
              file=sys.stderr)
        use_pallas = False
        out = jax.block_until_ready(run())
    assert out.shape == (h, w, 3) and out.dtype == jnp.uint8

    # warmup + steady state
    for _ in range(3):
        jax.block_until_ready(run())
    times = []
    for _ in range(10):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))

    mpix_s = (h * w) / dt / 1e6
    print(json.dumps({
        "metric": "srcnn_9-5-5_1080p_upscale_throughput",
        "value": round(mpix_s, 2),
        "unit": "MPix/s",
        "vs_baseline": round(mpix_s / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
