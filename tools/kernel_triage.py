#!/usr/bin/env python
"""Fused-kernel stage triage: measure each stage's cost by subtraction.

Runs the 9-5-5 1080p conv stack repeatedly with individual stages
skipped outright (pallas_fused._DEBUG_SKIP) and reports the delta vs
the full kernel. Outputs are garbage in skip modes by design — this is
a TIMING tool only. Serialize: nothing else may use the TPU while this
runs (docs/BENCHMARKS.md).

NOTE: the skip keys gate CODE PATHS — on models with a 1x1 middle layer
(SRCNN 9-1-5) the "l1" key also skips that middle layer and "mid" skips
nothing; the stage labels below are accurate for the 9-5-5 model this
tool benches.

``--config rgb`` triages the 7-layer RGB model instead, adding one
per-layer "-L{i}" mode per kernel tail layer (pallas_fused's ``L{li}``
skip keys) so the deep stack's cost decomposes layer by layer.

    python tools/kernel_triage.py [--iters 10] [--config flagship|rgb]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Fused-kernel stage triage.")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--config", choices=("flagship", "rgb"),
                   default="flagship")
    p.add_argument("--fine", action="store_true",
                   help="add sub-stage modes (dot/combine/store splits)")
    p.add_argument("--no-int8", action="store_true",
                   help="triage the bf16 patch array instead of the "
                        "production int8 default")
    p.add_argument("--wino", action="store_true",
                   help="triage the Winograd F(2x2,3x3) mode "
                        "(fused_forward(wino=True))")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from __graft_entry__ import _flagship
    from cnn_sr_tpu.ops import pallas_fused
    from cnn_sr_tpu.utils.config import parse_config
    from cnn_sr_tpu.utils.params_io import random_parameters

    if args.config == "rgb":
        import json
        cfg_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "configs", "waifu2x_7layer_rgb.json")
        with open(cfg_path) as fh:
            cfg = parse_config(json.load(fh))
        chans = 3
    else:
        cfg = _flagship()
        chans = 1
    pnp = random_parameters(cfg.layer_specs(), cfg.distributions, seed=0)
    params = [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])}
              for l in pnp]
    x = jnp.asarray(np.random.default_rng(0)
                    .random((1, 1080, 1920, chans), np.float32) - 0.5)

    def bench() -> float:
        @jax.jit
        def chained(a):
            def body(c, _):
                y = pallas_fused.fused_forward(
                    params, c, input_int8=not args.no_int8,
                    wino=args.wino or None)
                return c.at[0, 0, 0, 0].set(y[0, 0, 0, 0]), ()
            return lax.scan(body, a, None, length=args.iters)[0]

        # host readback, not block_until_ready: the tunnel's async
        # dispatch does not reliably block for device-resident results
        # (measured 0.01 ms/frame phantom timings, 2026-08-18); reading
        # one element back forces the whole dependency chain
        _ = np.asarray(chained(x)[0, 0, 0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(chained(x)[0, 0, 0, 0])
        return (time.perf_counter() - t0) / args.iters * 1e3

    results = {}
    modes = [
        ("full", frozenset()),
        ("-l1 (folded conv1 matmul)", frozenset({"l1"})),
        # "patch" is a no-op on shallow (pre-packed) stacks like this
        # 9-5-5 model — the patch stores live in the producer's stage;
        # kept to confirm ~0 and for deep-stack triage sessions
        ("-patch (rolling patch build)", frozenset({"patch"})),
        ("-mid (conv2 entirely)", frozenset({"mid"})),
        ("-last (conv3 VPU)", frozenset({"last"})),
        ("-all compute", frozenset({"l1", "mid", "last"})),
        ("-all + dma (XLA ends only)", frozenset({"l1", "mid", "last", "dma"})),
    ]
    if args.config == "rgb":
        # one mode per kernel tail layer (dims index; L0 is the raw-plane
        # first layer already covered by "l1")
        modes += [(f"-L{li} (tail layer {li})", frozenset({f"L{li}"}))
                  for li in range(1, len(params) - 1)]
    if args.fine:
        modes += [
            # NOTE: mid_dot is known to crash the axon remote compiler
            # on the 7-layer RGB stack (exit 1 even with Z kept written
            # and input-dependent, 2026-08-19); it compiles fine on the
            # flagship. The tool reports the failure and continues.
            ("-mid_dot (all-phase matmuls)", frozenset({"mid_dot"})),
            ("-mid_combine (phase combine+store)",
             frozenset({"mid_combine"})),
            ("-mid_store (act/prepack stores)", frozenset({"mid_store"})),
            ("-l1_store (l1 prepack stores)", frozenset({"l1_store"})),
            # parity-exit sub-stages (wino_mm last layer only)
            ("-last_dot (exit Z dot)", frozenset({"last_dot"})),
            ("-last_combine (exit combine+store)",
             frozenset({"last_combine"})),
        ]
    try:
        for name, skip in modes:
            pallas_fused.set_debug_skip(skip)
            try:
                results[name] = bench()
                print(f"{name:<30} {results[name]:7.2f} ms/frame", flush=True)
            except Exception as e:  # noqa: BLE001 — report, continue triage
                print(f"{name:<30} FAILED: {type(e).__name__}", flush=True)
    finally:
        # restore even on KeyboardInterrupt: a lingering skip set would
        # silently poison every later fused_forward in this process
        pallas_fused.set_debug_skip(frozenset())

    if "full" in results:
        full = results["full"]
        print("\nstage costs (delta vs full):")
        for name, t in results.items():
            if name != "full":
                print(f"  {name:<30} {full - t:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
