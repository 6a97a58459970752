#!/usr/bin/env python
"""Fused-kernel tile-shape sweep: measures 1080p throughput per tile
geometry on the real chip. Counterpart of the reference's work-size
heuristic exploration (UtilsOpenCL.cpp:129-202) — here tile shapes are
the tuning axis instead of NDRange local sizes.

Usage:
    python tools/tile_probe.py flagship [THxTW ...]
    python tools/tile_probe.py rgb [THxTW[xCHUNK] ...]

Serialize with other TPU jobs (see docs/BENCHMARKS.md); each new tile
shape pays a multi-minute remote compile for deep stacks. Shapes past
the scoped-VMEM envelope report the compile error instead of crashing
the sweep."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from cnn_sr_tpu.ops.color import extract_luma, subtract_mean, swap_luma, swap_rgb
from cnn_sr_tpu.ops.pallas_fused import fused_forward
from cnn_sr_tpu.utils.config import parse_config
from cnn_sr_tpu.utils.params_io import random_parameters


def chained(pipeline, img, iters=8):
    @jax.jit
    def run(c):
        def body(c, _):
            y = pipeline(c)
            return c.at[0, 0, 0].set(y[0, 0, 0]), ()
        c, _ = jax.lax.scan(body, c, None, length=iters)
        return c
    r = run(img)
    _ = np.asarray(r[0, 0, 0])
    t0 = time.perf_counter()
    r = run(img)
    _ = np.asarray(r[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def _parse_tile(spec):
    """THxTW or THxTWxCHUNK -> (th, tw, chunk); exits with a usage
    message on malformed specs instead of crashing the sweep."""
    parts = spec.split("x")
    if len(parts) not in (2, 3) or not all(p.isdigit() for p in parts):
        sys.exit(f"bad tile spec {spec!r}: expected THxTW or THxTWxCHUNK")
    th, tw = int(parts[0]), int(parts[1])
    return (th, tw, int(parts[2]) if len(parts) == 3 else 0)


def jparams(cfg, seed=0):
    p = random_parameters(cfg.layer_specs(), cfg.distributions, seed=seed)
    return [{"w": jnp.asarray(l["w"]), "b": jnp.asarray(l["b"])} for l in p]


rng = np.random.default_rng(0)
img = jnp.asarray(rng.integers(0, 256, (1080, 1920, 4), dtype=np.uint8))

which = sys.argv[1] if len(sys.argv) > 1 else "all"
if which not in ("all", "flagship", "rgb"):
    sys.exit(f"unknown mode {which!r}: expected all|flagship|rgb "
             "(tile specs come after the mode)")

if which in ("all", "flagship"):
    from __graft_entry__ import _flagship  # the one flagship definition

    cfg = _flagship()
    params = jparams(cfg)
    ftiles = [(64, 256, 0)]
    if len(sys.argv) > 2:
        ftiles = [_parse_tile(t) for t in sys.argv[2:]]
    for th, tw, cr in ftiles:
        def pipe(im, th=th, tw=tw, cr=cr):
            luma = extract_luma(im, normalize=True)
            luma0, _ = subtract_mean(luma)
            y = fused_forward(params, luma0[None, ..., None], tile_h=th,
                              tile_w=tw, chunk_rows=cr,
                              input_int8=True)[0, ..., 0]
            return swap_luma(im, y)
        try:
            dt = chained(pipe, img)
            print(json.dumps({"cfg": "9-5-5", "tile": [th, tw], "chunk": cr,
                              "ms": round(dt * 1e3, 2),
                              "mpix_s": round(1080 * 1920 / dt / 1e6, 1)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — probe keeps going
            print(json.dumps({"cfg": "9-5-5", "tile": [th, tw], "chunk": cr,
                              "error": repr(e)[:200]}), flush=True)

if which in ("all", "rgb"):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg7 = parse_config(json.load(open(
        os.path.join(here, "configs", "waifu2x_7layer_rgb.json"))))
    params7 = jparams(cfg7)
    tiles = [(64, 128, 0), (64, 256, 0)]
    if len(sys.argv) > 2:
        tiles = [_parse_tile(t) for t in sys.argv[2:]]
    for th, tw, cr in tiles:
        def rgb_pipe(im, th=th, tw=tw, cr=cr):
            rgb = im[..., :3].astype(jnp.float32) / 255.0
            mean = jnp.mean(rgb, axis=(0, 1), keepdims=True)
            y = fused_forward(params7, (rgb - mean)[None], tile_h=th,
                              tile_w=tw, chunk_rows=cr, input_int8=True)[0]
            return swap_rgb(im, y)
        try:
            dt = chained(rgb_pipe, img, iters=4)
            print(json.dumps({"cfg": "rgb7", "tile": [th, tw], "chunk": cr,
                              "ms": round(dt * 1e3, 2),
                              "mpix_s": round(1080 * 1920 / dt / 1e6, 1)}))
        except Exception as e:  # noqa: BLE001 — probe keeps going
            print(json.dumps({"cfg": "rgb7", "tile": [th, tw], "chunk": cr,
                              "error": repr(e)[:200]}))
