#!/usr/bin/env python
"""Minimal HTTP upscaling service (stdlib only).

A serving front-end for the framework (no reference analog — the
reference is batch-CLI only): POST an image, receive the upscaled PNG.
The model compiles once per input shape and stays resident on device;
same-shaped requests reuse the compiled program.

    python tools/serve.py -c cfg.json [--port 8200] [--pallas] [--scale 2]

    curl -s --data-binary @photo.png localhost:8200/upscale > photo_sr.png
    curl -s localhost:8200/healthz
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_platform = os.environ.get("CNN_SR_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)


def build_handler(cfg, params, use_pallas: bool, scale: float):
    from PIL import Image

    from cnn_sr_tpu.api import upscale_image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print(f"[serve] {fmt % args}")

        def do_GET(self):
            if self.path == "/healthz":
                body = b"ok\n"
                self.send_response(200)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != "/upscale":
                self.send_error(404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                raw = self.rfile.read(length)
                with Image.open(io.BytesIO(raw)) as im:
                    rgba = np.asarray(im.convert("RGBA"), dtype=np.uint8)
                if scale != 1.0:
                    import jax.numpy as jnp

                    from cnn_sr_tpu.ops.resize import upscale_rgba

                    rgba = np.asarray(upscale_rgba(jnp.asarray(rgba), scale))
                out = upscale_image(cfg, params, rgba, use_pallas=use_pallas)
                buf = io.BytesIO()
                Image.fromarray(out, "RGB").save(buf, "PNG")
                body = buf.getvalue()
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001 — report errors to the client
                msg = f"error: {type(e).__name__}: {e}\n".encode()
                self.send_response(400)
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)

    return Handler


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="HTTP upscaling service.")
    p.add_argument("--config", "-c", required=True)
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args(argv)

    from cnn_sr_tpu.training.trainer import init_train_state
    from cnn_sr_tpu.utils.config import read_config

    cfg = read_config(args.config)
    state = init_train_state(cfg, seed=args.seed)
    print(cfg)

    server = ThreadingHTTPServer(
        (args.host, args.port),
        build_handler(cfg, state.params, args.pallas, args.scale),
    )
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(POST /upscale, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
