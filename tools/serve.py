#!/usr/bin/env python
"""Production-shaped HTTP upscaling service (stdlib only).

A serving front-end for the framework (no reference analog — the
reference is batch-CLI only, Main_cl.cpp):

* **multiple model slots**: ``-c cfg.json`` registers the ``default``
  slot; repeatable ``--model name=cfg.json`` adds named slots selected
  per request with ``POST /upscale?model=name``.
* **device-owner worker + batching queue**: exactly one thread talks to
  the accelerator (concurrent TPU programs corrupt each other — see
  docs/BENCHMARKS.md). HTTP handler threads decode/encode images and
  enqueue jobs; the worker drains the queue, groups same-model
  same-shape luma jobs that arrive within ``--batch-wait-ms`` into ONE
  batched device program (``api.upscale_batch`` — numerically identical
  to the single-image path), and runs the rest as singles with
  ``--bucket`` shape-bucketed compile reuse.
* **latency SLO policy** (``--deadline S``): admission control sheds
  load with **503 + Retry-After** when the EWMA-estimated queue wait
  exceeds the deadline; jobs whose queue wait crosses the deadline are
  503'd at dequeue instead of dispatched; ``--max-queue N`` bounds
  queue depth (**429** beyond it). During a backend stall (the axon
  tunnel's documented degradation windows) clients get fast, honest
  rejections instead of minute-long blocking waits.
* **observability**: ``GET /models`` (slots + per-slot request counts),
  ``GET /stats`` (queue depth, batch histogram, error counts, EWMA
  service time, current wait estimate, and a ``stalled`` flag — the
  in-flight dispatch has run far past its EWMA), ``GET /healthz``.

    python tools/serve.py -c cfg.json [--model anime=waifu.json ...]
        [--port 8200] [--pallas] [--scale 2] [--max-batch 8]
        [--batch-wait-ms 3] [--bucket 64]

    curl -s --data-binary @photo.png localhost:8200/upscale > photo_sr.png
    curl -s --data-binary @a.png 'localhost:8200/upscale?model=anime' > b.png
    curl -s localhost:8200/stats
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_platform = os.environ.get("CNN_SR_PLATFORM")
if _platform:
    import jax

    jax.config.update("jax_platforms", _platform)


class DeadlineExceeded(Exception):
    """A request spent longer than the latency deadline in the queue
    (failed BEFORE dispatch — the device never ran it). Maps to 503."""


class Rejected(Exception):
    """Admission-control rejection (queue full / expected wait exceeds
    the deadline). Carries the HTTP code and a Retry-After hint."""

    def __init__(self, code: int, message: str, retry_after_s: float):
        super().__init__(message)
        self.code = code
        self.retry_after_s = retry_after_s


class _Job:
    """One enqueued upscale request; the handler thread blocks on
    ``done`` until the device worker fills ``result`` or ``error``."""

    __slots__ = ("model", "rgba", "done", "result", "error", "t_submit")

    def __init__(self, model: str, rgba: np.ndarray):
        self.model = model
        self.rgba = rgba
        self.done = threading.Event()
        self.result = None
        self.error = None
        self.t_submit = time.monotonic()


class DeviceWorker(threading.Thread):
    """The single thread that owns the accelerator.

    Pulls jobs from the queue; after the first job of a round, waits up
    to ``batch_wait_ms`` for more (max ``max_batch``), groups them by
    (model, image shape) and dispatches each group as one batched
    program where possible.
    """

    def __init__(self, slots: dict, use_pallas: bool = False,
                 scale: float = 1.0, max_batch: int = 8,
                 batch_wait_ms: float = 3.0, bucket: int = 0,
                 job_timeout_s: float = 600.0,
                 pallas_precision: str = "bf16",
                 spatial_shard: int = 0,
                 max_body_bytes: int = 64 * 1024 * 1024,
                 deadline_s: float = 0.0,
                 max_queue: int = 0):
        super().__init__(daemon=True, name="device-worker")
        self.slots = slots
        self.use_pallas = use_pallas
        self.pallas_precision = pallas_precision
        # >0: latency mode — every image's rows span this many devices
        # (halo-exchange spatial sharding) instead of batching requests
        self.spatial_shard = spatial_shard
        self.max_body_bytes = max_body_bytes
        self.scale = scale
        self.max_batch = max(1, max_batch)
        self.batch_wait_s = max(0.0, batch_wait_ms) / 1e3
        self.bucket = bucket
        # generous default: first-touch Pallas compiles can take minutes
        # on a remote-compile backend (docs/BENCHMARKS.md)
        self.job_timeout_s = job_timeout_s
        # ---- latency SLO policy (VERDICT r4 #5) ----
        # deadline_s > 0: admission control sheds load with 503 +
        # Retry-After when the EWMA-estimated queue wait already
        # exceeds the deadline, and the worker fails (503) any job
        # whose queue wait crossed the deadline BEFORE dispatching it
        # — so a tunnel stall turns into fast, honest rejections
        # instead of every queued client blocking for minutes.
        # max_queue > 0 bounds queue depth (429 beyond it).
        self.deadline_s = max(0.0, deadline_s)
        self.max_queue = max(0, max_queue)
        self._ewma_job_s: float | None = None  # None until first round
        self._dispatch_started: float | None = None
        self.queue: "queue.Queue[_Job | None]" = queue.Queue()
        self._stopping = False
        self.lock = threading.Lock()
        self.stats = {
            "requests": 0, "ok": 0, "errors": 0,
            "rounds": 0, "batched_jobs": 0, "max_batch_seen": 0,
            "rejected_queue_full": 0, "rejected_load": 0,
            "rejected_deadline": 0,
            "per_model": {name: 0 for name in slots},
        }

    def _est_wait_s(self) -> float:
        """Expected queue wait for a new arrival: per-job EWMA service
        time × jobs ahead, plus the in-flight dispatch's remaining time
        (conservatively its full EWMA when one is running). 0.0 until
        the first round completes (cold compiles must not shed)."""
        ewma = self._ewma_job_s
        if ewma is None:
            return 0.0
        est = self.queue.qsize() * ewma
        started = self._dispatch_started
        if started is not None:
            # in-flight dispatch: at least what's elapsed, assume ~ewma
            est += max(ewma, time.monotonic() - started)
        return est

    def submit(self, job: _Job) -> None:
        """Enqueue, or raise ``Rejected`` (admission control)."""
        if self._stopping:
            job.error = RuntimeError("server shutting down")
            job.done.set()
            return
        with self.lock:
            self.stats["requests"] += 1
            if job.model in self.stats["per_model"]:
                self.stats["per_model"][job.model] += 1
            if self.max_queue and self.queue.qsize() >= self.max_queue:
                self.stats["rejected_queue_full"] += 1
                raise Rejected(
                    429, f"queue full ({self.max_queue} jobs)",
                    self._est_wait_s() or 1.0)
            if self.deadline_s:
                est = self._est_wait_s()
                if est > self.deadline_s:
                    self.stats["rejected_load"] += 1
                    raise Rejected(
                        503,
                        f"expected queue wait {est:.1f}s exceeds the "
                        f"{self.deadline_s:.1f}s deadline",
                        est - self.deadline_s)
        self.queue.put(job)

    def stop(self) -> None:
        self._stopping = True
        self.queue.put(None)

    def _drain_queue(self) -> None:
        """Fail any jobs still enqueued (shutdown) so their handler
        threads unblock immediately instead of hitting the timeout."""
        while True:
            try:
                job = self.queue.get_nowait()
            except queue.Empty:
                return
            if job is not None:
                job.error = RuntimeError("server shutting down")
                job.done.set()

    def snapshot(self) -> dict:
        with self.lock:
            s = {**self.stats, "per_model": dict(self.stats["per_model"])}
        s["queue_depth"] = self.queue.qsize()
        s["models"] = sorted(self.slots)
        # SLO observability: EWMA service time, the wait estimate the
        # admission control would use right now, and a stall flag — the
        # in-flight dispatch has run far past its EWMA (the tunnel's
        # documented degradation windows look exactly like this)
        ewma = self._ewma_job_s
        s["ewma_job_s"] = round(ewma, 4) if ewma is not None else None
        s["est_wait_s"] = round(self._est_wait_s(), 3)
        started = self._dispatch_started
        elapsed = (time.monotonic() - started) if started is not None else 0.0
        s["dispatch_elapsed_s"] = round(elapsed, 3)
        s["stalled"] = bool(
            started is not None
            and elapsed > max(10.0, 5 * (ewma or 0.0) * self.max_batch))
        s["deadline_s"] = self.deadline_s or None
        s["max_queue"] = self.max_queue or None
        return s

    # ---- worker internals ----

    def run(self) -> None:
        while not self._stopping:
            job = self.queue.get()
            if job is None:
                break
            batch = [job]
            deadline = time.monotonic() + self.batch_wait_s
            while len(batch) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self.queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._stopping = True
                    break
                batch.append(nxt)

            if self.deadline_s:
                # shed-at-dequeue: a job whose queue wait already blew
                # the deadline gets a fast 503 instead of a dispatch
                # whose result the client has given up on
                now = time.monotonic()
                live = []
                for j in batch:
                    if now - j.t_submit > self.deadline_s:
                        j.error = DeadlineExceeded(
                            f"spent {now - j.t_submit:.1f}s queued "
                            f"(> {self.deadline_s:.1f}s deadline)")
                        j.done.set()
                        with self.lock:
                            self.stats["rejected_deadline"] += 1
                    else:
                        live.append(j)
                batch = live
            groups: dict = {}
            for j in batch:
                groups.setdefault((j.model, j.rgba.shape), []).append(j)
            t0 = time.monotonic()
            self._dispatch_started = t0
            try:
                for group in groups.values():
                    self._process_group(group)
            finally:
                self._dispatch_started = None
            if batch:
                per_job = (time.monotonic() - t0) / len(batch)
                prev = self._ewma_job_s
                self._ewma_job_s = (per_job if prev is None
                                    else 0.7 * prev + 0.3 * per_job)
            with self.lock:
                self.stats["rounds"] += 1
                self.stats["max_batch_seen"] = max(
                    self.stats["max_batch_seen"], len(batch))
        self._drain_queue()

    def _process_group(self, jobs) -> None:
        from cnn_sr_tpu.api import (upscale_batch, upscale_image,
                                    upscale_image_spatial)

        try:
            slot = self.slots[jobs[0].model]
            cfg, params = slot["cfg"], slot["params"]
            rgbas = [self._pre_scale(j.rgba) for j in jobs]
            if self.spatial_shard:
                # multi-chip latency mode: one image at a time, its rows
                # sharded over the mesh (throughput mode = batching below)
                for j, rgba in zip(jobs, rgbas):
                    j.result = upscale_image_spatial(
                        cfg, params, rgba, self.spatial_shard,
                        use_pallas=self.use_pallas,
                        pallas_precision=self.pallas_precision)
            elif len(jobs) > 1:
                # one batched dispatch per same-shape group — luma AND
                # RGB (api._upscale_rgb_batch_jit)
                outs = upscale_batch(cfg, params, np.stack(rgbas),
                                     use_pallas=self.use_pallas,
                                     pallas_precision=self.pallas_precision)
                for j, out in zip(jobs, outs):
                    j.result = np.asarray(out)
                with self.lock:
                    self.stats["batched_jobs"] += len(jobs)
            else:
                for j, rgba in zip(jobs, rgbas):
                    j.result = upscale_image(
                        cfg, params, rgba,
                        use_pallas=self.use_pallas, bucket=self.bucket,
                        pallas_precision=self.pallas_precision)
            with self.lock:
                self.stats["ok"] += len(jobs)
        except Exception as e:  # noqa: BLE001 — reported per job to clients
            for j in jobs:
                j.error = e
            with self.lock:
                self.stats["errors"] += len(jobs)
        finally:
            for j in jobs:
                j.done.set()

    def _pre_scale(self, rgba: np.ndarray) -> np.ndarray:
        if self.scale == 1.0:
            return rgba
        import jax.numpy as jnp

        from cnn_sr_tpu.ops.resize import upscale_rgba

        return np.asarray(upscale_rgba(jnp.asarray(rgba), self.scale))


def build_handler(worker: DeviceWorker):
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            print(f"[serve] {fmt % args}")

        def _reply(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _reply_json(self, obj, code: int = 200) -> None:
            self._reply(code, (json.dumps(obj) + "\n").encode(),
                        "application/json")

        def do_GET(self):
            path = urllib.parse.urlparse(self.path).path
            if path == "/healthz":
                self._reply(200, b"ok\n", "text/plain")
            elif path == "/models":
                snap = worker.snapshot()
                self._reply_json({
                    "models": {
                        name: {
                            "layers": [
                                {"f": s.f, "n_in": s.n_in, "n_out": s.n_out}
                                for s in slot["cfg"].layer_specs()
                            ],
                            "channels": slot["cfg"].channels,
                            "requests": snap["per_model"].get(name, 0),
                        }
                        for name, slot in worker.slots.items()
                    },
                })
            elif path == "/stats":
                self._reply_json(worker.snapshot())
            else:
                self.send_error(404)

        def do_POST(self):
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path != "/upscale":
                self.send_error(404)
                return
            model = urllib.parse.parse_qs(parsed.query).get(
                "model", ["default"])[0]
            if model not in worker.slots:
                self._reply_json(
                    {"error": f"unknown model {model!r}",
                     "models": sorted(worker.slots)}, code=404)
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                if length > worker.max_body_bytes:
                    self._reply_json(
                        {"error": f"body {length} bytes exceeds the "
                                  f"{worker.max_body_bytes}-byte limit"},
                        code=413)
                    return
                raw = self.rfile.read(length)
                # PIL's own decompression-bomb guard (Image.MAX_IMAGE_PIXELS)
                # stays active and bounds the decoded size
                with Image.open(io.BytesIO(raw)) as im:
                    rgba = np.asarray(im.convert("RGBA"), dtype=np.uint8)
            except Exception as e:  # noqa: BLE001 — bad input is a client error
                self._reply(400, f"error: {type(e).__name__}: {e}\n".encode(),
                            "text/plain")
                return

            job = _Job(model, rgba)
            try:
                worker.submit(job)
            except Rejected as rej:  # admission control: fast, honest
                self.send_response(rej.code)
                self.send_header("Retry-After",
                                 str(max(1, int(rej.retry_after_s + 0.5))))
                body = f"error: {rej}\n".encode()
                self.send_header("Content-Type", "text/plain")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if not job.done.wait(worker.job_timeout_s) or job.error is not None:
                err = job.error or TimeoutError("device worker timeout")
                # ValueError = bad request content (shape/format);
                # DeadlineExceeded = overload (503, retryable); anything
                # else — including device/runtime OSErrors — is a server fault
                if isinstance(job.error, ValueError):
                    code = 400
                elif isinstance(job.error, DeadlineExceeded):
                    code = 503
                else:
                    code = 500
                self._reply(
                    code,
                    f"error: {type(err).__name__}: {err}\n".encode(),
                    "text/plain")
                return
            buf = io.BytesIO()
            Image.fromarray(job.result, "RGB").save(buf, "PNG")
            self._reply(200, buf.getvalue(), "image/png")

    return Handler


def load_slot(config_path: str, seed=None) -> dict:
    """Build one model slot: config + resident parameters (loaded from
    the config's ``parameters_file`` when set, random-init otherwise)."""
    from cnn_sr_tpu.training.trainer import init_train_state
    from cnn_sr_tpu.utils.config import read_config

    cfg = read_config(config_path)
    state = init_train_state(cfg, seed=seed)
    return {"cfg": cfg, "params": state.params}


def make_server(slots: dict, host: str = "127.0.0.1", port: int = 0,
                use_pallas: bool = False, scale: float = 1.0,
                max_batch: int = 8, batch_wait_ms: float = 3.0,
                bucket: int = 0, job_timeout_s: float = 600.0,
                pallas_precision: str = "bf16", spatial_shard: int = 0,
                max_body_bytes: int = 64 * 1024 * 1024,
                deadline_s: float = 0.0, max_queue: int = 0):
    """Wire up (ThreadingHTTPServer, DeviceWorker); caller starts both."""
    worker = DeviceWorker(slots, use_pallas=use_pallas, scale=scale,
                          max_batch=max_batch, batch_wait_ms=batch_wait_ms,
                          bucket=bucket, job_timeout_s=job_timeout_s,
                          pallas_precision=pallas_precision,
                          spatial_shard=spatial_shard,
                          max_body_bytes=max_body_bytes,
                          deadline_s=deadline_s, max_queue=max_queue)
    server = ThreadingHTTPServer((host, port), build_handler(worker))
    return server, worker


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="HTTP upscaling service.")
    p.add_argument("--config", "-c",
                   help="config for the 'default' model slot")
    p.add_argument("--model", "-m", action="append", default=[],
                   metavar="NAME=CONFIG",
                   help="add a named model slot (repeatable)")
    p.add_argument("--port", type=int, default=8200)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--pallas-precision", choices=("bf16", "f32"),
                   default="bf16",
                   help="fused-kernel precision; f32 recommended when "
                   "serving deep models (docs/BENCHMARKS.md)")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--max-batch", type=int, default=8,
                   help="max requests fused into one device batch")
    p.add_argument("--batch-wait-ms", type=float, default=3.0,
                   help="how long the first request of a round waits "
                        "for batch-mates")
    p.add_argument("--bucket", type=int, default=64,
                   help="pad single-image shapes to multiples of this "
                        "for compile reuse (0 = exact shapes)")
    p.add_argument("--spatial-shard", type=int, default=0, metavar="N",
                   help="latency mode: shard every image's rows over N "
                        "devices (halo-exchange) instead of batching "
                        "requests — for multi-chip hosts serving large "
                        "frames (0 = off)")
    p.add_argument("--max-body-mb", type=int, default=64,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--job-timeout", type=float, default=600.0,
                   help="seconds a request waits for the device worker "
                        "(first-touch kernel compiles can take minutes)")
    p.add_argument("--deadline", type=float, default=0.0, metavar="S",
                   help="latency SLO: shed load with 503 + Retry-After "
                        "when the estimated queue wait exceeds S "
                        "seconds, and 503 any job whose queue wait "
                        "crossed S before dispatch (0 = off; cold "
                        "compiles never shed — the estimate needs one "
                        "completed round)")
    p.add_argument("--max-queue", type=int, default=0, metavar="N",
                   help="reject (429) requests beyond N queued jobs "
                        "(0 = unbounded)")
    args = p.parse_args(argv)

    slots = {}
    if args.config:
        slots["default"] = load_slot(args.config, seed=args.seed)
    for spec in args.model:
        name, _, path = spec.partition("=")
        if not path:
            p.error(f"--model needs NAME=CONFIG, got {spec!r}")
        slots[name] = load_slot(path, seed=args.seed)
    if not slots:
        p.error("register at least one model (-c and/or --model)")
    for name, slot in slots.items():
        print(f"[serve] model {name!r}:")
        print(slot["cfg"])

    server, worker = make_server(
        slots, args.host, args.port, use_pallas=args.pallas,
        scale=args.scale, max_batch=args.max_batch,
        batch_wait_ms=args.batch_wait_ms, bucket=args.bucket,
        job_timeout_s=args.job_timeout,
        pallas_precision=args.pallas_precision,
        spatial_shard=args.spatial_shard,
        max_body_bytes=args.max_body_mb * 1024 * 1024,
        deadline_s=args.deadline, max_queue=args.max_queue)
    worker.start()
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(POST /upscale[?model=NAME], GET /models /stats /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        worker.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
