"""Batched HTTP restoration serving.

Long-running serving for the restoration pipeline -- a capability the
reference does not have (its only inference entry requires a ground-truth
folder and exits, models/restoration.py:63-168).  TPU-first design: the
chip serves ONE fused program per geometry, so the server's job is to keep
that program's batch axis full.  A single device-owner thread microbatches
concurrent requests (same geometry, up to ``batch``, within
``window_ms``), runs one fused restoration, and fans results back out --
continuous batching for a diffusion service, on one chip, no framework
dependencies (stdlib ``http.server`` + ``queue``).

Endpoints:
  POST /restore     image bytes (png/jpeg/...) -> restored PNG bytes
  GET  /healthz     JSON: device, served/batch stats, queue depth

Protocol notes: requests are grouped ONLY with same-shape peers (each
geometry is its own compiled program); a mixed queue serves the group
containing the OLDEST request (no geometry can be starved).  Short batches
are padded up to the fixed ``batch`` size before hitting the device, so
each geometry compiles exactly ONE program regardless of arrival counts.
Sampling profile (t_start / steps / grid_r) is fixed at startup -- serving
wants one warm program, not per-request recompiles.
"""

from __future__ import annotations

import io
import json
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from queue import Empty, Queue
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class _Request:
    arr: np.ndarray                       # (H, W, 3) float32 [0,1]
    done: threading.Event = field(default_factory=threading.Event)
    out: Optional[np.ndarray] = None
    error: Optional[str] = None


class Microbatcher:
    """Groups queued requests into same-shape batches.

    Separated from the HTTP layer so the batching policy is unit-testable
    without sockets: ``collect()`` blocks for the first request, then
    drains peers arriving within ``window_ms`` up to ``batch``, returning
    the same-shape group containing the OLDEST request (so no geometry is
    starved); stragglers of other shapes stay pending for the next call.
    """

    def __init__(self, batch: int = 8, window_ms: float = 30.0):
        self.queue: "Queue[_Request]" = Queue()
        self.batch = batch
        self.window_ms = window_ms
        self._pending: List[_Request] = []

    def submit(self, req: _Request) -> None:
        self.queue.put(req)

    def depth(self) -> int:
        return self.queue.qsize() + len(self._pending)

    def collect(self, timeout: Optional[float] = None) -> List[_Request]:
        """Next batch (possibly empty on timeout)."""
        items = self._pending
        self._pending = []
        if not items:
            try:
                items = [self.queue.get(timeout=timeout)]
            except Empty:
                return []
        deadline = time.time() + self.window_ms / 1e3
        while len(items) < self.batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                items.append(self.queue.get(timeout=remaining))
            except Empty:
                break
        groups: Dict[Tuple[int, ...], List[_Request]] = {}
        for r in items:
            groups.setdefault(tuple(r.arr.shape), []).append(r)
        # serve the group containing the OLDEST request (no geometry can
        # be starved by a steady majority of another shape)
        best = groups[tuple(items[0].arr.shape)]
        for shape, reqs in groups.items():
            if reqs is not best:
                self._pending.extend(reqs)
        self._pending.extend(best[self.batch:])
        return best[:self.batch]


class RestorationServer:
    """Device-owner loop + HTTP front end around a DiffusiveRestoration."""

    def __init__(self, restorer, *, batch: int = 8, window_ms: float = 30.0,
                 no_resize: bool = False, rng_seed: int = 61):
        self.restorer = restorer
        self.batcher = Microbatcher(batch=batch, window_ms=window_ms)
        self.no_resize = no_resize
        self.stats = {"served": 0, "batches": 0, "errors": 0,
                      "last_batch_ms": 0.0, "last_batch_size": 0}
        self._seed = rng_seed
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._device_loop,
                                        daemon=True, name="device-owner")

    # ---------------------------------------------------------- device side

    def _device_loop(self) -> None:
        import jax
        rng = jax.random.PRNGKey(self._seed)
        while not self._stop.is_set():
            reqs = self.batcher.collect(timeout=0.2)
            if not reqs:
                continue
            t0 = time.time()
            try:
                rng, sub = jax.random.split(rng)
                stacked = np.stack([r.arr for r in reqs])
                # pad short batches to the FIXED batch size (repeat the last
                # image): one compiled program per geometry, never one per
                # arrival count -- a fresh tiled-DDIM compile costs minutes
                # through a remote-compile relay
                pad = self.batcher.batch - len(reqs)
                if pad > 0:
                    stacked = np.concatenate(
                        [stacked, np.repeat(stacked[-1:], pad, axis=0)])
                out, _ = self.restorer.restore_image(stacked, sub)
                for r, img in zip(reqs, out[:len(reqs)]):
                    r.out = np.asarray(img)
                self.stats["served"] += len(reqs)
            except Exception as e:  # noqa: BLE001 -- fan the error out
                for r in reqs:
                    r.error = f"{type(e).__name__}: {e}"[:500]
                self.stats["errors"] += len(reqs)
            finally:
                ms = (time.time() - t0) * 1e3
                self.stats["batches"] += 1
                self.stats["last_batch_ms"] = round(ms, 1)
                self.stats["last_batch_size"] = len(reqs)
                for r in reqs:
                    r.done.set()

    # ------------------------------------------------------------ HTTP side

    def _decode(self, body: bytes) -> np.ndarray:
        from PIL import Image

        from wavedm_tpu.data.raindrop import eval_resize_dims
        img = Image.open(io.BytesIO(body))
        img = img.convert("RGB") if img.mode != "RGB" else img
        if self.no_resize:
            w, h = img.size
            wd, ht = 16 * ((w + 15) // 16), 16 * ((h + 15) // 16)
        else:
            wd, ht = eval_resize_dims(*img.size)
        if (wd, ht) != img.size:
            img = img.resize((wd, ht), Image.LANCZOS)
        return np.asarray(img, np.float32) / 255.0

    def restore_bytes(self, body: bytes, timeout: float = 600.0) -> bytes:
        """Decode -> enqueue -> await the device owner -> PNG bytes."""
        from PIL import Image
        req = _Request(self._decode(body))
        self.batcher.submit(req)
        if not req.done.wait(timeout):
            raise TimeoutError("restoration timed out")
        if req.error:
            raise RuntimeError(req.error)
        buf = io.BytesIO()
        arr = np.clip(np.asarray(req.out) * 255.0 + 0.5, 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(buf, "PNG")
        return buf.getvalue()

    def make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default
                pass

            def do_GET(self):
                if self.path != "/healthz":
                    self.send_error(404)
                    return
                body = json.dumps(
                    {**server.stats, "queue_depth": server.batcher.depth()}
                ).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):
                if self.path != "/restore":
                    self.send_error(404)
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    png = server.restore_bytes(self.rfile.read(n))
                except Exception as e:  # noqa: BLE001
                    msg = f"{type(e).__name__}: {e}".encode()[:1000]
                    self.send_response(500)
                    self.send_header("Content-Length", str(len(msg)))
                    self.end_headers()
                    self.wfile.write(msg)
                    return
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(png)))
                self.end_headers()
                self.wfile.write(png)

        return Handler

    def start(self) -> None:
        self._worker.start()

    def stop(self) -> None:
        self._stop.set()

    def serve(self, host: str = "0.0.0.0", port: int = 8000):
        self.start()
        httpd = ThreadingHTTPServer((host, port), self.make_handler())
        return httpd
