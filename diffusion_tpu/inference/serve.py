"""Minimal HTTP serving wrapper around StableDiffusionInference.

TPU-native equivalent of the reference's mcli/uvicorn deployment (reference:
diffusion/inference/mosaic_inference.yaml:14-17 deploys `serve:app` with
uvicorn; inference/README.md:21-25). Stdlib http.server keeps this image
dependency-free; swap in any ASGI server by wrapping `endpoint.predict`.

Beyond the reference (which serializes requests behind a lock): server-side
dynamic batching — concurrent /predict requests with the same sampling
config (steps/size/scale/seed) are merged into ONE device dispatch
(`predict_many`), so chip utilization scales with offered load instead of
pinning at batch-1. `--max-batch-size 1` restores one-at-a-time.

  python -m diffusion_tpu.inference.serve --checkpoint <dir> --port 8000

POST /predict  {"prompt": "...", "guidance_scale": 7.5, ...}
  -> {"images": ["<base64 png>", ...]}
  optional: "scheduler" (ddim|dpm++2m|euler), "image" (base64) +
  "strength" for img2img, plus "mask" (grayscale base64, white =
  regenerate) for inpainting
GET  /health   -> {"status": "ok"}
"""

from __future__ import annotations

import argparse
import collections
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

from diffusion_tpu.inference.inference_model import StableDiffusionInference

__all__ = ["make_server", "Batcher", "main"]


class _Ticket:
    __slots__ = ("inputs", "key", "event", "result", "error")

    def __init__(self, inputs: Dict[str, Any], key: tuple):
        self.inputs = inputs
        self.key = key
        self.event = threading.Event()
        self.result: Optional[List[str]] = None
        self.error: Optional[BaseException] = None


class Batcher:
    """Merge concurrent requests into one device dispatch.

    One worker thread owns the chip (generation is single-stream anyway).
    It takes the oldest waiting request, then collects up to
    `max_batch_size - 1` more *mergeable* requests (same `batch_key`) that
    are already queued or arrive within `batch_wait_ms`, and runs them as a
    single `predict_many` call. Non-mergeable requests keep their place in
    line for the next round — FIFO across batches, so one odd request can't
    be starved by a stream of popular ones."""

    def __init__(self, endpoint: StableDiffusionInference,
                 max_batch_size: int = 8, batch_wait_ms: float = 20.0):
        self.endpoint = endpoint
        self.max_batch_size = max(1, int(max_batch_size))
        self.batch_wait_s = max(0.0, float(batch_wait_ms) / 1e3)
        self._queue: collections.deque[_Ticket] = collections.deque()
        self._cond = threading.Condition()
        self.stats = {"requests_total": 0, "errors_total": 0,
                      "dispatches_total": 0, "dispatch_seconds_total": 0.0}
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="serve-batcher")
        self._worker.start()

    def snapshot(self) -> Dict[str, Any]:
        """Capacity-planning counters (avg co-batched requests per chip
        dispatch is the batching win; queue_depth is backpressure)."""
        with self._cond:
            s = dict(self.stats)
            s["queue_depth"] = len(self._queue)
        d = max(s["dispatches_total"], 1)
        s["avg_batch_size"] = round(s["requests_total"] / d, 3)
        s["avg_dispatch_seconds"] = round(s["dispatch_seconds_total"] / d, 4)
        return s

    def submit(self, inputs: Dict[str, Any]) -> List[str]:
        """Enqueue, wait, return images (raises the handler's error)."""
        key = self.endpoint.batch_key(inputs)  # validates before queueing
        t = _Ticket(inputs, key)
        with self._cond:
            self._queue.append(t)
            self._cond.notify()
        t.event.wait()
        if t.error is not None:
            raise t.error
        return t.result or []

    def _take_batch(self) -> List[_Ticket]:
        with self._cond:
            while not self._queue:
                self._cond.wait()
            head = self._queue.popleft()
        batch = [head]
        # linger briefly for co-batchable requests (amortizes the ~50-step
        # diffusion loop over every concurrent prompt)
        deadline = time.monotonic() + self.batch_wait_s
        while len(batch) < self.max_batch_size:
            with self._cond:
                taken = next((t for t in self._queue if t.key == head.key),
                             None)
                if taken is not None:
                    self._queue.remove(taken)
                else:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    self._cond.wait(timeout=remaining)
                    continue
            batch.append(taken)
        return batch

    def _run(self) -> None:
        while True:
            batch = self._take_batch()
            t0 = time.monotonic()
            failed = False
            try:
                results = self.endpoint.predict_many(
                    [t.inputs for t in batch])
                for t, r in zip(batch, results):
                    t.result = r
            except BaseException as e:  # noqa: BLE001 — deliver to callers
                failed = True
                for t in batch:
                    t.error = e
            finally:
                with self._cond:
                    self.stats["requests_total"] += len(batch)
                    self.stats["dispatches_total"] += 1
                    self.stats["dispatch_seconds_total"] += (
                        time.monotonic() - t0)
                    if failed:
                        self.stats["errors_total"] += len(batch)
                for t in batch:
                    t.event.set()


def make_server(endpoint: StableDiffusionInference, host: str = "0.0.0.0",
                port: int = 8000, max_batch_size: int = 8,
                batch_wait_ms: float = 20.0) -> ThreadingHTTPServer:
    batcher = Batcher(endpoint, max_batch_size=max_batch_size,
                      batch_wait_ms=batch_wait_ms)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._send(200, {"status": "ok"})
            elif self.path == "/stats":
                self._send(200, batcher.snapshot())
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                inputs = json.loads(self.rfile.read(length) or b"{}")
                images = batcher.submit(inputs)
                self._send(200, {"images": images})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quieter default logging
            pass

    server = ThreadingHTTPServer((host, port), Handler)
    server.batcher = batcher  # for tests/introspection
    return server


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model-name", default=None,
                   help="ported-HF-weights dir (tools/port_weights.py); "
                        "pair with --pretrained so the frozen VAE/CLIP "
                        "towers are real")
    p.add_argument("--pretrained", action="store_true",
                   help="load --model-name as pretrained weights (required "
                        "for real serving: a trainer --checkpoint restores "
                        "only the UNet, never the frozen towers)")
    p.add_argument("--allow-random-frozen", action="store_true",
                   help="serve a checkpoint over RANDOM frozen towers "
                        "(CI/smoke only — images are garbage)")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch-size", type=int, default=8)
    p.add_argument("--batch-wait-ms", type=float, default=20.0)
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache dir — a restarted "
                        "server replays compiled samplers from disk instead "
                        "of re-compiling for minutes (also honors "
                        "$DIFFUSION_TPU_COMPILE_CACHE)")
    args = p.parse_args()
    from diffusion_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache(args.compile_cache)
    endpoint = StableDiffusionInference(
        checkpoint_path=args.checkpoint, model_name=args.model_name,
        pretrained=args.pretrained,
        allow_random_frozen=args.allow_random_frozen,
        default_size=args.size)
    server = make_server(endpoint, args.host, args.port,
                         max_batch_size=args.max_batch_size,
                         batch_wait_ms=args.batch_wait_ms)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
