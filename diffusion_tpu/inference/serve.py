"""Minimal HTTP serving wrapper around StableDiffusionInference.

TPU-native equivalent of the reference's mcli/uvicorn deployment (reference:
diffusion/inference/mosaic_inference.yaml:14-17 deploys `serve:app` with
uvicorn; inference/README.md:21-25). Stdlib http.server keeps this image
dependency-free; swap in any ASGI server by wrapping `endpoint.predict`.

  python -m diffusion_tpu.inference.serve --checkpoint <dir> --port 8000

POST /predict  {"prompt": "...", "guidance_scale": 7.5, ...}
  -> {"images": ["<base64 png>", ...]}
GET  /health   -> {"status": "ok"}
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from diffusion_tpu.inference.inference_model import StableDiffusionInference

__all__ = ["make_server", "main"]


def make_server(endpoint: StableDiffusionInference, host: str = "0.0.0.0",
                port: int = 8000) -> ThreadingHTTPServer:
    lock = threading.Lock()  # one generation at a time per chip

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
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "unknown path"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                inputs = json.loads(self.rfile.read(length) or b"{}")
                with lock:
                    images = endpoint.predict(**inputs)
                self._send(200, {"images": images})
            except ValueError as e:
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — surface to the client
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quieter default logging
            pass

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model-name", default=None)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args()
    endpoint = StableDiffusionInference(checkpoint_path=args.checkpoint,
                                        model_name=args.model_name,
                                        default_size=args.size)
    server = make_server(endpoint, args.host, args.port)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
