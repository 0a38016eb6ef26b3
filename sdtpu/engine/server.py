"""Minimal HTTP serving layer over the Context.

The reference ships a C API intended for embedding in an app
(reference: README.md:15 "future Android app"); the TPU-side deployment
story is a service. This is a dependency-free (stdlib) HTTP front end:

    POST /generate  {"prompt": "...", "guidance": 7.5, "seed": 1,
                     "negative_prompt": "...", "format": "png"|"raw"}
      -> image/png bytes (or application/octet-stream raw uint8 HWC)
    GET /healthz    -> {"status": "ok", ...engine info}

Requests are serialized through one device context (single TPU chip = one
queue; batching across requests is the parallel/ mesh's job). For
production-scale serving put N processes behind a load balancer, one per
chip/mesh.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def make_handler(ctx, lock: threading.Lock):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through engine logging
            ctx.logger.debug("http: " + fmt % args)

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path != "/healthz":
                return self._json(404, {"error": "not found"})
            import jax

            self._json(200, {
                "status": "ok",
                "backend": jax.default_backend(),
                "image_size": ctx.cfg.image_size,
                "steps": ctx.steps,
                "sampler": ctx.sampler,
            })

        def do_POST(self):
            if self.path != "/generate":
                return self._json(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                prompt = req.get("prompt")
                if not isinstance(prompt, str) or not prompt.strip():
                    return self._json(400, {"error": "missing 'prompt'"})
                guidance = float(req.get("guidance", 7.5))
                seed = req.get("seed")
                neg = req.get("negative_prompt")
                fmt = req.get("format", "png")
                with lock:  # one device queue
                    img = ctx.generate(
                        prompt, guidance=guidance,
                        seed=int(seed) if seed is not None else None,
                        negative_prompt=neg,
                    )
                if fmt == "raw":
                    return self._send(200, img.tobytes(),
                                      "application/octet-stream")
                from PIL import Image

                buf = io.BytesIO()
                Image.fromarray(img).save(buf, format="PNG")
                return self._send(200, buf.getvalue(), "image/png")
            except Exception as e:  # noqa: BLE001
                ctx.logger.error(f"/generate failed: {e}")
                return self._json(500, {"error": str(e)})

    return Handler


def serve(ctx, host: str = "127.0.0.1", port: int = 8000,
          ready_event: threading.Event | None = None):
    """Blocking serve loop. `ready_event` is set once the socket is bound."""
    lock = threading.Lock()
    httpd = ThreadingHTTPServer((host, port), make_handler(ctx, lock))
    ctx.logger.info(f"serving on http://{host}:{httpd.server_address[1]}")
    if ready_event is not None:
        serve.last_server = httpd  # test hook
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
