"""HTTP serving front-end over the ServingEngine.

Completes the deployment story (the reference ships only a single-
sample Python helper, README.md:60-112): a threaded stdlib HTTP server
exposing the micro-batched engine. Endpoints:

- ``GET /healthz``            -> {"status": "ok", "prompt_sets": [...]}
- ``GET /prompt_sets``        -> registered sets and their prompts
- ``POST /predict?prompt_set=NAME[&maps=none|patch|full]``
      body: raw JPEG bytes (Content-Type: image/jpeg) or a decoded
      image as JSON {"image": [[...]]}.
      -> {"probs": [...], "prompts": [...],
          "similarity_maps": [[...]] | null}

Concurrency model: the HTTP layer is a ThreadingHTTPServer — each
request thread submits to the engine and blocks on its Future, so
requests arriving together ride the same device micro-batch (that is
the engine's whole point). stdlib-only; for production put any
load-balancer/TLS terminator in front.

Usage:
    server = EngineServer(engine, prompts={"cxr14": [...]})
    server.start(port=8080)           # background thread
    ...
    server.stop()

or end-to-end from a converted checkpoint:
    python -m radzero_tpu.eval.server --ckpt CONVERTED_DIR --port 8080
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from radzero_tpu.eval.serving import ServingEngine
from radzero_tpu.utils.logging import logger


class _Handler(BaseHTTPRequestHandler):
    server_ref: "EngineServer" = None  # set per-class by EngineServer

    # ------------------------------------------------------------------
    def _json(self, code: int, payload: dict) -> None:
        data = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):  # noqa: N802
        srv = type(self).server_ref
        path = urlparse(self.path).path
        if path == "/healthz":
            self._json(200, {"status": "ok",
                             "prompt_sets": sorted(srv.prompts)})
        elif path == "/prompt_sets":
            self._json(200, srv.prompts)
        else:
            self._json(404, {"error": f"unknown path {path}"})

    def do_POST(self):  # noqa: N802
        srv = type(self).server_ref
        url = urlparse(self.path)
        if url.path != "/predict":
            self._json(404, {"error": f"unknown path {url.path}"})
            return
        q = parse_qs(url.query)
        prompt_set = q.get("prompt_set", [None])[0]
        maps = q.get("maps", ["none"])[0]
        if prompt_set not in srv.prompts:
            self._json(400, {"error": f"unknown prompt_set {prompt_set!r}"})
            return
        if maps not in ("none", "patch", "full"):
            self._json(400, {"error": f"maps must be none|patch|full, got {maps!r}"})
            return
        body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
        ctype = self.headers.get("Content-Type", "application/octet-stream")
        try:
            if ctype.startswith("application/json"):
                image = np.asarray(json.loads(body)["image"], np.uint8)
            else:
                image = bytes(body)  # JPEG bytes
            fut = srv.engine.submit(image, prompt_set, want_maps=maps)
            out = fut.result(timeout=srv.request_timeout)
        except Exception as e:
            self._json(500, {"error": f"{type(e).__name__}: {e}"})
            return
        resp = {
            "prompts": srv.prompts[prompt_set],
            "probs": np.asarray(out["probs"]).tolist(),
            "similarity_maps": (
                np.asarray(out["similarity_maps"]).tolist()
                if out["similarity_maps"] is not None else None
            ),
        }
        self._json(200, resp)

    def log_message(self, fmt, *args):  # route through our logger
        logger.debug("http: " + fmt % args)


class EngineServer:
    def __init__(
        self,
        engine: ServingEngine,
        prompts: Dict[str, List[str]],
        request_timeout: float = 120.0,
    ):
        self.engine = engine
        self.prompts = dict(prompts)
        self.request_timeout = request_timeout
        for name, plist in self.prompts.items():
            engine.register_prompt_set(name, plist)
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_port

    def start(self, host: str = "0.0.0.0", port: int = 0) -> int:
        handler = type("BoundHandler", (_Handler,), {"server_ref": self})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        logger.info(f"serving on {host}:{self.port}")
        return self.port

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.stop()
        return False


def main():  # pragma: no cover - manual entry
    import argparse

    import jax.numpy as jnp

    from radzero_tpu.data.processing import BlipStyleImageProcessor
    from radzero_tpu.data.tokenizer import load_tokenizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="converted checkpoint dir")
    ap.add_argument("--bundle", help="AOT bundle dir (cold start)")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--prompts_json", help='{"set_name": ["There is X", ...]}')
    ap.add_argument("--tokenizer", default="sentence-transformers/all-mpnet-base-v2")
    args = ap.parse_args()

    proc = BlipStyleImageProcessor(size=518)
    tok = load_tokenizer(args.tokenizer)
    if args.bundle:
        engine = ServingEngine.from_bundle(args.bundle, proc, tok)
    else:
        import jax

        from radzero_tpu.models.configuration import RadZeroConfig
        from radzero_tpu.models.radzero import init_radzero

        cfg = RadZeroConfig()
        if args.ckpt:
            import os
            import sys

            sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
            from tools.run_real_checkpoint import load_converted

            params, cfg = load_converted(args.ckpt)
        else:
            params = init_radzero(jax.random.PRNGKey(0), cfg)
        engine = ServingEngine(params, cfg, proc, tok, max_batch=32,
                               dtype=jnp.bfloat16, channels=1)

    prompts = {"default": ["There is pneumothorax"]}
    if args.prompts_json:
        with open(args.prompts_json) as f:
            prompts = json.load(f)

    with engine, EngineServer(engine, prompts) as server:
        server.engine.warmup()
        server.start(port=args.port)
        threading.Event().wait()  # serve until killed


if __name__ == "__main__":
    main()
