"""Minimal production inference service over HTTP (stdlib only).

The reference ships batch scripts (``test_image/test.py``); a serving
deployment needs a long-lived process that holds the compiled model. This
wraps :class:`~esrganplus_tpu.infer.SRInferencer` behind three endpoints:

    python -m esrganplus_tpu.cli.serve MODEL.pth [--host 127.0.0.1]
        [--port 8971] [--dtype bf16|fp32] [--pad-multiple 32] [--x8]
        [--tile N] [--noise-seed N]

  * ``POST /upscale`` — body: encoded image bytes (PNG/JPEG/...; BGR file
    conventions as everywhere else) → PNG bytes of the ×N result.
  * ``GET /healthz`` — model/config/device JSON (200 once the warmup
    compile finished — readiness probe).
  * ``GET /stats`` — request counter, output megapixels, latency EWMA.

Serving notes (docs/DEPLOYMENT.md): jit compiles per input shape, so the
default pads inputs to a multiple of 32 (interior-exact, borders cropped
back — identical pixels to the unpadded forward everywhere but within the
receptive field of the pad edge, which the crop discards... the pad is
edge-replication: values differ only OUTSIDE the requested image and are
cropped). Device dispatch is serialized with a lock (one chip, one stream);
run one process per chip and load-balance above for scale-out. ``--tile``
switches to derived-halo tiling for arbitrarily large inputs at a bounded
compile-shape count.
"""

from __future__ import annotations

import argparse
import json
import threading
import time


def build_handler(inferencer, mode, stats: dict, lock: threading.Lock):
    """``mode``: the per-request upscale callable picked by make_server
    (plain / tiled / x8) — NOT an instance patch: ``upscale_x8`` calls
    ``self.upscale`` internally, so rebinding the method would recurse."""
    from http.server import BaseHTTPRequestHandler

    from esrganplus_tpu.ops.image_io import decode_img, encode_png, img2tensor, tensor2img

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet; stats carry the signal
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                cfg = inferencer.cfg
                self._json(200, {
                    "status": "ok",
                    "model": {"nb": cfg.nb, "nf": cfg.nf, "gc": cfg.gc,
                              "upscale": cfg.upscale},
                    "requests": stats["requests"],
                })
            elif self.path == "/stats":
                self._json(200, dict(stats))
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/upscale":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = decode_img(self.rfile.read(n))
            except Exception as e:
                self._json(400, {"error": f"bad image payload: {e}"})
                return
            t0 = time.perf_counter()
            try:
                rgb = img2tensor(img)
                with lock:
                    out = mode(rgb)
                png = encode_png(tensor2img(out))
            except Exception as e:  # surface as a 500, keep serving
                self._json(500, {"error": str(e)})
                return
            dt = time.perf_counter() - t0
            with lock:  # ThreadingHTTPServer: read-modify-writes must not race
                stats["requests"] += 1
                stats["out_mpix"] = round(
                    stats["out_mpix"] + out.shape[0] * out.shape[1] / 1e6, 3)
                ewma = stats["latency_ewma_s"]
                stats["latency_ewma_s"] = round(
                    dt if ewma == 0 else 0.9 * ewma + 0.1 * dt, 4)
            self._send(200, png, "image/png")

    return Handler


def make_server(args):
    """Build (server, inferencer) — separated from main() for tests."""
    import jax.numpy as jnp

    from esrganplus_tpu.infer import SRInferencer, load_generator

    params, cfg, info = load_generator(args.model)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    noise_rng = None
    if args.noise_seed is not None:
        import jax

        noise_rng = jax.random.PRNGKey(args.noise_seed)
    inf = SRInferencer(params, cfg, dtype=dtype,
                       pad_multiple=args.pad_multiple or None,
                       noise_rng=noise_rng)
    if args.tile and args.x8:
        raise SystemExit("--tile and --x8 are mutually exclusive (the "
                         "self-ensemble is not defined per tile)")
    if args.tile:
        mode = lambda rgb: inf.upscale_tiled(rgb, tile=args.tile)
    elif args.x8:
        mode = inf.upscale_x8
    else:
        mode = inf.upscale

    # warm up THE SERVING PATH at one canonical shape so /healthz means
    # "ready" (a tiled or x8 server must compile its own programs here,
    # not the plain forward's)
    import numpy as np

    m = max(args.pad_multiple or 32, args.tile or 0)
    mode(np.zeros((m, m, 3), np.float32))

    from http.server import ThreadingHTTPServer

    stats = {"requests": 0, "out_mpix": 0.0, "latency_ewma_s": 0.0}
    handler = build_handler(inf, mode, stats, threading.Lock())
    return ThreadingHTTPServer((args.host, args.port), handler), inf


def main(argv=None):
    from esrganplus_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description="ESRGAN+ inference service (TPU)")
    ap.add_argument("model", help="path to RRDBNet .pth checkpoint")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8971)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--pad-multiple", type=int, default=32,
                    help="pad inputs to a multiple to bound the jit compile "
                         "count (0 = exact shapes, compiles per size)")
    ap.add_argument("--tile", type=int, default=0,
                    help="tile large inputs with a derived halo (0 = off)")
    ap.add_argument("--x8", action="store_true",
                    help="geometric self-ensemble per request (8 variants)")
    ap.add_argument("--noise-seed", type=int, default=None)
    args = ap.parse_args(argv)
    server, _ = make_server(args)
    print(f"serving on http://{args.host}:{server.server_address[1]} "
          f"(POST /upscale, GET /healthz, GET /stats)", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
