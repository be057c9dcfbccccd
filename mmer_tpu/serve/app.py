"""HTTP API with the reference's route/response contract, stdlib-only.

Routes (reference back-end/app/main.py, routers/ping.py, routers/infer.py):
- ``GET /ping``    → ``{"message": "pong"}``
- ``GET /health``  → ``{"status": "ok"}``
- ``POST /infer/?subchunk_size=32&window_size=5&explain=false`` with a
  multipart ``file`` field → ``{"bounding_box": [...], "inference": [...]}``;
  500 + ``{"detail": ...}`` on processing errors.
- ``POST /remux/`` with a multipart ``file`` field holding an FLV → the
  same media as ``video/mp4``.  H.264 + AAC/MP3 FLVs are byte-copied
  (serve/remux.py, pure Python); other video codecs fall back to a cv2
  ``mp4v`` transcode with the audio track still byte-copied when
  possible (serve/transcode.py) — the server-side mirror of the
  reference's in-browser ffmpeg.wasm copy→libx264→mpeg4 chain
  (front-end VideoPlayer.tsx:336-441); 415 + ``{"detail": ...}`` only
  when both routes fail.
- ``GET /`` + ``GET /static/*`` → the no-build frontend
  (frontend/static/, an ES-module twin of the Vite app) so the full UI is
  servable from this image with zero toolchain; the reference needs a
  separate node-built nginx image for this (front-end/Dockerfile).

Why not FastAPI: this deployment image has no fastapi/uvicorn/starlette, so
the server is a threaded stdlib ``http.server`` with a small multipart
parser — zero dependencies, same wire contract (CORS headers included for
the dev frontend origins, main.py:15-21).  If FastAPI is available in the
target environment, ``build_fastapi_app`` returns the equivalent ASGI app.

TPU note: the engine serializes device work with a lock — JAX dispatch is
thread-safe but interleaving large inference batches from concurrent
uploads only thrashes HBM; requests queue instead (uvicorn's worker model
in the reference behaves the same way per process, start.sh:14).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from mmer_tpu.serve.engine import InferenceEngine

CORS_ORIGINS = {"http://localhost:5173", "http://localhost:3000"}

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

# No-build frontend (frontend/static/): the reference serves its React SPA
# from a separate node-built nginx image (front-end/Dockerfile); this image
# has no node, so the backend itself serves a dependency-free ES-module
# twin of the Vite app.  An explicit allowlist (not a directory walk) —
# there is no path under an attacker-controlled name to traverse.
# /static/app.css is the SAME stylesheet the Vite app imports, so the two
# frontends cannot drift visually.
STATIC_ROUTES = {
    "/": (os.path.join(_REPO_ROOT, "frontend", "static", "index.html"),
          "text/html; charset=utf-8"),
    "/static/app.js": (
        os.path.join(_REPO_ROOT, "frontend", "static", "app.js"),
        "application/javascript; charset=utf-8"),
    "/static/app.css": (
        os.path.join(_REPO_ROOT, "frontend", "src", "app.css"),
        "text/css; charset=utf-8"),
}

# Default deployable checkpoint: what scripts/make_flagship.py writes.
# Overridable via MMER_FLAGSHIP_DIR for relocated deployments.
FLAGSHIP_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "artifacts", "flagship")


def resolve_default_fusion(flagship_dir: Optional[str] = None):
    """Locate the in-repo flagship checkpoint for a bare server start.

    Returns ``(fusion_params_path, norm_stats_path, model_config_dict)``
    — any of which may be None when the corresponding artifact is absent.
    The reference's bare start silently serves RANDOM fusion weights
    (inference.py:236-265 catches the load failure and keeps the random
    init); here a bare ``python -m mmer_tpu.serve.app`` serves the
    measured-best model when one has been built, and warns loudly when
    it hasn't (main() below) instead of quietly degrading.
    """
    d = flagship_dir or os.environ.get("MMER_FLAGSHIP_DIR", FLAGSHIP_DIR)
    manifest_path = os.path.join(d, "manifest.json")
    if not os.path.exists(manifest_path):
        return None, None, None
    try:
        with open(manifest_path) as f:
            manifest = json.load(f)
    except (OSError, ValueError):
        return None, None, None
    ckpt = manifest.get("checkpoint")
    if not ckpt:
        return None, None, None
    # The manifest records the path as written at build time (often
    # relative to the repo root); the artifact lives next to the
    # manifest, so resolve by basename against the manifest's own dir.
    cand = os.path.join(d, os.path.basename(ckpt))
    if not os.path.exists(cand):
        return None, None, None
    ns = os.path.join(d, "norm_stats.npz")
    return (cand, ns if os.path.exists(ns) else None,
            manifest.get("model_config"))

# Uploads above this are rejected with 413 BEFORE the body is read: the
# threaded stdlib server buffers each upload in RAM (and /remux then holds
# FLV + mdat + MP4 copies at once), so an unbounded Content-Length could
# exhaust host memory.  Override per-server via ``serve(max_upload_bytes=…)``
# / ``--max_upload_mb``.
DEFAULT_MAX_UPLOAD_BYTES = 1 << 30      # 1 GiB


def parse_multipart(body: bytes, content_type: str) -> Dict[str, Tuple[str, bytes]]:
    """Minimal multipart/form-data parser → {field: (filename, payload)}.

    Python 3.13 removed the ``cgi`` module; this covers the subset the
    ``/infer/`` route needs (opaque binary file fields).
    """
    m = re.search(r'boundary="?([^";]+)"?', content_type)
    if not m:
        raise ValueError("multipart boundary missing")
    boundary = m.group(1).encode()
    out: Dict[str, Tuple[str, bytes]] = {}
    # RFC 2046: parts are delimited by CRLF "--" boundary; the payload is
    # everything between its header blank line and the NEXT delimiter, so
    # splitting on the full delimiter keeps binary payloads that end in
    # 0x0D/0x0A bytes intact (a bare .strip(b"\r\n") would corrupt them).
    chunks = body.split(b"\r\n--" + boundary)
    if chunks and chunks[0].startswith(b"--" + boundary):
        # First boundary is not CRLF-preceded; strip just the delimiter.
        chunks[0] = chunks[0][len(boundary) + 2:]
    for part in chunks:
        # Valid parts start with CRLF then headers; the closing chunk is
        # "--" (optionally + CRLF) and any preamble lacks the leading CRLF.
        if not part.startswith(b"\r\n"):
            continue
        part = part[2:]
        if b"\r\n\r\n" not in part:
            continue
        header_blob, payload = part.split(b"\r\n\r\n", 1)
        headers = header_blob.decode("utf-8", "replace")
        name_m = re.search(r'name="([^"]*)"', headers)
        if not name_m:
            continue
        file_m = re.search(r'filename="([^"]*)"', headers)
        out[name_m.group(1)] = (file_m.group(1) if file_m else "", payload)
    return out


def _query_bool(q: Dict, key: str, default: bool = False) -> bool:
    if key not in q:
        return default
    return q[key][0].lower() in ("1", "true", "yes", "on")


def make_handler(engine: InferenceEngine,
                 max_upload_bytes: int = DEFAULT_MAX_UPLOAD_BYTES,
                 extra_static: Optional[Dict[str, Tuple[str, str]]] = None):
    lock = threading.Lock()
    static_routes = dict(STATIC_ROUTES)
    if extra_static:
        static_routes.update(extra_static)

    class Handler(BaseHTTPRequestHandler):
        server_version = "mmer_tpu/0.1"

        def _send_json(self, code: int, payload: Dict) -> None:
            data = json.dumps(payload).encode()
            self.send_response(code)
            origin = self.headers.get("Origin", "")
            if origin in CORS_ORIGINS:
                self.send_header("Access-Control-Allow-Origin", origin)
                self.send_header("Access-Control-Allow-Credentials", "true")
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_OPTIONS(self):  # CORS preflight
            self.send_response(204)
            origin = self.headers.get("Origin", "")
            if origin in CORS_ORIGINS:
                self.send_header("Access-Control-Allow-Origin", origin)
                self.send_header("Access-Control-Allow-Credentials", "true")
            self.send_header("Access-Control-Allow-Methods", "*")
            self.send_header("Access-Control-Allow-Headers", "*")
            self.end_headers()

        def _send_file(self, fs_path: str, content_type: str) -> None:
            try:
                with open(fs_path, "rb") as f:
                    data = f.read()
            except OSError:
                self._send_json(404, {"detail": "Not Found"})
                return
            self.send_response(200)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = urlparse(self.path).path.rstrip("/") or "/"
            if path == "/ping":
                self._send_json(200, {"message": "pong"})
            elif path == "/health":
                self._send_json(200, {"status": "ok"})
            elif path in static_routes:
                self._send_file(*static_routes[path])
            else:
                self._send_json(404, {"detail": "Not Found"})

        def _read_upload(self) -> Optional[Tuple[str, bytes]]:
            """Multipart body → (filename, payload) or None after a
            413 (too large) / 422 (missing field) response."""
            length = int(self.headers.get("Content-Length", "0"))
            if length > max_upload_bytes:
                # Reject before reading the body so an oversized upload
                # never materializes in RAM.
                self._send_json(413, {
                    "detail": f"upload of {length} bytes exceeds the "
                              f"{max_upload_bytes}-byte limit"})
                self.close_connection = True
                return None
            body = self.rfile.read(length)
            fields = parse_multipart(body,
                                     self.headers.get("Content-Type", ""))
            if "file" not in fields:
                self._send_json(422, {"detail": "missing 'file' field"})
                return None
            return fields["file"]

        def _do_remux(self) -> None:
            from mmer_tpu.serve.remux import RemuxError
            from mmer_tpu.serve.transcode import flv_preview_mp4

            upload = self._read_upload()
            if upload is None:
                return
            filename, payload = upload
            try:
                mp4, mode = flv_preview_mp4(payload)
            except RemuxError as e:
                self._send_json(415, {"detail": str(e)})
                return
            self.send_response(200)
            origin = self.headers.get("Origin", "")
            if origin in CORS_ORIGINS:
                self.send_header("Access-Control-Allow-Origin", origin)
                self.send_header("Access-Control-Allow-Credentials", "true")
            self.send_header("Content-Type", "video/mp4")
            self.send_header("Content-Length", str(len(mp4)))
            self.end_headers()
            self.wfile.write(mp4)
            print(f"/remux: {filename} ({len(payload)} B FLV → "
                  f"{len(mp4)} B MP4, {mode})", flush=True)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path.rstrip("/") == "/remux":
                try:
                    self._do_remux()
                except Exception as e:
                    traceback.print_exc()
                    self._send_json(500, {"detail": str(e)})
                return
            if url.path.rstrip("/") != "/infer":
                self._send_json(404, {"detail": "Not Found"})
                return
            q = parse_qs(url.query)
            try:
                upload = self._read_upload()
                if upload is None:
                    return
                filename, payload = upload
                print(f"Received /infer request for file: {filename}",
                      flush=True)
                with lock:
                    results = engine.infer_file_bytes(
                        payload, filename,
                        subchunk_size=int(q.get("subchunk_size", ["32"])[0]),
                        window_size=int(q.get("window_size", ["5"])[0]),
                        explain=_query_bool(q, "explain"),
                        detect_every=int(q.get("detect_every", ["1"])[0]))
                print(f"/infer finished; bounding_box="
                      f"{len(results['bounding_box'])}, "
                      f"inference={len(results['inference'])}", flush=True)
                self._send_json(200, results)
            except Exception as e:
                traceback.print_exc()
                self._send_json(500, {"detail": str(e)})

        def log_message(self, fmt, *args):  # quiet default access log
            pass

    return Handler


def serve(engine: Optional[InferenceEngine] = None, host: str = "0.0.0.0",
          port: int = 8000,
          max_upload_bytes: int = DEFAULT_MAX_UPLOAD_BYTES,
          extra_static: Optional[Dict[str, Tuple[str, str]]] = None
          ) -> ThreadingHTTPServer:
    """Start the API server (blocking; returns the server if shut down)."""
    engine = engine or InferenceEngine()
    httpd = ThreadingHTTPServer((host, port),
                                make_handler(engine, max_upload_bytes,
                                             extra_static=extra_static))
    print(f"mmer_tpu API listening on {host}:{port}", flush=True)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    return httpd


def build_fastapi_app(engine: Optional[InferenceEngine] = None):
    """Equivalent FastAPI app for environments that have it (gated)."""
    from fastapi import FastAPI, File, HTTPException, UploadFile
    from fastapi.middleware.cors import CORSMiddleware
    from fastapi.responses import JSONResponse

    engine = engine or InferenceEngine()
    app = FastAPI(title="Multi-Modal Emotion Recognition API (TPU)",
                  version="0.1.0")
    app.add_middleware(CORSMiddleware, allow_origins=list(CORS_ORIGINS),
                       allow_credentials=True, allow_methods=["*"],
                       allow_headers=["*"])

    @app.get("/ping")
    async def ping():
        return {"message": "pong"}

    @app.get("/health")
    async def health():
        return {"status": "ok"}

    @app.post("/remux/", status_code=200)
    async def remux(file: UploadFile = File(...)):
        from fastapi.responses import Response

        from mmer_tpu.serve.remux import RemuxError
        from mmer_tpu.serve.transcode import flv_preview_mp4

        data = await file.read()
        try:
            mp4, _ = flv_preview_mp4(data)
        except RemuxError as e:
            raise HTTPException(status_code=415, detail=str(e))
        return Response(content=mp4, media_type="video/mp4")

    @app.post("/infer/", status_code=200)
    async def infer(file: UploadFile = File(...), subchunk_size: int = 32,
                    window_size: int = 5, explain: bool = False,
                    detect_every: int = 1):
        try:
            data = await file.read()
            results = engine.infer_file_bytes(
                data, file.filename or "upload.mp4",
                subchunk_size=subchunk_size, window_size=window_size,
                explain=explain, detect_every=detect_every)
        except Exception as e:
            raise HTTPException(status_code=500, detail=str(e))
        return JSONResponse(content=results)

    return app


_TRI = {"auto": None, "on": True, "off": False}


def main():
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    parser = argparse.ArgumentParser(description="mmer_tpu serving API")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--fusion_params", default=None,
                        help="fusion checkpoint: .msgpack (trainer) or "
                             ".pth (reference, converted on load); a "
                             "comma-separated list serves a seed ENSEMBLE "
                             "(one vmapped program, mean-probability "
                             "blend — train/ensemble.py semantics)")
    parser.add_argument("--vivit_params", default=None)
    parser.add_argument("--wav_params", default=None)
    parser.add_argument("--norm_stats", default=None,
                        help="norm_stats_*.npz from the training run")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile default-request graphs at startup")
    parser.add_argument("--vivit_flash", nargs="?", const="on",
                        default="auto", choices=("auto", "on", "off"),
                        help="Pallas (flash-attn + fused-FFN) ViViT in "
                             "serving: ~9 ms faster per request but a "
                             "fresh restart re-pays a multi-minute Mosaic "
                             "compile (process-unstable cache key). "
                             "'auto' (default) engages it exactly when a "
                             "restart provably skips the compile: AOT "
                             "executable loads are proven on this backend "
                             "and a cached executable exists (core/aot.py)")
    parser.add_argument("--wav_pallas", nargs="?", const="on",
                        default="auto", choices=("auto", "on", "off"),
                        help="fused Pallas conv encoder in the audio "
                             "model: same trade and same 'auto' semantics "
                             "as --vivit_flash")
    parser.add_argument("--max_upload_mb", type=int,
                        default=DEFAULT_MAX_UPLOAD_BYTES >> 20,
                        help="reject uploads larger than this with 413")
    parser.add_argument("--warmup_resolutions", default="",
                        help="comma-separated HxW video formats to also "
                             "pre-compile the crop graph for, e.g. "
                             "'480x640,720x1280' (first upload of an "
                             "unwarmed resolution bucket pays a small "
                             "compile)")
    parser.add_argument("--warmup_upload", default=None, metavar="PATH",
                        help="video file replayed end-to-end as the last "
                             "warmup phase — warms the ~12 small "
                             "request-path graphs the enumerated warmup "
                             "cannot reach, so the FIRST real request "
                             "runs at steady-state latency; use a "
                             "representative clip (real face + audio, "
                             "production resolution)")
    args = parser.parse_args()
    if args.warmup_upload and not os.path.exists(args.warmup_upload):
        parser.error(f"--warmup_upload file not found: {args.warmup_upload}")
    if (args.warmup_upload or args.warmup_resolutions) and not args.warmup:
        # Asking for specific warming clearly implies warming at all —
        # silently starting cold would defeat both flags (review r5).
        args.warmup = True
    model_cfg = None
    if args.fusion_params is None:
        ckpt, ns, mc = resolve_default_fusion()
        if ckpt is not None:
            args.fusion_params = ckpt
            if args.norm_stats is None:
                args.norm_stats = ns
            if mc:
                from mmer_tpu.config import ModelConfig
                model_cfg = ModelConfig(**mc)
            print(f"serving flagship checkpoint: {ckpt}"
                  f" (norm stats: {args.norm_stats})")
        else:
            print("WARNING: no --fusion_params given and no flagship "
                  "artifact found — serving UNTRAINED (random-init) "
                  "fusion weights. Build one with "
                  "`python scripts/make_flagship.py` or pass a "
                  "checkpoint explicitly.")
    engine = InferenceEngine(model_cfg=model_cfg,
                             fusion_params_path=args.fusion_params,
                             vivit_params_path=args.vivit_params,
                             wav_params_path=args.wav_params,
                             norm_stats_path=args.norm_stats,
                             vivit_use_flash=_TRI[args.vivit_flash],
                             wav_use_pallas=_TRI[args.wav_pallas])
    if args.warmup:
        resolutions = []
        for part in filter(None, args.warmup_resolutions.split(",")):
            try:
                h, w = part.lower().strip().split("x")
                resolutions.append((int(h), int(w)))
            except ValueError:
                parser.error(f"--warmup_resolutions entry {part!r} is not "
                             f"HxW (e.g. '480x640')")
        sample = None
        if args.warmup_upload:
            with open(args.warmup_upload, "rb") as f:
                sample = f.read()
        engine.warmup(resolutions=resolutions, sample_upload=sample)
    serve(engine, args.host, args.port,
          max_upload_bytes=args.max_upload_mb << 20)


if __name__ == "__main__":
    main()
