"""The no-build frontend (frontend/static/) served by the backend.

The reference ships its UI as a node-built nginx image
(front-end/Dockerfile); this image has no node, so the backend serves a
dependency-free ES-module twin of the Vite app (GET / + /static/*,
mmer_tpu/serve/app.py STATIC_ROUTES).  Covered here:

- HTTP serving: content types, body markers, allowlist-only routing
  (no directory walk → no traversal surface).
- Drift locks between the static app and the rest of the repo: the
  emotion palette matches frontend/src/types.ts, the endpoints the JS
  calls are exactly routes the server implements, and the served
  stylesheet IS the Vite app's stylesheet.
"""

from __future__ import annotations

import json
import os
import re
import threading
import urllib.error
import urllib.request

import pytest

from mmer_tpu.config import ModelConfig, ViViTConfig
from mmer_tpu.serve.app import STATIC_ROUTES, make_handler
from mmer_tpu.serve.engine import InferenceEngine

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
STATIC = os.path.join(ROOT, "frontend", "static")


@pytest.fixture(scope="module")
def live_server():
    from http.server import ThreadingHTTPServer

    engine = InferenceEngine(
        model_cfg=ModelConfig(max_seq_len=3, fusion_layers=1,
                              compute_dtype="float32"),
        vivit_cfg=ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                              num_frames=4, tubelet_size=2, dim=768,
                              depth=1, heads=2, dim_head=32, mlp_dim=64,
                              compute_dtype="float32"))
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path) as r:
        return r.headers.get("Content-Type", ""), r.read()


def test_index_served_at_root(live_server):
    ctype, body = _get(live_server, "/")
    assert ctype.startswith("text/html")
    text = body.decode()
    assert '<script type="module" src="/static/app.js">' in text
    assert "Multi-Modal Emotion Recognition" in text
    # Every element id app.js touches exists in the page.
    js = open(os.path.join(STATIC, "app.js")).read()
    for el_id in set(re.findall(r'\$\("([\w-]+)"\)', js)):
        assert f'id="{el_id}"' in text, f"app.js uses missing #{el_id}"


def test_app_js_served(live_server):
    ctype, body = _get(live_server, "/static/app.js")
    assert "javascript" in ctype
    assert body == open(os.path.join(STATIC, "app.js"), "rb").read()


def test_css_is_the_vite_apps_stylesheet(live_server):
    ctype, body = _get(live_server, "/static/app.css")
    assert ctype.startswith("text/css")
    vite_css = open(os.path.join(ROOT, "frontend", "src", "app.css"),
                    "rb").read()
    assert body == vite_css


def test_static_routing_is_allowlist_only(live_server):
    for path in ("/static/../../pyproject.toml", "/static/nope.js",
                 "/frontend/static/app.js", "/index.html"):
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(live_server + path)
        assert exc.value.code == 404


def test_static_route_files_exist():
    for fs_path, _ctype in STATIC_ROUTES.values():
        assert os.path.exists(fs_path), fs_path


def test_js_calls_only_routes_the_server_implements():
    js = open(os.path.join(STATIC, "app.js")).read()
    fetches = re.findall(r"fetch\(`\$\{BASE\}(/[\w/]*)", js)
    assert set(fetches) == {"/health", "/infer/", "/remux/"}


def test_emotion_palette_matches_vite_types():
    """EMOTION_COLORS in app.js == frontend/src/types.ts (drift lock)."""
    def parse_colors(path):
        text = open(path).read()
        block = re.search(r"EMOTION_COLORS[^{]*\{([^}]*)\}", text).group(1)
        return dict(re.findall(r'(\w+):\s*"(#[0-9a-fA-F]{6})"', block))

    js_colors = parse_colors(os.path.join(STATIC, "app.js"))
    ts_colors = parse_colors(os.path.join(ROOT, "frontend", "src",
                                          "types.ts"))
    assert js_colors == ts_colors
    assert set(js_colors) == {"NEU", "HAP", "SAD", "ANG", "FEA", "DIS"}


def test_extra_static_mounts(tmp_path, live_server):
    """serve(extra_static=...) exposes demo media (scripts/demo_frontend)."""
    from http.server import ThreadingHTTPServer

    payload = b"\x00\x01demo-bytes"
    p = tmp_path / "demo.mp4"
    p.write_bytes(payload)
    engine = InferenceEngine(
        model_cfg=ModelConfig(max_seq_len=3, fusion_layers=1,
                              compute_dtype="float32"),
        vivit_cfg=ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                              num_frames=4, tubelet_size=2, dim=768,
                              depth=1, heads=2, dim_head=32, mlp_dim=64,
                              compute_dtype="float32"))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(engine,
                     extra_static={"/static/demo.mp4": (str(p),
                                                        "video/mp4")}))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        ctype, body = _get(base, "/static/demo.mp4")
        assert ctype == "video/mp4" and body == payload
        # ...and the built-in allowlist still serves alongside it.
        assert _get(base, "/")[1]
    finally:
        httpd.shutdown()


def test_api_contract_unchanged(live_server):
    """Adding the frontend must not shadow the API routes."""
    for route, want in (("/ping", {"message": "pong"}),
                        ("/health", {"status": "ok"})):
        with urllib.request.urlopen(live_server + route) as r:
            assert json.loads(r.read()) == want


def test_demo_flow_http_replay(tmp_path):
    """Replay the exact request sequence app.js makes in demo mode
    (?demo=/static/demo.mp4&subchunk=4&window=2&detect=3) against the
    server scripts/demo_frontend.py stands up.  No JS runtime or browser
    exists in this image, so this proves the server half of the demo URL
    end-to-end: page → module → stylesheet → clip fetch → /health →
    /infer with the autopilot's parameters → renderable response."""
    # Load by explicit file path — inserting scripts/ into sys.path would
    # leak it (and the cached module) into the rest of the pytest session
    # where it could shadow imports (ADVICE r4).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_demo_frontend_for_test",
        os.path.join(ROOT, "scripts", "demo_frontend.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    make_demo_clip = mod.make_demo_clip

    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    clip = str(tmp_path / "demo.mp4")
    try:
        make_demo_clip(clip, frames=8)
    except RuntimeError:
        pytest.skip("no mp4 encoder")

    from http.server import ThreadingHTTPServer

    engine = InferenceEngine(
        model_cfg=ModelConfig(max_seq_len=3, fusion_layers=1,
                              compute_dtype="float32"),
        vivit_cfg=ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                              num_frames=4, tubelet_size=2, dim=768,
                              depth=1, heads=2, dim_head=32, mlp_dim=64,
                              compute_dtype="float32"))
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(engine, extra_static={
            "/static/demo.mp4": (clip, "video/mp4")}))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        # 1-3. page load pulls the module + stylesheet.
        assert b"app.js" in _get(base, "/")[1]
        assert b"maybeRunDemo" in _get(base, "/static/app.js")[1]
        assert _get(base, "/static/app.css")[1]
        # 4. the autopilot fetches the clip...
        video_bytes = _get(base, "/static/demo.mp4")[1]
        assert video_bytes == open(clip, "rb").read()
        # 5. ...preflights /health...
        with urllib.request.urlopen(base + "/health") as r:
            assert json.loads(r.read()) == {"status": "ok"}
        # 6. ...and POSTs /infer with its query parameters.
        boundary = "demoflowbound"
        body = (f"--{boundary}\r\n"
                'Content-Disposition: form-data; name="file"; '
                'filename="demo.mp4"\r\n'
                "Content-Type: video/mp4\r\n\r\n").encode() + video_bytes \
            + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            base + "/infer/?subchunk_size=4&window_size=2"
                   "&explain=true&detect_every=3",
            data=body, method="POST",
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        with urllib.request.urlopen(req) as r:
            res = json.loads(r.read())
        # The response must be renderable by the page: boxes for the
        # overlay, windows for the chips, IG entries for the bars.
        assert res["bounding_box"], "no boxes — overlay would be empty"
        assert res["inference"], "no windows — chips would be empty"
        fi = res["inference"][0]["feature_importance"]
        assert fi["video"] and fi["audio"]
    finally:
        httpd.shutdown()
