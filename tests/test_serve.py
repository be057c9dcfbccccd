"""Serving: engine end-to-end on a real-face synthetic video + HTTP API
contract over the stdlib server."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, ViViTConfig
from mmer_tpu.serve.app import make_handler, parse_multipart
from mmer_tpu.serve.engine import InferenceEngine

TINY_VIVIT = ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                         num_frames=4, tubelet_size=2, dim=768, depth=1,
                         heads=2, dim_head=32, mlp_dim=64,
                         compute_dtype="float32")
TINY_FUSION = ModelConfig(max_seq_len=3, fusion_layers=1,
                          compute_dtype="float32")


@pytest.fixture(scope="module")
def face_video(tmp_path_factory):
    """An mp4 whose frames contain a real face (matplotlib's bundled
    grace_hopper portrait), so the Viola-Jones detector fires."""
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    from matplotlib import cbook
    from PIL import Image

    img = np.asarray(Image.open(
        cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)))
    img = cv2.resize(img, (256, 300))
    path = str(tmp_path_factory.mktemp("vid") / "face.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0,
                        (256, 300))
    if not w.isOpened():
        pytest.skip("no mp4 encoder")
    rng = np.random.default_rng(0)
    for _ in range(8):
        jitter = img.astype(np.int16) + rng.integers(-8, 8, img.shape)
        w.write(np.clip(jitter, 0, 255).astype(np.uint8)[:, :, ::-1])
    w.release()
    return path


@pytest.fixture(scope="module")
def engine():
    return InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT)


def test_engine_end_to_end(face_video, engine):
    res = engine.infer_video_file(face_video, subchunk_size=4,
                                  window_size=2)
    # Response schema (reference inference.py:356-524).
    assert set(res) == {"bounding_box", "inference"}
    assert len(res["bounding_box"]) >= 4, "face not detected across frames"
    bb = res["bounding_box"][0]
    assert set(bb) == {"frame", "x1", "y1", "x2", "y2", "confidence"}
    assert len(res["inference"]) == 2          # 8 frames / subchunk 4
    for item in res["inference"]:
        assert item["class"] in ("NEU", "HAP", "SAD", "ANG", "FEA", "DIS")
        assert isinstance(item["frame"], int)


def test_engine_explain(face_video, engine):
    res = engine.infer_video_file(face_video, subchunk_size=4,
                                  window_size=2, explain=True)
    item = res["inference"][0]
    fi = item["feature_importance"]
    assert len(fi["video"]) == 10 and len(fi["audio"]) == 10
    assert set(fi["video"][0]) == {"dimension", "importance"}


def test_predict_clip_legacy_contract(face_video, engine):
    """Whole-clip prediction (reference back-end/app/inference.py:110-163
    schema): predicted_label/index + top-k scores."""
    res = engine.predict_clip(face_video, subchunk_size=4, top_k=3)
    assert res is not None
    assert set(res) == {"predicted_label", "predicted_index", "scores"}
    assert len(res["scores"]) == 3
    assert res["scores"][0]["label"] == res["predicted_label"]
    probs = [s["probability"] for s in res["scores"]]
    assert probs == sorted(probs, reverse=True)


def test_window_size_clamped_to_model(face_video, engine):
    """window_size beyond the fusion model's video slots is clamped loudly
    (the reference instead crashes its checkpoint load and silently serves
    random weights, inference.py:236-265)."""
    res = engine.infer_video_file(face_video, subchunk_size=4,
                                  window_size=50)
    assert len(res["inference"]) == 2   # still produces per-subchunk windows


def test_engine_warmup(engine):
    engine.warmup(subchunk_size=4, window_size=2,
                  resolutions=[(40, 52)])   # also pre-compiles a crop graph


def test_engine_warmup_sample_replay(face_video, engine, capsys):
    """warmup(sample_upload=...) replays the clip through the live
    request path as its last phase (r5: warms the ~12 auxiliary graphs
    enumerated warming can't reach) and must leave the engine fully
    functional."""
    with open(face_video, "rb") as f:
        engine.warmup(subchunk_size=4, window_size=2,
                      sample_upload=f.read())
    assert "end-to-end sample request" in capsys.readouterr().out
    res = engine.infer_video_file(face_video, subchunk_size=4,
                                  window_size=2)
    assert res["inference"], "engine broken after sample-replay warmup"


def test_fusion_checkpoint_loading(tmp_path, face_video):
    """Engine must load best_model_*.msgpack files as written by the
    trainer (bare params tree) — and fail LOUDLY on a missing path
    (reference silently serves random weights, inference.py:236-265)."""
    import jax
    import jax.numpy as jnp

    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.train.checkpoint import save_params_msgpack

    model = MultimodalEmotionModel(TINY_FUSION)
    t = TINY_FUSION.max_seq_len - 1
    variables = model.init({"params": jax.random.PRNGKey(7)},
                           jnp.zeros((1, t, 768)), jnp.zeros((1, 1024)),
                           jnp.zeros((1, t), bool))
    path = str(tmp_path / "best_model_test.msgpack")
    save_params_msgpack(path, variables["params"])   # trainer's format

    eng = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                          fusion_params_path=path)
    _, params, _ = eng.fusion
    leaf = params["params"]["fusion"]["video_proj"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(leaf),
        np.asarray(variables["params"]["fusion"]["video_proj"]["kernel"]))

    bad = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                          fusion_params_path=str(tmp_path / "missing.msgpack"))
    with pytest.raises(FileNotFoundError):
        _ = bad.fusion

    # Migration path: a reference-format .pth (train2.py:766-774) must
    # load through the same engine hook (models/port_fusion.py).
    pytest.importorskip("torch")
    from mmer_tpu.models.port_fusion import save_pth
    pth = str(tmp_path / "best_model_ref.pth")
    save_pth(pth, variables, TINY_FUSION)
    eng_pth = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                              fusion_params_path=pth)
    _, params_pth, _ = eng_pth.fusion
    np.testing.assert_allclose(
        np.asarray(params_pth["params"]["fusion"]["video_proj"]["kernel"]),
        np.asarray(variables["params"]["fusion"]["video_proj"]["kernel"]),
        rtol=0, atol=0)

    # And a shape-mismatched .pth must refuse LOUDLY (the reference's
    # silent random-weight serve, inference.py:236-265).
    from mmer_tpu.config import ModelConfig as MC
    wrong = MC(**{**TINY_FUSION.__dict__, "max_seq_len": 57})
    eng_bad = InferenceEngine(model_cfg=wrong, vivit_cfg=TINY_VIVIT,
                              fusion_params_path=pth)
    with pytest.raises(ValueError, match="mismatch"):
        _ = eng_bad.fusion


def test_ensemble_serving_blends_member_probabilities(tmp_path):
    """Comma-separated --fusion_params serves a mean-probability seed
    ensemble (train/ensemble.py semantics) through ONE vmapped program:
    probs must equal the mean of the members' individual serving probs,
    and the IG logits surrogate must keep its (B, C) contract."""
    import jax
    import jax.numpy as jnp

    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.train.checkpoint import save_params_msgpack

    model = MultimodalEmotionModel(TINY_FUSION)
    t = TINY_FUSION.max_seq_len - 1
    paths = []
    for seed in (3, 9):
        variables = model.init({"params": jax.random.PRNGKey(seed)},
                               jnp.zeros((1, t, 768)), jnp.zeros((1, 1024)),
                               jnp.zeros((1, t), bool))
        p = str(tmp_path / f"best_model_seed{seed}.msgpack")
        save_params_msgpack(p, variables["params"])
        paths.append(p)

    rng = np.random.default_rng(0)
    v = rng.normal(size=(3, t, 768)).astype(np.float32)
    a = rng.normal(size=(3, 1024)).astype(np.float32)
    m = np.zeros((3, t), bool)

    singles = []
    for p in paths:
        eng = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                              fusion_params_path=p)
        _, params, apply = eng.fusion
        singles.append(np.asarray(apply(params, v, a, m)[0]))

    ens = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                          fusion_params_path=",".join(paths))
    _, params, apply = ens.fusion
    probs, logits, attn = apply(params, v, a, m)
    np.testing.assert_allclose(np.asarray(probs),
                               np.mean(singles, axis=0), atol=1e-5)
    assert logits.shape == (3, TINY_FUSION.num_classes)

    lg = ens.fusion_logits_fn(params, v, a, m)
    assert np.asarray(lg).shape == (3, TINY_FUSION.num_classes)
    assert np.isfinite(np.asarray(lg)).all()

    # a missing member still fails LOUDLY
    bad = InferenceEngine(
        model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
        fusion_params_path=paths[0] + "," + str(tmp_path / "nope.msgpack"))
    with pytest.raises(FileNotFoundError):
        _ = bad.fusion


def test_multipart_parser():
    boundary = "XBOUND"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="v.mp4"\r\n'
            "Content-Type: video/mp4\r\n\r\n").encode() + b"\x00BINARY\xff" \
        + f"\r\n--{boundary}\r\n".encode() \
        + b'Content-Disposition: form-data; name="note"\r\n\r\nhello' \
        + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(body,
                             f'multipart/form-data; boundary={boundary}')
    assert fields["file"] == ("v.mp4", b"\x00BINARY\xff")
    assert fields["note"] == ("", b"hello")


def test_multipart_parser_keeps_crlf_tail_bytes():
    """ADVICE r1: binary payloads legitimately ending in 0x0D/0x0A bytes
    must survive parsing intact (the old .strip(b"\\r\\n") truncated them)."""
    boundary = "XBOUND"
    payload = b"\x00mp4-tail\r\n\r\n\n\r"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="v.mp4"'
            "\r\n\r\n").encode() + payload \
        + f"\r\n--{boundary}--\r\n".encode()
    fields = parse_multipart(body,
                             f'multipart/form-data; boundary={boundary}')
    assert fields["file"] == ("v.mp4", payload)


@pytest.fixture(scope="module")
def live_server(engine):
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_http_ping_health(live_server):
    for route, want in (("/ping", {"message": "pong"}),
                        ("/health", {"status": "ok"})):
        with urllib.request.urlopen(live_server + route) as r:
            assert json.loads(r.read()) == want


def test_http_infer_roundtrip(live_server, face_video):
    boundary = "testbound123"
    video_bytes = open(face_video, "rb").read()
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="face.mp4"\r\n'
            "Content-Type: video/mp4\r\n\r\n").encode() + video_bytes \
        + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        live_server + "/infer/?subchunk_size=4&window_size=2&explain=true",
        data=body, method="POST",
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req) as r:
        res = json.loads(r.read())
    assert set(res) == {"bounding_box", "inference"}
    assert res["inference"] and "feature_importance" in res["inference"][0]


def test_fusion_logits_fn_is_stable(engine):
    """ADVICE r1: the IG logits closure must be built once — a fresh
    closure per request recompiles the IG graph every time."""
    assert engine.fusion_logits_fn is engine.fusion_logits_fn


def test_garbage_upload_returns_empty_result(engine):
    """Undecodable bytes → empty result, not a crash (the cv2 decode
    failure path, reference load_video None-return semantics)."""
    res = engine.infer_file_bytes(b"\x00\xffnot-a-video\x13\x37" * 100,
                                  "junk.mp4")
    assert res == {"bounding_box": [], "inference": []}


def test_multipart_parser_fuzz():
    """Random byte soup must parse to something or raise ValueError —
    never crash with another exception type."""
    import random

    rnd = random.Random(0)
    for _ in range(200):
        body = bytes(rnd.getrandbits(8) for _ in range(rnd.randint(0, 400)))
        ctype = rnd.choice([
            "multipart/form-data; boundary=x",
            "multipart/form-data; boundary=" + "b" * rnd.randint(1, 40),
            "multipart/form-data",
            "",
        ])
        try:
            out = parse_multipart(body, ctype)
            assert isinstance(out, dict)
        except ValueError:
            pass


def test_http_infer_missing_file_is_422(live_server):
    req = urllib.request.Request(
        live_server + "/infer/", data=b"--x--",
        method="POST",
        headers={"Content-Type": "multipart/form-data; boundary=x"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code == 422


def test_http_oversized_upload_is_413(engine):
    """ADVICE r2: a Content-Length above the handler cap must be rejected
    with 413 before the body is read into memory."""
    from http.server import ThreadingHTTPServer

    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(engine, max_upload_bytes=64))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{httpd.server_address[1]}/infer/"
        body = b"x" * 1024
        req = urllib.request.Request(
            url, data=body, method="POST",
            headers={"Content-Type": "multipart/form-data; boundary=x"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected HTTP error"
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        httpd.shutdown()


def test_subchunk_stream_matches_one_shot_and_stays_bounded():
    """VERDICT r2 #6: the engine streams uploads through SubchunkStream in
    bounded memory.  Incremental piecewise feeding must produce exactly the
    one-shot embed_cropped_frames features, and the stream's internal
    buffers must never exceed one subchunk of frames + one device batch of
    crops."""
    from mmer_tpu.preprocess.extract import (SubchunkStream,
                                             VideoFeatureExtractor)

    ex = VideoFeatureExtractor(TINY_VIVIT, device_batch=2, use_flash=False)
    rng = np.random.default_rng(0)
    n, h, w = 23, 48, 40                    # 23 frames, sub=4 → 6 subchunks
    frames = (rng.random((n, h, w, 3)) * 255).astype(np.uint8)
    bboxes = np.stack([np.asarray([2, 3, w - 4, h - 2], np.float32)] * n)
    sub = 4

    want = ex.embed_cropped_frames(frames, bboxes, sub)

    stream = SubchunkStream(ex, sub)
    i = 0
    for piece in (1, 3, 7, 2, 5, 4, 1):     # ragged pieces, sums to 23
        stream.add(frames[i:i + piece], bboxes[i:i + piece])
        i += piece
        assert len(stream._frames) < sub
        assert len(stream._crops) < ex.device_batch
    got = stream.finish()

    assert got.shape == want.shape == (6, TINY_VIVIT.dim)
    np.testing.assert_array_equal(got, want)


# (test_engine_int8_vivit_precision was removed in r4 with the int8
# serving route: the quantized ViViT measured 0.80× bf16 on chip —
# artifacts/probes/r3_onchip.json; tests/test_quant.py keeps the quant
# modules' direct agreement tests.)


def test_resolve_default_fusion(tmp_path, monkeypatch):
    """Bare server start resolves the flagship artifact when present
    (checkpoint path re-anchored by basename next to the manifest), and
    returns Nones — so main() warns LOUDLY — when it is not.  The
    reference's bare start silently serves random fusion weights
    (inference.py:236-265); this is the anti-behavior."""
    from mmer_tpu.serve.app import resolve_default_fusion

    # absent dir → all None
    assert resolve_default_fusion(str(tmp_path / "nope")) == (
        None, None, None)

    d = tmp_path / "flagship"
    d.mkdir()
    # manifest present but checkpoint file missing → still None
    (d / "manifest.json").write_text(json.dumps(
        {"checkpoint": "artifacts/flagship/flagship.msgpack",
         "model_config": {"max_seq_len": 6}}))
    assert resolve_default_fusion(str(d)) == (None, None, None)

    (d / "flagship.msgpack").write_bytes(b"\x80")
    ckpt, ns, mc = resolve_default_fusion(str(d))
    assert ckpt == str(d / "flagship.msgpack")
    assert ns is None                       # no norm_stats.npz yet
    assert mc == {"max_seq_len": 6}
    ModelConfig(**mc)                       # manifest keys are real fields

    np.savez(d / "norm_stats.npz", video_mean=np.zeros(2))
    _, ns, _ = resolve_default_fusion(str(d))
    assert ns == str(d / "norm_stats.npz")

    # corrupt manifest → None, not a crash
    (d / "manifest.json").write_text("{not json")
    assert resolve_default_fusion(str(d)) == (None, None, None)

    # MMER_FLAGSHIP_DIR overrides the in-repo default
    (d / "manifest.json").write_text(json.dumps(
        {"checkpoint": "flagship.msgpack"}))
    monkeypatch.setenv("MMER_FLAGSHIP_DIR", str(d))
    ckpt, _, mc = resolve_default_fusion()
    assert ckpt == str(d / "flagship.msgpack") and mc is None


def test_flagship_manifest_roundtrip(tmp_path):
    """make_flagship's artifact layout (manifest + msgpack + norm stats)
    resolves and serves through the bare-start path: resolve →
    ModelConfig(**manifest model_config) → engine load → forward."""
    import jax
    import jax.numpy as jnp

    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.serve.app import resolve_default_fusion
    from mmer_tpu.train.checkpoint import save_params_msgpack

    mc_dict = {"max_seq_len": TINY_FUSION.max_seq_len,
               "fusion_layers": TINY_FUSION.fusion_layers,
               "compute_dtype": "float32",
               "fusion_dropout": 0.2, "classifier_dropout": 0.2}
    cfg = ModelConfig(**mc_dict)
    model = MultimodalEmotionModel(cfg)
    t = cfg.max_seq_len - 1
    variables = model.init({"params": jax.random.PRNGKey(3)},
                           jnp.zeros((1, t, 768)), jnp.zeros((1, 1024)),
                           jnp.zeros((1, t), bool))

    d = tmp_path / "flagship"
    d.mkdir()
    save_params_msgpack(str(d / "flagship.msgpack"), variables["params"])
    np.savez(d / "norm_stats.npz",
             video_mean=np.zeros(768, np.float32),
             video_std=np.ones(768, np.float32),
             audio_mean=np.zeros(1024, np.float32),
             audio_std=np.ones(1024, np.float32))
    (d / "manifest.json").write_text(json.dumps(
        {"checkpoint": "artifacts/flagship/flagship.msgpack",
         "model_config": mc_dict}))

    ckpt, ns, mc = resolve_default_fusion(str(d))
    eng = InferenceEngine(model_cfg=ModelConfig(**mc), vivit_cfg=TINY_VIVIT,
                          fusion_params_path=ckpt, norm_stats_path=ns)
    _, params, apply = eng.fusion
    np.testing.assert_array_equal(
        np.asarray(params["params"]["fusion"]["video_proj"]["kernel"]),
        np.asarray(variables["params"]["fusion"]["video_proj"]["kernel"]))
    probs, _, _ = apply(params, jnp.zeros((1, t, 768)),
                        jnp.zeros((1, 1024)), jnp.zeros((1, t), bool))
    np.testing.assert_allclose(np.asarray(probs).sum(), 1.0, rtol=1e-5)
    assert eng.norm_stats["video_std"].shape == (768,)


def test_http_concurrent_infer_requests(live_server, face_video):
    """Concurrent uploads must all succeed: device work is lock-serialized
    inside the handler (app.py — the functional-purity + lock posture
    SURVEY §5 'race detection' maps to), so simultaneous requests may
    queue but never corrupt each other or error."""
    video_bytes = open(face_video, "rb").read()
    boundary = "concbound"
    body = (f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="c.mp4"\r\n'
            "Content-Type: video/mp4\r\n\r\n").encode() + video_bytes \
        + f"\r\n--{boundary}--\r\n".encode()

    results = {}

    def post(i):
        req = urllib.request.Request(
            live_server + "/infer/?subchunk_size=4&window_size=2",
            data=body, method="POST",
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        try:
            with urllib.request.urlopen(req) as r:
                results[i] = (r.status, json.loads(r.read()))
        except Exception as e:                        # noqa: BLE001
            results[i] = ("error", repr(e))

    threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert len(results) == 4
    for i, (status, res) in results.items():
        assert status == 200, f"request {i}: {res}"
        assert set(res) == {"bounding_box", "inference"}
        assert res["inference"], f"request {i} lost its inference items"
    # all four identical uploads must agree (no cross-request corruption)
    classes = {tuple(it["class"] for it in res["inference"])
               for _, res in results.values()}
    assert len(classes) == 1
