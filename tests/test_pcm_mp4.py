"""The in-image serving audio leg (VERDICT r4 #1).

Covers: the pure-Python PCM-in-MP4 mux/demux (serve/pcm_mp4), its hookup
into ``extract_audio_track`` (so serving decodes upload audio with no
ffmpeg), the engine's per-window frame→sample slicing math
(``window_audio_slices`` — reference back-end/app/libs/inference.py:413-431
semantics), and an end-to-end proof that audio carried by an upload
actually reaches Wav2Vec2 and changes the serving output.
"""

import struct

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig, ViViTConfig, Wav2Vec2Config
from mmer_tpu.serve.engine import InferenceEngine, window_audio_slices
from mmer_tpu.serve.pcm_mp4 import MuxError, demux_pcm_track, mux_pcm_track

TINY_VIVIT = ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                         num_frames=4, tubelet_size=2, dim=768, depth=1,
                         heads=2, dim_head=32, mlp_dim=64,
                         compute_dtype="float32")
TINY_FUSION = ModelConfig(max_seq_len=3, fusion_layers=1,
                          compute_dtype="float32")
# hidden_dim must stay 1024 = the fusion model's audio_dim.
TINY_WAV = Wav2Vec2Config(hidden_dim=1024, num_layers=1, num_heads=2,
                          ffn_dim=64, conv_dims=(16, 16),
                          conv_strides=(5, 2), conv_kernels=(10, 3),
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4,
                          compute_dtype="float32")


def _tone(seconds: float, hz: float, sr: int = 16000) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def _face_mp4(path: str, frames: int, fps: float = 30.0) -> None:
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    from matplotlib import cbook
    from PIL import Image

    img = np.asarray(Image.open(
        cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)))
    img = cv2.resize(img, (256, 300))
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                        (256, 300))
    if not w.isOpened():
        pytest.skip("no mp4 encoder")
    rng = np.random.default_rng(0)
    for _ in range(frames):
        jitter = img.astype(np.int16) + rng.integers(-8, 8, img.shape)
        w.write(np.clip(jitter, 0, 255).astype(np.uint8)[:, :, ::-1])
    w.release()


# --------------------------------------------------------------------------
# mux / demux
# --------------------------------------------------------------------------

def test_roundtrip_preserves_audio_and_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    src = str(tmp_path / "v.mp4")
    _face_mp4(src, frames=8)
    wav = _tone(0.5, 440.0)
    out = mux_pcm_track(open(src, "rb").read(), wav, 16000)
    dst = str(tmp_path / "v_pcm.mp4")
    open(dst, "wb").write(out)

    got = demux_pcm_track(dst)
    assert got is not None
    w2, sr = got
    assert sr == 16000
    # exact up to int16 quantization
    np.testing.assert_allclose(w2, wav, atol=1.0 / 32768)

    # the video track still decodes — no payload byte moved
    cap = cv2.VideoCapture(dst)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 8
    assert cap.get(cv2.CAP_PROP_FPS) == pytest.approx(30.0)
    cap.release()


def test_mux_faststart_layout_and_minimal_moov():
    """moov-before-mdat (faststart) input: blanking moov IN PLACE must keep
    every later byte at its original offset (that is what keeps the video
    trak's stco valid) while the appended moov carries the PCM trak."""
    from mmer_tpu.serve.remux import _box, _full, _matrix

    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, 1000, 500),
                 struct.pack(">IHH", 0x00010000, 0x0100, 0),
                 b"\x00" * 8, _matrix(), b"\x00" * 24,
                 struct.pack(">I", 7))          # next_track_id = 7
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0x200), b"isomiso2")
    payload = b"\xde\xad\xbe\xef" * 8
    mp4 = ftyp + _box(b"moov", mvhd) + _box(b"mdat", payload)

    wav = _tone(0.25, 220.0)
    out = mux_pcm_track(mp4, wav, 16000)

    # original mdat bytes sit at their original offsets
    mdat_off = len(ftyp) + len(_box(b"moov", mvhd))
    assert out[mdat_off:mdat_off + 8 + len(payload)] == _box(b"mdat", payload)
    # old moov slot became a free box of identical size
    assert out[len(ftyp) + 4:len(ftyp) + 8] == b"free"

    got = demux_pcm_track(out)
    assert got is not None
    np.testing.assert_allclose(got[0], wav, atol=1.0 / 32768)
    assert got[1] == 16000

    # patched mvhd: next_track_id bumped, duration extended past the old
    # 500/1000s movie to the audio's 0.25 s → max(500, 250) = 500 stays.
    moov_off = out.rfind(b"moov") - 4
    body = out[moov_off + 8:]
    assert struct.unpack(">I", body[8 + 4 + 92:8 + 4 + 96])[0] == 8


def test_mux_rejects_bad_inputs():
    with pytest.raises(MuxError):
        mux_pcm_track(b"\x00" * 64, _tone(0.1, 100), 16000)   # no boxes
    from mmer_tpu.serve.remux import _box
    ftyp_only = _box(b"ftyp", b"isom", struct.pack(">I", 0), b"isom")
    with pytest.raises(MuxError):
        mux_pcm_track(ftyp_only, _tone(0.1, 100), 16000)      # no moov
    with pytest.raises(MuxError):
        mux_pcm_track(ftyp_only, np.zeros(0, np.float32), 16000)


def test_demux_none_cases(tmp_path):
    assert demux_pcm_track(b"not an mp4") is None
    assert demux_pcm_track(str(tmp_path / "missing.mp4")) is None
    src = str(tmp_path / "plain.mp4")
    _face_mp4(src, frames=4)
    assert demux_pcm_track(src) is None       # mp4 without a PCM track


def test_demux_malformed_interiors_return_none(tmp_path):
    """demux runs on every untrusted /infer upload before the ffmpeg
    fallback, so ANY malformed box interior must mean None (the zero-audio
    fallback), never an exception that 500s the request (review r5 #1 —
    a valid-ftyp file whose moov contains a corrupt-size child previously
    raised MuxError out of the engine)."""
    import struct

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isom")
    # moov child with size 4 (< header size) → corrupt nested box
    assert demux_pcm_track(
        ftyp + box(b"moov", struct.pack(">I", 4) + b"trak")) is None
    # truncated trak/mdia interiors (short reads inside _parse_stbl)
    trak = box(b"trak", box(b"mdia", box(b"hdlr", b"\x00" * 8 + b"soun")))
    assert demux_pcm_track(ftyp + box(b"moov", trak)) is None
    # sowt sample entry present but tables truncated mid-struct
    stsd = box(b"stsd", b"\x00" * 8 + box(b"sowt", b"\x00" * 28))
    stbl = box(b"stbl", stsd + box(b"stsz", b"\x00" * 3))
    minf = box(b"minf", stbl)
    hdlr = box(b"hdlr", b"\x00" * 12 + b"soun" + b"\x00" * 13)
    trak2 = box(b"trak", box(b"mdia", hdlr + minf))
    assert demux_pcm_track(ftyp + box(b"moov", trak2)) is None
    # a real PCM file with its tail (the appended moov) cut off
    good = str(tmp_path / "good.mp4")
    _face_mp4(good, frames=4)
    with open(good, "rb") as f:
        data = mux_pcm_track(f.read(), np.zeros(1600, np.float32), 16000)
    assert demux_pcm_track(data[:-40]) is None


# --------------------------------------------------------------------------
# extract_audio_track PCM route (no ffmpeg involved)
# --------------------------------------------------------------------------

def test_extract_audio_track_pcm_route(tmp_path):
    from mmer_tpu.preprocess.audio import extract_audio_track

    src = str(tmp_path / "v.mp4")
    _face_mp4(src, frames=8)
    wav = _tone(1.0, 330.0)
    dst = str(tmp_path / "v_pcm.mp4")
    open(dst, "wb").write(
        mux_pcm_track(open(src, "rb").read(), wav, 16000))

    got = extract_audio_track(dst, 16000)
    assert got is not None
    np.testing.assert_allclose(got, wav, atol=1.0 / 32768)

    # resampled route: 16 kHz track requested at 8 kHz
    down = extract_audio_track(dst, 8000)
    assert down is not None and len(down) == 8000

    # start/duration windowing in source-rate samples
    mid = extract_audio_track(dst, 16000, start_s=0.25, duration_s=0.5)
    np.testing.assert_allclose(mid, wav[4000:12000], atol=1.0 / 32768)

    # a window entirely past the end → None (no-audio fallback)
    assert extract_audio_track(dst, 16000, start_s=5.0) is None


# --------------------------------------------------------------------------
# frame→sample window math (engine.py, reference inference.py:413-431)
# --------------------------------------------------------------------------

def test_window_audio_slices_contiguous():
    """96 contiguous frames, subchunk 32, window 2, 30 fps, 16 kHz —
    hand-computed sample ranges."""
    seq = list(range(96))
    win_lens = [min(2, 3 - s) for s in range(3)]          # [2, 2, 1]
    got = window_audio_slices(seq, win_lens, 32, 30.0, 16000)
    assert got == [
        (0, int(64 / 30 * 16000)),            # frames 0..63
        (int(32 / 30 * 16000), int(96 / 30 * 16000)),     # frames 32..95
        (int(64 / 30 * 16000), int(96 / 30 * 16000)),     # frames 64..95
    ]


def test_window_audio_slices_respects_detection_gaps():
    """seq_frames_idx holds ORIGINAL frame numbers: a sequence whose
    detections skip frames must map windows to wall-clock time, not to
    the dense sequence index."""
    # 8 detected frames spread over 0..70 of the original video
    seq = [0, 10, 20, 30, 40, 50, 60, 70]
    win_lens = [2, 1]                                      # n_sub=2, sub=4
    got = window_audio_slices(seq, win_lens, 4, 10.0, 1000)
    # window 0: first frame 0 → last = seq[min(8,8)-1] = 70 → [0, 7100)
    # window 1: first frame seq[4] = 40 → [4000, 7100)
    assert got == [(0, 7100), (4000, 7100)]


def test_window_audio_slices_degenerate_cases():
    # single short subchunk: f_lo index clamps to the last frame
    assert window_audio_slices([5], [1], 32, 10.0, 100) == [(50, 60)]
    # zero-length guard: hi is always > lo even when the span rounds to 0
    got = window_audio_slices([0], [1], 32, 1e9, 10)
    assert got == [(0, 1)]


# --------------------------------------------------------------------------
# end-to-end: upload audio reaches Wav2Vec2 through the engine
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pcm_face_video(tmp_path_factory):
    """8-frame face video (30 fps) carrying a 440 Hz PCM tone."""
    tmp = tmp_path_factory.mktemp("pcm")
    src = str(tmp / "v.mp4")
    _face_mp4(src, frames=8)
    wav = _tone(8 / 30.0, 440.0)
    dst = str(tmp / "v_pcm.mp4")
    open(dst, "wb").write(
        mux_pcm_track(open(src, "rb").read(), wav, 16000))
    return dst, wav


class _SpyEmbedder:
    def __init__(self):
        self.calls = []

    def embed_batch(self, waves):
        self.calls.append([np.asarray(w, np.float32) for w in waves])
        return np.zeros((len(waves), 1024), np.float32)


def test_engine_feeds_window_slices_to_embedder(pcm_face_video):
    """The waveform-present branch (engine.py step 4): the engine must
    decode the track once and hand ``embed_batch`` exactly the
    ``window_audio_slices`` pieces of it."""
    path, wav = pcm_face_video
    eng = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT)
    spy = _SpyEmbedder()
    eng._audio_embedder = spy

    res = eng.infer_video_file(path, subchunk_size=4, window_size=2)
    assert res["inference"]
    assert len(spy.calls) == 1, "audio track must be embedded exactly once"

    # reconstruct the engine's sequence from its own bounding boxes
    seq = sorted({b["frame"] for b in res["bounding_box"]})
    n_sub = int(np.ceil(len(seq) / 4))
    win_lens = [min(2, n_sub - s) for s in range(n_sub)]
    expect = window_audio_slices(seq, win_lens, 4, 30.0, 16000)

    got = spy.calls[0]
    assert len(got) == len(expect) == n_sub
    for piece, (lo, hi) in zip(got, expect):
        want = wav[lo:hi]
        if not len(want):
            want = np.zeros(1, np.float32)
        np.testing.assert_allclose(piece, want, atol=1.0 / 32768)


def test_audio_changes_serving_output(pcm_face_video):
    """Audio-live proof: the same video with and without its PCM track
    must produce different fusion inputs — i.e. the audio leg is real, not
    the zero-audio fallback (the r4 gap: inference.py:413-469 parity)."""
    path, _ = pcm_face_video
    eng = InferenceEngine(model_cfg=TINY_FUSION, vivit_cfg=TINY_VIVIT,
                          wav_cfg=TINY_WAV)

    captured = []
    model, params, real_apply = eng.fusion

    def capture_apply(p, v, a, m):
        captured.append(np.asarray(a))
        return real_apply(p, v, a, m)

    eng._fusion = (model, params, capture_apply)
    eng.infer_video_file(path, subchunk_size=4, window_size=2)
    with_audio = np.concatenate([c.reshape(-1) for c in captured])

    captured.clear()
    # same frames, no audio track → zero-audio fallback
    import cv2  # noqa: F401  (guarded by _face_mp4's importorskip earlier)
    src = path.replace("v_pcm.mp4", "v.mp4")
    eng.infer_video_file(src, subchunk_size=4, window_size=2)
    without_audio = np.concatenate([c.reshape(-1) for c in captured])

    assert np.all(without_audio == 0), "no-track upload must fall back to zeros"
    assert np.any(with_audio != 0), "PCM upload must produce live audio embeddings"
