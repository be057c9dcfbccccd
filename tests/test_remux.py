"""FLV → MP4 copy-remux tests (serve/remux.py).

Builds a synthetic-but-spec-valid H.264/AAC FLV (real SPS bitstream, real
AudioSpecificConfig, opaque sample payloads — the remux never inspects
payload bytes), remuxes it, then validates the MP4 with an independent box
parser: hierarchy, sample tables, byte-exact payload mapping through
stco/stsz, keyframe table, and timing.  Mirrors the capability of the
reference's in-browser ffmpeg.wasm FLV→MP4 conversion
(front-end/src/components/VideoPlayer.tsx:389-441).
"""

from __future__ import annotations

import json
import struct
import threading
import urllib.error
import urllib.request

import pytest

from mmer_tpu.serve.remux import (RemuxError, flv_to_mp4,
                                  parse_audio_specific_config, parse_flv,
                                  parse_sps)

# --------------------------------------------------------------------------
# Synthetic FLV construction
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def u(self, value: int, bits: int):
        for i in reversed(range(bits)):
            self.bits.append((value >> i) & 1)

    def ue(self, value: int):
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def bytes(self) -> bytes:
        bits = self.bits + [0] * (-len(self.bits) % 8)
        return bytes(int("".join(map(str, bits[i:i + 8])), 2)
                     for i in range(0, len(bits), 8))


def make_sps(width_mbs: int = 20, height_mbs: int = 15) -> bytes:
    """Baseline-profile SPS for (width_mbs*16) x (height_mbs*16) pixels."""
    w = _BitWriter()
    w.u(0x67, 8)         # NAL header: type 7 (SPS)
    w.u(66, 8)           # profile_idc baseline
    w.u(0, 8)            # constraint flags
    w.u(30, 8)           # level_idc
    w.ue(0)              # sps_id
    w.ue(0)              # log2_max_frame_num_minus4
    w.ue(0)              # pic_order_cnt_type
    w.ue(0)              # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)              # max_num_ref_frames
    w.u(0, 1)            # gaps_in_frame_num_allowed
    w.ue(width_mbs - 1)  # pic_width_in_mbs_minus1
    w.ue(height_mbs - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)            # frame_mbs_only_flag
    w.u(0, 1)            # direct_8x8_inference
    w.u(0, 1)            # frame_cropping_flag
    w.u(0, 1)            # vui_parameters_present
    w.u(1, 1)            # rbsp_stop_one_bit
    return w.bytes()


def make_avcc(sps: bytes, pps: bytes = b"\x68\xce\x38\x80") -> bytes:
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + bytes([1]) + struct.pack(">H", len(pps)) + pps)


AAC_LC_16K_MONO_ASC = bytes([0x14, 0x08])   # AAC-LC, 16 kHz, 1 channel


def _flv_tag(tag_type: int, ts: int, body: bytes) -> bytes:
    return (bytes([tag_type]) + len(body).to_bytes(3, "big")
            + (ts & 0xFFFFFF).to_bytes(3, "big") + bytes([ts >> 24])
            + b"\x00\x00\x00" + body
            + struct.pack(">I", 11 + len(body)))


def video_tag(ts: int, payload: bytes, keyframe: bool, pkt: int = 1,
              cts: int = 0) -> bytes:
    head = bytes([((1 if keyframe else 2) << 4) | 7, pkt]) \
        + (cts & 0xFFFFFF).to_bytes(3, "big")
    return _flv_tag(9, ts, head + payload)


def audio_tag(ts: int, payload: bytes, pkt: int = 1) -> bytes:
    return _flv_tag(8, ts, bytes([0xAF, pkt]) + payload)


def nalu(payload: bytes) -> bytes:
    """One AVCC (length-prefixed) NALU sample body."""
    return struct.pack(">I", len(payload)) + payload


VIDEO_SAMPLES = [nalu(bytes([0x65]) + b"IFRAME-PAYLOAD-0"),
                 nalu(bytes([0x41]) + b"pframe-payload-1"),
                 nalu(bytes([0x41]) + b"pframe-payload-2"),
                 nalu(bytes([0x65]) + b"IFRAME-PAYLOAD-3")]
AUDIO_SAMPLES = [b"aac-frame-%d" % i for i in range(5)]


def make_flv(with_audio: bool = True, with_video: bool = True,
             video_cts=(0, 80, 40, 0)) -> bytes:
    out = bytearray(b"FLV\x01" + bytes([0x05 if with_audio and with_video
                                        else 0x01 if with_video else 0x04])
                    + struct.pack(">I", 9) + b"\x00\x00\x00\x00")
    if with_video:
        out += video_tag(0, make_avcc(make_sps()), True, pkt=0)
    if with_audio:
        out += audio_tag(0, AAC_LC_16K_MONO_ASC, pkt=0)
    for i, s in enumerate(VIDEO_SAMPLES if with_video else []):
        out += video_tag(i * 40, s, s[4] == 0x65, cts=video_cts[i])
    for i, s in enumerate(AUDIO_SAMPLES if with_audio else []):
        out += audio_tag(i * 64, s)       # 1024 samples @ 16 kHz = 64 ms
    return bytes(out)


# --------------------------------------------------------------------------
# Independent MP4 box parsing (the validator)
# --------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"dinf"}


def parse_boxes(data: bytes, prefix: str = "") -> dict:
    """Flat {path: payload} map of the box tree (first occurrence wins
    except traks, which are numbered)."""
    out, off, trak_i = {}, 0, 0
    while off + 8 <= len(data):
        size = struct.unpack(">I", data[off:off + 4])[0]
        typ = data[off + 4:off + 8]
        assert size >= 8, f"bad box size {size} at {prefix}+{off}"
        body = data[off + 8:off + size]
        name = typ.decode()
        if typ == b"trak":
            name = f"trak{trak_i}"
            trak_i += 1
        path = f"{prefix}/{name}"
        out[path] = body
        if typ in _CONTAINERS:
            out.update(parse_boxes(body, path))
        off += size
    assert off == len(data), f"trailing garbage after boxes at {prefix}"
    return out


def _leaf(container: bytes, typ: bytes) -> bytes:
    off = 0
    while off + 8 <= len(container):
        size = struct.unpack(">I", container[off:off + 4])[0]
        if container[off + 4:off + 8] == typ:
            return container[off + 8:off + size]
        off += size
    raise AssertionError(f"box {typ!r} not found")


def table_u32(container: bytes, typ: bytes, skip_ver: bool = True):
    raw = _leaf(container, typ)
    if skip_ver:
        raw = raw[4:]
    count = struct.unpack(">I", raw[:4])[0]
    return list(struct.unpack(f">{count}I", raw[4:4 + 4 * count]))


# --------------------------------------------------------------------------
# Tests
# --------------------------------------------------------------------------

def test_sps_roundtrip():
    assert parse_sps(make_sps(20, 15)) == (320, 240)
    assert parse_sps(make_sps(80, 45)) == (1280, 720)


def test_asc_parse():
    assert parse_audio_specific_config(AAC_LC_16K_MONO_ASC) == (16000, 1,
                                                                1024)


def test_flv_demux():
    s = parse_flv(make_flv())
    assert s.avcc == make_avcc(make_sps())
    assert s.asc == AAC_LC_16K_MONO_ASC
    assert [p for (_, _, _, p) in s.video] == VIDEO_SAMPLES
    assert [(t, p) for (t, p) in s.audio] == [
        (i * 64, p) for i, p in enumerate(AUDIO_SAMPLES)]
    assert [c for (_, c, _, _) in s.video] == [0, 80, 40, 0]
    assert [k for (_, _, k, _) in s.video] == [True, False, False, True]


def test_remux_structure_and_payload_mapping():
    mp4 = flv_to_mp4(make_flv())
    boxes = parse_boxes(mp4)
    assert "/ftyp" in boxes and "/mdat" in boxes and "/moov" in boxes
    assert "/moov/trak0" in boxes and "/moov/trak1" in boxes

    for trak, samples in (("trak0", VIDEO_SAMPLES), ("trak1", AUDIO_SAMPLES)):
        stbl = boxes[f"/moov/{trak}/mdia/minf/stbl"]
        sizes_raw = _leaf(stbl, b"stsz")[4:]
        fixed, count = struct.unpack(">II", sizes_raw[:8])
        sizes = list(struct.unpack(f">{count}I",
                                   sizes_raw[8:8 + 4 * count]))
        offsets = table_u32(stbl, b"stco")
        assert sizes == [len(s) for s in samples]
        # stco offsets are absolute: the payload bytes must be there.
        for off, s in zip(offsets, samples):
            assert mp4[off:off + len(s)] == s

    # keyframes (1-indexed) from FLV frame_type
    video_stbl = boxes["/moov/trak0/mdia/minf/stbl"]
    assert table_u32(video_stbl, b"stss") == [1, 4]

    # avcC copied verbatim; SPS-derived dimensions in tkhd
    stsd = _leaf(video_stbl, b"stsd")
    assert make_avcc(make_sps()) in stsd
    tkhd = boxes["/moov/trak0/tkhd"]
    width, height = struct.unpack(">II", tkhd[-8:])
    assert (width >> 16, height >> 16) == (320, 240)

    # video stts: constant 40 ms deltas at movie timescale 1000
    stts_raw = _leaf(video_stbl, b"stts")[4:]
    n = struct.unpack(">I", stts_raw[:4])[0]
    runs = [struct.unpack(">II", stts_raw[4 + 8 * i:12 + 8 * i])
            for i in range(n)]
    assert sum(c for c, _ in runs) == len(VIDEO_SAMPLES)
    assert all(d == 40 for _, d in runs)

    # ctts present (non-zero composition offsets in the input)
    ctts_raw = _leaf(video_stbl, b"ctts")[4:]
    n = struct.unpack(">I", ctts_raw[:4])[0]
    ctts = []
    for i in range(n):
        c, o = struct.unpack(">Ii", ctts_raw[4 + 8 * i:12 + 8 * i])
        ctts.extend([o] * c)
    assert ctts == [0, 80, 40, 0]

    # audio: samplerate timescale, constant 1024-sample deltas, esds ASC
    audio_stbl = boxes["/moov/trak1/mdia/minf/stbl"]
    mdhd = boxes["/moov/trak1/mdia"]
    timescale = struct.unpack(">I", _leaf(mdhd, b"mdhd")[12:16])[0]
    assert timescale == 16000
    assert AAC_LC_16K_MONO_ASC in _leaf(audio_stbl, b"stsd")


def test_remux_video_only_and_audio_only():
    for kwargs in ({"with_audio": False}, {"with_video": False}):
        mp4 = flv_to_mp4(make_flv(**kwargs))
        boxes = parse_boxes(mp4)
        assert "/moov/trak0" in boxes and "/moov/trak1" not in boxes


def test_remux_rejects_non_avc_and_garbage():
    with pytest.raises(RemuxError):
        flv_to_mp4(b"\x00" * 64)
    # Sorenson H.263 video codec id 2 → explicit transcode-needed error
    flv = bytearray(make_flv(with_audio=False))
    # first video tag body starts at header(9)+4 prev size+11 tag header
    flv[9 + 4 + 11] = (1 << 4) | 2
    with pytest.raises(RemuxError, match="not AVC"):
        flv_to_mp4(bytes(flv))
    with pytest.raises(RemuxError, match="no media samples"):
        flv_to_mp4(b"FLV\x01\x05" + struct.pack(">I", 9) + b"\x00" * 4)


def test_remux_http_endpoint():
    from http.server import ThreadingHTTPServer

    from mmer_tpu.serve.app import make_handler

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine=None))
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        boundary = "remuxbound42"

        def post(payload: bytes):
            body = (f"--{boundary}\r\n"
                    'Content-Disposition: form-data; name="file"; '
                    'filename="clip.flv"\r\n\r\n').encode() + payload \
                + f"\r\n--{boundary}--\r\n".encode()
            req = urllib.request.Request(
                base + "/remux/", data=body, method="POST",
                headers={"Content-Type":
                         f"multipart/form-data; boundary={boundary}"})
            return urllib.request.urlopen(req)

        with post(make_flv()) as r:
            assert r.headers["Content-Type"] == "video/mp4"
            mp4 = r.read()
        assert mp4 == flv_to_mp4(make_flv())

        with pytest.raises(urllib.error.HTTPError) as ei:
            post(b"not an flv at all")
        assert ei.value.code == 415
        assert "detail" in json.loads(ei.value.read())
    finally:
        httpd.shutdown()


def test_remux_all_interframes_writes_empty_stss():
    """A video track with NO keyframes must still carry an (empty) stss —
    omitting the box declares EVERY sample a sync sample (ISO 14496-12)
    and players would seek into P-frames."""
    out = bytearray(b"FLV\x01\x01" + struct.pack(">I", 9)
                    + b"\x00\x00\x00\x00")
    out += video_tag(0, make_avcc(make_sps()), True, pkt=0)
    for i in range(3):
        out += video_tag(i * 40, nalu(bytes([0x41]) + b"p%d" % i),
                         keyframe=False)
    mp4 = flv_to_mp4(bytes(out))
    boxes = parse_boxes(mp4)
    stbl = boxes["/moov/trak0/mdia/minf/stbl"]
    assert table_u32(stbl, b"stss") == []          # present, zero entries
    # Control: the normal fixture has keyframes 1 and 4.
    boxes_kf = parse_boxes(flv_to_mp4(make_flv(with_audio=False)))
    assert table_u32(boxes_kf["/moov/trak0/mdia/minf/stbl"],
                     b"stss") == [1, 4]


def test_mp4a_entry_high_sample_rate_field_is_zero():
    """88.2k/96k AAC can't fit the 16.16 stsd samplerate field — it must
    be 0 so players read the esds ASC, not a truncated wrong rate."""
    from mmer_tpu.serve.remux import _mp4a_entry

    # box header (8) + 6 reserved + 2 dref + 8 reserved + 2 channels +
    # 2 samplesize + 4 predefined/reserved → samplerate at [32:36].
    def rate_field(entry: bytes) -> int:
        return struct.unpack(">I", entry[32:36])[0]

    for rate in (96000, 88200):
        assert rate_field(_mp4a_entry(AAC_LC_16K_MONO_ASC, rate, 2, 0)) \
            == 0, rate
    assert rate_field(_mp4a_entry(AAC_LC_16K_MONO_ASC, 16000, 1, 0)) \
        == 16000 << 16


def test_truncated_asc_raises_remux_error():
    """A 1-byte AudioSpecificConfig must surface as RemuxError (HTTP 415),
    not an IndexError 500."""
    out = bytearray(b"FLV\x01\x04" + struct.pack(">I", 9)
                    + b"\x00\x00\x00\x00")
    out += audio_tag(0, b"\x12", pkt=0)            # truncated ASC
    out += audio_tag(0, AUDIO_SAMPLES[0])
    with pytest.raises(RemuxError):
        flv_to_mp4(bytes(out))


def test_initial_av_offset_preserved_via_edit_list():
    """Audio beginning 320 ms after video must produce an audio-track
    edts/elst with an empty edit of 320 movie-timescale ticks — not a
    silent snap of both tracks to t=0."""
    out = bytearray(b"FLV\x01\x05" + struct.pack(">I", 9)
                    + b"\x00\x00\x00\x00")
    out += video_tag(0, make_avcc(make_sps()), True, pkt=0)
    out += audio_tag(0, AAC_LC_16K_MONO_ASC, pkt=0)
    for i, s in enumerate(VIDEO_SAMPLES):
        out += video_tag(i * 40, s, s[4] == 0x65)
    for i, s in enumerate(AUDIO_SAMPLES):
        out += audio_tag(320 + i * 64, s)
    boxes = parse_boxes(flv_to_mp4(bytes(out)))

    # Video starts at t0 → no edit list.
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        _leaf(boxes["/moov/trak0"], b"edts")

    elst = _leaf(_leaf(boxes["/moov/trak1"], b"edts"), b"elst")[4:]
    n = struct.unpack(">I", elst[:4])[0]
    assert n == 2
    seg0, mt0, _, _ = struct.unpack(">IiHH", elst[4:16])
    seg1, mt1, _, _ = struct.unpack(">IiHH", elst[16:28])
    assert (seg0, mt0) == (320, -1)              # empty edit = delay
    assert mt1 == 0
    assert seg1 == len(AUDIO_SAMPLES) * 1024 * 1000 // 16000

    # Symmetric FLV (no offset) still has no edit lists.
    plain = parse_boxes(flv_to_mp4(make_flv()))
    for trak in ("trak0", "trak1"):
        with _pytest.raises(AssertionError):
            _leaf(plain[f"/moov/{trak}"], b"edts")


def test_over_4gib_media_raises_remux_error(monkeypatch):
    """ADVICE r2: media whose mdat would push stco offsets past 2**32 must
    raise RemuxError (HTTP 415) up front — not struct.error (opaque 500)
    after allocating a >4 GiB interleave buffer."""
    import mmer_tpu.serve.remux as remux_mod

    class FakePayload:                     # reports huge len, holds no RAM
        def __len__(self):
            return 5 << 30

    streams = remux_mod.FlvStreams(
        avcc=make_avcc(make_sps()),
        video=[(0, 0, True, FakePayload())])
    monkeypatch.setattr(remux_mod, "parse_flv", lambda flv: streams)
    with pytest.raises(RemuxError, match="4 GiB"):
        remux_mod.flv_to_mp4(b"unused")


# --------------------------------------------------------------------------
# MP3 audio (copy path) + cv2 transcode fallback (serve/transcode.py) —
# closes the reference's non-AVC FLV preview capability
# (VideoPlayer.tsx:336-360 ffmpeg.wasm copy→libx264→mpeg4 chain).
# --------------------------------------------------------------------------

# MPEG-1 Layer III, 128 kbps, 44.1 kHz, stereo: frame = 417 bytes.
MP3_FRAME = bytes([0xFF, 0xFB, 0x90, 0x00]) + bytes(413)


def mp3_audio_tag(ts: int, frame: bytes = MP3_FRAME) -> bytes:
    # Sound header: format=2 (MP3), rate=3 (44 kHz), size=1, stereo=1.
    return _flv_tag(8, ts, bytes([0x2F]) + frame)


def make_mp3_flv(n_audio: int = 5, with_video: bool = True) -> bytes:
    out = bytearray(b"FLV\x01\x05" + struct.pack(">I", 9)
                    + b"\x00\x00\x00\x00")
    if with_video:
        out += video_tag(0, make_avcc(make_sps()), True, pkt=0)
        for i, s in enumerate(VIDEO_SAMPLES):
            out += video_tag(i * 40, s, s[4] == 0x65)
    for i in range(n_audio):
        out += mp3_audio_tag(i * 26)      # 1152 samples @ 44.1 kHz ≈ 26 ms
    return bytes(out)


def test_mp3_header_parse():
    from mmer_tpu.serve.remux import parse_mp3_header

    assert parse_mp3_header(MP3_FRAME) == (44100, 2, 1152)
    # MPEG-2 Layer III 24 kHz mono → 576 samples/frame
    assert parse_mp3_header(bytes([0xFF, 0xF3, 0x94, 0xC0])) \
        == (24000, 1, 576)
    # MPEG-1 Layer II 48 kHz → 1152
    assert parse_mp3_header(bytes([0xFF, 0xFD, 0x94, 0x00])) \
        == (48000, 2, 1152)
    with pytest.raises(RemuxError, match="sync"):
        parse_mp3_header(b"\x00\x00\x00\x00")
    with pytest.raises(RemuxError, match="reserved"):
        parse_mp3_header(bytes([0xFF, 0xEB, 0x90, 0x00]))   # version 01


def test_mp3_flv_copy_remux():
    """H.264 + MP3 FLV remuxes by byte copy: esds object type 0x6B, no
    DecoderSpecificInfo, samplerate timescale, constant 1152 deltas."""
    mp4 = flv_to_mp4(make_mp3_flv())
    boxes = parse_boxes(mp4)
    audio_stbl = boxes["/moov/trak1/mdia/minf/stbl"]

    timescale = struct.unpack(
        ">I", _leaf(boxes["/moov/trak1/mdia"], b"mdhd")[12:16])[0]
    assert timescale == 44100

    stts_raw = _leaf(audio_stbl, b"stts")[4:]
    n = struct.unpack(">I", stts_raw[:4])[0]
    runs = [struct.unpack(">II", stts_raw[4 + 8 * i:12 + 8 * i])
            for i in range(n)]
    assert runs == [(5, 1152)]

    # esds: DecoderConfigDescriptor (tag 0x04) carries OTI 0x6B and NO
    # nested DecoderSpecificInfo (tag 0x05).  The esds box sits after the
    # 28-byte fixed audio sample entry inside the mp4a box.
    esds = _leaf(_leaf(_leaf(audio_stbl, b"stsd")[8:], b"mp4a")[28:],
                 b"esds")
    i = esds.index(b"\x04")               # first DCD tag in the ES descr
    oti = esds[i + 5]                     # tag + 4-byte expandable length
    assert oti == 0x6B
    assert b"\x05" not in esds[i + 5:i + 18]

    # payload byte mapping through stco/stsz
    offsets = table_u32(audio_stbl, b"stco")
    assert len(offsets) == 5
    for off in offsets:
        assert mp4[off:off + len(MP3_FRAME)] == MP3_FRAME


def _cv2_flv1_bytes(n_frames: int = 8, size=(64, 48)) -> bytes:
    cv2 = pytest.importorskip("cv2")
    import tempfile

    import numpy as np

    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/clip.flv"
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"FLV1"), 25.0, size)
        if not w.isOpened():
            pytest.skip("cv2 FLV1 encoder unavailable")
        for i in range(n_frames):
            frame = np.full((size[1], size[0], 3), i * 25, np.uint8)
            frame[:, : (i + 1) * 4] = (0, 128, 255)
            w.write(frame)
        w.release()
        return open(p, "rb").read()


def _count_decodable_frames(mp4: bytes) -> int:
    import tempfile

    cv2 = pytest.importorskip("cv2")
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/preview.mp4"
        open(p, "wb").write(mp4)
        cap = cv2.VideoCapture(p)
        n = 0
        while cap.read()[0]:
            n += 1
        cap.release()
        return n


def test_flv1_transcode_fallback():
    """A Sorenson/FLV1 FLV (what cv2 writes) is NOT copy-remuxable but
    must still produce a playable MP4 via the cv2 mp4v fallback."""
    from mmer_tpu.serve.transcode import flv_preview_mp4

    flv = _cv2_flv1_bytes(8)
    with pytest.raises(RemuxError, match="not AVC"):
        flv_to_mp4(flv)
    mp4, mode = flv_preview_mp4(flv)
    assert mode == "transcode"
    assert _count_decodable_frames(mp4) == 8


def test_flv1_with_mp3_audio_merges_copied_track():
    """FLV1 video + MP3 audio: video transcodes, audio is byte-copied
    into the merged preview (two traks, payloads intact)."""
    from mmer_tpu.serve.transcode import flv_preview_mp4

    flv = bytearray(_cv2_flv1_bytes(6))
    for i in range(4):
        flv += mp3_audio_tag(i * 26)
    mp4, mode = flv_preview_mp4(bytes(flv))
    assert mode == "transcode"

    boxes = parse_boxes(mp4)
    assert "/moov/trak0" in boxes and "/moov/trak1" in boxes
    audio_stbl = boxes["/moov/trak1/mdia/minf/stbl"]
    offsets = table_u32(audio_stbl, b"stco")
    assert len(offsets) == 4
    for off in offsets:
        assert mp4[off:off + len(MP3_FRAME)] == MP3_FRAME
    esds = _leaf(_leaf(_leaf(audio_stbl, b"stsd")[8:], b"mp4a")[28:],
                 b"esds")
    i = esds.index(b"\x04")
    assert esds[i + 5] == 0x6B
    assert _count_decodable_frames(mp4) == 6


def test_preview_still_415_when_nothing_works():
    from mmer_tpu.serve.transcode import flv_preview_mp4

    with pytest.raises(RemuxError):
        flv_preview_mp4(b"FLV\x01\x05" + struct.pack(">I", 9)
                        + b"\x00" * 64)


def test_copy_path_round_trips_through_preview_entry():
    from mmer_tpu.serve.transcode import flv_preview_mp4

    mp4, mode = flv_preview_mp4(make_flv())
    assert mode == "copy"
    assert mp4 == flv_to_mp4(make_flv())
