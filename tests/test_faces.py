"""Face pipeline: bbox artifact round-trip, sequence grouping, face-crop
video writing with the device crop kernel."""

import os

import numpy as np
import pytest

from mmer_tpu.preprocess.faces import (FaceSequence, best_bbox_per_frame,
                                       group_face_sequences, read_bboxes_txt,
                                       write_bboxes_txt, write_face_video)


def test_bbox_txt_roundtrip(tmp_path):
    rows = [(0, 10.0, 20.0, 110.0, 140.0, 0.91),
            (1, 12.0, 22.0, 112.0, 142.0, 0.88)]
    path = str(tmp_path / "x_bboxes.txt")
    write_bboxes_txt(path, rows)
    # Reference line format: frame,x1,y1,x2,y2,conf (cremad_extract_bboxes.py:48-56)
    first = open(path).readline().strip()
    assert first == "0,10.0,20.0,110.0,140.0,0.9100"
    back = read_bboxes_txt(path)
    assert [r[0] for r in back] == [0, 1]
    np.testing.assert_allclose([r[5] for r in back], [0.91, 0.88])


def test_best_bbox_per_frame_prefers_confidence():
    rows = [(3, 0, 0, 10, 10, 0.6), (3, 5, 5, 20, 20, 0.9)]
    best = best_bbox_per_frame(rows)
    assert best[3] == (5, 5, 20, 20)


def test_group_face_sequences_gap_semantics():
    """Gaps ≤ max_delay stay in one sequence; larger gaps split
    (reference get_face_sequences, back-end/app/libs/inference.py:52-100)."""
    rows = [(f, 0, 0, 10, 10, 0.9) for f in [0, 1, 2, 9, 30, 31]]
    seqs = group_face_sequences(rows, max_delay=10)
    assert len(seqs) == 2
    assert seqs[0].frames == [0, 1, 2, 9]
    assert seqs[1].frames == [30, 31]

    seqs = group_face_sequences(rows, max_delay=5)
    assert [s.frames for s in seqs] == [[0, 1, 2], [9], [30, 31]]


def test_write_face_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    src = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(src, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    if not w.isOpened():
        pytest.skip("no mp4 encoder")
    rng = np.random.default_rng(0)
    for _ in range(6):
        w.write((rng.random((48, 64, 3)) * 255).astype(np.uint8))
    w.release()

    rows = [(i, 8.0, 4.0, 40.0, 44.0, 0.9) for i in range(6)]
    out = str(tmp_path / "in_faces.mp4")
    assert write_face_video(src, rows, out, size=(32, 32))
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 6
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 32
    cap.release()


def test_detect_many_equals_per_frame():
    """Batched detection must give exactly the per-frame results."""
    pytest.importorskip("cv2")
    pytest.importorskip("matplotlib")
    from matplotlib import cbook
    from PIL import Image

    from mmer_tpu.preprocess.faces import HaarFaceDetector

    img = np.asarray(Image.open(
        cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)))
    rng = np.random.default_rng(0)
    frames = [img,
              np.clip(img.astype(np.int16)
                      + rng.integers(-15, 15, img.shape), 0,
                      255).astype(np.uint8),
              (rng.random(img.shape) * 255).astype(np.uint8)]
    det = HaarFaceDetector()
    batched = det.detect_many(frames)
    solo = [det.detect(f) for f in frames]
    assert batched == solo
    assert batched[0], "face missing in portrait"
    assert batched[2] == []


def test_haar_detector_finds_real_face():
    """The in-repo Viola-Jones evaluator must find the face in a real
    portrait (matplotlib's bundled grace_hopper.jpg) and stay quiet on a
    no-face test pattern."""
    pytest.importorskip("cv2")
    matplotlib = pytest.importorskip("matplotlib")
    from matplotlib import cbook
    from PIL import Image

    from mmer_tpu.preprocess.faces import HaarFaceDetector

    det = HaarFaceDetector()
    img = np.asarray(Image.open(
        cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)))
    boxes = det.detect(img)
    assert boxes, "no face found in portrait"
    x1, y1, x2, y2, conf = boxes[0]
    # Face occupies the central upper region of the 600x512 portrait.
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    assert 150 < cx < 400 and 100 < cy < 400
    assert 0.0 <= conf <= 1.0

    noise = (np.random.default_rng(0).random((120, 160, 3)) * 255
             ).astype(np.uint8)
    assert det.detect(noise) == []
