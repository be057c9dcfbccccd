"""Dataset-prep CLI: the reference's six standalone scripts as one tool.

Reference scripts → subcommands:
- ``cremad_extract_bboxes.py`` / ``ravdess_extract_bboxes.py`` → ``bboxes``
  (the walker handles both flat CREMA-D dirs and RAVDESS actor subdirs)
- ``cremad_bbox_converter.py`` / ``ravdess_bbox_converter.py`` → ``faces``
- ``cremad_video_to_audio_converter.py`` / ``ravdess_…`` → ``audio``

Usage:
    python -m mmer_tpu.preprocess.prep bboxes --input VIDEOS --output extracted_bboxes
    python -m mmer_tpu.preprocess.prep faces  --videos VIDEOS --bboxes extracted_bboxes --output extracted_faces_videos
    python -m mmer_tpu.preprocess.prep audio  --input VIDEOS --output extracted_audio

Unlike the reference (hardcoded absolute input dirs, one copy of each
script per dataset), paths are flags and the detector backend is pluggable
(``--detector haar`` offline default, ``--detector yolo --weights W`` for
the reference's model when available).
"""

from __future__ import annotations

import argparse
import os
import sys
from typing import Optional, Sequence


def _detector(args):
    if args.detector == "yolo":
        from mmer_tpu.preprocess.faces import YoloFaceDetector
        return YoloFaceDetector(args.weights)
    from mmer_tpu.preprocess.faces import HaarFaceDetector
    return HaarFaceDetector()


def cmd_bboxes(args) -> int:
    from mmer_tpu.preprocess.faces import process_folder_bboxes

    n = process_folder_bboxes(args.input, args.output, _detector(args),
                              conf_threshold=args.conf)
    print(f"Finished! Processed {n} video files.")
    return 0


def cmd_faces(args) -> int:
    from mmer_tpu.preprocess.faces import convert_folder_faces

    n = convert_folder_faces(args.videos, args.bboxes, args.output,
                             size=(args.size, args.size))
    print(f"Finished! Wrote {n} face videos.")
    return 0


def cmd_audio(args) -> int:
    from mmer_tpu.preprocess.audio import (convert_video_to_audio,
                                           extract_audio_to_wav,
                                           ffmpeg_available)
    from mmer_tpu.preprocess.video import iter_video_files

    use_ffmpeg = ffmpeg_available()
    if not use_ffmpeg:
        # Offline fallback: decode PCM tracks (serve/pcm_mp4) and write
        # WAV — same downstream consumers, no codec needed.  Videos whose
        # audio is compressed still fail loudly per-file below.
        print("ffmpeg not available — writing WAV from decodable "
              "(PCM) audio tracks instead of mp3", file=sys.stderr)
    os.makedirs(args.output, exist_ok=True)
    count = failed = 0
    for video in iter_video_files(args.input):
        stem = os.path.splitext(os.path.basename(video))[0]
        if use_ffmpeg:
            out = os.path.join(args.output, f"{stem}.mp3")
            ok = convert_video_to_audio(video, out, bitrate=args.bitrate)
        else:
            out = os.path.join(args.output, f"{stem}.wav")
            ok = extract_audio_to_wav(video, out)
        if ok:
            count += 1
            print(f"[{count}] {out}", flush=True)
        else:
            failed += 1
            print(f"Error processing {video}", file=sys.stderr)
    print(f"Finished! Converted {count} videos.")
    return 0 if count or not failed else 1


def main(argv: Optional[Sequence[str]] = None) -> int:
    p = argparse.ArgumentParser(description="Dataset preparation")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("bboxes", help="face detection → bbox txt artifacts")
    pb.add_argument("--input", required=True)
    pb.add_argument("--output", required=True)
    pb.add_argument("--conf", type=float, default=0.5)
    pb.add_argument("--detector", choices=["haar", "yolo"], default="haar")
    pb.add_argument("--weights", default=None, help="YOLO weights path")
    pb.set_defaults(fn=cmd_bboxes)

    pf = sub.add_parser("faces", help="bbox txt → cropped face videos")
    pf.add_argument("--videos", required=True)
    pf.add_argument("--bboxes", required=True)
    pf.add_argument("--output", required=True)
    pf.add_argument("--size", type=int, default=224)
    pf.set_defaults(fn=cmd_faces)

    pa = sub.add_parser("audio", help="video → mp3 audio tracks")
    pa.add_argument("--input", required=True)
    pa.add_argument("--output", required=True)
    pa.add_argument("--bitrate", default="320k")
    pa.set_defaults(fn=cmd_audio)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
