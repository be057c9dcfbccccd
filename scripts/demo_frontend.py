"""Serve the full UI + API from one process for a hands-on demo.

Starts the stdlib server (mmer_tpu/serve/app.py) with a small CPU-friendly
engine and mounts a synthesized real-face demo clip at /static/demo.mp4,
then prints the URL.  Opening

    http://127.0.0.1:<port>/?demo=/static/demo.mp4&subchunk=4&window=2

renders the no-build frontend (frontend/static/) and auto-runs the whole
upload → /infer → overlay/waveform/IG-chart flow — the same capability the
reference only gets after a node build + three docker containers
(front-end/Dockerfile, docker-compose.yml).

Run on the host CPU (leaves the TPU tunnel alone):

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/demo_frontend.py [--port 8123] [--full-models]

--full-models uses production-size ViViT/Wav2Vec2 (slow on CPU; the
default tiny configs exercise every code path at interactive speed).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_demo_clip(path: str, frames: int = 48, size=(256, 300),
                   audio: bool = True) -> None:
    """An mp4 whose frames contain a real face (matplotlib's bundled
    grace_hopper portrait) with slight jitter, so the Viola-Jones
    detector fires on real structure — same recipe as tests/test_serve.py.
    Carries a PCM tone track by default (serve/pcm_mp4) so the demo drives
    the live audio leg and the frontend waveform has real content."""
    import cv2
    from matplotlib import cbook
    from PIL import Image

    img = np.asarray(Image.open(
        cbook.get_sample_data("grace_hopper.jpg", asfileobj=False)))
    img = cv2.resize(img, size)
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, size)
    if not w.isOpened():
        raise RuntimeError("no mp4 encoder available in cv2")
    rng = np.random.default_rng(0)
    for _ in range(frames):
        jitter = img.astype(np.int16) + rng.integers(-8, 8, img.shape)
        w.write(np.clip(jitter, 0, 255).astype(np.uint8)[:, :, ::-1])
    w.release()
    if audio:
        from mmer_tpu.serve.pcm_mp4 import mux_pcm_into_file
        sr = 16000
        t = np.arange(int(frames / 30.0 * sr)) / sr
        wav = (0.4 * np.sin(2 * np.pi * 330 * t)
               * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
        mux_pcm_into_file(path, wav, sr)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--port", type=int, default=8123)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--frames", type=int, default=48)
    parser.add_argument("--full-models", action="store_true",
                        help="production-size extractors (slow on CPU)")
    args = parser.parse_args()

    from mmer_tpu.config import ModelConfig, ViViTConfig, Wav2Vec2Config
    from mmer_tpu.serve.app import serve
    from mmer_tpu.serve.engine import InferenceEngine

    demo_dir = tempfile.mkdtemp(prefix="mmer_demo_")
    clip = os.path.join(demo_dir, "demo.mp4")
    make_demo_clip(clip, frames=args.frames)
    print(f"demo clip: {clip} ({args.frames} frames)")

    if args.full_models:
        engine = InferenceEngine()
    else:
        engine = InferenceEngine(
            model_cfg=ModelConfig(max_seq_len=8, fusion_layers=1,
                                  compute_dtype="float32"),
            vivit_cfg=ViViTConfig(image_size=(32, 32), patch_size=(16, 16),
                                  num_frames=4, tubelet_size=2, dim=768,
                                  depth=1, heads=2, dim_head=32, mlp_dim=64,
                                  compute_dtype="float32"),
            # hidden_dim stays 1024 = the fusion model's audio_dim; the
            # demo clip carries a PCM track so the audio leg runs live.
            wav_cfg=Wav2Vec2Config(hidden_dim=1024, num_layers=1,
                                   num_heads=2, ffn_dim=64,
                                   conv_dims=(16, 16), conv_strides=(5, 2),
                                   conv_kernels=(10, 3),
                                   num_conv_pos_embeddings=16,
                                   num_conv_pos_embedding_groups=4,
                                   compute_dtype="float32"))

    url = (f"http://{args.host}:{args.port}/"
           f"?demo=/static/demo.mp4&subchunk=4&window=2&detect=3")
    print(f"open: {url}", flush=True)
    serve(engine, host=args.host, port=args.port,
          extra_static={"/static/demo.mp4": (clip, "video/mp4")})


if __name__ == "__main__":
    main()
