"""Video → per-window emotion inference (the serving capability centerpiece).

Reference behavior (back-end/app/libs/inference.py:356-524): detect a face
per frame, group face frames into gap-tolerant sequences, crop+resize each
frame, split into 32-frame subchunks, slide a stride-1 window of up to 5
subchunks, embed window audio + per-subchunk video, classify with the
fusion model, and emit ``{"bounding_box": [...], "inference": [...]}`` with
optional IG feature importances.

TPU-first rewrites of the reference's hot spots (SURVEY.md §3.4):
- per-subchunk ViViT features are computed ONCE and windows slide over the
  cached embeddings — the reference re-embeds every subchunk up to
  window_size times (inference.py:482-486);
- frame crops run batched on device (ops/image.py) instead of per-frame
  host cv2 calls (inference.py:104-144);
- the audio track is decoded once and windows slice the waveform — the
  reference spawns 2·W ffmpeg subprocesses per window (inference.py:413-467);
- windows are batched through the fusion model grouped by token count (so
  the audio token's position matches the reference's unpadded forward).

Checkpoint semantics fixed (documented): the reference serves a fusion
model whose pinned checkpoint fails to load (pos_embed 6 vs 57 shape
mismatch, caught and *ignored* — it silently serves random weights,
inference.py:236-265).  Here ``max_seq_len`` follows the trained checkpoint
and ``window_size`` is clamped to fit, loudly.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from mmer_tpu.config import LABELS, ModelConfig, ViViTConfig, Wav2Vec2Config


def _auto_mosaic_opt_in(key_prefix: str, cache_dir: str = None,
                        backend: str = None) -> bool:
    """Measured-gated automatic opt-in to a Pallas/Mosaic serving path.

    Serving defaults to pure-XLA graphs because a restart re-pays a
    Mosaic path's 131-700 s compile (process-unstable persistent-cache
    key; core/aot.py).  The exception: executable deserialization+
    execution has been validated on this backend (``aot_load_proven`` —
    the ``probe_aot load`` leg or any later cache load writes the marker)
    AND an executable for this path already sits in the AOT cache.  Then
    a restart costs a load, not a compile.  Caveat (artifact names key on
    argument avals): if the only cached executable is for a DIFFERENT
    shape (e.g. the extraction CLI's batch), the first serving start at a
    new shape still pays one Mosaic compile — but saves its own artifact,
    so the cost is once per shape machine-wide, not per restart.  Never
    engages on CPU (XLA:CPU rejects same-machine AOT artifacts) or under
    MMER_AOT_DISABLE.
    """
    if os.environ.get("MMER_AOT_DISABLE"):
        return False
    from mmer_tpu.core.aot import aot_artifacts, aot_load_proven

    if backend is None:
        import jax
        backend = jax.default_backend()
    if backend == "cpu":
        return False
    return (aot_load_proven(cache_dir, backend)
            and bool(aot_artifacts(key_prefix, cache_dir)))


def canonicalize_frame(rgb: np.ndarray, bboxes: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """Map an upload frame onto the bounded canonical-resolution family
    (core/buckets.resolution_bucket) before the shape-specialized device
    crop graph: edge-replication pad up to the ladder rung (BIT-IDENTICAL
    crops for in-bounds bboxes — the bilinear weights normalize over the
    equal-valued replicated pixels), downscaling first only when the frame
    exceeds the top rung (bboxes scale along).  The reference needs no
    analogue — its host cv2 crops are resolution-agnostic
    (inference.py:104-144); this is the XLA static-shape obligation, and
    it caps the per-resolution first-request compiles the r4 README
    documented at 11-19 s to a finite warmable set."""
    from mmer_tpu.core.buckets import resolution_bucket

    h, w = rgb.shape[:2]
    (ch, cw), scale = resolution_bucket(h, w)
    bboxes = np.asarray(bboxes, np.float32)
    if scale < 1.0:
        import cv2
        nh = min(int(round(h * scale)), ch)
        nw = min(int(round(w * scale)), cw)
        rgb = cv2.resize(rgb, (nw, nh))
        bboxes = bboxes * scale
        h, w = nh, nw
    if (h, w) != (ch, cw):
        rgb = np.pad(rgb, ((0, ch - h), (0, cw - w), (0, 0)), mode="edge")
    return rgb, bboxes


def window_audio_slices(seq_frames_idx: Sequence[int],
                        win_lens: Sequence[int], subchunk_size: int,
                        fps: float, sample_rate: int
                        ) -> List[Tuple[int, int]]:
    """Per-window waveform sample ranges ``[lo, hi)`` for a face sequence.

    Window ``s`` covers subchunks ``s..s+win_lens[s]`` of the sequence; its
    audio runs from the wall-clock time of the window's FIRST video frame
    to just past its LAST (reference back-end/app/libs/inference.py:413-431
    computes the same ``frame/fps`` start/end seconds, then extracts that
    span with two ffmpeg subprocesses per window — here the already-decoded
    waveform is sliced).  ``seq_frames_idx`` holds ORIGINAL video frame
    numbers, so gaps the grouper tolerated (≤ max_delay dropped
    detections) correctly stretch the audio span.  Ranges are guaranteed
    non-empty (``hi ≥ lo+1``); callers clip against the actual waveform
    length."""
    slices: List[Tuple[int, int]] = []
    n_frames = len(seq_frames_idx)
    for s, wl in enumerate(win_lens):
        f_lo = seq_frames_idx[min(s * subchunk_size, n_frames - 1)]
        last = min((s + wl) * subchunk_size, n_frames) - 1
        f_hi = seq_frames_idx[last]
        lo = int(f_lo / fps * sample_rate)
        hi = int((f_hi + 1) / fps * sample_rate)
        slices.append((lo, max(hi, lo + 1)))
    return slices


class InferenceEngine:
    """Lazy-loading, jit-caching engine shared by the HTTP app and tests."""

    def __init__(self,
                 model_cfg: Optional[ModelConfig] = None,
                 vivit_cfg: Optional[ViViTConfig] = None,
                 wav_cfg: Optional[Wav2Vec2Config] = None,
                 fusion_params_path: Optional[str] = None,
                 vivit_params_path: Optional[str] = None,
                 wav_params_path: Optional[str] = None,
                 detector=None,
                 norm_stats: Optional[dict] = None,
                 norm_stats_path: Optional[str] = None,
                 labels: Sequence[str] = LABELS,
                 vivit_use_flash: Optional[bool] = None,
                 wav_use_pallas: Optional[bool] = None):
        self.model_cfg = model_cfg or ModelConfig()
        self.vivit_cfg = vivit_cfg or ViViTConfig()
        self.wav_cfg = wav_cfg or Wav2Vec2Config()
        self.fusion_params_path = fusion_params_path
        self.vivit_params_path = vivit_params_path
        self.wav_params_path = wav_params_path
        self.labels = list(labels)
        if norm_stats is None and norm_stats_path:
            # Training-time global z-score stats (train/loop.py
            # _save_norm_stats).  The reference trains on z-scored features
            # but serves RAW extractor outputs — a silent train/serve skew
            # this closes.
            with np.load(norm_stats_path) as z:
                norm_stats = {k: z[k] for k in z.files}
        self.norm_stats = norm_stats or {}
        # Serving runs the ViViT on the pure-XLA path by default
        # (VERDICT r2 #5 measurements): the FIRST-EVER server start on a
        # machine compiles every graph, and the Pallas (flash-attn +
        # fused-FFN) ViViT's Mosaic compile is ~700 s vs ~50 s for the XLA
        # variant; per-request the difference is ~9 ms on a
        # detection-bound ~1.15 s p50.  WARM restarts are the same either
        # way — both hit the persistent compile cache (verified: no new
        # cache entry is written on restart) and are dominated by this
        # environment's per-process relay session-open tax (see
        # ``warmup``).  Extraction keeps the fused Pallas path, where one
        # compile amortizes over thousands of clips and the 97 vs 145 ms
        # per batch matters.
        # None = AUTO: opt in to the fast Mosaic path only when (a) a
        # serialized-executable LOAD is proven on this backend and (b) an
        # artifact for this path already exists — i.e. exactly when a
        # restart can skip the compile (see _auto_mosaic_opt_in).
        self.vivit_use_flash = vivit_use_flash
        # NOTE: the int8 serving route (--vivit_precision/--wav_precision)
        # was removed in r4 — the quantized-GEMM variants measured SLOWER
        # on chip (ViViT 0.80× bf16, XLA-attn variant 0.64×; W2V2 0.70×)
        # with a quality-fatal rel-l2 ≈ 0.02 (artifacts/probes/
        # r3_onchip.json).  models/{vivit,wav2vec2}_quant.py remain as
        # documented negative results with agreement tests.
        # Same policy for the audio conv encoder's fused Pallas kernels
        # (ops/conv_pyramid.py): XLA by default in serving, opt in with
        # --wav_pallas.  Extraction keeps the fused path (AudioEmbedder's
        # TPU default), where ~4 ms per B=64 batch amortizes the compile.
        self.wav_use_pallas = wav_use_pallas
        self._detector = detector
        self._video_extractor = None
        self._audio_embedder = None
        self._fusion = None          # (model, params, jitted apply)
        self._fusion_members = None  # ensemble size when serving a blend
        self._fusion_logits_fn = None
        self._ig_fn = None

    # -- lazy singletons (reference get_*_model, inference.py:39-265) -----
    @property
    def detector(self):
        if self._detector is None:
            from mmer_tpu.preprocess.faces import default_detector
            self._detector = default_detector()
        return self._detector

    @property
    def video_extractor(self):
        if self._video_extractor is None:
            from mmer_tpu.preprocess.extract import VideoFeatureExtractor
            use_flash = self.vivit_use_flash
            if use_flash is None:
                use_flash = _auto_mosaic_opt_in("vivit-extract-bf16-flash")
            self._video_extractor = VideoFeatureExtractor(
                self.vivit_cfg, params_path=self.vivit_params_path,
                use_flash=use_flash)
        return self._video_extractor

    @property
    def audio_embedder(self):
        if self._audio_embedder is None:
            from mmer_tpu.models.wav2vec2 import AudioEmbedder
            use_pallas = self.wav_use_pallas
            if use_pallas is None:
                use_pallas = _auto_mosaic_opt_in("w2v2-embed-bf16-pallas")
            self._audio_embedder = AudioEmbedder(
                self.wav_cfg, params_path=self.wav_params_path,
                use_pallas=use_pallas)
        return self._audio_embedder

    def _load_one_fusion(self, path: str, init_params: dict) -> dict:
        """One checkpoint → bare params tree.  Loud on every failure mode
        (anti-(inference.py:236-265))."""
        if not os.path.exists(path):
            raise FileNotFoundError(f"fusion checkpoint not found: {path}")
        if path.endswith(".pth"):
            # Reference-trained torch checkpoint (train2.py:766-774) — the
            # migration path.  Shape mismatches against model_cfg raise
            # loudly (models/port_fusion.py), the exact failure the
            # reference swallows into a silent random-weight serve.
            from mmer_tpu.models.port_fusion import load_pth
            variables, _ = load_pth(path, self.model_cfg)
            return variables["params"]
        from mmer_tpu.train.checkpoint import load_params_msgpack

        # Checkpoints store the bare params tree (train/loop.py saves
        # state.params / best_params).
        return load_params_msgpack(path, init_params)

    @property
    def fusion(self):
        if self._fusion is None:
            import jax

            from mmer_tpu.models.fusion import MultimodalEmotionModel

            model = MultimodalEmotionModel(self.model_cfg)
            import jax.numpy as jnp
            t = self.model_cfg.max_seq_len - 1
            # Jitted init (persistently compile-cached): eager per-op
            # dispatch costs ~50 s through this environment's relay.
            params = jax.jit(lambda k: model.init(
                {"params": k},
                jnp.zeros((1, t, self.model_cfg.video_dim)),
                jnp.zeros((1, self.model_cfg.audio_dim)),
                jnp.zeros((1, t), bool)))(jax.random.PRNGKey(0))
            # Comma-separated paths = a seed ensemble: members are stacked
            # on a leading axis and served as ONE vmapped program whose
            # probabilities are averaged — the serving twin of
            # train/ensemble.py's mean-probability blend (the measured
            # +F1 capability beyond the reference's single-model serve).
            paths = [p.strip() for p in
                     (self.fusion_params_path or "").split(",") if p.strip()]
            from mmer_tpu.core.aot import AotJit
            if len(paths) > 1:
                trees = [self._load_one_fusion(p, params["params"])
                         for p in paths]
                stacked = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *trees)
                params = {"params": stacked}
                self._fusion_members = len(trees)

                def ens_apply(p, v, a, m):
                    probs, logits, _ = jax.vmap(
                        lambda q: model.apply({"params": q}, v, a, m)
                    )(p["params"])
                    # Mean PROBS pick the class (train/ensemble.py
                    # semantics); mean logits are the ensemble's IG /
                    # score surrogate.
                    return probs.mean(0), logits.mean(0), None

                apply = AotJit(
                    ens_apply,
                    key=f"fusion-serve-ens{self._fusion_members}")
                self._fusion = (model, params, apply)
                return self._fusion
            if paths:
                params = {"params": self._load_one_fusion(
                    paths[0], params["params"])}
            # AOT-cached (core/aot.py): skips per-process tracing+lowering
            # on restart too, not just backend compiles; every engine call
            # site is 4-positional (train/return_attn stay at their
            # defaults), which is AotJit's contract.
            apply = AotJit(lambda p, v, a, m: model.apply(p, v, a, m),
                           key="fusion-serve")
            self._fusion = (model, params, apply)
        return self._fusion

    @property
    def fusion_logits_fn(self):
        """ONE stable logits closure for IG.  ``integrated_gradients`` jits
        with ``apply_fn`` as a static argument, so a fresh closure per
        request would recompile the IG graph every time and grow the jit
        cache without bound (ADVICE r1)."""
        if self._fusion_logits_fn is None:
            model, _, _ = self.fusion

            # Close over the TRACEABLE model.apply, not the AotJit
            # wrapper: ig_fn differentiates through this closure under
            # its own trace, and a jax.stages.Compiled can neither be
            # traced nor grad'd (on TPU the AotJit resolves to one; the
            # CPU fallback's plain jit masked this in tests).  The
            # non-explain forward keeps the AotJit fusion graph.
            if self._fusion_members:
                import jax

                def logits_fn(p, v, a, m):
                    # Ensemble IG surrogate: attribute the MEAN logits
                    # (the geometric-mean blend of member probabilities).
                    _, logits, _ = jax.vmap(
                        lambda q: model.apply({"params": q}, v, a, m)
                    )(p["params"])
                    return logits.mean(0)
            else:
                def logits_fn(p, v, a, m):
                    _, logits, _ = model.apply(p, v, a, m)
                    return logits

            self._fusion_logits_fn = logits_fn
        return self._fusion_logits_fn

    @property
    def ig_fn(self):
        """AOT-cached IG attribution graph: (params, video, audio, mask,
        targets) → (attr_video, attr_audio), n_steps=50 gausslegendre —
        the serving-default ``compute_attributions`` shape with the
        predicted-class targets supplied by the caller (the engine already
        has the window probs, so the extra argmax forward the generic
        helper runs is skipped)."""
        if self._ig_fn is None:
            from mmer_tpu.core.aot import AotJit
            from mmer_tpu.interpret.ig import integrated_gradients_impl
            lf = self.fusion_logits_fn
            self._ig_fn = AotJit(
                lambda p, v, a, m, t: integrated_gradients_impl(
                    lf, p, v, a, m, t, 50, "gausslegendre"),
                key="ig-serve")
        return self._ig_fn

    # ------------------------------------------------------------------
    def _normalize(self, video_feats: np.ndarray, audio_feats: np.ndarray):
        """Apply training-time global z-score stats when available."""
        vm, vs = self.norm_stats.get("video_mean"), self.norm_stats.get("video_std")
        am, as_ = self.norm_stats.get("audio_mean"), self.norm_stats.get("audio_std")
        if vm is not None:
            video_feats = (video_feats - vm) / vs
        if am is not None:
            audio_feats = (audio_feats - am) / as_
        return video_feats, audio_feats

    def infer_video_file(self, video_path: str, subchunk_size: int = 32,
                         window_size: int = 5, explain: bool = False,
                         detect_every: int = 1) -> Dict:
        """Reference ``infer_video_file`` contract (inference.py:356-524).

        ``detect_every=N`` runs the (host-bound) face detector on every Nth
        frame and carries the last bbox forward in between — an N× cut on
        the dominant serving cost for talking-head video.  Default 1 = the
        reference's every-frame behavior.
        """
        import cv2

        from mmer_tpu.preprocess.audio import extract_audio_track
        from mmer_tpu.preprocess.extract import SubchunkStream

        max_tokens = self.model_cfg.max_seq_len - 1
        if window_size > max_tokens:
            print(f"window_size {window_size} exceeds the fusion model's "
                  f"{max_tokens} video slots; clamping", flush=True)
            window_size = max_tokens

        # 1-3) ONE streaming pass: decode → detect (every Nth frame,
        # carrying the last boxes forward) → gap-tolerant sequence grouping
        # → device crop → ViViT, all incrementally.  Frames are dropped as
        # soon as they are cropped, so host memory is bounded by one
        # subchunk of raw frames + one device batch of crops regardless of
        # upload length (VERDICT r2 #6: the previous full-video ``frames``
        # list was ~5 GB of RGB for a 10-minute 1080p upload; the
        # reference's seek-based re-read, inference.py:104-144, never holds
        # the video either).  Sequence semantics match
        # faces.group_face_sequences: best box per frame, gaps ≤ 10,
        # ≤ 10000 frames per sequence.
        #
        # (Detection is per-frame by design: a batched vectorized cascade
        # measured ~3× slower per frame on this host class — cross-frame
        # gathers lose cache locality; see cascade.HaarCascade.detect_many.)
        max_delay, max_seq_frames = 10, 10000
        step = max(detect_every, 1)
        bounding_box = []
        sequences: List[Tuple[List[int], np.ndarray]] = []  # (frames, feats)
        open_frames: List[int] = []
        open_stream: Optional[SubchunkStream] = None

        def close_sequence():
            nonlocal open_stream
            if open_stream is not None and open_frames:
                sequences.append((list(open_frames), open_stream.finish()))
            open_stream = None
            open_frames.clear()

        cap = cv2.VideoCapture(video_path)
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        idx = 0
        carried: Optional[list] = None
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            rgb = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if idx % step == 0:
                carried = self.detector.detect(rgb)
            for (x1, y1, x2, y2, conf) in (carried or []):
                bounding_box.append({
                    "frame": idx, "x1": float(x1), "y1": float(y1),
                    "x2": float(x2), "y2": float(y2),
                    "confidence": float(conf)})
            if carried:
                best = max(carried, key=lambda r: r[4])
                if open_frames and (idx - open_frames[-1] > max_delay
                                    or len(open_frames) >= max_seq_frames):
                    close_sequence()
                if open_stream is None:
                    open_stream = SubchunkStream(self.video_extractor,
                                                 subchunk_size)
                open_frames.append(idx)
                # Bounded-resolution crop graphs: pad/downscale onto the
                # canonical ladder so any upload resolution hits a warm
                # (or warmable) compile (VERDICT r4 #3).
                crgb, cbox = canonicalize_frame(
                    rgb, np.asarray(best[:4], np.float32)[None])
                open_stream.add(crgb[None], cbox)
            idx += 1
        cap.release()
        close_sequence()
        if idx == 0:
            return {"bounding_box": [], "inference": []}

        # Audio track decoded ONCE (None without ffmpeg → zero embeddings,
        # the reference's no-audio fallback, inference.py:471-473).
        waveform = extract_audio_track(video_path,
                                       self.wav_cfg.sample_rate)

        inference: List[Dict] = []

        for seq_frames_idx, sub_feats in sequences:
            n_sub = sub_feats.shape[0]

            # 4) per-window audio slices, embedded in one batch ----------
            win_lens = [min(window_size, n_sub - s) for s in range(n_sub)]
            audio_waves = []
            if waveform is not None:
                for lo, hi in window_audio_slices(
                        seq_frames_idx, win_lens, subchunk_size, fps,
                        self.wav_cfg.sample_rate):
                    piece = waveform[lo:hi]
                    audio_waves.append(piece if len(piece) else
                                       np.zeros(1, np.float32))
                audio_embs = self.audio_embedder.embed_batch(audio_waves)
            else:
                audio_embs = np.zeros((n_sub, self.model_cfg.audio_dim),
                                      np.float32)

            # 5) windows batched by token count --------------------------
            model, params, apply = self.fusion
            by_len: Dict[int, List[int]] = {}
            for s, wl in enumerate(win_lens):
                by_len.setdefault(wl, []).append(s)

            probs_all = np.zeros((n_sub, len(self.labels)), np.float32)
            imp_all: Dict[int, Dict] = {}
            for wl, starts in by_len.items():
                nb = len(starts)
                video_w = np.stack([sub_feats[s:s + wl] for s in starts])
                audio_w = audio_embs[starts]
                video_w, audio_w = self._normalize(video_w, audio_w)
                # Batch bucketing (core/buckets.py): group sizes track the
                # per-video window count, so raw nb would compile a fresh
                # fusion (and, with explain, IG) executable per distinct
                # upload length and grow the AOT cache without bound;
                # bucketing bounds the shape set to {1,2,4,…}×window_size.
                # Padding rows repeat the last window and are sliced away.
                from mmer_tpu.core.buckets import batch_bucket
                bp = batch_bucket(nb)
                if bp > nb:
                    video_w = np.concatenate(
                        [video_w, np.repeat(video_w[-1:], bp - nb, axis=0)])
                    audio_w = np.concatenate(
                        [audio_w, np.repeat(audio_w[-1:], bp - nb, axis=0)])
                mask = np.zeros((bp, wl), bool)
                probs, _, _ = apply(params, video_w, audio_w, mask)
                probs = np.asarray(probs)
                probs_all[starts] = probs[:nb]

                if explain:
                    from mmer_tpu.interpret import aggregate_importances

                    # Targets = predicted class (the generic
                    # compute_attributions default) — already known from
                    # the window probs, softmax being monotonic.
                    targets = np.argmax(probs, axis=-1).astype(np.int32)
                    av, aa = self.ig_fn(params, video_w, audio_w, mask,
                                        targets)
                    vi, ai = aggregate_importances(av, aa)
                    vi, ai = np.asarray(vi), np.asarray(ai)
                    for row, s in enumerate(starts):
                        imp_all[s] = _topk_importance(vi[row], ai[row])

            # 6) emit (reference item schema, inference.py:500-520) ------
            for s in range(n_sub):
                start_frame_idx = s * subchunk_size
                start_frame = (seq_frames_idx[start_frame_idx]
                               if start_frame_idx < len(seq_frames_idx)
                               else 0)
                pred = int(np.argmax(probs_all[s]))
                item = {"class": self.labels[pred], "frame": int(start_frame)}
                if explain and s in imp_all:
                    item["feature_importance"] = imp_all[s]
                inference.append(item)

        return {"bounding_box": bounding_box, "inference": inference}

    def warmup(self, subchunk_size: int = 32, window_size: int = 5,
               explain: bool = True,
               resolutions: Sequence[Tuple[int, int]] = (),
               fps: float = 30.0,
               sample_upload: Optional[bytes] = None,
               sample_detect_every: int = 3) -> None:
        """Pre-compile the default-request compute graphs (ViViT at the
        subchunk shape, Wav2Vec2 at the 1 s bucket and every bucket a
        ≤ ``window_size``-subchunk window lands in at ``fps`` — 2–6 s for
        the 32-frame/30 fps default — fusion AND the IG
        explain graph at each window length) so the first real upload
        doesn't pay cold-compile latency.  With the persistent compile
        cache this is fast after the first-ever server start on a machine.
        Batch dims are warmed at bucket 1; other batch buckets (bounded by
        core/buckets.py) compile once on first use and are then cached.

        ``resolutions``: (height, width) video formats to pre-compile the
        bucketed crop graph for (embed_cropped_frames) — without this,
        the first upload's bucket pays a small compile.  Pass your
        expected camera formats, e.g. ``[(480, 640), (720, 1280)]``.

        ``sample_upload``: optional raw video-file bytes replayed through
        ``infer_file_bytes`` as the LAST warmup phase.  The enumerated
        warming above covers every big graph, but ~12 small auxiliary
        request-path graphs (measured r5) only exist on the live path;
        a representative sample (a real face + audio track, ideally at a
        production resolution/length) warms those by construction, making
        the first real request run at steady-state latency.
        ``sample_detect_every`` bounds the replay's host detection cost
        on long samples (default 3, the production benchmark setting)."""
        import time

        import numpy as np

        import jax
        import jax.numpy as jnp

        t_start = time.time()
        phases: List[Tuple[str, float]] = []

        def phase(name):
            phases.append((name, time.time()))

        # Pay the per-process device-session cost FIRST, in its own
        # labeled phase: through this environment's tunneled chip the
        # first REAL host<->device round-trip of a process costs
        # 50-400 s (measured with a trivial 2-layer model: 134-310 s
        # before any big graph ever ran; `block_until_ready` alone does
        # NOT force it).  On a directly-attached TPU this is sub-second.
        # Separating it keeps the rest of the breakdown honest: the
        # framework's own warm-restart work measures ~25 s.
        np.asarray(jnp.zeros((8, 128)) + 1.0)
        phase("device session open (per-process relay tax; ~0 on "
              "directly-attached TPUs)")

        max_tokens = self.model_cfg.max_seq_len - 1
        window_size = min(window_size, max_tokens)
        # uint8, matching the live request path (embed_cropped_frames /
        # frames_to_chunks both produce uint8 chunks): warming float32
        # here would compile a graph the first real upload never hits.
        chunks = np.zeros((1, subchunk_size, *self.vivit_cfg.image_size, 3),
                          np.uint8)
        _ = self.video_extractor                 # params init (jitted)
        phase("vivit params init")
        sub_feats = self.video_extractor.embed_chunks(chunks)
        phase("vivit forward graph")
        from mmer_tpu.core.buckets import resolution_bucket
        warmed = set()
        for h, w in resolutions:
            # The live path canonicalizes every frame (canonicalize_frame),
            # so warm the BUCKETED shape — that is the graph requests hit.
            (ch, cw), _ = resolution_bucket(h, w)
            if (ch, cw) in warmed:
                continue
            warmed.add((ch, cw))
            frames = np.zeros((subchunk_size, ch, cw, 3), np.uint8)
            bboxes = np.tile(np.asarray([0, 0, cw, ch], np.float32),
                             (subchunk_size, 1))
            self.video_extractor.embed_cropped_frames(frames, bboxes,
                                                      subchunk_size)
            phase(f"crop graph {ch}x{cw} (bucket of {h}x{w})")
        _ = self.audio_embedder                  # w2v2-large params init
        phase("w2v2 params init")
        self.audio_embedder.embed_batch(
            [np.zeros(self.wav_cfg.sample_rate, np.float32)])
        phase("w2v2 forward graph (1s bucket)")
        # The buckets real windows land in: window length wl covers
        # wl·subchunk_size frames → ceil(wl·32/fps) s at the 1 s bucket
        # granularity, for EVERY wl ≤ window_size — a 96-frame upload
        # (3 subchunks) makes windows of 3/2/1 subchunks → the 4 s/3 s/
        # 2 s buckets, and warming only the max-window bucket left all
        # three cold (measured r5: a 38 s first "warmed" request, three
        # wav2vec2-large request-time compiles).  Clips beyond
        # chunk_duration_s are split, so that caps the bucket family.
        warmed_buckets = {1}
        for wl in range(1, window_size + 1):
            win_s = min(wl * subchunk_size / max(fps, 1e-6),
                        float(self.wav_cfg.chunk_duration_s))
            b = int(np.ceil(win_s))
            if b in warmed_buckets:
                continue
            warmed_buckets.add(b)
            self.audio_embedder.embed_batch(
                [np.zeros(b * self.wav_cfg.sample_rate, np.float32)])
            phase(f"w2v2 forward graph ({b}s bucket, window wl={wl})")
        _, params, apply = self.fusion
        phase("fusion params init+load")
        for wl in range(1, window_size + 1):
            video_w = np.tile(sub_feats[:1][None], (1, wl, 1)
                              ).reshape(1, wl, -1)
            audio_w = np.zeros((1, self.model_cfg.audio_dim), np.float32)
            mask = np.zeros((1, wl), bool)
            import jax
            jax.block_until_ready(apply(params, video_w, audio_w, mask))
            phase(f"fusion graph wl={wl}")
            if explain:
                jax.block_until_ready(self.ig_fn(
                    params, video_w, audio_w, mask,
                    np.zeros((1,), np.int32)))
                phase(f"IG graph wl={wl}")
        # End-to-end sample request: the single-graph warming above still
        # leaves ~12 small auxiliary graphs to the first real request
        # (normalize at each window shape, IG aggregation, audio piece
        # pooling, chunk packing — measured r5 via cProfile: 12 compiles,
        # ~5.5 s, a 10.3 s first request with every ENUMERATED graph
        # warm).  Enumerating them here would drift from the request path;
        # replaying one representative upload covers them by construction.
        if sample_upload is not None:
            res = self.infer_file_bytes(sample_upload, "warmup_sample.mp4",
                                        subchunk_size=subchunk_size,
                                        window_size=window_size,
                                        explain=explain,
                                        detect_every=sample_detect_every)
            if not res["inference"]:
                # A no-face/undecodable sample silently warms NOTHING —
                # the first real request would still pay the compiles
                # this feature exists to remove.  Loud, but non-fatal:
                # the server is still fully functional.
                print("WARNING: warmup sample_upload produced no "
                      "inference items (no face detected / not "
                      "decodable) — auxiliary request-path graphs were "
                      "NOT warmed; use a clip with a detectable face",
                      flush=True)
            phase("end-to-end sample request (auxiliary request-path "
                  "graphs)")
        # Startup-phase breakdown (VERDICT r2 #5): where a restart's
        # wall-clock actually goes, phase by phase.
        prev = t_start
        for name, t in phases:
            print(f"warmup {t - prev:7.1f}s  {name}", flush=True)
            prev = t
        print(f"engine warmup complete in {time.time() - t_start:.1f}s",
              flush=True)

    def predict_clip(self, video_path: str, subchunk_size: int = 32,
                     top_k: int = 3) -> Optional[Dict]:
        """Whole-clip (non-windowed) prediction — the reference's legacy
        ``InferenceEngine.predict_from_file`` contract
        (back-end/app/inference.py:27-163, not wired to any route there):
        all chunks of the raw clip → (T, 768), audio track → (1024,),
        clip/pad to the fusion model's ``max_seq_len - 1`` video slots,
        → ``{"predicted_label", "predicted_index", "scores": top-k}``."""
        from mmer_tpu.preprocess.audio import extract_audio_track
        from mmer_tpu.preprocess.video import load_video_chunks

        chunks = load_video_chunks(video_path, subchunk_size,
                                   tuple(self.vivit_cfg.image_size))
        if chunks is None:
            return None
        video_feats = self.video_extractor.embed_chunks(chunks)   # (T, 768)

        waveform = extract_audio_track(video_path, self.wav_cfg.sample_rate)
        if waveform is not None and len(waveform):
            audio_emb = self.audio_embedder.embed_batch([waveform])[0]
        else:
            audio_emb = np.zeros(self.model_cfg.audio_dim, np.float32)

        max_tokens = self.model_cfg.max_seq_len - 1
        t = video_feats.shape[0]
        if t > max_tokens:
            video_feats = video_feats[:max_tokens]
            mask = np.zeros((1, max_tokens), bool)
        else:
            pad = np.zeros((max_tokens - t, video_feats.shape[1]),
                           np.float32)
            video_feats = np.concatenate([video_feats, pad])
            mask = np.arange(max_tokens)[None, :] >= t

        video_b, audio_b = self._normalize(video_feats[None],
                                           audio_emb[None])
        _, params, apply = self.fusion
        probs, _, _ = apply(params, video_b, audio_b, mask)
        probs = np.asarray(probs)[0]
        order = np.argsort(-probs)[:top_k]
        return {
            "predicted_label": self.labels[int(order[0])],
            "predicted_index": int(order[0]),
            "scores": [{"label": self.labels[int(i)],
                        "probability": float(probs[i])} for i in order],
        }

    def infer_file_bytes(self, data: bytes, filename: str = "upload.mp4",
                         subchunk_size: int = 32, window_size: int = 5,
                         explain: bool = False, detect_every: int = 1) -> Dict:
        """Upload wrapper (reference infer_upload_file, inference.py:528-535)."""
        import tempfile

        with tempfile.TemporaryDirectory() as tmpdir:
            path = os.path.join(tmpdir, os.path.basename(filename) or "u.mp4")
            with open(path, "wb") as f:
                f.write(data)
            return self.infer_video_file(path, subchunk_size, window_size,
                                         explain, detect_every=detect_every)


def _topk_importance(video_imp: np.ndarray, audio_imp: np.ndarray,
                     top_k: int = 10) -> Dict:
    def top(arr):
        idx = np.argsort(-np.abs(arr))[:top_k]
        return [{"dimension": int(i), "importance": float(arr[i])}
                for i in idx]

    return {"video": top(video_imp), "audio": top(audio_imp)}
