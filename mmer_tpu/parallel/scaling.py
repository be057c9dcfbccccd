"""Measured scaling evidence for the extraction fan-out (VERDICT r2 #1).

The pod story for this framework rests on fanning the reference's batch-1
extraction hot loop (`/root/reference/video_extractor.py:152-156`,
`voice_extractor.py:37-50`) out over a device mesh's data axis with
replicated params — embarrassingly parallel, zero XLA collectives.  This
module turns that from an assertion into a measurement:

- **Correctness**: sharded outputs must equal single-device outputs for
  both extractors (ViViT chunks, Wav2Vec2 waveforms).
- **Scaling efficiency**: the sharded program embeds the SAME global batch
  as one single-device program; ``efficiency = t_single / t_sharded``.
  Perfect SPMD partitioning → 1.0; anything XLA adds for the partitioned
  program (dispatch, layout changes, unexpected collectives) shows up as a
  ratio below 1.

What this does and does not measure: on this host the ``n``-device mesh is
virtual (one physical CPU — see CLAUDE.md), so both timings run on the same
silicon and the ratio isolates *partition overhead*, which for a
replicated-param batch-sharded program is the only per-step cost the mesh
adds (there are no collectives to ride ICI; per-chip HBM/MXU behavior is
measured on the real chip by bench.py).  The pod projection in bench.py is
therefore ``n_chips × per-chip-throughput × efficiency``.

Run directly for one JSON line (bench.py's subprocess entry):

    python -m mmer_tpu.parallel.scaling --n_devices 8
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np

# Small enough to compile+run in seconds on one CPU core, big enough that a
# timed call is dominated by compute, not dispatch (~0.5 s/call measured).
_VIVIT_KW = dict(image_size=(64, 64), patch_size=(16, 16), num_frames=8,
                 tubelet_size=4, dim=128, depth=4, heads=4, dim_head=32,
                 mlp_dim=256, compute_dtype="float32")
_W2V2_KW = dict(hidden_dim=128, num_layers=2, num_heads=4, ffn_dim=256,
                conv_dims=(64,) * 7, num_conv_pos_embeddings=16,
                num_conv_pos_embedding_groups=4, compute_dtype="float32")


def _time_best(fn, reps: int) -> float:
    import jax

    # One untimed warmup: the first call of a fresh executable pays its
    # compile, and the first touch of a lazily device_put input pays the
    # transfer — with reps=1 (the dryrun's setting) min() cannot discard
    # either, which inflated t by ~50x (compile) before this guard.
    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def measure_extract_scaling(n_devices: int, reps: int = 3,
                            per_device_batch: int = 16) -> dict:
    """Sharded-vs-single correctness + efficiency for both extractors.

    Returns ``{"video": {...}, "audio": {...}, "n_devices": n}`` where each
    modality carries ``max_abs_err`` (sharded vs single-device on the same
    inputs+params) and ``efficiency`` (same-global-batch time ratio).
    Raises if outputs disagree beyond float tolerance.

    On the shared-core virtual mesh the sharded run additionally pays
    per-virtual-device dispatch that real chips do not share, so small
    per-device batches UNDERSTATE efficiency; the default global batch
    (16/device) amortizes it (measured: video 0.70 → ~1.0 going from
    4/device to 16/device).  The ratio is a conservative lower bound for
    a real pod either way.
    """
    import jax

    from mmer_tpu.config import MeshConfig, ViViTConfig, Wav2Vec2Config
    from mmer_tpu.core.mesh import create_mesh
    from mmer_tpu.models.wav2vec2 import AudioEmbedder
    from mmer_tpu.preprocess.extract import VideoFeatureExtractor

    if len(jax.devices()) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, "
                           f"found {len(jax.devices())}")
    mesh = create_mesh(MeshConfig(), devices=jax.devices()[:n_devices])
    G = per_device_batch * n_devices            # global batch
    rng = np.random.default_rng(0)
    out = {"n_devices": n_devices}

    # ---- ViViT chunk embedding ----------------------------------------
    vcfg = ViViTConfig(**_VIVIT_KW)
    # flash attention is a TPU Pallas kernel; the virtual mesh is CPU, so
    # exercise the plain XLA path (per-device math is identical).
    single = VideoFeatureExtractor(vcfg, device_batch=G, use_flash=False)
    sharded = VideoFeatureExtractor(vcfg, device_batch=G, use_flash=False,
                                    mesh=mesh)
    f, (h, w) = vcfg.num_frames, vcfg.image_size
    chunks = (rng.random((G, f, h, w, 3)) * 255).astype(np.uint8)
    want = single.embed_chunks(chunks)
    got = sharded.embed_chunks(chunks)
    v_err = float(np.max(np.abs(got - want)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    dev_chunks = jax.device_put(chunks)
    t_single = _time_best(
        lambda: single._apply(single.params, dev_chunks), reps)
    # The sharded program is timed with inputs ALREADY at its in_sharding
    # — the pod analog is each host feeding its own chips.  Timing with
    # device-0-resident inputs instead charges an input reshard to the
    # partitioned program (measured +5% on the audio leg,
    # scripts/probe_audio_fanout_eff.py).
    from mmer_tpu.core.mesh import data_sharding
    sh_chunks = jax.device_put(chunks, data_sharding(mesh, chunks.ndim))
    t_sharded = _time_best(
        lambda: sharded._apply(sharded.params, sh_chunks), reps)
    # Weak scaling (what bench.py's pod projection actually assumes): each
    # chip keeps the SAME per-chip batch it was benchmarked at and works
    # through 1/n of the dataset.  The IDEAL sharded time is backend-
    # dependent (derivation at ideal_mult below);
    #     weak_eff = ideal / t_sharded(G)
    # isolates pure partition overhead at the per-chip batch, free of the
    # small-batch penalty the strong-scaling ratio above also charges.  A
    # raw ratio > 1 means the overhead is below timing noise; the clamped
    # value (what bench.py consumes) then reads "no measurable overhead",
    # with the raw value kept alongside for honesty.
    single_pd = VideoFeatureExtractor(vcfg, device_batch=per_device_batch,
                                      use_flash=False)
    dev_pd = jax.device_put(chunks[:per_device_batch])
    t_single_pd = _time_best(
        lambda: single_pd._apply(single_pd.params, dev_pd), reps)
    # On a CPU backend the n virtual devices share os.cpu_count() physical
    # cores: one core runs the shards sequentially (ideal = n·t_pd), c ≥ n
    # cores run them concurrently like real chips (ideal = t_pd), and in
    # between n/min(n,c) approximates the wave count (intra-op threading
    # ignored — the ratio is a calibration, not a guarantee).  A pure
    # backend=="cpu" proxy (always sequential) would clamp weak_eff to 1.0
    # on any multi-core host and silently erase the partition-overhead
    # discount from bench.py's pod projection.
    if jax.default_backend() == "cpu":
        cores = os.cpu_count() or 1
        ideal_mult = n_devices / min(n_devices, cores)
    else:
        ideal_mult = 1.0

    def _weak(t_pd: float, t_sh: float) -> dict:
        raw = ideal_mult * t_pd / t_sh
        return {"weak_efficiency": round(min(raw, 1.0), 4),
                "weak_efficiency_raw": round(raw, 4)}

    out["video"] = {"max_abs_err": v_err, "global_batch": G,
                    "t_single_s": round(t_single, 4),
                    "t_sharded_s": round(t_sharded, 4),
                    "efficiency": round(t_single / t_sharded, 4),
                    "t_single_per_device_batch_s": round(t_single_pd, 4),
                    **_weak(t_single_pd, t_sharded)}

    # ---- Wav2Vec2 waveform embedding ----------------------------------
    acfg = Wav2Vec2Config(**_W2V2_KW)
    a_single = AudioEmbedder(acfg)
    a_sharded = AudioEmbedder(acfg, mesh=mesh)
    waves = [rng.normal(size=(16000 + 997 * i,)).astype(np.float32)
             for i in range(G)]
    a_want = a_single.embed_batch(waves)
    a_got = a_sharded.embed_batch(waves)
    a_err = float(np.max(np.abs(a_got - a_want)))
    np.testing.assert_allclose(a_got, a_want, atol=1e-5, rtol=1e-5)
    from mmer_tpu.models.wav2vec2 import feat_extract_output_length
    n_pad = a_single._bucket_len(2 * acfg.sample_rate)
    t_out = feat_extract_output_length(acfg, n_pad)
    batch = jax.device_put(
        rng.normal(size=(G, n_pad)).astype(np.float32))
    mask = jax.device_put(np.zeros((G, t_out), bool))
    ta_single = _time_best(
        lambda: a_single._apply_pool(a_single.params, batch, mask), reps)
    sh_batch = jax.device_put(np.asarray(batch), data_sharding(mesh, 2))
    sh_mask = jax.device_put(np.asarray(mask), data_sharding(mesh, 2))
    ta_sharded = _time_best(
        lambda: a_sharded._apply_pool(a_sharded.params, sh_batch, sh_mask),
        reps)
    # Weak scaling: same per-chip batch as the single-device bench point
    # (see the video leg's comment — ideal sharded time on the one-core
    # mesh is n × the per-device-batch single time).  The strong-scaling
    # ratio above additionally charges the audio model's small-batch
    # inefficiency — at G/n the conv pyramid's fixed per-program cost
    # stops amortizing — which a pod running per-chip batches of the
    # production size never pays; the r3 bench's "audio efficiency 0.877"
    # was exactly this artifact (VERDICT r3 #8).
    batch_pd = jax.device_put(np.asarray(batch[:per_device_batch]))
    mask_pd = jax.device_put(np.zeros((per_device_batch, t_out), bool))
    ta_single_pd = _time_best(
        lambda: a_single._apply_pool(a_single.params, batch_pd, mask_pd),
        reps)
    out["audio"] = {"max_abs_err": a_err, "global_batch": G,
                    "t_single_s": round(ta_single, 4),
                    "t_sharded_s": round(ta_sharded, 4),
                    "efficiency": round(ta_single / ta_sharded, 4),
                    "t_single_per_device_batch_s": round(ta_single_pd, 4),
                    **_weak(ta_single_pd, ta_sharded)}
    return out


def measure_train_scaling(n_devices: int, reps: int = 2, epochs: int = 4,
                          batch: int = 1024, n_samples: int = 4096,
                          max_chunks: int = 5) -> dict:
    """dp efficiency of the FUSED trainer (VERDICT r4 #4: the pod
    projection previously held training at its single-chip time — an
    assumption where the extractors got a measurement).

    STRONG-scaling basis, unlike the extractors: the global batch is a
    convergence hyperparameter, so a dp pod keeps it and splits every
    minibatch (train and eval) ``n`` ways — grad psum over the data axis
    is the one collective.  On the virtual mesh the single-device and
    sharded runs see the same physical cores and the same total work, so
    ``efficiency = t_single / t_sharded`` isolates what the partitioned
    program adds (psum, per-shard dispatch, layout) at ANY core count —
    no ``ideal_mult`` calibration is needed.  What the virtual mesh cannot
    see: real per-chip MXU utilization at the 8×-smaller per-chip batch,
    and real ICI latency — but training is <3% of the end-to-end wall
    (bench.py components), so the projection is insensitive to both.

    Correctness is asserted in-run (same-seed single vs dp best scores;
    the full trajectory equality is pinned by tests/test_fused_multichip).
    """
    import jax
    import jax.numpy as jnp

    from mmer_tpu.config import MeshConfig, ModelConfig, TrainConfig
    from mmer_tpu.core.mesh import create_mesh, replicate
    from mmer_tpu.data.pipeline import (balanced_class_weights,
                                        stratified_splits)
    from mmer_tpu.models.fusion import MultimodalEmotionModel
    from mmer_tpu.parallel.sharding import shard_params
    from mmer_tpu.train.fused import build_fused_train
    from mmer_tpu.train.loop import make_optimizer

    if len(jax.devices()) < n_devices:
        raise RuntimeError(f"need {n_devices} devices, "
                           f"found {len(jax.devices())}")
    mesh = create_mesh(MeshConfig(), devices=jax.devices()[:n_devices])
    rng_np = np.random.default_rng(0)
    t = max_chunks
    labels = rng_np.integers(0, 6, size=(n_samples,)).astype(np.int32)
    lengths = rng_np.integers(1, t + 1, size=(n_samples,)).astype(np.int32)
    dev = {
        "video": jnp.asarray(
            rng_np.normal(size=(n_samples, t, 768)).astype(np.float32)),
        "audio": jnp.asarray(
            rng_np.normal(size=(n_samples, 1024)).astype(np.float32)),
        "pad_mask": jnp.asarray(
            np.arange(t)[None, :] >= lengths[:, None]),
        "labels": jnp.asarray(labels),
    }
    tr, va, te = stratified_splits(labels, seed=42)
    cw = jnp.asarray(balanced_class_weights(labels[tr]))
    tri = jnp.asarray(tr, jnp.int32)
    vai = jnp.asarray(va, jnp.int32)
    tei = jnp.asarray(te, jnp.int32)

    # PRODUCTION model + recipe shapes (bench.py's fused-train component).
    model_cfg = ModelConfig(max_seq_len=t + 1)
    train_cfg = TrainConfig(lr=1e-4, num_epochs=epochs, patience=10 ** 9)
    model = MultimodalEmotionModel(model_cfg)
    optimizer = make_optimizer(train_cfg)

    def timed(use_mesh) -> tuple:
        run = build_fused_train(model, optimizer, model_cfg, train_cfg,
                                batch, mesh=use_mesh)

        def once(seed: int) -> float:
            r = jax.random.PRNGKey(seed)
            params = model.init(
                {"params": r}, dev["video"][:2], dev["audio"][:2],
                dev["pad_mask"][:2])["params"]
            d, c = dev, cw
            if use_mesh is not None and use_mesh.size > 1:
                params = shard_params(params, use_mesh)
                d = replicate(use_mesh, dev)
                c = replicate(use_mesh, cw)
            final = run(params, optimizer.init(params), r, d,
                        tri, vai, tei, c)
            jax.block_until_ready(final.epoch)
            return float(final.best_score)

        once(99)                           # compile + first-touch warmup
        best, score0 = float("inf"), None
        for s in range(reps):
            t0 = time.perf_counter()
            score = once(s)
            best = min(best, time.perf_counter() - t0)
            if s == 0:
                score0 = score
        return best, score0

    t_single, s_single = timed(None)
    t_sharded, s_sharded = timed(mesh)
    if not (abs(s_single - s_sharded)
            <= 1e-3 * max(abs(s_single), abs(s_sharded), 1e-9)):
        raise AssertionError(
            f"dp{n_devices} fused run diverged from single-device: "
            f"best score {s_sharded} vs {s_single}")
    return {"n_devices": n_devices, "epochs": epochs,
            "global_batch": batch, "n_samples": n_samples,
            "t_single_s": round(t_single, 4),
            "t_sharded_s": round(t_sharded, 4),
            "efficiency": round(min(t_single / t_sharded, 1.0), 4),
            "efficiency_raw": round(t_single / t_sharded, 4),
            "best_score_abs_diff": round(abs(s_single - s_sharded), 6)}


def main() -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--n_devices", type=int, default=8)
    parser.add_argument("--reps", type=int, default=3)
    parser.add_argument("--per_device_batch", type=int, default=16)
    parser.add_argument("--train", action="store_true",
                        help="also measure fused-trainer dp efficiency "
                             "(adds a 'train' key)")
    parser.add_argument("--train_only", action="store_true",
                        help="measure ONLY the fused-trainer dp "
                             "efficiency (emits just the 'train' key — "
                             "bench.py runs this as its own subprocess so "
                             "a train-leg timeout cannot take the extract "
                             "efficiencies down with it)")
    parser.add_argument("--train_epochs", type=int, default=4)
    args = parser.parse_args()
    if args.train_only:
        print(json.dumps({"train": measure_train_scaling(
            args.n_devices, epochs=args.train_epochs)}))
        return
    result = measure_extract_scaling(args.n_devices, reps=args.reps,
                                     per_device_batch=args.per_device_batch)
    if args.train:
        # Best-effort: a train-leg failure (trajectory-divergence assert,
        # relay fault on this environment's tunnel) must not take the
        # extract efficiencies — and with them bench.py's whole pod
        # projection — down with it (review r5 #3).  bench.py already
        # handles a missing 'train' key by falling back to the
        # single-chip-time assumption for that term.
        try:
            result["train"] = measure_train_scaling(
                args.n_devices, epochs=args.train_epochs)
        except Exception as e:                          # noqa: BLE001
            import sys
            print(f"train scaling leg failed (extract results still "
                  f"emitted): {type(e).__name__}: {e}", file=sys.stderr,
                  flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
