"""Central configuration for the framework.

The reference scatters its configuration between three argparse flags and
hardcoded literals (reference train2.py:941-976, video_extractor.py:83,
voice_extractor.py:16-20).  Here every knob lives in one typed dataclass tree
so train/serve/extract share a single source of truth.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from typing import Any

# Canonical label order — matches reference back-end/app/libs/inference.py:21
# and the final label maps at reference train2.py:338,343-349.
LABELS = ("NEU", "HAP", "SAD", "ANG", "FEA", "DIS")
NUM_CLASSES = len(LABELS)


@dataclass(frozen=True)
class ModelConfig:
    """CrossModalFusion + EmotionClassifier hyperparameters.

    Defaults mirror the canonical v2 training invocation
    (reference train2.py:965-976): fused_dim 512, 2 encoder layers, 8 heads,
    ffn = 4*fused_dim, dropout 0.1/0.1, classifier hidden 512.
    """

    video_dim: int = 768
    audio_dim: int = 1024
    fused_dim: int = 512
    num_classes: int = NUM_CLASSES
    max_seq_len: int = 6  # max video chunks + 1 audio token (train2.py:963)
    fusion_layers: int = 2
    fusion_heads: int = 8
    fusion_ffn_dim: int = 2048  # 4 * fused_dim (train2.py:114)
    fusion_dropout: float = 0.1
    classifier_hidden_dim: int = 512
    classifier_dropout: float = 0.1
    # "layernorm" = v2 semantics (train2.py:104-105); "batchnorm" = v1
    # semantics (reference train.py:50-51).
    norm: str = "layernorm"
    # Compute dtype for the fused transformer.  Params stay float32.
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class DataConfig:
    """Feature-dataset configuration.

    ``pairing='key'`` fixes the reference's positional ``zip(sorted,sorted)``
    pairing bug (train2.py:315-325) that misaligned 2,694/8,880 audio/video
    pairs; ``pairing='positional'`` reproduces the reference behavior for
    apples-to-apples comparisons.
    """

    video_feat_dir: str = "/root/reference/video_features"
    audio_feat_dir: str = "/root/reference/audio_features"
    batch_size: int = 64
    seed: int = 42
    pairing: str = "key"
    # v1 trainer oversamples NEU to the majority count (train.py:199-211).
    oversample_neutral: bool = False
    # Mild class-weight boost for FEA/DIS (train2.py:484-486).
    boost_classes: tuple = (4, 5)
    boost_factor: float = 1.2
    # Normalization: "global" per-dim over the dataset (train2.py:362-378)
    # or "per_sample" (v1, train.py:176-177).
    normalization: str = "global"


@dataclass(frozen=True)
class TrainConfig:
    """Optimization loop configuration (reference train2.py:495-774)."""

    num_epochs: int = 100
    lr: float = 1e-4
    weight_decay: float = 1e-4
    clip_norm: float = 1.0
    # Early stopping: stop after `patience` epochs whose val-loss improvement
    # over the previous epoch is < min_delta (train2.py:622-633).
    patience: int = 8
    min_delta: float = 1e-4
    # ReduceLROnPlateau on val loss (train2.py:526).
    scheduler_factor: float = 0.3
    scheduler_patience: int = 20
    # "weighted_ce" (v2, train2.py:523) or "focal" (v1, train.py:251).
    loss: str = "weighted_ce"
    focal_gamma: float = 2.0
    # Opt-in improvement beyond the reference (0.0 = exact reference loss).
    label_smoothing: float = 0.0
    # Opt-in: evaluate/select on an exponential moving average of the
    # params (per-step decay; 0.0 = off = exact reference behavior).
    # Fused trainer only.
    ema_decay: float = 0.0
    # Opt-in mixup over the (video, audio) feature pairs: per-batch
    # lambda ~ Beta(alpha, alpha), partner drawn by in-batch permutation,
    # loss = lam*CE(y) + (1-lam)*CE(y_partner).  0.0 = off = exact
    # reference behavior.  Fused trainer only.
    mixup_alpha: float = 0.0
    # Opt-in modality dropout: with prob rate/2 zero the audio embedding,
    # with prob rate/2 zero all video tokens, per sample per step (classic
    # multimodal robustness regularizer).  0.0 = off.  Fused trainer only.
    modality_dropout: float = 0.0
    # Opt-in ensemble distillation (Hinton et al. 2015): blend the hard
    # loss with a temperature-scaled soft cross-entropy to teacher
    # probabilities supplied as data["soft_targets"] (N, C) — typically
    # an ensemble blend's train-split probs (train/distill.py).
    # loss = (1-a)*hard + a*T^2*CE(q_T, logits/T).  0.0 = off = exact
    # reference behavior.  Fused trainer only.
    distill_alpha: float = 0.0
    distill_temp: float = 1.0
    # Best-model selection: "val_loss" (v2, train2.py:617-620) or
    # "val_acc" (v1, train.py:334-338).
    best_metric: str = "val_loss"
    output_dir: str = "training_runs_2"
    save_checkpoints: bool = True
    # Periodic full-state (params + optimizer + rng) checkpoints for
    # mid-run resume; 0 disables.  The reference saves only best/final
    # weights and cannot resume (SURVEY.md §5).
    checkpoint_every: int = 0
    eval_test_every_epoch: bool = True
    log_every: int = 1


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout.

    The reference has no distribution at all (SURVEY.md §2.7); this framework
    introduces a (data, model) mesh.  data = batch sharding over ICI,
    model = tensor-parallel sharding of FFN/attention-head dimensions.
    """

    data_axis: str = "data"
    model_axis: str = "model"
    # -1 = all available devices on the data axis, model axis 1.
    data_parallel: int = -1
    model_parallel: int = 1


@dataclass(frozen=True)
class ViViTConfig:
    """ViViT feature-extractor hyperparameters (reference video_extractor.py:83)."""

    image_size: tuple = (224, 224)
    patch_size: tuple = (16, 16)
    num_frames: int = 32
    tubelet_size: int = 4
    dim: int = 768
    depth: int = 12
    heads: int = 12
    dim_head: int = 64
    mlp_dim: int = 3072
    pool: str = "cls"
    in_channels: int = 3
    # The reference never loads trained ViViT weights — it uses a fresh random
    # init as a fixed random projection (video_extractor.py:184).  We seed it
    # deterministically so extract- and serve-time embeddings agree (the
    # reference's own two processes do NOT agree; SURVEY.md §7 "hard parts").
    param_seed: int = 0
    compute_dtype: str = "bfloat16"


@dataclass(frozen=True)
class Wav2Vec2Config:
    """Wav2Vec2-large architecture (HF ``audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim``,
    reference voice_extractor.py:16).  Robust variant: layer-norm feature
    encoder, do_stable_layer_norm=True, 24 layers, hidden 1024.
    """

    hidden_dim: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    ffn_dim: int = 4096
    conv_dims: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_strides: tuple = (5, 2, 2, 2, 2, 2, 2)
    conv_kernels: tuple = (10, 3, 3, 3, 3, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True
    feat_extract_norm: str = "layer"
    sample_rate: int = 16000
    chunk_duration_s: float = 10.0  # voice_extractor.py:20
    param_seed: int = 1
    compute_dtype: str = "bfloat16"


def asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)
