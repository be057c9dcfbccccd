"""Training CLI — reference-compatible flags (train2.py:941-946) plus the
knobs the reference hardcodes.

Usage:
    python -m mmer_tpu.train.cli --batch_size 64 --num_epochs 1000 --lr 1e-5
"""

from __future__ import annotations

import argparse

from mmer_tpu.config import DataConfig, MeshConfig, ModelConfig, TrainConfig
from mmer_tpu.data.pipeline import load_dataset
from mmer_tpu.train.loop import train_model


def main(argv=None):
    from mmer_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(
        description="Train the multimodal emotion recognition model on TPU")
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--video_feat_dir", default=DataConfig.video_feat_dir)
    p.add_argument("--audio_feat_dir", default=DataConfig.audio_feat_dir)
    p.add_argument("--pairing", choices=["key", "positional"], default="key")
    p.add_argument("--loss", choices=["weighted_ce", "focal"],
                   default="weighted_ce")
    p.add_argument("--norm", choices=["layernorm", "batchnorm"],
                   default="layernorm")
    p.add_argument("--normalization", choices=["global", "per_sample"],
                   default="global")
    p.add_argument("--oversample_neutral", action="store_true")
    p.add_argument("--output_dir", default="training_runs_2")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--patience", type=int, default=8)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--fusion_dropout", type=float, default=0.1)
    p.add_argument("--classifier_dropout", type=float, default=0.1)
    p.add_argument("--best_metric", choices=["val_loss", "val_acc"],
                   default="val_loss",
                   help="best-model selection: val_loss (v2) or val_acc (v1)")
    p.add_argument("--no_test_eval", action="store_true")
    p.add_argument("--resume_dir", default=None,
                   help="directory of state_* checkpoints to resume from "
                        "(written to <output_dir>/checkpoints)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="save full train state every N epochs (0 = off)")
    p.add_argument("--interpret", action="store_true",
                   help="IG feature importances on the test set "
                        "(reference train2.py:990 epilogue — run on the "
                        "BEST params, fixing its final-weights bug)")
    p.add_argument("--profile_dir", default=None,
                   help="capture a jax.profiler trace of the run")
    p.add_argument("--fused", action="store_true",
                   help="run the ENTIRE training loop on device as one "
                        "lax.while_loop call (no per-epoch host sync)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="evaluate/select on a per-step EMA of the params "
                        "(0 = off, reference behavior; requires --fused)")
    p.add_argument("--mixup_alpha", type=float, default=0.0,
                   help="mixup over feature pairs, lambda~Beta(a,a) "
                        "(0 = off, reference behavior; requires --fused)")
    p.add_argument("--modality_dropout", type=float, default=0.0,
                   help="per-sample probability of zeroing one modality "
                        "(0 = off, reference behavior; requires --fused)")
    p.add_argument("--distill_from", default=None, metavar="CKPT[,CKPT...]",
                   help="comma-separated fusion .msgpack checkpoints: "
                        "mean-probability blend them as the teacher and "
                        "train this run as its distilled student "
                        "(requires --fused; see train/distill.py)")
    p.add_argument("--distill_alpha", type=float, default=0.5,
                   help="soft-loss weight when --distill_from is given: "
                        "loss = (1-a)*hard + a*T^2*soft")
    p.add_argument("--distill_temp", type=float, default=1.0,
                   help="distillation temperature T")
    p.add_argument("--raw_videos", default=None, metavar="DIR",
                   help="RAW face-crop videos: extract ViViT features on "
                        "device straight into HBM and train, skipping the "
                        ".npy round-trip (requires --raw_audio)")
    p.add_argument("--raw_audio", default=None, metavar="DIR",
                   help="RAW audio tracks for --raw_videos")
    args = p.parse_args(argv)

    data_cfg = DataConfig(
        video_feat_dir=args.video_feat_dir,
        audio_feat_dir=args.audio_feat_dir,
        batch_size=args.batch_size, pairing=args.pairing,
        normalization=args.normalization,
        oversample_neutral=args.oversample_neutral)
    if (args.raw_videos is None) != (args.raw_audio is None):
        p.error("--raw_videos and --raw_audio must be given together")
    if args.raw_videos:
        from mmer_tpu.preprocess.extract import extract_dataset_arrays
        data, splits = extract_dataset_arrays(
            args.raw_videos, args.raw_audio, data_cfg=data_cfg)
    else:
        data, splits = load_dataset(data_cfg)
    print(f"Samples: {data.num_samples}  max_chunks: {data.max_chunks}  "
          f"train/val/test: {len(splits.train)}/{len(splits.val)}/{len(splits.test)}")

    model_cfg = ModelConfig(max_seq_len=data.max_chunks + 1, norm=args.norm,
                            fusion_dropout=args.fusion_dropout,
                            classifier_dropout=args.classifier_dropout)
    train_cfg = TrainConfig(
        num_epochs=args.num_epochs, lr=args.lr, loss=args.loss,
        patience=args.patience, output_dir=args.output_dir,
        eval_test_every_epoch=not args.no_test_eval,
        checkpoint_every=args.checkpoint_every,
        weight_decay=args.weight_decay,
        label_smoothing=args.label_smoothing,
        ema_decay=args.ema_decay,
        mixup_alpha=args.mixup_alpha,
        modality_dropout=args.modality_dropout,
        distill_alpha=args.distill_alpha if args.distill_from else 0.0,
        distill_temp=args.distill_temp,
        best_metric=args.best_metric)

    soft_targets = None
    if args.distill_from:
        from mmer_tpu.models.fusion import MultimodalEmotionModel
        from mmer_tpu.train.checkpoint import load_params_msgpack
        from mmer_tpu.train.distill import teacher_soft_targets
        import jax

        model = MultimodalEmotionModel(model_cfg)
        init = model.init({"params": jax.random.PRNGKey(0)},
                          data.video[:2], data.audio[:2],
                          data.pad_mask[:2])["params"]
        teachers = [load_params_msgpack(pth.strip(), init)
                    for pth in args.distill_from.split(",") if pth.strip()]
        print(f"Distilling from {len(teachers)} teacher checkpoint(s), "
              f"alpha={args.distill_alpha} T={args.distill_temp}")
        soft_targets = teacher_soft_targets(model_cfg, teachers, data)

    from mmer_tpu.utils.profiling import trace

    with trace(args.profile_dir):
        out = train_model(data, splits, model_cfg, train_cfg,
                          batch_size=args.batch_size, mesh_cfg=MeshConfig(),
                          seed=args.seed, resume_dir=args.resume_dir,
                          fused=args.fused, soft_targets=soft_targets)

    if args.interpret:
        from mmer_tpu.interpret import interpret_test_set
        from mmer_tpu.models.fusion import MultimodalEmotionModel

        model = MultimodalEmotionModel(model_cfg)
        params = out.best_params if out.best_params is not None \
            else out.final_params

        def apply_fn(p, v, a, m):
            _, logits, _ = model.apply({"params": p}, v, a, m)
            return logits

        dev_data = {"video": data.video, "audio": data.audio,
                    "pad_mask": data.pad_mask, "labels": data.labels}
        interpret_test_set(apply_fn, params, dev_data, splits.test,
                           output_dir=args.output_dir)
    best = max((r for r in out.results if "test_macro_f1" in r),
               key=lambda r: r["test_macro_f1"], default=None)
    if best:
        print(f"Best epoch by test macro-F1: {best['epoch']} "
              f"(acc {best['test_acc']:.2f}%, macro-F1 {best['test_macro_f1']:.4f})")
    print(f"Best val-loss epoch: {out.best_epoch}")
    return out


if __name__ == "__main__":
    main()
