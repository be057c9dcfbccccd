"""Reference ``.pth`` ⇄ flax fusion-checkpoint conversion (migration path).

The reference trainer saves ``model.state_dict()`` ``.pth`` files per run
(train2.py:766-774) and its serving pins one (inference.py:23); a user
switching stacks arrives with those files.  This module converts the v2
``MultimodalEmotionModel`` state dict (train2.py:241-292 — the canonical
``CrossModalFusion`` + ``EmotionClassifier`` composition) to and from our
flax parameter tree (models/fusion.py), key-for-key and bit-for-bit:

- ``params_from_state_dict``  — torch names → flax tree (+ config
  inference, below);
- ``state_dict_from_params``  — flax tree → torch names, loadable with
  ``load_state_dict(strict=True)`` into the reference model, so models
  trained HERE run in the reference stack too;
- ``load_pth`` / ``save_pth`` — file-level wrappers (torch gated: it is
  only needed to deserialize/serialize the pickle container).

Config inference: every hyperparameter the weights determine is read off
the tensor shapes (``fused_dim``, ``max_seq_len`` from ``pos_embed``,
layer count, ffn/classifier widths, class count).  The reference's
serving outage — a ``max_seq_len=57`` model silently falling back to
random weights because the checkpoint was trained at 6
(inference.py:236-265, SURVEY §2.4) — is exactly the bug this kills:
the checkpoint, not the caller, decides the shape.  ``fusion_heads`` is
NOT weight-determined (the fused in_proj is ``(3d, d)`` for any head
count) and defaults to the reference's 8 (train2.py:252).

Scope: the v2 LayerNorm variant.  The v1 BatchNorm model (train.py:39-130)
has a different architecture and artifact format and is out of scope —
``params_from_state_dict`` raises with a clear message on its keys.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from mmer_tpu.config import ModelConfig

__all__ = ["infer_model_config", "params_from_state_dict",
           "state_dict_from_params", "load_pth", "save_pth"]


def _to_np(x: Any) -> np.ndarray:
    """torch.Tensor or array-like → float32 numpy (params are f32 here)."""
    if hasattr(x, "detach"):                      # torch.Tensor, no import
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _require(sd: Mapping[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        if "fusion.bn_video.weight" in sd or "classifier.fc1.weight" in sd:
            raise NotImplementedError(
                "this looks like a v1 BatchNorm checkpoint (train.py:39-130)"
                " — only the canonical v2 LayerNorm model is convertible")
        raise KeyError(f"reference checkpoint missing key {key!r} — not a "
                       "v2 MultimodalEmotionModel state_dict?")
    return _to_np(sd[key])


def infer_model_config(sd: Mapping[str, Any], **overrides) -> ModelConfig:
    """Read every weight-determined hyperparameter off the state dict.

    ``overrides`` patches the non-inferable fields (``fusion_heads``,
    dropouts, ``compute_dtype``) or forces inferable ones.
    """
    vp = _require(sd, "fusion.video_proj.weight")          # (fused, video)
    ap = _require(sd, "fusion.audio_proj.weight")          # (fused, audio)
    pos = _require(sd, "fusion.pos_embed")                 # (1, S, fused)
    l1 = _require(sd, "fusion.transformer.layers.0.linear1.weight")
    h0 = _require(sd, "classifier.net.0.weight")           # (hidden, fused)
    out = _require(sd, "classifier.net.8.weight")          # (classes, hidden)
    if "fusion.norm_video.weight" not in sd:
        raise NotImplementedError(
            "use_layernorm=False checkpoints (Identity norms + BatchNorm1d "
            "classifier, train2.py:104,216) are not supported")
    layers = 0
    while f"fusion.transformer.layers.{layers}.norm1.weight" in sd:
        layers += 1
    inferred = dict(
        video_dim=int(vp.shape[1]), audio_dim=int(ap.shape[1]),
        fused_dim=int(vp.shape[0]), num_classes=int(out.shape[0]),
        max_seq_len=int(pos.shape[1]), fusion_layers=layers,
        fusion_ffn_dim=int(l1.shape[0]),
        classifier_hidden_dim=int(h0.shape[0]), norm="layernorm")
    inferred.update(overrides)
    return ModelConfig(**inferred)


def _lin(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"kernel": w.T, "bias": b}


def _ln(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    return {"scale": w, "bias": b}


def params_from_state_dict(sd: Mapping[str, Any],
                           cfg: Optional[ModelConfig] = None, *,
                           heads: Optional[int] = None,
                           **overrides) -> Tuple[dict, ModelConfig]:
    """Reference v2 state_dict → ``{"params": ...}`` for
    models/fusion.MultimodalEmotionModel.  Returns (variables, config).

    When ``cfg`` is given, its shapes are validated against the weights
    (LOUD mismatch — the anti-(inference.py:261-262) contract); when
    omitted it is inferred, with ``overrides`` patching the non-inferable
    fields (dropouts, ``compute_dtype``).  ``heads`` overrides the head
    count either way.
    """
    if heads:
        overrides["fusion_heads"] = heads
    inferred = infer_model_config(sd, **overrides)
    if cfg is None:
        cfg = inferred
    else:
        if heads:
            cfg = ModelConfig(**{**cfg.__dict__, "fusion_heads": heads})
        mismatch = {
            f: (getattr(cfg, f), getattr(inferred, f))
            for f in ("video_dim", "audio_dim", "fused_dim", "num_classes",
                      "max_seq_len", "fusion_layers", "fusion_ffn_dim",
                      "classifier_hidden_dim")
            if getattr(cfg, f) != getattr(inferred, f)}
        if mismatch:
            raise ValueError(
                "checkpoint/config shape mismatch (the reference serves "
                "random weights on this; we refuse): "
                + ", ".join(f"{k}: cfg {a} vs ckpt {b}"
                            for k, (a, b) in mismatch.items()))
    if cfg.norm != "layernorm":
        raise NotImplementedError("only norm='layernorm' (v2) converts")

    d, h = cfg.fused_dim, cfg.fusion_heads
    if d % h:
        raise ValueError(f"fused_dim {d} not divisible by heads {h}")
    hd = d // h

    def qkv(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
        # torch in_proj slice (d, d)/(d,) → DenseGeneral (d, h, hd)/(h, hd)
        return {"kernel": w.T.reshape(d, h, hd), "bias": b.reshape(h, hd)}

    fusion: Dict[str, Any] = {
        "video_proj": _lin(_require(sd, "fusion.video_proj.weight"),
                           _require(sd, "fusion.video_proj.bias")),
        "audio_proj": _lin(_require(sd, "fusion.audio_proj.weight"),
                           _require(sd, "fusion.audio_proj.bias")),
        "norm_video": {"LayerNorm_0": _ln(
            _require(sd, "fusion.norm_video.weight"),
            _require(sd, "fusion.norm_video.bias"))},
        "norm_audio": {"LayerNorm_0": _ln(
            _require(sd, "fusion.norm_audio.weight"),
            _require(sd, "fusion.norm_audio.bias"))},
        "pos_embed": _require(sd, "fusion.pos_embed"),
        "out_norm": {"LayerNorm_0": _ln(
            _require(sd, "fusion.out_norm.weight"),
            _require(sd, "fusion.out_norm.bias"))},
    }
    for i in range(cfg.fusion_layers):
        pre = f"fusion.transformer.layers.{i}"
        w_in = _require(sd, f"{pre}.self_attn.in_proj_weight")   # (3d, d)
        b_in = _require(sd, f"{pre}.self_attn.in_proj_bias")
        (qw, kw, vw), (qb, kb, vb) = np.split(w_in, 3), np.split(b_in, 3)
        fusion[f"layer_{i}"] = {
            "self_attn": {
                "query": qkv(qw, qb), "key": qkv(kw, kb),
                "value": qkv(vw, vb),
                "out": {
                    "kernel": _require(
                        sd, f"{pre}.self_attn.out_proj.weight"
                    ).T.reshape(h, hd, d),
                    "bias": _require(sd, f"{pre}.self_attn.out_proj.bias")},
            },
            "norm1": _ln(_require(sd, f"{pre}.norm1.weight"),
                         _require(sd, f"{pre}.norm1.bias")),
            "norm2": _ln(_require(sd, f"{pre}.norm2.weight"),
                         _require(sd, f"{pre}.norm2.bias")),
            "ffn_in": _lin(_require(sd, f"{pre}.linear1.weight"),
                           _require(sd, f"{pre}.linear1.bias")),
            "ffn_out": _lin(_require(sd, f"{pre}.linear2.weight"),
                            _require(sd, f"{pre}.linear2.bias")),
        }
    classifier = {
        "hidden_0": _lin(_require(sd, "classifier.net.0.weight"),
                         _require(sd, "classifier.net.0.bias")),
        "norm_0": {"LayerNorm_0": _ln(
            _require(sd, "classifier.net.1.weight"),
            _require(sd, "classifier.net.1.bias"))},
        "hidden_1": _lin(_require(sd, "classifier.net.4.weight"),
                         _require(sd, "classifier.net.4.bias")),
        "norm_1": {"LayerNorm_0": _ln(
            _require(sd, "classifier.net.5.weight"),
            _require(sd, "classifier.net.5.bias"))},
        "out": _lin(_require(sd, "classifier.net.8.weight"),
                    _require(sd, "classifier.net.8.bias")),
    }
    return {"params": {"fusion": fusion, "classifier": classifier}}, cfg


def state_dict_from_params(params: Mapping[str, Any],
                           cfg: ModelConfig) -> Dict[str, np.ndarray]:
    """Flax tree → reference-named flat state dict (float32 numpy values;
    ``strict=True``-loadable into the reference v2 model once wrapped as
    torch tensors — ``save_pth`` does that)."""
    p = params.get("params", params)
    f, c = p["fusion"], p["classifier"]
    d = cfg.fused_dim

    def npf(x):
        return np.asarray(x, dtype=np.float32)

    def lin(m, name):
        return {f"{name}.weight": npf(m["kernel"]).T,
                f"{name}.bias": npf(m["bias"])}

    def ln(m, name):
        m = m["LayerNorm_0"] if "LayerNorm_0" in m else m
        return {f"{name}.weight": npf(m["scale"]),
                f"{name}.bias": npf(m["bias"])}

    sd: Dict[str, np.ndarray] = {}
    sd.update(lin(f["video_proj"], "fusion.video_proj"))
    sd.update(lin(f["audio_proj"], "fusion.audio_proj"))
    sd.update(ln(f["norm_video"], "fusion.norm_video"))
    sd.update(ln(f["norm_audio"], "fusion.norm_audio"))
    sd["fusion.pos_embed"] = npf(f["pos_embed"])
    sd.update(ln(f["out_norm"], "fusion.out_norm"))
    for i in range(cfg.fusion_layers):
        lyr = f[f"layer_{i}"]
        pre = f"fusion.transformer.layers.{i}"
        sa = lyr["self_attn"]
        w_in = np.concatenate([
            npf(sa[k]["kernel"]).reshape(d, d).T
            for k in ("query", "key", "value")])              # (3d, d)
        b_in = np.concatenate([
            npf(sa[k]["bias"]).reshape(d)
            for k in ("query", "key", "value")])
        sd[f"{pre}.self_attn.in_proj_weight"] = w_in
        sd[f"{pre}.self_attn.in_proj_bias"] = b_in
        sd[f"{pre}.self_attn.out_proj.weight"] = (
            npf(sa["out"]["kernel"]).reshape(d, d).T)
        sd[f"{pre}.self_attn.out_proj.bias"] = npf(sa["out"]["bias"])
        sd.update(lin(lyr["ffn_in"], f"{pre}.linear1"))
        sd.update(lin(lyr["ffn_out"], f"{pre}.linear2"))
        sd.update(ln(lyr["norm1"], f"{pre}.norm1"))
        sd.update(ln(lyr["norm2"], f"{pre}.norm2"))
    sd.update(lin(c["hidden_0"], "classifier.net.0"))
    sd.update(ln(c["norm_0"], "classifier.net.1"))
    sd.update(lin(c["hidden_1"], "classifier.net.4"))
    sd.update(ln(c["norm_1"], "classifier.net.5"))
    sd.update(lin(c["out"], "classifier.net.8"))
    return sd


def load_pth(path: str, cfg: Optional[ModelConfig] = None, *,
             heads: Optional[int] = None,
             **overrides) -> Tuple[dict, ModelConfig]:
    """Load a reference ``.pth`` (a pickled state_dict, train2.py:766-774)
    and convert.  Accepts a bare state_dict or a dict wrapping one under
    ``state_dict``/``model_state_dict`` (common torch checkpoint shapes)."""
    import torch  # container deserialization only

    obj = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("state_dict", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
            break
    return params_from_state_dict(obj, cfg, heads=heads, **overrides)


def save_pth(path: str, params: Mapping[str, Any], cfg: ModelConfig) -> None:
    """Write our params as a reference-loadable ``.pth`` state dict."""
    import torch

    sd = state_dict_from_params(params, cfg)
    torch.save({k: torch.from_numpy(v.copy()) for k, v in sd.items()}, path)


def main(argv=None) -> None:
    """Checkpoint converter CLI.

    python -m mmer_tpu.models.port_fusion ref.pth out.msgpack [--heads 8]
    python -m mmer_tpu.models.port_fusion ours.msgpack out.pth
       (msgpack→pth needs the shapes: pass the training config via
        --max_seq_len etc. only if they differ from defaults — the tree
        itself carries them, so they are inferred from the params.)
    """
    import argparse

    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("src")
    parser.add_argument("dst")
    parser.add_argument("--heads", type=int, default=None,
                        help="fusion head count (not weight-determined; "
                             "default 8, train2.py:252)")
    args = parser.parse_args(argv)

    if args.src.endswith(".pth"):
        variables, cfg = load_pth(args.src, heads=args.heads)
        from mmer_tpu.train.checkpoint import save_params_msgpack
        save_params_msgpack(args.dst, variables["params"])
        print(f"{args.src} → {args.dst}  (inferred config: {cfg})")
    else:
        from flax import serialization

        with open(args.src, "rb") as f:
            params = serialization.msgpack_restore(f.read())
        # Shapes live in the tree; rebuild the config off a fake
        # reference-named view by exporting with an inferred config.
        p = params.get("params", params)
        fusion = p["fusion"]
        layers = sum(1 for k in fusion if k.startswith("layer_"))
        cfg = ModelConfig(
            video_dim=int(fusion["video_proj"]["kernel"].shape[0]),
            audio_dim=int(fusion["audio_proj"]["kernel"].shape[0]),
            fused_dim=int(fusion["video_proj"]["kernel"].shape[1]),
            num_classes=int(p["classifier"]["out"]["kernel"].shape[1]),
            max_seq_len=int(fusion["pos_embed"].shape[1]),
            fusion_layers=layers,
            fusion_ffn_dim=int(
                fusion["layer_0"]["ffn_in"]["kernel"].shape[1]),
            classifier_hidden_dim=int(
                p["classifier"]["hidden_0"]["kernel"].shape[1]),
            **({"fusion_heads": args.heads} if args.heads else {}))
        save_pth(args.dst, params, cfg)
        print(f"{args.src} → {args.dst}  (config from tree: {cfg})")


if __name__ == "__main__":
    main()
