"""Port a HuggingFace Wav2Vec2 checkpoint to this framework's params.

The reference embeds audio with HF
``audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim``
(reference voice_extractor.py:16).  On a machine with that checkpoint
available (downloaded or vendored), this one-shot tool folds it into a flax
msgpack the :class:`mmer_tpu.models.wav2vec2.AudioEmbedder` loads directly:

    python -m mmer_tpu.models.port_wav2vec2 \
        --hf audeering/wav2vec2-large-robust-12-ft-emotion-msp-dim \
        --out artifacts/wav2vec2_params.msgpack

``--hf`` accepts a hub id or a local directory.  The numeric fidelity of
the conversion is covered by tests/test_wav2vec2.py (bit-level parity vs
the torch implementation on a same-config random model).
"""

from __future__ import annotations

import argparse


def port(hf_name_or_dir: str, out_path: str) -> None:
    from transformers import Wav2Vec2Model

    from mmer_tpu.config import Wav2Vec2Config
    from mmer_tpu.models.wav2vec2 import convert_hf_state
    from mmer_tpu.train.checkpoint import save_params_msgpack

    hf_model = Wav2Vec2Model.from_pretrained(hf_name_or_dir)
    hf_model.eval()
    hf_cfg = hf_model.config
    cfg = Wav2Vec2Config(
        hidden_dim=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        ffn_dim=hf_cfg.intermediate_size,
        conv_dims=tuple(hf_cfg.conv_dim),
        conv_strides=tuple(hf_cfg.conv_stride),
        conv_kernels=tuple(hf_cfg.conv_kernel),
        num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
        do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
        feat_extract_norm=hf_cfg.feat_extract_norm,
    )
    params = convert_hf_state(hf_model, cfg)
    save_params_msgpack(out_path, params)
    print(f"ported {hf_name_or_dir} → {out_path}")
    print(f"config: {cfg}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--hf", required=True,
                   help="HF hub id or local checkpoint directory")
    p.add_argument("--out", required=True, help="output msgpack path")
    args = p.parse_args(argv)
    port(args.hf, args.out)


if __name__ == "__main__":
    main()
