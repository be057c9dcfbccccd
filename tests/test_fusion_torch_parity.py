"""Flagship fusion model: numeric parity vs a torch.nn oracle.

The reference composes ``torch.nn`` building blocks (Linear + LayerNorm +
``nn.TransformerEncoder(norm_first=False)`` + masked mean pooling + an MLP
head, train2.py:77-292).  This test builds that composition directly from
torch.nn, converts its weights into our flax parameter tree, and checks the
two forwards agree — the same structural-parity proof style as
tests/test_wav2vec2.py.  Passing means our post-norm layer, masking, and
pooling semantics match torch's to float32 tolerance.
"""

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel

torch = pytest.importorskip("torch")

CFG = ModelConfig(max_seq_len=6, fusion_layers=2, compute_dtype="float32")


class TorchOracle(torch.nn.Module):
    """torch.nn composition per the reference architecture spec."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        d = cfg.fused_dim
        self.video_proj = torch.nn.Linear(cfg.video_dim, d)
        self.norm_video = torch.nn.LayerNorm(d)
        self.audio_proj = torch.nn.Linear(cfg.audio_dim, d)
        self.norm_audio = torch.nn.LayerNorm(d)
        self.pos_embed = torch.nn.Parameter(
            torch.zeros(1, cfg.max_seq_len, d))
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=cfg.fusion_heads,
            dim_feedforward=cfg.fusion_ffn_dim, dropout=0.0,
            batch_first=True, norm_first=False)
        self.encoder = torch.nn.TransformerEncoder(layer, cfg.fusion_layers)
        self.out_norm = torch.nn.LayerNorm(d)
        h = cfg.classifier_hidden_dim
        self.head = torch.nn.ModuleList([
            torch.nn.Linear(d, h), torch.nn.LayerNorm(h),
            torch.nn.Linear(h, h), torch.nn.LayerNorm(h),
            torch.nn.Linear(h, cfg.num_classes)])

    def forward(self, video, audio, pad_mask):
        v = self.norm_video(self.video_proj(video))
        a = self.norm_audio(self.audio_proj(audio))[:, None, :]
        x = torch.cat([v, a], dim=1)
        x = x + self.pos_embed[:, : x.shape[1]]
        full_mask = torch.cat(
            [pad_mask, torch.zeros(video.shape[0], 1, dtype=torch.bool)], 1)
        x = self.encoder(x, src_key_padding_mask=full_mask)
        keep = (~full_mask).float()[:, :, None]
        pooled = (x * keep).sum(1) / keep.sum(1).clamp(min=1e-6)
        fused = self.out_norm(pooled)
        z = fused
        for i in (0, 2):
            z = torch.relu(self.head[i + 1](self.head[i](z)))
        return self.head[4](z)


def _convert(oracle: TorchOracle, cfg: ModelConfig) -> dict:
    """torch oracle state → our flax parameter tree."""
    def t(x):
        return np.asarray(x.detach())

    def lin(m):
        return {"kernel": t(m.weight).T, "bias": t(m.bias)}

    def ln(m):
        return {"scale": t(m.weight), "bias": t(m.bias)}

    d, heads = cfg.fused_dim, cfg.fusion_heads
    hd = d // heads
    fusion = {
        "video_proj": lin(oracle.video_proj),
        "norm_video": {"LayerNorm_0": ln(oracle.norm_video)},
        "audio_proj": lin(oracle.audio_proj),
        "norm_audio": {"LayerNorm_0": ln(oracle.norm_audio)},
        "pos_embed": t(oracle.pos_embed),
        "out_norm": {"LayerNorm_0": ln(oracle.out_norm)},
    }
    for i, layer in enumerate(oracle.encoder.layers):
        w_in = t(layer.self_attn.in_proj_weight)      # (3d, d)
        b_in = t(layer.self_attn.in_proj_bias)
        q_w, k_w, v_w = np.split(w_in, 3)
        q_b, k_b, v_b = np.split(b_in, 3)

        def qkv(w, b):
            return {"kernel": w.T.reshape(d, heads, hd),
                    "bias": b.reshape(heads, hd)}

        fusion[f"layer_{i}"] = {
            "self_attn": {
                "query": qkv(q_w, q_b), "key": qkv(k_w, k_b),
                "value": qkv(v_w, v_b),
                "out": {"kernel": t(layer.self_attn.out_proj.weight
                                    ).T.reshape(heads, hd, d),
                        "bias": t(layer.self_attn.out_proj.bias)},
            },
            "norm1": ln(layer.norm1), "norm2": ln(layer.norm2),
            "ffn_in": lin(layer.linear1), "ffn_out": lin(layer.linear2),
        }
    classifier = {
        "hidden_0": lin(oracle.head[0]),
        "norm_0": {"LayerNorm_0": ln(oracle.head[1])},
        "hidden_1": lin(oracle.head[2]),
        "norm_1": {"LayerNorm_0": ln(oracle.head[3])},
        "out": lin(oracle.head[4]),
    }
    return {"params": {"fusion": fusion, "classifier": classifier}}


def test_fusion_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = TorchOracle(CFG)
    with torch.no_grad():
        oracle.pos_embed.normal_(0.0, 0.02)
    oracle.eval()

    rng = np.random.default_rng(0)
    video = rng.normal(size=(3, 5, 768)).astype(np.float32)
    audio = rng.normal(size=(3, 1024)).astype(np.float32)
    lengths = np.array([5, 3, 1])
    pad_mask = np.arange(5)[None, :] >= lengths[:, None]

    with torch.no_grad():
        want = oracle(torch.from_numpy(video), torch.from_numpy(audio),
                      torch.from_numpy(pad_mask)).numpy()

    model = MultimodalEmotionModel(CFG)
    params = _convert(oracle, CFG)
    _, got, _ = model.apply(params, video, audio, pad_mask)

    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-3)
