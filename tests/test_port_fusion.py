"""Migration-path tests: reference ``.pth`` ⇄ flax fusion conversion.

Oracle is a torch module with the reference's EXACT attribute names
(train2.py:77-292: ``fusion.video_proj``, ``fusion.transformer.layers.N``,
``classifier.net.{0,1,4,5,8}``, …) so the state_dict keys match what a
real reference run saves (train2.py:766-774).  Checks, both directions:
key-exact load, forward parity, config inference off the weights, and the
LOUD shape-mismatch refusal (vs the reference's silent random-weight
serve, inference.py:236-265).
"""

import numpy as np
import pytest

from mmer_tpu.config import ModelConfig
from mmer_tpu.models.fusion import MultimodalEmotionModel
from mmer_tpu.models.port_fusion import (infer_model_config, load_pth,
                                         params_from_state_dict, save_pth,
                                         state_dict_from_params)

torch = pytest.importorskip("torch")

CFG = ModelConfig(video_dim=24, audio_dim=16, fused_dim=32, num_classes=6,
                  max_seq_len=6, fusion_layers=2, fusion_heads=4,
                  fusion_ffn_dim=64, classifier_hidden_dim=16,
                  fusion_dropout=0.0, classifier_dropout=0.0,
                  compute_dtype="float32")


class ReferenceFusion(torch.nn.Module):
    """Reference ``CrossModalFusion`` composition (train2.py:77-193)."""

    def __init__(self, cfg):
        super().__init__()
        d = cfg.fused_dim
        self.video_proj = torch.nn.Linear(cfg.video_dim, d)
        self.audio_proj = torch.nn.Linear(cfg.audio_dim, d)
        self.norm_video = torch.nn.LayerNorm(d)
        self.norm_audio = torch.nn.LayerNorm(d)
        self.pos_embed = torch.nn.Parameter(torch.zeros(1, cfg.max_seq_len, d))
        torch.nn.init.normal_(self.pos_embed, 0.0, 0.02)
        layer = torch.nn.TransformerEncoderLayer(
            d_model=d, nhead=cfg.fusion_heads,
            dim_feedforward=cfg.fusion_ffn_dim, dropout=0.0,
            batch_first=False)
        self.transformer = torch.nn.TransformerEncoder(
            layer, cfg.fusion_layers)
        self.out_norm = torch.nn.LayerNorm(d)

    def forward(self, video, audio, pad_mask):
        v = self.norm_video(self.video_proj(video))
        a = self.norm_audio(self.audio_proj(audio)).unsqueeze(1)
        x = torch.cat([v, a], dim=1)
        x = x + self.pos_embed[:, : x.shape[1], :]
        full_mask = torch.cat(
            [pad_mask, torch.zeros(video.shape[0], 1, dtype=torch.bool)], 1)
        x = self.transformer(x.permute(1, 0, 2),
                             src_key_padding_mask=full_mask)
        x = x.permute(1, 0, 2)
        keep = (~full_mask).float().unsqueeze(-1)
        pooled = (x * keep).sum(1) / keep.sum(1)
        return self.out_norm(pooled)


class ReferenceModel(torch.nn.Module):
    """Reference ``MultimodalEmotionModel`` (train2.py:196-292)."""

    def __init__(self, cfg):
        super().__init__()
        d, h = cfg.fused_dim, cfg.classifier_hidden_dim
        self.fusion = ReferenceFusion(cfg)
        self.classifier = torch.nn.Module()
        self.classifier.net = torch.nn.Sequential(
            torch.nn.Linear(d, h), torch.nn.LayerNorm(h),
            torch.nn.ReLU(), torch.nn.Dropout(0.0),
            torch.nn.Linear(h, h), torch.nn.LayerNorm(h),
            torch.nn.ReLU(), torch.nn.Dropout(0.0),
            torch.nn.Linear(h, cfg.num_classes))

    def forward(self, video, audio, pad_mask):
        return self.classifier.net(self.fusion(video, audio, pad_mask))


@pytest.fixture(scope="module")
def oracle_and_inputs():
    torch.manual_seed(7)
    oracle = ReferenceModel(CFG).eval()
    rng = np.random.default_rng(3)
    video = rng.normal(size=(4, 5, CFG.video_dim)).astype(np.float32)
    audio = rng.normal(size=(4, CFG.audio_dim)).astype(np.float32)
    lengths = np.array([5, 3, 1, 4])
    pad_mask = np.arange(5)[None, :] >= lengths[:, None]
    with torch.no_grad():
        want = oracle(torch.from_numpy(video), torch.from_numpy(audio),
                      torch.from_numpy(pad_mask)).numpy()
    return oracle, video, audio, pad_mask, want


def test_import_forward_parity(oracle_and_inputs):
    oracle, video, audio, pad_mask, want = oracle_and_inputs
    variables, cfg = params_from_state_dict(oracle.state_dict(), CFG)
    assert cfg == CFG
    _, logits, _ = MultimodalEmotionModel(cfg).apply(
        variables, video, audio, pad_mask)
    np.testing.assert_allclose(np.asarray(logits), want,
                               atol=2e-5, rtol=2e-4)


def test_config_inference_from_weights(oracle_and_inputs):
    oracle = oracle_and_inputs[0]
    cfg = infer_model_config(oracle.state_dict(),
                             fusion_heads=CFG.fusion_heads)
    for f in ("video_dim", "audio_dim", "fused_dim", "num_classes",
              "max_seq_len", "fusion_layers", "fusion_ffn_dim",
              "classifier_hidden_dim"):
        assert getattr(cfg, f) == getattr(CFG, f), f


def test_shape_mismatch_is_loud(oracle_and_inputs):
    oracle = oracle_and_inputs[0]
    bad = ModelConfig(**{**CFG.__dict__, "max_seq_len": 57})
    with pytest.raises(ValueError, match="max_seq_len: cfg 57 vs ckpt 6"):
        params_from_state_dict(oracle.state_dict(), bad)


def test_export_strict_load_and_parity(oracle_and_inputs):
    """Our params → reference names → load_state_dict(strict=True) into a
    FRESH torch model must reproduce our flax forward."""
    _, video, audio, pad_mask, _ = oracle_and_inputs
    import jax

    model = MultimodalEmotionModel(CFG)
    variables = model.init({"params": jax.random.PRNGKey(11)},
                           video, audio, pad_mask)
    sd = state_dict_from_params(variables, CFG)
    fresh = ReferenceModel(CFG).eval()
    fresh.load_state_dict({k: torch.from_numpy(v.copy())
                           for k, v in sd.items()}, strict=True)
    with torch.no_grad():
        want = fresh(torch.from_numpy(video), torch.from_numpy(audio),
                     torch.from_numpy(pad_mask)).numpy()
    _, logits, _ = model.apply(variables, video, audio, pad_mask)
    np.testing.assert_allclose(np.asarray(logits), want,
                               atol=2e-5, rtol=2e-4)


def test_pth_file_roundtrip(oracle_and_inputs, tmp_path):
    oracle, video, audio, pad_mask, want = oracle_and_inputs
    path = str(tmp_path / "best_model_bs64_ep1000_lr1e-05.pth")
    torch.save(oracle.state_dict(), path)
    variables, cfg = load_pth(path, heads=CFG.fusion_heads,
                              compute_dtype="float32")
    _, logits, _ = MultimodalEmotionModel(cfg).apply(
        variables, video, audio, pad_mask)
    np.testing.assert_allclose(np.asarray(logits), want,
                               atol=2e-5, rtol=2e-4)

    out = str(tmp_path / "exported.pth")
    save_pth(out, variables, cfg)
    variables2, _ = load_pth(out, cfg)
    flat1 = jax_flat(variables)
    flat2 = jax_flat(variables2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def jax_flat(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


def test_v1_checkpoint_detected(oracle_and_inputs):
    sd = {"fusion.bn_video.weight": np.ones(4),
          "classifier.fc1.weight": np.ones((2, 4))}
    with pytest.raises(NotImplementedError, match="v1 BatchNorm"):
        params_from_state_dict(sd, None)
