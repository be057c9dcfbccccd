"""Import/coherence coverage for the scripts/ probe+profile harnesses.

The on-chip probe queue (scripts/r3_onchip.py) runs in ONE expensive
device session (130-860 s relay tax per process, CLAUDE.md), so a
trivial breakage — a renamed config field, a moved helper — must fail
HERE, on CPU, not after paying for the session.  (probe_w2v2_flash once
shipped with ``cfg.conv_dim`` vs the real ``conv_dims`` and would have
burned the whole stage.)
"""

import importlib
import pathlib

import pytest

SCRIPTS = sorted(
    p.stem for p in (pathlib.Path(__file__).resolve().parent.parent
                     / "scripts").glob("*.py")
    if not p.stem.startswith("_"))


@pytest.mark.parametrize("name", SCRIPTS)
def test_script_imports(name):
    importlib.import_module(f"scripts.{name}")


def test_probe_w2v2_flash_flops_uses_real_config_fields():
    from mmer_tpu.models.wav2vec2 import (Wav2Vec2Config,
                                          feat_extract_output_length)
    from scripts.probe_w2v2_flash import model_flops

    cfg = Wav2Vec2Config()
    t = feat_extract_output_length(cfg, 64000)
    fl = model_flops(cfg, t)
    assert 1e12 < fl < 1e14, fl   # wav2vec2-large @ B=64 is ~9 TFLOP


def test_r3_onchip_queue_targets_exist():
    """Every stage the queue dispatches must resolve to a main()."""
    import scripts.r3_onchip  # noqa: F401 — imports all queue modules

    for mod in ("probe_aot", "probe_int8", "probe_int8_vivit",
                "probe_w2v2_flash", "probe_w2v2_qkv", "probe_int8_w2v2",
                "probe_feature_noise_quality", "probe_ensemble",
                "probe_mixup_quality"):
        m = importlib.import_module(f"scripts.{mod}")
        assert callable(getattr(m, "main"))
