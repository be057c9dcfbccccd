"""Utilities: step timer, persistent cache helper, config serialization."""

import json
import os
import time

from mmer_tpu.config import ModelConfig, asdict, to_json
from mmer_tpu.utils.profiling import StepTimer, trace


def test_step_timer_summary(tmp_path):
    t = StepTimer()
    for _ in range(5):
        with t.phase("work"):
            time.sleep(0.002)
    t.record("manual", 1.5)
    s = t.summary()
    assert s["work"]["count"] == 5
    assert s["work"]["mean_s"] >= 0.002
    assert s["manual"]["total_s"] == 1.5
    path = str(tmp_path / "timing.json")
    t.dump(path)
    assert json.load(open(path))["work"]["count"] == 5


def test_trace_noop_without_dir():
    with trace(None):
        pass  # must not require jax or a profiler


def test_persistent_cache_helper(tmp_path, monkeypatch):
    from mmer_tpu.core.cache import enable_persistent_cache

    cache_dir = str(tmp_path / "c")
    enable_persistent_cache(cache_dir)
    assert os.path.isdir(cache_dir)


def test_config_serialization():
    cfg = ModelConfig()
    d = asdict(cfg)
    assert d["fused_dim"] == 512
    blob = json.loads(to_json(cfg))
    assert blob["num_classes"] == 6
