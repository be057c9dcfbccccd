"""AOT executable cache (core/aot.py): save → load round-trip, key
discrimination, and graceful fallback when the artifact is corrupt."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from mmer_tpu.core.aot import _fingerprint, aot_cached_compile


def _fn(a, b):
    return jnp.tanh(a @ b) + 1.0


def test_save_then_load_round_trip(tmp_path):
    cache = str(tmp_path)
    a = jnp.ones((8, 16), jnp.float32)
    b = jnp.ones((16, 4), jnp.float32)

    c1 = aot_cached_compile(_fn, (a, b), key="t", cache_dir=cache)
    arts = [f for f in os.listdir(cache) if f.endswith(".aotx")]
    if not arts:  # backend without serialize support: compile-only fallback
        np.testing.assert_allclose(np.asarray(c1(a, b)),
                                   np.tanh(np.asarray(a) @ np.asarray(b)) + 1,
                                   rtol=1e-6)
        return

    # Second call must take the deserialize path (the artifact is present);
    # outputs must agree with the freshly compiled executable.
    c2 = aot_cached_compile(_fn, (a, b), key="t", cache_dir=cache)
    np.testing.assert_array_equal(np.asarray(c1(a, b)), np.asarray(c2(a, b)))
    np.testing.assert_allclose(np.asarray(c2(a, b)),
                               np.tanh(np.asarray(a) @ np.asarray(b)) + 1,
                               rtol=1e-6)


def test_fingerprint_discriminates_shapes_and_dtypes():
    a = jnp.ones((8, 16)), jnp.ones((16, 4))
    b = jnp.ones((8, 32)), jnp.ones((32, 4))
    c = (jnp.ones((8, 16), jnp.bfloat16), jnp.ones((16, 4), jnp.bfloat16))
    fps = {_fingerprint(a), _fingerprint(b), _fingerprint(c)}
    assert len(fps) == 3


def test_corrupt_artifact_recompiles(tmp_path):
    cache = str(tmp_path)
    a = jnp.ones((4, 4), jnp.float32)
    b = jnp.ones((4, 4), jnp.float32)
    aot_cached_compile(_fn, (a, b), key="t", cache_dir=cache)
    for f in os.listdir(cache):
        if f.endswith(".aotx"):
            with open(os.path.join(cache, f), "wb") as fh:
                fh.write(b"not a pickle")
    c = aot_cached_compile(_fn, (a, b), key="t", cache_dir=cache)
    np.testing.assert_allclose(np.asarray(c(a, b)),
                               np.tanh(np.ones((4, 4)) * 4) + 1, rtol=1e-6)


def test_pytree_args_round_trip(tmp_path):
    """Params-style nested dict args — the serving engine's shape."""
    cache = str(tmp_path)
    params = {"dense": {"kernel": jnp.full((6, 3), 0.5),
                        "bias": jnp.zeros((3,))}}
    x = jnp.ones((2, 6))

    def apply(p, x):
        return x @ p["dense"]["kernel"] + p["dense"]["bias"]

    c1 = aot_cached_compile(apply, (params, x), key="tree", cache_dir=cache)
    c2 = aot_cached_compile(apply, (params, x), key="tree", cache_dir=cache)
    np.testing.assert_allclose(np.asarray(c2(params, x)),
                               np.full((2, 3), 3.0), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(c1(params, x)),
                                  np.asarray(c2(params, x)))


def test_auto_mosaic_opt_in_gating(tmp_path, monkeypatch):
    """Serving's auto Pallas opt-in must require BOTH the proven-load
    marker and a matching artifact, and never engage on CPU or under the
    kill-switch (engine._auto_mosaic_opt_in)."""
    from mmer_tpu.serve.engine import _auto_mosaic_opt_in

    cache = str(tmp_path / "cache")
    os.makedirs(cache)
    key = "vivit-extract-bf16-flash"
    monkeypatch.delenv("MMER_AOT_DISABLE", raising=False)
    assert not _auto_mosaic_opt_in(key, cache, "tpu")       # nothing yet
    open(os.path.join(cache, "load_ok.tpu"), "w").close()
    assert not _auto_mosaic_opt_in(key, cache, "tpu")       # marker alone
    open(os.path.join(cache, f"{key}-abc.aotx"), "w").close()
    assert _auto_mosaic_opt_in(key, cache, "tpu")           # both -> on
    assert not _auto_mosaic_opt_in("w2v2-embed-bf16-pallas", cache, "tpu")
    open(os.path.join(cache, "load_ok.cpu"), "w").close()
    assert not _auto_mosaic_opt_in(key, cache, "cpu")       # never on CPU
    monkeypatch.setenv("MMER_AOT_DISABLE", "1")
    assert not _auto_mosaic_opt_in(key, cache, "tpu")       # kill-switch


def test_load_writes_proven_marker(tmp_path, monkeypatch):
    """A validated cache load must record the platform capability marker
    (aot_load_proven) in the default cache dir."""
    from mmer_tpu.core.aot import aot_load_proven

    cache = str(tmp_path / "aot")
    monkeypatch.setenv("MMER_AOT_CACHE", cache)
    a = jnp.ones((4, 8), jnp.float32)
    b = jnp.ones((8, 2), jnp.float32)
    aot_cached_compile(_fn, (a, b), key="m", cache_dir=cache)
    if not [f for f in os.listdir(cache) if f.endswith(".aotx")]:
        import pytest
        pytest.skip("backend cannot serialize executables")
    assert not aot_load_proven(cache)
    aot_cached_compile(_fn, (a, b), key="m", cache_dir=cache)  # load path
    if [f for f in os.listdir(cache) if f.endswith(".aotx")] and \
            not aot_load_proven(cache):
        # XLA:CPU rejects its own artifacts at execution depending on the
        # persistent-compile-cache state (the machine-feature NOT_FOUND
        # documented in core/aot.py) — load failed, recompiled, marker
        # correctly NOT written.  The written-on-success contract is only
        # observable where loads succeed (TPU; probe_aot load).
        import pytest
        pytest.skip("backend failed to load its own artifact")
    assert aot_load_proven(cache)
