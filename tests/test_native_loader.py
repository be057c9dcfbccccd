"""Native bulk .npy loader: byte parity vs numpy, contract violations,
oversize fallback."""

import numpy as np
import pytest

from mmer_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native library unavailable")


def test_f32_batch_matches_numpy(tmp_path):
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i, t in enumerate((1, 3, 7)):
        a = rng.normal(size=(t, 16)).astype(np.float32)
        p = str(tmp_path / f"v{i}.npy")
        np.save(p, a)
        paths.append(p)
        arrays.append(a)
    out, rows = nl.load_f32_batch(paths, cols=16, max_rows=8)
    assert list(rows) == [1, 3, 7]
    for i, a in enumerate(arrays):
        np.testing.assert_array_equal(out[i, :rows[i]], a)
        np.testing.assert_array_equal(out[i, rows[i]:], 0.0)


def test_f16_exact_including_subnormals(tmp_path):
    # Sweep every f16 bit pattern once — catches conversion edge cases
    # (subnormals, infs, nan payloads) exhaustively.
    all16 = np.arange(65536, dtype=np.uint16).view(np.float16)
    p = str(tmp_path / "all.npy")
    np.save(p, all16)
    out, fails = nl.load_f16_vec_batch([p], 65536)
    assert fails == 0
    want = all16.astype(np.float32)
    got = out[0]
    eq = (got == want) | (np.isnan(got) & np.isnan(want))
    assert eq.all()


def test_contract_violations_are_flagged(tmp_path):
    np.save(tmp_path / "wrong_cols.npy", np.zeros((2, 8), np.float32))
    np.save(tmp_path / "wrong_dtype.npy", np.zeros((2, 16), np.float16))
    np.save(tmp_path / "good.npy", np.ones((2, 16), np.float32))
    out, rows = nl.load_f32_batch(
        [str(tmp_path / "wrong_cols.npy"), str(tmp_path / "wrong_dtype.npy"),
         str(tmp_path / "good.npy"), str(tmp_path / "missing.npy")],
        cols=16, max_rows=4)
    assert list(rows) == [-1, -1, 2, -1]
    np.testing.assert_array_equal(out[2, :2], 1.0)


def test_oversize_rows_reported(tmp_path):
    np.save(tmp_path / "big.npy", np.ones((10, 4), np.float32))
    out, rows = nl.load_f32_batch([str(tmp_path / "big.npy")], cols=4,
                                  max_rows=4)
    assert rows[0] == 10               # true count reported
    np.testing.assert_array_equal(out[0], 1.0)   # clipped rows filled


def test_pipeline_native_path_matches_python(synthetic_feature_dirs):
    from mmer_tpu.data.catalog import build_catalog
    from mmer_tpu.data.pipeline import load_feature_arrays

    vdir, adir = synthetic_feature_dirs
    cat = build_catalog(vdir, adir, "key")
    v1, a1 = load_feature_arrays(cat, use_native=True)
    v2, a2 = load_feature_arrays(cat, use_native=False)
    assert len(v1) == len(v2)
    for x, y in zip(v1, v2):
        np.testing.assert_array_equal(x, y)
    np.testing.assert_array_equal(a1, a2)
