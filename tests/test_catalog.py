"""Label-map and pairing unit tests (reference semantics: train2.py:328-349)."""

import numpy as np
import pytest

from mmer_tpu.data.catalog import (
    CREMAD_MAP, RAVDESS_MAP, build_catalog, label_from_name, sample_key)


def test_cremad_labels():
    assert label_from_name("1001_DFA_ANG_XX_faces_mp4_features.npy") == 3
    assert label_from_name("1001_DFA_NEU_XX_faces_mp4_features.npy") == 0
    assert label_from_name("1076_MTI_SAD_XX_faces_mp4_features.npy") == 2
    assert CREMAD_MAP == {"NEU": 0, "HAP": 1, "SAD": 2, "ANG": 3,
                          "FEA": 4, "DIS": 5}


def test_ravdess_labels():
    # field 3 of the 7-field RAVDESS code is the emotion
    name = "Video_Speech_Actor_01_01-01-05-01-02-01-12_faces_mp4_features.npy"
    assert label_from_name(name) == 3  # 05 = angry
    name = "Video_Speech_Actor_01_01-01-01-01-02-01-12_faces_mp4_features.npy"
    assert label_from_name(name) == 0  # 01 = neutral


def test_ravdess_dropped_classes():
    for code in ("02", "08"):  # calm, surprise
        name = f"Video_Speech_Actor_01_01-01-{code}-01-02-01-12_faces_mp4_features.npy"
        assert label_from_name(name) is None


def test_sample_key_pairs_modalities():
    v = "1001_DFA_ANG_XX_faces_mp4_features.npy"
    a = "1001_DFA_ANG_XX_voice_mp4_features.npy"
    assert sample_key(v) == sample_key(a) == "1001_DFA_ANG_XX"
    v = "Video_Speech_Actor_01_01-01-05-01-02-01-12_faces_mp4_features.npy"
    a = "Video_Speech_Actor_01_01-01-05-01-02-01-12_voice_mp4_features.npy"
    assert sample_key(v) == sample_key(a)


def test_key_pairing_drops_unmatched_and_dropped_classes(synthetic_feature_dirs):
    vdir, adir = synthetic_feature_dirs
    catalog = build_catalog(vdir, adir, pairing="key")
    # 72 CREMA-D + 6 RAVDESS (7 minus dropped calm=02) = 78
    assert len(catalog) == 78
    keys = {e.key for e in catalog}
    assert "9999_ZZZ_SAD_XX" not in keys  # unpaired audio dropped
    for e in catalog:
        assert sample_key(e.video_path) == sample_key(e.audio_path) == e.key


def test_positional_pairing_reproduces_reference_misalignment(synthetic_feature_dirs):
    vdir, adir = synthetic_feature_dirs
    catalog = build_catalog(vdir, adir, pairing="positional")
    mismatched = [e for e in catalog
                  if sample_key(e.video_path) != sample_key(e.audio_path)]
    # the extra audio file shifts every later pair — the reference bug
    assert len(mismatched) > 0
