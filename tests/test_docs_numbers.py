"""README/CLAUDE.md headline numbers must match the persisted bench
artifact (VERDICT r3 #7: r3 shipped docs saying 43.9 clips/s while the
bench measured 49.23 — this pins the docs to artifacts/bench/latest.json,
which every bench.py run rewrites)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_docs_match_bench_artifact():
    from scripts.check_docs_numbers import check

    path = os.path.join(REPO, "artifacts", "bench", "latest.json")
    if not os.path.exists(path):
        pytest.skip("no bench artifact yet")
    errors = check(REPO)
    assert not errors, "\n".join(errors)
