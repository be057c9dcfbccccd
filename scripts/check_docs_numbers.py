"""Docs-vs-bench consistency check (VERDICT r3 #7: one source of truth).

Every ``bench.py`` run persists its JSON result to
``artifacts/bench/latest.json``.  This checker re-parses the headline
numbers README.md and CLAUDE.md cite and verifies they match that
artifact, so the docs cannot go stale silently (r3 shipped a README
saying 43.9 clips/s while the bench measured 49.23 — a 12% drift this
would have caught).

Tolerance: 5% relative everywhere (run-to-run jitter through the relay
is real; staleness is >10%).  Multiples are proportional to the
throughputs they derive from, so they get the same RELATIVE tolerance —
an absolute tolerance on a ~25x multiple would be tighter than the
throughput tolerance that feeds it and fail on pure jitter.  Run
directly (nonzero exit on mismatch) or via tests/test_docs_numbers.py.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REL_TOL = 0.05


def _close_rel(doc: float, bench: float) -> bool:
    return abs(doc - bench) <= REL_TOL * max(abs(bench), 1e-9)


def check(repo: str = REPO) -> list:
    """Returns a list of mismatch strings (empty == consistent)."""
    path = os.path.join(repo, "artifacts", "bench", "latest.json")
    with open(path) as f:
        bench = json.load(f)
    value = float(bench["value"])
    vs = float(bench["vs_baseline"])
    comp = bench.get("components", {})
    pod = comp.get("projected_pod_clips_per_sec")
    pod_vs = comp.get("projected_pod_vs_baseline")

    errors = []

    def expect(label, doc_val, bench_val, close):
        if bench_val is None:
            # A degraded bench run (e.g. the scaling subprocess failed)
            # writes an artifact without the pod fields; the docs' pod
            # numbers would then go unchecked — flag it rather than
            # silently disabling the pin.
            errors.append(f"{label}: docs cite {doc_val} but the bench "
                          "artifact has no counterpart (degraded run?)")
            return
        if not close(float(doc_val), float(bench_val)):
            errors.append(f"{label}: docs say {doc_val}, "
                          f"bench artifact says {bench_val}")

    readme = open(os.path.join(repo, "README.md")).read()
    claude = open(os.path.join(repo, "CLAUDE.md")).read()

    # README north-star row: "**49.2 clips/s/chip ≈ 3.8×**"
    m = re.search(r"\*\*([\d.]+) clips/s/chip ≈ ([\d.]+)×\*\*", readme)
    if not m:
        errors.append("README: north-star '**X clips/s/chip ≈ Y×**' "
                      "pattern not found")
    else:
        expect("README north-star clips/s", m.group(1), value, _close_rel)
        expect("README north-star multiple", m.group(2), vs, _close_rel)

    # CLAUDE.md: "49.23 clips/s/chip" + "pod projection 324.5 clips/s =
    # 25.01×"
    m = re.search(r"([\d.]+) clips/s/chip end-to-end", claude)
    if not m:
        errors.append("CLAUDE.md: 'X clips/s/chip end-to-end' not found")
    else:
        expect("CLAUDE.md north-star clips/s", m.group(1), value,
               _close_rel)
    m = re.search(r"pod projection ([\d.]+) clips/s = ([\d.]+)×", claude)
    if not m:
        errors.append("CLAUDE.md: 'pod projection X clips/s = Y×' "
                      "not found")
    else:
        expect("CLAUDE.md pod clips/s", m.group(1), pod, _close_rel)
        expect("CLAUDE.md pod multiple", m.group(2), pod_vs, _close_rel)

    # Distillation quality row: README's student numbers must match the
    # committed probe artifact (exact — both are one measured run, no
    # jitter tolerance applies to copied constants).
    dpath = os.path.join(repo, "artifacts", "probes", "r4_distill.json")
    if os.path.exists(dpath):
        with open(dpath) as f:
            win = json.load(f)["student:a0.5:T1.0"]
        m = re.search(
            r"\*\*0\.(\d{4}) ± 0\.005 best-epoch / 0\.(\d{4}) ± 0\.005\s*\n?"
            r"val-selected\*\*", readme)
        if not m:
            errors.append("README: distillation student "
                          "'**X best-epoch / Y val-selected**' not found")
        else:
            expect("README distill best-epoch F1",
                   float("0." + m.group(1)), win["best_epoch_f1"],
                   lambda a, b: abs(a - b) < 5e-5)
            expect("README distill val-selected F1",
                   float("0." + m.group(2)), win["val_selected_f1"],
                   lambda a, b: abs(a - b) < 5e-5)

    return errors


def main() -> int:
    errors = check()
    for e in errors:
        print(f"DOCS-NUMBERS MISMATCH: {e}")
    if not errors:
        print("docs numbers consistent with artifacts/bench/latest.json")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
