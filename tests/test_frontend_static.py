"""Static consistency checks for the unbuildable-here TS frontend.

There is no node/tsc in this image (CLAUDE.md "offline substitutions"),
so the frontend (frontend/src/, mirroring the reference front-end/src/)
cannot be type-checked or rendered.  These tests cover the failure class
that actually bites in review: a module importing a symbol its target
never exports, or importing a file that does not exist.  They parse the
ES import/export surface with regexes — not a TS parser, but exact for
this codebase's plain `import {A, B} from "./x"` style.
"""

from __future__ import annotations

import os
import re

import pytest

SRC = os.path.join(os.path.dirname(__file__), os.pardir, "frontend", "src")

IMPORT_RE = re.compile(
    r"import\s+(?:type\s+)?"
    r"(?P<clause>[^'\"]+?)\s+from\s+[\"'](?P<spec>[^\"']+)[\"']",
    re.S)
EXPORT_NAMED_RE = re.compile(
    r"export\s+(?:abstract\s+)?(?:async\s+)?"
    r"(?:const|let|var|function|class|interface|enum|type)\s+(\w+)")
EXPORT_BRACE_RE = re.compile(
    r"export\s+(?:type\s+)?\{(?P<names>[^}]*)\}"
    r"(?:\s*from\s*[\"'](?P<spec>[^\"']+)[\"'])?", re.S)
EXPORT_DEFAULT_RE = re.compile(r"export\s+default\b")


def _source_files():
    out = []
    for root, _dirs, files in os.walk(SRC):
        for f in files:
            if f.endswith((".ts", ".tsx")) and not f.endswith(".d.ts"):
                out.append(os.path.join(root, f))
    return sorted(out)


def _resolve(from_file: str, spec: str):
    """Resolve a relative import specifier to a source file, or None."""
    base = os.path.normpath(os.path.join(os.path.dirname(from_file), spec))
    for cand in (base + ".ts", base + ".tsx", base,
                 os.path.join(base, "index.ts"),
                 os.path.join(base, "index.tsx")):
        if os.path.isfile(cand) and cand.endswith((".ts", ".tsx")):
            return cand
    return None


def _strip_comments(text: str) -> str:
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    return re.sub(r"^\s*//.*$", "", text, flags=re.M)


_EXPORT_MEMO: dict = {}


def _exports_of(path: str, _seen=None):
    """Set of named exports (plus '<default>') including re-exports.
    ``_seen`` guards cycles along the current resolution path only;
    completed files are memoized so sibling re-exports from the same
    target each see its full export set."""
    path = os.path.normpath(path)
    if path in _EXPORT_MEMO:
        return _EXPORT_MEMO[path]
    _seen = _seen or set()
    if path in _seen:
        return set()
    _seen.add(path)
    text = _strip_comments(open(path, encoding="utf-8").read())
    names = set(EXPORT_NAMED_RE.findall(text))
    if EXPORT_DEFAULT_RE.search(text):
        names.add("<default>")
    for m in EXPORT_BRACE_RE.finditer(text):
        for item in m.group("names").split(","):
            item = item.strip()
            if not item:
                continue
            item = re.sub(r"^type\s+", "", item)
            if " as " in item:
                src_name, out_name = [p.strip() for p in item.split(" as ")]
            else:
                src_name = out_name = item
            if m.group("spec"):  # re-export: verify against the source file
                target = _resolve(path, m.group("spec"))
                if target is not None:
                    t_exports = _exports_of(target, _seen)
                    assert (src_name in t_exports
                            or (src_name == "default"
                                and "<default>" in t_exports)), (
                        f"{path} re-exports {src_name!r} from "
                        f"{m.group('spec')!r}, which does not export it")
            names.add(out_name)
    _EXPORT_MEMO[path] = names
    return names


def test_frontend_sources_exist():
    files = _source_files()
    assert len(files) >= 10, files
    assert any(f.endswith("App.tsx") for f in files)


@pytest.mark.parametrize("path", _source_files(),
                         ids=lambda p: os.path.relpath(p, SRC))
def test_relative_imports_resolve_and_names_exist(path):
    text = _strip_comments(open(path, encoding="utf-8").read())
    for m in IMPORT_RE.finditer(text):
        spec = m.group("spec")
        if not spec.startswith("."):
            continue  # package import; not checkable without node_modules
        target = _resolve(path, spec)
        assert target is not None, f"{path}: unresolved import {spec!r}"
        exports = _exports_of(target)
        clause = m.group("clause").strip()
        brace = re.search(r"\{(?P<names>[^}]*)\}", clause, re.S)
        if brace:
            for item in brace.group("names").split(","):
                item = re.sub(r"^type\s+", "", item.strip())
                if not item:
                    continue
                name = item.split(" as ")[0].strip()
                assert name in exports, (
                    f"{path} imports {name!r} from {spec!r}; "
                    f"target exports {sorted(exports)}")
        default_clause = re.sub(r"\{[^}]*\}", "", clause, flags=re.S)
        default_clause = default_clause.replace(",", " ").strip()
        if default_clause and not default_clause.startswith("*"):
            assert "<default>" in exports, (
                f"{path} default-imports from {spec!r}, "
                f"which has no default export")


def test_ui_kit_surface_matches_reference_set():
    """The UI kit must cover the reference's shadcn component categories
    (reference front-end/src/components/ui/: button, card, input, label,
    select, dialog, chart, icons)."""
    idx = os.path.join(SRC, "components", "ui", "index.ts")
    exports = _exports_of(idx)
    for name in ("Button", "Card", "CardHeader", "CardContent", "CardTitle",
                 "Input", "Label", "Select", "Dialog", "AlertDialog",
                 "HBarList"):
        assert name in exports, (name, sorted(exports))
