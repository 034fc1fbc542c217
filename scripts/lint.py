#!/usr/bin/env python3
"""In-tree lint gate (no external linter in this image).

Analogue of the reference's clang-format/clang-tidy warnings-as-errors gate
(``/root/reference/.github/workflows/lint.yaml``, ``CMakeLists.txt:16-25``):
fails CI on violations instead of drifting.  Checks, all AST/text based:

* syntax (``ast.parse``),
* unused imports (module scope; ``__init__.py`` re-export surfaces exempt,
  ``# noqa`` on the import line exempts it),
* tabs in indentation, trailing whitespace, missing final newline,
* lines over 100 characters (URLs in comments exempt),
* reference citations: every ``/root/reference/<path>:<line>`` (or
  ``:<a>-<b>``) mention must name a file that exists with enough lines to
  cover the cited range — citation accuracy is the repo's parity contract
  (CLAUDE.md).  Bare-path citations (no line range) are checked for
  existence only.

Usage: ``python scripts/lint.py [paths...]`` — defaults to the package,
scripts, tests, and the repo-root entry points.  Exit 1 on any violation.
"""

from __future__ import annotations

import ast
import functools
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_LINE = 100
REFERENCE_ROOT = "/root/reference"
# ``/root/reference/lib/icp/impl/vanilla.cpp:80`` or ``...:44-65`` or a bare
# directory/file mention with no line suffix.
CITATION_RE = re.compile(
    r"/root/reference/([\w./+-]+?)(?::(\d+)(?:-(\d+))?)?(?=[^\w./:-]|$)"
)


@functools.lru_cache(maxsize=None)
def _ref_line_count(relpath: str) -> int | None:
    """Line count of a reference file; None if it does not exist."""
    full = os.path.join(REFERENCE_ROOT, relpath)
    if os.path.isdir(full):
        return -1  # directory mention: existence is all we check
    if not os.path.isfile(full):
        return None
    try:
        with open(full, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return data.count(b"\n") + (0 if data.endswith(b"\n") or not data else 1)


def check_citations(path: str, lines: list[str]) -> list[str]:
    if not os.path.isdir(REFERENCE_ROOT):
        return []  # reference not mounted (e.g. CI without the tree)
    problems = []
    for i, line in enumerate(lines, 1):
        if "noqa" in line:
            continue
        for m in CITATION_RE.finditer(line):
            if line[m.end() : m.end() + 1] == "{":
                continue  # f-string/glob template, not a citation
            rel, lo, hi = m.group(1), m.group(2), m.group(3)
            rel = rel.rstrip(".")  # sentence-final periods
            n = _ref_line_count(rel)
            if n is None:
                problems.append(
                    f"{path}:{i}: citation to nonexistent reference file '{rel}'"
                )
                continue
            if n == -1 or lo is None:
                continue
            last = int(hi) if hi is not None else int(lo)
            if int(lo) < 1 or last > n or int(lo) > last:
                problems.append(
                    f"{path}:{i}: citation '{rel}:{m.group(0).rsplit(':', 1)[-1]}'"
                    f" out of range (file has {n} lines)"
                )
    return problems

DEFAULT_TARGETS = ["icp_tpu", "scripts", "tests", "bench.py", "__graft_entry__.py", "examples"]


def iter_py_files(targets):
    for t in targets:
        path = os.path.join(REPO, t)
        if os.path.isfile(path) and path.endswith(".py"):
            yield path
        elif os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)


def used_names(tree: ast.AST) -> set[str]:
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute):
            # root of dotted chains is a Name, collected above
            pass
    # __all__ entries count as usage (re-export)
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and tgt.id == "__all__":
                    for elt in ast.walk(node.value):
                        if isinstance(elt, ast.Constant) and isinstance(elt.value, str):
                            names.add(elt.value)
    return names


def check_unused_imports(path: str, tree: ast.AST, lines: list[str]) -> list[str]:
    if os.path.basename(path) == "__init__.py":
        return []  # re-export surface
    problems = []
    used = used_names(tree)
    for node in ast.walk(tree):
        bound: list[tuple[str, int]] = []
        if isinstance(node, ast.Import):
            for alias in node.names:
                bound.append((alias.asname or alias.name.split(".")[0], node.lineno))
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for alias in node.names:
                if alias.name == "*":
                    continue
                bound.append((alias.asname or alias.name, node.lineno))
        for name, lineno in bound:
            if name not in used and "noqa" not in lines[lineno - 1]:
                problems.append(f"{path}:{lineno}: unused import '{name}'")
    return problems


def check_file(path: str) -> list[str]:
    problems = []
    with open(path, encoding="utf-8") as f:
        src = f.read()
    try:
        tree = ast.parse(src, filename=path)
    except SyntaxError as e:
        return [f"{path}:{e.lineno}: syntax error: {e.msg}"]
    lines = src.splitlines()
    if src and not src.endswith("\n"):
        problems.append(f"{path}:{len(lines)}: missing final newline")
    for i, line in enumerate(lines, 1):
        if line.rstrip("\n") != line.rstrip():
            problems.append(f"{path}:{i}: trailing whitespace")
        if line[: len(line) - len(line.lstrip())].count("\t"):
            problems.append(f"{path}:{i}: tab in indentation")
        if len(line) > MAX_LINE and "http" not in line:
            problems.append(f"{path}:{i}: line too long ({len(line)} > {MAX_LINE})")
    problems.extend(check_unused_imports(path, tree, lines))
    problems.extend(check_citations(path, lines))
    return problems


def main() -> int:
    targets = sys.argv[1:] or DEFAULT_TARGETS
    all_problems = []
    count = 0
    for path in iter_py_files(targets):
        count += 1
        all_problems.extend(check_file(path))
    for p in all_problems:
        print(p)
    print(f"lint: {count} files, {len(all_problems)} problem(s)")
    return 1 if all_problems else 0


if __name__ == "__main__":
    sys.exit(main())
