#!/usr/bin/env python3
"""In-tree lint gate (no external linter in this image).

Analogue of the reference's clang-format/clang-tidy warnings-as-errors gate
(``/root/reference/.github/workflows/lint.yaml``, ``CMakeLists.txt:16-25``):
fails CI on violations instead of drifting.  Checks, all AST/text based:

* syntax (``ast.parse``),
* unused imports (module scope; ``__init__.py`` re-export surfaces exempt,
  ``# noqa`` on the import line exempts it),
* tabs in indentation, trailing whitespace, missing final newline,
* lines over 100 characters (URLs in comments exempt).

Usage: ``python scripts/lint.py [paths...]`` — defaults to the package,
scripts, tests, and the repo-root entry points.  Exit 1 on any violation.
"""

from __future__ import annotations

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_LINE = 100

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
