#!/usr/bin/env python3
"""Method documentation generator.

Analogue of the reference's ``script/icp_doc_builder.py`` (which extracts
``#name/#register/#desc/#step/#conf`` structured comments from the C++ into
markdown pages).  Here the single source of truth is the Python: each
registered method's module docstring (description + per-step math) and its
``DEFAULT_*`` config constants.  Emits one markdown page per method plus an
index, and refreshes the marker block in ``docs/methods.md``.

Usage: python scripts/gen_docs.py [--out docs/]
"""

from __future__ import annotations

import argparse
import importlib
import inspect
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MARKER_BEGIN = "<!-- begin generated methods -->"
MARKER_END = "<!-- end generated methods -->"

MODULES = {
    ("vanilla", 2): "icp_tpu.methods.vanilla",
    ("trimmed", 2): "icp_tpu.methods.trimmed",
    ("feature_aware", 2): "icp_tpu.methods.feature_aware",
    ("vanilla", 3): "icp_tpu.methods.vanilla_3d",
    ("trimmed", 3): "icp_tpu.methods.trimmed_3d",
    ("point_to_plane", 2): "icp_tpu.methods.point_to_plane",
    ("point_to_plane", 3): "icp_tpu.methods.point_to_plane",
    ("robust", 2): "icp_tpu.methods.robust",
    ("robust", 3): "icp_tpu.methods.robust",
    ("gicp", 2): "icp_tpu.methods.gicp",
    ("gicp", 3): "icp_tpu.methods.gicp",
    ("symmetric", 2): "icp_tpu.methods.symmetric",
    ("symmetric", 3): "icp_tpu.methods.symmetric",
    ("ndt", 2): "icp_tpu.methods.ndt",
    ("ndt", 3): "icp_tpu.methods.ndt",
}


def config_params(module) -> list[tuple[str, object]]:
    out = []
    for name, value in vars(module).items():
        if name.startswith("DEFAULT_"):
            key = name[len("DEFAULT_") :].lower()
            out.append((key, value))
    return out


def method_page(name: str, dim: int, module) -> str:
    doc = inspect.getdoc(module) or "(no documentation)"
    lines = [f"# `{name}` ({dim}D)", "", doc, ""]
    params = config_params(module)
    if params:
        lines += ["## Config parameters", ""]
        lines += [f"* `{k}` (default `{v}`)" for k, v in params]
        lines.append("")
    lines += [
        "## Registration",
        "",
        f"Constructed via `icp_tpu.from_method({name!r}, dim={dim}, config)`.",
        "",
    ]
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs")
    args = ap.parse_args()
    os.makedirs(os.path.join(args.out, "methods"), exist_ok=True)

    index_lines = ["# Registered ICP methods", ""]
    for (name, dim), modname in sorted(MODULES.items(), key=lambda kv: (kv[0][1], kv[0][0])):
        module = importlib.import_module(modname)
        page = method_page(name, dim, module)
        fname = f"{name}_{dim}d.md"
        with open(os.path.join(args.out, "methods", fname), "w") as f:
            f.write(page)
        first = ((inspect.getdoc(module) or "").splitlines() or ["(no documentation)"])[0]
        index_lines.append(f"* [`{name}` ({dim}D)](methods/{fname}) — {first}")
        print(f"wrote {fname}")

    index = "\n".join(index_lines) + "\n"
    main_md = os.path.join(args.out, "methods.md")
    if os.path.exists(main_md):
        content = open(main_md).read()
        pattern = re.escape(MARKER_BEGIN) + r".*?" + re.escape(MARKER_END)
        replacement = MARKER_BEGIN + "\n" + index + MARKER_END
        # repl as a callable: docstring content must never be interpreted as
        # regex escape sequences (e.g. LaTeX backslashes).
        content = re.sub(pattern, lambda _m: replacement, content, flags=re.DOTALL)
    else:
        content = MARKER_BEGIN + "\n" + index + MARKER_END + "\n"
    with open(main_md, "w") as f:
        f.write(content)
    print(f"wrote {main_md}")


if __name__ == "__main__":
    main()
