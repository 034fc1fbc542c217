#!/usr/bin/env python3
"""Static documentation site builder.

Analogue of the reference's book/Doxygen pipeline
(``/root/reference/Doxyfile``, ``book/main.md``,
``.github/workflows/docs.yaml`` publishing a rendered site): renders every
markdown page under ``docs/`` (plus README/ROADMAP/BASELINE) into a
self-contained browsable HTML site at ``site/`` with a navigation sidebar,
code highlighting, and intra-doc link rewriting.  Pure stdlib +
python-markdown + pygments — no external site generator required.

Usage: ``python scripts/gen_site.py [--out site/]``; open
``site/index.html``.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import markdown
from pygments.formatters import HtmlFormatter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (source path relative to repo, site-relative html path, nav title)
TOP_PAGES = [
    ("docs/index.md", "index.html", "Home"),
    ("docs/architecture.md", "architecture.html", "Architecture"),
    ("docs/theory.md", "theory.html", "Theory"),
    ("docs/parity.md", "parity.html", "Reference parity"),
    ("docs/parallel.md", "parallel.html", "Parallelism"),
    ("docs/deployment.md", "deployment.html", "Deployment"),
    ("docs/datasets.md", "datasets.html", "Datasets"),
    ("docs/writing_methods.md", "writing_methods.html", "Writing methods"),
    ("docs/methods.md", "methods.html", "Methods"),
    ("README.md", "readme.html", "README"),
    ("ROADMAP.md", "roadmap.html", "Roadmap"),
    ("BASELINE.md", "baseline.html", "Baseline numbers"),
]

TEMPLATE = """<!DOCTYPE html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — icp_tpu</title>
<style>
:root {{ --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5fa5; --side: #f4f6f8; }}
* {{ box-sizing: border-box; }}
body {{ margin: 0; font: 16px/1.55 system-ui, sans-serif; color: var(--fg);
       background: var(--bg); display: flex; min-height: 100vh; }}
nav {{ width: 230px; flex: none; background: var(--side); padding: 1.2rem 1rem;
      border-right: 1px solid #dde3e8; }}
nav h1 {{ font-size: 1.05rem; margin: 0 0 .8rem; }}
nav a {{ display: block; color: var(--fg); text-decoration: none;
        padding: .22rem .45rem; border-radius: 5px; font-size: .92rem; }}
nav a:hover {{ background: #e6ecf1; }}
nav a.active {{ background: var(--accent); color: #fff; }}
nav .sub {{ margin-left: .8rem; font-size: .85rem; }}
main {{ flex: 1; max-width: 52rem; padding: 2rem 2.4rem 4rem; }}
main h1, main h2, main h3 {{ line-height: 1.25; }}
main a {{ color: var(--accent); }}
pre {{ background: #f6f8fa; padding: .8rem 1rem; border-radius: 8px;
      overflow-x: auto; font-size: .85rem; }}
code {{ background: #f2f4f6; padding: .08em .3em; border-radius: 4px;
       font-size: .9em; }}
pre code {{ background: none; padding: 0; }}
table {{ border-collapse: collapse; display: block; overflow-x: auto; }}
th, td {{ border: 1px solid #d7dde3; padding: .35rem .6rem; font-size: .9rem; }}
th {{ background: var(--side); }}
{pygments}
</style></head><body>
<nav><h1>icp_tpu</h1>{nav}</nav>
<main>{body}</main>
</body></html>
"""


def method_pages():
    d = os.path.join(REPO, "docs", "methods")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".md") and name != "index.md":
            title = name[:-3].replace("_", " ")
            out.append((f"docs/methods/{name}", f"methods/{name[:-3]}.html", title))
    return out


def rewrite_links(html: str, mapping: dict, depth: int) -> str:
    """Point intra-repo .md hrefs at their rendered pages."""
    prefix = "../" * depth

    def sub(m):
        href = m.group(1)
        base = href.split("#")[0]
        frag = href[len(base):]
        key = os.path.normpath(base.lstrip("./"))
        for src, dst, _ in mapping["pages"]:
            if os.path.normpath(src).endswith(key) or key.endswith(
                os.path.basename(src)
            ) and os.path.basename(src) == os.path.basename(key):
                return f'href="{prefix}{dst}{frag}"'
        return m.group(0)

    return re.sub(r'href="([^"#]+\.md)(?:#[^"]*)?"', sub, html)


def build(out_dir: str) -> int:
    pages = TOP_PAGES + method_pages()
    mapping = {"pages": pages}
    md = markdown.Markdown(
        extensions=["tables", "fenced_code", "codehilite", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    pygments_css = HtmlFormatter(style="default").get_style_defs(".codehilite")

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(os.path.join(out_dir, "methods"), exist_ok=True)

    count = 0
    for src, dst, title in pages:
        path = os.path.join(REPO, src)
        if not os.path.isfile(path):
            continue
        depth = dst.count("/")
        nav_items = []
        for s2, d2, t2 in TOP_PAGES:
            cls = ' class="active"' if d2 == dst else ""
            nav_items.append(f'<a href="{"../" * depth}{d2}"{cls}>{t2}</a>')
        nav_items.append('<div class="sub">')
        for s2, d2, t2 in method_pages():
            cls = ' class="active"' if d2 == dst else ""
            nav_items.append(f'<a href="{"../" * depth}{d2}"{cls}>{t2}</a>')
        nav_items.append("</div>")

        with open(path) as f:
            text = f.read()
        md.reset()
        body = md.convert(text)
        body = rewrite_links(body, mapping, depth)
        html = TEMPLATE.format(
            title=title, nav="\n".join(nav_items), body=body, pygments=pygments_css
        )
        with open(os.path.join(out_dir, dst), "w") as f:
            f.write(html)
        count += 1
    return count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "site"))
    args = ap.parse_args()
    n = build(args.out)
    print(f"rendered {n} pages -> {args.out}")


if __name__ == "__main__":
    main()
