#!/usr/bin/env python
"""HTML experiment report generator.

Capability parity with `DS_NeRF/utils/generate_html.py:14-227` (dominate-based
page with per-experiment videos and image grids) — rewritten with stdlib string
templating (no dominate dependency). Scans experiment dirs for videos (*.mp4)
and image trees and emits a single self-contained index.html.

Usage:
    python tools/generate_html.py --logdir ./logs --out report.html
"""

import argparse
import html
import os
import sys


PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: sans-serif; margin: 2em; background: #fafafa; }}
 h2 {{ border-bottom: 1px solid #ccc; padding-bottom: .2em; }}
 .row {{ display: flex; flex-wrap: wrap; gap: 8px; margin-bottom: 1em; }}
 .cell {{ text-align: center; font-size: 12px; color: #555; }}
 img, video {{ max-width: 320px; border: 1px solid #ddd; border-radius: 4px; }}
</style></head><body>
<h1>{title}</h1>
{body}
</body></html>
"""


def _experiment_section(expdir: str, rel: str, max_images: int = 12) -> str:
    parts = [f"<h2>{html.escape(os.path.basename(expdir))}</h2>"]
    videos = sorted(
        f for f in os.listdir(expdir) if f.endswith((".mp4", ".webm", ".gif"))
    )
    if videos:
        parts.append('<div class="row">')
        for v in videos:
            src = html.escape(os.path.join(rel, v))
            parts.append(
                f'<div class="cell"><video src="{src}" controls loop muted '
                f'autoplay></video><br>{html.escape(v)}</div>'
            )
        parts.append("</div>")
    for sub in ("rgb", "depth", "disp", "testset", "images"):
        subdir = os.path.join(expdir, sub)
        if not os.path.isdir(subdir):
            continue
        imgs = sorted(
            f for f in os.listdir(subdir) if f.lower().endswith((".png", ".jpg"))
        )[:max_images]
        if not imgs:
            continue
        parts.append(f"<h3>{html.escape(sub)}</h3>")
        parts.append('<div class="row">')
        for f in imgs:
            src = html.escape(os.path.join(rel, sub, f))
            parts.append(
                f'<div class="cell"><img src="{src}" loading="lazy"><br>'
                f"{html.escape(f)}</div>"
            )
        parts.append("</div>")
    return "\n".join(parts)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--logdir", required=True)
    parser.add_argument("--out", default=None, help="default: <logdir>/index.html")
    parser.add_argument("--title", default="mvip_tpu experiments")
    args = parser.parse_args()

    out = args.out or os.path.join(args.logdir, "index.html")
    sections = []
    for name in sorted(os.listdir(args.logdir)):
        expdir = os.path.join(args.logdir, name)
        if os.path.isdir(expdir):
            rel = os.path.relpath(expdir, os.path.dirname(os.path.abspath(out)))
            sections.append(_experiment_section(expdir, rel))
    if not sections:
        print(f"no experiment dirs under {args.logdir}", file=sys.stderr)
    with open(out, "w") as fh:
        fh.write(PAGE.format(title=html.escape(args.title), body="\n".join(sections)))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
