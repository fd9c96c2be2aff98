#!/usr/bin/env python
"""Summarize experiment directories: one table row per run.

Scans `<basedir>/*/metrics.jsonl` (the structured stream the training loop
writes — the observability surface the reference stubbed out, TensorBoard
import at `DS_NeRF/run.py:15,793`) plus `args.txt` provenance, and prints
backbone / occupancy / steps / last PSNR / sustained rays/s per experiment.

Usage: python tools/summarize_runs.py [basedir=./logs_ours] [--json]
"""

import json
import os
import sys


def _read_args(expdir):
    args = {}
    try:
        with open(os.path.join(expdir, "args.txt")) as fh:
            for line in fh:
                if "=" in line:
                    k, v = line.split("=", 1)
                    args[k.strip()] = v.strip()
    except OSError:
        pass
    return args


def _read_metrics(expdir):
    """Returns (last record, sustained rays/s) — sustained = median of FRESH
    window rates (rows flagged rate_stale repeat the last closed window and
    are excluded; older runs without the flag dedup consecutive repeats)."""
    last, rates, prev = None, [], None
    try:
        with open(os.path.join(expdir, "metrics.jsonl")) as fh:
            for line in fh:
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                last = rec
                r = rec.get("rays_per_sec")
                if r and not rec.get("rate_stale") and r != prev:
                    rates.append(r)
                    prev = r
    except OSError:
        return None, None
    if not rates:
        return last, None
    rates.sort()
    return last, rates[len(rates) // 2]


def summarize(basedir):
    rows = []
    for name in sorted(os.listdir(basedir)):
        expdir = os.path.join(basedir, name)
        if not os.path.isdir(expdir):
            continue
        last, rate = _read_metrics(expdir)
        if last is None:
            continue
        args = _read_args(expdir)
        occ = ""
        if args.get("occ_grid", "False") == "True":
            occ = f"{args.get('occ_mode', '?')}/k={args.get('occ_keep', '?')}"
        guid = "+".join(
            tag for flag, tag in (("is_rgb_guidance", "rgb"),
                                  ("is_normal_guidance", "nrm"),
                                  ("is_colla_guidance", "colla"))
            if args.get(flag) == "True"
        )
        rows.append({
            "expname": name,
            "backbone": args.get("backbone", "?"),
            "occ": occ,
            "sds": guid,
            "megastep": args.get("megastep", "1"),
            "step": last.get("step"),
            "psnr": round(last.get("psnr", float("nan")), 2),
            "rays_per_sec": round(rate, 0) if rate else None,
        })
    return rows


def main(argv):
    basedir = "./logs_ours"
    as_json = False
    for a in argv:
        if a == "--json":
            as_json = True
        else:
            basedir = a
    rows = summarize(basedir)
    if as_json:
        print(json.dumps(rows))
        return
    cols = ["expname", "backbone", "occ", "sds", "megastep", "step", "psnr",
            "rays_per_sec"]
    widths = {c: max(len(c), *(len(str(r[c] or "")) for r in rows)) if rows
              else len(c) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(str(r[c] if r[c] is not None else "").ljust(widths[c])
                        for c in cols))


if __name__ == "__main__":
    main(sys.argv[1:])
