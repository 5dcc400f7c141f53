"""Parameterized campaign runner — ONE entry point for sweep campaigns,
replacing the per-letter ``campaign_r3{a..m}.py`` scripts (VERDICT r3
weak #3: sweep matrices as copied Python re-created the reference's
recompiled-C-arrays anti-pattern, ``benchmark.c:76-101`` / SURVEY §5.6).

A campaign profile is a JSON file::

    {
      "csv": "benchmarks/results_r4/sweep.csv",      // default output
      "sections": [
        {"name": "high-frontier", "ns": [57344], "nbs": [1024],
         "modes": ["inplace"], "precision": "high", "kb": 1024,
         "repeats": 5},
        {"name": "c64", "ns": [8192], "nbs": [512], "dtypes": ["complex64"],
         "modes": ["shrink"], "repeats": 5, "csv": ".../c64.csv"}
      ]
    }

Each section is a full ``dla_tpu.bench.harness.SweepConfig`` dict (plus
optional ``name``/``csv`` overrides) and runs through the standard
fork-per-config harness with its resumable CSV contract — re-running a
partially completed campaign skips finished rows. The per-letter r3
scripts remain as frozen experiment provenance; new campaigns are JSON
profiles under ``benchmarks/profiles/``.

Usage:
    python benchmarks/campaign.py --profile benchmarks/profiles/r4.json \
        [--only name1,name2] [--csv path]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from dla_tpu.bench.harness import SweepConfig, run_sweep  # noqa: E402


def load_profile(path: str) -> tuple[str | None, list[tuple[str, str | None, SweepConfig]]]:
    with open(path) as f:
        prof = json.load(f)
    default_csv = prof.get("csv")
    known = {f.name for f in dataclasses.fields(SweepConfig)}
    sections = []
    for i, sec in enumerate(prof["sections"]):
        name = sec.get("name", f"section{i}")
        csv = sec.get("csv")
        d = {k: v for k, v in sec.items() if k in known}
        if "meshes" in d:
            d["meshes"] = [tuple(m) for m in d["meshes"]]
        sections.append((name, csv, SweepConfig(**d)))
    return default_csv, sections


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="dla-campaign")
    ap.add_argument("--profile", required=True, help="campaign JSON profile")
    ap.add_argument("--csv", default=None, help="override the profile CSV")
    ap.add_argument(
        "--only", default=None,
        help="comma-separated section names to run (default: all)")
    args = ap.parse_args(argv)

    default_csv, sections = load_profile(args.profile)
    only = set(args.only.split(",")) if args.only else None
    rc = 0
    for name, sec_csv, cfg in sections:
        if only and name not in only:
            continue
        csv_path = args.csv or sec_csv or default_csv or os.path.join(
            REPO, "benchmarks", "results_r4", "sweep.csv")
        print(f"[campaign] section '{name}' -> {csv_path}", flush=True)
        t0 = time.time()
        rows = run_sweep(cfg, csv_path)
        bad = sum(1 for r in rows if r["exit_code"] != 0)
        print(
            f"[campaign] section '{name}': {len(rows)} rows "
            f"({bad} failed) in {time.time() - t0:.0f}s", flush=True)
        rc |= 1 if bad and bad == len(rows) else 0
    return rc


if __name__ == "__main__":
    sys.exit(main())
