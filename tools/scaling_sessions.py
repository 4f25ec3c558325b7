#!/usr/bin/env python3
"""Aggregate every committed scaling session into the session-history
table in BENCH/BASELINE.md (north_rule: throughput scaling efficiency
>= 0.8 from N to 4N executors, evidenced as 1-vs-4 pinned CPUs).

Each ``BENCH/scaling_*_raw.json`` is one independent
``tools/bench_scaling.py`` session (fresh pinned JVM per run,
alternating core order, loadavg-gated starts).  This tool recomputes,
from the raw per-run records only:

- per-session median pages/sec per level and the 1->4 efficiency,
- the MEDIAN OF SESSION MEDIANS (the number the criterion is read
  from — single sessions inherit the shared host's hour-to-hour
  contention state, see BENCH/BASELINE.md "Session history"),
- the per-stage median-wall table across sessions (the host-
  degradation evidence: identical s1-s5 code, drifting 4-core walls).

Usage:  python tools/scaling_sessions.py [--dir BENCH]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import statistics
import subprocess
import sys


def first_commit_date(path: str) -> str | None:
    """Date (YYYY-MM-DD) the raw file FIRST entered git — the session's
    measurement day (each session is committed right after it runs).
    Used only for the supplementary by-day grouping; returns None
    outside a git checkout (uncommitted files group as 'uncommitted')."""
    try:
        out = subprocess.run(
            ["git", "log", "--follow", "--format=%as", "--", os.path.basename(path)],
            cwd=os.path.dirname(os.path.abspath(path)),
            capture_output=True,
            text=True,
            check=True,
        ).stdout.split()
        return out[-1] if out else None
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def load_report(path: str) -> dict | None:
    """A raw file is either one JSON object (possibly pretty-printed)
    or log lines with the report JSON last."""
    raw = open(path).read().strip()
    if not raw:
        return None
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        try:
            return json.loads(raw.splitlines()[-1])
        except json.JSONDecodeError:
            return None


def stage_walls(report: dict, key: str) -> dict[str, float]:
    acc: dict[str, list[float]] = {}
    for r in report.get("runs", {}).get(key, []):
        for st in r.get("stages", []):
            acc.setdefault(st["stage"], []).append(st["wall_ms"])
    return {s: statistics.median(v) / 1000.0 for s, v in acc.items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"))
    opts = ap.parse_args()

    sessions: list[tuple[str, dict]] = []
    for path in sorted(glob.glob(os.path.join(opts.dir, "scaling_*_raw.json"))):
        rep = load_report(path)
        if not rep or "median_pages_per_sec" not in rep:
            print(f"skip {path}: not a session report", file=sys.stderr)
            continue
        sessions.append((os.path.basename(path), rep))
    if not sessions:
        print("no scaling_*_raw.json sessions found", file=sys.stderr)
        return 1

    # sessions whose scratch (spark.local.dir + output) sat on tmpfs are a
    # CONTROLLED EXPERIMENT against the shared-disk confound, not part of
    # the historical disk-scratch protocol — the criterion median mixes no
    # configurations; tmpfs sessions are listed and aggregated separately.
    print(f"{'session raw file':<34} {'reps':>4} {'med 1c':>8} {'med 4c':>8} {'eff':>6}  scratch")
    rows = []
    for name, rep in sessions:
        med = {int(k): v for k, v in rep["median_pages_per_sec"].items()}
        eff = rep.get("efficiency_1_to_4")
        if eff is None and 1 in med and 4 in med:
            eff = round(med[4] / med[1] / 4, 3)
        scratch = rep.get("scratch")
        rows.append((name, rep, eff, scratch))
        reps = min(len(v) for v in rep.get("runs", {}).values()) or rep.get("repeats")
        print(f"{name:<34} {reps:>4} {med.get(1, float('nan')):>8.1f} {med.get(4, float('nan')):>8.1f} {eff:>6.3f}  {scratch or 'disk (/tmp)'}")
    effs = [e for _, _, e, sc in rows if not sc]
    tmpfs_effs = [e for _, _, e, sc in rows if sc]

    med_eff = statistics.median(effs)
    disk = [(n, r) for n, r in sessions if not r.get("scratch")]
    m1 = [ {int(k): v for k, v in rep['median_pages_per_sec'].items()}.get(1) for _, rep in disk ]
    m4 = [ {int(k): v for k, v in rep['median_pages_per_sec'].items()}.get(4) for _, rep in disk ]
    print(f"\nmedian of disk-protocol session medians (criterion >= 0.8): {med_eff:.3f}  "
          f"(sorted: {', '.join(f'{e:.3f}' for e in sorted(effs))})")
    if tmpfs_effs:
        print(f"tmpfs-scratch experiment sessions (shared-disk confound removed): "
              f"{', '.join(f'{e:.3f}' for e in sorted(tmpfs_effs))}"
              + (f"  -> arm median {statistics.median(tmpfs_effs):.3f}"
                 if len(tmpfs_effs) > 1 else ""))
    print(f"disk-session spread: 1c {min(m1):.0f}-{max(m1):.0f} ({max(m1)/min(m1):.2f}x), "
          f"4c {min(m4):.0f}-{max(m4):.0f} ({max(m4)/min(m4):.2f}x)")

    # Supplementary by-day view: sessions on the same calendar day share
    # the same host-contention state (BENCH/BASELINE.md root cause), so
    # the day, not the session, is the closer-to-independent sample.
    # The criterion stays read from the session median above; this view
    # shows how much one degraded host-day weighs in it.
    by_day: dict[str, list[float]] = {}
    for name, rep, eff, scratch in rows:
        if scratch:
            continue  # the experiment arm is not a disk-protocol sample
        day = (
            rep.get("measured_date")  # explicit (restored files, see r03a note)
            or first_commit_date(os.path.join(opts.dir, name))
            or "uncommitted"
        )
        by_day.setdefault(day, []).append(eff)
    if len(by_day) > 1:
        print("\nby measurement day (raw file's measured_date, else first git commit date):")
        day_meds = []
        for day in sorted(by_day):
            dm = statistics.median(by_day[day])
            day_meds.append(dm)
            print(f"  {day}: {len(by_day[day])} session(s), "
                  f"effs {', '.join(f'{e:.3f}' for e in sorted(by_day[day]))} -> day median {dm:.3f}")
        print(f"  median of day medians (supplementary): {statistics.median(day_meds):.3f}")

    # per-stage cross-session walls (sessions without telemetry are blank)
    stages = sorted({s for _, rep in sessions for s in stage_walls(rep, "local1")})
    if stages:
        print(f"\nper-stage median wall seconds (1c | 4c) per session:")
        hdr = f"{'stage':<20}" + "".join(f" {name.removeprefix('scaling_').removesuffix('_raw.json'):>16}" for name, _ in sessions)
        print(hdr)
        for s in stages:
            row = f"{s:<20}"
            for _, rep in sessions:
                w1, w4 = stage_walls(rep, "local1").get(s), stage_walls(rep, "local4").get(s)
                row += f" {w1:>7.1f}|{w4:<8.1f}" if w1 and w4 else f" {'-':>16}"
            print(row)
    return 0


if __name__ == "__main__":
    sys.exit(main())
