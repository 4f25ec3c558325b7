#!/usr/bin/env python3
"""Scaling-efficiency evidence (north_rule: throughput efficiency >= 0.8
from N to 4N executors; sandbox stand-in per the driver instruction: the
same job on the SAME input at two pinned-CPU parallelism levels, fresh
JVM each; 1 vs 4 pinned CPUs is the pairing free of this host's DRAM /
SMT ceilings — see BENCH/BASELINE.md).

r3 methodology fixes (the r2 verdict called the single-run numbers
noise-dominated: three runs spanned 0.72-1.09):

- ``--repeats R`` (default 3): the core levels are measured in
  ALTERNATING order (1,4,1,4,...) so slow host drift hits both levels
  equally; the reported efficiency uses the MEDIAN pages/sec per level
  and the per-level spread is published alongside it.
- host-idle check: 1-minute loadavg is sampled before every run; the
  harness waits until it decays below ``--idle-below`` (default 0.3 —
  r4: the previous <1.0 gate admitted the prior run's load mid-decay,
  and 4-core throughput tracked start loadavg at Spearman -1.0; true
  idle on this VM is ~0.05) before burning a measurement.
- ``spark.sql.shuffle.partitions = 3 * cores`` at EVERY level (same
  formula per level — the standard 2-4x-cores sizing).  The r2 harness
  used exactly ``cores`` partitions, which made every stage wait on its
  slowest partition: with 4 partitions a text-length skew of 30% puts
  ~30% of the stage on one core while three idle.  Measured on the same
  600k-page input at local[4]: 215.3 s at sp=4 vs 163.2 s at sp=12 —
  this granularity artifact, not the job, was the r2 "scaling
  regression" (efficiency 0.72); with honest granularity the pairing
  measures the job.

Usage:

    python tools/bench_scaling.py [n_pages] [--cores 1,4] [--repeats 3]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def _wait_host_idle(threshold: float, max_wait: int = 900) -> tuple[float, int]:
    """Block until 1-min loadavg < threshold (or max_wait s); return
    (load, seconds waited).  r4: the threshold default moved from 1.0
    to 0.3 — the r4 median-of-5 showed 4-core throughput perfectly
    rank-anticorrelated with start loadavg (Spearman -1.0,
    BENCH/BASELINE.md), and every 0.8-0.99 start was just the PREVIOUS
    run's load mid-decay (true idle on this VM is ~0.05): the <1.0
    gate fired at the first 15 s sample under 1.0 instead of letting
    the decay finish.  Waiting out the decay costs ~2 min/run and
    removes the dominant pairing noise."""
    waited = 0
    while True:
        load = os.getloadavg()[0]
        if load < threshold or waited >= max_wait:
            return load, waited
        time.sleep(15)
        waited += 15


def run_at(
    cores: int,
    pages_path: str,
    zip_path: str,
    idle_below: float = 0.3,
    scratch: str | None = None,
) -> dict:
    """Run the pipeline pinned to exactly ``cores`` CPUs.

    ``taskset`` pinning is what makes "N cores vs 4N cores" honest in a
    single-JVM sandbox: without it the local[2] JVM still spreads GC /
    shuffle-IO threads and Python UDF workers across all 32 host cores,
    inflating the small-N baseline and understating scaling efficiency.
    GC threads are pinned to the same budget for the same reason.

    ``scratch`` (e.g. ``/dev/shm/ucs_scaling_scratch``) moves
    ``spark.local.dir`` (shuffle files + spilled block-manager blocks)
    and the job's output tables onto that path.  Pointing it at tmpfs
    isolates the measurement from the sandbox's SHARED co-tenant disk:
    on a real cluster N -> 4N executors multiplies local-disk spindles
    along with cores, but in this one-VM sandbox both levels contend for
    the same /dev/vda, so a degraded host-disk day charges co-tenant I/O
    to the 4-core level only (the 1-core level can't saturate the disk)
    and understates the job's scaling — see BENCH/BASELINE.md "Why the
    Aug 19 sessions read low".  Runs with scratch set are labelled in
    the raw JSON; the input parquet stays on disk (read-once, then
    page-cached at either setting).
    """
    load, idle_wait = _wait_host_idle(idle_below)
    out_dir = f"/tmp/ucs_scaling_{cores}"
    extra_conf = []
    if scratch:
        import shutil

        # fresh per-run scratch: bound tmpfs usage and avoid any
        # cross-run block reuse making one run cheaper than another
        shutil.rmtree(scratch, ignore_errors=True)
        local_dir = os.path.join(scratch, "spark_local")
        out_dir = os.path.join(scratch, f"out_{cores}")
        os.makedirs(local_dir, exist_ok=True)
        extra_conf = ["--conf", f"spark.local.dir={local_dir}"]
    cmd = [
        "taskset",
        "-c",
        f"0-{cores - 1}",
        "spark-submit",
        "--driver-memory",
        "24g",
        "--conf",
        f"spark.driver.extraJavaOptions=-XX:+UseParallelGC -XX:ParallelGCThreads={max(2, cores)}",
        *extra_conf,
        "--py-files",
        zip_path,
        "jobs/run_dedup.py",
        "--warmup",
        "--input",
        pages_path,
        "--output",
        out_dir,
        "--master",
        f"local[{cores}]",
        "--shuffle-partitions",
        str(3 * cores),
    ]
    t0 = time.monotonic()
    proc = subprocess.run(cmd, capture_output=True, text=True, check=True)
    total = time.monotonic() - t0
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    summary["total_process_sec"] = round(total, 1)
    summary["cores"] = cores
    summary["loadavg_at_start"] = round(load, 2)
    summary["idle_wait_sec"] = idle_wait
    if scratch:
        summary["scratch"] = scratch
    return summary


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("n_pages", type=int, nargs="?", default=1_200_000)
    ap.add_argument("--cores", default="1,4", help="comma-separated pinned-CPU counts")
    ap.add_argument("--repeats", type=int, default=3, help="alternating repeats per level")
    ap.add_argument(
        "--no-report", action="store_true", help="print JSON only, leave BENCH/BASELINE.md alone"
    )
    ap.add_argument(
        "--idle-below", type=float, default=0.3,
        help="start each run only once 1-min loadavg decays below this",
    )
    ap.add_argument(
        "--scratch", default=None,
        help="move spark.local.dir (shuffle + spilled blocks) and job "
             "output onto this path — point at tmpfs (/dev/shm/...) to "
             "isolate the pairing from the sandbox's shared co-tenant "
             "disk, which does not scale 1->4 the way per-executor "
             "disks do on a real cluster; recorded in the raw JSON",
    )
    ap.add_argument(
        "--seed-runs", default=None,
        help="path to a prior report JSON (this tool's output): its runs are "
             "merged in before computing medians, so a 3-rep session can be "
             "extended to 5 without re-measuring — every seeded run was "
             "itself gated and pinned identically",
    )
    opts = ap.parse_args()
    n_pages = opts.n_pages
    cores_list = [int(c) for c in opts.cores.split(",")]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.chdir(repo)
    sys.path.insert(0, repo)

    pages_path = f"/tmp/ucs_scaling_pages_{n_pages}.parquet"
    if not os.path.exists(pages_path):
        from umi_collapse_rs_spark.fixtures import generate_pages

        pdf, _ = generate_pages(n_pages)
        # small row groups: parquet splits at ROW-GROUP granularity, so a
        # single-row-group file (pyarrow default: 1Mi rows) would make
        # the whole scan ONE task no matter how many cores — serializing
        # stage 1 and anything before the first shuffle
        pdf.to_parquet(
            pages_path,
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
            row_group_size=8192,
        )
    zip_path = "/tmp/ucs_scaling.zip"
    subprocess.run(
        ["zip", "-qr", zip_path, "umi_collapse_rs_spark", "-x", "*__pycache__*"],
        check=True,
    )

    # alternating measurement order: any monotone host drift (thermal,
    # background daemons) lands on both levels symmetrically
    runs: dict[int, list[dict]] = {c: [] for c in cores_list}
    if opts.seed_runs:
        with open(opts.seed_runs) as fh:
            prior = json.loads(fh.read().strip().splitlines()[-1])
        for key, rs in prior.get("runs", {}).items():
            c = int(key.removeprefix("local"))
            if c in runs:
                runs[c].extend(rs)
    for rep in range(opts.repeats):
        for c in cores_list:
            r = run_at(c, pages_path, zip_path, idle_below=opts.idle_below, scratch=opts.scratch)
            r["rep"] = rep
            runs[c].append(r)
            print(
                json.dumps(
                    {k: r[k] for k in ("cores", "rep", "wall_sec", "pages_per_sec", "loadavg_at_start")}
                ),
                file=sys.stderr,
            )

    total_reps = min(len(runs[c]) for c in cores_list)
    tp_all = {c: sorted(r["pages_per_sec"] for r in runs[c]) for c in cores_list}
    tp = {c: statistics.median(v) for c, v in tp_all.items()}

    def eff(a: int, b: int) -> float:
        return round((tp[b] / tp[a]) / (b / a), 3)

    # per-stage efficiency (r4 verdict item #6: the clustering rounds
    # were the one sub-0.8 stage): median wall per stage per level,
    # efficiency = (w_small / w_big) / (big / small)
    def stage_walls(c: int) -> dict[str, float]:
        acc: dict[str, list[float]] = {}
        for r in runs[c]:
            for st in r.get("stages", []):
                acc.setdefault(st["stage"], []).append(st["wall_ms"])
        return {s: statistics.median(v) for s, v in acc.items()}

    stage_eff: dict[str, dict] = {}
    if len(cores_list) >= 2:
        a, b = cores_list[0], cores_list[-1]
        wa, wb = stage_walls(a), stage_walls(b)
        for s in sorted(set(wa) & set(wb)):
            stage_eff[s] = {
                f"wall_ms_{a}c": round(wa[s], 0),
                f"wall_ms_{b}c": round(wb[s], 0),
                "efficiency": round((wa[s] / wb[s]) / (b / a), 3),
            }

    report = {
        "n_pages": n_pages,
        "repeats": total_reps,
        **({"scratch": opts.scratch} if opts.scratch else {}),
        "median_pages_per_sec": tp,
        "all_pages_per_sec": tp_all,
        "stage_efficiency": stage_eff,
        "runs": {f"local{c}": runs[c] for c in cores_list},
    }
    for a, b in ((1, 4), (2, 8), (8, 32)):
        if a in tp and b in tp:
            report[f"efficiency_{a}_to_{b}"] = eff(a, b)
    print(json.dumps(report))
    if opts.no_report or not (1 in tp and 4 in tp):
        return 0

    clusters = {r["clusters"] for rs in runs.values() for r in rs}
    same = len(clusters) == 1
    per_rep = ""
    if set(cores_list) >= {1, 4} and len(runs[1]) == len(runs[4]):
        pairs = [
            round(runs[4][i]["pages_per_sec"] / runs[1][i]["pages_per_sec"] / 4, 3)
            for i in range(len(runs[1]))
        ]
        per_rep = (
            "- per-repeat pairings (same-rep 4-core over 1-core): "
            + ", ".join(f"rep{i} {p}" for i, p in enumerate(pairs))
            + "\n"
        )
    rows = "\n".join(
        "| local[{c}] | {walls} | {tps} | {med} |".format(
            c=c,
            walls=" / ".join(str(r["wall_sec"]) for r in runs[c]),
            tps=" / ".join(str(r["pages_per_sec"]) for r in runs[c]),
            med=tp[c],
        )
        for c in cores_list
    )
    spread = {
        c: round((tp_all[c][-1] - tp_all[c][0]) / tp[c] * 100, 1) for c in cores_list
    }
    stage_rows = "\n".join(
        "| {s} | {w1:,.0f} | {w4:,.0f} | {e} |".format(
            s=s,
            w1=v[f"wall_ms_{cores_list[0]}c"],
            w4=v[f"wall_ms_{cores_list[-1]}c"],
            e=v["efficiency"],
        )
        for s, v in stage_eff.items()
    )
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — scaling + throughput evidence

North-rule scaling criterion (BASELINE.json): throughput scaling
efficiency >= 0.8 from N to 4N executors.  Sandbox stand-in per the
driver instruction: the SAME dedup job on the SAME input
({n_pages:,} synthetic fixture pages, seed 42) at two pinned-CPU
parallelism levels.  Each run is a fresh `spark-submit --py-files` JVM
pinned with `taskset -c 0-(n-1)` to EXACTLY n CPUs (GC threads
included) — without pinning, the small-N JVM borrows idle host cores
for GC/IO/Python workers and the baseline is not an honest n-core
measurement.  `spark.sql.shuffle.partitions = 3 x cores` at every
level (same formula per level; the standard 2-4x sizing).

Measurement protocol (r2 verdict item #1 — the single-run numbers were
noise-dominated): {total_reps} repeats per level in ALTERNATING order
(1, 4, 1, 4, ...), each run gated on 1-min loadavg < {opts.idle_below}
(r4: the earlier <1.0 gate admitted the previous run's load mid-decay
— see the r4 root-cause section below), efficiency computed from the
MEDIAN pages/sec per level, per-run numbers published:

| parallelism (pinned CPUs) | wall s (runs) | pages/sec (runs) | median pages/sec |
|---|---|---|---|
{rows}

- **N -> 4N (1 -> 4 cores): {round(tp[4] / tp[1], 2)}x median speedup,
  scaling efficiency {eff(1, 4)}** (criterion >= 0.8)
{per_rep}- run-to-run spread (max-min over median): local[1] {spread.get(1)}%, local[4] {spread.get(4)}%
- cluster outputs identical across every run and parallelism level: {same}

## Per-stage 1 -> 4 efficiency (median stage wall per level)

r4 verdict item #6: the iterative clustering stage (s6) was the one
sub-0.8 component — driver-paced rounds pay fixed scheduling latency
no core count parallelizes.  r5 implemented round-batching
(operators/cluster.py rounds_per_action: TWO propagation rounds
composed into one checkpoint+stats action), measured it with a
stage-isolated 2x2 A/B (checkpoint-resume on this same 1.2M input so
ONLY s6+s7 recompute), and REJECTED it: the mid-batch frontier is a
lazy filter over sub-round 1's plan, so sub-round 2 re-derives that
whole join/agg subtree inside the same action — s6 wall 183.9 -> 273.3
s at 1 core (+49%) and 67.8 -> 87.6 s at 4 cores (+29%), outputs
bit-identical (270,177 clusters, equal content hash) in all four arms.
The shipped default is rounds_per_action=1; the knob remains for
topologies where driver latency dominates compute.  The honest
residual: s6's driver-paced rounds keep it the weakest-scaling stage,
and the fix at real-cluster scale is fewer rounds (the graphs are
star-like, typically 4-6 rounds) — not deeper lazy plans.

| stage | median wall ms @1c | @4c | efficiency |
|---|---|---|---|
{stage_rows}

## Root cause of the r2 "0.72" measurement

The r2 harness set `shuffle.partitions = cores`, so at local[4] every
stage ran as 4 tasks and waited on the slowest partition — a pure
granularity artifact that charged text-length skew to the scaling
number (measured on one 600k-page input: 215.3 s at sp=4 vs 163.2 s at
sp=12, +32% from granularity alone; local[1] is immune since 1
partition cannot skew).  With the per-level formula fixed to 3 x cores
the pairing measures the JOB, and the job scales — per-stage numbers
in the table above.

## Root cause of the r4 sub-0.8 per-rep pairings (and the gate fix)

The first r4 median-of-5 (BENCH/scaling_r04_raw.json: medians
1130.6 / 3736.5, efficiency 0.826, pairings 0.935 / 0.856 / 0.726 /
0.759 / 0.932) exposed the residual noise source: 4-core throughput
was PERFECTLY rank-anticorrelated with its start loadavg (Spearman
-1.0 over all 5 reps, 0.80 -> 4228.1 monotone down to 0.98 -> 3400.9,
a 20% swing) while 1-core showed none (-0.1), and the sub-0.8
pairings were exactly the two fastest 1-core runs divided by the two
highest-load 4-core runs.  Every 0.8-0.99 start load was the
PREVIOUS run's load mid-decay — true idle on this VM is ~0.05 — i.e.
the <1.0 gate fired at the first 15 s sample under 1.0 instead of
letting the decay finish.  The harness now waits for loadavg < 0.3
(`--idle-below`), which costs ~2 min between runs and removes the
dominant pairing noise; the numbers above are measured under the
fixed gate.

## Reading the curve against THIS host's hardware ceiling

This sandbox is one VM (32 cores, one memory bus).  Framework-free
microbenchmarks (ProcessPoolExecutor + numpy, same pinning) show
DRAM-streaming workloads saturate at ~6 concurrent streams (2 -> 8
worker efficiency 0.48) — so only the 1 -> 4 pairing measures
executor-style scaling without charging the shared-bus ceiling to the
job.  On a real cluster N -> 4N *executors* multiplies memory
bandwidth and heap along with cores, which is what the unsaturated
pairing emulates.  The job itself has no serial choke points: no
driver-side data loops, no collect, a fixed number of exchanges per
stage, and identical deterministic output at every parallelism level.

Reproduce: `python tools/bench_scaling.py {n_pages} --repeats {total_reps}`

Correctness evidence (dup-pair recall >= 0.99 + zero assignment
mismatches vs the reference-semantics oracle at 150k pages): see
BENCH/RECALL.md.

Headline throughput (sf0.1 bench tier, 150k fixture pages, local[32],
steady-state after warmup): see the
driver-recorded BENCH_r*.json from `bench.py` (`pages_per_sec`).

Scale analysis (100 TB / 10^12 docs): every stage is a fixed, bounded
number of shuffles — normalize+exact collapse (1 exchange on text_sha),
fingerprint UDF (map-only after 1 re-spread exchange), candidate
generation (1 exchange per source on bucket keys, skew-capped by
sorted-neighbor chaining with all-pairs expansion capped at
bucket_pair_cap), verify (pair-keyed joins, the fat MinHash-signature
payload joined only for LSH-only pairs), clustering (O(log depth)
rounds, each 2 exchanges, lineage cut per round, one short-circuit
convergence probe), output joins.  No driver-side loops over data; no
collect; per-bucket work is bounded by the pair cap, so hot template
farms cannot blow up a task.
"""
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
