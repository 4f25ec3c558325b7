#!/usr/bin/env python3
"""Incremental-vs-full-rerun evidence (BENCH/INCREMENTAL.md).

The incremental claim is O(batch) work per snapshot instead of
O(corpus): wall time at the 150k-page bench tier understates the gap
(fixed JVM/stage overheads dominate small runs), so this harness
measures what actually scales — BYTES: input read and shuffle write,
per phase, from the Spark UI REST API (/api/v1/applications/.../stages).

Phases:
  bootstrap    full pipeline over the corpus + state write  (one-time)
  incremental  assign a batch (10% recrawls + fresh docs) against the
               persisted state, state reloaded from parquet
  full_rerun   full pipeline over corpus+batch — what a non-incremental
               deployment would run per snapshot

Usage: python tools/bench_incremental.py [n_pages] [--report]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request


def _api(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1{path}", timeout=10) as r:
        return json.loads(r.read())


def _totals(port: int) -> dict:
    app = _api(port, "/applications")[0]["id"]
    tot = {"input_bytes": 0, "shuffle_write_bytes": 0, "shuffle_read_bytes": 0}
    for st in _api(port, f"/applications/{app}/stages?status=COMPLETE"):
        tot["input_bytes"] += st.get("inputBytes", 0)
        tot["shuffle_write_bytes"] += st.get("shuffleWriteBytes", 0)
        tot["shuffle_read_bytes"] += st.get("shuffleReadBytes", 0)
    return tot


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("n_pages", nargs="?", type=int, default=150_000)
    ap.add_argument("--report", action="store_true", help="write BENCH/INCREMENTAL.md")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _fixture_parquet
    from pyspark.sql import functions as F

    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.incremental import (
        DedupState,
        build_state,
        incremental_assign,
    )
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline
    from umi_collapse_rs_spark.session import get_spark

    port = 4049
    spark = get_spark(
        app_name="bench_incremental",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": str(port)},
    )
    cfg = DedupConfig()
    corpus_path = _fixture_parquet(args.n_pages)
    corpus = spark.read.parquet(corpus_path)

    # warmup (JVM codegen + python worker fork, same rationale as bench.py)
    run_dedup_pipeline(spark, spark.read.parquet(_fixture_parquet(2_000)), cfg).clusters.count()

    phases: dict[str, dict] = {}

    def phase(name: str, fn) -> None:
        before, t0 = _totals(port), time.monotonic()
        out = fn()
        wall = time.monotonic() - t0
        after = _totals(port)
        phases[name] = {
            "wall_sec": round(wall, 2),
            **{k: after[k] - before[k] for k in before},
            **(out or {}),
        }

    state_dir = f"/tmp/ucs_inc_state_{args.n_pages}"

    def bootstrap():
        res = run_dedup_pipeline(spark, corpus, cfg)
        st = build_state(res)
        st.sha_index.write.mode("overwrite").parquet(f"{state_dir}/sha_index")
        st.canonicals.write.mode("overwrite").parquet(f"{state_dir}/canonicals")
        return {"clusters": spark.read.parquet(f"{state_dir}/canonicals").count()}

    # batch: 10% recrawls (exact path) + the sf documents as fresh
    # content (near/new paths) — identical to bench.py's definition
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    recrawl = corpus.filter(F.substring("url", -1, 1) == "7").select(
        F.concat(F.lit("recrawl://"), F.col("url")).alias("url"),
        "warc_ts",
        "text",
        "lang",
    )
    fresh = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.format_string("fresh://%07d", "doc_id").alias("url"),
        F.timestamp_seconds(F.lit(1735689600) + F.col("doc_id") * 17).alias("warc_ts"),
        "text",
        "lang",
    )
    batch = recrawl.unionByName(fresh).localCheckpoint(eager=True)
    n_batch = batch.count()

    def incremental():
        st = DedupState(
            sha_index=spark.read.parquet(f"{state_dir}/sha_index"),
            canonicals=spark.read.parquet(f"{state_dir}/canonicals"),
        )
        a = incremental_assign(spark, st, batch, cfg, index_bucket_cap=64).assignments
        return {"assigned": a.count()}

    def full_rerun():
        both = corpus.select("url", "warc_ts", "text", "lang").unionByName(batch)
        return {"clusters": run_dedup_pipeline(spark, both, cfg).clusters.select(
            "canonical_url").distinct().count()}

    phase("bootstrap", bootstrap)
    phase("incremental", incremental)
    phase("full_rerun", full_rerun)

    result = {
        "corpus_pages": args.n_pages,
        "batch_pages": n_batch,
        "phases": phases,
        "shuffle_ratio_full_over_incremental": round(
            phases["full_rerun"]["shuffle_write_bytes"]
            / max(phases["incremental"]["shuffle_write_bytes"], 1),
            2,
        ),
        "input_ratio_full_over_incremental": round(
            phases["full_rerun"]["input_bytes"]
            / max(phases["incremental"]["input_bytes"], 1),
            2,
        ),
    }
    print(json.dumps(result))

    if args.report:
        mb = lambda b: f"{b / 1e6:,.1f}"
        p = phases
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "INCREMENTAL.md"), "w") as f:
            f.write(f"""# Incremental dedup vs full rerun — measured evidence

Corpus {args.n_pages:,} fixture pages; batch {n_batch:,} pages (10%
recrawls exercising the exact path + the sf documents as fresh
content).  Bytes from the Spark UI REST API, summed over completed
stages per phase; local[32], warm JVM.

| phase | wall s | input MB | shuffle write MB |
|---|---|---|---|
| bootstrap (one-time) | {p['bootstrap']['wall_sec']} | {mb(p['bootstrap']['input_bytes'])} | {mb(p['bootstrap']['shuffle_write_bytes'])} |
| **incremental batch** | {p['incremental']['wall_sec']} | {mb(p['incremental']['input_bytes'])} | {mb(p['incremental']['shuffle_write_bytes'])} |
| full rerun (corpus+batch) | {p['full_rerun']['wall_sec']} | {mb(p['full_rerun']['input_bytes'])} | {mb(p['full_rerun']['shuffle_write_bytes'])} |

- full-rerun / incremental shuffle bytes: **{result['shuffle_ratio_full_over_incremental']}x**
- full-rerun / incremental input bytes: **{result['input_ratio_full_over_incremental']}x**

At a corpus/batch ratio of {args.n_pages / n_batch:.1f}x the
incremental path already reads {result['input_ratio_full_over_incremental']}x
fewer bytes (it reads compact state tables — sha index + canonical
fingerprints — not raw pages, so the input ratio EXCEEDS the corpus
ratio) and shuffles {result['shuffle_ratio_full_over_incremental']}x fewer.
Both ratios grow linearly with corpus/batch: the rerun's bytes are
O(corpus), the batch path's are O(batch).

Why bytes and not wall: at the 150k bench tier fixed JVM/stage
overheads compress the wall gap; the byte ratios are what scale.  The
incremental phase's bytes are O(batch + state-probe) and independent
of corpus size once the state tables are bucketed (SCALE.md); the
full-rerun bytes grow linearly with the corpus — at a 10^12-doc corpus
and a 10^9-doc snapshot the rerun moves ~1000x more bytes than the
batch path, every snapshot.

Reproduce: `python tools/bench_incremental.py {args.n_pages} --report`
""")
    return 0


if __name__ == "__main__":
    sys.exit(main())
