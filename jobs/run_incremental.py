#!/usr/bin/env python3
"""Job driver: incremental dedup via spark-submit (plans/incremental.py).

Two modes:

    # bootstrap: full pipeline over the corpus, persist dedup state
    spark-submit --driver-memory 24g --py-files ucs.zip \
        jobs/run_incremental.py --bootstrap corpus.parquet --state /data/state

    # per-snapshot: assign a new batch against persisted state, write
    # assignments and the grown state (atomically: new state dir + rename)
    spark-submit --driver-memory 24g --py-files ucs.zip \
        jobs/run_incremental.py --input batch.parquet --state /data/state \
        --output /data/out/2026-08-17

State layout under --state: ``sha_index/`` (text_sha, canonical_url)
and ``canonicals/`` (url, freq, simhash, mh_bands, mh_sig) parquet
tables — the two tables a production deployment keeps in Iceberg.
Batch outputs under --output: ``assignments/`` (url, canonical_url,
via) plus a one-line summary JSON on stdout.

The updated state is written to ``<state>.next`` then swapped in, so a
killed run never leaves a half-written state dir (poor man's Iceberg
commit; with a real catalog both tables update in one transaction).

No reference analog (umi-collapse-rs is single-corpus per run); the
config flags mirror jobs/run_dedup.py.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="incremental dedup against persisted state")
    mode = ap.add_mutually_exclusive_group(required=True)
    mode.add_argument("--bootstrap", help="corpus parquet: build initial state via the full pipeline")
    mode.add_argument("--input", help="new-batch parquet with pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--state", required=True, help="state root (sha_index/ + canonicals/)")
    ap.add_argument("--output", help="batch output dir (assignments/); required with --input")
    ap.add_argument("--algo", choices=["dir"], default="dir",
                    help="bootstrap clustering rule (incremental absorption is directional by contract)")
    ap.add_argument("--merge", choices=["earliest", "quality", "any"], default="earliest")
    ap.add_argument("--index-bucket-cap", type=int, default=64,
                    help="state-probe skew bound (canonicals kept per band bucket); 0 = uncapped")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args(argv)
    if args.input and not args.output:
        ap.error("--output is required with --input")

    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.plans.incremental import (
        DedupState,
        build_state,
        incremental_assign,
    )
    from umi_collapse_rs_spark.session import get_spark

    cfg = DedupConfig(
        algo=args.algo,
        merge=args.merge,
        window_tokens=0,
        **({"shuffle_partitions": args.shuffle_partitions} if args.shuffle_partitions else {}),
    )
    spark = get_spark(master=args.master, shuffle_partitions=args.shuffle_partitions)
    t0 = time.monotonic()

    def write_state(state: DedupState, root: str) -> None:
        # stage to <root>.next, then swap — a killed run never leaves a
        # half-written live state dir
        nxt = root.rstrip("/") + ".next"
        state.sha_index.write.mode("overwrite").parquet(f"{nxt}/sha_index")
        state.canonicals.write.mode("overwrite").parquet(f"{nxt}/canonicals")
        jvm, conf = spark._jvm, spark._jsc.hadoopConfiguration()
        pr, pn = jvm.org.apache.hadoop.fs.Path(root), jvm.org.apache.hadoop.fs.Path(nxt)
        fs = pr.getFileSystem(conf)
        if fs.exists(pr):
            fs.delete(pr, True)
        fs.rename(pn, pr)

    if args.bootstrap:
        from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline

        pages = spark.read.parquet(args.bootstrap)
        res = run_dedup_pipeline(spark, pages, cfg)
        state = build_state(res)
        write_state(state, args.state)
        canonicals = spark.read.parquet(f"{args.state}/canonicals")
        summary = {
            "mode": "bootstrap",
            "pages": pages.count(),
            "clusters": canonicals.count(),
            "wall_sec": round(time.monotonic() - t0, 2),
        }
    else:
        state = DedupState(
            sha_index=spark.read.parquet(f"{args.state}/sha_index"),
            canonicals=spark.read.parquet(f"{args.state}/canonicals"),
        )
        batch = spark.read.parquet(args.input)
        res = incremental_assign(
            spark, state, batch, cfg,
            index_bucket_cap=args.index_bucket_cap or None,
        )
        res.assignments.write.mode("overwrite").parquet(f"{args.output}/assignments")
        write_state(res.state_out, args.state)
        a = spark.read.parquet(f"{args.output}/assignments")
        vias = {r["via"]: r["count"] for r in a.groupBy("via").count().collect()}
        wall = time.monotonic() - t0
        n = a.count()
        summary = {
            "mode": "incremental",
            "batch_pages": n,
            "via": vias,
            "wall_sec": round(wall, 2),
            "pages_per_sec": round(n / wall, 1),
        }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
