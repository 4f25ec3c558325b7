#!/usr/bin/env python3
"""Dup-pair recall vs the planted fixture truth (BASELINE.json metric:
recall >= 0.99) at an arbitrary corpus size, plus — at small sizes —
exact cluster-assignment equality vs the pure-Python reference-
semantics greedy oracle (SURVEY §2 C1, oracle.py).

    python tools/check_recall.py [n_pages] [--oracle]

Prints one JSON line: recall overall and per planted duplicate class.
"""

from __future__ import annotations

import json
import os
import sys


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    with_oracle = "--oracle" in sys.argv

    from umi_collapse_rs_spark import oracle
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.fixtures import generate_pages, pages_spark_df
    from umi_collapse_rs_spark.plans.pipeline import run_dedup_pipeline
    from umi_collapse_rs_spark.session import get_spark

    spark = get_spark(app_name="check-recall")
    _, truth = generate_pages(n_pages)
    pages = pages_spark_df(spark, n_pages)
    res = run_dedup_pipeline(spark, pages, DedupConfig())
    clusters = res.clusters.select("url", "canonical_url").toPandas()

    assign = dict(zip(clusters.url, clusters.canonical_url))
    found = oracle.pair_set(assign)
    out: dict = {"n_pages": n_pages, "truth_pairs": len(truth)}
    truth_all = set(zip(truth.src_url, truth.dst_url))
    out["recall"] = round(oracle.dup_pair_recall(found, truth_all), 6)
    for kind, grp in truth.groupby("kind"):
        t = set(zip(grp.src_url, grp.dst_url))
        out[f"recall_{kind}"] = round(oracle.dup_pair_recall(found, t), 6)
    # precision against planted truth is diagnostic only: near-dup balls
    # legitimately merge with each other through shared vocabulary, so
    # report it without a threshold
    out["found_pairs"] = len(found)
    out["precision_vs_planted"] = round(
        len(found & truth_all) / len(found), 6
    ) if found else 1.0

    if with_oracle:
        pairs = res.pairs.select("src", "dst", "dist").toPandas()
        from umi_collapse_rs_spark.operators.exact import exact_collapse, with_norm

        reps, _ = exact_collapse(with_norm(pages))
        nodes = {r["url"]: r["freq"] for r in reps.select("url", "freq").collect()}
        want = oracle.greedy_directional(nodes, list(zip(pairs.src, pairs.dst, pairs.dist)))
        got = {u: c for u, c in assign.items() if u in nodes}
        mismatches = sum(1 for k, v in want.items() if got.get(k) != v)
        out["oracle_assignment_mismatches"] = mismatches

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
