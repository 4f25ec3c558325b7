"""Unit tests for the relational operators: exact collapse, candidate
generation (banding completeness, skew capping), edge gating."""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pytest
from pyspark.sql import functions as F

from umi_collapse_rs_spark.functions import fingerprint_core as core
from umi_collapse_rs_spark.operators.candidates import (
    pairs_from_buckets,
    simhash_band_pairs,
)
from umi_collapse_rs_spark.operators.exact import exact_collapse, with_norm


def _ts(s):
    return datetime(2025, 1, 1, 0, 0, s, tzinfo=timezone.utc)


def test_exact_collapse_freq_and_representative(spark):
    rows = [
        ("u3", _ts(30), "Hello  World", "en"),
        ("u1", _ts(10), "hello world", "en"),   # earliest ts -> representative
        ("u2", _ts(10), "HELLO\tWORLD", "de"),  # same ts, 'u1' < 'u2'
        ("u4", _ts(5), "different", "en"),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string, lang string")
    reps, members = exact_collapse(with_norm(pages))
    got = {r["url"]: r["freq"] for r in reps.collect()}
    assert got == {"u1": 3, "u4": 1}
    assert members.count() == 4


def test_normalization_collapses_whitespace_case(spark):
    pages = spark.createDataFrame(
        [("u1", _ts(1), "  A  b\t C ", "en")],
        "url string, warc_ts timestamp, text string, lang string",
    )
    row = with_norm(pages).select("text_norm", "text").collect()[0]
    assert row["text_norm"] == "a b c"
    assert row["text"] == "  A  b\t C "  # raw text untouched (invariant)
    assert row["text_norm"] == core.normalize_text_py(row["text"])


def test_simhash_banding_finds_all_close_pairs(spark):
    """Completeness: every pair with Hamming <= k shares a band piece
    (pigeonhole) — compare against a brute-force scan."""
    rng = np.random.default_rng(3)
    base = rng.integers(0, 2**64, dtype=np.uint64)
    vals = [base]
    for _ in range(30):
        v = base
        for b in rng.choice(64, size=int(rng.integers(1, 7)), replace=False):
            v ^= np.uint64(1) << np.uint64(b)
        vals.append(v)
    fp = spark.createDataFrame(
        [(f"d{i:02d}", int(np.int64(v)), 1) for i, v in enumerate(vals)],
        "url string, simhash long, freq long",
    )
    got = {
        (r["src"], r["dst"])
        for r in simhash_band_pairs(fp, hamming_k=3, bands=4, cap=64, chain_width=4).collect()
    }
    rows = fp.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            if core.hamming64(a["simhash"], b["simhash"]) <= 3:
                u, v = sorted((a["url"], b["url"]))
                want.add((u, v))
    assert got == want


def test_pairs_from_buckets_small_bucket_all_pairs(spark):
    df = spark.createDataFrame(
        [(1, f"x{i}", i) for i in range(4)], "b int, id string, o long"
    )
    got = {(r["src"], r["dst"]) for r in pairs_from_buckets(df, ["b"], "id", "o", cap=10, chain_width=2).collect()}
    assert len(got) == 6  # C(4,2)


def test_pairs_from_buckets_hot_bucket_chained(spark):
    n = 40
    df = spark.createDataFrame(
        [(1, f"x{i:02d}", i) for i in range(n)], "b int, id string, o long"
    )
    pairs = pairs_from_buckets(df, ["b"], "id", "o", cap=10, chain_width=3)
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    # chained: bounded pair count, but connectivity preserved
    assert len(got) == 3 * n - 6  # sum over j=1..3 of (n - j)
    # adjacency in sort order present -> the bucket stays connected
    for i in range(n - 1):
        assert (f"x{i:02d}", f"x{i+1:02d}") in got


def test_pairs_from_buckets_large_cap_self_join_path(spark):
    """cap above the lead fan-out bound takes the bucket self-join
    branch; small buckets get full all-pairs, hot buckets still chain."""
    rows = [(1, f"s{i}", i) for i in range(10)]          # bsz 10 <= cap: all pairs
    rows += [(2, f"h{i:02d}", i) for i in range(60)]     # bsz 60 > cap: chained
    df = spark.createDataFrame(rows, "b int, id string, o long")
    pairs = pairs_from_buckets(df, ["b"], "id", "o", cap=50, chain_width=3, dedup=True)
    got = {(r["src"], r["dst"]) for r in pairs.collect()}
    small = {p for p in got if p[0].startswith("s")}
    hot = {p for p in got if p[0].startswith("h")}
    assert len(small) == 45  # C(10,2)
    assert len(hot) == 3 * 60 - 6
    for i in range(59):
        assert (f"h{i:02d}", f"h{i+1:02d}") in hot


def test_singleton_buckets_produce_no_pairs(spark):
    df = spark.createDataFrame([(i, f"x{i}", i) for i in range(5)], "b int, id string, o long")
    assert pairs_from_buckets(df, ["b"], "id", "o", 10, 2).count() == 0


def test_combined_band_pairs_equals_two_generator_form(spark, fixture_500):
    """The single-exchange kind-tagged expansion + union-stage Hamming
    gate must produce byte-identical pair evidence (src, dst, sources,
    dist) to simhash_band_pairs UNION minhash_lsh_pairs under BOTH cap
    regimes — the equivalence the pipeline's s4 rewrite rests on."""
    from umi_collapse_rs_spark.config import DedupConfig
    from umi_collapse_rs_spark.functions.udfs import make_combined_fingerprint_udf
    from umi_collapse_rs_spark.operators.candidates import (
        combined_band_pairs,
        minhash_lsh_pairs,
        simhash_band_pairs,
    )
    from umi_collapse_rs_spark.operators.edges import (
        candidate_pairs_with_dist,
        combined_candidates_with_dist,
    )

    cfg = DedupConfig()
    pages, _ = fixture_500
    reps, _ = exact_collapse(with_norm(pages))
    udf = make_combined_fingerprint_udf(
        cfg.shingle_k, cfg.minhash_perms, cfg.lsh_bands, cfg.hash_seed
    )
    fp = (
        reps.select("url", "freq", udf("text_norm").alias("_fp"))
        .select("url", "freq", "_fp.simhash", "_fp.mh_bands", "_fp.mh_sig")
        .localCheckpoint()
    )
    for cap in (8, 10_000):
        old = candidate_pairs_with_dist(
            [
                simhash_band_pairs(fp, cfg.hamming_k, cfg.simhash_bands, cap, cfg.chain_width),
                minhash_lsh_pairs(fp, cap, cfg.chain_width),
            ],
            fp,
        )
        new = combined_candidates_with_dist(
            [combined_band_pairs(fp, cfg.simhash_bands, cap, cfg.chain_width)],
            fp,
            cfg.hamming_k,
        )
        cols = ["src", "dst", "sources", "dist"]
        o = old.select(*cols).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
        n = new.select(*cols).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
        o["sources"] = o["sources"].map(tuple)
        n["sources"] = n["sources"].map(tuple)
        assert o.equals(n), f"pair evidence diverged at cap={cap}"
