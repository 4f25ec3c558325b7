"""Prefix-filtered Jaccard join: exactness + hot-token candidate bound
(VERDICT r1 "what's wrong" #1 — the naive all-token self-join expands
a document-frequency-f token into f^2 join rows)."""

from __future__ import annotations

import itertools

from umi_collapse_rs_spark.operators.jaccard import (
    prefix_candidates,
    token_jaccard_pairs,
    tokenize_distinct,
)


def _corpus(spark):
    # 200 docs all sharing one ultra-hot token, otherwise disjoint —
    # the planted mega-bucket — plus one genuine near-dup pair.
    rows = [(i, "hot " + " ".join(f"u{i}_{j}" for j in range(9))) for i in range(200)]
    rows += [(900, "p q r s t u v w"), (901, "p q r s t u v x")]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_hot_token_never_expands_quadratically(spark):
    rows, docs = _corpus(spark)
    tok = tokenize_distinct(docs, "doc_id", "text", [])
    n_cand = prefix_candidates(tok, 0.5, "doc_id", []).count()
    # naive token join: the 'hot' bucket alone yields C(200,2) = 19900
    # candidate rows; the prefix join must exclude it entirely (df=200
    # puts 'hot' after every doc's rarest-6 prefix cutoff)
    assert n_cand <= 10


def test_prefix_join_is_exact(spark):
    rows, docs = _corpus(spark)
    got = {
        (r.src, r.dst)
        for r in token_jaccard_pairs(docs, 0.5, "doc_id", "text", []).collect()
    }
    texts = {i: set(t.split()) for i, t in rows}
    want = {
        (a, b)
        for a, b in itertools.combinations(sorted(texts), 2)
        if len(texts[a] & texts[b]) / len(texts[a] | texts[b]) >= 0.5
    }
    assert got == want
    assert (900, 901) in got
