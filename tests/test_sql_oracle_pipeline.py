"""Cross-engine parity of the sql-fingerprint pipeline against the
DuckDB oracle generators (umi_collapse_rs_spark/oracles.py) on a corpus
with HEAVY planted duplicate structure.

The driver's correctness gate runs these oracles on the sf0.01
documents table, which is duplicate-sparse; this test feeds the same
query+oracle pairs the fixture corpus (exact-dup groups, near-dup
balls, template families, frequency-skew clusters, edge rows — see
FIXTURES.md) so the recursive-CTE clustering oracles and the
brute-force pair predicate are exercised on dense dup graphs.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry
from umi_collapse_rs_spark.fixtures import generate_pages


def _norm_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    if len(pdf) == 0:
        return "empty"
    rows = sorted(pdf.astype(str).apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def docs_dir(tmp_path_factory):
    """Fixture pages reshaped to the documents-table schema the driver
    queries read (doc_id, text, lang, source, n_chars)."""
    pdf, _ = generate_pages(500)
    docs = pd.DataFrame(
        {
            "doc_id": range(len(pdf)),
            "text": pdf["text"],
            "lang": pdf["lang"],
            "source": ["fixture"] * len(pdf),
            "n_chars": pdf["text"].str.len(),
        }
    )
    d = tmp_path_factory.mktemp("sqldocs")
    docs.to_parquet(d / "documents.parquet", index=False)
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["dedup_clusters", "dedup_clusters_cc", "dedup_clusters_adj", "near_dup_pairs"],
)
def test_sql_pipeline_matches_duckdb_oracle(spark, docs_dir, name):
    got = entry.queries()[name](spark, docs_dir).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{docs_dir}/documents.parquet'")
    want = con.sql(entry.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    assert _norm_hash(got) == _norm_hash(want)
    # non-vacuity: the fixture plants real duplicate structure
    if name.startswith("dedup_clusters"):
        assert (got["cluster_size"] > 1).any()
    else:
        assert len(got) > 50
