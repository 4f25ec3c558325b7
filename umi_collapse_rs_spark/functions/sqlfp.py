"""SQL-reproducible fingerprints — the oracle-checkable twin of the
numpy fingerprint path (functions/fingerprint_core.py).

Why two fingerprint modes exist: the production path hashes shingles
with ``pd.util.hash_array`` (C-vectorized, fastest), which no SQL
engine can recompute — so the driver's DuckDB correctness gate could
only rows-check the pipeline queries (VERDICT r1 "no_oracle" gap).
This module computes the SAME fingerprint *families* (64-bit document
SimHash + banded min-hash bucket keys) from sha256 shingle hashes,
expressible in BOTH engines:

- Spark side: pure Column expressions (``F.sha2`` + ``F.conv`` +
  array lambdas) — JVM codegen, zero Python, zero shuffles; and
- DuckDB side: generated SQL built HERE, from the same constants, so
  the two can never drift.

The 60-bit hash primitive is ``int(sha256(s)[:15 hex], 16)``:
Spark ``conv(substring(sha2(s,256),1,15),16,10)`` ==
DuckDB ``('0x' || substr(sha256(s),1,15))::BIGINT``.  15 hex chars
keep every value < 2^60, safely inside signed int64 for both engines
(Spark 4 runs ANSI mode; a 16-char parse can overflow LongType).

Fingerprint definitions (shared by both engines):

- tokens    = text_norm split on single spaces (text_norm is already
              lower/collapse/trim normalized — see normalize.py)
- shingles  = distinct k-token windows joined by ' '; documents with
              fewer than k tokens contribute text_norm itself (mirrors
              fingerprint_core.batch_shingle_hashes short-doc rule)
- simhash   = 60-bit majority vote over shingle hashes: bit j is set
              iff >= half the shingles have bit j set (ties -> 1,
              matching batch_simhash)
- band b    = min over shingles of hash60(f"{b}:" + shingle) — B
              independent 1-row MinHash bands; collision probability
              per band equals the Jaccard similarity, and the B values
              double as the signature for the verify step (sig_sim =
              fraction of equal positions)

Reference analog: the string->fingerprint encoder
(``/root/reference/src/utils/mod.rs:63-83``) and its fixed-multiplier
stable hash (``utils/mod.rs:17-21``) — fixed-seed hashing so every
run and every oracle reproduces identical fingerprints.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SIMHASH_BITS = 60

_I64_MIN = -9223372036854775808


# ---------------------------------------------------------------------------
# Spark column side
# ---------------------------------------------------------------------------


def hash60_col(c: Column) -> Column:
    """60-bit stable hash of a string column (first 15 hex chars of
    sha256), identical to the DuckDB expression from :func:`hash60_sql`."""
    return F.conv(F.substring(F.sha2(c, 256), 1, 15), 16, 10).cast("long")


def hash64_col(c: Column) -> Column:
    """Full signed-64-bit stable hash of a string column, assembled from
    two 32-bit sha256 halves without ANSI overflow (used for cluster
    ids).  Identical to :func:`hash64_sql`."""
    sha = F.sha2(c, 256)
    hi = F.conv(F.substring(sha, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(sha, 9, 8), 16, 10).cast("long")
    return (
        hi.bitwiseAND(F.lit(0x7FFFFFFF)) * F.lit(4294967296)
        + lo
        + F.shiftrightunsigned(hi, 31) * F.lit(_I64_MIN)
    )


def shingles_col(text_col: Column, k: int) -> Column:
    """Distinct k-token shingle strings of normalized text."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, k), " "),
    )
    return F.array_distinct(F.when(n < k, F.array(text_col)).otherwise(windows))


def simhash_col(shingle_hashes: Column) -> Column:
    """Majority-vote SimHash over an array<long> of 60-bit hashes."""
    nsh = F.size(shingle_hashes)
    terms = []
    for j in range(SIMHASH_BITS):
        cnt = F.size(
            F.filter(
                shingle_hashes,
                lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == F.lit(1),
            )
        )
        terms.append(F.when(cnt * 2 >= nsh, F.lit(1 << j)).otherwise(F.lit(0)))
    return reduce(add, terms).cast("long")


def band_mins_col(shingles: Column, n_bands: int) -> Column:
    """array<long> of per-band salted min-hashes (B 1-row MinHash bands)."""
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s: hash60_col(F.concat(F.lit(f"{b}:"), s)))
            )
            for b in range(n_bands)
        ]
    )


def with_sql_fingerprints(
    df: DataFrame, text_col: str, k: int, n_bands: int
) -> DataFrame:
    """Add (simhash, mh_bands, mh_sig, win_hashes) fingerprint columns —
    the same schema the numpy UDF path produces — as pure Column
    expressions.  ``win_hashes`` is empty (the substring pass is a
    numpy-mode feature; SQL mode exists for the oracle gate)."""
    shingled = df.withColumn("_shingles", shingles_col(F.col(text_col), k)).withColumn(
        "_shh", F.transform(F.col("_shingles"), hash60_col)
    )
    return (
        shingled.withColumn("simhash", simhash_col(F.col("_shh")))
        .withColumn("mh_bands", band_mins_col(F.col("_shingles"), n_bands))
        .withColumn("mh_sig", F.col("mh_bands"))
        .withColumn("win_hashes", F.array().cast("array<long>"))
        .drop("_shingles", "_shh")
    )


# ---------------------------------------------------------------------------
# DuckDB SQL side (generated from the same constants)
# ---------------------------------------------------------------------------


def hash60_sql(expr: str) -> str:
    return f"('0x' || substr(sha256({expr}), 1, 15))::BIGINT"


def hash64_sql(expr: str) -> str:
    hi = f"('0x' || substr(sha256({expr}), 1, 8))::BIGINT"
    lo = f"('0x' || substr(sha256({expr}), 9, 8))::BIGINT"
    return (
        f"(({hi} & 2147483647) * 4294967296 + {lo}"
        f" + CASE WHEN {hi} >= 2147483648 THEN {_I64_MIN} ELSE 0 END)"
    )


def fingerprint_ctes(k: int, n_bands: int) -> str:
    """CTE block computing ``fp(url, freq, simhash)`` and
    ``bands(url, b, bv)`` from a CTE ``fpdocs(url, freq, text_norm)``
    that the caller must define upstream.  Mirrors
    :func:`with_sql_fingerprints` value-for-value."""
    shingle_exprs = " || ' ' || ".join(f"toks[i + {j}]" for j in range(k))
    bit_sums = ",\n               ".join(
        f"sum((h >> {j}) & 1) AS b{j}" for j in range(SIMHASH_BITS)
    )
    assemble = "\n                 + ".join(
        f"CASE WHEN 2 * b{j} >= n THEN {1 << j} ELSE 0 END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
        shing AS (
            SELECT url,
                   CASE WHEN len(toks) < {k} THEN [text_norm]
                        ELSE list_transform(range(1, len(toks) - {k} + 2),
                                            i -> {shingle_exprs})
                   END AS shs
            FROM (SELECT url, text_norm, string_split(text_norm, ' ') AS toks
                  FROM fpdocs)
        ),
        dsh AS (SELECT DISTINCT url, sh
                FROM (SELECT url, unnest(shs) AS sh FROM shing)),
        shh AS (SELECT url, sh, {hash60_sql('sh')} AS h FROM dsh),
        simagg AS (
            SELECT url, count(*) AS n,
               {bit_sums}
            FROM shh GROUP BY url
        ),
        fp AS (
            SELECT s.url, d.freq,
                   ({assemble})::BIGINT AS simhash
            FROM simagg s JOIN fpdocs d USING (url)
        ),
        bands AS (
            SELECT url, b,
                   min({hash60_sql("b::VARCHAR || ':' || sh")}) AS bv
            FROM shh, range({n_bands}) r(b)
            GROUP BY url, b
        )"""
