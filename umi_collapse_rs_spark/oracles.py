"""DuckDB oracle-SQL generators for the sql-fingerprint pipeline
queries (driver contract, ``__spark_entry__.oracle_sql``).

Each generator emits ONE self-contained SQL string that recomputes, in
DuckDB, exactly what the Spark pipeline computes in sql-fingerprint
mode over the ``documents`` table reshaped to pages:

  normalize -> exact collapse -> sha-based fingerprints (sqlfp) ->
  BRUTE-FORCE candidate pairs (the O(n^2) ground truth the banded
  self-joins must equal at uncapped settings) -> verify -> gate ->
  clustering (dir/adj/cc) -> clusters table.

Clustering oracles:

- ``dir``/``cc``: a recursive-CTE transitive closure.  Directional
  greedy equals minimum-priority-label over gated-reachability
  (operators/cluster.py docstring, SURVEY §2.1 D1), so the oracle is
  literally "root(n) = min-key node that gated-reaches n".
- ``adj``: the one-hop greedy (LFMIS-style) has no closed form; the
  oracle replays the same frontier-peeling rounds as
  operators/cluster.adjacency_assign inside a recursive CTE that
  carries the full decided-set forward each iteration (UNION ALL +
  iteration counter; DuckDB's working table holds only the previous
  iteration's rows, so each round re-emits the whole state).

The brute-force pair predicate mirrors operators/edges.verify_pairs:
a pair survives iff Hamming(simhash) <= k (simhash evidence — sig_sim
reported NULL) or >= ceil(threshold * B) of its B band values match
(LSH evidence verified by signature similarity).
"""

from __future__ import annotations

from umi_collapse_rs_spark.functions.sqlfp import fingerprint_ctes, hash64_sql

# Driver-query pipeline config (must stay in lockstep with
# __spark_entry__._SQL_PIPELINE_CFG).
SQL_K = 3
SQL_BANDS = 16
SQL_HAMMING_K = 3
SQL_SIG_THRESHOLD = 0.5
SQL_MIN_EQ = 8  # ceil(SQL_SIG_THRESHOLD * SQL_BANDS)

# documents -> pages reshape constants (mirrors __spark_entry__._docs_as_pages)
PAGES_SQL = """
        pages AS (
            SELECT printf('doc://%07d', doc_id) AS url,
                   to_timestamp(1735689600 + doc_id * 17) AS warc_ts,
                   text, lang
            FROM documents
        ),
        norm AS (
            SELECT url, warc_ts, lang,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
            FROM pages
        )"""

# exact collapse: representative = min (warc_ts, url) member of each
# normalized-text group (operators/exact.exact_collapse)
COLLAPSE_SQL = """
        grp AS (
            SELECT sha256(text_norm) AS text_sha,
                   any_value(text_norm) AS text_norm,
                   min(printf('%020d|%s', epoch(warc_ts)::BIGINT, url)) AS repkey,
                   count(*) AS freq
            FROM norm GROUP BY 1
        ),
        reps AS (
            SELECT text_sha, text_norm,
                   split_part(repkey, '|', 2) AS url, freq
            FROM grp
        ),
        fpdocs AS (SELECT url, freq, text_norm FROM reps)"""


def _verified_pairs_sql() -> str:
    """Brute-force candidate + verify CTEs -> ``verified(src, dst,
    dist, f_src, f_dst, sig_sim)``."""
    return f"""
        pairs0 AS (
            SELECT a.url AS src, b.url AS dst,
                   bit_count(xor(a.simhash, b.simhash)) AS dist,
                   a.freq AS f_src, b.freq AS f_dst
            FROM fp a JOIN fp b ON a.url < b.url
        ),
        bm AS (
            SELECT a.url AS src, b.url AS dst, count(*) AS n_eq
            FROM bands a JOIN bands b
              ON a.b = b.b AND a.bv = b.bv AND a.url < b.url
            GROUP BY 1, 2
        ),
        verified AS (
            SELECT p.src, p.dst, p.dist, p.f_src, p.f_dst,
                   CASE WHEN p.dist <= {SQL_HAMMING_K} THEN NULL
                        ELSE bm.n_eq / {SQL_BANDS}.0 END AS sig_sim
            FROM pairs0 p LEFT JOIN bm USING (src, dst)
            WHERE p.dist <= {SQL_HAMMING_K} OR coalesce(bm.n_eq, 0) >= {SQL_MIN_EQ}
        )"""


def _prefix() -> str:
    return (
        PAGES_SQL
        + ","
        + COLLAPSE_SQL
        + ","
        + fingerprint_ctes(SQL_K, SQL_BANDS)
        + ","
        + _verified_pairs_sql()
    )


# priority key: freq desc, then url asc — cluster.py's struct(-freq, url)
_KEY = "printf('%010d|%s', 2000000000 - f.freq, f.url)"

_NODES_KEYS_SQL = f"""
        pnodes AS (
            SELECT DISTINCT url FROM (
                SELECT src AS url FROM verified
                UNION ALL SELECT dst FROM verified)
        ),
        keys AS (
            SELECT f.url, {_KEY} AS k
            FROM fp f JOIN pnodes USING (url)
        )"""


def _clusters_select_sql(roots_cte: str) -> str:
    """Final clusters-table assembly from a ``roots(url, root_id)`` CTE
    (mirrors operators/canonical.build_clusters_table)."""
    return f"""
        {roots_cte},
        rep_assign AS (
            SELECT r.text_sha, r.freq,
                   coalesce(ro.root_id, r.url) AS canonical_url
            FROM reps r LEFT JOIN roots ro ON ro.url = r.url
        ),
        csz AS (
            SELECT canonical_url, sum(freq)::BIGINT AS cluster_size
            FROM rep_assign GROUP BY 1
        ),
        members AS (SELECT url, sha256(text_norm) AS text_sha FROM norm)
        SELECT m.url,
               {hash64_sql('ra.canonical_url')} AS cluster_id,
               ra.canonical_url,
               c.cluster_size,
               ra.freq AS exact_dup_count
        FROM members m
        JOIN rep_assign ra USING (text_sha)
        JOIN csz c USING (canonical_url)"""


def dedup_clusters_oracle_sql(algo: str) -> str:
    if algo == "dir":
        edges = f"""
        gated AS (
            SELECT src, dst FROM verified
            WHERE dist = 0 OR f_dst <= floor(0.5 * (f_src + 1))
            UNION ALL
            SELECT dst AS src, src AS dst FROM verified
            WHERE dist = 0 OR f_src <= floor(0.5 * (f_dst + 1))
        )"""
    elif algo == "cc":
        edges = """
        gated AS (
            SELECT src, dst FROM verified
            UNION ALL
            SELECT dst AS src, src AS dst FROM verified
        )"""
    elif algo == "adj":
        return _adj_oracle_sql()
    else:  # pragma: no cover
        raise ValueError(algo)

    closure = f"""
        reach AS (
            SELECT url AS n, url AS anc FROM keys
            UNION
            SELECT r.n, e.src AS anc
            FROM reach r JOIN gated e ON e.dst = r.anc
        )"""
    roots = """roots AS (
            SELECT r.n AS url, min_by(r.anc, k2.k) AS root_id
            FROM reach r JOIN keys k2 ON k2.url = r.anc
            GROUP BY r.n
        )"""
    return (
        "WITH RECURSIVE "
        + _prefix()
        + ","
        + edges
        + ","
        + _NODES_KEYS_SQL
        + ","
        + closure
        + ","
        + _clusters_select_sql(roots)
    )


def canonical_pages_oracle_sql() -> str:
    """Canonical-pages output (plans/pipeline.py stage 7 -> 9 join):
    exactly one row per cluster — the canonical url, its sha-derived
    cluster id, the cluster size, and sha256 of the text RE-READ from
    the source pages (pinning the byte-identical per-url invariant
    through the output join).  Shares the full dir-closure machinery
    with dedup_clusters_oracle_sql; only the final assembly differs."""
    edges = """
        gated AS (
            SELECT src, dst FROM verified
            WHERE dist = 0 OR f_dst <= floor(0.5 * (f_src + 1))
            UNION ALL
            SELECT dst AS src, src AS dst FROM verified
            WHERE dist = 0 OR f_src <= floor(0.5 * (f_dst + 1))
        )"""
    closure = """
        reach AS (
            SELECT url AS n, url AS anc FROM keys
            UNION
            SELECT r.n, e.src AS anc
            FROM reach r JOIN gated e ON e.dst = r.anc
        ),
        roots AS (
            SELECT r.n AS url, min_by(r.anc, k2.k) AS root_id
            FROM reach r JOIN keys k2 ON k2.url = r.anc
            GROUP BY r.n
        )"""
    final = f"""
        rep_assign AS (
            SELECT r.text_sha, r.freq,
                   coalesce(ro.root_id, r.url) AS canonical_url
            FROM reps r LEFT JOIN roots ro ON ro.url = r.url
        ),
        csz AS (
            SELECT canonical_url, sum(freq)::BIGINT AS cluster_size
            FROM rep_assign GROUP BY 1
        )
        SELECT c.canonical_url AS url,
               {hash64_sql('c.canonical_url')} AS cluster_id,
               c.cluster_size,
               sha256(p.text) AS text_fp
        FROM csz c JOIN pages p ON p.url = c.canonical_url"""
    return (
        "WITH RECURSIVE "
        + _prefix()
        + ","
        + edges
        + ","
        + _NODES_KEYS_SQL
        + ","
        + closure
        + ","
        + final
    )


def _adj_oracle_sql() -> str:
    """One-hop greedy adjacency via frontier peeling in a recursive CTE.

    Round invariant (same as operators/cluster.adjacency_assign): a
    node resolves when no better-priority *undecided* neighbor remains;
    it is absorbed by its min-key adjacent decided ROOT with better
    priority, else becomes a root.  Each iteration re-emits the full
    decided set (working-table semantics) tagged with an iteration
    counter; the final state is the max-iteration snapshot.
    """
    peel = """
        sym AS (
            SELECT src, dst FROM verified
            UNION
            SELECT dst AS src, src AS dst FROM verified
        ),
        adjassign AS (
            SELECT 0 AS it, k.url, k.url AS root_id, k.k
            FROM keys k
            WHERE NOT EXISTS (
                SELECT 1 FROM sym s JOIN keys k2 ON k2.url = s.src
                WHERE s.dst = k.url AND k2.k < k.k)
            UNION ALL
            SELECT (SELECT max(p.it) FROM adjassign p) + 1 AS it,
                   u.url, u.root_id, u.k
            FROM (
                SELECT url, root_id, k FROM adjassign
                UNION ALL
                SELECT v.url,
                       coalesce(
                           (SELECT min_by(d.url, d.k)
                            FROM adjassign d JOIN sym s ON s.src = d.url
                            WHERE s.dst = v.url AND d.k < v.k
                              AND d.root_id = d.url),
                           v.url) AS root_id,
                       v.k
                FROM keys v
                WHERE v.url NOT IN (SELECT url FROM adjassign)
                  AND NOT EXISTS (
                      SELECT 1 FROM sym s
                      WHERE s.dst = v.url
                        AND s.src NOT IN (SELECT url FROM adjassign)
                        AND (SELECT k2.k FROM keys k2 WHERE k2.url = s.src) < v.k)
            ) u
            WHERE EXISTS (
                SELECT 1 FROM keys kk
                WHERE kk.url NOT IN (SELECT url FROM adjassign))
        )"""
    roots = """roots AS (
            SELECT url, root_id FROM adjassign
            WHERE it = (SELECT max(it) FROM adjassign)
        )"""
    return (
        "WITH RECURSIVE "
        + _prefix()
        + ","
        + _NODES_KEYS_SQL
        + ","
        + peel
        + ","
        + _clusters_select_sql(roots)
    )


def substring_overlap_oracle_sql(window: int = 16, stride: int = 4, min_shared: int = 2) -> str:
    """Content-defined window-overlap pairs over raw documents
    (__spark_entry__.q_substring_overlap_pairs): anchor = token position
    whose hash60 % stride == 0; window fingerprint = hash60 of the
    joined window tokens; pair emitted when >= min_shared distinct
    window fingerprints are shared."""
    from umi_collapse_rs_spark.functions.sqlfp import hash60_sql

    h_tok = hash60_sql("toks[i]")
    h_win = hash60_sql(f"array_to_string(toks[i:i+{window}-1], ' ')")
    return f"""
        WITH t AS (
            SELECT doc_id,
                   string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ') AS toks
            FROM documents
        ),
        pos AS (
            SELECT doc_id, toks, unnest(range(1, len(toks) - {window} + 2)) AS i
            FROM t WHERE len(toks) >= {window}
        ),
        anch AS (SELECT doc_id, toks, i FROM pos WHERE ({h_tok} % {stride}) = 0),
        w AS (SELECT DISTINCT doc_id, {h_win} AS wh FROM anch)
        SELECT a.doc_id AS src, b.doc_id AS dst
        FROM w a JOIN w b ON a.wh = b.wh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        HAVING count(*) >= {min_shared}"""


def incremental_assign_oracle_sql() -> str:
    """Incremental dedup (plans/incremental.incremental_assign):
    documents split 80/20 by ``doc_id % 5 = 4``; the old 80% runs the
    full dir pipeline to build state (sha index + canonical freqs);
    the NEW batch is the 20% plus a deterministic *recrawl* — every
    ``doc_id % 25 = 0`` page re-fetched byte-identical under a
    ``recrawl://`` url and a later warc_ts (the documents table has no
    exact duplicates, so without the recrawl rows the 'exact' path
    would be vacuously green).  Every new page is assigned via
    'exact' (sha already in the corpus -> its twin's cluster),
    'near' (banded probe vs canonicals, verify + directional gate,
    highest-priority absorbing canonical wins), or
    'new' (residual within-batch dir clustering).

    Fingerprints are computed ONCE over the union of old and new reps
    (per-text deterministic, so computing jointly == per-half); the
    old-half closure and the residual closure are two recursive CTEs.

    Every shared chain CTE carries an ``AS MATERIALIZED`` hint: DuckDB
    inlines single-reference CTEs, so without the hints each stage of
    this (deep) chain re-computes its whole upstream per consumer —
    measured 10 s -> 0.3 s for the residual stage at 500 docs, and the
    final recursion never finished un-hinted.
    """
    pages_split = """
        pages AS (
            SELECT printf('doc://%07d', doc_id) AS url,
                   to_timestamp(1735689600 + doc_id * 17) AS warc_ts,
                   text, lang, (doc_id % 5 = 4) AS is_new
            FROM documents
            UNION ALL
            SELECT printf('recrawl://%07d', doc_id),
                   to_timestamp(1735689600 + doc_id * 17 + 1000000),
                   text, lang, TRUE
            FROM documents WHERE doc_id % 25 = 0
        ),
        norm AS (
            SELECT url, warc_ts, lang, is_new,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
            FROM pages
        )"""
    collapse = """
        grp_o AS (
            SELECT sha256(text_norm) AS text_sha, any_value(text_norm) AS text_norm,
                   min(printf('%020d|%s', epoch(warc_ts)::BIGINT, url)) AS repkey,
                   count(*) AS freq
            FROM norm WHERE NOT is_new GROUP BY 1
        ),
        reps_o AS (SELECT text_sha, text_norm, split_part(repkey, '|', 2) AS url, freq FROM grp_o),
        grp_n AS (
            SELECT sha256(text_norm) AS text_sha, any_value(text_norm) AS text_norm,
                   min(printf('%020d|%s', epoch(warc_ts)::BIGINT, url)) AS repkey,
                   count(*) AS freq
            FROM norm WHERE is_new GROUP BY 1
        ),
        reps_n AS (SELECT text_sha, text_norm, split_part(repkey, '|', 2) AS url, freq FROM grp_n),
        fpdocs AS (SELECT url, freq, text_norm FROM reps_o
                   UNION ALL SELECT url, freq, text_norm FROM reps_n)"""
    k, me = SQL_HAMMING_K, SQL_MIN_EQ
    old_pipeline = f"""
        pairs_o AS (
            SELECT a.url AS src, b.url AS dst,
                   bit_count(xor(fa.simhash, fb.simhash)) AS dist,
                   a.freq AS f_src, b.freq AS f_dst
            FROM reps_o a JOIN reps_o b ON a.url < b.url
            JOIN fp fa ON fa.url = a.url JOIN fp fb ON fb.url = b.url
        ),
        bm_o AS (
            SELECT a.url AS src, b.url AS dst, count(*) AS n_eq
            FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.url < b.url
            WHERE a.url IN (SELECT url FROM reps_o) AND b.url IN (SELECT url FROM reps_o)
            GROUP BY 1, 2
        ),
        verified_o AS (
            SELECT p.src, p.dst, p.dist, p.f_src, p.f_dst
            FROM pairs_o p LEFT JOIN bm_o USING (src, dst)
            WHERE p.dist <= {k} OR coalesce(n_eq, 0) >= {me}
        ),
        gated_o AS (
            SELECT src, dst FROM verified_o
            WHERE dist = 0 OR f_dst <= floor(0.5 * (f_src + 1))
            UNION ALL
            SELECT dst AS src, src AS dst FROM verified_o
            WHERE dist = 0 OR f_src <= floor(0.5 * (f_dst + 1))
        ),
        pnodes_o AS (
            SELECT DISTINCT url FROM (
                SELECT src AS url FROM verified_o
                UNION ALL SELECT dst FROM verified_o)
        ),
        keys_o AS (
            SELECT f.url, {_KEY} AS k FROM fp f JOIN pnodes_o USING (url)
        ),
        reach_o AS (
            SELECT url AS n, url AS anc FROM keys_o
            UNION
            SELECT r.n, e.src AS anc
            FROM reach_o r JOIN gated_o e ON e.dst = r.anc
        ),
        roots_o AS (
            SELECT r.n AS url, min_by(r.anc, k2.k) AS root_id
            FROM reach_o r JOIN keys_o k2 ON k2.url = r.anc
            GROUP BY r.n
        ),
        assign_o AS (
            SELECT r.url, r.text_sha, r.freq,
                   coalesce(ro.root_id, r.url) AS canonical_url
            FROM reps_o r LEFT JOIN roots_o ro ON ro.url = r.url
        ),
        state AS (
            SELECT canonical_url AS url, sum(freq)::BIGINT AS freq
            FROM assign_o GROUP BY 1
        )"""
    incremental = f"""
        exact_m AS (
            SELECT n.url AS rep_url, a.canonical_url
            FROM reps_n n JOIN assign_o a ON a.text_sha = n.text_sha
        ),
        restn AS (
            SELECT n.url, n.freq FROM reps_n n
            WHERE n.url NOT IN (SELECT rep_url FROM exact_m)
        ),
        statefp AS (
            SELECT s.url, s.freq, f.simhash FROM state s JOIN fp f USING (url)
        ),
        xp AS (
            SELECT r.url AS n_url, sc.url AS s_url,
                   bit_count(xor(fn.simhash, sc.simhash)) AS dist,
                   r.freq AS f_n, sc.freq AS f_s
            FROM restn r JOIN fp fn ON fn.url = r.url
            CROSS JOIN statefp sc
        ),
        xbm AS (
            SELECT a.url AS n_url, b.url AS s_url, count(*) AS n_eq
            FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
            WHERE a.url IN (SELECT url FROM restn) AND b.url IN (SELECT url FROM state)
            GROUP BY 1, 2
        ),
        xgate AS (
            SELECT x.* FROM xp x LEFT JOIN xbm USING (n_url, s_url)
            WHERE (x.dist <= {k} OR coalesce(n_eq, 0) >= {me})
              AND (x.dist = 0 OR x.f_n <= floor(0.5 * (x.f_s + 1)))
        ),
        near_m AS (
            SELECT n_url AS rep_url,
                   min_by(s_url, printf('%010d|%s', 2000000000 - f_s, s_url)) AS canonical_url
            FROM xgate GROUP BY 1
        ),
        resid AS (
            SELECT r.url, r.freq FROM restn r
            WHERE r.url NOT IN (SELECT rep_url FROM near_m)
        ),
        pairs_r AS (
            SELECT a.url AS src, b.url AS dst,
                   bit_count(xor(fa.simhash, fb.simhash)) AS dist,
                   a.freq AS f_src, b.freq AS f_dst
            FROM resid a JOIN resid b ON a.url < b.url
            JOIN fp fa ON fa.url = a.url JOIN fp fb ON fb.url = b.url
        ),
        bm_r AS (
            SELECT a.url AS src, b.url AS dst, count(*) AS n_eq
            FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv AND a.url < b.url
            WHERE a.url IN (SELECT url FROM resid) AND b.url IN (SELECT url FROM resid)
            GROUP BY 1, 2
        ),
        verified_r AS (
            SELECT p.src, p.dst, p.dist, p.f_src, p.f_dst
            FROM pairs_r p LEFT JOIN bm_r USING (src, dst)
            WHERE p.dist <= {k} OR coalesce(n_eq, 0) >= {me}
        ),
        gated_r AS (
            SELECT src, dst FROM verified_r
            WHERE dist = 0 OR f_dst <= floor(0.5 * (f_src + 1))
            UNION ALL
            SELECT dst AS src, src AS dst FROM verified_r
            WHERE dist = 0 OR f_src <= floor(0.5 * (f_dst + 1))
        ),
        pnodes_r AS (
            SELECT DISTINCT url FROM (
                SELECT src AS url FROM verified_r
                UNION ALL SELECT dst FROM verified_r)
        ),
        keys_r AS (
            SELECT f.url, {_KEY} AS k FROM fp f JOIN pnodes_r USING (url)
        ),
        reach_r AS (
            SELECT url AS n, url AS anc FROM keys_r
            UNION
            SELECT r.n, e.src AS anc
            FROM reach_r r JOIN gated_r e ON e.dst = r.anc
        ),
        roots_r AS (
            SELECT r.n AS url, min_by(r.anc, k2.k) AS root_id
            FROM reach_r r JOIN keys_r k2 ON k2.url = r.anc
            GROUP BY r.n
        ),
        new_m AS (
            SELECT rd.url AS rep_url, coalesce(ro.root_id, rd.url) AS canonical_url
            FROM resid rd LEFT JOIN roots_r ro ON ro.url = rd.url
        ),
        rep_assign AS (
            SELECT rep_url, canonical_url, 'exact' AS via FROM exact_m
            UNION ALL SELECT rep_url, canonical_url, 'near' FROM near_m
            UNION ALL SELECT rep_url, canonical_url, 'new' FROM new_m
        ),
        membs AS (SELECT url, sha256(text_norm) AS text_sha FROM norm WHERE is_new)
        SELECT m.url, ra.canonical_url, ra.via
        FROM membs m
        JOIN reps_n rn USING (text_sha)
        JOIN rep_assign ra ON ra.rep_url = rn.url"""
    sql = (
        "WITH RECURSIVE "
        + pages_split
        + ","
        + collapse
        + ","
        + fingerprint_ctes(SQL_K, SQL_BANDS)
        + ","
        + old_pipeline
        + ","
        + incremental
    )
    for cte in (
        "norm", "reps_o", "reps_n", "fpdocs", "shh", "fp", "bands",
        "verified_o", "gated_o", "keys_o", "assign_o", "state",
        "restn", "statefp", "near_m", "resid",
        "verified_r", "gated_r", "keys_r",
    ):
        sql = sql.replace(f"{cte} AS (", f"{cte} AS MATERIALIZED (", 1)
    return sql


def merge_rule_oracle_sql(merge: str) -> str:
    """Exact-collapse representative election under a merge rule, over
    the 2-token-prefix group key (__spark_entry__._merge_rule_query).
    Smallest key wins — mirrors operators/exact.merge_order_key."""
    keys = {
        "earliest": "printf('%020d|%s', epoch(warc_ts)::BIGINT, url)",
        "quality": "printf('%010d|%020d|%s', 1000000000 - length(text), epoch(warc_ts)::BIGINT, url)",
        "any": "url",
    }
    key = keys[merge]
    return (
        "WITH "
        + PAGES_SQL
        + f""",
        b AS (
            SELECT url, warc_ts, text,
                   array_to_string(
                       (string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '))[1:2],
                       ' ') AS tn
            FROM pages
        )
        SELECT sha256(tn) AS text_sha,
               min_by(url, {key}) AS rep_url,
               count(*) AS freq
        FROM b GROUP BY 1"""
    )


def near_dup_pairs_oracle_sql() -> str:
    return (
        "WITH RECURSIVE "
        + _prefix()
        + """
        SELECT src, dst, dist, round(sig_sim, 4) AS sig_sim FROM verified"""
    )


def simhash_fingerprints_oracle_sql() -> str:
    """Per-document sha-based SimHash over raw documents (no collapse)."""
    return (
        "WITH "
        + """fpdocs AS (
            SELECT doc_id AS url, 1 AS freq,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
            FROM documents
        ),"""
        + fingerprint_ctes(SQL_K, SQL_BANDS)
        + """
        SELECT url AS doc_id, simhash FROM fp"""
    )


def minhash_lsh_pairs_oracle_sql() -> str:
    """Distinct band-bucket candidate pairs over raw documents."""
    return (
        "WITH "
        + """fpdocs AS (
            SELECT doc_id AS url, 1 AS freq,
                   trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS text_norm
            FROM documents
        ),"""
        + fingerprint_ctes(SQL_K, SQL_BANDS)
        + """
        SELECT DISTINCT a.url AS src, b.url AS dst
        FROM bands a JOIN bands b
          ON a.b = b.b AND a.bv = b.bv AND a.url < b.url"""
    )
