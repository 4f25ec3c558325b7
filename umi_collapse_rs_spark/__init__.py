"""umi_collapse_rs_spark — a from-scratch PySpark-native near-duplicate
detection + clustering engine for Common-Crawl-style web pages.

Re-expresses the capabilities of the reference engine
``tkob-vh/umi-collapse-rs`` (a single-node Rust UMI deduplicator; see
SURVEY.md for the structural analysis) as idiomatic Spark DataFrame
pipelines:

- exact collapse by normalized text  (ref: deduplicate_sam.rs:160-176)
- 64-bit SimHash + banded MinHash-LSH fingerprints via Arrow-vectorized
  pandas UDFs                         (ref: read.rs:96-111, bitset.rs)
- banded equi-self-joins for candidate pairs (ref: data/naive.rs:26-40)
- the exact directional frequency gate ``2*f_child <= f_parent + 1``
                                       (ref: directional.rs:38)
- greedy-faithful clustering via iterative min-label propagation
                                       (ref: directional.rs:30-91)
- deterministic canonical-representative election
                                       (ref: merge/mod.rs:6-51)
- window-fingerprint substring pass for long verbatim overlaps
  (no reference analog; required by the north star)
"""

__version__ = "0.1.0"

from umi_collapse_rs_spark.config import DedupConfig  # noqa: F401
