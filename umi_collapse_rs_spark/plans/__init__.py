from umi_collapse_rs_spark.plans.pipeline import DedupResult, run_dedup_pipeline  # noqa: F401
