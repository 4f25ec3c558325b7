"""Stage checkpointing for resumability (north_rule requirement).

Each pipeline stage can persist its output as parquet under
``<root>/<stage>/`` with Spark's ``_SUCCESS`` marker; a restarted run
resumes at the first stage whose marker is missing.  The reference has
no analog (its ``--two-pass`` low-memory flag is accepted but
unimplemented, cli.rs:45-48); resumability here replaces stream state —
the pipeline is batch, so checkpointed stage outputs ARE the recovery
log.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """Probe a path through the Hadoop FileSystem API, so checkpoint
    roots on hdfs:// / s3a:// / file:/ resolve the same way Spark's
    writers do.  (A plain ``os.path.exists`` only sees the local posix
    filesystem and silently never resumes on object stores — the real-
    cluster case the north_rule targets.)"""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


class StageCheckpointer:
    """Write-through stage cache keyed by (config token, stage name).

    With ``root=None`` checkpointing is disabled and stages pass through
    (tests / small runs).  ``runs`` records (stage, wall_ms, resumed).

    ``cfg_token`` (DedupConfig.output_config_token()) namespaces the
    stage paths: resuming under a DIFFERENT output-affecting config
    (merge rule, fingerprint mode, banding, ...) resolves to a fresh
    directory and recomputes, instead of silently reusing stage outputs
    computed under the old config.
    """

    def __init__(self, spark: SparkSession, root: str | None, cfg_token: str | None = None):
        self.spark = spark
        self.root = root
        self.cfg_token = cfg_token
        self.runs: list[dict] = []

    def _path(self, stage: str) -> str:
        assert self.root is not None
        base = self.root.rstrip("/")
        if self.cfg_token:
            base = f"{base}/{self.cfg_token}"
        return f"{base}/{stage}"

    def is_done(self, stage: str) -> bool:
        if self.root is None:
            return False
        return _hadoop_path_exists(self.spark, f"{self._path(stage)}/_SUCCESS")

    def materialize(self, stage: str, build) -> DataFrame:
        """Return the stage output, building + persisting it if needed.

        ``build`` is a zero-arg callable returning the stage DataFrame.
        """
        t0 = time.monotonic()
        if self.root is None:
            # No persistent checkpoint: still cut the plan and materialize
            # once — stage outputs feed many downstream subtrees (fp alone
            # feeds 3 candidate generators + 4 verify/gate joins) and
            # re-running the fingerprint UDFs per subtree would dominate.
            df = build().localCheckpoint(eager=True)
            self.runs.append({"stage": stage, "wall_ms": (time.monotonic() - t0) * 1e3, "resumed": False})
            return df
        path = self._path(stage)
        if self.is_done(stage):
            self.runs.append({"stage": stage, "wall_ms": 0.0, "resumed": True})
            return self.spark.read.parquet(path)
        build().write.mode("overwrite").parquet(path)
        self.runs.append({"stage": stage, "wall_ms": (time.monotonic() - t0) * 1e3, "resumed": False})
        return self.spark.read.parquet(path)
