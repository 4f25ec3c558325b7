"""Log-structured persistence for incremental-dedup state — O(batch)
writes per snapshot, atomic manifest commits, explicit compaction.

Why this exists (r3 verdict item #1): the previous writer rewrote BOTH
state tables in full every batch.  The sha index is one row per
distinct corpus text (~30 TB at 10^12 docs), so per-snapshot I/O was
O(corpus) at the write step even though the assignment plan reads
O(batch).  This store makes the persistence match the plan:

    <root>/
      manifest/v00000007.json   <- THE commit: {"base": ..., "segments": [...]}
      base-g00000001/sha_index/      parquet (text_sha, canonical_url)
      base-g00000001/canonicals/     parquet (url, freq, simhash, mh_bands, mh_sig)
      seg-00000005/sha_new/          parquet — new shas      (disjoint appends)
      seg-00000005/freq_delta/       parquet (url, added)    (grown canonical freqs)
      seg-00000005/canon_new/        parquet — new canonicals

Per batch the store writes ONE segment — three tables whose sizes are
all O(batch): ``sha_new`` is disjoint from the index by construction
(plans/incremental.py filters via != 'exact'), ``freq_delta`` has one
row per canonical that absorbed batch mass, ``canon_new`` one row per
new cluster.  Nothing existing is touched.

Commit protocol (replaces the r3 delete-then-rename swap whose crash
window could leave NO live state, verdict item #2): all data dirs are
written first, then a manifest JSON is staged to ``manifest/.tmp-*``
and RENAMED to ``manifest/v{K+1}.json``.  A single-file rename into a
fresh name is atomic on every Hadoop filesystem (local, HDFS; on object
stores the PUT itself is atomic), and no delete ever precedes the new
manifest — so a kill between ANY two steps leaves the previous manifest
current and the half-written dirs unreferenced.  Readers take the
highest manifest version; :meth:`gc` (safe at startup) removes
unreferenced dirs and stale ``.tmp`` files.

Reads fold the log: ``sha_index = base ∪ all sha_new``;
``canonicals = (base ∪ all canon_new) left-join Σ freq_delta``.  The
fold is a union of parquet scans plus one aggregate-sized join — the
per-batch probe plans already read the whole canonicals table, so the
fold adds no asymptotic read cost, and :meth:`compact` folds committed
segments into a fresh base (one O(corpus) write, amortized over the
``compact_segments`` batches it absorbs — Iceberg's rewrite-manifests/
compaction story, spelled out in parquet).

Production mapping: base tables = Iceberg tables; ``commit_delta`` =
one transaction doing ``INSERT INTO sha_index``, ``MERGE INTO
canonicals USING freq_delta ON url WHEN MATCHED THEN UPDATE SET freq =
freq + added``, ``INSERT INTO canonicals (canon_new)``; the manifest is
the catalog commit.  This module is that transaction for plain parquet
directories.

No reference analog (umi-collapse-rs is single-corpus per run,
deduplicate_sam.rs:72-269 holds everything in one arena).
"""

from __future__ import annotations

import json
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from umi_collapse_rs_spark.plans.incremental import DedupState, StateDelta

_CANON_COLS = ["url", "freq", "simhash", "mh_bands", "mh_sig"]


class StateStore:
    """Versioned parquet state under ``root`` (see module docstring)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root.rstrip("/")
        jvm = spark._jvm
        self._Path = jvm.org.apache.hadoop.fs.Path
        self._fs = self._Path(self.root).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )

    # -- filesystem helpers (Hadoop FS so any scheme works) -----------

    def _exists(self, p: str) -> bool:
        return self._fs.exists(self._Path(p))

    def _listdir(self, p: str) -> list[str]:
        if not self._exists(p):
            return []
        return [s.getPath().getName() for s in self._fs.listStatus(self._Path(p))]

    def _du(self, p: str) -> int:
        if not self._exists(p):
            return 0
        return int(self._fs.getContentSummary(self._Path(p)).getLength())

    def _write_file_atomic(self, path: str, content: bytes) -> None:
        tmp = f"{self.root}/manifest/.tmp-{uuid.uuid4().hex}"
        out = self._fs.create(self._Path(tmp), False)
        try:
            out.write(bytearray(content))
        finally:
            out.close()
        if not self._fs.rename(self._Path(tmp), self._Path(path)):
            self._fs.delete(self._Path(tmp), False)
            raise RuntimeError(
                f"manifest rename to {path} failed — concurrent writer? "
                "the store is single-writer by contract"
            )

    def _read_json(self, path: str) -> dict:
        # commons-io ships with Spark; py4j can't read into a Python
        # bytearray (server-side mutations don't propagate back)
        stream = self._fs.open(self._Path(path))
        try:
            txt = self.spark._jvm.org.apache.commons.io.IOUtils.toString(
                stream, "UTF-8"
            )
        finally:
            stream.close()
        return json.loads(txt)

    # -- manifest ------------------------------------------------------

    def manifest(self) -> dict | None:
        """Highest committed manifest, or None (uncommitted/empty root)."""
        versions = sorted(
            v
            for v in self._listdir(f"{self.root}/manifest")
            if v.startswith("v") and v.endswith(".json")
        )
        if not versions:
            return None
        return self._read_json(f"{self.root}/manifest/{versions[-1]}")

    def exists(self) -> bool:
        return self.manifest() is not None or self._is_legacy()

    def _is_legacy(self) -> bool:
        """Pre-store flat layout (<root>/sha_index + <root>/canonicals)."""
        return self._exists(f"{self.root}/sha_index") and self._exists(
            f"{self.root}/canonicals"
        )

    def _commit_manifest(
        self,
        base: str,
        segments: list[str],
        batch_id: int | None = None,
        stream_id: str | None = None,
        batch_fp: str | None = None,
        carry_stream: bool = True,
    ) -> dict:
        prev = self.manifest()
        version = (prev["version"] + 1) if prev else 1
        m = {"version": version, "base": base, "segments": segments}
        if carry_stream and prev is not None:
            # carry the stream lineage (high-water mark, query id,
            # content fingerprints) through commits that don't advance
            # it (compaction).  bootstrap() passes carry_stream=False:
            # re-bootstrapping a root starts a fresh lineage and must
            # NOT retain a stale mark that would suppress the first
            # hwm+1 micro-batches of a subsequent stream.
            for k in ("batch_id", "stream_id", "batch_fps"):
                if k in prev:
                    m[k] = prev[k]
        if batch_id is not None:
            m["batch_id"] = batch_id
        if stream_id is not None:
            m["stream_id"] = stream_id
        if batch_fp is not None and batch_id is not None:
            # content fingerprint of every committed streaming batch —
            # lets a FUTURE stream with a fresh checkpoint (new query
            # id, ids restarting at 0) distinguish a byte-identical
            # re-delivery (skip) from genuinely new data (process or
            # fail fast; streaming/incremental.py).  One short string
            # per micro-batch ever committed: ~30 B/batch of manifest
            # growth, reset only by a re-bootstrap.
            fps = dict(m.get("batch_fps") or {})
            fps[batch_fp] = batch_id
            m["batch_fps"] = fps
        self._write_file_atomic(
            f"{self.root}/manifest/v{version:08d}.json",
            json.dumps(m).encode(),
        )
        return m

    def last_batch_id(self) -> int | None:
        """Streaming high-water mark: the highest micro-batch id ever
        committed through :meth:`commit_delta`, or None (batch-only
        store / fresh bootstrap).  Used by the foreachBatch sink to make
        replayed micro-batches no-ops (exactly-once on top of
        Structured Streaming's at-least-once delivery)."""
        m = self.manifest()
        if m is None:
            return None
        return m.get("batch_id")

    # -- write paths ---------------------------------------------------

    def bootstrap(self, state: DedupState) -> dict:
        """Write the initial base from a full-pipeline state (one-time
        O(corpus) write) and commit a manifest with a FRESH stream
        lineage (no batch_id / stream_id / batch_fps carried — a
        re-bootstrap must not suppress the first micro-batches of a
        subsequent stream with a stale high-water mark).  The base
        generation is derived from the previous manifest, never reused."""
        prev = self.manifest()
        gen = (int(prev["base"].split("-g")[1]) + 1) if prev else 1
        base = f"base-g{gen:08d}"
        self._write_base(state, base)
        m = self._commit_manifest(base, [], carry_stream=False)
        m["bytes_written"] = self._du(f"{self.root}/{base}")
        return m

    def _write_base(self, state: DedupState, base: str) -> None:
        state.sha_index.write.mode("overwrite").parquet(
            f"{self.root}/{base}/sha_index"
        )
        state.canonicals.write.mode("overwrite").parquet(
            f"{self.root}/{base}/canonicals"
        )

    def _write_segment(self, delta: StateDelta, seg: str) -> None:
        """Data half of a commit — everything here is O(batch).  Split
        out so tests can simulate a kill between data and manifest."""
        delta.sha_new.write.mode("overwrite").parquet(f"{self.root}/{seg}/sha_new")
        delta.freq_delta.write.mode("overwrite").parquet(
            f"{self.root}/{seg}/freq_delta"
        )
        delta.canon_new.select(*_CANON_COLS).write.mode("overwrite").parquet(
            f"{self.root}/{seg}/canon_new"
        )

    def commit_delta(
        self,
        delta: StateDelta,
        batch_id: int | None = None,
        stream_id: str | None = None,
        batch_fp: str | None = None,
    ) -> dict:
        """Persist one batch's state delta: write seg-{K+1}, then commit
        manifest v{K+1}.  Total bytes written are O(batch) — returned as
        ``bytes_written`` for the bench evidence.

        ``batch_id`` (streaming): the micro-batch id from foreachBatch.
        Ids are monotone only WITHIN one checkpoint lineage (one
        streaming query id) — a fresh checkpoint restarts them at 0.  So
        a commit whose id is <= the manifest's high-water mark is
        treated as a REPLAY (skipped, ``skipped_replay: True``) only
        when the lineage matches: ``stream_id`` equals the recorded one,
        or either side carries no id (direct callers / legacy
        manifests).  A commit from a DIFFERENT stream_id re-bases the
        lineage: the new id + mark are recorded even if numerically
        lower.  Cross-lineage replay-vs-new resolution (content
        fingerprints, fail-fast) happens in the sink BEFORE this call
        (streaming/incremental.py) — this method trusts its caller.

        ``batch_fp``: content fingerprint of the batch, recorded in the
        manifest so future lineages can recognize re-deliveries.
        """
        prev = self.manifest()
        if prev is None:
            raise RuntimeError("commit_delta before bootstrap")
        if batch_id is not None:
            hwm = prev.get("batch_id")
            prev_sid = prev.get("stream_id")
            same_lineage = (
                stream_id is None or prev_sid is None or stream_id == prev_sid
            )
            if same_lineage and hwm is not None and batch_id <= hwm:
                return {**prev, "bytes_written": 0, "skipped_replay": True}
        seg = f"seg-{prev['version'] + 1:08d}"
        self._write_segment(delta, seg)
        m = self._commit_manifest(
            prev["base"],
            prev["segments"] + [seg],
            batch_id=batch_id,
            stream_id=stream_id,
            batch_fp=batch_fp,
        )
        m["bytes_written"] = self._du(f"{self.root}/{seg}")
        return m

    def compact(self, gc: bool = True) -> dict:
        """Fold committed segments into a fresh base (one O(corpus)
        write, amortized over the batches since the last compaction),
        commit a segments=[] manifest, optionally GC the old dirs.  A
        kill at any point leaves the previous manifest readable."""
        prev = self.manifest()
        if prev is None:
            raise RuntimeError("compact before bootstrap")
        state = self.read()
        gen = int(prev["base"].split("-g")[1]) + 1
        base = f"base-g{gen:08d}"
        self._write_base(state, base)
        m = self._commit_manifest(base, [])
        m["bytes_written"] = self._du(f"{self.root}/{base}")
        if gc:
            m["gc_removed"] = self.gc()
        return m

    def gc(self) -> list[str]:
        """Delete data dirs unreferenced by the CURRENT manifest and
        stale manifest ``.tmp`` files (stranded by a killed writer).
        Safe at startup: never touches referenced dirs or the manifest
        history."""
        m = self.manifest()
        if m is None:
            return []
        live = {m["base"], *m["segments"]}
        removed = []
        for name in self._listdir(self.root):
            if name in live or name == "manifest":
                continue
            if name.startswith(("base-g", "seg-")):
                self._fs.delete(self._Path(f"{self.root}/{name}"), True)
                removed.append(name)
        for name in self._listdir(f"{self.root}/manifest"):
            if name.startswith(".tmp-"):
                self._fs.delete(self._Path(f"{self.root}/manifest/{name}"), False)
                removed.append(f"manifest/{name}")
        return removed

    # -- read path -----------------------------------------------------

    def read(self) -> DedupState:
        """Fold base + committed segments into the effective state.

        The fold is lazy DataFrames: unions of parquet scans plus one
        aggregate-sized left join for the freq deltas.  A canonical born
        in segment i and grown in segment j > i resolves correctly —
        ``canon_new`` rows enter the union before the delta join."""
        m = self.manifest()
        if m is None:
            if self._is_legacy():
                return DedupState(
                    sha_index=self.spark.read.parquet(f"{self.root}/sha_index"),
                    canonicals=self.spark.read.parquet(f"{self.root}/canonicals"),
                )
            raise RuntimeError(f"no committed state under {self.root}")
        sha = self.spark.read.parquet(f"{self.root}/{m['base']}/sha_index")
        canon = self.spark.read.parquet(f"{self.root}/{m['base']}/canonicals")
        deltas = []
        for seg in m["segments"]:
            sha = sha.unionByName(
                self.spark.read.parquet(f"{self.root}/{seg}/sha_new")
            )
            canon = canon.unionByName(
                self.spark.read.parquet(f"{self.root}/{seg}/canon_new")
            )
            deltas.append(self.spark.read.parquet(f"{self.root}/{seg}/freq_delta"))
        if deltas:
            agg = deltas[0]
            for d in deltas[1:]:
                agg = agg.unionByName(d)
            agg = agg.groupBy("url").agg(F.sum("added").alias("_added"))
            canon = canon.join(agg, "url", "left").select(
                "url",
                (F.col("freq") + F.coalesce("_added", F.lit(0))).alias("freq"),
                "simhash",
                "mh_bands",
                "mh_sig",
            )
        return DedupState(sha_index=sha, canonicals=canon)

    def total_bytes(self) -> int:
        """On-disk footprint of the live state (referenced dirs only)."""
        m = self.manifest()
        if m is None:
            return self._du(self.root)
        return sum(self._du(f"{self.root}/{d}") for d in [m["base"], *m["segments"]])
