"""Arrangements: shared, compacting, key-indexed traces with point queries.

The reference's second core abstraction (src/trace/mod.rs:1-8;
src/operators/arrange/arrangement.rs:43-62): an ``Arranged`` pairs a stream of
sealed immutable batches with a handle to the LSM-like index holding them.
Spark translation: the trace is a key-partitioned parquet directory of update
rows ``(key..., payload..., epoch, diff)`` plus a JSON manifest recording each
sealed batch's ``Description {lower, upper}`` and the trace's logical
compaction frontier ``since`` (src/trace/description.rs:14-35).

Surface implemented here:

- ``insert_batch`` — seal a batch ``[lower, upper)`` into the trace
  (arrange_core's batcher sealing, arrangement.rs:596-668);
- ``as_collection`` / ``filter`` — collection views over the trace
  (``Arranged::as_collection``/``filter``, arrangement.rs:182-260);
- ``lookup`` — streaming point queries: the accumulated value multiset for a
  set of keys at a time (``Arranged::lookup``, arrangement.rs:262-421) — a
  broadcast semijoin against the key-partitioned trace, so a query touches
  one partition's worth of rows per key;
- ``freeze`` — a read-only view whose updates beyond a frontier are
  suppressed (src/trace/wrappers/freeze.rs:1-18);
- ``compact`` — logical compaction: advance ``since``, collapsing all epochs
  ``<= since`` into one (times indistinguishable beyond the frontier,
  src/trace/mod.rs:79-114), then physically consolidating the files (the
  spine merge, spine_fueled.rs, delegated to a parquet rewrite);
- ``load`` — re-import an existing trace into another dataflow/session
  (trace ``import``, src/operators/arrange/agent.rs:215-288).
"""

from __future__ import annotations

import json
import shutil
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection


class Arrangement:
    """A key-indexed, compacting trace of update tuples backed by parquet."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: Sequence[str],
        num_partitions: int | None = None,
    ):
        self.spark = spark
        self.root = Path(root)
        self.key = list(key)
        self.num_partitions = num_partitions
        self.batches: list[dict] = []  # [{"lower": int, "upper": int}]
        self.since: int | None = None
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        self._save_manifest()

    # ---------------------------------------------------------------- #
    # Manifest (batch Descriptions + compaction frontier)
    # ---------------------------------------------------------------- #

    def _save_manifest(self) -> None:
        (self.root / "manifest.json").write_text(
            json.dumps(
                {
                    "key": self.key,
                    "since": self.since,
                    "batches": self.batches,
                    "num_partitions": self.num_partitions,
                }
            )
        )

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "Arrangement":
        """Trace import: attach to an existing arrangement directory —
        another dataflow's state readable here (agent.rs:215-288)."""
        m = json.loads((Path(root) / "manifest.json").read_text())
        arr = cls.__new__(cls)
        arr.spark = spark
        arr.root = Path(root)
        arr.key = m["key"]
        arr.num_partitions = m.get("num_partitions")
        arr.batches = m["batches"]
        arr.since = m["since"]
        return arr

    # ---------------------------------------------------------------- #
    # Writes
    # ---------------------------------------------------------------- #

    def insert_batch(self, updates: DiffCollection) -> None:
        """Seal one batch into the trace. The batch's ``[lower, upper)``
        epoch bounds are recorded as its Description; rows are written
        key-partitioned so lookups and joins read co-located data.

        Bounds come from the CONSOLIDATED batch (what is actually written),
        and a batch whose updates fully cancel is skipped entirely — no data
        files and no manifest entry (the reference never seals empty batches
        into the spine either)."""
        df = updates.consolidate().df
        bounds = df.agg(
            F.min(EPOCH).alias("lo"),
            F.max(EPOCH).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        if bounds["lo"] is None:
            return  # fully-cancelled batch: nothing to seal
        # File sizing from the BATCH SIZE, not the core count (guide §6):
        # a small sealed batch written across defaultParallelism partitions
        # produced one tiny parquet file per core — listing/open overhead on
        # every later read. ~256k rows per file, capped at the session
        # parallelism for genuinely large batches.
        parts = self.num_partitions or max(
            1,
            min(
                self.spark.sparkContext.defaultParallelism,
                int(bounds["n"]) // 262_144 + 1,
            ),
        )
        df = df.repartition(parts, *self.key)
        df.write.mode("append").parquet(str(self.root / "data"))
        self.batches.append(
            {"lower": int(bounds["lo"]), "upper": int(bounds["hi"]) + 1}
        )
        self._save_manifest()

    def compact(self, since: int) -> None:
        """Advance the logical compaction frontier: epochs <= ``since``
        become indistinguishable and collapse to ``since`` with summed diffs;
        the trace is physically rewritten consolidated. Lookups at times
        < ``since`` are no longer answerable (the reference's cursor validity
        rule, src/trace/mod.rs:116-150)."""
        df = self._read()
        if df is None:
            self.since = since
            self._save_manifest()
            return
        clamped = df.withColumn(
            EPOCH, F.greatest(F.col(EPOCH), F.lit(since).cast("long"))
        )
        payload = [c for c in clamped.columns if c != DIFF]
        compacted = (
            clamped.groupBy(*payload)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        # File sizing from the trace size (guide §6) — same rule as
        # insert_batch; the count is one extra job on the (amortized-rare)
        # compaction path.
        parts = self.num_partitions or max(
            1,
            min(
                self.spark.sparkContext.defaultParallelism,
                compacted.count() // 262_144 + 1,
            ),
        )
        # Crash-safe rewrite: stage the compacted trace beside data/, then
        # atomically swap directories (same filesystem => os.rename is atomic)
        # and update the manifest LAST. A crash at any point leaves either the
        # old trace or the new one fully intact under data/.
        tmp = self.root / "compact_tmp"
        old = self.root / "compact_old"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        compacted.repartition(parts, *self.key).write.mode("overwrite").parquet(
            str(tmp)
        )
        (self.root / "data").rename(old)
        tmp.rename(self.root / "data")
        shutil.rmtree(old, ignore_errors=True)
        self.since = since
        lo = min((b["lower"] for b in self.batches), default=since)
        hi = max((b["upper"] for b in self.batches), default=since + 1)
        self.batches = [{"lower": max(lo, since), "upper": hi}]
        self._save_manifest()

    # ---------------------------------------------------------------- #
    # Reads
    # ---------------------------------------------------------------- #

    def _read(self) -> DataFrame | None:
        if not self.batches:
            return None
        return self.spark.read.parquet(str(self.root / "data"))

    def as_collection(self) -> DiffCollection:
        """Flatten the trace back to an update collection
        (``Arranged::as_collection``, arrangement.rs:182-220)."""
        df = self._read()
        if df is None:
            raise ValueError("empty arrangement has no collection view")
        return DiffCollection(df)

    def filter(self, predicate) -> DiffCollection:
        """Filtered view over the same physical index
        (``Arranged::filter`` / the filter trace wrapper)."""
        return self.as_collection().filter(predicate)

    def freeze(self, at: int) -> DiffCollection:
        """Frozen view: updates at epochs beyond ``at`` are suppressed
        (src/trace/wrappers/freeze.rs:1-18). Fails if ``at`` precedes the
        compaction frontier (those distinctions are gone)."""
        self._check_since(at)
        return DiffCollection(self.as_collection().df.filter(F.col(EPOCH) <= at))

    def lookup(
        self,
        keys: DataFrame | Sequence[tuple] | Sequence,
        at: int | None = None,
    ) -> DataFrame:
        """Point queries: for each queried key, the accumulated (payload,
        weight) multiset at time ``at`` (``Arranged::lookup``,
        arrangement.rs:262-421; queries join against the trace by key hash).

        ``keys`` is a DataFrame with the key columns, or an iterable of
        values (single-column key) / tuples. Returns
        ``(key..., payload..., diff)`` with diff != 0 — the collection's
        contents at ``at`` restricted to the queried keys.
        """
        df = self._read()
        if df is None:
            raise ValueError("lookup against an empty arrangement")
        if at is not None:
            self._check_since(at)
            df = df.filter(F.col(EPOCH) <= at)
        if not isinstance(keys, DataFrame):
            rows = [k if isinstance(k, tuple) else (k,) for k in keys]
            keys = self.spark.createDataFrame(
                rows, schema=df.select(*self.key).schema
            )
        # Broadcast the (small) query set against the key-partitioned trace.
        df = df.join(F.broadcast(keys.dropDuplicates(self.key)), self.key, "left_semi")
        payload = [c for c in df.columns if c not in (EPOCH, DIFF)]
        return (
            df.groupBy(*payload)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )

    def _check_since(self, at: int) -> None:
        if self.since is not None and at < self.since:
            raise ValueError(
                f"time {at} precedes the compaction frontier {self.since}; "
                "historical distinctions were collapsed (trace/mod.rs:79-114)"
            )
