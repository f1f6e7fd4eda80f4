"""Exactly-once idempotent sink with per-partition lineage + metrics.

Mirrors the reference's durable capture protocol (src/capture.rs:14-41,92-125):
``Message::Updates`` batches plus ``Progress{lower, upper, counts}`` statements
that make replay deduplicating and reorder-tolerant. Spark translation:

- each micro-batch commit is keyed by ``(query_name, batch_id)`` — Spark
  replays a batch after failure with the SAME batch_id, so an idempotent
  "skip if committed" check yields exactly-once output (the standard
  foreachBatch discipline);
- data lands as parquet under ``data/batch_id=N/`` (write-then-mark: the
  commit marker is written only after the data write succeeds);
- the commit log records per-batch lineage — row count, per-partition counts,
  watermark — the analogue of Progress statements, queryable as a table.

On a real deployment the same structure maps to an Iceberg table with
snapshot-id-as-epoch commits; here it is a plain directory protocol so the
sandbox has no connector dependency.
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ExactlyOnceSink:
    def __init__(self, root: str, query_name: str = "q"):
        self.root = Path(root)
        self.query_name = query_name
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        (self.root / "commits").mkdir(parents=True, exist_ok=True)

    def _commit_path(self, batch_id: int) -> Path:
        return self.root / "commits" / f"{self.query_name}-{batch_id}.json"

    def is_committed(self, batch_id: int) -> bool:
        return self._commit_path(batch_id).exists()

    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: idempotent write of one micro-batch."""
        if self.is_committed(batch_id):
            return  # replayed batch — exactly-once skip
        out_dir = str(self.root / "data" / f"batch_id={batch_id}")
        # Write FIRST, then derive the lineage counts from the written files:
        # computing counts from `df` before the write would evaluate the
        # micro-batch twice, and with a nondeterministic upstream plan
        # (spark_partition_id depends on scheduling/AQE) the Progress counts
        # could disagree with the data actually committed.
        df.write.mode("overwrite").parquet(out_dir)
        written = df.sparkSession.read.parquet(out_dir)
        # Progress "partition" ids are OUTPUT-FILE ordinals post-write (the
        # part-NNNNN number), not the micro-batch's in-flight Spark partition
        # ids — the durable artifact is the file set, so lineage is keyed by
        # it. Non-matching file names (e.g. a foreign file dropped into the
        # dir) fall into ordinal -1 rather than failing the commit.
        ord_expr = F.regexp_extract(F.input_file_name(), r"part-(\d+)", 1)
        counts_df = (
            written.withColumn(
                "partition",
                F.when(ord_expr == "", F.lit(-1)).otherwise(
                    ord_expr.cast("int")
                ),
            )
            .groupBy("partition")
            .count()
        )
        part_counts = {
            int(r["partition"]): int(r["count"]) for r in counts_df.collect()
        }
        marker = {
            "query": self.query_name,
            "batch_id": batch_id,
            "rows": sum(part_counts.values()),
            "partition_counts": part_counts,
            "committed_at": time.time(),
        }
        tmp = self._commit_path(batch_id).with_suffix(".tmp")
        tmp.write_text(json.dumps(marker))
        os.rename(tmp, self._commit_path(batch_id))  # atomic publish

    def foreach_batch(self):
        return lambda df, batch_id: self.write_batch(df, batch_id)

    def read_all(self, spark: SparkSession) -> DataFrame:
        """All committed output (uncommitted/partial batch dirs excluded)."""
        committed = [
            int(json.loads(p.read_text())["batch_id"])
            for p in (self.root / "commits").glob(f"{self.query_name}-*.json")
        ]
        paths = [
            str(self.root / "data" / f"batch_id={b}")
            for b in sorted(committed)
            if (self.root / "data" / f"batch_id={b}").exists()
        ]
        if not paths:
            raise FileNotFoundError(f"no committed batches under {self.root}")
        return spark.read.option("basePath", str(self.root / "data")).parquet(*paths)

    def lineage(self) -> list[dict]:
        """The Progress log: per-batch commit metadata, ordered by batch."""
        entries = [
            json.loads(p.read_text())
            for p in (self.root / "commits").glob(f"{self.query_name}-*.json")
        ]
        return sorted(entries, key=lambda e: e["batch_id"])
