"""Incremental joins for streams (reference src/operators/join.rs).

Two realizations of the differential join, matching the reference's
``join_core`` semantics (src/operators/join.rs:255-556: each new batch from
one side is matched against the other side's trace, diffs multiply):

1. ``stream_stream_join`` — the native Structured Streaming stream-stream
   equi-join. Spark keeps both sides' state and emits each matched pair
   exactly once as rows arrive: exactly the update stream
   ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB of the differential join. Weight multiplication is
   a projection; watermarks bound state like trace compaction
   (src/trace/mod.rs:79-114 logical compaction ≈ state eviction).

2. ``DeltaJoin`` — the arrangement-based micro-batch join for ``foreachBatch``
   pipelines: both sides' consolidated histories are parquet "traces"
   (sorted, key-partitioned state tables); per batch the three delta terms
   are computed and the traces appended + periodically compacted (the spine's
   merge, src/trace/implementations/spine_fueled.rs, delegated to a parquet
   rewrite). This is the path that scales to unbounded state with explicit
   storage control (Iceberg/Delta table in production).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Weighted inner equi-join of two streaming update DataFrames (each with
    a ``diff`` column). Output diff = diff_l * diff_r
    (src/operators/join.rs:55-64)."""
    on = list(on)
    l = left.withColumnRenamed(DIFF, "__diff_l")
    r = right.withColumnRenamed(DIFF, "__diff_r")
    joined = l.join(r, on, "inner")
    return joined.withColumn(
        DIFF, F.col("__diff_l") * F.col("__diff_r")
    ).drop("__diff_l", "__diff_r")


class DeltaJoin:
    """Arrangement-backed incremental equi-join for micro-batch pipelines.

    State layout: two parquet trace dirs (left/, right/) holding consolidated
    update rows ``(key..., payload..., diff)``. ``process_batch`` implements
    the delta rule; compaction consolidates the trace when its file count
    exceeds ``compact_every`` appends.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        on: Sequence[str],
        compact_every: int = 8,
    ):
        self.spark = spark
        self.on = list(on)
        self.root = Path(state_dir)
        self.compact_every = compact_every
        self._appends = {"left": 0, "right": 0}
        self._schemas: dict[str, object] = {}
        for side in ("left", "right"):
            (self.root / side).mkdir(parents=True, exist_ok=True)

    def _trace(self, side: str) -> DataFrame | None:
        """The side's consolidated history, or None if nothing appended yet."""
        if side not in self._schemas:
            return None
        schema = self._schemas[side]
        if self._appends[side] == 0:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(str(self.root / side))

    def _append(self, side: str, delta: DataFrame) -> None:
        self._schemas[side] = delta.schema
        delta.write.mode("append").parquet(str(self.root / side))
        self._appends[side] += 1
        if self._appends[side] % self.compact_every == 0:
            self._compact(side, delta)

    def _compact(self, side: str, schema_of: DataFrame) -> None:
        """Consolidate the trace: sum diffs per row, drop zeros, rewrite —
        the logical+physical compaction of the reference's spine."""
        path = str(self.root / side)
        trace = self.spark.read.schema(schema_of.schema).parquet(path)
        cols = [c for c in trace.columns if c != DIFF]
        compacted = (
            trace.groupBy(*cols).agg(F.sum(DIFF).alias(DIFF)).filter(F.col(DIFF) != 0)
        )
        tmp = str(self.root / f"{side}_compact_tmp")
        compacted.repartition(*self.on).write.mode("overwrite").parquet(tmp)
        fresh = self.spark.read.parquet(tmp)
        fresh.write.mode("overwrite").parquet(path)
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)

    def process_batch(
        self, delta_left: DataFrame | None, delta_right: DataFrame | None
    ) -> DataFrame | None:
        """Apply one epoch of deltas; returns the join's output delta:
        ΔL ⋈ R  ∪  L ⋈ ΔR  ∪  ΔL ⋈ ΔR, diffs multiplied. L/R are the traces
        *before* this batch (matching join_core's batch-vs-trace discipline,
        src/operators/join.rs:413-465)."""
        assert delta_left is not None or delta_right is not None
        l_trace = self._trace("left")
        r_trace = self._trace("right")
        outs: list[DataFrame] = []
        if delta_left is not None and r_trace is not None:
            outs.append(stream_stream_join(delta_left, r_trace, self.on))
        if delta_right is not None and l_trace is not None:
            outs.append(stream_stream_join(l_trace, delta_right, self.on))
        if delta_left is not None and delta_right is not None:
            outs.append(stream_stream_join(delta_left, delta_right, self.on))
        out = None
        if outs:
            out = outs[0]
            for o in outs[1:]:
                out = out.unionByName(o)
            # Materialize BEFORE mutating the traces: the lazy plan references
            # the pre-batch trace files, which append/compaction will rewrite.
            out = out.localCheckpoint(eager=True)
        if delta_left is not None:
            self._append("left", delta_left)
        if delta_right is not None:
            self._append("right", delta_right)
        return out
