"""Incremental multiway delta-join — the dogs³ ``half_join`` pipeline.

The reference's dogsdogsdogs crate maintains a CYCLIC multiway join (the
canonical delta_query example: triangles over one edge relation) under
updates by running one DELTA PIPELINE per relation occurrence: the delta
``dR_i`` is extended by a chain of half-joins against the other occurrences'
traces, where occurrences BEFORE position i are read at the post-batch time
and occurrences AFTER position i at the pre-batch time
(dogsdogsdogs/src/operators/half_join.rs:1-33 — the ``Lt``/``Le`` time
comparison encodes exactly this ordering; dogsdogsdogs/examples/
delta_query.rs wires the three triangle pipelines). The alternating
discipline makes the pipelines PARTITION the output change — summing them
telescopes ``E_new⊗E_new⊗E_new − E_old⊗E_old⊗E_old`` with no double
counting, for additions and retractions alike.

Spark realization: one micro-batch epoch at a time against a shared
``TraceView`` edge trace, so "pre/post-batch time" is simply which view a
term joins (``E_old`` vs ``E_old ∪ Δ``):

    ΔT = Δ(a,b) ⋈ E_old(b,c) ⋈ E_old(a,c)
       + E_new(a,b) ⋈ Δ(b,c)  ⋈ E_old(a,c)
       + E_new(a,b) ⋈ E_new(b,c) ⋈ Δ(a,c)

Every term is DELTA-DRIVEN: the small consolidated Δ is broadcast into its
first half-join, so per-round work is O(|Δ| · degree), never O(|E|²) — the
property that makes the delta query cheaper than re-running the batch
worst-case-optimal join (operators/wco.py) per epoch. Diffs multiply through
each half-join (weighted-multiset semantics), so edge multiplicities and
retractions need no special casing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF
from differential_dataflow_spark.session import tracked_local_checkpoint
from differential_dataflow_spark.streaming.maintain import TraceView


def half_join(
    bindings: DataFrame,
    trace: DataFrame,
    on: Sequence[str],
    broadcast_bindings: bool = False,
) -> DataFrame:
    """One half-join step: extend weighted prefix ``bindings`` by a trace,
    multiplying diffs (half_join.rs:9-33 — the output weight is the product).
    Column names must be pre-aligned: shared names in ``on`` join, the
    trace's other columns become new binding variables."""
    l = bindings.withColumnRenamed(DIFF, "__wb")
    r = trace.withColumnRenamed(DIFF, "__wt")
    if broadcast_bindings:
        l = F.broadcast(l)
    return (
        l.join(r, list(on), "inner")
        .withColumn(DIFF, F.col("__wb") * F.col("__wt"))
        .drop("__wb", "__wt")
    )


class DeltaTriangles:
    """Incrementally maintained triangle query T(a,b,c) ⟸ E(a,b), E(b,c),
    E(a,c) over a single evolving edge relation — the reference's
    delta_query/half_join demonstration, on the micro-batch spine.

    ``process_batch`` returns the triangle update stream ``(a, b, c, diff)``
    for one epoch of edge updates ``(src, dst, diff)``; the returned frame is
    valid until the next call (which may compact the trace). Accumulating
    the outputs reproduces the batch worst-case-optimal join of the final
    edge set (pinned by pytest and the ``graph_delta_triangles`` oracle).
    """

    def __init__(self, spark: SparkSession, compact_every: int = 8):
        self.spark = spark
        self.trace = TraceView(spark, compact_every=compact_every)

    @staticmethod
    def _as(df: DataFrame, a: str, b: str) -> DataFrame:
        return df.select(
            F.col("src").alias(a), F.col("dst").alias(b), F.col(DIFF)
        )

    def process_batch(self, delta: DataFrame) -> DataFrame:
        """Apply one epoch of edge updates; returns ΔT as the three delta
        pipelines' union."""
        self.trace.maybe_compact()
        d = tracked_local_checkpoint(
            delta.groupBy("src", "dst")
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        e_old = self.trace.view()
        e_new = d if e_old is None else e_old.unionByName(d)
        empty = self.spark.createDataFrame(
            [], "a long, b long, c long, diff long"
        )

        def pipeline(pos: int) -> DataFrame:
            # Occurrences: 1 = E(a,b), 2 = E(b,c), 3 = E(a,c). Before pos:
            # post-batch view; after pos: pre-batch view (half_join.rs's
            # Le/Lt discipline collapsed to the two micro-batch views).
            views = {
                i: (e_new if i < pos else e_old) for i in (1, 2, 3) if i != pos
            }
            if pos != 1 and views[1] is None:
                return empty
            if pos != 2 and views[2] is None:
                return empty
            if pos != 3 and views[3] is None:
                return empty
            if pos == 1:
                t = half_join(
                    self._as(d, "a", "b"), self._as(views[2], "b", "c"),
                    on=["b"], broadcast_bindings=True,
                )
                return half_join(t, self._as(views[3], "a", "c"), on=["a", "c"])
            if pos == 2:
                t = half_join(
                    self._as(d, "b", "c"), self._as(views[1], "a", "b"),
                    on=["b"], broadcast_bindings=True,
                )
                return half_join(t, self._as(views[3], "a", "c"), on=["a", "c"])
            t = half_join(
                self._as(d, "a", "c"), self._as(views[1], "a", "b"),
                on=["a"], broadcast_bindings=True,
            )
            return half_join(t, self._as(views[2], "b", "c"), on=["b", "c"])

        out = pipeline(1).unionByName(pipeline(2)).unionByName(pipeline(3))
        # Consolidate the epoch's output (one small shuffle over O(|Δ|·deg)
        # rows) and materialize before the trace mutates (compaction frees
        # the blocks the lazy plan references) — the DeltaJoin discipline.
        out = (
            out.groupBy("a", "b", "c")
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        out = tracked_local_checkpoint(out)
        self.trace.append(d)
        return out

    def release(self) -> None:
        self.trace.release()
