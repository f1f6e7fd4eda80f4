"""Bi-temporal (partial-order) timestamps — the reference's ``Pair`` lattice.

The reference demonstrates multi-temporal collections whose times are pairs
``Pair<isize, isize>`` ordered by the PRODUCT partial order
(examples/multitemporal.rs:22-49): ``(a1,b1) <= (a2,b2)`` iff ``a1<=a2`` and
``b1<=b2``. Operators combine such times with the lattice operations of
src/lattice.rs:11-99 — ``join`` (least upper bound = coordinate-wise max,
used by the join operator and ``delay``) and ``meet`` (greatest lower bound =
coordinate-wise min, used by compaction frontiers).

Spark realization: the epoch column holds a STRUCT<e1: long, e2: long>.
Consolidation and element-wise operators need no order at all (they group or
carry the struct as an opaque value), so `BiTemporalCollection` reuses
`DiffCollection` for them verbatim; only the operators that COMBINE or
COMPARE times differ:

- ``join``   — output time = lattice join of the two input times
  (src/operators/join.rs:697-755 generalizes exactly this way);
- ``delay``  — advance to the lattice join with a target time
  (src/collection.rs:405-421: ``delay`` must be monotone w.r.t. the order);
- ``at_time``— accumulate every update at a time <= t in the PARTIAL order
  (incomparable times are excluded — the semantic difference from a total
  order, pinned by the golden test).

A total-order long epoch embeds as ``(e, 0)``, recovering DiffCollection's
behavior — the reference's same claim for ``Product<T, ()>``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection


def pair(e1: Column | int, e2: Column | int) -> Column:
    """Build a Pair timestamp struct (multitemporal.rs:22-27)."""
    c1 = F.lit(e1) if isinstance(e1, int) else e1
    c2 = F.lit(e2) if isinstance(e2, int) else e2
    return F.struct(c1.cast("long").alias("e1"), c2.cast("long").alias("e2"))


def lattice_join(t1: Column, t2: Column) -> Column:
    """Least upper bound: coordinate-wise max (src/lattice.rs:32-56)."""
    return F.struct(
        F.greatest(t1["e1"], t2["e1"]).alias("e1"),
        F.greatest(t1["e2"], t2["e2"]).alias("e2"),
    )


def lattice_meet(t1: Column, t2: Column) -> Column:
    """Greatest lower bound: coordinate-wise min (src/lattice.rs:58-82)."""
    return F.struct(
        F.least(t1["e1"], t2["e1"]).alias("e1"),
        F.least(t1["e2"], t2["e2"]).alias("e2"),
    )


def lattice_leq(t1: Column, t2: Column) -> Column:
    """The product partial order (multitemporal.rs:36-42): both coordinates
    must be <=; incomparable pairs satisfy neither direction."""
    return (t1["e1"] <= t2["e1"]) & (t1["e2"] <= t2["e2"])


class BiTemporalCollection(DiffCollection):
    """A DiffCollection whose ``epoch`` column is a Pair struct.

    map/filter/concat/negate/consolidate are inherited unchanged — they treat
    the time as an opaque grouping value, which is exactly correct under any
    partial order. The time-combining operators below override the
    total-order implementations with the lattice operations.
    """

    @classmethod
    def from_pairs(
        cls,
        spark,
        updates,
        schema: str,
    ) -> "BiTemporalCollection":
        """Build from explicit ``(*payload, e1, e2, diff)`` tuples; schema
        describes payload columns only."""
        full = f"{schema}, __e1 long, __e2 long, {DIFF} long"
        df = spark.createDataFrame(list(updates), schema=full)
        lifted = df.select(
            *[c for c in df.columns if c not in ("__e1", "__e2", DIFF)],
            pair(F.col("__e1"), F.col("__e2")).alias(EPOCH),
            F.col(DIFF),
        )
        return cls(lifted)

    def _same_epoch(self, df: DataFrame) -> "BiTemporalCollection":
        return BiTemporalCollection(df)

    def delay(self, new_epoch: Column) -> "BiTemporalCollection":
        """Advance each update's time to the lattice join with ``new_epoch``
        (collection.rs:405-421 — the partial-order form of max)."""
        return BiTemporalCollection(
            self.df.withColumn(EPOCH, lattice_join(F.col(EPOCH), new_epoch))
        )

    def join(
        self,
        other: "DiffCollection",
        on: Sequence[str],
        broadcast_other: bool = False,
    ) -> "BiTemporalCollection":
        """Equi-join with diffs multiplied and times LATTICE-joined
        (src/operators/join.rs:697-755: output time = time1.join(time2))."""
        on = list(on)
        lpay = [c for c in self.payload_columns if c not in on]
        rpay = [c for c in other.payload_columns if c not in on]
        overlap = set(lpay) & set(rpay)
        if overlap:
            raise ValueError(
                f"non-key payload columns overlap: {overlap}; rename first"
            )
        right = other.df
        if broadcast_other:
            right = F.broadcast(right)
        l = self.df.alias("l")
        r = right.alias("r")
        joined = l.join(r, on, "inner").select(
            *on,
            *[F.col(f"l.{c}") for c in lpay],
            *[F.col(f"r.{c}") for c in rpay],
            lattice_join(F.col(f"l.{EPOCH}"), F.col(f"r.{EPOCH}")).alias(EPOCH),
            (F.col(f"l.{DIFF}") * F.col(f"r.{DIFF}")).alias(DIFF),
        )
        return BiTemporalCollection(joined)

    # ------------------------------------------------------------------ #
    # Grouped operators: the inherited implementations order epochs with
    # total-order machinery (windows over the epoch column, min/max epoch
    # aggregates) — over a struct epoch that is a LEXICOGRAPHIC linear
    # extension, not the product partial order, so their incremental
    # retraction streams would be silently wrong for Pair times. Fail
    # loudly instead (the reference's grouped operators are generic over
    # lattices, src/operators/reduce.rs:29-101; lattice-correct Spark
    # variants would accumulate per down-set like ``at_time`` — future
    # work, tracked in SURVEY §2.6).
    # ------------------------------------------------------------------ #

    def _no_partial_order(self, op: str):
        raise NotImplementedError(
            f"{op} on BiTemporalCollection: the total-order grouped kernels "
            "order struct epochs lexicographically (a linear extension, not "
            "the product partial order) and would emit incorrect retraction "
            "streams. Accumulate a down-set with at_time(e1, e2) and group "
            "the resulting plain DataFrame, or flatten to a single epoch "
            "first."
        )

    def count(self, *a, **k):  # noqa: D102
        self._no_partial_order("count")

    def threshold(self, *a, **k):  # noqa: D102
        self._no_partial_order("threshold")

    def distinct(self, *a, **k):  # noqa: D102
        self._no_partial_order("distinct")

    def reduce(self, *a, **k):  # noqa: D102
        self._no_partial_order("reduce")

    def reduce_min(self, *a, **k):  # noqa: D102
        self._no_partial_order("reduce_min")

    def reduce_max(self, *a, **k):  # noqa: D102
        self._no_partial_order("reduce_max")

    def top_k(self, *a, **k):  # noqa: D102
        self._no_partial_order("top_k")

    def at_time(self, e1: int, e2: int) -> DataFrame:
        """The collection's contents AT a pair time: accumulate every update
        whose time is <= (e1, e2) in the partial order — updates at
        incomparable times do not contribute (multitemporal.rs:44-49, where
        queries at (a, b) see only the closed down-set)."""
        t = pair(e1, e2)
        keys = self.payload_columns
        return (
            self.df.filter(lattice_leq(F.col(EPOCH), t))
            .groupBy(*keys)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
