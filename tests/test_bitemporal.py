"""Golden tests for Pair (bi-temporal) timestamps — the reference's
multitemporal example (examples/multitemporal.rs:22-49) and the product
lattice (src/lattice.rs:11-99)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark.operators.bitemporal import (
    BiTemporalCollection,
    lattice_join,
    lattice_leq,
    lattice_meet,
    pair,
)


def rows_of(df):
    return sorted(tuple(r) for r in df.collect())


def test_lattice_ops(spark):
    df = spark.range(1).select(
        lattice_join(pair(1, 5), pair(3, 2)).alias("j"),
        lattice_meet(pair(1, 5), pair(3, 2)).alias("m"),
        lattice_leq(pair(1, 2), pair(1, 5)).alias("leq"),
        lattice_leq(pair(1, 5), pair(3, 2)).alias("incomparable_fwd"),
        lattice_leq(pair(3, 2), pair(1, 5)).alias("incomparable_bwd"),
    )
    r = df.collect()[0]
    # join = coordinate-wise max, meet = coordinate-wise min
    assert (r["j"]["e1"], r["j"]["e2"]) == (3, 5)
    assert (r["m"]["e1"], r["m"]["e2"]) == (1, 2)
    assert r["leq"] is True
    # (1,5) and (3,2) are incomparable in the product order
    assert r["incomparable_fwd"] is False and r["incomparable_bwd"] is False


def test_at_time_sees_only_the_down_set(spark):
    # Updates at (0,1) and (1,0) are mutually incomparable: a query at
    # either time sees only its own update; (1,1) sees both; (0,0) neither
    # (multitemporal.rs:44-49).
    coll = BiTemporalCollection.from_pairs(
        spark,
        [("a", 0, 1, 1), ("b", 1, 0, 1)],
        "k string",
    )
    assert rows_of(coll.at_time(0, 0)) == []
    assert rows_of(coll.at_time(0, 1)) == [("a", 1)]
    assert rows_of(coll.at_time(1, 0)) == [("b", 1)]
    assert rows_of(coll.at_time(1, 1)) == [("a", 1), ("b", 1)]


def test_consolidate_keeps_incomparable_times_separate(spark):
    # Consolidation merges only IDENTICAL times; two updates of the same
    # record at incomparable times must both survive (the distinction is
    # observable by down-set queries).
    coll = BiTemporalCollection.from_pairs(
        spark,
        [("a", 0, 1, 1), ("a", 1, 0, 1), ("a", 0, 1, 2)],
        "k string",
    )
    out = coll.consolidate()
    assert isinstance(out, BiTemporalCollection)
    got = sorted(
        (r["k"], r["epoch"]["e1"], r["epoch"]["e2"], r["diff"])
        for r in out.df.collect()
    )
    assert got == [("a", 0, 1, 3), ("a", 1, 0, 1)]


def test_join_uses_lattice_join_of_times(spark):
    # Reference join semantics generalized to partial orders: the output
    # update's time is the least upper bound of the inputs' times
    # (src/operators/join.rs:697-755). greatest() on structs would give the
    # LEXICOGRAPHIC max — (2,0) against (1,9) — which is NOT an upper bound.
    left = BiTemporalCollection.from_pairs(
        spark, [(1, 10, 2, 0, 1)], "k long, v long"
    )
    right = BiTemporalCollection.from_pairs(
        spark, [(1, 20, 1, 9, 1)], "k long, w long"
    )
    out = left.join(right, on=["k"])
    r = out.df.collect()[0]
    assert (r["epoch"]["e1"], r["epoch"]["e2"]) == (2, 9)
    assert (r["k"], r["v"], r["w"], r["diff"]) == (1, 10, 20, 1)
    # ... and the joined update is visible exactly from its lattice join on.
    assert rows_of(out.at_time(2, 0)) == []
    assert rows_of(out.at_time(2, 9)) == [(1, 10, 20, 1)]


def test_delay_advances_to_lattice_join(spark):
    coll = BiTemporalCollection.from_pairs(
        spark, [("a", 0, 5, 1), ("b", 3, 0, 1)], "k string"
    )
    out = coll.delay(pair(2, 2))
    got = sorted(
        (r["k"], r["epoch"]["e1"], r["epoch"]["e2"]) for r in out.df.collect()
    )
    assert got == [("a", 2, 5), ("b", 3, 2)]


def test_total_order_embedding(spark):
    # (e, 0) pairs recover total-order behavior: the down-set of (t, 0) is
    # exactly epochs <= t.
    coll = BiTemporalCollection.from_pairs(
        spark,
        [("x", 0, 0, 1), ("x", 1, 0, 1), ("x", 2, 0, -1)],
        "k string",
    )
    assert rows_of(coll.at_time(1, 0)) == [("x", 2)]
    assert rows_of(coll.at_time(2, 0)) == [("x", 1)]


def test_grouped_operators_fail_loudly_on_pair_times(spark):
    # The inherited grouped kernels order epochs with total-order machinery —
    # a lexicographic linear extension of the product order — so on Pair
    # times they must raise rather than silently emit wrong retractions.
    import pytest

    coll = BiTemporalCollection.from_pairs(
        spark, [("a", 0, 1, 1), ("a", 1, 0, 1)], "k string"
    )
    for call in (
        lambda: coll.count(["k"]),
        lambda: coll.distinct(),
        lambda: coll.threshold(["k"], lambda w: w),
        lambda: coll.reduce(["k"], lambda k, vs: vs, "v long"),
        lambda: coll.reduce_min(["k"], "k"),
        lambda: coll.reduce_max(["k"], "k"),
        lambda: coll.top_k(["k"], [F.col("k")], 1),
    ):
        with pytest.raises(NotImplementedError, match="partial order"):
            call()
