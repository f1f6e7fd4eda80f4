"""Golden update-multiset tests for the core algebra — the reference's unit
test style (tests/join.rs:10-76, tests/reduce.rs:10-25): drive explicit
update triples through an operator, extract + sort + compare the consolidated
output triples."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection


def c(spark, updates, schema="k bigint, v bigint"):
    return DiffCollection.from_updates(spark, updates, schema)


def test_map_filter(spark):
    coll = c(spark, [(1, 10, 0, 1), (2, 20, 0, 2), (3, 30, 1, -1)])
    out = coll.filter(F.col("k") < 3).map(F.col("k"), doubled=F.col("v") * 2)
    assert out.updates() == [(1, 20, 0, 1), (2, 40, 0, 2)]


def test_concat_negate_cancellation(spark):
    a = c(spark, [(1, 10, 0, 1), (2, 20, 0, 1)])
    b = c(spark, [(1, 10, 0, 1)])
    # a - b leaves only (2, 20)
    assert a.concat(b.negate()).updates() == [(2, 20, 0, 1)]
    # a - a is empty after consolidation (zero-weight suppression)
    a.concat(a.negate()).assert_empty()


def test_consolidate_sums_and_drops_zeros(spark):
    coll = c(
        spark,
        [(1, 10, 0, 1), (1, 10, 0, 1), (1, 10, 0, -2), (2, 20, 0, 3), (2, 20, 1, -1)],
    )
    assert coll.updates() == [(2, 20, 0, 3), (2, 20, 1, -1)]


def test_flat_map_inherits_weights(spark):
    coll = c(spark, [(1, 3, 0, 2)])
    out = coll.flat_map(F.sequence(F.lit(1), F.col("v")), "x")
    assert out.updates() == [(1, 0, 2), (2, 0, 2), (3, 0, 2)]


def test_explode_weights_sum_trick(spark):
    # explode moves the value into the weight: downstream count() becomes SUM
    # (reference src/collection.rs:261-271).
    coll = c(spark, [(1, 10, 0, 1), (1, 5, 0, 2), (2, 7, 0, 1)])
    summed = coll.explode_weights(F.col("v"), F.col("k")).count(["k"], alias="total")
    assert summed.updates() == [(1, 20, 0, 1), (2, 7, 0, 1)]


def test_count_retraction_pairs_exact(spark):
    # count_total semantics (src/operators/count.rs:104-118): at each epoch
    # the old count is retracted and the new asserted.
    coll = c(
        spark,
        [(1, 0, 0, 1), (1, 1, 0, 1), (1, 2, 1, 1), (1, 0, 2, -1)],
    )
    out = coll.map(F.col("k")).count(["k"], alias="n")
    expected = sorted(
        [
            (1, 2, 0, 1),   # epoch 0: two rows -> count 2
            (1, 2, 1, -1),  # epoch 1: retract 2
            (1, 3, 1, 1),   # epoch 1: assert 3
            (1, 3, 2, -1),  # epoch 2: retract 3
            (1, 2, 2, 1),   # epoch 2: assert 2
        ]
    )
    assert out.updates() == expected


def test_count_cancels_when_group_emptied(spark):
    coll = c(spark, [(7, 0, 0, 1), (7, 0, 1, -1)])
    out = coll.map(F.col("k")).count(["k"], alias="n")
    # epoch 0: (7,1,+1); epoch 1: (7,1,-1) and no new count (group empty).
    assert out.updates() == [(7, 1, 0, 1), (7, 1, 1, -1)]


def test_distinct_and_threshold(spark):
    coll = c(spark, [(1, 0, 0, 5), (2, 0, 0, 1), (1, 0, 1, -5)])
    d = coll.map(F.col("k")).distinct(["k"])
    assert d.updates() == [(1, 0, 1), (1, 1, -1), (2, 0, 1)]
    t = coll.map(F.col("k")).threshold(
        ["k"], lambda cum: F.when(cum >= 2, 1).otherwise(0)
    )
    assert t.updates() == [(1, 0, 1), (1, 1, -1)]


def test_at_epoch_accumulation(spark):
    coll = c(spark, [(1, 10, 0, 1), (1, 10, 1, 2), (1, 10, 2, -3), (2, 5, 1, 1)])
    at1 = sorted(tuple(r) for r in coll.at_epoch(1).collect())
    assert at1 == [(1, 10, 3), (2, 5, 1)]
    at2 = sorted(tuple(r) for r in coll.at_epoch(2).collect())
    assert at2 == [(2, 5, 1)]


def test_assert_eq(spark):
    a = c(spark, [(1, 1, 0, 1), (2, 2, 0, 2)])
    b = c(spark, [(1, 1, 0, 1), (2, 2, 0, 1), (2, 2, 0, 1)])
    a.assert_eq(b)


def test_join_function_explodes_weight_and_time(spark):
    # reference join_function (src/collection.rs:300-311): diff multiplied by
    # the exploded weight, epoch joined (max) with the derived time.
    coll = DiffCollection.from_updates(
        spark, [(1, 5, 0, 1), (2, 3, 7, 2)], "k bigint, v bigint"
    )
    out = coll.join_function(F.col("v"), F.col("k") + 2, F.col("k"))
    # row (k=1): diff 5*1, epoch max(0, 3) = 3; row (k=2): diff 3*2, epoch
    # max(7, 4) = 7.
    assert out.updates() == [(1, 3, 5), (2, 7, 6)]


def test_local_checkpoint_keeps_const_epoch_fast_path(spark):
    # Regression: local_checkpoint used to drop const_epoch, silently losing
    # downstream count/threshold/reduce Catalyst fast paths (no sort-window).
    base = DiffCollection.from_df(
        spark.range(100).selectExpr("id % 5 as k")
    )
    assert base.const_epoch == 0
    ck = base.local_checkpoint()
    assert ck.const_epoch == 0
    plan = (
        ck.count(["k"], alias="n")
        .df._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan  # fast path: plain hash aggregate
    assert ck.count(["k"], alias="n").updates() == [
        (k, 20, 0, 1) for k in range(5)
    ]
