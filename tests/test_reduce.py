"""Reduce tests — sorted-values contract, output deltas per epoch
(reference src/operators/reduce.rs:29-101, tests/reduce.rs:10-25)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection


def c(spark, updates, schema="k bigint, v bigint"):
    return DiffCollection.from_updates(spark, updates, schema)


def test_reduce_min_general_kernel(spark):
    coll = c(
        spark,
        [(1, 5, 0, 1), (1, 3, 0, 1), (1, 3, 1, -1), (2, 9, 0, 1)],
    )
    # logic: emit the minimum value with weight 1 (values arrive sorted).
    out = coll.reduce(
        ["k"],
        lambda key, vals: [((vals[0][0][0],), 1)],
        output_schema="min_v bigint",
    )
    assert out.updates() == [
        (1, 3, 0, 1),   # epoch 0: min is 3
        (1, 3, 1, -1),  # epoch 1: 3 retracted ...
        (1, 5, 1, 1),   # ... min becomes 5
        (2, 9, 0, 1),
    ]


def test_reduce_output_vanishes_with_group(spark):
    coll = c(spark, [(1, 4, 0, 1), (1, 4, 1, -1)])
    out = coll.reduce(
        ["k"], lambda key, vals: [((len(vals),), 1)], output_schema="n bigint"
    )
    assert out.updates() == [(1, 1, 0, 1), (1, 1, 1, -1)]


def test_reduce_extremum_single_epoch_fast_path(spark):
    coll = c(spark, [(1, 5, 0, 1), (1, 3, 0, 2), (2, 9, 0, 1), (1, 3, 0, -2)])
    out = coll.reduce_min(["k"], "v")
    assert out.updates() == [(1, 5, 0, 1), (2, 9, 0, 1)]


def test_reduce_extremum_multi_epoch_general_path(spark):
    from differential_dataflow_spark.operators.reduce import reduce_extremum

    coll = c(spark, [(1, 5, 0, 1), (1, 3, 1, 1), (1, 3, 2, -1)])
    out = reduce_extremum(coll, ["k"], "v", minimum=True, single_epoch=False)
    assert out.updates() == [
        (1, 3, 1, 1),
        (1, 3, 2, -1),
        (1, 5, 0, 1),
        (1, 5, 1, -1),
        (1, 5, 2, 1),
    ]


def test_reduce_extremum_retracts_vanished_key(spark):
    # A key whose accumulation empties must retract its extremum — the
    # reference's reduce retracts prior output when a group vanishes
    # (src/operators/reduce.rs:280-287). Regression: the general path used to
    # drop the change point entirely, leaving (1,5,0,+1) asserted forever.
    coll = c(spark, [(1, 5, 0, 1), (1, 5, 1, -1)])
    out = coll.reduce_min(["k"], "v")
    assert out.updates() == [(1, 5, 0, 1), (1, 5, 1, -1)]
    # ... and re-asserts when the key reappears later.
    coll2 = c(spark, [(1, 5, 0, 1), (1, 5, 1, -1), (1, 7, 2, 1)])
    out2 = coll2.reduce_min(["k"], "v")
    assert out2.updates() == [(1, 5, 0, 1), (1, 5, 1, -1), (1, 7, 2, 1)]


def test_top_k_multi_epoch_general_path(spark):
    # single_epoch=False routes through the pandas reduce kernel: retractions
    # when a later epoch changes the top-k set.
    coll = c(
        spark,
        [(1, 10, 0, 1), (1, 20, 0, 1), (1, 5, 1, 1), (2, 9, 0, 1), (2, 9, 1, -1)],
    )
    out = coll.top_k(["k"], [F.col("v").asc()], k=2, single_epoch=False)
    assert out.updates() == [
        (1, 5, 1, 1),    # 5 enters the top-2 at epoch 1 ...
        (1, 10, 0, 1),
        (1, 20, 0, 1),
        (1, 20, 1, -1),  # ... evicting 20
        (2, 9, 0, 1),
        (2, 9, 1, -1),   # key 2 vanishes entirely
    ]


def test_top_k(spark):
    coll = c(
        spark,
        [(1, 10, 0, 1), (1, 20, 0, 1), (1, 30, 0, 1), (2, 1, 0, 1)],
    )
    # from_updates carries no const_epoch metadata, so the Catalyst fast path
    # (the only path honoring order_by) must be asserted explicitly; the
    # input is in fact single-epoch, so the invariant holds.
    out = coll.top_k(["k"], [F.col("v").desc()], k=2, single_epoch=True)
    assert out.updates() == [(1, 20, 0, 1), (1, 30, 0, 1), (2, 1, 0, 1)]


def test_degree_distribution(spark):
    # hello.rs / degrees.rs: count per key, then distribution of counts
    # (README.md:12-18).
    edges = c(
        spark,
        [(1, 10, 0, 1), (1, 11, 0, 1), (2, 12, 0, 1), (3, 13, 0, 1), (3, 14, 0, 1)],
        "src bigint, dst bigint",
    )
    degrees = edges.map(F.col("src")).count(["src"], alias="degree")
    dist = degrees.map(F.col("degree")).count(["degree"], alias="n_nodes")
    assert dist.updates() == [(1, 1, 0, 1), (2, 2, 0, 1)]


def test_top_k_general_path_rejects_non_natural_order(spark):
    # The multi-epoch kernel ranks by the natural ascending value order only;
    # a descending request must raise instead of silently returning ascending
    # results (the pre-guard behavior).
    import pytest

    coll = c(spark, [(1, 10, 0, 1), (1, 20, 1, 1)])
    with pytest.raises(ValueError, match="natural"):
        coll.top_k(["k"], [F.col("v").desc()], k=1, single_epoch=False)
