"""Join semantics tests — golden multisets from the reference's shapes
(tests/join.rs:10-76): diffs multiply, epochs join (max), semijoin weights
multiply by key weight, antijoin = self − semijoin(distinct other)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection


def c(spark, updates, schema):
    return DiffCollection.from_updates(spark, updates, schema)


def test_join_multiplies_diffs_and_joins_epochs(spark):
    left = c(spark, [(0, 1, 0, 1), (1, 3, 0, 1)], "k bigint, v1 bigint")
    right = c(spark, [(0, 10, 0, 2), (0, 11, 1, 1), (2, 20, 0, 1)], "k bigint, v2 bigint")
    out = left.join(right, on=["k"])
    assert out.updates() == [
        (0, 1, 10, 0, 2),  # diff = 1*2, epoch max(0,0)
        (0, 1, 11, 1, 1),  # epoch max(0,1) = 1
    ]


def test_join_retraction_flows_through(spark):
    # Retraction on one side retracts the joined outputs (r1 * r2 = -1).
    left = c(spark, [(0, 1, 0, 1), (0, 1, 2, -1)], "k bigint, v1 bigint")
    right = c(spark, [(0, 10, 0, 1)], "k bigint, v2 bigint")
    out = left.join(right, on=["k"])
    assert out.updates() == [(0, 1, 10, 0, 1), (0, 1, 10, 2, -1)]
    assert sorted(tuple(r) for r in out.at_epoch(2).collect()) == []


def test_semijoin_weights(spark):
    rel = c(spark, [(0, 100, 0, 1), (1, 101, 0, 3), (2, 102, 0, 1)], "k bigint, v bigint")
    keys = c(spark, [(0, 0, 2), (1, 0, 1)], "k bigint")
    out = rel.semijoin(keys, on=["k"])
    assert out.updates() == [(0, 100, 0, 2), (1, 101, 0, 3)]


def test_antijoin(spark):
    rel = c(spark, [(0, 100, 0, 1), (1, 101, 0, 1), (2, 102, 0, 1)], "k bigint, v bigint")
    other = c(spark, [(0, 0, 1), (1, 0, 1)], "k bigint")
    out = rel.antijoin(other.distinct(), on=["k"])
    assert out.updates() == [(2, 102, 0, 1)]


def test_join_scale_cancellation(spark):
    # tests/join.rs:79-103 shape: a pipeline whose output fully cancels must
    # consolidate to empty at every epoch.
    n = 10_000
    base = DiffCollection.from_df(
        spark.range(n).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    )
    plus = base.join(base.map(F.col("k"), w=F.col("v") + 1), on=["k"])
    minus = base.join(base.map(F.col("k"), w=F.col("v") + 1), on=["k"]).negate()
    plus.concat(minus).assert_empty()


def test_join_map_projection(spark):
    left = c(spark, [(0, 2, 0, 1)], "k bigint, a bigint")
    right = c(spark, [(0, 5, 0, 1)], "k bigint, b bigint")
    out = left.join(right, on=["k"]).map(product=F.col("a") * F.col("b"))
    assert out.updates() == [(10, 0, 1)]
