"""Skew layer tests: the blocked two-phase paths must emit exactly the same
update multiset as the plain operators (reference hierarchical-aggregation
idiom, src/algorithms/prefix_sum.rs:46-80)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection
from differential_dataflow_spark.operators.skew import (
    blocked_count,
    salted_two_phase,
)


def test_blocked_count_equals_plain_count(spark):
    rng = random.Random(7)
    updates = []
    # One hot key with many epochs (spanning multiple blocks), several cold
    # keys, and retractions mixed in.
    for e in range(200):
        updates.append((1, e, rng.choice([1, 1, 2, -1])))
    for k in range(2, 12):
        for e in rng.sample(range(200), 5):
            updates.append((k, e, 1))
    coll = DiffCollection.from_updates(
        spark, [(k, e, d) for (k, e, d) in updates], "k bigint"
    )
    plain = coll.count(["k"], alias="n").updates()
    blocked = blocked_count(coll, ["k"], alias="n", epoch_block=16).updates()
    assert blocked == plain


def test_blocked_count_single_block_and_negative_cum(spark):
    # Accumulation that dips through zero: retraction pairs must skip the
    # zero state exactly like the plain path.
    coll = DiffCollection.from_updates(
        spark,
        [(1, 0, 2), (1, 5, -2), (1, 9, 3)],
        "k bigint",
    )
    plain = coll.count(["k"], alias="n").updates()
    blocked = blocked_count(coll, ["k"], alias="n", epoch_block=4).updates()
    assert blocked == plain == [(1, 2, 0, 1), (1, 2, 5, -1), (1, 3, 9, 1)]


def test_salted_two_phase_sum(spark):
    df = spark.range(10_000).select(
        (F.col("id") % 3).alias("k"), (F.col("id") % 7).alias("v")
    )
    got = {
        (r.k, r.total)
        for r in salted_two_phase(df, ["k"], "v", buckets=16).collect()
    }
    want = {
        (r.k, r.total)
        for r in df.groupBy("k").agg(F.sum("v").alias("total")).collect()
    }
    assert got == want
