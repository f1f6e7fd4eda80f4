"""Plan IR tests: JSON round-trip + render equivalence to the direct API
(reference interactive/src/plan/mod.rs renders plans 1:1)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection
from differential_dataflow_spark.plans import Plan


def test_plan_roundtrip_and_render(spark):
    orders = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "custkey long, price double"
    )
    plan = (
        Plan.source("orders")
        .filter("price > 6")
        .map({"custkey": "custkey"})
        .count(["custkey"], alias="n")
    )
    plan2 = Plan.from_json(plan.to_json())
    got = sorted(
        tuple(r) for r in plan2.render(spark, {"orders": orders}).collect()
    )
    direct = (
        DiffCollection.from_df(orders)
        .filter(F.col("price") > 6)
        .map(F.col("custkey"))
        .count(["custkey"], alias="n")
        .updates()
    )
    assert got == direct


def test_plan_iterate_reachability(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "src long, dst long"
    )
    roots = spark.createDataFrame([(0,)], "node long")
    body = (
        Plan.source("$iter")
        .map({"src": "node"})
        .join(Plan.source("edges").map({"src": "src", "node": "dst"}), on=["src"])
        .map({"node": "node"})
        .concat(Plan.source("roots"))
        .distinct(["node"])
    )
    plan = Plan.source("roots").distinct(["node"]).iterate(body, max_iters=10)
    got = sorted(
        r.node
        for r in plan.render(spark, {"edges": edges, "roots": roots}).collect()
    )
    assert got == [0, 1, 2]
