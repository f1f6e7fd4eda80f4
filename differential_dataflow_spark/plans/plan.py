"""A small JSON-serializable logical Plan IR over DiffCollections.

Mirrors the reference's ``interactive`` crate, where rows are ``Vec<Value>``
and a ``Plan`` enum (Source / Map / Filter / Join / MultiwayJoin / Reduce /
Distinct / Concat / Negate / Iterate; interactive/src/plan/mod.rs:42-115)
renders 1:1 into dataflow operators with **no rewriting** (SURVEY.md §4.1).
Here ``render`` builds a DiffCollection pipeline and hands the result to
Catalyst — which *does* rewrite (pushdown, pruning, reordering), so the
unoptimized IR still executes an optimized physical plan. Expressions are
Spark SQL strings (`F.expr`), the dynamic-typing analogue of Value rows.

Example::

    plan = Plan.source("orders").map({"k": "o_custkey"}).count(["k"], "n")
    df = plan.render(spark, tables={"orders": orders_df})
    Plan.from_json(plan.to_json())   # round-trips
"""

from __future__ import annotations

import json
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, DiffCollection


class Plan:
    def __init__(self, op: str, **kwargs: Any):
        self.op = op
        self.args = kwargs

    # ------------------------- constructors ------------------------- #

    @staticmethod
    def source(table: str) -> "Plan":
        return Plan("source", table=table)

    def map(self, exprs: dict[str, str]) -> "Plan":
        return Plan("map", input=self, exprs=exprs)

    def filter(self, predicate: str) -> "Plan":
        return Plan("filter", input=self, predicate=predicate)

    def join(self, other: "Plan", on: Sequence[str]) -> "Plan":
        return Plan("join", left=self, right=other, on=list(on))

    def semijoin(self, other: "Plan", on: Sequence[str]) -> "Plan":
        return Plan("semijoin", left=self, right=other, on=list(on))

    def antijoin(self, other: "Plan", on: Sequence[str]) -> "Plan":
        return Plan("antijoin", left=self, right=other, on=list(on))

    def concat(self, other: "Plan") -> "Plan":
        return Plan("concat", left=self, right=other)

    def negate(self) -> "Plan":
        return Plan("negate", input=self)

    def distinct(self, keys: Sequence[str] | None = None) -> "Plan":
        return Plan("distinct", input=self, keys=list(keys) if keys else None)

    def count(self, keys: Sequence[str], alias: str = "count") -> "Plan":
        return Plan("count", input=self, keys=list(keys), alias=alias)

    def iterate(self, body: "Plan", max_iters: int = 100) -> "Plan":
        """Fixpoint of ``body`` seeded with this plan; inside ``body`` the
        loop variable is the source named ``$iter`` (the reference's
        Variable, src/operators/iterate.rs:166-221)."""
        return Plan("iterate", input=self, body=body, max_iters=max_iters)

    # ------------------------- serialization ------------------------ #

    def to_dict(self) -> dict:
        def conv(v: Any) -> Any:
            return v.to_dict() if isinstance(v, Plan) else v

        return {"op": self.op, **{k: conv(v) for k, v in self.args.items()}}

    def to_json(self) -> str:
        return json.dumps(self.to_dict())

    @staticmethod
    def from_dict(d: dict) -> "Plan":
        d = dict(d)
        op = d.pop("op")
        for k, v in d.items():
            if isinstance(v, dict) and "op" in v:
                d[k] = Plan.from_dict(v)
        return Plan(op, **d)

    @staticmethod
    def from_json(s: str) -> "Plan":
        return Plan.from_dict(json.loads(s))

    # --------------------------- rendering -------------------------- #

    def render(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        _bindings: dict[str, DiffCollection] | None = None,
    ) -> DataFrame:
        return self._render(spark, tables, _bindings or {}).df

    def _render(
        self,
        spark: SparkSession,
        tables: dict[str, DataFrame],
        bindings: dict[str, DiffCollection],
    ) -> DiffCollection:
        a = self.args
        if self.op == "source":
            name = a["table"]
            if name in bindings:
                return bindings[name]
            df = tables[name]
            if DIFF in df.columns:
                return DiffCollection(df)
            return DiffCollection.from_df(df)
        if self.op == "map":
            inp = a["input"]._render(spark, tables, bindings)
            return inp.map(**{k: F.expr(v) for k, v in a["exprs"].items()})
        if self.op == "filter":
            return a["input"]._render(spark, tables, bindings).filter(
                F.expr(a["predicate"])
            )
        if self.op in ("join", "semijoin", "antijoin"):
            left = a["left"]._render(spark, tables, bindings)
            right = a["right"]._render(spark, tables, bindings)
            return getattr(left, self.op)(right, on=a["on"])
        if self.op == "concat":
            return a["left"]._render(spark, tables, bindings).concat(
                a["right"]._render(spark, tables, bindings)
            )
        if self.op == "negate":
            return a["input"]._render(spark, tables, bindings).negate()
        if self.op == "distinct":
            return a["input"]._render(spark, tables, bindings).distinct(a["keys"])
        if self.op == "count":
            return (
                a["input"]
                ._render(spark, tables, bindings)
                .count(a["keys"], alias=a["alias"])
            )
        if self.op == "iterate":
            from differential_dataflow_spark.operators.iterate import iterate

            seed = a["input"]._render(spark, tables, bindings)
            body: Plan = a["body"]

            def logic(cur: DiffCollection) -> DiffCollection:
                return body._render(spark, tables, {**bindings, "$iter": cur})

            return iterate(seed, logic, max_iters=a["max_iters"])
        raise ValueError(f"unknown plan op: {self.op}")
