"""Worst-case-optimal multiway join: the dogs³ propose/validate/count triad.

Reference (dogsdogsdogs crate): for each prefix tuple, every participating
relation can

- ``count_extensions`` — report how many extensions it offers the prefix
  (dogsdogsdogs/src/operators/count.rs:9-35);
- ``propose`` — enumerate its extensions for the prefix
  (dogsdogsdogs/src/operators/propose.rs:9-36);
- ``validate`` — keep only proposed extensions it also contains
  (dogsdogsdogs/src/operators/validate.rs:11-36).

The WCO strategy extends prefixes one variable at a time: the relation
offering the FEWEST extensions proposes, every other relation validates —
bounding intermediate size by the fractional-edge-cover (AGM) bound instead
of a join plan's worst intermediate.

Spark realization: prefixes and relations are DataFrames; count is an
aggregate join, propose an inner join, validate a semijoin — all Catalyst
equi-joins, so AQE handles the physical strategy. The per-prefix min-count
arbitration (which relation proposes) is a row-wise ``least`` + comparison,
not a driver decision, so different prefixes can be extended by different
relations in the same pass — exactly the reference's per-tuple arbitration.

``triangles`` composes the triad into the canonical WCO query
(dogsdogsdogs/examples/delta_query.rs shape): enumerate (a, b, c) with
edges (a,b), (b,c), (a,c).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_extensions(
    prefixes: DataFrame,
    relation: DataFrame,
    on: Sequence[str],
    ext: str,
    alias: str,
) -> DataFrame:
    """Per prefix, how many ``ext`` values the relation offers via the key
    columns ``on`` (count.rs:9-35). Prefixes with no match count 0."""
    counts = relation.groupBy(*on).agg(F.count_distinct(ext).alias(alias))
    return prefixes.join(counts, list(on), "left").fillna({alias: 0})


def propose(
    prefixes: DataFrame,
    relation: DataFrame,
    on: Sequence[str],
    ext: str,
) -> DataFrame:
    """Extend each prefix with the relation's distinct ``ext`` values for its
    key (propose.rs:9-36)."""
    exts = relation.select(*on, ext).distinct()
    return prefixes.join(exts, list(on), "inner")


def validate(
    extended: DataFrame,
    relation: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Keep extended tuples whose ``on`` columns appear in the relation
    (validate.rs:11-36) — a distinct semijoin."""
    return extended.join(
        relation.select(*on).distinct(), list(on), "left_semi"
    )


def extend_min_relation(
    prefixes: DataFrame,
    relations: Sequence[tuple[DataFrame, Sequence[str], str]],
    ext_name: str,
) -> DataFrame:
    """One WCO extension step: each prefix is extended by the relation
    offering it the fewest extensions; the remaining relations validate.

    ``relations`` is a list of ``(df, on_cols, ext_col)`` — each df maps
    prefix key columns ``on_cols`` to candidate values of the new variable in
    ``ext_col``. Returns prefixes + ``ext_name``.
    """
    counted = prefixes
    for i, (rel, on, ext) in enumerate(relations):
        counted = count_extensions(counted, rel, on, ext, f"__c{i}")
    count_cols = [F.col(f"__c{i}") for i in range(len(relations))]
    counted = counted.withColumn("__min", F.least(*count_cols))
    # Arbitrate per prefix: the FIRST relation achieving the min proposes
    # (deterministic tie-break by relation index, as in the reference).
    arbiter = F.lit(len(relations) - 1)
    for i in reversed(range(len(relations) - 1)):
        arbiter = F.when(F.col(f"__c{i}") == F.col("__min"), F.lit(i)).otherwise(
            arbiter
        )
    counted = counted.withColumn("__who", arbiter).filter(F.col("__min") > 0)
    out = None
    for i, (rel, on, ext) in enumerate(relations):
        part = counted.filter(F.col("__who") == i)
        extended = propose(part, rel, on, ext).withColumnRenamed(ext, ext_name)
        for j, (vrel, von, vext) in enumerate(relations):
            if j == i:
                continue
            extended = validate(
                extended.withColumnRenamed(ext_name, vext), vrel, [*von, vext]
            ).withColumnRenamed(vext, ext_name)
        out = extended if out is None else out.unionByName(extended)
    drop = [f"__c{i}" for i in range(len(relations))] + ["__min", "__who"]
    return out.drop(*drop)


def triangles(edges: DataFrame) -> DataFrame:
    """All triangles (a, b, c) with directed edges (a,b), (b,c), (a,c) —
    the canonical worst-case-optimal query. Prefixes are the (a, b) edges;
    c is extended WCO-style: edges-from-b and edges-from-a each count and
    the smaller proposes, the other validates."""
    e = edges.select("src", "dst").distinct()
    prefixes = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    rel_bc = e.select(F.col("src").alias("b"), F.col("dst").alias("__ext"))
    rel_ac = e.select(F.col("src").alias("a"), F.col("dst").alias("__ext"))
    out = extend_min_relation(
        prefixes,
        [(rel_bc, ["b"], "__ext"), (rel_ac, ["a"], "__ext")],
        ext_name="c",
    )
    return out.select("a", "b", "c")
