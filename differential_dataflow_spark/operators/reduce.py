"""General grouped reduction (reference ``reduce``, src/operators/reduce.rs:29-101).

The reference's contract: group by key; present the user function with the
*consolidated, value-sorted* list of ``(value, weight)`` pairs
(src/operators/reduce.rs:40-42 — sorted so min/first-k are O(1)); the function
emits an output ``(value, weight)`` list; the operator emits only the
*differences* from the previously recorded output at each epoch where the
input changed (src/operators/reduce.rs:280-287 — the
``change.extend(output.drain(..).map(negate))`` retraction recipe).

Spark realization: hash-shuffle on the key (``groupBy(keys)``) then one
vectorized ``applyInPandas`` kernel per key group that replays that key's
epochs in order. Per-key history is small (bounded per group), so the Python
work is O(changes); the heavy lifting — shuffle, spill, Arrow transfer — is
all JVM-side. Single-epoch extremum/top-k fast paths below stay entirely in
Catalyst (no Python), mirroring the reference's total-order specializations.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection

# logic: (key_tuple, [(value_tuple, weight), ...sorted]) -> [(out_tuple, weight), ...]
ReduceLogic = Callable[[tuple, list[tuple[tuple, int]]], list[tuple[tuple, int]]]


def reduce(
    coll: DiffCollection,
    keys: Sequence[str],
    logic: ReduceLogic,
    output_schema: str,
) -> DiffCollection:
    """Full multi-epoch reduce with retraction deltas.

    ``output_schema`` lists the non-key output columns, e.g.
    ``"min_v long, cnt long"``. Result payload = keys + those columns.
    """
    keys = list(keys)
    value_cols = [c for c in coll.payload_columns if c not in keys]
    full_schema = (
        ", ".join(f"{k} {t}" for k, t in _schema_of(coll, keys))
        + f", {output_schema}, {EPOCH} long, {DIFF} long"
    )

    def kernel(pdf):
        import pandas as pd

        key = tuple(pdf.iloc[0][k] for k in keys)
        multiset: dict[tuple, int] = {}
        prev_out: dict[tuple, int] = {}
        out_rows: list[tuple] = []
        for epoch, grp in pdf.sort_values(EPOCH).groupby(EPOCH, sort=True):
            for row in grp.itertuples(index=False):
                d = getattr(row, DIFF)
                val = tuple(getattr(row, c) for c in value_cols)
                w = multiset.get(val, 0) + d
                if w:
                    multiset[val] = w
                else:
                    multiset.pop(val, None)
            sorted_input = sorted(
                (v, w) for v, w in multiset.items() if w > 0
            )
            new_out: dict[tuple, int] = {}
            if sorted_input:
                for out_val, out_w in logic(key, sorted_input):
                    new_out[tuple(out_val)] = new_out.get(tuple(out_val), 0) + out_w
            for out_val, w in new_out.items():
                delta = w - prev_out.get(out_val, 0)
                if delta:
                    out_rows.append(key + out_val + (epoch, delta))
            for out_val, w in prev_out.items():
                if out_val not in new_out and w:
                    out_rows.append(key + out_val + (epoch, -w))
            prev_out = new_out
        n_out = len(full_schema.split(","))
        if not out_rows:
            return pd.DataFrame(columns=range(n_out)).astype(object)
        return pd.DataFrame(out_rows)

    out = coll.df.groupBy(*keys).applyInPandas(kernel, schema=full_schema)
    return DiffCollection(out)


def _schema_of(coll: DiffCollection, cols: Sequence[str]) -> list[tuple[str, str]]:
    dtypes = dict(coll.df.dtypes)
    return [(c, dtypes[c]) for c in cols]


def reduce_extremum(
    coll: DiffCollection,
    keys: Sequence[str],
    value: str,
    minimum: bool = True,
    single_epoch: bool = False,
) -> DiffCollection:
    """Per-key min/max (the reference's canonical reduce example,
    src/operators/reduce.rs:55-60), output weight 1.

    ``single_epoch=True`` takes the pure-Catalyst fast path (consolidate,
    filter positive accumulations, hash-aggregate min/max) — valid whenever
    all updates share one epoch, which is the batch-query case. The general
    path handles arbitrary epoch histories with retractions by recomputing the
    extremum at each per-key change point (a range join over epochs — still
    Catalyst, no Python).
    """
    keys = list(keys)
    agg = F.min if minimum else F.max
    if single_epoch:
        acc = (
            coll.df.groupBy(*keys, value)
            .agg(F.sum(DIFF).alias("__w"), F.min(EPOCH).alias(EPOCH))
            .filter(F.col("__w") > 0)
        )
        out = acc.groupBy(*keys).agg(
            agg(value).alias(value), F.min(EPOCH).alias(EPOCH)
        )
        return DiffCollection(out.withColumn(DIFF, F.lit(1).cast("long")))

    # General path: change points = distinct (key, epoch); state at each
    # change point = accumulation of updates with epoch <= point. A LEFT join
    # from the change points keeps epochs where no value survives (the key's
    # accumulation emptied) as NULL-extremum rows, so the lag-diff below emits
    # the retraction of the previous extremum — the reference's reduce
    # retracts prior output when a group vanishes
    # (src/operators/reduce.rs:280-287).
    df = coll.df
    points = df.select(*keys, EPOCH).distinct()
    updates = df.select(
        *[F.col(c).alias(f"__u_{c}") for c in keys],
        F.col(value).alias("__val"),
        F.col(EPOCH).alias("__ue"),
        F.col(DIFF).alias("__ud"),
    )
    cond = [F.col(k) == F.col(f"__u_{k}") for k in keys] + [
        F.col("__ue") <= F.col(EPOCH)
    ]
    survivors = (
        points.join(updates, cond)
        .groupBy(*keys, EPOCH, "__val")
        .agg(F.sum("__ud").alias("__w"))
        .filter(F.col("__w") > 0)
        .groupBy(*keys, EPOCH)
        .agg(agg("__val").alias(value))
    )
    state = points.join(survivors, [*keys, EPOCH], "left")
    # Emit deltas between consecutive change points per key. `value` is NULL
    # at change points where the group is empty; eqNullSafe keeps runs of
    # empty points silent while NULL→v and v→NULL transitions emit.
    w = Window.partitionBy(*keys).orderBy(EPOCH)
    with_prev = state.withColumn("__prev", F.lag(value).over(w))
    changed = with_prev.filter(~F.col("__prev").eqNullSafe(F.col(value)))
    additions = changed.filter(F.col(value).isNotNull()).select(
        *keys, value, EPOCH, F.lit(1).cast("long").alias(DIFF)
    )
    retractions = changed.filter(F.col("__prev").isNotNull()).select(
        *keys,
        F.col("__prev").alias(value),
        F.col(EPOCH),
        F.lit(-1).cast("long").alias(DIFF),
    )
    return DiffCollection(additions.unionByName(retractions))


def _require_natural_ascending(
    order_by: Sequence[Column], value_cols: Sequence[str]
) -> None:
    """The general (multi-epoch) top-k kernel ranks by the reference's
    sorted-input contract — the natural ASCENDING order of the value columns
    (src/operators/reduce.rs:40-42) — and cannot honor any other ``order_by``.
    Rather than silently returning ascending results for, say, a descending
    request, fail loudly with the two escape hatches."""

    # Compare each order_by column's repr against reprs BUILT THE SAME WAY
    # from the accepted forms (bare column / explicit .asc() / NULLS FIRST),
    # so the check tracks whatever repr format the installed PySpark uses
    # instead of hand-parsing the "Column<'...'>" wrapper (not a stable API).
    def _accepted(v: str) -> set[str]:
        return {
            str(F.col(v)),
            str(F.col(v).asc()),
            str(F.col(v).asc_nulls_first()),
        }

    exprs = [str(c) for c in order_by]
    ok = len(exprs) == len(value_cols) and all(
        e in _accepted(v) for e, v in zip(exprs, value_cols)
    )
    if not ok:
        raise ValueError(
            "top_k general (multi-epoch) path ranks ONLY by the natural "
            f"ascending order of the value columns {list(value_cols)}; got "
            f"order_by={exprs}. Either pre-map the payload so ascending "
            "natural order IS the desired ranking (e.g. negate a column for "
            "descending), or pass single_epoch=True if every update shares "
            "one epoch."
        )


def top_k(
    coll: DiffCollection,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    single_epoch: bool = True,
) -> DiffCollection:
    """First k distinct values per key in sort order, weight 1 each —
    the reference's top-k reduce idiom (src/operators/reduce.rs:55-60: keep
    the first k of the sorted input).

    ``single_epoch=True`` (default) is a pure-Catalyst fast path (consolidate
    + row_number window) that is ONLY valid when all updates share one epoch
    — on multi-epoch input it would stamp per-value min-epochs with no
    retractions. For evolving collections pass ``single_epoch=False``, which
    routes through the general pandas reduce kernel (full retraction deltas);
    that kernel ranks by the natural ascending order of the value columns
    (the reference's sorted-input contract, src/operators/reduce.rs:40-42)
    and RAISES if ``order_by`` requests anything else.
    """
    keys = list(keys)
    if not single_epoch:
        value_cols = [c for c in coll.payload_columns if c not in keys]
        _require_natural_ascending(order_by, value_cols)
        dtypes = dict(coll.df.dtypes)
        out_schema = ", ".join(f"{c} {dtypes[c]}" for c in value_cols)

        def first_k(key, sorted_input):
            return [(v, 1) for v, _w in sorted_input[:k]]

        return reduce(coll, keys, first_k, out_schema)
    value_cols = [c for c in coll.payload_columns if c not in keys]
    acc = (
        coll.df.groupBy(*keys, *value_cols)
        .agg(F.sum(DIFF).alias("__w"), F.min(EPOCH).alias(EPOCH))
        .filter(F.col("__w") > 0)
    )
    w = Window.partitionBy(*keys).orderBy(*order_by)
    out = (
        acc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(*keys, *value_cols, EPOCH, F.lit(1).cast("long").alias(DIFF))
    )
    return DiffCollection(out)
