"""Upsert arrangement (reference src/operators/arrange/upsert.rs:1-33,138).

The reference converts a stream of ``(key, Option<val>, time)`` upserts —
no explicit retractions; latest value wins, ``None`` deletes — into an
arranged collection by synthesizing the retraction of the previous value.
Ties at equal times resolve to the greatest value
(src/operators/arrange/upsert.rs:16-24); we make ordering fully deterministic
with an explicit tiebreak column.

Batch form: the collection at the end of the stream is simply the last
non-null value per key — one ``max_by(struct(value), struct(ts, tiebreak))``
hash aggregate, no Python. The epoch-by-epoch update stream (retraction
pairs per overwrite) is the streaming kernel in streaming/kernels.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection


def upsert_latest(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    order_by: Sequence[Column | str],
    epoch: int = 0,
) -> DiffCollection:
    """Last-writer-wins: the arranged collection after all upserts.

    ``order_by`` defines "latest" (e.g. ``[ts, event_id]``); rows where all
    ``value_cols`` are null are deletes. Pure Catalyst: max_by over a struct.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    ord_struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    aggs = [
        F.max_by(F.col(c), ord_struct).alias(c) for c in value_cols
    ]
    latest = df.groupBy(*keys).agg(*aggs)
    # Drop keys whose final state is a delete (all value columns null).
    alive = latest.filter(F.greatest(*[F.col(c).isNotNull() for c in value_cols], F.lit(False)))
    return DiffCollection.from_df(alive, epoch=epoch)


def upsert_update_stream(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    epoch_col: str,
    order_by: Sequence[Column | str],
) -> DiffCollection:
    """Epoch-granular upsert semantics: for each key, at each epoch where its
    latest value changes, retract the previous value and assert the new one —
    the batch analogue of the reference's synthesized retractions
    (src/operators/arrange/upsert.rs:1-33). Pure Catalyst window pipeline:

    1. latest value per (key, epoch) via max_by;
    2. lag over epochs per key gives the previous latest;
    3. emit (new, +1) where changed, (prev, -1) where a previous existed.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    ord_struct = F.struct(*[F.col(c) if isinstance(c, str) else c for c in order_by])
    per_epoch = df.groupBy(*keys, epoch_col).agg(
        *[F.max_by(F.col(c), ord_struct).alias(c) for c in value_cols]
    )
    w = Window.partitionBy(*keys).orderBy(epoch_col)
    val = F.struct(*value_cols)
    with_prev = per_epoch.withColumn("__prev", F.lag(val).over(w))
    changed = with_prev.filter(
        F.col("__prev").isNull() | (F.col("__prev") != val)
    )
    additions = changed.filter(
        F.greatest(*[F.col(c).isNotNull() for c in value_cols], F.lit(False))
    ).select(
        *keys,
        *value_cols,
        F.col(epoch_col).cast("long").alias(EPOCH),
        F.lit(1).cast("long").alias(DIFF),
    )
    retractions = changed.filter(F.col("__prev").isNotNull()).select(
        *keys,
        *[F.col(f"__prev.{c}").alias(c) for c in value_cols],
        F.col(epoch_col).cast("long").alias(EPOCH),
        F.lit(-1).cast("long").alias(DIFF),
    )
    # A retraction row whose previous state was itself a delete carries nulls;
    # drop those (nothing to retract).
    retractions = retractions.filter(
        F.greatest(*[F.col(c).isNotNull() for c in value_cols], F.lit(False))
    )
    return DiffCollection(additions.unionByName(retractions))
