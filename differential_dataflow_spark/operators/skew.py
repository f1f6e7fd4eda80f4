"""Skew-resistant two-phase aggregation: salting + blocked prefix cumulation.

The reference's skew idiom is hierarchical aggregation — reductions over
power-of-two ranges so no single group sees unbounded fanout
(src/algorithms/prefix_sum.rs:46-80). Spark's hash aggregates already run
two-phase (map-side partial aggregation before the shuffle), so a plain
``groupBy().agg(sum)`` tolerates hot keys natively: each map task emits one
partial row per key. What Spark does NOT protect are:

1. **Window cumulations** — ``Window.partitionBy(key).orderBy(epoch)`` has no
   partial phase: every row of a hot key lands in one task and sorts there.
   This is exactly the incremental ``count``/``threshold`` path, where a hot
   conversation with millions of distinct epochs serializes on one core.
   :func:`blocked_count` fixes it with a two-phase blocked prefix sum:
   within-block cumulation (partitioned by ``(key, epoch-block)``) plus a
   per-key cumulation over block totals (one row per block) — both windows
   see bounded partitions.
2. **Holistic / non-algebraic aggregates** (collect_list, exact quantiles):
   no map-side combine. :func:`salted_two_phase` decomposes any
   associative-commutative aggregate into an explicit salt phase.

Both paths emit exactly the same update multiset as the unsalted operators —
pytest asserts equality against ``DiffCollection.count`` on random
multi-epoch histories.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection


def salted_two_phase(
    df: DataFrame,
    keys: Sequence[str],
    agg_col: str,
    alias: str = "total",
    buckets: int = 64,
    salt_col: Column | None = None,
) -> DataFrame:
    """Explicit salted two-phase SUM: phase 1 aggregates per ``(keys, salt)``
    with ``salt = xxhash64(whole row spread) % buckets`` (or a caller salt);
    phase 2 aggregates the ≤ ``buckets`` partials per key.

    For built-in algebraic aggregates Spark's own partial aggregation makes
    this redundant; use it where partial aggregation is unavailable (holistic
    aggregates rewritten as algebraic pieces, pre-bucketed data read without
    a combine stage) or to cap reduce-side group size explicitly.
    """
    keys = list(keys)
    if salt_col is None:
        # Spread rows of the same key deterministically using every non-key
        # column (falls back to the aggregate column alone).
        others = [c for c in df.columns if c not in keys] or [agg_col]
        salt_col = F.pmod(F.xxhash64(*others), F.lit(buckets))
    phase1 = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(F.sum(agg_col).alias("__partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias(alias))


def blocked_count(
    coll: DiffCollection,
    keys: Sequence[str],
    alias: str = "count",
    epoch_block: int = 1024,
) -> DiffCollection:
    """Incremental per-key count with retraction pairs — identical semantics
    to ``DiffCollection.count`` (count_total, src/operators/count.rs:81-123)
    — computed skew-resistantly for keys with many distinct epochs.

    Phases (the prefix_sum.rs:46-80 range decomposition, transposed):

    1. per ``(key, epoch)`` delta — hash aggregate, map-side combined;
    2. within-block running sum — window over ``(key, floor(epoch/block))``:
       partition size ≤ block span;
    3. per-key running sum over BLOCK TOTALS — window over ``key``: partition
       size = #blocks, i.e. epochs/block;
    4. cum = prior-blocks offset + within-block cum; retraction pairs emitted
       with the same single-pass pair-explode as the unsalted path.

    A key with 10^6 epochs costs one 10^6-row sort on one core in the plain
    window plan; here it is 10^6/1024 bounded sorts plus one ~10^3-row sort.
    """
    keys = list(keys)
    if coll.const_epoch is not None:
        # Degenerate single-epoch input: the plain hash-agg fast path is
        # already two-phase and skew-proof.
        return coll.count(keys, alias=alias)
    per_epoch = (
        coll.df.groupBy(*keys, EPOCH)
        .agg(F.sum(DIFF).alias("__delta"))
        .filter(F.col("__delta") != 0)
        .withColumn("__blk", F.floor(F.col(EPOCH) / epoch_block))
    )
    w_in = Window.partitionBy(*keys, "__blk").orderBy(EPOCH)
    within = per_epoch.withColumn("__in_cum", F.sum("__delta").over(w_in))
    # Block totals: one row per (key, block); the per-key window below only
    # sees #blocks rows regardless of how hot the key is.
    totals = per_epoch.groupBy(*keys, "__blk").agg(
        F.sum("__delta").alias("__blk_total")
    )
    w_blk = Window.partitionBy(*keys).orderBy("__blk")
    offsets = totals.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__blk_total").over(
                w_blk.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).withColumn("__has_prev_blk", F.row_number().over(w_blk) > 1)
    joined = within.join(
        offsets.select(*keys, "__blk", "__offset", "__has_prev_blk"),
        [*keys, "__blk"],
    )
    cum = (F.col("__offset") + F.col("__in_cum")).cast("long")
    prev_in = F.lag("__in_cum").over(w_in)
    # Previous cumulative value: within-block predecessor if any, else the
    # block offset (= last value of the previous block); "no previous at all"
    # = first row of the first block.
    prev = F.when(
        prev_in.isNotNull(), (F.col("__offset") + prev_in).cast("long")
    ).otherwise(
        F.when(F.col("__has_prev_blk"), F.col("__offset").cast("long"))
    )
    # Window expressions can't sit inside a generator — stage them as columns
    # first, then pair-explode (same single-pass trick as the unsalted path).
    staged = joined.withColumn("__cum", cum).withColumn("__prev", prev)
    pair = F.array(
        F.when(
            F.col("__cum") != 0,
            F.struct(
                F.col("__cum").alias(alias), F.lit(1).cast("long").alias(DIFF)
            ),
        ),
        F.when(
            F.col("__prev").isNotNull() & (F.col("__prev") != 0),
            F.struct(
                F.col("__prev").alias(alias), F.lit(-1).cast("long").alias(DIFF)
            ),
        ),
    )
    out = (
        staged.select(*keys, F.col(EPOCH), F.explode(pair).alias("__e"))
        .filter(F.col("__e").isNotNull())
        .select(*keys, F.col(f"__e.{alias}"), F.col(EPOCH), F.col(f"__e.{DIFF}"))
    )
    return DiffCollection(out)
