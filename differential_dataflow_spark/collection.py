"""DiffCollection — the weighted, timestamped multiset ("collection").

Semantics follow the reference's ``Collection<G, D, R>``: an unordered
multiset of payload records evolving over logical time, represented physically
as update triples ``(data, time, diff)`` (reference: src/collection.rs:39-46).
Here a collection is a DataFrame whose columns are the payload plus two
reserved columns:

- ``epoch: long`` — the logical time (totally ordered outer timestamp;
  reference: src/collection.rs:15). Iterative scopes add an ``iter`` column
  (the ``Product<T, u64>`` nested coordinate, reference:
  src/operators/iterate.rs:36-37) as ordinary payload.
- ``diff: long`` — the multiplicity change (reference: src/difference.rs:25-53).

The contents *at* epoch ``t`` is the sum of ``diff`` over rows with
``epoch <= t``. Consolidated multiset equality of ``(data, epoch, diff)`` is
the correctness contract (SURVEY.md §5).

Everything here is Catalyst-native: element-wise operators are projections /
filters, ``consolidate`` is a hash aggregate, joins are equi-joins with
multiplied weights, and the incremental grouped operators (``count``,
``threshold``, ``distinct``) are window-function cumulations that emit
retraction pairs ``(old, -1), (new, +1)`` exactly like the reference's
total-order fast paths (src/operators/count.rs:81-123,
src/operators/threshold.rs:20-195). No per-row Python anywhere; the general
``reduce`` (arbitrary grouped logic over sorted values, reference:
src/operators/reduce.rs:29-101) is the single Arrow/pandas kernel.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

EPOCH = "epoch"
DIFF = "diff"
RESERVED = (EPOCH, DIFF)


def _as_column(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


class DiffCollection:
    """A weighted update-triple collection backed by a DataFrame.

    ``const_epoch`` is static metadata: when not None, every update in the
    collection is known to carry this single epoch (the batch-query case —
    the whole input loaded at time 0). Operators propagate it, and the
    grouped operators (count/threshold/distinct/reduce extrema) use it to
    take a plain hash-aggregate fast path instead of the incremental
    sort-window machinery — the analogue of the reference's total-order
    specializations being cheaper than the general lattice paths
    (src/operators/count.rs:30, src/operators/threshold.rs:20).
    """

    def __init__(
        self,
        df: DataFrame,
        const_epoch: int | None = None,
        consolidated: bool = False,
    ):
        missing = [c for c in RESERVED if c not in df.columns]
        if missing:
            raise ValueError(
                f"DiffCollection DataFrame must carry {RESERVED}; missing {missing}. "
                "Use DiffCollection.from_df to lift a plain DataFrame."
            )
        # Canonical column order: payload first, then (epoch, diff).
        payload = [c for c in df.columns if c not in RESERVED]
        self.df = df.select(*payload, EPOCH, DIFF)
        self.const_epoch = const_epoch
        # Static metadata: True when the stream is known to hold at most one
        # update per (data, epoch) with nonzero diff — the output contract of
        # consolidate() and of the grouped operators. consolidate() is then a
        # no-op, mirroring how the reference's arranged outputs are already
        # consolidated and re-consolidation is free.
        self.consolidated = consolidated
        # Carry any tracked-checkpoint handle through the re-projection so
        # session.release_checkpoint(coll.df) still frees the blocks.
        if hasattr(df, "_ckpt_rdds"):
            self.df._ckpt_rdds = df._ckpt_rdds

    def _same_epoch(self, df: DataFrame) -> "DiffCollection":
        """Wrap a derived DataFrame that did not touch the epoch column."""
        return DiffCollection(df, const_epoch=self.const_epoch)

    # ------------------------------------------------------------------ #
    # Construction
    # ------------------------------------------------------------------ #

    @classmethod
    def from_df(
        cls,
        df: DataFrame,
        epoch: int | Column = 0,
        diff: int | Column = 1,
    ) -> "DiffCollection":
        """Lift a plain DataFrame into a collection: every row becomes an
        insertion (diff=+1 by default) at ``epoch`` (reference
        ``new_collection_from``, src/input.rs:80-111)."""
        e = F.lit(epoch).cast("long") if isinstance(epoch, int) else epoch.cast("long")
        d = F.lit(diff).cast("long") if isinstance(diff, int) else diff.cast("long")
        lifted = df.withColumn(EPOCH, e).withColumn(DIFF, d)
        if hasattr(df, "_ckpt_rdds"):
            lifted._ckpt_rdds = df._ckpt_rdds
        return cls(lifted, const_epoch=epoch if isinstance(epoch, int) else None)

    @classmethod
    def from_updates(
        cls,
        spark: SparkSession,
        updates: Iterable[tuple],
        schema: str,
    ) -> "DiffCollection":
        """Build from explicit update triples for tests; ``schema`` describes
        payload columns only, e.g. ``"k long, v long"``. Each update is
        ``(*payload, epoch, diff)`` — the exact shape of the reference's test
        inputs (tests/join.rs:14-22)."""
        full_schema = f"{schema}, {EPOCH} long, {DIFF} long"
        return cls(spark.createDataFrame(list(updates), schema=full_schema))

    @property
    def payload_columns(self) -> list[str]:
        return [c for c in self.df.columns if c not in RESERVED]

    # ------------------------------------------------------------------ #
    # Element-wise operators (reference src/collection.rs:77-271) — pure
    # Catalyst projections/filters; predicate pushdown & column pruning free.
    # ------------------------------------------------------------------ #

    def map(self, *cols: Column | str, **named: Column | str) -> "DiffCollection":
        """Transform the payload, keeping (epoch, diff)
        (reference ``map``, src/collection.rs:77-84)."""
        exprs = [_as_column(c) for c in cols]
        exprs += [_as_column(c).alias(name) for name, c in named.items()]
        return self._same_epoch(self.df.select(*exprs, F.col(EPOCH), F.col(DIFF)))

    def filter(self, predicate: Column | str) -> "DiffCollection":
        """Keep records satisfying the predicate
        (reference ``filter``, src/collection.rs:163-168)."""
        return self._same_epoch(self.df.filter(predicate))

    def flat_map(self, array_expr: Column, *field_aliases: str) -> "DiffCollection":
        """0..n outputs per record, each inheriting (epoch, diff)
        (reference ``flat_map``, src/collection.rs:135-143).

        ``array_expr`` must be an array column; each element becomes a row.
        If elements are structs, ``field_aliases`` selects struct fields into
        top-level columns; otherwise a single alias names the element column.
        """
        exploded = self.df.select(
            F.explode(array_expr).alias("__elem"), F.col(EPOCH), F.col(DIFF)
        )
        if len(field_aliases) <= 1:
            alias = field_aliases[0] if field_aliases else "value"
            out = exploded.select(F.col("__elem").alias(alias), EPOCH, DIFF)
        else:
            out = exploded.select(
                *[F.col(f"__elem.{f}").alias(f) for f in field_aliases], EPOCH, DIFF
            )
        return self._same_epoch(out)

    def concat(self, *others: "DiffCollection") -> "DiffCollection":
        """Multiset addition: union-all of update streams
        (reference ``concat``/``concatenate``, src/collection.rs:196-235)."""
        df = self.df
        for o in others:
            df = df.unionByName(o.df)
        epochs = {self.const_epoch, *(o.const_epoch for o in others)}
        const = epochs.pop() if len(epochs) == 1 else None
        return type(self)(df, const_epoch=const)

    def negate(self) -> "DiffCollection":
        """Negate all diffs; set difference is ``a.concat(b.negate())``
        (reference ``negate``, src/collection.rs:627-631)."""
        return self._same_epoch(self.df.withColumn(DIFF, -F.col(DIFF)))

    def explode_weights(
        self, weight_expr: Column, *payload: Column | str, **named: Column | str
    ) -> "DiffCollection":
        """Move an aggregatable value into the weight: output diff =
        ``weight_expr * diff`` (reference ``explode``, src/collection.rs:261-271
        — the key trick that turns downstream ``count`` into SUM).

        The remaining payload is given by ``payload``/``named`` projections.
        Weight expressions are cast to long; scale fractional measures first
        (e.g. price in cents) exactly as the reference packs them into integer
        difference types (tpchlike/src/queries/query01.rs:45-58).
        """
        exprs = [_as_column(c) for c in payload]
        exprs += [_as_column(c).alias(n) for n, c in named.items()]
        return self._same_epoch(
            self.df.select(
                *exprs,
                F.col(EPOCH),
                (weight_expr.cast("long") * F.col(DIFF)).alias(DIFF),
            )
        )

    def join_function(
        self, weight_expr: Column, epoch_expr: Column, *payload, **named
    ) -> "DiffCollection":
        """``explode`` that also joins each update's time with a derived time
        (reference ``join_function``, src/collection.rs:300-311): output diff
        = ``weight_expr * diff``, output epoch = ``max(epoch, epoch_expr)``."""
        return self.explode_weights(weight_expr, *payload, **named).delay(
            epoch_expr
        )

    def delay(self, new_epoch: Column) -> "DiffCollection":
        """Advance update timestamps with a monotonic function
        (reference ``delay``, src/collection.rs:405-421)."""
        return DiffCollection(
            self.df.withColumn(EPOCH, F.greatest(F.col(EPOCH), new_epoch.cast("long")))
        )

    def inspect(self, tag: str = "inspect", n: int = 20) -> "DiffCollection":
        """Side-effecting observation (reference ``inspect``,
        src/collection.rs:450-479). Debug helper; not for hot paths."""
        print(f"-- {tag} --")
        self.df.show(n, truncate=False)
        return self

    # ------------------------------------------------------------------ #
    # Consolidation (reference src/operators/consolidate.rs:16-63)
    # ------------------------------------------------------------------ #

    def consolidate(self) -> "DiffCollection":
        """Canonical form: at most one update per (data, epoch) with summed
        diff, zeros dropped. Physically: hash-shuffle on all payload columns +
        epoch, combine (Spark does map-side partial aggregation — the
        reference's ``consolidate_stream`` best-effort pass — automatically),
        filter zero weights (src/consolidation.rs:35-78 cancellation).

        A no-op (no exchange) when the stream is statically known
        consolidated — the output of consolidate itself and of the grouped
        operators."""
        if self.consolidated:
            return self
        keys = self.payload_columns + [EPOCH]
        out = (
            self.df.groupBy(*keys)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        return type(self)(
            out, const_epoch=self.const_epoch, consolidated=True
        )

    def assert_empty(self) -> None:
        """Consolidate; raise if any update survives
        (reference ``assert_empty``, src/collection.rs:529-537)."""
        bad = self.consolidate().df.limit(1).collect()
        if bad:
            raise AssertionError(f"collection not empty: {bad}")

    def assert_eq(self, other: "DiffCollection") -> None:
        """Multiset equality at every epoch
        (reference ``assert_eq``, src/collection.rs:662-670)."""
        self.concat(other.negate()).assert_empty()

    # ------------------------------------------------------------------ #
    # Joins (reference src/operators/join.rs) — equi-joins on key columns,
    # output diff = diff_l * diff_r, output epoch = max(epoch_l, epoch_r)
    # (the lattice join of totally ordered times, src/operators/join.rs:697-755).
    # ------------------------------------------------------------------ #

    def join(
        self,
        other: "DiffCollection",
        on: Sequence[str],
        broadcast_other: bool = False,
    ) -> "DiffCollection":
        """Incremental inner equi-join (reference src/operators/join.rs:55-64).

        Batch evaluation of the differential join: the per-key cross-product
        of the two update histories, with epochs joined (max) and diffs
        multiplied, is exactly the update stream of the joined collection —
        the ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB expansion collapses to this cross-product.
        Catalyst picks broadcast/sort-merge via AQE; pass
        ``broadcast_other=True`` to pin a small dimension side.
        """
        on = list(on)
        left = self.df
        lpay = [c for c in self.payload_columns if c not in on]
        rpay = [c for c in other.payload_columns if c not in on]
        overlap = set(lpay) & set(rpay)
        if overlap:
            raise ValueError(f"non-key payload columns overlap: {overlap}; rename first")
        right = other.df
        if broadcast_other:
            right = F.broadcast(right)
        l = left.alias("l")
        r = right.alias("r")
        joined = l.join(r, on, "inner").select(
            *on,
            *[F.col(f"l.{c}") for c in lpay],
            *[F.col(f"r.{c}") for c in rpay],
            F.greatest(F.col(f"l.{EPOCH}"), F.col(f"r.{EPOCH}")).alias(EPOCH),
            (F.col(f"l.{DIFF}") * F.col(f"r.{DIFF}")).alias(DIFF),
        )
        const = (
            max(self.const_epoch, other.const_epoch)
            if self.const_epoch is not None and other.const_epoch is not None
            else None
        )
        return DiffCollection(joined, const_epoch=const)

    def semijoin(
        self,
        other: "DiffCollection",
        on: Sequence[str],
        broadcast_other: bool = False,
    ) -> "DiffCollection":
        """Keep records whose key appears in ``other``; diffs multiply by the
        other side's key weight (reference src/operators/join.rs:119-120,
        171-176: semijoin = join against ``other.map(|k| (k, ()))``)."""
        keys_only = other.map(*[F.col(c) for c in on])
        return self.join(keys_only, on, broadcast_other=broadcast_other)

    def antijoin(
        self,
        other: "DiffCollection",
        on: Sequence[str],
        broadcast_other: bool = False,
    ) -> "DiffCollection":
        """``self − semijoin(other)``; ``other`` must be distinct for standard
        semantics (reference src/operators/join.rs:152-153,178-181)."""
        return self.concat(
            self.semijoin(other, on, broadcast_other=broadcast_other).negate()
        )

    # ------------------------------------------------------------------ #
    # Grouped operators — total-order incremental semantics via window
    # cumulations (reference src/operators/count.rs, threshold.rs).
    # ------------------------------------------------------------------ #

    def count(
        self, keys: Sequence[str], alias: str = "count"
    ) -> "DiffCollection":
        """Per-key sum of weights → collection of ``(key, count)`` records.

        Incremental semantics of ``count_total`` (src/operators/count.rs:81-123):
        at each epoch where a key's accumulation changes, retract the previous
        ``(key, old_count)`` (diff −1) and assert ``(key, new_count)``
        (diff +1). Implemented as a hash aggregate per (key, epoch) followed by
        a per-key cumulative window — all JVM-side, whole-stage codegen'd.
        Zero counts are not represented (empty groups vanish, as in the
        reference where zero-weight updates are suppressed).

        Single-epoch collections (const_epoch set) take a plain hash
        aggregate — the window machinery only exists to order multi-epoch
        histories.
        """
        if self.const_epoch is not None:
            keys = list(keys)
            out = (
                self.df.groupBy(*keys)
                .agg(F.sum(DIFF).alias(alias))
                .filter(F.col(alias) != 0)
                .select(
                    *keys,
                    F.col(alias),
                    F.lit(self.const_epoch).cast("long").alias(EPOCH),
                    F.lit(1).cast("long").alias(DIFF),
                )
            )
            return DiffCollection(
                out, const_epoch=self.const_epoch, consolidated=True
            )
        return self._accumulate(keys, F.col("__cum"), alias)

    def sum_weights(self, keys: Sequence[str], alias: str = "sum") -> "DiffCollection":
        """Alias of count(): with ``explode_weights`` upstream this is SUM
        (reference idiom: explode + count, tpchlike/src/queries/query01.rs)."""
        return self.count(keys, alias=alias)

    def distinct(self, keys: Sequence[str] | None = None) -> "DiffCollection":
        """Multiplicity → 1 for any key with positive accumulation
        (reference ``distinct``, src/operators/reduce.rs:104-189 /
        ``distinct_total``, src/operators/threshold.rs)."""
        if keys is None:
            keys = self.payload_columns
        return self.threshold(keys, lambda cum: F.when(cum > 0, 1).otherwise(0))

    def threshold(
        self, keys: Sequence[str], weight_fn: Callable[[Column], Column]
    ) -> "DiffCollection":
        """Transform each key's total weight through ``weight_fn``; output is
        the key with multiplicity ``weight_fn(total)`` (reference
        ``threshold``, src/operators/reduce.rs:104-140; incremental semantics
        of ``threshold_total``, src/operators/threshold.rs:20-195: emit the
        *difference* of ``f(new)−f(old)`` per epoch).

        Single-epoch fast path: one hash aggregate emitting
        ``f(total) − f(0)`` directly (the general path's first change point).
        """
        keys = list(keys)
        if self.const_epoch is not None:
            total = (
                self.df.groupBy(*keys)
                .agg(F.sum(DIFF).alias("__cum"))
                .filter(F.col("__cum") != 0)
            )
            new_w = weight_fn(F.col("__cum")).cast("long")
            zero_w = weight_fn(F.lit(0)).cast("long")
            out = (
                total.withColumn(DIFF, new_w - zero_w)
                .filter(F.col(DIFF) != 0)
                .select(
                    *keys,
                    F.lit(self.const_epoch).cast("long").alias(EPOCH),
                    F.col(DIFF),
                )
            )
            return DiffCollection(
                out, const_epoch=self.const_epoch, consolidated=True
            )
        per_epoch = (
            self.df.groupBy(*keys, EPOCH)
            .agg(F.sum(DIFF).alias("__delta"))
            .filter(F.col("__delta") != 0)
        )
        w = Window.partitionBy(*keys).orderBy(EPOCH)
        cum = F.sum("__delta").over(w)
        with_cum = per_epoch.withColumn("__cum", cum)
        new_w = weight_fn(F.col("__cum")).cast("long")
        old_w = weight_fn(F.coalesce(F.lag("__cum").over(w), F.lit(0))).cast("long")
        out = (
            with_cum.withColumn(DIFF, new_w - old_w)
            .filter(F.col(DIFF) != 0)
            .select(*keys, EPOCH, DIFF)
        )
        return DiffCollection(out, consolidated=True)

    def _accumulate(
        self, keys: Sequence[str], value_of_cum: Column, alias: str
    ) -> "DiffCollection":
        """Shared kernel for count-style operators: per-(key, epoch) delta →
        per-key cumulative value → emit (key, new_value, +1) and
        (key, old_value, −1) at each change (src/operators/count.rs:104-118)."""
        keys = list(keys)
        per_epoch = (
            self.df.groupBy(*keys, EPOCH)
            .agg(F.sum(DIFF).alias("__delta"))
            .filter(F.col("__delta") != 0)
        )
        w = Window.partitionBy(*keys).orderBy(EPOCH)
        with_cum = per_epoch.withColumn("__cum", F.sum("__delta").over(w)).withColumn(
            "__prev", F.lag("__cum").over(w)
        )
        # Single pass: one sort-window computes both the new and the retracted
        # value; emit 0-2 rows per change point via explode (a union of two
        # projections would execute the whole window pipeline twice).
        value = value_of_cum.cast("long")
        pair = F.array(
            F.when(
                F.col("__cum") != 0,
                F.struct(value.alias(alias), F.lit(1).cast("long").alias(DIFF)),
            ),
            F.when(
                F.col("__prev").isNotNull() & (F.col("__prev") != 0),
                F.struct(
                    self._value_of(F.col("__prev"), value_of_cum).alias(alias),
                    F.lit(-1).cast("long").alias(DIFF),
                ),
            ),
        )
        out = (
            with_cum.select(*keys, F.col(EPOCH), F.explode(pair).alias("__e"))
            .filter(F.col("__e").isNotNull())
            .select(*keys, F.col(f"__e.{alias}"), F.col(EPOCH), F.col(f"__e.{DIFF}"))
        )
        return DiffCollection(out, consolidated=True)

    @staticmethod
    def _value_of(cum_col: Column, template: Column) -> Column:
        """Rebase the value expression onto the previous cumulation. The
        count-style value IS the cumulation, so this is the identity on the
        lagged column."""
        return cum_col.cast("long")

    # ------------------------------------------------------------------ #
    # General reduce (reference src/operators/reduce.rs:29-101) — the one
    # Arrow/pandas kernel; see operators/reduce.py.
    # ------------------------------------------------------------------ #

    def reduce(
        self,
        keys: Sequence[str],
        logic,
        output_schema: str,
    ) -> "DiffCollection":
        """Grouped reduction with arbitrary logic over the consolidated,
        value-sorted input multiset, emitting output deltas per epoch.
        Delegates to operators.reduce.reduce (applyInPandas kernel)."""
        from differential_dataflow_spark.operators.reduce import reduce as _reduce

        return _reduce(self, keys, logic, output_schema)

    def reduce_min(self, keys: Sequence[str], value: str) -> "DiffCollection":
        from differential_dataflow_spark.operators.reduce import reduce_extremum

        return reduce_extremum(
            self, keys, value, minimum=True,
            single_epoch=self.const_epoch is not None,
        )

    def reduce_max(self, keys: Sequence[str], value: str) -> "DiffCollection":
        from differential_dataflow_spark.operators.reduce import reduce_extremum

        return reduce_extremum(
            self, keys, value, minimum=False,
            single_epoch=self.const_epoch is not None,
        )

    def top_k(
        self,
        keys: Sequence[str],
        order_by: Sequence[Column],
        k: int,
        single_epoch: bool | None = None,
    ) -> "DiffCollection":
        """First k distinct values per key. ``single_epoch`` defaults to
        whether the single-epoch invariant is statically known
        (``const_epoch``), matching the gating of count/threshold/reduce:
        the Catalyst fast path is valid ONLY when every update shares one
        epoch. Pass ``single_epoch=False`` to force the general
        retraction-correct kernel (see operators.reduce.top_k — it ranks by
        natural ascending value order and raises on any other ``order_by``),
        or ``True`` to assert the invariant for a collection whose metadata
        lost it."""
        from differential_dataflow_spark.operators.reduce import top_k as _top_k

        if single_epoch is None:
            single_epoch = self.const_epoch is not None
        return _top_k(self, keys, order_by, k, single_epoch=single_epoch)

    # ------------------------------------------------------------------ #
    # Iteration (reference src/operators/iterate.rs) — operators/iterate.py
    # ------------------------------------------------------------------ #

    def iterate(
        self,
        logic: Callable[["DiffCollection"], "DiffCollection"],
        max_iters: int = 100,
    ) -> "DiffCollection":
        from differential_dataflow_spark.operators.iterate import iterate as _iterate

        return _iterate(self, logic, max_iters=max_iters)

    # ------------------------------------------------------------------ #
    # Materialization helpers
    # ------------------------------------------------------------------ #

    def at_epoch(self, epoch: int) -> DataFrame:
        """The contents of the collection *at* epoch t: consolidate all
        updates with epoch <= t into a plain weighted DataFrame
        (definition: src/collection.rs:39-46)."""
        keys = self.payload_columns
        return (
            self.df.filter(F.col(EPOCH) <= epoch)
            .groupBy(*keys)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )

    def to_rows(self) -> DataFrame:
        """Expand weights into actual row multiplicity (diff must be >= 0):
        the plain-DataFrame view of the final collection state."""
        final = self.consolidate_final()
        return final.withColumn(
            "__n", F.explode(F.sequence(F.lit(1), F.col(DIFF).cast("int")))
        ).drop("__n", DIFF)

    def consolidate_final(self) -> DataFrame:
        """Accumulate across all epochs: the collection's final contents as
        (payload..., diff) with diff != 0."""
        keys = self.payload_columns
        return (
            self.df.groupBy(*keys)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )

    def updates(self) -> list[tuple]:
        """Collect consolidated update triples sorted for comparison — the
        reference's test extraction (tests/join.rs:28-31): extract, sort,
        compare."""
        rows = self.consolidate().df.collect()
        return sorted(tuple(r) for r in rows)

    def cache(self) -> "DiffCollection":
        self.df.cache()
        return self

    def local_checkpoint(self) -> "DiffCollection":
        """Cut lineage (for driver-side iteration). Tracked so
        ``session.release_checkpoint(coll.df)`` can actually free the blocks
        (plain ``DataFrame.unpersist()`` is a no-op on checkpoint RDDs)."""
        from differential_dataflow_spark.session import tracked_local_checkpoint

        ckpt = tracked_local_checkpoint(self.df, eager=True)
        out = DiffCollection(
            ckpt, const_epoch=self.const_epoch, consolidated=self.consolidated
        )
        # __init__ re-projects into canonical column order, which drops the
        # tracked handle — carry it onto the collection's DataFrame.
        out.df._ckpt_rdds = getattr(ckpt, "_ckpt_rdds", [])
        return out

    def repartition_by(self, *keys: str, num: int | None = None) -> "DiffCollection":
        """Explicit hash partitioning by key — the reference's Exchange pact
        (src/hashable.rs:1-26). Use to co-locate a reused key across stages."""
        if num is None:
            return self._same_epoch(self.df.repartition(*keys))
        return self._same_epoch(self.df.repartition(num, *keys))
