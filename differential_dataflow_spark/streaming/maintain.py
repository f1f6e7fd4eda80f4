"""O(delta)-per-round maintenance of large arranged state (in-memory spine).

The reference's headline capability is CHEAP MAINTENANCE: after loading a
large collection, each small batch of updates costs work proportional to the
batch, not the state (README.md:150-214 — 228 µs/round at batch 1, ~5 µs per
update at batch 100k). The parquet ``Arrangement`` (operators/arrange.py) is
the durable tier of that story; this module is the hot tier — the same
LSM/spine shape held in executor memory so a micro-batch round never rewrites
or re-reads state from disk:

- ``TraceView`` — a persisted consolidated base plus a list of sealed small
  delta parts (each lineage-truncated). Reads are a lazy union; ``append`` is
  O(delta); ``compact`` folds the parts into a new consolidated base (the
  fueled spine merge, src/trace/implementations/spine_fueled.rs, run as one
  hash aggregate) so amortized per-round merge cost is O(state/compact_every).
- ``CountMaintainer`` — incremental ``count_total`` against a TraceView
  (reference src/operators/count.rs:81-123): per batch, only the TOUCHED keys
  are looked up (broadcast semijoin of the delta's key set against the
  key-partitioned state) and the operator emits the ``(key, old, -1),
  (key, new, +1)`` retraction pairs.
- ``DeltaJoin`` (streaming/join.py) gains an in-memory mode backed by two
  TraceViews — pass ``state_dir=None``.

At cluster scale the base would be a key-bucketed cached table (or the
parquet Arrangement behind an executor-side cache); the delta parts and the
broadcast-semijoin lookup shape are unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF
from differential_dataflow_spark.session import (
    release_checkpoint,
    tracked_local_checkpoint,
)


BUCKET = "__bucket"


class TraceView:
    """LSM view of an update multiset ``(payload..., diff)``.

    Parts are lineage-truncated in-memory checkpoints; the base is either an
    in-memory checkpoint (default) or — when ``bucket_path`` is given — a
    parquet directory HASH-BUCKET-PARTITIONED by the key columns, the durable
    shape that survives state larger than memory: a small-delta round
    computes its touched buckets from the delta's key set and reads ONLY
    those partitions (:meth:`lookup_view`), so per-round state I/O is
    O(|Δ|/|keyspace| · state), not O(state). On a cluster the parquet dir is
    an Iceberg/Delta table and the pruning is identical.

    Contract: DataFrames returned by :meth:`view`/:meth:`lookup_view` are
    valid until the next ``append``/``compact`` (compaction releases or
    rewrites what they reference); consume or checkpoint them first, exactly
    like the reference's cursor validity under spine merges
    (src/trace/mod.rs:116-150).
    """

    def __init__(
        self,
        spark: SparkSession,
        compact_every: int = 16,
        bucket_path: str | None = None,
        n_buckets: int = 64,
    ):
        self.spark = spark
        self.compact_every = compact_every
        self.bucket_path = bucket_path
        self.n_buckets = n_buckets
        self.key: list[str] | None = None
        self.base: DataFrame | None = None
        self.parts: list[DataFrame] = []

    def _bucket_col(self):
        return F.pmod(F.xxhash64(*self.key), F.lit(self.n_buckets)).cast("int")

    def _write_base(self, df: DataFrame) -> None:
        """Write (or rewrite, via staged swap) the bucket-partitioned base."""
        import shutil
        from pathlib import Path

        root = Path(self.bucket_path)
        tmp, old = root.with_suffix(".tmp"), root.with_suffix(".old")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(old, ignore_errors=True)
        (
            df.withColumn(BUCKET, self._bucket_col())
            .repartition(BUCKET)
            .write.partitionBy(BUCKET)
            .mode("overwrite")
            .parquet(str(tmp))
        )
        if root.exists():
            root.rename(old)
        tmp.rename(root)
        shutil.rmtree(old, ignore_errors=True)
        self.base = self.spark.read.parquet(str(root))

    def seed(self, df: DataFrame, key: Sequence[str] | None = None) -> None:
        """Load the initial state (one-time O(state) cost). ``key`` hash-
        partitions the base so later per-key work is co-located; required
        for the bucketed (``bucket_path``) mode."""
        self.key = list(key) if key else None
        if self.bucket_path is not None:
            assert self.key, "bucketed TraceView requires key columns"
            self._write_base(df)
            return
        if key:
            df = df.repartition(
                self.spark.sparkContext.defaultParallelism, *key
            )
        self.base = tracked_local_checkpoint(df)

    def append(self, delta: DataFrame) -> None:
        """Seal one small part. The caller passes a MATERIALIZED (checkpointed
        or local-relation) DataFrame; appends never trigger jobs here."""
        self.parts.append(delta)

    def maybe_compact(self) -> None:
        if len(self.parts) >= self.compact_every:
            self.compact()

    def compact(self) -> None:
        """Fold base + parts into a new consolidated base — one hash
        aggregate over the state, amortized to O(state/compact_every) per
        append by the caller's ``maybe_compact`` cadence. Bucketed bases are
        rewritten in place with a crash-safe staged swap."""
        df = self.view()
        if df is None:
            return
        payload = [c for c in df.columns if c != DIFF]
        folded = (
            df.groupBy(*payload).agg(F.sum(DIFF).alias(DIFF)).filter(F.col(DIFF) != 0)
        )
        if self.bucket_path is not None:
            # Materialize before the swap unlinks the files the plan reads.
            folded = tracked_local_checkpoint(folded)
            for p in self.parts:
                release_checkpoint(p)
            self.parts = []
            self._write_base(folded)
            release_checkpoint(folded)
            return
        new_base = tracked_local_checkpoint(folded)
        self.release()
        self.base = new_base

    def _base_df(self, bucket_ids: Sequence[int] | None = None) -> DataFrame | None:
        if self.base is None:
            return None
        if self.bucket_path is None:
            return self.base
        b = self.base
        if bucket_ids is not None:
            b = b.filter(F.col(BUCKET).isin(list(bucket_ids)))
        return b.drop(BUCKET)

    def _union(self, dfs: list[DataFrame]) -> DataFrame | None:
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def view(self) -> DataFrame | None:
        base = self._base_df()
        return self._union(([base] if base is not None else []) + self.parts)

    def lookup_view(self, keys: DataFrame) -> DataFrame | None:
        """The sub-multiset that can contain the given keys: bucketed bases
        prune to the touched partitions (one tiny driver action over the
        already-materialized key set); parts are small and always included."""
        if self.base is None or self.bucket_path is None:
            return self.view()
        ids = [
            r["__b"]
            for r in keys.select(
                F.pmod(F.xxhash64(*self.key), F.lit(self.n_buckets))
                .cast("int")
                .alias("__b")
            )
            .distinct()
            .collect()
        ]
        base = self._base_df(ids)
        return self._union([base] + self.parts)

    def release(self) -> None:
        for df in ([self.base] if self.base is not None else []) + self.parts:
            release_checkpoint(df)
        self.base = None
        self.parts = []


class IncrementalReachability:
    """Additions-only incremental ITERATE: maintain ``reach(roots)`` under
    edge-insertion batches at O(newly derived facts) per batch — the
    monotone case of the reference's incremental iteration
    (src/operators/iterate.rs:49-127; the reference's bfs example maintains
    arbitrary changes via second-order differentials — RETRACTIONS here
    would need that machinery, so ``add_edges`` rejects negative diffs and
    full recompute is the documented fallback, exactly the trade a monotone
    Datalog engine makes).

    State: two TraceViews — the edge trace (key ``src``; bucketed parquet
    optional, so frontier expansion reads only touched src-buckets at
    state-bigger-than-memory scale) and the reached set. Per batch: seed the
    frontier with delta edges whose src is reached and dst is not, then run
    the semi-naive loop over the COMBINED edge trace; every round expands
    only the frontier, so total per-batch work is proportional to the newly
    attached region, not the graph.
    """

    def __init__(
        self,
        spark: SparkSession,
        edges: DataFrame,
        roots: DataFrame,
        compact_every: int = 16,
        state_dir: str | None = None,
        n_buckets: int = 64,
        max_iters: int = 10_000,
    ):
        """``edges``: (src, dst); ``roots``: (node). Runs the initial
        fixpoint (one-time O(graph) cost, like any bulk load)."""
        self.spark = spark
        self.max_iters = max_iters
        self.edges = TraceView(
            spark,
            compact_every=compact_every,
            bucket_path=(state_dir + "/edges") if state_dir else None,
            n_buckets=n_buckets,
        )
        self.edges.seed(
            edges.select("src", "dst", F.lit(1).cast("long").alias(DIFF)),
            key=["src"],
        )
        self.reached = TraceView(spark, compact_every=compact_every)
        base = tracked_local_checkpoint(
            roots.select(F.col("node")).distinct()
        )
        self.reached.seed(
            base.select("node", F.lit(1).cast("long").alias(DIFF)), key=["node"]
        )
        self._expand(base)
        self.reached.compact()  # fold the initial rounds into one base

    def _expand(self, frontier: DataFrame) -> list[DataFrame]:
        """Semi-naive loop from ``frontier`` (a checkpointed (node) set whose
        rows are already in ``reached``); appends each round's new nodes to
        the reached trace and returns the new parts."""
        new_parts: list[DataFrame] = []
        for _ in range(self.max_iters):
            if frontier.limit(1).isEmpty():
                break
            keys = frontier.select(F.col("node").alias("src"))
            ev = self.edges.lookup_view(keys)
            cand = (
                ev.join(F.broadcast(keys), ["src"], "left_semi")
                .select(F.col("dst").alias("node"))
                .distinct()
            )
            seen = self.reached.view().select("node")
            new = tracked_local_checkpoint(
                cand.join(seen, ["node"], "left_anti")
            )
            part = new.select("node", F.lit(1).cast("long").alias(DIFF))
            self.reached.append(part)
            new_parts.append(part)
            frontier = new
        else:
            raise RuntimeError("reachability did not close within max_iters")
        return new_parts

    def add_edges(self, delta: DataFrame) -> DataFrame:
        """Apply one batch of edge ADDITIONS (src, dst[, diff>0]); returns
        the newly reachable nodes as ``(node, diff=+1)`` update rows."""
        if DIFF in delta.columns:
            if not delta.filter(F.col(DIFF) <= 0).isEmpty():
                raise NotImplementedError(
                    "IncrementalReachability is monotone: edge retraction "
                    "requires second-order differentials (reference "
                    "examples/bfs.rs) — recompute from scratch instead"
                )
            delta = delta.drop(DIFF)
        # Compact BEFORE computing this batch (the previous batch's returned
        # frame is out of its validity window by now — the TraceView cursor
        # contract).
        self.reached.maybe_compact()
        d = tracked_local_checkpoint(delta.select("src", "dst").distinct())
        reached_nodes = self.reached.view().select("node")
        seed = tracked_local_checkpoint(
            d.join(
                reached_nodes.withColumnRenamed("node", "src"), ["src"], "left_semi"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached_nodes, ["node"], "left_anti")
        )
        # Seal the new edges FIRST: later rounds must traverse them.
        self.edges.maybe_compact()
        self.edges.append(d.select("src", "dst", F.lit(1).cast("long").alias(DIFF)))
        seed_part = seed.select("node", F.lit(1).cast("long").alias(DIFF))
        self.reached.append(seed_part)
        parts = [seed_part] + self._expand(seed)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def reached_nodes(self) -> DataFrame:
        """Current reachable set (node rows)."""
        return self.reached.view().select("node")

    def release(self) -> None:
        self.edges.release()
        self.reached.release()


class CountMaintainer:
    """Incremental per-key count over a TraceView: the ``count_total``
    maintenance loop (src/operators/count.rs:81-123 — walk the sealed batch
    against the trace, emit -old/+new per changed key).

    Per ``process_batch``: consolidate the delta (one small shuffle), look up
    ONLY the touched keys' accumulated counts (broadcast semijoin against the
    key-partitioned state — the state itself never shuffles), emit retraction
    pairs, seal the delta as a new part. The returned DataFrame is valid
    until the next ``process_batch`` (which may compact).
    """

    def __init__(
        self,
        spark: SparkSession,
        keys: Sequence[str],
        alias: str = "count",
        compact_every: int = 16,
        state_dir: str | None = None,
        n_buckets: int = 64,
    ):
        """``state_dir`` selects the bucket-partitioned parquet base: per
        round only the delta's touched buckets are read — the state-bigger-
        than-memory shape (see TraceView). Default is the in-memory spine."""
        self.spark = spark
        self.keys = list(keys)
        self.alias = alias
        self.trace = TraceView(
            spark,
            compact_every=compact_every,
            bucket_path=state_dir,
            n_buckets=n_buckets,
        )

    def seed_counts(self, counts: DataFrame, count_col: str = "count") -> None:
        """Pre-load existing per-key counts (``(keys..., count_col)``)."""
        self.trace.seed(
            counts.select(*self.keys, F.col(count_col).cast("long").alias(DIFF)),
            key=self.keys,
        )

    def process_batch(self, delta: DataFrame) -> DataFrame:
        """Apply one batch of ``(keys..., diff)`` updates; returns the output
        update stream ``(keys..., {alias}, diff)`` with the -old/+new pairs
        for every key whose count changed."""
        self.trace.maybe_compact()
        d = tracked_local_checkpoint(
            delta.groupBy(*self.keys)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )
        tv = self.trace.lookup_view(d.select(*self.keys))
        if tv is None:
            old = d.select(*self.keys, F.lit(0).cast("long").alias("__old")).limit(0)
        else:
            old = (
                tv.join(F.broadcast(d.select(*self.keys)), self.keys, "left_semi")
                .groupBy(*self.keys)
                .agg(F.sum(DIFF).alias("__old"))
            )
        st = (
            d.withColumnRenamed(DIFF, "__dn")
            .join(old, self.keys, "left")
            .select(
                *self.keys,
                F.coalesce("__old", F.lit(0)).alias("__old"),
                (F.coalesce("__old", F.lit(0)) + F.col("__dn")).alias("__new"),
            )
        )
        # One pass (no self-union, which would recompute the state lookup
        # twice): explode each changed key into its -old/+new pair and drop
        # the zero-count halves.
        pair = F.array(
            F.struct(
                F.col("__old").alias(self.alias),
                F.lit(-1).cast("long").alias(DIFF),
            ),
            F.struct(
                F.col("__new").alias(self.alias),
                F.lit(1).cast("long").alias(DIFF),
            ),
        )
        out = (
            st.select(*self.keys, F.explode(pair).alias("__p"))
            .select(*self.keys, f"__p.{self.alias}", f"__p.{DIFF}")
            .filter(F.col(self.alias) != 0)
        )
        self.trace.append(d)
        return out

    def counts(self) -> DataFrame:
        """Current consolidated state ``(keys..., {alias})`` — for tests and
        snapshot reads."""
        tv = self.trace.view()
        assert tv is not None, "no state seeded or appended"
        return (
            tv.groupBy(*self.keys)
            .agg(F.sum(DIFF).alias(self.alias))
            .filter(F.col(self.alias) != 0)
        )

    def release(self) -> None:
        self.trace.release()
