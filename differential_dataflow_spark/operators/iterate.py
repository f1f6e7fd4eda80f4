"""Bounded iteration to fixed point (reference src/operators/iterate.rs:49-127).

The reference runs ``logic`` "infinitely often" inside a nested scope whose
timestamps gain an iteration coordinate; updates circulate through a feedback
edge until differences cancel to the empty stream (fixed point observed as
frontier advancement). Spark has no feedback edge, so iteration is a
**driver-side loop**: each round applies ``logic``, consolidates (the
reference's own convergence requirement, src/operators/iterate.rs:12-15), cuts
lineage with a local checkpoint, and tests whether the consolidated multiset
changed — ``new ⊎ (−old)`` consolidating to empty is exactly the reference's
"updates dissipate" condition.

Loop discipline (matters at scale): every round's result is locally
checkpointed (truncating both lineage and analysis cost to O(1) per round)
and the previous round's checkpoint is **unpersisted** — without this the
block manager accumulates one cached RDD per round and round latency degrades
super-linearly (observed: 0.5s/round → 110s/round by round 21).

Engines:

- ``iterate`` — general fixpoint for arbitrary (non-monotone) logic over full
  update collections.
- ``semi_naive`` — the scalable path for monotone, distinct-valued logic
  (reachability / transitive closure: README.md:22-31). Only the *frontier*
  (newly derived facts) is expanded each round — the differential behavior of
  the reference's iterate, where only changed updates flow — so total work is
  O(Σ|new facts|). Internally plain column-pruned DataFrames; dedup is one
  ``left_anti`` against the checkpointed accumulated total per round (weight
  bookkeeping is unnecessary for distinct sets).
- ``iterate_keyed_min`` — BFS/label-propagation shape
  (src/algorithms/graphs/bfs.rs:36-49): per-key minimum refined per round,
  expanding only improved keys.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection
from differential_dataflow_spark.session import (
    release_checkpoint,
    tracked_local_checkpoint,
)

Logic = Callable[[DiffCollection], DiffCollection]


class FixpointNotReached(RuntimeError):
    pass


def _ckpt(df: DataFrame) -> DataFrame:
    # Tracked so _release actually frees the checkpoint blocks —
    # DataFrame.unpersist() is a no-op on localCheckpoint RDDs.
    return tracked_local_checkpoint(df, eager=True)


def _release(df: DataFrame) -> None:
    release_checkpoint(df)


def iterate(
    initial: DiffCollection,
    logic: Logic,
    max_iters: int = 100,
    strict: bool = True,
) -> DiffCollection:
    """Apply ``logic`` until the consolidated update multiset stops changing.

    General (non-monotone) fixpoint; each round costs two shuffles
    (consolidate + change test). ``strict=True`` raises if ``max_iters`` is
    hit without convergence.
    """
    current = _ckpt(initial.consolidate().df)
    for _ in range(max_iters):
        nxt = _ckpt(logic(DiffCollection(current)).consolidate().df)
        delta = (
            DiffCollection(nxt)
            .concat(DiffCollection(current).negate())
            .consolidate()
            .df
        )
        if delta.isEmpty():
            _release(current)
            return DiffCollection(nxt)
        _release(current)
        current = nxt
    if strict:
        raise FixpointNotReached(f"no fixed point within {max_iters} iterations")
    return DiffCollection(current)


def semi_naive(
    roots: DiffCollection,
    expand: Logic,
    max_iters: int = 10_000,
    broadcast_total: bool = False,
) -> DiffCollection:
    """Monotone fixpoint: total = roots ∪ expand(roots) ∪ expand²(...) as a
    *distinct* collection, computed by expanding only the per-round frontier.

    ``expand`` maps a frontier collection (weights 1, epoch 0) to candidate
    new facts with the same payload columns; candidates already known are
    discarded with a ``left_anti`` join against the accumulated total. The
    result collapses epochs: it is the fixpoint of the final accumulated
    input (per-epoch incremental iteration is the streaming engine's job).

    Default loop shape — SHUFFLE-ALIGNED, checkpointed every round:

      new    = checkpoint((expand(frontier) ANTI total) DISTINCT)
      total' = checkpoint(total UNION new);  emptiness = count unchanged

    Every round's results are locally checkpointed, so plans stay O(1) —
    without this the union/anti lineage doubles per round and Catalyst
    analysis explodes exponentially (measured: 0.8s -> 18.7s by round 4 on a
    20-node graph under persist-only lineage). The anti-join is a SHUFFLE
    join of keys: both sides exchange (the total is key-columns only — tiny
    relative to the data), every byte of which moves in parallel. The
    ``broadcast_total=True`` variant instead hashes the whole accumulated
    total into a broadcast relation every round — a single-threaded build
    that flattens 8->32 scaling at multi-million-node totals and dies when
    the closed set outgrows one executor; use it only for small closed sets.
    """
    import os as _os
    import time as _time

    _debug = bool(_os.environ.get("DD_SPARK_ITER_DEBUG"))
    key = roots.payload_columns
    base = roots.consolidate_final().filter(F.col(DIFF) > 0).select(*key)
    if broadcast_total:
        return _semi_naive_broadcast(base, expand, key, max_iters, _debug)
    total = _ckpt(base)
    total_count = total.count()
    frontier = total
    for _round in range(max_iters):
        _t0 = _time.time()
        frontier_coll = DiffCollection.from_df(frontier)
        cand = expand(frontier_coll).df.select(*key)
        new = _ckpt(cand.join(total, key, "left_anti").distinct())
        nxt = _ckpt(total.unionAll(new))
        nxt_count = nxt.count()
        if _debug:
            print(
                f"semi_naive round {_round}: {_time.time() - _t0:.2f}s "
                f"total={nxt_count}",
                flush=True,
            )
        done = nxt_count == total_count
        if frontier is not total:
            _release(frontier)
        _release(total)
        if done:
            _release(new)
            return DiffCollection.from_df(nxt)
        total, total_count, frontier = nxt, nxt_count, new
    raise FixpointNotReached(f"no fixed point within {max_iters} iterations")


def _semi_naive_broadcast(
    base: DataFrame, expand: Logic, key: list, max_iters: int, debug: bool
) -> DiffCollection:
    """Broadcast-total variant: right when the closed set stays small enough
    to hash into one relation (the per-round build is serial — see
    semi_naive's docstring)."""
    import time as _time

    total = _ckpt(base)
    frontier = total
    for _round in range(max_iters):
        _t0 = _time.time()
        frontier_coll = DiffCollection.from_df(frontier)
        cand = expand(frontier_coll).df.select(*key)
        new = _ckpt(cand.join(F.broadcast(total), key, "left_anti").distinct())
        if debug:
            print(f"semi_naive round {_round}: {_time.time() - _t0:.2f}s", flush=True)
        if new.isEmpty():
            _release(new)
            if frontier is not total:
                _release(frontier)
            return DiffCollection.from_df(total)
        prev_total, prev_frontier = total, frontier
        total = _ckpt(total.unionAll(new))
        _release(prev_total)
        if prev_frontier is not prev_total:
            _release(prev_frontier)
        frontier = new
    raise FixpointNotReached(f"no fixed point within {max_iters} iterations")


def iterate_keyed_min(
    initial: DiffCollection,
    expand: Logic,
    keys: Sequence[str],
    value: str,
    max_iters: int = 10_000,
) -> DiffCollection:
    """Fixpoint of "keep the per-key minimum" — BFS distance labeling
    (src/algorithms/graphs/bfs.rs:36-49: ``inner.join(edges).concat(nodes)
    .reduce(min)``), run delta-style: each round expands only keys whose
    minimum improved.

    ``expand`` maps the frontier (keys + current best value) to candidate
    (key, value) facts; a candidate survives iff it beats the current best.
    """
    keys = list(keys)
    best = _ckpt(
        initial.df.groupBy(*keys).agg(F.min(value).alias(value))
    )
    frontier = best
    for _ in range(max_iters):
        frontier_coll = DiffCollection.from_df(frontier)
        cand = (
            expand(frontier_coll)
            .df.groupBy(*keys)
            .agg(F.min(value).alias("__cand"))
        )
        cur = best.select(*keys, F.col(value).alias("__cur"))
        improved = _ckpt(
            cand.join(cur, keys, "left")
            .filter(F.col("__cur").isNull() | (F.col("__cand") < F.col("__cur")))
            .select(*keys, F.col("__cand").alias(value))
        )
        if improved.isEmpty():
            _release(improved)
            if frontier is not best:
                _release(frontier)
            return DiffCollection.from_df(best)
        prev_best, prev_frontier = best, frontier
        # Merge as union + per-key min rather than anti-join + union: the
        # latter references the `improved` LogicalRDD twice in one plan,
        # which trips a Spark localCheckpoint stats-rewrite bug ("key not
        # found: <attr>") after attribute deduplication. `improved` holds
        # only strictly-better values, so the per-key min IS the new best.
        best = _ckpt(
            prev_best.unionByName(improved)
            .groupBy(*keys)
            .agg(F.min(value).alias(value))
        )
        _release(prev_best)
        if prev_frontier is not prev_best:
            _release(prev_frontier)
        frontier = improved
    raise FixpointNotReached(f"no fixed point within {max_iters} iterations")


def iterate_with_priorities(
    staged: DiffCollection,
    logic: Logic,
    round_col: str = "enter_at",
    max_iters: int = 100,
    strict: bool = True,
) -> DiffCollection:
    """Fixpoint where records ENTER the loop at a chosen iteration round —
    the reference's ``enter_at`` (src/collection.rs:375-392), used to gate
    work by priority (e.g. sequential.rs's node-order gating).

    ``staged``'s payload carries ``round_col``; a record participates from
    iteration ``enter_at`` onward:

        current_0     = stage[0]
        current_{r+1} = consolidate(logic(current_r) ∪ stage[r+1])

    and after the last staged round the plain fixpoint loop finishes the
    convergence (updates dissipate). ``round_col`` is dropped from the loop
    variable's payload.
    """
    rounds_df = staged.df.agg(F.max(round_col).alias("m")).collect()
    max_round = rounds_df[0]["m"]
    if max_round is None:
        raise ValueError("iterate_with_priorities: empty staged collection")
    payload = [c for c in staged.payload_columns if c != round_col]

    def stage_at(r: int) -> DiffCollection:
        return staged.filter(F.col(round_col) == r).map(*payload)

    current = _ckpt(stage_at(0).consolidate().df)
    for r in range(1, int(max_round) + 1):
        nxt = _ckpt(
            logic(DiffCollection(current))
            .concat(stage_at(r))
            .consolidate()
            .df
        )
        _release(current)
        current = nxt
    # Every record has entered; run the ordinary fixpoint to convergence.
    out = iterate(
        DiffCollection(current), logic, max_iters=max_iters, strict=strict
    )
    _release(current)
    return out
