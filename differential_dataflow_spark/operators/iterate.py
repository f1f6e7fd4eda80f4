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
    counted_local_checkpoint,
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

    Default loop shape — SHUFFLE-ALIGNED, checkpointed every round, with the
    accumulated total kept as a LIST of disjoint checkpointed frontier parts
    (never rewritten):

      new     = checkpoint((DISTINCT expand(frontier)) ANTI union(parts))
      parts  += [new];  emptiness = count(new) == 0

    Every round's new facts are locally checkpointed, so plans stay O(1) —
    without this the union/anti lineage doubles per round and Catalyst
    analysis explodes exponentially (measured: 0.8s -> 18.7s by round 4 on a
    20-node graph under persist-only lineage). The total is NEVER union+
    re-checkpointed: that rewrite made late small-frontier rounds cost
    O(|total|) in block-store writes (measured 37s for a 1-new-fact round at
    3.9M total) and anti-scaled with thread count via allocation/GC pressure.
    The union of checkpointed parts is free to extend; the anti-join
    exchanges the (key-columns-only) parts union once per round, every byte
    in parallel. DISTINCT runs BEFORE the anti-join, so the duplicate factor
    of ``expand`` (e.g. 4x for a 4-out expander) never enters the join, and
    the join reuses distinct's hash partitioning (one exchange for the
    candidate side). Per round: 1 checkpoint + 1 count, both O(new).

    The ``broadcast_total=True`` variant instead hashes the whole
    accumulated total into a broadcast relation every round — a
    single-threaded build that flattens 8->32 scaling at multi-million-node
    totals and dies when the closed set outgrows one executor; use it only
    for small closed sets.
    """
    import os as _os
    import time as _time

    _debug = bool(_os.environ.get("DD_SPARK_ITER_DEBUG"))
    key = roots.payload_columns
    base = roots.consolidate_final().filter(F.col(DIFF) > 0).select(*key)
    if broadcast_total:
        return _semi_naive_broadcast(base, expand, key, max_iters, _debug)
    parts = [_ckpt(base)]
    frontier = parts[0]
    n_frontier = None  # carried from the previous round's count — no extra job
    total_count = 0  # lower bound: counts of parts[1:]; parts[0] uncounted
    # Frontier-size gate for the broadcast-tail round shape: under it the
    # round streams the accumulated total map-side against a broadcast of
    # the candidate set instead of exchanging+sorting the whole total.
    # Interleaved A/B at 8M-conv scale measured the plain anti-join FASTER
    # for ~1M-row frontiers on this host (broadcast build of multi-million-
    # row candidate relations is serial and beats the parallel exchange only
    # for small frontiers), so the default stays at 200k rows; env knob for
    # clusters where executor-memory/broadcast economics differ.
    SMALL_FRONTIER = int(
        _os.environ.get("SPARK_GRAFT_BCAST_FRONTIER_ROWS", "200000")
    )
    BIG_TOTAL = 500_000  # broadcast tail only pays off against a big total
    for _round in range(max_iters):
        _t0 = _time.time()
        frontier_coll = DiffCollection.from_df(frontier)
        # The candidate set is checkpointed BEFORE the anti-join so the
        # anti-join plan references each checkpoint RDD exactly once —
        # `frontier` is both the expand input and one of the parts, and a
        # plan holding the same LogicalRDD twice trips Spark's
        # localCheckpoint stats rewrite ("key not found: <attr>").
        cand = _ckpt(expand(frontier_coll).df.select(*key).distinct())
        total = parts[0]
        for p in parts[1:]:
            total = total.unionAll(p)
        if (
            n_frontier is not None
            and n_frontier <= SMALL_FRONTIER
            and total_count >= BIG_TOTAL
        ):
            # Small-frontier tail: the plain anti-join would exchange (or
            # broadcast-build) the ENTIRE accumulated total every round even
            # for a 1-fact frontier. Instead broadcast the small candidate
            # set against the parts (one map-side scan, no exchange) to find
            # the already-known keys, then anti-join the candidates against
            # that (small) matched set. `matched` is checkpointed so the
            # final plan references `cand`'s RDD only once.
            matched = _ckpt(
                total.join(F.broadcast(cand), key, "left_semi")
            )
            # Checkpoint fused with the convergence probe: one job instead
            # of an eager checkpoint followed by a separate count.
            new, n_new = counted_local_checkpoint(
                cand.join(F.broadcast(matched), key, "left_anti")
            )
            _release(matched)
        else:
            new, n_new = counted_local_checkpoint(
                cand.join(total, key, "left_anti")
            )
        n_frontier = n_new
        total_count += n_new
        _release(cand)
        if _debug:
            print(
                f"semi_naive round {_round}: {_time.time() - _t0:.2f}s "
                f"new={n_new}",
                flush=True,
            )
        if n_new == 0:
            _release(new)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            # Carry every part's storage handle so release_checkpoint on the
            # result frees the whole closed set.
            out._ckpt_rdds = [h for p in parts for h in getattr(p, "_ckpt_rdds", ())]
            return DiffCollection.from_df(out)
        parts.append(new)
        frontier = new
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
        new, n_new = counted_local_checkpoint(
            cand.join(F.broadcast(total), key, "left_anti").distinct()
        )
        if debug:
            print(f"semi_naive round {_round}: {_time.time() - _t0:.2f}s", flush=True)
        if n_new == 0:
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
        # Checkpoint + emptiness probe in ONE job (these loops are driver-
        # round-floor bound; the separate isEmpty() was ~a third of a round).
        improved, n_improved = counted_local_checkpoint(
            cand.join(cur, keys, "left")
            .filter(F.col("__cur").isNull() | (F.col("__cand") < F.col("__cur")))
            .select(*keys, F.col("__cand").alias(value))
        )
        if n_improved == 0:
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


def mutual_semi_naive(
    roots: dict[str, DiffCollection],
    expands: dict[str, "Callable[[dict, dict], DiffCollection]"],
    max_iters: int = 10_000,
) -> dict[str, DiffCollection]:
    """Semi-naive fixpoint over SEVERAL mutually recursive relations — the
    reference's multi-`Variable` pattern (src/operators/iterate.rs:166-262),
    the doop/graspan program shape (doop/src/main.rs:1-40: many variables,
    each defined from the others, iterated to mutual fixpoint).

    ``roots[name]`` seeds relation ``name``; ``expands[name]`` maps
    ``(frontiers, totals)`` — dicts keyed by relation name holding the
    last round's new-fact collections and the accumulated closed sets
    (plain DataFrames of key columns) — to the candidate collection for
    ``name``. Monotone, distinct-valued logic only (the semi_naive
    contract). Each relation keeps its closed set as a list of disjoint
    checkpointed frontier parts exactly like :func:`semi_naive`; a round
    costs, per relation, one candidate checkpoint + one anti-join + one
    count, all O(new).

    Returns ``{name: closed-set DiffCollection}``.
    """
    names = list(roots)
    keys = {n: roots[n].payload_columns for n in names}
    parts: dict[str, list[DataFrame]] = {}
    frontiers: dict[str, DiffCollection] = {}
    for n in names:
        base = (
            roots[n].consolidate_final().filter(F.col(DIFF) > 0).select(*keys[n])
        )
        parts[n] = [_ckpt(base)]
        frontiers[n] = DiffCollection.from_df(parts[n][0])

    def union_of(ps):
        out = ps[0]
        for p in ps[1:]:
            out = out.unionAll(p)
        return out

    from concurrent.futures import ThreadPoolExecutor

    def _advance(n, frontiers, totals):
        # Checkpoint candidates before the anti-join: a plan holding the
        # same checkpoint RDD twice (a frontier that is also a part)
        # trips Spark's localCheckpoint stats rewrite.
        cand = _ckpt(
            expands[n](frontiers, totals).df.select(*keys[n]).distinct()
        )
        # Checkpoint fused with the per-relation convergence count: one job.
        new, n_new = counted_local_checkpoint(
            cand.join(totals[n], keys[n], "left_anti")
        )
        _release(cand)
        return n, new, n_new

    for _round in range(max_iters):
        totals = {n: union_of(parts[n]) for n in names}
        new_parts: dict[str, DataFrame] = {}
        any_new = False
        # The relations' rounds are independent given the previous frontiers:
        # run them as concurrent Spark jobs (the reference runs all Variables
        # in one dataflow graph; driver threads are the Spark analogue).
        with ThreadPoolExecutor(max_workers=max(len(names), 1)) as ex:
            results = list(
                ex.map(lambda n: _advance(n, frontiers, totals), names)
            )
        for n, new, n_new in results:
            if n_new > 0:
                any_new = True
            new_parts[n] = new
        if not any_new:
            for n in names:
                _release(new_parts[n])
            out: dict[str, DiffCollection] = {}
            for n in names:
                closed = union_of(parts[n])
                closed._ckpt_rdds = [
                    h for p in parts[n] for h in getattr(p, "_ckpt_rdds", ())
                ]
                out[n] = DiffCollection.from_df(closed)
            return out
        for n in names:
            parts[n].append(new_parts[n])
            frontiers[n] = DiffCollection.from_df(new_parts[n])
    raise FixpointNotReached(f"no mutual fixed point within {max_iters} iterations")
