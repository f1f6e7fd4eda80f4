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

Two engines:

- ``iterate`` — the general fixpoint for arbitrary (non-monotone) logic.
  Cost per round: one shuffle for consolidate + one for the equality check.
- ``semi_naive`` — the scalable path for monotone, distinct-valued logic
  (reachability, BFS-style label propagation: README.md:22-31,
  src/algorithms/graphs/bfs.rs). Only the *frontier* (newly derived facts) is
  expanded each round — the differential behavior of the reference's iterate,
  where only changed updates flow — so total work is O(Σ|new facts|), not
  O(rounds × |total|).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF, EPOCH, DiffCollection

Logic = Callable[[DiffCollection], DiffCollection]


class FixpointNotReached(RuntimeError):
    pass


def _is_empty(coll: DiffCollection) -> bool:
    return coll.consolidate().df.isEmpty()


def iterate(
    initial: DiffCollection,
    logic: Logic,
    max_iters: int = 100,
    strict: bool = True,
) -> DiffCollection:
    """Apply ``logic`` until the consolidated collection stops changing.

    Matches reference semantics where the fixed point exists and is reached in
    finitely many rounds (src/operators/iterate.rs:49-56); ``max_iters`` is
    the safety bound (``strict=True`` raises if it is hit, else returns the
    last iterate).
    """
    current = initial.consolidate().local_checkpoint()
    for _ in range(max_iters):
        nxt = logic(current).consolidate().local_checkpoint()
        changed = not _is_empty(nxt.concat(current.negate()))
        if not changed:
            return nxt
        current = nxt
    if strict:
        raise FixpointNotReached(f"no fixed point within {max_iters} iterations")
    return current


def semi_naive(
    roots: DiffCollection,
    expand: Logic,
    max_iters: int = 10_000,
) -> DiffCollection:
    """Monotone fixpoint: total = roots ∪ expand(total) ∪ expand²(...) as a
    *distinct* collection, computed by expanding only the per-round frontier.

    ``expand`` maps a frontier collection to candidate new facts (any
    weights); candidates already in the total are discarded via weighted
    antijoin on the full payload. This is the reference's
    ``iterate(|inner| ... .concat(&roots).distinct())`` pattern
    (README.md:24-31) with the distinct pushed into the loop discipline.
    """
    key = roots.payload_columns
    total = roots.distinct().local_checkpoint()
    frontier = total
    for _ in range(max_iters):
        candidates = expand(frontier).distinct(key)
        new = candidates.antijoin(total, on=key).consolidate().local_checkpoint()
        if new.df.isEmpty():
            return total
        total = total.concat(new).local_checkpoint()
        frontier = new
    raise FixpointNotReached(f"no fixed point within {max_iters} iterations")


def iterate_keyed_min(
    initial: DiffCollection,
    expand: Logic,
    keys: Sequence[str],
    value: str,
    max_iters: int = 10_000,
) -> DiffCollection:
    """Fixpoint of "keep the per-key minimum" — the BFS distance-labeling
    shape (src/algorithms/graphs/bfs.rs:36-49: ``inner.join(edges).concat(
    nodes).reduce(min)``), run delta-style: each round expands only keys whose
    minimum improved.

    ``expand`` maps the frontier (keys + their current best value) to
    candidate (key, value) facts. A candidate survives iff it beats the
    current best for its key.
    """
    best = (
        initial.df.groupBy(*keys)
        .agg(F.min(value).alias(value), F.min(EPOCH).alias(EPOCH))
        .withColumn(DIFF, F.lit(1).cast("long"))
    )
    best = DiffCollection(best).local_checkpoint()
    frontier = best
    for _ in range(max_iters):
        cand = expand(frontier)
        cand_best = cand.df.groupBy(*keys).agg(
            F.min(value).alias("__cand"), F.min(EPOCH).alias(EPOCH)
        )
        cur = best.df.select(
            *keys, F.col(value).alias("__cur")
        )
        improved = (
            cand_best.join(cur, list(keys), "left")
            .filter(F.col("__cur").isNull() | (F.col("__cand") < F.col("__cur")))
            .select(
                *keys,
                F.col("__cand").alias(value),
                EPOCH,
                F.lit(1).cast("long").alias(DIFF),
            )
        )
        improved = DiffCollection(improved).local_checkpoint()
        if improved.df.isEmpty():
            return best
        # New best = improved keys' new values + untouched keys' old values.
        keep = DiffCollection(
            best.df.join(
                improved.df.select(*keys), list(keys), "left_anti"
            )
        )
        best = keep.concat(improved).local_checkpoint()
        frontier = improved
    raise FixpointNotReached(f"no fixed point within {max_iters} iterations")
