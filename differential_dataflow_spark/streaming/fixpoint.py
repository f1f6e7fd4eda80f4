"""Generic maintained ITERATE: keep the fixpoint of ANY monotone semi-naive
program up to date under mixed insertions and deletions of its inputs.

The reference gets this for free from its architecture: ``iterate`` runs the
loop body "infinitely often" under timestamps with an iteration coordinate,
so ANY program written against collections is incrementally maintained when
its inputs change (src/operators/iterate.rs:49-127; examples/bfs.rs
demonstrates maintenance under arbitrary edge updates). Our earlier
maintainers (IncrementalReachability, IncrementalBFS, KCoreMaintainer in
streaming/maintain.py) each hand-derive the affected-region repair for one
algorithm. This module provides the *general* engine for the monotone,
distinct-valued class via **delete-and-rederive** (DRed — Gupta, Mumick &
Subrahmanian, "Maintaining Views Incrementally", SIGMOD 1993 — the classic
public-literature counterpart of the reference's second-order
differentials):

The user supplies a Datalog-shaped program:

- ``fact_cols`` — the schema of derived facts (any arity: ``["node"]`` for
  reachability, ``["src", "dst"]`` for transitive closure, ...).
- ``axioms(inputs) -> DataFrame`` — the non-recursive rules: base facts as a
  function of the input relations (e.g. the root set, or ``edge(x,y) =>
  path(x,y)``).
- ``step(frontier, inputs) -> DataFrame`` — one application of the recursive
  rules to FRONTIER facts (e.g. ``path(x,y), edge(y,z) => path(x,z)``).
  Contract: monotone in both arguments and LINEAR in the recursive
  predicate (each derivation uses at least one frontier premise), the
  standard semi-naive requirement — exactly the class the reference's
  ``iterate`` + ``distinct`` idiom covers.

Maintenance per batch of input updates ``(payload..., diff in {+1,-1})``:

1. OVERDELETE — the suspect region D: facts whose derivation may rest on a
   deleted input row. Seeds are the retracted axioms (``axioms(old) \\
   axioms(new)``) plus, per input carrying deletions, ``step(derived, inputs
   with that relation restricted to its deleted rows)`` — any derivation
   with a deleted premise is caught through whichever relation the premise
   came from. D closes under ``step(D, old_inputs)`` intersected with the
   derived set, so work is O(|affected region|), not O(|derived|).
2. REDERIVE — within D, from the untouched boundary: ``axioms(new) ∩ D``
   union ``step(derived \\ D, new_inputs) ∩ D``, closed under ``step(R,
   new_inputs) ∩ D``. Facts with a surviving alternative derivation come
   back; ``removed = D \\ R`` is emitted with diff −1.
3. INSERT — seeds are the new axioms plus, per input carrying insertions,
   ``step(derived, inputs with that relation restricted to its inserted
   rows)``, minus already-derived; then the ordinary semi-naive expansion
   over the post-batch inputs. O(|newly derived region|).

Scale shape: inputs and the derived set live in :class:`TraceView` spines
(optionally bucketed parquet, so per-batch reads prune to touched
partitions); suspect/frontier sets are small and broadcast into the joins;
every loop round is ONE counted-checkpoint job (materialization fused with
the convergence probe). The one inherently program-shaped cost is the
rederive boundary seed (``step`` over the kept region): the default scans
it once per deletion batch; programs with a cheaper reverse-key form (like
IncrementalReachability's dst-keyed boundary) can pass ``rederive_seeds``
to override it.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from differential_dataflow_spark.collection import DIFF
from differential_dataflow_spark.session import (
    counted_local_checkpoint,
    micro_batch_scope,
    release_checkpoint,
    tracked_local_checkpoint,
)
from differential_dataflow_spark.streaming.maintain import TraceView

Inputs = Mapping[str, DataFrame]
Step = Callable[[DataFrame, Inputs], DataFrame]
Axioms = Callable[[Inputs], DataFrame]


class MaintainedFixpoint:
    """Maintain ``fix(F) = axioms(I) ∪ step(F, I)`` under updates to ``I``."""

    def __init__(
        self,
        spark: SparkSession,
        fact_cols: Sequence[str],
        axioms: Axioms,
        step: Step,
        inputs: Mapping[str, DataFrame],
        input_keys: Mapping[str, Sequence[str]] | None = None,
        rederive_seeds: Callable[[DataFrame, DataFrame, Inputs], DataFrame]
        | None = None,
        uses_derived: bool = False,
        compact_every: int = 16,
        state_dir: str | None = None,
        n_buckets: int = 64,
        max_iters: int = 10_000,
    ):
        """``inputs``: initial relations (payload columns, no diff).
        ``input_keys``: per-input key columns (joins co-locate on them; the
        input's declared key when bucketed). ``rederive_seeds(suspect, kept,
        new_inputs)``: optional program-specific boundary (defaults to
        ``step(kept, new_inputs)``).

        ``uses_derived=True`` lifts the LINEAR restriction: the step may
        reference the derived relation itself through the reserved input
        name ``"$derived"`` (delta-rule discipline — e.g. transitive
        closure by squaring: ``step = frontier ⋈ $derived ∪ $derived ⋈
        frontier``). Contract: every occurrence of the recursive relation
        must appear in FRONTIER position in at least one union term (the
        standard non-linear semi-naive delta-rule requirement); the engine
        binds ``$derived`` to the semantically current fact set — all facts
        so far during expansion, the pre-batch set during the overdelete
        closure, and kept-plus-rederived-so-far during rederivation."""
        self.spark = spark
        self.fact_cols = list(fact_cols)
        self.axioms = axioms
        self.step = step
        self.rederive_seeds = rederive_seeds
        self.uses_derived = uses_derived
        self.max_iters = max_iters
        self._spent: list[DataFrame] = []

        self.inputs: dict[str, TraceView] = {}
        self._input_neg: dict[str, bool] = {}
        input_keys = input_keys or {}
        for name, df in inputs.items():
            key = list(input_keys.get(name, df.columns))
            tv = TraceView(
                spark,
                compact_every=compact_every,
                bucket_path=(f"{state_dir}/{name}" if state_dir else None),
                n_buckets=n_buckets,
            )
            tv.seed(
                df.distinct().withColumn(DIFF, F.lit(1).cast("long")), key=key
            )
            self.inputs[name] = tv
            self._input_neg[name] = False

        self.derived = TraceView(spark, compact_every=compact_every)
        self.derived.key = self.fact_cols
        self._derived_neg = False

        supports = self._supports()
        n_state = max(
            (tv.base_rows or 0 for tv in self.inputs.values()), default=None
        )
        with micro_batch_scope(spark, n_state):
            base, n = counted_local_checkpoint(
                axioms(supports).select(*self.fact_cols).distinct()
            )
            self._spent.append(base)  # init scratch; reaped at the first batch
            self.derived.seed(
                base.select(*self.fact_cols, F.lit(1).cast("long").alias(DIFF)),
                key=self.fact_cols,
            )
            self._expand(base, n, supports)
            self.derived.compact()  # fold the initial rounds into one base

    # -- bookkeeping ---------------------------------------------------- #

    def _ck(self, df: DataFrame) -> DataFrame:
        out = tracked_local_checkpoint(df)
        self._spent.append(out)
        return out

    def _ckn(self, df: DataFrame) -> tuple[DataFrame, int]:
        out, n = counted_local_checkpoint(df)
        self._spent.append(out)
        return out, n

    def _reap(self) -> None:
        for df in self._spent:
            release_checkpoint(df)
        self._spent = []

    def _append_derived(self, ck: DataFrame, diff: int) -> None:
        """Seal a checkpointed fact set as a derived-trace part. The part
        takes OWNERSHIP of the checkpoint blocks (released by the trace's own
        compaction) — reaping them with the per-batch scratch would tear the
        trace's blocks out from under later batches."""
        part = ck.select(
            *self.fact_cols, F.lit(diff).cast("long").alias(DIFF)
        )
        part._ckpt_rdds = list(getattr(ck, "_ckpt_rdds", ()))
        if ck in self._spent:
            self._spent.remove(ck)
        self.derived.append(part)

    def release(self) -> None:
        self._reap()
        self.derived.release()
        for tv in self.inputs.values():
            tv.release()

    # -- support views --------------------------------------------------- #

    def _pos(self, view: DataFrame, payload: list[str], neg: bool) -> DataFrame:
        if not neg:
            return view.select(*payload)
        return (
            view.groupBy(*payload)
            .agg(F.sum(DIFF).alias("__s"))
            .filter(F.col("__s") > 0)
            .select(*payload)
        )

    def _input_support(self, name: str) -> DataFrame:
        tv = self.inputs[name]
        v = tv.view()
        payload = [c for c in v.columns if c != DIFF]
        return self._pos(v, payload, self._input_neg[name])

    def _supports(self) -> dict[str, DataFrame]:
        return {n: self._input_support(n) for n in self.inputs}

    def _derived_support(self) -> DataFrame:
        return self._pos(
            self.derived.view(), self.fact_cols, self._derived_neg
        )

    def _bind(self, supports: Inputs, derived: DataFrame) -> Inputs:
        """Attach the reserved ``$derived`` relation for non-linear steps."""
        if not self.uses_derived:
            return supports
        out = dict(supports)
        out["$derived"] = derived
        return out

    # -- semi-naive loops -------------------------------------------------- #

    def _expand(
        self, frontier: DataFrame, n_frontier: int, supports: Inputs
    ) -> list[DataFrame]:
        """Ordinary semi-naive expansion: derive from ``frontier`` until no
        new facts; each round's new facts are appended to the derived trace
        and returned. One counted-checkpoint job per round."""
        parts: list[DataFrame] = []
        for _ in range(self.max_iters):
            if n_frontier == 0:
                return parts
            # Non-linear steps see ALL facts so far (semi-naive "full"
            # relation) — rebound every round as parts accumulate.
            sup = self._bind(supports, self._derived_support())
            new, n_frontier = self._ckn(
                self.step(frontier, sup)
                .select(*self.fact_cols)
                .distinct()
                .join(self._derived_support(), self.fact_cols, "left_anti")
            )
            self._append_derived(new, 1)
            parts.append(new)
            frontier = new
        raise RuntimeError("fixpoint expansion did not converge")

    def _closure_within(
        self,
        seeds: DataFrame,
        n_seeds: int,
        supports: Inputs,
        bound: DataFrame,
        broadcast_bound: bool = False,
        dyn_derived: DataFrame | None = None,
    ) -> tuple[DataFrame, int]:
        """Close ``seeds`` under ``step`` restricted to ``bound``; returns the
        checkpointed closure and its row count. ``broadcast_bound`` only when
        the bound is known small (the suspect set) — the overdelete closure's
        bound is the WHOLE derived set and must stream, not broadcast.
        ``dyn_derived`` (non-linear rederivation only): bind ``$derived`` to
        ``dyn_derived ∪ closure-so-far``, rebound each round — rederiving
        through a still-suspect fact would keep facts alive via dead
        derivations, so only kept-plus-already-rederived facts qualify."""
        bnd = F.broadcast(bound) if broadcast_bound else bound
        parts = [seeds]
        frontier, n_front = seeds, n_seeds
        for _ in range(self.max_iters):
            if n_front == 0:
                break
            acc = parts[0]
            for p in parts[1:]:
                acc = acc.unionByName(p)
            sup = (
                self._bind(supports, dyn_derived.unionByName(acc))
                if dyn_derived is not None
                else supports
            )
            nxt, n_front = self._ckn(
                self.step(frontier, sup)
                .select(*self.fact_cols)
                .distinct()
                .join(bnd, self.fact_cols, "left_semi")
                .join(acc, self.fact_cols, "left_anti")
            )
            parts.append(nxt)
            frontier = nxt
        else:
            raise RuntimeError("closure did not converge")
        acc = parts[0]
        for p in parts[1:]:
            acc = acc.unionByName(p)
        return self._ckn(acc)

    # -- maintenance -------------------------------------------------------- #

    def process_batch(
        self, updates: Mapping[str, DataFrame]
    ) -> DataFrame:
        """Apply one batch of input updates (per input: payload columns +
        ``diff`` in {+1, −1}) and return the derived-fact update stream
        ``(fact_cols..., diff)``. Valid until the next call."""
        with micro_batch_scope(self.spark):
            return self._process_batch(updates)

    def _process_batch(self, updates: Mapping[str, DataFrame]) -> DataFrame:
        self._reap()
        # Compact BEFORE capturing support views: TraceView views are valid
        # only until the next append/compact, and the old-support snapshots
        # below must survive the whole batch. A compaction folds the ±1
        # pairs to net-positive rows, so the negative-support flags reset —
        # without this every later view pays the positive-support aggregate
        # forever after the first deletion.
        if self.derived.maybe_compact():
            self._derived_neg = False
        for name, tv in self.inputs.items():
            if tv.maybe_compact():
                self._input_neg[name] = False

        old_supports = self._supports()
        derived_old = self._derived_support()
        ax_old = self.axioms(old_supports).select(*self.fact_cols).distinct()

        dels: dict[str, DataFrame] = {}
        inss: dict[str, DataFrame] = {}
        any_del = any_ins = False
        for name, upd in updates.items():
            tv = self.inputs[name]
            payload = [c for c in upd.columns if c != DIFF]
            # LAZY checkpoint + the phase-deciding aggregate as its
            # materializer: one Spark job per input delta instead of two
            # (eager checkpoint, then a separate aggregate job).
            d = tracked_local_checkpoint(
                upd.select(*payload, DIFF).distinct(), eager=False
            )
            self._spent.append(d)
            # One cheap aggregate over the cached delta decides which phases
            # this batch pays for (insert-only batches skip DRed entirely).
            row = d.agg(
                F.sum((F.col(DIFF) < 0).cast("long")).alias("nd"),
                F.sum((F.col(DIFF) > 0).cast("long")).alias("ni"),
            ).collect()[0]
            n_del, n_ins_rows = int(row["nd"] or 0), int(row["ni"] or 0)
            # The delta checkpoint doubles as the sealed trace part; hand its
            # release handle to the trace so compaction can free the blocks.
            part = d.select(*payload, F.col(DIFF))
            part._ckpt_rdds = list(getattr(d, "_ckpt_rdds", ()))
            self._spent.remove(d)
            tv.append(part)
            if n_del:
                dels[name] = d.filter(F.col(DIFF) < 0).select(*payload)
                self._input_neg[name] = True
                any_del = True
            if n_ins_rows:
                inss[name] = d.filter(F.col(DIFF) > 0).select(*payload)
                any_ins = True

        new_supports = self._supports()
        ax_new = self._ck(
            self.axioms(new_supports).select(*self.fact_cols).distinct()
        )

        # Phase 1: OVERDELETE — suspect seeds from retracted axioms and from
        # derivations through each input's deleted rows. Skipped outright on
        # insert-only batches (axioms are monotone in the inputs, so none
        # can retract without a deletion).
        n_seeds = 0
        seeds: DataFrame | None = None
        if any_del:
            seed_parts = [
                ax_old.join(ax_new, self.fact_cols, "left_anti")
            ]
            for name, del_df in dels.items():
                restricted = dict(self._bind(old_supports, derived_old))
                restricted[name] = F.broadcast(del_df)
                seed_parts.append(
                    self.step(derived_old, restricted).select(*self.fact_cols)
                )
            seeds = seed_parts[0]
            for p in seed_parts[1:]:
                seeds = seeds.unionByName(p)
            seeds, n_seeds = self._ckn(
                seeds.distinct().join(
                    derived_old, self.fact_cols, "left_semi"
                )
            )

        removed, n_removed = seeds, 0
        if n_seeds:
            suspect, n_suspect = self._closure_within(
                seeds,
                n_seeds,
                self._bind(old_supports, derived_old),
                bound=derived_old,
            )
            # Phase 2: REDERIVE within the suspect region from the kept
            # boundary over the POST-batch inputs.
            kept = derived_old.join(
                F.broadcast(suspect), self.fact_cols, "left_anti"
            )
            boundary_fn = self.rederive_seeds or (
                lambda kept, sus, sup: self.step(kept, sup)
            )
            r0, n_r0 = self._ckn(
                ax_new.join(F.broadcast(suspect), self.fact_cols, "left_semi")
                .unionByName(
                    boundary_fn(kept, suspect, self._bind(new_supports, kept))
                    .select(*self.fact_cols)
                    .join(
                        F.broadcast(suspect), self.fact_cols, "left_semi"
                    )
                )
                .distinct()
            )
            rederived, _ = self._closure_within(
                r0,
                n_r0,
                new_supports,
                bound=suspect,
                broadcast_bound=True,
                dyn_derived=kept if self.uses_derived else None,
            )
            removed, n_removed = self._ckn(
                suspect.join(rederived, self.fact_cols, "left_anti")
            )
            if n_removed:
                self._append_derived(removed, -1)
                self._derived_neg = True

        # Phase 3: INSERT — new axioms plus derivations through each input's
        # inserted rows, then the ordinary semi-naive expansion. Skipped on
        # delete-only batches.
        added_parts: list[DataFrame] = []
        if any_ins:
            derived_now = self._derived_support()
            ins_parts = [ax_new.join(ax_old, self.fact_cols, "left_anti")]
            for name, ins_df in inss.items():
                restricted = dict(self._bind(new_supports, derived_now))
                restricted[name] = F.broadcast(ins_df)
                ins_parts.append(
                    self.step(derived_now, restricted).select(*self.fact_cols)
                )
            ins_seeds = ins_parts[0]
            for p in ins_parts[1:]:
                ins_seeds = ins_seeds.unionByName(p)
            ins_seeds, n_ins = self._ckn(
                ins_seeds.distinct().join(
                    derived_now, self.fact_cols, "left_anti"
                )
            )
            if n_ins:
                self._append_derived(ins_seeds, 1)
                added_parts = [ins_seeds] + self._expand(
                    ins_seeds, n_ins, new_supports
                )

        if n_removed:
            out = removed.select(
                *self.fact_cols, F.lit(-1).cast("long").alias(DIFF)
            )
        else:
            empty = self.derived.view().limit(0)
            out = empty.select(
                *self.fact_cols, F.lit(-1).cast("long").alias(DIFF)
            )
        for p in added_parts:
            out = out.unionByName(
                p.select(*self.fact_cols, F.lit(1).cast("long").alias(DIFF))
            )
        # Consolidate the batch's update stream: a fact overdeleted in phase
        # 1 can be re-derived in phase 3 through brand-new intermediate facts
        # (outside the suspect region, so phase 2's D-bounded rederive cannot
        # see it) — the −1/+1 pair must cancel. Delta-sized shuffle.
        return (
            out.groupBy(*self.fact_cols)
            .agg(F.sum(DIFF).alias(DIFF))
            .filter(F.col(DIFF) != 0)
        )

    def facts(self) -> DataFrame:
        """Current derived-fact set (positive support)."""
        return self._derived_support()
