"""Stateful retraction-emitting kernels (applyInPandasWithState, Arrow-batched).

Each kernel holds per-key state in the Spark state store and, per micro-batch,
emits exactly the *changes* to its would-be batch output — the reference's
incremental operator contract:

- ``stateful_count``: running per-key weight accumulation emitting
  ``(key, old, -1), (key, new, +1)`` — the semantics of ``CountTotal``
  (reference src/operators/count.rs:81-123: walk sealed batch against trace,
  emit -old/+new per changed key).
- ``stateful_threshold`` / ``stateful_distinct``: running accumulation through
  a weight-transform, emitting the difference ``f(new) − f(old)``
  (reference src/operators/threshold.rs:20-195).
- ``stateful_reduce_general`` / ``stateful_reduce``: per-key consolidated
  input multiset + previous output held in state; per batch the user logic
  recomputes the output from the sorted (value, weight) list and the kernel
  emits output deltas — the retraction recipe of reference
  src/operators/reduce.rs:280-287
  (``change.extend(output.drain(..).map(negate))``). The general form is
  payload-generic (arbitrary struct values, matching the batch kernel's
  contract); the historical single-long form wraps it.
- ``stateful_upsert``: last-writer-wins per key with synthesized retraction of
  the previous value (reference src/operators/arrange/upsert.rs:1-33).

All state travels as Arrow batches (no per-row Python); per-key groups are
hash-partitioned by the state store exactly like the reference's Exchange
pact on ``key.hashed()`` (src/hashable.rs).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

from differential_dataflow_spark.collection import DIFF


def _key_tuple(key: Any) -> tuple:
    return key if isinstance(key, tuple) else (key,)


def stateful_count(
    updates: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    alias: str = "count",
) -> DataFrame:
    """Per-key running count over a streaming update DataFrame with a ``diff``
    column; emits retraction pairs per micro-batch. Output schema:
    ``keys..., {alias} long, diff long``."""
    keys = list(keys)
    out_schema = f"{key_schema}, {alias} long, {DIFF} long"
    state_schema = "acc long"

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        delta = 0
        for pdf in pdfs:
            delta += int(pdf[DIFF].sum())
        (old,) = state.get if state.exists else (0,)
        new = old + delta
        if new != 0 or state.exists:
            state.update((new,))
        k = _key_tuple(key)
        rows = []
        if delta != 0:
            if old != 0:
                rows.append(k + (old, -1))
            if new != 0:
                rows.append(k + (new, 1))
        if rows:
            yield pd.DataFrame(rows, columns=keys + [alias, DIFF])

    return updates.groupBy(*keys).applyInPandasWithState(
        kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_threshold(
    updates: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    weight_fn: Callable[[int], int],
) -> DataFrame:
    """Per-key accumulation through ``weight_fn``; emits the key with diff
    ``f(new) − f(old)`` per micro-batch where it changes. ``distinct`` is
    ``weight_fn = lambda w: 1 if w > 0 else 0``."""
    keys = list(keys)
    out_schema = f"{key_schema}, {DIFF} long"
    state_schema = "acc long"

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        delta = 0
        for pdf in pdfs:
            delta += int(pdf[DIFF].sum())
        (old,) = state.get if state.exists else (0,)
        new = old + delta
        state.update((new,))
        change = weight_fn(new) - weight_fn(old)
        k = _key_tuple(key)
        if change != 0:
            yield pd.DataFrame([k + (change,)], columns=keys + [DIFF])

    return updates.groupBy(*keys).applyInPandasWithState(
        kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_distinct(
    updates: DataFrame, keys: Sequence[str], key_schema: str
) -> DataFrame:
    return stateful_threshold(
        updates, keys, key_schema, lambda w: 1 if w > 0 else 0
    )


def stateful_reduce_general(
    updates: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    value_cols: Sequence[str],
    value_schema: str,
    logic: Callable[[list[tuple[tuple, int]]], list[tuple[tuple, int]]],
    out_schema: str,
) -> DataFrame:
    """PAYLOAD-GENERIC streaming reduce matching the batch kernel's contract
    (reference ``reduce_core``, src/operators/reduce.rs:240-341): state =
    consolidated input multiset of value TUPLES + previous output multiset
    (both as ``array<struct<...>>`` + weight arrays in the state store); per
    batch the user logic sees the consolidated, value-sorted
    ``(value_tuple, weight)`` list and the kernel emits output deltas — the
    ``change.extend(output.drain(..).map(negate))`` retraction recipe.

    ``value_schema`` / ``out_schema`` are struct field lists, e.g.
    ``"v long, tag string"``. Output columns = keys + out fields + diff.
    """
    keys = list(keys)
    value_cols = list(value_cols)
    out_cols = [f.strip().split()[0] for f in out_schema.split(",")]
    full_out = f"{key_schema}, {out_schema}, {DIFF} long"
    state_schema = (
        f"in_vals array<struct<{value_schema}>>, in_wts array<long>, "
        f"out_vals array<struct<{out_schema}>>, out_wts array<long>"
    )

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            in_vals, in_wts, out_vals, out_wts = state.get
            multiset = {tuple(v): w for v, w in zip(in_vals, in_wts)}
            prev_out = {tuple(v): w for v, w in zip(out_vals, out_wts)}
        else:
            multiset, prev_out = {}, {}
        for pdf in pdfs:
            cols = [pdf[c].tolist() for c in value_cols]
            for row in zip(*cols, pdf[DIFF].tolist()):
                v, d = tuple(row[:-1]), int(row[-1])
                w = multiset.get(v, 0) + d
                if w:
                    multiset[v] = w
                else:
                    multiset.pop(v, None)
        sorted_input = sorted((v, w) for v, w in multiset.items() if w > 0)
        new_out: dict[tuple, int] = {}
        if sorted_input:
            for v, w in logic(sorted_input):
                v = tuple(v)
                new_out[v] = new_out.get(v, 0) + w
        k = _key_tuple(key)
        rows = []
        for v, w in new_out.items():
            d = w - prev_out.get(v, 0)
            if d:
                rows.append(k + v + (d,))
        for v, w in prev_out.items():
            if v not in new_out and w:
                rows.append(k + v + (-w,))
        state.update(
            (
                list(multiset.keys()),
                list(multiset.values()),
                list(new_out.keys()),
                list(new_out.values()),
            )
        )
        if rows:
            yield pd.DataFrame(rows, columns=keys + out_cols + [DIFF])

    return updates.groupBy(*keys).applyInPandasWithState(
        kernel, full_out, state_schema, "update", GroupStateTimeout.NoTimeout
    )


def stateful_reduce(
    updates: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    value_col: str,
    logic: Callable[[list[tuple[int, int]]], list[tuple[int, int]]],
    out_value_col: str = "out_value",
) -> DataFrame:
    """Single-long-value convenience wrapper over
    :func:`stateful_reduce_general` (the historical API: ``logic`` sees
    ``[(value, weight), ...]`` with bare longs)."""

    def lifted(sorted_input):
        out = logic([(v[0], w) for v, w in sorted_input])
        return [
            ((v if isinstance(v, tuple) else (v,)), w) for v, w in out
        ]

    return stateful_reduce_general(
        updates,
        keys,
        key_schema,
        [value_col],
        f"{value_col} long",
        lifted,
        f"{out_value_col} long",
    )


def stateful_upsert(
    upserts: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    value_col: str,
    value_type: str = "double",
    seq_col: str | None = None,
) -> DataFrame:
    """Streaming upsert arrangement: input rows are ``(key, value, [seq])``
    upserts (null value = delete); output is the synthesized update stream
    ``(key, value, diff)`` retracting the previous value — reference
    src/operators/arrange/upsert.rs:1-33,138. Within a batch the greatest
    ``seq_col`` (or input order) wins, mirroring the reference's
    greatest-value tie rule (upsert.rs:16-24)."""
    keys = list(keys)
    out_schema = f"{key_schema}, {value_col} {value_type}, {DIFF} long"
    state_schema = f"val {value_type}, has long"

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if seq_col is not None:
            pdf = pdf.sort_values(seq_col)
        last = pdf.iloc[-1][value_col]
        last = None if pd.isna(last) else last
        old_val, has = state.get if state.exists else (None, 0)
        old = old_val if has else None
        k = _key_tuple(key)
        rows = []
        if old != last:
            if old is not None:
                rows.append(k + (old, -1))
            if last is not None:
                rows.append(k + (last, 1))
        state.update((last, 0 if last is None else 1))
        if rows:
            yield pd.DataFrame(rows, columns=keys + [value_col, DIFF])

    return upserts.groupBy(*keys).applyInPandasWithState(
        kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
