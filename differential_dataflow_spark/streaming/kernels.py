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
- ``stateful_reduce``: per-key consolidated input multiset + previous output
  held in state; per batch the user logic recomputes the output from the
  sorted (value, weight) list and the kernel emits output deltas — the
  retraction recipe of reference src/operators/reduce.rs:280-287
  (``change.extend(output.drain(..).map(negate))``).
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


def stateful_reduce(
    updates: DataFrame,
    keys: Sequence[str],
    key_schema: str,
    value_col: str,
    logic: Callable[[list[tuple[int, int]]], list[tuple[int, int]]],
    out_value_col: str = "out_value",
) -> DataFrame:
    """General grouped reduce with long values: state = consolidated
    (value -> weight) multiset + previous output multiset; per batch apply
    ``logic`` to the sorted positive (value, weight) list and emit output
    deltas. Values/weights are longs (arrays in the state store); richer
    payloads belong in the batch reduce kernel."""
    keys = list(keys)
    out_schema = f"{key_schema}, {out_value_col} long, {DIFF} long"
    state_schema = (
        "in_vals array<long>, in_wts array<long>, out_vals array<long>, "
        "out_wts array<long>"
    )

    def kernel(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            in_vals, in_wts, out_vals, out_wts = state.get
            multiset = dict(zip(list(in_vals), list(in_wts)))
            prev_out = dict(zip(list(out_vals), list(out_wts)))
        else:
            multiset, prev_out = {}, {}
        for pdf in pdfs:
            for v, d in zip(pdf[value_col].tolist(), pdf[DIFF].tolist()):
                w = multiset.get(v, 0) + int(d)
                if w:
                    multiset[v] = w
                else:
                    multiset.pop(v, None)
        sorted_input = sorted((v, w) for v, w in multiset.items() if w > 0)
        new_out: dict[int, int] = {}
        if sorted_input:
            for v, w in logic(sorted_input):
                new_out[v] = new_out.get(v, 0) + w
        k = _key_tuple(key)
        rows = []
        for v, w in new_out.items():
            d = w - prev_out.get(v, 0)
            if d:
                rows.append(k + (v, d))
        for v, w in prev_out.items():
            if v not in new_out and w:
                rows.append(k + (v, -w))
        state.update(
            (
                list(multiset.keys()),
                list(multiset.values()),
                list(new_out.keys()),
                list(new_out.values()),
            )
        )
        if rows:
            yield pd.DataFrame(rows, columns=keys + [out_value_col, DIFF])

    return updates.groupBy(*keys).applyInPandasWithState(
        kernel, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
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
