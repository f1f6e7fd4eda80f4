"""CEP sequence patterns (operators/cep.py) vs brute-force python oracles on
randomized event streams — funnel (skip-till-next-match, strict-after,
within-gap) and contiguous patterns, including timestamp ties."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from differential_dataflow_spark.operators.cep import funnel, pattern_contiguous

TYPES = ["a", "b", "c", "d"]


def _gen(seed: int, n_keys: int = 8, n_events: int = 400, tie_every: int = 7):
    """Random (key, ts_us, type, event_id) stream with planted timestamp
    ties (every ``tie_every``-th event reuses the previous timestamp)."""
    rng = random.Random(seed)
    rows = []
    for eid in range(n_events):
        k = rng.randrange(n_keys)
        if rows and eid % tie_every == 0:
            tsu = rows[-1][1]  # tie (possibly on a different key)
        else:
            tsu = rng.randrange(0, 1_000_000) * 1_000_000  # whole seconds
        rows.append((k, tsu, rng.choice(TYPES), eid))
    return rows


def _funnel_oracle(rows, steps, within_us):
    """Greedy earliest-next binding, strictly after, per anchor."""
    by_key: dict = {}
    for k, tsu, ty, _ in rows:
        by_key.setdefault(k, []).append((tsu, ty))
    out = []
    for k, evs in by_key.items():
        for t1, ty in evs:
            if ty != steps[0]:
                continue
            bound = [t1]
            ok = True
            for s in steps[1:]:
                cands = [
                    t
                    for t, ty2 in evs
                    if ty2 == s and t > bound[-1] and t <= bound[-1] + within_us
                ]
                if not cands:
                    ok = False
                    break
                bound.append(min(cands))
            if ok:
                out.append((k, *bound))
    return sorted(out)


def test_funnel_matches_oracle_with_ties(spark):
    rows = _gen(11)
    df = spark.createDataFrame(
        [(k, tsu, ty, eid) for k, tsu, ty, eid in rows],
        "user long, tsu long, etype string, event_id long",
    ).select(
        "user",
        F.timestamp_micros(F.col("tsu")).alias("ts"),
        "etype",
        "event_id",
    )
    within = 200_000  # seconds
    t = F.col("etype")
    got = sorted(
        tuple(r)
        for r in funnel(
            df,
            key=["user"],
            ts="ts",
            steps=[t == "a", t == "b", t == "c"],
            within_sec=within,
        )
        .select("user", "t1", "t2", "t3")
        .collect()
    )
    want = _funnel_oracle(rows, ["a", "b", "c"], within * 1_000_000)
    # Spark's step-3 groupBy collapses duplicate (key, t1) anchors (ties on
    # the anchor timestamp); the oracle enumerates them — dedupe both.
    assert sorted(set(got)) == sorted(set(want))


def test_funnel_two_step_window_only_path(spark):
    rows = _gen(23, n_keys=5, n_events=200)
    df = spark.createDataFrame(
        rows, "user long, tsu long, etype string, event_id long"
    ).select(
        "user", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype"
    )
    within = 150_000
    t = F.col("etype")
    got = sorted(
        set(
            tuple(r)
            for r in funnel(
                df, ["user"], "ts", [t == "a", t == "d"], within_sec=within
            )
            .select("user", "t1", "t2")
            .collect()
        )
    )
    want = sorted(set(_funnel_oracle(rows, ["a", "d"], within * 1_000_000)))
    assert got == want


def test_pattern_contiguous_matches_oracle(spark):
    rows = _gen(37, n_keys=6, n_events=300, tie_every=10**9)  # no ties:
    # adjacency under (ts, event_id) is then unambiguous for the oracle too
    df = spark.createDataFrame(
        rows, "user long, tsu long, etype string, event_id long"
    ).select(
        "user",
        F.timestamp_micros(F.col("tsu")).alias("ts"),
        "etype",
        "event_id",
    )
    t = F.col("etype")
    got = sorted(
        tuple(r)
        for r in pattern_contiguous(
            df, ["user"], ["ts", "event_id"], [t == "a", t == "b"]
        )
        .select("user", "event_id")
        .collect()
    )
    by_key: dict = {}
    for k, tsu, ty, eid in rows:
        by_key.setdefault(k, []).append((tsu, eid, ty))
    want = []
    for k, evs in by_key.items():
        evs.sort()
        for (t0, e0, ty0), (t1, e1, ty1) in zip(evs, evs[1:]):
            if ty0 == "a" and ty1 == "b":
                want.append((k, e0))
    assert got == sorted(want)


def test_funnel_maintainer_parity_with_batch(spark):
    """Accumulated FunnelMaintainer matches across ts-ordered micro-batches
    == the batch funnel of the concatenated stream; pending state stays
    bounded by the funnel window."""
    from differential_dataflow_spark.operators.cep import FunnelMaintainer

    rng = random.Random(51)
    rows = []
    for eid in range(600):
        # Strictly increasing timestamps (watermark-ordered arrival).
        tsu = (eid + 1) * 60_000_000 + rng.randrange(0, 50) * 1_000_000
        rows.append((rng.randrange(6), tsu, rng.choice(TYPES), eid))
    rows.sort(key=lambda r: r[1])
    within = 600  # seconds: ~10 events per key-window on average

    def mk(batch_rows):
        return spark.createDataFrame(
            batch_rows, "user long, tsu long, etype string, event_id long"
        ).select(
            "user", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype"
        )

    t = F.col("etype")
    steps = [t == "a", t == "b", t == "c"]
    fm = FunnelMaintainer(
        spark, key=["user"], ts="ts", steps=steps, within_sec=within
    )
    got = set()
    cut1, cut2, cut3 = 150, 300, 450
    for lo, hi in [(0, cut1), (cut1, cut2), (cut2, cut3), (cut3, 600)]:
        out = fm.process_batch(mk(rows[lo:hi]))
        got |= {tuple(r) for r in out.collect()}
    n_pending = fm.pending.count()
    fm.release()

    want = {
        tuple(r)
        for r in funnel(mk(rows), ["user"], "ts", steps, within_sec=within)
        .select("user", "t1", "t2", "t3")
        .collect()
    }
    assert got == want
    # Expiry keeps state bounded: only chains whose window is still open at
    # the last seen timestamp survive.
    assert n_pending <= 6 * 2 * 12  # keys x open stages x window/event-rate


def test_funnel_maintainer_rejects_out_of_order(spark):
    from differential_dataflow_spark.operators.cep import FunnelMaintainer

    t = F.col("etype")
    fm = FunnelMaintainer(
        spark, ["user"], "ts", [t == "a", t == "b"], within_sec=60
    )
    df1 = spark.createDataFrame(
        [(1, 1_000_000, "a")], "user long, tsu long, etype string"
    ).select("user", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype")
    fm.process_batch(df1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="out-of-order"):
        fm.process_batch(df1)
    fm.release()


def test_funnel_maintainer_string_keys(spark):
    """conv_id-shaped string keys: the pending-state schema derives from the
    batch, so native key types pass through."""
    from differential_dataflow_spark.operators.cep import FunnelMaintainer

    t = F.col("etype")
    fm = FunnelMaintainer(
        spark, ["conv"], "ts", [t == "a", t == "b"], within_sec=100
    )
    def mk(rows):
        return spark.createDataFrame(
            rows, "conv string, tsu long, etype string"
        ).select("conv", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype")
    out1 = fm.process_batch(mk([("c1", 1_000_000, "a"), ("c2", 2_000_000, "a")]))
    assert out1.count() == 0
    out2 = fm.process_batch(mk([("c1", 50_000_000, "b"), ("c2", 200_000_000, "b")]))
    got = {tuple(r) for r in out2.collect()}
    # c1 completes (49s < 100s); c2's window expired (198s > 100s).
    assert got == {("c1", 1_000_000, 50_000_000)}
    fm.release()


def test_funnel_on_transcripts_stream(spark):
    """The north-rule payload: CEP over the deterministic transcript table
    (conv_id string, turn_idx, role, text, tool, ts) — detect the
    user -> assistant -> tool sequence per conversation within a window,
    streaming maintainer vs batch funnel on the same stream."""
    from differential_dataflow_spark.operators.cep import FunnelMaintainer, funnel
    from differential_dataflow_spark.sources.transcripts import (
        generate_transcripts,
    )

    tr = generate_transcripts(spark, n_convs=300, seed=3).select(
        "conv_id", "role", "ts"
    )
    r = F.col("role")
    steps = [r == "user", r == "assistant", r == "tool"]
    within = 3600
    want = {
        tuple(x)
        for x in funnel(tr, ["conv_id"], "ts", steps, within_sec=within)
        .select("conv_id", "t1", "t2", "t3")
        .collect()
    }
    assert want, "generator should produce at least one funnel match"

    # Split into three ts-ordered batches on global time terciles.
    lo, hi = tr.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    fm = FunnelMaintainer(spark, ["conv_id"], "ts", steps, within_sec=within)
    got = set()
    u = F.unix_micros("ts")
    for cond in [u <= c1, (u > c1) & (u <= c2), u > c2]:
        got |= {
            tuple(x) for x in fm.process_batch(tr.filter(cond)).collect()
        }
    fm.release()
    assert got == want


def test_absence_batch_and_streaming_parity(spark):
    """Batch absence vs python oracle, and AbsenceMaintainer alerts+flush ==
    batch absence across ts-ordered micro-batches."""
    from differential_dataflow_spark.operators.cep import (
        AbsenceMaintainer,
        absence,
    )

    rng = random.Random(77)
    rows = []
    for eid in range(500):
        tsu = (eid + 1) * 60_000_000 + rng.randrange(0, 50) * 1_000_000
        rows.append((rng.randrange(6), tsu, rng.choice(TYPES), eid))
    within = 480  # seconds

    def mk(batch_rows):
        return spark.createDataFrame(
            batch_rows, "user long, tsu long, etype string, event_id long"
        ).select(
            "user", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype"
        )

    t = F.col("etype")
    got_batch = {
        tuple(r)
        for r in absence(
            mk(rows), ["user"], "ts", t == "a", t == "b", within_sec=within
        ).collect()
    }
    # Python oracle.
    by_key: dict = {}
    for k, tsu, ty, _ in rows:
        by_key.setdefault(k, []).append((tsu, ty))
    want = set()
    for k, evs in by_key.items():
        for t1, ty in evs:
            if ty != "a":
                continue
            nxt = [t for t, ty2 in evs if ty2 == "b" and t > t1]
            if not nxt or min(nxt) > t1 + within * 1_000_000:
                want.add((k, t1))
    assert got_batch == want

    am = AbsenceMaintainer(
        spark, ["user"], "ts", t == "a", t == "b", within_sec=within
    )
    got = set()
    for lo, hi in [(0, 125), (125, 250), (250, 375), (375, 500)]:
        got |= {tuple(r) for r in am.process_batch(mk(rows[lo:hi])).collect()}
    # Streaming alerts fire only once the stream passes the deadline; the
    # tail (still-open anchors) is the flush.
    tail = {tuple(r) for r in am.flush().collect()}
    am.release()
    assert got | tail == want
    # Alerts are exactly the batch-absent anchors whose deadline HAS passed.
    last_ts = max(r[1] for r in rows)
    assert got == {
        (k, t1) for (k, t1) in want if last_ts > t1 + within * 1_000_000
    }


def test_funnel_duplicate_anchor_cardinality_contract(spark):
    """Pin the documented duplicate-anchor contract: with two identical
    step-1 events (same key, same microsecond), the 2-step batch funnel
    emits one row per anchor EVENT; 3+-step funnels and FunnelMaintainer
    emit one row per DISTINCT chain."""
    from differential_dataflow_spark.operators.cep import (
        FunnelMaintainer,
        funnel,
    )

    rows = [
        (1, 1_000_000, "a"),
        (1, 1_000_000, "a"),  # exact duplicate anchor
        (1, 2_000_000, "b"),
        (1, 3_000_000, "c"),
    ]
    df = spark.createDataFrame(rows, "k long, tsu long, etype string").select(
        "k", F.timestamp_micros(F.col("tsu")).alias("ts"), "etype"
    )
    t = F.col("etype")
    two = funnel(df, ["k"], "ts", [t == "a", t == "b"], within_sec=10)
    assert two.count() == 2  # per anchor event
    three = funnel(
        df, ["k"], "ts", [t == "a", t == "b", t == "c"], within_sec=10
    )
    assert three.count() == 1  # per distinct chain
    fm = FunnelMaintainer(
        spark, ["k"], "ts", [t == "a", t == "b"], within_sec=10
    )
    out = fm.process_batch(df)
    assert out.count() == 1  # maintainer: distinct-chain semantics
    fm.release()
