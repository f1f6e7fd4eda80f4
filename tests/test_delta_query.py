"""Multiway delta-join (half_join pipeline) vs batch recompute —
dogsdogsdogs/src/operators/half_join.rs + examples/delta_query.rs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from differential_dataflow_spark.streaming.delta_query import DeltaTriangles


def batch_triangles(edges: set[tuple[int, int]]) -> dict[tuple, int]:
    out: dict[tuple, int] = {}
    for a, b in edges:
        for b2, c in edges:
            if b2 != b:
                continue
            if (a, c) in edges:
                key = (a, b, c)
                out[key] = out.get(key, 0) + 1
    return out


def test_delta_triangles_matches_batch(spark):
    rng = random.Random(41)
    n = 25
    all_edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(160)})
    # 4 epochs: three add-batches, interleaved with retraction of a slice of
    # batch 1 (those edges are NOT in the final set).
    b1 = all_edges[:60]
    b2 = all_edges[60:110]
    retract = b1[:20]
    b3 = all_edges[110:]
    epochs = [
        [(s, d, 1) for s, d in b1],
        [(s, d, 1) for s, d in b2] + [(s, d, -1) for s, d in retract],
        [(s, d, 1) for s, d in b3],
        [(s, d, -1) for s, d in b2[:10]],
    ]
    final = (set(b1) - set(retract)) | (set(b2) - set(b2[:10])) | set(b3)

    dt = DeltaTriangles(spark, compact_every=2)
    acc: dict[tuple, int] = {}
    for ep in epochs:
        delta = spark.createDataFrame(ep, "src long, dst long, diff long")
        for r in dt.process_batch(delta).collect():
            key = (r.a, r.b, r.c)
            acc[key] = acc.get(key, 0) + r.diff
    got = {k: v for k, v in acc.items() if v != 0}
    want = batch_triangles(final)
    assert got == want
    dt.release()


def test_delta_triangles_multiplicity(spark):
    # Edge multiplicities multiply through the half-joins: doubling one edge
    # of a triangle doubles that triangle's weight.
    dt = DeltaTriangles(spark)
    d1 = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1), (0, 2, 1)], "src long, dst long, diff long"
    )
    out1 = {(r.a, r.b, r.c): r.diff for r in dt.process_batch(d1).collect()}
    assert out1 == {(0, 1, 2): 1}
    d2 = spark.createDataFrame([(0, 1, 1)], "src long, dst long, diff long")
    out2 = {(r.a, r.b, r.c): r.diff for r in dt.process_batch(d2).collect()}
    assert out2 == {(0, 1, 2): 1}  # second copy of (0,1) adds weight 1
    d3 = spark.createDataFrame([(1, 2, -1)], "src long, dst long, diff long")
    out3 = {(r.a, r.b, r.c): r.diff for r in dt.process_batch(d3).collect()}
    assert out3 == {(0, 1, 2): -2}  # removing the shared edge retracts both
    dt.release()


# ----------------------- generic n-way DeltaQuery ------------------------- #

from differential_dataflow_spark.streaming.delta_query import DeltaQuery


def _consolidate(acc: dict, rows) -> None:
    for r in rows:
        key = tuple(r[:-1])
        acc[key] = acc.get(key, 0) + r[-1]


def test_delta_query_two_relation_path(spark):
    """P(a,b,c,d) <= R(a,b), S(b,c), R(c,d): two relations, one occurring
    twice (mixed pre/post-batch views), maintained across 4 epochs with
    retractions in BOTH relations."""
    rng = random.Random(7)
    n = 18
    r_edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    s_edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(70)})
    epochs = [
        {"R": [(a, b, 1) for a, b in r_edges[:40]],
         "S": [(a, b, 1) for a, b in s_edges[:30]]},
        {"R": [(a, b, 1) for a, b in r_edges[40:]]
              + [(a, b, -1) for a, b in r_edges[:10]],
         "S": [(a, b, 1) for a, b in s_edges[30:]]},
        {"S": [(a, b, -1) for a, b in s_edges[:15]]},
        {"R": [(a, b, 1) for a, b in r_edges[:5]]},
    ]
    final_r: dict = {}
    final_s: dict = {}
    for ep in epochs:
        for rel, acc in (("R", final_r), ("S", final_s)):
            for a, b, w in ep.get(rel, []):
                acc[(a, b)] = acc.get((a, b), 0) + w
    fr = {k for k, v in final_r.items() if v > 0}
    fs = {k for k, v in final_s.items() if v > 0}
    want: dict = {}
    for a, b in fr:
        for b2, c in fs:
            if b2 != b:
                continue
            for c2, dd in fr:
                if c2 == c:
                    key = (a, b, c, dd)
                    want[key] = want.get(key, 0) + 1

    dq = DeltaQuery(
        spark,
        relations={"R": ("x", "y"), "S": ("x", "y")},
        atoms=[("R", ("a", "b")), ("S", ("b", "c")), ("R", ("c", "d"))],
        compact_every=2,
    )
    acc: dict = {}
    for ep in epochs:
        deltas = {
            rel: spark.createDataFrame(rows, "x long, y long, diff long")
            for rel, rows in ep.items()
        }
        _consolidate(acc, dq.process_batch(deltas).collect())
    got = {k: v for k, v in acc.items() if v != 0}
    assert got == want
    dq.release()


def test_delta_query_four_clique(spark):
    """K4(a,b,c,d): six occurrences of one relation — the depth-stress case
    from the verdict (a 4-clique delta pipeline per occurrence)."""
    rng = random.Random(13)
    n = 12
    all_edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(60)})
    b1, b2 = all_edges[:40], all_edges[40:]
    retract = b1[:12]
    final = (set(b1) - set(retract)) | set(b2)
    want: dict = {}
    fe = final
    for a, b in fe:
        for c in range(n):
            if (b, c) not in fe or (a, c) not in fe:
                continue
            for d in range(n):
                if (c, d) in fe and (a, d) in fe and (b, d) in fe:
                    key = (a, b, c, d)
                    want[key] = want.get(key, 0) + 1

    dq = DeltaQuery(
        spark,
        relations={"E": ("src", "dst")},
        atoms=[
            ("E", ("a", "b")), ("E", ("b", "c")), ("E", ("a", "c")),
            ("E", ("c", "d")), ("E", ("a", "d")), ("E", ("b", "d")),
        ],
        compact_every=2,
    )
    acc: dict = {}
    for rows in (
        [(s, d, 1) for s, d in b1],
        [(s, d, 1) for s, d in b2] + [(s, d, -1) for s, d in retract],
    ):
        delta = spark.createDataFrame(rows, "src long, dst long, diff long")
        _consolidate(acc, dq.process_batch({"E": delta}).collect())
    got = {k: v for k, v in acc.items() if v != 0}
    assert got == want
    dq.release()


def test_delta_query_repeated_variable(spark):
    """E(a,a),E(a,b): a variable repeated WITHIN an atom is an equality
    filter (self-loop endpoints)."""
    dq = DeltaQuery(
        spark,
        relations={"E": ("src", "dst")},
        atoms=[("E", ("a", "a")), ("E", ("a", "b"))],
    )
    d = spark.createDataFrame(
        [(0, 0, 1), (0, 5, 1), (1, 2, 1), (2, 2, 1), (2, 7, 2)],
        "src long, dst long, diff long",
    )
    out = {tuple(r[:-1]): r[-1] for r in dq.process_batch({"E": d}).collect()}
    assert out == {(0, 0): 1, (0, 5): 1, (2, 2): 1, (2, 7): 2}
    dq.release()
