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
