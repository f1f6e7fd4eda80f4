"""Worst-case-optimal join triad tests (dogs³ propose/validate/count) —
triangle enumeration vs a python oracle on random directed graphs."""

from __future__ import annotations

import random

from differential_dataflow_spark.operators.wco import (
    count_extensions,
    propose,
    triangles,
    validate,
)


def _graph(seed=17, n=30, m=150):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def test_triangles_match_python(spark):
    pairs = _graph()
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r.a, r.b, r.c) for r in triangles(df).collect()}
    es = set(pairs)
    want = {
        (a, b, c)
        for (a, b) in es
        for c in {d for (s, d) in es if s == b}
        if (a, c) in es
    }
    assert got == want
    assert len(want) > 0  # the fixture actually has triangles


def test_triad_primitives(spark):
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4)], "src long, dst long"
    )
    prefixes = spark.createDataFrame([(1,), (2,), (9,)], "src long")
    counted = count_extensions(prefixes, edges, ["src"], "dst", "n")
    assert {(r.src, r.n) for r in counted.collect()} == {(1, 2), (2, 1), (9, 0)}
    prop = propose(prefixes, edges, ["src"], "dst")
    assert {(r.src, r.dst) for r in prop.collect()} == {(1, 2), (1, 3), (2, 4)}
    ok = validate(prop, spark.createDataFrame([(1, 3), (2, 4)], "src long, dst long"), ["src", "dst"])
    assert {(r.src, r.dst) for r in ok.collect()} == {(1, 3), (2, 4)}
