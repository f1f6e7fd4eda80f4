"""Iteration tests — reachability / BFS fixpoints vs hand-computed oracles
(reference tests/bfs.rs:24-120 style: compare against a sequential
recomputation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection
from differential_dataflow_spark.operators.iterate import (
    iterate,
    iterate_keyed_min,
    semi_naive,
)


def _edges(spark, pairs):
    return DiffCollection.from_updates(
        spark, [(s, d, 0, 1) for s, d in pairs], "src bigint, dst bigint"
    )


def _python_reach(pairs, roots):
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
    seen = set(roots)
    frontier = set(roots)
    while frontier:
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in seen:
                    seen.add(m)
                    nxt.add(m)
        frontier = nxt
    return sorted(seen)


def test_semi_naive_reachability(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 1), (5, 6), (4, 5)]
    edges = _edges(spark, pairs)
    roots = DiffCollection.from_updates(spark, [(0, 0, 1)], "node bigint")

    reached = semi_naive(
        roots,
        lambda frontier: frontier.map(src=F.col("node"))
        .join(edges.map(F.col("src"), node=F.col("dst")), on=["src"])
        .map(F.col("node")),
    )
    got = sorted(r.node for r in reached.df.collect())
    assert got == _python_reach(pairs, [0]) == [0, 1, 2, 3]


def test_iterate_generic_fixpoint_matches_semi_naive(spark):
    pairs = [(0, 1), (1, 2), (0, 3), (3, 4), (9, 0)]
    edges = _edges(spark, pairs)
    roots = DiffCollection.from_updates(spark, [(0, 0, 1)], "node bigint")

    def logic(inner):
        expanded = (
            inner.map(src=F.col("node"))
            .join(edges.map(F.col("src"), node=F.col("dst")), on=["src"])
            .map(F.col("node"))
        )
        return expanded.concat(roots).distinct(["node"])

    reached = iterate(roots, logic, max_iters=20)
    got = sorted(r.node for r in reached.df.collect())
    assert got == _python_reach(pairs, [0]) == [0, 1, 2, 3, 4]


def test_bfs_distances(spark):
    # BFS distance labeling (src/algorithms/graphs/bfs.rs:36-49):
    # dist(root)=0; dist(n) = min over edges (m,n) of dist(m)+1.
    pairs = [(0, 1), (1, 2), (0, 2), (2, 3), (4, 3)]
    edges = _edges(spark, pairs)
    init = DiffCollection.from_updates(spark, [(0, 0, 0, 1)], "node bigint, dist bigint")

    dists = iterate_keyed_min(
        init,
        lambda frontier: frontier.map(src=F.col("node"), d=F.col("dist"))
        .join(edges.map(F.col("src"), node=F.col("dst")), on=["src"])
        .map(F.col("node"), dist=F.col("d") + 1),
        keys=["node"],
        value="dist",
    )
    got = sorted((r.node, r.dist) for r in dists.df.collect())
    assert got == [(0, 0), (1, 1), (2, 1), (3, 2)]


def test_connected_components_label_propagation(spark):
    # propagate (src/algorithms/graphs/propagate.rs:18-60): each node keeps
    # the min label reachable over undirected edges.
    pairs = [(0, 1), (1, 2), (3, 4)]
    sym = pairs + [(d, s) for s, d in pairs]
    edges = _edges(spark, sym)
    nodes = sorted({n for p in pairs for n in p})
    labels = DiffCollection.from_updates(
        spark, [(n, n, 0, 1) for n in nodes], "node bigint, label bigint"
    )

    comps = iterate_keyed_min(
        labels,
        lambda frontier: frontier.map(src=F.col("node"), l=F.col("label"))
        .join(edges.map(F.col("src"), node=F.col("dst")), on=["src"])
        .map(F.col("node"), label=F.col("l")),
        keys=["node"],
        value="label",
    )
    got = sorted((r.node, r.label) for r in comps.df.collect())
    assert got == [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3)]


def test_iterate_with_priorities_enter_at(spark):
    # enter_at (src/collection.rs:375-392): records join the loop at their
    # round. Roots staged at rounds 0/2 over a 2-chain graph must reach the
    # same closure as all-at-once iteration (monotone logic), and the staged
    # plumbing must not lose or duplicate records.
    from differential_dataflow_spark.operators.iterate import (
        iterate_with_priorities,
    )

    edges = {(1, 2), (2, 3), (10, 11), (11, 12)}
    edges_coll = DiffCollection.from_updates(
        spark, [(s, d, 0, 1) for s, d in edges], "src bigint, dst bigint"
    )

    def logic(cur):
        new = (
            cur.map(src=F.col("node"))
            .join(edges_coll.map(F.col("src"), node=F.col("dst")), on=["src"])
            .map(F.col("node"))
        )
        return cur.concat(new).distinct(["node"])

    staged = DiffCollection.from_updates(
        spark,
        [(1, 0, 0, 1), (10, 2, 0, 1)],  # node 1 enters at round 0, 10 at 2
        "node bigint, enter_at bigint",
    )
    out = iterate_with_priorities(staged, logic)
    got = sorted(r.node for r in out.df.select("node").collect())
    assert got == [1, 2, 3, 10, 11, 12]


def test_mutual_semi_naive_even_odd(spark):
    # Even/odd-hop reachability: two mutually recursive relations
    # (the reference's multi-Variable shape). Python parity-BFS oracle.
    from differential_dataflow_spark.operators.iterate import mutual_semi_naive

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 0), (4, 5)]
    want = {("even", 0)}
    frontier = {("even", 0)}
    while frontier:
        nxt = set()
        for tag, n in frontier:
            out_tag = "odd" if tag == "even" else "even"
            for s, d in edges:
                if s == n and (out_tag, d) not in want:
                    nxt.add((out_tag, d))
        want |= nxt
        frontier = nxt

    e = DiffCollection.from_df(spark.createDataFrame(edges, "src long, dst long"))
    even0 = DiffCollection.from_df(
        spark.range(1).select(F.lit(0).cast("long").alias("node"))
    )
    odd0 = DiffCollection.from_df(spark.createDataFrame([], "node long"))

    def step(frontier_coll):
        return (
            frontier_coll.map(src=F.col("node"))
            .join(e.map(F.col("src"), node=F.col("dst")), on=["src"])
            .map(F.col("node"))
        )

    closed = mutual_semi_naive(
        roots={"even": even0, "odd": odd0},
        expands={
            "even": lambda fr, tot: step(fr["odd"]),
            "odd": lambda fr, tot: step(fr["even"]),
        },
    )
    got = {
        (tag, r["node"])
        for tag in ("even", "odd")
        for r in closed[tag].df.collect()
    }
    assert got == want
