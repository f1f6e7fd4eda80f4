"""Graph algorithm tests vs pure-python oracles — the reference's randomized
differential-testing style (tests/bfs.rs:24-120) with seeded graphs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from differential_dataflow_spark import DiffCollection
from differential_dataflow_spark.algorithms import graphs as G


def _edges(spark, pairs):
    return DiffCollection.from_updates(
        spark, [(s, d, 0, 1) for s, d in pairs], "src bigint, dst bigint"
    )


def _random_graph(seed=7, n=40, m=120):
    rng = random.Random(seed)
    return list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})


def _py_bfs(pairs, roots):
    adj: dict[int, list[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    dist = {r: 0 for r in roots}
    frontier = list(roots)
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    nxt.append(v)
        frontier = nxt
    return dist


def _py_components(pairs):
    nodes = {n for p in pairs for n in p}
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {n: find(n) for n in nodes}


def _py_kcore(pairs, k):
    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m_ in adj.pop(n):
                    adj[m_].discard(n)
                changed = True
    return {
        (min(a, b), max(a, b)) for a in adj for b in adj[a]
    }


def test_bfs_random_graph(spark):
    pairs = _random_graph()
    edges = _edges(spark, pairs)
    roots = DiffCollection.from_updates(spark, [(0, 0, 1), (1, 0, 1)], "node bigint")
    got = {
        (r.node, r.dist) for r in G.bfs_distances(roots, edges).df.collect()
    }
    want = set(_py_bfs(pairs, [0, 1]).items())
    assert got == want


def test_connected_components_random_graph(spark):
    pairs = _random_graph(seed=11, n=30, m=40)
    edges = _edges(spark, pairs)
    got = {
        (r.node, r.component)
        for r in G.connected_components(edges).df.collect()
    }
    want = set(_py_components(pairs).items())
    assert got == want


def test_k_core_random_graph(spark):
    pairs = [(s, d) for s, d in _random_graph(seed=3, n=25, m=80) if s != d]
    edges = _edges(spark, pairs)
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in G.k_core(edges, k=3).df.collect()
    }
    want = _py_kcore(pairs, 3)
    assert got == want


def test_degree_distribution_matches_python(spark):
    pairs = _random_graph(seed=5)
    edges = _edges(spark, pairs)
    got = {
        (r.degree, r.n_nodes)
        for r in G.degree_distribution(edges).consolidate_final().collect()
    }
    from collections import Counter

    degs = Counter(s for s, _ in pairs)
    dist = Counter(degs.values())
    assert got == {(d, n) for d, n in dist.items()}


def test_assign_identifiers_unique_and_deterministic(spark):
    records = DiffCollection.from_df(
        spark.range(500).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    )
    out1 = G.assign_identifiers(records).df.collect()
    ids = [r.assigned_id for r in out1]
    assert len(ids) == 500 and len(set(ids)) == 500
    out2 = G.assign_identifiers(records).df.collect()
    assert {(r.k, r.assigned_id) for r in out1} == {
        (r.k, r.assigned_id) for r in out2
    }


def test_assign_identifiers_crippled_hash_unique(spark):
    # Mirror the reference's are_unique test (src/algorithms/identifiers.rs):
    # cripple the hash to a tiny range so round r+1 retries collide with
    # already-settled winners — ids must still come out unique.
    records = DiffCollection.from_df(
        spark.range(24).select(F.col("id").alias("k"))
    )
    crippled = lambda cols, r: F.abs(F.xxhash64(*cols, F.lit(r))) % 32  # noqa: E731
    out = G.assign_identifiers(records, max_rounds=256, hash_fn=crippled).df.collect()
    ids = [r.assigned_id for r in out]
    assert len(ids) == 24 and len(set(ids)) == 24
    assert all(0 <= i < 32 for i in ids)


def test_prefix_sum(spark):
    df = spark.createDataFrame(
        [(i, i * 2) for i in range(10)], "ord long, val long"
    )
    got = {
        (r.ord, r.prefix_sum)
        for r in G.prefix_sum(df, "ord", "val").collect()
    }
    acc, want = 0, set()
    for i in range(10):
        acc += i * 2
        want.add((i, acc))
    assert got == want


def _py_scc(pairs):
    import sys
    sys.setrecursionlimit(100000)
    nodes = sorted({n for p in pairs for n in p})
    adj = {}
    for s, d in pairs:
        adj.setdefault(s, []).append(d)
    index = {}
    low = {}
    on_stack = set()
    stack = []
    comp = {}
    counter = [0]

    def strongconnect(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on_stack.add(v)
        for w in adj.get(v, ()):
            if w not in index:
                strongconnect(w)
                low[v] = min(low[v], low[w])
            elif w in on_stack:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            members = []
            while True:
                w = stack.pop()
                on_stack.discard(w)
                members.append(w)
                if w == v:
                    break
            m = min(members)
            for w in members:
                comp[w] = m

    for n in nodes:
        if n not in index:
            strongconnect(n)
    return comp


def test_scc_random_graph(spark):
    pairs = _random_graph(seed=13, n=20, m=45)
    pairs += [(1, 2), (2, 3), (3, 1)]  # plant a cycle
    pairs = list(set(pairs))
    edges = _edges(spark, pairs)
    got = {
        (r.node, r.scc)
        for r in G.strongly_connected_components(edges).df.collect()
    }
    want = set(_py_scc(pairs).items())
    assert got == want


def test_bidirectional_shortest_path(spark):
    # Random directed graph; python BFS oracle.
    import random
    from collections import deque

    rng = random.Random(13)
    n = 80
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(240)})
    adj = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)

    def bfs(src, dst):
        seen, q = {src: 0}, deque([src])
        while q:
            u = q.popleft()
            if u == dst:
                return seen[u]
            for v in adj.get(u, []):
                if v not in seen:
                    seen[v] = seen[u] + 1
                    q.append(v)
        return None

    coll = DiffCollection.from_df(
        spark.createDataFrame(edges, "src long, dst long")
    )
    for src, dst in [(0, 7), (1, 33), (5, 5), (2, 61)]:
        want = bfs(src, dst)
        got_rows = G.bidirectional_shortest_path(coll, src, dst).collect()
        got = got_rows[0].dist if got_rows else None
        assert got == want, f"{src}->{dst}: got {got} want {want}"


def test_sequential_coloring_matches_greedy(spark):
    # Greedy-in-id-order python oracle (the exact semantics of the reference's
    # order-gated fixpoint, src/algorithms/graphs/sequential.rs:44-60).
    import random

    rng = random.Random(29)
    n = 60
    edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    edges = [(s, d) for (s, d) in edges if s != d]
    nbrs = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    want = {}
    for node in sorted(nbrs):
        used = {want[m] for m in nbrs[node] if m in want}
        c = 1
        while c in used:
            c += 1
        want[node] = c

    coll = DiffCollection.from_df(
        spark.createDataFrame(edges, "src long, dst long")
    )
    got = {r.node: r.color for r in G.sequential_coloring(coll).df.collect()}
    assert got == want
    # validity: no edge is monochromatic
    for s, d in edges:
        assert got[s] != got[d]
    # The distributed level-synchronous fallback (taken when a component
    # exceeds max_component_nodes) must agree with the in-task greedy kernel.
    got_ls = {
        r.node: r.color
        for r in G.sequential_coloring(coll, max_component_nodes=0).df.collect()
    }
    assert got_ls == want
