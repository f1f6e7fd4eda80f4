"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: query set × corpus join with the
  dot product as a native ``F.aggregate(F.zip_with(...))`` expression
  (JVM-side, codegen). The baseline and the exact verifier.
- ``lsh_topk`` — random-hyperplane LSH: deterministic hyperplanes from
  xxhash64, signature buckets block the search; candidates reranked exactly.
  The scale path: corpus hashed once, queries probe only matching buckets.
- ``embedding_cosine_pairs`` — corpus near-dup pairs above a cosine
  threshold, LSH-blocked.

At 100 TB the corpus side is bucketed/partitioned by signature so a query
touches one partition per probe; here the same plan shapes run at sandbox
scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # Cast to double BEFORE multiplying — float32 products drift ~1e-7,
    # enough to flip round(cos, 6) against a double-precision oracle.
    ad, bd = a.cast("array<double>"), b.cast("array<double>")
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    ad = a.cast("array<double>")
    return F.sqrt(
        F.aggregate(
            F.transform(ad, lambda x: x * x),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (excluding self-matches on
    equal ids). Output: (query_id, vec_id, cos, rank)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(F.col(id_col), F.col(vec_col).alias("__cv"))
    scored = q.crossJoin(c).filter(F.col(query_id_col) != F.col(id_col)).select(
        query_id_col,
        id_col,
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", F.col("rank").cast("long"))
    )


def hyperplane_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane LSH signature (long): bit i = sign(v · h_i), with
    h_i components derived from xxhash64(seed, i, j) — deterministic,
    computable on any worker without shipping plane matrices."""
    bits = []
    for i in range(n_planes):
        comp = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (
                (F.xxhash64(F.lit(seed), F.lit(i), j) % 2001) - 1000
            ).cast("double")
            / 1000.0,
        )
        proj = F.aggregate(
            F.zip_with(vec, comp, lambda x, h: (x * h).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append((proj > 0).cast("long") * F.lit(1 << i))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane signatures; a
    corpus vector is a candidate if it collides with the query in any table;
    candidates reranked by exact cosine. Output like brute_force_topk."""
    def with_sigs(df: DataFrame, idc: str, vc: str) -> DataFrame:
        return df.select(
            F.col(idc),
            F.col(vc).alias(f"__{idc}_v"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            hyperplane_signature(
                                F.col(vc), dim, n_planes, seed=42 + t
                            ).alias("sig"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("ts"),
        ).select(idc, f"__{idc}_v", "ts.table", "ts.sig")

    qs = with_sigs(queries, query_id_col, vec_col)
    cs = with_sigs(corpus, id_col, vec_col)
    cands = (
        qs.join(cs, ["table", "sig"])
        .filter(F.col(query_id_col) != F.col(id_col))
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cands.select(
        query_id_col,
        id_col,
        F.round(
            cosine(F.col(f"__{query_id_col}_v"), F.col(f"__{id_col}_v")), 6
        ).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos", F.col("rank").cast("long"))
    )


def embedding_cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold (exact, pair-blocked by
    id ordering). Output: (id_a, id_b, cos)."""
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("__va"), F.col("__vb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
