"""Deduplication suite for document corpora.

Five strategies, each scale-minded:

- ``exact_dedup`` — hash-groupBy on normalized text; one shuffle, map-side
  partial agg. The 100 TB workhorse.
- ``ngram_jaccard_pairs`` — exact n-gram-shingle Jaccard similarity pairs.
  Banded by shingle-match blocking (pairs must share at least one shingle) so
  it avoids the full cross product; still O(candidate pairs) — the exact
  verifier for the approximate methods.
- ``minhash_lsh_pairs`` — shingle → k minhashes → b bands; pairs sharing a
  band bucket are candidates, verified with exact Jaccard. Scales: the only
  shuffles are by band-bucket key and candidate pair.
- ``simhash_pairs`` — 64-bit simhash of token hashes; near-dups = small
  Hamming distance, blocked by 4x16-bit chunk equality (a pair within
  Hamming distance 3 must share at least one of 4 chunks).
- ``embedding_cosine_pairs`` — cosine near-dup over embedding vectors
  (see similarity.py for the ANN machinery).

All hashing uses xxhash64 with literal seeds — deterministic across runs and
cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from differential_dataflow_spark.functions.text import tokens

PRIME = 2147483647  # 2^31 - 1: minhash arithmetic stays well inside int64


def normalized(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: keeper = min id, with the count
    of duplicates. Output: (keeper_id, n_dups)."""
    return (
        df.groupBy(F.xxhash64(normalized(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
        .select("keeper_id", "n_copies")
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array())
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact Jaccard >= threshold pairs over n-gram shingles, blocked by
    shared shingle (an explode + self-join on the shingle — no cross
    product). Output: (id_a, id_b, jaccard) with id_a < id_b."""
    base = df.select(
        F.col(id_col).alias("id"), shingles(text_col, n).alias("sh")
    ).withColumn("sh_size", F.size("sh"))
    exploded = base.select("id", "sh_size", F.explode("sh").alias("gram"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh_size").alias("size_a"),
            F.col("b.sh_size").alias("size_b"),
        )
        .agg(F.count("*").cast("double").alias("n_inter"))
    )
    jac = inter.withColumn(
        "jaccard",
        F.round(
            F.col("n_inter")
            / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
            6,
        ),
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", "jaccard"
    )


def minhash_signature(col: Column, k: int = 64) -> Column:
    """k-permutation minhash over a shingle array: h_i = min over shingles of
    (a_i * x + b_i) mod p, x = xxhash64(shingle, i)-free base hash. Seeds are
    literals -> deterministic everywhere."""
    x = F.transform(col, lambda s: F.abs(F.xxhash64(s)) % PRIME)
    sigs = []
    for i in range(k):
        a = 2 * i + 1  # odd multipliers: x*a + b < 2^31 * 2^8 << 2^63
        b = (0x85EBCA6B + i * 1315423911) % PRIME
        sigs.append(F.array_min(F.transform(x, lambda v: (v * a + b) % PRIME)))
    return F.array(*sigs)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash + LSH banding: candidates share >= 1 band bucket, then exact
    Jaccard verification. Shuffles: by band bucket (candidates), by pair
    (verification) — no cross product. Output (id_a, id_b, jaccard)."""
    rows = k // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(text_col, n).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = base.withColumn("sig", minhash_signature(F.col("sh"), k))
    banded = sig.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("sig", bi * rows + ri + 1)
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sh", "bb.band", "bb.bucket")
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cands.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(col: Column | str, bits: int = 64) -> Column:
    """SimHash: sign-sum of per-token hash bits. Implemented as a bit-wise
    vote using array expressions (JVM-side): for each bit position, count
    tokens whose hash has the bit set; bit in output = majority."""
    toks = tokens(col) if isinstance(col, str) else col
    hashes = F.transform(F.array_distinct(toks), lambda t: F.xxhash64(t))
    def bit(i: int) -> Column:
        # 1 << 63 overflows a signed-long literal; shiftleft stays in-range.
        return F.shiftleft(F.lit(1).cast("long"), i)

    def vote(i: int) -> Column:
        # pyspark HOF lambdas must be exactly (acc, x) — bind i via closure.
        def step(acc, h):
            return acc + F.when(h.bitwiseAND(bit(i)) != 0, 1).otherwise(-1)

        return (F.aggregate(hashes, F.lit(0), step) > 0).cast("long") * bit(i)

    votes = [vote(i) for i in range(bits)]
    out = votes[0]
    for v in votes[1:]:
        out = out + v
    return out


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming, blocked on
    16-bit chunk equality (pigeonhole: distance <= 3 over 4 chunks implies an
    identical chunk). Output (id_a, id_b, hamming)."""
    base = df.select(
        F.col(id_col).alias("id"), simhash(text_col).alias("sh")
    )
    chunks = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned("sh", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "sh", "c.chunk", "c.val")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cands.withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
