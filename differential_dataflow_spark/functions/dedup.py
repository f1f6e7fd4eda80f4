"""Deduplication suite for document corpora.

Batch strategies, each scale-minded:

- ``exact_dedup`` — hash-groupBy on normalized text; one shuffle, map-side
  partial agg. The 100 TB workhorse.
- ``ngram_jaccard_pairs`` — exact Jaccard pairs over hashed n-gram shingles.
  Blocking by shared RARE shingle (document-frequency cap = the skew control:
  a stop-phrase shingle shared by 1M docs would otherwise contribute 10^12
  candidate pairs), a count-only Jaccard upper bound prunes implausible
  pairs, and the survivors verify exactly via id-rejoined shingle arrays —
  every emitted score is exact.
- ``minhash_lsh_pairs`` — k minhashes as ONE hash-aggregate pass → b bands;
  the banded self-join carries only (band, bucket, id); candidates verify
  with exact Jaccard after an id-rejoin. No document payload rides the
  band-explosion shuffle.
- ``simhash_pairs`` — 64-bit simhash as one 64-vote hash aggregate; near-dups
  = small Hamming distance, blocked by 4x16-bit chunk equality (pigeonhole:
  distance <= 3 over 4 chunks implies an identical chunk).
- ``embedding_cosine_pairs`` / ``..._lsh`` — cosine near-dup over embedding
  vectors (see similarity.py: exact blocked matmul / LSH-bucketed scale path).

Incremental:

- ``incremental_exact_dedup`` — Δ-batch of NEW documents matched against the
  arranged corpus keeper trace (operators/arrange.py), the per-ingest
  operation of a training-data pipeline.

All hashing uses xxhash64 with literal seeds — deterministic across runs and
cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from differential_dataflow_spark.functions.text import tokens
from differential_dataflow_spark.session import tracked_local_checkpoint

PRIME = 2147483647  # 2^31 - 1: minhash arithmetic stays well inside int64


def normalized(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    repartition_min_bytes: int = 2 << 20,
) -> DataFrame:
    """One row per distinct normalized text: keeper = min id, with the count
    of duplicates. Output: (keeper_id, n_dups).

    The normalize+hash pipeline runs in the scan stage, so its parallelism
    is the INPUT SPLIT count: a corpus packed into few splits (small files +
    open-cost packing) serializes the regexp on a handful of cores while the
    groupBy itself only ships (hash, partial-agg) rows. When the scan is
    split-starved AND carries enough bytes for the regexp to matter
    (``repartition_min_bytes``, default 2 MB of input files), repartition
    the raw rows first — the :func:`_shingle_base` guard, made conditional
    both ways: a warehouse scan with thousands of splits never pays an
    extra shuffle of the text bytes, and a trivially small corpus keeps its
    one-task plan (measured: a 50k-doc single-split corpus 16.9 s -> ~1 s;
    the 5k-doc sf0.1 corpus stays on the exchange-free plan). The probe is
    the scan's FILE LISTING only (~20 ms, already cached by the session's
    FileIndex); split count is estimated with Spark's default packing rule
    — ``df.rdd.getNumPartitions()`` would be exact but compiles the whole
    physical plan (~60-150 ms per call, measured)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:  # pragma: no cover - defensive, e.g. un-plannable df
        files = []
    if files:
        import os as _os
        from urllib.parse import urlparse

        try:
            total = sum(
                _os.path.getsize(urlparse(p).path or p) for p in files
            )
        except OSError:
            total = None  # non-local filesystem: cannot stat, leave alone
        if total is not None and total >= repartition_min_bytes:
            # Spark's split packing: files are charged openCostInBytes each
            # and packed into maxPartitionBytes bins (defaults 4 MB/128 MB;
            # the sessions here never override them — an estimate is enough,
            # the decision only needs "far fewer splits than cores").
            est_splits = (total + 4_194_304 * len(files)) // 134_217_728 + 1
            if est_splits < max(2, par // 2):
                df = df.repartition(par)
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


def shingle_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct xxhash64 of each word n-gram — the working representation for
    all shingle-based dedup. 8-byte longs instead of ~n-word strings cut both
    shuffle width and array_intersect cost; Jaccard over hashed sets equals
    Jaccard over the strings up to 64-bit collisions (~0 in practice).

    Computed by hashing each token once and combining n consecutive token
    hashes per gram — no per-gram string slicing/concatenation (the string
    path costs ~2x in interpreted HOF evaluation). The gram identity (which
    token n-tuples are distinct) is the same as for string shingles.
    """
    toks = tokens(col)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.xxhash64(*[F.element_at(th, i + j + 1) for j in range(n)]),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<long>"))
    )


def _shingle_base(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, sh: array<long>) with empty-shingle docs dropped, PERSISTED —
    every dedup plan reads it 3-5 times (blocking explode x2 sides,
    df-filter, verification rejoin x2); without caching the expensive
    tokenise+gram+hash expression re-runs per read. Freed by the session's
    release_all_cached / unpersist.

    Repartitioned first: a small parquet input arrives as one split, and
    without the explicit exchange the whole tokenise+gram pipeline (the
    dominant cost) runs on a single core — and the persisted single partition
    then serializes everything downstream too.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    # STAGED projection, not the one-shot ``shingle_hashes`` expression: the
    # token-hash array is aliased in its own Project so the gram step reads a
    # materialized attribute. Inlined into a single expression tree (the old
    # shape), the interpreted HOF evaluator re-computed the token-hash array
    # (regexp + per-token hash) for EVERY element_at — O(tokens²) per doc,
    # measured 7.4s vs 0.6s for 5k docs. Gram hash values are unchanged
    # (same xxhash64-of-3-token-hashes formula), so downstream results are
    # byte-identical.
    th = (
        df.repartition(par)
        # Filter on the CHEAP token-count predicate (equivalent: shingles are
        # non-empty iff the doc has >= n tokens). Filtering on size(sh) would
        # let Catalyst push the predicate below the projection and evaluate
        # the expensive shingle expression twice per row.
        .filter(F.size(tokens(text_col)) >= n)
        .select(
            F.col(id_col).alias("id"),
            F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("__th"),
        )
    )
    gram = F.transform(
        F.sequence(F.lit(0), F.size("__th") - n),
        lambda i: F.xxhash64(*[F.element_at(F.col("__th"), i + j + 1) for j in range(n)]),
    )
    base = th.select("id", F.array_distinct(gram).alias("sh")).persist()
    # Materialize NOW: downstream plans read this from 3-5 independent query
    # stages that AQE submits concurrently — left lazy, each stage races to
    # compute the uncached partitions and the expensive shingle expression
    # runs several times over.
    base.count()
    return base


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int = 256,
) -> DataFrame:
    """Jaccard >= threshold pairs over n-gram shingles, blocked by shared
    *rare* shingle. Output: (id_a, id_b, jaccard) with id_a < id_b.

    Skew control (the 100 TB requirement): a shingle shared by d documents
    contributes O(d^2) candidate pairs, so one stop-phrase shingle shared by
    1M docs would explode the self-join. Shingles with document frequency
    above ``df_cap`` are dropped from the BLOCKING step only; the Jaccard
    itself is verified exactly by re-joining the full shingle arrays by id,
    so every emitted score is exact. A true pair is missed only if ALL of its
    shared shingles are above the cap — for near-identical documents (the
    >=0.8 regime) practically never; pass ``df_cap=None`` for guaranteed
    completeness when the corpus is known skew-free.
    """
    base = _shingle_base(df, text_col, id_col, n)
    exploded = base.select("id", F.explode("sh").alias("gram"))
    if df_cap is not None:
        # Document frequency per shingle; keep only rare shingles as block
        # keys. One extra shuffle on gram, map-side combined.
        rare = (
            exploded.groupBy("gram")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= df_cap)
            .select("gram")
        )
        exploded = exploded.join(rare, "gram", "left_semi")
    a = exploded.alias("a")
    b = exploded.alias("b")
    # Candidates carry ids only, AGGREGATED to (pair, shared-rare-gram count)
    # — counting in the shuffle (map-side combined) instead of materializing
    # one wide row per shared gram.
    shared = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("__n_shared"))
    )
    # Jaccard UPPER BOUND from counts alone: the true intersection is at most
    # shared-rare + min(dropped_a, dropped_b), where dropped = shingles above
    # the df cap. Pairs whose bound misses the threshold are discarded before
    # the (array-sized) exact verification — with nothing dropped the bound
    # IS the exact Jaccard, so the verify set is already the answer set.
    sizes = base.select("id", F.size("sh").alias("__sz"))
    kept = exploded.groupBy("id").agg(F.count("*").alias("__n_rare"))
    stats = sizes.join(kept, "id", "left").select(
        "id",
        "__sz",
        (F.col("__sz") - F.coalesce(F.col("__n_rare"), F.lit(0))).alias("__drop"),
    )
    sa = stats.select(
        F.col("id").alias("id_a"),
        F.col("__sz").alias("__sz_a"),
        F.col("__drop").alias("__drop_a"),
    )
    sb = stats.select(
        F.col("id").alias("id_b"),
        F.col("__sz").alias("__sz_b"),
        F.col("__drop").alias("__drop_b"),
    )
    ub_inter = F.col("__n_shared") + F.least("__drop_a", "__drop_b")
    ub_j = ub_inter / (F.col("__sz_a") + F.col("__sz_b") - ub_inter)
    # sizes/kept are one short row per doc — AQE broadcasts them when small
    # and falls back to shuffle joins at corpus scale.
    plausible = (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(ub_j >= threshold)
        .select("id_a", "id_b")
    )
    return _verify_jaccard(plausible, base, threshold)


def _verify_jaccard(
    cands: DataFrame, base: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of candidate id pairs: join the shingle
    arrays back by id (two hash joins on the small candidate set) and score
    with native array_intersect/array_union."""
    sh_a = base.select(F.col("id").alias("id_a"), F.col("sh").alias("__sh_a"))
    sh_b = base.select(F.col("id").alias("id_b"), F.col("sh").alias("__sh_b"))
    inter = F.size(F.array_intersect("__sh_a", "__sh_b")).cast("double")
    union = F.size(F.array_union("__sh_a", "__sh_b")).cast("double")
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
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


def _cap_buckets(
    blocked: DataFrame, bucket_cols: list[str], cap: int | None
) -> DataFrame:
    """Skew control for LSH blocking self-joins (the ``df_cap`` pattern from
    :func:`ngram_jaccard_pairs`): a degenerate bucket of d members —
    boilerplate/template documents sharing a band signature, near-zero
    vectors, the zero chunk of short docs — contributes O(d²) candidate
    pairs, so one 1M-id bucket would emit 5·10¹¹ rows. Buckets with more
    than ``cap`` members are dropped from the BLOCKING step only (members
    that share any *non-degenerate* bucket still pair; verification stays
    exact). One id-only count aggregate, map-side combined. ``cap=None``
    disables the guard."""
    if cap is None:
        return blocked
    small = (
        blocked.groupBy(*bucket_cols)
        .agg(F.count("*").alias("__bn"))
        .filter(F.col("__bn") <= cap)
        .select(*bucket_cols)
    )
    return blocked.join(small, bucket_cols, "left_semi")


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    bucket_cap: int | None = 2048,
) -> DataFrame:
    """MinHash + LSH banding: candidates share >= 1 band bucket, then exact
    Jaccard verification. Shuffles: by band bucket (candidates), by pair
    (verification) — no cross product. Output (id_a, id_b, jaccard).
    ``bucket_cap`` bounds per-(band, bucket) cardinality (see
    :func:`_cap_buckets`)."""
    rows = k // bands
    base = _shingle_base(df, text_col, id_col, n)
    # Signature as ONE hash-aggregate pass: explode grams to rows, then k
    # min-of-affine-permutation aggregates in a single groupBy (whole-stage
    # codegen). The Column-expression minhash_signature runs k interpreted
    # array-HOF passes per document and is several times slower at scale.
    exploded = base.select("id", F.explode("sh").alias("g")).select(
        "id", (F.abs(F.xxhash64("g")) % PRIME).alias("hv")
    )
    mins = [
        F.min((F.col("hv") * (2 * i + 1) + ((0x85EBCA6B + i * 1315423911) % PRIME)) % PRIME).alias(f"__m{i}")
        for i in range(k)
    ]
    sig = exploded.groupBy("id").agg(*mins)
    # The banded self-join carries ONLY (band, bucket, id): shuffling the
    # shingle arrays through a 16-way band explosion would move document
    # contents x16 (it benched SLOWER than the exact path). Shingles re-join
    # by id for verification on the (small) candidate set.
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"__m{bi * rows + ri}")
                                    for ri in range(rows)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    banded = _cap_buckets(banded, ["band", "bucket"], bucket_cap)
    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    return _verify_jaccard(cands, base, threshold)


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


def simhash_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """(id, sh) with sh = 64-bit SimHash, computed as ONE hash aggregate:
    explode distinct token hashes to rows, then 64 conditional sums in a
    single groupBy pass (whole-stage codegen) — the column-expression
    :func:`simhash` runs 64 interpreted HOF passes over each token array and
    is ~3x slower at corpus scale."""
    par = df.sparkSession.sparkContext.defaultParallelism
    exploded = df.repartition(par).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.transform(tokens(text_col), lambda t: F.xxhash64(t)))
        ).alias("h"),
    )

    def bit(i: int) -> Column:
        return F.shiftleft(F.lit(1).cast("long"), i)

    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(bit(i)) != 0, 1).otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(bits)
    ]
    per_doc = exploded.groupBy("id").agg(*votes)
    sh = (F.col("__b0") > 0).cast("long") * bit(0)
    for i in range(1, bits):
        sh = sh + (F.col(f"__b{i}") > 0).cast("long") * bit(i)
    return per_doc.select("id", sh.alias("sh"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bucket_cap: int | None = 2048,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming, blocked on
    16-bit chunk equality (pigeonhole: distance <= 3 over 4 chunks implies an
    identical chunk). Output (id_a, id_b, hamming). ``bucket_cap`` bounds
    per-(chunk, val) cardinality (see :func:`_cap_buckets` — ``chunk_val=0``
    for short docs is the classic degenerate bucket here)."""
    # Persisted: the chunk self-join reads the (expensive) simhash aggregate
    # from both sides. Freed by release_all_cached / session teardown.
    base = simhash_table(df, text_col, id_col).persist()
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
    chunks = _cap_buckets(chunks, ["chunk", "val"], bucket_cap)
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


def incremental_exact_dedup(arrangement, delta: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Incremental exact dedup: match a Δ-batch of NEW documents against the
    arranged corpus trace, the operation a training-data pipeline runs per
    ingest (reference pattern: new batch vs the other side's trace,
    src/operators/join.rs:413-465, applied to dedup).

    ``arrangement`` is an :class:`~differential_dataflow_spark.operators.
    arrange.Arrangement` keyed by ``text_hash`` whose payload is the corpus
    keeper id per distinct normalized text. Per batch:

    1. hash the Δ docs (one projection);
    2. point-lookup the batch's hashes in the trace (broadcast semijoin —
       touches only matching keys, never the corpus scan);
    3. duplicates resolve to the existing keeper, else the batch-internal
       minimum id; previously-unseen representatives are sealed into the
       trace so the NEXT batch sees them.

    Returns ``(doc_id, keeper_id)`` for every Δ document (keeper_id ==
    doc_id marks a new representative).
    """
    from differential_dataflow_spark.collection import DiffCollection

    hashed = tracked_local_checkpoint(
        delta.select(
            F.col(id_col).alias("doc_id"),
            F.xxhash64(normalized(text_col)).alias("text_hash"),
        )
    )
    batch_keepers = hashed.groupBy("text_hash").agg(
        F.min("doc_id").alias("batch_keeper")
    )
    existing = (
        arrangement.lookup(hashed.select("text_hash"))
        if arrangement.batches
        else None
    )
    if existing is not None:
        existing = existing.select(
            "text_hash", F.col("keeper_id").alias("corpus_keeper")
        )
        resolved = batch_keepers.join(existing, "text_hash", "left")
    else:
        resolved = batch_keepers.withColumn("corpus_keeper", F.lit(None).cast("long"))
    resolved = tracked_local_checkpoint(
        resolved.select(
            "text_hash",
            F.coalesce("corpus_keeper", "batch_keeper").alias("keeper_id"),
            F.col("corpus_keeper").isNull().alias("__new_rep"),
        )
    )
    # Seal the new representatives so the next delta batch sees them.
    new_reps = resolved.filter(F.col("__new_rep")).select("text_hash", "keeper_id")
    arrangement.insert_batch(DiffCollection.from_df(new_reps, epoch=len(arrangement.batches)))
    return hashed.join(resolved.select("text_hash", "keeper_id"), "text_hash").select(
        "doc_id", "keeper_id"
    )
