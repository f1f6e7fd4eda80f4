"""Incremental dedup: Δ-batches against the arranged corpus trace must agree
with a full recompute on the union (the daily-ingest operation)."""

from __future__ import annotations

from pyspark.sql import functions as F

from differential_dataflow_spark.functions.dedup import (
    incremental_exact_dedup,
    normalized,
)
from differential_dataflow_spark.operators.arrange import Arrangement


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_matches_recompute(spark, tmp_path):
    corpus = _docs(
        spark,
        [(0, "the cat sat"), (1, "a dog ran"), (2, "The  cat sat ")],  # 2 dups 0
    )
    batch1 = _docs(
        spark,
        [(10, "the cat sat"), (11, "new text one"), (12, "NEW TEXT ONE")],
    )
    batch2 = _docs(
        spark,
        [(20, "new text one"), (21, "a dog ran"), (22, "fresh stuff")],
    )
    arr = Arrangement(spark, str(tmp_path / "dedup_trace"), key=["text_hash"])
    # Seed the corpus itself through the same path (batch 0).
    m0 = {
        (r.doc_id, r.keeper_id)
        for r in incremental_exact_dedup(arr, corpus).collect()
    }
    assert m0 == {(0, 0), (2, 0), (1, 1)}
    m1 = {
        (r.doc_id, r.keeper_id)
        for r in incremental_exact_dedup(arr, batch1).collect()
    }
    # 10 duplicates corpus keeper 0; 11/12 are batch-internal dups, keeper 11
    assert m1 == {(10, 0), (11, 11), (12, 11)}
    m2 = {
        (r.doc_id, r.keeper_id)
        for r in incremental_exact_dedup(arr, batch2).collect()
    }
    # 20 hits batch1's representative 11; 21 hits corpus keeper 1; 22 is new
    assert m2 == {(20, 11), (21, 1), (22, 22)}

    # Full recompute on the union agrees with the incremental assignments:
    # same keeper for every doc (keeper = first-seen representative).
    union = corpus.unionByName(batch1).unionByName(batch2)
    full = union.select(
        "doc_id", F.xxhash64(normalized("text")).alias("h")
    )
    keepers = full.groupBy("h").agg(F.min("doc_id").alias("keeper_id"))
    want = {
        (r.doc_id, r.keeper_id)
        for r in full.join(keepers, "h").select("doc_id", "keeper_id").collect()
    }
    assert m0 | m1 | m2 == want
