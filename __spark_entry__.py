"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship incremental join+group pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator coverage registry; implementations
live in ``differential_dataflow_spark/queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from differential_dataflow_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: incremental per-user count update stream (retraction pairs
    per daily epoch) joined with the upsert-arranged latest value per user —
    the engine's join+group incremental pipeline on sf0.001."""
    from pyspark.sql import functions as F

    from differential_dataflow_spark.collection import DiffCollection
    from differential_dataflow_spark.operators.upsert import upsert_latest

    sf_dir = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = (
        DiffCollection.from_df(
            ev.select("user_id", "ts"),
            epoch=F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date")).cast("long"),
        )
        .map(F.col("user_id"))
        .count(["user_id"], alias="n")
    )
    latest = upsert_latest(
        ev.select("user_id", "ts", "event_id", F.col("value").alias("last_value")),
        keys=["user_id"],
        value_cols=["last_value"],
        order_by=["ts", "event_id"],
    )
    return counts.join(latest, on=["user_id"], broadcast_other=True).consolidate().df


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
