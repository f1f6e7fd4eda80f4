"""Parquet table loaders for the driver-generated test data
(TESTDATA.md: region nation customer supplier part orders lineitem events
documents embeddings at /root/testdata/sf*/). The reference streams TPC-H
``.tbl`` files into typed collections (tpchlike/src/types.rs:68-117); here the
scan is a parquet read with pushdown + pruning from Catalyst."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from differential_dataflow_spark.collection import DiffCollection

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_collection(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR, epoch: int = 0
) -> DiffCollection:
    """Load a table as a collection: each row an insertion at ``epoch``."""
    return DiffCollection.from_df(load_table(spark, name, sf_dir), epoch=epoch)
