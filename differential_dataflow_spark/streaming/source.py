"""Epoch-feeding input for streaming tests — the reference's ``InputSession``
surface (src/input.rs:49,117-138,197-301): ``insert``/``remove``/``update``
buffer updates, ``advance_to``+``flush`` close an epoch.

Spark translation for the sandbox: each closed epoch is one parquet file
dropped into a watched directory; a file-source streaming query picks it up as
one micro-batch (``maxFilesPerTrigger=1``), so micro-batch boundaries align
1:1 with epochs. On a real deployment the same role is played by Kafka offsets
or Iceberg snapshot increments.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class EpochFeeder:
    """Buffers update tuples; ``advance_epoch`` seals them into one file."""

    def __init__(self, spark: SparkSession, directory: str, schema: str):
        self.spark = spark
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.schema = schema  # payload schema; diff appended automatically
        self._buffer: list[tuple] = []
        self._epoch = 0

    def insert(self, *payload) -> None:
        self.update(payload, 1)

    def remove(self, *payload) -> None:
        self.update(payload, -1)

    def update(self, payload: tuple, diff: int) -> None:
        self._buffer.append(tuple(payload) + (diff,))

    def advance_epoch(self) -> int:
        """Seal the current epoch (advance_to + flush): write buffered updates
        as one file. An empty epoch writes an empty file so the stream still
        observes the frontier advance."""
        full_schema = f"{self.schema}, diff long"
        df = self.spark.createDataFrame(self._buffer or [], schema=full_schema)
        df.coalesce(1).write.mode("append").parquet(str(self.dir))
        self._buffer = []
        epoch = self._epoch
        self._epoch += 1
        return epoch

    def stream(self) -> DataFrame:
        """The readStream view: one file per trigger = one epoch per batch."""
        full_schema = f"{self.schema}, diff long"
        return (
            self.spark.readStream.schema(full_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(self.dir))
        )


def run_to_completion(query, timeout_sec: float = 120.0) -> None:
    """Process everything currently available, then stop (probe semantics:
    src/collection.rs:489-503 — output reflects all input)."""
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(timeout_sec)
