"""differential_dataflow_spark — a PySpark-native incremental/differential engine.

A from-scratch re-expression of differential dataflow's capabilities
(reference: danhhz/differential-dataflow, surveyed in SURVEY.md) as idiomatic
Spark: collections are DataFrames of weighted update triples
``(payload..., epoch, diff)``; operators are Catalyst-native DataFrame
combinators; incremental state lives in Structured Streaming state stores via
vectorized Arrow kernels; iteration is a driver-side fixpoint loop.

This is NOT a port — no code is translated from the Rust reference. The
reference defines WHAT to compute (operator semantics, cited file:line in
docstrings); the HOW is Spark-first.
"""

from differential_dataflow_spark.collection import DiffCollection, EPOCH, DIFF
from differential_dataflow_spark.session import get_spark

__all__ = ["DiffCollection", "EPOCH", "DIFF", "get_spark"]

__version__ = "0.1.0"
