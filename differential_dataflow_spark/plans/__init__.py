"""Plan IR — the dynamically-typed query veneer of the reference's
``interactive/`` crate (interactive/src/plan/mod.rs:42-115)."""

from differential_dataflow_spark.plans.plan import Plan

__all__ = ["Plan"]
