"""Structured Streaming engine: watermark-driven incremental operators.

Maps the reference's streaming machinery onto Spark Structured Streaming
(SURVEY.md §2.10): frontiers/capabilities → watermarks; epoch close
(advance_to+flush, src/input.rs:277-301) → micro-batch trigger; arrangement
state → per-key state store via applyInPandasWithState Arrow kernels;
exactly-once capture protocol (src/capture.rs) → idempotent epoch-keyed
foreachBatch commits."""
