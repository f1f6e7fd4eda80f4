"""Multi-temporal lateness semantics (reference examples/multitemporal.rs:22-49).

The reference can keep updating PAST logical times for as long as the input
holds a capability: late data is deferred, never dropped. Structured
Streaming's contract is narrower: late rows are incorporated iff they arrive
inside the watermark delay; rows later than that are dropped. SURVEY.md §2.10
documents the gap; this test PINS the supported side of it:

- a late row that lands inside the allowed lateness IS folded into its
  (still-open) event-time window — the reference's deferral semantics hold
  within the watermark horizon;
- a row later than the watermark is dropped silently — the documented
  deviation from the reference (which would defer it indefinitely).
"""

from __future__ import annotations

from datetime import datetime

from differential_dataflow_spark.streaming.sink import ExactlyOnceSink
from differential_dataflow_spark.streaming.source import (
    EpochFeeder,
    run_to_completion,
)
from differential_dataflow_spark.streaming.windows import streaming_tumbling_agg


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2025, 1, 1, minute // 60, minute % 60, second)


def test_in_watermark_late_data_is_incorporated(spark, tmp_path):
    feeder = EpochFeeder(spark, str(tmp_path / "in"), "k string, ts timestamp")
    # epoch 0: two rows in window [00:00,00:10), one at 00:25
    # -> max event time 00:25, watermark 00:15 after the batch
    feeder.insert("a", _ts(0))
    feeder.insert("a", _ts(5))
    feeder.insert("a", _ts(25))
    feeder.advance_epoch()
    # epoch 1: LATE row at 00:12 — behind the 00:15 watermark but its window
    # [00:10,00:20) is still open (end 00:20 > watermark) => must be counted.
    # Plus 00:45 to advance the watermark to 00:35, closing windows 0..2.
    feeder.insert("a", _ts(12))
    feeder.insert("a", _ts(45))
    feeder.advance_epoch()
    # epoch 2: TOO-LATE row at 00:02 (window closed, watermark 00:35) — the
    # documented drop; plus 01:30 to close the 00:45 window.
    feeder.insert("a", _ts(2))
    feeder.insert("a", _ts(90))
    feeder.advance_epoch()

    out = streaming_tumbling_agg(
        feeder.stream(), "ts", "10 minutes", ["k"], watermark="10 minutes"
    )
    sink = ExactlyOnceSink(str(tmp_path / "out"), "late")
    q = (
        out.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    run_to_completion(q)
    got = {
        (r.win_start.minute, r.n) for r in sink.read_all(spark).collect()
    }
    assert (10, 1) in got, "in-watermark late row (00:12) must be counted"
    assert (0, 2) in got, "too-late row (00:02) must NOT reopen window 0"
    assert (20, 1) in got and (40, 1) in got
