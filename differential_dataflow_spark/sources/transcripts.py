"""Deterministic synthetic conversation-transcript generator.

Authoritative input shape (BASELINE.json input_hint / FIXTURES.md F1):
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)``. Generated fully inside Spark with ``spark.range`` + column
expressions — no driver-side data, no randomness source other than a seeded
hash, so any scale factor reproduces bit-identically on any cluster size.

Skew fixture: conversation lengths follow a deterministic heavy-tail — a few
"hot" conversations get many turns (FIXTURES.md: 1% of convs get ~30% of
turns) — which is what exercises the engine's salting / two-phase paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_TS = "2025-01-01 00:00:00"
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "python", "browser"]


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    avg_turns: int = 10,
    seed: int = 42,
    hot_fraction: float = 0.01,
    hot_multiplier: int = 30,
    num_partitions: int | None = None,
) -> DataFrame:
    """Build the transcripts table.

    Conversation ``c`` has ``len(c)`` turns where 1 hot conv in 100 gets
    ``hot_multiplier * avg_turns`` turns and the rest get a deterministic
    1..2*avg spread. Turn rows are produced distributed: one `spark.range`
    over conversations, then `explode(sequence(...))` for turn_idx — all
    JVM-side, scales linearly with cluster size.
    """
    # Hot conversations are SCATTERED (every k-th id), not clustered at the
    # low ids: clustering put every hot conv in the first range partition,
    # which made one generate/stage task carry ~10x the rows of the others
    # and the skew propagated into every downstream stage's input files.
    hot_stride = max(int(1 / hot_fraction), 1)
    convs = spark.range(0, n_convs, 1, num_partitions or spark.sparkContext.defaultParallelism)
    convs = convs.select(
        F.col("id").alias("conv_no"),
        # concat+lpad, not format_string: java.util.Formatter costs ~2x the
        # whole row's worth of codegen time at 10^8-row scale. Width 8:
        # lpad TRUNCATES longer inputs, so the width must cover the largest
        # conv number (10^8 convs) or ids would silently collide.
        F.concat(
            F.lit("c"), F.lpad(F.col("id").cast("string"), 8, "0")
        ).alias("conv_id"),
        F.when(F.col("id") % hot_stride == 0, F.lit(hot_multiplier * avg_turns))
        .otherwise(F.abs(F.xxhash64(F.col("id"), F.lit(seed)) % (avg_turns * 2)).cast("int") + 1)
        .alias("n_turns"),
    )
    turns = convs.select(
        "conv_no",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]),
        (F.col("turn_idx") % 3 + 1).cast("int"),
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            ((F.col("turn_idx") / 3).cast("int") % 3 + 1),
        ),
    )
    text_hash = F.abs(F.xxhash64("conv_id", "turn_idx", F.lit(seed)))
    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(
            F.lit("turn "),
            F.col("turn_idx").cast("string"),
            F.lit(" of "),
            F.col("conv_id"),
            F.lit(": "),
            role,
            F.lit(" says "),
            text_hash.cast("string"),
        ).alias("text"),
        tool.alias("tool"),
        (
            F.to_timestamp(F.lit(BASE_TS))
            + F.make_interval(secs=F.col("conv_no") % 3600)
            + F.make_interval(secs=F.col("turn_idx") * 30)
        ).alias("ts"),
    )
    return out


def transcripts_with_epochs(
    df: DataFrame, epoch_seconds: int = 600
) -> DataFrame:
    """Derive the update-stream view: assign each turn to a tumbling epoch
    from its event time (epochs = tumbling windows, SURVEY.md §1.4) and
    weight +1. Returns payload + (epoch, diff)."""
    base = F.to_timestamp(F.lit(BASE_TS))
    return df.select(
        "*",
        (
            F.floor((F.col("ts").cast("long") - base.cast("long")) / epoch_seconds)
        ).cast("long").alias("epoch"),
        F.lit(1).cast("long").alias("diff"),
    )
