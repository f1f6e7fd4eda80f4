"""Text analysis over the documents table — all native pyspark.sql
expressions (whole-stage codegen; no Python in the row path).

Every function takes/returns DataFrames so the same code runs on a 100 TB
corpus: pure projections scale embarrassingly; nothing here shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish word/punctuation splitter: runs of letters, runs of digits, or
# single non-space symbols — the usual pre-tokenizer shape.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = (
    "the a an and or of to in is are was were be been for on with as by at "
    "from that this it its"
).split()

# Tiny character/word profiles for a deterministic n-gram language heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": [],  # CJK detected by charset below
}


def tokens(col: Column | str) -> Column:
    """Token array via the BPE-ish regex (regexp_extract_all, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+"))


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", token_count(text_col)).withColumn(
        "n_ws_tokens", whitespace_token_count(text_col)
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: length, punctuation/digit/stopword ratios,
    mean word length, repetition ratio (distinct/total tokens)."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr)).cast("double")
    distinct_ratio = F.when(
        n > 0, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(0.0)
    punct = F.length(F.regexp_replace(c, r"[^\.,;:!\?'\"]", "")).cast("double")
    digits = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    length = F.length(c).cast("double")
    mean_word_len = F.when(
        n > 0,
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / n,
    ).otherwise(0.0)
    return (
        df.withColumn("n_chars_measured", length.cast("long"))
        .withColumn("n_tokens", n.cast("long"))
        .withColumn("punct_ratio", F.round(punct / F.greatest(length, F.lit(1.0)), 6))
        .withColumn("digit_ratio", F.round(digits / F.greatest(length, F.lit(1.0)), 6))
        .withColumn(
            "stopword_ratio", F.round(n_stop / F.greatest(n, F.lit(1.0)), 6)
        )
        .withColumn("distinct_token_ratio", F.round(distinct_ratio, 6))
        .withColumn("mean_word_len", F.round(mean_word_len, 6))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A simple composite score in [0,1]: long enough, not punctuation/digit
    heavy, some lexical diversity."""
    feats = quality_features(df, text_col)
    score = (
        F.least(F.col("n_tokens") / 64.0, F.lit(1.0)) * 0.4
        + (1 - F.least(F.col("punct_ratio") * 5, F.lit(1.0))) * 0.2
        + (1 - F.least(F.col("digit_ratio") * 5, F.lit(1.0))) * 0.2
        + F.least(F.col("distinct_token_ratio") * 2, F.lit(1.0)) * 0.2
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic language heuristic: CJK charset ratio first, else the
    marker-word profile with the highest hit count, else 'en'. (A real
    deployment would swap in fastText/CLD3 via a pandas UDF — the surrounding
    plumbing is identical.)"""
    c = F.col(text_col)
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", "")).cast("double")
    cjk_ratio = cjk / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    toks = tokens(text_col)
    scores = []
    for lang, markers in LANG_MARKERS.items():
        if not markers:
            continue
        arr = F.array(*[F.lit(m) for m in markers])
        overlap = F.size(
            F.filter(toks, lambda t: F.array_contains(arr, F.lower(t)))
        )
        scores.append(F.struct(overlap.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    pred = F.when(cjk_ratio > 0.2, F.lit("zh")).otherwise(
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("en"))
    )
    return df.withColumn("predicted_lang", pred)


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rolling polynomial hash over tokens (order-sensitive document
    fingerprint): h = Σ fold(h*31 + len(tok)*17 + first_char_code), mod 2^31.
    Pure integer arithmetic so an external oracle can reproduce it exactly."""
    toks = tokens(text_col)
    h = F.aggregate(
        toks,
        F.lit(7).cast("long"),
        lambda acc, t: (
            acc * 31 + F.length(t).cast("long") * 17 + F.ascii(F.substring(t, 1, 1))
        )
        % F.lit(2147483647),
    )
    return df.withColumn("fingerprint", h)
