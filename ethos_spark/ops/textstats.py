"""Text analysis operators for large-scale training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — no Python in
the hot path. Each has an exactly-equivalent ANSI-SQL form registered in
``__spark_entry__.oracle_sql`` so DuckDB verifies values bit-for-bit.

Operators: token counting (whitespace + punctuation-aware), quality scoring
(length/punct/stopword ratios), language-ID (stopword-hit n-gram heuristic),
document fingerprinting (normalized md5).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# language marker words (surrounded by spaces after normalization)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "sv": ["och", "att", "det", "som", "en"],
    "fr": ["le", "la", "et", "les", "des"],
}

_PUNCT_CLASS = r"[.,;:!?]"


def norm_text(c: Column) -> Column:
    """Whitespace-collapse + trim (reference F4 normalize applied to docs)."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def token_count(c: Column) -> Column:
    n = norm_text(c)
    return F.when(n == "", F.lit(0)).otherwise(F.size(F.split(n, " ")))


def bpe_ish_token_count(c: Column) -> Column:
    """Sub-word-ish counting: split on whitespace AND punctuation/case
    boundaries (a cheap BPE stand-in for budget estimation)."""
    pieces = F.regexp_replace(
        F.regexp_replace(c, r"([.,;:!?()\[\]\"'])", r" $1 "), r"\s+", " "
    )
    t = F.trim(pieces)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def punct_count(c: Column) -> Column:
    return F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))


def stopword_hits(c: Column, lang: str) -> Column:
    """Occurrences of the lang's marker words as whole tokens."""
    padded = F.concat(F.lit(" "), F.lower(norm_text(c)), F.lit(" "))
    total = F.lit(0)
    for w in LANG_MARKERS[lang]:
        occurrences = (
            F.length(padded)
            - F.length(F.regexp_replace(padded, f" {w} ", " "))
        ) / F.lit(len(w) + 1)
        total = total + occurrences.cast("long")
    return total


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars, n_tokens, punct_ratio, stop_ratio, quality_score ∈ [0,1]."""
    c = F.col(text_col)
    toks = token_count(c)
    out = (
        df.withColumn("n_chars_q", F.length(c))
        .withColumn("n_tokens", toks)
        .withColumn(
            "punct_ratio",
            F.round(punct_count(c) / F.greatest(F.length(c), F.lit(1)), 6),
        )
        .withColumn(
            "stop_ratio",
            F.round(
                stopword_hits(c, "en") / F.greatest(toks, F.lit(1)).cast("double"),
                6,
            ),
        )
    )
    # crude composite: long enough, some stopwords, not punctuation soup
    raw = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.5
        + F.least(F.col("stop_ratio") * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - F.least(F.col("punct_ratio") * 10.0, F.lit(1.0))) * 0.2
    )
    # micro-unit floor instead of round(…): floor of identical IEEE doubles
    # is cross-engine exact, round() half-handling is not
    return out.withColumn("quality_score", F.round(raw, 6)).withColumn(
        "quality_u", F.floor(raw * 1e6).cast("long")
    )


def predict_lang(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword heuristic language ID; ties resolve en > sv > fr."""
    c = F.col(text_col)
    en, sv, fr = (stopword_hits(c, l) for l in ("en", "sv", "fr"))
    return (
        df.withColumn("hits_en", en)
        .withColumn("hits_sv", sv)
        .withColumn("hits_fr", fr)
        .withColumn(
            "lang_pred",
            F.when(
                (F.col("hits_en") >= F.col("hits_sv"))
                & (F.col("hits_en") >= F.col("hits_fr")),
                F.lit("en"),
            )
            .when(F.col("hits_sv") >= F.col("hits_fr"), F.lit("sv"))
            .otherwise(F.lit("fr")),
        )
    )


def fingerprint(c: Column) -> Column:
    """Deterministic document fingerprint: md5 over the lowercase
    alphanumeric skeleton (robust to whitespace/punct edits)."""
    return F.md5(F.regexp_replace(F.lower(c), "[^a-z0-9]", ""))
