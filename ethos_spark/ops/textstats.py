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


def repetition_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, "Scaling
    Language Models: ... Gopher", §A1.1 repetition filters — public
    paper): per doc the fraction of the text made of repeated words and
    the weight of the single most frequent word / bigram. Boilerplate and
    spam score high; natural prose low.

    Output: (id, n_words, top_word_frac, dup_word_frac, top_bigram_frac).

    Shape: explode → two-level aggregation, the same histogram plan the
    DuckDB oracle runs via unnest — exact cross-engine parity. Two
    shuffles keyed by (doc, token); at corpus scale the first-level
    combine is map-side (partial counts per token), so the wide explode
    never shuffles raw — only (doc, token, count) triples move."""
    words = F.split(norm_text(F.col(text_col)), " ")
    n = F.size(words)
    # bigrams via indexed transform over words[0..n-2]: element i pairs
    # with element_at(words, i+2) (element_at is 1-based, i is 0-based)
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.slice(words, 1, n - 1),
            lambda x, i: F.concat(
                x, F.lit(" "), F.element_at(words, i + F.lit(2))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col), words.alias("_w"), bigrams.alias("_bg")
    )
    wa = (
        base.select(id_col, F.explode("_w").alias("t"))
        .groupBy(id_col, "t")
        .count()
        .groupBy(id_col)
        .agg(
            F.sum("count").alias("n_words"),
            F.count("*").alias("_n_distinct"),
            F.max("count").alias("_top_c"),
        )
    )
    ba = (
        base.select(id_col, F.explode("_bg").alias("t"))
        .groupBy(id_col, "t")
        .count()
        .groupBy(id_col)
        .agg(F.sum("count").alias("_n_bg"), F.max("count").alias("_top_bg"))
    )
    return wa.join(ba, id_col, "left").select(
        id_col,
        "n_words",
        F.round(F.col("_top_c") / F.col("n_words"), 6).alias("top_word_frac"),
        F.round(
            (F.col("n_words") - F.col("_n_distinct")) / F.col("n_words"), 6
        ).alias("dup_word_frac"),
        F.round(
            F.coalesce(F.col("_top_bg") / F.col("_n_bg"), F.lit(0.0)), 6
        ).alias("top_bigram_frac"),
    )


def boilerplate_line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_words: int = 10,
    max_freq: int = 2,
) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020 dedup unit;
    RefinedWeb line-wise filtering — public papers): split each document
    into fixed-size word blocks (the corpus here is unpunctuated word
    text, so blocks stand in for lines), count each block's GLOBAL
    document frequency, drop blocks appearing in more than ``max_freq``
    documents, and reassemble the surviving text in original order.

    Output: (id, n_blocks, n_kept, clean_text).

    Scale shape: explode → two aggregations keyed by block hash — the
    same map-side-combining histogram plan as repetition_features; the
    block strings themselves shuffle once as (block, count) pairs, never
    the full documents."""
    words = F.split(norm_text(F.col(text_col)), " ")
    n_blocks = F.ceil(F.size(words) / F.lit(block_words)).cast("int")
    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: F.array_join(
            F.slice(words, i * block_words + 1, block_words), " "
        ),
    )
    base = df.select(F.col(id_col), blocks.alias("_blocks"))
    exploded = base.select(
        id_col, F.posexplode("_blocks").alias("pos", "block")
    )
    # document frequency per block (count distinct docs via pre-distinct —
    # a block repeated within one doc counts once)
    freq = (
        exploded.select("block", id_col)
        .distinct()
        .groupBy("block")
        .agg(F.count("*").alias("_df"))
    )
    kept = exploded.join(
        freq.where(F.col("_df") > max_freq).select("block"),
        "block",
        "left_anti",
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("block")))
                ),
                lambda s: s["block"],
            ),
            " ",
        ).alias("clean_text"),
    )
    totals = base.select(
        id_col, F.size("_blocks").cast("long").alias("n_blocks")
    )
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_blocks",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def lm_familiarity(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-LM familiarity score — the CCNet-style LM quality filter
    shape (Wenzek et al. 2020 score documents with a KenLM trained on a
    trusted corpus; public paper) with a log-free statistic so the score
    is EXACTLY reproducible cross-engine: a document's score is the mean
    training-corpus frequency of its word bigrams (0 for unseen), which
    is monotone in the unigram-free LM likelihood. Out-of-domain and
    gibberish text scores near zero; in-domain text high.

    Output: (id, n_bigrams, familiarity).

    Scale shape: the bigram count table is corpus-sized but
    aggregate-keyed (map-side combine); scoring joins doc bigrams to it
    on the bigram key — broadcast when the vocabulary is small, shuffle
    hash join otherwise. A real KenLM swap-in would broadcast the
    binarized model to a pandas UDF; the pipeline shape is identical."""

    def _bigrams(df: DataFrame) -> DataFrame:
        words = F.split(norm_text(F.col(text_col)), " ")
        n = F.size(words)
        bg = F.when(
            n >= 2,
            F.transform(
                F.slice(words, 1, n - 1),
                lambda x, i: F.concat(
                    x, F.lit(" "), F.element_at(words, i + F.lit(2))
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return df.select(F.col(id_col), F.explode(bg).alias("bg"))

    counts = _bigrams(train).groupBy("bg").agg(F.count("*").alias("_c"))
    doc_bg = _bigrams(score)
    return (
        doc_bg.join(counts, "bg", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.sum(F.coalesce(F.col("_c"), F.lit(0)))
                / F.count("*"),
                6,
            ).alias("familiarity"),
        )
    )


# PII patterns chosen from the common-denominator regex subset that Java
# (Spark) and RE2 (DuckDB) evaluate identically — simple greedy classes,
# \b word bounds, no backrefs/lookarounds
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+\d[\d ]{6,14}\d"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-data PII redaction (the standard pre-release scrub):
    emails, IPv4 addresses and international-format phone numbers are
    replaced with typed placeholders; per-document match counts ride
    along for audit. Pure Column expressions — JVM regex, no UDF, and the
    patterns sit in the Java∩RE2 subset so a DuckDB oracle reproduces the
    redaction byte-for-byte.

    Output: (id, n_emails, n_ips, n_phones, clean_text)."""
    c = F.col(text_col)
    out = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PII_IPV4), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(c, F.lit(PII_PHONE), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, PII_EMAIL, "<EMAIL>"),
                PII_IPV4,
                "<IP>",
            ),
            PII_PHONE,
            "<PHONE>",
        ).alias("clean_text"),
    )
    return out


def chunk_documents(
    df: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-sample chunking (sequence packing's first half): each
    document's whitespace tokens are cut into windows of ``window`` words
    advancing by ``stride`` (overlap = window - stride, the standard LM
    data prep shape). The final partial window is kept iff it adds new
    tokens. Pure Column expressions (sequence + transform + slice): the
    one-row-in/many-out explode the extraction stages use, no UDF.

    Output: (id, chunk_idx, n_words, chunk_text)."""
    words = F.split(norm_text(F.col(text_col)), " ")
    n = F.size(words)
    # number of windows: 1 + ceil(max(n - window, 0) / stride)
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(window), F.lit(0)) / F.lit(stride)
        ).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_idx"),
            F.slice(words, i * stride + 1, window).alias("w"),
        ),
    )
    exploded = df.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.w").alias("n_words"),
        F.array_join("c.w", " ").alias("chunk_text"),
    )
    return exploded
