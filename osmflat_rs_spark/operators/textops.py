"""Text-analysis operators for training-data pipelines — language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All pure column expressions (codegen'd), deterministic, and reproducible
in ANSI SQL for the cross-engine oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from osmflat_rs_spark.operators.dedup import words_expr

# tiny deterministic stopword lists (heuristic language ID)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
}


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_words, en_ratio, lang_pred): stopword-ratio heuristic;
    prediction = argmax ratio with fixed tie order en > de > fr > unk."""
    w = words_expr(F.col(text_col))
    n = F.size(w)
    ratios = {
        lang: F.size(F.filter(w, lambda x: x.isin(sw))).cast("double") / n.cast("double")
        for lang, sw in STOPWORDS.items()
    }
    pred = (
        F.when((ratios["en"] >= ratios["de"]) & (ratios["en"] >= ratios["fr"]) & (ratios["en"] > 0), "en")
        .when((ratios["de"] >= ratios["fr"]) & (ratios["de"] > 0), "de")
        .when(ratios["fr"] > 0, "fr")
        .otherwise("unk")
    )
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        ratios["en"].alias("en_ratio"),
        pred.alias("lang_pred"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_words, avg_word_len, distinct_ratio): the classic
    cheap quality features (length, repetition)."""
    w = words_expr(F.col(text_col))
    n = F.size(w)
    total_len = F.aggregate(w, F.lit(0).cast("long"), lambda s, x: s + F.length(x))
    return df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("n_chars"),
        n.alias("n_words"),
        (total_len.cast("double") / n.cast("double")).alias("avg_word_len"),
        (F.size(F.array_distinct(w)).cast("double") / n.cast("double")).alias("distinct_ratio"),
    )


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpeish): whitespace tokens + a BPE-ish regex
    count (alpha runs | digit runs | single non-space symbol)."""
    return df.select(
        F.col(id_col),
        F.size(words_expr(F.col(text_col))).alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")).alias("n_bpeish"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fp): md5 of the whitespace-normalized lowercase text — the
    canonical near-exact dedup key."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return df.select(F.col(id_col), F.md5(norm).alias("fp"))
