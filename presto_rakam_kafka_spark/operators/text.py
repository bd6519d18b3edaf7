"""Text-analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All single-pass projections over the corpus — no shuffle, no UDF; they
pipeline with whatever scan feeds them and scale linearly with input
splits. Each has a DuckDB-oracle twin generated from the same constants
(see the ``*_oracle`` builders).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.parallelism import (
    ensure_min_parallelism as _ensure_min_parallelism,
)

from presto_rakam_kafka_spark.functions.hashing import shingles_duckdb

#: Tiny per-language marker lists for the heuristic language ID. The
#: heuristic is the deliverable; on the synthetic fixture corpus (whose
#: ``lang`` column is a label, not a property of the text) it detects
#: the text's actual surface language, mostly 'en'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "los", "una", "es", "y", "en"),
    "fr": ("le", "les", "une", "est", "et", "dans"),
    "zh": ("的", "是", "了", "在", "和"),
}

#: Stopwords for the quality score's stopword-ratio feature.
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")

#: Characters that count as "clean" for the punctuation-ratio feature.
_CLEAN_CLASS = "[a-z0-9 ]"


def _sql_list_spark(words: tuple[str, ...]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def _sql_list_duckdb(words: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------
# Token counting + quality scoring
# ---------------------------------------------------------------------


def text_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc: token count, char count, mean token length, punctuation
    ratio, stopword ratio, and a logistic quality score combining them
    (long, clean, stopword-bearing docs score high — the usual
    pretraining heuristic shape)."""
    toks = f"split({text_col}, ' ')"
    sw = _sql_list_spark(STOPWORDS)
    n_tokens = f"size({toks})"
    punct = f"length(regexp_replace({text_col}, '{_CLEAN_CLASS}', ''))"
    return df.select(
        F.col(id_col),
        F.expr(n_tokens).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        # cast: Spark's `int * 1.0` arithmetic is DECIMAL, DuckDB's is
        # DOUBLE — align the output type or the value hash differs.
        F.expr(f"round((length({text_col}) - {n_tokens} + 1) * 1.0 / {n_tokens}, 4)")
        .cast("double")
        .alias("avg_token_len"),
        F.expr(f"round({punct} * 1.0 / length({text_col}), 4)")
        .cast("double")
        .alias("punct_ratio"),
        F.expr(
            f"round(size(filter({toks}, t -> array_contains({sw}, t))) * 1.0 / {n_tokens}, 4)"
        )
        .cast("double")
        .alias("stopword_ratio"),
        F.expr(
            f"round(1.0 / (1.0 + exp(-(0.05 * {n_tokens}"
            f" - 5.0 * ({punct} * 1.0 / length({text_col}))"
            f" + 2.0 * (size(filter({toks}, t -> array_contains({sw}, t))) * 1.0 / {n_tokens})"
            f" - 2.0))), 4)"
        ).alias("quality_score"),
    )


def text_stats_oracle(table: str, text_col: str, id_col: str) -> str:
    toks = f"string_split({text_col}, ' ')"
    sw = _sql_list_duckdb(STOPWORDS)
    n_tokens = f"len({toks})"
    punct = f"length(regexp_replace({text_col}, '{_CLEAN_CLASS}', '', 'g'))"
    sw_ratio = f"len(list_filter({toks}, t -> list_contains({sw}, t))) * 1.0 / {n_tokens}"
    return f"""
    SELECT {id_col},
           {n_tokens}::BIGINT AS n_tokens,
           length({text_col})::BIGINT AS n_chars,
           round((length({text_col}) - {n_tokens} + 1) * 1.0 / {n_tokens}, 4) AS avg_token_len,
           round({punct} * 1.0 / length({text_col}), 4) AS punct_ratio,
           round({sw_ratio}, 4) AS stopword_ratio,
           round(1.0 / (1.0 + exp(-(0.05 * {n_tokens}
                 - 5.0 * ({punct} * 1.0 / length({text_col}))
                 + 2.0 * ({sw_ratio}) - 2.0))), 4) AS quality_score
    FROM {table}
    """


# ---------------------------------------------------------------------
# BPE-ish token counting
# ---------------------------------------------------------------------

#: GPT-2-flavored pretokenizer, simplified to the engine-portable
#: subset (no unicode classes, no lookahead — identical match semantics
#: in Java regex and RE2): a token is an optionally space-prefixed
#: letter run, digit run, or punctuation run. Counting these
#: approximates BPE token counts far better than whitespace splitting
#: (punctuation and numbers tokenize separately).
BPE_ISH_PATTERN = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"


def token_counts(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace and BPE-ish token counts per document — the two
    numbers a pretraining pipeline budgets with. Single-pass
    projection, no shuffle."""
    return df.select(
        F.col(id_col),
        F.expr(f"size(split({text_col}, ' '))").cast("long").alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}', 0))")
        .cast("long")
        .alias("bpe_tokens"),
    )


def token_counts_oracle(table: str, text_col: str, id_col: str) -> str:
    return f"""
    SELECT {id_col},
           len(string_split({text_col}, ' '))::BIGINT AS ws_tokens,
           len(regexp_extract_all({text_col}, '{BPE_ISH_PATTERN}'))::BIGINT AS bpe_tokens
    FROM {table}
    """


# ---------------------------------------------------------------------
# Language ID (n-gram/marker heuristic)
# ---------------------------------------------------------------------


def lang_id(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Argmax of marker-token hits with a fixed priority tie-break
    (en > de > es > fr > zh, then 'und' when no marker hits at all)."""
    toks = f"split({text_col}, ' ')"
    hits = {
        lang: f"size(filter({toks}, t -> array_contains({_sql_list_spark(m)}, t)))"
        for lang, m in LANG_MARKERS.items()
    }
    order = list(LANG_MARKERS)
    best = f"greatest({', '.join(hits.values())})"
    case = "CASE "
    for lang in order:
        case += f"WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return df.select(F.col(id_col), F.expr(case).alias("lang_pred"))


def lang_id_oracle(table: str, text_col: str, id_col: str) -> str:
    toks = f"string_split({text_col}, ' ')"
    hits = {
        lang: f"len(list_filter({toks}, t -> list_contains({_sql_list_duckdb(m)}, t)))"
        for lang, m in LANG_MARKERS.items()
    }
    order = list(LANG_MARKERS)
    best = f"greatest({', '.join(hits.values())})"
    case = "CASE "
    for lang in order:
        case += f"WHEN {hits[lang]} = {best} AND {best} > 0 THEN '{lang}' "
    case += "ELSE 'und' END"
    return f"SELECT {id_col}, {case} AS lang_pred FROM {table}"


# ---------------------------------------------------------------------
# Document fingerprinting
# ---------------------------------------------------------------------


def fingerprints(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Two fingerprints per doc: the full-content md5 (exact-dup key)
    and the minimum shingle-hash (a 1-hash MinHash — equal for docs
    sharing their 'rarest' shingle, the winnowing-style anchor).

    Shape note: the shingle strings are built by exploding positions
    and slicing — plain functions inside whole-stage codegen, not a
    ``transform`` lambda (interpreted; 6× slower at 100k docs,
    SCALE_NOTES §curation). The per-doc distinct step the lambda form
    carried is dropped outright: ``min`` over the shingle multiset
    equals ``min`` over the distinct set. The per-doc min comes back
    via a map-side partial aggregate (shingles stay colocated with
    their doc, so the shuffle carries one row per doc).

    ``explode_outer`` over an explicitly-empty array keeps zero-shingle
    docs (<n tokens or NULL text) alive with a NULL min — matching the
    oracle's ``list_min`` over an empty list."""
    df = _ensure_min_parallelism(df)
    ex = df.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("content_md5"),
        F.expr(f"split({text_col}, ' ')").alias("_toks"),
    )
    ex = ex.select(
        F.col(id_col),
        "content_md5",
        "_toks",
        F.explode_outer(
            F.expr(f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())")
        ).alias("i"),
    )
    exploded = ex.select(
        F.col(id_col),
        "content_md5",
        F.expr(f"if(i IS NULL, NULL, md5(concat_ws(' ', slice(_toks, i, {n}))))").alias("h"),
    )
    return exploded.groupBy(id_col, "content_md5").agg(
        F.min("h").alias("min_shingle_md5")
    )


def fingerprints_oracle(table: str, text_col: str, id_col: str, n: int = 3) -> str:
    sh = shingles_duckdb(text_col, n)
    return f"""
    SELECT {id_col}, md5({text_col}) AS content_md5,
           list_min(list_transform({sh}, s -> md5(s))) AS min_shingle_md5
    FROM {table}
    """
