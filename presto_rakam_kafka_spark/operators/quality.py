"""Training-data curation operators: quality rules, repetition stats,
chunking, sequence packing, stratified sampling, TF-IDF, benchmark
decontamination, PII redaction.

These extend the reference's surface (the reference is a scan connector;
its host engine never shipped corpus-curation operators) with the
operations a pretraining-data pipeline runs right after ingest — the
north-star extension of SURVEY §7 step 6, sibling to
:mod:`.text` / :mod:`.dedup`.

Scale stance (100 TB):

* every per-doc operator here is a single-pass projection (no shuffle);
* the only shuffles are on uniform keys — term (TF-IDF doc-frequency),
  pack window key (an md5 of the id, so range partitions are balanced),
  shingle (decontamination), strata;
* the one broadcast is the TF-IDF document-frequency table, which is
  vocabulary-sized (≪ corpus) by construction, and the decontamination
  benchmark shingle set, which is benchmark-sized (a few thousand docs
  in practice) — both explicitly `broadcast()`-hinted;
* no UDFs in any per-row path — expressions stay inside whole-stage
  codegen, with ONE deliberate exception: :func:`pack_greedy`'s exact
  first-fit fold is an Arrow grouped-map (``applyInPandas``) because the
  algorithm is inherently sequential per bucket (its docstring carries
  the scale argument).

Each operator has a DuckDB-oracle twin generated from the same
constants so the driver gate can hash-compare results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.operators.text import STOPWORDS, _sql_list_duckdb, _sql_list_spark
from presto_rakam_kafka_spark.parallelism import (
    ensure_min_parallelism as _ensure_min_parallelism,
)

# ---------------------------------------------------------------------
# Repetition stats (duplicate n-gram fraction — the MassiveText
# "repetitious text" signal)
# ---------------------------------------------------------------------


def _raw_shingles_duckdb(text_col: str, n: int) -> str:
    w = f"string_split({text_col}, ' ')"
    return (
        f"list_transform(range(1, len({w}) - {n - 2}),"
        f" i -> array_to_string({w}[i:i+{n - 1}], ' '))"
    )


def repetition_stats(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Per-doc duplicate n-gram fraction: 1 - distinct/total shingles.
    A doc that repeats itself has a high fraction; boilerplate and
    template spam light up on this signal. Single-pass projection.

    Shape: explode shingle positions and aggregate back per doc instead
    of building the shingle array with a ``transform`` lambda — HOF
    lambdas evaluate interpreted, while ``slice``/``concat_ws`` over an
    exploded position column stay in codegen, and the per-doc agg is a
    map-side-combined shuffle carrying one row per doc. Measured 2.2×
    faster at 100k docs (SCALE_NOTES §curation). ``explode_outer`` over
    an explicitly-empty array keeps <n-token docs alive (Spark's
    ``sequence(1, 0)`` counts DOWN — the shingles_spark guard)."""
    ex = _ensure_min_parallelism(df).select(
        F.col(id_col), F.expr(f"split({text_col}, ' ')").alias("_toks")
    )
    ex = ex.select(
        F.col(id_col),
        "_toks",
        F.explode_outer(
            F.expr(f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())")
        ).alias("i"),
    )
    ex = ex.select(
        F.col(id_col),
        F.expr(f"if(i IS NULL, NULL, concat_ws(' ', slice(_toks, i, {n})))").alias("s"),
    )
    counts = ex.groupBy(id_col).agg(
        F.count("s").cast("long").alias("n_shingles"),
        F.countDistinct("s").cast("long").alias("n_distinct"),
    )
    return counts.select(
        id_col,
        "n_shingles",
        "n_distinct",
        # nullif: a <n-token doc has 0 shingles; ANSI mode would raise
        # on the 0 divisor — emit NULL, matching the oracle's nullif.
        F.expr("round(1.0 - n_distinct * 1.0 / nullif(n_shingles, 0), 4)")
        .cast("double")
        .alias("dup_fraction"),
    )


def repetition_stats_oracle(table: str, text_col: str, id_col: str, n: int = 3) -> str:
    sh = _raw_shingles_duckdb(text_col, n)
    return f"""
    SELECT {id_col},
           len({sh})::BIGINT AS n_shingles,
           len(list_distinct({sh}))::BIGINT AS n_distinct,
           round(1.0 - len(list_distinct({sh})) * 1.0 / nullif(len({sh}), 0), 4) AS dup_fraction
    FROM {table}
    """


# ---------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------

#: Rule thresholds (calibrated so the fixture corpus has both outcomes
#: for every discriminating rule; the word-length band is the realistic
#: production rule and passes clean synthetic text wholesale).
MIN_WORDS = 30
WORD_LEN_LO, WORD_LEN_HI = 3.0, 10.0
MIN_DISTINCT_STOPWORDS = 2
MAX_DUP3_FRACTION = 0.02


def quality_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher/MassiveText-shaped document filter: each rule a boolean
    column, plus the conjunction ``keep``.

    Shape (same rationale + measurement as :func:`repetition_stats`):
    scalar metrics — token count, char length, distinct-stopword count
    via ``array_intersect`` (dedups by definition, no filter lambda) —
    are computed once per doc and carried through an exploded-shingle
    aggregation whose single ``countDistinct`` yields the repetition
    metric; everything stays in codegen. 1.9× faster than the
    HOF-lambda form at 100k docs."""
    sw = _sql_list_spark(STOPWORDS)
    base = _ensure_min_parallelism(df).select(
        F.col(id_col),
        F.length(text_col).alias("_len"),
        F.expr(f"split({text_col}, ' ')").alias("_toks"),
    )
    base = base.select(
        F.col(id_col),
        "_len",
        "_toks",
        F.expr("size(_toks)").alias("_n"),
        F.expr(f"size(array_intersect(_toks, {sw}))").alias("_n_sw"),
    )
    ex = base.select(
        F.col(id_col),
        "_len",
        "_n",
        "_n_sw",
        "_toks",
        F.explode_outer(
            F.expr("if(_n >= 3, sequence(1, _n - 2), array())")
        ).alias("i"),
    ).select(
        F.col(id_col),
        "_len",
        "_n",
        "_n_sw",
        F.expr("if(i IS NULL, NULL, concat_ws(' ', slice(_toks, i, 3)))").alias("s"),
    )
    metrics = ex.groupBy(id_col).agg(
        F.first("_len").alias("_len"),
        F.first("_n").alias("_n"),
        F.first("_n_sw").alias("_n_sw"),
        F.expr("1.0 - count(DISTINCT s) * 1.0 / nullif(count(s), 0)").alias("_dup3"),
    )
    rules = metrics.select(
        F.col(id_col),
        F.expr(f"_n >= {MIN_WORDS}").alias("rule_min_words"),
        F.expr(
            f"((_len - _n + 1) * 1.0 / _n) BETWEEN {WORD_LEN_LO} AND {WORD_LEN_HI}"
        ).alias("rule_word_len"),
        F.expr(f"_n_sw >= {MIN_DISTINCT_STOPWORDS}").alias("rule_stopwords"),
        F.expr(f"_dup3 <= {MAX_DUP3_FRACTION}").alias("rule_repetition"),
    )
    return rules.select(
        id_col,
        "rule_min_words",
        "rule_word_len",
        "rule_stopwords",
        "rule_repetition",
        (
            F.col("rule_min_words")
            & F.col("rule_word_len")
            & F.col("rule_stopwords")
            & F.col("rule_repetition")
        ).alias("keep"),
    )


def quality_rules_oracle(table: str, text_col: str, id_col: str) -> str:
    toks = f"string_split({text_col}, ' ')"
    n = f"len({toks})"
    mean_len = f"((length({text_col}) - {n} + 1) * 1.0 / {n})"
    sw = _sql_list_duckdb(STOPWORDS)
    n_sw = f"len(list_distinct(list_filter({toks}, t -> list_contains({sw}, t))))"
    sh = _raw_shingles_duckdb(text_col, 3)
    dup3 = f"(1.0 - len(list_distinct({sh})) * 1.0 / nullif(len({sh}), 0))"
    return f"""
    SELECT {id_col},
           {n} >= {MIN_WORDS} AS rule_min_words,
           {mean_len} BETWEEN {WORD_LEN_LO} AND {WORD_LEN_HI} AS rule_word_len,
           {n_sw} >= {MIN_DISTINCT_STOPWORDS} AS rule_stopwords,
           {dup3} <= {MAX_DUP3_FRACTION} AS rule_repetition,
           ({n} >= {MIN_WORDS} AND {mean_len} BETWEEN {WORD_LEN_LO} AND {WORD_LEN_HI}
            AND {n_sw} >= {MIN_DISTINCT_STOPWORDS} AND {dup3} <= {MAX_DUP3_FRACTION}) AS keep
    FROM {table}
    """


# ---------------------------------------------------------------------
# Document chunking (overlapping token windows)
# ---------------------------------------------------------------------


def chunk_documents(
    df: DataFrame, text_col: str, id_col: str, chunk: int = 32, overlap: int = 8
) -> DataFrame:
    """Split each document into overlapping token windows of ``chunk``
    tokens with ``overlap`` tokens shared between neighbors (stride =
    chunk - overlap). Chunk count = ceil((n - overlap)/stride), min 1,
    so every token lands in at least one chunk and the final (possibly
    short) tail chunk is kept. Explode fans out rows; no shuffle —
    chunks stay in their document's partition."""
    stride = chunk - overlap
    toks = f"split({text_col}, ' ')"
    # cast: Spark's `* 1.0` arithmetic is DECIMAL and sequence() needs
    # matching integral bounds — go through double, ceil, then bigint.
    n_chunks = (
        f"greatest(1L, cast(ceil((size({toks}) - {overlap}) / cast({stride} as double))"
        f" as bigint))"
    )
    base = df.select(
        F.col(id_col),
        F.expr(toks).alias("_toks"),
        F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_id"),
    )
    piece = f"slice(_toks, chunk_id * {stride} + 1, {chunk})"
    return base.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.expr(f"size({piece})").cast("long").alias("n_chunk_tokens"),
        F.expr(f"concat_ws(' ', {piece})").alias("chunk_text"),
    )


def chunk_documents_oracle(
    table: str, text_col: str, id_col: str, chunk: int = 32, overlap: int = 8
) -> str:
    stride = chunk - overlap
    return f"""
    WITH base AS (
      SELECT {id_col}, string_split({text_col}, ' ') AS toks FROM {table}),
    ex AS (
      SELECT {id_col}, toks,
             unnest(range(0, greatest(1, CAST(ceil((len(toks) - {overlap}) * 1.0 / {stride}) AS BIGINT)))) AS chunk_id
      FROM base)
    SELECT {id_col}, chunk_id,
           len(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}])::BIGINT AS n_chunk_tokens,
           array_to_string(toks[chunk_id * {stride} + 1 : chunk_id * {stride} + {chunk}], ' ') AS chunk_text
    FROM ex
    """


# ---------------------------------------------------------------------
# Sequence packing (token-budget binning)
# ---------------------------------------------------------------------


def pack_sequences(df: DataFrame, text_col: str, id_col: str, budget: int = 256) -> DataFrame:
    """Concat-then-chunk packing: lay documents head-to-tail in a
    deterministic pseudorandom order (md5 of the id — balanced range
    partitions, no hot key) and cut every ``budget`` tokens; a document
    belongs to the pack where it STARTS (GPT-style packing where docs
    may straddle pack boundaries). pack_id = floor(start_offset/budget)
    over the running token sum.

    r6: the running sum is the DISTRIBUTED cumulative-sum primitive
    (`operators/ranks.py:with_global_cumsum` — range shuffle +
    machine-local sorts + broadcast sum offsets), so globally dense
    pack ids no longer cost a single-task window; output is
    bit-identical to the old global-window form (integer addition is
    associative), the oracle is unchanged, and the plan is asserted
    free of single-partition sorts. :func:`pack_sequences_partitioned`
    remains the form that also keeps pack CONTENT prefix-local (e.g.
    by (source, date)) when downstream wants locality, not just
    scalability."""
    from presto_rakam_kafka_spark.operators.ranks import with_global_cumsum

    t = df.select(
        F.col(id_col),
        F.md5(F.col(id_col).cast("string")).alias("_ord"),
        F.expr(f"size(split({text_col}, ' '))").alias("n_tokens"),
    )
    # bucket proxy: the md5 hex order key as a number (15 hex digits,
    # monotone under the double rounding — ties just share a bucket)
    c = with_global_cumsum(
        t,
        ["_ord", id_col],
        "n_tokens",
        cum_col="cum",
        bucket_expr="cast(conv(substr(_ord, 1, 15), 16, 10) as double)",
        # persist: t re-tokenizes every document (split + size); cache
        # the 3-column projection for the primitive's fit/sum jobs
        # instead of splitting the corpus text three times.
        persist=True,
    )
    return (
        c.select(
            F.floor((F.col("cum") - F.col("n_tokens")) / budget).alias("pack_id"),
            "n_tokens",
        )
        .groupBy("pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


def pack_sequences_partitioned(
    df: DataFrame,
    text_col: str,
    id_col: str,
    budget: int = 256,
    prefix_col: Column | None = None,
) -> DataFrame:
    """Partition-parallel sequence packing — the production form of
    :func:`pack_sequences` (whose globally-dense pack ids cost a global
    single-task window sort, the one scale-killer VERDICT r4 flagged).

    The window is keyed by ``pack_prefix``: by default the first hex
    character of ``md5(id)`` (16 uniform buckets — the same digest that
    orders docs within a prefix, so both expressions share one md5 and
    the buckets are balanced by construction; production data would key
    by its natural (source, date) partition instead, via
    ``prefix_col``). Each prefix sorts independently —
    ``hashpartitioning(pack_prefix)`` exchange, machine-local sorts —
    and pack ids are dense WITHIN a prefix; (pack_prefix, pack_id) is
    the globally unique pack key. Same GPT-style concat-then-chunk
    semantics per prefix: a doc belongs to the pack where it starts.

    At 100 TB: 16 hex buckets are enough for fixture replay; widen the
    prefix to 2-3 hex chars (256/4096 sorts) or a (source, date) column
    so each per-prefix sort fits an executor. Nothing else changes —
    pack ids stay dense within whatever prefix is chosen."""
    digest = F.md5(F.col(id_col).cast("string"))
    pfx = prefix_col if prefix_col is not None else F.substring(digest, 1, 1)
    w = (
        Window.partitionBy("pack_prefix")
        .orderBy("okey", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    t = df.select(
        F.col(id_col),
        pfx.alias("pack_prefix"),
        digest.alias("okey"),
        F.expr(f"size(split({text_col}, ' '))").alias("n_tokens"),
    )
    c = t.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.select(
            "pack_prefix",
            F.floor((F.col("cum") - F.col("n_tokens")) / budget).alias("pack_id"),
            "n_tokens",
        )
        .groupBy("pack_prefix", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("pack_tokens"),
        )
    )


def pack_sequences_partitioned_oracle(
    table: str, text_col: str, id_col: str, budget: int = 256
) -> str:
    return f"""
    WITH t AS (
      SELECT {id_col}, len(string_split({text_col}, ' ')) AS n_tokens,
             md5(CAST({id_col} AS VARCHAR)) AS okey,
             substring(md5(CAST({id_col} AS VARCHAR)), 1, 1) AS pack_prefix
      FROM {table}),
    c AS (
      SELECT pack_prefix, {id_col}, n_tokens,
             sum(n_tokens) OVER (PARTITION BY pack_prefix ORDER BY okey, {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT pack_prefix,
           CAST(floor((cum - n_tokens) / {budget}) AS BIGINT) AS pack_id,
           count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
    FROM c GROUP BY 1, 2
    """


def pack_sequences_oracle(table: str, text_col: str, id_col: str, budget: int = 256) -> str:
    return f"""
    WITH t AS (
      SELECT {id_col}, len(string_split({text_col}, ' ')) AS n_tokens,
             md5(CAST({id_col} AS VARCHAR)) AS okey
      FROM {table}),
    c AS (
      SELECT {id_col}, n_tokens,
             sum(n_tokens) OVER (ORDER BY okey, {id_col}
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT CAST(floor((cum - n_tokens) / {budget}) AS BIGINT) AS pack_id,
           count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
    FROM c GROUP BY 1
    """


# ---------------------------------------------------------------------
# Stratified deterministic sampling
# ---------------------------------------------------------------------


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, frac: float = 0.2
) -> DataFrame:
    """Keep ceil(frac × |stratum|) rows per stratum, chosen by md5-hash
    order — deterministic, seedless, and exactly proportional per group
    (``df.sampleBy`` is only proportional in expectation). One shuffle
    on the strata key."""
    order = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cnt = Window.partitionBy(strata_col)
    return (
        df.select(
            F.col(strata_col),
            F.col(id_col),
            F.row_number().over(order).alias("_rn"),
            F.count("*").over(cnt).alias("_cnt"),
        )
        .filter(F.col("_rn") <= F.ceil(F.col("_cnt") * frac))
        .select(strata_col, id_col)
    )


def stratified_sample_oracle(
    table: str, strata_col: str, id_col: str, frac: float = 0.2
) -> str:
    return f"""
    SELECT {strata_col}, {id_col} FROM (
      SELECT {strata_col}, {id_col},
             row_number() OVER (PARTITION BY {strata_col}
                 ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS _rn,
             count(*) OVER (PARTITION BY {strata_col}) AS _cnt
      FROM {table})
    WHERE _rn <= ceil(_cnt * CAST({frac} AS DOUBLE))
    """


# ---------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------


def tfidf_top_terms(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """Top-k terms per document by tf·idf (idf = ln(N/df)), ties broken
    lexicographically. Shuffles: one on term for tf, one on term for
    document frequency; the df table is vocabulary-sized and broadcast
    back, so the scoring join adds no shuffle; the final top-k is a
    per-doc window over the doc-partitioned tf frame."""
    tok = df.select(F.col(id_col), F.explode(F.expr(f"split({text_col}, ' ')")).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tok.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.count()  # scalar, plan-time constant (not a driver loop)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        F.col(id_col),
        "term",
        "tf",
        "df",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "score", "rank")
    )


def tfidf_top_terms_oracle(table: str, text_col: str, id_col: str, k: int = 3) -> str:
    return f"""
    WITH tok AS (
      SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term FROM {table}),
    tf AS (SELECT {id_col}, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df
              FROM (SELECT DISTINCT {id_col}, term FROM tok) GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM {table}),
    scored AS (
      SELECT tf.{id_col}, tf.term, tf.tf, dfreq.df,
             round(tf.tf * ln(n.n_docs * 1.0 / dfreq.df), 6) AS score
      FROM tf, dfreq, n WHERE tf.term = dfreq.term),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY {id_col}
                 ORDER BY score DESC, term ASC) AS rank
      FROM scored)
    SELECT {id_col}, term, tf, df, score, rank FROM ranked WHERE rank <= {k}
    """


# ---------------------------------------------------------------------
# Benchmark decontamination (n-gram overlap)
# ---------------------------------------------------------------------


def decontaminate(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    bench_value: str,
    n: int = 5,
) -> DataFrame:
    """Test-set decontamination: drop every training document sharing
    at least one distinct word n-gram with any benchmark document
    (``split_col = bench_value``); return surviving training ids.

    Scale shape: the benchmark shingle set is benchmark-sized (small by
    definition) → distinct + broadcast; the training side streams
    through an exploded LEFT ANTI join — no O(n²) pairs, no shuffle of
    the corpus (the anti join is broadcast). The reference approach in
    pretraining pipelines (e.g. 13-gram decontamination) is exactly
    this shape with a larger n.

    Shingles come from the explode-positions codegen path (1.9× over
    the transform-lambda form at 100k docs, SCALE_NOTES §curation); the
    per-doc distinct step is skipped outright — join/semi semantics
    dedup for free."""

    def exploded(sub: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col)] if keep_id else []
        ex = sub.select(*cols, F.expr(f"split({text_col}, ' ')").alias("_toks"))
        ex = ex.select(
            *cols,
            "_toks",
            F.explode(
                F.expr(f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())")
            ).alias("i"),
        )
        return ex.select(*cols, F.expr(f"concat_ws(' ', slice(_toks, i, {n}))").alias("s"))

    bench_shingles = exploded(df.filter(F.col(split_col) == bench_value), False).distinct()
    train = df.filter(F.col(split_col) != bench_value)
    contaminated = (
        exploded(train, True).join(F.broadcast(bench_shingles), "s").select(id_col).distinct()
    )
    return train.join(contaminated, id_col, "left_anti").select(id_col)


def decontaminate_oracle(
    table: str, text_col: str, id_col: str, split_col: str, bench_value: str, n: int = 5
) -> str:
    from presto_rakam_kafka_spark.functions.hashing import shingles_duckdb

    sh = shingles_duckdb(text_col, n)
    return f"""
    WITH sh AS (
      SELECT {id_col}, {split_col}, {sh} AS s FROM {table})
    SELECT d.{id_col} FROM sh d
    WHERE d.{split_col} <> '{bench_value}' AND NOT EXISTS (
      SELECT 1 FROM sh b WHERE b.{split_col} = '{bench_value}'
        AND len(list_intersect(d.s, b.s)) > 0)
    """


def decontamination_report(
    df: DataFrame,
    text_col: str,
    id_col: str,
    split_col: str,
    bench_value: str,
    n: int = 5,
) -> DataFrame:
    """The audit twin of :func:`decontaminate`: per BENCHMARK document,
    how many training documents share at least one distinct word
    n-gram with it and how many (train doc, shared shingle) hits exist
    — the report a data-governance review reads before the anti-join
    drops anything (which benchmarks leaked, how badly). Benchmark
    docs with zero overlap appear with zeros.

    Same scale shape as the filter: the benchmark shingle table is
    benchmark-sized → broadcast; the training side streams through
    one exploded broadcast join; the final agg is keyed by benchmark
    doc (≤ benchmark rows out)."""

    def exploded(sub: DataFrame, alias: str) -> DataFrame:
        ex = sub.select(
            F.col(id_col).alias(alias),
            F.expr(f"split({text_col}, ' ')").alias("_toks"),
        )
        ex = ex.select(
            alias,
            "_toks",
            F.explode(
                F.expr(
                    f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())"
                )
            ).alias("i"),
        )
        return ex.select(
            alias, F.expr(f"concat_ws(' ', slice(_toks, i, {n}))").alias("s")
        ).distinct()

    bench = df.filter(F.col(split_col) == bench_value)
    bench_sh = exploded(bench, "bench_id")
    train_sh = exploded(df.filter(F.col(split_col) != bench_value), "train_id")
    hits = train_sh.join(F.broadcast(bench_sh), "s").groupBy("bench_id").agg(
        F.countDistinct("train_id").alias("n_train_docs"),
        F.count(F.lit(1)).alias("n_hits"),
    )
    return (
        bench.select(F.col(id_col).alias("bench_id"))
        .join(hits, "bench_id", "left")
        .select(
            "bench_id",
            F.coalesce("n_train_docs", F.lit(0)).cast("long").alias("n_train_docs"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def decontamination_report_oracle(
    table: str, text_col: str, id_col: str, split_col: str, bench_value: str, n: int = 5
) -> str:
    from presto_rakam_kafka_spark.functions.hashing import shingles_duckdb

    sh = shingles_duckdb(text_col, n)
    return f"""
    WITH sh AS (SELECT {id_col}, {split_col}, {sh} AS s FROM {table}),
    bench AS (SELECT {id_col} AS bench_id, unnest(s) AS s FROM sh
              WHERE {split_col} = '{bench_value}'),
    train AS (SELECT {id_col} AS train_id, unnest(s) AS s FROM sh
              WHERE {split_col} <> '{bench_value}'),
    hits AS (
      SELECT b.bench_id, count(DISTINCT t.train_id) AS n_train_docs,
             count(*) AS n_hits
      FROM train t JOIN bench b ON t.s = b.s GROUP BY b.bench_id)
    SELECT s.{id_col} AS bench_id,
           CAST(coalesce(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
           CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM (SELECT {id_col} FROM {table} WHERE {split_col} = '{bench_value}') s
    LEFT JOIN hits h ON s.{id_col} = h.bench_id
    """


# ---------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------

#: Engine-portable patterns (identical semantics in Java regex and
#: RE2): explicit classes, no \\d shorthands, no lookaround.
EMAIL_PATTERN = "[a-z0-9]+@[a-z0-9.]+[a-z]"
PHONE_PATTERN = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_redact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Regex PII scrub: replace emails/phones with typed placeholders,
    report per-doc hit counts and the md5 of the scrubbed text (the
    stable downstream dedup key). Single-pass, codegen'd."""
    n_em = f"size(regexp_extract_all({text_col}, '{EMAIL_PATTERN}', 0))"
    n_ph = f"size(regexp_extract_all({text_col}, '{PHONE_PATTERN}', 0))"
    red = (
        f"regexp_replace(regexp_replace({text_col}, '{EMAIL_PATTERN}', '<EMAIL>'),"
        f" '{PHONE_PATTERN}', '<PHONE>')"
    )
    return df.select(
        F.col(id_col),
        F.expr(n_em).cast("long").alias("n_emails"),
        F.expr(n_ph).cast("long").alias("n_phones"),
        F.expr(f"md5({red})").alias("redacted_md5"),
    )


def pii_redact_oracle(table: str, text_col: str, id_col: str) -> str:
    n_em = f"len(regexp_extract_all({text_col}, '{EMAIL_PATTERN}'))"
    n_ph = f"len(regexp_extract_all({text_col}, '{PHONE_PATTERN}'))"
    red = (
        f"regexp_replace(regexp_replace({text_col}, '{EMAIL_PATTERN}', '<EMAIL>', 'g'),"
        f" '{PHONE_PATTERN}', '<PHONE>', 'g')"
    )
    return f"""
    SELECT {id_col},
           {n_em}::BIGINT AS n_emails,
           {n_ph}::BIGINT AS n_phones,
           md5({red}) AS redacted_md5
    FROM {table}
    """


#: Deterministic PII-bearing projection for fixtures that carry no PII:
#: both engines synthesize the same augmented text, so the redactor has
#: real hits to count. (Spark/DuckDB expression pair.)
def pii_augmented_text_spark(text_col: str, id_col: str) -> str:
    return (
        f"concat({text_col}, ' contact user', cast({id_col} as string),"
        f" '@mail.example tel ', cast(100 + {id_col} % 900 as string),"
        f" '-555-', lpad(cast({id_col} % 10000 as string), 4, '0'))"
    )


def pii_augmented_text_duckdb(text_col: str, id_col: str) -> str:
    return (
        f"concat({text_col}, ' contact user', CAST({id_col} AS VARCHAR),"
        f" '@mail.example tel ', CAST(100 + {id_col} % 900 AS VARCHAR),"
        f" '-555-', lpad(CAST({id_col} % 10000 AS VARCHAR), 4, '0'))"
    )


# ---------------------------------------------------------------------
# Embedding int8 quantization (storage compression for ANN at scale)
# ---------------------------------------------------------------------


def quantize_int8(df: DataFrame, vec_col: str, id_col: str, dim: int) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v|/127,
    q_i = floor(v_i·127/max + 0.5). Returns the per-vector scale and
    reconstruction-error stats (max abs error, cosine of original vs
    dequantized) — the receipt a 100 TB deployment checks before
    switching its ANN candidate store to 1/4 the bytes.

    floor(x+0.5) instead of round(): Spark rounds half-away-from-zero,
    DuckDB half-even — floor is bit-identical in both. All math in
    doubles, left-to-right folds (same discipline as cosine_expr).

    Staged selects: naively nesting deq→qv→mx re-evaluates the max-abs
    transform once per reference (the round-3 IVF CollapseProject
    blowup); materializing ``_mx`` then ``_deq`` pins each to a single
    evaluation — CollapseProject never inlines a non-cheap alias that
    is referenced more than once."""
    with_mx = _ensure_min_parallelism(df).select(
        F.col(id_col),
        F.col(vec_col).alias("_v"),
        F.expr(f"array_max(transform({vec_col}, x -> abs(cast(x as double))))").alias(
            "_mx"
        ),
    )
    # quantize + dequantize fused in one lambda: deq_i = ⌊v·127/mx + ½⌋·mx/127
    with_deq = with_mx.select(
        F.col(id_col),
        "_v",
        "_mx",
        F.expr(
            "transform(_v, x -> floor(cast(x as double) * 127.0 / _mx + 0.5) * _mx / 127.0)"
        ).alias("_deq"),
    )
    err = "array_max(zip_with(_v, _deq, (x, y) -> abs(cast(x as double) - y)))"
    dot = "aggregate(zip_with(_v, _deq, (x, y) -> cast(x as double) * y), 0D, (a, v) -> a + v)"
    na = "sqrt(aggregate(transform(_v, x -> cast(x as double) * cast(x as double)), 0D, (a, v) -> a + v))"
    nb = "sqrt(aggregate(transform(_deq, y -> y * y), 0D, (a, v) -> a + v))"
    return with_deq.select(
        F.col(id_col),
        F.expr("round(_mx / 127.0, 8)").alias("scale"),
        F.expr(f"round({err}, 6)").alias("max_abs_err"),
        F.expr(f"round(({dot}) / (({na}) * ({nb})), 6)").alias("cos_reconstruction"),
    )


def quantize_int8_oracle(table: str, vec_col: str, id_col: str, dim: int) -> str:
    v = vec_col
    mx = f"list_max(list_transform({v}, x -> abs(x::DOUBLE)))"
    qv = f"list_transform({v}, x -> floor(x::DOUBLE * 127.0 / ({mx}) + 0.5))"
    # index-based zip (DuckDB has no zip_with): fold over 1..dim
    deq_i = f"(({qv})[i] * ({mx}) / 127.0)"
    err = f"list_max(list_transform(range(1, {dim + 1}), i -> abs({v}[i]::DOUBLE - {deq_i})))"
    dot = f"list_reduce(list_transform(range(1, {dim + 1}), i -> {v}[i]::DOUBLE * {deq_i}), (x, y) -> x + y)"
    na = f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), i -> {v}[i]::DOUBLE * {v}[i]::DOUBLE), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), i -> {deq_i} * {deq_i}), (x, y) -> x + y))"
    return f"""
    SELECT {id_col},
           round({mx} / 127.0, 8) AS scale,
           round({err}, 6) AS max_abs_err,
           round(({dot}) / (({na}) * ({nb})), 6) AS cos_reconstruction
    FROM {table}
    """


# ---------------------------------------------------------------------
# Exact greedy sequence packing (grouped-map, per-bucket)
# ---------------------------------------------------------------------


def pack_greedy(
    df: DataFrame, text_col: str, id_col: str, budget: int = 256, num_buckets: int = 8
) -> DataFrame:
    """EXACT greedy first-fit-sequential packing, per hash bucket: docs
    are split into ``num_buckets`` groups (id mod buckets), ordered
    deterministically within each (md5 of the id), and packed greedily —
    a new pack starts when the running fill would exceed ``budget``, so
    every pack holds ≤ budget tokens (an oversized doc gets its own
    pack). Returns (bucket, pack_id, n_docs, pack_tokens).

    This is the production shape of sequence packing at 100 TB: packing
    is a sequential fold, so it runs *within* partitions (bucket =
    partition) with no global order — Spark's one shuffle here is the
    groupBy(bucket), and the fold itself is an Arrow-batched grouped-map
    over each bucket's rows. Complements :func:`pack_sequences` (the
    window-based concat-then-chunk variant, which allows straddling).
    The oracle replays the same fold as a recursive CTE."""
    base = df.select(
        (F.col(id_col) % num_buckets).alias("bucket"),
        F.md5(F.col(id_col).cast("string")).alias("_okey"),
        F.col(id_col).alias("_id"),
        F.expr(f"size(split({text_col}, ' '))").cast("long").alias("n_tokens"),
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["_okey", "_id"]).reset_index(drop=True)
        packs, fill, pack_id = [], 0, 0
        first = True
        for t in pdf["n_tokens"]:
            t = int(t)
            if not first and fill + t > budget:
                pack_id += 1
                fill = t
            else:
                fill += t
            first = False
            packs.append(pack_id)
        out = pd.DataFrame(
            {"bucket": pdf["bucket"], "pack_id": packs, "n_tokens": pdf["n_tokens"]}
        )
        return (
            out.groupby(["bucket", "pack_id"], as_index=False)
            .agg(n_docs=("n_tokens", "size"), pack_tokens=("n_tokens", "sum"))
        )

    return base.groupBy("bucket").applyInPandas(
        fold, schema="bucket bigint, pack_id bigint, n_docs bigint, pack_tokens bigint"
    )


def pack_greedy_oracle(
    table: str, text_col: str, id_col: str, budget: int = 256, num_buckets: int = 8
) -> str:
    return f"""
    WITH RECURSIVE t AS (
      SELECT {id_col} % {num_buckets} AS bucket, {id_col},
             len(string_split({text_col}, ' ')) AS n_tokens,
             md5(CAST({id_col} AS VARCHAR)) AS okey FROM {table}),
    o AS (SELECT bucket, {id_col}, n_tokens,
            row_number() OVER (PARTITION BY bucket ORDER BY okey, {id_col}) AS rn
          FROM t),
    s AS (
      SELECT bucket, rn, n_tokens, 0 AS pack_id, n_tokens AS fill
      FROM o WHERE rn = 1
      UNION ALL
      SELECT o.bucket, o.rn, o.n_tokens,
             CASE WHEN s.fill + o.n_tokens > {budget} THEN s.pack_id + 1 ELSE s.pack_id END,
             CASE WHEN s.fill + o.n_tokens > {budget} THEN o.n_tokens ELSE s.fill + o.n_tokens END
      FROM s JOIN o ON o.bucket = s.bucket AND o.rn = s.rn + 1)
    SELECT bucket, CAST(pack_id AS BIGINT) AS pack_id,
           count(*) AS n_docs, sum(n_tokens)::BIGINT AS pack_tokens
    FROM s GROUP BY 1, 2
    """


# ---------------------------------------------------------------------
# Weighted + temperature sampling (corpus mixture construction)
# ---------------------------------------------------------------------


def weighted_sample(
    df: DataFrame, weight_expr: str, id_col: str, k: int
) -> DataFrame:
    """Weighted sampling without replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with the random uniform replaced by
    a hash-derived one — key_i = u_i^(1/w_i) ⇔ rank by -ln(u)/w — so
    the same k docs are chosen on every run, retry, and partitioning
    (a `rand()`-based weighted sample is none of those). One top-k
    sort; no shuffle before it.

    ``weight_expr``: SQL expression for the per-row weight (> 0), e.g.
    a quality score. Returns (id, weight, wkey) for the k winners.
    """
    h = (
        f"(cast(conv(substr(md5(cast({id_col} as string)), 1, 15), 16, 10) as bigint)"
        f" % 1000000007)"
    )
    u = f"(({h} + 1) / 1000000008.0)"  # uniform in (0, 1]
    wkey = f"(-ln({u}) / ({weight_expr}))"
    return (
        df.select(
            F.col(id_col),
            # cast: Spark literal `1.0` arithmetic is DECIMAL, DuckDB's
            # is DOUBLE — align the hash-compared output type.
            F.expr(f"cast(round({weight_expr}, 6) as double)").alias("weight"),
            F.expr(f"round({wkey}, 8)").alias("wkey"),
        )
        .orderBy(F.asc("wkey"), F.asc(id_col))
        .limit(k)
    )


def weighted_sample_oracle(table: str, weight_expr: str, id_col: str, k: int) -> str:
    h = f"(CAST(('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000007)"
    u = f"(({h} + 1) / 1000000008.0)"
    wkey = f"(-ln({u}) / ({weight_expr}))"
    return f"""
    SELECT {id_col}, round({weight_expr}, 6) AS weight, round({wkey}, 8) AS wkey
    FROM {table}
    ORDER BY wkey ASC, {id_col} ASC LIMIT {k}
    """


def temperature_mixture(
    df: DataFrame, source_col: str, id_col: str, total: int, alpha: float = 0.5
) -> DataFrame:
    """Temperature-based source mixture (the multilingual/multi-source
    pretraining sampler): source s gets a share ∝ n_s^alpha of the
    ``total`` budget — alpha < 1 upweights small sources, alpha = 1 is
    proportional, alpha = 0 uniform-per-source. Within a source, docs
    are chosen in deterministic md5-hash order. Returns
    (source, n_source, target, id) for the selected docs.

    Shape: one count agg (tiny, broadcast back), one window rank per
    source — the same two shuffles as stratified sampling."""
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_source"))
    tot_w = counts.select(
        F.sum(F.expr(f"pow(n_source, {alpha})")).alias("_tw")
    )
    targets = counts.crossJoin(F.broadcast(tot_w)).select(
        source_col,
        "n_source",
        F.expr(
            f"least(n_source, cast(round({total} * pow(n_source, {alpha}) / _tw, 0) as bigint))"
        ).alias("target"),
    )
    order = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    ranked = df.select(F.col(source_col), F.col(id_col)).withColumn(
        "_rn", F.row_number().over(order)
    )
    return (
        ranked.join(F.broadcast(targets), source_col)
        .filter(F.col("_rn") <= F.col("target"))
        .select(source_col, "n_source", "target", id_col)
    )


def temperature_mixture_oracle(
    table: str, source_col: str, id_col: str, total: int, alpha: float = 0.5
) -> str:
    return f"""
    WITH counts AS (
      SELECT {source_col}, count(*) AS n_source FROM {table} GROUP BY {source_col}),
    tw AS (SELECT sum(pow(n_source, {alpha})) AS _tw FROM counts),
    targets AS (
      SELECT {source_col}, n_source,
             least(n_source, CAST(round({total} * pow(n_source, {alpha}) / _tw, 0) AS BIGINT)) AS target
      FROM counts, tw),
    ranked AS (
      SELECT {source_col}, {id_col},
             row_number() OVER (PARTITION BY {source_col}
                 ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS _rn
      FROM {table})
    SELECT r.{source_col}, t.n_source, t.target, r.{id_col}
    FROM ranked r JOIN targets t ON r.{source_col} = t.{source_col}
    WHERE r._rn <= t.target
    """


def epoch_mixture(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> DataFrame:
    """Materialize an epoch-weighted training mixture — the step after
    mixture *design* (:func:`temperature_mixture` picks shares; this
    emits the actual repeated rows the trainer reads): a source with
    weight w contributes ``floor(w)`` full epochs of every document
    plus one extra epoch for a deterministic hash-chosen ``frac(w)`` of
    its documents (e.g. w=2.25 ⇒ every doc twice, a fixed quarter of
    docs a third time). Returns (source, id, epoch) with epoch in
    1..reps.

    Scale shape: one shuffle-free projection — the weight is a
    broadcast-free literal CASE, the fractional-epoch coin is the
    portable 60-bit md5 hash (u = h/2^60, exactly reproducible in the
    oracle), and the replication is an inline ``explode(sequence)``;
    rows fan out in place, partition by partition, which is exactly how
    a 100 TB mixture is written (no sampler state, restart-safe, and
    the SAME doc always gets the same epoch count across reruns).
    Spark's ``sequence(1, 0)`` counts DOWN, so the empty case (w < 1
    and the coin fails) is guarded to an empty array explicitly."""
    from presto_rakam_kafka_spark.functions.hashing import base_hash_spark

    w_case = (
        "cast(CASE "
        + " ".join(
            f"WHEN {source_col} = '{s}' THEN {w}" for s, w in weights.items()
        )
        + f" ELSE {default_weight} END as double)"
    )
    h = base_hash_spark(f"concat(cast({id_col} as string), ':mix')")
    u = f"(cast({h} as double) / 1152921504606846976.0)"
    reps = (
        f"(cast(floor({w_case}) as bigint)"
        f" + if({u} < {w_case} - floor({w_case}), 1L, 0L))"
    )
    return df.select(
        F.col(source_col),
        F.col(id_col),
        F.explode(
            F.expr(
                f"if({reps} >= 1, sequence(1L, {reps}), array())"
            )
        ).alias("epoch"),
    )


def epoch_mixture_oracle(
    table: str,
    source_col: str,
    id_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
) -> str:
    from presto_rakam_kafka_spark.functions.hashing import base_hash_duckdb

    w_case = (
        "CAST(CASE "
        + " ".join(
            f"WHEN {source_col} = '{s}' THEN {w}" for s, w in weights.items()
        )
        + f" ELSE {default_weight} END AS DOUBLE)"
    )
    h = base_hash_duckdb(f"CAST({id_col} AS VARCHAR) || ':mix'")
    u = f"(CAST({h} AS DOUBLE) / 1152921504606846976.0)"
    reps = (
        f"(CAST(floor({w_case}) AS BIGINT)"
        f" + CASE WHEN {u} < {w_case} - floor({w_case}) THEN 1 ELSE 0 END)"
    )
    return f"""
    SELECT {source_col}, {id_col},
           unnest(generate_series(1, {reps})) AS epoch
    FROM {table}
    """


def decontaminate_embedding(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    bench_pred: str,
    threshold: float = 0.35,
) -> DataFrame:
    """Semantic test-set decontamination — the embedding-space
    complement of the n-gram :func:`decontaminate` (paraphrased or
    reformatted benchmark leakage shares no n-gram but keeps a high
    embedding cosine): drop every training vector whose cosine to ANY
    benchmark vector (rows matching ``bench_pred``) is ≥ threshold;
    return surviving training ids.

    Scale shape: the benchmark side is benchmark-sized (small by
    definition) → broadcast; the corpus streams once through a
    broadcast nested-loop score + LEFT ANTI join — no corpus shuffle.
    At 100 TB the broadcast score is pruned by an LSH/IVF bucket join
    first (operators/similarity.py) so each doc scores against its
    bucket's benchmark vectors only; the fixture benchmark is 10
    vectors, where brute-force IS the right plan."""
    # Per-row norms computed once before the broadcast score (per-pair
    # work drops from 3 array folds to 1); same left-fold double
    # expression as cosine_expr, so values are bit-identical.
    def _norm(col: str) -> str:
        return (
            f"sqrt(aggregate(transform({col}, x -> cast(x as double)"
            f" * cast(x as double)), 0D, (acc, v) -> acc + v))"
        )

    bench = df.filter(bench_pred).select(
        F.col(vec_col).alias("_bvec"), F.expr(_norm(vec_col)).alias("_bn")
    )
    train = df.filter(f"NOT ({bench_pred})").withColumn(
        "_tn", F.expr(_norm(vec_col))
    )
    dot = (
        f"aggregate(zip_with({vec_col}, _bvec, (x, y) -> cast(x as double)"
        f" * cast(y as double)), 0D, (acc, v) -> acc + v)"
    )
    cos = F.expr(f"({dot}) / (_tn * _bn)")
    contaminated = (
        train.crossJoin(F.broadcast(bench))
        .filter(F.round(cos, 6) >= threshold)
        .select(id_col)
        .distinct()
    )
    return train.join(contaminated, id_col, "left_anti").select(id_col)


def decontaminate_embedding_oracle(
    table: str,
    vec_col: str,
    id_col: str,
    bench_pred: str,
    dim: int,
    threshold: float = 0.35,
) -> str:
    from presto_rakam_kafka_spark.operators.dedup import cosine_expr_duckdb

    cos = cosine_expr_duckdb(f"tr.{vec_col}", f"b.{vec_col}", dim)
    # Anti-join, not NOT EXISTS — DuckDB cannot correlate an outer
    # column inside the cosine's list lambdas.
    return f"""
    WITH b AS (SELECT {vec_col} FROM {table} WHERE {bench_pred}),
         tr AS (SELECT {id_col}, {vec_col} FROM {table} WHERE NOT ({bench_pred})),
         c AS (SELECT DISTINCT tr.{id_col} FROM tr CROSS JOIN b
               WHERE round({cos}, 6) >= {threshold})
    SELECT tr.{id_col} FROM tr LEFT JOIN c ON tr.{id_col} = c.{id_col}
    WHERE c.{id_col} IS NULL
    """


# ---------------------------------------------------------------------
# Model-based quality scoring (the DCLM / fastText-classifier step)
# ---------------------------------------------------------------------

#: Fixed logistic weights over interpretable per-doc features — the
#: deployable stand-in for a trained fastText/DCLM quality classifier
#: (the *fit* is offline on labeled data; serving broadcasts weights
#: and scores in one projection — this IS the serving half, with
#: deterministic literal weights so the DuckDB oracle replays it).
#: Features: ln(1+tokens), mean token chars, stopword-token fraction,
#: type-token ratio.
LOGREG_WEIGHTS = (-3.0, 0.55, 0.35, 2.0, 1.5)


def quality_logreg_score(
    df: DataFrame, text_col: str, id_col: str, threshold: float = 0.82
) -> DataFrame:
    """Model-based quality filter: logistic score over four
    shuffle-free per-doc features (token count, mean token length,
    stopword fraction, type-token ratio) with fixed broadcast-literal
    weights; ``keep = score ≥ threshold`` (default 0.82 — the fixture
    corpus is homogeneous, so the threshold sits inside its 0.75–0.86
    score band to exercise both branches). The production pattern for
    classifier-based curation (DCLM, fastText quality filters): the
    model is fit offline, serving is one codegen projection over the
    corpus — zero shuffles, embarrassingly parallel at any scale.
    Score rounded to 4 decimals (ln/exp differ from DuckDB's libm in
    the last ulp; 6 is flaky at the fixture's value density)."""
    w0, w1, w2, w3, w4 = LOGREG_WEIGHTS
    sw = _sql_list_spark(STOPWORDS)
    feats = _ensure_min_parallelism(df).select(
        F.col(id_col),
        F.expr(f"split({text_col}, ' ')").alias("_toks"),
        F.length(text_col).alias("_len"),
    ).select(
        F.col(id_col),
        F.expr("ln(1 + size(_toks))").alias("f_logtok"),
        F.expr(
            "cast(_len - (size(_toks) - 1) as double) / size(_toks)"
        ).alias("f_meanlen"),
        F.expr(
            f"cast(size(filter(_toks, t -> array_contains({sw}, t))) as double)"
            " / size(_toks)"
        ).alias("f_stopfrac"),
        F.expr(
            "cast(size(array_distinct(_toks)) as double) / size(_toks)"
        ).alias("f_ttr"),
    )
    z = (
        f"{w0} + {w1} * f_logtok + {w2} * f_meanlen"
        f" + {w3} * f_stopfrac + {w4} * f_ttr"
    )
    return feats.select(
        id_col,
        F.expr(f"round(1.0 / (1.0 + exp(-({z}))), 4)").alias("score"),
        F.expr(f"round(1.0 / (1.0 + exp(-({z}))), 4) >= {threshold}").alias(
            "keep"
        ),
    )


def quality_logreg_score_oracle(
    table: str, text_col: str, id_col: str, threshold: float = 0.82
) -> str:
    w0, w1, w2, w3, w4 = LOGREG_WEIGHTS
    sw = _sql_list_duckdb(STOPWORDS)
    toks = f"string_split({text_col}, ' ')"
    z = (
        f"{w0} + {w1} * ln(1 + len(toks))"
        f" + {w2} * (CAST(length({text_col}) - (len(toks) - 1) AS DOUBLE)"
        f"            / len(toks))"
        f" + {w3} * (CAST(len(list_filter(toks, t -> list_contains({sw}, t)))"
        f"            AS DOUBLE) / len(toks))"
        f" + {w4} * (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks))"
    )
    return f"""
    SELECT {id_col},
           round(1.0 / (1.0 + exp(-({z}))), 4) AS score,
           round(1.0 / (1.0 + exp(-({z}))), 4) >= {threshold} AS keep
    FROM (SELECT {id_col}, {text_col}, {toks} AS toks FROM {table})
    """
