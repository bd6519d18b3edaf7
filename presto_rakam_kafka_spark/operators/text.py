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

from presto_rakam_kafka_spark.functions.hashing import (
    shingles_duckdb,
    tokens_duckdb,
    tokens_spark,
)

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


# ---------------------------------------------------------------------
# N-gram language-model scoring (perplexity filtering)
# ---------------------------------------------------------------------


def _bigrams_spark(text_col: str) -> str:
    """NON-distinct word bigrams as array<string> — counts matter for
    the LM, unlike the distinct shingle sets used for dedup."""
    w = tokens_spark(text_col)
    return (
        f"if(size({w}) >= 2,"
        f" transform(sequence(1, size({w}) - 1),"
        f" i -> concat_ws(' ', slice({w}, i, 2))),"
        f" array())"
    )


def _bigrams_duckdb(text_col: str) -> str:
    w = tokens_duckdb(text_col)
    return f"list_transform(range(1, len({w})), i -> array_to_string({w}[i:i+1], ' '))"


def lm_bigram_scores(
    df: DataFrame, text_col: str, id_col: str, train_mod: int = 10
) -> DataFrame:
    """Per-document bigram language-model score — the KenLM-style
    perplexity filter of CCNet/Gopher pipelines, built from the corpus
    itself: train add-one-smoothed bigram counts on the deterministic
    ``id % train_mod == 0`` slice, then score every document by the
    mean negative log-probability of its bigrams,
    ``nll = -mean(ln((c(w1 w2)+1)/(c(w1·)+V)))`` with V the training
    vocabulary size and ``c(w1·)`` the bigram-prefix context count.
    High nll ⇒ text unlike the reference corpus (gibberish, boilerplate,
    wrong language) — the downstream filter drops the top quantile.

    Scale shape: the LM tables are vocabulary-sized (≪ corpus) and
    broadcast — scoring is one explode over the corpus, two broadcast
    joins, one re-group on the document id (partial-agg shrinks it to
    one row per doc before the exchange). At 100 TB the LM would be
    fit on a sampled slice exactly as here and the broadcast stays
    vocabulary-bounded. Cross-engine note: ln inputs are
    exactly-representable rationals on both sides, so per-term drift
    is ≤1 ulp of libm; the per-doc mean is rounded to 6 decimals —
    boundary-flip probability ~1e-9 per doc (the graph_pagerank
    epsilon argument).

    Docs with fewer than 2 tokens have no bigrams and are absent from
    the output (explode drops empty arrays; the filter cannot judge
    them and routes them to the length rule instead).
    """
    # Bigrams ride as (w1, w2) STRUCT pairs, never as 'w1 w2' strings:
    # the string form paid a slice+concat allocation per corpus
    # position and hashed the concatenated key in both joins — the
    # pair form is 2.6× faster end-to-end at sf0.1 (2.23 → 0.87 s
    # warm) with bit-identical output (tokens are space-split, so the
    # (w1, w2) pair and the joined string are in bijection).
    pairs = (
        "transform(sequence(1, size(_t) - 1),"
        " i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
    )

    def explode_pairs(d: DataFrame, *keep) -> DataFrame:
        return (
            d.select(*keep, F.expr(tokens_spark(text_col)).alias("_t"))
            .select(
                *keep,
                F.explode(
                    F.expr(f"if(size(_t) >= 2, {pairs}, array())")
                ).alias("p"),
            )
            .select(*keep, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        )

    train = df.filter((F.col(id_col) % F.lit(train_mod)) == 0)
    vocab = train.select(
        F.explode(F.expr(tokens_spark(text_col))).alias("t")
    ).agg(F.countDistinct("t").alias("vocab"))
    # Pin the bigram-count table: rb feeds BOTH its own broadcast and
    # rc's (the prefix-context rollup), and each broadcast build is an
    # independent job — unpinned, the train slice's explode+groupBy
    # chain ran twice (VERDICT r13 #8 / guide §5: cache iff reused and
    # recompute > memory cost; rb is bigram-TYPE-bounded, ≪ corpus, so
    # the cache is vocabulary-sized at any SF while the saved recompute
    # is a full train-slice scan).
    from presto_rakam_kafka_spark.operators.ranks import eager_pin

    rb = eager_pin(
        explode_pairs(train).groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    )
    rc = rb.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    db = explode_pairs(df, F.col(id_col))
    nll = F.expr(
        "-ln(cast(coalesce(cnt, 0) + 1 as double)"
        " / cast(coalesce(ctx, 0) + vocab as double))"
    )
    return (
        db.join(F.broadcast(rb), on=["w1", "w2"], how="left")
        .join(F.broadcast(rc), on="w1", how="left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("nll_bigram"),
        )
    )


def lm_bigram_scores_oracle(
    table: str, text_col: str, id_col: str, train_mod: int = 10
) -> str:
    toks = tokens_duckdb(text_col)
    bgs = _bigrams_duckdb(text_col)
    return f"""
    WITH tr AS (SELECT * FROM {table} WHERE {id_col} % {train_mod} = 0),
    v AS (SELECT count(DISTINCT t) AS vocab
          FROM (SELECT unnest({toks}) AS t FROM tr)),
    rb AS (SELECT bg, count(*) AS cnt
           FROM (SELECT unnest({bgs}) AS bg FROM tr) GROUP BY bg),
    rc AS (SELECT string_split(bg, ' ')[1] AS w1, sum(cnt) AS ctx
           FROM rb GROUP BY w1),
    db AS (SELECT {id_col}, unnest({bgs}) AS bg FROM {table}),
    j AS (SELECT db.{id_col},
                 -ln(CAST(coalesce(rb.cnt, 0) + 1 AS DOUBLE)
                     / CAST(coalesce(rc.ctx, 0) + v.vocab AS DOUBLE)) AS nll
          FROM db
          LEFT JOIN rb ON db.bg = rb.bg
          LEFT JOIN rc ON string_split(db.bg, ' ')[1] = rc.w1
          CROSS JOIN v)
    SELECT {id_col}, count(*) AS n_bigrams, round(avg(nll), 6) AS nll_bigram
    FROM j GROUP BY {id_col}
    """


# ---------------------------------------------------------------------
# BM25 full-text ranking
# ---------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_id: int = 0,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 ranking of the corpus against the token set of one query
    document (Lucene idf variant: ``ln(1 + (N-df+0.5)/(df+0.5))``) —
    the lexical retrieval leg production pairs with the vector leg in
    ``search_hybrid_rrf``; tf·idf (`text_tfidf_topk`) weighs documents,
    BM25 ranks them against a query with saturation (k1) and length
    normalization (b).

    Scale shape: the postings build is one explode + (doc, term)
    partial-count; document-frequency and query-term tables are
    vocabulary-bounded broadcasts; doc length joins tf on the document
    id (co-keyed, both derive from the same scan); corpus-level N and
    avgdl ride a 1-row broadcast. Final top-k is ``orderBy().limit()``
    (TakeOrderedAndProject — per-partition heaps, no global sort); the
    rank window runs over only the k survivors."""
    toks = df.select(
        F.col(id_col), F.explode(F.expr(tokens_spark(text_col))).alias("t")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count("*").alias("tf"))
    dl = df.select(
        F.col(id_col), F.expr(f"size({tokens_spark(text_col)})").alias("dl")
    )
    qterms = (
        df.filter(F.col(id_col) == query_id)
        .select(F.explode(F.expr(tokens_spark(text_col))).alias("t"))
        .distinct()
    )
    return bm25_from_parts(tf, dl, qterms, id_col, query_id, k=k, k1=k1, b=b)


def bm25_from_parts(
    tf: DataFrame,
    dl: DataFrame,
    qterms: DataFrame,
    id_col: str,
    query_id: int = 0,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    dfreq: DataFrame | None = None,
) -> DataFrame:
    """The scoring FINISH of BM25, factored over its stored parts: a
    postings table ``tf`` (doc, term, tf), a doc-length table ``dl``
    (doc, dl), and the broadcast query-term set. `bm25_topk` builds
    the parts from a corpus scan; the STREAMING index maintains them
    continuously (`stream_bm25` — tf and dl are plain associative
    streaming groupBys: new docs only add rows, so the drained state
    IS the postings table) and document-frequency / corpus scalars
    derive from the parts at query time. Same plan from either origin
    — stream equals batch bit-for-bit."""
    from pyspark.sql import Window

    scalars = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    if dfreq is None:
        # derived in-plan when the caller didn't maintain it separately
        # (the batch path); streaming callers pass their own drained df
        # table — a memory view cannot feed both sides of a self-join
        dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    term_score = F.expr(
        f"ln(1.0 + (cast(n_docs - df as double) + 0.5) / (cast(df as double) + 0.5))"
        f" * (cast(tf as double) * ({k1} + 1.0))"
        f" / (cast(tf as double) + {k1} * (1.0 - {b} + {b} * cast(dl as double) / avgdl))"
    )
    scored = (
        tf.join(F.broadcast(qterms), on="t")
        .filter(F.col(id_col) != query_id)
        .join(F.broadcast(dfreq), on="t")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("bm25"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w))


def bm25_topk_oracle(
    table: str,
    text_col: str,
    id_col: str,
    query_id: int = 0,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    toks = tokens_duckdb(text_col)
    return f"""
    WITH tk AS (SELECT {id_col}, unnest({toks}) AS t FROM {table}),
    tf AS (SELECT {id_col}, t, count(*) AS tf FROM tk GROUP BY {id_col}, t),
    dl AS (SELECT {id_col}, len({toks}) AS dl FROM {table}),
    s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    q AS (SELECT DISTINCT unnest({toks}) AS t FROM {table}
          WHERE {id_col} = {query_id})
    SELECT {id_col}, bm25, rank FROM (
      SELECT tf.{id_col},
             round(sum(
               ln(1.0 + (CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5)
                        / (CAST(dfreq.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {k1} * (1.0 - {b} + {b} * CAST(dl.dl AS DOUBLE) / s.avgdl))
             ), 6) AS bm25,
             row_number() OVER (ORDER BY round(sum(
               ln(1.0 + (CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5)
                        / (CAST(dfreq.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {k1} * (1.0 - {b} + {b} * CAST(dl.dl AS DOUBLE) / s.avgdl))
             ), 6) DESC, tf.{id_col} ASC) AS rank
      FROM tf
      JOIN q ON tf.t = q.t
      JOIN dfreq ON tf.t = dfreq.t
      JOIN dl ON tf.{id_col} = dl.{id_col}
      CROSS JOIN s
      WHERE tf.{id_col} != {query_id}
      GROUP BY tf.{id_col}, s.n_docs, s.avgdl
    ) WHERE rank <= {k}
    """


def bm25_topk_multi(
    df: DataFrame,
    text_col: str,
    id_col: str,
    query_ids: tuple[int, ...],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 against a query TABLE — the production shape of
    :func:`bm25_topk` (which ranks against ONE query document, the
    single-query demo): a retrieval service scores a batch of queries
    per scan. Returns (query_id, doc, bm25, rank) with rank ≤ k per
    query.

    Scale shape: everything the single-query form broadcasts stays
    broadcast — the (query_id, term) table is queries×terms (bounded:
    a query batch is thousands of rows, never corpus-sized), df/N/
    avgdl unchanged. The corpus-side postings are scanned ONCE for the
    whole batch; the term join fans each posting out only to the
    queries containing that term. Per-query top-k is a
    ``Window.partitionBy(query_id)`` rank — partition-local heaps
    after one (query_id, doc) aggregation shuffle, the same per-query
    rank discipline as the ANN operators; no global sort anywhere."""
    from pyspark.sql import Window

    qid_list = [int(q) for q in query_ids]
    toks = df.select(
        F.col(id_col), F.explode(F.expr(tokens_spark(text_col))).alias("t")
    )
    tf = toks.groupBy(id_col, "t").agg(F.count("*").alias("tf"))
    dl = df.select(
        F.col(id_col), F.expr(f"size({tokens_spark(text_col)})").alias("dl")
    )
    scalars = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    qterms = (
        df.filter(F.col(id_col).isin(qid_list))
        .select(
            F.col(id_col).alias("query_id"),
            F.explode(F.expr(tokens_spark(text_col))).alias("t"),
        )
        .distinct()
    )
    term_score = F.expr(
        f"ln(1.0 + (cast(n_docs - df as double) + 0.5) / (cast(df as double) + 0.5))"
        f" * (cast(tf as double) * ({k1} + 1.0))"
        f" / (cast(tf as double) + {k1} * (1.0 - {b} + {b} * cast(dl as double) / avgdl))"
    )
    scored = (
        tf.join(F.broadcast(qterms), on="t")
        .filter(F.col(id_col) != F.col("query_id"))
        .join(F.broadcast(dfreq), on="t")
        .join(dl, on=id_col)
        .crossJoin(F.broadcast(scalars))
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("bm25"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def bm25_topk_multi_oracle(
    table: str,
    text_col: str,
    id_col: str,
    query_ids: tuple[int, ...],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    toks = tokens_duckdb(text_col)
    ids = ", ".join(str(int(q)) for q in query_ids)
    return f"""
    WITH tk AS (SELECT {id_col}, unnest({toks}) AS t FROM {table}),
    tf AS (SELECT {id_col}, t, count(*) AS tf FROM tk GROUP BY {id_col}, t),
    dl AS (SELECT {id_col}, len({toks}) AS dl FROM {table}),
    s AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
    q AS (SELECT DISTINCT {id_col} AS query_id, unnest({toks}) AS t
          FROM {table} WHERE {id_col} IN ({ids}))
    SELECT query_id, {id_col}, bm25, rank FROM (
      SELECT q.query_id, tf.{id_col},
             round(sum(
               ln(1.0 + (CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5)
                        / (CAST(dfreq.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {k1} * (1.0 - {b} + {b} * CAST(dl.dl AS DOUBLE) / s.avgdl))
             ), 6) AS bm25,
             row_number() OVER (PARTITION BY q.query_id ORDER BY round(sum(
               ln(1.0 + (CAST(s.n_docs - dfreq.df AS DOUBLE) + 0.5)
                        / (CAST(dfreq.df AS DOUBLE) + 0.5))
               * (CAST(tf.tf AS DOUBLE) * ({k1} + 1.0))
               / (CAST(tf.tf AS DOUBLE)
                  + {k1} * (1.0 - {b} + {b} * CAST(dl.dl AS DOUBLE) / s.avgdl))
             ), 6) DESC, tf.{id_col} ASC) AS rank
      FROM tf JOIN q USING (t)
      JOIN dfreq ON tf.t = dfreq.t
      JOIN dl ON tf.{id_col} = dl.{id_col}
      CROSS JOIN s
      WHERE tf.{id_col} <> q.query_id
      GROUP BY q.query_id, tf.{id_col}, s.n_docs, s.avgdl
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------
# BPE tokenizer training (distributed merge learning)
# ---------------------------------------------------------------------


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_merges: int = 10,
    _vocab_sink: list | None = None,
) -> DataFrame:
    """Learn the first ``num_merges`` BPE merges from the corpus —
    classic (Sennrich et al. 2016) word-internal byte-pair encoding:
    start from characters, repeatedly merge the most frequent adjacent
    symbol pair (ties broken lexicographically so the result is
    deterministic), weighting each word type by its corpus frequency.
    Returns the learned merge table (step, left, right, merged, pair_count).

    Scale shape — the part that matters at 100 TB: the corpus is
    touched ONCE (tokenize → word-count groupBy, the word-frequency
    shuffle); every one of the ``num_merges`` iterations then runs on
    the VOCABULARY table (word types × counts — ≪ corpus, ~10⁵–10⁶
    rows at web scale), alternating a pair-count aggregation (explode
    adjacent pairs, weighted count) with a vocab-wide merge rewrite
    (a codegen'd ``aggregate()`` fold that rewrites each word's symbol
    array left-to-right, non-overlapping). The only driver-side data
    is the argmax pair per step — one row per iteration, the classic
    iterate-on-aggregates shape (same contract as the k-means fit).
    The vocab table is re-persisted per step so iteration i+1 does not
    recompute merges 1..i.

    Correctness is double-pinned: a unit test replays the exact merge
    sequence against a pure-Python reference trainer, AND the driver
    gate hash-compares against :func:`bpe_oracle_sql` — an unrolled
    per-step DuckDB CTE chain where the fold is string ``replace()``
    over unit-encoded symbols (DuckDB's ``list_reduce`` can't carry
    the (out, skip) struct accumulator, but the encoding makes the
    fold a plain string operation)."""
    toks = tokens_spark(text_col)
    words = (
        df.select(F.explode(F.expr(toks)).alias("w"))
        .filter("w != ''")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .select("w", F.expr("transform(split(w, ''), c -> c)").alias("syms"), "cnt")
    )
    words = words.persist()
    words.count()
    merges = []
    final_vocab = None
    try:
        for step in range(num_merges):
            pairs = (
                words.select(
                    "cnt",
                    F.explode(
                        F.expr(
                            # guard: Spark sequence(1, 0) counts DOWN
                            "transform(if(size(syms) >= 2,"
                            " sequence(1, size(syms) - 1), array()),"
                            " i -> struct(syms[i - 1] AS l, syms[i] AS r))"
                        )
                    ).alias("p"),
                )
                .groupBy("p.l", "p.r")
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not pairs:
                break
            l, r, c = pairs[0]["l"], pairs[0]["r"], int(pairs[0]["pair_count"])
            merges.append((step, l, r, l + r, c))
            # Backslashes must be escaped BEFORE quotes or a token like
            # ``\`` (or ``\'``) produces a malformed SQL literal.
            esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")  # noqa: E731
            le, re = esc(l), esc(r)
            # Left-to-right non-overlapping merge of (l, r) in every
            # word: fold with a (out, skip) struct accumulator; skip
            # marks that position i was consumed by a merge at i-1.
            fold = (
                "aggregate(sequence(1, size(syms)),"
                " struct(cast(array() as array<string>) AS out, false AS skip),"
                " (acc, i) -> CASE"
                "   WHEN acc.skip THEN struct(acc.out AS out, false AS skip)"
                f"  WHEN i < size(syms) AND syms[i - 1] = '{le}' AND syms[i] = '{re}'"
                f"    THEN struct(concat(acc.out, array('{le}{re}')) AS out, true AS skip)"
                "   ELSE struct(concat(acc.out, array(syms[i - 1])) AS out, false AS skip)"
                " END, acc -> acc.out)"
            )
            new_words = words.select("w", F.expr(fold).alias("syms"), "cnt").persist()
            new_words.count()
            words.unpersist()
            words = new_words
        if _vocab_sink is not None:
            # hand the (word → symbol list) table to the caller BEFORE
            # the unpersist; the caller must consume it eagerly.
            final_vocab = [(r["w"], list(r["syms"])) for r in words.collect()]
    finally:
        words.unpersist()
    spark = df.sparkSession
    if _vocab_sink is not None:
        _vocab_sink.extend(final_vocab)
    return spark.createDataFrame(
        merges, "step INT, left STRING, right STRING, merged STRING, pair_count BIGINT"
    )


def bpe_oracle_sql(
    table: str,
    text_col: str,
    id_col: str,
    num_merges: int,
    output: str = "merges",
) -> str:
    """DuckDB oracle for :func:`bpe_train_merges` (``output='merges'``)
    and :func:`bpe_token_counts` (``output='counts'``) — the unrolled
    per-step CTE chain (the same pattern as the pagerank oracle's fixed
    power iterations).

    The piece DuckDB SQL "can't express" — the left-to-right
    non-overlapping merge fold with its (out, skip) struct accumulator —
    is exactly string ``replace()`` once each word's symbol list is
    encoded as concatenated ``\\x1f<sym>\\x1e`` units: ``replace`` scans
    left-to-right, substitutes non-overlapping occurrences, and resumes
    AFTER each substitution, which is precisely the greedy fold
    semantics (including the l==r self-overlap case: 'aaa' → ['aa','a']).
    The unit framing makes symbol boundaries unambiguous, so a pair
    needle can never match a symbol's interior (e.g. merging (b, c)
    never fires inside symbol 'ab'). Precondition: the corpus text
    contains neither \\x1f nor \\x1e (verified: the fixture corpus is
    lowercase a–z + space at every SF) and has ≥ ``num_merges``
    distinct adjacent pairs (holds from sf0.001 up)."""
    s1, s2 = "\x1f", "\x1e"
    enc0 = (
        f"array_to_string(list_transform(string_split(w, ''),"
        f" c -> '{s1}' || c || '{s2}'), '')"
    )
    ctes = [
        f"wc AS (SELECT w, count(*)::BIGINT AS cnt FROM (SELECT unnest("
        f"string_split({text_col}, ' ')) AS w FROM {table})"
        f" WHERE w <> '' GROUP BY w)",
        f"v0 AS (SELECT w, cnt, {enc0} AS enc FROM wc)",
    ]
    syms = f"regexp_extract_all(enc, '{s1}([^{s2}]*){s2}', 1)"
    for k in range(num_merges):
        ctes.append(
            f"p{k} AS (SELECT pr[1] AS l, pr[2] AS r,"
            f" sum(cnt)::BIGINT AS pair_count"
            f" FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),"
            f" i -> [syms[i], syms[i+1]])) AS pr"
            f" FROM (SELECT cnt, {syms} AS syms FROM v{k})) GROUP BY l, r)"
        )
        # Same argmax tie-break as the Spark trainer: count desc, then
        # (l, r) lexicographic (binary collation both engines).
        ctes.append(
            f"m{k} AS (SELECT l, r, pair_count FROM p{k}"
            f" ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1)"
        )
        ctes.append(
            f"v{k + 1} AS (SELECT w, cnt, replace(enc,"
            f" '{s1}' || m.l || '{s2}{s1}' || m.r || '{s2}',"
            f" '{s1}' || m.l || m.r || '{s2}') AS enc FROM v{k}, m{k} m)"
        )
    if output == "merges":
        sel = "\nUNION ALL\n".join(
            f'SELECT {k} AS step, l AS "left", r AS "right",'
            f" l || r AS merged, pair_count FROM m{k}"
            for k in range(num_merges)
        )
    else:
        ctes.append(
            f"vf AS (SELECT w, len({syms})::INT AS n_tok FROM v{num_merges})"
        )
        sel = (
            f"SELECT {id_col}, count(*)::BIGINT AS ws_tokens,"
            f" sum(n_tok)::BIGINT AS bpe_tokens"
            f" FROM (SELECT {id_col}, unnest(string_split({text_col}, ' '))"
            f" AS w FROM {table}) t JOIN vf USING (w)"
            f" WHERE w <> '' GROUP BY {id_col}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def bpe_token_counts(
    df: DataFrame, text_col: str, id_col: str, num_merges: int = 10
) -> DataFrame:
    """Per-document token counts under a LEARNED BPE vocabulary — the
    apply half of :func:`bpe_train_merges` (the regex `token_counts`
    estimates; this measures, with the corpus's own merges): train the
    merges, take the final (word type → symbol count) vocabulary — a
    vocab-bounded driver-side build, the fit-then-broadcast shape —
    and broadcast it back onto the corpus: explode words, join, one
    per-doc sum. Returns (id, ws_tokens, bpe_tokens)."""
    sink: list = []
    bpe_train_merges(df, text_col, id_col, num_merges, _vocab_sink=sink)
    spark = df.sparkSession
    vocab = spark.createDataFrame(
        [(w, len(syms)) for w, syms in sink], "w STRING, n_tok INT"
    )
    words = df.select(
        F.col(id_col), F.explode(F.expr(tokens_spark(text_col))).alias("w")
    ).filter("w != ''")
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("ws_tokens"),
            F.sum("n_tok").cast("long").alias("bpe_tokens"),
        )
    )


# ---------------------------------------------------------------------
# Phrase search (positional postings)
# ---------------------------------------------------------------------


def phrase_search(
    df: DataFrame, text_col: str, id_col: str, phrase: list[str]
) -> DataFrame:
    """Exact-phrase retrieval (round 7): docs containing the words of
    ``phrase`` CONSECUTIVELY, with match count and first position —
    the query class BM25's bag-of-words scoring cannot answer ("table
    hash" as a phrase, not two terms).

    Distributed shape — the positional-postings join Lucene runs,
    restructured Spark-first: the corpus explodes ONCE into positional
    postings (doc, pos, term) pre-filtered to the phrase's terms (a
    vocabulary-bounded slice, pushed into the scan), the first term's
    postings anchor the candidates, and each later term joins on
    (doc, pos+i) — n−1 equi-joins whose keys are already co-partitioned
    after the first shuffle, over postings lists not documents. Match
    count per doc = surviving anchors. At 100 TB the postings slice is
    a tiny fraction of the corpus (df(term)·n rows), the joins never
    touch full text, and with a PERSISTED postings table (the `bm25`
    build step) the corpus isn't even rescanned per query."""
    n = len(phrase)
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.expr(tokens_spark(text_col))).alias("pos", "t"),
    ).filter(F.col("t").isin(phrase))
    anchor = toks.filter(F.col("t") == phrase[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    for i in range(1, n):
        nxt = toks.filter(F.col("t") == phrase[i]).select(
            id_col, (F.col("pos") - i).alias("p0")
        )
        anchor = anchor.join(nxt, [id_col, "p0"])
    return anchor.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").cast("long").alias("first_pos"),
    )


def phrase_search_oracle(
    table: str, text_col: str, id_col: str, phrase: list[str]
) -> str:
    """DuckDB twin: lambda over the anchor-position range testing each
    phrase word at its offset (0-based first_pos to match posexplode)."""
    toks = tokens_duckdb(text_col)
    n = len(phrase)
    conds = " AND ".join(
        f"toks[i + {i}] = '{w}'" for i, w in enumerate(phrase)
    )
    return f"""
    WITH tk AS (SELECT {id_col}, {toks} AS toks FROM {table}),
    hits AS (
      SELECT {id_col},
             list_filter(range(1, len(toks) - {n} + 2), i -> {conds}) AS ps
      FROM tk)
    SELECT {id_col}, len(ps) AS n_matches,
           CAST(list_min(ps) - 1 AS BIGINT) AS first_pos
    FROM hits WHERE len(ps) > 0
    """


def phrase_search_multi(
    df: DataFrame, text_col: str, id_col: str, phrases: dict[int, list[str]]
) -> DataFrame:
    """Batch phrase retrieval: ONE positional-postings scan serves a
    whole phrase TABLE (the `search_bm25_multi` amortization argument,
    for phrases) — and a strictly better plan shape than the n−1 join
    chain of :func:`phrase_search`: every (phrase term, offset) pair
    broadcasts against the postings ONCE, each match votes for its
    implied anchor position (p0 = pos − offset), and an anchor where
    ALL n offsets voted is a phrase hit — one join + one aggregate,
    independent of phrase length.

    Returns (query_id, doc, n_matches, first_pos)."""
    terms = {w for p in phrases.values() for w in p}
    toks = df.select(
        F.col(id_col),
        F.posexplode(F.expr(tokens_spark(text_col))).alias("pos", "t"),
    ).filter(F.col("t").isin(list(terms)))
    spark = df.sparkSession
    qrows = [
        (int(qid), i, w, len(p))
        for qid, p in phrases.items()
        for i, w in enumerate(p)
    ]
    q = F.broadcast(
        spark.createDataFrame(
            qrows, "query_id INT, i INT, t STRING, n INT"
        )
    )
    anchors = (
        toks.join(q, on="t")
        .select("query_id", id_col, (F.col("pos") - F.col("i")).alias("p0"), "i", "n")
        .groupBy("query_id", id_col, "p0", "n")
        .agg(F.count_distinct("i").alias("_k"))
        .filter(F.col("_k") == F.col("n"))
    )
    return anchors.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.min("p0").cast("long").alias("first_pos"),
    )


def phrase_search_multi_oracle(
    table: str, text_col: str, id_col: str, phrases: dict[int, list[str]]
) -> str:
    selects = []
    for qid, p in phrases.items():
        one = phrase_search_oracle(table, text_col, id_col, p)
        selects.append(
            f"SELECT {qid} AS query_id, {id_col}, n_matches, first_pos FROM ({one})"
        )
    return " UNION ALL ".join(selects)


def token_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc unigram entropy in nats (−Σ p·ln p over the doc's token
    distribution) — the classic gibberish/boilerplate signal: low
    entropy = repetitive filler, high = diverse vocabulary. Gopher-style
    rule sets threshold on it next to the repetition ratios.

    Distributed shape: explode → (doc, token) counts → per-doc fold;
    both groupBys share the doc key after the first shuffle. Never the
    O(len²) per-row expression form (count each token by scanning the
    token array per distinct token) — entropy of a 10k-token doc would
    be 100M comparisons per row."""
    toks = df.select(
        F.col(id_col),
        F.expr(f"size({tokens_spark(text_col)})").alias("_len"),
        F.explode(F.expr(tokens_spark(text_col))).alias("t"),
    )
    counts = toks.groupBy(id_col, "_len", "t").agg(F.count("*").alias("c"))
    ent = (
        "-sum((cast(c as double) / _len) * ln(cast(c as double) / _len))"
    )
    return counts.groupBy(id_col).agg(
        F.expr(f"round({ent}, 4)").alias("entropy_nats"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
    )


def token_entropy_oracle(table: str, text_col: str, id_col: str) -> str:
    toks = tokens_duckdb(text_col)
    return f"""
    WITH tk AS (
      SELECT {id_col}, len({toks}) AS _len, unnest({toks}) AS t
      FROM {table}),
    counts AS (
      SELECT {id_col}, _len, t, count(*) AS c
      FROM tk GROUP BY {id_col}, _len, t)
    SELECT {id_col},
           round(-sum((CAST(c AS DOUBLE) / _len)
                      * ln(CAST(c AS DOUBLE) / _len)), 4) AS entropy_nats,
           count(*) AS n_distinct_tokens
    FROM counts GROUP BY {id_col}
    """
