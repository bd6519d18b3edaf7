"""Scale receipt for the curation operators (operators/quality.py).

The oracle gate proves the operators CORRECT at sf0.01; this script
measures them at two orders of magnitude more documents so the
SCALE_NOTES claim ("single-pass, shuffle-light, would hold at 100 TB")
carries a number instead of an assertion.

Corpus: N synthetic docs built DISTRIBUTED (spark.range → md5-derived
token sequences, ~60 tokens/doc — the fixture shape) so the benchmark
itself has no driver-side materialization. A 5% slice is labeled as the
"benchmark" split for decontamination.

Usage::

    python scripts/curation_scale_bench.py --docs 100000
    python scripts/curation_scale_bench.py --docs 100000 --op tfidf

Emits one JSON line per operator: {"op", "docs", "cold_s", "warm_s",
"rows_out", "docs_per_s_warm"}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from presto_rakam_kafka_spark.operators import dedup, quality, text  # noqa: E402
from presto_rakam_kafka_spark.session import get_spark  # noqa: E402


def build_corpus(spark, docs: int):
    """~60-token docs from a 64-word md5-derived vocabulary, built on
    executors. `source` marks 5% as the benchmark split."""
    words = 64
    # token t of doc d = word[(md5-mix of (d, t)) % words]; expressed as
    # a single codegen'd expression: no Python, no driver loop.
    tok = (
        "transform(sequence(0, 59), "
        "t -> concat('w', conv(substr(md5(concat(cast(id as string), ':', cast(t as string))), 1, 4), 16, 10) "
        f"% {words}))"
    )
    return (
        spark.range(docs)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col("id").alias("doc_id"),
            F.expr(f"concat_ws(' ', {tok})").alias("text"),
            F.expr("if(id % 20 = 0, 'bench', concat('src', cast(id % 7 as string)))").alias(
                "source"
            ),
            F.expr("concat('lang', cast(id % 5 as string))").alias("lang"),
        )
    )


def build_embeddings(spark, n: int, dim: int = 64):
    """n synthetic 64-d vectors built on executors (md5-derived
    pseudo-uniform components) — the SemDeDup receipt input."""
    comp = (
        f"transform(sequence(0, {dim - 1}), "
        "i -> cast(conv(substr(md5(concat(cast(id as string), ':', cast(i as string))), 1, 4), 16, 10) as double)"
        " / 65535.0 - 0.5)"
    )
    return (
        spark.range(n)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col("id").alias("vec_id"), F.expr(comp).alias("embedding"))
    )


_EMB_CACHE: dict[int, object] = {}
_IDX_CACHE: dict[int, str] = {}


def _bench_embeddings(spark, n: int):
    if n not in _EMB_CACHE:
        emb = build_embeddings(spark, n).persist()
        emb.count()
        _EMB_CACHE[n] = emb
    return _EMB_CACHE[n]


def _stage_miner_index(spark, n: int) -> str:
    from presto_rakam_kafka_spark.operators import similarity as sim

    if n not in _IDX_CACHE:
        _IDX_CACHE[n] = sim.stage_ivfpq_index(
            spark, _bench_embeddings(spark, n), f"curation_bench_{n}",
            "embedding", "vec_id", dim=64, store_vectors=True,
        )
    return _IDX_CACHE[n]


def _mine(spark, n: int, index_path):
    from pyspark.sql import functions as F  # noqa: F811

    from presto_rakam_kafka_spark.operators import similarity as sim

    emb = _bench_embeddings(spark, n)
    step = max(n // 64, 1)
    anchors = emb.filter(F.col("vec_id") % step == 1)
    if index_path is None:
        return sim.mine_contrastive_pairs(emb, anchors, "embedding", "vec_id")
    return sim.mine_contrastive_pairs(
        emb, anchors, "embedding", "vec_id",
        spark=spark, index_path=index_path, dim=64,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--op", default=None)
    args = ap.parse_args()

    spark = get_spark(app_name="curation-scale-bench")
    corpus = build_corpus(spark, args.docs)
    corpus = corpus.persist()
    corpus.count()  # materialize once; every op then reads the same input

    ops = {
        "quality_rules": lambda: quality.quality_rules(corpus, "text", "doc_id"),
        "repetition": lambda: quality.repetition_stats(corpus, "text", "doc_id", n=3),
        "chunking": lambda: quality.chunk_documents(corpus, "text", "doc_id", 32, 8),
        "pack_window": lambda: quality.pack_sequences(corpus, "text", "doc_id", 256),
        "pack_greedy": lambda: quality.pack_greedy(corpus, "text", "doc_id", 256, 64),
        "stratified": lambda: quality.stratified_sample(corpus, "lang", "doc_id", 0.2),
        "tfidf": lambda: quality.tfidf_top_terms(corpus, "text", "doc_id", 3),
        "decontaminate": lambda: quality.decontaminate(
            corpus, "text", "doc_id", "source", "bench", n=5
        ),
        "pii_redact": lambda: quality.pii_redact(corpus, "text", "doc_id"),
        # round 5 additions
        "lm_bigram": lambda: text.lm_bigram_scores(corpus, "text", "doc_id"),
        "bm25": lambda: text.bm25_topk(corpus, "text", "doc_id", query_id=1, k=10),
        "epoch_mix": lambda: quality.epoch_mixture(
            corpus,
            "source",
            "doc_id",
            {"src0": 2.25, "src1": 2.25, "src2": 1.0, "src3": 1.0},
            default_weight=0.4,
        ),
        "substring_spans": lambda: dedup.duplicated_span_stats(
            corpus, "text", "doc_id", n=10
        ),
        # round 6 additions
        "substring_trim": lambda: dedup.duplicated_span_trim(
            corpus, "text", "doc_id", n=10, drop_threshold=0.9
        ),
        "bm25_multi": lambda: text.bm25_topk_multi(
            corpus, "text", "doc_id", (1, 2, 3, 4, 5, 6, 7, 8), k=10
        ),
        "logreg_score": lambda: quality.quality_logreg_score(
            corpus, "text", "doc_id"
        ),
        # round 7 additions
        "phrase_multi": lambda: text.phrase_search_multi(
            corpus, "text", "doc_id",
            {i: [f"w{3 * i}", f"w{3 * i + 1}"] for i in range(8)},
        ),
        "profile": lambda: __import__(
            "presto_rakam_kafka_spark.operators.datasets", fromlist=["datasets"]
        ).profile_table(corpus, ["doc_id", "text", "source", "lang"]),
        "dataset_diff": lambda: __import__(
            "presto_rakam_kafka_spark.operators.datasets", fromlist=["datasets"]
        ).diff_datasets(
            corpus.filter(F.col("doc_id") % 7 != 0),
            corpus.filter(F.col("doc_id") % 11 != 3),
            "doc_id", "text",
        ),
        # SemDeDup: within-cluster pair cost is Σ|cluster|²·dim, so the
        # honest receipt pins cluster size (~n/centroids); centroid
        # count is capped by expression-tree size (the argmax refs each
        # of the k 64-dim dots once). Run via --op semdedup --docs 20000.
        "semdedup": lambda: dedup.semdedup(
            build_embeddings(spark, args.docs),
            "embedding",
            "vec_id",
            dim=64,
            threshold=0.98,
            num_centroids=32,
        ),
        # round 10: contrastive-miner hard-leg receipt — brute form is
        # |anchors|x|corpus| cosine + a corpus-sized per-anchor window;
        # the indexed form probes the persisted IVF-PQ index (pruned
        # scan of nprobe/num_centroids of the coded corpus + refine on
        # overfetch rows/anchor). The union's rand branch is pruned by
        # the kind filter (literal-false branch), so each op times its
        # hard leg only. Index build is staged OUTSIDE the timing
        # (build-once/probe-many). Run: --op pairs_hard_indexed.
        "pairs_hard_brute": lambda: _mine(spark, args.docs, None).filter(
            "kind = 'hard'"
        ),
        "pairs_hard_indexed": lambda: _mine(
            spark, args.docs, _stage_miner_index(spark, args.docs)
        ).filter("kind = 'hard'"),
    }
    names = [args.op] if args.op else list(ops)
    for name in names:
        timings = []
        rows = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = ops[name]()
            df.write.format("noop").mode("overwrite").save()
            timings.append(round(time.perf_counter() - t0, 3))
        rows = ops[name]().count()
        print(
            json.dumps(
                {
                    "op": name,
                    "docs": args.docs,
                    "cold_s": timings[0],
                    "warm_s": timings[1],
                    "rows_out": rows,
                    "docs_per_s_warm": round(args.docs / timings[1]),
                }
            )
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
