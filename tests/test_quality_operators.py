"""Invariant tests for the curation operators (operators/quality.py),
beyond the oracle hash-match the parametrized gate already gives them:
each test pins a *semantic* property a hash compare can't articulate."""

from __future__ import annotations

from pyspark.sql import functions as F

from presto_rakam_kafka_spark.fixtures import read_table
from presto_rakam_kafka_spark.operators import quality
from presto_rakam_kafka_spark.fixtures import staging_mkdtemp


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_chunks_reconstruct_document(spark, sf_dir):
    """Dropping each chunk's leading `overlap` tokens (except chunk 0)
    and concatenating in chunk order must reproduce the original text —
    i.e. the windows tile the doc exactly, no token lost or doubled."""
    chunk, overlap = 32, 8
    docs = _docs(spark, sf_dir)
    chunks = quality.chunk_documents(docs, "text", "doc_id", chunk=chunk, overlap=overlap)
    # collect_list has no order guarantee: rebuild via array_sort on the struct
    rebuilt = (
        chunks.withColumn(
            "piece",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.expr(f"concat_ws(' ', slice(split(chunk_text, ' '), {overlap + 1}, {chunk}))")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.expr(
                "concat_ws(' ', transform(array_sort(collect_list(struct(chunk_id, piece))), s -> s.piece))"
            ).alias("rebuilt")
        )
    )
    joined = docs.select("doc_id", "text").join(rebuilt, "doc_id")
    bad = joined.filter(F.col("text") != F.col("rebuilt")).count()
    assert bad == 0


def test_pack_sequences_conserves_tokens_and_bounds_packs(spark, sf_dir):
    budget = 256
    docs = _docs(spark, sf_dir)
    packs = quality.pack_sequences(docs, "text", "doc_id", budget=budget).collect()
    total_tokens = docs.select(
        F.sum(F.expr("size(split(text, ' '))")).alias("t")
    ).collect()[0]["t"]
    assert sum(r["pack_tokens"] for r in packs) == total_tokens
    assert sum(r["n_docs"] for r in packs) == docs.count()
    # pack ids are dense 0..n-1 (concat-then-chunk can't skip a pack)
    ids = sorted(r["pack_id"] for r in packs)
    assert ids == list(range(len(ids)))
    # a pack holds docs *starting* within one budget window, so its token
    # sum is < budget + the longest doc that starts inside it
    max_doc = docs.select(F.max(F.expr("size(split(text, ' '))"))).collect()[0][0]
    assert all(r["pack_tokens"] < budget + max_doc for r in packs)


def test_stratified_sample_exact_per_stratum(spark, sf_dir):
    import math

    frac = 0.2
    docs = _docs(spark, sf_dir)
    kept = quality.stratified_sample(docs, "lang", "doc_id", frac=frac)
    got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    want = {
        r["lang"]: math.ceil(r["n"] * frac)
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_decontaminate_partitions_training_set(spark, sf_dir):
    """kept ∪ contaminated == all training docs, and every removed doc
    really shares a distinct 5-gram with some benchmark doc."""
    from presto_rakam_kafka_spark.functions.hashing import shingles_spark

    docs = _docs(spark, sf_dir)
    kept = quality.decontaminate(docs, "text", "doc_id", "source", "src0", n=5)
    train_ids = {r[0] for r in docs.filter("source <> 'src0'").select("doc_id").collect()}
    kept_ids = {r[0] for r in kept.collect()}
    removed = train_ids - kept_ids
    assert kept_ids <= train_ids
    sh = shingles_spark("text", 5)
    bench = {
        s
        for r in docs.filter("source = 'src0'").select(F.explode(F.expr(sh))).collect()
        for s in [r[0]]
    }
    if removed:
        rem_docs = docs.filter(F.col("doc_id").isin([int(x) for x in removed]))
        for r in rem_docs.select(F.expr(sh).alias("s")).collect():
            assert bench & set(r["s"])


def test_quantize_error_bounded_by_half_step(spark, sf_dir):
    """Symmetric int8: |v - deq(v)| ≤ scale/2, modulo the 6-decimal
    rounding both output columns carry (slack = half an output ulp)."""
    emb = read_table(spark, sf_dir, "embeddings")
    out = quality.quantize_int8(emb, "embedding", "vec_id", dim=64).collect()
    assert out
    for r in out:
        assert r["max_abs_err"] <= r["scale"] / 2 + 5e-7
        assert r["cos_reconstruction"] > 0.999


def test_quality_rules_keep_is_conjunction(spark, sf_dir):
    rules = quality.quality_rules(_docs(spark, sf_dir), "text", "doc_id")
    bad = rules.filter(
        F.col("keep")
        != (
            F.col("rule_min_words")
            & F.col("rule_word_len")
            & F.col("rule_stopwords")
            & F.col("rule_repetition")
        )
    ).count()
    assert bad == 0
    # the calibrated rules must discriminate on this corpus
    n = rules.count()
    n_keep = rules.filter("keep").count()
    assert 0 < n_keep < n


def test_pii_redact_counts_and_scrubs(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob@example.com or 555-123-4567 ok"),
            (2, "no pii here"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in quality.pii_redact(df, "text", "doc_id").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_phones"] == 0
    # scrubbed text contains no residual match
    red = spark.createDataFrame([(1, "mail me at <EMAIL> or <PHONE> ok")], ["doc_id", "text"])
    assert (
        quality.pii_redact(red, "text", "doc_id").collect()[0]["redacted_md5"]
        == out[1]["redacted_md5"]
    )


def test_tfidf_rare_term_outscores_common(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common rare"),
            (2, "common common filler filler"),
            (3, "common filler other other"),
        ],
        ["doc_id", "text"],
    )
    top = quality.tfidf_top_terms(df, "text", "doc_id", k=1).collect()
    by_doc = {r["doc_id"]: r["term"] for r in top}
    # 'common' appears in every doc → idf 0 → can never win
    assert by_doc[1] == "rare"
    assert "common" not in by_doc.values()


def test_pack_greedy_budget_bound_and_partition_invariance(spark, sf_dir):
    """Exact greedy packing: every pack ≤ budget (no oversized docs in
    the fixture), tokens conserved, and the result is identical however
    the input was partitioned (the fold orders within each bucket)."""
    budget = 256
    docs = _docs(spark, sf_dir)
    packs = quality.pack_greedy(docs, "text", "doc_id", budget=budget, num_buckets=8)
    rows = packs.collect()
    assert rows and all(r["pack_tokens"] <= budget for r in rows)
    total = docs.select(F.sum(F.expr("size(split(text,' '))"))).collect()[0][0]
    assert sum(r["pack_tokens"] for r in rows) == total
    again = quality.pack_greedy(
        docs.repartition(13), "text", "doc_id", budget=budget, num_buckets=8
    ).collect()
    key = lambda r: (r["bucket"], r["pack_id"])
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # pack ids dense per bucket
    from collections import defaultdict
    by_bucket = defaultdict(list)
    for r in rows:
        by_bucket[r["bucket"]].append(r["pack_id"])
    for ids in by_bucket.values():
        assert sorted(ids) == list(range(len(ids)))


def test_salted_join_equals_plain_join_and_salts_the_shuffle(spark, sf_dir):
    """salted_join returns exactly the plain join's aggregate, and its
    physical plan is a salted SortMergeJoin (salt in the join keys, no
    broadcast of the replicated dim)."""
    from presto_rakam_kafka_spark.operators.skew import salted_join

    ev = read_table(spark, sf_dir, "events")
    cust = read_table(spark, sf_dir, "customer")
    salted = salted_join(
        ev, cust, "user_id", "c_custkey", "event_id", salt_buckets=8, join_hint="merge"
    )
    plain = ev.join(cust, ev["user_id"] == cust["c_custkey"])
    agg = lambda df: sorted(
        (r["c_mktsegment"], r["n"], round(r["s"], 2))
        for r in df.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    assert agg(salted) == agg(plain)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "__salt" in plan
    assert "BroadcastHashJoin" not in plan


def test_partition_pruned_scan_has_partition_filters(spark, sf_dir):
    from presto_rakam_kafka_spark.operators import layout

    ev = read_table(spark, sf_dir, "events")
    path = layout.stage_partitioned(spark, ev, sf_dir, "event_type")
    pruned = layout.read_pruned(spark, path, "event_type", "purchase")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # pruning is real: only the matching directory's rows are scanned
    assert pruned.count() == ev.filter("event_type = 'purchase'").count()


def test_bucketed_join_has_no_shuffle_exchange(spark, sf_dir):
    from presto_rakam_kafka_spark.operators import layout

    ev = read_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    lt = layout.stage_bucketed(spark, ev, sf_dir, "events_bkt_t", "user_id", 8)
    rt = layout.stage_bucketed(spark, cust, sf_dir, "customer_bkt_t", "c_custkey", 8)
    joined = layout.bucketed_join(spark, lt, rt, "user_id", "c_custkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # and identical rows to the plain join
    plain = ev.join(cust, ev["user_id"] == cust["c_custkey"]).count()
    assert joined.count() == plain


def test_cms_estimate_upper_bounds_exact_for_all_keys(spark, sf_dir):
    """CMS one-sided guarantee: est >= exact for EVERY key (not just
    top-k), and the error respects the eps*N bound comfortably."""
    from presto_rakam_kafka_spark.operators.sketches import CMS_W, cms_heavy_hitters

    ev = read_table(spark, sf_dir, "events")
    n = ev.count()
    allk = cms_heavy_hitters(ev, "user_id", k=10**9)
    rows = allk.collect()
    assert rows
    assert all(r["est"] >= r["exact"] for r in rows)
    import math
    eps_n = math.e * n / CMS_W
    # Markov gives P(err > eps*N) <= 1/e per row; with d=4 rows the min
    # exceeds it with prob <= e^-4 — assert no row does at this scale.
    assert all(r["est"] - r["exact"] <= eps_n for r in rows)


def test_weighted_sample_deterministic_and_biased(spark, sf_dir):
    """A-ES with hash uniforms: identical winners across partitionings,
    and the weight actually biases — mean weight of winners exceeds the
    corpus mean."""
    docs = _docs(spark, sf_dir)
    w = "1.0 + n_chars / 1000.0"
    a = quality.weighted_sample(docs, w, "doc_id", k=100).collect()
    b = quality.weighted_sample(docs.repartition(11), w, "doc_id", k=100).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    mean_w = docs.select(F.avg(F.expr(w))).collect()[0][0]
    mean_sel = sum(r["weight"] for r in a) / len(a)
    assert mean_sel > mean_w


def test_temperature_mixture_flattens_shares(spark, sf_dir):
    """alpha=0.5 gives small sources a larger share than proportional
    sampling would, large sources a smaller one; never exceeds a
    source's size; total ≈ budget (rounding)."""
    docs = _docs(spark, sf_dir)
    total = 200
    out = quality.temperature_mixture(docs, "lang", "doc_id", total=total, alpha=0.5)
    rows = out.collect()
    n_corpus = docs.count()
    by_lang = {
        r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    from collections import Counter
    picked = Counter(r["lang"] for r in rows)
    assert abs(sum(picked.values()) - total) <= len(by_lang)  # rounding slack
    biggest = max(by_lang, key=by_lang.get)
    smallest = min(by_lang, key=by_lang.get)
    prop = lambda lang: total * by_lang[lang] / n_corpus
    assert picked[biggest] < prop(biggest)
    assert picked[smallest] > prop(smallest)
    assert all(picked[lang] <= by_lang[lang] for lang in picked)


def test_pack_greedy_matches_python_reference_property(spark):
    """Property (hypothesis): for random token-count multisets, the
    distributed grouped-map fold produces exactly the per-bucket packs
    of a sequential Python reference greedy over the same md5 order."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=60),
        st.integers(min_value=16, max_value=200),
    )
    def run(tokens, budget):
        rows = [(i, "w " * (t - 1) + "w") for i, t in enumerate(tokens)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            (r["bucket"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
            for r in quality.pack_greedy(df, "text", "doc_id", budget=budget, num_buckets=3).collect()
        }
        # reference fold
        want = {}
        for bucket in range(3):
            docs = [
                (hashlib.md5(str(i).encode()).hexdigest(), i, t)
                for i, t in enumerate(tokens)
                if i % 3 == bucket
            ]
            fill, pack = 0, 0
            first = True
            for _, i, t in sorted(docs):
                if not first and fill + t > budget:
                    pack += 1
                    fill = t
                else:
                    fill += t
                first = False
                n, s = want.get((bucket, pack), (0, 0))
                want[(bucket, pack)] = (n + 1, s + t)
        assert got == want

    run()


def test_pq_codes_distribute_and_rank_deterministic(spark, sf_dir):
    """PQ regression guard for the scale-0 failure: corpus codes must
    actually spread over the codebook (not collapse to one codeword),
    and results are identical across input partitionings."""
    from presto_rakam_kafka_spark.operators.similarity import pq_topk
    from pyspark.sql import functions as F2

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < 5)
    a = pq_topk(emb, q, "embedding", "vec_id", dim=64, k=5).collect()
    b = pq_topk(emb.repartition(9), q, "embedding", "vec_id", dim=64, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # distinct approx scores among each query's top-5 ⇒ codes differ
    from collections import defaultdict
    scores = defaultdict(set)
    for r in a:
        scores[r["query_id"]].add(r["approx_dot"])
    assert all(len(v) >= 3 for v in scores.values())


def test_tfidf_and_decontaminate_broadcast_small_sides(spark, sf_dir):
    """The 100 TB claims in the docstrings are plan-asserted: tf·idf's
    vocabulary-sized df table joins as a broadcast, and decontamination
    probes/removes via broadcast joins of the benchmark shingle set —
    no full-corpus shuffle join in either plan."""
    docs = _docs(spark, sf_dir)
    tfidf_plan = (
        quality.tfidf_top_terms(docs, "text", "doc_id", k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in tfidf_plan
    decon_plan = (
        quality.decontaminate(docs, "text", "doc_id", "source", "src0", n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in decon_plan
    # the contaminated-ids anti join is also broadcast (ids ≪ corpus)
    assert "LeftAnti, BuildRight" in decon_plan or "BroadcastHashJoin" in decon_plan


def test_incremental_neardup_idempotent_replay(spark, sf_dir):
    """Re-running the whole stream against the SAME store (fresh
    checkpoint ⇒ every epoch replays) must produce the identical
    flagged set: epoch-keyed overwrite writes + epoch<N history reads
    make each batch idempotent and self-exclusive."""
    import tempfile

    from presto_rakam_kafka_spark.streaming import neardup, runner

    staged = runner.stage_chunked_events(
        spark, sf_dir, table="documents", num_chunks=3, order_col="doc_id"
    )
    schema = _docs(spark, sf_dir).schema
    store = staging_mkdtemp("neardup_store_t_")
    out = staging_mkdtemp("neardup_out_t_")

    def run():
        stream = runner.read_file_stream(spark, staged, schema)
        return {
            r["doc_id"]
            for r in neardup.incremental_neardup(
                spark, stream, "text", "doc_id", n=3, threshold=0.8,
                store_dir=store, out_dir=out,
            ).collect()
        }

    first = run()
    second = run()  # full replay against the already-populated store
    assert first == second
    assert first  # fixture has near-dup families; the set is non-empty


def test_pagerank_star_center_wins_and_mass_conserved(spark):
    """On a symmetric star (hub ↔ 4 spokes) the hub out-ranks every
    spoke, spokes tie, and total rank mass stays 1 (no dangling loss on
    a symmetrized graph)."""
    from presto_rakam_kafka_spark.operators.clusters import pagerank

    e0 = [("h", s) for s in ["a", "b", "c", "d"]]
    edges = spark.createDataFrame(
        e0 + [(d, s) for s, d in e0], ["src", "dst"]
    )
    ranks = {r["node"]: r["r"] for r in pagerank(edges, "src", "dst", iterations=5).collect()}
    assert ranks["h"] > max(ranks[s] for s in "abcd")
    spoke_vals = [round(ranks[s], 12) for s in "abcd"]
    assert len(set(spoke_vals)) == 1
    assert abs(sum(ranks.values()) - 1.0) < 1e-9


def test_fitted_pq_books_beat_seeded_recall(spark, sf_dir):
    """fit_pq_books (the production path): recall of exact top-5 within
    the top-25 PQ candidates must be at least the seeded codebook's —
    the SCALE_NOTES receipt as a regression test."""
    from pyspark.sql import functions as F2

    from presto_rakam_kafka_spark.operators.similarity import (
        cosine_topk,
        fit_pq_books,
        pq_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, "embedding", "vec_id", k=5).collect()
    }

    def recall(books):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in pq_topk(
                emb, q, "embedding", "vec_id", dim=64, k=25, books=books
            ).collect()
        }
        return len(exact & got) / len(exact)

    fitted = fit_pq_books(emb, "embedding", dim=64)
    r_seeded = recall(None)
    r_fitted = recall(fitted)
    assert r_fitted >= r_seeded
    assert r_fitted >= 0.3


def test_hll_merge_is_exact_register_max(spark):
    """Mergeability is the point of the sketch: the register table of
    A ∪ B must equal the register-wise max of A's and B's tables —
    exactly, not approximately."""
    from pyspark.sql import functions as F2

    from presto_rakam_kafka_spark.operators.sketches import _hll_exprs_spark

    m = 512
    reg, rho = _hll_exprs_spark("cast(id as string)", m)

    def regs(df):
        tbl = df.selectExpr(f"{reg} as reg", f"{rho} as rho").groupBy("reg").agg(
            F2.max("rho").alias("mx")
        )
        return {r["reg"]: r["mx"] for r in tbl.collect()}

    a = spark.range(0, 6000)
    b = spark.range(4000, 11000)  # overlapping
    ra, rb, ru = regs(a), regs(b), regs(a.union(b))
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == ru


def test_hll_estimate_accuracy_at_accuracy_geometry(spark):
    """At p=9 (m=512, σ ≈ 4.6%) the estimate of a 20k-distinct corpus
    (each key duplicated 3×: cardinality, not frequency) must land
    within 3σ of truth."""
    from presto_rakam_kafka_spark.operators import sketches

    n = 20_000
    df = (
        spark.range(n * 3)
        .selectExpr("id % 20000 as user_id", "timestamp'2024-01-03 12:00:00' as ts")
    )
    out = sketches.hll_weekly_users(df, p=9).collect()
    assert len(out) == 1
    est, exact = out[0]["est"], out[0]["n_exact"]
    assert exact == n
    assert abs(est - n) / n < 3 * 1.04 / (512 ** 0.5)


def test_hll_audience_overlap_tracks_truth_on_partial_overlap(spark):
    """Synthetic partial overlap at accuracy geometry (p=9): 8k 'view'
    users, 8k 'purchase' users, 4k shared — the inclusion–exclusion
    estimate must land within ~3σ·(|A|+|B|+|A∪B|) of the true 4k."""
    from presto_rakam_kafka_spark.operators import sketches

    a = spark.range(0, 8000).selectExpr(
        "id as user_id", "'view' as event_type", "timestamp'2024-01-01' as ts"
    )
    b = spark.range(4000, 12000).selectExpr(
        "id as user_id", "'purchase' as event_type", "timestamp'2024-01-01' as ts"
    )
    r = sketches.hll_audience_overlap(a.union(b), p=9).first()
    assert (r["exact_a"], r["exact_b"], r["exact_both"]) == (8000, 8000, 4000)
    sigma = 1.04 / (512 ** 0.5)
    # overlap error compounds three estimates; allow 3σ on their sum
    assert abs(r["est_overlap"] - 4000) < 3 * sigma * (8000 + 8000 + 12000)


def test_ivfpq_fitted_beats_seeded_and_prunes(spark, sf_dir):
    """IVF-PQ composition receipt: with FITTED quantizers (centroids +
    codebooks — the production path) recall of the exact top-5 within
    the top-25 candidates must beat the seeded composition, and the
    probed candidate volume must be a strict subset of the corpus
    (the pruning that makes PQ scoring affordable at 100 TB).
    Measured at sf0.01: seeded 0.20, fitted 0.54 — fitted IVF-PQ also
    beats seeded PQ over the WHOLE corpus (0.40): pruning with a
    fitted coarse quantizer costs no recall here."""
    from pyspark.sql import functions as F2

    from presto_rakam_kafka_spark.operators.similarity import (
        NUM_CENTROIDS,
        cosine_topk,
        fit_centroids,
        fit_pq_books,
        ivfpq_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F2.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, q, "embedding", "vec_id", k=5).collect()
    }

    def recall(**kw):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivfpq_topk(
                emb, q, "embedding", "vec_id", dim=64, k=25, **kw
            ).collect()
        }
        return len(exact & got) / len(exact)

    cents = fit_centroids(emb, "embedding", NUM_CENTROIDS)
    books = fit_pq_books(emb, "embedding", dim=64)
    r_seeded = recall()
    r_fitted = recall(centroids=cents, books=books)
    assert r_fitted >= r_seeded
    assert r_fitted >= 0.3


def test_epoch_mixture_reps_bounds_and_determinism(spark, sf_dir):
    """Every doc appears floor(w) or ceil(w) times (the fractional
    epoch is a per-doc coin, never more); the materialization is
    deterministic across partitionings; and the realized fraction of
    extra-epoch docs tracks frac(w)."""
    from presto_rakam_kafka_spark.fixtures import read_table
    from presto_rakam_kafka_spark.operators import quality

    docs = read_table(spark, sf_dir, "documents")
    weights = {"src0": 2.25, "src1": 1.0}
    out = quality.epoch_mixture(docs, "source", "doc_id", weights, 0.4)
    per_doc = {
        (r["source"], r["doc_id"]): r["reps"]
        for r in out.groupBy("source", "doc_id").agg(
            F.count("*").alias("reps")
        ).collect()
    }
    import math

    for (src, _), reps in per_doc.items():
        w = weights.get(src, 0.4)
        assert reps in (math.floor(w), math.ceil(w)), (src, reps, w)
    # determinism across partitionings
    out2 = quality.epoch_mixture(
        docs.repartition(13), "source", "doc_id", weights, 0.4
    )
    assert sorted(out.collect()) == sorted(out2.collect())
    # src1 (w=1.0): exactly one epoch for every doc
    assert all(r == 1 for (s, _), r in per_doc.items() if s == "src1")


def test_lm_bigram_scores_positive_and_train_slice_scores_lower(spark, sf_dir):
    """Smoothed probabilities are < 1 so every nll is positive, and the
    docs the LM was trained on score (on average) better than the rest
    — the signal the perplexity filter exists to produce."""
    from presto_rakam_kafka_spark.fixtures import read_table
    from presto_rakam_kafka_spark.operators import text

    docs = read_table(spark, sf_dir, "documents")
    scores = text.lm_bigram_scores(docs, "text", "doc_id")
    rows = scores.collect()
    assert rows and all(r["nll_bigram"] > 0 for r in rows)
    train = [r["nll_bigram"] for r in rows if r["doc_id"] % 10 == 0]
    rest = [r["nll_bigram"] for r in rows if r["doc_id"] % 10 != 0]
    assert sum(train) / len(train) <= sum(rest) / len(rest)


def test_bm25_rewards_rare_matching_terms(spark):
    """A doc matching the query's RARE term outranks a doc matching
    only the term every doc shares (idf discipline), and scores are
    positive for any doc sharing a term."""
    from presto_rakam_kafka_spark.operators import text

    rows = [
        (0, "rare common filler0"),          # query doc
        (1, "rare common other padding a"),  # matches rare + common
        (2, "common other padding b"),       # matches common only
        (3, "other padding c"),              # no match
    ] + [(i, f"common junk{i}") for i in range(4, 10)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: (r["bm25"], r["rank"]) for r in
           text.bm25_topk(df, "text", "doc_id", query_id=0, k=10).collect()}
    assert 3 not in got
    assert got[1][0] > got[2][0]
    assert all(s > 0 for s, _ in got.values())


def test_global_rank_and_cumsum_equal_window_forms(spark, sf_dir):
    """The distributed order-statistics primitives are bit-identical
    to the single-partition window forms they replace, including
    duplicate order keys (ties get a consistent total order) and
    skewed value distributions."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from presto_rakam_kafka_spark.operators.ranks import (
        with_global_cumsum,
        with_global_rank,
    )

    df = (
        spark.range(10_000)
        .select(
            F.col("id"),
            (F.col("id") % 97).alias("v"),      # heavy ties
            (F.col("id") % 7 + 1).alias("n"),
        )
        .repartition(16)
    )
    got_rank = {
        r["id"]: r["grank"]
        for r in with_global_rank(df, ["v", "id"]).collect()
    }
    w = Window.orderBy("v", "id")
    want_rank = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got_rank == want_rank

    got_cum = {
        r["id"]: r["gcum"]
        for r in with_global_cumsum(df, ["v", "id"], "n").collect()
    }
    wc = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want_cum = {
        r["id"]: r["c"]
        for r in df.withColumn("c", F.sum("n").over(wc)).collect()
    }
    assert got_cum == want_cum


def test_global_rank_persist_and_count_col(spark, sf_dir):
    """r7: persist=True (fill-read-unpersist, 3 input evaluations → 2)
    must be result-identical to persist=False; count_col attaches the
    EXACT total as a frozen literal; a Column leading order key without
    bucket_expr raises instead of interpolating str(Column) into SQL."""
    import pytest
    from pyspark.sql import functions as F

    from presto_rakam_kafka_spark.operators.ranks import (
        with_global_cumsum,
        with_global_rank,
    )

    df = (
        spark.range(5_000)
        .select(
            F.col("id"),
            (F.col("id") % 53).alias("v"),
            (F.col("id") % 5 + 1).alias("n"),
        )
        .repartition(16)
    )
    base = {
        r["id"]: r["grank"]
        for r in with_global_rank(df, ["v", "id"]).collect()
    }
    got = with_global_rank(
        df, ["v", "id"], persist=True, count_col="total"
    ).collect()
    assert {r["id"]: r["grank"] for r in got} == base
    assert all(r["total"] == 5_000 for r in got)
    # nothing lingers in the cache after the primitive returns
    assert not df._jdf.storageLevel().useMemory()

    cum_base = {
        r["id"]: r["gcum"]
        for r in with_global_cumsum(df, ["v", "id"], "n").collect()
    }
    cum_got = {
        r["id"]: r["gcum"]
        for r in with_global_cumsum(df, ["v", "id"], "n", persist=True).collect()
    }
    assert cum_got == cum_base

    with pytest.raises(TypeError, match="bucket_expr"):
        with_global_rank(df, [F.col("v"), "id"])


def test_quantile_sketch_error_bound_property(spark):
    """Property (hypothesis): the binned-histogram quantile estimate is
    the UPPER edge of the bin holding the exact q-quantile, so for any
    value multiset and any q, 0 < estimate − exact ≤ bin_width — the
    sketch's documented error contract (operators/sketches.py)."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from presto_rakam_kafka_spark.operators import sketches as sk

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        vals=st.lists(
            st.floats(0.0, 400.0, allow_nan=False, width=32),
            min_size=1,
            max_size=60,
        ),
        width=st.sampled_from([1.0, 5.0, 25.0]),
    )
    def check(vals, width):
        df = spark.createDataFrame(
            [("g", float(v)) for v in vals], "event_type STRING, value DOUBLE"
        )
        hist = sk.value_histogram(df, bin_width=width)
        row = sk.quantiles_from_histogram(
            hist, qs=(0.5, 0.9, 0.99), bin_width=width
        ).collect()[0]
        sv = sorted(vals)
        n = len(sv)
        for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
            exact = sv[max(0, math.ceil(q * n) - 1)]
            est = row[col]
            assert 0 < est - exact <= width, (q, est, exact, width, sv)

    check()


def test_log_quantile_sketch_relative_error_and_bounded_state(spark):
    """Log-scale sketch contract (round 9): over values spanning ≥6
    decades, every quantile estimate is the UPPER log-spaced edge of
    the exact quantile's bin — so estimate ≥ exact and the RELATIVE
    error is ≤ 1/sub_bins (plus the 10^-p quantization slack) at ANY
    range — and the sketch's state (occupied bins) is O(decades·144),
    independent of the range the linear sketch's O(range/width) state
    blows up on."""
    import math
    import random

    from presto_rakam_kafka_spark.operators import sketches as sk

    rng = random.Random(20260815)
    # 7 decades: 1e-1 .. 1e6, heavy tail like latency/cents domains
    vals = [10 ** rng.uniform(-1, 6) for _ in range(4000)]
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "event_type STRING, value DOUBLE"
    )
    hist = sk.value_histogram_log(df)
    qs = (0.5, 0.9, 0.99)
    row = sk.quantiles_from_histogram_log(hist, qs=qs).collect()[0]
    sv = sorted(vals)
    n = len(sv)
    S = sk.LOG_QUANTILE_SUB_BINS
    quant = 10 ** -sk.LOG_QUANTILE_SCALE_DIGITS
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        exact = sv[max(0, math.ceil(q * n) - 1)]
        est = row[col]
        # upper edge of the exact value's bin: never below the exact
        # value (modulo the 10^-p quantization), relative error ≤ 1/S
        assert est >= exact - quant, (q, est, exact)
        assert (est - exact) / exact <= 1.0 / S + 1e-3, (q, est, exact)

    # state bound: occupied bins ≤ decades · 9S (+ underflow), while a
    # width-1 linear sketch on the same data would need ~max(v) bins
    n_bins = hist.select("bin").distinct().count()
    decades_spanned = 6 - (-1) + 1
    assert n_bins <= decades_spanned * 9 * S + 1, n_bins
    assert max(vals) > 100_000  # the linear sketch would need >100k bins

    # widening the range 1000× does NOT widen per-decade state: the
    # same generator shifted up 3 decades occupies ~the same bin count
    df2 = spark.createDataFrame(
        [("g", float(v * 1000)) for v in vals],
        "event_type STRING, value DOUBLE",
    )
    n_bins2 = sk.value_histogram_log(df2).select("bin").distinct().count()
    assert abs(n_bins2 - n_bins) <= 9 * S, (n_bins, n_bins2)

    # zero / negative / null inputs: underflow bin + null dropped
    df3 = spark.createDataFrame(
        [("g", 0.0), ("g", -5.0), ("g", None), ("g", 2.0)],
        "event_type STRING, value DOUBLE",
    )
    h3 = {r["bin"]: r["n"] for r in sk.value_histogram_log(df3).collect()}
    assert h3[-1] == 2 and sum(h3.values()) == 3


def test_log_quantile_sketch_whole_domain_no_overflow(spark):
    """ADVICE r9: the old `(t·S) div 10^e` mantissa slot wrapped BIGINT
    at t > 2^63/S (v > ~5.8e11 at defaults) — INSIDE the documented
    domain — where Spark's non-ANSI multiply silently flipped bins
    while DuckDB raised. The capped-mantissa form must (a) agree with
    DuckDB bin-for-bin across the WHOLE documented domain including the
    formerly-wrapping decades, and (b) stay bit-identical to the old
    form for e ≤ 9 (the fixture domain — existing hash gates)."""
    import duckdb

    from presto_rakam_kafka_spark.operators import sketches as sk

    # values straddling the old wrap point up to the documented bound
    vals = [
        1.5, 999.25, 5.79e11, 5.8e11, 5.81e11, 6.4e11, 9.9e11,
        1.0e12, 3.7e12, 9.19e12, 9.2e12,
    ]
    df = spark.createDataFrame(
        [("g", float(v)) for v in vals], "event_type STRING, value DOUBLE"
    )
    df.createOrReplaceTempView("logdom_events")
    spark_bins = {
        (r["event_type"], r["bin"]): r["n"]
        for r in sk.value_histogram_log(df).collect()
    }
    con = duckdb.connect()
    import pandas as pd

    con.register(
        "logdom_events",
        pd.DataFrame({"event_type": ["g"] * len(vals),
                      "value": [float(v) for v in vals]}),
    )
    # the oracle's `b` CTE is the binning half — reuse it verbatim via
    # the full oracle, which also exercises the double-first edge math
    sql = sk.value_quantiles_log_oracle("logdom_events")
    oracle = con.execute(sql).fetchall()
    spark_row = sk.quantiles_from_histogram_log(
        sk.value_histogram_log(df)
    ).collect()[0]
    assert len(oracle) == 1
    g, n_rows, p50, p90, p99 = oracle[0]
    assert n_rows == len(vals) == spark_row["n_rows"]
    assert spark_row["p50"] == p50 and spark_row["p90"] == p90
    assert spark_row["p99"] == p99
    # bin-level parity: DuckDB's binning CTE vs Spark's sketch
    duck_bins = {
        (r[0], r[1]): r[2]
        for r in con.execute(f"""
            WITH base AS (
              SELECT event_type,
                     CAST(floor(value * 1000000.0) AS BIGINT) AS t
              FROM logdom_events WHERE value IS NOT NULL
            ), ex AS (
              SELECT event_type, t,
                     length(CAST(t AS VARCHAR)) - 1 AS e,
                     CAST('1' || repeat('0', length(CAST(t AS VARCHAR)) - 1)
                          AS BIGINT) AS p10e,
                     CAST('1' || repeat('0',
                          greatest(length(CAST(t AS VARCHAR)) - 1 - 9, 0))
                          AS BIGINT) AS p10eh
              FROM base
            )
            SELECT event_type,
                   CASE WHEN t <= 0 THEN CAST(-1 AS BIGINT)
                        ELSE e * 160 + ((t // p10eh) * 16) // (p10e // p10eh)
                   END AS bin, count(*) FROM ex GROUP BY 1, 2
        """).fetchall()
    }
    assert spark_bins == duck_bins
    # estimates stay within the 1/S relative-error contract out here too
    sv = sorted(vals)
    import math as _m

    for q, est in ((0.5, p50), (0.9, p90), (0.99, p99)):
        exact = sv[max(0, _m.ceil(q * len(sv)) - 1)]
        assert est >= exact - 1e-6
        assert (est - exact) / exact <= 1.0 / sk.LOG_QUANTILE_SUB_BINS + 1e-3

    # (b) e ≤ 9 bins unchanged vs the uncapped formula
    small = [v for v in vals if v < 1e4]
    for v in small:
        t = int(_m.floor(v * 1e6))
        e = len(str(t)) - 1
        old = e * 160 + (t * 16) // (10 ** e)
        assert ("g", old) in spark_bins or v >= 1e4
