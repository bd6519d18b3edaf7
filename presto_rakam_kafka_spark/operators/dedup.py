"""Deduplication operators for large-scale corpus curation.

Beyond-reference extension (the reference connector is scan-only; these
are the corpus-curation operators a 100 TB training-data pipeline runs
over the tables it exposes). All implementations are pure DataFrame
expressions — JVM whole-stage codegen, no Python UDFs — and every
probabilistic operator has a brute-force *exact* counterpart so the
DuckDB oracle can check it.

Scale design notes (the part that matters at 1000 executors):

* **Exact dedup** is a hash-groupBy on a content digest — one shuffle
  on ``md5(text)``, map-side partial agg, no skew (digests are uniform).
* **MinHash-LSH** never materializes the O(n²) pair space: docs are
  exploded to (band, band-key) rows — ``n_bands`` rows per doc — and
  only bucket collisions are joined. Candidate verification re-joins the
  shingle sets and filters on *exact* Jaccard, so false positives cost
  joins, not wrong answers, and output quality is exact given candidate
  recall (≥ 1 - (1-t^r)^b per pair; ~2e-4 at t=0.8 with the derived
  b=16, r=4 geometry — see :func:`derived_rows_per_band`). Three
  guards keep the candidate stage linear on hostile corpora: exact
  pre-collapse of identical texts before sketching, a rows-per-band
  derived from the *threshold* (S-curve midpoint just below t, not a
  fixed constant), and a cheap signature-estimate pre-filter that
  discards sub-threshold candidates before the shingle-array verify.
* **SimHash** compresses each doc to one 60-bit signature in a single
  projection (no explode), then finds Hamming-≤k pairs with the
  pigeonhole band join: k+1 disjoint bit-chunks, a pair within
  Hamming k must collide on ≥1 chunk — O(n·(k+1)) join keys, not O(n²).
* **Embedding near-dup** is brute-force here (exact contract, small
  dims); the bucketed scale path is :mod:`.similarity`'s LSH.

Hash portability (Spark ≡ DuckDB) comes from
:mod:`presto_rakam_kafka_spark.functions.hashing`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.parallelism import ensure_min_parallelism

from presto_rakam_kafka_spark.functions.hashing import (
    HASH_P,
    base_hash_duckdb,
    base_hash_spark,
    jaccard_duckdb,
    jaccard_spark,
    minhash_coefficients,
    shingles_duckdb,
    shingles_spark,
)

# Band count default. Rows-per-band is NOT a constant anymore — it is
# derived from the requested threshold (see derived_rows_per_band) so
# the S-curve midpoint (1/b)^(1/r) tracks the threshold instead of
# sitting at 0.40 regardless of what the caller asked for. Output is
# unaffected by the band geometry — candidates are verified with exact
# Jaccard — so the knob trades signature cost (agg width and its
# codegen/JIT size) against candidate-verification cost.
NUM_BANDS = 16
# Legacy constant kept for callers that pin the round-1 geometry.
ROWS_PER_BAND = 3
# Ceiling on the banding miss probability for a pair exactly at the
# threshold; derived_rows_per_band picks the steepest S-curve that
# stays under it.
MAX_PAIR_MISS = 1e-3


def derived_rows_per_band(
    threshold: float, num_bands: int = NUM_BANDS, max_pair_miss: float = MAX_PAIR_MISS
) -> int:
    """Largest rows-per-band whose banding miss probability at the
    threshold, ``(1 - t^r)^b``, stays ≤ ``max_pair_miss``.

    Larger ``r`` pushes the S-curve midpoint ``(1/b)^(1/r)`` up toward
    the threshold, collapsing the sub-threshold candidate flood (the
    round-1 hot-bucket cliff: near-copies at J ≈ 0.46 were *above* the
    fixed r=3 midpoint of 0.40 and all became candidates) — at the cost
    of recall at the threshold, which this function caps. For t=0.8,
    b=16 it returns r=4: midpoint 0.50, miss 2.2e-4; r=5 would miss
    1.7e-3 and is rejected. Miss is monotone increasing in r, so the
    search starts at r=1 and keeps the last candidate under the cap —
    low thresholds (e.g. t=0.5, b=16) land on r=1 (miss 1.5e-5), where
    any larger r would silently blow the documented bound. If even r=1
    misses the cap the bound is unattainable at this band count: warn
    and return 1 (the flattest curve available)."""
    best = None
    for cand in range(1, 9):
        if (1.0 - threshold**cand) ** num_bands <= max_pair_miss:
            best = cand
        else:
            break
    if best is None:
        import warnings

        warnings.warn(
            f"no rows-per-band satisfies miss <= {max_pair_miss} at "
            f"threshold={threshold}, num_bands={num_bands}; using r=1 "
            f"(miss {(1.0 - threshold) ** num_bands:.2e}) — raise num_bands",
            stacklevel=2,
        )
        return 1
    return best


_ensure_min_parallelism = ensure_min_parallelism

SIMHASH_BITS = 60  # the portable md5-prefix hash is 60-bit


# ---------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact content digest.

    ONE exchange total AND map-side partial aggregation:
    ``groupBy(digest).agg(min_by(struct(*), id))`` is a declarative
    aggregate with a partial-merge phase, so every mapper combines its
    local copies of a duplicated text down to ONE struct before the
    shuffle. That matters because the hot-key corpus is exact-dedup's
    *normal* input — boilerplate-heavy web crawls where one page repeats
    millions of times. The r6 ``row_number() over (partition by digest)``
    window form also had one exchange, but a window has no combiners: it
    ships EVERY copy of the duplicate class to a single reducer, which
    then sorts the whole class while the rest of the cluster idles — a
    skew bomb at 100 TB. min_by keeps the r6 single-shuffle win and
    restores the r1–r5 skew safety without that form's second corpus
    shuffle + semi join. Survivor = min id, deterministic, so reruns and
    task retries converge.
    """
    cols = df.columns
    hashed = df.withColumn("content_md5", F.md5(F.col(text_col)))
    return (
        hashed.groupBy("content_md5")
        .agg(F.min_by(F.struct(*[F.col(c) for c in cols]), F.col(id_col)).alias("_s"))
        .select("_s.*")
    )


# ---------------------------------------------------------------------
# N-gram Jaccard (brute-force exact — the oracle-grade reference)
# ---------------------------------------------------------------------


def shingle_sets(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col), F.expr(shingles_spark(text_col, n)).alias("shingles")
    )


def ngram_jaccard_pairs(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All pairs with word-``n``-gram Jaccard ≥ threshold, O(n²) exact.

    This is the correctness reference for :func:`minhash_lsh_pairs`;
    run it only at verification scale.
    """
    s = shingle_sets(df, text_col, id_col, n)
    a = s.select(F.col(id_col).alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = s.select(F.col(id_col).alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.expr(jaccard_spark("sh_a", "sh_b"))
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_oracle(
    table: str, text_col: str, id_col: str, n: int = 3, threshold: float = 0.5
) -> str:
    """DuckDB SQL computing the identical pair set."""
    return f"""
    WITH s AS (
      SELECT {id_col}, {shingles_duckdb(text_col, n)} AS sh FROM {table}
    )
    SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
           round({jaccard_duckdb('a.sh', 'b.sh')}, 4) AS jaccard
    FROM s a JOIN s b ON a.{id_col} < b.{id_col}
    WHERE round({jaccard_duckdb('a.sh', 'b.sh')}, 4) >= {threshold}
    """


# ---------------------------------------------------------------------
# MinHash + LSH (the scale path)
# ---------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = NUM_BANDS * ROWS_PER_BAND,
) -> DataFrame:
    """(id, sig_0..sig_{K-1}) via explode + K min-aggregates.

    ``sig_i = min over shingles of (a_i * (h(s) mod P) + b_i) mod P``.

    ``h`` here is Spark's native ``xxhash64`` — NOT the md5-based
    engine-portable hash used elsewhere. Signatures only *route*
    candidate pairs into buckets; the output pairs are verified with
    exact Jaccard over the shingle strings (which IS oracle-portable),
    so the signature hash needs determinism, not cross-engine equality,
    and xxhash64 stays in codegen with no hex/string round-trip.

    Shape note: the tempting single-projection form (K ×
    ``array_min(transform(...))``) is 100× slower — Spark evaluates
    higher-order lambdas interpreted (outside whole-stage codegen), and
    projection collapse re-inlines the hash array into every signature
    expression. Exploding shingles instead computes each hash exactly
    once in codegen, and the K universal hashes become K ``min()``
    partial aggregates — map-side combined, one narrow shuffle of one
    row per (doc × partition).
    """
    # Spread work when the scan produced few splits (one small file ⇒
    # one partition ⇒ one core does everything). Repartitioning the
    # *documents* — not the exploded shingles — shuffles each text once
    # instead of once per shingle, and explode keeps a doc's shingles
    # colocated, so the groupBy's map-side partial agg still emits
    # exactly one row per doc before the final (tiny) shuffle.
    df = _ensure_min_parallelism(df)
    sh = shingle_sets(df, text_col, id_col, n)
    arr = _signatures_from_shingles(sh, id_col, num_hashes)
    return arr.selectExpr(
        id_col, *[f"sig[{i}] AS sig_{i}" for i in range(num_hashes)]
    )


def _signatures_from_shingles(sh: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """(id, sig: array<bigint>) from a precomputed (id, shingles) frame.

    Three deliberate shapes here:

    * The K mins are computed as K aggregates (codegen, map-side
      combined) folded into one array column inside a SINGLE
      ``array(min(...), ...)`` aggregate expression. Every downstream
      schema (banding, prefilter joins) is 2 columns instead of K+1 —
      at K=64 the wide form made Catalyst analyze 65-column join
      schemas on every plan branch, and driver-side plan handling
      (~2.8 s of the round-2 cold run) dwarfed the executors' work.
    * The whole aggregate crosses the Python↔JVM bridge as ONE
      expression string: building K Column objects costs K+ py4j
      round-trips (~0.3 ms each — the round-2 query spent 1.7 s of its
      cold time on 6k such round-trips building the plan).
    * This is the shared entry point that lets :func:`_lsh_rep_pairs`
      derive banding AND the prefilter from ONE signature computation
      instead of re-deriving the explode + K-min-agg subtree per
      consumer (the round-2 bench regression).
    """
    a, b = minhash_coefficients(num_hashes)
    hashed = sh.selectExpr(id_col, "explode(shingles) AS s").selectExpr(
        id_col, f"pmod(xxhash64(s), {HASH_P}) AS h"
    )
    mins = ", ".join(
        f"min(pmod({a[i]}L * h + {b[i]}L, {HASH_P}))" for i in range(num_hashes)
    )
    return hashed.groupBy(id_col).agg(F.expr(f"array({mins})").alias("sig"))


def _lsh_rep_pairs(
    reps: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    num_bands: int,
    rows_per_band: int,
    sig_prefilter: bool,
    max_bucket_size: int | None,
    sh: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate generation + verification over (already distinct)
    documents. Returns (doc_a, doc_b, jaccard) with jaccard ≥ threshold.

    Dataflow: sign → explode to (band, key) → shuffle on key → bucket
    self-join → distinct candidate pairs → signature-estimate filter →
    exact-Jaccard verify. No O(n²) stage; hot buckets (near-identical
    boilerplate) are bounded by the derived band geometry, the optional
    per-bucket cap, and AQE skew-join splitting.

    ``sh`` is the precomputed (id, shingles) frame over ``reps``
    (computed here when absent). It is joined once with the signature
    frame into ``ver`` = (id, shingles, sig), which is ``persist()``-ed
    and feeds all three consumers (band explode — column-pruned to
    (id, sig) by the InMemoryTableScan — and verify sides a/b) rather
    than relying on plan-shape-fragile exchange reuse: one explode +
    K-min-agg pass ever runs. One id-keyed join here replaces the
    round-2 shape's TWO extra prefilter joins downstream, and the
    cached frame is shingles + K longs per DISTINCT doc
    (MEMORY_AND_DISK spill, LRU-evicted after the query).
    """
    num_hashes = num_bands * rows_per_band
    if sh is None:
        sh = shingle_sets(_ensure_min_parallelism(reps), text_col, id_col, n)
    sigs = _signatures_from_shingles(sh, id_col, num_hashes)
    # EAGER fill, same rationale as minhash_lsh_pairs' `annotated` pin
    # (round-13 fix, extended to `ver` in round 14): ver feeds THREE
    # plan branches (band melt + verify sides a/b), and a lazy persist
    # lets AQE materialize those query stages concurrently — tasks that
    # all miss the cache each recompute the shingle+K-min-signature
    # pass (up to 3× the operator's dominant cost). One fill job pins
    # it exactly once; local cost is neutral (the fill pays what the
    # first consumer would have paid).
    from presto_rakam_kafka_spark.operators.ranks import eager_pin

    ver = eager_pin(sh.join(sigs, id_col))
    # One 8-byte key per band (hash of the band's signature rows):
    # numeric shuffle keys, not concatenated strings. inline() explodes
    # the per-band structs straight to (band, key) columns — the whole
    # melt is one expression string (one py4j round-trip, one
    # Generate node).
    band_structs = ", ".join(
        "named_struct('band', {i}, 'key', xxhash64({args}))".format(
            i=i,
            args=", ".join(
                f"sig[{i * rows_per_band + r}]" for r in range(rows_per_band)
            ),
        )
        for i in range(num_bands)
    )
    melted = ver.selectExpr(id_col, f"inline(array({band_structs}))")

    if max_bucket_size is not None:
        # Documented spill-to-sampling policy for degenerate buckets:
        # keep the max_bucket_size smallest doc ids per (band, key) —
        # deterministic, so the oracle can replay it — bounding the
        # self-join fan-out at cap²/2 pairs per bucket. A truncated doc
        # can still pair in its other bands; recall loss is confined to
        # pairs whose EVERY colliding band is a > cap bucket.
        melted = melted.selectExpr(
            id_col,
            "band",
            "key",
            f"row_number() OVER (PARTITION BY band, key ORDER BY {id_col}) AS __rn",
        ).filter(F.col("__rn") <= max_bucket_size).drop("__rn")

    # distinct() BEFORE the verify join: a hostile-corpus pair collides
    # in ~1.6 bands on average, so skipping the dedup exchange inflates
    # the (wide, shingle-carrying) verify join input by ~60% — measured
    # 80.6 s vs 63.8 s at the 500k-doc adversarial shape. One slim
    # exchange of (doc_a, doc_b) longs is the cheaper side of that
    # trade at every scale where the flood exists at all.
    left = melted.select(F.col(id_col).alias("doc_a"), "band", "key")
    right = melted.select(F.col(id_col).alias("doc_b"), "band", "key")
    candidates = (
        left.join(right, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    a = ver.selectExpr(f"{id_col} AS doc_a", "shingles AS sh_a", "sig AS sig_a")
    b = ver.selectExpr(f"{id_col} AS doc_b", "shingles AS sh_b", "sig AS sig_b")
    pairs = candidates.join(a, "doc_a").join(b, "doc_b")

    if sig_prefilter:
        # Cheap verification pass BEFORE the shingle intersect: the
        # fraction of agreeing minhashes is an unbiased Jaccard
        # estimate (σ = sqrt(t(1-t)/K)), and the signatures are narrow
        # longs already computed for banding. Candidates whose estimate
        # sits 3.5σ below the threshold are discarded by this filter —
        # evaluated per joined row BEFORE the exact-Jaccard projection,
        # so the adversarial hot-bucket regime (millions of
        # sub-threshold candidates at J just above the S-curve
        # midpoint) pays K long-compares per pair, never the
        # array_intersect. Extra miss probability for a true pair at
        # J=t is Φ(-3.5) ≈ 2e-4 — the same order as the banding miss.
        # (Round 2 ran this as two extra joins against a separate sig
        # frame; the fused filter removes both joins and an exchange.)
        cutoff = threshold - 3.5 * (threshold * (1.0 - threshold) / num_hashes) ** 0.5
        if cutoff > 0.0:
            # The agreement count is computed as a VALUE-set intersect,
            # not a positional compare. Equivalence: sig values are
            # ~uniform in [0, 1e9), so a cross-position value collision
            # (which inflates the estimate — the safe direction: extra
            # pairs just reach the exact verify) has p ≈ K²/1e9 per
            # pair, and a within-doc duplicate value (which can deflate
            # it by 1) is equally rare — both vanish inside the 3.5σ
            # cutoff slack. Why this form: array_intersect on two long
            # arrays stays in whole-stage codegen (measured 17.5 s over
            # 12.6M hostile candidates), while K explicit
            # sig_a[i]=sig_b[i] terms blow the generated method past
            # the JIT limit and drop the whole stage to interpreted
            # eval (53.6 s), and a zip_with lambda is interpreted by
            # design (~4 µs/row).
            matches = F.expr("size(array_intersect(sig_a, sig_b))")
            pairs = pairs.filter(matches >= F.lit(cutoff * num_hashes))

    jac = F.expr(jaccard_spark("sh_a", "sh_b"))
    return pairs.select(
        "doc_a", "doc_b", F.round(jac, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_bands: int = NUM_BANDS,
    rows_per_band: int | None = None,
    pre_collapse: bool = True,
    sig_prefilter: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified with exact
    Jaccard — output equals :func:`ngram_jaccard_pairs` at the same
    threshold whenever LSH recall holds (per-pair miss ≤ ~4e-4 at the
    derived t=0.8 defaults: 2.2e-4 banding + 2e-4 prefilter; raise
    ``num_bands`` where that matters; verified empirically identical to
    the exact pairs on the deterministic fixture corpora).

    Hostile-corpus guards (all on by default — the round-1 operator had
    none and hit a measured 44.9 s cliff on boilerplate-heavy data):

    * ``pre_collapse`` — byte-identical texts are collapsed to their
      min-id representative BEFORE sketching (one digest shuffle), and
      the output pairs are expanded back afterwards (members of the
      same group pair at Jaccard 1.0; cross-group pairs inherit their
      representatives' Jaccard). A corpus with d copies per doc sketches
      and bands n/d docs instead of n, and the intra-copy pair flood
      never reaches the LSH join at all.
    * ``rows_per_band=None`` — derived from the threshold via
      :func:`derived_rows_per_band` so the S-curve midpoint sits just
      below ``threshold`` instead of at a fixed 0.40.
    * ``sig_prefilter`` — sub-threshold candidates are discarded with
      the already-computed signatures before the shingle-array join.
    * ``max_bucket_size`` — optional deterministic per-bucket cap
      (spill-to-sampling; off by default because it is the only knob
      that can silently lose recall on legitimate pairs).

    Inherent limit, stated honestly: the guards bound the candidate
    stage to O(Σ cluster²) over near-duplicate *clusters*. A corpus
    that is one giant cluster at J just below the threshold (every
    pair near the S-curve midpoint) has Ω(n²) band-colliding pairs
    under ANY banding geometry with usable recall — for such corpora
    the only sub-quadratic option is ``max_bucket_size`` (documented
    recall loss), which is why it exists.
    """
    if rows_per_band is None:
        rows_per_band = derived_rows_per_band(threshold, num_bands)

    if not pre_collapse:
        return _lsh_rep_pairs(
            _ensure_min_parallelism(df), text_col, id_col, n, threshold,
            num_bands, rows_per_band, sig_prefilter, max_bucket_size,
        )

    # Group-collapse in ONE pass: a window over the content digest tags
    # every row with its group's representative (min id) and size. The
    # earlier groupBy + join-back shape costs a corpus shuffle PLUS a
    # groups-aggregate shuffle PLUS the join (groups are ~n rows at
    # corpus scale — not broadcastable); the window is a single corpus
    # shuffle on the digest. Digests are uniform, so no skew.
    from presto_rakam_kafka_spark.operators.ranks import eager_pin

    annotated = eager_pin(df.selectExpr(
        id_col, text_col, f"md5({text_col}) AS __digest"
    ).selectExpr(
        id_col,
        text_col,
        f"min({id_col}) OVER (PARTITION BY __digest) AS __rep",
        "count(1) OVER (PARTITION BY __digest) AS __size",
    ))
    # annotated feeds four plan branches (expansion sides a/b, the
    # intra-group pair build, and reps → shingles). Without persist each
    # branch re-runs the digest window; exchange reuse MIGHT dedupe
    # them, but that is plan-shape fragile — persist makes the reuse
    # explicit (MEMORY_AND_DISK, ≈ corpus size, LRU-evicted after).
    # Round-13: the fill is EAGER — a lazy persist lets AQE materialize
    # the four consuming query stages concurrently, and tasks that all
    # miss the cache each recompute the digest window (a cache RACE,
    # up to 4× the corpus shuffle); one fill job pins it exactly once.
    reps = annotated.filter(F.col(id_col) == F.col("__rep")).select(
        F.col(id_col), F.col(text_col)
    )
    sh = shingle_sets(_ensure_min_parallelism(reps), text_col, id_col, n)

    rep_pairs = _lsh_rep_pairs(
        reps, text_col, id_col, n, threshold, num_bands, rows_per_band,
        sig_prefilter, max_bucket_size, sh=sh,
    )

    # Intra-group pairs: identical texts are Jaccard 1.0 by definition —
    # provided they have at least one shingle, i.e. ≥ n tokens
    # (zero-shingle docs never produce a signature and must stay
    # invisible, matching the un-collapsed operator and the exact
    # oracle). Expressed as a SELF-pair of the representative and
    # expanded through the same two joins as the cross pairs below —
    # the round-2 shape ran a separate sh_ok join + member self-join +
    # union for these (three more exchanges).
    self_pairs = annotated.filter(
        f"{id_col} = __rep AND __size >= 2"
        f" AND size(split({text_col}, ' ')) >= {n}"
    ).selectExpr(
        f"{id_col} AS doc_a", f"{id_col} AS doc_b", "cast(1.0 AS double) AS jaccard"
    )

    # Expand representative pairs to member pairs. Orientation is
    # re-derived with least/greatest because a member of the lower-id
    # group may carry a higher id than a member of the other group; for
    # self pairs the m_a < m_b filter already emits each unordered
    # member pair exactly once (both orderings reach the filter).
    membership = annotated.select(
        F.col("__rep").alias("rep"), F.col(id_col).alias("member")
    )
    ma = membership.select(F.col("rep").alias("doc_a"), F.col("member").alias("m_a"))
    mb = membership.select(F.col("rep").alias("doc_b"), F.col("member").alias("m_b"))
    return (
        rep_pairs.unionByName(self_pairs)
        .join(ma, "doc_a")
        .join(mb, "doc_b")
        .filter((F.col("doc_a") != F.col("doc_b")) | (F.col("m_a") < F.col("m_b")))
        .select(
            F.least("m_a", "m_b").alias("doc_a"),
            F.greatest("m_a", "m_b").alias("doc_b"),
            "jaccard",
        )
    )


# ---------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------


#: Packed sign-sum layout: 3 bit-counters per 64-bit aggregate, 21-bit
#: lanes. Each token contributes 0/1 to each lane; lane sums stay exact
#: (no cross-lane carry) while every doc has < 2^21 ≈ 2M tokens —
#: orders of magnitude above real pretraining docs, and 63 of 64 bits
#: used so the sign bit never flips.
_SIMHASH_LANE_BITS = 21
_SIMHASH_LANES = 3


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One 60-bit SimHash per doc via explode + PACKED sign-sum
    aggregates: 20 lane-packed ``sum()``s + one ``count()`` instead of
    the round-2 shape's 60 independent sign-sums.

    bit_j(doc) = sign of Σ_tokens (±1 by bit j of the token hash) —
    classic frequency-weighted SimHash (tokens are NOT de-duplicated).
    The ±1 sign-sum is recovered from packed 0/1 counts:
    ``sum(±1) > 0  ⇔  2·count_ones > n_tokens`` (exactly, ties
    included), so the output is bit-identical to the unpacked form and
    to the oracle CTE. Packing cuts the aggregation buffer from 60
    longs to 21 and the generated update/merge methods ~3× — the
    per-doc agg is the whole cost of this operator, and round 2's
    60-wide buffer was the largest consumer of
    ``spark.sql.codegen.maxFields`` headroom.

    Same shape rationale as :func:`minhash_signatures`: explode keeps
    the md5 and all bit tests inside whole-stage codegen with map-side
    partial aggregation, where the nested higher-order-lambda form runs
    interpreted and ~15× slower.
    """
    # Same rationale as minhash_signatures: repartition docs (cheap),
    # not exploded tokens; partial agg then collapses per doc locally.
    # All wide expression lists cross the Python↔JVM bridge as single
    # strings (see _signatures_from_shingles for the measured py4j
    # round-trip cost of per-Column construction).
    df = _ensure_min_parallelism(df)
    hashed = df.selectExpr(
        id_col, f"explode(split({text_col}, ' ')) AS t"
    ).selectExpr(id_col, f"{base_hash_spark('t')} AS h")
    lanes, lane_bits = _SIMHASH_LANES, _SIMHASH_LANE_BITS
    n_groups = -(-SIMHASH_BITS // lanes)
    packed_sums = ", ".join(
        "sum("
        + " + ".join(
            f"shiftleft((h div shiftleft(1L, {g * lanes + k})) % 2, {lane_bits * k})"
            for k in range(lanes)
            if g * lanes + k < SIMHASH_BITS
        )
        + ")"
        for g in range(n_groups)
    )
    per_doc = hashed.groupBy(id_col).agg(
        F.expr(f"array({packed_sums})").alias("pk"),
        F.expr("count(1)").alias("n_tok"),
    )
    assemble = " + ".join(
        f"if(2 * ((pk[{j // lanes}] div shiftleft(1L, {lane_bits * (j % lanes)}))"
        f" % shiftleft(1L, {lane_bits})) > n_tok, shiftleft(1L, {j}), 0L)"
        for j in range(SIMHASH_BITS)
    )
    return per_doc.selectExpr(id_col, f"{assemble} AS simhash")


def simhash_signatures_oracle_cte(table: str, text_col: str, id_col: str) -> str:
    """DuckDB CTE body producing (id, simhash) identically (explode
    form — the oracle favors clarity over the single-pass shape)."""
    return f"""
      tok AS (SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS t FROM {table}),
      th AS (SELECT {id_col}, {base_hash_duckdb('t')} AS h FROM tok),
      bits AS (
        SELECT {id_col}, j,
               sum(CASE WHEN ((h >> j) & 1) = 1 THEN 1 ELSE -1 END) AS s
        FROM th, range({SIMHASH_BITS}) r(j) GROUP BY {id_col}, j
      ),
      sh AS (
        SELECT {id_col},
               sum(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY {id_col}
      )
    """


def simhash_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs within Hamming distance ``max_hamming`` of SimHash.

    Pigeonhole banding: split the 60 bits into ``max_hamming + 1``
    chunks covering every bit; a pair within the distance must agree on
    at least one whole chunk, so joining per-chunk finds every such
    pair without a cross join.
    """
    from presto_rakam_kafka_spark.operators.ranks import eager_pin

    n_chunks = max_hamming + 1
    base, extra = divmod(SIMHASH_BITS, n_chunks)
    widths = [base + (1 if c < extra else 0) for c in range(n_chunks)]
    starts = [sum(widths[:c]) for c in range(n_chunks)]
    # pin the signatures: both sides of the chunk self-join consume
    # them, and without the pin the explode + 21-lane sign-sum
    # aggregate (the operator's dominant cost) runs twice — the same
    # double-evaluation the LSH twin removes by persisting `ver`
    sh = eager_pin(simhash_signatures(df, text_col, id_col))
    chunk_structs = ", ".join(
        f"named_struct('chunk', {c}, 'val',"
        f" (simhash div shiftleft(1L, {starts[c]}))"
        f" % shiftleft(1L, {widths[c]}))"
        for c in range(n_chunks)
    )
    chunks = sh.selectExpr(id_col, "simhash", f"inline(array({chunk_structs}))")
    a = chunks.select(
        F.col(id_col).alias("doc_a"), F.col("simhash").alias("sh_a"), "chunk", "val"
    )
    b = chunks.select(
        F.col(id_col).alias("doc_b"), F.col("simhash").alias("sh_b"), "chunk", "val"
    )

    def _chunk(side: str, c: int) -> str:
        return (
            f"((sh_{side} div shiftleft(1L, {starts[c]}))"
            f" % shiftleft(1L, {widths[c]}))"
        )

    # Emit each pair at its FIRST agreeing chunk only: a pair agreeing
    # on k chunks used to reach the output k times and pay a distinct
    # exchange to collapse; both signatures ride the join, so "every
    # earlier chunk differs" is a plain bit-arithmetic predicate and
    # the duplicate emissions (and their exchange) never exist. Same
    # pair set, one fewer shuffle (guide §2.4).
    first_agree = "CASE " + " ".join(
        f"WHEN chunk = {c} THEN "
        + (
            " AND ".join(
                f"({_chunk('a', k)} != {_chunk('b', k)})" for k in range(c)
            )
            if c
            else "true"
        )
        for c in range(n_chunks)
    ) + " END"
    return (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .filter(F.expr(first_agree))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sh_a ^ sh_b)").cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_oracle(
    table: str, text_col: str, id_col: str, max_hamming: int = 3
) -> str:
    return f"""
    WITH {simhash_signatures_oracle_cte(table, text_col, id_col)}
    SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
    FROM sh a JOIN sh b ON a.{id_col} < b.{id_col}
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


# ---------------------------------------------------------------------
# Embedding cosine near-dup (exact; LSH scale path in .similarity)
# ---------------------------------------------------------------------


def cosine_expr(a: str, b: str) -> str:
    """Left-fold double cosine — element order fixed, so Spark and the
    DuckDB oracle produce bit-identical doubles."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v)"
    na = f"sqrt(aggregate(transform({a}, x -> cast(x as double) * cast(x as double)), 0D, (acc, v) -> acc + v))"
    nb = f"sqrt(aggregate(transform({b}, x -> cast(x as double) * cast(x as double)), 0D, (acc, v) -> acc + v))"
    return f"({dot}) / (({na}) * ({nb}))"


def cosine_expr_duckdb(a: str, b: str, dim: int) -> str:
    dot = f"list_reduce(list_transform(range(1, {dim + 1}), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
    na = f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE), (x, y) -> x + y))"
    nb = f"sqrt(list_reduce(list_transform(range(1, {dim + 1}), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y))"
    return f"({dot}) / (({na}) * ({nb}))"


def embedding_dup_pairs(
    df: DataFrame, vec_col: str, id_col: str, threshold: float = 0.45
) -> DataFrame:
    """Exact near-duplicate vector pairs: cosine ≥ threshold, O(n²)."""
    a = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a"))
    b = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b"))
    cos = F.expr(cosine_expr("emb_a", "emb_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_dup_pairs_oracle(
    table: str, vec_col: str, id_col: str, dim: int, threshold: float = 0.45
) -> str:
    cos = cosine_expr_duckdb(f"a.{vec_col}", f"b.{vec_col}", dim)
    return f"""
    SELECT a.{id_col} AS vec_a, b.{id_col} AS vec_b, round({cos}, 6) AS cosine
    FROM {table} a JOIN {table} b ON a.{id_col} < b.{id_col}
    WHERE round({cos}, 6) >= {threshold}
    """


# ---------------------------------------------------------------------
# SemDeDup — cluster-then-prune semantic dedup
# ---------------------------------------------------------------------


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.45,
    num_centroids: int = 8,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", 2023): assign every
    embedding to its nearest coarse-quantizer centroid, then search for
    near-duplicates ONLY within each cluster — a row is dropped iff an
    earlier row (lower id) in the SAME cluster has cosine ≥ threshold.
    Returns the kept rows as (id, cluster_id).

    This is the scale path for :func:`embedding_dup_pairs`: the O(n²)
    pair space collapses to Σ|cluster|² — with balanced clusters a
    num_centroids× reduction, and the within-cluster self-join is a
    plain cluster-keyed shuffle join (each cluster's pairs are
    generated where its rows live, no broadcast of the corpus).
    Same fit-then-broadcast centroid contract as IVF
    (:func:`presto_rakam_kafka_spark.operators.similarity.fit_centroids`);
    the seeded default keeps the DuckDB oracle replayable. At
    production centroid counts (k ~ n/500, far past the ~64-literal
    expression-tree cap) the assignment step swaps to the BLAS path
    (:func:`presto_rakam_kafka_spark.operators.similarity.assign_clusters_pandas`
    — one Arrow-batched matmul against the broadcast codebook,
    equality with this form unit-tested); the pair-prune stage is
    unchanged. The
    cross-cluster miss mode is inherent to SemDeDup (a pair split
    across cluster boundaries is never compared) — the oracle replays
    the same clustering, so the contract is exact given the centroids.
    """
    from presto_rakam_kafka_spark.operators.similarity import (
        _dots_array_spark,
        _sorted_idx_from_array,
        ivf_centroids,
    )

    cents = centroids if centroids is not None else ivf_centroids(num_centroids, dim)
    # Per-row norm computed ONCE before the pair join (per-pair work
    # drops from 3 array folds to 1 — the dot); same left-fold double
    # expression as cosine_expr, so values are bit-identical.
    norm = (
        f"sqrt(aggregate(transform({vec_col}, x -> cast(x as double)"
        f" * cast(x as double)), 0D, (acc, v) -> acc + v))"
    )
    # cluster assignment in array form (round 14, similarity.py
    # _dots_array_spark): one sorted codebook-literal dot array, same
    # doubles and (dot desc, idx asc) tie-break as the per-column
    # struct-sort form — equality-tested there
    cluster_expr = _sorted_idx_from_array(
        _dots_array_spark(vec_col, cents), len(cents)
    )
    assigned = df.selectExpr(
        id_col, vec_col, f"({cluster_expr})[0] AS cluster_id"
    )
    with_norm = assigned.select(
        id_col, vec_col, "cluster_id", F.expr(norm).alias("_nrm")
    )
    a = with_norm.select(
        "cluster_id",
        F.col(id_col).alias("_ka"),
        F.col(vec_col).alias("emb_a"),
        F.col("_nrm").alias("_na"),
    )
    b = with_norm.select(
        "cluster_id",
        F.col(id_col).alias("_kb"),
        F.col(vec_col).alias("emb_b"),
        F.col("_nrm").alias("_nb"),
    )
    dot = (
        "aggregate(zip_with(emb_a, emb_b, (x, y) -> cast(x as double)"
        " * cast(y as double)), 0D, (acc, v) -> acc + v)"
    )
    # nullif guards the all-zero embedding: NaN would otherwise satisfy
    # ``round(NaN, 6) >= threshold`` under Spark's NaN-greatest ordering,
    # flagging every later same-cluster row as a dup of the zero vector.
    cos = F.expr(f"({dot}) / nullif(_na * _nb, 0D)")
    flagged = (
        a.join(b, on="cluster_id")
        .filter(F.col("_ka") < F.col("_kb"))
        .filter(F.round(cos, 6) >= threshold)
        .select(F.col("_kb").alias(id_col))
        .distinct()
    )
    return assigned.join(flagged, on=id_col, how="left_anti").select(
        id_col, "cluster_id"
    )


def semdedup_oracle(
    table: str,
    vec_col: str,
    id_col: str,
    dim: int,
    threshold: float = 0.45,
    num_centroids: int = 8,
) -> str:
    from presto_rakam_kafka_spark.operators.similarity import (
        _argmax_rank_case,
        _dots_duckdb,
        ivf_centroids,
    )

    cents = ivf_centroids(num_centroids, dim)
    dots = _dots_duckdb(vec_col, cents)
    dcols = [f"d{i}" for i in range(len(cents))]
    dot_sel = ", ".join(f"({d}) AS {c}" for d, c in zip(dots, dcols))
    assign = _argmax_rank_case(dcols, 0)
    cos = cosine_expr_duckdb(f"a.{vec_col}", f"b.{vec_col}", dim)
    # Anti-join, not NOT EXISTS: DuckDB cannot resolve a correlated
    # outer column inside the list_transform lambda of the cosine.
    return f"""
    WITH cd AS (SELECT {id_col}, {vec_col}, {dot_sel} FROM {table}),
         c AS (SELECT {id_col}, {vec_col}, ({assign}) AS cluster_id FROM cd),
         f AS (SELECT DISTINCT b.{id_col} AS fid
               FROM c a JOIN c b
                 ON a.cluster_id = b.cluster_id AND a.{id_col} < b.{id_col}
               WHERE round({cos}, 6) >= {threshold})
    SELECT c.{id_col} AS {id_col}, c.cluster_id
    FROM c LEFT JOIN f ON c.{id_col} = f.fid
    WHERE f.fid IS NULL
    """


# ---------------------------------------------------------------------
# Substring-span dedup (cross-document duplicated n-gram fraction)
# ---------------------------------------------------------------------


def duplicated_span_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 10
) -> DataFrame:
    """Substring-level duplication signal (the Lee et al. 2021
    "Deduplicating Training Data" observation: harmful duplication is
    repeated SPANS, not identical documents): for every document,
    the fraction of its word ``n``-gram positions whose n-gram also
    occurs in at least one OTHER document. Pipelines drop or trim
    docs above a threshold; doc-level dedup (exact/MinHash) can't see
    a boilerplate header shared by a million otherwise-distinct pages.

    Scale shape: explode positions → one shuffle keyed by the n-gram
    (partial-agg'd distinct-doc counts; n-grams are near-unique so no
    skew), broadcast-free re-join by n-gram back onto the exploded
    positions, one doc-id regroup. The exact suffix-array construction
    of the paper is a single-machine algorithm; the fixed-n span
    approximation is the standard distributed stand-in (same keying as
    MinHash shingles, `functions/hashing.py`)."""
    # The gram key is the token-array SLICE, not a concat_ws string:
    # grouping/joining on array<string> skips the per-position string
    # assembly (cold 5.4 → 1.6 s, warm 1.22 → 1.01 s at sf0.1) and the
    # grouping partition is identical (space-split tokens ⇒ the slice
    # and the joined string are in bijection, same as the LM pairs).
    toks = f"split({text_col}, ' ')"
    exploded = (
        df.select(F.col(id_col), F.expr(toks).alias("_toks"))
        .select(
            id_col,
            "_toks",
            F.explode(
                F.expr(
                    f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())"
                )
            ).alias("i"),
        )
        .select(id_col, F.expr(f"slice(_toks, i, {n})").alias("g"))
    )
    cross = (
        exploded.groupBy("g")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .filter(F.col("_docs") >= 2)
        .select("g")
    )
    marked = exploded.join(cross.withColumn("_dup", F.lit(1)), on="g", how="left")
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.sum(F.coalesce("_dup", F.lit(0))).alias("n_dup_grams"),
        F.expr("round(sum(coalesce(_dup, 0)) * 1.0 / count(*), 4)")
        .cast("double")
        .alias("dup_fraction"),
    )


def duplicated_span_stats_oracle(
    table: str, text_col: str, id_col: str, n: int = 10
) -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
    WITH ex AS (
      SELECT {id_col},
             unnest(list_transform(range(1, len({toks}) - {n - 2}),
                    i -> array_to_string({toks}[i:i+{n - 1}], ' '))) AS g
      FROM {table}),
    cross_grams AS (
      SELECT g FROM (SELECT g, count(DISTINCT {id_col}) AS _docs FROM ex GROUP BY g)
      WHERE _docs >= 2)
    SELECT ex.{id_col},
           count(*) AS n_grams,
           CAST(sum(CASE WHEN c.g IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_dup_grams,
           round(sum(CASE WHEN c.g IS NULL THEN 0 ELSE 1 END) * 1.0 / count(*), 4)
             AS dup_fraction
    FROM ex LEFT JOIN cross_grams c ON ex.g = c.g
    GROUP BY ex.{id_col}
    """


#: Deterministic boilerplate strings for the trim gate query: the
#: fixture corpus's duplicated spans are whole-document copies
#: (dup_fraction 0 or ~1, SCALE_NOTES §substring-trim), so the
#: partial-span trim path would never fire on it; the gate query
#: instead synthesizes the same boilerplate-bearing projection in
#: both engines (the `pii_redact` precedent) so leading/trailing
#: trims run against real shared spans.
TRIM_BOILER = "terms of service apply to all content on this site please read"
TRIM_FOOTER = "copyright notice all rights reserved contact us for more info here"


def boilerplate_augment_spark(text_col: str, id_col: str) -> str:
    return (
        f"CASE WHEN {id_col} % 7 = 3 THEN '{TRIM_BOILER}' || ' ' || {text_col} "
        f"ELSE {text_col} END || CASE WHEN {id_col} % 11 = 5 "
        f"THEN ' ' || '{TRIM_FOOTER}' ELSE '' END"
    )


boilerplate_augment_duckdb = boilerplate_augment_spark  # identical SQL dialect subset


def duplicated_span_trim(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 10,
    drop_threshold: float = 0.9,
) -> DataFrame:
    """The TREATMENT step on top of :func:`duplicated_span_stats`
    (Lee et al. 2021 §4: don't just flag duplicated spans — remove
    them): per document, compute which word-``n``-gram start positions
    recur in another document, then (a) DROP the doc outright when its
    duplicated-gram fraction ≥ ``drop_threshold`` (a near-total copy),
    else (b) TRIM the leading and trailing runs of duplicated-span-
    covered tokens (shared boilerplate headers/footers), keeping the
    span between the first and last uncovered token; interior
    duplicated spans are kept (cutting them would splice unrelated
    text together — the paper's ExactSubstr drops only whole matches).

    Returns (id, action ∈ drop|trim|keep, n_tokens_in, n_tokens_out,
    text_out) with text_out NULL for drops.

    Scale shape: the same ONE n-gram-keyed shuffle + one doc regroup
    as `duplicated_span_stats` — the per-doc dup-start positions ride
    the regroup as a sorted int array, and the trim itself is a pure
    projection (HOF coverage test over the token sequence; O(T ·
    |dup_starts|) per doc worst case, with |dup_starts| ≪ T for the
    boilerplate case this treats — an interval-merge would make it
    O(T + |runs|) if a corpus ever needed it). Idempotent by
    construction: re-running on the trimmed output can only shrink
    the duplicated set (grams were destroyed, none created), and a
    kept doc's first/last tokens are uncovered, so a second pass
    changes nothing (property-tested)."""
    toks = f"split({text_col}, ' ')"
    base = df.select(F.col(id_col), F.expr(toks).alias("_toks"))
    exploded = base.select(
        id_col,
        "_toks",
        F.explode(
            F.expr(
                f"if(size(_toks) >= {n}, sequence(1, size(_toks) - {n - 1}), array())"
            )
        ).alias("i"),
    ).select(
        # array-slice gram key — same bijection argument as
        # duplicated_span_stats, no per-position concat
        id_col, "i", F.expr(f"slice(_toks, i, {n})").alias("g")
    )
    cross = (
        exploded.groupBy("g")
        .agg(F.countDistinct(id_col).alias("_docs"))
        .filter(F.col("_docs") >= 2)
        .select("g")
    )
    marked = exploded.join(cross.withColumn("_dup", F.lit(1)), on="g", how="left")
    per_doc = marked.groupBy(id_col).agg(
        F.count("*").alias("_n_grams"),
        F.sum(F.coalesce("_dup", F.lit(0))).alias("_n_dup"),
        F.sort_array(
            F.collect_list(F.when(F.col("_dup") == 1, F.col("i")))
        ).alias("_dup_starts"),
    )
    # Docs shorter than n grams never explode: left join + coalesce
    # keeps them as frac-0 keeps instead of silently dropping them.
    j = base.join(per_doc, on=id_col, how="left").select(
        id_col,
        "_toks",
        F.expr("size(_toks)").alias("_t"),
        F.coalesce("_n_grams", F.lit(0)).alias("_n_grams"),
        F.coalesce("_n_dup", F.lit(0)).alias("_n_dup"),
        F.coalesce("_dup_starts", F.expr("array()")).alias("_dup_starts"),
    )
    unc = (
        f"filter(sequence(1, _t), j -> NOT exists(_dup_starts,"
        f" i -> i <= j AND j <= i + {n - 1}))"
    )
    u = j.select(
        id_col,
        "_toks",
        "_t",
        F.expr(unc).alias("_unc"),
        F.expr(
            "CASE WHEN _n_grams = 0 THEN 0.0"
            " ELSE _n_dup * 1.0 / _n_grams END"
        ).alias("_frac"),
    )
    drop = F.expr(f"_frac >= {drop_threshold} OR size(_unc) = 0")
    first, last = F.expr("element_at(_unc, 1)"), F.expr("element_at(_unc, -1)")
    return u.select(
        id_col,
        F.when(drop, "drop")
        .when((first > 1) | (last < F.col("_t")), "trim")
        .otherwise("keep")
        .alias("action"),
        F.col("_t").cast("long").alias("n_tokens_in"),
        F.when(drop, F.lit(0))
        .otherwise(last - first + 1)
        .cast("long")
        .alias("n_tokens_out"),
        F.when(drop, F.lit(None).cast("string"))
        .otherwise(
            F.expr(
                "concat_ws(' ', slice(_toks, element_at(_unc, 1),"
                " element_at(_unc, -1) - element_at(_unc, 1) + 1))"
            )
        )
        .alias("text_out"),
    )


def duplicated_span_trim_oracle(
    table: str,
    text_col: str,
    id_col: str,
    n: int = 10,
    drop_threshold: float = 0.9,
) -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
    WITH base AS (SELECT {id_col}, {toks} AS toks FROM {table}),
    ex AS (
      SELECT {id_col}, unnest(range(1, len(toks) - {n - 2})) AS i, toks
      FROM base),
    exg AS (SELECT {id_col}, i, array_to_string(toks[i:i+{n - 1}], ' ') AS g
            FROM ex),
    cross_grams AS (
      SELECT g FROM (SELECT g, count(DISTINCT {id_col}) AS _docs
                     FROM exg GROUP BY g)
      WHERE _docs >= 2),
    per_doc AS (
      SELECT exg.{id_col},
             count(*) AS n_grams,
             sum(CASE WHEN c.g IS NULL THEN 0 ELSE 1 END) AS n_dup,
             list_sort(list(exg.i) FILTER (WHERE c.g IS NOT NULL)) AS dup_starts
      FROM exg LEFT JOIN cross_grams c ON exg.g = c.g
      GROUP BY exg.{id_col}),
    j AS (
      SELECT b.{id_col}, b.toks, len(b.toks) AS t,
             coalesce(p.n_grams, 0) AS n_grams,
             coalesce(p.n_dup, 0) AS n_dup,
             coalesce(p.dup_starts, []) AS dup_starts
      FROM base b LEFT JOIN per_doc p ON b.{id_col} = p.{id_col}),
    u AS (
      SELECT *,
             list_filter(range(1, t + 1),
               j -> len(list_filter(dup_starts,
                    i -> i <= j AND j <= i + {n - 1})) = 0) AS unc,
             CASE WHEN n_grams = 0 THEN 0.0
                  ELSE n_dup * 1.0 / n_grams END AS dup_fraction
      FROM j)
    SELECT {id_col},
           CASE WHEN dup_fraction >= {drop_threshold} OR len(unc) = 0 THEN 'drop'
                WHEN unc[1] > 1 OR unc[-1] < t THEN 'trim'
                ELSE 'keep' END AS action,
           t::BIGINT AS n_tokens_in,
           (CASE WHEN dup_fraction >= {drop_threshold} OR len(unc) = 0 THEN 0
                ELSE unc[-1] - unc[1] + 1 END)::BIGINT AS n_tokens_out,
           CASE WHEN dup_fraction >= {drop_threshold} OR len(unc) = 0 THEN NULL
                ELSE array_to_string(toks[unc[1]:unc[-1]], ' ') END AS text_out
    FROM u
    """
