"""Near-duplicate clustering + canonical selection — the decision step
of a dedup pipeline.

Pair-finding operators (:mod:`.dedup`) emit (doc_a, doc_b) near-dup
PAIRS; a training-data pipeline must then pick which docs to KEEP. That
requires the transitive closure (A≈B, B≈C ⇒ {A,B,C} are one cluster
even if A and C never collided) and a deterministic keep rule. This
module provides both as DataFrame-only operators:

* :func:`connected_components` — min-label propagation to fixpoint.
  Each iteration is one join + one aggregate (both shuffle on the node
  id, so co-partitioning is reused across iterations); lineage is cut
  with ``localCheckpoint`` each round, the classic iterative-DataFrame
  trap. Iterations needed = graph diameter, which for near-dup clusters
  is small (dup clusters are dense — versions of one document), and a
  ``max_iter`` cap turns a pathological chain corpus into an explicit
  error, not a hang.
* :func:`connected_components_star` — the alternating large-star /
  small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond", public paper): O(log²) rounds regardless of
  diameter, so a hostile chain corpus that breaks label propagation's
  diameter bound converges in a dozen rounds (measured: 64-chain in 7
  rounds, 256-chain in 9, vs 63/255 label-prop iterations — SCALE_NOTES
  §components). Use it
  when cluster shape is unknown; label propagation stays the default
  for dup clusters because its per-round cost is half (dense clusters
  have diameter 1-2).
* :func:`keep_canonical` — per cluster keep the doc maximizing
  (quality, -doc_id): one aggregate with ``max_by`` semantics via
  struct-max (codegen, no window shuffle).

The DuckDB oracle replays the same closure with a recursive CTE, so the
whole pipeline (pairs → components → keep set) is hash-checked, not
just the pair stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(Exception):
    """Label propagation hit max_iter with labels still changing —
    the pair graph has a longer path than expected; raise rather than
    silently emit a non-transitive clustering."""


def connected_components(
    pairs: DataFrame, max_iter: int = 25
) -> DataFrame:
    """(node, cluster_id) for every doc appearing in ``pairs``;
    cluster_id = min doc id reachable through the pair graph."""
    edges = (
        pairs.selectExpr("doc_a AS src", "doc_b AS dst")
        .unionByName(pairs.selectExpr("doc_b AS src", "doc_a AS dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Seed with min(self, neighbors): the same single aggregate the
    # old distinct+self-label seed cost, but it bakes the first
    # propagation step in — one fewer loop round on most graphs.
    seed = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("_mn"))
        .select("node", F.least("node", "_mn").alias("label"))
    )

    def _fill_and_sum(lbl: DataFrame) -> tuple[DataFrame, object]:
        # ONE action per round: a LAZY localCheckpoint materializes in
        # the same job that computes the convergence checksum — the
        # round-12 loop paid two (an eager checkpoint job, then a
        # new-vs-old equality JOIN job). Min-label propagation is
        # monotone non-increasing per node, so the decimal(38,0) total
        # (overflow-safe for id-valued labels at any realistic count)
        # is unchanged iff NO label changed. The checkpoint (not a
        # persist) is load-bearing: labels feed the next round TWICE
        # (join + union), so without the lineage cut the logical plan
        # doubles per round — 2^rounds nodes, a driver OOM on
        # long-chain graphs (caught by the hostile-chain test).
        lbl = lbl.localCheckpoint(eager=False)
        row = lbl.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        # ADVICE r13 #2: a NULL checksum with labels present means the
        # label column isn't castable to decimal (string/UUID doc ids)
        # — every round would read None == None and "converge" after
        # one step, silently returning non-transitive clusters. Refuse
        # loudly; callers with non-numeric ids must map them to a
        # numeric surrogate first (every in-repo caller uses long ids).
        if row["s"] is None and row["n"]:
            raise TypeError(
                "connected_components convergence checksum is NULL: the "
                "label column is not numeric-castable (string/UUID ids?)"
                " — map ids to a numeric surrogate before clustering"
            )
        return lbl, row["s"]

    labels, prev_sum = _fill_and_sum(seed)
    for _ in range(max_iter):
        prop = (
            edges.join(labels, edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
        )
        new_labels, new_sum = _fill_and_sum(
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select("node", F.col("label").alias("cluster_id"))
        prev_sum = new_sum
    raise ComponentsNotConverged(f"still changing after {max_iter} iterations")


def _symmetric(edges: DataFrame) -> DataFrame:
    return (
        edges.unionByName(edges.selectExpr("v AS u", "u AS v"))
        .filter("u != v")
        .distinct()
    )


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large-star (connect strictly-larger neighbors to the
    neighborhood min) or small-star (connect not-larger neighbors and
    self to the neighborhood min) step over the symmetrized edge set.
    Both are one groupBy + one join, shuffling on the node id."""
    sym = _symmetric(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least(F.col("mv"), F.col("u")).alias("m"))
    joined = sym.join(mins, "u")
    if large:
        emitted = joined.filter(F.col("v") > F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
    else:
        emitted = joined.filter(F.col("v") <= F.col("u")).select(
            F.col("v").alias("u"), F.col("m").alias("v")
        )
        emitted = emitted.unionByName(
            mins.select("u", F.col("m").alias("v"))
        )
    return emitted.filter("u != v").distinct()


def connected_components_star(
    pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """(node, cluster_id) via alternating large-star / small-star
    (Kiveris et al.) — O(log²) rounds independent of graph diameter.

    Each round is two (groupBy + join) stages on the node id; lineage is
    cut per round. At fixpoint the edge set is a forest of stars, every
    node linked directly to its component's minimum id. Isolated
    self-pairs contribute singleton clusters. ``max_iter`` defaults to
    20 ≈ log²(node-id space) headroom; hitting it raises
    :class:`ComponentsNotConverged` rather than emitting a
    non-transitive clustering."""
    e0 = (
        pairs.selectExpr("doc_a AS u", "doc_b AS v")
        .filter("u IS NOT NULL AND v IS NOT NULL")
    )
    nodes = (
        e0.select(F.col("u").alias("node"))
        .unionByName(e0.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = _symmetric(e0).localCheckpoint(eager=True)
    for _ in range(max_iter):
        new_edges = _star_round(_star_round(edges, large=True), large=False)
        new_edges = new_edges.localCheckpoint(eager=True)
        unchanged = (
            new_edges.count() == edges.count()
            and new_edges.exceptAll(edges).limit(1).count() == 0
        )
        edges = new_edges
        if unchanged:
            # stars: every non-root u carries (u → component min); roots
            # appear only as targets and label themselves.
            labels = edges.groupBy("u").agg(F.min("v").alias("m"))
            return (
                nodes.join(labels, nodes.node == labels.u, "left")
                .select(
                    "node",
                    F.least(
                        F.coalesce(F.col("m"), F.col("node")), F.col("node")
                    ).alias("cluster_id"),
                )
            )
    raise ComponentsNotConverged(f"star rounds still changing after {max_iter}")


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    max_iter: int = 25,
) -> DataFrame:
    """One row per near-dup cluster: (cluster_id, kept_doc, cluster_size).

    Keep rule: highest ``quality_col``, ties to the LOWER doc id —
    expressed as a struct max (quality asc, negated id) so it is one
    map-side-combined aggregate, not a window sort. Docs in no pair are
    implicitly kept and not listed (they form no cluster)."""
    comp = connected_components(pairs, max_iter=max_iter)
    member = comp.join(
        docs.select(F.col(id_col).alias("node"), F.col(quality_col).alias("q")),
        "node",
    )
    best = F.max(F.struct(F.col("q"), (-F.col("node")).alias("neg_id")))
    return (
        member.groupBy("cluster_id")
        .agg(
            (-best.getField("neg_id")).alias("kept_doc"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .select("cluster_id", "kept_doc", "cluster_size")
    )


def keep_canonical_oracle(
    table: str,
    text_col: str,
    id_col: str,
    quality_expr: str,
    n: int = 3,
    threshold: float = 0.8,
) -> str:
    """DuckDB twin: exact n-gram Jaccard pairs (the verified contract of
    the LSH path), recursive-CTE transitive closure, same keep rule."""
    from presto_rakam_kafka_spark.functions.hashing import (
        jaccard_duckdb,
        shingles_duckdb,
    )

    return f"""
    WITH RECURSIVE
      s AS (SELECT {id_col}, {shingles_duckdb(text_col, n)} AS sh FROM {table}),
      pairs AS (
        SELECT a.{id_col} AS doc_a, b.{id_col} AS doc_b
        FROM s a JOIN s b ON a.{id_col} < b.{id_col}
        WHERE round({jaccard_duckdb('a.sh', 'b.sh')}, 4) >= {threshold}
      ),
      edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs
      ),
      reach(node, lab) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
      ),
      comp AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
      member AS (
        SELECT c.cluster_id, c.node, ({quality_expr}) AS q
        FROM comp c JOIN {table} d ON d.{id_col} = c.node
      )
    SELECT cluster_id,
           (SELECT m2.node FROM member m2 WHERE m2.cluster_id = m.cluster_id
            ORDER BY m2.q DESC, m2.node ASC LIMIT 1) AS kept_doc,
           count(*) AS cluster_size
    FROM member m GROUP BY cluster_id
    """


def pagerank(
    edges: "DataFrame",
    src: str,
    dst: str,
    iterations: int = 3,
    damping: float = 0.85,
) -> "DataFrame":
    """Fixed-iteration PageRank over a directed edge list (symmetrize
    before calling for undirected graphs). Returns (node, r) after
    ``iterations`` power steps of
    r(v) ← (1-d)/N + d · Σ_{u→v} r(u)/outdeg(u).

    Dataflow per iteration: one shuffle join of edges×ranks on src
    (uniform key: the edge list), one groupBy dst with map-side combine
    — the canonical distributed PageRank step. Ranks are node-sized;
    at 100 TB they shuffle rather than broadcast, which is exactly what
    the join does. The edges⋈outdeg frame is computed once and
    persisted across iterations. Fixed iteration count keeps the
    result (and the unrolled-CTE oracle) deterministic — convergence
    looping belongs to the caller, same stance as
    :func:`connected_components`' explicit max_iter.

    No dangling-mass redistribution: every node of a symmetrized graph
    has outdeg ≥ 1, and the simplified update is documented so the
    oracle replays it exactly."""
    nodes = edges.select(F.col(src).alias("node")).distinct()
    n = nodes.count()  # plan-time scalar (not a driver loop)
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("outdeg"))
    ed = edges.join(deg, src).select(
        F.col(src).alias("e_src"), F.col(dst).alias("e_dst"), "outdeg"
    ).persist()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("r"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["e_src"] == ranks["node"])
            .groupBy("e_dst")
            .agg(F.sum(F.col("r") / F.col("outdeg")).alias("c"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["e_dst"], "left"
        ).select(
            "node",
            (F.lit(base) + F.lit(damping) * F.coalesce(F.col("c"), F.lit(0.0))).alias(
                "r"
            ),
        )
    return ranks
