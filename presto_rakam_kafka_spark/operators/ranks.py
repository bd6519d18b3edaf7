"""Distributed order statistics: a GLOBAL rank without a global
single-partition window.

``Window.orderBy(v)`` with no partition key moves every row into ONE
task (Spark even warns) — the classic scale-killer this package has
been removing since round 4 (packing, top-k). When a total order is
genuinely required (exact percentiles, global row numbering), the
distributed form is:

1. fit ``num_ranges - 1`` bucket boundaries ONCE with an
   approx-percentile aggregate and FREEZE them as literals — balance
   is approximate (that is all the boundaries control), but every
   later job evaluates the identical frozen expression, so bucket
   assignment is deterministic by VALUE. This is the critical design
   point: ``repartitionByRange`` re-SAMPLES its boundaries on every
   job, so any scheme that computes offsets in one job and ranks in
   another can silently disagree with itself (a tie-heavy equivalence
   test caught exactly that in the first cut of this module; a persist
   masks it only until an executor loses its cached blocks and
   recompute re-samples);
2. per-bucket row counts → cumulative offsets (one tiny driver
   round-trip, #buckets rows — the same bounded-fit contract as the
   k-means/z-order fits);
3. local ``row_number`` within each bucket (one hash shuffle on the
   bucket id, machine-local sorts) + broadcast offset = exact global
   rank.

Ties always share a bucket (assignment is by value), so ranks within
a tie group are arbitrary-but-consistent, exactly like a global
sort's tie order; percentile math over values is unaffected.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def eager_pin(df: DataFrame) -> DataFrame:
    """Materialize a multiply-consumed intermediate ONCE, fault-
    tolerantly: ``persist(MEMORY_AND_DISK)`` + an eager fill job. The
    round-8 form used ``localCheckpoint(eager=True)`` — same
    single-computation behavior, but local checkpoints are
    non-replicated AND sever lineage, so on a real cluster one executor
    loss mid-query fails the whole job; a persisted frame keeps its
    lineage and simply recomputes the lost partitions (VERDICT r8 #3).
    The cache is deliberately NOT unpersisted here: the caller's
    returned plan still references it, and MEMORY_AND_DISK evicts under
    pressure instead of pinning the executor heap."""
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    df.count()  # fill now: every downstream consumer reads the cache
    return df


def _fit_sql(bexpr: str, num_ranges: int) -> str:
    """The boundary-fit aggregate for one bucket expression — SHARED by
    the single- and multi-spec rank paths so their bucket assignment
    can never drift (same accuracy literal, same quantile grid)."""
    qs = ", ".join(str(i / num_ranges) for i in range(1, num_ranges))
    return f"approx_percentile({bexpr}, array({qs}), 1000)"


def _pid_sql(bexpr: str, fit_row) -> str:
    """The frozen-literal bucket-id expression from one fit result —
    SHARED by both rank paths (same bounds dedup, same repr
    interpolation); drift here would break their tested equivalence."""
    bounds = sorted(set(fit_row)) if fit_row else []
    if not bounds:
        return "0"
    return " + ".join(f"IF(({bexpr}) > {b!r}, 1, 0)" for b in bounds)


def _bucketed(
    df: DataFrame,
    order_cols: list[Column | str],
    bucket_expr: str | None,
    num_ranges: int | None,
) -> DataFrame:
    """Add a deterministic ``_pid`` bucket column: frozen-literal
    boundaries from one approx-percentile fit over ``bucket_expr``
    (a numeric expression order-monotone in the leading order column;
    defaults to the first order column itself, which must then be a
    NAMED numeric column — a ``Column`` object has no SQL-safe string
    form, so the default would interpolate ``Column<'v'>`` into the
    percentile fit; callers passing Column order keys must supply
    ``bucket_expr`` explicitly)."""
    if num_ranges is None:
        num_ranges = df.sparkSession.sparkContext.defaultParallelism
    if bucket_expr is not None:
        bexpr = bucket_expr
    elif isinstance(order_cols[0], str):
        bexpr = order_cols[0]
    else:
        raise TypeError(
            "bucket_expr is required when order_cols[0] is a Column "
            "expression (str() of a Column is not valid SQL); pass the "
            "column name or an order-monotone numeric SQL expression"
        )
    row = df.agg(F.expr(_fit_sql(bexpr, num_ranges)).alias("b")).collect()[0]["b"]
    pid = _pid_sql(bexpr, row)
    return df.withColumn("_pid", F.expr(f"({pid})").cast("int"))


def with_global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "grank",
    num_ranges: int | None = None,
    bucket_expr: str | None = None,
    persist: bool = False,
    count_col: str | None = None,
) -> DataFrame:
    """Add a 1-based exact global rank over ``order_cols`` using the
    frozen-boundary bucket scheme above. Costs one boundary fit, one
    #buckets-row counts job, and one hash exchange with machine-local
    sorts — never a single-partition stage, and every job sees the
    same deterministic bucket assignment.

    ``count_col`` additionally attaches the EXACT total row count as a
    frozen literal column — the counts job already computes it, so
    callers that need n alongside the rank (percentile interpolation)
    get it for free instead of paying one more evaluation of the input
    lineage for a count aggregate (plus a crossJoin) themselves. Frozen
    at plan-build like the boundaries: correct for the same reason —
    the input is deterministic, so every recompute counts the same rows.

    ``persist=True`` cuts the input-lineage evaluations from 3 to 2
    when ``df`` is expensive (e.g. a per-user fold over the whole
    corpus): the input is cached MEMORY_AND_DISK so the boundary fit
    FILLS the cache and the counts job READS it, then unpersisted
    before returning so the caller's action recomputes the lineage
    exactly once more and nothing lingers in executor memory. Safe by
    construction: the frozen-literal boundaries make any recompute
    (cache eviction, the post-unpersist final pass) assign identical
    buckets, which is the whole reason re-sampling schemes were
    designed out."""
    src = df.persist(StorageLevel.MEMORY_AND_DISK) if persist else df
    parts = _bucketed(src, order_cols, bucket_expr, num_ranges)
    counts = sorted(
        (r["_pid"], r["c"])
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    if persist:
        src.unpersist(False)
    offsets, acc = [], 0
    for pid, c in counts:
        offsets.append((pid, acc))
        acc += c
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(rank_col, F.row_number().over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )
    if count_col is not None:
        out = out.withColumn(count_col, F.lit(acc).cast("long"))
    return out


def with_global_ranks(
    df: DataFrame,
    specs: list[tuple[list[str], str]],
    num_ranges: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """SEVERAL exact global ranks over one frame in TWO bounded driver
    jobs total (round 13): ``specs`` is ``[(order_cols, rank_col)]``
    with the same per-spec semantics as :func:`with_global_rank` (the
    leading order column names the bucket expression and must be a
    named numeric column; trailing columns break ties).

    The chained form — ``with_global_rank`` once per metric — pays one
    boundary-fit job and one counts job PER metric (6 jobs for an RFM
    grid) even though every pass scans the same cached frame and
    returns a #buckets-sized result. Here the fits collapse into ONE
    aggregate (one ``approx_percentile`` expression per spec) and the
    counts into ONE shuffle (explode the per-spec bucket ids into
    (spec, pid) pairs, count — ≤ specs × buckets rows to the driver),
    and the final plan applies every spec's broadcast-offset join +
    bucket-local window in one action. Per-spec bucket assignment,
    offsets, and ranks are bit-identical to the chained form (same
    frozen-literal boundaries, same window) — equality-tested. The
    100 TB shape is unchanged: one hash exchange + machine-local sort
    per rank (windows with different keys can never share an
    exchange); what's amortized is the fit/counts job latency.

    ``count_col`` attaches the exact total row count as a literal
    column, as in :func:`with_global_rank`."""
    if num_ranges is None:
        num_ranges = df.sparkSession.sparkContext.defaultParallelism
    for order_cols, _rc in specs:
        if not isinstance(order_cols[0], str):
            raise TypeError(
                "with_global_ranks requires named leading order columns "
                "(the multi-fit aggregate interpolates them into SQL)"
            )
    fit = df.agg(
        *[
            F.expr(_fit_sql(oc[0], num_ranges)).alias(f"_b{i}")
            for i, (oc, _rc) in enumerate(specs)
        ]
    ).collect()[0]
    parts = df
    for i, (oc, _rc) in enumerate(specs):
        pid = _pid_sql(oc[0], fit[f"_b{i}"])
        parts = parts.withColumn(f"_pid{i}", F.expr(f"({pid})").cast("int"))
    pairs = parts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("m"), F.col(f"_pid{i}").alias("p")
                    )
                    for i in range(len(specs))
                ]
            )
        ).alias("mp")
    )
    counts = (
        pairs.groupBy("mp.m", "mp.p").agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    total = 0
    by_spec: dict[int, list[tuple[int, int]]] = {i: [] for i in range(len(specs))}
    for r in counts:
        by_spec[int(r["m"])].append((int(r["p"]), int(r["c"])))
    out = parts
    for i, (oc, rank_col) in enumerate(specs):
        offsets, acc = [], 0
        for pid, c in sorted(by_spec[i]):
            offsets.append((pid, acc))
            acc += c
        total = acc  # same frame: every spec counts the same rows
        off_df = df.sparkSession.createDataFrame(
            offsets, f"_pid{i} INT, _off{i} BIGINT"
        )
        w = Window.partitionBy(f"_pid{i}").orderBy(*oc)
        out = (
            out.join(F.broadcast(off_df), f"_pid{i}")
            .withColumn(rank_col, F.row_number().over(w) + F.col(f"_off{i}"))
            .drop(f"_pid{i}", f"_off{i}")
        )
    if count_col is not None:
        out = out.withColumn(count_col, F.lit(total).cast("long"))
    return out


def with_global_cumsum(
    df: DataFrame,
    order_cols: list[Column | str],
    value_col: str,
    cum_col: str = "gcum",
    num_ranges: int | None = None,
    bucket_expr: str | None = None,
    persist: bool = False,
) -> DataFrame:
    """Exact global running sum of ``value_col`` in ``order_cols``
    order, same scheme as :func:`with_global_rank` with per-bucket SUM
    offsets instead of counts. Bit-identical to
    ``sum().over(Window.orderBy(...))`` (integer addition is
    associative) with no single-partition stage. ``persist=True`` has
    the same fill-read-unpersist contract as :func:`with_global_rank`
    (3 input evaluations → 2)."""
    src = df.persist(StorageLevel.MEMORY_AND_DISK) if persist else df
    parts = _bucketed(src, order_cols, bucket_expr, num_ranges)
    sums = sorted(
        (r["_pid"], r["s"])
        for r in parts.groupBy("_pid")
        .agg(F.sum(value_col).cast("long").alias("s"))
        .collect()
    )
    if persist:
        src.unpersist(False)
    offsets, acc = [], 0
    for pid, s in sums:
        offsets.append((pid, acc))
        acc += int(s)
    off_df = df.sparkSession.createDataFrame(offsets, "_pid INT, _off BIGINT")
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(off_df), "_pid")
        .withColumn(cum_col, F.sum(value_col).over(w) + F.col("_off"))
        .drop("_pid", "_off")
    )


def _local_topn_prune(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[tuple[str, bool]],
    n: int,
) -> DataFrame:
    """Partition-local candidate cut for an exact per-group top-N: keep
    at most ``n`` rows per group per Arrow batch (a batch is a subset of
    one partition, so batch-local top-n ⊇ partition-local top-n ⊇ the
    global top-n — EXACT, only possibly less tight). Runs as a NARROW
    ``mapInPandas`` (one vectorized sort per batch, no exchange): the
    full input crosses Arrow once instead of crossing the per-group
    window's hash exchange once — the trade that matters when the input
    is entity-scale and the survivors are (partitions × groups × n).

    ``order_by`` is ``[(column_name, ascending)]``. Rows with a NULL in
    any order column are NEVER pruned (ADVICE r12 #4): Spark's window
    places nulls first ascending / last descending while pandas puts
    NaN last regardless of direction, so a sort-based cut could drop a
    row the window would rank inside the top-n. Passing every
    null-order row through keeps the cut a SUPERSET of the window's
    top-n (exactness preserved); the bound degrades only by the null
    rows, which the final window then ranks with Spark's own
    semantics."""
    names = [c for c, _a in order_by]
    ascs = [a for _c, a in order_by]

    def prune(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            null_order = pdf[names].isna().any(axis=1)
            kept = (
                pdf[~null_order]
                .sort_values(by=names, ascending=ascs, kind="mergesort")
                # dropna=False: pandas' default silently DROPS rows whose
                # group key is null, but Spark's window ranks the null
                # partition — the prune must keep exactly what the
                # window would see (round-12 review finding #2)
                .groupby(list(group_cols), sort=False, dropna=False)
                .head(n)
            )
            if null_order.any():
                import pandas as pd

                kept = pd.concat([kept, pdf[null_order]])
            yield kept

    return df.mapInPandas(prune, schema=df.schema)


#: below this many input rows the Arrow prune costs more than the
#: shuffle it saves (measured: ~0.13 s of batch transfer at sf0.1's
#: ~40k-cell store vs a 40k-row exchange the window pays anyway —
#: SCALE_NOTES §r12-topn-prune); the crossover is entity-scale stores
#: where the exchange dominates. Callers with a cheap row estimate
#: (parquet footer counts) pass it via ``input_rows``.
GROUPED_TOPN_PRUNE_MIN_ROWS = 2_000_000


def grouped_topn(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[tuple[str, bool]],
    n: int,
    rank_col: str = "rk",
    prune: bool = True,
    input_rows: int | None = None,
) -> DataFrame:
    """EXACT top-``n`` rows per group, scale-bounded (VERDICT r11 #2).

    A bare ``row_number().over(partitionBy(group).orderBy(...))`` +
    ``filter(rk <= n)`` shuffles EVERY input row into the per-group
    window — for a serving tile ranking a (day × entity) cell store
    that is an entity-scale exchange per dashboard refresh. Spark has
    no bounded-heap aggregate (``collect_list`` partials carry every
    row through the shuffle), so the scale lever is a candidate cut
    BEFORE the window: :func:`_local_topn_prune` keeps each Arrow
    batch's top-n per group with zero shuffle, and only the survivors
    (≤ batches × groups-present × n rows) enter the exchange + window.
    Exactness: each group's measure is already complete per input row
    (the serve merges cells before ranking), so any row outside its
    batch's top-n is outside the global top-n a fortiori.

    ``input_rows`` (VERDICT r12 #3) adaptively disables the prune when
    a caller-supplied row estimate says the input is small — below
    :data:`GROUPED_TOPN_PRUNE_MIN_ROWS` the Arrow transfer of the whole
    input costs more than the exchange it avoids, so the plan goes
    straight to the window. The estimate only gates a performance
    trade; the result is exact either way (and a LOW estimate of a big
    input merely keeps the prune off — the window stays exact). Rows
    with NULLs in order columns are never pruned (see
    :func:`_local_topn_prune`): the window ranks them with Spark's own
    null ordering, so nullable order columns are safe, just less
    tightly bounded.

    ``order_by`` is ``[(column_name, ascending)]`` over existing
    columns; ties must be broken by the trailing columns (the usual
    deterministic-rank discipline). Reference basis: Druid's topN query
    (the per-segment top-K ∪ merge plan) — here the exact variant,
    since the cell store holds full per-key counts anyway."""
    order_exprs = [
        (F.col(c).asc() if asc else F.col(c).desc()) for c, asc in order_by
    ]
    if prune and input_rows is not None:
        prune = int(input_rows) >= GROUPED_TOPN_PRUNE_MIN_ROWS
    cand = _local_topn_prune(df, group_cols, order_by, n) if prune else df
    w = Window.partitionBy(*group_cols).orderBy(*order_exprs)
    return cand.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )
