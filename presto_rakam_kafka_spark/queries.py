"""Query inventory: every operator from SURVEY.md §2 as a named query
with a DuckDB oracle.

Registry contract (mirrors the driver's):

* ``QUERIES[name]`` — ``(spark, sf_dir) -> DataFrame``
* ``ORACLES[name]`` — equivalent ANSI SQL for DuckDB over views
  ``region nation customer supplier part orders lineitem events
  documents embeddings`` (absent for non-SQL-expressible ops → the
  driver records a rows-only check).

Conventions keeping the value-hash comparison stable:

* every computed/aggregate column is aliased identically on both sides;
* double aggregates are ``round(x, 2)`` on both sides (sum-order
  nondeterminism under AQE/shuffle must not leak into the hash);
* timestamps in output are formatted to strings on both sides;
* every top-k has a deterministic total order (explicit tie-break key).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.fixtures import load_catalog, read_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# =====================================================================
# Tier A — connector semantics (scan, hidden columns, offset pushdown)
# =====================================================================


@query(
    "flagship_offset_agg",
    oracle="""
    SELECT event_type, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM events WHERE event_id BETWEEN 100 AND 499
    GROUP BY event_type
    """,
)
def flagship_offset_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7 minimum slice: catalog → source → hidden ``_offset`` →
    pushdown → agg. Spark analog of ``TestMinimalFunctionality.java:103``."""
    from presto_rakam_kafka_spark.plans.offset_pushdown import extract_offset_ranges

    catalog = load_catalog(spark, sf_dir)
    ranges, residual = extract_offset_ranges([("between", (100, 499))])
    assert not residual
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges)
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "avro_decode_roundtrip",
    oracle="""
    SELECT event_type,
           CASE WHEN value > 10 THEN 'HIGH' ELSE 'LOW' END AS priority,
           count(*) AS n, CAST(sum(user_id) AS BIGINT) AS sum_users,
           round(sum(value), 2) AS sum_value
    FROM events WHERE event_id < 2000
    GROUP BY event_type, CASE WHEN value > 10 THEN 'HIGH' ELSE 'LOW' END
    """,
)
def avro_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro decode end-to-end (A6) under the oracle gate: events rows
    are encoded to Avro **binary** with a v1 writer schema (old field
    names, int ids, enum priority, a legacy field), shipped as a
    synthetic Kafka raw frame, and decoded through
    ``KafkaEventSource._decode`` with the EVOLVED reader schema —
    exercising alias rename, int→long promotion, enum-as-string,
    reader-only default, and writer-only skip, the reference's
    ResolvingDecoder semantics (``PageDatumReader.java:68-93,137-138``).
    The aggregate of the decoded frame must equal plain SQL over the
    original parquet — the decode is provably lossless."""
    import pandas as pd

    from presto_rakam_kafka_spark.metastore import SchemaField
    from presto_rakam_kafka_spark.sources import avro_codec
    from presto_rakam_kafka_spark.sources.kafka import KafkaEventSource
    from presto_rakam_kafka_spark.types import FieldType
    from pyspark.sql import types as T

    writer_schema = (
        '{"type": "record", "name": "event_v1", "fields": ['
        '{"name": "uid", "type": "int"},'
        '{"name": "etype", "type": ["null", "string"]},'
        '{"name": "value", "type": ["null", "double"]},'
        '{"name": "priority", "type": {"type": "enum", "name": "prio",'
        ' "symbols": ["LOW", "HIGH"]}},'
        '{"name": "legacy", "type": "string"}]}'
    )
    reader_fields = [
        SchemaField("user_id", FieldType.LONG, aliases=("uid",)),
        SchemaField("event_type", FieldType.STRING, aliases=("etype",)),
        SchemaField("value", FieldType.DOUBLE),
        SchemaField("priority", FieldType.STRING, enum_symbols=("LOW", "HIGH")),
        SchemaField("missing_col", FieldType.DOUBLE),  # reader-only → default
    ]

    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "event_type", "value")
    )

    raw_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def encode_batches(batches):
        writer = avro_codec.parse_schema(writer_schema)
        for pdf in batches:
            payloads = []
            for _, row in pdf.iterrows():
                val = None if pd.isna(row["value"]) else float(row["value"])
                out = bytearray()
                avro_codec._encode_value(
                    {
                        "uid": int(row["user_id"]),
                        "etype": row["event_type"],
                        "value": val,
                        "priority": "HIGH" if (val or 0.0) > 10 else "LOW",
                        "legacy": "dropped-by-reader",
                    },
                    writer,
                    out,
                )
                payloads.append(bytes(out))
            yield pd.DataFrame(
                {
                    "key": [None] * len(pdf),
                    "value": payloads,
                    "topic": "tpch_events",
                    "partition": 0,
                    "offset": pdf["event_id"],
                }
            )

    raw = events.mapInPandas(encode_batches, schema=raw_schema)
    src = KafkaEventSource(
        bootstrap_servers="none:9092",
        value_format="avro",
        avro_writer_schema=writer_schema,
    )
    decoded = src._decode(spark, raw, "tpch", "events", reader_fields)
    return decoded.groupBy("event_type", "priority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "avro_confluent_wire_roundtrip",
    oracle="""
    SELECT event_type, count(*) AS n,
           CAST(sum(user_id) AS BIGINT) AS sum_users,
           round(sum(value), 2) AS sum_value
    FROM events WHERE event_id < 3000
    GROUP BY event_type
    """,
)
def avro_confluent_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFLUENT WIRE FORMAT end-to-end (round 10, beyond-reference):
    one topic interleaves records serialized under TWO writer schema
    versions, each framed as 0x00 magic + 4-byte BE schema id + Avro
    datum (the public Confluent wire format), plus injected corrupt
    frames (unknown id, bad magic, truncated header). The decode
    resolves each record against its OWN id from a static registry
    snapshot, applies full reader resolution per version (v3: aliases
    + int->long promotion + writer-only skip; v9: name-matched long ids
    + a different writer-only field), and drops the corrupt frames
    under A14 — the aggregate must equal plain SQL over the source
    parquet, proving per-id dispatch loses and invents nothing. The
    reference decodes one table-configured writer schema
    (``KafkaConnectorPageSource.java:89``); interleaved registry
    versions are what a real Confluent estate ships."""
    import pandas as pd

    from presto_rakam_kafka_spark.metastore import SchemaField
    from presto_rakam_kafka_spark.sources import avro_codec
    from presto_rakam_kafka_spark.sources.kafka import KafkaEventSource
    from presto_rakam_kafka_spark.types import FieldType
    from pyspark.sql import types as T

    writer_v3 = (
        '{"type": "record", "name": "event_v3", "fields": ['
        '{"name": "uid", "type": "int"},'
        '{"name": "etype", "type": ["null", "string"]},'
        '{"name": "value", "type": ["null", "double"]},'
        '{"name": "legacy", "type": "string"}]}'
    )
    writer_v9 = (
        '{"type": "record", "name": "event_v9", "fields": ['
        '{"name": "user_id", "type": "long"},'
        '{"name": "event_type", "type": ["null", "string"]},'
        '{"name": "value", "type": ["null", "double"]},'
        '{"name": "channel", "type": "string"}]}'
    )
    reader_fields = [
        SchemaField("user_id", FieldType.LONG, aliases=("uid",)),
        SchemaField("event_type", FieldType.STRING, aliases=("etype",)),
        SchemaField("value", FieldType.DOUBLE),
        SchemaField("missing_col", FieldType.DOUBLE),  # reader-only default
    ]

    events = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .select("event_id", "user_id", "event_type", "value")
    )

    raw_schema = T.StructType(
        [
            T.StructField("key", T.BinaryType()),
            T.StructField("value", T.BinaryType()),
            T.StructField("topic", T.StringType()),
            T.StructField("partition", T.IntegerType()),
            T.StructField("offset", T.LongType()),
        ]
    )

    def encode_batches(batches):
        w3 = avro_codec.parse_schema(writer_v3)
        w9 = avro_codec.parse_schema(writer_v9)
        for pdf in batches:
            payloads, offsets = [], []
            for _, row in pdf.iterrows():
                eid = int(row["event_id"])
                val = None if pd.isna(row["value"]) else float(row["value"])
                out = bytearray()
                if eid % 2 == 0:
                    avro_codec._encode_value(
                        {"uid": int(row["user_id"]), "etype": row["event_type"],
                         "value": val, "legacy": "dropped-by-reader"},
                        w3, out,
                    )
                    frame = avro_codec.wrap_confluent(3, bytes(out))
                else:
                    avro_codec._encode_value(
                        {"user_id": int(row["user_id"]),
                         "event_type": row["event_type"], "value": val,
                         "channel": "web"},
                        w9, out,
                    )
                    frame = avro_codec.wrap_confluent(9, bytes(out))
                payloads.append(frame)
                offsets.append(eid)
                if eid % 500 == 0:
                    # corrupt neighbors: unknown registry id, bad magic,
                    # truncated header -- all must DROP, not fail or skew
                    payloads.append(avro_codec.wrap_confluent(99, bytes(out)))
                    offsets.append(1_000_000 + eid)
                    payloads.append(b"\x17" + frame[1:])
                    offsets.append(2_000_000 + eid)
                    payloads.append(b"\x00\x00")
                    offsets.append(3_000_000 + eid)
            yield pd.DataFrame(
                {
                    "key": [None] * len(payloads),
                    "value": payloads,
                    "topic": "tpch_events",
                    "partition": 0,
                    "offset": offsets,
                }
            )

    raw = events.mapInPandas(encode_batches, schema=raw_schema)
    src = KafkaEventSource(
        bootstrap_servers="none:9092",
        value_format="avro",
        wire_format="confluent",
        schema_registry={3: writer_v3, 9: writer_v9},
    )
    decoded = src._decode(spark, raw, "tpch", "events", reader_fields)
    return decoded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_id").alias("sum_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "count_star",
    oracle="SELECT count(*) AS n FROM lineitem",
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count invariant (reference: count after N produced messages,
    ``TestMinimalFunctionality.java:111-120``)."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n"))


@query(
    "count_empty",
    oracle="SELECT count(*) AS n FROM events WHERE event_id < 0",
)
def count_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count over an empty scan = 0 (reference invariant on the
    empty topic, ``TestMinimalFunctionality.java:100-109``)."""
    catalog = load_catalog(spark, sf_dir)
    from presto_rakam_kafka_spark.plans.offset_pushdown import extract_offset_ranges

    ranges, _ = extract_offset_ranges([("<", 0)])
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges or None)
    if not ranges:  # fully pruned: empty relation, still answer 0
        df = df.filter(F.lit(False))
    return df.agg(F.count(F.lit(1)).alias("n"))


@query(
    "count_many_splits",
    oracle="SELECT count(*) AS n, count(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def count_many_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact count across many partitions — no double-count, no gap
    (reference: 100k messages over thousands of segment splits,
    ``TestManySegments.java:98-109``). Repartitioning to many small
    partitions before the count simulates the many-splits shape."""
    df = _t(spark, sf_dir, "lineitem").repartition(64)
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@query(
    "hidden_columns",
    oracle="""
    SELECT 'tpch' AS project, 'events' AS collection,
           count(*) AS n, min(event_id) AS min_offset, max(event_id) AS max_offset
    FROM events
    """,
)
def hidden_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden-column synthesis (A7): project/collection constants +
    ``_offset`` (``KafkaMetadata.java:165-167``,
    ``KafkaConnectorPageSource.java:311-345``)."""
    catalog = load_catalog(spark, sf_dir)
    df = catalog.table("tpch", "events", include_hidden=True)
    return df.groupBy("project", "collection").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("_offset").alias("min_offset"),
        F.max("_offset").alias("max_offset"),
    )


@query(
    "offset_range_scan",
    oracle="""
    SELECT event_id AS _offset, event_type, round(value, 2) AS value_r
    FROM events
    WHERE (event_id >= 10 AND event_id < 50) OR (event_id >= 900 AND event_id <= 940)
    """,
)
def offset_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-range offset pushdown incl. bound-openness semantics
    (``KafkaSplitManager.java:153-178``)."""
    from presto_rakam_kafka_spark.plans.offset_pushdown import OffsetRange

    catalog = load_catalog(spark, sf_dir)
    ranges = [OffsetRange(10, 50), OffsetRange(900, 941)]
    df = catalog.table("tpch", "events", include_hidden=True, offset_ranges=ranges)
    return df.select(
        "_offset", "event_type", F.round("value", 2).alias("value_r")
    )


@query(
    "select_star_hides_system_columns",
    oracle="SELECT * FROM events WHERE event_id < 5",
)
def select_star_hides_system_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hidden means not-in-``SELECT *`` (Presto hidden flag; SURVEY §1.4):
    the default table() projection returns exactly the user schema."""
    catalog = load_catalog(spark, sf_dir)
    return catalog.table("tpch", "events").filter(F.col("event_id") < 5)


# =====================================================================
# Tier B — relational surface (host-engine ops, via Catalyst; SURVEY §2.B)
# =====================================================================


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 2) AS avg_qty,
           round(avg(l_extendedprice), 2) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the partial+final distributed agg the reference
    delegated to Presto (SURVEY §2.B 'Aggregation')."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-12-01"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "sum_disc_price"
        ),
        F.round(
            F.sum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ),
            2,
        ).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: multi-join + agg + deterministic top-k
    (TakeOrderedAndProject in the Spark plan)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01"))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join; small dims (region/nation/supplier)
    broadcast, fact-fact join shuffles on the key — the plan shape that
    survives 100× scale-up."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = F.broadcast(_t(spark, sf_dir, "supplier"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    region = F.broadcast(_t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (Presto: IN/EXISTS → semi join; SURVEY §2.B)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT IN/NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT p_brand, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast (replicated) join: the dim side ships to every task, no
    shuffle of the fact table — Presto's 'replicated' strategy
    (SURVEY §2.B 'Joins')."""
    li = _t(spark, sf_dir, "lineitem")
    part = F.broadcast(_t(spark, sf_dir, "part"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


@query(
    "join_outer_full",
    oracle="""
    SELECT n_name, s_name
    FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey
    """,
)
def join_outer_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null-extension on both sides."""
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    return nation.join(supp, nation.n_nationkey == supp.s_nationkey, "full_outer").select(
        "n_name", "s_name"
    )


@query(
    "join_cross_theta",
    oracle="""
    SELECT r.r_name AS region_a, s.r_name AS region_b
    FROM region r CROSS JOIN region s
    WHERE r.r_regionkey < s.r_regionkey
    """,
)
def join_cross_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + theta filter (Presto theta-join equivalent)."""
    a = _t(spark, sf_dir, "region").alias("a")
    b = _t(spark, sf_dir, "region").alias("b")
    return (
        a.crossJoin(b)
        .filter(F.col("a.r_regionkey") < F.col("b.r_regionkey"))
        .select(F.col("a.r_name").alias("region_a"), F.col("b.r_name").alias("region_b"))
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one agg (expand + partial agg plan)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "approx_count_distinct_ok",
    oracle="SELECT TRUE AS within_5pct",
)
def approx_count_distinct_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_distinct (HLL) — Presto's approx agg (SURVEY §2.B).

    Sketches differ across engines, so the oracle checks the *contract*:
    the approximation lands within the documented 5% error of the exact
    count computed in the same query."""
    df = _t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    )
    return df.select(
        (
            (F.abs(F.col("approx") - F.col("exact")) / F.col("exact")) <= F.lit(0.05)
        ).alias("within_5pct")
    )


@query(
    "approx_percentile_ok",
    oracle="SELECT TRUE AS within_band",
)
def approx_percentile_ok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (q-digest in Presto, KLL-ish in Spark): the
    median estimate must land between the exact p45 and p55."""
    df = _t(spark, sf_dir, "lineitem").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median"),
        F.expr("percentile(l_extendedprice, 0.45)").alias("p45"),
        F.expr("percentile(l_extendedprice, 0.55)").alias("p55"),
    )
    return df.select(
        (
            (F.col("approx_median") >= F.col("p45"))
            & (F.col("approx_median") <= F.col("p55"))
        ).alias("within_band")
    )


@query(
    "rollup_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — beyond Presto 0.123 (arrived ~0.128), free in Spark
    (SURVEY §2.B 'Grouping sets')."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, rk FROM (
      SELECT o_custkey, o_orderkey,
             rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window functions over a deterministic total order."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", F.rank().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice) OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: lag/lead/first_value."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    df = _t(spark, sf_dir, "orders")
    return df.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
    )


@query(
    "window_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS moving_sum3
    FROM orders
    """,
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS frames: running total + moving sum.

    A moving *average* over 2-decimal data lands on exact .xx5 halves
    (sum/2), where Spark and DuckDB round to different sides — a sum is
    order-deterministic in a window frame, so both engines agree.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    df = _t(spark, sf_dir, "orders")
    return df.select(
        "o_custkey",
        "o_orderkey",
        F.round(
            F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
            2,
        ).alias("running_total"),
        F.round(F.sum("o_totalprice").over(w.rowsBetween(-2, W.currentRow)), 2).alias(
            "moving_sum3"
        ),
    )


@query(
    "topk_parts",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
    FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 10
    """,
)
def topk_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (Presto TopN analog);
    tie-break on the key keeps the boundary deterministic."""
    return (
        _t(spark, sf_dir, "part")
        .orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
        .select("p_partkey", "p_name", F.round("p_retailprice", 2).alias("price"))
        .limit(10)
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.unionByName(b)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — not yet in Presto 0.123; free in Spark (SURVEY §2.B)."""
    a = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return a.intersect(b)


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    b = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    # subtract == EXCEPT DISTINCT (set minus); exceptAll subtracts
    # multiplicities, which keeps values that merely occur more often in a.
    return a.subtract(b)


@query(
    "string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS name_upper,
           length(p_name) AS name_len,
           substr(p_name, 1, 5) AS name_pre,
           concat(p_brand, ':', p_type) AS brand_type,
           replace(p_name, ' ', '-') AS name_dashed,
           split_part(p_name, ' ', 1) AS first_word,
           regexp_extract(p_name, '([a-z]+)', 1) AS first_alpha,
           trim(concat('  ', p_name, ' ')) AS name_trim,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string functions (Presto 0.123 string surface, SURVEY §2.B)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pre"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")).alias("name_dashed"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_alpha"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS order_month,
           CAST(EXTRACT(DAY FROM o_orderdate) AS BIGINT) AS order_day,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '2002-01-01') AS BIGINT) AS days_to_2002,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar date/time functions (Presto's Joda-based surface → Spark)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "month_start"
        ),
        F.datediff(F.lit("2002-01-01"), F.col("o_orderdate")).cast("long").alias(
            "days_to_2002"
        ),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 6) AS abs_disc,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           round(sqrt(l_extendedprice), 6) AS price_sqrt,
           round(ln(l_extendedprice), 6) AS price_ln,
           round(exp(l_discount), 6) AS disc_exp,
           round(power(l_quantity, 2), 6) AS qty_sq,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 6).alias("abs_disc"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.pow("l_quantity", 2), 6).alias("qty_sq"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod"),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
           CAST(json_valid(props) AS BOOLEAN) AS is_valid
    FROM events WHERE event_id < 500
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON functions over the events.props payload (Presto
    json_extract_scalar analog; SURVEY §2.B 'JSON functions')."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.get_json_object("props", "$").isNotNull().alias("is_valid"),
    )


@query(
    "case_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid'
                ELSE 'small' END AS price_band,
           coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_alias,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def case_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_alias"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT count(*) AS n_above_avg
    FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery through the Spark SQL surface."""
    from presto_rakam_kafka_spark.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT count(*) AS n_above_avg
        FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — decorrelated by Catalyst into a semi join
    (beyond Presto 0.123's limited decorrelation; SURVEY §2.B)."""
    from presto_rakam_kafka_spark.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


# =====================================================================
# LLM-data-pipeline operators (SURVEY §7 step 6; north-star extension)
# =====================================================================


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "documents")


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "embeddings")


def _register_llm_queries() -> None:
    """Register dedup / similarity / text / multimodal operators.

    Oracles are generated from the same constants as the Spark plans
    (see functions.hashing), so both sides express one algorithm.
    """
    from presto_rakam_kafka_spark.operators import (
        clusters,
        dedup,
        multimodal,
        similarity,
        text,
    )

    EMB_DIM = 64

    @query(
        "dedup_exact",
        oracle="SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)",
    )
    def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact dedup on content digest; survivors = min doc_id per
        digest (one shuffle on md5, no skew)."""
        return dedup.exact_dedup(_documents(spark, sf_dir), "text", "doc_id").select(
            "doc_id"
        )

    @query(
        "dedup_ngram_jaccard",
        oracle=dedup.ngram_jaccard_pairs_oracle(
            "documents", "text", "doc_id", n=3, threshold=0.5
        ),
    )
    def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Brute-force exact 3-gram Jaccard near-dup pairs (the
        oracle-grade reference for the LSH path)."""
        return dedup.ngram_jaccard_pairs(
            _documents(spark, sf_dir), "text", "doc_id", n=3, threshold=0.5
        )

    @query(
        "dedup_cluster_canonical",
        oracle=clusters.keep_canonical_oracle(
            "documents", "text", "doc_id", "d.n_chars", n=3, threshold=0.8
        ),
    )
    def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
        """The dedup DECISION step: LSH near-dup pairs → transitive
        closure (min-label propagation, `operators/clusters.py`) → one
        kept doc per cluster (max n_chars, ties to lower id). Oracle
        replays the closure with a recursive CTE over the exact pair
        set — the full pipeline is hash-checked end-to-end."""
        docs = _documents(spark, sf_dir)
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, threshold=0.8
        ).select("doc_a", "doc_b")
        return clusters.keep_canonical(docs, pairs, "doc_id", "n_chars")

    @query(
        "dedup_cluster_canonical_star",
        oracle=clusters.keep_canonical_oracle(
            "documents", "text", "doc_id", "d.n_chars", n=3, threshold=0.8
        ),
    )
    def dedup_cluster_canonical_star(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Same decision step as ``dedup_cluster_canonical`` but with
        the transitive closure computed by the alternating
        large-star/small-star algorithm (O(log²) rounds independent of
        cluster diameter — the hostile-graph scale path, SCALE_NOTES
        §components). Identical oracle: both closures must produce the
        same partition."""
        docs = _documents(spark, sf_dir)
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, threshold=0.8
        ).select("doc_a", "doc_b")
        comp = clusters.connected_components_star(pairs)
        member = comp.join(
            docs.select(F.col("doc_id").alias("node"), F.col("n_chars").alias("q")),
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

    @query(
        "dedup_minhash_lsh",
        oracle=dedup.ngram_jaccard_pairs_oracle(
            "documents", "text", "doc_id", n=3, threshold=0.8
        ),
    )
    def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        """MinHash+LSH banding (b=16, threshold-derived r=4 ⇒ 64
        hashes) with exact-Jaccard verify — the O(n·bands) scale path;
        its oracle is the brute-force exact pair set (per-pair miss
        ≤ ~4e-4 at t=0.8: banding 2.2e-4 + signature prefilter 2e-4;
        empirically identical on the deterministic fixtures). Exact
        pre-collapse + signature prefilter guard the hot-bucket
        regime (see operators/dedup.py)."""
        return dedup.minhash_lsh_pairs(
            _documents(spark, sf_dir), "text", "doc_id", n=3, threshold=0.8
        )

    @query(
        "dedup_simhash",
        oracle=dedup.simhash_pairs_oracle("documents", "text", "doc_id", max_hamming=3),
    )
    def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SimHash-60 near-dup pairs at Hamming ≤ 3 via pigeonhole
        banding (4 chunks — exact, no cross join)."""
        return dedup.simhash_pairs(
            _documents(spark, sf_dir), "text", "doc_id", max_hamming=3
        )

    @query(
        "dedup_embedding_cosine",
        oracle=dedup.embedding_dup_pairs_oracle(
            "embeddings", "embedding", "vec_id", dim=EMB_DIM, threshold=0.45
        ),
    )
    def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact embedding near-dup pairs (cosine ≥ 0.45, left-fold
        double math identical in both engines)."""
        return dedup.embedding_dup_pairs(
            _embeddings(spark, sf_dir), "embedding", "vec_id", threshold=0.45
        )

    @query(
        "dedup_semantic",
        oracle=dedup.semdedup_oracle(
            "embeddings", "embedding", "vec_id", dim=EMB_DIM, threshold=0.35
        ),
    )
    def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
        """SemDeDup: coarse-quantizer clustering, then near-dup prune
        WITHIN each cluster only — the scale path that collapses the
        O(n²) pair space of `dedup_embedding_cosine` to Σ|cluster|²
        via a cluster-keyed shuffle join. Keeps the lowest-id member
        of every near-dup group; returns (vec_id, cluster_id)."""
        return dedup.semdedup(
            _embeddings(spark, sf_dir), "embedding", "vec_id",
            dim=EMB_DIM, threshold=0.35,
        )

    @query(
        "sim_topk_bruteforce",
        oracle=similarity.cosine_topk_oracle(
            "embeddings", "vec_id % 100 = 0", "embedding", "vec_id", dim=EMB_DIM, k=5
        ),
    )
    def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Exact cosine top-5 per query vector: broadcast the query set,
        scan the corpus once, window-rank with deterministic ties."""
        emb = _embeddings(spark, sf_dir)
        return similarity.cosine_topk(
            emb, emb.filter("vec_id % 100 = 0"), "embedding", "vec_id", k=5
        )

    @query(
        "sim_topk_lsh",
        oracle=similarity.lsh_bucket_topk_oracle(
            "embeddings", "vec_id % 100 = 0", "embedding", "vec_id", dim=EMB_DIM, k=5
        ),
    )
    def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Random-hyperplane LSH bucketed top-5 (the ANN scale path:
        candidates shrink by 2^planes; seeded planes keep it
        deterministic and oracle-checkable)."""
        emb = _embeddings(spark, sf_dir)
        return similarity.lsh_bucket_topk(
            emb, emb.filter("vec_id % 100 = 0"), "embedding", "vec_id", dim=EMB_DIM, k=5
        )

    @query(
        "sim_topk_lsh_multi",
        oracle=similarity.lsh_multitable_topk_oracle(
            "embeddings", "vec_id % 100 = 0", "embedding", "vec_id",
            dim=EMB_DIM, k=5, num_tables=8,
        ),
    )
    def sim_topk_lsh_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
        """8-table hyperplane LSH top-5 — the recall lever over the
        single-table path (measured recall@10 0.15 → ~0.7 on the
        unstructured fixture embeddings, SCALE_NOTES r3 ANN receipt)
        at ~L·n/2^p candidates per query."""
        emb = _embeddings(spark, sf_dir)
        return similarity.lsh_multitable_topk(
            emb, emb.filter("vec_id % 100 = 0"), "embedding", "vec_id",
            dim=EMB_DIM, k=5, num_tables=8,
        )

    @query("text_stats", oracle=text.text_stats_oracle("documents", "text", "doc_id"))
    def text_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Token counting + quality scoring, single scan, no shuffle."""
        return text.text_stats(_documents(spark, sf_dir), "text", "doc_id")

    @query(
        "quality_lm_bigram",
        oracle=text.lm_bigram_scores_oracle("documents", "text", "doc_id"),
    )
    def quality_lm_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Bigram-LM perplexity scoring (the CCNet/KenLM-style quality
        filter): add-one-smoothed LM fit on the deterministic 10%
        slice, every doc scored by mean bigram -ln P — vocabulary-sized
        broadcast tables, one corpus explode, one doc-id re-group."""
        return text.lm_bigram_scores(_documents(spark, sf_dir), "text", "doc_id")

    @query("text_lang_id", oracle=text.lang_id_oracle("documents", "text", "doc_id"))
    def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Marker-token language-ID heuristic."""
        return text.lang_id(_documents(spark, sf_dir), "text", "doc_id")

    @query(
        "text_fingerprint",
        oracle=text.fingerprints_oracle("documents", "text", "doc_id", n=3),
    )
    def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Content md5 + min-shingle-hash document fingerprints."""
        return text.fingerprints(_documents(spark, sf_dir), "text", "doc_id", n=3)

    @query(
        "multimodal_features",
        oracle=multimodal.extract_features_oracle("documents", "text", "doc_id"),
    )
    def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Binary payload + typed metadata through the Arrow-batched
        mapInPandas extractor (codec stubbed; plumbing real)."""
        assets = multimodal.attach_payload(_documents(spark, sf_dir), "text", "doc_id")
        return multimodal.extract_features(assets)

    @query(
        "multimodal_png_decode",
        oracle="""
        SELECT doc_id,
               CAST(doc_id % 13 + 4 AS INTEGER) AS w,
               CAST(doc_id % 7 + 4 AS INTEGER) AS h,
               CAST((doc_id * 37) % 256 AS INTEGER) AS mean_red
        FROM documents
        """,
    )
    def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
        """REAL compressed-image decode, oracle-gated (round 13 —
        retires the 'compressed codecs stubbed' gap for PNG): each doc
        synthesizes a solid-gray PNG whose dims and gray level are
        arithmetic in doc_id, ENCODED with cycling scanline filters so
        the bytes genuinely round-trip zlib deflate→inflate plus all
        five PNG unfilter paths inside the executor mapInPandas; the
        emitted header dims and exact mean red channel must then equal
        the pure-arithmetic oracle — which is only possible if the
        compressed decode is bit-exact. The pixels never leave their
        partition; parallelism is per-asset."""
        import pandas as pd

        from presto_rakam_kafka_spark.operators.multimodal import (
            _png_decode,
            _png_encode,
        )

        docs = multimodal.ensure_min_parallelism(
            _documents(spark, sf_dir).select("doc_id")
        )

        def run(batches):
            import numpy as np

            for pdf in batches:
                out = {"doc_id": [], "w": [], "h": [], "mean_red": []}
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    w, h, g = d % 13 + 4, d % 7 + 4, (d * 37) % 256
                    payload = _png_encode(
                        w, h, bytes([g]) * (w * h * 3), filters="cycle"
                    )
                    dw, dh, rgb = _png_decode(payload)
                    red = np.frombuffer(rgb, dtype=np.uint8).reshape(
                        dh, dw, 3
                    )[:, :, 0]
                    out["doc_id"].append(d)
                    out["w"].append(dw)
                    out["h"].append(dh)
                    # integer sum // count: exact, no float rounding
                    out["mean_red"].append(int(red.sum()) // (dw * dh))
                o = pd.DataFrame(out)
                o["w"] = o["w"].astype("int32")
                o["h"] = o["h"].astype("int32")
                o["mean_red"] = o["mean_red"].astype("int32")
                yield o

        return docs.mapInPandas(
            run, schema="doc_id LONG, w INT, h INT, mean_red INT"
        )

    @query(
        "multimodal_gif_frames",
        oracle="""
        SELECT doc_id,
               unnest(range(0, doc_id % 9 + 1, 3))::BIGINT AS frame_idx,
               CAST(doc_id % 9 + 1 AS BIGINT) AS n_frames
        FROM documents
        """,
    )
    def multimodal_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
        """REAL animated-container frame sampling, oracle-gated (round
        13): each doc synthesizes an animated GIF with doc_id%9+1
        solid-color frames — genuinely LZW-compressed by the codec's
        own encoder — and `sample_frames` walks the CONTAINER for the
        frame count (`gif_frame_count`: block-skip, no pixel decode)
        before emitting every 3rd frame index. Hash-equality with the
        pure-arithmetic oracle is only possible if the container walk
        and the sub-block framing round-trip exactly. The fake-count
        lane for codec-less video mimes is unchanged and separately
        gated (`multimodal_frame_sample`)."""
        import pandas as pd

        from presto_rakam_kafka_spark.operators.multimodal import (
            _gif_encode,
            sample_frames,
        )

        docs = multimodal.ensure_min_parallelism(
            _documents(spark, sf_dir).select("doc_id")
        )

        def attach(batches):
            for pdf in batches:
                out = {"doc_id": [], "payload": [], "meta": []}
                for doc_id in pdf["doc_id"]:
                    d = int(doc_id)
                    n = d % 9 + 1
                    frames = [
                        bytes([(d + 37 * i) % 256]) * (6 * 4 * 3)
                        for i in range(n)
                    ]
                    gif = _gif_encode(6, 4, frames)
                    out["doc_id"].append(d)
                    out["payload"].append(gif)
                    out["meta"].append(
                        {"mime": "image/gif", "size_bytes": len(gif)}
                    )
                yield pd.DataFrame(out)

        assets = docs.mapInPandas(
            attach,
            schema="doc_id LONG, payload BINARY, "
                   "meta STRUCT<mime STRING, size_bytes LONG>",
        )
        return sample_frames(assets, every_n=3)


_register_llm_queries()


@query(
    "subquery_scalar_correlated",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    """,
)
def subquery_scalar_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each customer's max-price order) —
    Catalyst's RewriteCorrelatedScalarSubquery decorrelates it into an
    aggregate + join; Presto 0.123's decorrelation could not
    (SURVEY §2.B 'Subqueries')."""
    from presto_rakam_kafka_spark.fixtures import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders o
        WHERE o_totalprice = (SELECT max(o2.o_totalprice) FROM orders o2
                              WHERE o2.o_custkey = o.o_custkey)
        """
    )


# =====================================================================
# Temporal joins + array/map surface (SURVEY §2.B rows the host engine
# lacked or could only express as theta joins)
# =====================================================================


def _register_temporal_queries() -> None:
    from presto_rakam_kafka_spark.operators import temporal_joins as tj

    @query("join_asof", oracle=tj.asof_prior_purchase_oracle("events"))
    def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
        """As-of join (latest strictly-prior purchase value per user per
        event): union+window formulation, one shuffle, no join operator
        — vs Presto 0.123's only option, a theta cross join."""
        ev = _t(spark, sf_dir, "events")
        purch = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        res = tj.asof_join_prior(
            ev, purch, "user_id", "ts", "value", "last_purchase_value"
        )
        return res.select(
            "event_id",
            "user_id",
            "event_type",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round("last_purchase_value", 2).alias("last_purchase_value"),
        )

    @query(
        "join_interval",
        oracle=tj.interval_self_join_oracle("events", "user_id", "event_id", 30),
    )
    def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Interval (band) self-join — same-user event pairs within 30
        minutes — as a time-bucketed equi join with residual filter:
        hash join on (user, bucket), never a cross product."""
        return tj.interval_self_join(
            _t(spark, sf_dir, "events"), "user_id", "ts", "event_id", band_minutes=30
        )


_register_temporal_queries()


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2) AS total
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-extension feeding an agg (customers
    without orders count 0) — SURVEY §2.B 'Joins: equi'."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total"),
        )
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1000
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, vs the ROWS frames in window_frame):
    orders within $1000 below the current price — deterministic under
    ties because the frame is value-defined."""
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, W.currentRow)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.count(F.lit(1)).over(w).alias("n_within_1000")
    )


@query(
    "agg_salted_skew",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a deliberately hot key space
    (5 event types): identical results to the plain groupBy, but the
    hot key's rows spread over 16 reducers in phase 1 (SURVEY §7
    skew discipline; operators.skew)."""
    from presto_rakam_kafka_spark.operators.skew import salted_agg

    out = salted_agg(
        _t(spark, sf_dir, "events"),
        ["event_type"],
        {
            "n": ("count", "value"),
            "sum_value": ("sum", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        "n",
        F.round("sum_value", 2).alias("sum_value"),
        F.round("min_value", 2).alias("min_value"),
        F.round("max_value", 2).alias("max_value"),
    )


def _register_udf_queries() -> None:
    from presto_rakam_kafka_spark.functions import pandas_udfs as PU

    @query(
        "udf_pandas_scalar",
        oracle=PU.scalar_token_counts_oracle("documents", "text", "doc_id"),
    )
    def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Scalar pandas UDF (Arrow-batched element-wise)."""
        return PU.scalar_token_counts(_t(spark, sf_dir, "documents"), "text", "doc_id")

    @query(
        "udf_pandas_grouped_agg",
        oracle=PU.grouped_median_oracle("lineitem", "l_returnflag", "l_quantity"),
    )
    def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Grouped-agg pandas UDF (exact median per group)."""
        return PU.grouped_median(_t(spark, sf_dir, "lineitem"), "l_returnflag", "l_quantity")

    @query("udf_grouped_map", oracle=PU.grouped_rank_oracle("events"))
    def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Grouped-map applyInPandas (whole group in, frame out)."""
        return PU.grouped_rank(_t(spark, sf_dir, "events"))


_register_udf_queries()


@query(
    "array_hof_funcs",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           len(list_filter(arr, x -> x > 25))::BIGINT AS n_big,
           round(list_aggregate(arr, 'sum'), 2) AS total_qty,
           round(arr[1] * 2, 2) AS first_doubled,
           list_contains(arr, 1.0) AS has_single
    FROM g
    """,
)
def array_hof_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions (SURVEY §2.B 'Array / map
    functions' — unreachable over the reference's Kafka tables since
    its decoder rejected ARRAY; native here): collect to a sorted
    array, then filter/aggregate/transform lambdas."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list("l_quantity")).alias("arr")
    )
    return g.select(
        "l_orderkey",
        F.size(F.expr("filter(arr, x -> x > 25)")).cast("long").alias("n_big"),
        F.round(F.expr("aggregate(arr, 0D, (acc, x) -> acc + x)"), 2).alias("total_qty"),
        F.round(F.element_at("arr", 1) * 2, 2).alias("first_doubled"),
        F.array_contains("arr", 1.0).alias("has_single"),
    )


@query(
    "map_json_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(json_keys(props), ',') AS keys_csv,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events WHERE event_id < 1000
    """,
)
def map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map functions over JSON-decoded props (from_json → map<…>,
    map_keys, element_at) — SURVEY §2.B 'JSON functions' beyond
    get_json_object."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "k").alias("k_val"),
    )


# =====================================================================
# Structured Streaming surface (SURVEY §7 step 4; beyond-reference)
# =====================================================================


_STREAM_SEQ = iter(range(10**9))


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table replayed as a real micro-batched stream (4
    time-ordered chunks, one per trigger) — see streaming.runner."""
    from presto_rakam_kafka_spark.streaming import runner

    d = runner.stage_chunked_events(spark, sf_dir, "events", num_chunks=4)
    schema = read_table(spark, sf_dir, "events").schema
    return runner.read_file_stream(spark, d, schema)


def _docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table replayed as a micro-batched stream (4
    doc_id-ordered chunks) — the corpus-ingestion stream the
    continuous index-maintenance queries consume."""
    from presto_rakam_kafka_spark.streaming import runner

    d = runner.stage_chunked_events(
        spark, sf_dir, "documents", num_chunks=4, order_col="doc_id"
    )
    schema = read_table(spark, sf_dir, "documents").schema
    return runner.read_file_stream(spark, d, schema)


def _drain(df: DataFrame, base: str, mode: str) -> DataFrame:
    from presto_rakam_kafka_spark.streaming import runner

    return runner.run_available_now(df, f"{base}_{next(_STREAM_SEQ)}", mode)


def _register_streaming_queries() -> None:
    from presto_rakam_kafka_spark.streaming import dedup as sdedup
    from presto_rakam_kafka_spark.streaming import sessionize as ssz
    from presto_rakam_kafka_spark.streaming import windows as swin

    @query("stream_tumbling_window", oracle=swin.tumbling_counts_oracle("events"))
    def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Tumbling 1h windowed agg over the replayed stream (complete
        mode: the bounded-replay result equals the batch GROUP BY)."""
        return _drain(
            swin.tumbling_counts(_events_stream(spark, sf_dir)), "tumbling", "complete"
        )

    @query("stream_sliding_window", oracle=swin.sliding_counts_oracle("events"))
    def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sliding 1h/30m windowed counts (each event in 2 windows)."""
        return _drain(
            swin.sliding_counts(_events_stream(spark, sf_dir)), "sliding", "complete"
        )

    @query("stream_session_window", oracle=swin.session_window_stats_oracle("events"))
    def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Native session_window gap-merge per user (30 min gap)."""
        return _drain(
            swin.session_window_stats(_events_stream(spark, sf_dir), watermark="30 minutes"),
            "session",
            "complete",
        )

    @query(
        "stream_dedup_keys",
        oracle=sdedup.dedup_keys_oracle("events", ["user_id", "event_type"]),
    )
    def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
        """dropDuplicatesWithinWatermark with a delay spanning the
        replay → global key-distinct (bounded-state expiry semantics
        under shorter delays are covered by tests/test_streaming.py)."""
        return _drain(
            sdedup.dedup_keys_within_watermark(
                _events_stream(spark, sf_dir),
                ["user_id", "event_type"],
                watermark="3650 days",
            ),
            "dedup",
            "append",
        )

    @query("stream_sessionize_stateful", oracle=ssz.sessionize_oracle("events", 30, 30))
    def stream_sessionize_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Custom stateful operator (applyInPandasWithState): per-user
        close-on-gap sessions with event-time-timeout state expiry."""
        return _drain(
            ssz.sessionize(_events_stream(spark, sf_dir), 30, "30 minutes"),
            "sessionize",
            "append",
        )

    from presto_rakam_kafka_spark.streaming import funnel as sfunnel

    @query("stream_funnel_stateful", oracle=sfunnel.funnel_stream_oracle("events"))
    def stream_funnel_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Rakam's funnel as a continuous query: per-user (depth,
        last_ts) state advanced per micro-batch, conversion events
        emitted on each step advance; drained set == the batch greedy
        chained-min funnel (`streaming/funnel.py`)."""
        return _drain(
            sfunnel.funnel_stream(_events_stream(spark, sf_dir)),
            "funnel",
            "append",
        )

    from presto_rakam_kafka_spark.operators import sketches as _sk

    @query("stream_hll_users", oracle=_sk.hll_weekly_users_oracle("events"))
    def stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Continuous DAU/WAU (r4 verdict item 4): the mergeable-HLL
        register fold AS the streaming aggregation — register-max is
        associative and commutative, so ``groupBy(wk, day, reg)
        .max(rho)`` over micro-batches accumulates exactly the batch
        day-level sketch (integer state, no float drift). The drained
        register table then feeds the SAME estimation half as the
        batch ``events_hll_weekly_users`` (`operators/sketches.py:
        hll_weekly_from_registers`), so the stream equals the batch
        sketch bit-for-bit. At 100 TB the streaming state is the
        stored rollup itself: days × m registers per key — bytes per
        day — and any coarser period (WAU/MAU) is a register-wise max
        over it, never a raw-event replay."""
        regs = _drain(
            _sk.hll_day_registers(_events_stream(spark, sf_dir)),
            "hll_regs",
            "complete",
        )
        return _sk.hll_weekly_from_registers(
            regs, read_table(spark, sf_dir, "events")
        )

    @query(
        "stream_cms_heavy_hitters",
        oracle=_sk.cms_heavy_hitters_oracle("events", "user_id", k=10),
    )
    def stream_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Continuous heavy hitters: the count-min counter fold AS the
        streaming aggregation — counter addition is associative, so
        ``groupBy(i, bucket).count()`` over micro-batches accumulates
        exactly the batch d×w sketch (state = the fixed 2048-counter
        grid, bytes at ANY input size). The drained counters feed the
        same estimation half as the batch ``sketch_cms_heavy_hitters``,
        so the stream equals the batch top-k bit-for-bit."""
        sketch = _drain(
            _sk.cms_counter_table(
                _events_stream(spark, sf_dir).select("user_id"), "user_id"
            ),
            "cms_counters",
            "complete",
        )
        return _sk.cms_topk_from_sketch(
            sketch, read_table(spark, sf_dir, "events"), "user_id", k=10
        )

    from presto_rakam_kafka_spark.operators import events as _ev

    @query(
        "stream_retention",
        oracle="""
        WITH firsts AS (
          SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
          FROM events GROUP BY user_id
        ), activity AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        )
        SELECT strftime(f.cohort_wk, '%Y-%m-%d') AS cohort_week,
               date_diff('day', f.cohort_wk, a.wk) // 7 AS week_offset,
               count(*) AS n_users
        FROM activity a JOIN firsts f ON a.user_id = f.user_id
        GROUP BY 1, 2
        """,
    )
    def stream_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Continuous cohort retention: both halves of the matrix are
        streaming-accumulable — per-user min(ts) (associative) and the
        distinct (user, week) set (a streaming groupBy) run as
        complete-mode aggregations over the replayed stream; the
        drained parts feed the same finish as the batch matrix
        (`operators/events.py:retention_from_parts`), so the stream
        equals `events_retention` exactly at any micro-batch cut. At
        100 TB the streaming state is users + users×weeks rows — the
        stored rollup a retention dashboard reads, never a raw-event
        replay."""
        ev_stream = _events_stream(spark, sf_dir)
        firsts = _drain(
            ev_stream.groupBy("user_id").agg(F.min("ts").alias("min_ts")),
            "ret_firsts",
            "complete",
        )
        weeks = _drain(
            _events_stream(spark, sf_dir)
            .select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
            .groupBy("user_id", "wk")
            .agg(F.count(F.lit(1)).alias("_n")),
            "ret_weeks",
            "complete",
        )
        return _ev.retention_from_parts(firsts, weeks.select("user_id", "wk"))

    @query(
        "stream_segmentation",
        oracle="""
        SELECT event_type,
               strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               CAST(json_extract_string(props, '$.k') AS BIGINT) // 25 AS k_bucket,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2, 3
        """,
    )
    def stream_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Continuous Rakam segmentation: per-(cell, user) counts and
        value sums are a plain streaming groupBy (associative); the
        drained cells regroup into the same measures as the batch
        `events_segmentation` — fourth fold-then-finish rollup."""
        st = _events_stream(spark, sf_dir)
        k = F.get_json_object("props", "$.k").cast("long")
        cells = _drain(
            st.groupBy(
                F.col("event_type"),
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
                F.floor(k / 25).alias("k_bucket"),
                F.col("user_id"),
            ).agg(
                F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
            ),
            "segmentation",
            "complete",
        )
        from presto_rakam_kafka_spark.operators.events import (
            segmentation_from_user_cells,
        )

        return segmentation_from_user_cells(cells)

    @query("stream_stickiness", oracle=_ev.stickiness_oracle("events"))
    def stream_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Continuous engagement stickiness: the distinct
        (month, day, user) triple set is a streaming groupBy
        (complete mode); the drained triples feed the exact batch
        finish (`stickiness_from_triples`), so the stream equals
        `events_stickiness` at any micro-batch cut. State = the triple
        rollup itself (≤ users×days rows)."""
        triples = _drain(
            _events_stream(spark, sf_dir)
            .select(
                F.date_format("ts", "yyyy-MM").alias("mo"),
                F.to_date("ts").alias("day"),
                "user_id",
            )
            .groupBy("mo", "day", "user_id")
            .agg(F.count(F.lit(1)).alias("_n")),
            "stickiness",
            "complete",
        )
        return _ev.stickiness_from_triples(triples.select("mo", "day", "user_id"))

    from presto_rakam_kafka_spark.streaming import attribution as sattr

    @query("stream_attribution", oracle=sattr.attribution_oracle("events"))
    def stream_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Attribution as a continuous query (VERDICT r5 next-7): the
        batch IGNORE-NULLS carry becomes per-user
        (first_touch, last_touch_us, last_touch_type) state in
        ``applyInPandasWithState``; each conversion emits its
        attribution row the moment it arrives. Drained set == the
        batch `events_attribution` (same oracle SQL)."""
        return _drain(
            sattr.attribution_stream(_events_stream(spark, sf_dir)),
            "attribution",
            "append",
        )


_register_streaming_queries()


@query(
    "sql_over_event_table",
    oracle="""
    SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value
    FROM events WHERE event_id >= 200 AND event_id < 800
    GROUP BY event_type
    """,
)
def sql_over_event_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.sql over a catalog-registered event view, filtering on the
    hidden _offset column — the reference's primary entry point shape
    (SQL over a Kafka-backed table, SURVEY §3 entry point 1)."""
    catalog = load_catalog(spark, sf_dir)
    view = catalog.sql_view("tpch", "events")
    return spark.sql(
        f"""
        SELECT event_type, count(*) AS n, round(avg(value), 2) AS avg_value
        FROM {view} WHERE _offset >= 200 AND _offset < 800
        GROUP BY event_type
        """
    )


# =====================================================================
# Tier B widening — statistical aggs, grouping sets, ranking windows,
# further TPC-H shapes, TIME representation (SURVEY §2.B, §7 risk 2)
# =====================================================================


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 2) AS sd_price,
           round(stddev_pop(l_extendedprice), 2) AS sdp_price,
           round(var_samp(l_quantity), 2) AS var_qty,
           round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
           round(covar_samp(l_extendedprice, l_quantity), 2) AS covar_pq
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (Presto 0.123's stddev/variance family,
    SURVEY §2.B 'Aggregation'), plus corr/covar. Partial+final
    distributed agg — single shuffle on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
        F.round(F.stddev_pop("l_extendedprice"), 2).alias("sdp_price"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("corr_pq"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("covar_pq"),
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
           CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
           count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping() indicators (beyond Presto
    0.123 like cube/rollup — free via Catalyst's Expand operator; one
    shuffle over the expanded rows)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "window_ntile",
    oracle="""
    SELECT o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cdist,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(dense_rank() OVER w AS BIGINT) AS drk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining ranking/distribution window functions: ntile,
    percent_rank, cume_dist, row_number, dense_rank (SURVEY §2.B
    'Window functions')."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.row_number().over(w).cast("long").alias("rn"),
        F.dense_rank().over(w).cast("long").alias("drk"),
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective filter + global agg. The whole WHERE
    reaches the parquet scan as PushedFilters; no shuffle at all except
    the final single-row partial-agg combine."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & (F.col("l_discount").between(0.02, 0.08))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join + broadcast dim + agg +
    deterministic top-20 (TakeOrderedAndProject)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, round(o_totalprice, 2) AS total_price,
           round(sum(l_quantity), 2) AS sum_qty
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 100
    )
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 50
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg-derived semi-join filter (HAVING subquery)
    then re-aggregate. The HAVING side is a map-side-combined agg whose
    output is small → broadcast into the semi join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 100)
        .select("l_orderkey")
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, cust.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "o_orderkey", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            "sum_qty",
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(50)
    )


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — Presto 0.123's UNION (SURVEY §2.B 'Set ops');
    union + one dedup shuffle."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "time_of_day_millis",
    oracle="""
    SELECT event_id,
           (epoch_ms(ts) - epoch_ms(date_trunc('day', ts))) AS time_ms,
           CAST(EXTRACT(HOUR FROM ts) AS BIGINT) AS hr
    FROM events WHERE event_id < 1000
    """,
)
def time_of_day_millis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's TIME type (``KafkaMetadata.java:192-193``) has no
    Spark equivalent; the engine's canonical representation is BIGINT
    millis-of-day (SURVEY §7 risk 2, ``types.FieldType.TIME``). This
    query exercises the representation end-to-end."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        (F.unix_millis(F.col("ts")) - F.unix_millis(F.date_trunc("day", "ts"))).alias(
            "time_ms"
        ),
        F.hour("ts").cast("long").alias("hr"),
    )


def _register_llm_queries_2() -> None:
    """Second LLM-pipeline batch: BPE-ish token counting and the
    multimodal resize / frame-sample stages (brief: decode /
    feature-extract / resize / frame-sample, each with real Spark
    plumbing and a stubbed codec)."""
    from presto_rakam_kafka_spark.operators import multimodal, text

    @query(
        "text_token_counts",
        oracle=text.token_counts_oracle("documents", "text", "doc_id"),
    )
    def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Whitespace + BPE-ish regex token counts (pretraining token
        budgeting); single-pass, no shuffle."""
        return text.token_counts(_documents(spark, sf_dir), "text", "doc_id")

    @query(
        "multimodal_resize",
        oracle=multimodal.resize_images_oracle("documents", "text", "doc_id"),
    )
    def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Image-resize stage via mapInPandas (codec stubbed with a
        deterministic fake; batch shape/schema real). The binary output
        column is dropped for the oracle compare."""
        assets = multimodal.attach_payload(_documents(spark, sf_dir), "text", "doc_id")
        return multimodal.resize_images(assets).drop("resized")

    @query(
        "multimodal_frame_sample",
        oracle=multimodal.sample_frames_oracle("documents", "text", "doc_id"),
    )
    def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Frame-sampling stage: mapInPandas fan-out (more rows out than
        in) — one row per sampled frame index."""
        assets = multimodal.attach_payload(_documents(spark, sf_dir), "text", "doc_id")
        return multimodal.sample_frames(assets)


_register_llm_queries_2()


def _register_streaming_join_queries() -> None:
    from presto_rakam_kafka_spark.streaming import joins as sjoins

    @query(
        "stream_static_join",
        oracle="""
        SELECT e.event_id, e.user_id, c.c_name,
               round(e.value, 2) AS value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        WHERE e.event_type = 'purchase'
        """,
    )
    def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Stream-static dimension enrichment: the customer table
        broadcasts into every micro-batch; no streaming state."""
        stream = _events_stream(spark, sf_dir).filter(
            F.col("event_type") == "purchase"
        )
        dim = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_name"
        )
        joined = sjoins.enrich_with_static(stream, dim, on="user_id").select(
            "event_id", "user_id", "c_name", F.round("value", 2).alias("value")
        )
        return _drain(joined, "enrich", "append")

    @query(
        "stream_stream_join",
        oracle=sjoins.view_purchase_join_oracle("events", window_minutes=60),
    )
    def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Watermarked stream-stream inner join (views → purchases
        within 1h, per user): event-time bound + watermark = evictable
        join state, the only shape that survives unbounded input."""
        return _drain(
            sjoins.view_purchase_join(
                _events_stream(spark, sf_dir), window_minutes=60, watermark="1 hour"
            ),
            "vp_join",
            "append",
        )


_register_streaming_join_queries()


def _register_sampling_queries() -> None:
    from presto_rakam_kafka_spark.functions.hashing import (
        jaccard_duckdb,
        shingles_duckdb,
    )
    from presto_rakam_kafka_spark.operators import clusters, dedup, sampling

    @query(
        "sample_hash_10pct",
        oracle=sampling.hash_sample_oracle(
            "events", "event_id", 10,
            select="event_id, user_id, event_type, round(value, 2) AS value",
        ),
    )
    def sample_hash_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Deterministic ~10% sample by key hash: reproducible across
        reruns/retries/repartitions, shuffle-free (vs rand()-based
        TABLESAMPLE which is none of those)."""
        ev = _t(spark, sf_dir, "events")
        return sampling.hash_sample(ev, "event_id", 10).select(
            "event_id", "user_id", "event_type", F.round("value", 2).alias("value")
        )

    @query(
        "split_train_val_test",
        oracle=f"""
        SELECT {sampling.assign_split_oracle_case('doc_id')} AS split,
               count(*) AS n, count(DISTINCT lang) AS n_langs
        FROM documents GROUP BY 1
        """,
    )
    def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Train/val/test assignment by key hash + stratification check
        (one narrow projection, then a 3-group agg)."""
        docs = sampling.assign_split(_documents(spark, sf_dir), "doc_id")
        return docs.groupBy("split").agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("lang").alias("n_langs"),
        )

    @query(
        "split_leakage_safe",
        oracle=f"""
        WITH RECURSIVE
          s AS (SELECT doc_id, {shingles_duckdb('text', 3)} AS sh FROM documents),
          p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM s a JOIN s b ON a.doc_id < b.doc_id
            WHERE round({jaccard_duckdb('a.sh', 'b.sh')}, 4) >= 0.8
          ),
          edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM p
            UNION SELECT doc_b, doc_a FROM p
          ),
          reach(node, lab) AS (
            SELECT src, src FROM edges
            UNION
            SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.node
          ),
          comp AS (SELECT node, min(lab) AS cluster_id FROM reach GROUP BY node),
          grouped AS (
            SELECT d.doc_id,
                   coalesce(c.cluster_id, d.doc_id) AS group_id
            FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
          )
        SELECT doc_id, group_id,
               {sampling.assign_split_oracle_case('group_id')} AS split
        FROM grouped
        """,
    )
    def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
        """LEAKAGE-SAFE train/val/test split (round 8): the split key is
        the NEAR-DUP CLUSTER, not the document — LSH pairs → connected
        components → every doc keyed by its component id (singletons by
        their own id) → the same deterministic hash-split as
        `split_train_val_test`. Near-duplicates therefore land in the
        SAME split by construction (no train/test contamination through
        paraphrases — the failure `decontaminate_*` can only catch
        after the fact), which per-doc splitting cannot guarantee.
        Invariant (also unit-tested): one split per cluster. Cost on
        top of the plain split is the dedup pipeline the curation flow
        already runs; the split itself stays a shuffle-free projection
        off the (doc, group) frame."""
        docs = _documents(spark, sf_dir)
        pairs = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", n=3, threshold=0.8
        ).select("doc_a", "doc_b")
        comp = clusters.connected_components(pairs)
        grouped = docs.join(
            comp, docs["doc_id"] == comp["node"], "left"
        ).select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("group_id"),
        )
        return sampling.assign_split(grouped, "group_id").select(
            "doc_id", "group_id", "split"
        )


_register_sampling_queries()


@query(
    "explode_embedding",
    oracle="""
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS INTEGER) AS pos,
           round(unnest(embedding)::DOUBLE, 6) AS v
    FROM embeddings WHERE vec_id < 100
    """,
)
def explode_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (LATERAL VIEW): array column → one row per element
    (SURVEY §2.B 'Array / map functions' — explode). Narrow fan-out,
    pipelines with the scan."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v_raw")
    ).select("vec_id", "pos", F.round(F.col("v_raw").cast("double"), 6).alias("v"))


@query(
    "string_funcs2",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '^[a-m]') AS starts_low,
           split_part(p_name, ' ', 2) AS second_word,
           CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
           reverse(p_brand) AS brand_rev,
           CAST(starts_with(p_type, 'STANDARD') AS BOOLEAN) AS is_std,
           repeat('-', CAST(p_size % 5 AS INTEGER)) AS size_bar
    FROM part
    """,
)
def string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string batch: regexp_like/rlike, split_part, position,
    reverse, starts_with, repeat (Presto 0.123 string surface)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("^[a-m]").alias("starts_low"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("second_word"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.reverse("p_brand").alias("brand_rev"),
        F.startswith(F.col("p_type"), F.lit("STANDARD")).alias("is_std"),
        F.repeat(F.lit("-"), (F.col("p_size") % 5).cast("int")).alias("size_bar"),
    )


@query(
    "pivot_event_types",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click') AS click,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'view') AS view
    FROM events GROUP BY user_id
    """,
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide counts per event type). Catalyst plans one
    partial-agg + one shuffle, same as the equivalent FILTERed aggs —
    the oracle spells it that way since pivot syntax isn't portable."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "purchase", "view"])
        .count()
        .na.fill(0, ["click", "purchase", "view"])
    )


@query(
    "agg_median_exact",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice AS v,
             CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS DOUBLE) AS rn,
             CAST(count(*) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           round(max(CASE WHEN rn = floor((n-1)*0.5) THEN v END)
             + ((n-1)*0.5 - floor((n-1)*0.5))
             * (max(CASE WHEN rn = ceil((n-1)*0.5) THEN v END)
                - max(CASE WHEN rn = floor((n-1)*0.5) THEN v END)), 4) AS median_price,
           round(max(CASE WHEN rn = floor((n-1)*0.9) THEN v END)
             + ((n-1)*0.9 - floor((n-1)*0.9))
             * (max(CASE WHEN rn = ceil((n-1)*0.9) THEN v END)
                - max(CASE WHEN rn = floor((n-1)*0.9) THEN v END)), 4) AS p90_price
    FROM ranked GROUP BY l_returnflag, n
    """,
)
def agg_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Presto percentile_cont analog),
    computed with an explicit rank-based formula so Spark and the
    oracle run the *same* double arithmetic (built-in `percentile` and
    DuckDB `quantile_cont` disagree in the last ulp, which flips a
    round(2) boundary). Shape: one window sort per group + one agg —
    the values of a group must meet anyway for an exact quantile; for
    global quantiles at 100 TB use the approx sketch path instead."""
    from pyspark.sql import Window as W

    li = _t(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        (F.row_number().over(w) - 1).cast("double").alias("rn"),
        F.count(F.lit(1)).over(wn).cast("double").alias("n"),
    )

    def interp(q: str):
        h = f"(n-1)*{q}"
        lo = f"max(CASE WHEN rn = floor({h}) THEN v END)"
        hi = f"max(CASE WHEN rn = ceil({h}) THEN v END)"
        # 4dp, not 2: the q=0.5 interpolation is the average of two
        # 2-decimal prices — an exact .xx5 midpoint where Spark
        # (binary-exact HALF_UP) and DuckDB (shortest-repr) round(…, 2)
        # systematically disagree; the 4th decimal is past the midpoint.
        return f"round({lo} + ({h} - floor({h})) * ({hi} - {lo}), 4)"

    return (
        ranked.groupBy("l_returnflag", "n")
        .agg(
            F.expr(interp("0.5")).alias("median_price"),
            F.expr(interp("0.9")).alias("p90_price"),
        )
        .select("l_returnflag", "median_price", "p90_price")
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(nth_value(o_totalprice, 2) OVER w, 2) AS second_price,
           round(last_value(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value + last_value over an unbounded frame (the
    full-partition frame is what makes last_value deterministic)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.nth_value("o_totalprice", 2).over(w), 2).alias("second_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
    )


@query(
    "setop_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'N'
    EXCEPT ALL
    SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — per-key multiplicity subtraction)."""
    li = _t(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "N").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — min of multiplicities)."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b)


@query(
    "try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE round(l_quantity / (l_linenumber - 1), 4) END AS qty_per_prev,
           TRY_CAST(l_returnflag AS BIGINT) AS flag_num,
           TRY_CAST(l_linenumber AS VARCHAR) AS line_str
    FROM lineitem
    """,
)
def try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presto `try(...)` analog: error-to-NULL arithmetic and casts
    (`try_divide`, `try_cast`) — NULL on /0 or bad cast instead of
    query failure."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.try_divide("l_quantity", F.col("l_linenumber") - 1), 4).alias(
            "qty_per_prev"
        ),
        F.col("l_returnflag").try_cast("bigint").alias("flag_num"),
        F.col("l_linenumber").try_cast("string").alias("line_str"),
    )


@query(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS low_byte,
           o_orderkey | 1 AS set_low,
           xor(o_orderkey, o_custkey) AS x_keys,
           CAST(bit_count(o_orderkey) AS INTEGER) AS pop,
           o_orderkey << 2 AS shl,
           o_orderkey >> 3 AS shr
    FROM orders
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operators (AND/OR/XOR/popcount/shifts)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr("o_orderkey & 255").alias("low_byte"),
        F.expr("o_orderkey | 1").alias("set_low"),
        F.expr("o_orderkey ^ o_custkey").alias("x_keys"),
        F.bit_count("o_orderkey").alias("pop"),
        F.expr("shiftleft(o_orderkey, 2)").alias("shl"),
        F.expr("shiftright(o_orderkey, 3)").alias("shr"),
    )


def _register_ivf_query() -> None:
    from presto_rakam_kafka_spark.operators import similarity

    EMB_DIM = 64

    @query(
        "sim_topk_ivf",
        oracle=similarity.ivf_topk_oracle(
            "embeddings", "vec_id % 100 = 0", "embedding", "vec_id", dim=EMB_DIM, k=5
        ),
    )
    def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
        """IVF (inverted-file) ANN: corpus assigned to nearest of 8
        seeded centroids, queries probe their 2 nearest lists —
        the coarse-quantizer counterpart to sim_topk_lsh."""
        emb = _embeddings(spark, sf_dir)
        return similarity.ivf_topk(
            emb, emb.filter("vec_id % 100 = 0"), "embedding", "vec_id", dim=EMB_DIM, k=5
        )


_register_ivf_query()


@query(
    "date_funcs2",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS plus_30d,
           strftime(o_orderdate + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_2mo,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS woy
    FROM orders
    """,
)
def date_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second date batch: interval arithmetic, add_months, last_day,
    ISO weekday, quarter, ISO week-of-year."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format(F.date_add(F.col("o_orderdate"), 30), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
        F.date_format(F.add_months(F.col("o_orderdate"), 2), "yyyy-MM-dd").alias(
            "plus_2mo"
        ),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        F.expr("weekday(o_orderdate) + 1").cast("int").alias("iso_dow"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.weekofyear("o_orderdate").cast("int").alias("woy"),
    )


@query(
    "date_funcs3",
    oracle="""
    SELECT o_orderkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           strftime(to_timestamp(CAST(epoch(o_orderdate) AS BIGINT)),
                    '%Y-%m-%d %H:%M:%S') AS rt,
           CAST(date_diff('day', DATE '1995-01-01',
                          CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           strftime(make_date(CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER),
                              1, 1), '%Y-%m-%d') AS year_start
    FROM orders
    """,
)
def date_funcs3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third date batch — Presto 0.123's ``to_unixtime``/``from_unixtime``
    (SURVEY §2.B scalar date fns) as unix_timestamp → from_unixtime
    round-trip, plus datediff and make_date. Session pinned UTC keeps
    both engines' epoch math identical."""
    o = _t(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate")
    return o.select(
        "o_orderkey",
        epoch.alias("epoch_s"),
        F.from_unixtime(epoch, "yyyy-MM-dd HH:mm:ss").alias("rt"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.lit(1), F.lit(1)), "yyyy-MM-dd"
        ).alias("year_start"),
    )


# =====================================================================
# TPC-H-shaped suite, second batch (adapted to the fixture columns):
# q4 EXISTS-agg, q7 nation-pair volume, q12 CASE agg, q14 conditional
# ratio, q19 disjunctive pushdown.
# =====================================================================


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS → left-semi join, then agg on
    the priority. Catalyst decorrelates; the semi join shuffles once on
    the order key."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    matched = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return matched.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
          OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two broadcast dim joins against the same nation
    table (aliased), disjunctive nation-pair filter, per-year agg."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        _t(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY"))
            | ((F.col("supp_nation") == "GERMANY") & (F.col("cust_nation") == "FRANCE"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@query(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional CASE counts per group."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
           / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01' AND l_shipdate < TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-revenue ratio over a broadcast part
    join within one month of shipments."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01"))
        & (F.col("l_shipdate") < F.lit("1996-10-01"))
    )
    p = F.broadcast(_t(spark, sf_dir, "part"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 30)
       OR (p_brand = 'Brand#20' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 40)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides —
    the common-conjunct extraction / disjunctive-pushdown stress."""
    li = _t(spark, sf_dir, "lineitem")
    p = F.broadcast(_t(spark, sf_dir, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "rollup_time_hierarchy",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h, event_type,
             count(*) AS n, sum(value) AS sv
      FROM events GROUP BY 1, 2
    )
    SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
           CAST(sum(n) AS BIGINT) AS n_events, round(sum(sv), 2) AS sum_value
    FROM hourly GROUP BY 1, 2
    """,
)
def rollup_time_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: hourly pre-aggregates
    re-aggregated to daily. The point at 100 TB: the daily rollup reads
    the (tiny) hourly aggregate — sums of sums, counts of counts — not
    the raw events; in production the hourly layer is a continuously
    maintained materialization (streaming windows upstream), and every
    coarser granularity derives from it the same way."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.sum("n").alias("n_events"), F.round(F.sum("sv"), 2).alias("sum_value"))
    )


@query(
    "agg_minby_maxby",
    oracle="""
    SELECT l_returnflag,
           max_by(l_orderkey, CAST(round(l_extendedprice * 100) AS BIGINT) * 68719476736 + l_orderkey) AS priciest_order,
           min_by(l_orderkey, CAST(round(l_extendedprice * 100) AS BIGINT) * 68719476736 + l_orderkey) AS cheapest_order,
           CAST(bool_and(l_discount <= 0.1) AS BOOLEAN) AS all_low_disc,
           CAST(bool_or(l_quantity > 49) AS BOOLEAN) AS any_bulk
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_minby_maxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by (argmin/argmax — in Presto's agg family) and
    bool_and/bool_or. The ordering key folds the row id into the low
    36 bits below the price cents (price_cents·2^36 + orderkey) so ties
    are impossible for any l_orderkey < 2^36 (TPC-H SF ≲ 2800) —
    argmax over a non-unique key is nondeterministic in BOTH engines
    and would flap the value hash. Price cents ≤ ~1e7 < 2^24, so the
    composite stays under 2^60 with no BIGINT overflow."""
    li = _t(spark, sf_dir, "lineitem")
    ordkey = (
        F.shiftleft(F.round(F.col("l_extendedprice") * 100).cast("long"), 36)
        + F.col("l_orderkey")
    )
    return li.groupBy("l_returnflag").agg(
        F.max_by("l_orderkey", ordkey).alias("priciest_order"),
        F.min_by("l_orderkey", ordkey).alias("cheapest_order"),
        F.bool_and(F.col("l_discount") <= 0.1).alias("all_low_disc"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_bulk"),
    )


@query(
    "lateral_topk_per_nation",
    oracle="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
    FROM nation n, LATERAL (
      SELECT c_custkey, c_acctbal FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_custkey LIMIT 3
    ) t
    """,
)
def lateral_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (top-3 customers per nation) through
    Spark SQL — Catalyst plans the correlated limit as a partitioned
    window, not N=|nation| scans."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        FROM nation_v n, LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_v c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 3
        ) t
        """
    )


@query(
    "window_percentiles",
    oracle="""
    SELECT event_id,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           round(lag(value, 2, 0.0) OVER w, 2) AS lag2,
           round(lead(value, 1, -1.0) OVER w, 2) AS lead1
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank / cume_dist) plus
    lag/lead with explicit defaults — the §2.B window families not yet
    in the inventory. Tie-break on event_id keeps lag/lead
    deterministic under value ties."""
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.lag("value", 2, 0.0).over(w), 2).alias("lag2"),
        F.round(F.lead("value", 1, -1.0).over(w), 2).alias("lead1"),
    )


@query(
    "agg_listagg",
    oracle="""
    SELECT n.n_name,
           array_to_string(list_sort(list(c.c_name)), ',') AS customers,
           count(*) AS n_customers
    FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String aggregation (LISTAGG / string_agg): per-nation sorted
    customer-name roster. Expressed portably as
    array_join(array_sort(collect_list(...))) — deterministic where
    bare listagg is order-undefined; nation side broadcast."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    return (
        cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.expr("array_join(array_sort(collect_list(c_name)), ',')").alias(
                "customers"
            ),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "url_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param
    FROM (SELECT doc_id,
                 concat('https://', source, '.example.com/d/',
                        CAST(doc_id AS VARCHAR), '?lang=', lang) AS url
          FROM documents) t
    """,
)
def url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction via engine-portable regexes (host,
    path, query param) over a synthesized URL column — the
    parse_url-family surface without Java-vs-RE2 divergence."""
    docs = _t(spark, sf_dir, "documents")
    url = "concat('https://', source, '.example.com/d/', cast(doc_id as string), '?lang=', lang)"
    t = docs.select("doc_id", F.expr(url).alias("url"))
    return t.select(
        "doc_id",
        F.regexp_extract("url", "^[a-z]+://([^/]+)", 1).alias("host"),
        F.regexp_extract("url", "^[a-z]+://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", "lang=([a-z]+)", 1).alias("lang_param"),
    )


# ---------------------------------------------------------------------
# Registration side-effect import: the remaining TPC-H shapes live in
# queries_tpch2 (this module is already ~2.4k lines). Import must stay
# at the bottom — queries_tpch2 imports `query`/`_t` back from here.
# ---------------------------------------------------------------------
from presto_rakam_kafka_spark import (  # noqa: E402,F401
    queries_analytics,
    queries_curation,
    queries_dsv2,
    queries_tpch2,
)
