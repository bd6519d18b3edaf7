"""Metastore + catalog semantics (SURVEY §1.3-§1.5 parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from presto_rakam_kafka_spark.catalog import (
    EventCatalog,
    TableNotFoundError,
    parse_topic_name,
    topic_name,
)
from presto_rakam_kafka_spark.metastore import (
    CachingMetastore,
    CollectionNotFoundError,
    InMemoryMetastore,
    JsonFileMetastore,
    SchemaField,
    SqlMetastore,
    fields_to_struct,
)
from presto_rakam_kafka_spark.types import FieldType, field_to_spark


def test_topic_name_roundtrip():
    # split on FIRST underscore (KafkaConnectorPageSource.java:88-89):
    # collection may itself contain underscores.
    assert topic_name("tpch", "events") == "tpch_events"
    assert parse_topic_name("tpch_events") == ("tpch", "events")
    assert parse_topic_name("proj_my_collection") == ("proj", "my_collection")


def test_type_mapping_reference_lattice():
    # KafkaMetadata.java:177-197
    assert field_to_spark(FieldType.STRING) == T.StringType()
    assert field_to_spark(FieldType.LONG) == T.LongType()
    assert field_to_spark(FieldType.DOUBLE) == T.DoubleType()
    assert field_to_spark(FieldType.BOOLEAN) == T.BooleanType()
    assert field_to_spark(FieldType.DATE) == T.DateType()
    # TIME carried as millis-of-day (SURVEY §7 risk 2)
    assert field_to_spark(FieldType.TIME) == T.LongType()
    # beyond-reference extension
    assert field_to_spark(FieldType.ARRAY_FLOAT) == T.ArrayType(T.FloatType())


def test_missing_collection_raises():
    ms = InMemoryMetastore()
    with pytest.raises(CollectionNotFoundError):
        ms.get_collection("nope", "nothing")


def test_column_names_lowercased():
    # KafkaMetadata.java:171
    fields = [SchemaField("UserId", FieldType.LONG)]
    struct = fields_to_struct(fields)
    assert struct.fields[0].name == "userid"


def test_caching_metastore_hits_delegate_once():
    class Counting(InMemoryMetastore):
        calls = 0

        def get_collection(self, p, c):
            Counting.calls += 1
            return super().get_collection(p, c)

    ms = Counting()
    ms.register("p", "c", [SchemaField("x", FieldType.LONG)])
    cached = CachingMetastore(ms, ttl_seconds=60)
    cached.get_collection("p", "c")
    cached.get_collection("p", "c")
    assert Counting.calls == 1
    cached.invalidate("p", "c")
    cached.get_collection("p", "c")
    assert Counting.calls == 2


def test_json_file_metastore(tmp_path):
    path = tmp_path / "ms.json"
    path.write_text(
        '{"tpch": {"events": [{"name": "event_id", "type": "long"},'
        '{"name": "value", "type": "double"}]}}'
    )
    ms = JsonFileMetastore(path)
    fields = ms.get_collection("tpch", "events")
    assert [f.name for f in fields] == ["event_id", "value"]
    assert ms.list_projects() == ["tpch"]
    assert ms.list_collections("tpch") == ["events"]


def test_sql_metastore_jdbc_twin(tmp_path):
    """SqlMetastore mirrors the reference's JDBCMetastore contract
    (MetastoreModule.java:34-44): schemas by (project, collection),
    ordinal-stable columns, enum/alias metadata round-trip, missing
    table raises, persistence across connections, and Rakam-style
    dynamic field addition."""
    db = str(tmp_path / "meta.db")
    ms = SqlMetastore(db)
    fields = [
        SchemaField("user_id", FieldType.LONG, nullable=False),
        SchemaField(
            "color",
            FieldType.STRING,
            enum_symbols=("RED", "GREEN"),
            aliases=("colour",),
        ),
        SchemaField("value", FieldType.DOUBLE),
    ]
    ms.register("Web", "PageView", fields)
    got = ms.get_collection("web", "pageview")  # case-insensitive lookup
    assert [f.name for f in got] == ["user_id", "color", "value"]  # ordinal order
    assert got[0].nullable is False
    assert got[1].enum_symbols == ("RED", "GREEN")
    assert got[1].aliases == ("colour",)
    assert ms.list_projects() == ["web"]
    assert ms.list_collections("web") == ["pageview"]
    with pytest.raises(CollectionNotFoundError):
        ms.get_collection("web", "nope")
    # dynamic evolution: append-only, name clashes rejected
    ms.add_fields("web", "pageview", [SchemaField("country", FieldType.STRING)])
    assert [f.name for f in ms.get_collection("web", "pageview")] == [
        "user_id", "color", "value", "country",
    ]
    with pytest.raises(ValueError):
        ms.add_fields("web", "pageview", [SchemaField("VALUE", FieldType.LONG)])
    # persistence: a fresh connection sees the committed registry
    ms2 = SqlMetastore(db)
    assert [f.name for f in ms2.get_collection("web", "pageview")][-1] == "country"


def test_sql_metastore_drives_catalog(spark, sf_dir):
    """An EventCatalog over SqlMetastore resolves tables end-to-end
    (schema from SQL → parquet scan → hidden columns)."""
    from presto_rakam_kafka_spark.fixtures import read_table

    ms = SqlMetastore()
    cat = EventCatalog(spark, ms)
    ev = read_table(spark, sf_dir, "events")
    ms.register_struct("tpch", "events", ev.select("event_id", "event_type").schema)
    cat.register_parquet("tpch", "events", f"{sf_dir}/events.parquet", offset_column="event_id")
    df = cat.table("tpch", "events", include_hidden=True)
    assert df.columns == ["_offset", "project", "collection", "event_id", "event_type"]
    assert df.count() == ev.count()


def test_catalog_hidden_vs_user_schema(catalog):
    user = catalog.table("tpch", "events")
    full = catalog.table("tpch", "events", include_hidden=True)
    assert "_offset" not in user.columns
    assert full.columns[:3] == ["_offset", "project", "collection"]
    assert user.columns == full.columns[3:]


def test_catalog_unknown_table(catalog):
    with pytest.raises(TableNotFoundError):
        catalog.table("tpch", "not_a_table")


def test_full_schema_prepends_hidden(catalog):
    schema = catalog.full_schema("tpch", "events")
    assert [f.name for f in schema.fields[:3]] == ["_offset", "project", "collection"]


def test_offset_pushdown_reaches_parquet_scan(catalog):
    """The pruning predicate must land in the parquet scan, not a
    post-scan Filter only — the declarative analog of split pruning."""
    from presto_rakam_kafka_spark.plans.offset_pushdown import OffsetRange

    df = catalog.table(
        "tpch", "events", include_hidden=True, offset_ranges=[OffsetRange(10, 50)]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(event_id,10)" in plan, plan


def test_props_schema_inference_widening_lattice(spark):
    """Type inference takes the WIDEST shape per key: all-int -> long,
    int+float -> double, true/false -> boolean, anything else ->
    string; NULLs never narrow or widen."""
    import json as _json

    from presto_rakam_kafka_spark.schema_inference import infer_props_schema

    rows = [
        (_json.dumps({"a": 1, "b": 1, "c": True, "d": "x", "e": 5}),),
        (_json.dumps({"a": 2, "b": 2.5, "c": False, "d": 3, "e": None}),),
        (_json.dumps({"a": -3, "b": 1e3, "c": True}),),
    ]
    df = spark.createDataFrame(rows, "props STRING")
    got = {
        r["prop_key"]: (r["inferred_type"], r["n_values"])
        for r in infer_props_schema(df).collect()
    }
    assert got == {
        "a": ("long", 3),
        "b": ("double", 3),
        "c": ("boolean", 3),
        "d": ("string", 2),
        "e": ("long", 1),  # NULL value ignored, stays long
    }


def test_evolve_collection_appends_only_new_fields(spark):
    """The ingestion-evolution contract: inferred prop columns append
    via add_fields (ordinal-stable), existing fields are never
    re-typed, and a second evolution with the same data is a no-op."""
    import json as _json

    from presto_rakam_kafka_spark.metastore import SchemaField, SqlMetastore
    from presto_rakam_kafka_spark.schema_inference import evolve_collection
    from presto_rakam_kafka_spark.types import FieldType

    ms = SqlMetastore()
    ms.register(
        "tpch",
        "events",
        [
            SchemaField("event_id", FieldType.LONG),
            SchemaField("props_k", FieldType.LONG),  # pre-existing prop col
        ],
    )
    df = spark.createDataFrame(
        [(_json.dumps({"k": 1, "fresh": 2.5, "name": "x"}),)], "props STRING"
    )
    added = evolve_collection(ms, "tpch", "events", df)
    assert [(f.name, f.type) for f in added] == [
        ("props_fresh", FieldType.DOUBLE),
        ("props_name", FieldType.STRING),
    ]
    names = [f.name for f in ms.get_collection("tpch", "events")]
    # ordinal-stable append: originals first, new fields after
    assert names == ["event_id", "props_k", "props_fresh", "props_name"]
    assert evolve_collection(ms, "tpch", "events", df) == []
