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
