"""Rakam ``FieldType`` ↔ Spark SQL type mapping.

Mirrors the reference's metastore-type → engine-type table
(``KafkaMetadata.java:177-197`` under ``/root/reference/src/main/java/com/
facebook/presto/kafka/``), then extends it with the types the reference
commented out or rejected (ARRAY at ``KafkaMetadata.java:190-191``;
RECORD/MAP throw at ``PageDatumReader.java:156-160``) — Spark supports
them natively, so our lattice is a strict superset.

TIME has no Spark equivalent (SURVEY §7 risk 2); the canonical
representation here is ``LongType`` = milliseconds-of-day.
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T


class FieldType(enum.Enum):
    """Rakam metastore field types (reference: ``KafkaMetadata.java:177-197``)."""

    STRING = "string"
    LONG = "long"
    INTEGER = "integer"
    DOUBLE = "double"
    BOOLEAN = "boolean"
    DATE = "date"
    TIME = "time"  # millis-of-day, carried as LongType
    TIMESTAMP = "timestamp"  # beyond-reference
    DECIMAL = "decimal"  # beyond-reference
    BINARY = "binary"  # beyond-reference (multimodal payloads)
    ARRAY_STRING = "array_string"
    ARRAY_LONG = "array_long"
    ARRAY_DOUBLE = "array_double"
    ARRAY_FLOAT = "array_float"  # embeddings
    MAP_STRING = "map_string"


_FIELD_TO_SPARK: dict[FieldType, T.DataType] = {
    FieldType.STRING: T.StringType(),
    FieldType.LONG: T.LongType(),
    FieldType.INTEGER: T.IntegerType(),
    FieldType.DOUBLE: T.DoubleType(),
    FieldType.BOOLEAN: T.BooleanType(),
    FieldType.DATE: T.DateType(),
    FieldType.TIME: T.LongType(),
    FieldType.TIMESTAMP: T.TimestampType(),
    FieldType.DECIMAL: T.DecimalType(38, 18),
    FieldType.BINARY: T.BinaryType(),
    FieldType.ARRAY_STRING: T.ArrayType(T.StringType()),
    FieldType.ARRAY_LONG: T.ArrayType(T.LongType()),
    FieldType.ARRAY_DOUBLE: T.ArrayType(T.DoubleType()),
    FieldType.ARRAY_FLOAT: T.ArrayType(T.FloatType()),
    FieldType.MAP_STRING: T.MapType(T.StringType(), T.StringType()),
}


class UnsupportedFieldTypeError(ValueError):
    """Analog of the reference's ``PrestoException(AVRO_TYPE_NOT_SUPPORTED)``
    (``KafkaMetadata.java:194-195``, ``KafkaErrorCode.java:22-33``)."""


def field_to_spark(field_type: FieldType) -> T.DataType:
    """Map a metastore FieldType to a Spark DataType.

    Reference parity: ``KafkaMetadata.schemaToPrestoType``
    (``KafkaMetadata.java:177-197``) — unknown types raise, like the
    reference's AVRO_TYPE_NOT_SUPPORTED path.
    """
    try:
        return _FIELD_TO_SPARK[field_type]
    except KeyError:  # pragma: no cover - enum is closed, defensive only
        raise UnsupportedFieldTypeError(f"unsupported field type: {field_type}")


def spark_to_field(data_type: T.DataType) -> FieldType:
    """Best-effort inverse mapping (used when registering existing
    DataFrames/parquet files into the metastore)."""
    for ft, st in _FIELD_TO_SPARK.items():
        if st == data_type:
            return ft
    if isinstance(data_type, T.TimestampNTZType):
        return FieldType.TIMESTAMP
    if isinstance(data_type, T.DecimalType):
        return FieldType.DECIMAL
    if isinstance(data_type, T.ArrayType):
        elem = data_type.elementType
        if isinstance(elem, T.StringType):
            return FieldType.ARRAY_STRING
        if isinstance(elem, (T.LongType, T.IntegerType)):
            return FieldType.ARRAY_LONG
        if isinstance(elem, T.FloatType):
            return FieldType.ARRAY_FLOAT
        if isinstance(elem, T.DoubleType):
            return FieldType.ARRAY_DOUBLE
    if isinstance(data_type, T.IntegerType):
        return FieldType.INTEGER
    raise UnsupportedFieldTypeError(f"no FieldType for spark type: {data_type}")
