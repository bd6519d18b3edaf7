"""Metastore: external, per-(project, collection) schema registry.

Reference parity (``/root/reference/src/main/java/com/facebook/presto/kafka/``):

* Schemas are fetched from an external metastore, never inferred —
  ``metastore.getCollection(schemaName, tableName)`` at
  ``KafkaMetadata.java:157`` (backed by a JDBC/PostgreSQL Rakam
  metastore, ``MetastoreModule.java:34-44``).
* Missing table ⇒ ``TableNotFoundException`` (``KafkaMetadata.java:159-161``).
* Column names are lower-cased on exposure (``KafkaMetadata.java:171``).
* ``listSchemaNames`` / ``listTables`` return empty in the reference
  (``KafkaMetadata.java:69-74,91-97``); we keep lookup-by-name as the
  contract but *also* support enumeration (strictly more useful, and
  what Spark's catalog surface expects).

Improvement over the reference (SURVEY §4 O11): the reference re-fetches
the schema from PostgreSQL per query *and per split*
(``KafkaConnectorPageSource.java:89``).  Here schemas are cached on the
driver with a TTL and shipped to tasks inside the serialized plan — a
task never talks to the metastore.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Protocol

from pyspark.sql import types as T

from presto_rakam_kafka_spark.types import FieldType, field_to_spark, spark_to_field


@dataclass(frozen=True)
class SchemaField:
    """One column of a collection (analog of Rakam's ``SchemaField``).

    ``enum_symbols``: set when the Avro writer type is an ENUM — the
    engine reads enums as their symbol strings, like the reference
    (``PageDatumReader.java:137-138``), so the Spark-side type stays
    STRING and the symbol list travels as column metadata for the Avro
    reader-schema builder (:func:`..sources.kafka._struct_to_avro_json`).

    ``aliases``: previous names of this column — Avro reader-schema
    aliases (``Schema.applyAliases``, ``PageDatumReader.java:84``), so
    payloads written under an old field name still resolve.
    """

    name: str
    type: FieldType
    nullable: bool = True
    enum_symbols: tuple[str, ...] | None = None
    aliases: tuple[str, ...] = ()

    def to_struct_field(self) -> T.StructField:
        # Lower-case on exposure, like KafkaMetadata.java:171.
        metadata: dict = {}
        if self.enum_symbols:
            metadata["avro.enum.symbols"] = list(self.enum_symbols)
        if self.aliases:
            metadata["avro.aliases"] = list(self.aliases)
        return T.StructField(
            self.name.lower(), field_to_spark(self.type), self.nullable,
            metadata=metadata or None,
        )


class CollectionNotFoundError(KeyError):
    """Analog of the reference's ``TableNotFoundException``
    (``KafkaMetadata.java:159-161``)."""

    def __init__(self, project: str, collection: str):
        super().__init__(f"{project}.{collection}")
        self.project = project
        self.collection = collection


class Metastore(Protocol):
    """Schema source for event tables (analog of Rakam's ``Metastore``
    interface bound at ``MetastoreModule.java:37-42``)."""

    def get_collection(self, project: str, collection: str) -> list[SchemaField]:
        """Return the user-visible fields, or raise CollectionNotFoundError."""
        ...

    def list_projects(self) -> list[str]: ...

    def list_collections(self, project: str) -> list[str]: ...


class InMemoryMetastore:
    """Dict-backed metastore for tests and programmatic registration."""

    def __init__(self) -> None:
        self._schemas: dict[tuple[str, str], list[SchemaField]] = {}

    def register(self, project: str, collection: str, fields: list[SchemaField]) -> None:
        self._schemas[(project.lower(), collection.lower())] = list(fields)

    def register_struct(self, project: str, collection: str, schema: T.StructType) -> None:
        fields = [
            SchemaField(f.name, spark_to_field(f.dataType), f.nullable) for f in schema.fields
        ]
        self.register(project, collection, fields)

    def get_collection(self, project: str, collection: str) -> list[SchemaField]:
        try:
            return self._schemas[(project.lower(), collection.lower())]
        except KeyError:
            raise CollectionNotFoundError(project, collection) from None

    def list_projects(self) -> list[str]:
        return sorted({p for p, _ in self._schemas})

    def list_collections(self, project: str) -> list[str]:
        p = project.lower()
        return sorted(c for q, c in self._schemas if q == p)


class JsonFileMetastore:
    """File-backed metastore (stand-in for the reference's JDBC/PostgreSQL
    ``JDBCMetastore``, ``MetastoreModule.java:42``).

    Layout::

        {"<project>": {"<collection>": [{"name": ..., "type": ..., "nullable": ...}, ...]}}
    """

    def __init__(self, path: str | Path):
        self._path = Path(path)

    def _load(self) -> dict:
        with open(self._path) as f:
            return json.load(f)

    def get_collection(self, project: str, collection: str) -> list[SchemaField]:
        data = self._load()
        try:
            fields = data[project.lower()][collection.lower()]
        except KeyError:
            raise CollectionNotFoundError(project, collection) from None
        return [
            SchemaField(f["name"], FieldType(f["type"]), f.get("nullable", True))
            for f in fields
        ]

    def list_projects(self) -> list[str]:
        return sorted(self._load().keys())

    def list_collections(self, project: str) -> list[str]:
        return sorted(self._load().get(project.lower(), {}).keys())


class SqlMetastore:
    """SQL-database-backed metastore — the faithful twin of the
    reference's ``JDBCMetastore`` (``MetastoreModule.java:34-44``, a
    PostgreSQL registry consulted via
    ``metastore.getCollection(schemaName, tableName)`` at
    ``KafkaMetadata.java:157``), on stdlib ``sqlite3`` so it carries no
    driver dependency. One row per column::

        schema_fields(project, collection, ordinal, name, type,
                      nullable, enum_symbols, aliases)

    Concurrency model matches the reference's usage: the DRIVER reads
    schemas at plan time (wrap in :class:`CachingMetastore` — the
    catalog does this automatically); executors never touch the
    database. Dynamic schema evolution is first-class like Rakam's
    metastore: :meth:`add_fields` appends columns (new fields read as
    NULL from old payloads via the Avro default path, A6), and
    re-registering a collection replaces it transactionally.
    """

    def __init__(self, path: str | Path = ":memory:"):
        import sqlite3

        self._con = sqlite3.connect(str(path), check_same_thread=False)
        self._con.execute(
            """CREATE TABLE IF NOT EXISTS schema_fields (
                 project TEXT NOT NULL,
                 collection TEXT NOT NULL,
                 ordinal INTEGER NOT NULL,
                 name TEXT NOT NULL,
                 type TEXT NOT NULL,
                 nullable INTEGER NOT NULL DEFAULT 1,
                 enum_symbols TEXT,
                 aliases TEXT,
                 PRIMARY KEY (project, collection, ordinal)
               )"""
        )
        self._con.commit()

    def register(self, project: str, collection: str, fields: list[SchemaField]) -> None:
        p, c = project.lower(), collection.lower()
        with self._con:  # one transaction: replace is atomic
            self._con.execute(
                "DELETE FROM schema_fields WHERE project=? AND collection=?", (p, c)
            )
            self._con.executemany(
                "INSERT INTO schema_fields VALUES (?,?,?,?,?,?,?,?)",
                [
                    (
                        p,
                        c,
                        i,
                        f.name,
                        f.type.value,
                        int(f.nullable),
                        json.dumps(list(f.enum_symbols)) if f.enum_symbols else None,
                        json.dumps(list(f.aliases)) if f.aliases else None,
                    )
                    for i, f in enumerate(fields)
                ],
            )

    def register_struct(self, project: str, collection: str, schema: T.StructType) -> None:
        self.register(
            project,
            collection,
            [
                SchemaField(f.name, spark_to_field(f.dataType), f.nullable)
                for f in schema.fields
            ],
        )

    def add_fields(self, project: str, collection: str, fields: list[SchemaField]) -> None:
        """Append columns (Rakam-style dynamic evolution). Existing
        names are rejected — evolution renames go through Avro aliases,
        not silent replacement."""
        current = self.get_collection(project, collection)
        names = {f.name.lower() for f in current}
        clash = [f.name for f in fields if f.name.lower() in names]
        if clash:
            raise ValueError(f"fields already exist: {clash}")
        self.register(project, collection, current + list(fields))

    def get_collection(self, project: str, collection: str) -> list[SchemaField]:
        rows = self._con.execute(
            """SELECT name, type, nullable, enum_symbols, aliases
               FROM schema_fields WHERE project=? AND collection=?
               ORDER BY ordinal""",
            (project.lower(), collection.lower()),
        ).fetchall()
        if not rows:
            raise CollectionNotFoundError(project, collection)
        return [
            SchemaField(
                name,
                FieldType(t),
                bool(nullable),
                tuple(json.loads(enum)) if enum else None,
                tuple(json.loads(aliases)) if aliases else (),
            )
            for name, t, nullable, enum, aliases in rows
        ]

    def list_projects(self) -> list[str]:
        return [
            r[0]
            for r in self._con.execute(
                "SELECT DISTINCT project FROM schema_fields ORDER BY project"
            )
        ]

    def list_collections(self, project: str) -> list[str]:
        return [
            r[0]
            for r in self._con.execute(
                "SELECT DISTINCT collection FROM schema_fields"
                " WHERE project=? ORDER BY collection",
                (project.lower(),),
            )
        ]


@dataclass
class CachingMetastore:
    """TTL cache in front of any metastore (fixes reference O11: per-query
    *and per-split* metastore hits at ``KafkaConnectorPageSource.java:89``).

    The cached ``StructType`` is embedded in the query plan on the driver;
    executors never see the metastore.
    """

    delegate: Metastore
    ttl_seconds: float = 300.0
    _cache: dict[tuple[str, str], tuple[float, list[SchemaField]]] = field(default_factory=dict)

    def get_collection(self, project: str, collection: str) -> list[SchemaField]:
        key = (project.lower(), collection.lower())
        now = time.monotonic()
        hit = self._cache.get(key)
        if hit is not None and now - hit[0] < self.ttl_seconds:
            return hit[1]
        fields = self.delegate.get_collection(project, collection)
        self._cache[key] = (now, fields)
        return fields

    def invalidate(self, project: str | None = None, collection: str | None = None) -> None:
        if project is None:
            self._cache.clear()
        elif collection is None:
            self._cache = {k: v for k, v in self._cache.items() if k[0] != project.lower()}
        else:
            self._cache.pop((project.lower(), collection.lower()), None)

    def list_projects(self) -> list[str]:
        return self.delegate.list_projects()

    def list_collections(self, project: str) -> list[str]:
        return self.delegate.list_collections(project)


def fields_to_struct(fields: list[SchemaField]) -> T.StructType:
    return T.StructType([f.to_struct_field() for f in fields])
