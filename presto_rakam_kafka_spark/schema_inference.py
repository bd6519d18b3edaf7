"""Dynamic schema inference from event properties — Rakam's ingestion
behavior over this engine's metastore.

Rakam's product premise (reference `pom.xml:12-13`; SURVEY §1.3) is a
DYNAMIC, per-(project, collection) schema: users send events with
arbitrary JSON properties and the platform evolves the collection's
column set as new keys arrive (the reference consumes the already-
evolved schema from the metastore; the evolution itself happens in
Rakam's ingestion tier). This module is that ingestion half,
Spark-first:

* :func:`infer_props_schema` — ONE distributed pass over the events'
  JSON ``props``: explode keys, type each value by parse shape, and
  reduce per key to the WIDEST type seen (long ⊂ double ⊂ string —
  exactly Avro-promotion-compatible, so an inferred widening never
  breaks old readers). Output is key → (inferred type, counts).
* :func:`evolve_collection` — apply the inference to a metastore
  collection via ``add_fields`` (append-only, ordinal-stable — the
  `SqlMetastore` evolution contract), skipping keys that already
  exist. Returns the newly added fields.

Scale: the only shuffle is the per-key aggregation (keys are
vocabulary-sized ≪ events); typing is pure codegen (``rlike`` on the
exploded values). The DuckDB oracle replays the same explode + regex
typing, so inference is driver-gated like every other operator
(`events_props_schema_inference`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from presto_rakam_kafka_spark.metastore import Metastore, SchemaField
from presto_rakam_kafka_spark.types import FieldType

#: Value-shape regexes — kept to the common syntax subset that Java
#: regex (Spark) and RE2 (DuckDB) interpret identically.
_INT_RE = "^-?[0-9]+$"
_NUM_RE = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"
_BOOL_RE = "^(true|false)$"


def infer_props_schema(events: DataFrame, props_col: str = "props") -> DataFrame:
    """(prop_key, inferred_type, n_values) per distinct JSON property
    key, where inferred_type is the widest shape over all observed
    values: every value integral → ``long``; else every value numeric →
    ``double``; else every value true/false → ``boolean``; else
    ``string``. NULL/absent values don't narrow or widen anything
    (a key seen as int in some events and absent in others stays
    long — Rakam's new-column semantics: old rows read NULL)."""
    m = F.from_json(F.col(props_col), "map<string,string>")
    kv = events.select(F.explode(m).alias("k", "v")).filter(F.col("v").isNotNull())
    agg = kv.groupBy(F.col("k").alias("prop_key")).agg(
        F.count(F.lit(1)).alias("n_values"),
        F.max(F.when(F.col("v").rlike(_INT_RE), 0).otherwise(1)).alias("_nonint"),
        F.max(F.when(F.col("v").rlike(_NUM_RE), 0).otherwise(1)).alias("_nonnum"),
        F.max(F.when(F.col("v").rlike(_BOOL_RE), 0).otherwise(1)).alias("_nonbool"),
    )
    inferred = (
        F.when(F.col("_nonint") == 0, "long")
        .when(F.col("_nonnum") == 0, "double")
        .when(F.col("_nonbool") == 0, "boolean")
        .otherwise("string")
    )
    return agg.select("prop_key", inferred.alias("inferred_type"), "n_values")


def infer_props_schema_oracle(table: str = "events", props_col: str = "props") -> str:
    return f"""
    WITH keys AS (
      SELECT unnest(json_keys({props_col})) AS k, {props_col} AS p FROM {table}),
    kv AS (
      SELECT k, json_extract_string(p, '$."' || k || '"') AS v FROM keys),
    vals AS (SELECT k, v FROM kv WHERE v IS NOT NULL),
    agg AS (
      SELECT k AS prop_key, count(*) AS n_values,
             max(CASE WHEN regexp_full_match(v, '{_INT_RE.strip("^$")}') THEN 0 ELSE 1 END) AS nonint,
             max(CASE WHEN regexp_full_match(v, '{_NUM_RE.strip("^$")}') THEN 0 ELSE 1 END) AS nonnum,
             max(CASE WHEN regexp_full_match(v, '{_BOOL_RE.strip("^$")}') THEN 0 ELSE 1 END) AS nonbool
      FROM vals GROUP BY k)
    SELECT prop_key,
           CASE WHEN nonint = 0 THEN 'long'
                WHEN nonnum = 0 THEN 'double'
                WHEN nonbool = 0 THEN 'boolean'
                ELSE 'string' END AS inferred_type,
           n_values
    FROM agg
    """


_TYPE_MAP = {
    "long": FieldType.LONG,
    "double": FieldType.DOUBLE,
    "boolean": FieldType.BOOLEAN,
    "string": FieldType.STRING,
}


def evolve_collection(
    metastore: Metastore,
    project: str,
    collection: str,
    events: DataFrame,
    props_col: str = "props",
    prefix: str = "props_",
) -> list[SchemaField]:
    """Rakam's ingestion-tier schema evolution: infer property types
    from a batch of events and APPEND any new ``prefix``-named columns
    to the collection via the metastore's ``add_fields`` (ordinal-
    stable — existing readers are unaffected, old rows read NULL).
    Existing fields are never re-typed (widening an existing column is
    a migration, not an evolution — same stance as ``SqlMetastore``,
    which rejects duplicate names). Returns the fields added."""
    existing = {f.name.lower() for f in metastore.get_collection(project, collection)}
    rows = infer_props_schema(events, props_col).collect()  # vocabulary-sized
    new = [
        SchemaField(f"{prefix}{r['prop_key']}", _TYPE_MAP[r["inferred_type"]])
        for r in sorted(rows, key=lambda r: r["prop_key"])
        if f"{prefix}{r['prop_key']}".lower() not in existing
    ]
    if new:
        metastore.add_fields(project, collection, new)
    return new
