"""Pure-Python Avro binary codec with reader-schema resolution.

Why this exists: the reference's production decode path is Avro
(``KafkaConnectorPageSource.java:298-301`` feeding ``PageDatumReader``),
and its evolution semantics come from Avro's ResolvingDecoder plus
``Schema.applyAliases`` (``PageDatumReader.java:68-93``, alias
application at ``:84``). Spark's JVM ``from_avro`` is an external
module (``spark-avro``) that may be absent from a deployment's
classpath — and is absent from this build environment — so the engine
carries a self-contained decoder implementing the same public Avro
1.x binary format and resolution rules:

* **field matching by name**, with **reader aliases** applied to
  writer field names (``Schema.applyAliases`` parity);
* writer fields missing from the reader are **skipped** (their bytes
  are consumed without materialization);
* reader fields missing from the writer take their **default**;
* **promotions**: int→long/float/double, long→float/double,
  float→double, string↔bytes;
* **unions** resolve per-datum by branch index;
* **enums decode to their symbol string** — the reference reads enums
  as strings into VARCHAR columns (``PageDatumReader.java:137-138``).

Encoding support exists so tests (and local tooling) can produce real
Avro payloads without external dependencies. This codec implements the
Apache Avro specification (public document); no code is derived from
the Java implementation.

Scale note: this codec is the **fallback** decode path, executed
row-at-a-time inside Arrow-batched ``mapInPandas`` workers
(:mod:`.kafka`). When ``spark-avro`` is on the classpath the engine
uses JVM ``from_avro`` (vectorized, codegen) instead — the fallback
trades throughput for universality, never correctness.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import struct as _struct
from typing import Any

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1)

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

#: writer type -> allowed reader types (Avro spec "Schema Resolution").
_PROMOTIONS = {
    "int": {"int", "long", "float", "double"},
    "long": {"long", "float", "double"},
    "float": {"float", "double"},
    "double": {"double"},
    "string": {"string", "bytes"},
    "bytes": {"bytes", "string"},
    "boolean": {"boolean"},
    "null": {"null"},
}


class AvroSchemaError(ValueError):
    """Invalid or irreconcilable schema."""


class AvroDecodeError(ValueError):
    """Malformed datum — the corrupt-record path (A14) catches this."""


def parse_schema(schema: str | dict | list) -> dict | list:
    """Normalize a schema given as JSON text / dict / union list.

    Primitive names normalize to ``{"type": name}`` so every node is a
    dict (unions stay lists). Named-type *references* are not supported
    — the reference's lattice (SURVEY §1.5) is flat records of
    primitives/enums plus our array/map extension, with no recursion.
    """
    if isinstance(schema, str):
        s = schema.strip()
        if s.startswith("{") or s.startswith("["):
            return parse_schema(json.loads(s))
        if s in _PRIMITIVES:
            return {"type": s}
        raise AvroSchemaError(f"unsupported schema reference: {schema!r}")
    if isinstance(schema, list):
        return [parse_schema(b) for b in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if isinstance(t, (dict, list)):  # {"type": {...}} wrapper
            return parse_schema(t)
        out = dict(schema)
        if t == "record":
            out["fields"] = [
                {**f, "type": parse_schema(f["type"])} for f in schema["fields"]
            ]
        elif t == "array":
            out["items"] = parse_schema(schema["items"])
        elif t == "map":
            out["values"] = parse_schema(schema["values"])
        elif t == "enum":
            if not schema.get("symbols"):
                raise AvroSchemaError("enum schema requires symbols")
        elif t == "fixed":
            if "size" not in schema:
                raise AvroSchemaError("fixed schema requires size")
        elif t not in _PRIMITIVES:
            raise AvroSchemaError(f"unsupported schema type: {t!r}")
        return out
    raise AvroSchemaError(f"unsupported schema node: {schema!r}")


# ---------------------------------------------------------------------
# Binary primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    z &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if n < 0 or self.pos + n > len(self.buf):
            raise AvroDecodeError("truncated datum")
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            if self.pos >= len(self.buf):
                raise AvroDecodeError("truncated varint")
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroDecodeError("varint too long")
        return (acc >> 1) ^ -(acc & 1)

    def done(self) -> bool:
        return self.pos >= len(self.buf)


# ---------------------------------------------------------------------
# Encoding (tests / tooling)
# ---------------------------------------------------------------------


def _union_branch_for(value: Any, branches: list[dict]) -> tuple[int, dict]:
    """Pick the first union branch that can hold ``value``."""
    def matches(b: dict) -> bool:
        t = b["type"]
        if value is None:
            return t == "null"
        if isinstance(value, bool):
            return t == "boolean"
        if isinstance(value, int):
            return t in {"int", "long"}
        if isinstance(value, float):
            return t in {"float", "double"}
        if isinstance(value, str):
            return t in {"string", "enum"}
        if isinstance(value, (bytes, bytearray)):
            return t in {"bytes", "fixed"}
        if isinstance(value, _dt.datetime):
            return t == "long"
        if isinstance(value, _dt.date):
            return t == "int"
        if isinstance(value, dict):
            return t in {"record", "map"}
        if isinstance(value, (list, tuple)):
            return t == "array"
        return False

    for i, b in enumerate(branches):
        if matches(b):
            return i, b
    raise AvroSchemaError(f"no union branch for {type(value).__name__}")


def _encode_value(value: Any, schema: dict | list, out: bytearray) -> None:
    if isinstance(schema, list):
        i, branch = _union_branch_for(value, schema)
        out += _zigzag_encode(i)
        _encode_value(value, branch, out)
        return
    t = schema["type"]
    if t == "null":
        return
    if value is None:
        raise AvroSchemaError(f"None for non-null type {t}")
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in {"int", "long"}:
        if schema.get("logicalType") == "date" and isinstance(value, _dt.date):
            value = (value - _EPOCH_DATE).days
        elif schema.get("logicalType") == "timestamp-micros" and isinstance(
            value, _dt.datetime
        ):
            value = int((value - _EPOCH_TS).total_seconds() * 1_000_000)
        out += _zigzag_encode(int(value))
    elif t == "float":
        out += _struct.pack("<f", float(value))
    elif t == "double":
        out += _struct.pack("<d", float(value))
    elif t == "string":
        raw = str(value).encode("utf-8")
        out += _zigzag_encode(len(raw))
        out += raw
    elif t == "bytes":
        raw = bytes(value)
        out += _zigzag_encode(len(raw))
        out += raw
    elif t == "fixed":
        raw = bytes(value)
        if len(raw) != schema["size"]:
            raise AvroSchemaError("fixed size mismatch")
        out += raw
    elif t == "enum":
        try:
            out += _zigzag_encode(schema["symbols"].index(value))
        except ValueError:
            raise AvroSchemaError(f"{value!r} not in enum symbols") from None
    elif t == "array":
        items = list(value)
        if items:
            out += _zigzag_encode(len(items))
            for v in items:
                _encode_value(v, schema["items"], out)
        out += _zigzag_encode(0)
    elif t == "map":
        if value:
            out += _zigzag_encode(len(value))
            for k, v in value.items():
                raw = str(k).encode("utf-8")
                out += _zigzag_encode(len(raw))
                out += raw
                _encode_value(v, schema["values"], out)
        out += _zigzag_encode(0)
    elif t == "record":
        for f in schema["fields"]:
            _encode_value(value.get(f["name"]), f["type"], out)
    else:  # pragma: no cover - parse_schema rejects unknown types
        raise AvroSchemaError(f"unsupported type {t}")


def encode(value: dict, schema: str | dict) -> bytes:
    """Encode one record datum to Avro binary."""
    out = bytearray()
    _encode_value(value, parse_schema(schema), out)
    return bytes(out)


# ---------------------------------------------------------------------
# Decoding with resolution
# ---------------------------------------------------------------------


def _skip(schema: dict | list, r: _Reader) -> None:
    if isinstance(schema, list):
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroDecodeError("union index out of range")
        _skip(schema[idx], r)
        return
    t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        r.read(1)
    elif t in {"int", "long", "enum"}:
        r.read_long()
    elif t == "float":
        r.read(4)
    elif t == "double":
        r.read(8)
    elif t in {"string", "bytes"}:
        r.read(r.read_long())
    elif t == "fixed":
        r.read(schema["size"])
    elif t == "array":
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read(r.read_long())  # block size in bytes -> skip whole block
                continue
            for _ in range(n):
                _skip(schema["items"], r)
    elif t == "map":
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                r.read(r.read_long())
                continue
            for _ in range(n):
                r.read(r.read_long())
                _skip(schema["values"], r)
    elif t == "record":
        for f in schema["fields"]:
            _skip(f["type"], r)
    else:  # pragma: no cover
        raise AvroDecodeError(f"cannot skip type {t}")


def _first_non_null(schema: dict | list) -> dict:
    if isinstance(schema, list):
        for b in schema:
            if b["type"] != "null":
                return b
        return schema[0]
    return schema


def _read_resolved(writer: dict | list, reader: dict | list, r: _Reader) -> Any:
    # Writer union: the datum says which branch was written.
    if isinstance(writer, list):
        idx = r.read_long()
        if not 0 <= idx < len(writer):
            raise AvroDecodeError("union index out of range")
        return _read_resolved(writer[idx], reader, r)
    # Reader union, writer concrete: find the reader branch the writer
    # type resolves to (spec: "first matching branch").
    if isinstance(reader, list):
        for branch in reader:
            if _resolvable(writer, branch):
                return _read_resolved(writer, branch, r)
        raise AvroDecodeError(
            f"writer type {writer['type']} matches no reader union branch"
        )

    wt, rt = writer["type"], reader["type"]
    if wt == "null":
        if rt != "null":
            raise AvroDecodeError("writer null vs non-null reader")
        return None
    if wt == "boolean":
        return r.read(1) != b"\x00"
    if wt in {"int", "long"}:
        v = r.read_long()
        if rt == "float" or rt == "double":
            return float(v)
        if rt not in {"int", "long"}:
            raise AvroDecodeError(f"cannot promote {wt} to {rt}")
        lt = reader.get("logicalType") or writer.get("logicalType")
        if lt == "date":
            return _EPOCH_DATE + _dt.timedelta(days=v)
        if lt == "timestamp-micros":
            return _EPOCH_TS + _dt.timedelta(microseconds=v)
        if lt == "timestamp-millis":
            return _EPOCH_TS + _dt.timedelta(milliseconds=v)
        return v
    if wt == "float":
        v = _struct.unpack("<f", r.read(4))[0]
        if rt not in {"float", "double"}:
            raise AvroDecodeError(f"cannot promote float to {rt}")
        return v
    if wt == "double":
        if rt != "double":
            raise AvroDecodeError(f"cannot promote double to {rt}")
        return _struct.unpack("<d", r.read(8))[0]
    if wt == "string":
        raw = r.read(r.read_long())
        if rt == "bytes":
            return raw
        if rt != "string":
            raise AvroDecodeError(f"cannot read string as {rt}")
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError as e:
            raise AvroDecodeError("invalid utf-8 in string") from e
    if wt == "bytes":
        raw = r.read(r.read_long())
        if rt == "string":
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError as e:
                raise AvroDecodeError("invalid utf-8 in bytes->string") from e
        if rt != "bytes":
            raise AvroDecodeError(f"cannot read bytes as {rt}")
        return raw
    if wt == "fixed":
        if rt != "fixed" or reader.get("size") != writer["size"]:
            raise AvroDecodeError("fixed mismatch")
        return r.read(writer["size"])
    if wt == "enum":
        idx = r.read_long()
        symbols = writer["symbols"]
        if not 0 <= idx < len(symbols):
            raise AvroDecodeError("enum index out of range")
        symbol = symbols[idx]
        # Enum-as-string (PageDatumReader.java:137-138 reads the enum
        # into a string column): the reader may be a plain string OR an
        # enum whose symbol set must contain the written symbol.
        if rt == "enum" and symbol not in reader["symbols"]:
            raise AvroDecodeError(f"enum symbol {symbol!r} not in reader symbols")
        if rt not in {"enum", "string"}:
            raise AvroDecodeError(f"cannot read enum as {rt}")
        return symbol
    if wt == "array":
        if rt != "array":
            raise AvroDecodeError(f"cannot read array as {rt}")
        items = []
        while True:
            n = r.read_long()
            if n == 0:
                return items
            if n < 0:
                n = -n
                r.read_long()  # block byte size, unused when materializing
            for _ in range(n):
                items.append(_read_resolved(writer["items"], reader["items"], r))
    if wt == "map":
        if rt != "map":
            raise AvroDecodeError(f"cannot read map as {rt}")
        out: dict[str, Any] = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long())
                try:
                    key = k.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise AvroDecodeError("invalid utf-8 map key") from e
                out[key] = _read_resolved(writer["values"], reader["values"], r)
    if wt == "record":
        if rt != "record":
            raise AvroDecodeError(f"cannot read record as {rt}")
        return _read_record(writer, reader, r)
    raise AvroDecodeError(f"unsupported writer type {wt}")


def _resolvable(writer: dict, reader: dict) -> bool:
    wt, rt = writer["type"], reader["type"]
    if wt in _PROMOTIONS:
        return rt in _PROMOTIONS[wt]
    if wt == "enum":
        return rt in {"enum", "string"}
    if wt in {"record", "array", "map", "fixed"}:
        return rt == wt
    return False


def _reader_field_index(reader: dict) -> dict[str, dict]:
    """name → reader field, including alias names (Schema.applyAliases
    parity — ``PageDatumReader.java:84``): a reader field declaring
    ``aliases`` also matches writer fields under any of those names."""
    index: dict[str, dict] = {}
    for f in reader["fields"]:
        index[f["name"]] = f
    for f in reader["fields"]:
        for alias in f.get("aliases", ()):  # aliases never shadow real names
            index.setdefault(alias, f)
    return index


def _default_for(field: dict) -> Any:
    if "default" in field:
        d = field["default"]
        t = _first_non_null(field["type"])
        if d is not None and t["type"] == "bytes" and isinstance(d, str):
            return d.encode("latin-1")  # spec: bytes defaults are ÿ strings
        return d
    # No default: a nullable union still has a well-defined absent value.
    ft = field["type"]
    if isinstance(ft, list) and any(b["type"] == "null" for b in ft):
        return None
    raise AvroDecodeError(
        f"reader field {field['name']!r} absent from writer and has no default"
    )


def _read_record(writer: dict, reader: dict, r: _Reader) -> dict[str, Any]:
    index = _reader_field_index(reader)
    out: dict[str, Any] = {}
    seen: set[str] = set()
    for wf in writer["fields"]:
        rf = index.get(wf["name"])
        if rf is None:
            _skip(wf["type"], r)  # writer-only field: consume, drop
        else:
            out[rf["name"]] = _read_resolved(wf["type"], rf["type"], r)
            seen.add(rf["name"])
    for rf in reader["fields"]:
        if rf["name"] not in seen:
            out[rf["name"]] = _default_for(rf)
    return out


def decode_parsed(data: bytes, writer: dict, reader: dict) -> dict[str, Any]:
    """Decode one datum with schemas already normalized by
    :func:`parse_schema` — the per-batch hot loop entry point (parsing
    the schema JSON once per partition, not once per record)."""
    r = _Reader(data)
    out = _read_record(writer, reader, r)
    if not r.done():
        raise AvroDecodeError("trailing bytes after datum")
    return out


# ---------------------------------------------------------------------
# Compiled read plans (resolution amortized once per (writer, reader))
# ---------------------------------------------------------------------
#
# The interpreted path above re-walks both schemas per record:
# `_read_record` rebuilds the alias index and `_read_resolved` re-does
# string type dispatch for every value. The reference amortizes this by
# caching one resolver per thread (``PageDatumReader.java:58-93``);
# here `compile_read_plan` resolves the (writer, reader) pair ONCE into
# a closure tree — each node knows its concrete read action — and the
# per-record work is just driving those closures over the buffer.
# Measured ~2.9× over the interpreted path on flat event records
# (SCALE_NOTES.md §avro-decode).


def _compile_skip(schema: dict | list):
    def skip(r: _Reader):
        _skip(schema, r)
        return None

    return skip


def _compile_long(reader: dict):
    rt = reader["type"]
    if rt in {"float", "double"}:
        return lambda r: float(r.read_long())
    if rt not in {"int", "long"}:
        raise AvroSchemaError(f"cannot promote int/long to {rt}")
    lt = reader.get("logicalType")

    def with_writer_logical(wlt):
        lt_eff = lt or wlt
        if lt_eff == "date":
            return lambda r: _EPOCH_DATE + _dt.timedelta(days=r.read_long())
        if lt_eff == "timestamp-micros":
            return lambda r: _EPOCH_TS + _dt.timedelta(microseconds=r.read_long())
        if lt_eff == "timestamp-millis":
            return lambda r: _EPOCH_TS + _dt.timedelta(milliseconds=r.read_long())
        return lambda r: r.read_long()

    return with_writer_logical


def _compile_resolved_plan(writer: dict | list, reader: dict | list):
    """fn(_Reader) -> value for one resolved (writer, reader) node.

    Irreconcilable schema pairs raise :class:`AvroSchemaError` at
    COMPILE time (loud, once) instead of per-record decode errors that
    the corrupt-record path would silently drop (A14 is for corrupt
    DATA, not wrong schemas)."""
    if isinstance(writer, list):
        branches = []
        for b in writer:
            try:
                branches.append(_compile_resolved_plan(b, reader))
            except AvroSchemaError as e:
                # A written branch the reader can't hold is a DATA error
                # when (and only when) a datum actually uses it.
                msg = str(e)

                def unreadable(r: _Reader, _m=msg):
                    raise AvroDecodeError(_m)

                branches.append(unreadable)
        n = len(branches)

        def read_union(r: _Reader):
            idx = r.read_long()
            if not 0 <= idx < n:
                raise AvroDecodeError("union index out of range")
            return branches[idx](r)

        return read_union
    if isinstance(reader, list):
        for branch in reader:
            if _resolvable(writer, branch):
                return _compile_resolved_plan(writer, branch)
        raise AvroSchemaError(
            f"writer type {writer['type']} matches no reader union branch"
        )

    wt, rt = writer["type"], reader["type"]
    if wt == "null":
        if rt != "null":
            raise AvroSchemaError("writer null vs non-null reader")
        return lambda r: None
    if wt == "boolean":
        if rt != "boolean":
            raise AvroSchemaError(f"cannot read boolean as {rt}")
        return lambda r: r.read(1) != b"\x00"
    if wt in {"int", "long"}:
        return _compile_long(reader)(writer.get("logicalType"))
    if wt == "float":
        if rt not in {"float", "double"}:
            raise AvroSchemaError(f"cannot promote float to {rt}")
        return lambda r: _struct.unpack("<f", r.read(4))[0]
    if wt == "double":
        if rt != "double":
            raise AvroSchemaError(f"cannot promote double to {rt}")
        return lambda r: _struct.unpack("<d", r.read(8))[0]
    if wt == "string":
        if rt == "bytes":
            return lambda r: r.read(r.read_long())
        if rt != "string":
            raise AvroSchemaError(f"cannot read string as {rt}")

        def read_string(r: _Reader):
            raw = r.read(r.read_long())
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError as e:
                raise AvroDecodeError("invalid utf-8 in string") from e

        return read_string
    if wt == "bytes":
        if rt == "string":

            def read_bytes_str(r: _Reader):
                raw = r.read(r.read_long())
                try:
                    return raw.decode("utf-8")
                except UnicodeDecodeError as e:
                    raise AvroDecodeError("invalid utf-8 in bytes->string") from e

            return read_bytes_str
        if rt != "bytes":
            raise AvroSchemaError(f"cannot read bytes as {rt}")
        return lambda r: r.read(r.read_long())
    if wt == "fixed":
        if rt != "fixed" or reader.get("size") != writer["size"]:
            raise AvroSchemaError("fixed mismatch")
        size = writer["size"]
        return lambda r: r.read(size)
    if wt == "enum":
        if rt not in {"enum", "string"}:
            raise AvroSchemaError(f"cannot read enum as {rt}")
        symbols = writer["symbols"]
        allowed = set(reader["symbols"]) if rt == "enum" else None
        n_sym = len(symbols)

        def read_enum(r: _Reader):
            idx = r.read_long()
            if not 0 <= idx < n_sym:
                raise AvroDecodeError("enum index out of range")
            symbol = symbols[idx]
            if allowed is not None and symbol not in allowed:
                raise AvroDecodeError(
                    f"enum symbol {symbol!r} not in reader symbols"
                )
            return symbol

        return read_enum
    if wt == "array":
        if rt != "array":
            raise AvroSchemaError(f"cannot read array as {rt}")
        item = _compile_resolved_plan(writer["items"], reader["items"])

        def read_array(r: _Reader):
            items = []
            while True:
                n = r.read_long()
                if n == 0:
                    return items
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    items.append(item(r))

        return read_array
    if wt == "map":
        if rt != "map":
            raise AvroSchemaError(f"cannot read map as {rt}")
        value = _compile_resolved_plan(writer["values"], reader["values"])

        def read_map(r: _Reader):
            out: dict[str, Any] = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read(r.read_long())
                    try:
                        key = k.decode("utf-8")
                    except UnicodeDecodeError as e:
                        raise AvroDecodeError("invalid utf-8 map key") from e
                    out[key] = value(r)

        return read_map
    if wt == "record":
        if rt != "record":
            raise AvroSchemaError(f"cannot read record as {rt}")
        return _compile_record_plan(writer, reader)
    raise AvroSchemaError(f"unsupported writer type {wt}")


def _compile_record_plan(writer: dict, reader: dict):
    import copy as _copy

    index = _reader_field_index(reader)
    steps: list[tuple[str | None, Any]] = []
    seen: set[str] = set()
    for wf in writer["fields"]:
        rf = index.get(wf["name"])
        if rf is None:
            steps.append((None, _compile_skip(wf["type"])))
        else:
            steps.append((rf["name"], _compile_resolved_plan(wf["type"], rf["type"])))
            seen.add(rf["name"])
    defaults: list[tuple[str, Any, bool]] = []  # (name, value, needs_copy)
    for rf in reader["fields"]:
        if rf["name"] not in seen:
            d = _default_for(rf)  # missing default raises here, at compile
            defaults.append((rf["name"], d, isinstance(d, (dict, list))))

    def read_record(r: _Reader):
        out: dict[str, Any] = {}
        for name, fn in steps:
            v = fn(r)
            if name is not None:
                out[name] = v
        for name, d, needs_copy in defaults:
            out[name] = _copy.deepcopy(d) if needs_copy else d
        return out

    return read_record


def compile_read_plan(
    writer_schema: str | dict, reader_schema: str | dict | None = None
):
    """Resolve (writer, reader) once; return ``decode_one(bytes) -> dict``.

    The per-worker entry point for batch decode loops: schema parsing,
    alias indexing, promotion checks, and logical-type dispatch all
    happen HERE, once — the returned closure does none of it per record
    (the reference's per-thread resolver cache,
    ``PageDatumReader.java:58-93``, as a compile step)."""
    writer = parse_schema(writer_schema)
    reader = parse_schema(reader_schema) if reader_schema is not None else writer
    if not (isinstance(writer, dict) and writer.get("type") == "record"):
        raise AvroSchemaError("writer schema must be a record")
    if not (isinstance(reader, dict) and reader.get("type") == "record"):
        raise AvroSchemaError("reader schema must be a record")
    read_record = _compile_record_plan(writer, reader)

    def decode_one(data: bytes) -> dict[str, Any]:
        r = _Reader(data)
        out = read_record(r)
        if not r.done():
            raise AvroDecodeError("trailing bytes after datum")
        return out

    return decode_one


def decode(
    data: bytes, writer_schema: str | dict, reader_schema: str | dict | None = None
) -> dict[str, Any]:
    """Decode one Avro-binary record datum, resolving writer → reader.

    Raises :class:`AvroDecodeError` on any malformed input (the caller
    treats that as a corrupt record, A14). Trailing garbage after the
    datum is rejected — a Kafka message carries exactly one datum.
    """
    writer = parse_schema(writer_schema)
    reader = parse_schema(reader_schema) if reader_schema is not None else writer
    if not (isinstance(writer, dict) and writer.get("type") == "record"):
        raise AvroSchemaError("writer schema must be a record")
    if not (isinstance(reader, dict) and reader.get("type") == "record"):
        raise AvroSchemaError("reader schema must be a record")
    return decode_parsed(data, writer, reader)


# ---------------------------------------------------------------------
# Confluent Schema Registry wire format (round 10)
# ---------------------------------------------------------------------
#
# On a real Kafka estate, messages rarely carry bare Avro datums: the
# de-facto standard is Confluent's wire format — 1 magic byte (0x00),
# a 4-byte BIG-ENDIAN schema id, then the Avro binary datum — with the
# id resolved against a Schema Registry, so one topic can interleave
# records written under DIFFERENT schema versions. The format is a
# public Confluent specification ("Wire format", Schema Registry docs);
# nothing here talks to any registry service — the registry below is a
# static snapshot (dict / JSON file) of id → writer schema, which is
# exactly what a Spark executor needs at decode time (the real HTTP
# client is a pluggable fetch for the same mapping).
#
# The reference decodes a SINGLE table-configured writer schema
# (KafkaConnectorPageSource.java:89); this is the beyond-reference
# surface a user migrating a Confluent-serialized topic needs, and the
# JVM `from_avro` cannot express it (one writer schema per call, no
# per-record dispatch) — so the wire path always runs through this
# codec's compiled plans, one per schema id, cached per task.

_WIRE_MAGIC = 0


class SchemaRegistry:
    """id → writer schema (a static snapshot of a Schema Registry
    subject's versions). ``schemas`` maps int ids to schema JSON
    strings/dicts; ids are arbitrary (registry ids are global, not
    dense). Unknown ids raise :class:`AvroDecodeError` at decode time
    — the caller's corrupt-record policy (A14) decides drop-vs-fail."""

    def __init__(self, schemas: dict[int, str | dict]):
        self._schemas = {int(k): parse_schema(v) for k, v in schemas.items()}
        for sid, sch in self._schemas.items():
            if not (isinstance(sch, dict) and sch.get("type") == "record"):
                raise AvroSchemaError(
                    f"registry schema id {sid} must be a record"
                )

    @classmethod
    def from_json_file(cls, path: str) -> "SchemaRegistry":
        with open(path) as fh:
            return cls(json.load(fh))

    def writer(self, schema_id: int) -> dict:
        try:
            return self._schemas[schema_id]
        except KeyError:
            raise AvroDecodeError(
                f"schema id {schema_id} not in registry "
                f"(known: {sorted(self._schemas)})"
            ) from None

    def ids(self) -> list[int]:
        return sorted(self._schemas)

    def to_json(self) -> str:
        return json.dumps({str(k): v for k, v in self._schemas.items()})


class RefreshingSchemaRegistry:
    """Path-backed registry snapshot with fetch-on-miss reload — the
    executor-side behavior of a LIVE Schema Registry client (round 11).

    A static ``SchemaRegistry`` dict is frozen at source registration;
    on a real estate, producers register NEW schema versions while
    consumers run, and the Confluent client resolves an unseen id by
    fetching it (then caches). This class is that protocol with the
    HTTP fetch replaced by re-reading an on-disk JSON snapshot
    ``{id: writer schema}`` (the sandbox has no registry service; the
    fetch is a pluggable one-liner). Semantics:

    * known id → served from the in-memory snapshot (no I/O per record);
    * unknown id → if the snapshot FILE is unchanged since the held
      snapshot was loaded (one ``os.stat``: same inode, mtime_ns, size
      — ``os.replace`` publishing always changes the inode), the id
      definitively is not there: miss with NO reload. If the file
      changed, reload (the producer registered mid-stream) and resolve
      or miss.

    This signature gate replaces round-11's per-instance negative cache
    (ADVICE r11 #5 / VERDICT r11 #3): the negative cache never
    invalidated, so a task that probed an id before its registration
    PERMANENTLY dropped that id's frames for the task's lifetime (plans
    are reused across batches by the worker) — and a corrupt stream
    fabricating many distinct garbage ids forced one full snapshot
    re-read each. Now a garbage id costs one stat (µs, no parse),
    reload count is bounded by distinct snapshot VERSIONS observed, and
    a mid-task registration becomes visible on the next miss. A missed
    frame falls under the A14 corrupt-record policy either way.
    """

    def __init__(self, path: str):
        self._path = path
        self._snap: SchemaRegistry | None = None
        self._sig: tuple | None = None  # (ino, mtime_ns, size) at load
        #: signature of the last FAILED load (ADVICE r12 #1): a
        #: persistently unreadable/garbled snapshot version would
        #: otherwise be re-read and re-parsed on EVERY unknown-id
        #: record — the unbounded-reload cost the signature gate
        #: bounds for good versions, reappearing for bad ones. A miss
        #: whose stat matches the failed version is definitive until
        #: the file changes again.
        self._bad_sig: tuple | None = None

    def _stat_sig(self) -> tuple | None:
        try:
            st = os.stat(self._path)
        except OSError:
            return None
        return (st.st_ino, st.st_mtime_ns, st.st_size)

    def _load(self) -> None:
        """Reload the snapshot. An unreadable/torn file (a producer
        rewriting it non-atomically, a transient IO error) KEEPS the
        previous snapshot and reads as a miss (AvroDecodeError — the
        A14 corrupt-record lane) rather than escaping as
        JSONDecodeError and killing the whole scan: the registry being
        momentarily unreadable must degrade like an unknown id, not
        like a poison pill. Producers should still publish snapshots
        atomically (tmp + rename). The signature is stat'd BEFORE the
        read: if the file is replaced mid-read the held snapshot is
        NEWER than the recorded signature, so the next miss re-reloads
        (an extra reload, never a wrongly-skipped one)."""
        sig = self._stat_sig()
        try:
            with open(self._path) as fh:
                snap = SchemaRegistry(json.load(fh))
        except (OSError, ValueError, AvroSchemaError) as exc:
            # remember a GARBLED version so later misses skip the
            # re-parse until the file changes (ADVICE r12 #1): content
            # failures are deterministic per version. A torn
            # mid-replace read records the pre-replace signature, and
            # the published file's differing sig forces the re-fetch.
            # OSErrors are NOT cached — a transient I/O blip on a GOOD
            # file would otherwise poison its signature forever
            # (round-13 second review): the file never changes, so no
            # miss would ever retry the read.
            if not isinstance(exc, OSError):
                self._bad_sig = sig
            if self._snap is None:
                raise AvroDecodeError(
                    f"registry snapshot {self._path} unreadable: {exc}"
                ) from exc
            return  # keep serving the previous snapshot
        self._snap = snap
        self._sig = sig
        self._bad_sig = None

    def writer(self, schema_id: int) -> dict:
        if self._snap is None:
            self._load()
        try:
            return self._snap.writer(schema_id)
        except AvroDecodeError:
            sig = self._stat_sig()
            if sig == self._sig or sig is None or sig == self._bad_sig:
                # unchanged since load → a definitive miss. sig None
                # (file deleted / mid-replace) is ALSO a miss-now: a
                # reload attempt could not succeed anyway, and trying
                # one per record would reintroduce the per-record I/O
                # the signature gate exists to prevent (round-12 review
                # finding #5); when the file reappears its signature
                # differs and the next miss re-fetches. A sig matching
                # the last FAILED load is equally definitive — that
                # version already proved unreadable (ADVICE r12 #1).
                raise
            self._load()  # fetch-on-miss: registered mid-stream
            return self._snap.writer(schema_id)

    def ids(self) -> list[int]:
        if self._snap is None:
            self._load()
        return self._snap.ids()


def wrap_confluent(schema_id: int, datum: bytes) -> bytes:
    """Frame an Avro datum in the Confluent wire format."""
    return _struct.pack(">bI", _WIRE_MAGIC, schema_id) + datum


def unwrap_confluent(data: bytes) -> tuple[int, bytes]:
    """(schema_id, datum) — raises :class:`AvroDecodeError` on a short
    frame or wrong magic byte (both are corrupt records, never a
    different dispatch)."""
    if len(data) < 5:
        raise AvroDecodeError(
            f"confluent frame too short ({len(data)} bytes < 5-byte header)"
        )
    magic, schema_id = _struct.unpack(">bI", data[:5])
    if magic != _WIRE_MAGIC:
        raise AvroDecodeError(
            f"bad confluent magic byte {magic} (expected {_WIRE_MAGIC})"
        )
    return schema_id, data[5:]


def compile_wire_read_plan(registry: "SchemaRegistry", reader_schema: str | dict):
    """Per-task decode entry point for Confluent-framed messages:
    ``decode_one(bytes) -> dict`` resolved against the frame's OWN
    schema id. Compiled (writer→reader) plans are built lazily, once
    per id per task — the same amortization as
    :func:`compile_read_plan`, keyed by the id the wire carries, so a
    topic interleaving v1/v2/v9 writers pays three compilations, not
    one per record."""
    reader = parse_schema(reader_schema)
    if not (isinstance(reader, dict) and reader.get("type") == "record"):
        raise AvroSchemaError("reader schema must be a record")
    plans: dict[int, Any] = {}

    def decode_one(data: bytes) -> dict[str, Any]:
        schema_id, datum = unwrap_confluent(data)
        plan = plans.get(schema_id)
        if plan is None:
            writer = registry.writer(schema_id)
            read_record = _compile_record_plan(writer, reader)

            def plan(payload: bytes, _rr=read_record) -> dict[str, Any]:
                r = _Reader(payload)
                out = _rr(r)
                if not r.done():
                    raise AvroDecodeError("trailing bytes after datum")
                return out

            plans[schema_id] = plan
        return plan(datum)

    return decode_one


def compat_issues(
    writer: str | dict | list, reader: str | dict | list, path: str = "$"
) -> list[str]:
    """Why ``reader`` could NOT read data written under ``writer`` —
    empty list = resolvable. A STATIC walk of the Avro spec's "Schema
    Resolution" rules (the same rules the decode applies per datum, but
    checked up front over the whole schema): this is the vetting a
    schema registry performs before accepting a new version, so an
    incompatible producer is rejected at REGISTRATION time instead of
    surfacing as per-record decode drops in every consumer."""
    w = parse_schema(writer) if isinstance(writer, str) else writer
    r = parse_schema(reader) if isinstance(reader, str) else reader
    issues: list[str] = []

    # writer union: ANY branch may have been written → every branch
    # must be readable
    if isinstance(w, list):
        for b in w:
            issues += compat_issues(b, r, f"{path}<{b.get('type', '?')}>")
        return issues
    # reader union, writer concrete: some branch must accept it
    if isinstance(r, list):
        if any(not compat_issues(w, b, path) for b in r):
            return []
        return [f"{path}: writer {w['type']} matches no reader union branch"]

    wt, rt = w["type"], r["type"]
    if wt in _PRIMITIVES:
        if rt not in _PROMOTIONS.get(wt, ()):  # includes exact match
            return [f"{path}: cannot promote writer {wt} to reader {rt}"]
        return []
    if wt == "enum":
        if rt == "string":
            return []  # enum-as-string (the engine's VARCHAR read)
        if rt != "enum":
            return [f"{path}: writer enum vs reader {rt}"]
        missing = [s for s in w["symbols"] if s not in r["symbols"]]
        if missing and "default" not in r:
            return [
                f"{path}: writer enum symbols {missing} absent from reader "
                "and reader has no default symbol"
            ]
        return []
    if wt == "fixed":
        if rt != "fixed" or w.get("size") != r.get("size"):
            return [f"{path}: fixed size/type mismatch"]
        return []
    if wt == "array":
        if rt != "array":
            return [f"{path}: writer array vs reader {rt}"]
        return compat_issues(w["items"], r["items"], path + "[]")
    if wt == "map":
        if rt != "map":
            return [f"{path}: writer map vs reader {rt}"]
        return compat_issues(w["values"], r["values"], path + "{}")
    if wt == "record":
        if rt != "record":
            return [f"{path}: writer record vs reader {rt}"]
        index = _reader_field_index(r)
        matched: set[str] = set()
        for wf in w["fields"]:
            rf = index.get(wf["name"])
            if rf is None:
                continue  # writer-only: skipped byte-exactly, always ok
            matched.add(rf["name"])
            issues += compat_issues(
                wf["type"], rf["type"], f"{path}.{rf['name']}"
            )
        for rf in r["fields"]:
            if rf["name"] in matched:
                continue
            ft = rf["type"]
            nullable = isinstance(ft, list) and any(
                b["type"] == "null" for b in ft
            )
            if "default" not in rf and not nullable:
                issues.append(
                    f"{path}.{rf['name']}: absent from writer and has no "
                    "default"
                )
        return issues
    return [f"{path}: unsupported writer type {wt}"]


#: Registry compatibility modes (Confluent's public names): which
#: (writer, reader) directions must resolve when version N+1 arrives.
#: BACKWARD — new schema READS data written under the prior one(s);
#: FORWARD — prior reader(s) still read data the new schema writes;
#: FULL — both; NONE — anything goes. *_TRANSITIVE checks all retained
#: versions, not just the latest.
_COMPAT_MODES = {
    "NONE", "BACKWARD", "FORWARD", "FULL",
    "BACKWARD_TRANSITIVE", "FORWARD_TRANSITIVE", "FULL_TRANSITIVE",
}


def _registry_add(
    self: "SchemaRegistry",
    schema_id: int,
    schema: str | dict,
    compatibility: str = "BACKWARD",
) -> None:
    """Register a new version AFTER vetting it against the retained
    ones under ``compatibility`` — raises :class:`AvroSchemaError`
    listing every violated resolution rule. The check the real
    registry service runs server-side; here it guards the static
    snapshot the executors decode with."""
    mode = compatibility.upper()
    if mode not in _COMPAT_MODES:
        raise AvroSchemaError(f"unknown compatibility mode {compatibility!r}")
    sch = parse_schema(schema)
    if not (isinstance(sch, dict) and sch.get("type") == "record"):
        raise AvroSchemaError("registry schema must be a record")
    if int(schema_id) in self._schemas:
        raise AvroSchemaError(f"schema id {schema_id} already registered")
    if mode != "NONE" and self._schemas:
        transitive = mode.endswith("_TRANSITIVE")
        base = mode.split("_")[0]
        against = (
            sorted(self._schemas)
            if transitive
            else [max(self._schemas)]
        )
        issues: list[str] = []
        for vid in against:
            prev = self._schemas[vid]
            if base in ("BACKWARD", "FULL"):
                issues += [
                    f"BACKWARD vs id {vid}: {m}"
                    for m in compat_issues(prev, sch)
                ]
            if base in ("FORWARD", "FULL"):
                issues += [
                    f"FORWARD vs id {vid}: {m}"
                    for m in compat_issues(sch, prev)
                ]
        if issues:
            raise AvroSchemaError(
                f"schema id {schema_id} is not {mode}-compatible: "
                + "; ".join(issues)
            )
    self._schemas[int(schema_id)] = sch


SchemaRegistry.add = _registry_add
