"""Minimal pure-Python Apache Avro object-container-file codec.

Why this exists: BASELINE.json's north_rule puts the production corpus
in Iceberg tables, and Iceberg's table metadata (manifest lists and
manifest files) is stored as Avro object container files — but this
sandbox has no Iceberg runtime jars, no pyiceberg, no fastavro, and no
DuckDB avro extension. `sources/iceberg.py` therefore needs its own
spec-faithful codec. Everything here is written against the PUBLIC
Apache Avro 1.11 specification (binary encoding + object container
files); nothing is Iceberg-specific, and the DECODER is fully generic —
it interprets whatever writer schema is embedded in the file, so real
manifests written by the Java Iceberg library decode with the same code
path as our own fixtures.

Scope (exactly what Iceberg metadata needs, loudly refusing the rest):
- types: null, boolean, int, long, float, double, bytes, string,
  record, enum, array, map, union, fixed — plus named-type references
  (Iceberg manifest schemas reference nested records like ``r2`` /
  ``k117_v118`` by name);
- codecs: ``null`` and ``deflate`` (raw RFC-1951 via zlib, the Avro
  spec's definition); snappy/zstd raise ``AvroCodecError`` because the
  compressors are not in this container;
- logical types are surfaced raw (e.g. ``timestamp-micros`` stays an
  int64), matching how Iceberg single-value stats are consumed.

Encoding invariants the writer follows (all per spec):
- int/long: zigzag then LEB128 varint;
- float/double: IEEE-754 little-endian;
- bytes/string: long(length) prefix;
- array/map: one positive-count block then a 0 terminator (block sizes
  omitted — readers must not require them; ours doesn't);
- union: long branch index then the branch value;
- container: ``Obj\\x01`` magic, file-metadata map (``avro.schema``,
  ``avro.codec``), 16-byte sync marker, then blocks of
  (count, byte-size, payload, sync).
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float",
               "double", "bytes", "string"}


class AvroError(ValueError):
    pass


class AvroCodecError(AvroError):
    pass


# ---------------------------------------------------------------------
# binary decoder
# ---------------------------------------------------------------------

class _Cursor:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.buf)

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.buf):
            raise AvroError(
                f"truncated avro data: need {n} bytes at {self.pos}, "
                f"have {len(self.buf) - self.pos}")
        out = self.buf[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.take(1)[0]
            acc |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
            if shift > 70:
                raise AvroError("varint too long")
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise AvroError(f"negative bytes length {n}")
        return self.take(n)


def _resolve_named(schema, names: dict):
    """Resolve a string schema: primitive or a previously-defined name."""
    if schema in _PRIMITIVES:
        return schema
    if schema in names:
        return names[schema]
    raise AvroError(f"unresolved schema name {schema!r}")


def _register_named(schema: dict, names: dict) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        names[name] = schema
        if ns:
            names[f"{ns}.{name}"] = schema


def _decode(schema, cur: _Cursor, names: dict):
    if isinstance(schema, str):
        schema = _resolve_named(schema, names)
        if isinstance(schema, str):
            t = schema
        else:
            return _decode(schema, cur, names)
    elif isinstance(schema, list):  # union
        idx = cur.read_long()
        if not (0 <= idx < len(schema)):
            raise AvroError(f"union branch {idx} out of range")
        return _decode(schema[idx], cur, names)
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # {"type": {...}} wrapper
            return _decode(t, cur, names)

    if t == "null":
        return None
    if t == "boolean":
        return cur.take(1)[0] != 0
    if t in ("int", "long"):
        return cur.read_long()
    if t == "float":
        return struct.unpack("<f", cur.take(4))[0]
    if t == "double":
        return struct.unpack("<d", cur.take(8))[0]
    if t == "bytes":
        return cur.read_bytes()
    if t == "string":
        return cur.read_bytes().decode("utf-8")
    if t == "record":
        _register_named(schema, names)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], cur, names)
        return out
    if t == "enum":
        _register_named(schema, names)
        idx = cur.read_long()
        symbols = schema["symbols"]
        if not (0 <= idx < len(symbols)):
            raise AvroError(f"enum index {idx} out of range")
        return symbols[idx]
    if t == "fixed":
        _register_named(schema, names)
        return cur.take(schema["size"])
    if t == "array":
        out = []
        while True:
            n = cur.read_long()
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                cur.read_long()
            for _ in range(n):
                out.append(_decode(schema["items"], cur, names))
        return out
    if t == "map":
        out = {}
        while True:
            n = cur.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                cur.read_long()
            for _ in range(n):
                k = cur.read_bytes().decode("utf-8")
                out[k] = _decode(schema["values"], cur, names)
        return out
    raise AvroError(f"unsupported avro type {t!r}")


def _predeclare(schema, names: dict) -> None:
    """Walk a schema tree registering named types, so forward/backward
    name references resolve regardless of field order."""
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            _register_named(schema, names)
        if t == "record":
            for f in schema.get("fields", []):
                _predeclare(f.get("type"), names)
        elif t == "array":
            _predeclare(schema.get("items"), names)
        elif t == "map":
            _predeclare(schema.get("values"), names)
        elif isinstance(t, (dict, list)):
            _predeclare(t, names)
    elif isinstance(schema, list):
        for s in schema:
            _predeclare(s, names)


def read_container(path: str):
    """Read an Avro object container file.

    Returns ``(writer_schema, records)`` — ``records`` is a list of
    plain Python values decoded per the embedded writer schema.
    """
    with open(path, "rb") as fh:
        data = fh.read()
    cur = _Cursor(data)
    if cur.take(4) != MAGIC:
        raise AvroError(f"{path}: not an avro object container file")
    meta = {}
    while True:
        n = cur.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            cur.read_long()
        for _ in range(n):
            k = cur.read_bytes().decode("utf-8")
            meta[k] = cur.read_bytes()
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroCodecError(
            f"{path}: avro codec {codec!r} needs a compressor this "
            "container doesn't ship (supported: null, deflate)")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    names: dict = {}
    _predeclare(schema, names)
    sync = cur.take(16)
    records = []
    while not cur.eof():
        count = cur.read_long()
        size = cur.read_long()
        block = cur.take(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        bc = _Cursor(block)
        for _ in range(count):
            records.append(_decode(schema, bc, dict(names)))
        if cur.take(16) != sync:
            raise AvroError(f"{path}: sync marker mismatch")
    return schema, records


# ---------------------------------------------------------------------
# binary encoder
# ---------------------------------------------------------------------

def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63)  # zigzag (arithmetic shift keeps sign law)
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _encode(schema, value, out: io.BytesIO, names: dict) -> None:
    if isinstance(schema, str):
        schema = _resolve_named(schema, names)
        if isinstance(schema, str):
            t = schema
        else:
            return _encode(schema, value, out, names)
    elif isinstance(schema, list):  # union: ["null", X] convention
        if value is None:
            for i, s in enumerate(schema):
                if s == "null":
                    _write_long(out, i)
                    return
            raise AvroError("None for union without a null branch")
        for i, s in enumerate(schema):
            if s != "null":
                _write_long(out, i)
                return _encode(s, value, out, names)
        raise AvroError("union has only a null branch")
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            return _encode(t, value, out, names)

    if t == "null":
        if value is not None:
            raise AvroError(f"non-null value {value!r} for null type")
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _write_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if t == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if t == "bytes":
        _write_bytes(out, bytes(value))
        return
    if t == "string":
        _write_bytes(out, value.encode("utf-8"))
        return
    if t == "record":
        _register_named(schema, names)
        for f in schema["fields"]:
            if f["name"] not in value:
                raise AvroError(f"record value missing field {f['name']!r}")
            _encode(f["type"], value[f["name"]], out, names)
        return
    if t == "enum":
        _register_named(schema, names)
        _write_long(out, schema["symbols"].index(value))
        return
    if t == "fixed":
        _register_named(schema, names)
        if len(value) != schema["size"]:
            raise AvroError("fixed size mismatch")
        out.write(bytes(value))
        return
    if t == "array":
        if value:
            _write_long(out, len(value))
            for v in value:
                _encode(schema["items"], v, out, names)
        _write_long(out, 0)
        return
    if t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, str(k).encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
        return
    raise AvroError(f"unsupported avro type {t!r}")


def write_container(path: str, schema: dict, records: list,
                    codec: str = "deflate",
                    meta: dict[str, bytes] | None = None,
                    sync: bytes | None = None) -> None:
    """Write an Avro object container file (one block).

    ``sync`` may be pinned for deterministic fixtures; defaults to a
    16-byte digest of the schema+record-count (content-derived, so
    repeated builds of the same fixture are byte-identical — this repo's
    parallelism/retry-invariance discipline).
    """
    if codec not in ("null", "deflate"):
        raise AvroCodecError(f"unsupported write codec {codec!r}")
    names: dict = {}
    _predeclare(schema, names)
    body = io.BytesIO()
    for rec in records:
        _encode(schema, rec, body, dict(names))
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    if sync is None:
        import hashlib
        sync = hashlib.sha256(
            json.dumps(schema, sort_keys=True).encode()
            + len(records).to_bytes(8, "little")).digest()[:16]
    out = io.BytesIO()
    out.write(MAGIC)
    fmeta = {"avro.schema": json.dumps(schema).encode("utf-8"),
             "avro.codec": codec.encode("utf-8")}
    if meta:
        fmeta.update(meta)
    _write_long(out, len(fmeta))
    for k, v in fmeta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    if records:
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    with open(path, "wb") as fh:
        fh.write(out.getvalue())
