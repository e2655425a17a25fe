"""Pure-Python Apache Iceberg v2 table format layer (no runtime jars).

BASELINE.json's north_rule and input_hint put the production corpus in
an *Iceberg table* of Common-Crawl-style pages. This sandbox has no
`iceberg-spark-runtime` jars, no pyiceberg and no Avro library
(SURVEY.md §9), so until round 5 the repo only *abstracted* the format
(`sources/catalog.py`) and reimplemented its manifest/stats-pruning/
optimistic-commit ideas in a parquet-native sibling
(`sources/snapshots.py`). This module closes the remaining gap at the
FORMAT level: it reads and writes real Iceberg v2 table metadata —
`vN.metadata.json`, Avro manifest lists, Avro manifests, positional and
equality delete files — using `sources/avroio.py` (spec-faithful pure
Python) and plans scans from that metadata alone.

Everything follows the PUBLIC Iceberg Table Spec
(https://iceberg.apache.org/spec/) — field ids, inheritance and delete
semantics are cited inline. The READER is generic: manifests are
decoded via their embedded Avro writer schema and fields looked up by
name, so metadata written by the Java/Python Iceberg libraries decodes
through the same code path as our fixtures (the mirror-image claim —
real readers consuming our files — additionally needs parquet field-id
annotations, which Spark's parquet writer cannot emit; per the spec we
publish the standard `schema.name-mapping.default` table property so
spec-compliant readers fall back to name mapping).

Scale notes (the 100 TB contract):
- scan planning is metadata-only: manifest-list → manifest → per-file
  partition values + column bounds; file pruning (`plan_scan` with a
  row_filter) happens before any Spark job, exactly like the JVM
  reader;
- merge-on-read delete application is expressed as Spark anti-joins
  keyed on (file_path, row position) / equality columns, so the heavy
  side streams; delete sides are broadcast while their manifest
  record_count total stays under BROADCAST_DELETE_ROWS and pinned
  SHUFFLE_HASH beyond it (or when a foreign writer omitted counts), so
  no join build grows with total delete volume;
- data files are never listed from the filesystem — only from
  manifests — so planning cost is O(metadata), not O(directory).

Supported surface (loud errors beyond it): format-version 2; identity
partitioning (+ unpartitioned, primitive source columns only); parquet
data files; avro codecs null/deflate; primitive column types long/int/
double/float/string/boolean/binary/date/timestamptz plus nested
struct/list/map compositions of them (each nested field gets its own
spec field id; bounds are recorded for primitives only; evolution
operates on top-level columns). Other transforms (bucket/truncate/
days) are read as opaque partition values but cannot be pruned on and
raise only if pruning on them is requested.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid as uuidlib

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from . import avroio
from .snapshots import _footer_rows, _footer_stats

POS_DELETE_FIELD_PATH = 2147483546  # spec: reserved field id for file_path
POS_DELETE_FIELD_POS = 2147483545   # spec: reserved field id for pos


class IcebergError(RuntimeError):
    pass


# ---------------------------------------------------------------------
# type mapping + single-value serialization (spec Appendix D)
# ---------------------------------------------------------------------

_SPARK_TO_ICE = {
    T.LongType: "long", T.IntegerType: "int", T.DoubleType: "double",
    T.FloatType: "float", T.StringType: "string",
    T.BooleanType: "boolean", T.BinaryType: "binary",
    T.DateType: "date", T.TimestampType: "timestamptz",
}

_ICE_TO_SPARK = {
    "long": T.LongType(), "int": T.IntegerType(),
    "double": T.DoubleType(), "float": T.FloatType(),
    "string": T.StringType(), "boolean": T.BooleanType(),
    "binary": T.BinaryType(), "date": T.DateType(),
    "timestamptz": T.TimestampType(), "timestamp": T.TimestampType(),
}

# iceberg type -> avro schema for partition struct fields
_ICE_TO_AVRO = {
    "long": "long", "int": "int", "double": "double", "float": "float",
    "string": "string", "boolean": "boolean", "binary": "bytes",
    "date": "int", "timestamptz": "long", "timestamp": "long",
}


def _spark_to_ice_type(dt: T.DataType) -> str:
    for k, v in _SPARK_TO_ICE.items():
        if isinstance(dt, k):
            return v
    raise IcebergError(
        f"unsupported Spark type for the iceberg fixture writer: {dt} "
        "(decimal/interval types are out of this layer's scope — the "
        "production path uses the JVM Iceberg writer)")


def _spark_to_ice(dt: T.DataType, alloc) -> str | dict:
    """Spark type -> Iceberg type JSON (spec: Schemas). Nested types
    carry their own field ids — ``alloc()`` hands out fresh ones for
    struct fields, list elements and map keys/values so every id in
    the schema tree is unique (the invariant evolution relies on)."""
    if isinstance(dt, T.StructType):
        # everything is written optional (spec-legal; matches the JVM
        # Spark writer's default) so read schemas are stable however
        # the parquet reader reports leaf nullability
        fields = []
        for f in dt.fields:
            fid = alloc()
            fields.append({"id": fid, "name": f.name,
                           "required": False,
                           "type": _spark_to_ice(f.dataType, alloc)})
        return {"type": "struct", "fields": fields}
    if isinstance(dt, T.ArrayType):
        eid = alloc()
        return {"type": "list", "element-id": eid,
                "element": _spark_to_ice(dt.elementType, alloc),
                "element-required": False}
    if isinstance(dt, T.MapType):
        kid = alloc()
        key = _spark_to_ice(dt.keyType, alloc)
        vid = alloc()
        return {"type": "map", "key-id": kid, "key": key,
                "value-id": vid,
                "value": _spark_to_ice(dt.valueType, alloc),
                "value-required": False}
    return _spark_to_ice_type(dt)


def _ice_type_to_spark(t) -> T.DataType:
    """Iceberg type JSON -> Spark type (inverse of _spark_to_ice)."""
    if isinstance(t, str):
        if t not in _ICE_TO_SPARK:
            raise IcebergError(
                f"iceberg type {t!r} outside this layer's scope")
        return _ICE_TO_SPARK[t]
    kind = t.get("type")
    if kind == "struct":
        return T.StructType([
            T.StructField(f["name"], _ice_type_to_spark(f["type"]),
                          not f.get("required", False))
            for f in t["fields"]])
    if kind == "list":
        return T.ArrayType(_ice_type_to_spark(t["element"]),
                           not t.get("element-required", False))
    if kind == "map":
        return T.MapType(_ice_type_to_spark(t["key"]),
                         _ice_type_to_spark(t["value"]),
                         not t.get("value-required", False))
    raise IcebergError(f"iceberg type {t!r} outside this layer's scope")


def _max_field_id(schema: dict) -> int:
    """Highest field id anywhere in the schema tree (incl. nested) —
    the spec's last-column-id must dominate ALL of them, or evolution
    would mint colliding ids."""
    def walk(t) -> int:
        if isinstance(t, str):
            return 0
        kind = t.get("type")
        if kind == "struct":
            return max((max(f["id"], walk(f["type"]))
                        for f in t["fields"]), default=0)
        if kind == "list":
            return max(t["element-id"], walk(t["element"]))
        if kind == "map":
            return max(t["key-id"], t["value-id"],
                       walk(t["key"]), walk(t["value"]))
        return 0
    return walk(schema)


def serialize_bound(ice_type, v) -> bytes | None:
    """Single-value serialization, Iceberg spec Appendix D."""
    if v is None or not isinstance(ice_type, str):
        return None  # no bounds for nested types (spec records none)
    if ice_type == "int" or ice_type == "date":
        return struct.pack("<i", int(v))
    if ice_type in ("long", "timestamptz", "timestamp"):
        return struct.pack("<q", int(v))
    if ice_type == "float":
        return struct.pack("<f", float(v))
    if ice_type == "double":
        return struct.pack("<d", float(v))
    if ice_type == "string":
        return str(v).encode("utf-8")
    if ice_type == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_type == "binary":
        return bytes(v)
    return None  # unsupported type: record no bound (conservative)


def deserialize_bound(ice_type, b: bytes | None):
    if b is None or not isinstance(ice_type, str):
        return None
    if ice_type == "int" or ice_type == "date":
        return struct.unpack("<i", bytes(b))[0]
    if ice_type in ("long", "timestamptz", "timestamp"):
        return struct.unpack("<q", bytes(b))[0]
    if ice_type == "float":
        return struct.unpack("<f", bytes(b))[0]
    if ice_type == "double":
        return struct.unpack("<d", bytes(b))[0]
    if ice_type == "string":
        return bytes(b).decode("utf-8")
    if ice_type == "boolean":
        return bytes(b)[0] != 0
    if ice_type == "binary":
        return bytes(b)
    return None


# ---------------------------------------------------------------------
# avro schemas for manifests (field ids per spec; decoder is generic,
# these shapes are what WE write)
# ---------------------------------------------------------------------

def _manifest_list_schema() -> dict:
    f = lambda name, typ, fid: {"name": name, "type": typ,  # noqa: E731
                                "field-id": fid}
    summary = {
        "type": "record", "name": "r508", "fields": [
            f("contains_null", "boolean", 509),
            f("contains_nan", ["null", "boolean"], 518),
            f("lower_bound", ["null", "bytes"], 510),
            f("upper_bound", ["null", "bytes"], 511),
        ]}
    return {
        "type": "record", "name": "manifest_file", "fields": [
            f("manifest_path", "string", 500),
            f("manifest_length", "long", 501),
            f("partition_spec_id", "int", 502),
            f("content", "int", 517),
            f("sequence_number", "long", 515),
            f("min_sequence_number", "long", 516),
            f("added_snapshot_id", "long", 503),
            f("added_files_count", "int", 504),
            f("existing_files_count", "int", 505),
            f("deleted_files_count", "int", 506),
            f("added_rows_count", "long", 512),
            f("existing_rows_count", "long", 513),
            f("deleted_rows_count", "long", 514),
            f("partitions",
              ["null", {"type": "array", "items": summary,
                        "element-id": 508}], 507),
        ]}


def _kv_array(name: str, kid: int, vid: int, fid: int) -> list:
    """Iceberg writes int-keyed maps as arrays of key/value records
    named k{kid}_v{vid} (logical-type map)."""
    return ["null", {
        "type": "array", "logicalType": "map", "items": {
            "type": "record", "name": name, "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": "bytes", "field-id": vid},
            ]}}]


def _manifest_schema(partition_fields: list[dict]) -> dict:
    """``partition_fields``: [{"name","field-id","ice_type"}] for the
    identity partition columns (empty for unpartitioned)."""
    pf = [{"name": p["name"],
           "type": ["null", _ICE_TO_AVRO[p["ice_type"]]],
           "field-id": p["field-id"]} for p in partition_fields]
    data_file = {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition",
             "type": {"type": "record", "name": "r102", "fields": pf},
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long",
             "field-id": 104},
            {"name": "lower_bounds",
             "type": _kv_array("k126_v127", 126, 127, 125),
             "field-id": 125},
            {"name": "upper_bounds",
             "type": _kv_array("k129_v130", 129, 130, 128),
             "field-id": 128},
            {"name": "split_offsets",
             "type": ["null", {"type": "array", "items": "long",
                               "element-id": 133}], "field-id": 132},
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int",
                               "element-id": 136}], "field-id": 135},
            {"name": "sort_order_id", "type": ["null", "int"],
             "field-id": 140},
        ]}
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "field-id": 4},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ]}


# ---------------------------------------------------------------------
# metadata files
# ---------------------------------------------------------------------

def _meta_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "metadata")


def _read_version_hint(table_dir: str) -> int:
    hint = os.path.join(_meta_dir(table_dir), "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as fh:
            return int(fh.read().strip())
    # spec fallback: highest vN.metadata.json present
    best = 0
    if os.path.isdir(_meta_dir(table_dir)):
        for name in os.listdir(_meta_dir(table_dir)):
            if name.endswith(".metadata.json") and name.startswith("v"):
                try:
                    best = max(best, int(name[1:].split(".")[0]))
                except ValueError:
                    pass
    return best


def load_metadata(table_dir: str) -> dict:
    v = _read_version_hint(table_dir)
    if v <= 0:
        raise IcebergError(f"{table_dir}: no iceberg table metadata")
    path = os.path.join(_meta_dir(table_dir), f"v{v}.metadata.json")
    with open(path) as fh:
        meta = json.load(fh)
    fv = meta.get("format-version")
    if fv != 2:
        raise IcebergError(
            f"{table_dir}: format-version {fv} unsupported (v2 only)")
    # private bookkeeping (never serialized): which version this dict
    # was loaded from — commits built on it publish EXACTLY v+1, so a
    # writer racing on a stale parent conflicts instead of clobbering
    meta["_loaded-version"] = v
    return meta


def _current_schema(meta: dict) -> dict:
    sid = meta["current-schema-id"]
    for s in meta["schemas"]:
        if s["schema-id"] == sid:
            return s
    raise IcebergError(f"current-schema-id {sid} not in schemas")


def _schema_for_id(meta: dict, schema_id: int) -> dict:
    for s in meta["schemas"]:
        if s["schema-id"] == schema_id:
            return s
    raise IcebergError(f"schema-id {schema_id} not in table schemas")


def _snapshot_schema_ids(meta: dict) -> dict[int, int]:
    """snapshot-id -> schema-id the snapshot was committed under
    (spec: optional on old metadata; default to the current schema)."""
    cur = meta["current-schema-id"]
    return {s["snapshot-id"]: s.get("schema-id", cur)
            for s in meta.get("snapshots", [])}


def _field_by_id(schema: dict) -> dict[int, dict]:
    return {f["id"]: f for f in schema["fields"]}


def _field_by_name(schema: dict) -> dict[str, dict]:
    return {f["name"]: f for f in schema["fields"]}


def _spec_by_id(meta: dict, spec_id: int) -> dict:
    for s in meta["partition-specs"]:
        if s["spec-id"] == spec_id:
            return s
    raise IcebergError(f"partition spec {spec_id} not found")


def spark_schema(meta: dict, schema: dict | None = None) -> T.StructType:
    sch = schema if schema is not None else _current_schema(meta)
    return T.StructType([
        T.StructField(f["name"], _ice_type_to_spark(f["type"]),
                      not f.get("required", False))
        for f in sch["fields"]])


def select_snapshot(meta: dict, snapshot_id: int | None = None,
                    as_of_ms: int | None = None) -> dict | None:
    snaps = meta.get("snapshots", [])
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise IcebergError(f"snapshot {snapshot_id} not found")
    if as_of_ms is not None:
        # snapshot-log is ordered by commit time (spec)
        chosen = None
        for entry in meta.get("snapshot-log", []):
            if entry["timestamp-ms"] <= as_of_ms:
                chosen = entry["snapshot-id"]
        if chosen is None:
            return None
        return select_snapshot(meta, chosen)
    cur = meta.get("current-snapshot-id", -1)
    if cur is None or cur == -1:
        return None
    return select_snapshot(meta, cur)


# ---------------------------------------------------------------------
# scan planning (metadata-only)
# ---------------------------------------------------------------------

def _local(p: str) -> str:
    """file:///x/y, file:/x/y, /x/y -> /x/y (paths are compared in this
    normal form everywhere)."""
    if p.startswith("file:"):
        p = p[5:]
        while p.startswith("//"):
            p = p[1:]
    return p


_OPS = ("=", "<", "<=", ">", ">=")


def _overlaps(op: str, val, lo, hi) -> bool:
    """Can a file whose column spans [lo, hi] contain a row matching
    ``col op val``? None bound => unknown => True (conservative)."""
    if op == "=":
        return (lo is None or lo <= val) and (hi is None or val <= hi)
    if op == "<":
        return lo is None or lo < val
    if op == "<=":
        return lo is None or lo <= val
    if op == ">":
        return hi is None or hi > val
    if op == ">=":
        return hi is None or hi >= val
    raise IcebergError(f"unsupported filter op {op!r} (use {_OPS})")


class ScanTask:
    __slots__ = ("path", "partition", "seq", "record_count",
                 "schema_id")

    def __init__(self, path, partition, seq, record_count,
                 schema_id=0):
        self.path = path
        self.partition = partition  # {col_name: value} identity only
        self.seq = seq
        self.record_count = record_count
        # schema under which the file was WRITTEN (spec: resolved via
        # the manifest's added_snapshot_id -> snapshot.schema-id) —
        # column resolution across schema evolution is by field id
        # through this schema, never by name.
        self.schema_id = schema_id


class DeleteTask:
    __slots__ = ("path", "seq", "kind", "eq_cols", "record_count",
                 "schema_id", "eq_ids")

    def __init__(self, path, seq, kind, eq_cols=None, record_count=-1,
                 schema_id=0, eq_ids=None):
        self.path = path
        self.seq = seq
        self.kind = kind  # "pos" | "eq"
        self.eq_cols = eq_cols or []  # names in the READ schema
        self.record_count = record_count  # -1 = unknown (foreign writer)
        self.schema_id = schema_id  # write-time schema (for eq files)
        self.eq_ids = eq_ids or []  # stable field ids behind eq_cols


def plan_scan(meta: dict, snap: dict,
              row_filter: list[tuple] | None = None,
              read_schema: dict | None = None
              ) -> tuple[list[ScanTask], list[DeleteTask]]:
    """Plan a snapshot scan from metadata alone.

    ``row_filter``: AND-list of (column, op, literal) with op in
    ``_OPS`` — used to prune data files via identity partition values
    and per-file column bounds (manifest stats), exactly the pruning a
    JVM Iceberg scan does before launching tasks. Conservative: a file
    is kept unless its metadata PROVES no row can match.

    ``read_schema``: projection schema (defaults to current). Filter
    columns resolve to field IDS under it; bounds comparisons then use
    those stable ids, so pruning stays sound across renames, and bound
    bytes deserialize under each file's WRITE-time type, so it stays
    sound across int->long / float->double promotion too.
    """
    sch = read_schema if read_schema is not None \
        else _current_schema(meta)
    by_id = _field_by_id(sch)
    by_name = _field_by_name(sch)
    snap_schemas = _snapshot_schema_ids(meta)
    if row_filter:
        for col, op, _ in row_filter:
            if col not in by_name:
                raise IcebergError(f"filter column {col!r} not in schema")
            if op not in _OPS:
                raise IcebergError(f"unsupported filter op {op!r}")
    mlist_path = _local(snap["manifest-list"])
    _, manifests = avroio.read_container(mlist_path)
    data: list[ScanTask] = []
    deletes: list[DeleteTask] = []
    for mf in manifests:
        spec = _spec_by_id(meta, mf.get("partition_spec_id", 0))
        id_cols = {}  # partition struct field name -> (source col, type)
        for pf in spec.get("fields", []):
            src = by_id.get(pf["source-id"])
            if pf.get("transform") == "identity" and src is not None:
                id_cols[pf["name"]] = (src["name"], src["type"])
        mseq = mf.get("sequence_number", 0)
        wsid = snap_schemas.get(mf.get("added_snapshot_id"),
                                sch["schema-id"])
        w_types = {f["id"]: f["type"]
                   for f in _schema_for_id(meta, wsid)["fields"]} \
            if any(s["schema-id"] == wsid for s in meta["schemas"]) \
            else {f["id"]: f["type"] for f in sch["fields"]}
        _, entries = avroio.read_container(_local(mf["manifest_path"]))
        for e in entries:
            if e.get("status", 1) == 2:  # DELETED
                continue
            df_ = e["data_file"]
            # v2 inheritance: null sequence_number on an ADDED entry
            # inherits the manifest-list entry's sequence_number
            seq = e.get("sequence_number")
            if seq is None:
                seq = mseq
            part_raw = df_.get("partition") or {}
            part = {}
            for k, v in part_raw.items():
                if k in id_cols:
                    cname, ctype = id_cols[k]
                    if ctype in ("timestamptz", "timestamp") \
                            and v is not None:
                        # avro long micros -> seconds handled at attach
                        part[cname] = v
                    else:
                        part[cname] = v
            content = df_.get("content", 0)
            path = _local(df_["file_path"])
            fmt = str(df_.get("file_format", "parquet")).lower()
            if fmt != "parquet":
                raise IcebergError(
                    f"data file format {fmt!r} unsupported (parquet only)")
            if content == 0:
                if row_filter and _pruned(df_, part, row_filter,
                                          by_name, w_types):
                    continue
                data.append(ScanTask(path, part, seq,
                                     df_.get("record_count", -1),
                                     schema_id=wsid))
            elif content == 1:
                deletes.append(DeleteTask(
                    path, seq, "pos",
                    record_count=df_.get("record_count", -1),
                    schema_id=wsid))
            elif content == 2:
                eq_ids = df_.get("equality_ids") or []
                cols = []
                for fid in eq_ids:
                    if fid not in by_id:
                        raise IcebergError(
                            f"equality delete field id {fid} not in schema")
                    cols.append(by_id[fid]["name"])
                deletes.append(DeleteTask(
                    path, seq, "eq", cols,
                    record_count=df_.get("record_count", -1),
                    schema_id=wsid, eq_ids=eq_ids))
            else:
                raise IcebergError(f"unknown data_file content {content}")
    return data, deletes


def _bounds_map(df_entry: dict, key: str) -> dict[int, bytes]:
    raw = df_entry.get(key) or []
    if isinstance(raw, dict):  # map-typed variant
        return {int(k): v for k, v in raw.items()}
    return {e["key"]: e["value"] for e in raw}


def _pruned(df_entry: dict, part: dict, row_filter: list[tuple],
            by_name: dict, write_types: dict[int, str] | None = None
            ) -> bool:
    """True iff metadata PROVES no row in this file can match.

    ``write_types``: field id -> iceberg type under the file's
    WRITE-time schema — bounds bytes were serialized under that type
    (a 4-byte int bound must not be unpacked as long after an
    int->long promotion; the Python-side comparison is unaffected)."""
    lowers = _bounds_map(df_entry, "lower_bounds")
    uppers = _bounds_map(df_entry, "upper_bounds")
    for col, op, val in row_filter:
        fld = by_name[col]
        ice_t = (write_types or {}).get(fld["id"], fld["type"])
        if col in part:
            pv = part[col]
            if pv is None:
                continue  # null partition: only = could prune; stay safe
            if not _overlaps(op, val, pv, pv):
                return True
            continue
        lo = deserialize_bound(ice_t, lowers.get(fld["id"]))
        hi = deserialize_bound(ice_t, uppers.get(fld["id"]))
        if lo is None and hi is None:
            continue
        if not _overlaps(op, val, lo, hi):
            return True
    return False


# ---------------------------------------------------------------------
# reading
# ---------------------------------------------------------------------

def _common_hive_root(tasks: list[ScanTask], pnames: list[str],
                      read_sch: dict) -> str | None:
    """If every task's path is laid out hive-style under ONE common
    root with directory values that match its manifest partition
    values exactly, return that root — the reader can then attach
    partition columns via Spark's partition discovery in a single
    DataFrame instead of one DataFrame per partition value. Returns
    None (caller falls back to literal attachment) for foreign
    layouts, encoding mismatches, or types _hive_partition can't
    round-trip: partition values are authoritative from MANIFESTS per
    the spec, so the fast path must prove the directory encoding
    agrees before trusting it."""
    part_types = {f["name"]: f["type"] for f in read_sch["fields"]
                  if f["name"] in pnames}
    if len(part_types) != len(pnames):
        return None
    if any(t in ("timestamptz", "timestamp", "binary")
           for t in part_types.values()):
        return None  # dir encoding of these is not round-trip-safe
    root = None
    for t in tasks:
        d = os.path.dirname(t.path)
        for _ in pnames:
            d = os.path.dirname(d)
        if root is None:
            root = d
        elif root != d:
            return None
        parsed = _hive_partition(t.path, root, part_types)
        if parsed != {k: t.partition.get(k) for k in pnames}:
            return None
    return root


def _project_tasks(spark: SparkSession, meta: dict, read_sch: dict,
                   data: list[ScanTask], need_seq: bool) -> DataFrame:
    """Union all scan tasks into one DataFrame projected under
    ``read_sch``, resolving each file's physical columns BY FIELD ID
    through its write-time schema (spec: rename = same id, new name;
    add = new id, reads as null from older files; drop + re-add = new
    id, so old values are never resurrected). Identity-partition
    columns are re-attached from manifest partition values; int->long
    and float->double promotions cast at scan. With ``need_seq`` each
    row also carries (_ice_path, _ice_pos, _ice_seq) lineage for
    merge-on-read delete application.

    Scale note: files group by (write-schema, sequence-number) ONLY —
    when a group's files sit hive-style under one root whose directory
    values provably match the manifests, partition columns attach via
    Spark partition discovery with an EXPLICIT schema (directory
    values cast, never inferred), so driver-side plan construction is
    O(appends), not O(partition values). A 1000-partition daily crawl
    plans in a handful of DataFrame constructions instead of
    thousands. Foreign layouts fall back to one literal-attach group
    per partition value."""
    import pyarrow.parquet as pq

    coarse: dict[tuple, list[ScanTask]] = {}
    for t in data:
        coarse.setdefault((t.schema_id, t.seq if need_seq else 0),
                          []).append(t)

    def _read_group(tasks: list[ScanTask], wsid: int, seq: int,
                    hive_root: str | None,
                    pnames: list[str]) -> DataFrame:
        w_by_id = _field_by_id(_schema_for_id(meta, wsid))
        t0 = tasks[0]
        try:
            from pyspark.sql.pandas.types import from_arrow_schema
            phys = from_arrow_schema(
                pq.ParquetFile(t0.path).schema_arrow)
        except Exception:
            phys = None  # exotic footer: let the JVM infer
        physical = set(phys.fieldNames()) if phys is not None else \
            set(pq.ParquetFile(t0.path).schema_arrow.names)
        reader = spark.read
        by_name = _field_by_name(read_sch)
        if phys is not None and hive_root is not None:
            # spec allows identity-partition columns to ALSO be kept
            # in the data files; only attach the ones that aren't
            full = T.StructType(list(phys.fields) + [
                T.StructField(c, _ice_type_to_spark(
                    by_name[c]["type"]), True)
                for c in pnames if c not in physical])
            reader = reader.schema(full).option("basePath", hive_root)
        elif phys is not None:
            reader = reader.schema(phys)
        elif hive_root is not None:
            reader = reader.option("basePath", hive_root)
        df = reader.parquet(*[t.path for t in tasks])
        if need_seq:
            df = (df.withColumn("_ice_path", F.regexp_replace(
                      F.col("_metadata.file_path"), "^file:/+", "/"))
                    .withColumn("_ice_pos",
                                F.col("_metadata.row_index"))
                    .withColumn("_ice_seq", F.lit(seq)))
        sel = []
        for f in read_sch["fields"]:
            tgt = _ice_type_to_spark(f["type"])
            wf = w_by_id.get(f["id"])
            if wf is not None and wf["name"] in physical:
                c = F.col(wf["name"])
                if wf["type"] != f["type"]:
                    c = c.cast(tgt)  # int->long / float->double
                sel.append(c.alias(f["name"]))
            elif hive_root is not None and f["name"] in pnames:
                # attached by partition discovery, typed by the
                # explicit schema above (or inferred+cast below)
                c = F.col(f["name"])
                if phys is None:
                    c = c.cast(tgt)
                sel.append(c.alias(f["name"]))
            elif f["name"] in t0.partition:
                v = t0.partition.get(f["name"])
                if f["type"] in ("timestamptz", "timestamp") \
                        and v is not None:
                    sel.append(F.timestamp_micros(
                        F.lit(int(v))).alias(f["name"]))
                else:
                    sel.append(F.lit(v).cast(tgt).alias(f["name"]))
            elif wf is None:
                # column added to the table after these files were
                # written: spec says it reads as null
                sel.append(F.lit(None).cast(tgt).alias(f["name"]))
            else:
                raise IcebergError(
                    f"column {f['name']!r} (field id {f['id']}) "
                    f"neither in data file nor partition metadata of "
                    f"{t0.path}")
        if need_seq:
            sel += [F.col("_ice_path"), F.col("_ice_pos"),
                    F.col("_ice_seq")]
        return df.select(*sel)

    parts = []
    for (wsid, seq), tasks in sorted(coarse.items()):
        pnames = sorted({c for t in tasks for c in t.partition})
        root = _common_hive_root(tasks, pnames, read_sch) \
            if pnames else None
        if pnames and root is None:
            fine: dict[tuple, list[ScanTask]] = {}
            for t in tasks:
                k = tuple(sorted((c, t.partition.get(c))
                                 for c in pnames))
                fine.setdefault(k, []).append(t)
            for _k, g in sorted(fine.items(),
                                key=lambda kv: str(kv[0])):
                parts.append(_read_group(g, wsid, seq, None, pnames))
        else:
            parts.append(_read_group(tasks, wsid, seq, root, pnames))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_iceberg(spark: SparkSession, table_dir: str,
                 snapshot_id: int | None = None,
                 as_of_ms: int | None = None,
                 row_filter: list[tuple] | None = None,
                 ref: str | None = None) -> DataFrame:
    """Read an Iceberg v2 table as a DataFrame (merge-on-read applied).

    The scan is planned purely from table metadata (`plan_scan`);
    positional deletes are applied by anti-join on (normalized file
    path, `_metadata.row_index`) restricted to data files with
    data_seq <= delete_seq, equality deletes by null-safe anti-join on
    the equality columns restricted to data_seq < delete_seq — both per
    the spec's sequence-number rules.
    """
    meta = load_metadata(table_dir)
    snapshot_schema = snapshot_id is not None or as_of_ms is not None
    if ref is not None:
        if snapshot_schema:
            raise IcebergError(
                "pass ref OR snapshot_id/as_of_ms, not both")
        refs = meta.get("refs", {})
        if ref not in refs:
            raise IcebergError(
                f"ref {ref!r} not found (have {sorted(refs)})")
        snapshot_id = refs[ref]["snapshot-id"]
        # spec: tag reads project the snapshot's schema; branch reads
        # the table's current schema
        snapshot_schema = refs[ref].get("type") == "tag"
    snap = select_snapshot(meta, snapshot_id, as_of_ms)
    # spec: a time-travel scan projects under the SNAPSHOT's schema
    # (the names/columns the data had then); a current scan projects
    # under the current schema. Column resolution into each data file
    # is by field id through the file's write-time schema either way.
    if snap is not None and snapshot_schema:
        read_sch = _schema_for_id(
            meta, snap.get("schema-id", meta["current-schema-id"]))
    else:
        read_sch = _current_schema(meta)
    schema = spark_schema(meta, read_sch)
    cols = [f.name for f in schema.fields]
    if snap is None:
        return spark.createDataFrame([], schema)
    data, deletes = plan_scan(meta, snap, row_filter,
                              read_schema=read_sch)
    if not data:
        return spark.createDataFrame([], schema)

    need_seq = bool(deletes)
    pos_dels = [d for d in deletes if d.kind == "pos"]
    eq_dels = [d for d in deletes if d.kind == "eq"]

    out = _project_tasks(spark, meta, read_sch, data, need_seq)

    for dseq, group in sorted(_by_seq(pos_dels).items()):
        dels = (spark.read.parquet(*[t.path for t in group])
                .select(F.regexp_replace("file_path", "^file:/+", "/")
                        .alias("_del_path"),
                        F.col("pos").alias("_del_pos")))
        dels = _delete_side(dels, group)
        out = out.join(
            dels,
            (out["_ice_path"] == dels["_del_path"])
            & (out["_ice_pos"] == dels["_del_pos"])
            & (out["_ice_seq"] <= F.lit(dseq)),
            "left_anti")
    for (dseq, eq_cols), group in sorted(_eq_groups(eq_dels).items()):
        # an equality-delete parquet carries WRITE-time column names;
        # resolve each file's columns to the read schema by field id
        sides = []
        for t in group:
            wsch = _field_by_id(_schema_for_id(meta, t.schema_id))
            sides.append(
                spark.read.parquet(t.path).select(
                    *[F.col(wsch[fid]["name"]).alias(f"_del_{c}")
                      for fid, c in zip(t.eq_ids, t.eq_cols)]))
        dels = sides[0]
        for s in sides[1:]:
            dels = dels.unionByName(s)
        dels = dels.distinct()
        dels = _delete_side(dels, group)
        cond = out["_ice_seq"] < F.lit(dseq)
        for c in eq_cols:
            cond = cond & out[c].eqNullSafe(dels[f"_del_{c}"])
        out = out.join(dels, cond, "left_anti")
    # normalize to the metadata schema (nullability included) so the
    # read contract is stable however the parquet scan reports leaves
    return out.select(*cols).to(schema)


def _by_seq(tasks: list[DeleteTask]) -> dict[int, list[DeleteTask]]:
    out: dict[int, list[DeleteTask]] = {}
    for t in tasks:
        out.setdefault(t.seq, []).append(t)
    return out


def _eq_groups(tasks: list[DeleteTask]) -> dict[tuple, list[DeleteTask]]:
    out: dict[tuple, list[DeleteTask]] = {}
    for t in tasks:
        out.setdefault((t.seq, tuple(t.eq_cols)), []).append(t)
    return out


# Delete-apply join strategy: delete files are usually metadata-scale
# (a positional tuple is ~two words), so the anti-join build side is
# broadcast up to this many rows. Beyond it — or when a foreign writer
# omitted record_count — the build side could rival an executor heap
# at 10^12-row table scale, so the join is pinned SHUFFLE_HASH instead:
# still a hash anti-join (the delete side is always the smaller
# relation; sort-merge would pay an unneeded sort on the data side),
# but partitioned, so no single build grows with total delete volume.
BROADCAST_DELETE_ROWS = 4_000_000


def _delete_side(dels: DataFrame, group: list[DeleteTask]) -> DataFrame:
    n = sum(t.record_count for t in group)
    if any(t.record_count < 0 for t in group) or n > BROADCAST_DELETE_ROWS:
        return dels.hint("shuffle_hash")
    return F.broadcast(dels)


# ---------------------------------------------------------------------
# writing (fixture-grade, spec-shaped)
# ---------------------------------------------------------------------

def _table_uuid(table_dir: str) -> str:
    import hashlib
    h = hashlib.sha256(os.path.abspath(table_dir).encode()).digest()
    return str(uuidlib.UUID(bytes=h[:16]))


def _attempt_id() -> str:
    """Unique per write attempt: data files land under an
    attempt-unique root so racing writers never collide on PATHS —
    the conflict is decided at the metadata pointer swap
    (_write_metadata_version), exactly like the JVM writer; a loser's
    orphaned files are invisible (manifests never reference them) and
    reclaimable by any orphan-file sweep."""
    return uuidlib.uuid4().hex[:8]


def _ice_schema_json(df: DataFrame) -> dict:
    import itertools
    counter = itertools.count(1)
    alloc = lambda: next(counter)  # noqa: E731
    fields = []
    for f in df.schema.fields:
        fid = alloc()
        fields.append({"id": fid, "name": f.name, "required": False,
                       "type": _spark_to_ice(f.dataType, alloc)})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _name_mapping(schema: dict) -> list[dict]:
    return [{"field-id": f["id"], "names": [f["name"]]}
            for f in schema["fields"]]


def _list_parquet(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for name in sorted(files):
            if name.endswith(".parquet"):
                out.append(os.path.join(dirpath, name))
    return sorted(out)


def _hive_partition(path: str, root: str,
                    part_types: dict[str, str]) -> dict:
    """Parse identity partition values from the hive path components
    Spark's partitionBy wrote under ``root``."""
    from urllib.parse import unquote
    rel = os.path.relpath(os.path.dirname(path), root)
    vals = {}
    if rel in (".", ""):
        return vals
    for comp in rel.split(os.sep):
        if "=" not in comp:
            continue
        k, v = comp.split("=", 1)
        v = unquote(v)
        if k not in part_types:
            continue
        if v == "__HIVE_DEFAULT_PARTITION__":
            vals[k] = None
        elif part_types[k] in ("int", "long", "date"):
            vals[k] = int(v)
        elif part_types[k] == "double":
            vals[k] = float(v)
        elif part_types[k] == "boolean":
            vals[k] = v == "true"
        else:
            vals[k] = v
    return vals


def _data_file_entry(path: str, partition: dict, schema: dict,
                     content: int = 0,
                     equality_ids: list[int] | None = None) -> dict:
    stats = _footer_stats(path) if content == 0 else {}
    by_name = _field_by_name(schema)
    lowers, uppers = [], []
    for col, (mn, mx) in sorted(stats.items()):
        f = by_name.get(col)
        if f is None:
            continue
        lo = serialize_bound(f["type"], mn)
        hi = serialize_bound(f["type"], mx)
        if lo is not None and hi is not None:
            lowers.append({"key": f["id"], "value": lo})
            uppers.append({"key": f["id"], "value": hi})
    return {
        "content": content,
        "file_path": f"file://{os.path.abspath(path)}",
        "file_format": "PARQUET",
        "partition": partition,
        "record_count": _footer_rows(path),
        "file_size_in_bytes": os.path.getsize(path),
        "lower_bounds": lowers or None,
        "upper_bounds": uppers or None,
        "split_offsets": None,
        "equality_ids": equality_ids,
        "sort_order_id": None,
    }


def _write_manifest(table_dir: str, sid: int, seq: int,
                    entries: list[dict], partition_fields: list[dict],
                    schema: dict, tag: str) -> dict:
    schema_avro = _manifest_schema(partition_fields)
    os.makedirs(_meta_dir(table_dir), exist_ok=True)
    path = os.path.join(_meta_dir(table_dir), f"m-{sid}-{tag}.avro")
    for e in entries:  # delete files carry an all-null partition struct
        for p in partition_fields:
            e["partition"].setdefault(p["name"], None)
    recs = [{"status": 1, "snapshot_id": sid, "sequence_number": seq,
             "file_sequence_number": seq, "data_file": e}
            for e in entries]
    meta = {
        "schema": json.dumps(schema).encode(),
        "partition-spec": json.dumps(
            [{"name": p["name"], "transform": "identity",
              "source-id": p["source-id"], "field-id": p["field-id"]}
             for p in partition_fields]).encode(),
        "partition-spec-id": b"0",
        "format-version": b"2",
        "content": b"deletes" if any(
            e["content"] != 0 for e in entries) else b"data",
    }
    avroio.write_container(path, schema_avro, recs, meta=meta)
    content = 1 if any(e["content"] != 0 for e in entries) else 0
    rows = sum(e["record_count"] for e in entries)
    return {
        "manifest_path": f"file://{os.path.abspath(path)}",
        "manifest_length": os.path.getsize(path),
        "partition_spec_id": 0,
        "content": content,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": sid,
        "added_files_count": len(entries),
        "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
        "partitions": None,
    }


def _commit_snapshot(table_dir: str, manifest_entries: list[dict],
                     operation: str,
                     parent_meta: dict | None,
                     schema: dict,
                     partition_fields: list[dict]) -> int:
    """Write manifest list + new vN.metadata.json + version-hint."""
    md = _meta_dir(table_dir)
    os.makedirs(md, exist_ok=True)
    if parent_meta is not None:
        sid = max((s["snapshot-id"]
                   for s in parent_meta.get("snapshots", [])),
                  default=0) + 1
        seq = parent_meta.get("last-sequence-number", 0) + 1
        snaps = list(parent_meta.get("snapshots", []))
        slog = list(parent_meta.get("snapshot-log", []))
        parent_id = parent_meta.get("current-snapshot-id")
        base_v = parent_meta.get("_loaded-version",
                                 _read_version_hint(table_dir))
    else:
        sid, seq, snaps, slog, parent_id = 1, 1, [], [], None
        base_v = 0

    mlist = os.path.join(
        md, f"snap-{sid}-1-{_table_uuid(table_dir)[:8]}.avro")
    avroio.write_container(mlist, _manifest_list_schema(),
                           manifest_entries)
    now_ms = int(time.time() * 1000)
    snap = {
        "snapshot-id": sid,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": f"file://{os.path.abspath(mlist)}",
        "summary": {"operation": operation},
        "schema-id": schema.get("schema-id", 0),
    }
    if parent_id is not None:
        snap["parent-snapshot-id"] = parent_id
    snaps.append(snap)
    slog.append({"timestamp-ms": now_ms, "snapshot-id": sid})
    # carry the FULL schema history: files written under an older
    # schema resolve their columns through it by field id forever
    schemas = list((parent_meta or {}).get("schemas", []))
    if not any(s["schema-id"] == schema.get("schema-id", 0)
               for s in schemas):
        schemas.append(schema)
    meta = {
        "format-version": 2,
        "table-uuid": _table_uuid(table_dir),
        "location": f"file://{os.path.abspath(table_dir)}",
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": max((_max_field_id(s) for s in schemas),
                              default=0),
        "current-schema-id": schema.get("schema-id", 0),
        "schemas": schemas,
        "default-spec-id": 0,
        "partition-specs": [{
            "spec-id": 0,
            "fields": [{"name": p["name"], "transform": "identity",
                        "source-id": p["source-id"],
                        "field-id": p["field-id"]}
                       for p in partition_fields]}],
        "last-partition-id": max(
            (p["field-id"] for p in partition_fields), default=999),
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {
            "schema.name-mapping.default":
                json.dumps(_name_mapping(schema)),
            "write.format.default": "parquet",
        },
        "current-snapshot-id": sid,
        # carry user refs (tags/branches) across commits; main advances
        "refs": {**(parent_meta or {}).get("refs", {}),
                 "main": {"snapshot-id": sid, "type": "branch"}},
        "snapshots": snaps,
        "snapshot-log": slog,
        "metadata-log": [],
    }
    _write_metadata_version(table_dir, meta, expected_from=base_v)
    return sid


def _existing_manifests(meta: dict) -> list[dict]:
    snap = select_snapshot(meta)
    if snap is None:
        return []
    _, manifests = avroio.read_container(_local(snap["manifest-list"]))
    return manifests


def _partition_fields(schema: dict, partition_by: list[str]) -> list:
    by_name = _field_by_name(schema)
    out = []
    for i, col in enumerate(partition_by):
        if col not in by_name:
            raise IcebergError(f"partition column {col!r} not in schema")
        if not isinstance(by_name[col]["type"], str):
            raise IcebergError(
                f"partition column {col!r} has a nested type — "
                "identity partitioning needs a primitive source")
        out.append({"name": col, "source-id": by_name[col]["id"],
                    "field-id": 1000 + i,
                    "ice_type": by_name[col]["type"]})
    return out


def write_iceberg(df: DataFrame, table_dir: str,
                  partition_by: list[str] | None = None) -> int:
    """Create an Iceberg v2 table from ``df`` (overwrites any existing
    table dir state by starting at v1). Returns the snapshot id."""
    if os.path.exists(os.path.join(_meta_dir(table_dir),
                                   "version-hint.text")):
        raise IcebergError(
            f"{table_dir} already an iceberg table — use append_iceberg")
    return _append(df, table_dir, partition_by=partition_by,
                   parent=None)


def append_iceberg(df: DataFrame, table_dir: str) -> int:
    """Append a snapshot to an existing table (schema must match by
    name; partitioning is the table's)."""
    meta = load_metadata(table_dir)
    spec = _spec_by_id(meta, meta["default-spec-id"])
    by_id = _field_by_id(_current_schema(meta))
    partition_by = [by_id[f["source-id"]]["name"]
                    for f in spec["fields"]]
    return _append(df, table_dir, partition_by=partition_by or None,
                   parent=meta)


def _append(df: DataFrame, table_dir: str,
            partition_by: list[str] | None, parent: dict | None) -> int:
    if parent is None:
        schema = _ice_schema_json(df)
    else:
        schema = _current_schema(parent)
        df = df.select(*[
            F.col(f["name"]).cast(_ice_type_to_spark(f["type"]))
            .alias(f["name"]) for f in schema["fields"]])
    pfields = _partition_fields(schema, partition_by or [])
    sid_next = max((s["snapshot-id"]
                    for s in (parent or {}).get("snapshots", [])),
                   default=0) + 1
    seq_next = (parent or {}).get("last-sequence-number", 0) + 1
    data_root = os.path.join(table_dir, "data",
                         f"snap-{sid_next}-{_attempt_id()}")
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_root)
    part_types = {p["name"]: p["ice_type"] for p in pfields}
    entries = []
    for path in _list_parquet(data_root):
        part = _hive_partition(path, data_root, part_types)
        entries.append(_data_file_entry(path, part, schema))
    manifest = _write_manifest(table_dir, sid_next, seq_next, entries,
                               pfields, schema, "data")
    manifests = _existing_manifests(parent) if parent else []
    return _commit_snapshot(table_dir, manifests + [manifest],
                            "append", parent, schema, pfields)


# promotions the spec allows for primitives (we support the two that
# matter for this layer's type scope; decimal widening is out of scope)
_PROMOTIONS = {("int", "long"), ("float", "double")}


def evolve_schema(table_dir: str,
                  add: list[tuple[str, str]] | None = None,
                  drop: list[str] | None = None,
                  rename: dict[str, str] | None = None,
                  retype: dict[str, str] | None = None) -> int:
    """Metadata-only schema evolution (spec: Schema Evolution).

    ``add``: [(name, iceberg_type)] — each gets a FRESH field id
    (last-column-id + 1...), so re-adding a dropped name never
    resurrects old values. ``drop``: column names to remove.
    ``rename``: {old: new} — the field id is unchanged, so existing
    data files keep resolving. ``retype``: {name: new_type}, only the
    spec's safe promotions int->long / float->double.

    No snapshot is committed and no data file is touched — a new
    vN.metadata.json records the new current schema while keeping the
    full schema history for per-file field-id resolution. Columns that
    source the partition spec cannot be dropped, renamed or retyped
    (this layer resolves identity-partition values by name at scan).
    Returns the new schema-id.
    """
    meta = load_metadata(table_dir)
    cur = _current_schema(meta)
    by_name = _field_by_name(cur)
    part_src = {f["source-id"] for sp in meta["partition-specs"]
                for f in sp["fields"]}
    protected = {f["name"] for f in cur["fields"]
                 if f["id"] in part_src}

    def _check(col: str, action: str) -> dict:
        if col not in by_name:
            raise IcebergError(f"{action}: column {col!r} not in schema")
        if col in protected:
            raise IcebergError(
                f"{action}: {col!r} sources the partition spec — "
                "evolve the spec first (out of this layer's scope)")
        return by_name[col]

    fields = [dict(f) for f in cur["fields"]]
    for col in drop or []:
        _check(col, "drop")
        fields = [f for f in fields if f["name"] != col]
    live = {f["name"] for f in fields}
    for old, new in (rename or {}).items():
        _check(old, "rename")
        if new in live:
            raise IcebergError(f"rename: {new!r} already in schema")
        live.discard(old)
        live.add(new)
        next(f for f in fields if f["name"] == old)["name"] = new
    for col, new_t in (retype or {}).items():
        f = next((f for f in fields if f["name"] == col), None)
        if f is None:
            raise IcebergError(f"retype: column {col!r} not in schema")
        if f["id"] in part_src:
            raise IcebergError(
                f"retype: {col!r} sources the partition spec")
        if not isinstance(f["type"], str) or \
                not isinstance(new_t, str):
            raise IcebergError(
                f"retype: {col!r} — only primitive promotions are "
                "supported (nested types cannot be retyped)")
        if (f["type"], new_t) not in _PROMOTIONS:
            raise IcebergError(
                f"retype: {f['type']} -> {new_t} is not a safe "
                f"promotion (allowed: {sorted(_PROMOTIONS)})")
        f["type"] = new_t
    next_id = meta["last-column-id"]
    for name, ice_t in add or []:
        if name in live:
            raise IcebergError(f"add: column {name!r} already in schema")
        if ice_t not in _ICE_TO_SPARK:
            raise IcebergError(f"add: unsupported type {ice_t!r}")
        next_id += 1
        live.add(name)
        fields.append({"id": next_id, "name": name, "required": False,
                       "type": ice_t})
    if not fields:
        raise IcebergError("evolution would leave an empty schema")
    new_sid = max(s["schema-id"] for s in meta["schemas"]) + 1
    new_schema = {"type": "struct", "schema-id": new_sid,
                  "fields": fields}
    now_ms = int(time.time() * 1000)
    meta["schemas"] = meta["schemas"] + [new_schema]
    meta["current-schema-id"] = new_sid
    meta["last-column-id"] = next_id
    meta["last-updated-ms"] = now_ms
    meta["properties"]["schema.name-mapping.default"] = json.dumps(
        _name_mapping(new_schema))
    _write_metadata_version(table_dir, meta)
    return new_sid


def delete_where(spark: SparkSession, table_dir: str,
                 condition: str) -> int:
    """Commit POSITIONAL deletes for all current rows matching a SQL
    ``condition`` (the production flow: plan current files, locate
    matching rows by `_metadata.row_index`, emit (file_path, pos)
    delete files — merge-on-read, no data file rewritten)."""
    meta = load_metadata(table_dir)
    snap = select_snapshot(meta)
    if snap is None:
        raise IcebergError("cannot delete from an empty table")
    data, _ = plan_scan(meta, snap)
    dels_root = os.path.join(
        table_dir, "data",
        f"deletes-{snap['snapshot-id'] + 1}-{_attempt_id()}")
    # evaluate the condition on the field-id-projected view so it
    # names CURRENT columns even over files written pre-rename
    (_project_tasks(spark, meta, _current_schema(meta), data,
                    need_seq=True)
     .filter(F.expr(condition))
     .select(F.concat(F.lit("file://"), F.col("_ice_path"))
             .alias("file_path"),
             F.col("_ice_pos").alias("pos"))
     .coalesce(1)
     .write.mode("errorifexists").parquet(dels_root))
    schema = _current_schema(meta)
    spec = _spec_by_id(meta, meta["default-spec-id"])
    by_id = _field_by_id(schema)
    pfields = _partition_fields(
        schema, [by_id[f["source-id"]]["name"] for f in spec["fields"]])
    seq_next = meta["last-sequence-number"] + 1
    sid_next = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    entries = [_data_file_entry(p, {}, schema, content=1)
               for p in _list_parquet(dels_root)]
    manifest = _write_manifest(table_dir, sid_next, seq_next, entries,
                               pfields, schema, "posdel")
    return _commit_snapshot(table_dir,
                            _existing_manifests(meta) + [manifest],
                            "delete", meta, schema, pfields)


def add_equality_deletes(spark: SparkSession, table_dir: str,
                         values: DataFrame,
                         eq_cols: list[str]) -> int:
    """Commit EQUALITY deletes: any existing row (data_seq < delete
    seq, per spec) whose ``eq_cols`` null-safely equal a row of
    ``values`` is deleted. Rows appended AFTER this snapshot are NOT
    affected — the sequence-number rule the tests pin."""
    meta = load_metadata(table_dir)
    schema = _current_schema(meta)
    by_name = _field_by_name(schema)
    for c in eq_cols:
        if c not in by_name:
            raise IcebergError(f"equality column {c!r} not in schema")
    sid_next = max((s["snapshot-id"] for s in meta["snapshots"]),
                   default=0) + 1
    seq_next = meta["last-sequence-number"] + 1
    dels_root = os.path.join(table_dir, "data",
                         f"eqdel-{sid_next}-{_attempt_id()}")
    (values.select(*eq_cols).distinct().coalesce(1)
     .write.mode("errorifexists").parquet(dels_root))
    spec = _spec_by_id(meta, meta["default-spec-id"])
    by_id = _field_by_id(schema)
    pfields = _partition_fields(
        schema, [by_id[f["source-id"]]["name"] for f in spec["fields"]])
    eq_ids = [by_name[c]["id"] for c in eq_cols]
    entries = [_data_file_entry(p, {}, schema, content=2,
                                equality_ids=eq_ids)
               for p in _list_parquet(dels_root)]
    manifest = _write_manifest(table_dir, sid_next, seq_next, entries,
                               pfields, schema, "eqdel")
    return _commit_snapshot(table_dir,
                            _existing_manifests(meta) + [manifest],
                            "delete", meta, schema, pfields)


def snapshot_ids(table_dir: str) -> list[int]:
    meta = load_metadata(table_dir)
    return [s["snapshot-id"] for s in meta.get("snapshots", [])]


# ---------------------------------------------------------------------
# metadata tables (spec: Metadata Tables — snapshots/files/history/
# manifests as queryable DataFrames; all metadata-scale, built on the
# driver from the manifest chain, never from a directory listing)
# ---------------------------------------------------------------------

_META_TABLES = ("snapshots", "history", "manifests", "files")


def metadata_table(spark: SparkSession, table_dir: str,
                   kind: str) -> DataFrame:
    """The standard Iceberg inspection tables (`table$snapshots` etc.)
    as DataFrames. ``files`` reflects the CURRENT snapshot's scan plan
    (data + delete files with per-file stats); the other three reflect
    the whole table history."""
    meta = load_metadata(table_dir)
    if kind == "snapshots":
        rows = [(s["snapshot-id"], s.get("parent-snapshot-id"),
                 s["sequence-number"],
                 s["timestamp-ms"], s["summary"]["operation"],
                 s["manifest-list"], s.get("schema-id", 0))
                for s in meta.get("snapshots", [])]
        return spark.createDataFrame(
            rows, "snapshot_id long, parent_id long, "
                  "sequence_number long, committed_at_ms long, "
                  "operation string, manifest_list string, "
                  "schema_id int")
    if kind == "history":
        # ancestor chain of the current snapshot = is_current_ancestor
        by_id = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
        anc = set()
        cur = meta.get("current-snapshot-id")
        while cur in by_id:
            anc.add(cur)
            cur = by_id[cur].get("parent-snapshot-id")
        rows = [(e["timestamp-ms"], e["snapshot-id"],
                 e["snapshot-id"] in anc)
                for e in meta.get("snapshot-log", [])]
        return spark.createDataFrame(
            rows, "made_current_at_ms long, snapshot_id long, "
                  "is_current_ancestor boolean")
    if kind == "manifests":
        snap = select_snapshot(meta)
        mfs = [] if snap is None else avroio.read_container(
            _local(snap["manifest-list"]))[1]
        rows = [(m["manifest_path"], m["manifest_length"],
                 m["partition_spec_id"], m.get("content", 0),
                 m.get("sequence_number", 0),
                 m.get("added_snapshot_id"),
                 m.get("added_files_count"),
                 m.get("added_rows_count"))
                for m in mfs]
        return spark.createDataFrame(
            rows, "path string, length long, partition_spec_id int, "
                  "content int, sequence_number long, "
                  "added_snapshot_id long, added_files_count int, "
                  "added_rows_count long")
    if kind == "files":
        snap = select_snapshot(meta)
        data, deletes = ([], []) if snap is None \
            else plan_scan(meta, snap)
        rows = [(0, t.path, "PARQUET", t.record_count,
                 os.path.getsize(t.path), t.seq,
                 {k: str(v) for k, v in t.partition.items()})
                for t in data]
        rows += [(1 if d.kind == "pos" else 2, d.path, "PARQUET",
                  d.record_count, os.path.getsize(d.path), d.seq, {})
                 for d in deletes]
        return spark.createDataFrame(
            rows, "content int, file_path string, file_format string, "
                  "record_count long, file_size_in_bytes long, "
                  "sequence_number long, partition map<string,string>")
    raise IcebergError(
        f"unknown metadata table {kind!r} (one of {_META_TABLES})")


# ---------------------------------------------------------------------
# table maintenance: compaction + snapshot expiry
# ---------------------------------------------------------------------

def compact_table(spark: SparkSession, table_dir: str) -> int:
    """Rewrite the CURRENT table state into fresh data files and
    commit it as a `replace` snapshot: merge-on-read deletes are
    materialized away and the new snapshot's manifest list carries
    ONLY the rewritten files (scan cost resets to O(live data)).
    Prior snapshots keep their own manifest lists, so time travel
    still sees pre-compaction states until `expire_snapshots`.
    Returns the new snapshot id."""
    meta = load_metadata(table_dir)
    snap = select_snapshot(meta)
    if snap is None:
        raise IcebergError("cannot compact an empty table")
    schema = _current_schema(meta)
    spec = _spec_by_id(meta, meta["default-spec-id"])
    by_id = _field_by_id(schema)
    partition_by = [by_id[f["source-id"]]["name"]
                    for f in spec["fields"]]
    pfields = _partition_fields(schema, partition_by)
    df = read_iceberg(spark, table_dir)
    sid_next = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    seq_next = meta["last-sequence-number"] + 1
    data_root = os.path.join(table_dir, "data",
                         f"snap-{sid_next}-{_attempt_id()}")
    w = df.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_root)
    part_types = {p["name"]: p["ice_type"] for p in pfields}
    entries = []
    for path in _list_parquet(data_root):
        part = _hive_partition(path, data_root, part_types)
        entries.append(_data_file_entry(path, part, schema))
    manifest = _write_manifest(table_dir, sid_next, seq_next, entries,
                               pfields, schema, "compact")
    return _commit_snapshot(table_dir, [manifest], "replace", meta,
                            schema, pfields)


def create_ref(table_dir: str, name: str, kind: str = "tag",
               snapshot_id: int | None = None) -> None:
    """Create (or move) a named ref — ``kind`` "tag" (audit pointer,
    reads project the snapshot's schema) or "branch" (reads project
    the current table schema). Defaults to the current snapshot.
    Metadata-only commit; refs survive later snapshots and protect
    their snapshot from expire_snapshots."""
    if kind not in ("tag", "branch"):
        raise IcebergError(f"ref kind {kind!r} (tag|branch)")
    if name == "main":
        raise IcebergError("main is managed by commits")
    meta = load_metadata(table_dir)
    if snapshot_id is None:
        snapshot_id = meta.get("current-snapshot-id")
        if snapshot_id in (None, -1):
            raise IcebergError("empty table has no snapshot to ref")
    elif all(s["snapshot-id"] != snapshot_id
             for s in meta.get("snapshots", [])):
        raise IcebergError(f"snapshot {snapshot_id} not found")
    meta.setdefault("refs", {})[name] = {
        "snapshot-id": snapshot_id, "type": kind}
    meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata_version(table_dir, meta)


def drop_ref(table_dir: str, name: str) -> None:
    if name == "main":
        raise IcebergError("main cannot be dropped")
    meta = load_metadata(table_dir)
    if name not in meta.get("refs", {}):
        raise IcebergError(f"ref {name!r} not found")
    del meta["refs"][name]
    meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata_version(table_dir, meta)


def _write_metadata_version(table_dir: str, meta: dict,
                            expected_from: int | None = None) -> None:
    """Publish a new metadata version with optimistic concurrency:
    the target vN.metadata.json is created EXCLUSIVELY at
    ``expected_from + 1`` (the version the writer's state was loaded
    from), so a writer racing on the same parent — or on a STALE one —
    gets a loud CommitConflict (spec: atomic swap of the metadata
    pointer), never a lost update."""
    if expected_from is None:
        expected_from = meta.get("_loaded-version",
                                 _read_version_hint(table_dir))
    meta = {k: val for k, val in meta.items()
            if k != "_loaded-version"}
    v = expected_from + 1
    md = _meta_dir(table_dir)
    path = os.path.join(md, f"v{v}.metadata.json")
    try:
        with open(path, "x") as fh:
            json.dump(meta, fh, indent=1)
    except FileExistsError:
        raise IcebergError(
            f"CommitConflict: v{v} was committed concurrently — "
            "reload table metadata and retry") from None
    with open(os.path.join(md, "version-hint.text"), "w") as fh:
        fh.write(str(v))


def expire_snapshots(table_dir: str, keep_last: int | None = None,
                     older_than_ms: int | None = None) -> dict:
    """Drop expired snapshots from table metadata and delete every
    manifest list, manifest and data/delete file no retained snapshot
    references (the current snapshot is always retained). Returns
    {"expired_snapshots", "deleted_files"} counts. After expiry, time
    travel to an expired snapshot raises — the trade that bounds
    metadata + storage growth on a rolling 100 TB table."""
    if (keep_last is None) == (older_than_ms is None):
        raise IcebergError(
            "pass exactly one of keep_last / older_than_ms")
    meta = load_metadata(table_dir)
    snaps = meta.get("snapshots", [])
    cur = meta.get("current-snapshot-id")
    ordered = sorted(snaps, key=lambda s: s["timestamp-ms"])
    if keep_last is not None:
        if keep_last < 1:
            raise IcebergError("keep_last must be >= 1")
        keep = {s["snapshot-id"] for s in ordered[-keep_last:]}
    else:
        keep = {s["snapshot-id"] for s in ordered
                if s["timestamp-ms"] >= older_than_ms}
    keep.add(cur)
    # every ref'd snapshot is retained (spec: expiry honors refs)
    keep |= {r["snapshot-id"] for r in meta.get("refs", {}).values()}
    expired = [s for s in snaps if s["snapshot-id"] not in keep]
    if not expired:
        return {"expired_snapshots": 0, "deleted_files": 0}

    def _referenced(snapshot_ids) -> set:
        refs = set()
        for s in snaps:
            if s["snapshot-id"] not in snapshot_ids:
                continue
            mlist = _local(s["manifest-list"])
            refs.add(mlist)
            _, mfs = avroio.read_container(mlist)
            for m in mfs:
                mpath = _local(m["manifest_path"])
                refs.add(mpath)
                _, entries = avroio.read_container(mpath)
                for e in entries:
                    refs.add(_local(e["data_file"]["file_path"]))
        return refs

    keep_refs = _referenced(keep)
    drop_refs = _referenced({s["snapshot-id"] for s in expired})
    to_delete = sorted(drop_refs - keep_refs)
    meta["snapshots"] = [s for s in snaps if s["snapshot-id"] in keep]
    meta["snapshot-log"] = [e for e in meta.get("snapshot-log", [])
                            if e["snapshot-id"] in keep]
    meta["last-updated-ms"] = int(time.time() * 1000)
    _write_metadata_version(table_dir, meta)
    deleted = 0
    for p in to_delete:
        if os.path.exists(p):
            os.remove(p)
            deleted += 1
    return {"expired_snapshots": len(expired),
            "deleted_files": deleted}


def remove_orphan_files(table_dir: str,
                        older_than_ms: int | None = None) -> dict:
    """Delete files under ``table_dir`` that NO snapshot references —
    the leftovers of conflict-losing write attempts (attempt-unique
    roots) and crashed jobs. Every manifest list, manifest and
    data/delete file reachable from ANY snapshot in current metadata
    is retained, as are all vN.metadata.json versions and the
    version hint. ``older_than_ms``: only delete files whose mtime is
    older — defaults to 24 h ago, because an IN-FLIGHT commit writes
    its data files and manifests BEFORE the metadata swap publishes
    them (same grace-period contract as the JVM action's
    olderThan). Returns {"deleted_files": n}.

    Scale note: referenced-set construction is O(metadata) (manifest
    chain walk, same cost as planning); the directory walk is O(files
    on disk) — this is a MAINTENANCE job, never on the read path."""
    meta = load_metadata(table_dir)
    refs: set[str] = set()
    for s in meta.get("snapshots", []):
        mlist = _local(s["manifest-list"])
        refs.add(os.path.realpath(mlist))
        _, mfs = avroio.read_container(mlist)
        for m in mfs:
            mpath = _local(m["manifest_path"])
            refs.add(os.path.realpath(mpath))
            _, entries = avroio.read_container(mpath)
            for e in entries:
                refs.add(os.path.realpath(
                    _local(e["data_file"]["file_path"])))
    cutoff = time.time() - 86_400 if older_than_ms is None \
        else older_than_ms / 1000.0
    md = os.path.realpath(_meta_dir(table_dir))
    deleted = 0
    for dirpath, _dirs, files in os.walk(table_dir):
        for name in files:
            p = os.path.realpath(os.path.join(dirpath, name))
            if os.path.dirname(p) == md and (
                    name.endswith(".metadata.json")
                    or name == "version-hint.text"):
                continue  # metadata versions are expiry's business
            if p in refs:
                continue
            if os.path.getmtime(p) >= cutoff:
                continue  # too fresh: may belong to an in-flight commit
            os.remove(p)
            deleted += 1
    # prune now-empty data dirs (cosmetic; never touches metadata/)
    for dirpath, _dirs, _files in os.walk(
            os.path.join(table_dir, "data"), topdown=False):
        if os.path.isdir(dirpath) and not os.listdir(dirpath):
            try:
                os.rmdir(dirpath)
            except OSError:
                pass
    return {"deleted_files": deleted}


def merge_upsert(spark: SparkSession, table_dir: str,
                 updates: DataFrame, keys: list[str]) -> int:
    """Row-level MERGE (upsert) as ONE atomic snapshot: an equality
    delete on ``keys`` for the incoming rows plus the appended rows,
    committed together (operation `overwrite`). Existing rows whose
    keys match an update are superseded; unmatched incoming rows are
    inserts. Both manifests share the new sequence number, so per the
    spec's `data_seq < delete_seq` rule the delete erases only PRIOR
    file generations — the rows appended by this same commit survive.
    Merge-on-read: no existing data file is rewritten; a later
    compact_table materializes. This is the rolling-crawl upsert shape
    (latest capture of each url wins) at 100 TB: commit cost is
    O(delta), never O(table)."""
    meta = load_metadata(table_dir)
    schema = _current_schema(meta)
    by_name = _field_by_name(schema)
    for k in keys:
        if k not in by_name:
            raise IcebergError(f"merge key {k!r} not in schema")
    spec = _spec_by_id(meta, meta["default-spec-id"])
    by_id = _field_by_id(schema)
    partition_by = [by_id[f["source-id"]]["name"]
                    for f in spec["fields"]]
    pfields = _partition_fields(schema, partition_by)
    updates = updates.select(*[
        F.col(f["name"]).cast(_ice_type_to_spark(f["type"]))
        .alias(f["name"]) for f in schema["fields"]])

    sid_next = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    seq_next = meta["last-sequence-number"] + 1
    att = _attempt_id()

    dels_root = os.path.join(table_dir, "data",
                             f"upsert-del-{sid_next}-{att}")
    (updates.select(*keys).distinct().coalesce(1)
     .write.mode("errorifexists").parquet(dels_root))
    eq_ids = [by_name[k]["id"] for k in keys]
    del_entries = [_data_file_entry(p, {}, schema, content=2,
                                    equality_ids=eq_ids)
                   for p in _list_parquet(dels_root)]
    del_manifest = _write_manifest(table_dir, sid_next, seq_next,
                                   del_entries, pfields, schema,
                                   f"upsert-del-{att}")

    data_root = os.path.join(table_dir, "data",
                             f"upsert-{sid_next}-{att}")
    w = updates.write.mode("errorifexists")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(data_root)
    part_types = {p["name"]: p["ice_type"] for p in pfields}
    data_entries = [
        _data_file_entry(p, _hive_partition(p, data_root, part_types),
                         schema)
        for p in _list_parquet(data_root)]
    data_manifest = _write_manifest(table_dir, sid_next, seq_next,
                                    data_entries, pfields, schema,
                                    f"upsert-data-{att}")
    return _commit_snapshot(
        table_dir,
        _existing_manifests(meta) + [del_manifest, data_manifest],
        "overwrite", meta, schema, pfields)
