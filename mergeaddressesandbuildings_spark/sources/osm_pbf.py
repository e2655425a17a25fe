"""S2b: OSM PBF reader/writer (SURVEY.md §2.1 S2 ext) — the compact
binary format most real OSM extracts ship in (`.osm.pbf`), so users do
not have to convert to XML first.

No protobuf library exists in this sandbox, so this module carries a
minimal, self-contained codec for the two public OSM schemas
(fileformat.proto / osmformat.proto, spec at
https://wiki.openstreetmap.org/wiki/PBF_Format):

    file  := repeated [ int32_be n, BlobHeader(n), Blob(datasize) ]
    Blob  := raw | zlib(PrimitiveBlock)
    PrimitiveBlock := stringtable + primitivegroups
                      (dense nodes / ways / relations)

Spark shape — designed for planet-scale files:

- **Blob index scan (driver)**: one sequential pass over each file
  reading ONLY the 4-byte length + BlobHeader of every blob (a few KB
  per ~8 MB blob) to build an ``(path, offset, size)`` index. This is
  the same ranged-read pattern a cluster reader uses against S3/HDFS.
- **Distributed decode**: the index is parallelized and each task
  seeks to its blob, inflates it, and decodes it independently — blobs
  are self-contained by spec, so a planet file fans out to thousands
  of independent tasks with no shuffle.
- **Vectorized decode**: the bulk of PBF volume is packed varint
  arrays (dense node ids/lats/lons, way refs). Those are decoded with
  a branch-free numpy kernel (≤10 vector passes — one per possible
  varint byte position) instead of a per-byte Python loop. Only the
  sparse parts (message framing, tag dictionaries) run row-at-a-time.

Output tables are identical to the XML reader's
(:mod:`.osm_xml` NODES/WAYS/RELATIONS schemas), so
``osm_xml.to_existing_table`` plugs PBF state straight into
``run_merge`` — parity is asserted byte-for-byte in
tests/test_osm_pbf.py (same fixture via XML and PBF ⇒ identical merge
fingerprints).

``write_pbf`` is the inverse (driver-side, used for fixtures and for
exporting small extracts); round-trip identity is part of the test
contract.
"""

from __future__ import annotations

import glob as _glob
import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from mergeaddressesandbuildings_spark.sources.osm_xml import (
    NODES_SCHEMA,
    RELATIONS_SCHEMA,
    WAYS_SCHEMA,
)

# osmformat.proto defaults
_GRANULARITY = 100
_NANO = 1e-9

_MEMBER_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Single varint at ``pos`` → (value, next_pos). Used only on the
    sparse framing path; packed arrays go through the numpy kernel."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _decode_packed_varints(chunk: bytes) -> np.ndarray:
    """Decode a packed-varint buffer to uint64 in ≤10 numpy passes.

    Terminator bytes (high bit clear) mark varint ends; byte k of a
    varint contributes ``(b & 0x7f) << 7k``. Iterating k over the max
    varint length applies every k-th byte of every varint in one
    vectorized step — no per-value Python."""
    buf = np.frombuffer(chunk, dtype=np.uint8)
    if buf.size == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero(buf < 0x80)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for k in range(int(lens.max())):
        mask = lens > k
        idx = starts[mask] + k
        vals[mask] |= (buf[idx].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * k)
    return vals


def _unzigzag(v: np.ndarray) -> np.ndarray:
    u = v.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -((u & np.uint64(1)).astype(np.int64))


def _iter_fields(buf: bytes, pos: int, end: int):
    """Yield (field_number, wire_type, scalar_or_slice) over a message.
    Length-delimited fields yield a (start, stop) slice into ``buf``."""
    while pos < end:
        key, pos = _read_varint(buf, pos)
        field, wtype = key >> 3, key & 7
        if wtype == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wtype, val
        elif wtype == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wtype, (pos, pos + ln)
            pos += ln
        elif wtype == 1:
            yield field, wtype, struct.unpack_from("<q", buf, pos)[0]
            pos += 8
        elif wtype == 5:
            yield field, wtype, struct.unpack_from("<i", buf, pos)[0]
            pos += 4
        else:  # pragma: no cover - groups are absent from OSM PBF
            raise ValueError(f"unsupported wire type {wtype}")


def _encode_varint(v: int) -> bytes:
    if v < 0:  # a negative here would loop forever (arithmetic shift)
        raise ValueError(
            "varint encode needs a non-negative int — zigzag sint64 or "
            "mask int64 to two's complement (_encode_int64) first")
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_int64(v: int) -> bytes:
    """Plain (non-zigzag) int64 field: negatives go as two's complement
    (10-byte varint), per proto wire format."""
    return _encode_varint(v & 0xFFFFFFFFFFFFFFFF)


def _signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(field: int, wtype: int) -> bytes:
    return _encode_varint((field << 3) | wtype)


def _packed(field: int, values, zigzag: bool = False) -> bytes:
    body = b"".join(
        _encode_varint(_zigzag(int(v)) if zigzag else int(v)) for v in values
    )
    return _field(field, 2) + _encode_varint(len(body)) + body


def _bytes_field(field: int, payload: bytes) -> bytes:
    return _field(field, 2) + _encode_varint(len(payload)) + payload


# ---------------------------------------------------------------------------
# blob index scan (driver side)
# ---------------------------------------------------------------------------

def scan_blobs(path: str) -> list[tuple[str, int, int]]:
    """Sequential header-only scan → ``[(file, blob_offset, blob_size)]``
    for every OSMData blob. ``path`` may be a glob. Reads a few KB per
    blob regardless of blob size, so indexing a planet file is cheap;
    the returned index is what gets parallelized."""
    files = sorted(_glob.glob(path)) or [path]
    index: list[tuple[str, int, int]] = []
    for f in files:
        with open(f, "rb") as fh:
            while True:
                head = fh.read(4)
                if len(head) < 4:
                    break
                (hlen,) = struct.unpack(">i", head)
                header = fh.read(hlen)
                btype, datasize = "", 0
                for field, _, val in _iter_fields(header, 0, len(header)):
                    if field == 1:
                        btype = header[val[0]:val[1]].decode()
                    elif field == 3:
                        datasize = val
                offset = fh.tell()
                if btype == "OSMData":
                    index.append((f, offset, datasize))
                fh.seek(offset + datasize)
    return index


def _inflate_blob(buf: bytes) -> bytes:
    raw, zdata = None, None
    for field, _, val in _iter_fields(buf, 0, len(buf)):
        if field == 1:
            raw = buf[val[0]:val[1]]
        elif field == 3:
            zdata = buf[val[0]:val[1]]
    if raw is not None:
        return raw
    if zdata is not None:
        return zlib.decompress(zdata)
    raise ValueError("blob carries neither raw nor zlib_data")


# ---------------------------------------------------------------------------
# PrimitiveBlock decode (executor side)
# ---------------------------------------------------------------------------

def _decode_block(block: bytes):
    """PrimitiveBlock bytes → (nodes, ways, relations) row dicts."""
    strings: list[str] = []
    groups: list[tuple[int, int]] = []
    granularity, lat_off, lon_off = _GRANULARITY, 0, 0
    for field, _, val in _iter_fields(block, 0, len(block)):
        if field == 1:  # stringtable
            for f2, _, v2 in _iter_fields(block, val[0], val[1]):
                if f2 == 1:
                    strings.append(block[v2[0]:v2[1]].decode("utf-8"))
        elif field == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            # plain int64 varint (NOT zigzag): negative values arrive as
            # two's complement in 10 bytes
            lat_off = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 20:
            lon_off = val - (1 << 64) if val >= (1 << 63) else val

    scale_lat = lambda a: (lat_off + granularity * a) * _NANO  # noqa: E731
    nodes: list[dict] = []
    ways: list[dict] = []
    rels: list[dict] = []

    for gstart, gend in groups:
        for field, _, val in _iter_fields(block, gstart, gend):
            if field == 2:  # DenseNodes — the volume path, all numpy
                ids = lats = lons = np.empty(0, dtype=np.int64)
                keys_vals = np.empty(0, dtype=np.int64)
                for f2, _, v2 in _iter_fields(block, val[0], val[1]):
                    chunk = block[v2[0]:v2[1]]
                    if f2 == 1:
                        ids = np.cumsum(_unzigzag(_decode_packed_varints(chunk)))
                    elif f2 == 8:
                        lats = np.cumsum(_unzigzag(_decode_packed_varints(chunk)))
                    elif f2 == 9:
                        lons = np.cumsum(_unzigzag(_decode_packed_varints(chunk)))
                    elif f2 == 10:
                        keys_vals = _decode_packed_varints(chunk).astype(np.int64)
                tags_per_node: list[dict] = [{} for _ in range(len(ids))]
                ni, ki = 0, 0
                while ki < len(keys_vals):
                    if keys_vals[ki] == 0:
                        ni += 1
                        ki += 1
                    else:
                        tags_per_node[ni][strings[keys_vals[ki]]] = strings[
                            keys_vals[ki + 1]
                        ]
                        ki += 2
                la = (lat_off + granularity * lats) * _NANO
                lo = (lon_off + granularity * lons) * _NANO
                for i in range(len(ids)):
                    nodes.append({
                        "id": int(ids[i]), "lat": float(la[i]),
                        "lon": float(lo[i]), "tags": tags_per_node[i],
                    })
            elif field == 1:  # plain (non-dense) Node
                nid, nlat, nlon = 0, 0, 0
                keys: np.ndarray = np.empty(0, dtype=np.uint64)
                vals_: np.ndarray = np.empty(0, dtype=np.uint64)
                for f2, wt2, v2 in _iter_fields(block, val[0], val[1]):
                    if f2 == 1:
                        nid = _unzigzag(np.array([v2], dtype=np.uint64))[0]
                    elif f2 == 8:
                        nlat = _unzigzag(np.array([v2], dtype=np.uint64))[0]
                    elif f2 == 9:
                        nlon = _unzigzag(np.array([v2], dtype=np.uint64))[0]
                    elif f2 == 2:
                        keys = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 3:
                        vals_ = _decode_packed_varints(block[v2[0]:v2[1]])
                nodes.append({
                    "id": int(nid),
                    "lat": float(scale_lat(nlat)),
                    "lon": float((lon_off + granularity * nlon) * _NANO),
                    "tags": {strings[int(k)]: strings[int(v)]
                             for k, v in zip(keys, vals_)},
                })
            elif field == 3:  # Way
                wid = 0
                keys = vals_ = np.empty(0, dtype=np.uint64)
                refs = np.empty(0, dtype=np.int64)
                for f2, _, v2 in _iter_fields(block, val[0], val[1]):
                    if f2 == 1:
                        wid = _signed64(v2)  # plain int64 (negative = new elem)
                    elif f2 == 2:
                        keys = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 3:
                        vals_ = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 8:
                        refs = np.cumsum(
                            _unzigzag(_decode_packed_varints(block[v2[0]:v2[1]]))
                        )
                ways.append({
                    "id": int(wid),
                    "node_refs": [int(r) for r in refs],
                    "tags": {strings[int(k)]: strings[int(v)]
                             for k, v in zip(keys, vals_)},
                })
            elif field == 4:  # Relation
                rid = 0
                keys = vals_ = np.empty(0, dtype=np.uint64)
                memids = np.empty(0, dtype=np.int64)
                roles = np.empty(0, dtype=np.uint64)
                mtypes = np.empty(0, dtype=np.uint64)
                for f2, _, v2 in _iter_fields(block, val[0], val[1]):
                    if f2 == 1:
                        rid = _signed64(v2)
                    elif f2 == 2:
                        keys = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 3:
                        vals_ = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 8:
                        roles = _decode_packed_varints(block[v2[0]:v2[1]])
                    elif f2 == 9:
                        memids = np.cumsum(
                            _unzigzag(_decode_packed_varints(block[v2[0]:v2[1]]))
                        )
                    elif f2 == 10:  # MemberType enum per member
                        mtypes = _decode_packed_varints(block[v2[0]:v2[1]])
                rels.append({
                    "id": int(rid),
                    "member_refs": [int(m) for m in memids],
                    "member_roles": [strings[int(r)] for r in roles],
                    "member_types": [_MEMBER_TYPES[int(t)] for t in mtypes],
                    "tags": {strings[int(k)]: strings[int(v)]
                             for k, v in zip(keys, vals_)},
                })
    return nodes, ways, rels


_INDEX_SCHEMA = T.StructType([
    T.StructField("path", T.StringType(), False),
    T.StructField("offset", T.LongType(), False),
    T.StructField("size", T.LongType(), False),
])


def _blob_reader(which: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, offset, size in zip(pdf["path"], pdf["offset"], pdf["size"]):
                with open(path, "rb") as fh:
                    fh.seek(int(offset))
                    blob = fh.read(int(size))
                parts = _decode_block(_inflate_blob(blob))
                if parts[which]:
                    yield pd.DataFrame(parts[which])
    return run


def _read(spark: SparkSession, path: str, which: int, schema) -> DataFrame:
    index = scan_blobs(path)
    if not index:
        return spark.createDataFrame([], schema)
    # one partition per blob: blobs are the format's parallelism unit
    idx_df = spark.createDataFrame(index, _INDEX_SCHEMA).repartition(len(index))
    return idx_df.mapInPandas(_blob_reader(which), schema=schema)


def read_nodes(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 0, NODES_SCHEMA)


def read_ways(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 1, WAYS_SCHEMA)


def read_relations(spark: SparkSession, path: str) -> DataFrame:
    return _read(spark, path, 2, RELATIONS_SCHEMA)


# ---------------------------------------------------------------------------
# writer (driver side — fixtures & small-extract export)
# ---------------------------------------------------------------------------

def _string_table(rows_tags, extra: list[str] = ()) -> tuple[list[str], dict]:
    strings = [""]  # index 0 is reserved (dense keys_vals terminator)
    lut: dict[str, int] = {"": 0}

    def intern(s: str) -> int:
        if s not in lut:
            lut[s] = len(strings)
            strings.append(s)
        return lut[s]

    for tags in rows_tags:
        for k, v in tags.items():
            intern(k)
            intern(v)
    for s in extra:
        intern(s)
    return strings, lut


def _blob(block: bytes, btype: str = "OSMData") -> bytes:
    z = zlib.compress(block)
    blob = _field(2, 0) + _encode_varint(len(block)) + _bytes_field(3, z)
    header = _bytes_field(1, btype.encode()) + _field(3, 0) + _encode_varint(len(blob))
    return struct.pack(">i", len(header)) + header + blob


def write_pbf(path: str,
              nodes: list[dict],
              ways: list[dict] | None = None,
              relations: list[dict] | None = None,
              nodes_per_block: int = 8000) -> int:
    """Encode (nodes, ways, relations) row dicts — same shapes the
    readers emit — into ``path`` as a standard `.osm.pbf`. Dense-node
    encoding, zlib blobs, ``nodes_per_block`` nodes per blob (small
    values force multi-blob files, which is how the tests exercise the
    parallel read path). Returns the number of blobs written."""
    ways = ways or []
    relations = relations or []
    blobs: list[bytes] = []

    # header blob
    header_block = (
        _bytes_field(4, b"OsmSchema-V0.6") + _bytes_field(4, b"DenseNodes")
    )
    out = [_blob(header_block, "OSMHeader")]

    def dense_block(chunk: list[dict]) -> bytes:
        strings, lut = _string_table([n["tags"] for n in chunk])
        st = b"".join(_bytes_field(1, s.encode("utf-8")) for s in strings)
        ids = [n["id"] for n in chunk]
        las = [int(round(n["lat"] / _NANO / _GRANULARITY)) for n in chunk]
        los = [int(round(n["lon"] / _NANO / _GRANULARITY)) for n in chunk]
        kv: list[int] = []
        for n in chunk:
            for k, v in n["tags"].items():
                kv += [lut[k], lut[v]]
            kv.append(0)
        delta = lambda xs: [x - p for x, p in zip(xs, [0] + xs[:-1])]  # noqa: E731
        dense = (
            _packed(1, delta(ids), zigzag=True)
            + _packed(8, delta(las), zigzag=True)
            + _packed(9, delta(los), zigzag=True)
            + (_packed(10, kv) if kv else b"")
        )
        group = _bytes_field(2, dense)
        return _bytes_field(1, st) + _bytes_field(2, group)

    for i in range(0, len(nodes), nodes_per_block):
        out.append(_blob(dense_block(nodes[i:i + nodes_per_block])))
        blobs.append(b"")

    if ways or relations:
        tag_rows = [w["tags"] for w in ways] + [r["tags"] for r in relations]
        roles = sorted({ro for r in relations for ro in r["member_roles"]})
        strings, lut = _string_table(tag_rows, extra=roles)
        st = b"".join(_bytes_field(1, s.encode("utf-8")) for s in strings)
        groups = b""
        wmsgs = b""
        for w in ways:
            refs = w["node_refs"]
            delta_refs = [r - p for r, p in zip(refs, [0] + refs[:-1])]
            msg = (
                _field(1, 0) + _encode_int64(w["id"])
                + (_packed(2, [lut[k] for k in w["tags"]]) if w["tags"] else b"")
                + (_packed(3, [lut[v] for v in w["tags"].values()]) if w["tags"] else b"")
                + (_packed(8, delta_refs, zigzag=True) if refs else b"")
            )
            wmsgs += _bytes_field(3, msg)
        if wmsgs:
            groups += _bytes_field(2, wmsgs)
        rmsgs = b""
        for r in relations:
            mids = r["member_refs"]
            delta_mids = [m - p for m, p in zip(mids, [0] + mids[:-1])]
            # member types: honor the row's member_types (node/way/
            # relation); rows without one (legacy fixtures) default
            # way, as does any PER-ELEMENT blank — XML members with no
            # type attribute parse as '' and PBF has no untyped slot
            mt = r.get("member_types") or ["way"] * len(mids)
            mt = [t if t in _MEMBER_TYPES else "way" for t in mt]
            msg = (
                _field(1, 0) + _encode_int64(r["id"])
                + (_packed(2, [lut[k] for k in r["tags"]]) if r["tags"] else b"")
                + (_packed(3, [lut[v] for v in r["tags"].values()]) if r["tags"] else b"")
                + (_packed(8, [lut[ro] for ro in r["member_roles"]])
                   if r["member_roles"] else b"")
                + (_packed(9, delta_mids, zigzag=True) if mids else b"")
                + (_packed(10, [_MEMBER_TYPES.index(t) for t in mt])
                   if mids else b"")
            )
            rmsgs += _bytes_field(4, msg)
        if rmsgs:
            groups += _bytes_field(2, rmsgs)
        out.append(_blob(_bytes_field(1, st) + groups))
        blobs.append(b"")

    with open(path, "wb") as fh:
        for b in out:
            fh.write(b)
    return len(out) - 1
