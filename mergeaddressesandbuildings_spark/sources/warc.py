"""WARC (ISO 28500) web-archive container source — the ingestion path
from actual Common-Crawl-style archives into the engine's
``pages(url, warc_ts, html, text, lang)`` input table
(BASELINE.json input_hint; FIXTURES.md §1).

Reader: ``spark.read.format("binaryFile")`` yields one row per
archive file; an Arrow-batched ``mapInPandas`` parser (generator per
file — no per-row Python) expands each file into its records. Both
plain ``.warc`` and gzip ``.warc.gz`` are handled, detected by magic
bytes; Common Crawl's per-record gzip members decompress seamlessly
as a concatenated stream.

Scale shape (a full crawl is ~64k files × ~1 GB): parallelism is
file-level — the Common-Crawl convention of many ~1 GB archives makes
the file the natural split unit, exactly how every production WARC
consumer schedules (one task per archive). Memory per task is bounded
by one decompressed archive; point ``spark.sql.files.
maxPartitionBytes`` above the file size so binaryFile never bundles
two archives into one task. Record-level splitting inside one file
would require resynchronizing on member boundaries mid-stream — the
per-file unit is simpler and already saturates any cluster at
crawl-scale file counts.

The writer (``write_warc``) is a driver-side fixture builder, same
contract as sources/osm_pbf.write_pbf: deterministic record ids (no
uuid/clock), optional per-record gzip members, used by tests and the
driver query to produce byte-exact archives from table rows.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

RECORD_SCHEMA = (
    "path string, record_type string, record_id string, url string, "
    "warc_ts timestamp, http_status int, content_length long, "
    "payload binary"
)

_GZIP_MAGIC = b"\x1f\x8b"


def _decompress_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the Common-Crawl
    per-record layout) — or pass plain bytes through untouched."""
    if not data.startswith(_GZIP_MAGIC):
        return data
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(data[pos:]))
        out.write(d.flush())
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage — stop, keep what parsed
            break
        pos += consumed
    return out.getvalue()


def _parse_warc_bytes(raw: bytes) -> Iterator[dict]:
    """Yield record dicts from decompressed WARC bytes. Tolerates both
    CRLF (spec) and LF header line endings; Content-Length drives the
    block read, so payload bytes pass through EXACTLY."""
    n = len(raw)
    pos = 0
    while True:
        pos = raw.find(b"WARC/", pos)
        if pos < 0 or pos >= n:
            return
        hdr_end = raw.find(b"\r\n\r\n", pos)
        sep = 4
        alt = raw.find(b"\n\n", pos)
        if hdr_end < 0 or (0 <= alt < hdr_end):
            hdr_end, sep = alt, 2
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].decode("latin-1").splitlines()[1:]:
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = hdr_end + sep  # unparseable record: resync forward
            continue
        block = raw[hdr_end + sep:hdr_end + sep + clen]
        rtype = headers.get("warc-type", "")
        status = None
        payload = block
        if rtype in ("response", "revisit") and block[:5] == b"HTTP/":
            he = block.find(b"\r\n\r\n")
            hs, hsep = (he, 4)
            if he < 0:
                hs, hsep = block.find(b"\n\n"), 2
            if hs >= 0:
                status_line = block[:block.find(b"\n")].decode(
                    "latin-1", "replace")
                parts = status_line.split(" ")
                if len(parts) >= 2 and parts[1][:3].isdigit():
                    status = int(parts[1][:3])
                payload = block[hs + hsep:]
        yield {
            "record_type": rtype,
            "record_id": headers.get("warc-record-id", ""),
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "http_status": status,
            "content_length": len(payload),
            "payload": payload,
        }
        pos = hdr_end + sep + clen


def read_warc(spark: SparkSession, path: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Read WARC archive files (glob ok, ``.warc`` or ``.warc.gz``)
    into one row per record: ``RECORD_SCHEMA``. ``record_types``
    filters (default: response records only — the pages); pass ``()``
    for everything including warcinfo/request."""
    import pandas as pd

    # resolve the glob driver-side and hand binaryFile concrete paths:
    # load(<glob>) first tries the pattern as a literal path and LOGS a
    # FileNotFoundException before falling back to glob expansion —
    # harmless but alarming noise; eager resolution also turns a typo
    # into a clean error instead of an empty scan
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    matches = fs.globStatus(jpath)
    if not matches:
        raise FileNotFoundError(f"read_warc: no files match {path}")
    paths = [m.getPath().toString() for m in matches]
    files = spark.read.format("binaryFile").load(paths) \
        .select("path", "content")
    want = tuple(record_types)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                recs = []
                raw = _decompress_members(bytes(row["content"]))
                for r in _parse_warc_bytes(raw):
                    if want and r["record_type"] not in want:
                        continue
                    r["path"] = row["path"]
                    recs.append(r)
                if not recs:
                    continue
                out = pd.DataFrame(recs)
                out["warc_ts"] = pd.to_datetime(
                    out["warc_ts"], utc=True, errors="coerce"
                ).dt.tz_localize(None)
                out["http_status"] = out["http_status"].astype("Int32")
                yield out[["path", "record_type", "record_id", "url",
                           "warc_ts", "http_status", "content_length",
                           "payload"]]

    return files.mapInPandas(parse, RECORD_SCHEMA)


def warc_to_pages(records: DataFrame) -> DataFrame:
    """Project parsed response records onto the engine's input table
    shape ``(url, warc_ts, html)`` — feed through operators/extract.py
    for text/lang, completing WARC → pages ingestion."""
    from pyspark.sql import functions as F

    return records.filter(F.col("record_type") == "response").select(
        "url", "warc_ts", F.col("payload").alias("html"))


def _record_id(url: str, ts: str) -> str:
    h = hashlib.sha256(f"{url}|{ts}".encode()).hexdigest()[:32]
    return f"<urn:sha256:{h}>"


def write_warc(path: str, records: list[dict],
               gzip_members: bool = False) -> int:
    """Driver-side fixture writer: encode row dicts
    ``{url, ts (ISO string or datetime), html (bytes), status?}`` as a
    standard WARC file — a leading warcinfo record, then one response
    record per row wrapping an HTTP/1.1 response. ``gzip_members``
    writes each record as its own gzip member (the Common-Crawl
    layout). Deterministic: record ids are sha256 of (url, ts), no
    clocks, no uuids. Returns the number of records written."""
    def _ts(v) -> str:
        if isinstance(v, str):
            return v
        s = v.strftime("%Y-%m-%dT%H:%M:%SZ")
        return s

    def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in headers
        ) + f"Content-Length: {len(block)}\r\n\r\n".encode()
        return head + block + b"\r\n\r\n"

    info_block = b"software: mergeaddressesandbuildings_spark\r\n"
    chunks = [_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", _record_id("warcinfo", "0")),
         ("Content-Type", "application/warc-fields")],
        info_block)]
    for r in records:
        html: bytes = r["html"]
        ts = _ts(r["ts"])
        status = int(r.get("status", 200))
        http = (f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: text/html\r\n"
                f"Content-Length: {len(html)}\r\n\r\n").encode() + html
        chunks.append(_record(
            [("WARC-Type", "response"),
             ("WARC-Record-ID", _record_id(r["url"], ts)),
             ("WARC-Date", ts),
             ("WARC-Target-URI", r["url"]),
             ("Content-Type", "application/http; msgtype=response")],
            http))
    with open(path, "wb") as f:
        if gzip_members:
            for c in chunks:
                f.write(gzip.compress(c, mtime=0))
        else:
            for c in chunks:
                f.write(c)
    return len(records)


def write_warc_df(df: DataFrame, out_dir: str,
                  gzip_members: bool = True) -> DataFrame:
    """Distributed WARC writer: shard-parallel archive construction —
    the write half of the crawl-scale contract (read_warc's file-level
    parallelism, mirrored). ``df`` columns: ``shard int`` (which
    archive a row belongs to), ``url string``, ``ts`` (timestamp or
    ISO string), ``html binary``. Writes ``<out_dir>/shard<k>.warc[.gz]``
    — ONE file per distinct shard value, each produced by exactly one
    task (rows are hash-repartitioned by shard, so a shard never
    splits across tasks; a task may write several small shards).
    Returns a manifest DataFrame ``(shard, path, n_records)`` with one
    row per archive — collecting it is what runs the writes, and it is
    shard-count-sized, never corpus-sized.

    Determinism/idempotence: in-file record order is a sort on
    (url, ts), record ids are content-derived (write_warc), and gzip
    members carry mtime=0 — so a retried task rewrites an identical
    file, and output bytes are parallelism-invariant. Contracts:
    ``out_dir`` must be a shared filesystem path on a multi-node
    cluster (run_merge ``barrier_dir`` rule), and one shard must fit a
    task's memory — shard sizing is the caller's lever, matching the
    Common-Crawl ~1 GB-per-archive convention the reader's scale note
    documents."""
    import os

    import pandas as pd

    spark = df.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    part = (
        df.select("shard", "url", "ts", "html")
        .repartition(n_part, "shard")
        .sortWithinPartitions("shard", "url", "ts")
    )
    ext = ".warc.gz" if gzip_members else ".warc"

    def _write(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        bufs: dict[int, list[dict]] = {}
        for b in batches:
            for shard, url, ts, html in zip(
                b["shard"], b["url"], b["ts"], b["html"]
            ):
                bufs.setdefault(int(shard), []).append(
                    {"url": url, "ts": ts, "html": bytes(html)})
        rows = []
        for shard in sorted(bufs):
            path = os.path.join(out_dir, f"shard{shard}{ext}")
            n = write_warc(path, bufs[shard], gzip_members=gzip_members)
            rows.append((shard, path, n))
        if rows:
            yield pd.DataFrame(
                rows, columns=["shard", "path", "n_records"])

    return part.mapInPandas(
        _write, schema="shard int, path string, n_records long")
