"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata (driver round spec: "treat image/audio/video as
opaque binary columns ... decode / feature-extract / resize /
frame-sample as Pandas UDFs over mapInPandas").

Spark-side design (the part that must be real at 100 TB):
- payloads ride a ``binary`` column that is NEVER collected to the
  driver; every op is a ``mapInPandas`` pass whose output schema drops
  the payload as soon as it is no longer needed (column pruning keeps
  multi-KB blobs out of downstream shuffles);
- decode/feature ops are batch-vectorized: one numpy pass per Arrow
  batch, zero per-row Python in the hot loop beyond the unavoidable
  per-blob header parse (blobs are variable-length — ragged);
- frame sampling is a 1→N mapInPandas (UDTF shape), emitting fixed-size
  frame slices so downstream batches stay rectangular.

Codec handling: the sandbox has no PIL/ffmpeg/librosa, so *real* codec
decode is stubbed behind an import-try (``NotImplementedError`` with a
clear message). The deterministic MMF1 container below is a real,
parseable format (magic + packed header + raw samples) — the decode
path genuinely parses bytes, so the plumbing (schemas, batch shapes,
partitioning) is exercised end-to-end, not faked.

MMF1 layout (little-endian):
  bytes 0..3   magic b"MMF1"
  byte  4      kind: 0=image, 1=audio, 2=video
  bytes 5..8   u32 a   (image: width;  audio: sample_rate; video: width)
  bytes 9..12  u32 b   (image: height; audio: n_samples;   video: height)
  bytes 13..16 u32 c   (image: channels; audio: channels;  video: n_frames)
  bytes 17..   payload: image w*h*ch u8 | audio n*ch i16 | video n_frames
               frames of w*h u8 (grayscale)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from mergeaddressesandbuildings_spark.functions import ids

try:  # real codecs, absent in this sandbox — gate, never hard-import
    from PIL import Image as _PIL_Image  # noqa: F401
    _HAVE_PIL = True
except Exception:
    _PIL_Image = None
    _HAVE_PIL = False

_MAGIC = b"MMF1"
_KINDS = {0: "image", 1: "audio", 2: "video"}

MEDIA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
])

MEDIA_META = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), False),
])

MEDIA_FEATURES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("feature", T.ArrayType(T.FloatType()), False),
])

FRAMES = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])

THUMBS = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("thumb", T.BinaryType(), False),
])


_PIL_CHANNELS = {"1": 1, "L": 1, "P": 1, "LA": 2, "RGB": 3, "RGBA": 4,
                 "CMYK": 4, "YCbCr": 3, "I": 1, "F": 1}


def _no_codec(buf: bytes) -> NotImplementedError:
    if _HAVE_PIL:
        return NotImplementedError(
            f"unsupported media container (magic={buf[:4]!r}); PIL is "
            "present but could not open it, and video/audio codecs "
            "(ffmpeg/librosa) are not wired"
        )
    return NotImplementedError(
        "unknown media container (no PIL/ffmpeg in sandbox); "
        "only MMF1 payloads are decodable here"
    )


def _parse_header(buf: bytes) -> tuple[str, int, int, int]:
    """Header-only probe: (kind, a, b, c) without touching sample
    bytes. MMF1 reads the packed header; real image containers go
    through PIL's lazy open (size/mode available without pixel load)
    when PIL is importable — the gated real-codec branch."""
    if buf[:4] == _MAGIC:
        kind_b, a, b, c = struct.unpack_from("<BIII", buf, 4)
        return _KINDS[kind_b], a, b, c
    if _HAVE_PIL:
        import io
        try:
            img = _PIL_Image.open(io.BytesIO(buf))
            w, h = img.size
            ch = _PIL_CHANNELS.get(img.mode, len(img.getbands()))
            return "image", int(w), int(h), int(ch)
        except NotImplementedError:
            raise
        except Exception:
            pass
    raise _no_codec(buf)


def decode_payload(buf: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """Full decode: (kind, a, b, c, samples). ``samples`` is the flat
    u8 pixel stream (image/video) or i16 sample stream (audio). MMF1
    is a zero-copy frombuffer; real image containers (PNG/JPEG/...)
    decode via PIL when importable — the gated real-codec branch the
    sandbox cannot exercise with genuine PIL (tests drive it with a
    functional fake; see tests/test_multimodal.py)."""
    if buf[:4] == _MAGIC:
        kind_b, a, b, c = struct.unpack_from("<BIII", buf, 4)
        kind = _KINDS[kind_b]
        raw = buf[17:]
        samples = np.frombuffer(
            raw, dtype=np.int16 if kind == "audio" else np.uint8)
        return kind, a, b, c, samples
    if _HAVE_PIL:
        import io
        try:
            img = _PIL_Image.open(io.BytesIO(buf))
            # Only 8-bit modes may flow into the uint8 feature stream:
            # casting 16/32-bit ("I", "I;16") or float ("F") arrays to
            # uint8 wraps silently, and palette ("P") arrays are lookup
            # indices, not intensities. Convert what has a faithful
            # 8-bit rendering; refuse (loud no-codec gate) what doesn't.
            if img.mode in ("P", "PA", "1", "CMYK", "YCbCr"):
                img = img.convert("RGB")
            elif img.mode not in ("L", "LA", "RGB", "RGBA"):
                raise _no_codec(buf)  # I / I;16 / F: lossy to u8
            arr = np.asarray(img)
        except NotImplementedError:
            raise
        except Exception:
            raise _no_codec(buf) from None
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, ch = arr.shape
        return "image", int(w), int(h), int(ch), arr.reshape(-1)
    raise _no_codec(buf)


def _pack(kind: int, a: int, b: int, c: int, samples: np.ndarray) -> bytes:
    return _MAGIC + struct.pack("<BIII", kind, a, b, c) + samples.tobytes()


# ---------------------------------------------------------------- synth source

def gen_media_pdf(ids_arr) -> pd.DataFrame:
    """Deterministic MMF1 blobs keyed by media id (splitmix64 chains —
    parallelism/order invariant, like the pages fixture)."""
    rows = []
    for i in ids_arr:
        i = int(i)
        seed = ids.splitmix64(0xA11CE ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        rng = np.random.default_rng(seed)
        kind = i % 3
        if kind == 0:  # image
            w, h, ch = 16 + (i % 5) * 8, 16 + (i % 3) * 8, 3
            data = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8)
            payload = _pack(0, w, h, ch, data)
            meta = {"mime": "image/x-mmf1", "w": str(w), "h": str(h)}
        elif kind == 1:  # audio
            sr, n, ch = 8000, 1000 + (i % 7) * 100, 1
            data = rng.integers(-32768, 32767, size=n * ch, dtype=np.int16)
            payload = _pack(1, sr, n, ch, data)
            meta = {"mime": "audio/x-mmf1", "sr": str(sr)}
        else:  # video: n_frames grayscale frames
            w, h, nf = 16, 12, 4 + (i % 5)
            data = rng.integers(0, 256, size=nf * w * h, dtype=np.uint8)
            payload = _pack(2, w, h, nf, data)
            meta = {"mime": "video/x-mmf1", "frames": str(nf)}
        rows.append({
            "media_id": ids.stable_id64("m", str(i), 0),
            "url": f"https://fixture.test/media/{i:06d}",
            "kind": _KINDS[kind],
            "payload": payload,
            "meta": meta,
        })
    return pd.DataFrame(rows, columns=[f.name for f in MEDIA.fields])


def media_df(spark: SparkSession, n: int, partitions: int | None = None) -> DataFrame:
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_media_pdf(b["id"].to_numpy())

    rng = spark.range(0, n, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(gen, schema=MEDIA)


# ---------------------------------------------------------------- operators

def decode_meta(media: DataFrame) -> DataFrame:
    """Parse container headers → typed metadata. Payload is dropped at
    this operator's output boundary (column pruning for the join-side)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {k: [] for k in ("media_id", "kind", "width", "height",
                                   "channels", "sample_rate", "n_samples",
                                   "n_frames", "n_bytes")}
            for mid, buf in zip(b["media_id"].to_numpy(), b["payload"]):
                buf = bytes(buf)
                kind, a, bb, c = _parse_header(buf)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(buf))
                if kind == "image":
                    out["width"].append(a); out["height"].append(bb)
                    out["channels"].append(c)
                    out["sample_rate"].append(None); out["n_samples"].append(None)
                    out["n_frames"].append(None)
                elif kind == "audio":
                    out["width"].append(None); out["height"].append(None)
                    out["channels"].append(c)
                    out["sample_rate"].append(a); out["n_samples"].append(bb)
                    out["n_frames"].append(None)
                else:
                    out["width"].append(a); out["height"].append(bb)
                    out["channels"].append(1)
                    out["sample_rate"].append(None); out["n_samples"].append(None)
                    out["n_frames"].append(c)
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(run, schema=MEDIA_META)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Fixed-``dim`` feature vector per blob: per-bin mean of the decoded
    sample stream (image u8 pixels / audio i16 samples / video pixels),
    L2-normalized. One numpy pass per blob; feeds the ANN operators
    (similarity.py) directly — array<float> matches the embeddings table."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            mids, kinds, feats = [], [], []
            for mid, buf in zip(b["media_id"].to_numpy(), b["payload"]):
                buf = bytes(buf)
                kind, _, _, _, samples = decode_payload(buf)
                arr = samples.astype(np.float64)
                n = len(arr) - (len(arr) % dim) or dim
                binned = arr[:n].reshape(dim, -1).mean(axis=1) if n >= dim \
                    else np.resize(arr, dim)
                nrm = float(np.linalg.norm(binned)) or 1.0
                mids.append(int(mid)); kinds.append(kind)
                feats.append((binned / nrm).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": mids, "kind": kinds, "feature": feats})

    return media.select("media_id", "payload").mapInPandas(run, schema=MEDIA_FEATURES)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: 1 blob → ⌈n_frames/every_n⌉ frame rows
    (UDTF shape via mapInPandas). Non-video rows are filtered JVM-side
    *before* the Python boundary so image/audio bytes never cross it."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "frame_idx": [], "width": [],
                   "height": [], "frame": []}
            for mid, buf in zip(b["media_id"].to_numpy(), b["payload"]):
                buf = bytes(buf)
                kind, w, h, nf = _parse_header(buf)
                if kind != "video":
                    continue
                fsz = w * h
                for fi in range(0, nf, every_n):
                    out["media_id"].append(int(mid))
                    out["frame_idx"].append(fi)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["frame"].append(buf[17 + fi * fsz: 17 + (fi + 1) * fsz])
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(run, schema=FRAMES)
    )


def resize_images(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Image thumbnail via block-mean downsample (numpy reshape-mean —
    deterministic stand-in for a codec resize; the real-codec branch
    raises NotImplementedError until PIL exists)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "thumb": []}
            for mid, buf in zip(b["media_id"].to_numpy(), b["payload"]):
                buf = bytes(buf)
                kind, w, h, ch, samples = decode_payload(buf)
                if kind != "image":
                    continue
                img = samples[:w * h * ch].reshape(h, w, ch) \
                    .astype(np.float64)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                thumb = np.empty((out_h, out_w, ch), dtype=np.uint8)
                for yi in range(out_h):
                    for xi in range(out_w):
                        blk = img[ys[yi]:ys[yi + 1], xs[xi]:xs[xi + 1]]
                        thumb[yi, xi] = blk.mean(axis=(0, 1)).astype(np.uint8)
                out["media_id"].append(int(mid))
                out["width"].append(out_w)
                out["height"].append(out_h)
                out["thumb"].append(thumb.tobytes())
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=THUMBS)
    )
