"""Multimodal binary-column plumbing tests (driver round spec: decode /
feature-extract / resize / frame-sample over opaque binary payloads)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mergeaddressesandbuildings_spark.operators import multimodal as mm


N = 90  # 30 of each kind


def test_synth_deterministic_and_parallelism_invariant(spark):
    a = mm.media_df(spark, N, partitions=1).orderBy("media_id").collect()
    b = mm.media_df(spark, N, partitions=7).orderBy("media_id").collect()
    assert len(a) == N
    assert [bytes(r["payload"]) for r in a] == [bytes(r["payload"]) for r in b]
    kinds = {r["kind"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_decode_meta_schema_and_values(spark):
    media = mm.media_df(spark, N, partitions=4)
    meta = mm.decode_meta(media)
    rows = {r["media_id"]: r for r in meta.collect()}
    assert len(rows) == N
    src = {r["media_id"]: r for r in media.collect()}
    for mid, r in rows.items():
        s = src[mid]
        assert r["kind"] == s["kind"]
        assert r["n_bytes"] == len(bytes(s["payload"]))
        if r["kind"] == "image":
            assert r["width"] * r["height"] * r["channels"] == r["n_bytes"] - 17
            assert r["sample_rate"] is None
        elif r["kind"] == "audio":
            assert r["sample_rate"] == 8000
            assert r["n_samples"] * r["channels"] * 2 == r["n_bytes"] - 17
        else:
            assert r["n_frames"] >= 4
            assert r["width"] * r["height"] * r["n_frames"] == r["n_bytes"] - 17


def test_features_fixed_dim_unit_norm(spark):
    feats = mm.extract_features(mm.media_df(spark, N, partitions=4), dim=16)
    rows = feats.collect()
    assert len(rows) == N
    for r in rows:
        v = np.array(r["feature"], dtype=np.float64)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-3


def test_frame_sample_counts(spark):
    media = mm.media_df(spark, N, partitions=4)
    frames = mm.sample_frames(media, every_n=2)
    meta = mm.decode_meta(media).filter(F.col("kind") == "video")
    exp = sum(-(-r["n_frames"] // 2) for r in meta.collect())  # ceil
    got = frames.count()
    assert got == exp > 0
    r = frames.first()
    assert len(bytes(r["frame"])) == r["width"] * r["height"]
    # sampled indices are the even ones
    assert frames.filter(F.col("frame_idx") % 2 == 1).count() == 0


def test_resize_block_mean(spark):
    media = mm.media_df(spark, N, partitions=4)
    thumbs = mm.resize_images(media, out_w=4, out_h=4)
    n_img = media.filter(F.col("kind") == "image").count()
    rows = thumbs.collect()
    assert len(rows) == n_img > 0
    for r in rows[:5]:
        assert len(bytes(r["thumb"])) == 4 * 4 * 3


def test_unknown_container_raises(spark):
    with pytest.raises(Exception) as ei:
        mm._parse_header(b"JUNKDATA" + b"\x00" * 32)
    assert "NotImplementedError" in str(type(ei.value)) or isinstance(
        ei.value, NotImplementedError)


def test_features_feed_ann(spark):
    """Media features are drop-in vectors for the similarity operators."""
    from mergeaddressesandbuildings_spark.operators import similarity

    feats = mm.extract_features(mm.media_df(spark, 40, partitions=2), dim=16) \
              .select(F.col("media_id").alias("vec_id"),
                      F.col("feature").alias("embedding"))
    qs = feats.limit(2).select(F.col("vec_id").alias("qid"),
                               F.col("embedding").alias("q_embedding"))
    top = similarity.cosine_topk_bruteforce(feats, qs, k=3)
    got = top.groupBy("qid").count().collect()
    assert all(r["count"] == 3 for r in got)


# ------------------------------------------------------- real-codec gate

def _png_encode(arr: "np.ndarray") -> bytes:
    """Minimal real PNG encoder (pure stdlib): 8-bit RGB/gray,
    filter 0 on every row. Produces bytes any PNG decoder accepts."""
    import struct
    import zlib

    h, w, ch = arr.shape
    color = {1: 0, 3: 2}[ch]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


class _FakePILImage:
    """Functional PIL.Image stand-in: genuinely decodes the PNG byte
    stream (zlib inflate + filter-0 strip), exposing the `open()` /
    `.size` / `.mode` / __array__ surface multimodal.py's gated branch
    uses. Round-3 verdict task 6: keeps the real-codec gate from
    bit-rotting while the sandbox lacks PIL."""

    def __init__(self, arr, mode):
        self._arr = arr
        self.mode = mode

    @property
    def size(self):
        return (self._arr.shape[1], self._arr.shape[0])

    def getbands(self):
        return tuple(self.mode)

    def __array__(self, dtype=None, copy=None):
        a = self._arr if self._arr.shape[2] > 1 else self._arr[:, :, 0]
        return a.astype(dtype) if dtype is not None else a

    @staticmethod
    def open(fp):
        import struct
        import zlib

        buf = fp.read()
        if buf[:8] != b"\x89PNG\r\n\x1a\n":
            raise OSError("cannot identify image file")
        pos, idat, w = 8, b"", None
        while pos < len(buf):
            (ln,) = struct.unpack_from(">I", buf, pos)
            tag = buf[pos + 4:pos + 8]
            body = buf[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, color = struct.unpack_from(">IIBB", body)
                assert depth == 8 and color in (0, 2)
                ch = 3 if color == 2 else 1
            elif tag == b"IDAT":
                idat += body
            pos += 12 + ln
        raw = zlib.decompress(idat)
        stride = 1 + w * ch
        rows = [np.frombuffer(raw[y * stride + 1:(y + 1) * stride],
                              dtype=np.uint8)
                for y in range(h)]
        arr = np.stack(rows).reshape(h, w, ch)
        return _FakePILImage(arr, "RGB" if ch == 3 else "L")


@pytest.fixture
def fake_pil(monkeypatch):
    monkeypatch.setattr(mm, "_PIL_Image", _FakePILImage)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)


def test_real_codec_gate_decodes_png(fake_pil):
    """With a (functional fake) PIL present, the gated branch decodes a
    real PNG byte string end-to-end: header probe + full pixel decode."""
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    png = _png_encode(arr)

    kind, w, h, ch = mm._parse_header(png)
    assert (kind, w, h, ch) == ("image", 4, 5, 3)

    kind, w, h, ch, samples = mm.decode_payload(png)
    assert (kind, w, h, ch) == ("image", 4, 5, 3)
    np.testing.assert_array_equal(samples.reshape(5, 4, 3), arr)

    # grayscale round-trip (2-D PIL array -> 1-channel samples)
    g = rng.integers(0, 256, size=(3, 6, 1), dtype=np.uint8)
    kind, w, h, ch, samples = mm.decode_payload(_png_encode(g))
    assert (kind, w, h, ch) == ("image", 6, 3, 1)
    np.testing.assert_array_equal(samples.reshape(3, 6, 1), g)


def test_real_codec_gate_both_ways(fake_pil):
    """PIL present but the payload is no image it can open -> the loud
    gate still fires (video/audio codecs stay unwired); MMF1 payloads
    keep taking the fast path untouched by the PIL branch."""
    with pytest.raises(NotImplementedError, match="PIL is present"):
        mm.decode_payload(b"JUNKDATA" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="PIL is present"):
        mm._parse_header(b"\x1aRIFFJUNK" + b"\x00" * 32)
    pdf = mm.gen_media_pdf(np.arange(3))
    buf = bytes(pdf["payload"][0])
    kind, *_ , samples = mm.decode_payload(buf)
    assert kind in ("image", "audio", "video") and len(samples) > 0


def test_no_codec_gate_message_without_pil(monkeypatch):
    monkeypatch.setattr(mm, "_HAVE_PIL", False)
    with pytest.raises(NotImplementedError, match="no PIL/ffmpeg"):
        mm.decode_payload(_png_encode(np.zeros((2, 2, 3), np.uint8)))


def test_non_8bit_pil_modes_refused_or_converted(monkeypatch):
    """16/32-bit and float PIL modes must trip the loud no-codec gate
    (a uint8 cast would wrap silently); palette mode must be CONVERTED
    (indices are not intensities), never passed through raw."""

    class _ModeImage:
        def __init__(self, mode, arr):
            self.mode, self._arr = mode, arr

        @staticmethod
        def open(fp):
            return _OPEN_RESULT

        def convert(self, mode):
            assert mode == "RGB"
            # palette 2x2 -> deterministic RGB expansion
            rgb = np.stack([self._arr.astype(np.uint8)] * 3, axis=-1)
            return _ModeImage("RGB", rgb)

        def __array__(self, dtype=None, copy=None):
            return (self._arr.astype(dtype) if dtype is not None
                    else self._arr)

    monkeypatch.setattr(mm, "_PIL_Image", _ModeImage)
    monkeypatch.setattr(mm, "_HAVE_PIL", True)

    global _OPEN_RESULT
    # float mode: refused loudly
    _OPEN_RESULT = _ModeImage("F", np.ones((2, 2), np.float32) * 4000.5)
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"NOTMMF1" + b"\x00" * 16)
    # 32-bit integer mode: refused loudly
    _OPEN_RESULT = _ModeImage("I", np.full((2, 2), 70000, np.int32))
    with pytest.raises(NotImplementedError):
        mm.decode_payload(b"NOTMMF1" + b"\x00" * 16)
    # palette mode: converted, not passed through as raw indices
    pal = np.array([[1, 2], [3, 4]], np.uint8)
    _OPEN_RESULT = _ModeImage("P", pal)
    kind, w, h, ch, samples = mm.decode_payload(b"NOTMMF1" + b"\x00" * 16)
    assert (kind, w, h, ch) == ("image", 2, 2, 3)
    np.testing.assert_array_equal(
        samples.reshape(2, 2, 3), np.stack([pal] * 3, axis=-1))
