"""Kernel tests for text extraction (§8.2) and normalization (§8.3)."""

from mergeaddressesandbuildings_spark.functions import ids, textx


def test_extract_text_spec():
    html = (
        b"<html><head><script>var x = '<div>';</script>"
        b"<style>.a { color: red }</style></head>"
        b"<body><h1>Hello   World</h1>\n\n<p>line\ttwo</p></body></html>"
    )
    assert textx.extract_text(html) == "Hello World\nline two"


def test_extract_text_utf8_replace_and_idempotent_bytes():
    html = b"<p>caf\xc3\xa9 \xff broken</p>"
    out = textx.extract_text(html)
    assert "café" in out and "�" in out
    # byte-parity: same input → same bytes, always
    assert out.encode("utf-8") == textx.extract_text(html).encode("utf-8")


def test_extract_geo_records_indexing():
    html = (
        b'<p>x</p><span class="geo-record">{"kind":"address","lat":1.0,"lon":2.0}</span>'
        b'<span class="geo-record">{"kind":"building","ring":[[0,0],[0,1],[1,1],[0,0]]}</span>'
    )
    recs = textx.extract_geo_records(html)
    assert [r["record_idx"] for r in recs] == [0, 1]
    assert recs[0]["kind"] == "address" and recs[1]["kind"] == "building"


def test_script_case_insensitive_and_nested_angle():
    html = b"<SCRIPT>if (a<b) { }</SCRIPT><p>keep</p>"
    assert textx.extract_text(html) == "keep"


def test_street_norm():
    assert textx.street_norm("  n   Main st ") == "N MAIN STREET"
    assert textx.street_norm("Oak Ave") == "OAK AVENUE"
    assert textx.street_norm("Broadway") == "BROADWAY"
    assert textx.hn_norm(" 12-a ") == "12-A"


def test_stable_id64_deterministic_and_distinct():
    a = ids.stable_id64("a", "https://x/1", 0)
    assert a == ids.stable_id64("a", "https://x/1", 0)
    assert a != ids.stable_id64("b", "https://x/1", 0)
    assert a != ids.stable_id64("a", "https://x/1", 1)
    assert a != ids.stable_id64("a", "https://x/2", 0)
    seen = {ids.stable_id64("a", f"u{i}", j) for i in range(2000) for j in range(3)}
    assert len(seen) == 6000


def test_splitmix64_deterministic():
    assert ids.splitmix64(0) == ids.splitmix64(0)
    assert ids.splitmix64(1) != ids.splitmix64(2)
