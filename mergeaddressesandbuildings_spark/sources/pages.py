"""Deterministic Common-Crawl-style ``pages`` fixture source
(FIXTURES.md §1; BASELINE.json:15 input_hint).

The engine's production input is an Iceberg/parquet table
``pages(url, warc_ts, html, text, lang)``; offline, this module
synthesizes it **distributedly** (mapInPandas over ``spark.range`` — the
generator itself scales like the engine) and **deterministically**: all
randomness derives from splitmix64 chains keyed by page id; no
wall-clock, no global RNG. ``text`` is computed by the same §8.2
``extract_text`` the pipeline re-runs, making byte-parity a real
end-to-end invariant rather than a tautology of shared state.

Scenario mix (FIXTURES.md §3 coverage — each case ≥5 instances at 1k
pages): PIP-inside, on-edge, overlapping rings, kNN near/boundary/far,
neighbor-cell kNN, multi-address buildings, tag conflicts,
existing-OSM conflicts/dedupe/overlap, hot-cell skew (30% of pages in
one level-12 cell), duplicate urls with later captures.
"""

from __future__ import annotations

import datetime as dt
import json
from typing import Iterator

import numpy as np
import pandas as pd

from mergeaddressesandbuildings_spark import config, schemas
from mergeaddressesandbuildings_spark.functions import cells, geom, ids, textx

GLOBAL_SEED = 0x5EED_C0FFEE
_BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
_STREETS = [
    "N Main St", "Oak Ave", "River Rd", "Pine Dr", "Laurens Blvd",
    "Mills Ln", "Falls Ct", "Augusta Hwy", "Church Street", "Broadway",
]
_CITY, _STATE = "Greenville", "SC"


class PageRng:
    """Counter-mode splitmix64 stream keyed by page id — the page's only
    randomness source (parallelism- and order-invariant)."""

    def __init__(self, page_id: int):
        self._state = ids.splitmix64(GLOBAL_SEED ^ (page_id * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))

    def u64(self) -> int:
        self._state = ids.splitmix64(self._state)
        return self._state

    def f(self) -> float:
        return self.u64() / 2.0**64

    def uniform(self, lo: float, hi: float) -> float:
        return lo + self.f() * (hi - lo)

    def randint(self, lo: int, hi: int) -> int:
        return lo + self.u64() % (hi - lo + 1)

    def choice(self, seq):
        return seq[self.u64() % len(seq)]


def _q7(x: float) -> float:
    return round(x, 7)


# hot cell: one level-12 cell around downtown; 30% of pages anchor here
_HOT_CELL = int(cells.encode(np.array([34.85]), np.array([-82.40]), config.CELL_LEVEL)[0])
_HOT_BOUNDS = tuple(float(v[0]) for v in cells.cell_bounds(np.array([_HOT_CELL])))


def _anchor(rng: PageRng) -> tuple[float, float]:
    if rng.f() < 0.30:
        min_lat, min_lon, max_lat, max_lon = _HOT_BOUNDS
        pad_lat = (max_lat - min_lat) * 0.05
        pad_lon = (max_lon - min_lon) * 0.05
        return (
            rng.uniform(min_lat + pad_lat, max_lat - pad_lat),
            rng.uniform(min_lon + pad_lon, max_lon - pad_lon),
        )
    return (
        rng.uniform(config.COUNTY_MIN_LAT + 0.01, config.COUNTY_MAX_LAT - 0.01),
        rng.uniform(config.COUNTY_MIN_LON + 0.01, config.COUNTY_MAX_LON - 0.01),
    )


def _rect_ring(clat: float, clon: float, w_m: float, h_m: float) -> list[list[float]]:
    """Closed CCW rectangle ring (quantized to 1e-7 deg)."""
    dlat = h_m / 2.0 / config.DEG_TO_M
    dlon = w_m / 2.0 / (config.DEG_TO_M * float(np.cos(np.radians(clat))))
    lat0, lat1 = _q7(clat - dlat), _q7(clat + dlat)
    lon0, lon1 = _q7(clon - dlon), _q7(clon + dlon)
    return [[lat0, lon0], [lat0, lon1], [lat1, lon1], [lat1, lon0], [lat0, lon0]]


def _addr(rng: PageRng, lat: float, lon: float, street: str | None = None,
          hn: str | None = None) -> dict:
    return {
        "kind": "address",
        "lat": _q7(lat),
        "lon": _q7(lon),
        "housenumber": hn if hn is not None else str(rng.randint(1, 9999)),
        "street": street if street is not None else rng.choice(_STREETS),
        "unit": rng.choice(["", "", "", "A", "B", "2"]),
        "city": _CITY,
        "state": _STATE,
        "postcode": rng.choice(["29601", "29605", "29607", "29609"]),
    }


def _bld(ring: list[list[float]], tags: dict | None = None) -> dict:
    return {"kind": "building", "ring": ring, "tags": tags or {"building": "yes"}}


def _m_to_dlon(m: float, lat: float) -> float:
    return m / (config.DEG_TO_M * float(np.cos(np.radians(lat))))


def _m_to_dlat(m: float) -> float:
    return m / config.DEG_TO_M


def _gen_page(i: int) -> tuple[list[dict], list[dict]]:
    """→ (page rows, existing_osm rows). Pure function of the page id."""
    rng = PageRng(i)
    url = f"https://fixture.test/greenville/{i:08d}"
    alat, alon = _anchor(rng)
    u = rng.f()
    records: list[dict] = []
    existing: list[dict] = []
    lang = "en"

    street = rng.choice(_STREETS)
    hn = str(rng.randint(1, 9999))
    w, h = rng.uniform(20, 60), rng.uniform(20, 60)
    ring = _rect_ring(alat, alon, w, h)

    if u < 0.30:  # INSIDE → MERGED
        records = [_bld(ring), _addr(rng, alat, alon, street, hn)]
    elif u < 0.35:  # EDGE: address exactly on the west edge (inside per §8.1)
        mid_lat = _q7((ring[0][0] + ring[2][0]) / 2.0)
        records = [_bld(ring), {**_addr(rng, mid_lat, 0.0, street, hn), "lat": mid_lat, "lon": ring[0][1]}]
    elif u < 0.40:  # OVERLAP2: two overlapping rings, point in both → smaller area wins
        ring_big = _rect_ring(alat, alon, w + 30, h + 30)
        shift = _m_to_dlon(10.0, alat)
        ring_small = _rect_ring(alat, alon + shift, w, h)
        inner_lat, inner_lon = _q7(alat), _q7(alon + shift / 2)
        records = [_bld(ring_big), _bld(ring_small), _addr(rng, inner_lat, inner_lon, street, hn)]
    elif u < 0.50:  # NEAR: kNN hit at 5–95 m east of the ring
        d = rng.uniform(5, 95)
        lon_a = ring[1][1] + _m_to_dlon(d, alat)
        records = [_bld(ring), _addr(rng, alat, lon_a, street, hn)]
    elif u < 0.53:  # BOUNDARY: just inside / just outside the 100 m cutoff
        d = config.KNN_CUTOFF_M + (0.25 if rng.f() < 0.5 else -0.25)
        lon_a = ring[1][1] + _m_to_dlon(d, alat)
        records = [_bld(ring), _addr(rng, alat, lon_a, street, hn)]
    elif u < 0.58:  # NEIGHBOR: candidate building lives across a cell border
        cell = cells.encode(np.array([alat]), np.array([alon]), config.CELL_LEVEL)
        _, _, _, max_lon = (float(v[0]) for v in cells.cell_bounds(cell))
        lon_addr = max_lon - _m_to_dlon(30.0, alat)
        lon_bld = max_lon + _m_to_dlon(30.0, alat)
        ring_n = _rect_ring(alat, lon_bld + _m_to_dlon(w / 2, alat), w, h)
        records = [_bld(ring_n), _addr(rng, alat, lon_addr, street, hn)]
    elif u < 0.63:  # TWO_ADDR → KEEP_NODE
        a1 = _addr(rng, alat - _m_to_dlat(3), alon, street, hn)
        a2 = _addr(rng, alat + _m_to_dlat(3), alon, street, str(int(hn) + 2))
        records = [_bld(ring), a1, a2]
    elif u < 0.66:  # CONFLICT_TAGS: building already tagged with a differing number
        tags = {"building": "yes", "addr:housenumber": str(int(hn) + 1), "addr:street": street}
        records = [_bld(ring, tags), _addr(rng, alat, alon, street, hn)]
    elif u < 0.69:  # CONFLICT_EXISTING: overlapping existing way carries differing addr
        records = [_bld(ring), _addr(rng, alat, alon, street, hn)]
        ring_e = _rect_ring(alat, alon + _m_to_dlon(5.0, alat), w, h)
        existing.append({
            "elem_id": ids.stable_id64("e", url, 100), "kind": "way", "lat": None, "lon": None,
            "ring": ring_e,
            "tags": {"building": "yes", "addr:housenumber": str(int(hn) + 7), "addr:street": street},
        })
    elif u < 0.73:  # DEDUP_ADDR: identical existing address node 5 m away → J4 drop
        records = [_bld(ring), _addr(rng, alat, alon, street, hn)]
        existing.append({
            "elem_id": ids.stable_id64("e", url, 101), "kind": "node",
            "lat": _q7(alat + _m_to_dlat(5.0)), "lon": _q7(alon), "ring": None,
            "tags": {"addr:housenumber": hn.lower(), "addr:street": street.lower()},
        })
    elif u < 0.77:  # OVERLAP_EXISTING: untagged existing way → J3 drops the new ring
        records = [_bld(ring), _addr(rng, alat, alon, street, hn)]
        ring_e = _rect_ring(alat, alon + _m_to_dlon(5.0, alat), w, h)
        existing.append({
            "elem_id": ids.stable_id64("e", url, 102), "kind": "way", "lat": None, "lon": None,
            "ring": ring_e, "tags": {"building": "yes"},
        })
    elif u < 0.87:  # STANDALONE: nearest building (if any) beyond cutoff
        if rng.f() < 0.5:
            far = _rect_ring(alat + _m_to_dlat(200.0), alon, w, h)
            records = [_bld(far)]
        records.append(_addr(rng, alat, alon, street, hn))
    elif u < 0.92:  # BUILDING_ONLY
        records = [_bld(ring)]
    elif u < 0.97:  # boilerplate-only page; half Spanish
        records = []
        lang = "es" if rng.f() < 0.5 else "en"
    else:  # MULTI: two disjoint buildings, one address in each
        off = _m_to_dlon(150.0, alat)
        ring2 = _rect_ring(alat, alon + off, w, h)
        records = [
            _bld(ring), _bld(ring2),
            _addr(rng, alat, alon, street, hn),
            _addr(rng, alat, alon + off, street, str(int(hn) + 4)),
        ]

    ts = _BASE_TS + dt.timedelta(seconds=rng.u64() % 31_536_000)
    html = _render_html(url, records, lang, rng)
    rows = [{
        "url": url, "warc_ts": ts, "html": html,
        "text": textx.extract_text(html), "lang": lang,
    }]

    if rng.f() < 0.03:  # duplicate url: later capture adds one more address
        extra = _addr(rng, alat + _m_to_dlat(2.0), alon, street, str(int(hn) + 9))
        html2 = _render_html(url, records + [extra], lang, rng, noise="v2")
        rows.append({
            "url": url, "warc_ts": ts + dt.timedelta(hours=1), "html": html2,
            "text": textx.extract_text(html2), "lang": lang,
        })
    return rows, existing


def _render_html(url: str, records: list[dict], lang: str, rng: PageRng, noise: str = "v1") -> bytes:
    spans = "".join(
        f'<span class="geo-record">{json.dumps(r, sort_keys=True, separators=(",", ":"))}</span>'
        for r in records
    )
    body = "Página de direcciones" if lang == "es" else "Address directory page"
    return (
        f"<html><head><title>{url}</title>"
        f"<script>var t='{noise}'; if (1<2) {{ console.log('{rng.u64() % 997}'); }}</script>"
        f"<style>.geo-record {{ display: none }}</style></head>"
        f"<body><h1>{body}</h1>\n<p>County of {_CITY}, {_STATE}.</p>\n"
        f"{spans}<footer>fixture {noise}</footer></body></html>"
    ).encode("utf-8")


def gen_pages_pdf(page_ids) -> pd.DataFrame:
    rows: list[dict] = []
    for i in page_ids:
        rows.extend(_gen_page(int(i))[0])
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def gen_existing_pdf(page_ids) -> pd.DataFrame:
    rows: list[dict] = []
    for i in page_ids:
        rows.extend(_gen_page(int(i))[1])
    return pd.DataFrame(
        rows, columns=["elem_id", "kind", "lat", "lon", "ring", "holes", "tags"]
    )


def holed_fixture_rows():
    """Deterministic §8.1-ext fixture: courtyard buildings, hole-aware
    area tie-breaks, J3 building-in-courtyard cases. Kept SEPARATE from
    the main generator so the hole-free golden fingerprints stay
    frozen. → (page_rows, existing_rows) — plain dicts, shared by the
    engine tests, the pure-Python oracle, and the driver query
    (plans/queries.py `merge_holes`)."""
    import datetime as _dt

    ts0 = _dt.datetime(2025, 3, 1, tzinfo=_dt.timezone.utc)
    pages, existing = [], []

    def page(i, records):
        url = f"https://holes.test/{i:04d}"
        html = _render_html(url, records, "en", PageRng(10_000 + i))
        pages.append({
            "url": url, "warc_ts": ts0 + _dt.timedelta(minutes=i),
            "html": html, "text": textx.extract_text(html), "lang": "en",
        })

    def donut(clat, clon, outer_m, hole_m):
        return (_rect_ring(clat, clon, outer_m, outer_m),
                _rect_ring(clat, clon, hole_m, hole_m))

    base_lat, base_lon = 34.80, -82.45

    o1, h1 = donut(base_lat, base_lon, 120.0, 60.0)
    page(1, [
        {"kind": "building", "ring": o1, "holes": [h1], "tags": {"building": "yes"}},
        {"kind": "address", "lat": base_lat, "lon": base_lon,
         "housenumber": "10", "street": "Courtyard St"},
    ])
    o2, h2 = donut(base_lat + 0.01, base_lon, 120.0, 40.0)
    page(2, [
        {"kind": "building", "ring": o2, "holes": [h2], "tags": {"building": "yes"}},
        {"kind": "address", "lat": base_lat + 0.01,
         "lon": base_lon + _m_to_dlon(45.0, base_lat + 0.01),
         "housenumber": "20", "street": "Solid Ave"},
    ])
    lat3 = base_lat + 0.02
    o3, h3 = donut(lat3, base_lon, 60.0, 30.0)
    page(3, [
        {"kind": "building", "ring": o3, "holes": [h3], "tags": {"building": "yes"}},
        {"kind": "building", "ring": _rect_ring(lat3, base_lon, 55.0, 55.0),
         "tags": {"building": "yes"}},
        {"kind": "address", "lat": lat3, "lon": base_lon + _m_to_dlon(20.0, lat3),
         "housenumber": "30", "street": "Tiebreak Rd"},
    ])
    lat4 = base_lat + 0.03
    o4, h4 = donut(lat4, base_lon, 150.0, 80.0)
    existing.append({
        "elem_id": 9_000_004, "kind": "way", "lat": None, "lon": None,
        "ring": o4, "holes": [h4], "tags": {"building": "yes"},
    })
    page(4, [
        {"kind": "building", "ring": _rect_ring(lat4, base_lon, 30.0, 30.0),
         "tags": {"building": "yes"}},
        {"kind": "address", "lat": lat4, "lon": base_lon,
         "housenumber": "40", "street": "Inner Ct"},
    ])
    lat5 = base_lat + 0.04
    o5, h5 = donut(lat5, base_lon, 150.0, 80.0)
    existing.append({
        "elem_id": 9_000_005, "kind": "way", "lat": None, "lon": None,
        "ring": o5, "holes": [h5], "tags": {"building": "yes"},
    })
    page(5, [
        {"kind": "building",
         "ring": _rect_ring(lat5, base_lon + _m_to_dlon(40.0, lat5), 30.0, 30.0),
         "tags": {"building": "yes"}},
    ])
    lat6 = base_lat + 0.05
    o6, h6 = donut(lat6, base_lon, 600.0, 450.0)
    page(6, [
        {"kind": "building", "ring": o6, "holes": [h6], "tags": {"building": "yes"}},
        {"kind": "address", "lat": lat6, "lon": base_lon,
         "housenumber": "60", "street": "Far Ct"},
    ])
    return pages, existing


def holed_frames(spark):
    """holed_fixture_rows → (pages DF, existing DF) in engine schemas."""
    page_rows, existing_rows = holed_fixture_rows()
    pages = spark.createDataFrame(page_rows, schema=schemas.PAGES)
    ex = [
        {**e,
         "ring": [{"lat": p[0], "lon": p[1]} for p in e["ring"]],
         "holes": None if not e.get("holes")
         else [[{"lat": p[0], "lon": p[1]} for p in h] for h in e["holes"]]}
        for e in existing_rows
    ]
    existing = spark.createDataFrame(ex, schema=schemas.EXISTING_OSM)
    return pages, existing


def pages_df(spark, n_pages: int, partitions: int | None = None):
    """Distributed deterministic pages table (mapInPandas over a range —
    generation parallelizes exactly like the engine itself)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield gen_pages_pdf(b["id"].to_numpy())

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=schemas.PAGES)


def existing_osm_df(spark, n_pages: int, partitions: int | None = None):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            pdf = gen_existing_pdf(b["id"].to_numpy())
            to_structs = lambda r: [{"lat": p[0], "lon": p[1]} for p in r]  # noqa: E731
            pdf["ring"] = pdf["ring"].map(
                lambda r: None if r is None else to_structs(r)
            )
            pdf["holes"] = pdf["holes"].map(
                lambda hs: None if hs is None or (isinstance(hs, float))
                else [to_structs(h) for h in hs]
            )
            yield pdf

    rng_df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)
    return rng_df.mapInPandas(gen, schema=schemas.EXISTING_OSM)
