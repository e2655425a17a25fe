"""Independent single-machine oracle implementing SURVEY.md §8 literally
(SURVEY.md §5.2-3: "the oracle IS the reference semantics stand-in").

Deliberately written as plain Python loops with its OWN geometry
formulations (ray cast along +lon instead of +lat, parametric segment
intersection, per-bit Morton interleave) so agreement with the engine's
vectorized kernels is evidence, not tautology. Only the leaf hash
(stable_id64) and the record parser (a regex + json.loads) are shared —
they define identity, not semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from mergeaddressesandbuildings_spark import config
from mergeaddressesandbuildings_spark.functions import ids, textx

R = config.EARTH_RADIUS_M
DEG = config.DEG_TO_M


# ---------- geometry (independent formulations) ----------

def haversine(lat1, lon1, lat2, lon2):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi, dlmb = p2 - p1, math.radians(lon2 - lon1)
    a = math.sin(dphi / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dlmb / 2) ** 2
    return 2 * R * math.asin(math.sqrt(min(a, 1.0)))


def on_segment(px, py, x1, y1, x2, y2, eps=1e-12):
    cross = (px - x1) * (y2 - y1) - (py - y1) * (x2 - x1)
    if abs(cross) > eps:
        return False
    return (min(x1, x2) - eps <= px <= max(x1, x2) + eps
            and min(y1, y2) - eps <= py <= max(y1, y2) + eps)


def point_in_ring(lat, lon, ring):
    """Even-odd raycast along +lon; boundary counts inside (§8.1)."""
    inside = False
    for (y1, x1), (y2, x2) in zip(ring[:-1], ring[1:]):
        if on_segment(lon, lat, x1, y1, x2, y2):
            return True
        if (y1 <= lat < y2) or (y2 <= lat < y1):
            t = (lat - y1) / (y2 - y1)
            if x1 + t * (x2 - x1) > lon:
                inside = not inside
    return inside


def point_to_ring_m(lat, lon, ring):
    """Min point→edge distance, local equirect at the point (§8.4)."""
    kx = DEG * math.cos(math.radians(lat))
    best = float("inf")
    for (y1, x1), (y2, x2) in zip(ring[:-1], ring[1:]):
        ax, ay = (x1 - lon) * kx, (y1 - lat) * DEG
        bx, by = (x2 - lon) * kx, (y2 - lat) * DEG
        dx, dy = bx - ax, by - ay
        ll = dx * dx + dy * dy
        t = 0.0 if ll == 0 else max(0.0, min(1.0, -(ax * dx + ay * dy) / ll))
        cx, cy = ax + t * dx, ay + t * dy
        best = min(best, math.hypot(cx, cy))
    return best


def ring_area_m2(ring):
    lat0 = sum(p[0] for p in ring[:-1]) / (len(ring) - 1)
    kx = DEG * math.cos(math.radians(lat0))
    s = 0.0
    for (y1, x1), (y2, x2) in zip(ring[:-1], ring[1:]):
        s += (x1 * kx) * (y2 * DEG) - (x2 * kx) * (y1 * DEG)
    return abs(s) / 2.0


def ring_centroid(ring):
    pts = ring[:-1]
    return (sum(p[0] for p in pts) / len(pts), sum(p[1] for p in pts) / len(pts))


def point_in_poly(lat, lon, outer, holes):
    """§8.1 ext: even-odd parity over outer + hole rings; on ANY ring
    edge counts inside. Independent formulation (+lon raycast)."""
    rings = [outer] + list(holes or [])
    crossings = 0
    for ring in rings:
        for (y1, x1), (y2, x2) in zip(ring[:-1], ring[1:]):
            if on_segment(lon, lat, x1, y1, x2, y2):
                return True
            if (y1 <= lat < y2) or (y2 <= lat < y1):
                t = (lat - y1) / (y2 - y1)
                if x1 + t * (x2 - x1) > lon:
                    crossings += 1
    return crossings % 2 == 1


def point_to_poly_m(lat, lon, outer, holes):
    return min(point_to_ring_m(lat, lon, r) for r in [outer] + list(holes or []))


def poly_area_m2(outer, holes):
    return ring_area_m2(outer) - sum(ring_area_m2(h) for h in (holes or []))


def seg_intersect(p1, p2, p3, p4, eps=1e-15):
    """Parametric segment intersection (incl. touching)."""
    x1, y1 = p1; x2, y2 = p2; x3, y3 = p3; x4, y4 = p4
    d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
    if abs(d) < eps:  # parallel: check collinear overlap via on_segment
        return (on_segment(x3, y3, x1, y1, x2, y2) or on_segment(x4, y4, x1, y1, x2, y2)
                or on_segment(x1, y1, x3, y3, x4, y4) or on_segment(x2, y2, x3, y3, x4, y4))
    t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
    u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
    return -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12


def rings_overlap(a, b):
    for s1, s2 in zip(a[:-1], a[1:]):
        for s3, s4 in zip(b[:-1], b[1:]):
            if seg_intersect((s1[1], s1[0]), (s2[1], s2[0]), (s3[1], s3[0]), (s4[1], s4[0])):
                return True
    return point_in_ring(a[0][0], a[0][1], b) or point_in_ring(b[0][0], b[0][1], a)


def polys_overlap(a_outer, a_holes, b_outer, b_holes):
    """§8.1 ext: any ring-pair edge intersection, else outer-vertex
    containment with holes respected (inside a courtyard ≠ overlap)."""
    a_rings = [a_outer] + list(a_holes or [])
    b_rings = [b_outer] + list(b_holes or [])
    for ra in a_rings:
        for rb in b_rings:
            for s1, s2 in zip(ra[:-1], ra[1:]):
                for s3, s4 in zip(rb[:-1], rb[1:]):
                    if seg_intersect((s1[1], s1[0]), (s2[1], s2[0]),
                                     (s3[1], s3[0]), (s4[1], s4[0])):
                        return True
    return (point_in_poly(a_outer[0][0], a_outer[0][1], b_outer, b_holes)
            or point_in_poly(b_outer[0][0], b_outer[0][1], a_outer, a_holes))


# ---------- Morton cells (per-bit independent implementation) ----------

def cell_id(lat, lon, level):
    n = 1 << level
    x = min(n - 1, max(0, int((lon + 180.0) / 360.0 * n)))
    y = min(n - 1, max(0, int((lat + 90.0) / 180.0 * n)))
    m = 0
    for bit in range(level):
        m |= ((x >> bit) & 1) << (2 * bit)
        m |= ((y >> bit) & 1) << (2 * bit + 1)
    return (1 << (2 * level)) | m


# ---------- data model ----------

@dataclass
class Addr:
    addr_id: int
    url: str
    record_idx: int
    lat: float
    lon: float
    housenumber: str
    street: str


@dataclass
class Bld:
    building_id: int
    ring: list
    tags: dict = field(default_factory=dict)
    existing: bool = False
    holes: list = field(default_factory=list)  # §8.1 ext

    @property
    def bbox(self):
        lats = [p[0] for p in self.ring]
        lons = [p[1] for p in self.ring]
        return min(lats), min(lons), max(lats), max(lons)


# ---------- the oracle pipeline (§8 literally, all loops) ----------

def run_oracle(page_rows, existing_rows, level=config.CELL_LEVEL,
               budget=config.TILE_MAX_ELEMS,
               cutoff=config.KNN_CUTOFF_M, eps=config.ADDR_DEDUPE_EPS_M):
    """page_rows: list of dicts (url, warc_ts, html, text, lang);
    existing_rows: list of dicts (elem_id, kind, lat, lon, ring, tags).
    Returns dict with assignments / sets / tiles, keyed for comparison.
    """
    # F9: latest capture per url — max (warc_ts, text)
    winner = {}
    for r in page_rows:
        k = r["url"]
        key = (r["warc_ts"], r["text"])
        if k not in winner or key > (winner[k]["warc_ts"], winner[k]["text"]):
            winner[k] = r

    addrs, blds = [], []
    for r in winner.values():
        for rec in textx.extract_geo_records(r["html"], strict=False):
            if rec.get("kind") == "address" and "lat" in rec:
                addrs.append(Addr(
                    ids.stable_id64("a", r["url"], rec["record_idx"]),
                    r["url"], rec["record_idx"], float(rec["lat"]), float(rec["lon"]),
                    rec.get("housenumber") or "", rec.get("street") or "",
                ))
            elif rec.get("kind") == "building" and rec.get("ring") and len(rec["ring"]) >= 4:
                blds.append(Bld(
                    ids.stable_id64("b", r["url"], rec["record_idx"]),
                    [(float(p[0]), float(p[1])) for p in rec["ring"]],
                    rec.get("tags") or {},
                    holes=[
                        [(float(p[0]), float(p[1])) for p in h]
                        for h in (rec.get("holes") or []) if len(h) >= 4
                    ],
                ))

    ex_ways = [Bld(e["elem_id"], [(float(p[0]), float(p[1])) for p in e["ring"]],
                   e.get("tags") or {}, existing=True,
                   holes=[
                       [(float(p[0]), float(p[1])) for p in h]
                       for h in (e.get("holes") or [])
                   ])
               for e in existing_rows if e["kind"] == "way" and e.get("ring")]
    ex_nodes = [e for e in existing_rows
                if e["kind"] == "node" and (e.get("tags") or {}).get("addr:housenumber")]

    # J3: drop new buildings overlapping an existing way
    kept_blds = []
    for b in blds:
        if any(polys_overlap(b.ring, b.holes, e.ring, e.holes) for e in ex_ways):
            continue
        kept_blds.append(b)
    universe = kept_blds + ex_ways

    # J4: drop new addresses duplicating an existing node
    def norm_key(street, hn):
        return (textx.street_norm(street or ""), textx.hn_norm(hn or ""))

    kept_addrs = []
    for a in addrs:
        dup = False
        for e in ex_nodes:
            t = e.get("tags") or {}
            if norm_key(a.street, a.housenumber) == norm_key(t.get("addr:street"), t.get("addr:housenumber")) \
                    and haversine(a.lat, a.lon, e["lat"], e["lon"]) <= eps:
                dup = True
                break
        if not dup:
            kept_addrs.append(a)

    # J1 + J2 per address (brute force over the whole universe)
    assignments = {}
    for a in kept_addrs:
        pip = []
        for b in universe:
            mn_lat, mn_lon, mx_lat, mx_lon = b.bbox
            if mn_lat <= a.lat <= mx_lat and mn_lon <= a.lon <= mx_lon \
                    and point_in_poly(a.lat, a.lon, b.ring, b.holes):
                pip.append(b)
        if pip:
            win = min(pip, key=lambda b: (poly_area_m2(b.ring, b.holes), b.building_id))
            assignments[a.addr_id] = (a, win, "PIP", 0.0)
            continue
        best, best_d = None, None
        for b in universe:
            d = point_to_poly_m(a.lat, a.lon, b.ring, b.holes)
            if d <= cutoff and (best is None or (d, b.building_id) < (best_d, best.building_id)):
                best, best_d = b, d
        if best is not None:
            assignments[a.addr_id] = (a, best, "KNN", best_d)
        else:
            assignments[a.addr_id] = (a, None, "NONE", None)

    # §8.4 decisions
    by_bld = {}
    for a, b, m, d in assignments.values():
        if b is not None:
            by_bld.setdefault(b.building_id, []).append(a)
    conflict_blds = set()
    for bid, alist in by_bld.items():
        b = next(x for x in universe if x.building_id == bid)
        ex_hn = textx.hn_norm((b.tags or {}).get("addr:housenumber") or "")
        if ex_hn and any(textx.hn_norm(a.housenumber) != ex_hn for a in alist):
            conflict_blds.add(bid)

    result = {}
    for aid, (a, b, m, d) in assignments.items():
        if b is None:
            decision = "STANDALONE"
        elif b.building_id in conflict_blds:
            decision = "CONFLICT"
        elif len(by_bld[b.building_id]) >= 2:
            decision = "KEEP_NODE"
        else:
            decision = "MERGED"
        result[aid] = {
            "addr_id": aid, "url": a.url, "record_idx": a.record_idx,
            "building_id": None if b is None else b.building_id,
            "method": m, "dist_m": d, "decision": decision,
        }

    # sets (U1/U2)
    sets = {}
    merged = {r["building_id"] for r in result.values() if r["decision"] == "MERGED"}
    conflicts = {r["building_id"] for r in result.values() if r["decision"] == "CONFLICT"}
    for b in universe:
        if b.building_id in merged:
            sets[(b.building_id, "merged")] = True
        elif b.building_id in conflicts:
            sets[(b.building_id, "conflict")] = True
        elif b.existing:
            sets[(b.building_id, "untouched")] = True
        else:
            sets[(b.building_id, "new_building")] = True
    for r in result.values():
        if r["decision"] != "MERGED":
            sets[(r["addr_id"], "new_node")] = True

    # tiles (T4/T5): adaptive split over element points
    points = [(r["addr_id"], assignments[r["addr_id"]][0].lat, assignments[r["addr_id"]][0].lon)
              for r in result.values()]
    points += [(b.building_id, *ring_centroid(b.ring)) for b in universe]
    tiles = {eid: cell_id(lat, lon, level) for eid, lat, lon in points}
    lvl = level
    while lvl < config.MAX_CELL_LEVEL:
        counts = {}
        for eid, t in tiles.items():
            counts[t] = counts.get(t, 0) + 1
        over = {t for t, c in counts.items() if c > budget
                and (t.bit_length() - 1) // 2 == lvl}
        if not over:
            break
        for eid, lat, lon in points:
            if tiles[eid] in over:
                tiles[eid] = cell_id(lat, lon, lvl + 1)
        lvl += 1

    return {"assignments": result, "sets": sets, "tiles": tiles}
