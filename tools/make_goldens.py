"""Generate committed golden parquet oracles for the driver queries
that have no DuckDB-SQL surface (spatial merge internals, LSH/IVF
candidate sets, multimodal synthesis).

Every golden is computed INDEPENDENTLY of the Spark engine:
- merge family: tests/oracle.py (the pure-Python §8 semantics oracle,
  all loops, no Spark);
- text_sha_parity: hashlib over the fixture generator's ground-truth
  text column;
- ANN / LSH: straight-line numpy + left-to-right fold dot products
  (the same sequential fold the engine and DuckDB both use), with
  Spark's HALF_UP decimal rounding;
- media family: pure-Python re-decode of the deterministic MMF1 blobs.

The script then runs each registered Spark query at sf0.01 and FAILS
LOUDLY on any row mismatch before writing, so a committed golden is
simultaneously (a) an independent derivation and (b) verified engine
behavior. Re-run after any semantic change:

    cd /root/repo && python tools/make_goldens.py
"""

from __future__ import annotations

import hashlib
import os
import struct
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mergeaddressesandbuildings_spark import config  # noqa: E402
from mergeaddressesandbuildings_spark.functions import ids  # noqa: E402
from mergeaddressesandbuildings_spark.sources import pages as pg  # noqa: E402
from tests import oracle as orc  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "testdata_golden")
SF_DIR = os.environ.get("SPARK_GRAFT_GOLDEN_SF", "/root/testdata/sf0.01")

MERGE_N_PAGES = 300   # plans/queries.py _merge_result default
TEXT_N_PAGES = 200    # plans/queries.py text_sha_parity


def _round6(x: float) -> float:
    """Spark F.round(col, 6): BigDecimal(Double.toString(x)) HALF_UP."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _fold_dot(a, b) -> float:
    """Left-to-right sequential fold — matches F.aggregate and DuckDB
    list_sum bit-for-bit (numpy pairwise sum would NOT)."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _fold_norm2(a) -> float:
    acc = 0.0
    for x in a:
        acc += float(x) * float(x)
    return acc


# ---------------------------------------------------------------- merge family

def merge_goldens() -> dict[str, pa.Table]:
    page_rows, existing_rows = [], []
    for i in range(MERGE_N_PAGES):
        p, e = pg._gen_page(i)
        page_rows.extend(p)
        existing_rows.extend(e)
    g = orc.run_oracle(page_rows, existing_rows)

    assign = sorted(g["assignments"].values(), key=lambda r: r["addr_id"])
    lat_lon = {}
    # re-derive each address's cell from the oracle's own extraction pass
    winner = {}
    for r in page_rows:
        k = r["url"]
        key = (r["warc_ts"], r["text"])
        if k not in winner or key > (winner[k]["warc_ts"], winner[k]["text"]):
            winner[k] = r
    from mergeaddressesandbuildings_spark.functions import textx
    for r in winner.values():
        for rec in textx.extract_geo_records(r["html"], strict=False):
            if rec.get("kind") == "address" and "lat" in rec:
                aid = ids.stable_id64("a", r["url"], rec["record_idx"])
                lat_lon[aid] = (float(rec["lat"]), float(rec["lon"]))
    t_assign = pa.table({
        "addr_id": pa.array([r["addr_id"] for r in assign], pa.int64()),
        "url": pa.array([r["url"] for r in assign], pa.string()),
        "record_idx": pa.array([r["record_idx"] for r in assign], pa.int64()),
        "building_id": pa.array([r["building_id"] for r in assign], pa.int64()),
        "method": pa.array([r["method"] for r in assign], pa.string()),
        "decision": pa.array([r["decision"] for r in assign], pa.string()),
        "cell": pa.array(
            [orc.cell_id(*lat_lon[r["addr_id"]], config.CELL_LEVEL)
             for r in assign], pa.int64()),
    })

    sets = sorted(g["sets"].keys())
    t_sets = pa.table({
        "elem_id": pa.array([e for e, _ in sets], pa.int64()),
        "set": pa.array([s for _, s in sets], pa.string()),
    })

    addr_ids = set(g["assignments"].keys())
    tile_rows: dict[int, list[int]] = {}
    for eid, tile in g["tiles"].items():
        n, na = tile_rows.setdefault(int(tile), [0, 0])
        tile_rows[int(tile)] = [n + 1, na + (1 if eid in addr_ids else 0)]
    tiles = sorted(tile_rows.items())
    t_tiles = pa.table({
        "tile": pa.array([t for t, _ in tiles], pa.int64()),
        "n_elements": pa.array([v[0] for _, v in tiles], pa.int64()),
        "n_addresses": pa.array([v[1] for _, v in tiles], pa.int64()),
    })

    hp, he = pg.holed_fixture_rows()
    gh = orc.run_oracle(hp, he)
    hassign = sorted(gh["assignments"].values(), key=lambda r: r["addr_id"])
    t_holes = pa.table({
        "addr_id": pa.array([r["addr_id"] for r in hassign], pa.int64()),
        "url": pa.array([r["url"] for r in hassign], pa.string()),
        "building_id": pa.array([r["building_id"] for r in hassign], pa.int64()),
        "method": pa.array([r["method"] for r in hassign], pa.string()),
        "decision": pa.array([r["decision"] for r in hassign], pa.string()),
    })

    # text_sha_parity: ground truth is the generator's text column
    tp = pg.gen_pages_pdf(range(TEXT_N_PAGES))
    win: dict = {}
    for r in tp.to_dict("records"):
        key = (r["warc_ts"], r["text"])
        if r["url"] not in win or key > (win[r["url"]]["warc_ts"], win[r["url"]]["text"]):
            win[r["url"]] = r
    urls = sorted(win)
    t_text = pa.table({
        "url": pa.array(urls, pa.string()),
        "text_sha256": pa.array(
            [hashlib.sha256(win[u]["text"].encode("utf-8")).hexdigest()
             for u in urls], pa.string()),
    })

    return {
        "merge_assignments": t_assign,
        "merge_output_sets": t_sets,
        "merge_tiles": t_tiles,
        "merge_holes": t_holes,
        "text_sha_parity": t_text,
    }


# ---------------------------------------------------------------- ANN family

def _hyperplanes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def _buckets(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes) >= 0.0
    return (signs.astype(np.int64)
            * (1 << np.arange(planes.shape[1], dtype=np.int64))).sum(axis=1)


def ann_goldens() -> dict[str, pa.Table]:
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    vec_ids = emb["vec_id"].to_numpy()
    vecs = np.stack(emb["embedding"].to_numpy())
    dim = vecs.shape[1]
    qmask = vec_ids < 5
    norm2 = {int(v): _fold_norm2(vecs[i]) for i, v in enumerate(vec_ids)}
    idx_of = {int(v): i for i, v in enumerate(vec_ids)}

    def topk_rows(cand_ids_per_q: dict[int, set[int]], k: int = 3):
        rows = []
        for qid in sorted(int(v) for v in vec_ids[qmask]):
            qv = vecs[idx_of[qid]]
            qn = norm2[qid]
            scored = []
            for vid in sorted(cand_ids_per_q[qid]):
                if vid == qid:
                    continue
                c = _fold_dot(vecs[idx_of[vid]], qv) / np.sqrt(norm2[vid] * qn)
                scored.append((-c, vid, c))
            scored.sort()
            for rank, (_, vid, c) in enumerate(scored[:k], start=1):
                rows.append((qid, vid, rank, _round6(c)))
        return rows

    # LSH top-k: candidates share the query's single-bucket (seed 7, 6 planes)
    planes6 = _hyperplanes(6, dim, seed=7)
    b_all = _buckets(vecs, planes6)
    by_bucket: dict[int, set[int]] = {}
    for i, v in enumerate(vec_ids):
        by_bucket.setdefault(int(b_all[i]), set()).add(int(v))
    lsh_cands = {int(v): by_bucket[int(b_all[i])]
                 for i, v in enumerate(vec_ids) if qmask[i]}
    lsh_rows = topk_rows(lsh_cands)

    # IVF top-k: k-means-trained quantizer (2 Lloyd passes, seed 11),
    # probe 6 of 16 lists. Replicates similarity.train_ivf_centroids
    # with numpy double sums (engine per-(list,pos) sums verified equal).
    cents = np.random.default_rng(11).standard_normal((16, dim))
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
    nrm = np.linalg.norm(vecs.astype(np.float64), axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    unit = vecs.astype(np.float64) / nrm
    for _ in range(2):
        assign = np.argmax(unit @ cents.T, axis=1)
        new = cents.copy()
        for c in range(16):
            sel = assign == c
            if sel.any():
                # column-order accumulation matches the engine's
                # per-(list,pos) independent sums
                new[c] = vecs[sel].astype(np.float64).sum(axis=0) / sel.sum()
        norms = np.linalg.norm(new, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        cents = new / norms
    assign = np.argmax(unit @ cents.T, axis=1)
    by_list: dict[int, set[int]] = {}
    for i, v in enumerate(vec_ids):
        by_list.setdefault(int(assign[i]), set()).add(int(v))
    ivf_cands = {}
    for i, v in enumerate(vec_ids):
        if not qmask[i]:
            continue
        sims = unit[i] @ cents.T
        probe = np.argsort(-sims)[:6]
        ivf_cands[int(v)] = set().union(*[by_list.get(int(p), set()) for p in probe])
    ivf_rows = topk_rows(ivf_cands)

    # multi-table near-dup LSH: 6 tables × 6 planes, threshold 0.40
    pair_cands: set[tuple[int, int]] = set()
    for t in range(6):
        pt = _hyperplanes(6, dim, seed=7 + 13 * t)
        bt = _buckets(vecs, pt)
        byb: dict[int, list[int]] = {}
        for i, v in enumerate(vec_ids):
            byb.setdefault(int(bt[i]), []).append(int(v))
        for members in byb.values():
            ms = sorted(members)
            for i_a in range(len(ms)):
                for i_b in range(i_a + 1, len(ms)):
                    pair_cands.add((ms[i_a], ms[i_b]))
    nd_rows = []
    for a, b in sorted(pair_cands):
        c = _fold_dot(vecs[idx_of[a]], vecs[idx_of[b]]) / np.sqrt(
            norm2[a] * norm2[b])
        if c >= 0.40:
            nd_rows.append((a, b, _round6(c)))

    def _topk_table(rows):
        return pa.table({
            "qid": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int32()),
            "cosine_r6": pa.array([r[3] for r in rows], pa.float64()),
        })

    return {
        "ann_cosine_lsh": _topk_table(lsh_rows),
        "ann_cosine_ivf": _topk_table(ivf_rows),
        "embedding_near_dup_lsh": pa.table({
            "vec_a": pa.array([r[0] for r in nd_rows], pa.int64()),
            "vec_b": pa.array([r[1] for r in nd_rows], pa.int64()),
            "cosine_r6": pa.array([r[2] for r in nd_rows], pa.float64()),
        }),
    }


# ---------------------------------------------------------------- media family

def media_goldens(n: int = 300) -> dict[str, pa.Table]:
    meta_rows, feat_rows, frame_rows = [], [], []
    for i in range(n):
        seed = ids.splitmix64(0xA11CE ^ (i * 0x9E3779B97F4A7C15 & 0xFFFFFFFFFFFFFFFF))
        rng = np.random.default_rng(seed)
        mid = ids.stable_id64("m", str(i), 0)
        kind_i = i % 3
        if kind_i == 0:
            w, h, ch = 16 + (i % 5) * 8, 16 + (i % 3) * 8, 3
            data = rng.integers(0, 256, size=w * h * ch, dtype=np.uint8)
            hdr = ("image", w, h, ch)
        elif kind_i == 1:
            sr, ns, ch = 8000, 1000 + (i % 7) * 100, 1
            data = rng.integers(-32768, 32767, size=ns * ch, dtype=np.int16)
            hdr = ("audio", sr, ns, ch)
        else:
            w, h, nf = 16, 12, 4 + (i % 5)
            data = rng.integers(0, 256, size=nf * w * h, dtype=np.uint8)
            hdr = ("video", w, h, nf)
        payload_len = 4 + struct.calcsize("<BIII") + data.nbytes
        kind, a, b, c = hdr
        meta_rows.append({
            "media_id": mid, "kind": kind,
            "width": a if kind in ("image", "video") else None,
            "height": b if kind in ("image", "video") else None,
            "channels": c if kind == "image" else (1 if kind == "video" else c),
            "sample_rate": a if kind == "audio" else None,
            "n_samples": b if kind == "audio" else None,
            "n_frames": c if kind == "video" else None,
            "n_bytes": payload_len,
        })
        arr = data.astype(np.float64).ravel()
        dimf = 16
        nlen = len(arr) - (len(arr) % dimf) or dimf
        binned = (arr[:nlen].reshape(dimf, -1).mean(axis=1) if nlen >= dimf
                  else np.resize(arr, dimf))
        nrm = float(np.linalg.norm(binned)) or 1.0
        f0 = float(np.float32(binned[0] / nrm))
        feat_rows.append({"media_id": mid, "kind": kind,
                          "f0_r6": _round6(f0), "dim": dimf})
        if kind == "video":
            fsz = a * b
            for fi in range(0, c, 2):
                frame_rows.append({"media_id": mid, "frame_idx": fi,
                                   "width": a, "height": b,
                                   "frame_bytes": fsz})
    t_meta = pa.table({
        "media_id": pa.array([r["media_id"] for r in meta_rows], pa.int64()),
        "kind": pa.array([r["kind"] for r in meta_rows], pa.string()),
        "width": pa.array([r["width"] for r in meta_rows], pa.int32()),
        "height": pa.array([r["height"] for r in meta_rows], pa.int32()),
        "channels": pa.array([r["channels"] for r in meta_rows], pa.int32()),
        "sample_rate": pa.array([r["sample_rate"] for r in meta_rows], pa.int32()),
        "n_samples": pa.array([r["n_samples"] for r in meta_rows], pa.int64()),
        "n_frames": pa.array([r["n_frames"] for r in meta_rows], pa.int32()),
        "n_bytes": pa.array([r["n_bytes"] for r in meta_rows], pa.int64()),
    })
    t_feat = pa.table({
        "media_id": pa.array([r["media_id"] for r in feat_rows], pa.int64()),
        "kind": pa.array([r["kind"] for r in feat_rows], pa.string()),
        "f0_r6": pa.array([r["f0_r6"] for r in feat_rows], pa.float64()),
        "dim": pa.array([r["dim"] for r in feat_rows], pa.int32()),
    })
    t_frames = pa.table({
        "media_id": pa.array([r["media_id"] for r in frame_rows], pa.int64()),
        "frame_idx": pa.array([r["frame_idx"] for r in frame_rows], pa.int32()),
        "width": pa.array([r["width"] for r in frame_rows], pa.int32()),
        "height": pa.array([r["height"] for r in frame_rows], pa.int32()),
        "frame_bytes": pa.array([r["frame_bytes"] for r in frame_rows], pa.int32()),
    })
    return {"media_decode_meta": t_meta, "media_features": t_feat,
            "media_frame_sample": t_frames}


# ---------------------------------------------------------------- verification

def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return repr(v)
    return v


def verify_against_engine(goldens: dict[str, pa.Table]) -> None:
    from pyspark.sql import SparkSession

    from mergeaddressesandbuildings_spark.plans.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("make_goldens_verify").getOrCreate()
    )
    try:
        failures = []
        for name, table in goldens.items():
            df = QUERIES[name](spark, SF_DIR)
            got_cols = df.columns
            want_cols = table.column_names
            if sorted(got_cols) != sorted(want_cols):
                failures.append((name, f"columns {got_cols} != {want_cols}"))
                continue
            got = sorted(
                tuple(_norm_cell(r[c]) for c in want_cols)
                for r in df.collect()
            )
            want = sorted(
                tuple(_norm_cell(v) for v in row)
                for row in zip(*[table.column(c).to_pylist() for c in want_cols])
            )
            if got != want:
                only_e = [r for r in got if r not in set(want)][:3]
                only_g = [r for r in want if r not in set(got)][:3]
                failures.append(
                    (name, f"rows differ: engine={len(got)} golden={len(want)} "
                           f"engine-only={only_e} golden-only={only_g}"))
            else:
                print(f"  OK  {name}: {len(got)} rows match engine")
        if failures:
            for n, msg in failures:
                print(f"FAIL {n}: {msg}")
            raise SystemExit(1)
    finally:
        spark.stop()


def dp_goldens() -> dict[str, pa.Table]:
    """way_simplify_dp: independent RECURSIVE pure-Python DP (Python
    bigints; the engine uses an iterative numpy stack) over the same
    deterministic 40x120 synthesis as plans/queries.way_simplify_dp."""
    EPS2 = 7 * 7

    def keep_indices(pts):
        keep = {0, len(pts) - 1}

        def rec(i, j):
            if j - i < 2:
                return
            ax, ay = pts[i]
            bx, by = pts[j]
            dx, dy = bx - ax, by - ay
            best_d2, best_th, best_k = -1, 0, None
            for k in range(i + 1, j):
                px, py = pts[k]
                if dx == 0 and dy == 0:
                    d2, th = (px - ax) ** 2 + (py - ay) ** 2, EPS2
                else:
                    cr = dx * (py - ay) - dy * (px - ax)
                    d2, th = cr * cr, EPS2 * (dx * dx + dy * dy)
                if d2 > best_d2:
                    best_d2, best_th, best_k = d2, th, k
            if best_k is not None and best_d2 > best_th:
                keep.add(best_k)
                rec(i, best_k)
                rec(best_k, j)

        rec(0, len(pts) - 1)
        return sorted(keep)

    line_ids, pt_idxs = [], []
    for lid in range(40):
        pts = [(i * 3 + lid % 5,
                ((lid + 3) * i * i) % 211 + (i * 17) % 13)
               for i in range(120)]
        for k in keep_indices(pts):
            line_ids.append(lid)
            pt_idxs.append(k)
    return {"way_simplify_dp": pa.table({
        "line_id": pa.array(line_ids, pa.int64()),
        "pt_idx": pa.array(pt_idxs, pa.int64()),
    })}


def hull_goldens() -> dict[str, pa.Table]:
    """cluster_convex_hulls: independent Jarvis-march gift wrapping
    (the engine uses Andrew's monotone chain) over the same
    deterministic 2000-point / 12-group synthesis as
    plans/queries.cluster_convex_hulls."""

    def jarvis(pts):
        pts = sorted(set(pts))
        if len(pts) <= 2:
            return pts
        start = pts[0]
        hull, cur = [start], start
        while True:
            cand = None
            for p in pts:
                if p == cur:
                    continue
                if cand is None:
                    cand = p
                    continue
                cross = ((cand[0] - cur[0]) * (p[1] - cur[1])
                         - (cand[1] - cur[1]) * (p[0] - cur[0]))
                if cross < 0:
                    cand = p
                elif cross == 0:
                    if ((p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                            > (cand[0] - cur[0]) ** 2
                            + (cand[1] - cur[1]) ** 2):
                        cand = p
            if cand == start:
                break
            hull.append(cand)
            cur = cand
        return hull

    groups = {}
    for i in range(2000):
        groups.setdefault(i % 12, []).append(
            ((i * 2654435761) % 2001 - 1000, (i * 40503) % 2001 - 1000))
    g_col, seq_col, x_col, y_col = [], [], [], []
    for g in sorted(groups):
        for seq, (x, y) in enumerate(jarvis(groups[g])):
            g_col.append(g)
            seq_col.append(seq)
            x_col.append(x)
            y_col.append(y)
    return {"cluster_convex_hulls": pa.table({
        "g": pa.array(g_col, pa.int64()),
        "seq": pa.array(seq_col, pa.int32()),
        "x": pa.array(x_col, pa.int64()),
        "y": pa.array(y_col, pa.int64()),
    })}


def hilbert_goldens() -> dict[str, pa.Table]:
    """hilbert_cells: order-12 Hilbert index of the morton_cells point
    derivation, computed with a SCALAR rotate-and-accumulate loop (the
    textbook xy2d; independent of both the engine's vectorized numpy
    kernel and its F.aggregate JVM twin)."""
    import math

    def xy2d(x: int, y: int, order: int) -> int:
        d = 0
        s = 1 << (order - 1)
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x = s - 1 - x
                    y = s - 1 - y
                x, y = y, x
            s //= 2
        return d

    cust = pq.read_table(os.path.join(SF_DIR, "customer.parquet"),
                         columns=["c_custkey"])
    n = 1 << 12
    keys, cells = [], []
    for ck in cust.column("c_custkey").to_pylist():
        lat = float(ck % 17999) / 100.0 - 89.995
        lon = float(ck % 35999) / 100.0 - 179.995
        # mirror cells_sql.xy_expr: double math, floor, clip
        x = min(max(int(math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        y = min(max(int(math.floor((lat + 90.0) / 180.0 * n)), 0), n - 1)
        keys.append(ck)
        cells.append(xy2d(x, y, 12))
    return {"hilbert_cells": pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "cell": pa.array(cells, pa.int64()),
    })}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    goldens = {}
    goldens.update(merge_goldens())
    goldens.update(ann_goldens())
    goldens.update(media_goldens())
    goldens.update(dp_goldens())
    goldens.update(hull_goldens())
    goldens.update(hilbert_goldens())
    print("verifying engine vs independent goldens ...")
    verify_against_engine(goldens)
    for name, table in goldens.items():
        path = os.path.join(OUT, f"{name}.parquet")
        pq.write_table(table, path)
        print(f"wrote {path} ({table.num_rows} rows)")


if __name__ == "__main__":
    main()
