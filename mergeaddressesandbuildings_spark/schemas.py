"""Fixed StructType schemas for every engine table (SURVEY.md §1.3 —
no schema inference in production paths; FIXTURES.md §1–2 freezes these)."""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

RING = T.ArrayType(
    T.StructType(
        [
            T.StructField("lat", T.DoubleType(), False),
            T.StructField("lon", T.DoubleType(), False),
        ]
    )
)

ADDRESSES = T.StructType(
    [
        T.StructField("addr_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("housenumber", T.StringType(), True),
        T.StructField("street", T.StringType(), True),
        T.StructField("unit", T.StringType(), True),
        T.StructField("city", T.StringType(), True),
        T.StructField("state", T.StringType(), True),
        T.StructField("postcode", T.StringType(), True),
        T.StructField("cell", T.LongType(), False),
    ]
)

BUILDINGS = T.StructType(
    [
        T.StructField("building_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("ring", RING, False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("min_lat", T.DoubleType(), False),
        T.StructField("min_lon", T.DoubleType(), False),
        T.StructField("max_lat", T.DoubleType(), False),
        T.StructField("max_lon", T.DoubleType(), False),
        T.StructField("centroid_lat", T.DoubleType(), False),
        T.StructField("centroid_lon", T.DoubleType(), False),
        T.StructField("area_m2", T.DoubleType(), False),
        T.StructField("existing", T.BooleanType(), False),
        T.StructField("cells", T.ArrayType(T.LongType()), False),
    ]
)

EXISTING_OSM = T.StructType(
    [
        T.StructField("elem_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # node | way
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("ring", RING, True),
        # §8.1 ext: hole rings of multipolygon ways (null for plain ways)
        T.StructField("holes", T.ArrayType(RING), True),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

ASSIGNMENTS = T.StructType(
    [
        T.StructField("addr_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("record_idx", T.IntegerType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("building_id", T.LongType(), True),
        T.StructField("method", T.StringType(), False),  # PIP | KNN | NONE
        T.StructField("dist_m", T.DoubleType(), True),
        T.StructField("decision", T.StringType(), False),
        T.StructField("cell", T.LongType(), False),
        T.StructField("tile", T.LongType(), True),
    ]
)

# intermediate: (addr, candidate building, dist) rows out of the refine kernels
CANDIDATES = T.StructType(
    [
        T.StructField("addr_id", T.LongType(), False),
        T.StructField("building_id", T.LongType(), False),
        T.StructField("method", T.StringType(), False),
        T.StructField("dist_m", T.DoubleType(), False),
        T.StructField("area_m2", T.DoubleType(), False),
    ]
)

# the driver testdata documents table (TESTDATA.md) — frozen for the
# streaming source (never inferred)
DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)
