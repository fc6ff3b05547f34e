"""Geometry kernel tests: WKB codecs, geodesic math, ring assembly."""

from __future__ import annotations

import math
import struct

from pyspark.sql import functions as F

from osm_poi_database_maker_spark import geo, osm_fixtures as fx


def test_wkb_point_hex_matches_spec(spark):
    df = spark.createDataFrame(
        [(5.121, 52.09), (-180.0, -90.0), (None, 4.0)], "lon double, lat double"
    )
    out = [r.w for r in df.select(geo.wkb_point_hex("lon", "lat").alias("w")).collect()]
    expect0 = (struct.pack("<BI", 1, 1) + struct.pack("<dd", 5.121, 52.09)).hex()
    expect1 = (struct.pack("<BI", 1, 1) + struct.pack("<dd", -180.0, -90.0)).hex()
    assert out[0] == expect0
    assert out[1] == expect1
    assert out[2] is None


def test_wkb_point_roundtrip(spark):
    df = spark.createDataFrame([(5.121, 52.09)], "lon double, lat double")
    back = (
        df.select(geo.wkb_point_decode(geo.wkb_point_hex("lon", "lat")).alias("p"))
        .select("p.lon", "p.lat")
        .collect()[0]
    )
    assert back.lon == 5.121 and back.lat == 52.09


def test_wkb_polygon_hex(spark):
    ring = [{"lon": 0.0, "lat": 0.0}, {"lon": 1.0, "lat": 0.0},
            {"lon": 1.0, "lat": 1.0}, {"lon": 0.0, "lat": 0.0}]
    df = spark.createDataFrame([(ring,), (ring[:3],), (None,)],
                               "ring array<struct<lon: double, lat: double>>")
    out = [r.w for r in df.select(geo.wkb_polygon_hex("ring").alias("w")).collect()]
    head = struct.pack("<BIII", 1, 3, 1, 4).hex()
    assert out[0].startswith(head)
    assert len(out[0]) == (13 + 4 * 16) * 2
    assert out[1] is None  # unclosed / too small
    assert out[2] is None


def test_haversine_known_distance(spark):
    # Amsterdam (4.9041, 52.3676) -> Paris (2.3522, 48.8566) ≈ 430 km
    df = spark.createDataFrame([(4.9041, 52.3676, 2.3522, 48.8566)],
                               "lon1 double, lat1 double, lon2 double, lat2 double")
    d = df.select(
        geo.haversine_m(F.col("lon1"), F.col("lat1"), F.col("lon2"), F.col("lat2")).alias("d")
    ).collect()[0].d
    assert abs(d - 430_000) < 5_000


def _ring_df(spark, pts):
    return spark.createDataFrame(
        [([{"lon": x, "lat": y} for x, y in pts],)],
        "ring array<struct<lon: double, lat: double>>",
    )


def test_spherical_area_of_small_square(spark):
    # ~30m x ~30m square at 52N -> ~900 m2 (within a few percent)
    pts = fx._square(5.0, 52.0, fx._DLON_30M, fx._DLAT_30M)
    a = _ring_df(spark, pts).select(
        geo.ring_area_sphere_m2(F.col("ring")).alias("a")
    ).collect()[0].a
    expect = (fx._DLAT_30M * 111_195) * (fx._DLON_30M * 111_195 * math.cos(math.radians(52)))
    assert abs(a - expect) / expect < 0.03


def test_centroid_of_square(spark):
    pts = fx._square(10.0, 50.0, 0.2, 0.1)
    c = _ring_df(spark, pts).select(geo.ring_centroid(F.col("ring")).alias("c")).collect()[0].c
    assert abs(c.lon - 10.1) < 1e-9 and abs(c.lat - 50.05) < 1e-9


def test_assemble_rings_closed_and_count(spark):
    wn, nd = fx.way_nodes_and_nodes_df(spark)
    rings = {r.way_id: r for r in geo.assemble_rings(wn, nd).collect()}
    assert rings[100].is_closed and len(rings[100].ring) == 5
    assert not rings[100].has_missing_node
    # drop one node -> missing flagged, ring incomplete
    nd2 = nd.filter(F.col("id") != 1000)
    rings2 = {r.way_id: r for r in geo.assemble_rings(wn, nd2).collect()}
    assert rings2[100].has_missing_node
