"""Multipolygon / relation-area assembly tests (O10 full semantics)."""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from osm_poi_database_maker_spark import geo, osm_fixtures as fx
from osm_poi_database_maker_spark.areas import (
    areas_to_centroids,
    areas_union,
    member_rings,
    poi_relation_areas,
    quarantined_relations,
    relation_area_stats,
    relation_polys,
)
from osm_poi_database_maker_spark.pipeline import poi_ways
from osm_poi_database_maker_spark.queries.osm import SETTINGS


def _mrings(spark):
    return member_rings(fx.relation_members_df(spark), fx.member_way_rings_df(spark))


def test_point_in_ring(spark):
    ring = [
        {"lon": 0.0, "lat": 0.0},
        {"lon": 4.0, "lat": 0.0},
        {"lon": 4.0, "lat": 4.0},
        {"lon": 0.0, "lat": 4.0},
        {"lon": 0.0, "lat": 0.0},
    ]
    cases = [(2.0, 2.0, True), (5.0, 2.0, False), (-1.0, -1.0, False), (3.9, 0.1, True)]
    df = spark.createDataFrame(
        [(lon, lat, ring, want) for lon, lat, want in cases],
        "lon double, lat double, ring array<struct<lon: double, lat: double>>, want boolean",
    )
    rows = df.select(
        geo.point_in_ring(F.col("lon"), F.col("lat"), F.col("ring")).alias("got"), "want"
    ).collect()
    assert all(r.got == r.want for r in rows)


def test_relation_stats_donut_and_winding(spark):
    stats = {r.relation_id: r for r in relation_area_stats(_mrings(spark)).collect()}
    donut = stats[500]
    assert donut.is_valid and donut.n_outer == 1 and donut.n_inner == 1
    # outer alone ~22151 m2 (> threshold); net with hole subtracted is
    # below it — THE case a single-ring engine cannot represent
    assert 18000 < donut.area_m2 < 19000
    # R502's second outer is stored CW; winding normalization must make
    # both outers add (two 30 m squares ~ 1800 m2, never ~0)
    assert 1500 < stats[502].area_m2 < 2100
    # invalid relations carry reasons
    assert stats[503].invalid_reason == "missing_member" and not stats[503].is_valid
    assert stats[504].invalid_reason == "open_ring" and not stats[504].is_valid


def test_relation_polys_hole_assignment(spark):
    polys = {
        r.relation_id: r.polys for r in relation_polys(_mrings(spark)).collect()
    }
    # donut: one polygon with [outer, hole]
    assert len(polys[500]) == 1 and len(polys[500][0]) == 2
    # outer normalized CCW (positive shoelace), hole CW (negative)
    def shoelace(ring):
        return sum(
            a["lon"] * b["lat"] - b["lon"] * a["lat"] for a, b in zip(ring, ring[1:])
        )
    assert shoelace(polys[500][0][0]) > 0
    assert shoelace(polys[500][0][1]) < 0
    # two-outer relation: two polygons, no holes, ordered by member id
    assert [len(p) for p in polys[502]] == [1, 1]
    # quarantined relations produce no polys via the valid path; their
    # resolved members may still appear (503 has one found ring)
    assert 504 not in polys or polys[504] == []


def test_nested_hole_assigned_to_smallest_outer(spark):
    # big outer [0,10], small outer island [2,6], hole [3,4] inside BOTH
    # -> must attach to the SMALLEST containing outer (the island)
    def sq(x0, y0, d):
        return [
            {"lon": x0, "lat": y0},
            {"lon": x0 + d, "lat": y0},
            {"lon": x0 + d, "lat": y0 + d},
            {"lon": x0, "lat": y0 + d},
            {"lon": x0, "lat": y0},
        ]
    mr = spark.createDataFrame(
        [
            (1, 11, "outer", 0, sq(0.0, 0.0, 10.0), True, True),
            (1, 12, "outer", 1, sq(2.0, 2.0, 4.0), True, True),
            (1, 13, "inner", 2, sq(3.0, 3.0, 1.0), True, True),
        ],
        "relation_id long, member_id long, role string, sequence_id int, "
        "ring array<struct<lon: double, lat: double>>, found boolean, ring_ok boolean",
    )
    polys = relation_polys(mr).collect()[0].polys
    assert [len(p) for p in polys] == [1, 2]  # member 11 first, hole on 12


def test_wkb_multipolygon_spec(spark):
    ring = [
        {"lon": 0.0, "lat": 0.0},
        {"lon": 1.0, "lat": 0.0},
        {"lon": 1.0, "lat": 1.0},
        {"lon": 0.0, "lat": 0.0},
    ]
    hole = [
        {"lon": 0.5, "lat": 0.2},
        {"lon": 0.7, "lat": 0.2},
        {"lon": 0.7, "lat": 0.4},
        {"lon": 0.5, "lat": 0.2},
    ]
    df = spark.createDataFrame(
        [([[ring, hole], [ring]],), ([[ring[:3]]],), (None,)],
        "polys array<array<array<struct<lon: double, lat: double>>>>",
    )
    out = [r.w for r in df.select(geo.wkb_multipolygon_hex("polys").alias("w")).collect()]
    # byte-exact against the spec: MULTIPOLYGON(2 polys), first with hole
    def enc_ring(r):
        return struct.pack("<I", len(r)) + b"".join(
            struct.pack("<dd", p["lon"], p["lat"]) for p in r
        )
    expect = (
        struct.pack("<BII", 1, 6, 2)
        + struct.pack("<BII", 1, 3, 2) + enc_ring(ring) + enc_ring(hole)
        + struct.pack("<BII", 1, 3, 1) + enc_ring(ring)
    ).hex()
    assert out[0] == expect
    assert out[1] is None  # unclosed ring
    assert out[2] is None


def test_relation_pipeline_end_to_end(spark):
    pr = poi_relation_areas(
        fx.relations_df(spark),
        fx.relation_members_df(spark),
        fx.member_way_rings_df(spark),
        fx.taginfo_df(spark),
        SETTINGS,
    )
    ids = {r.id for r in pr.select("id").collect()}
    # valid + cascade-kept: donut, small-hole, two-outer(v2), collide,
    # and the STITCHED donut 507 (outer arrives as two open halves)
    assert ids == {500, 501, 502, 100, 507}
    quar = {
        r.id: r.invalid_reason
        for r in quarantined_relations(
            fx.relations_df(spark),
            fx.relation_members_df(spark),
            fx.member_way_rings_df(spark),
        ).collect()
    }
    assert quar == {503: "missing_member", 504: "open_ring", 508: "open_ring"}
    # unified centroid stream: donut converts (net <= 20000 only with
    # holes subtracted), small-hole stays a polygon
    pw = poi_ways(fx.ways_df(spark), fx.taginfo_df(spark), SETTINGS)
    cent = areas_to_centroids(areas_union(pw, pr), SETTINGS)
    rows = {(r.id, r.area_src) for r in cent.collect()}
    assert (36_000_000_000 + 500, "relation") in rows
    assert not any(i == 36_000_000_000 + 501 for i, _ in rows)
    # the deliberate orig_id collision: way 100 and relation 100 both land
    # on the same output id, distinguishable only by area_src
    assert (36_000_000_100, "way") in rows and (36_000_000_100, "relation") in rows
    # stitched donut also converts (net ~18585 m2 after stitch + hole)
    assert (36_000_000_000 + 507, "relation") in rows


def test_relation_wkb_from_polys(spark):
    """End-to-end: fixture relations → structural polys → multipolygon
    WKB; decode by hand and check ring counts per relation."""
    polys = relation_polys(_mrings(spark))
    out = {
        r.relation_id: r.w
        for r in polys.select(
            "relation_id", geo.wkb_multipolygon_hex("polys").alias("w")
        ).collect()
    }
    def n_rings(hexwkb):
        raw = bytes.fromhex(hexwkb)
        npolys = struct.unpack("<I", raw[5:9])[0]
        off, total = 9, 0
        for _ in range(npolys):
            nr = struct.unpack("<I", raw[off + 5 : off + 9])[0]
            total += nr
            off += 9
            for _ in range(nr):
                npts = struct.unpack("<I", raw[off : off + 4])[0]
                off += 4 + 16 * npts
        return npolys, total
    assert n_rings(out[500]) == (1, 2)   # donut: 1 poly, outer+hole
    assert n_rings(out[502]) == (2, 2)   # two outers, no holes
    assert n_rings(out[100]) == (1, 1)


def test_stitching_multi_cycle_and_failures(spark):
    """Four open segments forming TWO disjoint rings stitch into two
    outer cycles; a leftover odd segment or a degree-3 endpoint
    quarantines the group instead of mis-assembling."""
    from osm_poi_database_maker_spark.areas import stitch_member_rings

    def seg(rel, mid, role, pts):
        return (rel, mid, role, 0, [{"lon": x, "lat": y} for x, y in pts], True, False)

    rows = [
        # relation 1: ring A = unit square from two halves (one reversed),
        # ring B = triangle from two halves
        seg(1, 10, "outer", [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0)]),
        seg(1, 11, "outer", [(0.0, 0.0), (0.0, 1.0), (1.0, 1.0)]),
        seg(1, 12, "outer", [(5.0, 5.0), (6.0, 5.0)]),
        seg(1, 13, "outer", [(6.0, 5.0), (5.5, 6.0), (5.0, 5.0)]),
        # relation 2: degree-3 endpoint (three segments meet) -> fail
        seg(2, 20, "outer", [(0.0, 0.0), (1.0, 0.0)]),
        seg(2, 21, "outer", [(1.0, 0.0), (1.0, 1.0), (0.0, 0.0)]),
        seg(2, 22, "outer", [(1.0, 0.0), (2.0, 2.0), (0.0, 0.0)]),
    ]
    mr = spark.createDataFrame(
        rows,
        "relation_id long, member_id long, role string, sequence_id int, "
        "ring array<struct<lon: double, lat: double>>, found boolean, ring_ok boolean",
    )
    out = stitch_member_rings(mr).collect()
    by_rel = {}
    for r in out:
        by_rel.setdefault(r.relation_id, []).append(r)
    r1 = sorted(by_rel[1], key=lambda r: r.member_id)
    assert [r.ring_ok for r in r1] == [True, True]
    assert [r.member_id for r in r1] == [10, 12]  # min member id per cycle
    # ring A is the closed unit square (5 points), ring B the triangle (4)
    assert [len(r.ring) for r in r1] == [5, 4]
    assert r1[0].ring[0] == r1[0].ring[-1]
    assert len(by_rel[2]) == 1 and not by_rel[2][0].ring_ok


def test_stitched_polys_structural(spark):
    """relation_polys over STITCHED rings: the split-outer donut 507
    builds one polygon with outer + hole, hole wound CW."""
    from osm_poi_database_maker_spark.areas import stitch_member_rings

    polys = {
        r.relation_id: r.polys
        for r in relation_polys(stitch_member_rings(_mrings(spark))).collect()
    }
    assert len(polys[507]) == 1 and len(polys[507][0]) == 2
