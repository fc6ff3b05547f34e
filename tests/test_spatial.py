"""Spatial bucketing tests: cover-set soundness, filter equivalence,
Z-order locality, clustered-write layout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.spatial import (
    bbox_filter,
    cells_for_bbox,
    cluster_spatially,
    grid_cell,
    with_spatial_keys,
    zorder_key,
)


def _points(spark, n=500, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, rng.uniform(-180, 180), rng.uniform(-90, 90)) for i in range(n)
    ] + [
        # boundary coords must quantize into valid cells
        (n, 180.0, 90.0),
        (n + 1, -180.0, -90.0),
        (n + 2, 0.0, 0.0),
    ]
    return spark.createDataFrame(rows, "id long, lon double, lat double")


def test_bbox_filter_equals_plain_bbox(spark):
    # the cell prefilter must never drop a row the plain bbox keeps
    df = _points(spark)
    bbox = (-10.0, -5.0, 25.0, 40.0)
    lon, lat = F.col("lon"), F.col("lat")
    plain = df.filter(
        (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
    )
    pruned = bbox_filter(df, *bbox)
    assert sorted(r.id for r in pruned.collect()) == sorted(r.id for r in plain.collect())
    assert plain.count() > 0


def test_cells_cover_contains_member_cells(spark):
    df = _points(spark)
    bbox = (100.0, 30.0, 140.0, 60.0)
    cover = set(cells_for_bbox(*bbox))
    lon, lat = F.col("lon"), F.col("lat")
    inside = df.filter(
        (lon >= bbox[0]) & (lon <= bbox[2]) & (lat >= bbox[1]) & (lat <= bbox[3])
    ).select(grid_cell(lon, lat).alias("cell"))
    assert {r.cell for r in inside.collect()} <= cover


def test_zorder_key_locality(spark):
    # two points in the same small neighborhood must share high z-key
    # bits; antipodal points must not be adjacent in z-order
    df = spark.createDataFrame(
        [(1, 5.100, 52.100), (2, 5.101, 52.101), (3, -170.0, -80.0)],
        "id long, lon double, lat double",
    )
    keys = {r.id: r.z for r in df.select("id", zorder_key(F.col("lon"), F.col("lat")).alias("z")).collect()}
    assert abs(keys[1] - keys[2]) < abs(keys[1] - keys[3])


def test_cluster_spatially_layout(spark, tmp_path):
    out = str(tmp_path / "clustered")
    cluster_spatially(_points(spark), num_partitions=4).write.parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 503
    # a cell's rows must land in exactly one file (range partitioning)
    spread = (
        back.withColumn("f", F.input_file_name())
        .groupBy("cell")
        .agg(F.count_distinct("f").alias("nf"))
        .agg(F.max("nf").alias("mx"))
        .collect()[0]
        .mx
    )
    assert spread == 1


def test_neighbor_cells_cover_and_distance_join(spark):
    """neighbor_cells covers every within-radius partner when the cell
    edge >= radius, including across cell boundaries; the distance join
    finds exactly the within-threshold pairs, each once."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.spatial import (
        GRID_RES,
        grid_cell,
        neighbor_cells,
    )

    # two points ~1.1 km apart straddling a cell boundary at res 12
    # (cell edge 360/4096 = 0.087890625 deg; boundary at lon where
    # (lon+180)/360*4096 is integer, e.g. lon = 0)
    pts = spark.createDataFrame(
        [(1, -0.005, 10.0), (2, 0.005, 10.0), (3, 3.0, 10.0)],
        "id long, lon double, lat double",
    )
    cells = {r.id: r.c for r in pts.select("id", grid_cell(F.col("lon"), F.col("lat")).alias("c")).collect()}
    assert cells[1] != cells[2]  # genuinely straddling
    nbr = {r.id: r.ns for r in pts.select("id", neighbor_cells(F.col("lon"), F.col("lat")).alias("ns")).collect()}
    assert cells[2] in nbr[1] and cells[1] in nbr[2]
    assert len(nbr[1]) == 9

    from osm_poi_database_maker_spark.queries.osm import q_osm_node_neighbor_pairs

    rows = q_osm_node_neighbor_pairs(spark, "x").collect()
    got = {(r.id_a, r.id_b) for r in rows}
    # fixture nodes are ~1.30 km apart on a diagonal: 1-step (1.30 km)
    # and 2-step (2.61 km) pairs fall under 3 km, 3-step (3.91 km) do
    # not (ids are NOT coordinate-ordered everywhere: id 16 is
    # versioned twice and 100 sits mid-diagonal, so check by known
    # coordinates, not id arithmetic)
    assert (1, 2) in got and (1, 3) in got     # 1- and 2-step
    assert (1, 4) not in got                   # 3-step: 3.91 km
    assert (16, 100) in got                    # out-of-order ids pair too
    assert all(r.dist_km <= 3.0 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_neighbor_cells_high_latitude_reach(spark):
    """At 80N a GRID_RES=12 lon cell is ~1.7 km wide, so a 3 km radius
    needs a wider-than-3x3 lon reach; the radius-aware cover must find
    within-radius partners that the fixed ring would miss."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.spatial import grid_cell, neighbor_cells

    # at lat 80 a lon cell is ~1.70 km wide; 0.085 sits at the right
    # edge of cell 2048 and 0.176 at the left edge of cell 2050 —
    # TWO cells apart yet only ~1.76 km of real distance
    pts = spark.createDataFrame(
        [(1, 0.085, 80.0), (2, 0.176, 80.0)], "id long, lon double, lat double"
    )
    cells = {r.id: r.c for r in pts.select(
        "id", grid_cell(F.col("lon"), F.col("lat")).alias("c")).collect()}
    fixed = {r.id: r.ns for r in pts.select(
        "id", neighbor_cells(F.col("lon"), F.col("lat")).alias("ns")).collect()}
    aware = {r.id: r.ns for r in pts.select(
        "id",
        neighbor_cells(F.col("lon"), F.col("lat"), radius_km=3.0).alias("ns"),
    ).collect()}
    # the fixed 3x3 ring misses the partner; the radius-aware one covers it
    assert cells[2] not in fixed[1]
    assert cells[2] in aware[1] and cells[1] in aware[2]


def test_neighbor_cells_radius_too_large_rejected(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.spatial import neighbor_cells

    with _pytest.raises(ValueError, match="lat cell edge"):
        neighbor_cells(F.col("lon"), F.col("lat"), radius_km=50.0)


def test_dbscan_core_border_noise_roles(spark, monkeypatch):
    """Planted geometry: a dense blob of 4 mutually-close nodes are all
    cores in ONE cluster; a lone node 1 km from a single blob member
    stays a border of that cluster (1 neighbor < minPts-1); an isolated
    far-away pair is noise (each has 1 neighbor, neither is core, no
    core neighbor -> excluded entirely)."""
    from osm_poi_database_maker_spark.queries import osm as O

    # 1 deg lat ~= 111.2 km; eps = 3 km
    rows = [
        (1, 10.0, 50.000),
        (2, 10.0, 50.002),
        (3, 10.0, 50.004),
        (4, 10.0, 50.006),        # blob: span ~0.67 km, all mutual neighbors
        (5, 10.0, 50.0325),       # 2.95 km from node 4, >3.1 km from the rest
        (100, 120.0, -30.0),
        (101, 120.0, -30.009),    # isolated pair -> each 1 neighbor, no core
        (200, -60.0, 10.0),       # singleton -> noise
    ]
    nodes = spark.createDataFrame(
        [(i, lon, lat, True) for i, lon, lat in rows],
        "id long, lon double, lat double, geom_valid boolean",
    )
    monkeypatch.setattr(O.fx, "nodes_df", lambda s_: nodes)
    out = {r.id: r for r in O.q_osm_dbscan_clusters(spark, "x").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(out[i].role == "core" and out[i].cluster_id == 1 for i in (1, 2, 3, 4))
    assert out[5].role == "border" and out[5].cluster_id == 1
