"""Multipolygon / relation area assembly (O10 full semantics).

The reference does not assemble areas itself — it receives them from
osmium's area handler, which merges CLOSED WAYS and MULTIPOLYGON RELATIONS
into areas with outer rings and holes, serialized as multipolygon WKB
(``/root/reference/filter.py:117-137``), identified by ``orig_id()``
(``filter.py:142-144``), with relation membership stored relationally in
``relation_members`` (``schema.sql:112-122``). This module re-derives that
assembly as DataFrame algebra:

* member resolution is an equi-join ``relation_members ⨝ way rings``;
* hole-aware area and planar centroid are ONE groupBy over exploded
  rings — per-ring shoelace/spherical moments are additive once ring
  winding is normalized by role (outer CCW, inner CW, exactly what
  osmium's assembler enforces), so no nested higher-order functions and
  no per-relation Python;
* inner→outer containment (needed only for structural multipolygon WKB,
  not for area/centroid) is a per-relation join with a pure-expression
  ray-cast residual predicate.

Scale: everything shuffles on ``relation_id`` — a fine-grained key (OSM
relations have ~10² members on average, bounded ~10⁴) — so the assembly
is one sort-merge join plus one hash aggregate at any corpus size.

Scope note (documented deviation): members that are OPEN ways are
quarantined rather than stitched end-to-end into rings. osmium attempts
segment stitching before giving up; stitching is an iterative
fixed-point the engine does not implement yet — invalid relations land
in the dead-letter branch with a reason, mirroring the reference's
``invalid_ways`` log (filter.py:131-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import geo
from .pipeline import dedup_latest, poi_filter, build_toi_dim
from .settings import Settings


def member_rings(relation_members: DataFrame, way_rings: DataFrame) -> DataFrame:
    """Resolve each multipolygon member way to its assembled ring.

    relation_members(relation_id, member_id, member_type, member_role,
    sequence_id) ⨝ way_rings(way_id, ring, is_closed) →
    (relation_id, member_id, role, sequence_id, ring, found, ring_ok).

    Only type-'W' members with outer/inner roles participate in area
    assembly (other roles — 'label', 'admin_centre', … — are ignored by
    osmium's assembler too). LEFT join keeps unresolved members visible
    so validity can be decided per relation, not silently dropped."""
    m = relation_members.filter(
        (F.col("member_type") == "W") & F.col("member_role").isin("outer", "inner")
    )
    joined = m.join(
        way_rings.select(
            F.col("way_id").alias("member_id"), "ring", "is_closed"
        ),
        "member_id",
        "left",
    )
    return joined.select(
        "relation_id",
        "member_id",
        F.col("member_role").alias("role"),
        "sequence_id",
        "ring",
        F.col("ring").isNotNull().alias("found"),
        F.coalesce(F.col("is_closed"), F.lit(False)).alias("ring_ok"),
    )


def relation_area_stats(mrings: DataFrame) -> DataFrame:
    """Hole-aware area + planar centroid per relation — one aggregation.

    Per ring: spherical (Chamberlain–Duquette) area, always positive,
    and shoelace moments on the role-normalized winding (outer CCW →
    positive a2, inner CW → negative). Then ONE groupBy(relation_id):

        area_m2  = Σ outer sphere-area − Σ inner sphere-area
        centroid = (Σcx, Σcy) / (3·Σa2)      (holes subtract naturally)

    A relation is valid iff every member resolved to a closed ring and
    at least one outer ring exists; invalid relations keep a reason for
    the dead-letter branch. Degenerate net area (|Σa2| ≈ 0) yields a
    NULL centroid rather than a division blow-up.

    Winding normalization is algebraic, not physical: reversing a ring
    flips the SIGN of every shoelace moment, so instead of reversing
    arrays the raw moments are multiplied by
    ``role_sign · signum(a2_raw)`` — outer rings contribute +|a2|,
    holes −|a2|, at zero extra cost (a degenerate zero-area ring
    contributes nothing)."""
    sign = F.when(F.col("role") == "outer", F.lit(1.0)).otherwise(F.lit(-1.0))
    per_ring = (
        mrings.withColumn(
            "sphere_m2",
            F.when(F.col("ring_ok"), geo.ring_area_sphere_m2(F.col("ring"))),
        )
        .withColumn(
            "mom_raw", F.when(F.col("ring_ok"), geo.ring_moments(F.col("ring")))
        )
        .withColumn(
            "mom",
            F.struct(
                (sign * F.signum(F.col("mom_raw.a2")) * F.col("mom_raw.a2")).alias("a2"),
                (sign * F.signum(F.col("mom_raw.a2")) * F.col("mom_raw.cx")).alias("cx"),
                (sign * F.signum(F.col("mom_raw.a2")) * F.col("mom_raw.cy")).alias("cy"),
            ),
        )
    )
    agg = per_ring.groupBy("relation_id").agg(
        F.count("*").alias("n_members"),
        F.sum(F.when(F.col("role") == "outer", 1).otherwise(0)).alias("n_outer"),
        F.sum(F.when(F.col("role") == "inner", 1).otherwise(0)).alias("n_inner"),
        F.min(F.col("found").cast("int")).alias("all_found"),
        F.min(F.col("ring_ok").cast("int")).alias("all_closed"),
        F.sum(sign * F.col("sphere_m2")).alias("area_raw"),
        F.sum(F.col("mom.a2")).alias("a2"),
        F.sum(F.col("mom.cx")).alias("cx"),
        F.sum(F.col("mom.cy")).alias("cy"),
    )
    valid = (
        (F.col("all_found") == 1) & (F.col("all_closed") == 1) & (F.col("n_outer") >= 1)
    )
    centroid = F.when(
        F.abs(F.col("a2")) >= 1e-12,
        F.struct(
            (F.col("cx") / (3 * F.col("a2"))).alias("lon"),
            (F.col("cy") / (3 * F.col("a2"))).alias("lat"),
        ),
    )
    reason = (
        F.when(F.col("all_found") == 0, F.lit("missing_member"))
        .when(F.col("all_closed") == 0, F.lit("open_ring"))
        .when(F.col("n_outer") == 0, F.lit("no_outer_ring"))
    )
    return agg.select(
        "relation_id",
        "n_outer",
        "n_inner",
        valid.alias("is_valid"),
        reason.alias("invalid_reason"),
        F.when(valid, F.col("area_raw")).alias("area_m2"),
        F.when(valid, centroid).alias("centroid"),
    )


def relation_polys(mrings: DataFrame) -> DataFrame:
    """Group a valid relation's rings into structural polygons for WKB:
    each inner ring is assigned to the SMALLEST outer ring containing
    its first vertex (ray-cast containment — handles nested
    island-in-lake-in-island cases), then polys =
    array<array<ring>> with polys[i][0] the outer and the rest holes.

    The containment join is per-relation (equi-key relation_id with a
    pure-expression residual), so its cost is bounded by members² of a
    single relation, never cross-relation."""
    outers = (
        mrings.filter((F.col("role") == "outer") & F.col("ring_ok"))
        .select(
            "relation_id",
            F.col("member_id").alias("outer_id"),
            geo.ring_oriented(F.col("ring"), F.lit(True)).alias("outer_ring"),
        )
        .withColumn("outer_area", F.abs(geo.ring_area_planar(F.col("outer_ring"))))
    )
    inners = mrings.filter((F.col("role") == "inner") & F.col("ring_ok")).select(
        "relation_id",
        F.col("member_id").alias("inner_id"),
        geo.ring_oriented(F.col("ring"), F.lit(False)).alias("inner_ring"),
    )
    probe = inners.withColumn("p0", F.element_at(F.col("inner_ring"), 1))
    contained = probe.join(
        outers,
        (probe["relation_id"] == outers["relation_id"])
        & geo.point_in_ring(
            F.col("p0.lon"), F.col("p0.lat"), F.col("outer_ring")
        ),
    ).drop(outers["relation_id"])
    w = Window.partitionBy("relation_id", "inner_id").orderBy(
        F.asc("outer_area"), F.asc("outer_id")
    )
    assigned = (
        contained.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy("relation_id", "outer_id")
        .agg(F.array_sort(F.collect_list(F.struct("inner_id", "inner_ring"))).alias("holes"))
    )
    polys = (
        outers.join(assigned, ["relation_id", "outer_id"], "left")
        .withColumn(
            "poly",
            F.concat(
                F.array(F.col("outer_ring")),
                F.coalesce(
                    F.transform(F.col("holes"), lambda h: h["inner_ring"]),
                    F.array().cast("array<array<struct<lon: double, lat: double>>>"),
                ),
            ),
        )
        .groupBy("relation_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("outer_id", "poly"))),
                lambda s: s["poly"],
            ).alias("polys")
        )
    )
    return polys


def poi_relation_areas(
    relations: DataFrame,
    relation_members: DataFrame,
    way_rings: DataFrame,
    taginfo: DataFrame,
    settings: Settings,
) -> DataFrame:
    """Relation branch of EP1 (the path the engine previously lacked —
    reference filter.py:142-144,227 processes relation-derived areas
    with ``orig_id()`` id semantics): dedup → tag cascade → geometry
    assembly → hole-aware measures. Output id is the RELATION id, which
    the reference writes into the same ways table (the documented
    id-collision hazard; ``area_src`` keeps the provenance auditable
    where the reference loses it)."""
    dim = build_toi_dim(taginfo, settings)
    filtered = poi_filter(dedup_latest(relations), dim, settings)
    stats = relation_area_stats(member_rings(relation_members, way_rings))
    return (
        filtered.join(stats, filtered["id"] == stats["relation_id"], "inner")
        .filter(F.col("is_valid"))
        .select(
            "id",
            "version",
            "user_id",
            "tstamp",
            "changeset_id",
            "tags",
            "n_outer",
            "n_inner",
            "area_m2",
            "centroid",
            F.lit("relation").alias("area_src"),
        )
    )


def quarantined_relations(
    relations: DataFrame, relation_members: DataFrame, way_rings: DataFrame
) -> DataFrame:
    """Dead-letter branch for relations whose geometry assembly failed
    (missing member, open ring, no outer) — the engine's analogue of the
    reference's ``invalid_ways`` warning log (filter.py:131-137)."""
    stats = relation_area_stats(member_rings(relation_members, way_rings))
    bad = stats.filter(~F.col("is_valid")).select("relation_id", "invalid_reason")
    return dedup_latest(relations).join(
        bad, F.col("id") == F.col("relation_id"), "inner"
    ).drop("relation_id")


def areas_union(poi_ways_df: DataFrame, poi_relations_df: DataFrame) -> DataFrame:
    """Way-derived + relation-derived areas as one frame with uniform
    (id, …, tags, area_m2, centroid, area_src) columns — the engine's
    shape of the reference's single ways table fed by both osmium area
    sources. Column-aligned union: no shuffle."""
    w = poi_ways_df.select(
        "id",
        "version",
        "user_id",
        "tstamp",
        "changeset_id",
        "tags",
        F.lit(1).alias("n_outer"),
        F.lit(0).alias("n_inner"),
        "area_m2",
        "centroid",
        F.lit("way").alias("area_src"),
    )
    return w.unionByName(poi_relations_df)


def areas_to_centroids(areas_df: DataFrame, settings: Settings) -> DataFrame:
    """O18 over the unified area stream: hole-aware area ≤ threshold →
    point POI at the hole-aware centroid, id shifted into the +36e9
    space (ways_to_centroids.sql:4). A donut whose OUTER ring exceeds
    the threshold but whose net area does not IS converted — the exact
    case a single-ring engine gets wrong."""
    return (
        areas_df.filter(F.col("area_m2") <= F.lit(settings.centroid_area_m2))
        .select(
            (F.col("id") + F.lit(settings.centroid_id_offset)).alias("id"),
            "version",
            "user_id",
            "tstamp",
            "changeset_id",
            "tags",
            F.col("centroid.lon").alias("lon"),
            F.col("centroid.lat").alias("lat"),
            "area_m2",
            "area_src",
        )
    )
