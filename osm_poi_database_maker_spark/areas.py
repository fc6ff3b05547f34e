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

Open-way members are STITCHED end-to-end into rings before validity is
decided (:func:`stitch_member_rings`) — the same segment assembly
osmium performs before building an area. Stitching is per-(relation,
role) chain walking with bounded state (member counts are ~10²,
capped ~10⁴ in OSM), i.e. exactly the "per-partition imperative logic"
case ``applyInPandas`` exists for; relations whose segments cannot
close land in the dead-letter branch with a reason, mirroring the
reference's ``invalid_ways`` log (filter.py:131-137).
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


#: Output schema of :func:`stitch_member_rings` — identical to
#: :func:`member_rings` so stitching composes transparently with
#: :func:`relation_area_stats` / :func:`relation_polys`.
_MRINGS_SCHEMA = (
    "relation_id long, member_id long, role string, sequence_id int, "
    "ring array<struct<lon: double, lat: double>>, "
    "found boolean, ring_ok boolean"
)


def stitch_member_rings(mrings: DataFrame) -> DataFrame:
    """Stitch OPEN member ways into closed rings, per (relation, role) —
    osmium's segment assembly (the step before
    ``WKBFactory.create_multipolygon`` in reference filter.py:128-137)
    as a grouped-map operation.

    Closed members and failure markers pass through untouched. Open
    members are chained endpoint-to-endpoint (matching on exact
    coordinates — OSM segments share literal nodes), reversing segments
    as needed; every segment endpoint must have degree exactly 2, which
    makes the chain successor unique and the result a disjoint union of
    cycles — precisely what osmium accepts. Any leftover or stuck
    segment yields an ``ring_ok=false`` marker row so the relation is
    quarantined, never silently mis-assembled.

    Determinism: chains start at the smallest unused member id and the
    emitted ring starts with that member's stored first point; the
    stitched ring reports the smallest participating member id. Scale:
    state is one relation's members (bounded ~10⁴ in OSM); the groupBy
    shuffles each relation's segments once on relation_id — roles are
    separated INSIDE the group so the downstream per-relation stats
    aggregation reuses this exchange instead of re-shuffling."""
    import pandas as pd

    def _stitch(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.concat(
            [_stitch_role(g) for _, g in pdf.groupby("role", sort=True)],
            ignore_index=True,
        )[
            [
                "relation_id",
                "member_id",
                "role",
                "sequence_id",
                "ring",
                "found",
                "ring_ok",
            ]
        ]

    def _stitch_role(pdf: pd.DataFrame) -> pd.DataFrame:
        keep = pdf[pdf["ring_ok"] | ~pdf["found"]]
        open_segs = pdf[pdf["found"] & ~pdf["ring_ok"]]
        out = [keep]
        if len(open_segs):
            rel = pdf["relation_id"].iloc[0]
            role = pdf["role"].iloc[0]
            segs = {}
            for r in open_segs.itertuples():
                pts = [(p["lon"], p["lat"]) for p in r.ring] if r.ring is not None else []
                segs[r.member_id] = pts
            # endpoint -> [member ids]; degree-2 everywhere or fail
            ends: dict[tuple, list] = {}
            bad = any(len(p) < 2 for p in segs.values())
            for mid, pts in segs.items():
                if len(pts) >= 2:
                    for e in (pts[0], pts[-1]):
                        ends.setdefault(e, []).append(mid)
            bad = bad or any(len(v) != 2 for v in ends.values())
            rows = []
            if not bad:
                unused = dict(segs)
                while unused:
                    start = min(unused)
                    chain = list(unused.pop(start))
                    ok = True
                    while chain[0] != chain[-1]:
                        tip = chain[-1]
                        nxts = [m for m in ends.get(tip, []) if m in unused]
                        if not nxts:
                            ok = False
                            break
                        m = min(nxts)
                        pts = unused.pop(m)
                        chain.extend(pts[1:] if pts[0] == tip else list(reversed(pts))[1:])
                    if not ok or len(chain) < 4:  # degenerate "ring" [A,B,A]
                        bad = True
                        break
                    rows.append(
                        {
                            "relation_id": rel,
                            "member_id": start,
                            "role": role,
                            "sequence_id": 0,
                            "ring": [{"lon": x, "lat": y} for x, y in chain],
                            "found": True,
                            "ring_ok": True,
                        }
                    )
            if bad:
                # one marker row quarantines the relation (open_ring)
                rows = [
                    {
                        "relation_id": rel,
                        "member_id": int(open_segs["member_id"].min()),
                        "role": role,
                        "sequence_id": 0,
                        "ring": None,
                        "found": True,
                        "ring_ok": False,
                    }
                ]
            out.append(pd.DataFrame(rows))
        return pd.concat(out, ignore_index=True)

    return mrings.groupBy("relation_id").applyInPandas(_stitch, schema=_MRINGS_SCHEMA)


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
    stats = relation_area_stats(
        stitch_member_rings(member_rings(relation_members, way_rings))
    )
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
    (missing member, unstitchable open ring, no outer) — the engine's
    analogue of the reference's ``invalid_ways`` warning log
    (filter.py:131-137)."""
    stats = relation_area_stats(
        stitch_member_rings(member_rings(relation_members, way_rings))
    )
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
