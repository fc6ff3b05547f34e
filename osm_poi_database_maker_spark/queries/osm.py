"""Reference-parity pipeline queries, driver-checked.

The driver's fixtures carry no OSM-shaped tables, so these queries run the
REAL pipeline (osm_poi_database_maker_spark.pipeline) over the
deterministic fixtures in :mod:`..osm_fixtures` — and their oracles embed
the SAME rows as inline VALUES, re-implementing the reference semantics in
pure DuckDB SQL. Full differential coverage of the cascade (O3–O8, O11,
O13, O14), relational ring assembly (O10/O17), and the centroid
post-processing (O18), including every FIXTURES.md Part B edge case.

``sf_dir`` is accepted and ignored — the pipeline fixture is scale-fixed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import geo, osm_fixtures as fx
from ..pipeline import build_toi_dim, poi_ways, poi_nodes, ways_to_centroids
from ..settings import Settings

SETTINGS = Settings(
    exclude=fx.EXCLUDE,
    trim_tags=fx.TRIM,
    min_occurrences=fx.MIN_OCCURRENCES,
    toi_top_values=fx.TOI_TOP,
)

_R2_HALF = geo.EARTH_RADIUS_M * geo.EARTH_RADIUS_M / 2

# --- shared oracle fragments ----------------------------------------------

_DIM_SQL = f"""
  SELECT key, value, "count" FROM (
    SELECT key, value, "count", in_wiki,
           row_number() OVER (PARTITION BY key ORDER BY "count" DESC, value ASC) AS rk
    FROM ({fx.taginfo_values_sql()})
  ) WHERE rk <= {fx.TOI_TOP} AND in_wiki AND value NOT LIKE '%;%'
"""


def _hstore_sql(json_col: str, trim: tuple[str, ...]) -> str:
    trim_list = ", ".join(f"'{t}'" for t in trim)
    esc = (
        "replace(replace(regexp_replace({v}, '[\\n\\r\\t]', ' ', 'g'), "
        "'\\', '\\\\'), '\"', '\\\"')"
    )
    key_esc = esc.format(v="k")
    val_esc = esc.format(v=f"json_extract_string({json_col}, '$.\"' || k || '\"')")
    return f"""
      list_aggregate(
        list_transform(
          list_sort(list_filter(json_keys({json_col}), k -> k NOT IN ({trim_list}))),
          k -> '"' || {key_esc} || '"=>"' || {val_esc} || '"'
        ), 'string_agg', ','
      )
    """


def _cascade_where(json_col: str) -> str:
    """O3 + O5 (fixture exclude tuple: amenity=cafe AND access=private)."""
    return f"""
      {json_col} <> '{{}}'
      AND NOT coalesce(json_extract_string({json_col}, '$.amenity') = 'cafe'
                       AND json_extract_string({json_col}, '$.access') = 'private', FALSE)
    """


def _matched_sql(src: str, json_col: str = "tags_json") -> str:
    """O6: ids whose tag map hits the thresholded dimension."""
    return f"""
  kv AS (
    SELECT id, k, json_extract_string({json_col}, '$."' || k || '"') AS v
    FROM (SELECT id, {json_col}, unnest(json_keys({json_col})) AS k FROM {src})
  ),
  matched AS (
    SELECT DISTINCT kv.id FROM kv
    JOIN dim ON kv.k = dim.key AND kv.v = dim.value
    WHERE dim."count" > {fx.MIN_OCCURRENCES}
  )
"""


# --- O14: TOI dimension build ----------------------------------------------

def q_osm_toi_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_toi_dim(fx.taginfo_df(spark), SETTINGS)


ORACLE_TOI_DIM = _DIM_SQL


# --- node branch: full cascade ---------------------------------------------

def q_osm_poi_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = poi_nodes(fx.nodes_df(spark), fx.taginfo_df(spark), SETTINGS)
    return out.select("id", "tstamp", "tags_hstore", "lon", "lat")


ORACLE_POI_NODES = f"""
WITH raw AS ({fx.nodes_values_sql()}),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY id ORDER BY version DESC, tstamp DESC) AS rn
    FROM raw
  ) WHERE rn = 1
),
dim AS ({_DIM_SQL}),
{_matched_sql("dedup")}
SELECT d.id,
       strftime(d.tstamp, '%Y-%m-%d %H:%M:%S') AS tstamp,
       {_hstore_sql("d.tags_json", fx.TRIM)} AS tags_hstore,
       d.lon, d.lat
FROM dedup d
WHERE d.geom_valid AND d.lon IS NOT NULL AND d.lat IS NOT NULL
  AND {_cascade_where("d.tags_json")}
  AND d.id IN (SELECT id FROM matched)
"""


# --- O10/O17: relational ring assembly -------------------------------------

def q_osm_way_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    wn, nd = fx.way_nodes_and_nodes_df(spark)
    rings = geo.assemble_rings(wn, nd)
    return rings.select(
        "way_id",
        F.size("ring").cast("long").alias("n_points"),
        "is_closed",
        "has_missing_node",
    )


ORACLE_WAY_ASSEMBLY = f"""
WITH wn AS ({fx.way_nodes_values_sql()}),
nd AS ({fx.ring_nodes_values_sql()}),
j AS (
  SELECT wn.way_id, wn.sequence_id, nd.lon, nd.lat
  FROM wn LEFT JOIN nd ON wn.node_id = nd.id
),
r AS (
  SELECT way_id,
         list(struct_pack(lon := lon, lat := lat) ORDER BY sequence_id) AS ring,
         max(CASE WHEN lon IS NULL THEN 1 ELSE 0 END) AS missing
  FROM j GROUP BY way_id
)
SELECT way_id,
       len(ring) AS n_points,
       (len(ring) >= 4 AND ring[1].lon = ring[-1].lon
        AND ring[1].lat = ring[-1].lat) AS is_closed,
       missing = 1 AS has_missing_node
FROM r
"""


# --- O18: ways → centroids --------------------------------------------------

def q_osm_ways_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    pw = poi_ways(fx.ways_df(spark), fx.taginfo_df(spark), SETTINGS)
    cent = ways_to_centroids(pw, SETTINGS)
    return cent.select(
        "id",
        F.round("lon", 7).alias("lon"),
        F.round("lat", 7).alias("lat"),
        F.round("area_m2", 2).alias("area_m2"),
    )


_AREA_TERMS = (
    "list_transform(range(1, len(ring)), i -> "
    "(radians(ring[i+1].lon) - radians(ring[i].lon)) * "
    "(sin(radians(ring[i].lat)) + sin(radians(ring[i+1].lat))))"
)
_CROSS = "(ring[i].lon * ring[i+1].lat - ring[i+1].lon * ring[i].lat)"

ORACLE_WAYS_CENTROIDS = f"""
WITH w AS ({fx.ways_values_sql()}),
dim AS ({_DIM_SQL}),
{_matched_sql("w")},
f AS (
  SELECT * FROM w
  WHERE geom_valid AND ring IS NOT NULL AND len(ring) >= 4
    AND ring[1].lon = ring[-1].lon AND ring[1].lat = ring[-1].lat
    AND {_cascade_where("tags_json")}
    AND id IN (SELECT id FROM matched)
),
meas AS (
  SELECT id, ring,
    abs(list_sum({_AREA_TERMS})) * {_R2_HALF!r} AS area_m2,
    list_sum(list_transform(range(1, len(ring)), i -> {_CROSS})) AS a2,
    list_sum(list_transform(range(1, len(ring)),
             i -> (ring[i].lon + ring[i+1].lon) * {_CROSS})) AS cx,
    list_sum(list_transform(range(1, len(ring)),
             i -> (ring[i].lat + ring[i+1].lat) * {_CROSS})) AS cy,
    list_sum(list_transform(ring[1:-1], p -> p.lon)) / (len(ring) - 1) AS mean_lon,
    list_sum(list_transform(ring[1:-1], p -> p.lat)) / (len(ring) - 1) AS mean_lat
  FROM f
)
SELECT id + {SETTINGS.centroid_id_offset} AS id,
       round(CASE WHEN abs(a2) < 1e-12 THEN mean_lon ELSE cx / (3 * a2) END, 7) AS lon,
       round(CASE WHEN abs(a2) < 1e-12 THEN mean_lat ELSE cy / (3 * a2) END, 7) AS lat,
       round(area_m2, 2) AS area_m2
FROM meas
WHERE area_m2 <= {SETTINGS.centroid_area_m2!r}
"""


# --- O19: spatial bucketing + bbox pruning ---------------------------------

_BBOX = (5.115, 52.105, 5.225, 52.225)  # lon_min, lat_min, lon_max, lat_max


def q_osm_spatial_bbox(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bbox query through the spatial bucketing layer (O19,
    schema.sql:264-266): the grid-cell IN-list prunes at the scan, the
    exact bbox predicate trims the residue; the cell id is returned so
    the oracle verifies the quantization itself."""
    from ..spatial import GRID_RES, bbox_filter, grid_cell, with_spatial_keys

    nodes = fx.nodes_df(spark).filter(F.col("lon").isNotNull())
    out = bbox_filter(nodes, *_BBOX)
    return out.select(
        "id", "lon", "lat", grid_cell(F.col("lon"), F.col("lat"), GRID_RES).alias("cell")
    )


_N_GRID = 1 << 12
ORACLE_SPATIAL_BBOX = f"""
WITH raw AS ({fx.nodes_values_sql()}),
cells AS (
  SELECT id, lon, lat,
         greatest(0, least({_N_GRID - 1}, CAST(floor((lon + 180.0) / 360.0 * {_N_GRID}) AS BIGINT))) * {_N_GRID}
         + greatest(0, least({_N_GRID - 1}, CAST(floor((lat + 90.0) / 180.0 * {_N_GRID}) AS BIGINT))) AS cell
  FROM raw WHERE lon IS NOT NULL
)
SELECT id, lon, lat, cell FROM cells
WHERE lon >= {_BBOX[0]} AND lon <= {_BBOX[2]} AND lat >= {_BBOX[1]} AND lat <= {_BBOX[3]}
"""


QUERIES = {
    "osm_toi_dim": q_osm_toi_dim,
    "osm_poi_nodes": q_osm_poi_nodes,
    "osm_way_assembly": q_osm_way_assembly,
    "osm_ways_centroids": q_osm_ways_centroids,
    "osm_spatial_bbox": q_osm_spatial_bbox,
}

ORACLES = {
    "osm_toi_dim": ORACLE_TOI_DIM,
    "osm_poi_nodes": ORACLE_POI_NODES,
    "osm_way_assembly": ORACLE_WAY_ASSEMBLY,
    "osm_ways_centroids": ORACLE_WAYS_CENTROIDS,
    "osm_spatial_bbox": ORACLE_SPATIAL_BBOX,
}
