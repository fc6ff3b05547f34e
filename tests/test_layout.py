"""At-rest layout tests: partition pruning must show in the plan and in
the files actually read."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.io import load_table
from osm_poi_database_maker_spark.layout import (
    read_events_day_range,
    write_events_by_day,
    write_embeddings_by_cell,
)
from tests.conftest import SF_SMOKE


def test_events_daily_partition_pruning(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_daily")
    write_events_by_day(events, path)
    days = sorted(d for d in os.listdir(path) if d.startswith("event_date="))
    assert len(days) >= 2, f"fixture spans {days}"
    one_day = days[0].split("=", 1)[1]
    pruned = read_events_day_range(spark, path, one_day, one_day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the scan touches only the one matching directory
    files = {
        os.path.dirname(r.f)
        for r in pruned.withColumn("f", F.input_file_name()).select("f").distinct().collect()
    }
    assert len(files) == 1 and files.pop().endswith(f"event_date={one_day}")
    # and the row count matches an unpruned filter
    expect = events.filter(F.to_date("ts") == one_day).count()
    assert pruned.count() == expect


def test_embeddings_ivf_cell_layout(spark, tmp_path):
    from osm_poi_database_maker_spark.similarity import train_ivf_centroids

    e = load_table(spark, SF_SMOKE, "embeddings")
    cents = train_ivf_centroids(e, n_cells=8)
    path = str(tmp_path / "emb_cells")
    write_embeddings_by_cell(e, path, cents)
    cells = [d for d in os.listdir(path) if d.startswith("ivf_cell=")]
    assert len(cells) >= 2
    back = spark.read.parquet(path)
    assert back.count() == e.count()
    # a probe of one cell reads only that directory
    probe = back.filter(F.col("ivf_cell") == 0)
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan


def test_cell_layout_scan_prunes_partitions(spark):
    """The registered osm_cell_layout_scan query must PROVE the planner
    uses the cell layout (r9 verdict #7): PartitionFilters on the cell
    partition column, lon/lat PushedFilters at the parquet scan, and
    the scan physically reads 2 of the 7 cell directories on disk."""
    from osm_poi_database_maker_spark.queries.osm import (
        cell_layout_path,
        q_osm_cell_layout_scan,
    )

    df = q_osm_cell_layout_scan(spark, SF_SMOKE)
    path = cell_layout_path()
    on_disk = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert len(on_disk) == 7, f"fixture layout drifted: {sorted(on_disk)}"

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    assert "PushedFilters" in plan and "lon" in plan

    read_dirs = {
        os.path.basename(os.path.dirname(r.f))
        for r in df.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    }
    assert read_dirs < on_disk and len(read_dirs) == 2, read_dirs
    assert df.count() == 6
