"""LIVE PostgreSQL COPY round-trip (reference O12, filter.py:33-77).

Previous rounds carried this as env-blocked (no driver library). The
sandbox ships the server binaries + psql + the hstore contrib extension,
so the full chain is now exercised against a REAL server: pipeline
output → COPY text rendering (O11) → psql COPY FROM STDIN per partition
(O12, the reference's bulk-load path) → read back through PostgreSQL's
OWN hstore parser and compare against the source tag maps — the
strongest possible validation of the trim/escape chain (O8): golden
files pin the bytes; this pins the SEMANTICS a real server assigns them.

Skips cleanly where initdb/pg_ctl/psql or the postgres user are absent.
"""

from __future__ import annotations

import shutil
import subprocess
import tempfile

import pytest


def _psql(sock: str, sql: str, db: str = "postgres") -> str:
    proc = subprocess.run(
        ["psql", "-h", sock, "-U", "postgres", "-d", db,
         "-v", "ON_ERROR_STOP=1", "-tA", "-c", sql],
        capture_output=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr.decode()[:800])
    return proc.stdout.decode()


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    for binname in ("initdb", "pg_ctl", "psql", "su"):
        if shutil.which(binname) is None:
            pytest.skip(f"{binname} not available")
    probe = subprocess.run(
        ["su", "postgres", "-c", "true"], capture_output=True, cwd="/tmp"
    )
    if probe.returncode != 0:
        pytest.skip("cannot run commands as the postgres user")
    base = tempfile.mkdtemp(prefix="ospdms_pg_")
    subprocess.run(["chown", "postgres", base], check=True)
    rc = subprocess.run(
        ["su", "postgres", "-c", f"initdb -D {base}/data -U postgres --no-sync"],
        capture_output=True, cwd="/tmp",
    )
    if rc.returncode != 0:
        pytest.skip(f"initdb failed: {rc.stderr.decode()[:200]}")
    start = subprocess.run(
        ["su", "postgres", "-c",
         f"pg_ctl -D {base}/data -o \"-c listen_addresses='' "
         f"-c unix_socket_directories={base}\" -l {base}/pg.log start"],
        capture_output=True, cwd="/tmp",
    )
    if start.returncode != 0:
        pytest.skip(f"pg_ctl start failed: {start.stderr.decode()[:200]}")
    try:
        _psql(base, "CREATE EXTENSION IF NOT EXISTS hstore;")
        yield base
    finally:
        subprocess.run(
            ["su", "postgres", "-c", f"pg_ctl -D {base}/data -m immediate stop"],
            capture_output=True, cwd="/tmp",
        )
        shutil.rmtree(base, ignore_errors=True)


def test_copy_roundtrip_nodes_through_real_hstore(pg, spark):
    """EP1 node output COPY-loaded into a real nodes table with a REAL
    hstore column; PostgreSQL's parser must reconstruct the exact tag
    values — including node 14's backslash/quote/newline/tab hell —
    and the NULL-geometry marker must arrive as SQL NULL."""
    from osm_poi_database_maker_spark import osm_fixtures as fx
    from osm_poi_database_maker_spark.pipeline import poi_nodes
    from osm_poi_database_maker_spark.queries.osm import SETTINGS
    from osm_poi_database_maker_spark.sink import (
        NODE_COPY_COLUMNS,
        write_copy_postgres_cli,
    )
    from pyspark.sql import functions as F

    _psql(pg, """
      CREATE TABLE IF NOT EXISTS nodes (
        id bigint, version int, user_id int, tstamp timestamp,
        changeset_id bigint, tags_hstore hstore, geom text);
      TRUNCATE nodes;
    """)
    out = poi_nodes(fx.nodes_df(spark), fx.taginfo_df(spark), SETTINGS)
    # exercise the NULL → \N path too: blank one row's geometry
    out = out.withColumn(
        "geom", F.when(F.col("id") == 12, F.lit(None)).otherwise(F.col("geom"))
    )
    write_copy_postgres_cli(
        out.repartition(4), pg, "postgres", "postgres", "nodes", NODE_COPY_COLUMNS
    )

    n_pg = int(_psql(pg, "SELECT count(*) FROM nodes;").strip())
    rows = out.collect()
    assert n_pg == len(rows)

    # PostgreSQL's own hstore parser must give back the ORIGINAL values
    name14 = _psql(pg, "SELECT tags_hstore -> 'name' FROM nodes WHERE id = 14;")
    assert name14.rstrip("\n") == 'Back\\slash "Quote"'
    # the escape chain NORMALIZES control chars to spaces before the
    # hstore literal (reference filter.py:92-100 does the same), so the
    # server-parsed value is the normalized form — NOT the raw \n\t
    desc14 = _psql(
        pg, r"SELECT tags_hstore -> 'desc' FROM nodes WHERE id = 14;"
    )
    assert desc14 == "line1 line2 end\n"  # psql -tA appends one \n
    # trim keys never reach the server (O8)
    assert _psql(
        pg, "SELECT count(*) FROM nodes WHERE tags_hstore ? 'note' OR tags_hstore ? 'fixme';"
    ).strip() == "0"
    # NULL marker round-trips as SQL NULL, not the string '\N'
    assert _psql(
        pg, "SELECT geom IS NULL FROM nodes WHERE id = 12;"
    ).strip() == "t"
    # dedup rule visible server-side: id 16 arrives once, as version 2
    assert _psql(
        pg, "SELECT version FROM nodes WHERE id = 16;"
    ).strip() == "2"
    # full tag-map equality for every loaded row via hstore → kv dump
    # (node 14 excluded here — its values embed newlines/pipes that break
    # line-oriented psql output; it is byte-checked explicitly above)
    pg_tags = {}
    dump = _psql(
        pg,
        "SELECT id, coalesce((SELECT string_agg(key || '=' || value, ';' "
        "ORDER BY key) FROM each(tags_hstore)), '') FROM nodes "
        "WHERE id <> 14 ORDER BY id;",
    )
    for line in dump.splitlines():
        i, _, kv = line.partition("|")  # psql -tA field separator
        pg_tags[int(i)] = kv
    checked = 0
    for (nid, v, _u, _t, _c, tags, _lon, _lat, _g) in fx.NODES:
        if nid not in pg_tags or nid == 16:
            continue
        expect = ";".join(
            f"{k}={v2}" for k, v2 in sorted(tags.items()) if k not in fx.TRIM
        )
        assert pg_tags[nid] == expect, f"node {nid}: {pg_tags[nid]!r} != {expect!r}"
        checked += 1
    assert checked >= 8  # the whole surviving fixture is server-verified


def test_copy_roundtrip_ways_geom_column_switch(pg, spark):
    """The ways table stores geometry in a ``linestring`` column
    (reference filter.py:43): copy_statement's per-table switch must
    land rows with the right column mapping on a real server."""
    from osm_poi_database_maker_spark.sink import (
        copy_statement,
        render_copy_rows,
    )

    _psql(pg, """
      CREATE TABLE IF NOT EXISTS ways (
        id bigint, version int, user_id int, tstamp timestamp,
        changeset_id bigint, tags_hstore hstore, linestring text);
      TRUNCATE ways;
    """)
    df = spark.createDataFrame(
        [(100, 1, 201, "2024-01-01 10:30:00", 9101, '"amenity"=>"cafe"', "LINESTRING(0 0,1 1)")],
        "id long, version int, user_id int, tstamp string, changeset_id long, "
        "tags_hstore string, geom string",
    )
    stmt = copy_statement("ways", geom_column="linestring")
    assert "linestring" in stmt and "geom" not in stmt.split("(")[1]
    lines = [r.line for r in render_copy_rows(df).collect()]
    proc = subprocess.run(
        ["psql", "-h", pg, "-U", "postgres", "-d", "postgres",
         "-v", "ON_ERROR_STOP=1", "-c", stmt],
        input=("\n".join(lines) + "\n").encode(),
        capture_output=True,
    )
    assert proc.returncode == 0, proc.stderr.decode()[:400]
    got = _psql(pg, "SELECT linestring, tags_hstore -> 'amenity' FROM ways;")
    assert got.strip() == "LINESTRING(0 0,1 1)|cafe"
