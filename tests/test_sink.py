"""Sink tests: COPY-row rendering golden values, dead-letter, gated deps."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_poi_database_maker_spark import osm_fixtures as fx
from osm_poi_database_maker_spark.pipeline import poi_nodes
from osm_poi_database_maker_spark.queries.osm import SETTINGS
from osm_poi_database_maker_spark.sink import render_copy_rows


def test_render_copy_rows_golden(spark):
    out = poi_nodes(fx.nodes_df(spark), fx.taginfo_df(spark), SETTINGS)
    lines = {l.line.split("\t")[0]: l.line for l in render_copy_rows(out).collect()}
    row1 = lines["1"]
    fields = row1.split("\t")
    assert fields[:5] == ["1", "1", "101", "2023-05-01 10:00:00", "9001"]
    assert fields[5] == '"amenity"=>"cafe","name"=>"Cafe A"'
    assert fields[6].startswith("0101000000")
    # COPY escaping doubles the hstore backslashes (node 14 has \ " in tags)
    assert '\\\\"Quote' in lines["14"] or "\\\\" in lines["14"]
    # exactly one COPY line per kept row, none for dropped/quarantined ids
    assert "15" not in lines and "5" not in lines


def test_copy_escape_literal_chain_golden(spark):
    r"""Byte-level pin of copy_escape (r14 opt: literal replace chain
    replaced the regexp_replace chain — same all-occurrence left-to-right
    semantics): backslash doubles FIRST, so the backslashes introduced by
    the control-char escapes are never re-doubled; every special char and
    the empty string are covered."""
    from osm_poi_database_maker_spark.sink import copy_escape

    rows = [
        ("a\\b", "a\\\\b"),          # backslash doubles
        ("a\tb", "a\\tb"),           # tab -> \t
        ("a\nb", "a\\nb"),           # newline -> \n
        ("a\rb", "a\\rb"),           # CR -> \r
        ("\\\t\n\r", "\\\\\\t\\n\\r"),  # all four stacked
        ("\\t", "\\\\t"),            # literal backslash-t: doubled, t kept
        ("", ""),
        ("plain", "plain"),
    ]
    df = spark.createDataFrame([(s,) for s, _ in rows], "s string")
    got = [r.e for r in df.select(copy_escape(F.col("s")).alias("e")).collect()]
    assert got == [e for _, e in rows]


def test_copy_null_rendering(spark):
    df = spark.createDataFrame(
        [(1, None)], "id long, tags_hstore string"
    )
    line = render_copy_rows(df, ("id", "tags_hstore")).collect()[0].line
    assert line == "1\t\\N"


def test_dead_letter_roundtrip(spark, tmp_path):
    from osm_poi_database_maker_spark.pipeline import quarantined_nodes
    from osm_poi_database_maker_spark.sink import write_dead_letter

    q = quarantined_nodes(fx.nodes_df(spark))
    path = str(tmp_path / "dead_letter")
    write_dead_letter(q.drop("tags"), path)
    back = spark.read.parquet(path)
    assert back.count() == 1 and "_quarantined_at" in back.columns


def test_jdbc_roundtrip_embedded_derby(spark):
    # real JDBC source + sink through the Derby driver Spark ships:
    # write with the reference's WRITE_AFTER batch size, read back, and
    # verify the JDBC scan pushes a predicate down to the database
    from osm_poi_database_maker_spark.sink import write_jdbc

    url = "jdbc:derby:memory:sinktest;create=true"
    df = spark.createDataFrame(
        [(i, f"name{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, val double",
    )
    write_jdbc(df, url, "pois", batchsize=10_000, mode="overwrite")
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "pois")
        .load()
    )
    assert back.count() == 100
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    filtered = back.filter(F.col("id") < 10)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "id" in plan  # predicate reaches the DB
    assert filtered.count() == 10


def test_osm_bridge_spill_schema_is_pinned(spark, tmp_path):
    # a batch of location-less nodes must still write float64 lon/lat
    # (inference would type them null and break schema merge on read)
    import datetime as dt

    from osm_poi_database_maker_spark.osm_source import NODE_SCHEMA_DDL, _rows_to_parquet

    rows = [
        {
            "id": i,
            "version": 1,
            "user_id": 7,
            "tstamp": dt.datetime(2024, 1, 1),
            "changeset_id": 5,
            "tags": {"amenity": "cafe"},
            "lon": None,
            "lat": None,
            "geom_valid": False,
        }
        for i in range(3)
    ]
    p = str(tmp_path / "nodes_00000.parquet")
    _rows_to_parquet(rows, p, "nodes")
    back = spark.read.parquet(p)
    expect = dict(spark.createDataFrame([], NODE_SCHEMA_DDL).dtypes)
    # Arrow timestamp("us") reads back as TIMESTAMP_NTZ — the faithful
    # mapping of the reference's `timestamp without time zone`
    expect["tstamp"] = "timestamp_ntz"
    assert dict(back.dtypes) == expect
    assert back.count() == 3


def test_merge_upsert_keeps_latest_version(spark, tmp_path):
    from osm_poi_database_maker_spark.sink import merge_upsert

    path = str(tmp_path / "target")
    v1 = spark.createDataFrame(
        [(1, 1, "2024-01-01", "a"), (2, 1, "2024-01-01", "b")],
        "id long, version int, tstamp string, payload string",
    )
    merge_upsert(spark, path, v1)  # bootstrap: no existing target
    updates = spark.createDataFrame(
        [(2, 2, "2024-02-01", "b2"), (3, 1, "2024-02-01", "c")],
        "id long, version int, tstamp string, payload string",
    )
    merge_upsert(spark, path, updates)
    rows = {r.id: (r.version, r.payload) for r in spark.read.parquet(path).collect()}
    assert rows == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c")}
    # idempotent: replaying the same updates changes nothing
    merge_upsert(spark, path, updates)
    again = {r.id: (r.version, r.payload) for r in spark.read.parquet(path).collect()}
    assert again == rows
    # same-version correction: the UPDATES side wins version ties
    fix = spark.createDataFrame(
        [(2, 2, "2024-02-01", "b2-fixed")],
        "id long, version int, tstamp string, payload string",
    )
    merge_upsert(spark, path, fix)
    assert {
        r.id: r.payload for r in spark.read.parquet(path).collect()
    }[2] == "b2-fixed"
    # schema drift must raise, never silently wipe history
    import pytest as _pytest

    drifted = spark.createDataFrame([(9, 1, "2024-03-01")], "id long, version int, tstamp string")
    with _pytest.raises(Exception):
        merge_upsert(spark, path, drifted)
    assert spark.read.parquet(path).count() == 3  # table untouched


def test_merge_upsert_recovers_legacy_protocol_remnants(spark, tmp_path):
    """A crash under an OLDER build's swap protocol: `target.old` with
    `target` missing is a crashed swap mid-rename, NOT an absent table —
    treating it as absent would rebuild from updates alone and silently
    drop history. Recovery is ROLL-FORWARD-ONLY for the legacy name:
    a `.old` (or legacy staging dir) sitting beside a HEALTHY target is
    indistinguishable from a user's manual backup and must never be
    deleted."""
    import os

    from osm_poi_database_maker_spark.sink import merge_upsert

    schema = "id long, version int, tstamp string, payload string"
    path = str(tmp_path / "target")
    history = spark.createDataFrame([(1, 1, "2024-01-01", "a")], schema)
    merge_upsert(spark, path, history)
    # simulate the legacy crash window: target renamed away, plus stray
    # legacy staging dirs from interrupted write and compaction
    os.rename(path, path + ".old")
    for stray in (".staging", ".__compacting__"):
        spark.createDataFrame([(9, 9, "x", "junk")], schema).write.parquet(path + stray)
    updates = spark.createDataFrame([(2, 1, "2024-02-01", "b")], schema)
    merge_upsert(spark, path, updates)
    rows = {r.id: r.payload for r in spark.read.parquet(path).collect()}
    assert rows == {1: "a", 2: "b"}  # history survived the legacy crash
    assert not os.path.exists(path + ".old")  # rolled forward into place
    for stray in (".staging", ".__compacting__"):
        # the corroborating remnants are CONSUMED with the recovery —
        # renamed aside (data preserved for inspection), so the crash
        # signature can never later vouch for a user's manual backup
        # (r6 advice)
        assert not os.path.exists(path + stray)
        assert os.path.exists(path + stray + ".__recovered__")

    # conservative side: a .old backup beside a healthy target survives
    os.rename(path + ".staging.__recovered__", path + ".old")  # "user backup"
    backup_rows = spark.read.parquet(path + ".old").count()
    merge_upsert(spark, path, spark.createDataFrame([(3, 1, "2024-03-01", "c")], schema))
    assert os.path.exists(path + ".old")
    assert spark.read.parquet(path + ".old").count() == backup_rows
    assert {r.id for r in spark.read.parquet(path).collect()} == {1, 2, 3}

    # user deliberately deletes the table but keeps their .old backup:
    # the staging remnants were consumed by the earlier recovery (a
    # `*.__recovered__` dir is NOT crash evidence — it stays on disk
    # here to prove that), so the backup must NOT be promoted and
    # consumed by the next merge (r5+r6 advice); the merge starts fresh.
    import shutil

    shutil.rmtree(path)
    backup_rows = spark.read.parquet(path + ".old").count()
    merge_upsert(spark, path, spark.createDataFrame([(7, 1, "2024-04-01", "g")], schema))
    assert os.path.exists(path + ".old")  # backup preserved by name
    assert spark.read.parquet(path + ".old").count() == backup_rows
    assert {r.id for r in spark.read.parquet(path).collect()} == {7}


def test_osm_bridge_requires_osmium():
    from osm_poi_database_maker_spark.osm_source import pbf_to_parquet

    with pytest.raises(ImportError, match="pyosmium is required"):
        pbf_to_parquet("/nonexistent.pbf", "/tmp/out")


def _parse_hstore(s: str) -> dict:
    """A real hstore input-grammar parser (the quoted-element subset
    PostgreSQL accepts: '"k" => "v"' items, comma-separated, backslash
    escapes inside quotes, arbitrary whitespace between tokens) — the
    adversarial check that render_copy_rows output would survive an
    actual `COPY ... (tags hstore)` ingest (reference filter.py:44-57)."""
    out, i, n = {}, 0, len(s)

    def skip_ws(i):
        while i < n and s[i] in " \t":
            i += 1
        return i

    def quoted(i):
        assert s[i] == '"', f"expected quote at {i}: {s[i:]}"
        i += 1
        buf = []
        while True:
            c = s[i]
            if c == "\\":
                assert s[i + 1] in ('"', "\\"), "invalid escape"
                buf.append(s[i + 1])
                i += 2
            elif c == '"':
                return "".join(buf), i + 1
            else:
                buf.append(c)
                i += 1

    while i < n:
        i = skip_ws(i)
        k, i = quoted(i)
        i = skip_ws(i)
        assert s[i : i + 2] == "=>", f"expected => at {i}"
        i = skip_ws(i + 2)
        v, i = quoted(i)
        assert k not in out, "duplicate hstore key"
        out[k] = v
        i = skip_ws(i)
        if i < n:
            assert s[i] == ","
            i += 1
    return out


def _copy_unescape(field: str):
    """COPY text-format field decoder (the server's side of FORMAT text)."""
    if field == "\\N":
        return None
    out, i = [], 0
    esc = {"t": "\t", "n": "\n", "r": "\r", "\\": "\\"}
    while i < len(field):
        if field[i] == "\\":
            out.append(esc[field[i + 1]])
            i += 2
        else:
            out.append(field[i])
            i += 1
    return "".join(out)


def test_hstore_copy_adversarial_roundtrip(spark):
    """COPY line -> COPY unescape -> hstore grammar parse must recover
    the original tag map exactly (modulo the reference sanitizer's
    control-char -> space normalization, filter.py:92-100), for tag
    maps full of grammar metacharacters."""
    from osm_poi_database_maker_spark.ops.tags import hstore_literal
    from osm_poi_database_maker_spark.sink import render_copy_rows

    cases = [
        {"a\\b": 'c"d', "plain": "v"},
        {"k,1": "v=>2", "=>": ","},
        {"tab\there": "nl\nthere", "cr\rkey": "ok"},
        {'"quoted"': "\\\\double", "back\\": '\\"mix'},
        {"": "empty key", "empty val": ""},
        {"ünïcode": "✓", "emoji": "\U0001f600"},
    ]
    df = spark.createDataFrame(
        [(i, m) for i, m in enumerate(cases)], "id long, tags map<string,string>"
    )
    rendered = df.select(
        "id",
        hstore_literal(F.col("tags")).alias("tags_hstore"),
        F.lit(None).cast("string").alias("geom"),
    )
    lines = {
        int(line.split("\t", 1)[0]): line
        for line in (
            r.line
            for r in render_copy_rows(rendered, ("id", "tags_hstore", "geom")).collect()
        )
    }
    for i, tags in enumerate(cases):
        fields = lines[i].split("\t")
        assert len(fields) == 3 and _copy_unescape(fields[2]) is None
        got = _parse_hstore(_copy_unescape(fields[1]))
        import re

        want = {
            re.sub("[\n\r\t]", " ", k): re.sub("[\n\r\t]", " ", v)
            for k, v in tags.items()
        }
        assert got == want, f"case {i}: {got} != {want}"


def test_compact_parquet_small_files(spark, tmp_path):
    """200 tiny files compact to the byte-sized file count with identical
    data; ordered compaction clusters rows so later scans can min/max
    prune on the sort key."""
    from osm_poi_database_maker_spark.sink import compact_parquet

    path = str(tmp_path / "frag")
    df = spark.range(0, 2000).withColumn("v", F.col("id") * 2)
    df.repartition(200).write.parquet(path)
    import glob

    n_before = len(glob.glob(f"{path}/*.parquet"))
    assert n_before >= 100  # genuinely fragmented

    stats = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert stats["files_before"] == n_before
    assert stats["files_after"] == 1
    back = spark.read.parquet(path)
    assert back.count() == 2000
    assert back.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(2000))

    # ordered variant: file count derives from bytes, rows arrive sorted
    stats2 = compact_parquet(spark, path, target_file_bytes=1, order_by=("id",))
    assert stats2["files_after"] >= 1
    again = spark.read.parquet(path)
    assert again.count() == 2000


def test_compact_preserves_hive_partitions(spark, tmp_path):
    """Compacting a partitionBy layout keeps the key=value directories
    (and their pruning) instead of silently flattening the table."""
    import glob

    from osm_poi_database_maker_spark.sink import compact_parquet

    path = str(tmp_path / "parts")
    df = spark.range(0, 400).withColumn("bucket", (F.col("id") % 4).cast("int"))
    df.repartition(40).write.partitionBy("bucket").parquet(path)
    before_dirs = sorted(
        p.split("/")[-1] for p in glob.glob(f"{path}/bucket=*")
    )
    assert len(before_dirs) == 4

    compact_parquet(spark, path, target_file_bytes=1 << 30)
    after_dirs = sorted(p.split("/")[-1] for p in glob.glob(f"{path}/bucket=*"))
    assert after_dirs == before_dirs
    back = spark.read.parquet(path)
    assert back.count() == 400
    assert set(back.columns) == {"id", "bucket"}
    assert back.filter(F.col("bucket") == 2).count() == 100


def test_ways_copy_linestring_golden(spark):
    """The ways-table COPY path end-to-end (reference filter.py:43's
    per-table geometry column switch): the issued COPY statement names
    `linestring` where the nodes statement names `geom`, the rendered
    lines' geometry field is valid WKB LINESTRING hex that decodes back
    to the fixture ring, and the hstore field survives the grammar
    re-parse — the same adversarial bar the nodes path passes."""
    import struct

    from osm_poi_database_maker_spark.geo import wkb_linestring_hex
    from osm_poi_database_maker_spark.ops.tags import hstore_literal
    from osm_poi_database_maker_spark.sink import (
        NODE_COPY_COLUMNS,
        WAY_COPY_COLUMNS,
        copy_statement,
    )

    # the statement switch, golden
    assert copy_statement("nodes", NODE_COPY_COLUMNS) == (
        "COPY nodes (id, version, user_id, tstamp, changeset_id, "
        "tags_hstore, geom) FROM STDIN WITH (FORMAT text)"
    )
    assert copy_statement(
        "ways", WAY_COPY_COLUMNS, geom_column="linestring"
    ) == (
        "COPY ways (id, version, user_id, tstamp, changeset_id, "
        "tags_hstore, linestring) FROM STDIN WITH (FORMAT text)"
    )

    ways = fx.ways_df(spark)
    rendered = ways.select(
        "id",
        "version",
        "user_id",
        F.date_format("tstamp", "yyyy-MM-dd HH:mm:ss").alias("tstamp"),
        "changeset_id",
        hstore_literal(F.col("tags")).alias("tags_hstore"),
        wkb_linestring_hex(F.col("ring")).alias("geom"),
    )
    lines = {
        line.split("\t")[0]: line
        for line in (
            r.line for r in render_copy_rows(rendered, WAY_COPY_COLUMNS).collect()
        )
    }
    fixture = {w[0]: w for w in fx.WAYS if w[6]}
    assert set(map(str, fixture)) <= set(lines)
    w100 = lines["100"].split("\t")
    assert len(w100) == 7
    assert w100[:5] == ["100", "1", "201", "2023-05-01 10:30:00", "9101"]
    # hstore grammar re-parse (ways side of the adversarial bar)
    assert _parse_hstore(_copy_unescape(w100[5])) == fixture[100][5]
    # WKB LINESTRING decode: 01 | 02000000 | npts | lon/lat f8 pairs
    blob = bytes.fromhex(w100[6])
    endian, gtype, npts = blob[0], *struct.unpack_from("<II", blob, 1)
    assert (endian, gtype) == (1, 2)
    pts = [
        struct.unpack_from("<dd", blob, 9 + 16 * i) for i in range(npts)
    ]
    assert pts == fixture[100][6]
    # rings are closed squares: 5 points, first == last
    assert npts == 5 and pts[0] == pts[-1]


def test_purge_keys_partition_pruned(spark, tmp_path):
    """GDPR purge rewrites only the partitions containing a match:
    untouched partition files keep their exact paths, matched rows are
    gone, an emptied partition is removed, and a rerun is a no-op."""
    import glob
    import os

    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.sink import purge_keys

    path = str(tmp_path / "events_table")
    rows = [
        # day 1: users 1, 2; day 2: user 2 only; day 3: user 3 only
        (1, "d1", 10.0), (2, "d1", 11.0),
        (2, "d2", 12.0),
        (3, "d3", 13.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, day string, value double")
    df.write.partitionBy("day").parquet(path)
    day3_files = sorted(glob.glob(os.path.join(path, "day=d3", "*.parquet")))
    day3_stats = [(f, os.path.getmtime(f)) for f in day3_files]

    tombstones = spark.createDataFrame([(2,)], "user_id long")
    stats = purge_keys(spark, path, tombstones, key="user_id")
    assert stats == {
        "partitions_total": 3,
        "partitions_rewritten": 2,
        "rows_deleted": 2,
    }
    back = spark.read.parquet(path)
    assert sorted(r.user_id for r in back.collect()) == [1, 3]
    # day=d2 held only user 2 -> the partition is gone entirely
    assert not os.path.exists(os.path.join(path, "day=d2"))
    # day=d3 was never touched: same files, same mtimes
    assert [(f, os.path.getmtime(f)) for f in day3_files] == day3_stats

    rerun = purge_keys(spark, path, tombstones, key="user_id")
    assert rerun["partitions_rewritten"] == 0 and rerun["rows_deleted"] == 0


def test_table_maintenance_lifecycle(spark, tmp_path):
    """The sink ops compose into the real maintenance loop: ingest
    (partitioned write) -> merge_upsert corrections -> purge_keys
    deletion batch -> compact_parquet, with row-level state exact at
    every step."""
    from pyspark.sql import functions as F

    from osm_poi_database_maker_spark.sink import (
        compact_parquet,
        merge_upsert,
        purge_keys,
    )

    # merge_upsert rewrites whole tables (dimension-sized contract), so
    # run it on the unpartitioned staging table first, then lay out
    dim = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], "id long, version int, v string"
    )
    merge_upsert(spark, dim, base, key="id", version_cols=("version",))
    fix = spark.createDataFrame([(2, 2, "B")], "id long, version int, v string")
    merge_upsert(spark, dim, fix, key="id", version_cols=("version",))
    merged = spark.read.parquet(dim)
    assert {(r.id, r.v) for r in merged.collect()} == {(1, "a"), (2, "B"), (3, "c")}

    fact = str(tmp_path / "fact")
    merged.withColumn("day", F.concat(F.lit("d"), F.col("id") % 2)).write.partitionBy(
        "day"
    ).parquet(fact)
    stats = purge_keys(spark, fact, spark.createDataFrame([(2,)], "id long"), key="id")
    assert stats["rows_deleted"] == 1
    out = compact_parquet(spark, fact, target_file_bytes=1 << 30)
    assert out["files_after"] <= out["files_before"]
    final = spark.read.parquet(fact)
    assert {r.id for r in final.collect()} == {1, 3}


def test_purge_keys_non_roundtrip_partition_values(spark, tmp_path):
    """Partition values that don't round-trip through Spark's partition
    decoding (string '01' inferred as int 1) must still purge — the
    per-directory decision never compares decoded values to dir names."""
    import os

    from osm_poi_database_maker_spark.sink import purge_keys

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "01", 1.0), (2, "01", 2.0), (2, "02", 3.0), (3, "3000000000000", 4.0)],
        "user_id long, day string, value double",
    ).write.partitionBy("day").parquet(path)
    stats = purge_keys(spark, path, spark.createDataFrame([(2,)], "user_id long"))
    assert stats["rows_deleted"] == 2
    assert stats["partitions_rewritten"] == 2
    assert not os.path.exists(os.path.join(path, "day=02"))
    left = spark.read.parquet(path)
    assert sorted(r.user_id for r in left.collect()) == [1, 3]


def test_purge_keys_crash_recovery_and_stray_dirs(spark, tmp_path):
    """A simulated crash between the two swap renames (partition dir
    moved to .__old__, staging not yet renamed) is rolled back on the
    next run; stray dirs are never counted as partitions."""
    import os
    import shutil

    from osm_poi_database_maker_spark.sink import purge_keys

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "d1", 1.0), (2, "d1", 2.0), (9, "d2", 3.0)],
        "user_id long, day string, value double",
    ).write.partitionBy("day").parquet(path)
    d1 = os.path.join(path, "day=d1")
    # simulate: staging written, target renamed away, then crash
    shutil.copytree(d1, d1 + ".__staging__")
    os.rename(d1, d1 + ".__old__")
    assert not os.path.exists(d1)

    stats = purge_keys(spark, path, spark.createDataFrame([(2,)], "user_id long"))
    # recovery restored day=d1 before purging, then the purge ran
    assert stats == {
        "partitions_total": 2,
        "partitions_rewritten": 1,
        "rows_deleted": 1,
    }
    assert os.path.exists(d1)
    assert not os.path.exists(d1 + ".__old__")
    assert not os.path.exists(d1 + ".__staging__")
    assert sorted(r.user_id for r in spark.read.parquet(path).collect()) == [1, 9]


def test_purge_keys_rejects_multilevel(spark, tmp_path):
    import pytest as _pytest

    from osm_poi_database_maker_spark.sink import purge_keys

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "d1", 10, 1.0)], "user_id long, day string, hour int, value double"
    ).write.partitionBy("day", "hour").parquet(path)
    with _pytest.raises(ValueError, match="multi-level"):
        purge_keys(spark, path, spark.createDataFrame([(1,)], "user_id long"))
