"""Unit tests for the tag-map semantics (SURVEY.md §2.1 fine print)."""

from __future__ import annotations

from pyspark.sql import functions as F

from osm_poi_database_maker_spark.ops import tags as T


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, tags map<string,string>")


def test_empty_tags_filter(spark):
    df = _df(spark, [(1, {}), (2, {"a": "b"})])
    out = df.filter(T.non_empty_tags(F.col("tags"))).select("id").collect()
    assert [r.id for r in out] == [2]


def test_has_tag_key(spark):
    df = _df(spark, [(1, {"name": "x"}), (2, {"amenity": "cafe"})])
    out = df.filter(T.has_tag_key(F.col("tags"), "name")).collect()
    assert [r.id for r in out] == [1]


def test_exclude_superset_semantics(spark):
    # dropped only if tags ⊇ the whole tuple (reference filter.py:172)
    df = _df(
        spark,
        [
            (1, {"amenity": "parking", "access": "private"}),  # full superset -> dropped
            (2, {"amenity": "parking"}),  # partial -> kept
            (3, {"access": "private"}),  # partial -> kept
        ],
    )
    excl = [("amenity=parking", "access=private")]
    kept = df.filter(~T.excluded_by_superset(F.col("tags"), excl)).collect()
    assert sorted(r.id for r in kept) == [2, 3]


def test_trim_tags(spark):
    df = _df(spark, [(1, {"name": "x", "note": "n", "fixme": "f"})])
    out = df.select(T.trim_tag_keys(F.col("tags"), ("note", "fixme")).alias("t")).collect()
    assert out[0].t == {"name": "x"}


def test_hstore_literal_escaping(spark):
    df = _df(spark, [(1, {'k"q': 'v\\x', "nl": "a\nb", "tab": "a\tb"})])
    out = df.select(T.hstore_literal(F.col("tags")).alias("h")).collect()[0].h
    # entries sorted by key; backslash and quote escaped; whitespace -> space
    assert out == '"k\\"q"=>"v\\\\x","nl"=>"a b","tab"=>"a b"'


def test_toi_semi_join_single_row_per_match(spark):
    # an object matching two TOI keys must emit exactly one row
    df = _df(spark, [(1, {"amenity": "cafe", "shop": "bakery"}), (2, {"amenity": "xx"})])
    toi = spark.createDataFrame(
        [("amenity", "cafe", 5000), ("shop", "bakery", 5000), ("amenity", "xx", 10)],
        "key string, value string, count long",
    )
    out = T.toi_semi_join(df, toi, min_occurrences=1000).collect()
    assert len(out) == 1 and out[0].id == 1


def test_toi_match_expr(spark):
    df = _df(spark, [(1, {"amenity": "cafe"}), (2, {"shop": "other"})])
    expr = T.toi_match_expr(F.col("tags"), {"amenity": ["cafe"], "shop": ["bakery"]})
    assert [r.id for r in df.filter(expr).collect()] == [1]
