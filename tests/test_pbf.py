"""Native PBF codec (O1): wire-format round-trips and the distributed
reader. The encoder fabricates real .osm.pbf bytes (zlib blobs,
DenseNodes delta columns, string tables), so these tests exercise the
exact format pyosmium parses for the reference (filter.py:260) without
pyosmium being installed."""

from __future__ import annotations

import zlib

import pytest

from osm_poi_database_maker_spark import pbf
from osm_poi_database_maker_spark.osm_fixtures import (
    PBF_NODES,
    PBF_RELATIONS,
    PBF_WAYS,
)


def _write_fixture(tmp_path, **kw):
    path = str(tmp_path / "fixture.osm.pbf")
    n = pbf.encode_pbf(
        path, nodes=PBF_NODES, ways=PBF_WAYS, relations=PBF_RELATIONS, **kw
    )
    return path, n


# --- pure codec (no Spark) -------------------------------------------------


def test_varint_zigzag_roundtrip():
    for v in [0, 1, 127, 128, 300, 2**31, 2**63 - 1]:
        buf = pbf._enc_uvarint(v)
        got, i = pbf._uvarint(buf, 0)
        assert (got, i) == (v, len(buf))
    for s in [0, -1, 1, -2, 2, -(2**62), 2**62, 4611686018427387903]:
        buf = pbf._enc_zigzag(s)
        got, _ = pbf._uvarint(buf, 0)
        assert pbf._zigzag(got) == s


def test_blob_index_shape(tmp_path):
    path, n_blobs = _write_fixture(tmp_path, block_size=5)
    idx = pbf.scan_blob_index(path)
    assert len(idx) == n_blobs
    assert idx[0][0] == "OSMHeader"
    assert all(t == "OSMData" for (t, _o, _s) in idx[1:])
    # 8 nodes / block 5 -> 2 blobs; 3 ways -> 1; 2 relations -> 1
    assert len(idx) == 1 + 2 + 1 + 1
    # offsets strictly increasing and within file
    import os

    size = os.path.getsize(path)
    for _t, off, ln in idx:
        assert 0 < off and off + ln <= size


def _decode_all(path):
    rows = []
    for btype, off, size in pbf.scan_blob_index(path):
        if btype != "OSMData":
            continue
        with open(path, "rb") as f:
            f.seek(off)
            rows.extend(
                pbf.decode_primitive_block(pbf.decompress_blob(f.read(size)))
            )
    return rows


@pytest.mark.parametrize("compress", [True, False])
def test_codec_roundtrip(tmp_path, compress):
    path, _ = _write_fixture(tmp_path, compress=compress, block_size=5)
    rows = _decode_all(path)
    by_id = {(r["osm_type"], r["id"]): r for r in rows}
    assert len(by_id) == len(PBF_NODES) + len(PBF_WAYS) + len(PBF_RELATIONS)

    for n in PBF_NODES:  # delta-coded ids arrive in written (unsorted) order
        r = by_id[("node", n["id"])]
        assert r["tags"] == n["tags"]
        assert r["version"] == n["version"]
        assert r["user_id"] == n["user_id"]
        assert r["changeset_id"] == n["changeset_id"]
        assert r["tstamp_ms"] == n["tstamp_ms"]
        # 100-nanodegree grid: exact for 7-decimal fixture coords
        assert round(r["lon"], 7) == round(n["lon"], 7)
        assert round(r["lat"], 7) == round(n["lat"], 7)

    for w in PBF_WAYS:
        r = by_id[("way", w["id"])]
        assert r["refs"] == w["refs"]
        assert r["tags"] == w["tags"]
        assert r["tstamp_ms"] == w["tstamp_ms"]

    for rel in PBF_RELATIONS:
        r = by_id[("relation", rel["id"])]
        got = list(zip(r["member_types"], r["member_ids"], r["member_roles"]))
        assert got == rel["members"]
        assert r["tags"] == rel["tags"]


def test_plain_node_decode():
    """Non-dense Node messages (legal, rare) decode through the same
    block scanner: hand-build a group with one plain node."""
    st = pbf._StringTable()
    k, v = st.add("amenity"), st.add("cafe")
    node = (
        pbf._enc_uvarint(1 << 3) + pbf._enc_zigzag(-42)  # sint64 id
        + pbf._enc_field_bytes(2, pbf._enc_uvarint(k))
        + pbf._enc_field_bytes(3, pbf._enc_uvarint(v))
        + pbf._enc_uvarint(8 << 3) + pbf._enc_zigzag(525000000)
        + pbf._enc_uvarint(9 << 3) + pbf._enc_zigzag(-48000000)
    )
    group = pbf._enc_field_bytes(1, node)
    block = (
        pbf._enc_field_bytes(1, st.encode())
        + pbf._enc_field_bytes(2, group)
        + pbf._enc_field_varint(17, 100)
    )
    rows = pbf.decode_primitive_block(block)
    assert len(rows) == 1
    r = rows[0]
    assert r["osm_type"] == "node" and r["id"] == -42
    assert r["tags"] == {"amenity": "cafe"}
    assert round(r["lat"], 7) == 52.5 and round(r["lon"], 7) == -4.8


def test_corrupt_inputs_raise(tmp_path):
    path, _ = _write_fixture(tmp_path)
    data = open(path, "rb").read()
    # truncated mid-blob
    bad = tmp_path / "trunc.pbf"
    bad.write_bytes(data[: len(data) - 3])
    with pytest.raises(ValueError):
        pbf.scan_blob_index(str(bad))
    # corrupted zlib payload
    (_t, off, size) = pbf.scan_blob_index(path)[1]
    blob = data[off : off + size]
    with pytest.raises(zlib.error):
        pbf.decompress_blob(blob[:-4] + b"\x00\x00\x00\x00")
    # raw_size mismatch is detected
    payload = b"x" * 10
    raw_blob = pbf._enc_field_varint(2, 99) + pbf._enc_field_bytes(
        3, zlib.compress(payload)
    )
    with pytest.raises(ValueError, match="raw_size"):
        pbf.decompress_blob(raw_blob)


def test_unsupported_compression_raises():
    blob = pbf._enc_field_bytes(6, b"\x00\x01")  # lz4_data branch
    with pytest.raises(ValueError, match="compression"):
        pbf.decompress_blob(blob)


# --- distributed reader ----------------------------------------------------


def test_read_pbf_distributed(spark, tmp_path):
    path, _ = _write_fixture(tmp_path, block_size=3)  # many small blobs
    df = pbf.read_pbf(spark, path)
    rows = {(r.osm_type, r.id): r for r in df.collect()}
    assert len(rows) == 13
    n = rows[("node", 1003)]
    assert n.tags == {} and round(n.lon, 7) == -73.9897001
    w = rows[("way", 2002)]
    assert w.refs == [1002, 1004, 1005, 1006, 1007] and w.lon is None
    rel = rows[("relation", 3002)]
    assert rel.member_roles == ["", "subarea"]
    assert rel.member_types == ["way", "relation"]
    # decode is shuffle-free: every Exchange in the plan is the tiny
    # round-robin redistribution of (path, offset, size) index triples;
    # no shuffle ever moves decoded entity data
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == plan.count("RoundRobinPartitioning")


def test_pbf_kind_projections(spark, tmp_path):
    path, _ = _write_fixture(tmp_path)
    nodes = pbf.pbf_nodes(spark, path)
    assert nodes.count() == len(PBF_NODES)
    assert dict(nodes.dtypes)["geom_valid"] == "boolean"
    assert all(r.geom_valid for r in nodes.collect())
    ways = pbf.pbf_ways(spark, path)
    assert {r.id for r in ways.collect()} == {w["id"] for w in PBF_WAYS}
    rels = pbf.pbf_relations(spark, path)
    assert rels.count() == len(PBF_RELATIONS)
