"""OSM XML source: splittable byte-range reader vs the PBF codec.

The differential contract: the same entities serialized to .osm XML and
to .osm.pbf must decode to identical DataFrames through their respective
distributed readers, at every chunk size (boundary rule: a task parses
exactly the elements that start in its range)."""

from __future__ import annotations

import pytest

from osm_poi_database_maker_spark import osm_fixtures as fx
from osm_poi_database_maker_spark import osm_xml, pbf


def _collect_sorted(df):
    rows = [
        (
            r.osm_type,
            r.id,
            r.version,
            r.user_id,
            r.tstamp,
            r.changeset_id,
            tuple(sorted((r.tags or {}).items())),
            None if r.lon is None else round(r.lon, 7),
            None if r.lat is None else round(r.lat, 7),
            tuple(r.refs or []),
            tuple(r.member_ids or []),
            tuple(r.member_types or []),
            tuple(r.member_roles or []),
        )
        for r in df.collect()
    ]
    return sorted(rows)


@pytest.fixture(scope="module")
def xml_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("osmxml") / "fixture.osm")
    osm_xml.write_osm_xml(
        p, nodes=fx.PBF_NODES, ways=fx.PBF_WAYS, relations=fx.PBF_RELATIONS
    )
    return p


def test_xml_matches_pbf(spark, xml_path, tmp_path):
    pbf_path = str(tmp_path / "fixture.osm.pbf")
    pbf.encode_pbf(
        pbf_path,
        nodes=fx.PBF_NODES,
        ways=fx.PBF_WAYS,
        relations=fx.PBF_RELATIONS,
        block_size=5,
    )
    assert _collect_sorted(osm_xml.read_osm_xml(spark, xml_path)) == _collect_sorted(
        pbf.read_pbf(spark, pbf_path)
    )


@pytest.mark.parametrize("chunk", [64, 256, 1 << 20])
def test_xml_chunk_invariance(spark, xml_path, chunk):
    """Every chunk size yields the same entities exactly once — elements
    split across chunk boundaries are neither lost nor duplicated."""
    got = _collect_sorted(osm_xml.read_osm_xml(spark, xml_path, chunk_bytes=chunk))
    assert len(got) == len(fx.PBF_NODES) + len(fx.PBF_WAYS) + len(fx.PBF_RELATIONS)
    ids = [(r[0], r[1]) for r in got]
    assert len(set(ids)) == len(ids)


def test_xml_escaping_roundtrip(spark, tmp_path):
    """Entities / unicode / quotes in tag keys, values and roles survive
    write → split read."""
    p = str(tmp_path / "esc.osm")
    nodes = [
        {
            "id": 1,
            "version": 1,
            "user_id": 9,
            "tstamp_ms": 1_700_000_000_000,
            "changeset_id": 5,
            "tags": {"na<me": 'A & B "quoted" <tag>', "Ω": "päth"},
            "lon": 1.5,
            "lat": -2.5,
        }
    ]
    rels = [
        {
            "id": 2,
            "version": 1,
            "user_id": 9,
            "tstamp_ms": 1_700_000_000_000,
            "changeset_id": 5,
            "tags": {},
            "members": [("node", 1, 'r&"role')],
        }
    ]
    osm_xml.write_osm_xml(p, nodes=nodes, relations=rels)
    rows = {r.id: r for r in osm_xml.read_osm_xml(spark, p, chunk_bytes=48).collect()}
    assert rows[1].tags == {"na<me": 'A & B "quoted" <tag>', "Ω": "päth"}
    assert rows[2].member_roles == ['r&"role']


def test_xml_range_boundary_rule(xml_path):
    """parse_xml_range yields each element exactly once across an
    arbitrary partition of the file into ranges."""
    import os

    size = os.path.getsize(xml_path)
    step = 100
    ids = []
    for s in range(0, size, step):
        ids += [
            (r["osm_type"], r["id"])
            for r in osm_xml.parse_xml_range(xml_path, s, min(s + step, size))
        ]
    assert len(ids) == len(set(ids)) == 13


def test_xml_fuzz_roundtrip(tmp_path):
    """Property fuzz: arbitrary unicode tag keys/values (incl. XML
    metacharacters and whitespace controls) survive write → range-parse
    byte-for-byte, at a chunk size that splits inside elements."""
    from hypothesis import given, settings, strategies as st

    # XML 1.0's legal character domain: C0 controls other than \t\n\r are
    # unrepresentable in the format (the writer replaces them with U+FFFD)
    txt = st.text(
        alphabet=st.characters(
            blacklist_categories=("Cs",),
            blacklist_characters="".join(
                chr(c) for c in range(0x20) if c not in (0x9, 0xA, 0xD)
            ),
            min_codepoint=1,
            max_codepoint=0x2FFF,
        ),
        min_size=0,
        max_size=20,
    )

    @settings(max_examples=30, deadline=None)
    @given(tags=st.dictionaries(txt.filter(bool), txt, min_size=0, max_size=5))
    def run(tags):
        import os

        p = str(tmp_path / f"fuzz_{os.getpid()}.osm")
        nodes = [
            {
                "id": 1,
                "version": 1,
                "user_id": 2,
                "tstamp_ms": 1_700_000_000_000,
                "changeset_id": 3,
                "tags": tags,
                "lon": 4.5,
                "lat": 5.5,
            }
        ]
        osm_xml.write_osm_xml(p, nodes=nodes)
        size = os.path.getsize(p)
        rows = []
        step = 37  # prime, guarantees splits inside the element
        for s in range(0, size, step):
            rows += list(osm_xml.parse_xml_range(p, s, min(s + step, size)))
        assert len(rows) == 1
        assert rows[0]["tags"] == tags

    run()


def test_multi_file_read(spark, tmp_path):
    """Directory / glob / list path specs concatenate extract sets, for
    both wire formats."""
    d = tmp_path / "extracts"
    d.mkdir()
    osm_xml.write_osm_xml(str(d / "a.osm"), nodes=fx.PBF_NODES[:4])
    osm_xml.write_osm_xml(str(d / "b.osm"), nodes=fx.PBF_NODES[4:], ways=fx.PBF_WAYS)
    got = osm_xml.read_osm_xml(spark, str(d))
    assert got.count() == len(fx.PBF_NODES) + len(fx.PBF_WAYS)
    got_glob = osm_xml.read_osm_xml(spark, str(d / "*.osm"))
    assert got_glob.count() == got.count()

    pbf.encode_pbf(str(d / "a.osm.pbf"), nodes=fx.PBF_NODES[:4], block_size=2)
    pbf.encode_pbf(
        str(d / "b.osm.pbf"), nodes=fx.PBF_NODES[4:], ways=fx.PBF_WAYS, block_size=2
    )
    got_pbf = pbf.read_pbf(spark, [str(d / "a.osm.pbf"), str(d / "b.osm.pbf")])
    assert _collect_sorted(got_pbf) == _collect_sorted(got)


def test_xml_external_writer_quirks(spark, tmp_path):
    """Files from OTHER writers: raw '>' inside attribute values (legal
    XML 1.0), comments containing element-lookalikes, and an empty
    directory scan."""
    p = str(tmp_path / "ext.osm")
    with open(p, "w", encoding="utf-8") as f:
        f.write(
            '<?xml version="1.0"?>\n<osm>\n'
            '  <!-- editor header: <node id="99" lat="0" lon="0"/> -->\n'
            '  <node id="1" version="1" lat="1.0" lon="2.0" user="a>b"/>\n'
            '  <node id="2" version="1" lat="3.0" lon="4.0">\n'
            '    <tag k="note" v="5 > 4 and -->-ish text"/>\n'
            "  </node>\n"
            "</osm>\n"
        )
    for chunk in (32, 1 << 20):
        rows = {
            r.id: r
            for r in osm_xml.read_osm_xml(spark, p, chunk_bytes=chunk).collect()
        }
        assert set(rows) == {1, 2}, f"chunk={chunk}"
        assert rows[2].tags == {"note": "5 > 4 and -->-ish text"}

    empty = tmp_path / "none"
    empty.mkdir()
    assert osm_xml.read_osm_xml(spark, str(empty)).count() == 0


def test_write_half_coordinates(spark, tmp_path):
    """A node with only one coordinate set serializes with NO coordinate
    attributes (never lon=\"None\") and reads back as coordinate-less."""
    p = str(tmp_path / "half.osm")
    osm_xml.write_osm_xml(
        p,
        nodes=[
            {
                "id": 1,
                "version": 1,
                "user_id": 1,
                "tstamp_ms": 0,
                "changeset_id": 1,
                "tags": {},
                "lat": 1.0,
                "lon": None,
            }
        ],
    )
    r = osm_xml.read_osm_xml(spark, p).collect()[0]
    assert r.lat is None and r.lon is None
