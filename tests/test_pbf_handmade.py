"""Differential test of the PBF decoder against a HAND-AUTHORED fixture.

The existing round-trip tests validate ``pbf.read_pbf`` against
``pbf.encode_pbf`` — our decoder against our encoder. This file breaks
that circularity: the fixture bytes here are assembled by a separate,
deliberately minimal protobuf writer written in THIS test straight from
the published specs (OSM PBF fileformat.proto / osmformat.proto and the
protobuf wire format), sharing no code with the package. It also covers
wire shapes our encoder never produces, so a decoder that merely mirrors
our encoder's habits fails here:

* non-default granularity (200) and nonzero lat/lon offsets,
* a plain (non-dense) Node group,
* an uncompressed (raw) data blob next to a zlib one,
* negative ids/coords, negative delta steps, tag-less nodes mid-stream.

Reference semantics: /root/reference/filter.py:260 consumes these same
files via osmium.apply_file; pyosmium is absent in this environment, so
spec-derived bytes are the strongest available third-party stand-in.
"""

from __future__ import annotations

import zlib


# --- protobuf wire-format writers, from the public spec ------------------

def V(n: int) -> bytes:
    """Unsigned varint."""
    assert n >= 0
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def ZZ(n: int) -> bytes:
    """Zigzag-encoded signed varint (sint64)."""
    return V((n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def KEY(fno: int, wt: int) -> bytes:
    return V(fno << 3 | wt)


def VARINT(fno: int, n: int) -> bytes:
    return KEY(fno, 0) + V(n)


def LEN(fno: int, payload: bytes) -> bytes:
    return KEY(fno, 2) + V(len(payload)) + payload


def PACKED_U(fno: int, vals) -> bytes:
    return LEN(fno, b"".join(V(v) for v in vals))


def PACKED_DELTA_ZZ(fno: int, vals) -> bytes:
    out, prev = [], 0
    for v in vals:
        out.append(ZZ(v - prev))
        prev = v
    return LEN(fno, b"".join(out))


def stringtable(strings) -> bytes:
    """StringTable message: repeated bytes s = 1 (index 0 must be "")."""
    assert strings[0] == ""
    return b"".join(LEN(1, s.encode("utf-8")) for s in strings)


def frame(btype: str, block: bytes, compress: bool) -> bytes:
    """length-prefixed BlobHeader + Blob framing (fileformat.proto)."""
    if compress:
        blob = VARINT(2, len(block)) + LEN(3, zlib.compress(block))
    else:
        blob = LEN(1, block)
    header = LEN(1, btype.encode()) + VARINT(3, len(blob))
    return len(header).to_bytes(4, "big") + header + blob


# --- the fixture ----------------------------------------------------------

def handmade_pbf_bytes() -> bytes:
    # header blob
    header_block = LEN(4, b"OsmSchema-V0.6") + LEN(4, b"DenseNodes")

    # block 1: DenseNodes under granularity=200, lat_offset=1e9 (1 degree
    # in nanodegrees), lon_offset=400 — values our encoder never emits.
    st1 = ["", "amenity", "cafe", "name", "Handmade"]
    dense = (
        PACKED_DELTA_ZZ(1, [1001, 999, 2000])  # ids
        + LEN(  # DenseInfo: versions int32 (NOT delta), rest delta
            5,
            PACKED_U(1, [3, 1, 2])
            + PACKED_DELTA_ZZ(2, [1_600_000_000, 1_600_000_100, 1_600_000_050])
            + PACKED_DELTA_ZZ(3, [11, 11, 12])
            + PACKED_DELTA_ZZ(4, [7, 7, 7])
        )
        + PACKED_DELTA_ZZ(8, [252_500_000, -56_250_000, -5_000_000])  # lat raws
        + PACKED_DELTA_ZZ(9, [14_998, -2, 499_999_998])  # lon raws
        + PACKED_U(10, [1, 2, 0, 0, 3, 4, 0])  # {amenity:cafe}, {}, {name:Handmade}
    )
    block1 = (
        LEN(1, stringtable(st1))
        + LEN(2, LEN(2, dense))  # PrimitiveGroup.dense = 2
        + VARINT(17, 200)  # granularity
        + VARINT(19, 1_000_000_000)  # lat_offset
        + VARINT(20, 400)  # lon_offset
    )

    # block 2 (raw blob, default granularity): plain node + way + relation
    st2 = ["", "highway", "residential", "stop", "bus", "route"]
    plain_node = (
        KEY(1, 0) + ZZ(5000)  # Node.id sint64
        + PACKED_U(2, [1])
        + PACKED_U(3, [2])
        + KEY(8, 0) + ZZ(10_000_000)  # lat 1.0
        + KEY(9, 0) + ZZ(-20_000_000)  # lon -2.0
    )
    way = (
        VARINT(1, 600)
        + PACKED_U(2, [1])
        + PACKED_U(3, [2])
        + PACKED_DELTA_ZZ(8, [1001, 999, 2000])  # refs
    )
    relation = (
        VARINT(1, 9000)
        + PACKED_U(2, [5])
        + PACKED_U(3, [4])
        + PACKED_U(8, [3, 0])  # roles_sid: "stop", ""
        + PACKED_DELTA_ZZ(9, [1001, 600])  # memids
        + PACKED_U(10, [0, 1])  # types: NODE, WAY
    )
    block2 = (
        LEN(1, stringtable(st2))
        + LEN(2, LEN(1, plain_node))
        + LEN(2, LEN(3, way))
        + LEN(2, LEN(4, relation))
    )

    return (
        frame("OSMHeader", header_block, compress=True)
        + frame("OSMData", block1, compress=True)
        + frame("OSMData", block2, compress=False)  # raw branch
    )


def test_handmade_fixture_decodes_exactly(spark, tmp_path):
    from osm_poi_database_maker_spark.pbf import read_pbf, scan_blob_index

    path = str(tmp_path / "handmade.osm.pbf")
    with open(path, "wb") as f:
        f.write(handmade_pbf_bytes())

    idx = scan_blob_index(path)
    assert [t for t, _, _ in idx] == ["OSMHeader", "OSMData", "OSMData"]

    import datetime as dt

    def wall(epoch_s: int) -> dt.datetime:
        # read_pbf materializes naive UTC wall-clock datetimes
        return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=epoch_s)

    rows = {(r.osm_type, r.id): r for r in read_pbf(spark, path).collect()}
    assert len(rows) == 6

    # dense nodes under shifted/coarse coordinate grid
    a = rows[("node", 1001)]
    assert a.tags == {"amenity": "cafe"}
    assert abs(a.lat - 51.5) < 1e-9 and abs(a.lon - 0.003) < 1e-9
    assert a.version == 3 and a.user_id == 7 and a.changeset_id == 11
    assert a.tstamp == wall(1_600_000_000)
    b = rows[("node", 999)]
    assert b.tags == {} and abs(b.lat - (-10.25)) < 1e-9 and abs(b.lon) < 1e-9
    assert b.tstamp == wall(1_600_000_100) and b.changeset_id == 11
    c = rows[("node", 2000)]
    assert c.tags == {"name": "Handmade"}
    assert abs(c.lat) < 1e-9 and abs(c.lon - 100.0) < 1e-9
    assert c.version == 2 and c.tstamp == wall(1_600_000_050)

    # plain node, default grid
    p = rows[("node", 5000)]
    assert p.tags == {"highway": "residential"}
    assert abs(p.lat - 1.0) < 1e-9 and abs(p.lon - (-2.0)) < 1e-9

    w = rows[("way", 600)]
    assert list(w.refs) == [1001, 999, 2000]
    assert w.tags == {"highway": "residential"}

    r = rows[("relation", 9000)]
    assert r.tags == {"route": "bus"}
    assert list(r.member_ids) == [1001, 600]
    assert list(r.member_roles) == ["stop", ""]
    assert list(r.member_types) == ["node", "way"]


def test_handmade_fixture_matches_package_encoder_reencode(spark, tmp_path):
    """Round-trip the hand-made entities through the PACKAGE encoder and
    decode again: both byte streams (independent writers) must yield the
    identical entity set — a two-implementation differential check."""
    from osm_poi_database_maker_spark.pbf import encode_pbf, read_pbf

    import datetime as dt

    p1 = str(tmp_path / "handmade.osm.pbf")
    with open(p1, "wb") as f:
        f.write(handmade_pbf_bytes())
    first = read_pbf(spark, p1).collect()

    def ms(t) -> int | None:
        if t is None:
            return None
        return int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1000)

    nodes, ways, relations = [], [], []
    for r in first:
        d = {
            "id": r.id,
            "version": r.version,
            "user_id": r.user_id,
            "tstamp_ms": ms(r.tstamp),
            "changeset_id": r.changeset_id,
            "tags": dict(r.tags or {}),
        }
        if r.osm_type == "node":
            nodes.append({**d, "lat": r.lat, "lon": r.lon})
        elif r.osm_type == "way":
            ways.append({**d, "refs": list(r.refs or [])})
        else:
            relations.append(
                {
                    **d,
                    "members": list(
                        zip(r.member_types, r.member_ids, r.member_roles)
                    ),
                }
            )

    p2 = str(tmp_path / "reencoded.osm.pbf")
    encode_pbf(p2, nodes=nodes, ways=ways, relations=relations)
    second = read_pbf(spark, p2).collect()

    def norm(rows):
        # DenseInfo is columnar: the package encoder materializes absent
        # info fields as 0 (the proto default) — coalesce both sides
        return sorted(
            (
                r.osm_type,
                r.id,
                r.version or 0,
                r.user_id or 0,
                ms(r.tstamp) or 0,
                r.changeset_id or 0,
                tuple(sorted((r.tags or {}).items())),
                None if r.lat is None else round(r.lat, 7),
                None if r.lon is None else round(r.lon, 7),
                tuple(r.refs or []),
                tuple(r.member_ids or []),
                tuple(r.member_types or []),
                tuple(r.member_roles or []),
            )
            for r in rows
        )

    assert norm(first) == norm(second)
