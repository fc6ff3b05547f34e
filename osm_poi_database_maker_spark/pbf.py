"""Native OSM PBF codec + distributed Spark reader (O1, no pyosmium).

The reference ingests ``.osm.pbf`` through pyosmium's C++ reader
(reference filter.py:213-232, ``apply_file`` at :260) — an inherently
single-process stream. This module implements the public OSM PBF wire
format (the ``fileformat``/``osmformat`` protobuf schemas documented on
the OSM wiki) directly, so the scan itself distributes:

* the **blob index** is built driver-side by reading only the 4-byte
  length + ~16-byte BlobHeader of each blob and seeking past the body —
  O(#blobs) tiny reads (one blob ≈ 8 000 entities, so a 70 GB planet
  file indexes in ~100k seeks, milliseconds of data);
* the **decode** of each independent zlib-compressed PrimitiveBlock is
  fanned out over executors with ``mapInPandas`` — each task opens the
  shared file (local FS / NFS / fuse-mounted object store), seeks to its
  blob offsets, and emits Arrow batches. Throughput scales linearly with
  executors because blobs are self-contained by design (own string
  table, own delta-coding baselines).

This replaces the "bridge" job in :mod:`.osm_source` when pyosmium is
absent (it always is, in this container) and is pure public-format code:
protobuf wire types (varint / zigzag / length-delimited), zlib blobs,
DenseNodes delta columns. An encoder is included so tests and fixtures
can fabricate real PBF bytes — and it doubles as a PBF *sink* for
writing filtered extracts back out.
"""

from __future__ import annotations

import os
import zlib
from typing import Any, Iterable, Iterator

# ---------------------------------------------------------------------------
# protobuf wire primitives
# ---------------------------------------------------------------------------

_MASK64 = (1 << 64) - 1


def _uvarint(buf, i: int) -> tuple[int, int]:
    """Decode one unsigned varint at ``buf[i:]`` → (value, next_index)."""
    shift = 0
    out = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def _zigzag(n: int) -> int:
    """Decode a zigzag-encoded signed integer."""
    return (n >> 1) ^ -(n & 1)


def _iter_fields(buf) -> Iterator[tuple[int, int, Any]]:
    """Scan one protobuf message, yielding (field_no, wire_type, value).

    wire type 0 → int value; 2 → memoryview slice; 1/5 → raw fixed bytes.
    This generic scanner is all the schema knowledge the format needs —
    unknown fields are skipped for free, which is exactly protobuf's
    forward-compatibility contract.
    """
    i, n = 0, len(buf)
    while i < n:
        key, i = _uvarint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _uvarint(buf, i)
        elif wt == 2:
            ln, i = _uvarint(buf, i)
            v = buf[i : i + ln]
            if len(v) != ln:
                raise ValueError("truncated length-delimited field")
            i += ln
        elif wt == 1:
            v = buf[i : i + 8]
            i += 8
        elif wt == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def _packed_uvarints(buf) -> list[int]:
    out = []
    i, n = 0, len(buf)
    while i < n:
        v, i = _uvarint(buf, i)
        out.append(v)
    return out


def _packed_sints_delta(buf) -> list[int]:
    """Packed sint64 with delta coding (DenseNodes / way refs)."""
    out = []
    acc = 0
    for v in _packed_uvarints(buf):
        acc += _zigzag(v)
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# blob layer (fileformat.proto)
# ---------------------------------------------------------------------------


def scan_blob_index(path: str) -> list[tuple[str, int, int]]:
    """Index a PBF file without decoding it: [(blob_type, offset, size)].

    Reads 4 + len(BlobHeader) bytes per blob and seeks past the body, so
    indexing cost is proportional to the blob COUNT, not file size. The
    result is the driver-side work list the distributed reader fans out.
    """
    out = []
    file_size = os.path.getsize(path)
    with open(path, "rb") as f:
        while True:
            hdr_len = f.read(4)
            if not hdr_len:
                return out
            if len(hdr_len) < 4:
                raise ValueError("truncated BlobHeader length")
            hdr = f.read(int.from_bytes(hdr_len, "big"))
            btype, datasize = "", None
            for fno, _wt, v in _iter_fields(memoryview(hdr)):
                if fno == 1:
                    btype = bytes(v).decode("utf-8")
                elif fno == 3:
                    datasize = v
            if datasize is None:
                raise ValueError("BlobHeader missing datasize")
            off = f.tell()
            if off + datasize > file_size:
                raise ValueError("truncated Blob body")
            f.seek(datasize, os.SEEK_CUR)
            out.append((btype, off, datasize))


def decompress_blob(data) -> bytes:
    """Blob message → raw uncompressed payload (raw or zlib branches)."""
    raw = raw_size = zdata = None
    for fno, _wt, v in _iter_fields(memoryview(data)):
        if fno == 1:
            raw = bytes(v)
        elif fno == 2:
            raw_size = v
        elif fno == 3:
            zdata = bytes(v)
        elif fno in (4, 5, 6, 7):
            raise ValueError("unsupported blob compression (lzma/bzip2/lz4/zstd)")
    if raw is not None:
        return raw
    if zdata is None:
        raise ValueError("empty Blob")
    out = zlib.decompress(zdata)
    if raw_size is not None and len(out) != raw_size:
        raise ValueError(f"blob raw_size mismatch: {len(out)} != {raw_size}")
    return out


# ---------------------------------------------------------------------------
# osmformat.proto decode
# ---------------------------------------------------------------------------

MEMBER_TYPES = ("node", "way", "relation")


def _decode_info(buf, stringtable, date_granularity: int) -> dict[str, Any]:
    info = {"version": None, "tstamp_ms": None, "changeset_id": None, "user_id": None}
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            info["version"] = v
        elif fno == 2:
            info["tstamp_ms"] = v * date_granularity
        elif fno == 3:
            info["changeset_id"] = v
        elif fno == 4:
            info["user_id"] = v
    return info


def _tags_from_kv(keys, vals, stringtable) -> dict[str, str]:
    return {stringtable[k]: stringtable[v] for k, v in zip(keys, vals)}


def decode_primitive_block(raw: bytes) -> list[dict[str, Any]]:
    """One PrimitiveBlock → entity rows (unified node/way/relation shape).

    Keys: osm_type, id, version, user_id, tstamp_ms, changeset_id, tags,
    lon, lat, refs, member_ids, member_types, member_roles.
    """
    stringtable: list[str] = []
    groups = []
    granularity, date_granularity = 100, 1000
    lat_offset = lon_offset = 0
    for fno, _wt, v in _iter_fields(memoryview(raw)):
        if fno == 1:
            stringtable = [
                bytes(s).decode("utf-8")
                for f2, _w, s in _iter_fields(v)
                if f2 == 1
            ]
        elif fno == 2:
            groups.append(v)
        elif fno == 17:
            granularity = v
        elif fno == 18:
            date_granularity = v
        elif fno == 19:
            lat_offset = v
        elif fno == 20:
            lon_offset = v

    def coord(off: int, raw_c: int) -> float:
        return 1e-9 * (off + granularity * raw_c)

    rows: list[dict[str, Any]] = []
    for g in groups:
        for fno, _wt, v in _iter_fields(g):
            if fno == 2:  # DenseNodes
                rows.extend(
                    _decode_dense(
                        v, stringtable, coord, lat_offset, lon_offset, date_granularity
                    )
                )
            elif fno == 1:  # plain Node (rare in the wild, legal)
                rows.append(
                    _decode_plain_node(
                        v, stringtable, coord, lat_offset, lon_offset, date_granularity
                    )
                )
            elif fno == 3:  # Way
                rows.append(_decode_way(v, stringtable, date_granularity))
            elif fno == 4:  # Relation
                rows.append(_decode_relation(v, stringtable, date_granularity))
    return rows


def _base_row(osm_type: str) -> dict[str, Any]:
    return {
        "osm_type": osm_type,
        "id": None,
        "version": None,
        "user_id": None,
        "tstamp_ms": None,
        "changeset_id": None,
        "tags": {},
        "lon": None,
        "lat": None,
        "refs": None,
        "member_ids": None,
        "member_types": None,
        "member_roles": None,
    }


def _decode_dense(
    buf, stringtable, coord, lat_offset, lon_offset, date_granularity
) -> list[dict[str, Any]]:
    ids = lats = lons = []
    keys_vals: list[int] = []
    versions: list[int] = []
    tstamps: list[int] = []
    changesets: list[int] = []
    uids: list[int] = []
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            ids = _packed_sints_delta(v)
        elif fno == 5:  # DenseInfo
            for f2, _w, v2 in _iter_fields(v):
                if f2 == 1:
                    versions = _packed_uvarints(v2)  # int32, NOT delta
                elif f2 == 2:
                    tstamps = _packed_sints_delta(v2)
                elif f2 == 3:
                    changesets = _packed_sints_delta(v2)
                elif f2 == 4:
                    uids = _packed_sints_delta(v2)
        elif fno == 8:
            lats = _packed_sints_delta(v)
        elif fno == 9:
            lons = _packed_sints_delta(v)
        elif fno == 10:
            keys_vals = _packed_uvarints(v)

    # keys_vals: interleaved k,v string-table indexes per node, 0-terminated
    tags_per_node: list[dict[str, str]] = []
    cur: dict[str, str] = {}
    i = 0
    while i < len(keys_vals):
        k = keys_vals[i]
        if k == 0:
            tags_per_node.append(cur)
            cur = {}
            i += 1
        else:
            cur[stringtable[k]] = stringtable[keys_vals[i + 1]]
            i += 2
    # an entirely-absent keys_vals means "no node in the block has tags"
    rows = []
    for j, nid in enumerate(ids):
        r = _base_row("node")
        r["id"] = nid
        r["tags"] = tags_per_node[j] if j < len(tags_per_node) else {}
        r["lat"] = coord(lat_offset, lats[j])
        r["lon"] = coord(lon_offset, lons[j])
        if versions:
            r["version"] = versions[j]
        if tstamps:
            r["tstamp_ms"] = tstamps[j] * date_granularity
        if changesets:
            r["changeset_id"] = changesets[j]
        if uids:
            r["user_id"] = uids[j]
        rows.append(r)
    return rows


def _decode_plain_node(
    buf, stringtable, coord, lat_offset, lon_offset, date_granularity
) -> dict[str, Any]:
    r = _base_row("node")
    keys: list[int] = []
    vals: list[int] = []
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            r["id"] = _zigzag(v)  # Node.id is sint64
        elif fno == 2:
            keys = _packed_uvarints(v)
        elif fno == 3:
            vals = _packed_uvarints(v)
        elif fno == 4:
            r.update(_decode_info(v, stringtable, date_granularity))
        elif fno == 8:
            r["lat"] = coord(lat_offset, _zigzag(v))
        elif fno == 9:
            r["lon"] = coord(lon_offset, _zigzag(v))
    r["tags"] = _tags_from_kv(keys, vals, stringtable)
    return r


def _decode_way(buf, stringtable, date_granularity) -> dict[str, Any]:
    r = _base_row("way")
    keys: list[int] = []
    vals: list[int] = []
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            r["id"] = v
        elif fno == 2:
            keys = _packed_uvarints(v)
        elif fno == 3:
            vals = _packed_uvarints(v)
        elif fno == 4:
            r.update(_decode_info(v, stringtable, date_granularity))
        elif fno == 8:
            r["refs"] = _packed_sints_delta(v)
    r["tags"] = _tags_from_kv(keys, vals, stringtable)
    if r["refs"] is None:
        r["refs"] = []
    return r


def _decode_relation(buf, stringtable, date_granularity) -> dict[str, Any]:
    r = _base_row("relation")
    keys: list[int] = []
    vals: list[int] = []
    roles: list[int] = []
    types: list[int] = []
    for fno, _wt, v in _iter_fields(buf):
        if fno == 1:
            r["id"] = v
        elif fno == 2:
            keys = _packed_uvarints(v)
        elif fno == 3:
            vals = _packed_uvarints(v)
        elif fno == 4:
            r.update(_decode_info(v, stringtable, date_granularity))
        elif fno == 8:
            roles = _packed_uvarints(v)
        elif fno == 9:
            r["member_ids"] = _packed_sints_delta(v)
        elif fno == 10:
            types = _packed_uvarints(v)
    r["tags"] = _tags_from_kv(keys, vals, stringtable)
    if r["member_ids"] is None:
        r["member_ids"] = []
    r["member_roles"] = [stringtable[s] for s in roles]
    r["member_types"] = [MEMBER_TYPES[t] for t in types]
    return r


# ---------------------------------------------------------------------------
# encoder (fixtures + PBF sink)
# ---------------------------------------------------------------------------


def _enc_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zigzag(n: int) -> bytes:
    return _enc_uvarint(((n << 1) ^ (n >> 63)) & _MASK64)


def _enc_field_varint(fno: int, v: int) -> bytes:
    return _enc_uvarint(fno << 3) + _enc_uvarint(v)


def _enc_field_bytes(fno: int, b: bytes) -> bytes:
    return _enc_uvarint((fno << 3) | 2) + _enc_uvarint(len(b)) + b


def _enc_packed(fno: int, encoded: Iterable[bytes]) -> bytes:
    payload = b"".join(encoded)
    return _enc_field_bytes(fno, payload) if payload else b""


def _delta_zigzag(vals: Iterable[int]) -> list[bytes]:
    out, prev = [], 0
    for v in vals:
        out.append(_enc_zigzag(v - prev))
        prev = v
    return out


class _StringTable:
    """PBF string table builder — index 0 is reserved (the DenseNodes
    keys_vals delimiter), so real strings start at 1."""

    def __init__(self) -> None:
        self._idx: dict[str, int] = {"": 0}
        self._items: list[str] = [""]

    def add(self, s: str) -> int:
        i = self._idx.get(s)
        if i is None:
            i = len(self._items)
            self._idx[s] = i
            self._items.append(s)
        return i

    def encode(self) -> bytes:
        return b"".join(_enc_field_bytes(1, s.encode("utf-8")) for s in self._items)


def _enc_info(e: dict[str, Any], date_granularity: int) -> bytes:
    out = b""
    if e.get("version") is not None:
        out += _enc_field_varint(1, e["version"])
    if e.get("tstamp_ms") is not None:
        out += _enc_field_varint(2, e["tstamp_ms"] // date_granularity)
    if e.get("changeset_id") is not None:
        out += _enc_field_varint(3, e["changeset_id"])
    if e.get("user_id") is not None:
        out += _enc_field_varint(4, e["user_id"])
    return out


def _enc_kv(tags: dict[str, str], st: _StringTable) -> bytes:
    keys = [_enc_uvarint(st.add(k)) for k in tags]
    vals = [_enc_uvarint(st.add(v)) for v in tags.values()]
    return _enc_packed(2, keys) + _enc_packed(3, vals)


def _encode_block(
    nodes: list[dict[str, Any]],
    ways: list[dict[str, Any]],
    relations: list[dict[str, Any]],
    granularity: int,
    date_granularity: int,
) -> bytes:
    st = _StringTable()
    groups = []

    if nodes:
        ids = _delta_zigzag(n["id"] for n in nodes)
        lats = _delta_zigzag(round(n["lat"] * 1e9) // granularity for n in nodes)
        lons = _delta_zigzag(round(n["lon"] * 1e9) // granularity for n in nodes)
        kv: list[bytes] = []
        for n in nodes:
            for k, v in n.get("tags", {}).items():
                kv.append(_enc_uvarint(st.add(k)))
                kv.append(_enc_uvarint(st.add(v)))
            kv.append(_enc_uvarint(0))
        dense = _enc_packed(1, ids)
        info = (
            _enc_packed(1, (_enc_uvarint(n.get("version") or 0) for n in nodes))
            + _enc_packed(
                2,
                _delta_zigzag(
                    (n.get("tstamp_ms") or 0) // date_granularity for n in nodes
                ),
            )
            + _enc_packed(3, _delta_zigzag(n.get("changeset_id") or 0 for n in nodes))
            + _enc_packed(4, _delta_zigzag(n.get("user_id") or 0 for n in nodes))
        )
        dense += _enc_field_bytes(5, info)
        dense += _enc_packed(8, lats) + _enc_packed(9, lons) + _enc_packed(10, kv)
        groups.append(_enc_field_bytes(2, dense))

    for w in ways:
        body = _enc_field_varint(1, w["id"])
        body += _enc_kv(w.get("tags", {}), st)
        body += _enc_field_bytes(4, _enc_info(w, date_granularity))
        body += _enc_packed(8, _delta_zigzag(w.get("refs", [])))
        groups.append(_enc_field_bytes(3, body))

    for r in relations:
        body = _enc_field_varint(1, r["id"])
        body += _enc_kv(r.get("tags", {}), st)
        body += _enc_field_bytes(4, _enc_info(r, date_granularity))
        members = r.get("members", [])
        body += _enc_packed(8, (_enc_uvarint(st.add(role)) for _t, _i, role in members))
        body += _enc_packed(9, _delta_zigzag(i for _t, i, _r in members))
        body += _enc_packed(
            10, (_enc_uvarint(MEMBER_TYPES.index(t)) for t, _i, _r in members)
        )
        groups.append(_enc_field_bytes(4, body))

    block = _enc_field_bytes(1, st.encode())
    for g in groups:
        block += _enc_field_bytes(2, g)
    block += _enc_field_varint(17, granularity)
    block += _enc_field_varint(18, date_granularity)
    return block


def _enc_blob(btype: str, payload: bytes, compress: bool) -> bytes:
    if compress:
        blob = _enc_field_varint(2, len(payload)) + _enc_field_bytes(
            3, zlib.compress(payload, 6)
        )
    else:
        blob = _enc_field_bytes(1, payload)
    header = _enc_field_bytes(1, btype.encode("utf-8")) + _enc_field_varint(
        3, len(blob)
    )
    return len(header).to_bytes(4, "big") + header + blob


def encode_pbf(
    path: str,
    nodes: Iterable[dict[str, Any]] = (),
    ways: Iterable[dict[str, Any]] = (),
    relations: Iterable[dict[str, Any]] = (),
    granularity: int = 100,
    date_granularity: int = 1000,
    compress: bool = True,
    block_size: int = 8000,
) -> int:
    """Write a well-formed .osm.pbf; returns the number of blobs written.

    Entities are dicts using the same keys the decoder emits (``tags`` a
    dict, relation ``members`` a list of (type, id, role)). Splitting
    into ``block_size``-entity PrimitiveBlocks mirrors the ~8k-entity
    blocks real planet files use and is what makes the reader's
    per-blob parallelism meaningful.
    """
    nodes, ways, relations = list(nodes), list(ways), list(relations)
    header = _enc_field_bytes(4, b"OsmSchema-V0.6") + _enc_field_bytes(
        4, b"DenseNodes"
    ) + _enc_field_bytes(16, b"osm-poi-database-maker-spark")
    blobs = [_enc_blob("OSMHeader", header, compress)]

    def chunks(xs: list) -> Iterator[list]:
        for i in range(0, len(xs), block_size):
            yield xs[i : i + block_size]

    for chunk in chunks(nodes):
        blobs.append(
            _enc_blob(
                "OSMData",
                _encode_block(chunk, [], [], granularity, date_granularity),
                compress,
            )
        )
    for chunk in chunks(ways):
        blobs.append(
            _enc_blob(
                "OSMData",
                _encode_block([], chunk, [], granularity, date_granularity),
                compress,
            )
        )
    for chunk in chunks(relations):
        blobs.append(
            _enc_blob(
                "OSMData",
                _encode_block([], [], chunk, granularity, date_granularity),
                compress,
            )
        )
    with open(path, "wb") as f:
        for b in blobs:
            f.write(b)
    return len(blobs)


# ---------------------------------------------------------------------------
# distributed Spark reader
# ---------------------------------------------------------------------------

PBF_ENTITY_DDL = (
    "osm_type string, id long, version int, user_id int, tstamp timestamp, "
    "changeset_id long, tags map<string,string>, lon double, lat double, "
    "refs array<long>, member_ids array<long>, member_types array<string>, "
    "member_roles array<string>"
)

_COLS = [f.split()[0] for f in PBF_ENTITY_DDL.split(", ")]


def resolve_osm_paths(path, suffixes=(".pbf",)) -> list[str]:
    """Expand a path spec — single file, directory, glob, or explicit
    list — into a sorted file list (extract sets ship as many files)."""
    import glob as _glob

    if isinstance(path, (list, tuple)):
        out: list[str] = []
        for p in path:
            out.extend(resolve_osm_paths(p, suffixes))
        return sorted(dict.fromkeys(out))
    if os.path.isdir(path):
        return sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(tuple(suffixes))
        )
    if any(ch in path for ch in "*?["):
        return sorted(_glob.glob(path))
    return [path]


def read_pbf(spark, path, blobs_per_task: int | None = None):
    """Distributed PBF scan: blob index on the driver, blob decode on
    executors. Returns the unified entity DataFrame (PBF_ENTITY_DDL).
    ``path`` may be one file, a directory, a glob, or a list (extract
    sets ship as many .pbf files; the index concatenates them).

    Scale shape: the index is O(#blobs) driver work — header seeks only,
    no payload reads (for 10⁵+-file layouts, lift the same per-file
    indexing into a first mapInPandas pass over the path list) — and the
    shuffle-free decode is embarrassingly parallel — `repartition` only
    redistributes the tiny (path, offset, size) triples, never blob
    bytes. Filters on osm_type/tags applied by the caller run Spark-side
    after Arrow conversion; at 100 TB you'd persist this scan once as
    partitioned parquet (exactly the reference's
    load-once-into-Postgres shape, filter.py:260) rather than
    re-decoding per query.
    """
    import pandas as pd

    index = [
        (p, off, size)
        for p in resolve_osm_paths(path)
        for (btype, off, size) in scan_blob_index(p)
        if btype == "OSMData"
    ]
    n_tasks = max(
        1,
        min(
            len(index),
            spark.sparkContext.defaultParallelism
            if blobs_per_task is None
            else -(-len(index) // blobs_per_task),
        ),
    )
    idx = spark.createDataFrame(index, "path string, offset long, datasize long")
    idx = idx.repartition(n_tasks)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows: list[dict[str, Any]] = []
            for pth, g in pdf.groupby("path", sort=False):
                with open(pth, "rb") as f:
                    for off, size in zip(g["offset"], g["datasize"]):
                        f.seek(int(off))
                        rows.extend(
                            decode_primitive_block(decompress_blob(f.read(int(size))))
                        )
            out = pd.DataFrame.from_records(rows, columns=["tstamp_ms", *_COLS])
            out["tstamp"] = pd.to_datetime(out["tstamp_ms"], unit="ms")
            yield out[_COLS]

    return idx.mapInPandas(decode, schema=PBF_ENTITY_DDL)


def pbf_nodes(spark, path: str):
    """Node projection of :func:`read_pbf` in the :mod:`.osm_source`
    NODE_SCHEMA_DDL shape (geom_valid mirrors osmium's location check)."""
    from pyspark.sql import functions as F

    df = read_pbf(spark, path)
    return df.filter(F.col("osm_type") == "node").select(
        "id",
        "version",
        "user_id",
        "tstamp",
        "changeset_id",
        "tags",
        "lon",
        "lat",
        (F.col("lon").isNotNull() & F.col("lat").isNotNull()).alias("geom_valid"),
    )


def pbf_ways(spark, path: str):
    from pyspark.sql import functions as F

    df = read_pbf(spark, path)
    return df.filter(F.col("osm_type") == "way").select(
        "id", "version", "user_id", "tstamp", "changeset_id", "tags", "refs"
    )


def pbf_relations(spark, path: str):
    from pyspark.sql import functions as F

    df = read_pbf(spark, path)
    return df.filter(F.col("osm_type") == "relation").select(
        "id",
        "version",
        "user_id",
        "tstamp",
        "changeset_id",
        "tags",
        "member_ids",
        "member_types",
        "member_roles",
    )
