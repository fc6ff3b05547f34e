"""OSM PBF as a first-class Spark data source: ``spark.read.format("osmpbf")``.

PySpark 4's Python DataSource API (pyspark.sql.datasource) lets the PBF
codec plug into Spark's own source machinery instead of the two-step
"build an index DataFrame, mapInPandas the decode" recipe in
:func:`osm_poi_database_maker_spark.pbf.read_pbf`:

* **planning** — the driver-side blob index (header seeks only, no
  payload reads) becomes ``DataSourceReader.partitions()``: one
  ``InputPartition`` per blob group, so Spark's scheduler owns task
  placement, retries, and speculative execution for the decode, and the
  scan composes with everything a real source does (``.filter``/
  ``.select`` stay Catalyst-side on the scan's output).
* **execution** — ``read(partition)`` opens its own file handle and
  decodes its blobs, identical executor work to the mapInPandas path.

Row-tuple handoff (the API also accepts Arrow batches) keeps this path
conversion-free and obviously correct; it is the COMPATIBILITY surface.
``read_pbf`` remains the measured fast path — its Arrow-batched pandas
exchange beats tuple pickling on wide maps/arrays — and both decode
through the same :mod:`.pbf` codec, so the paths cannot drift
semantically (pinned by tests/test_pbf_datasource.py equivalence).

Reference parity: the reference ingests PBF via osmium handlers
(filter.py:260); here the same capability is a registered Spark source:
``spark.dataSource.register(OsmPbfDataSource)`` then
``spark.read.format("osmpbf").load(path)``.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .pbf import (
    _COLS,
    PBF_ENTITY_DDL,
    decode_primitive_block,
    decompress_blob,
    resolve_osm_paths,
    scan_blob_index,
)


class OsmPbfInputPartition(InputPartition):
    """One decode task: a list of (path, offset, datasize) blob triples.
    Carrying triples — never blob bytes — keeps planning payloads tiny
    no matter how large the extract is."""

    def __init__(self, blobs: list[tuple[str, int, int]]):
        self.blobs = blobs


class OsmPbfReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        path = options.get("path")
        if not path:
            raise ValueError("osmpbf source requires a path: .load('<file|dir|glob>')")
        self._path = path
        # blobs per task: small default so fixture-sized files still fan
        # out; a planet-scale read wants larger groups (fewer tasks)
        self._blobs_per_task = int(options.get("blobspertask", "4"))

    def partitions(self) -> list[OsmPbfInputPartition]:
        index = [
            (p, off, size)
            for p in resolve_osm_paths(self._path)
            for (btype, off, size) in scan_blob_index(p)
            if btype == "OSMData"
        ]
        k = max(1, self._blobs_per_task)
        groups = [index[i : i + k] for i in range(0, len(index), k)] or [[]]
        return [OsmPbfInputPartition(g) for g in groups]

    def read(self, partition: OsmPbfInputPartition) -> Iterator[tuple]:
        by_path: dict[str, list[tuple[int, int]]] = {}
        for pth, off, size in partition.blobs:
            by_path.setdefault(pth, []).append((off, size))
        for pth, blobs in by_path.items():
            with open(pth, "rb") as f:
                for off, size in blobs:
                    f.seek(off)
                    raw = decompress_blob(f.read(size))
                    for row in decode_primitive_block(raw):
                        yield _to_tuple(row)


def _to_tuple(row: dict[str, Any]) -> tuple:
    # naive-UTC datetime mirrors read_pbf's pd.to_datetime(unit="ms")
    # exactly, so both paths convert to session time identically
    ms = row.get("tstamp_ms")
    ts = (
        None
        if ms is None
        else _dt.datetime.fromtimestamp(ms / 1000.0, tz=_dt.timezone.utc).replace(
            tzinfo=None
        )
    )
    out = []
    for c in _COLS:
        out.append(ts if c == "tstamp" else row.get(c))
    return tuple(out)


class OsmPbfDataSource(DataSource):
    """``format("osmpbf")``: .load() accepts a file, directory, glob, or
    comma-free path list handled by resolve_osm_paths."""

    @classmethod
    def name(cls) -> str:
        return "osmpbf"

    def schema(self) -> str:
        return PBF_ENTITY_DDL

    def reader(self, schema) -> OsmPbfReader:
        return OsmPbfReader(self.options)


def register(spark) -> None:
    """Idempotent registration helper: after this,
    ``spark.read.format('osmpbf').load(path)`` works in the session."""
    spark.dataSource.register(OsmPbfDataSource)
