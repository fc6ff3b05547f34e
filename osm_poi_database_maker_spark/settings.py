"""Engine configuration.

Mirrors the reference's configuration surface (``settings_default.py:5-54``
in the reference repo): tag-of-interest keys, the value-count threshold,
skip flags, trim/exclude lists, and the sink batch size — expressed as a
frozen dataclass so a pipeline run is a pure function of (input, Settings).
"""

from __future__ import annotations

from dataclasses import dataclass, field


def _default_keys() -> tuple[str, ...]:
    # Reference settings_default.py:5-14 — the eight tag-of-interest keys.
    return (
        "amenity",
        "shop",
        "tourism",
        "leisure",
        "office",
        "craft",
        "healthcare",
        "emergency",
    )


@dataclass(frozen=True)
class Settings:
    """Parameters of the POI ETL pipeline (reference parity + extensions)."""

    keys: tuple[str, ...] = field(default_factory=_default_keys)
    #: keep a tag value only if its global count exceeds this
    #: (reference settings_default.py:17, applied filter.py:176-180)
    min_occurrences: int = 1000
    #: drop objects lacking a ``name`` tag (reference settings_default.py:27)
    skip_no_name: bool = False
    #: skip way/area processing entirely (reference settings_default.py:23)
    skip_ways: bool = False
    #: tag keys stripped from the output map (reference settings_default.py:32)
    trim_tags: tuple[str, ...] = ("note", "fixme", "source")
    #: drop an object iff its tags are a superset of one of these
    #: ``k=v`` tuples (reference settings_default.py:38, filter.py:170-173)
    exclude: tuple[tuple[str, ...], ...] = ()
    #: sink micro-batch size (reference settings_default.py:50)
    write_after: int = 10_000
    #: top-N values retained per TOI key (reference filter.py:239, rp=100)
    toi_top_values: int = 100
    #: centroid-conversion spheroid-area threshold in m²
    #: (reference ways_to_centroids.sql:4)
    centroid_area_m2: float = 20_000.0
    #: id offset applied to centroid rows (reference ways_to_centroids.sql:2)
    centroid_id_offset: int = 36_000_000_000
