"""Per-query driver-evidence staleness: which registry entries most need
a slot in the next round's 50-entry `_VERIFY_FIRST` window.

Scans every CORRECTNESS_r*.json for each query's NEWEST driver row and
prints the registry grouped by that round, stalest first — the input to
the tier-2 rotation (queries/__init__.py). Queries with no driver row
yet (added after the latest driver run) print under "never".

Usage: python tools/staleness.py [max_round_to_list]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_evidence() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        d = json.load(open(path))
        entries = d if isinstance(d, list) else d.get("results", d.get("queries", d))
        names = (
            entries.keys()
            if isinstance(entries, dict)
            else [e.get("name") or e.get("query") for e in entries]
        )
        for n in names:
            latest[n] = max(latest.get(n, 0), rnd)
    return latest


def main() -> int:
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 99
    from osm_poi_database_maker_spark.queries import QUERIES

    latest = latest_evidence()
    by_round: dict[int, list[str]] = {}
    for name in QUERIES:
        by_round.setdefault(latest.get(name, 0), []).append(name)
    for rnd in sorted(by_round):
        if rnd > cap:
            continue
        label = "never" if rnd == 0 else f"r{rnd:02d}"
        names = by_round[rnd]
        print(f"{label}: {len(names)} queries")
        for n in names:
            print(f"  {n}")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head: a clean exit, not an error
        raise SystemExit(0)
