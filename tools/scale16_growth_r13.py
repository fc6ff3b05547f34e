"""r12 verdict #6 + #7: 16× GROWTH-mode rows for (a) doc_softdedup_reweight
— the one r12 addition whose 4× ratio rides token volume; growth mode
proves the no-pair-join claim holds where the pair families needed their
caps — and (b) the composed raw-ingest ordering
curation_with_neardup (near-dup removal through the collapsed PPJoin →
curation), measured against the direct-join composition on the same
twin-heavy replicas.

Growth mode (scale_experiment.build_replica mode="growth") replicates
documents VERBATIM: at N× every doc gains N−1 exact twins. softdedup's
claim is that its cost is two data-linear shuffles (shingle-df + cluster
size) with NO pair join, so wall/shuffle must ride token volume (~N)
even as duplicate MASS — the pair families' quadratic driver — explodes.
The composed-ordering claim is that routing the pair join through
ppjoin_pairs_collapsed keeps the whole ingest pipeline near-flat in
duplicate mass, where the direct join owes Θ(dup²) verify work
(measured 1036 s standalone at 16×, SCALE.md §16x-growth r12 table).

Usage: python tools/scale16_growth_r13.py [sf_dir] [--direct16]
  (default /root/testdata/sf0.1; --direct16 also times the direct-join
  composition at 16× — ~20 min of owed quadratic verify work)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale16_r11 import _session, _stages  # noqa: E402
from scale_experiment import build_replica  # noqa: E402


def _timed(spark, make_df):
    """One timed noop-write run of make_df(); returns (sec, shuffle_bytes)."""
    before = {(s["stageId"], s["attemptId"]) for s in _stages(spark)}
    t0 = time.time()
    make_df().write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    sw = sum(
        s.get("shuffleWriteBytes", 0)
        for s in _stages(spark)
        if (s["stageId"], s["attemptId"]) not in before
    )
    return dt, sw


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.1"
    direct16 = "--direct16" in sys.argv
    spark = _session()
    from osm_poi_database_maker_spark.queries import QUERIES
    from osm_poi_database_maker_spark.queries.curation import (
        curation_with_neardup,
    )

    dirs = {1: src}
    tag = os.path.basename(os.path.normpath(src))  # replicas are per-base-SF
    for n in (4, 16):
        dst = f"/tmp/scale16_growth_{tag}_{n}x"
        if not os.path.isdir(dst):
            print(f"building {n}x growth replica at {dst} ...")
            try:
                build_replica(src, dst, n, "growth")
            except Exception:
                shutil.rmtree(dst, ignore_errors=True)
                raise
        dirs[n] = dst

    rows = []

    def record(label, n, make_df):
        _timed(spark, make_df)  # warm-up
        dt, sw = _timed(spark, make_df)
        out = make_df().count()
        rows.append((label, n, dt, sw, out))
        print(f"{label:28s} {n:3d}x  wall {dt:8.2f}s  shufW {sw/1e6:9.2f} MB  out {out:9d}")

    for n, sf_dir in dirs.items():
        record(
            "doc_softdedup_reweight", n,
            lambda sf=sf_dir: QUERIES["doc_softdedup_reweight"](spark, sf),
        )
    for n, sf_dir in dirs.items():
        record(
            "curate_neardup_collapsed", n,
            lambda sf=sf_dir: curation_with_neardup(spark, sf, collapsed=True),
        )
    for n, sf_dir in dirs.items():
        if n == 16 and not direct16:
            print("curate_neardup_direct        16x  SKIPPED (pass --direct16;"
                  " the pair join alone owes ~1036 s, §16x-growth r12)")
            continue
        record(
            "curate_neardup_direct", n,
            lambda sf=sf_dir: curation_with_neardup(spark, sf, collapsed=False),
        )

    print("\n| pipeline | mult | wall s | shuffle-write MB | out rows |")
    print("|---|---|---|---|---|")
    for label, n, dt, sw, out in rows:
        print(f"| {label} | {n}x | {dt:.2f} | {sw/1e6:.2f} | {out} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
