"""§64x-growth: push the twin-mass asymptote past the point where the
minhash band-bucket cap starts to BIND. At 16× growth (§16x-growth
r12) no bucket reached the 200 cap — twin clusters occupied buckets at
size ~16-64 — so the caps were "pure insurance". At 64× the verbatim
twin clusters are 64-deep and near-dup replica families are larger
still, so this run measures the regime transition: capped vs uncapped
candidate volume, saturated-bucket count, and what it costs the
lossless exact family (through the COLLAPSED path, whose verify is
flat in twin mass and whose output — every true pair, Θ(dup²) of them
— is owed by contract).

Documents-only replica: the measured queries read only the documents
table, so the 64× dir materializes just documents.parquet (64 verbatim
copies, doc_id offset per replica — same growth-mode arithmetic as
scale_experiment.build_replica, inlined to avoid 64×-ing lineitem).

Usage: python tools/scale64_growth_r13.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from scale16_growth_r12 import _minhash_bucket_stats  # noqa: E402
from scale16_r11 import _run, _session  # noqa: E402
from scale_experiment import OFFSET  # noqa: E402

N = 64


def _build_docs_replica(src: str, dst: str) -> None:
    import duckdb

    os.makedirs(dst, exist_ok=True)
    sp = os.path.join(src, "documents.parquet")
    parts = [
        f"SELECT doc_id + {k * OFFSET} AS doc_id, text, lang, source, n_chars"
        f" FROM read_parquet('{sp}')"
        for k in range(N)
    ]
    duckdb.connect().execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO"
        f" '{os.path.join(dst, 'documents.parquet')}' (FORMAT PARQUET)"
    )


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    tag = os.path.basename(os.path.normpath(src))
    dst = f"/tmp/scale64_growth_{tag}_docs"
    if not os.path.isdir(dst):
        print(f"building {N}x documents-only growth replica at {dst} ...")
        _build_docs_replica(src, dst)
    spark = _session()
    from osm_poi_database_maker_spark.queries import QUERIES

    rows = []
    for name in ("doc_softdedup_reweight", "doc_minhash_pairs", "doc_ppjoin_collapsed"):
        _run(spark, name, dst)  # warm-up
        dt, sw = _run(spark, name, dst)
        out = QUERIES[name](spark, dst).count()
        extra = ""
        if name == "doc_minhash_pairs":
            capped, uncapped, saturated = _minhash_bucket_stats(spark, dst)
            extra = (
                f"cand {capped} (uncapped {uncapped}, saturated buckets"
                f" {saturated})"
            )
        rows.append((name, dt, sw, out, extra))
        print(
            f"{name:24s} {N}x  wall {dt:8.2f}s  shufW {sw/1e6:9.2f} MB"
            f"  out {out:10d}  {extra}"
        )

    print("\n| query | mult | wall s | shuffle-write MB | out rows | note |")
    print("|---|---|---|---|---|---|")
    for name, dt, sw, out, extra in rows:
        print(f"| {name} | {N}x | {dt:.2f} | {sw/1e6:.2f} | {out} | {extra} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
