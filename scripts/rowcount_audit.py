"""Registry-wide output-degeneracy audit at sf0.1.

Hash equality alone cannot catch a query that is correct but MEANINGLESS
at scale: an absolute selectivity knob that matches 300 rows at sf0.01
and ZERO at sf0.1 hash-matches on both (both engines agree the result is
empty) — found live in round 5 when a `df <= 40 docs` stop-token cap
de-generated exactly that way. This audit runs EVERY registered query at
sf0.1 (10x the driver's compare scale) and reports:

* ``rows`` — result cardinality;
* ``secs`` — wall-clock for build + count (one full execution), the
  poor-man's latency table over the WHOLE registry — catches a
  pathological non-basket query that bench.py's 20-query basket never
  sees;
* ``empty`` — zero rows (almost always a de-generated knob);
* ``all_null`` — every non-key cell NULL in a sampled head;
* ``error`` — the build or execution raised.

Usage: ``python scripts/rowcount_audit.py [sf_dir] [out.json]``
Writes one JSON object keyed by query name and prints a summary. The
committed report is referenced from COVERAGE.md; re-run after adding or
reworking queries.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    out_path = args[1] if len(args) > 1 else "ROWCOUNTS_sf01.json"

    from cudf_spark.queries import REGISTRY
    from cudf_spark.session import get_spark

    spark = get_spark("rowcount_audit")
    report: dict[str, dict] = {}
    flagged: list[str] = []
    for i, (name, q) in enumerate(sorted(REGISTRY.items()), 1):
        entry: dict = {}
        try:
            import time

            t0 = time.perf_counter()
            df = q.build(spark, sf_dir)
            n = df.count()
            entry["secs"] = round(time.perf_counter() - t0, 3)
            entry["rows"] = n
            if n == 0:
                entry["empty"] = True
                flagged.append(name)
            else:
                head = df.limit(50).collect()
                cells = [v for r in head for v in r]
                if cells and all(v is None for v in cells):
                    entry["all_null"] = True
                    flagged.append(name)
        except Exception as exc:  # noqa: BLE001 - audit must not abort
            entry["error"] = f"{type(exc).__name__}: {str(exc)[:160]}"
            flagged.append(name)
        report[name] = entry
        if i % 50 == 0:
            print(f"...{i}/{len(REGISTRY)}", file=sys.stderr, flush=True)
        spark.catalog.clearCache()
        # clearCache() misses localCheckpoint blocks (they are cached
        # RDDs, not SQL cache entries) — lazily-returned DataFrames leak
        # one per materialization site and the accumulation inflated the
        # LATE-alphabet queries' wall-clock in earlier rounds' reports
        # (round 9 root-caused ewma_global_segmented's 28 s entry this
        # way: 1.7 s in a fresh session). Unpersist them between queries
        # so every row measures the query, not the session's history.
        it = spark.sparkContext._jsc.sc().getPersistentRDDs().toList().iterator()
        while it.hasNext():
            it.next()._2().unpersist(False)

    # VERDICT r10 item 5: close the two-protocol artifact split at the
    # entry level — every query with a committed fresh-process min gets
    # that authoritative number injected next to its session reading, so
    # no committed per-query second can be mistaken for a protocol
    # measurement without its cross-reference in the same object.
    fresh_path = os.path.join(os.path.dirname(out_path) or ".",
                              "FRESH_MINS_sf01.json")
    if os.path.exists(fresh_path):
        with open(fresh_path) as fh:
            warm = json.load(fh).get("warm_min", {})
        for name, row in warm.items():
            if name in report and "secs" in row:
                report[name]["fresh_min"] = row["secs"]

    with open(out_path, "w") as fh:
        json.dump(
            {
                "_doc": (
                    "secs are ONE-SESSION sequential readings (alphabetical "
                    "order, shared JVM): a whole-registry degeneracy smoke + "
                    "latency table, NOT a perf claim. The perf protocol is "
                    "fresh-process min-of-N (scripts/time_query.py); its "
                    "committed numbers live in FRESH_MINS_sf01.json — the "
                    "two legitimately disagree by the JIT/session tax "
                    "(VERDICT r09 item 3). Entries carrying a 'fresh_min' "
                    "field repeat that file's authoritative warm min "
                    "in-place (VERDICT r10 item 5)."
                ),
                "sf_dir": sf_dir,
                "n_queries": len(report),
                "queries": report,
            },
            fh,
            indent=0,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "n_queries": len(report),
                "flagged": sorted(flagged),
                "n_flagged": len(flagged),
                "out": out_path,
            }
        )
    )
    spark.stop()
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
