"""A/B attribution for the r4->r5 uniform bench drift (VERDICT r5 #1).

Hypothesis under test: the ~1.33x median slowdown on UNCHANGED queries
is per-session accumulation — 162 queries now share one bench
session's JVM (block-manager entries from localCheckpoints, catalog
tables, Derby metastore, GC pressure) — rather than per-operator plan
regressions (explain_audit is clean both rounds).

Design: ONE process, one SparkSession, same machine minute-to-machine
minute:
  Phase FRESH : warm the JVM, run the probe subset (cold+warm, min —
                the same protocol bench.py uses).
  Phase LOADED: run the ENTIRE registry once (the accumulation the
                full bench run creates), then re-run the probe subset
                identically.
If LOADED/FRESH >> 1 for the probe queries, accumulation is the cause
and the fix belongs in bench.py (periodic cache/state clearing or
per-group sessions).  If ~1, the drift is machine-state/environment
between rounds (the verify skill's A/B of an identical commit already
measured ~40% wall drift against the recorded BENCH_r04), and bench
numbers should be compared as scale CURVES, not absolute deltas.

Usage: python tools/bench_drift_ab.py [sf_dir]   (default sf0.1)
Prints one JSON line: {"fresh": {...}, "loaded": {...}, "ratio": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

# the three r4->r5 outliers (+37-39%) plus two mid-drift and two
# near-flat queries, so a uniform cause shows uniformly
PROBES = [
    "dedup_resolve_keep_best",          # 3.48 -> 4.77 (+37%)
    "stream_incremental_dedup",         # 2.47 -> 3.44 (+39%)
    "dedup_resolve_keep_best_minhash",  # 2.25 -> 3.07 (+37%)
    "dedup_incremental_bucketed",       # 3.94 -> 4.47 (+13%); r8 LOADED
                                        # outlier 5.18 -> 19.22 (3.7x)
    "dedup_incremental_minhash",        # r8 LOADED outlier 5.67 -> 10.31
    "pipeline_materialize_training",    # 2.37 -> 2.83 (+20%)
    "join_fk_inner",
    "pred_surface",
]


def run_once(fn, spark):
    t0 = time.perf_counter()
    fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def probe(spark, registry) -> dict[str, float]:
    out = {}
    for name in PROBES:
        cold = run_once(registry[name].fn, spark)
        warm = run_once(registry[name].fn, spark)
        out[name] = round(min(cold, warm), 4)
    return out


def main():
    from nosql_join_stream_spark.queries import REGISTRY
    from nosql_join_stream_spark.session import get_session

    spark = get_session("bench_drift_ab")
    REGISTRY["join_fk_inner"].fn(spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    fresh = probe(spark, REGISTRY)

    t0 = time.perf_counter()
    for name, qd in REGISTRY.items():
        qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    full_pass = round(time.perf_counter() - t0, 1)

    loaded = probe(spark, REGISTRY)

    ratio = {n: round(loaded[n] / fresh[n], 3) for n in PROBES}
    med = sorted(ratio.values())[len(ratio) // 2]
    print(json.dumps({"sf_dir": SF_DIR, "fresh": fresh,
                      "loaded": loaded, "ratio": ratio,
                      "median_ratio": med,
                      "full_registry_pass_sec": full_pass}))


if __name__ == "__main__":
    main()
