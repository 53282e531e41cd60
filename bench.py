"""Benchmark harness — runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is fully materialized JVM-side via the noop sink (no
driver-side collect, no Python row serde) so we time the real plan:
scan → filter/join/agg → project.

Three timed passes, explicitly labeled (r10 VERDICT lead #3 — cold
numbers leaking into the headline read as an 8× phantom regression):

- COLD   (``queries_cold``): first run of each query.  Includes plan/
  codegen compilation, Python-worker spin-up, and — for the standing-
  artifact queries — the ONE-TIME index/label/snapshot
  materialization that repeat invocations never pay.
- WARM:  second run, immediately after, same loop iteration.
- LOADED (``queries_loaded``): one more run of every query AFTER the
  whole registry has executed, when JIT/codegen warm-up is at its
  deepest (scale-probe r22 protocol).  Compare THESE numbers round
  over round.

The headline ``queries``/``value`` report steady state =
min(warm, loaded).  ``standing_build`` is its own line item: for the
queries with a build-once-per-process artifact gate, cold − warm is
exactly that one-time materialization (plus that query's share of
codegen warm-up — labeled, not hidden in a per-query number).

The driver keeps only a ~2000-char tail of stdout, so the full
207-query dicts can never ride the final line (BENCH_r{1,2,3}.json
all recorded parsed=null from an overflowing tail).  The FULL
artifact — cold/warm/loaded for ALL queries — is therefore written to
``BENCH_full.json`` at the repo root (committed per round; git
history keeps the round-over-round record), and the final stdout line
is a compact summary carrying totals, group subtotals, the 10 slowest
queries (cold AND loaded), the standing-build line item, and a
``full_artifact`` pointer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The committed BENCH_full.json is the round-over-round record for the
# CANONICAL config only (sf0.1, 32 cores).  Any other invocation — a
# smoke at sf0.001, the driver's 8-core scaling run — stamps its config
# into the filename instead of clobbering the committed closing
# artifact (r15: the driver's c8 run overwrote it in the working tree).
_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
_CANONICAL = (os.path.normpath(SF_DIR).endswith("sf0.1") and _CPUS == "32")
_SUFFIX = "" if _CANONICAL else \
    f"_{os.path.basename(os.path.normpath(SF_DIR))}_c{_CPUS}"
FULL_ARTIFACT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f"BENCH_full{_SUFFIX}.json")

# Queries with a build-once-per-process standing artifact (tableExists /
# isdir / snapshot-exists gate inside the query fn): their COLD run
# materializes the artifact, every later run is the pure daily-job cost.
STANDING_BUILD = {
    "dedup_index_delete_probe",      # standing MinHash band index
    "stream_minhash_dedup_ingest",   # standing MinHash band index
    "dedup_incremental_bucketed",    # standing bucketed PPJoin index (r15)
    "dedup_incremental_minhash",     # standing bucketed band index (r15)
    "ann_ivf_partitioned",           # standing cell-partitioned IVF
    "ann_ivf_append_probe",          # standing IVF + append log
    "ann_ivf_filtered",              # standing IVF with metadata
    "mine_bitext_margin_ivf",        # standing IVF for margin kNN (r15)
    "stream_ann_probe",              # standing IVF, streaming probe
    "multimodal_incremental_chunks",  # standing media chunk index
    "dedup_resolve_incremental",     # standing CC label table
    "cdc_upsert_snapshot",           # initial keyed snapshot version
    "drift_psi_standing",            # standing PSI baseline (r15)
    "text_quality_ppl_standing",     # standing unigram word-cost table (r15)
    "export_shard_written",          # one-time sharded corpus export
    "cdc_snapshot_time_travel",      # v1 load + v2 merge, once
    "stream_late_quarantine",        # two-drain staging + routing, once
    "sink_bucketed_join",            # one-time bucketed-table layout
    "sink_zorder_scan",              # one-time z-ordered re-layout
}


def main():
    from nosql_join_stream_spark.session import get_session
    from nosql_join_stream_spark.queries import REGISTRY

    spark = get_session("bench")
    # warm the JVM + parquet footers once with the flagship query
    REGISTRY["join_fk_inner"].fn(spark, SF_DIR).write.format("noop") \
        .mode("overwrite").save()

    cold: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        t0 = time.perf_counter()
        qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 4)
        t0 = time.perf_counter()
        qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 4)

    loaded: dict[str, float] = {}
    for name, qd in REGISTRY.items():
        t0 = time.perf_counter()
        qd.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        loaded[name] = round(time.perf_counter() - t0, 4)

    # External perf anchor (r12 VERDICT lead #3): execution-only
    # Spark-vs-DuckDB medians on the headline TPC-H shapes, embedded so
    # every BENCH_r{N}.json machine-checks the BASELINE.md 2x target.
    from tools.bench_anchor import run_anchor
    anchor = run_anchor(spark, SF_DIR)

    timings = {n: round(min(warm[n], loaded[n]), 4) for n in cold}
    standing_build = {n: round(max(cold[n] - warm[n], 0.0), 4)
                      for n in sorted(STANDING_BUILD) if n in cold}

    m = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    groups: dict[str, float] = {}
    for name, t in timings.items():
        fam = ("sketch" if name.startswith(("sketch_", "drift_")) else
               "stream" if name.startswith("stream_") else
               "dedup" if name.startswith(("dedup_", "pipeline_")) else
               "text" if name.startswith(("text_", "token_", "corpus_",
                                          "doc_", "quality_", "sample_",
                                          "decontaminate_", "retrieval_",
                                          "contamination_", "mine_",
                                          "web_")) else
               "embedding" if name.startswith(("ann_", "embedding_",
                                               "cluster_", "hybrid_")) else
               "multimodal" if name.startswith("multimodal_") else
               "relational")
        groups[fam] = round(groups.get(fam, 0.0) + t, 4)
    out = {
        "metric": "registry_total_wall",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "queries_cold": cold,
        "queries_warm": warm,
        "queries_loaded": loaded,
        "standing_build": standing_build,
        "standing_build_total": round(sum(standing_build.values()), 4),
        "sf": sf,
        "cold_total": round(sum(cold.values()), 4),
        "loaded_total": round(sum(loaded.values()), 4),
        "groups": groups,
        "n_queries": len(timings),
        "anchor": anchor,
    }
    with open(FULL_ARTIFACT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # Full per-query JSON first (local archaeology / diffing), then the
    # COMPACT summary as the FINAL stdout line (driver tail budget).
    print(json.dumps(out))
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": "registry_total_wall",
        "value": out["value"],
        "unit": "sec",
        "queries": slowest,
        "queries_truncated_to_slowest": 10,
        "queries_cold": {n: cold[n] for n in slowest},
        "queries_loaded": {n: loaded[n] for n in slowest},
        "standing_build_total": out["standing_build_total"],
        "full_artifact": os.path.basename(FULL_ARTIFACT),
        "sf": sf,
        "cold_total": out["cold_total"],
        "loaded_total": out["loaded_total"],
        "groups": groups,
        "n_queries": len(timings),
        "anchor": anchor,
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
