"""Probe r41 — the order-of-magnitude REGISTRY leg (r11 VERDICT lead
#7): run the heaviest registry queries end-to-end (through
``queries()``, exactly as the driver/bench do) against a genuine
10×-of-sf0.1 scale dir, and record the sf0.1 → 10× wall ratio per
query.  The per-op probes in SCALING.md top out at 16-64× of SMALL
corpora; this is the one real 10×-of-the-bench-scale point
(~50k documents, ~6M lineitem) anchoring the flat-scaling claims.

The 10× dir is synthesized once under /tmp:
- documents ×10 with the scale-probe copy-token interleave (cross-copy
  Jaccard 0 ⇒ TRUE near-dup structure — and the work — grows linearly,
  not quadratically; applied at 1× too for comparability, so the 1×
  walls here differ slightly from BENCH_full's raw-corpus walls),
- embeddings ×10 with a per-copy deterministic component offset (no
  exact vector twins ⇒ no synthetic near-dup blowup),
- events ×10 (shifted event/user ids: 10× users over the same window),
- lineitem+orders ×10 with consistently shifted order keys,
- dimensions (region/nation/customer/supplier/part) byte-identical —
  the TPC-H dimensions grow sub-linearly in sf anyway.

Methodology: each query runs twice per scale in one session; the
SECOND (loaded) wall is recorded — the bench discipline.  A ratio
≲ 10 means the plan scaled linearly-or-better (partial aggs, bucketed
joins, blocked pair spaces held); ≫ 10 flags a hidden n² or a
single-task collapse.

Usage: python tools/scale_probe_registry.py [query ...]
       (default: the 10 heaviest from BENCH_full + 2 relational
       anchors)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX_DIR = "/tmp/nsjs_sf1"
FACTOR = 10

DEFAULT = [
    "dedup_resolve_keep_best", "dedup_component_sizes",
    "pipeline_clean_corpus", "dedup_incremental_minhash",
    "dedup_incremental_bucketed", "dedup_resolve_canonical",
    "dedup_resolve_incremental", "pipeline_clean_corpus_minhash",
    "stream_incremental_dedup", "pipeline_materialize_training",
    "local_supplier_volume", "tpch_q9_product_profit",
]

COPY_STRIDE = 10_000_000


def synthesize(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(TENX_DIR, exist_ok=True)
    done = os.path.join(TENX_DIR, "_DONE")
    if os.path.exists(done):
        return

    def copies(df):
        c = spark.range(FACTOR).select(F.col("id").alias("__copy"))
        return df.crossJoin(c)

    docs = copies(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    tok = F.concat(F.lit(" c"), F.col("__copy").cast("string"), F.lit(" "))
    (docs.withColumn("doc_id",
                     F.col("doc_id") + F.col("__copy") * COPY_STRIDE)
         .withColumn("text", F.regexp_replace("text", r"\s+", tok))
         .drop("__copy")
         .write.mode("overwrite")
         .parquet(f"{TENX_DIR}/documents.parquet"))

    emb = copies(spark.read.parquet(f"{SF_DIR}/embeddings.parquet"))
    (emb.withColumn("vec_id",
                    F.col("vec_id") + F.col("__copy") * COPY_STRIDE)
        .withColumn("embedding", F.transform(
            "embedding",
            lambda x: x + F.col("__copy").cast("float") * F.lit(0.001)))
        .drop("__copy")
        .write.mode("overwrite")
        .parquet(f"{TENX_DIR}/embeddings.parquet"))

    ev = copies(spark.read.parquet(f"{SF_DIR}/events.parquet"))
    (ev.withColumn("event_id",
                   F.col("event_id") + F.col("__copy") * COPY_STRIDE)
       .withColumn("user_id", F.col("user_id") + F.col("__copy") * 150)
       .drop("__copy")
       .write.mode("overwrite")
       .parquet(f"{TENX_DIR}/events.parquet"))

    li = copies(spark.read.parquet(f"{SF_DIR}/lineitem.parquet"))
    (li.withColumn("l_orderkey",
                   F.col("l_orderkey") + F.col("__copy") * COPY_STRIDE)
       .drop("__copy")
       .write.mode("overwrite")
       .parquet(f"{TENX_DIR}/lineitem.parquet"))
    od = copies(spark.read.parquet(f"{SF_DIR}/orders.parquet"))
    (od.withColumn("o_orderkey",
                   F.col("o_orderkey") + F.col("__copy") * COPY_STRIDE)
       .drop("__copy")
       .write.mode("overwrite")
       .parquet(f"{TENX_DIR}/orders.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part"):
        (spark.read.parquet(f"{SF_DIR}/{t}.parquet")
         .write.mode("overwrite").parquet(f"{TENX_DIR}/{t}.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")


def main() -> None:
    from nosql_join_stream_spark.session import get_session
    from nosql_join_stream_spark.queries import REGISTRY

    names = sys.argv[1:] or DEFAULT
    spark = get_session("scale-probe-registry")
    synthesize(spark)

    results: dict[str, dict[str, float]] = {}
    for sf_tag, sf_dir in (("1x", SF_DIR), ("10x", TENX_DIR)):
        for name in names:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).count()            # cold: plans + artifacts
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()        # loaded: the bench wall
            w = round(time.perf_counter() - t0, 2)
            results.setdefault(name, {})[sf_tag] = w
            results[name][f"rows_{sf_tag}"] = n
            print(f"{sf_tag:>3} {name:34s} {w:8.2f}s  rows={n}",
                  flush=True)

    print("\n| query | 1x s | 10x s | ratio | rows 1x→10x |")
    print("|---|---|---|---|---|")
    for name in names:
        r = results[name]
        ratio = r["10x"] / max(r["1x"], 1e-9)
        print(f"| {name} | {r['1x']:.2f} | {r['10x']:.2f} "
              f"| ×{ratio:.1f} | {int(r['rows_1x'])}→"
              f"{int(r['rows_10x'])} |")


if __name__ == "__main__":
    main()
