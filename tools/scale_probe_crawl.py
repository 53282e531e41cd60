"""Probe r50 — the crawl-chain 100x leg (r14 VERDICT lead #4): the
WARC ingest queries are pure scan-parallel kernel chains (plant ->
gzip WARC -> record walk -> HTTP split -> HTML extract -> one
partial-agg shuffle), so their wall should track corpus size
LINEARLY at every decade — this probe measures the claim at 1x /
10x / 100x of the bench corpus instead of arguing it.

Only `documents` grows (the crawl queries read nothing else); the
synthesis reuses the scale_probe_registry copy-token interleave
(cross-copy 3-gram Jaccard 0) at stride 10M per copy, 100 copies =
500k documents at 100x.  Other tables are copied at 1x so the
sf-dir contract holds.

Methodology: each query runs twice per scale in one session; the
SECOND (loaded) wall is recorded (bench discipline).  Ratios ~10
between decades mean the kernels stayed scan-parallel; a
super-linear 100x/10x ratio would flag a hidden quadratic or a
single-task collapse in the chain.

Usage: python tools/scale_probe_crawl.py [query ...]
       (default: pipeline_crawl_extract, stream_html_extract,
        pipeline_crawl_url_dedup)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TENX_DIR = "/tmp/nsjs_sf1"          # built by scale_probe_registry
HUNDREDX_DIR = "/tmp/nsjs_sf10_docs"
COPY_STRIDE = 10_000_000

DEFAULT = ["pipeline_crawl_extract", "stream_html_extract",
           "pipeline_crawl_url_dedup"]


def synthesize_100x(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(HUNDREDX_DIR, exist_ok=True)
    done = os.path.join(HUNDREDX_DIR, "_DONE")
    if os.path.exists(done):
        return
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    c = spark.range(100).select(F.col("id").alias("__copy"))
    tok = F.concat(F.lit(" c"), F.col("__copy").cast("string"),
                   F.lit(" "))
    (docs.crossJoin(c)
         .withColumn("doc_id",
                     F.col("doc_id") + F.col("__copy") * COPY_STRIDE)
         .withColumn("text", F.regexp_replace("text", r"\s+", tok))
         .drop("__copy")
         .repartition(32)
         .write.mode("overwrite")
         .parquet(f"{HUNDREDX_DIR}/documents.parquet"))
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        (spark.read.parquet(f"{SF_DIR}/{t}.parquet")
         .write.mode("overwrite")
         .parquet(f"{HUNDREDX_DIR}/{t}.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")


def main() -> None:
    from nosql_join_stream_spark.queries import REGISTRY
    from nosql_join_stream_spark.session import get_session

    names = sys.argv[1:] or DEFAULT
    spark = get_session("scale-probe-crawl")
    if not os.path.exists(os.path.join(TENX_DIR, "_DONE")):
        from tools.scale_probe_registry import synthesize
        synthesize(spark)
    synthesize_100x(spark)

    scales = (("1x", SF_DIR), ("10x", TENX_DIR),
              ("100x", HUNDREDX_DIR))
    results: dict[str, dict[str, float]] = {}
    for tag, sf_dir in scales:
        for name in names:
            fn = REGISTRY[name].fn
            fn(spark, sf_dir).count()            # cold
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()        # loaded wall
            w = round(time.perf_counter() - t0, 2)
            results.setdefault(name, {})[tag] = w
            results[name][f"rows_{tag}"] = n
            print(f"{tag:>4} {name:28s} {w:8.2f}s  rows={n}",
                  flush=True)

    print("\n| query | 1x s | 10x s | 100x s | 10x/1x | 100x/10x "
          "| rows 1x→100x |")
    print("|---|---|---|---|---|---|---|")
    for name in names:
        r = results[name]
        print(f"| {name} | {r['1x']:.2f} | {r['10x']:.2f} "
              f"| {r['100x']:.2f} | ×{r['10x'] / max(r['1x'], 1e-9):.1f} "
              f"| ×{r['100x'] / max(r['10x'], 1e-9):.1f} "
              f"| {int(r['rows_1x'])}→{int(r['rows_100x'])} |")


if __name__ == "__main__":
    main()
