"""Probe r48 — standing-index SERVE cost vs index size at 1x/10x/100x
(r13 VERDICT lead #4): the one unmeasured hop in the 100 TB story.

The serve paths (`dedup_incremental_bucketed`'s probe side,
`ann_ivf_probe`) are the designated daily-job shapes: build the
standing index ONCE per scale, then measure the cost of probing it
with a FIXED-SIZE batch as the index grows 1x -> 10x -> 100x.  The
r41 registry leg scaled BOTH sides together; this leg isolates what a
serving cluster actually pays when only the corpus grows.

Index corpora: documents/embeddings from sf0.1 replicated with the
r41 copy-token interleave (cross-copy 3-gram Jaccard 0) and the
per-copy embedding offset (no exact twins), so TRUE match structure
per batch doc stays 1x-sized while the index grows — the serve
claim stated precisely: probe cost should track the BATCH and its
CANDIDATES, not the index.

Fixed probes:
- dedup: the sf0.1 batch slice (doc_id%10==9, 500 docs) transformed
  with the copy-0 token, so it matches exactly the copy-0 region of
  every index — same candidates at every scale.
- ANN: 200 query vectors (vec_id%10==9 over the 2,000 sf0.1
  embeddings, copy-0 offset).

IVF builds scale n_cells with the corpus (16/62/625 at the default
CELL_TARGET — constant target cell SIZE, the standard IVF
discipline: cells ~ N/cell_size),
so a probe reads ~nprobe cells of constant byte size at every scale;
this is what makes IVF serve flat, and the probe records it.

The dedup bucketed SMJ, by contrast, is expected to show its honest
trade: zero corpus-side Exchange (no shuffle ever), but the
sort-merge scan itself is index-linear — the probe records the slope
so SCALING.md can state which tier to serve from at which scale,
measured rather than argued.

Methodology per scale: build once (timed, reported — expected
index-linear, it is a batch job); probe twice, record the SECOND
(loaded) wall; rows asserted equal across scales for the dedup leg
(identical candidates by construction).

Usage: python tools/scale_probe_serve.py [--scales 1,10,100]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = "/tmp/nsjs_serve"
COPY_STRIDE = 10_000_000
CELL_TARGET = 320          # ~vectors per IVF cell, constant across scales


def synth_scale(spark, factor: int) -> str:
    """documents + embeddings at `factor`x of sf0.1, r41 transforms."""
    from pyspark.sql import functions as F

    out = f"{BASE}/idx_{factor}x"
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    c = spark.range(factor).select(F.col("id").alias("__copy"))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").crossJoin(c)
    tok = F.concat(F.lit(" c"), F.col("__copy").cast("string"), F.lit(" "))
    (docs.withColumn("doc_id",
                     F.col("doc_id") + F.col("__copy") * COPY_STRIDE)
         .withColumn("text", F.regexp_replace("text", r"\s+", tok))
         .drop("__copy")
         .write.mode("overwrite").parquet(f"{out}/documents.parquet"))
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").crossJoin(c)
    (emb.withColumn("vec_id",
                    F.col("vec_id") + F.col("__copy") * COPY_STRIDE)
        .withColumn("embedding", F.transform(
            "embedding",
            lambda x: x + F.col("__copy").cast("float") * F.lit(0.001)))
        .drop("__copy")
        .write.mode("overwrite").parquet(f"{out}/embeddings.parquet"))
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def fixed_probes(spark):
    """The constant probe batches (copy-0 transformed sf0.1 slices)."""
    from pyspark.sql import functions as F

    batch = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
             .filter(F.col("doc_id") % 10 == 9)
             .withColumn("text", F.regexp_replace("text", r"\s+", " c0 ")))
    queries = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .filter(F.col("vec_id") % 10 == 9)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    return batch.localCheckpoint(), queries.localCheckpoint()


def main() -> None:
    from pyspark.sql import functions as F

    from nosql_join_stream_spark.operators import dedup, similarity
    from nosql_join_stream_spark.session import get_session

    scales = [1, 10, 100]
    if "--scales" in sys.argv:
        scales = [int(x) for x in
                  sys.argv[sys.argv.index("--scales") + 1].split(",")]

    spark = get_session("scale-probe-serve")
    batch, queries = fixed_probes(spark)
    n_q = queries.count()
    print(f"fixed probes: dedup batch {batch.count()} docs, "
          f"ANN {n_q} queries", flush=True)

    rows = []
    for f in scales:
        idx_dir = synth_scale(spark, f)
        corpus = (spark.read.parquet(f"{idx_dir}/documents.parquet")
                  .filter(F.col("doc_id") % 10 != 9))
        emb = spark.read.parquet(f"{idx_dir}/embeddings.parquet")
        n_corpus = corpus.count()
        n_vec = emb.count()

        # ---- dedup bucketed serve ------------------------------------
        db, loc = f"nsjs_serve_{f}x", f"{BASE}/dedup_{f}x"
        shutil.rmtree(loc, ignore_errors=True)
        t0 = time.perf_counter()
        dedup.ngram_jaccard_pairs_between_bucketed(
            corpus, batch, "text", "doc_id", n=3, threshold=0.6,
            db=db, location=loc, rebuild=True).count()
        t_build_d = time.perf_counter() - t0
        dedup.ngram_jaccard_pairs_between_bucketed(
            corpus, batch, "text", "doc_id", n=3, threshold=0.6,
            db=db, location=loc, rebuild=False).count()
        t0 = time.perf_counter()
        n_pairs = dedup.ngram_jaccard_pairs_between_bucketed(
            corpus, batch, "text", "doc_id", n=3, threshold=0.6,
            db=db, location=loc, rebuild=False).count()
        t_dedup = time.perf_counter() - t0

        # ---- IVF serve (constant cell size) --------------------------
        ivf_loc = f"{BASE}/ivf_{f}x"
        shutil.rmtree(ivf_loc, ignore_errors=True)
        n_cells = max(16, n_vec // CELL_TARGET)
        t0 = time.perf_counter()
        similarity.ann_ivf_partitioned(
            queries, emb.select(F.col("vec_id").alias("c_id"),
                                "embedding"),
            k=5, n_cells=n_cells, nprobe=4, location=ivf_loc,
            rebuild=True).count()
        t_build_a = time.perf_counter() - t0
        similarity.ann_ivf_probe(queries, ivf_loc, k=5, nprobe=4).count()
        t0 = time.perf_counter()
        n_ann = similarity.ann_ivf_probe(queries, ivf_loc,
                                         k=5, nprobe=4).count()
        t_ann = time.perf_counter() - t0

        rows.append((f, n_corpus, n_vec, n_cells, t_build_d, t_dedup,
                     n_pairs, t_build_a, t_ann, n_ann))
        print(f"{f:>3}x corpus={n_corpus} vec={n_vec} cells={n_cells} "
              f"dedup build {t_build_d:.1f}s probe {t_dedup:.2f}s "
              f"({n_pairs} pairs) | ivf build {t_build_a:.1f}s "
              f"probe {t_ann:.2f}s ({n_ann} rows)", flush=True)

    print("\n| scale | index docs | dedup build s | dedup probe s | "
          "pairs | index vecs | cells | ivf build s | ivf probe s |")
    print("|---|---|---|---|---|---|---|---|---|")
    for (f, nc, nv, cells, bd, pd_, np_, ba, pa, na) in rows:
        print(f"| {f}x | {nc} | {bd:.1f} | {pd_:.2f} | {np_} "
              f"| {nv} | {cells} | {ba:.1f} | {pa:.2f} |")


if __name__ == "__main__":
    main()
