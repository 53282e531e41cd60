"""Similarity search over embedding columns (array<float>).

Beyond-reference (SURVEY.md M6).  Two paths:

- brute-force cosine top-k: exact baseline.  The query set is small
  and BROADCAST; the corpus streams through one scan — no shuffle of
  the corpus at all, per-query top-k via ranking window.  All math in
  JVM expressions (zip_with/aggregate) in double precision.
- LSH-bucketed ANN (random hyperplanes): the scale path — corpus
  hashed once into sign-bit buckets; queries probe only their bucket
  (+ optional multi-probe).  Recall < 1, precision exact within
  retrieved set.

At 100 TB the corpus side stays partitioned; only signatures/buckets
shuffle.  An IVF variant would replace hyperplanes with k-means
centroids — same join shape.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0).cast("double"), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0).cast("double"),
                              lambda acc, v: acc + v * v))


def cosine(a, b):
    """Cosine similarity of two array columns, computed in double with
    strict left-to-right summation (reproducible across engines)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                query_id: str = "q_id", corpus_id: str = "c_id",
                vec: str = "embedding", round_to: int = 6) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector, the k
    nearest corpus vectors (self-matches excluded by id).

    queries: (q_id, embedding) — small, broadcast.
    Ranking is on ROUNDED similarity with id tie-break, so results are
    bit-stable across engines and runs.
    """
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec).alias("__cv"))
    sim = F.round(cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double"))), round_to)
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("__qid") != F.col("__cid"))
              .withColumn("sim", sim))
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("__qid").alias(query_id),
                          F.col("__cid").alias(corpus_id),
                          "sim", "rank"))


def _hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from SHA-256
    counter mode — reproducible everywhere, no RNG library."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(0, dim, 8):
            digest = hashlib.sha256(f"plane:{p}:{d}".encode()).digest()
            vals.extend(struct.unpack(">8i", digest)[: min(8, dim - d)])
        planes.append([v / 2147483648.0 for v in vals])
    return planes


def lsh_bucket(vec_col, n_planes: int, dim: int):
    """Sign-bit bucket id of a vector under fixed random hyperplanes."""
    planes = _hyperplanes(n_planes, dim)
    bucket = F.lit(0).cast("long")
    v = F.transform(vec_col, lambda x: x.cast("double"))
    for i, plane in enumerate(planes):
        d = _dot(v, F.array(*[F.lit(float(x)) for x in plane]))
        bucket = bucket + F.when(d > 0, F.lit(1 << i).cast("long")) \
                           .otherwise(F.lit(0).cast("long"))
    return bucket


def ann_lsh_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                 n_planes: int = 8, dim: int = 64,
                 query_id: str = "q_id", corpus_id: str = "c_id",
                 vec: str = "embedding") -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket equi-join then exact
    cosine rank within the bucket.  2^n_planes buckets; corpus hashed
    once (one narrow scan), join is bucket-key equi-join — at 100 TB
    this is THE shape that avoids the full cross product."""
    q = queries.select(F.col(query_id).alias("__qid"), F.col(vec).alias("__qv"),
                       lsh_bucket(F.col(vec), n_planes, dim).alias("__b"))
    c = corpus.select(F.col(corpus_id).alias("__cid"), F.col(vec).alias("__cv"),
                      lsh_bucket(F.col(vec), n_planes, dim).alias("__b"))
    sim = F.round(cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double"))), 6)
    scored = (F.broadcast(q).join(c, "__b")
              .filter(F.col("__qid") != F.col("__cid"))
              .withColumn("sim", sim))
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(), F.col("__cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("__qid").alias(query_id),
                          F.col("__cid").alias(corpus_id), "sim", "rank"))


def embedding_near_dup_pairs(df: DataFrame, id_col: str = "vec_id",
                             vec: str = "embedding",
                             threshold: float = 0.95,
                             outer_limit: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, sim ≥ τ).
    Exact form (cross product) — use for moderate corpora or as the
    verifier behind ann buckets; ``outer_limit`` restricts the left
    side for bounded runs."""
    a = df.select(F.col(id_col).alias("id1"), F.col(vec).alias("v1"))
    if outer_limit:
        a = a.filter(F.col("id1") < outer_limit)
    b = df.select(F.col(id_col).alias("id2"), F.col(vec).alias("v2"))
    sim = F.round(cosine(
        F.transform("v1", lambda x: x.cast("double")),
        F.transform("v2", lambda x: x.cast("double"))), 6)
    return (a.join(b, F.col("id1") < F.col("id2"))
             .withColumn("sim", sim)
             .filter(F.col("sim") >= threshold)
             .select("id1", "id2", "sim"))
