"""TF-IDF / BM25 / decontamination / stratified sampling unit tests
(hand-computed small fixtures; corpus-level behavior is oracle-checked
by the registry queries)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from nosql_join_stream_spark.operators import dedup, retrieval, sampling


def _docs(spark):
    rows = [
        (0, "spark join spark hash"),
        (1, "hash table scan"),
        (2, "spark window sort window"),
        (3, "merge sort batch"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_hand_computed(spark):
    out = retrieval.tfidf_topk(_docs(spark), "text", "doc_id", k=2)
    rows = {(r.doc_id, r.rnk): (r.tok, r.tfidf) for r in out.collect()}
    # doc 0: spark tf=2 df=2 -> 2*(ln(5/3)+1); hash tf=1 df=2
    exp_spark = round(2 * (math.log(5 / 3) + 1), 4)
    assert rows[(0, 1)] == ("spark", exp_spark)
    # 'join' is unique to doc 0 (df=1, idf ln(5/2)+1) and outranks
    # 'hash' (df=2) despite equal tf
    assert rows[(0, 2)] == ("join", round(math.log(5 / 2) + 1, 4))
    # every doc has exactly k (or fewer) rows, ranks contiguous from 1
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("rnk").alias("mx")).collect()
    assert all(r.n == r.mx <= 2 for r in per_doc)


def test_bm25_prefers_higher_tf_shorter_doc(spark):
    out = retrieval.bm25_topk(_docs(spark), "text", "doc_id",
                              ["spark"], k=10)
    rows = out.collect()
    # only docs 0 and 2 contain 'spark'; doc 0 has tf=2 in dl=4 vs tf=1
    # in dl=4 -> doc 0 strictly first
    assert [r.doc_id for r in rows] == [0, 2]
    assert rows[0].bm25 > rows[1].bm25 > 0


def test_decontaminate_planted_copy(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    train = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon"),   # full copy: 3 shared 3-grams
         (1, "zeta eta theta iota kappa"),        # disjoint
         (2, "x alpha beta gamma y")],            # one shared 3-gram
        "doc_id long, text string")
    got = {r.id: r.n_shared
           for r in dedup.decontaminate(train, bench, "text", "doc_id",
                                        n=3).collect()}
    assert got == {0: 3, 2: 1}


def test_stratified_sample_deterministic_and_weighted(spark, engine):
    docs = engine.table("documents")
    s1 = sampling.stratified_sample(docs, "doc_id", "lang", {"en": 250},
                                    default_per_mille=700)
    s2 = sampling.stratified_sample(docs, "doc_id", "lang", {"en": 250},
                                    default_per_mille=700)
    a = sorted(r.doc_id for r in s1.select("doc_id").collect())
    assert a == sorted(r.doc_id for r in s2.select("doc_id").collect())
    # weights: en rows 1000/250 = 4, others 1000/700
    w = {r.lang: r.weight for r in s1.select("lang", "weight").distinct().collect()}
    assert w.get("en", 4.0) == 4.0
    assert all(abs(v - round(1000 / 700, 6)) < 1e-9
               for k, v in w.items() if k != "en")
    # en downsampled harder than the rest (rate 25% vs 70%)
    n_en = docs.filter("lang = 'en'").count()
    k_en = s1.filter("lang = 'en'").count()
    assert 0 < k_en < n_en * 0.45
