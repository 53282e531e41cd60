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


def test_unigram_logprob_hand_computed(spark):
    df = spark.createDataFrame([(0, "a a b"), (1, "b")],
                               "doc_id long, text string")
    # corpus: a×2, b×2, total 4 -> p(a)=p(b)=0.5
    got = {r.doc_id: (r.n_tokens, r.mean_logprob)
           for r in retrieval.unigram_logprob(df, "text", "doc_id").collect()}
    lp = round(math.log(0.5), 4)
    assert got == {0: (3, lp), 1: (1, lp)}


def test_pack_sequences_straddles_boundary(spark):
    from nosql_join_stream_spark.operators import text as text_ops
    rows = [(i, "s", " ".join(["w"] * n))
            for i, n in [(0, 3), (1, 4), (2, 2), (3, 5)]]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.doc_id: (r.seq_id, r.offset_in_seq)
           for r in text_ops.pack_sequences(df, "doc_id", "source",
                                            budget=5).collect()}
    # offsets 0,3,7,9 with budget 5 -> seqs 0,0,1,1; doc1 straddles 5
    assert out == {0: (0, 0), 1: (0, 3), 2: (1, 2), 3: (1, 4)}


def test_cluster_assign_centroids_map_to_themselves(spark, engine):
    from nosql_join_stream_spark.operators import similarity
    emb = engine.table("embeddings")
    out = similarity.cluster_assign(emb, k=4)
    cent_rows = {r.vec_id: (r.cluster_id, r.sim)
                 for r in out.filter("vec_id < 4").collect()}
    assert all(cent_rows[i] == (i, 1.0) for i in range(4))
    # every vector assigned exactly once, to a valid centroid
    assert out.count() == emb.count()
    assert out.filter("cluster_id >= 4 or cluster_id < 0").count() == 0


def test_stratified_sample_huge_ids_no_overflow(spark):
    # ids ≥ 2^31 would overflow int64 in the naive Knuth multiply;
    # the mod-2^31 reduction must keep ANSI Spark from throwing and
    # stay deterministic
    ids = [2**62 + 7, 2**40, 3_500_000_000, 5]
    df = spark.createDataFrame([(i, "en") for i in ids],
                               "doc_id long, lang string")
    out1 = sorted(r.doc_id for r in
                  sampling.stratified_sample(df, "doc_id", "lang",
                                             {"en": 500}).collect())
    out2 = sorted(r.doc_id for r in
                  sampling.stratified_sample(df, "doc_id", "lang",
                                             {"en": 500}).collect())
    assert out1 == out2  # deterministic, no exception


def test_hybrid_rrf_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "spark spark spark"),   # lexical winner
         (1, "spark hash"),
         (2, "sort merge")],         # no query terms
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0]), (2, [0.9, 0.1])],
        "vec_id long, embedding array<float>")
    out = retrieval.hybrid_rrf_topk(docs, emb, "text", "doc_id",
                                    ["spark"], [1.0, 0.0], k=3)
    rows = {r.doc_id: r for r in out.collect()}
    # cosine ranks: doc1 sim=1 -> 1, doc2 -> 2, doc0 sim=0 -> 3
    # bm25 ranks: doc0 -> 1, doc1 -> 2; doc2 unranked
    assert rows[1].bm25_rank == 2 and rows[1].cos_rank == 1
    assert rows[0].bm25_rank == 1 and rows[0].cos_rank == 3
    assert rows[2].bm25_rank is None and rows[2].cos_rank == 2
    # doc1 (strong in both) fuses highest
    assert rows[1].rrf > rows[0].rrf > rows[2].rrf
    exp = round(1 / 62 + 1 / 61, 6)
    assert abs(rows[1].rrf - exp) < 1e-9


def test_label_centroids_match_numpy(spark, engine):
    import json

    import numpy as np
    emb = engine.table("embeddings")
    pdf = emb.toPandas()
    from nosql_join_stream_spark.queries import REGISTRY
    got = {r.label: json.loads(r.centroid_q6_json) for r in
           REGISTRY["embedding_label_centroids"].fn(
               spark, "/root/testdata/sf0.001").collect()}
    for label, grp in pdf.groupby("label"):
        exp = np.stack(grp["embedding"].to_list()).astype("float64").mean(axis=0)
        # centroid serialized as micro-units (x1e6, rounded to long)
        assert np.allclose(np.array(got[label]) / 1e6, exp, atol=1e-6)


def test_phrase_search_hand_computed(spark):
    rows = [
        (0, "a b c a b c"),       # two disjoint "a b c"
        (1, "a a a"),             # overlapping "a a": starts 0,1
        (2, "a b x c"),           # broken phrase
        (3, "c b a"),             # wrong order
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.n_matches for r in
           retrieval.phrase_search(df, "text", "doc_id", "a b c").collect()}
    assert got == {0: 2}
    got2 = {r.id: r.n_matches for r in
            retrieval.phrase_search(df, "text", "doc_id", "a a").collect()}
    assert got2 == {1: 2}
    got1 = {r.id: r.n_matches for r in
            retrieval.phrase_search(df, "text", "doc_id", "a").collect()}
    assert got1 == {0: 2, 1: 3, 2: 1, 3: 1}


def test_cap_per_group_picks_smallest_hashes(spark):
    import hashlib
    rows = [(i, "g%d" % (i % 3)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = sampling.cap_per_group(df, "grp", "id", cap=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, set()).add(r.id)
    # exact Python replay: 5 smallest sha2-60 hashes per group
    def h(i):
        return int(hashlib.sha256(str(i).encode()).hexdigest()[:15], 16)
    for g in ("g0", "g1", "g2"):
        ids = [i for i, gg in rows if gg == g]
        want = set(sorted(ids, key=lambda i: (h(i), i))[:5])
        assert got[g] == want, g
    # cap larger than the group keeps everything
    tiny = sampling.cap_per_group(df.filter("id < 4"), "grp", "id", cap=10)
    assert tiny.count() == 4


def test_global_shuffle_is_exact_hash_permutation(spark):
    import hashlib
    ids = [3, 11, 42, 7, 900, 12345, 0, 2**40]
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    got = {r.id: r.shuffle_pos for r in
           sampling.global_shuffle(df, "id").collect()}

    def h(i):
        return int(hashlib.sha256(str(i).encode()).hexdigest()[:15], 16)

    want = {i: p + 1 for p, i in
            enumerate(sorted(ids, key=lambda i: (h(i), i)))}
    assert got == want
    assert sorted(got.values()) == list(range(1, len(ids) + 1))


def test_stratified_sample_rejects_bad_rates(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="per-mille"):
        sampling.stratified_sample(df, "doc_id", "lang", {"en": 1500})
    with _pytest.raises(ValueError, match="per-mille"):
        sampling.stratified_sample(df, "doc_id", "lang", {},
                                   default_per_mille=-1)


def test_collocations_pmi_hand_computed(spark):
    """PMI on a corpus with one planted collocation: 'neural network'
    co-occurs far above chance, filler pairs sit at/below it; the
    hand-computed PMI value must match to 4 dp."""
    import math

    from pyspark.sql import functions as F

    from nosql_join_stream_spark.operators.retrieval import collocations_pmi

    # 6 docs x "neural network" + independent filler tokens
    rows = [(i, "neural network " + " ".join(
                f"f{j}_{i}" for j in range(4))) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations_pmi(df, "text", "doc_id", k=5, min_count=5).collect()
    assert [(r.w1, r.w2, r.c_ab) for r in out] == [("neural", "network", 6)]
    n_uni = 6 * 6          # 36 tokens
    n_bi = 6 * 5           # 30 adjacent pairs
    want = round(math.log((6 / n_bi) / ((6 / n_uni) * (6 / n_uni))), 4)
    assert out[0].pmi == want


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b a b" and "a b x" → bigrams: (a,b)x2+(a,b),(b,a),(b,x)
    from math import log

    from nosql_join_stream_spark.operators.retrieval import bigram_logprob

    df = spark.createDataFrame([(1, "a b a b"), (2, "a b x")],
                               ["doc_id", "text"])
    out = {r.id: (r.n_bigrams, r.mean_logprob)
           for r in bigram_logprob(df, "text", "doc_id").collect()}
    # counts: c(a,b)=3, c(b,a)=1, c(b,x)=1; ctx: c(a.)=3, c(b.)=2; V=3
    lp_ab = log((3 + 0.5) / (3 + 0.5 * 3))
    lp_ba = log((1 + 0.5) / (2 + 0.5 * 3))
    lp_bx = log((1 + 0.5) / (2 + 0.5 * 3))
    want1 = round((lp_ab + lp_ba + lp_ab) / 3, 4)
    want2 = round((lp_ab + lp_bx) / 2, 4)
    assert out[1] == (3, want1)
    assert out[2] == (2, want2)


def test_bigram_logprob_orders_sensitivity(spark):
    # same unigram bag, different order: the common-order doc must
    # outscore the shuffled one (the signal unigram_logprob can't see)
    from nosql_join_stream_spark.operators.retrieval import bigram_logprob

    rows = [(i, "the cat sat on the mat") for i in range(5)]
    rows.append((99, "mat the on sat cat the"))  # same bag, rare order
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.id: r.mean_logprob
           for r in bigram_logprob(df, "text", "doc_id").collect()}
    assert out[0] > out[99]


def test_interleave_by_weight_proportional_cadence(spark):
    # two sources, 90 vs 10 docs: in any window of the interleaved
    # order, big-source docs should appear ~3x as often as small
    # (sqrt(90)/sqrt(10) = 3), never as one solid block
    from nosql_join_stream_spark.operators.sampling import (
        interleave_by_weight)

    rows = [(i, "big") for i in range(90)] + \
           [(1000 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = interleave_by_weight(df, "source", "doc_id").collect()
    order = [r.source for r in sorted(out, key=lambda r: r.train_pos)]
    assert sorted(r.train_pos for r in out) == list(range(1, 101))
    # every small-source doc is separated by at most ~2x the expected
    # stride of big-source docs (no concatenation block)
    small_pos = [i for i, s in enumerate(order) if s == "small"]
    gaps = [b - a for a, b in zip(small_pos, small_pos[1:])]
    assert max(gaps) <= 8  # expected ~4 under 3:1 cadence; 8 = slack
    assert min(small_pos) < 20  # small source starts early, not at the end


def _eval_fixture(spark):
    # queries = docs 0,1 (n_queries=2).  doc 10 is a verbatim copy of
    # query 0's text AND its nearest embedding; doc 11 shares nothing
    # lexically with query 0 but is query 1's semantic neighbor.
    rows = [
        (0, "alpha beta gamma"),
        (1, "delta epsilon zeta"),
        (10, "alpha beta gamma"),
        (11, "eta theta iota"),
        (12, "beta kappa kappa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (10, [0.9, 0.1, 0.0]),     # nearest to q0
        (11, [0.1, 0.9, 0.0]),     # nearest to q1
        (12, [0.0, 0.0, 1.0]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    return docs, emb


def test_retrieval_eval_hand_checked(spark):
    docs, emb = _eval_fixture(spark)
    out = retrieval.retrieval_eval(docs, emb, "text", "doc_id",
                                   n_queries=2, k=2, head_n=4)
    rows = {r.q_id: r for r in out.collect()}
    assert set(rows) == {0, 1}
    # q0: lexical rank 1 = doc 10 (verbatim copy); truth top-2 by
    # cosine = {10, 1}?  cosine(q0, c) for c in {1:0.0, 10:~0.994,
    # 11:~0.110, 12:0.0} -> truth = {10, 11} (ties on sim 0.0 lose to
    # positive sims).  doc 10 relevant at rank 1 -> mrr = 1.0
    assert rows[0].mrr == 1.0
    assert rows[0].recall_at_k >= 0.5
    # metrics bounded
    for r in rows.values():
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.ndcg_at_k <= 1.0


def test_retrieval_eval_two_stage_head_is_exact(spark):
    # the salted two-stage top-N must equal the single-stage ranking:
    # n_salts=1 IS the single-stage form
    docs, emb = _eval_fixture(spark)
    a = retrieval.retrieval_eval(docs, emb, "text", "doc_id",
                                 n_queries=2, k=2, head_n=4, n_salts=1)
    b = retrieval.retrieval_eval(docs, emb, "text", "doc_id",
                                 n_queries=2, k=2, head_n=4, n_salts=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_mine_hard_negatives_excludes_semantic_positives(spark):
    docs, emb = _eval_fixture(spark)
    out = retrieval.mine_hard_negatives(docs, emb, "text", "doc_id",
                                        n_queries=1, k_pos=1, n_neg=5,
                                        head_n=5)
    rows = out.collect()
    negs = {r.neg_id for r in rows}
    # q0's semantic top-1 is doc 10 (cos ~0.994) -> positive, excluded
    # even though it is the strongest lexical match (verbatim copy);
    # doc 12 shares 'beta' with q0 -> lexical candidate, not a
    # positive -> hard negative
    assert 10 not in negs
    assert 12 in negs
    # ranks contiguous from 1, scores non-increasing
    by_rank = sorted(rows, key=lambda r: r.neg_rank)
    assert [r.neg_rank for r in by_rank] == list(range(1, len(rows) + 1))
    assert all(a.bm25 >= b.bm25 for a, b in zip(by_rank, by_rank[1:]))


def test_weighted_acceptance_sample_properties(spark):
    rows = [(i, (i % 100) + 1) for i in range(2000)]
    df = spark.createDataFrame(rows, "id long, w int")
    out = sampling.weighted_acceptance_sample(df, "id", "w")
    got = out.collect()
    # max-weight rows have p = 1 -> always kept
    kept = {r.id for r in got}
    assert all(i in kept for i, w in rows if w == 100)
    # kept fraction tracks E[p] = mean(sqrt(w/wmax)) (hash coin ~ U)
    exp = sum((w / 100) ** 0.5 for _, w in rows) / len(rows)
    frac = len(got) / len(rows)
    assert abs(frac - exp) < 0.05
    # accept_p and ht_weight are inverses (at their rounded grains)
    for r in got:
        assert abs(r.ht_weight - 1.0 / r.accept_p) < 1e-4
    # deterministic replay; independent draw under another seed
    again = sampling.weighted_acceptance_sample(df, "id", "w")
    assert {r.id for r in again.collect()} == kept
    other = sampling.weighted_acceptance_sample(df, "id", "w", seed=1)
    assert {r.id for r in other.collect()} != kept


def test_weighted_acceptance_rejects_bad_weights(spark):
    import pytest as _pytest
    bad = spark.createDataFrame(
        [(0, 5.0), (1, 0.0), (2, -3.0), (3, None), (4, float("nan"))],
        "id long, w double")
    with _pytest.raises(ValueError, match="4 row"):
        sampling.weighted_acceptance_sample(bad, "id", "w").collect()
    # validate=False is the caller-asserted-domain escape hatch.
    # Documented hazard shapes: NULL/zero weights drop silently; a
    # NEGATIVE weight survives with a NaN p; a NaN weight is worst of
    # all -- Spark's NaN-is-largest MAX makes wmax itself NaN, every
    # row's p NaN, and the whole frame is kept.  Exactly why validate
    # defaults on and now tests isnan explicitly (r13 advisor).
    no_nan = bad.filter("id <> 4")
    out = sampling.weighted_acceptance_sample(
        no_nan, "id", "w", validate=False).collect()
    ids = {r.id for r in out}
    assert 0 in ids and 1 not in ids and 3 not in ids
    poisoned = sampling.weighted_acceptance_sample(
        bad, "id", "w", validate=False).collect()
    assert {r.id for r in poisoned} == {0, 1, 2, 4}  # NaN keeps ALL
