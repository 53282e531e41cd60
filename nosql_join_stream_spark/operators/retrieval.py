"""Corpus retrieval scoring: TF-IDF and BM25, pure DataFrame ops.

Beyond the reference (which has no scoring surface; its only per-row
computation is the user mapper closure — see SURVEY.md §2.6): these are
the ranking/weighting passes of a training-data pipeline (quality-aware
sampling, query-based corpus filtering, nearest-benchmark retrieval).

Scale shape: tokenize → explode is map-side; term statistics are one
shuffle on token (partial aggregation applies); document scores are one
shuffle on doc id.  Corpus-level scalars (N, avgdl) join in via a
1-row broadcast aggregate rather than a driver-side ``.count()`` so the
whole computation stays one declarative plan — at 100 TB nothing
round-trips through the driver and AQE can pick the physical strategy.
All math is plain ``ln``/arithmetic on JVM columns (codegen, no Python).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _join_scalar(df: DataFrame, scalar: DataFrame) -> DataFrame:
    """Attach a 1-row aggregate to every row. Plans as a
    BroadcastNestedLoopJoin whose build side is a single row — the
    intended shape: a constant equi-key would constant-fold to the
    same plan, and a driver-side collect would break the single
    declarative plan. Allowlisted in tools/explain_audit.py."""
    return df.crossJoin(F.broadcast(scalar))


def _tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, tok) with repeats — lowercased, single-space split,
    empty tokens dropped (mirrors string_split(trim(lower)) in SQL)."""
    return (df.select(
                F.col(id_col),
                F.explode(F.split(F.trim(F.lower(F.col(text_col))), " "))
                 .alias("tok"))
              .filter(F.col("tok") != ""))


def collocations_pmi(df: DataFrame, text_col: str, id_col: str,
                     k: int = 20, min_count: int = 5) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information —
    corpus phrase mining (Church & Hanks 1990, public literature):
    ``PMI(a,b) = ln( (c_ab/Nb) / ((c_a/N)·(c_b/N)) )`` over adjacent
    word pairs, restricted to pairs seen ≥ ``min_count`` times (raw
    PMI over-rewards hapax pairs).  The phrases an LLM corpus pipeline
    wants as tokenizer-merge seeds, stop-phrase lists, or boilerplate
    fingerprints.

    Scale shape: adjacency comes from two length-aligned slices zipped
    JVM-side (no self-join on positions); unigram and bigram counts
    are map-side-combined hash aggregates; the two corpus totals ride
    a 1-row broadcast; the unigram table joins back by token (shuffle
    on the token key — linear).  Final top-k is a
    TakeOrderedAndProject on (pmi desc, w1, w2) with 4-dp rounding —
    a total order, so the ranking replays as SQL (the oracle).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.size(toks)
    pairs = (df.select(F.explode(F.when(
                 n_tok >= 2,
                 F.zip_with(F.slice(toks, 1, n_tok - 1),
                            F.slice(toks, 2, n_tok - 1),
                            lambda a, b: F.struct(a.alias("w1"),
                                                  b.alias("w2"))))
                 .otherwise(F.array())).alias("p"))
               .select("p.w1", "p.w2"))
    # same \s+ tokenization as the bigram side (NOT _tokens' single-
    # space split) so unigram and bigram counts describe one stream
    uni = (df.select(F.explode(toks).alias("tok"))
             .filter(F.col("tok") != "")
             .groupBy("tok").agg(F.count("*").alias("c")))
    big = (pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
                .filter(F.col("c_ab") >= min_count))
    totals = (uni.agg(F.sum("c").cast("double").alias("n_uni"))
                 .crossJoin(pairs.agg(F.count("*").cast("double")
                                      .alias("n_bi"))))
    scored = (_join_scalar(big, totals)
              .join(uni.select(F.col("tok").alias("w1"),
                               F.col("c").alias("c_a")), "w1")
              .join(uni.select(F.col("tok").alias("w2"),
                               F.col("c").alias("c_b")), "w2")
              .withColumn("pmi", F.round(F.log(
                  (F.col("c_ab") / F.col("n_bi"))
                  / ((F.col("c_a") / F.col("n_uni"))
                     * (F.col("c_b") / F.col("n_uni")))), 4)))
    # orderBy+limit -> TakeOrderedAndProject (distributed top-k; a
    # global rank window would be a single-task cliff, bm25 precedent)
    return (scored.select("w1", "w2", "c_ab", "pmi")
                  .orderBy(F.col("pmi").desc(), "w1", "w2")
                  .limit(k))


def tfidf_topk(df: DataFrame, text_col: str, id_col: str,
               k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf = ln((N+1)/(df+1)) + 1 (smoothed); score rounded to 4 dp and
    ties broken on token so the ranking is a total order (engine-
    portable).  Returns (id, tok, tfidf, rnk), rnk in 1..k.
    """
    from pyspark.sql import Window

    toks = _tokens(df, text_col, id_col)
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("tf"))
    # df (docs containing tok) = row count per tok of the tf table (one
    # row per (id, tok)), computed as a WINDOW over tf instead of a
    # second aggregate subtree: the old dfreq re-derived toks — a
    # second full-corpus explode — then joined back (guide §2.4: two
    # operations keyed the same way share one computation).  Same
    # integer df, one tokenize/explode pass instead of two.
    n_docs = df.agg(F.count("*").alias("n_docs"))
    with_df = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("tok")))
    scored = (_join_scalar(with_df, n_docs)
              .withColumn(
                    "tfidf",
                    F.round(F.col("tf") *
                            (F.log((F.col("n_docs") + 1.0) /
                                   (F.col("df") + 1.0)) + 1.0), 4)))
    w = (Window.partitionBy(id_col)
               .orderBy(F.col("tfidf").desc(), F.col("tok")))
    return (scored.withColumn("rnk", F.row_number().over(w))
                  .filter(F.col("rnk") <= k)
                  .select(id_col, "tok", "tfidf", "rnk"))


def bm25_topk(df: DataFrame, text_col: str, id_col: str,
              query_terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents by BM25 against a fixed bag of query terms.

    Robertson/Sparck-Jones idf = ln(1 + (N - df + 0.5)/(df + 0.5));
    per-term tf saturation with document-length normalization
    (k1, b). Scores rounded to 4 dp; total order (score desc, id).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # dl rides the tf groupBy key instead of its own aggregate+join
    # (row-local size(); same transform as bm25_multiquery_head —
    # guide §2.4, see its comment)
    tok_arr = F.filter(F.split(F.trim(F.lower(F.col(text_col))), " "),
                       lambda x: x != "")
    with_dl = df.select(F.col(id_col),
                        F.size(tok_arr).cast("long").alias("dl"),
                        tok_arr.alias("__toks"))
    toks = with_dl.select(id_col, "dl", F.explode("__toks").alias("tok"))
    corpus = (with_dl.select("dl").filter(F.col("dl") > 0)
                     .agg(F.avg("dl").alias("avgdl"),
                          F.count("*").alias("n_docs")))
    from pyspark.sql import Window

    tf = (toks.filter(F.col("tok").isin(query_terms))
              .groupBy(id_col, "dl", "tok").agg(F.count("*").alias("tf")))
    # df as a window over tf (one row per (id, tok) here) — replaces a
    # second aggregate over a re-derived tf subtree + broadcast join
    # (guide §2.4; see tfidf_topk)
    with_df = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("tok")))
    per_term = (_join_scalar(with_df, corpus)
                  .withColumn(
                      "idf",
                      F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) /
                            (F.col("df") + 0.5)))
                  .withColumn(
                      "w",
                      F.col("idf") * F.col("tf") * (k1 + 1.0) /
                      (F.col("tf") + k1 * (1.0 - b +
                                           b * F.col("dl") / F.col("avgdl")))))
    scores = (per_term.groupBy(id_col)
                      .agg(F.round(F.sum("w"), 4).alias("bm25"))
                      .orderBy(F.col("bm25").desc(), F.col(id_col))
                      .limit(k))
    return scores


def unigram_logprob(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram LM — the perplexity-proxy quality signal (low mean log-prob
    = rare-token soup; high = stopword-heavy boilerplate; filters cut
    both tails).

    Vocabulary counts are one token shuffle; the (token, ln p) table
    broadcasts back (vocabularies are MBs even at 100 TB); the corpus
    total joins as a 1-row broadcast aggregate.  No smoothing: the LM
    is trained on the same corpus it scores, so every token is in
    vocabulary.  Returns (id, n_tokens, mean_logprob) rounded to 4 dp.
    """
    toks = _tokens(df, text_col, id_col)
    vocab = toks.groupBy("tok").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("total"))
    scored = (_join_scalar(toks.join(F.broadcast(vocab), "tok"), total)
              .withColumn("lp", F.log(F.col("c") / F.col("total"))))
    return (scored.groupBy(id_col)
                  .agg(F.count("*").alias("n_tokens"),
                       F.round(F.avg("lp"), 4).alias("mean_logprob")))


def hybrid_rrf_topk(docs: DataFrame, emb: DataFrame, text_col: str,
                    id_col: str, query_terms: list[str],
                    query_vec: list[float], k: int = 10,
                    rrf_k: int = 60, head_n: int = 1000) -> DataFrame:
    """Hybrid lexical+semantic retrieval via reciprocal-rank fusion:
    rrf(d) = 1/(rrf_k + rank_bm25(d)) + 1/(rrf_k + rank_cosine(d)),
    missing-from-one-ranking-head contributes 0 for that component.

    The modern RAG/corpus-search pattern.  Each ranking is truncated
    to its top ``head_n`` BEFORE rank assignment — the standard RRF
    formulation (fuse each retriever's head), and the scale shape that
    matters: ``orderBy().limit(head_n)`` compiles to
    TakeOrderedAndProject (per-partition top-N, merged on one small
    node), so no full-corpus ranking ever funnels through a single
    task; the rank windows then run over ≤ head_n rows.  Ranks are
    total orders (rounded score desc, id) so fusion is engine-
    portable.  Returns (id, rrf, bm25_rank, cos_rank) top-k.
    """
    from pyspark.sql import Window

    if head_n < k:
        raise ValueError(f"head_n ({head_n}) must be >= k ({k})")
    bm = bm25_topk(docs, text_col, id_col, query_terms,
                   k=head_n)  # ranking head via TakeOrderedAndProject
    wb = Window.orderBy(F.col("bm25").desc(), F.col(id_col))
    bm = bm.select(id_col, F.row_number().over(wb).alias("bm25_rank"))

    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    dot = F.aggregate(F.zip_with(F.col("embedding"), qv,
                                 lambda a, b: a.cast("double") * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    nrm = F.sqrt(F.aggregate(
        F.transform(F.col("embedding"),
                    lambda a: a.cast("double") * a.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5
    sim = F.round(dot / (nrm * F.lit(qn)), 6)
    wc = Window.orderBy(F.col("sim").desc(), F.col(id_col))
    cos = (emb.select(F.col("vec_id").alias(id_col), sim.alias("sim"))
              .orderBy(F.col("sim").desc(), F.col(id_col)).limit(head_n)
              .select(id_col, F.row_number().over(wc).alias("cos_rank")))

    fused = (bm.join(cos, id_col, "full_outer")
               .withColumn(
                   "rrf",
                   F.round(
                       F.coalesce(1.0 / (rrf_k + F.col("bm25_rank")),
                                  F.lit(0.0))
                       + F.coalesce(1.0 / (rrf_k + F.col("cos_rank")),
                                    F.lit(0.0)), 6)))
    return (fused.orderBy(F.col("rrf").desc(), F.col(id_col))
                 .select(id_col, "rrf", "bm25_rank", "cos_rank")
                 .limit(k))


def phrase_search(df: DataFrame, text_col: str, id_col: str,
                  phrase: str) -> DataFrame:
    """Exact phrase match via a positional posting list: docs (and
    occurrence counts) where the phrase's words appear consecutively.

    Scale shape: the token stream filters to the phrase's word set
    FIRST — a tiny IN-list that prunes at scan time, so only the
    phrase words' postings (the inverted-index rows a real index
    would fetch) ever shuffle; the full text never moves.  Postings
    group per (doc, word) then fold to one position-map row per doc,
    and the adjacency check ``pos(w[i+1]) ∋ p+i`` is a pure array
    expression — overlapping occurrences included, no regex, no
    second scan.  A standing inverted index (write the (tok, doc,
    positions) table bucketed by tok via sinks.write_bucketed) makes
    repeat queries index-lookups with zero corpus-side shuffle —
    the same handoff dedup_incremental_bucketed proves.
    """
    words = phrase.strip().lower().split()
    if not words:
        raise ValueError("phrase must contain at least one word")
    toks = (df.select(
                F.col(id_col).alias("id"),
                F.posexplode(F.split(F.trim(F.lower(F.col(text_col))),
                                     r"\s+")).alias("pos", "tok"))
              .filter(F.col("tok").isin(*set(words))))
    postings = toks.groupBy("id", "tok").agg(F.collect_list("pos").alias("ps"))
    pm = (postings.groupBy("id")
                  .agg(F.map_from_entries(
                      F.collect_list(F.struct("tok", "ps"))).alias("pm")))
    first = F.col("pm").getItem(words[0])
    starts = F.filter(first, lambda p: F.lit(True) if len(words) == 1 else
                      _all_adjacent(words, p))
    # docs missing words[0] have a null map entry: size(null) = -1,
    # dropped by the n_matches > 0 gate below
    return (pm.select("id", F.size(starts).alias("n_matches"))
              .filter(F.col("n_matches") > 0))


def _all_adjacent(words: list[str], p):
    cond = None
    for i in range(1, len(words)):
        c = F.array_contains(F.col("pm").getItem(words[i]), p + i)
        cond = c if cond is None else cond & c
    return cond


def bigram_logprob(df: DataFrame, text_col: str, id_col: str,
                   alpha: float = 0.5) -> DataFrame:
    """Per-document mean bigram conditional log-probability under the
    corpus's own add-α-smoothed bigram LM — the next perplexity-proxy
    tier above :func:`unigram_logprob`: word-ORDER pathology (shuffled
    text, keyword-stuffed spam, template soup) scores low here even
    when its unigram mix looks normal.

    ``ln P(w2|w1) = ln((c(w1,w2) + α) / (c(w1·) + α·V))`` with
    ``c(w1·)`` the bigram-context total and ``V`` the unigram
    vocabulary size; smoothing keeps the scorer total (usable on docs
    outside the training corpus), though here every doc bigram is
    observed so the inner joins are lossless.

    Scale shape: adjacency from two length-aligned slices zipped
    JVM-side (the collocations_pmi pattern — no position self-join);
    bigram counts are one map-side-combined hash agg; the doc bigram
    stream re-joins the count table on the (w1, w2) key — a linear
    shuffle, NOT a broadcast, because a 100 TB bigram vocabulary is
    GBs; the context table (unigram-sized) broadcasts and V rides a
    1-row broadcast scalar.  Returns (id, n_bigrams, mean_logprob).
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_tok = F.size(toks)
    doc_pairs = (df.select(
                    F.col(id_col).alias("id"),
                    F.explode(F.when(
                        n_tok >= 2,
                        F.zip_with(F.slice(toks, 1, n_tok - 1),
                                   F.slice(toks, 2, n_tok - 1),
                                   lambda a, b: F.struct(a.alias("w1"),
                                                         b.alias("w2"))))
                     .otherwise(F.array())).alias("p"))
                   .select("id", "p.w1", "p.w2"))
    big = doc_pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_ab"))
    ctx = big.groupBy("w1").agg(F.sum("c_ab").alias("c_a"))
    vocab_n = (df.select(F.explode(toks).alias("tok"))
                 .filter(F.col("tok") != "")
                 .agg(F.countDistinct("tok").alias("v")))
    lp = F.log((F.col("c_ab") + F.lit(alpha))
               / (F.col("c_a") + F.lit(alpha) * F.col("v")))
    scored = (_join_scalar(
                 doc_pairs.join(big, ["w1", "w2"])
                          .join(F.broadcast(ctx), "w1"),
                 vocab_n)
              .withColumn("lp", lp))
    return (scored.groupBy("id")
                  .agg(F.count("*").alias("n_bigrams"),
                       F.round(F.avg("lp"), 4).alias("mean_logprob")))


# 1-indexed DCG position discounts 1/log2(rank+1), pre-rounded to 8 dp
# and embedded as LITERALS on both engines: no runtime log2 (whose last
# ulp may differ between libm builds) ever reaches a hash-checked value.
_DCG_DISCOUNTS = [round(1.0 / math.log2(r + 1), 8) for r in range(1, 101)]


def dcg_discount_literals(n: int) -> list[float]:
    """First ``n`` position discounts (shared with the SQL oracle so
    both engines index the exact same constants)."""
    return _DCG_DISCOUNTS[:n]


def bm25_multiquery_head(docs: DataFrame, text_col: str, id_col: str,
                         n_queries: int = 10, head_n: int = 20,
                         k1: float = 1.2, b: float = 0.75,
                         n_salts: int = 64,
                         query_ids=None) -> DataFrame:
    """Batched BM25: the top-``head_n`` lexical candidates for EVERY
    query in one plan — queries are the first ``n_queries`` doc ids,
    each query bag that doc's distinct tokens, self-matches excluded.
    Returns (q_id, c_id, bm25, bm_rank), bm_rank 1..head_n per query.

    PRECONDITION: the ``ids < n_queries`` query set assumes DENSE
    0-based integer ids (true of the fixture tables).  On a corpus
    with sparse or non-integer ids pass ``query_ids`` — an explicit
    iterable of ids to use as queries — instead; ``n_queries`` is then
    ignored (r12 advisor; ``mine_hard_negatives`` / ``retrieval_eval``
    inherit the same contract).

    Scale shape: the query vocab is tiny → broadcast; corpus term
    stats are computed only for tokens appearing in some query
    (broadcast semi-join before the tf aggregate).  Per-query
    candidate sets can approach the corpus (stopword-ish query
    tokens), so the ranking head is TWO-stage: a window over
    (q_id, salt) keeps head_n per salt partition, then the survivors
    (≤ n_salts·head_n per query) re-rank per q_id.  Exact: any
    global-top-head_n row is top-head_n within its own salt.  No
    window ever sees an unbounded single partition.  Scores sum at
    decimal(38,6) grain over 6-dp-rounded per-term weights, so the
    ranking and any downstream hash are independent of partial-
    aggregation order (the ROUND(SUM(double)) half-cent class).
    """
    from pyspark.sql import Window

    # dl (per-doc token count) is a ROW-LOCAL quantity: computing it
    # as size(token array) at the scan and carrying it through the tf
    # groupBy key (dl is functionally dependent on the id, so the
    # exchange is unchanged — +8 bytes/row) removes the dl aggregate
    # exchange over the full token table AND the dl equi-join behind
    # it (guide §2.4: remove shuffles outright).  The full-corpus
    # explode now runs once (tf); the corpus avgdl/n_docs scalar
    # aggregates the row-local dl with no explode at all.
    tok_arr = F.filter(F.split(F.trim(F.lower(F.col(text_col))), " "),
                       lambda x: x != "")
    with_dl = docs.select(F.col(id_col),
                          F.size(tok_arr).cast("long").alias("dl"),
                          tok_arr.alias("__toks"))
    toks = (with_dl.select(id_col, "dl",
                           F.explode("__toks").alias("tok")))
    q_pred = (F.col(id_col).isin(list(query_ids)) if query_ids is not None
              else F.col(id_col) < n_queries)
    qt = (toks.filter(q_pred)
              .select(F.col(id_col).alias("q_id"), "tok").distinct())
    qvocab = qt.select("tok").distinct()
    tf = (toks.join(F.broadcast(qvocab), "tok")
              .groupBy(id_col, "dl", "tok").agg(F.count("*").alias("tf")))
    # same population as the old toks-derived aggregate: docs with at
    # least one (non-empty) token
    corpus = (with_dl.select("dl").filter(F.col("dl") > 0)
                     .agg(F.avg("dl").alias("avgdl"),
                          F.count("*").alias("n_docs")))
    # df as a window over tf BEFORE the query fan-out and self-match
    # filter (same population the old dfreq aggregate saw) — removes
    # the duplicated tf subtree (a second full-corpus explode +
    # aggregate) and its broadcast join (guide §2.4; see tfidf_topk)
    with_df = tf.withColumn(
        "df", F.count("*").over(Window.partitionBy("tok")))
    per_term = (_join_scalar(
                    F.broadcast(qt).join(with_df, "tok")
                      .filter(F.col(id_col) != F.col("q_id")), corpus)
                .withColumn(
                    "idf",
                    F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) /
                          (F.col("df") + 0.5)))
                .withColumn(
                    "w",
                    F.col("idf") * F.col("tf") * (k1 + 1.0) /
                    (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") /
                                         F.col("avgdl")))))
    scores = (per_term
              .withColumn("w6", F.round("w", 6).cast("decimal(38,6)"))
              .groupBy("q_id", id_col)
              .agg(F.sum("w6").alias("s"))
              .withColumn("bm25", F.round(F.col("s"), 4).cast("double"))
              .select("q_id", F.col(id_col).alias("c_id"), "bm25"))
    # two-stage exact per-query top-head_n (see docstring)
    w_salt = (Window.partitionBy("q_id", "__salt")
                    .orderBy(F.col("bm25").desc(), F.col("c_id")))
    stage1 = (scores.withColumn("__salt",
                                F.pmod(F.hash("c_id"), F.lit(n_salts)))
                    .withColumn("__r1", F.row_number().over(w_salt))
                    .filter(F.col("__r1") <= head_n)
                    .drop("__salt", "__r1"))
    w_q = Window.partitionBy("q_id").orderBy(F.col("bm25").desc(),
                                             F.col("c_id"))
    return (stage1.withColumn("bm_rank", F.row_number().over(w_q))
                  .filter(F.col("bm_rank") <= head_n))


def mine_hard_negatives(docs: DataFrame, emb: DataFrame, text_col: str,
                        id_col: str, vec_id: str = "vec_id",
                        n_queries: int = 10, k_pos: int = 5,
                        n_neg: int = 5, head_n: int = 20,
                        n_salts: int = 64) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each query, the top lexically-similar documents (BM25 head) that
    are NOT among its ``k_pos`` exact-cosine semantic neighbors —
    documents that LOOK relevant to a term matcher but aren't, the
    negatives that teach a bi-encoder the most (random negatives are
    trivially separable; BM25-close-but-semantically-far is the
    standard mining recipe).

    Positives (the exact top-``k_pos`` cosine set) and the query doc
    itself are anti-joined out of the BM25 head; survivors re-rank
    1..``n_neg`` per query by (bm25 DESC, id).  Every stage is
    deterministic and SQL-expressible — full value oracle, no
    sampled/witnessed step.  Returns (q_id, neg_id, bm25, neg_rank).

    Scale shape: inherits bm25_multiquery_head's two-stage bounded
    ranking; the anti join is per-query k_pos rows broadcast; the
    final window runs over ≤ head_n rows per query.  Inherits its
    dense-0-based-integer-id precondition for the query set too (see
    bm25_multiquery_head: pass explicit ``query_ids`` there for
    sparse/non-integer id corpora).
    """
    from pyspark.sql import Window

    from nosql_join_stream_spark.operators import similarity

    if head_n < n_neg:
        raise ValueError(f"head_n ({head_n}) must be >= n_neg ({n_neg})")
    head = bm25_multiquery_head(docs, text_col, id_col,
                                n_queries=n_queries, head_n=head_n,
                                n_salts=n_salts)
    queries = (emb.filter(F.col(vec_id) < n_queries)
                  .select(F.col(vec_id).alias("q_id"), "embedding"))
    corpus_v = emb.select(F.col(vec_id).alias("c_id"), "embedding")
    pos = similarity.cosine_topk(queries, corpus_v, k=k_pos) \
                    .select("q_id", "c_id")
    w_q = Window.partitionBy("q_id").orderBy(F.col("bm25").desc(),
                                             F.col("c_id"))
    return (head.join(F.broadcast(pos), ["q_id", "c_id"], "left_anti")
                .withColumn("neg_rank", F.row_number().over(w_q))
                .filter(F.col("neg_rank") <= n_neg)
                .select("q_id", F.col("c_id").alias("neg_id"),
                        "bm25", "neg_rank"))


def retrieval_eval(docs: DataFrame, emb: DataFrame, text_col: str,
                   id_col: str, vec_id: str = "vec_id",
                   n_queries: int = 10, k: int = 10, head_n: int = 20,
                   k1: float = 1.2, b: float = 0.75,
                   n_salts: int = 64) -> DataFrame:
    """Retrieval-quality evaluation: recall@k / MRR / nDCG@k of the
    LEXICAL BM25 ranking against EXACT-cosine semantic ground truth,
    per query — the offline eval loop a RAG / search pipeline runs
    before swapping retrievers (how well does cheap lexical retrieval
    approximate the embedding ranking?).  Both sides are fully
    deterministic and SQL-expressible, so the metrics themselves are
    value-oracle-checkable (unlike evaluating an ANN index, whose
    recall is witnessed in-plan — see _ann_recall_witness).

    Queries = the first ``n_queries`` doc ids (their distinct tokens
    are the BM25 query bags; their embeddings are the semantic ground
    truth probes).  Self-matches excluded on both sides.  Requires
    dense 0-based integer ids (see bm25_multiquery_head's
    ``query_ids`` escape hatch for sparse/non-integer id corpora).

    Scale shape:
    - Query vocab is tiny → broadcast; corpus term stats computed only
      for tokens in some query (semi-join before the tf aggregate).
    - Per-query candidate sets can approach the corpus (stopword-ish
      query tokens), so the per-query ranking head is TWO-stage: a
      window over (q_id, salt) keeps head_n per salt partition, then
      the survivors (≤ n_salts·head_n per query) re-rank per q_id.
      Exact: any global-top-head_n row is top-head_n within its salt.
      No window ever sees an unbounded single partition.
    - Scores sum at decimal grain (per-term weights rounded to 6 dp →
      decimal(38,6)) so ranking and hashes are independent of partial-
      aggregation order; DCG sums pre-rounded literal discounts at
      decimal(18,8).  (The ROUND(SUM(double)) half-cent class.)

    Returns one row per query: (q_id, n_retrieved, recall_at_k, mrr,
    ndcg_at_k), doubles rounded to 4 dp.
    """
    from nosql_join_stream_spark.operators import similarity

    if head_n < k:
        raise ValueError(f"head_n ({head_n}) must be >= k ({k})")
    head = bm25_multiquery_head(docs, text_col, id_col,
                                n_queries=n_queries, head_n=head_n,
                                k1=k1, b=b, n_salts=n_salts)

    queries = (emb.filter(F.col(vec_id) < n_queries)
                  .select(F.col(vec_id).alias("q_id"), "embedding"))
    corpus_v = emb.select(F.col(vec_id).alias("c_id"), "embedding")
    truth = similarity.cosine_topk(queries, corpus_v, k=k)

    disc = F.array(*[F.lit(x) for x in dcg_discount_literals(head_n)])
    # ONE pass over head ⟗ truth (r16, guide §2.4): the old shape
    # consumed ``truth`` twice — a LEFT join for the relevance flags
    # and a separate COUNT aggregate for n_truth — which planned the
    # exact-cosine subtree (BroadcastNestedLoopJoin + window) twice
    # with no exchange reuse.  A FULL OUTER join keeps truth-only rows
    # (bm_rank NULL), so n_truth rides the same single aggregate:
    #   n_retrieved  = head rows            (bm_rank non-NULL)
    #   __n_truth    = truth rows           (__t non-NULL; NULL when a
    #                  query has no truth rows — same as the old LEFT
    #                  join against a row-less aggregate)
    #   hit/mrr/dcg conditions all require bm_rank, so truth-only rows
    #   fall to the 0/0.0 branches exactly as non-relevant head rows
    #   did.  Values are bit-identical; the cosine GEMM runs once.
    rel = head.join(truth.select("q_id", "c_id")
                         .withColumn("__t", F.lit(1)),
                    ["q_id", "c_id"], "full")
    per_q = (rel.groupBy("q_id").agg(
        F.count("bm_rank").alias("n_retrieved"),
        F.sum(F.when((F.col("__t") == 1) & (F.col("bm_rank") <= k), 1)
               .otherwise(0)).alias("__n_hit"),
        F.max(F.when((F.col("__t") == 1) & F.col("bm_rank").isNotNull(),
                     F.round(F.lit(1.0) / F.col("bm_rank"), 4))
               .otherwise(0.0)).alias("mrr"),
        F.sum(F.when((F.col("__t") == 1) & (F.col("bm_rank") <= k),
                     F.element_at(disc, F.col("bm_rank"))
                      .cast("decimal(18,8)"))
               .otherwise(F.lit(0).cast("decimal(18,8)")))
         .alias("__dcg"),
        F.sum(F.when(F.col("__t") == 1, 1)).alias("__n_truth")))
    # ideal DCG for m relevant docs = prefix sum of the discounts;
    # exact 8-dp decimal prefix sums, embedded as literals
    from decimal import Decimal
    cum, acc = [], Decimal(0)
    for x in dcg_discount_literals(k):
        acc += Decimal(str(x))
        cum.append(float(acc))
    idcg = F.array(*[F.lit(x) for x in cum])
    qids = (docs.filter(F.col(id_col) < n_queries)
                .select(F.col(id_col).alias("q_id")))
    return (qids.join(per_q, "q_id", "left")
                .select(
                    "q_id",
                    F.coalesce("n_retrieved", F.lit(0)).alias("n_retrieved"),
                    F.round(F.coalesce("__n_hit", F.lit(0)) /
                            F.col("__n_truth"), 4).alias("recall_at_k"),
                    F.coalesce("mrr", F.lit(0.0)).alias("mrr"),
                    F.round(F.coalesce(F.col("__dcg").cast("double"),
                                       F.lit(0.0)) /
                            F.element_at(idcg,
                                         F.least(F.col("__n_truth"),
                                                 F.lit(k)).cast("int")),
                            4).alias("ndcg_at_k")))
