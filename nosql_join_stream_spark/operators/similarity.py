"""Similarity search over embedding columns (array<float>).

Beyond-reference (SURVEY.md M6).  The family, in escalating scale:

- brute-force cosine top-k: exact baseline (broadcast queries × one
  corpus scan, JVM zip_with/aggregate math);
- hyperplane-LSH ANN: sign-bit bucket equi-join, data-oblivious;
- IVF ANN: k-means cells (deterministic bounded-sample Lloyd),
  data-adaptive buckets, broadcast-centroid assignment;
- int8 / product quantization: 4× resp. 64× smaller vectors for
  shortlist screening (PQ = m subspace codebooks);
- IVF+PQ top-k: the billion-scale recipe — codes-only candidate scan
  (8 bytes/vector through the join), asymmetric-distance scoring,
  exact cosine rerank of the per-query shortlist;
- bounded-block exact near-dup pairs and broadcast-GEMM k-means
  assignment for curation.

At 100 TB the corpus side stays partitioned: only buckets/cells/codes
shuffle, centroid & codebook tables broadcast, and full vectors are
touched once (scan) plus once per shortlist hit (rerank).
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


def _rank_topk(scored: DataFrame, k: int, query_id: str,
               corpus_id: str, round_to: int = 6) -> DataFrame:
    """Shared score-and-rank tail of the top-k family: exact cosine
    over the staged ``__qv``/``__cv`` pair columns, ranked per query
    on (ROUNDED sim desc, corpus id asc) and cut at ``k``.  ONE
    definition on purpose — the screened/bucketed variants are
    recall-measured against :func:`cosine_topk`, so a tie-break or
    rounding change must hit every variant at once, never drift one
    copy (r10 review: three hand-maintained copies of this block)."""
    sim = F.round(cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double"))), round_to)
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(),
                                            F.col("__cid"))
    return (scored.withColumn("sim", sim)
                  .withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("__qid").alias(query_id),
                          F.col("__cid").alias(corpus_id),
                          "sim", "rank"))


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
    scored = (F.broadcast(q).crossJoin(c)
              .filter(F.col("__qid") != F.col("__cid")))
    return _rank_topk(scored, k, query_id, corpus_id, round_to)


def mmr_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
             pool: int = 20, lam: float = 0.7,
             query_id: str = "q_id", corpus_id: str = "c_id",
             vec: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR'98 —
    public literature) diversified top-k: greedily select k results
    maximizing ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — the
    re-ranking that keeps a result page (or a RAG context window) from
    being k near-copies of the same passage.

    Two-stage shape, which is what makes it scale: stage 1 is the
    EXACT brute top-``pool`` candidate fetch per query (swap in the
    IVF probe at 100 TB — any (q_id, c_id, sim) candidate source
    works); stage 2 is the greedy selection, which only ever sees
    ``pool`` rows per query — an Arrow-batched applyInPandas kernel
    computing the pool×pool cosine matrix in one numpy GEMM.  The
    quadratic term is pool², never corpus², and each query group is
    independent (embarrassingly parallel across the cluster).

    Determinism (the full-value-oracle contract): relevance and
    candidate-candidate sims round to 6 dp, the greedy score rounds
    to 6 dp, ties break to the smallest ``c_id`` — so the selection
    unrolls to plain SQL (the registered oracle replays it stage by
    stage).  Rank 1 carries score λ·rel (no diversity term yet).
    Returns (q_id, c_id, rel, mmr_score, rank).
    """
    lam = float(lam)
    mu = 1.0 - lam  # bind ONCE in python so both engines use the
    #                 identical double (1-0.7 is 0.30000000000000004)
    cand = cosine_topk(queries, corpus, k=pool,
                       query_id=query_id, corpus_id=corpus_id, vec=vec)
    withv = cand.join(corpus.select(F.col(corpus_id), F.col(vec)),
                      corpus_id)

    def kernel(pdf):
        import numpy as _np
        import pandas as _pd

        def r6(x):
            # round-half-AWAY-from-zero, matching Spark F.round and
            # DuckDB ROUND.  numpy's half-EVEN diverges here for real:
            # scores are arithmetic on 6-dp decimals (lam*rel - mu*div),
            # which lands on exact x.xxxxxx5 boundaries routinely —
            # caught as a 1-ulp oracle mismatch at sf0.001.
            return _np.floor(_np.abs(x) * 1e6 + 0.5) / 1e6 * _np.sign(x)

        pdf = pdf.sort_values(corpus_id).reset_index(drop=True)
        V = _np.stack(pdf[vec].to_list()).astype("float64")
        nv = _np.linalg.norm(V, axis=1, keepdims=True)
        nv[nv == 0] = 1.0
        vn = V / nv
        S = r6(vn @ vn.T)
        rel = pdf["sim"].to_numpy(dtype="float64")
        n = len(pdf)
        selected: list[int] = []
        remaining = list(range(n))  # ascending c_id: first strict max
        rows = []                   # wins ties -> smallest id
        for step in range(min(k, n)):
            best_sc, best_i = None, None
            for i in remaining:
                if step == 0:
                    sc = float(r6(lam * rel[i]))
                else:
                    div = max(S[i, j] for j in selected)
                    sc = float(r6(lam * rel[i] - mu * div))
                if best_sc is None or sc > best_sc:
                    best_sc, best_i = sc, i
            selected.append(best_i)
            remaining.remove(best_i)
            rows.append((int(pdf[query_id].iloc[0]),
                         int(pdf[corpus_id].iloc[best_i]),
                         float(rel[best_i]), best_sc, step + 1))
        return _pd.DataFrame(rows, columns=[query_id, corpus_id,
                                            "rel", "mmr_score", "rank"])

    return (withv.groupBy(query_id)
            .applyInPandas(kernel,
                           schema=f"{query_id} long, {corpus_id} long, "
                                  "rel double, mmr_score double, rank int"))


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
    scored = (F.broadcast(q).join(c, "__b")
              .filter(F.col("__qid") != F.col("__cid")))
    return _rank_topk(scored, k, query_id, corpus_id)


def embedding_dim_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension health/drift statistics (mean, sample std, min,
    max) over an embedding column — the standard monitor for encoder
    drift, dead dimensions, and normalization bugs in a training-data
    pipeline.

    Scale shape: posexplode multiplies rows by dim, but the groupBy
    aggregates map-side (partial combine) down to dim rows per
    partition before the only shuffle — at any corpus size the
    exchange carries O(dim x partitions) rows, so the job stays
    scan-bound.  Dims are reported 1-based.
    """
    ex = df.select(F.posexplode(F.col(vec_col)).alias("pos", "v")) \
           .select((F.col("pos") + 1).alias("dim"),
                   F.col("v").cast("double").alias("v"))
    return (ex.groupBy("dim")
              .agg(F.round(F.avg("v"), 4).alias("mean"),
                   F.round(F.stddev_samp("v"), 4).alias("std"),
                   F.round(F.min("v"), 4).alias("vmin"),
                   F.round(F.max("v"), 4).alias("vmax")))


def embedding_covariance(df: DataFrame, vec_col: str = "embedding",
                         dims: int | None = None) -> DataFrame:
    """Full covariance matrix of an embedding column — the input to
    PCA/whitening/Mahalanobis and the pairwise generalization of
    :func:`embedding_dim_stats`.  Returns (i, j, cov) 1-based,
    population covariance, rounded to 6.

    Scale shape: two chained ``posexplode`` generators fan each row
    out to D² (i, j, x_i·x_j) tuples INSIDE whole-stage codegen, and
    the partial hash aggregate collapses them to D² rows per task
    before the only shuffle — the exchange carries O(D² × partitions)
    rows at any corpus size, the same scan-bound shape as
    ``embedding_dim_stats`` (its D² analog).  E[x_i] rides the same
    pass (grouped by (i,j), avg(x_i) IS E[x_i]), so one scan suffices.
    ``dims`` optionally restricts to the leading dims (slices before
    the fan-out, so the blowup is dims², not D²)."""
    rows = _cov_rows(df, vec_col, dims)
    return rows.select((F.col("pi") + 1).alias("i"),
                       (F.col("pj") + 1).alias("j"),
                       F.round(F.col("exy")
                               - F.col("ex") * F.col("ey"),
                               6).alias("cov"))


def _cov_rows(df: DataFrame, vec_col: str,
              dims: "int | None" = None) -> DataFrame:
    """The one covariance aggregation (0-based (pi, pj, exy, ex, ey)
    rows, unrounded) shared by :func:`embedding_covariance` and
    :func:`pca_components` — ONE definition so a cast/null-handling
    change cannot silently drift the PCA training pass away from the
    oracle-checked covariance operator (r10 review: two hand-
    maintained copies of the double-posexplode block)."""
    v = F.col(vec_col)
    if dims is not None:
        v = F.slice(v, 1, int(dims))
    a = df.select(F.posexplode(v).alias("pi", "xi"), v.alias("__v"))
    b = a.select("pi", "xi", F.posexplode("__v").alias("pj", "xj"))
    return (b.groupBy("pi", "pj")
             .agg(F.avg(F.col("xi").cast("double")
                        * F.col("xj").cast("double")).alias("exy"),
                  F.avg(F.col("xi").cast("double")).alias("ex"),
                  F.avg(F.col("xj").cast("double")).alias("ey")))


def _jl_sign(i, j):
    """Deterministic ±1 from pure integer arithmetic — the projection
    matrix entry both Spark and any oracle engine recompute exactly
    (no shared hash function needed): TWO middle-square rounds over a
    16-bit seed, ``h₀ = (25173·i + 13849·j + 7919) mod 2¹⁶``,
    ``hₙ₊₁ = (hₙ² ≫ 8) mod 2¹⁶``, sign bit ``(h₂ ≫ 8) & 1``.

    History of this entry (each step caught by a probe or review):
    the first draft used ``(i·31 + j·17) mod 2`` — the parity of i+j,
    an outer product of two sign vectors, RANK 1.  The second took a
    LOW bit of one bounded square, ``(h₀² ≫ 7) & 1`` — but bit 7 of a
    square depends only on h mod 2⁸, making the matrix 256-PERIODIC
    in i and j with a hard rank ceiling of 120: fine on the small
    pinned shapes, deficient at encoder shapes (768→128 rank 120).
    The fix is structural, not a constant tweak: take a HIGH bit
    (bit 8 of the ≫8-shifted square depends on the full 16-bit h)
    and iterate the square twice so the affine seed's lattice
    structure is destroyed.  Every intermediate stays under 2³²
    (exact int64 in any engine at any D).  numpy sweep (encoder
    shapes 768×128 / 1536×256 / 3072×384, every K≤D≤768 power pair,
    30 random rectangles): NO structural deficiency — rectangular
    screening shapes are full rank; square shapes can coincidentally
    drop rank by 1, the same rate a truly random ±1 matrix exhibits
    (a random sign matrix is not guaranteed full rank either).
    Residual column-mean bias ≤0.03 on big shapes (vs +0.125 for the
    low-bit draft)."""
    h = (i.cast("long") * 25173 + j.cast("long") * 13849 + 7919) % 65536
    h = F.shiftright(h * h, 8) % 65536
    h = F.shiftright(h * h, 8) % 65536
    return F.lit(1) - F.lit(2) * (F.shiftright(h, 8) % 2)


def jl_project(df: DataFrame, out_dim: int, id_col: str = "vec_id",
               vec_col: str = "embedding", flat: bool = True) -> DataFrame:
    """Johnson–Lindenstrauss random projection D → ``out_dim`` with a
    deterministic Rademacher (±1/√k) matrix — the cheap dimensionality
    reducer in front of ANN/clustering when encoder dims are wasteful
    (pairwise distances preserved within the JL bound in expectation).

    Scale shape: entirely row-local — ``transform`` over the output
    index builds each y_j as a sequential ``aggregate`` fold over the
    input array (JVM higher-order functions, no UDF), then one
    ``posexplode`` emits long-form (id, j, y) rows.  NO shuffle at any
    corpus size (contrast a groupBy formulation, which would exchange
    N×k rows).  The matrix entry is closed-form integer arithmetic
    (:func:`_jl_sign`), so an oracle reproduces values bit-for-bit
    after the shared ×10⁻⁶ rounding."""
    k = int(out_dim)
    if k < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    scale = F.lit(1.0) / F.sqrt(F.lit(float(k)))
    y = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.round(
            F.aggregate(
                F.transform(F.col(vec_col),
                            lambda x, i: x.cast("double")
                            * _jl_sign(i, j).cast("double")),
                F.lit(0.0), lambda acc, x: acc + x) * scale, 6))
    if not flat:
        # vector form for downstream similarity ops (still row-local)
        return df.select(F.col(id_col), y.alias("jl_embedding"))
    return (df.select(F.col(id_col), F.posexplode(y).alias("j", "y"))
              .select(id_col, "j", "y"))


def ann_jl_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                out_dim: int = 16, pool: int = 50,
                query_id: str = "q_id", corpus_id: str = "c_id",
                vec: str = "embedding") -> DataFrame:
    """ANN through a JL screen: both sides project D → ``out_dim``
    (shuffle-free, deterministic matrix), candidates are the reduced-
    space cosine top-``pool`` per query, and the final top-``k`` is an
    EXACT full-space cosine rerank over only those candidates.

    What the screen buys at 100 TB: the pair SPACE is unchanged (pair
    pruning is LSH/IVF's job — compose them), but every screening
    pair costs out_dim/D of the flops and shuffle bytes (64→16 = 4×),
    and the expensive full-width vectors are touched for only
    |queries|×pool candidate rows.  Same rounded-sim + id tie-break
    determinism as :func:`cosine_topk`, so recall against the exact
    head is a stable, engine-independent number.

    Regime note (JL theory, honestly): neighborhood recall survives
    the screen only when neighbor gaps exceed the JL distortion
    ε ≈ √(8·ln n / out_dim) — true for structured/clustered
    embeddings (the realistic case, pytest-pinned on planted
    structure), NOT for near-isotropic random vectors, where top-k
    neighbors are separated by O(1/√D) gaps no 64→16 projection can
    keep (measured 0.30 recall@pool-50 on the synthetic TESTDATA
    embeddings — which is why this ships as an operator for
    composition, not as a recall-witnessed registry query on that
    table)."""
    if pool < k:
        raise ValueError(
            f"pool ({pool}) must be >= k ({k}): the rerank can only "
            f"return candidates the screen admitted")
    qr = (jl_project(queries, out_dim, id_col=query_id, vec_col=vec,
                     flat=False)
          .withColumnRenamed("jl_embedding", vec))
    cr = (jl_project(corpus, out_dim, id_col=corpus_id, vec_col=vec,
                     flat=False)
          .withColumnRenamed("jl_embedding", vec))
    cand = cosine_topk(qr, cr, k=pool, query_id=query_id,
                       corpus_id=corpus_id, vec=vec) \
        .select(query_id, corpus_id)
    q = queries.select(F.col(query_id).alias("__qid"),
                       F.col(vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("__cid"),
                      F.col(vec).alias("__cv"))
    # join DIRECTION matters at scale: the candidate frame is only
    # |queries| x pool rows — broadcast it (with the query vectors
    # already attached) INTO the corpus scan, so the full-width
    # corpus vectors are probed in place and never shuffled.  The
    # naive cand.join(c, corpus_id) plans a shuffle of every corpus
    # vector (r10 review catch), negating the screen's savings.
    cand_q = (cand.select(F.col(query_id).alias("__qid"),
                          F.col(corpus_id).alias("__cid"))
              .join(F.broadcast(q), "__qid"))
    scored = c.join(F.broadcast(cand_q), "__cid")
    return _rank_topk(scored, k, query_id, corpus_id)


def pca_components(df: DataFrame, k: int,
                   vec_col: str = "embedding") -> "tuple":
    """Top-``k`` principal components of an embedding column.
    Distributed covariance (one scan, O(D²) exchange —
    :func:`embedding_covariance` before rounding), then an eigh of
    the D×D matrix on the driver — bounded by DIMENSION, never corpus
    size (the centroid/codebook precedent: similarity.py:242,537).
    Returns (components ndarray (k, D) rows=components, eigenvalues
    ndarray (k,), mean ndarray (D,))."""
    import numpy as np

    rows = _cov_rows(df, vec_col).collect()
    # D² rows — bounded by dimension, not corpus
    D = max(r["pi"] for r in rows) + 1
    cov = np.zeros((D, D))
    mean = np.zeros(D)
    for r in rows:
        cov[r["pi"], r["pj"]] = r["exy"]
        if r["pj"] == 0:
            mean[r["pi"]] = r["ex"]
    cov -= np.outer(mean, mean)
    w, vecs = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:int(k)]
    comps = vecs[:, order].T               # (k, D)
    # sign convention: largest-|.| coordinate positive → deterministic
    for c in comps:
        m = np.argmax(np.abs(c))
        if c[m] < 0:
            c *= -1
    return comps, w[order], mean


def pca_project(df: DataFrame, k: int, id_col: str = "vec_id",
                vec_col: str = "embedding",
                components=None, mean=None,
                whiten_eigenvalues=None) -> DataFrame:
    """Project embeddings onto the top-``k`` principal components —
    long-form (id, comp, y) rows, comp 0-based.  The (k, D) component
    matrix rides into the plan as LITERALS (k·D doubles — broadcast-
    by-constant-folding), and the per-row projection is the same
    shuffle-free transform/aggregate fold as :func:`jl_project`; the
    only non-scan cost is the one covariance pass inside
    :func:`pca_components` (skipped when ``components``/``mean`` are
    passed in — the train-once/apply-many deployment shape).

    ``whiten_eigenvalues``: pass the matching eigenvalues to WHITEN —
    each component scales by 1/√λ so the output has unit variance per
    dimension (decorrelated + isotropic, the preprocessing contrastive
    objectives and Mahalanobis retrieval want).  Scaling folds into
    the literal matrix, so whitening costs nothing at run time."""
    if components is None or mean is None:
        components, eig, mean = pca_components(df, k, vec_col)
        if whiten_eigenvalues is True:
            whiten_eigenvalues = eig
    elif whiten_eigenvalues is True:
        # apply-mode has no eigenvalues to resolve True against —
        # without this guard the scale comprehension iterates a bool
        # (TypeError deep in the fold; r10 review catch)
        raise ValueError(
            "whiten_eigenvalues=True only works when pca_project "
            "trains (components/mean omitted); in apply mode pass "
            "the eigenvalue array from pca_components")
    comps = [[float(x) for x in row] for row in components]
    if whiten_eigenvalues is not None and whiten_eigenvalues is not False:
        import math

        scales = [1.0 / math.sqrt(float(ev)) if float(ev) > 0 else 0.0
                  for ev in whiten_eigenvalues]
        if len(scales) != len(comps):
            raise ValueError(
                f"whiten_eigenvalues has {len(scales)} entries for "
                f"{len(comps)} components")
        comps = [[w * s for w in comp]
                 for comp, s in zip(comps, scales)]
    # centering folds into a constant per component: (x − μ)·w =
    # x·w − μ·w, and μ·w is driver-side arithmetic
    offs = [float(sum(m * w for m, w in zip(mean, comp)))
            for comp in comps]

    def proj(comp, off):
        # closure, NOT a lambda default arg: higher-order-function
        # lambdas must take exactly (x) or (x, i)
        arr = F.array(*[F.lit(w) for w in comp])
        return F.round(
            F.aggregate(
                F.transform(F.col(vec_col),
                            lambda x, i: x.cast("double")
                            * F.get(arr, i)),
                F.lit(0.0), lambda acc, x: acc + x) - F.lit(off), 6)

    y = F.array(*[proj(c, o) for c, o in zip(comps, offs)])
    return (df.select(F.col(id_col), F.posexplode(y).alias("comp", "y"))
              .select(id_col, "comp", "y"))


def quantize_embeddings(df: DataFrame, id_col: str = "vec_id",
                        vec: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x|/127,
    q_i = round(x_i / scale).  4× storage/shuffle reduction for ANN
    recall screening (rerank on the fp originals).  Pure JVM array
    expressions — runs at scan speed, no Python."""
    v = F.transform(F.col(vec), lambda x: x.cast("double"))
    absmax = F.array_max(F.transform(v, F.abs))
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x / scale).cast("int"))
    return df.select(F.col(id_col),
                     F.round(scale, 8).alias("scale"),
                     q.alias("q_embedding"))


def _ivf_centroids(corpus: DataFrame, vec: str, id_col: str,
                   n_cells: int, sample: int = 4096, iters: int = 8):
    """Deterministic spherical k-means centroids on a bounded,
    id-ordered sample (driver-side numpy — the centroid table is tiny;
    the corpus itself never leaves the executors).  Init = evenly
    strided sample rows; Lloyd iterations with cosine assignment."""
    import numpy as np

    pdf = corpus.select(id_col, vec).orderBy(id_col).limit(sample).toPandas()
    m = np.stack(pdf[vec].to_list()).astype("float64")
    nm = np.linalg.norm(m, axis=1, keepdims=True)
    nm[nm == 0] = 1.0
    m = m / nm
    step = max(1, len(m) // n_cells)
    c = m[::step][:n_cells].copy()
    for _ in range(iters):
        assign = (m @ c.T).argmax(axis=1)
        for j in range(len(c)):
            pts = m[assign == j]
            if len(pts):
                v = pts.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    c[j] = v / n
    return c


def ann_ivf_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                 n_cells: int = 16, nprobe: int = 4,
                 query_id: str = "q_id", corpus_id: str = "c_id",
                 vec: str = "embedding") -> DataFrame:
    """IVF (inverted-file) ANN: k-means cells instead of hyperplanes —
    same join shape as ann_lsh_topk, but data-adaptive buckets.

    Corpus vectors are assigned to their nearest centroid once (one
    narrow mapInPandas pass, no shuffle of the corpus); each query
    probes its ``nprobe`` nearest cells; a broadcast cell equi-join +
    exact cosine rerank yields top-k.  Recall grows with
    nprobe/n_cells; precision within the probed set is exact.  At
    100 TB: centroids are a broadcast table, the corpus is written
    partitioned by cell, and a probe reads only nprobe/n_cells of it.
    """
    spark = corpus.sparkSession
    cents = _ivf_centroids(corpus, vec, corpus_id, n_cells)
    bc = spark.sparkContext.broadcast(cents)

    def assign_corpus(batches):
        import numpy as _np
        import pandas as _pd
        c = bc.value
        for part in batches:
            if len(part) == 0:
                continue
            v = _np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = _np.linalg.norm(v, axis=1, keepdims=True)
            nv[nv == 0] = 1.0  # zero vector -> cell 0, not NaN-argmax
            vn = v / nv
            cell = (vn @ c.T).argmax(axis=1).astype("int32")
            yield _pd.DataFrame({"__cid": part.iloc[:, 0], "__cell": cell,
                                 "__cv": part.iloc[:, 1]})

    def assign_queries(batches):
        import numpy as _np
        import pandas as _pd
        c = bc.value
        np_ = min(nprobe, len(c))
        for part in batches:
            if len(part) == 0:
                continue
            v = _np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = _np.linalg.norm(v, axis=1, keepdims=True)
            nv[nv == 0] = 1.0  # zero vector -> cell 0, not NaN-argmax
            vn = v / nv
            order = _np.argsort(-(vn @ c.T), axis=1)[:, :np_]
            out = part.loc[part.index.repeat(np_)]
            yield _pd.DataFrame({"__qid": out.iloc[:, 0],
                                 "__cell": order.reshape(-1).astype("int32"),
                                 "__qv": out.iloc[:, 1]})

    vec_t = dict(corpus.dtypes)[vec]
    c_assigned = corpus.select(F.col(corpus_id), F.col(vec)).mapInPandas(
        assign_corpus, schema=f"__cid long, __cell int, __cv {vec_t}")
    q_assigned = queries.select(F.col(query_id), F.col(vec)).mapInPandas(
        assign_queries, schema=f"__qid long, __cell int, __qv {vec_t}")
    sim = F.round(cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double"))), 6)
    scored = (F.broadcast(q_assigned).join(c_assigned, "__cell")
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
                             block_ids=None,
                             max_block_rows: int = 65536) -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs (id1 < id2, sim ≥ τ).

    CELLED single-plan pair space (r8-VERDICT lead #4; the
    ``semantic_dedup`` blocking pattern applied to the exact
    all-pairs problem): rows hash into ``ceil(n / max_block_rows)``
    cells on ``xxhash64(id)``; each row is replicated once per cell
    to the unordered cell-pair key ``(least(cell, j), greatest(cell,
    j))``, so the group for pair (a, b) holds exactly the rows of
    cells a and b; one ``applyInPandas`` then runs a chunked GEMM per
    group (cross-cell rectangle, within-cell triangle) and emits each
    qualifying pair exactly once — cross pairs in their one (a, b)
    group, within pairs via the id1 < id2 triangle of (a, a).  ONE
    shuffle of n × n_cells replicated rows, every cell pair a
    parallel task, NOTHING through the driver — the r2–r8 form ran
    ``n_cells`` sequential driver-side ``toPandas`` block loops.  The
    O(n²) GEMM work is inherent to the exact answer and unchanged;
    this is the EXACT path — the sub-quadratic scale path is
    ann_lsh_topk / MinHash banding.  Per-group memory is bounded: ≤
    2 × max_block_rows vectors in, GEMM chunked to ~4M-element sim
    tiles.  A corpus at or below ``max_block_rows`` keeps the
    zero-shuffle broadcast fast path (block matrix broadcast, corpus
    streams through mapInPandas).

    ``block_ids``: restrict the broadcast side to an explicit id list
    (e.g. one LSH bucket) — single bounded block, caller-controlled.
    """
    import math

    import numpy as np

    spark = df.sparkSession
    base = df.select(F.col(id_col), F.col(vec))
    thr = float(threshold)
    id_name, vec_name = id_col, vec

    def pairs_against(block_pdf) -> DataFrame:
        ids = block_pdf[id_name].to_numpy().astype("int64")
        m = np.stack(block_pdf[vec_name].to_list()).astype("float64")
        nm = np.linalg.norm(m, axis=1, keepdims=True)
        nm[nm == 0] = 1.0
        m = m / nm
        b = spark.sparkContext.broadcast((ids, m))

        def op(batches):
            import numpy as _np
            import pandas as _pd
            bids, bm = b.value
            for part in batches:
                if len(part) == 0:
                    continue
                vids = part[id_name].to_numpy().astype("int64")
                v = _np.stack(part[vec_name].to_list()).astype("float64")
                nv = _np.linalg.norm(v, axis=1, keepdims=True)
                nv[nv == 0] = 1.0
                v = v / nv
                sims = _np.round(v @ bm.T, 6)
                rows, cols = _np.where(sims >= thr)
                i1, i2 = vids[rows], bids[cols]
                keep = i1 < i2
                yield _pd.DataFrame({"id1": i1[keep], "id2": i2[keep],
                                     "sim": sims[rows, cols][keep]})

        return base.mapInPandas(op, schema="id1 long, id2 long, sim double")

    if block_ids is not None:
        return pairs_against(
            base.filter(F.col(id_col).isin(*block_ids)).toPandas())

    n_cells = max(1, math.ceil(base.count() / max_block_rows))
    if n_cells == 1:
        return pairs_against(base.toPandas())

    def cell_pair_kernel(key, pdf):
        import numpy as _np
        import pandas as _pd
        lo, hi = key
        out_i1, out_i2, out_s = [], [], []

        def side(cell):
            rows = pdf[pdf["__cell"] == cell]
            ids = rows[id_name].to_numpy().astype("int64")
            if len(rows) == 0:
                # a hash-empty cell paired with a non-empty one: np.stack
                # on zero arrays would raise, so short-circuit to an empty
                # (ids, matrix) pair — the GEMM loop below is a no-op
                return ids, _np.empty((0, 0), dtype="float64")
            m = _np.stack(rows[vec_name].to_list()).astype("float64")
            nm = _np.linalg.norm(m, axis=1, keepdims=True)
            nm[nm == 0] = 1.0
            return ids, m / nm

        ids_a, ma = side(lo)
        ids_b, mb = (ids_a, ma) if lo == hi else side(hi)
        if len(ids_a) == 0 or len(ids_b) == 0:
            return _pd.DataFrame({
                "id1": _np.array([], dtype="int64"),
                "id2": _np.array([], dtype="int64"),
                "sim": _np.array([], dtype="float64")})
        # chunk the GEMM so the sim tile stays ~4M doubles (32 MB)
        step = max(1, 4_194_304 // max(1, len(ids_b)))
        for s in range(0, len(ids_a), step):
            sims = _np.round(ma[s:s + step] @ mb.T, 6)
            rows, cols = _np.where(sims >= thr)
            x, y = ids_a[rows + s], ids_b[cols]
            vals = sims[rows, cols]
            if lo == hi:
                # symmetric matrix: the id1 < id2 triangle dedups the
                # two orientations and drops self-pairs
                keep = x < y
                x, y, vals = x[keep], y[keep], vals[keep]
                i1, i2 = x, y
            else:
                # cross rectangle: each pair appears exactly once
                # (cells are disjoint, so x != y); orient by id
                i1 = _np.minimum(x, y)
                i2 = _np.maximum(x, y)
            out_i1.append(i1)
            out_i2.append(i2)
            out_s.append(vals)
        return _pd.DataFrame({
            "id1": _np.concatenate(out_i1) if out_i1 else
            _np.array([], dtype="int64"),
            "id2": _np.concatenate(out_i2) if out_i2 else
            _np.array([], dtype="int64"),
            "sim": _np.concatenate(out_s) if out_s else
            _np.array([], dtype="float64")})

    cells = base.withColumn(
        "__cell",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_cells)).cast("int"))
    rep = (cells
           .withColumn("__j", F.explode(F.sequence(
               F.lit(0), F.lit(n_cells - 1))))
           .withColumn("__lo", F.least("__cell", "__j"))
           .withColumn("__hi", F.greatest("__cell", "__j"))
           .drop("__j"))
    return rep.groupBy("__lo", "__hi").applyInPandas(
        cell_pair_kernel, schema="id1 long, id2 long, sim double")


def embedding_near_dup_pairs_banded(df: DataFrame, id_col: str = "vec_id",
                                    vec: str = "embedding",
                                    threshold: float = 0.9,
                                    n_bands: int = 8, band_planes: int = 8,
                                    dim: int = 64) -> DataFrame:
    """BANDED embedding-cosine near-duplicate pairs — the sub-quadratic
    scale tier of ``embedding_near_dup_pairs`` (which is exact but
    inherently O(n²) GEMM work).  The MinHash-LSH banding recipe
    applied to hyperplane sign hashes: ``n_bands`` bands of
    ``band_planes`` sign bits each; a pair is a CANDIDATE iff it
    collides in at least one band; candidates are verified with the
    exact cosine, so precision is 1 — recall is the banded part
    (P[collide] = 1-(1-s^r)^b for sign-agreement rate s).  Identical
    vectors agree on every sign bit, so sim=1.0 pairs are found with
    probability 1 — the planted-translation regime this backs
    (mine_bitext_planted_recall) is exact-recoverable by construction.

    Scale shape (the 100 TB path): one narrow scan computes all band
    keys, rows explode ×n_bands, the self-join shuffles on
    (band, key) — linear in rows and candidates, never all-pairs;
    duplicate candidates across bands collapse with a distinct BEFORE
    embeddings re-attach, so each surviving pair does exactly one
    cosine.  Hyperplanes are the same SHA-256 counter-mode planes as
    ann_lsh_topk — deterministic everywhere, no RNG.
    """
    import numpy as np

    planes = np.asarray(_hyperplanes(n_bands * band_planes, dim),
                        dtype="float64")
    base = df.select(F.col(id_col).alias("__id"), F.col(vec).alias("__v"))
    spark = df.sparkSession
    bplanes = spark.sparkContext.broadcast(planes)
    nb, bp = n_bands, band_planes

    def band_keys(batches):
        # ONE numpy GEMM per Arrow batch computes every sign bit; the
        # equivalent Catalyst tree (n_bands·band_planes dot-aggregates
        # per row, evaluated on BOTH sides of the self-join) planned
        # and ran ~10x slower — the vectorized-UDF exception the
        # module policy allows
        import numpy as _np
        import pandas as _pd
        P = bplanes.value
        shifts = _np.arange(bp, dtype="int64")
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = _np.stack(pdf["__v"].to_list()).astype("float64")
            bits = (m @ P.T > 0).astype("int64")           # (n, nb*bp)
            keys = (bits.reshape(len(m), nb, bp)
                    << shifts[None, None, :]).sum(axis=2)  # (n, nb)
            ids = pdf["__id"].to_numpy().astype("int64")
            yield _pd.DataFrame({
                "__id": _np.repeat(ids, nb),
                "__band": _np.tile(_np.arange(nb, dtype="int64"), len(m)),
                "__key": keys.reshape(-1)})

    hashed = base.mapInPandas(
        band_keys, schema="__id long, __band long, __key long")
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (a.join(b, (F.col("a.__band") == F.col("b.__band"))
                   & (F.col("a.__key") == F.col("b.__key"))
                   & (F.col("a.__id") < F.col("b.__id")))
             .select(F.col("a.__id").alias("id1"),
                     F.col("b.__id").alias("id2"))
             .distinct())
    return _verify_candidate_pairs(cand, base, threshold)


def _verify_candidate_pairs(cand: DataFrame, base: DataFrame,
                            threshold: float) -> DataFrame:
    """Exact-cosine verification of a (id1, id2) candidate set:
    re-attach embeddings with two hash joins, then one vectorized
    Arrow batch per task computes row-wise cosines (the equivalent
    zip_with/aggregate Catalyst tree costs ~10x on 64-dim vectors).
    Shared by the banded (LSH) and IVF-celled candidate tiers —
    precision 1 by construction, the tier only decides recall."""
    e1 = base.select(F.col("__id").alias("id1"), F.col("__v").alias("__v1"))
    e2 = base.select(F.col("__id").alias("id2"), F.col("__v").alias("__v2"))
    thr = float(threshold)

    def verify(batches):
        import numpy as _np
        import pandas as _pd
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m1 = _np.stack(pdf["__v1"].to_list()).astype("float64")
            m2 = _np.stack(pdf["__v2"].to_list()).astype("float64")
            num = _np.einsum("ij,ij->i", m1, m2)
            den = (_np.linalg.norm(m1, axis=1)
                   * _np.linalg.norm(m2, axis=1))
            sims = _np.where(den == 0, 0.0, _np.round(num
                                                      / _np.where(den == 0,
                                                                  1.0, den),
                                                      6))
            keep = sims >= thr
            yield _pd.DataFrame({"id1": pdf["id1"].to_numpy()[keep],
                                 "id2": pdf["id2"].to_numpy()[keep],
                                 "sim": sims[keep]})

    return (cand.join(e1, "id1").join(e2, "id2")
                .mapInPandas(verify, schema="id1 long, id2 long, sim double"))


def embedding_near_dup_pairs_ivf(df: DataFrame, id_col: str = "vec_id",
                                 vec: str = "embedding",
                                 threshold: float = 0.9,
                                 k: int = 8) -> DataFrame:
    """IVF-CELLED near-duplicate pairs — the coarse-quantizer sibling
    of the banded LSH tier: candidates are pairs sharing a nearest-
    centroid cell (``cluster_assign``'s deterministic assignment —
    centroids = k smallest ids, 6-dp cosine, lowest-cid tie-break, so
    an oracle can reproduce the cells), verified with the exact cosine
    (shared _verify_candidate_pairs; precision 1).  Identical vectors
    assign to the same cell by determinism of the kernel, so
    planted-twin recall is 1 — the same exact-recoverable regime as
    the banded tier.

    Scale shape: one broadcast GEMM assigns cells (no corpus shuffle),
    the candidate join shuffles on cell id; per-cell pair space is
    O(cell²), so ``k`` must scale with the corpus (k ≈ n/target_cell).
    For open-ended pair MINING the banded tier's fixed-size buckets
    scale better; the IVF tier fits mining within semantically
    coherent cells (cluster-level curation) and reuses the standing
    IVF layout the ANN family already maintains.
    """
    assign = cluster_assign(df, k=k, id_col=id_col, vec=vec)
    # Per-cell GEMM verify (the semantic_dedup kernel shape): the old
    # form materialized the full O(cell²) candidate-pair table with
    # BOTH embeddings attached per row — hundreds of MB of duplicated
    # vector payload through two joins and the Arrow boundary, to
    # compute sims the cell's own |cell|×d matrix already determines
    # (guide §8: move the decision to the small representation, never
    # ship the payload per pair).  Each vector now crosses once, one
    # dense GEMM per cell emits exactly the id1 < id2, sim ≥ τ pairs.
    thr = float(threshold)
    vecs = df.select(F.col(id_col).alias("__id"),
                     F.transform(vec, lambda x: x.cast("double"))
                      .alias("__v"))
    cells = (assign.select(F.col(id_col).alias("__id"), "cluster_id")
                   .join(vecs, "__id"))

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd
        empty = pd.DataFrame({"id1": pd.Series(dtype="int64"),
                              "id2": pd.Series(dtype="int64"),
                              "sim": pd.Series(dtype="float64")})
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("__id")
        x = np.stack(pdf["__v"].to_list()).astype("float64")
        num = x @ x.T
        nrm = np.linalg.norm(x, axis=1)
        den = np.outer(nrm, nrm)
        # same arithmetic as _verify_candidate_pairs: raw dot / norm
        # product, zero-norm rows pinned to 0.0, THEN round to 6 dp
        s = np.where(den == 0, 0.0,
                     np.round(num / np.where(den == 0, 1.0, den), 6))
        iu = np.triu_indices(len(pdf), 1)
        mask = s[iu] >= thr
        ids = pdf["__id"].to_numpy().astype("int64")
        return pd.DataFrame({"id1": ids[iu[0][mask]],
                             "id2": ids[iu[1][mask]],
                             "sim": s[iu][mask]})

    return (cells.groupBy("cluster_id")
                 .applyInPandas(cell_pairs, "id1 long, id2 long, sim double"))


def cluster_assign(df: DataFrame, k: int = 8, id_col: str = "vec_id",
                   vec: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment for semantic curation (cluster-then-
    balance mixtures, cluster-level dedup/filtering).

    Centroids = the ``k`` rows with the smallest ids — a deterministic,
    engine-portable seeding (an oracle can reproduce it; k-means++
    can't).  Centroids broadcast as a float64 matrix; the corpus
    streams through one Arrow mapInPandas GEMM (sims = X @ C^T row-
    normalized), so the 100 TB side never shuffles and the plan is a
    pure scan → map.  Cosine rounded to 6 dp before argmax; ties break
    to the lowest centroid id (np.argmax first-max == SQL ORDER BY
    sim DESC, cid ASC) so the assignment is bit-reproducible.

    Returns (id, cluster_id, sim).
    """
    import numpy as np
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    spark = df.sparkSession
    cents = (df.select(F.col(id_col).alias("cid"), F.col(vec).alias("cv"))
               .orderBy("cid").limit(k).toPandas())
    cm = np.stack(cents["cv"].to_list()).astype("float64")
    ncm = np.linalg.norm(cm, axis=1, keepdims=True)
    ncm[ncm == 0] = 1.0
    cm = cm / ncm
    cids = cents["cid"].to_numpy()
    bc = spark.sparkContext.broadcast((cids, cm))

    out_schema = f"{id_col} long, cluster_id long, sim double"

    def op(batches):
        c_ids, c_m = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec].to_list()).astype("float64")
            n = np.linalg.norm(x, axis=1, keepdims=True)
            n[n == 0] = 1.0
            sims = np.round((x / n) @ c_m.T, 6)
            best = sims.argmax(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "cluster_id": c_ids[best],
                "sim": sims[np.arange(len(best)), best],
            })

    from nosql_join_stream_spark.operators.dedup import _spread
    return _spread(df.select(id_col, vec)).mapInPandas(op, out_schema)


def _pq_codebooks(df: DataFrame, id_col: str, vec: str, m: int, k: int,
                  sample: int = 4096, iters: int = 8):
    """(m, k, dim/m) PQ codebooks: deterministic strided-init Lloyd
    per subspace on a bounded, id-ordered driver sample (same recipe
    as _ivf_centroids — engine-portable, no RNG; the table is tiny)."""
    import numpy as np

    pdf = df.select(id_col, vec).orderBy(id_col).limit(sample).toPandas()
    X = np.stack(pdf[vec].to_list()).astype("float64")
    dim = X.shape[1]
    if dim % m != 0:
        raise ValueError(f"dim ({dim}) not divisible by m ({m})")
    sub = dim // m
    books = []
    for j in range(m):
        S = X[:, j * sub:(j + 1) * sub]
        step = max(1, len(S) // k)
        c = S[::step][:k].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for ki in range(k):
                pts = S[a == ki]
                if len(pts):
                    c[ki] = pts.mean(0)
        books.append(c)
    return np.stack(books)


def pq_encode(df: DataFrame, id_col: str = "vec_id",
              vec: str = "embedding", m: int = 8, k: int = 16,
              sample: int = 4096, iters: int = 8) -> DataFrame:
    """Product quantization: split each vector into ``m`` subvectors
    and encode each against a ``k``-centroid codebook — ``m`` bytes
    per vector (64x smaller than fp64x64), the memory layout that
    makes billion-scale ANN shortlists fit in RAM.  IVF partitions
    the corpus (ann_ivf_topk); PQ compresses within the cell — the
    canonical IVF+PQ pairing.

    Codebooks train driver-side on a bounded, id-ordered sample with
    deterministic strided init + Lloyd iterations (same recipe as
    _ivf_centroids — engine-portable, no RNG; the codebook table is
    m*k*(dim/m) doubles, tiny).  Encoding is one Arrow mapInPandas
    pass over the corpus — distances to all m*k centroids per batch
    via numpy, no shuffle, partitioning preserved.

    Returns (id, codes_json, recon_cos): the m codes as a JSON int
    array and the cosine between the original vector and its
    reconstruction (the per-row quantization-quality witness).
    """
    import numpy as np

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        _pq_codebooks(df, id_col, vec, m, k, sample, iters))
    id_name, vec_name = id_col, vec

    def op(batches):
        import json as _json

        import numpy as _np
        import pandas as _pd
        B = bc.value
        m_, k_, sub_ = B.shape
        for part in batches:
            if len(part) == 0:
                continue
            V = _np.stack(part[vec_name].to_list()).astype("float64")
            codes = _np.empty((len(V), m_), dtype="int64")
            recon = _np.empty_like(V)
            for j in range(m_):
                S = V[:, j * sub_:(j + 1) * sub_]
                d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(-1)
                cj = d2.argmin(1)
                codes[:, j] = cj
                recon[:, j * sub_:(j + 1) * sub_] = B[j][cj]
            num = (V * recon).sum(1)
            den = _np.linalg.norm(V, axis=1) * _np.linalg.norm(recon, axis=1)
            den[den == 0] = 1.0
            yield _pd.DataFrame({
                id_name: part[id_name].to_numpy(),
                "codes_json": [_json.dumps(c) for c in codes.tolist()],
                "recon_cos": _np.round(num / den, 4),
            })

    from nosql_join_stream_spark.operators.dedup import _spread
    return _spread(df.select(id_col, vec)).mapInPandas(
        op, schema=f"{id_col} long, codes_json string, recon_cos double")


def ann_ivfpq_topk(queries: DataFrame, corpus: DataFrame, k: int = 5,
                   n_cells: int = 16, nprobe: int = 4,
                   m: int = 8, pq_k: int = 16, shortlist_factor: int = 4,
                   query_id: str = "q_id", corpus_id: str = "c_id",
                   vec: str = "embedding") -> DataFrame:
    """IVF+PQ ANN — the production billion-scale recipe, end to end:

    1. corpus pass (one mapInPandas, no shuffle): assign each vector
       to its IVF cell AND its m-byte PQ code; the emitted candidate
       table carries CODES ONLY — at 100 TB this is the whole point,
       the scan that feeds the join moves 8 bytes/vector, not the
       vector;
    2. queries probe their ``nprobe`` nearest cells; the broadcast
       cell equi-join scores candidates by asymmetric distance (query
       subvector · centroid lookup — numpy per Arrow batch);
    3. only the per-query ``shortlist_factor * k`` best candidates by
       PQ score join BACK to the full vectors for the exact cosine
       rerank (the single place full vectors are touched).

    Output (q_id, c_id, sim, rank): sim is the EXACT cosine of the
    reranked head — approximation affects recall only, like
    ann_lsh_topk / ann_ivf_topk.  Deterministic end to end.
    """
    import numpy as np

    spark = corpus.sparkSession
    cents = _ivf_centroids(corpus, vec, corpus_id, n_cells)
    books = _pq_codebooks(corpus, corpus_id, vec, m, pq_k)
    bc = spark.sparkContext.broadcast((cents, books))
    sub = books.shape[2]

    def encode_corpus(batches):
        import pandas as _pd
        C, B = bc.value
        for part in batches:
            if len(part) == 0:
                continue
            V = np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = np.linalg.norm(V, axis=1, keepdims=True)
            nv[nv == 0] = 1.0
            vn = V / nv
            cell = (vn @ C.T).argmax(axis=1).astype("int32")
            codes = np.empty((len(V), len(B)), dtype="int32")
            for j in range(len(B)):
                S = V[:, j * sub:(j + 1) * sub]
                codes[:, j] = ((S[:, None, :] - B[j][None, :, :]) ** 2
                               ).sum(-1).argmin(1)
            yield _pd.DataFrame({"__cid": part.iloc[:, 0], "__cell": cell,
                                 "__codes": list(codes)})

    def probe_queries(batches):
        import pandas as _pd
        C, _ = bc.value
        np_ = min(nprobe, len(C))
        for part in batches:
            if len(part) == 0:
                continue
            V = np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = np.linalg.norm(V, axis=1, keepdims=True)
            nv[nv == 0] = 1.0
            vn = V / nv
            order = np.argsort(-(vn @ C.T), axis=1)[:, :np_]
            out = part.loc[part.index.repeat(np_)]
            yield _pd.DataFrame({"__qid": out.iloc[:, 0],
                                 "__cell": order.reshape(-1).astype("int32"),
                                 "__qv": out.iloc[:, 1]})

    def adc_score(batches):
        """Asymmetric distance: sum_j q_sub_j · book[j][code_j] — an
        inner-product approximation from codes alone."""
        import pandas as _pd
        _, B = bc.value
        for part in batches:
            if len(part) == 0:
                continue
            Q = np.stack(part["__qv"].to_list()).astype("float64")
            codes = np.stack(part["__codes"].to_list()).astype("int64")
            score = np.zeros(len(part))
            for j in range(len(B)):
                score += (Q[:, j * sub:(j + 1) * sub]
                          * B[j][codes[:, j]]).sum(1)
            yield _pd.DataFrame({"__qid": part["__qid"],
                                 "__cid": part["__cid"],
                                 "__adc": np.round(score, 6)})

    vec_t = dict(corpus.dtypes)[vec]
    c_codes = corpus.select(F.col(corpus_id), F.col(vec)).mapInPandas(
        encode_corpus, schema=f"__cid long, __cell int, __codes array<int>")
    q_probe = queries.select(F.col(query_id), F.col(vec)).mapInPandas(
        probe_queries, schema=f"__qid long, __cell int, __qv {vec_t}")
    cand = (F.broadcast(q_probe).join(c_codes, "__cell")
            .filter(F.col("__qid") != F.col("__cid")))
    scored = cand.mapInPandas(
        adc_score, schema="__qid long, __cid long, __adc double")
    w = Window.partitionBy("__qid").orderBy(F.col("__adc").desc(),
                                            F.col("__cid"))
    short = (scored.withColumn("__r", F.row_number().over(w))
                   .filter(F.col("__r") <= shortlist_factor * k)
                   .drop("__r", "__adc"))
    # ONLY the shortlist touches full vectors again
    qv = queries.select(F.col(query_id).alias("__qid"),
                        F.col(vec).alias("__qv"))
    cv = corpus.select(F.col(corpus_id).alias("__cid"),
                       F.col(vec).alias("__cv"))
    sim = F.round(cosine(
        F.transform("__qv", lambda x: x.cast("double")),
        F.transform("__cv", lambda x: x.cast("double"))), 6)
    reranked = (short.join(F.broadcast(qv), "__qid")
                     .join(cv, "__cid")
                     .withColumn("sim", sim))
    w2 = Window.partitionBy("__qid").orderBy(F.col("sim").desc(),
                                             F.col("__cid"))
    return (reranked.withColumn("rank", F.row_number().over(w2))
                    .filter(F.col("rank") <= k)
                    .select(F.col("__qid").alias(query_id),
                            F.col("__cid").alias(corpus_id), "sim", "rank"))


def semantic_dedup(df: DataFrame, k: int = 8, threshold: float = 0.4,
                   id_col: str = "vec_id",
                   vec: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023):
    cluster the embedding space, compare pairs only WITHIN a cluster,
    and resolve near-dup groups to one canonical representative.

    Composition of already-verified kernels: ``cluster_assign`` blocks
    the corpus into ``k`` nearest-centroid cells (deterministic
    lowest-id centroid seeding, broadcast GEMM, zero corpus shuffle);
    each cell self-joins on cluster_id and verifies candidates with
    exact cosine (rounded to 6 dp, so any engine agrees); the
    surviving pairs feed hash-min connected components
    (dedup.connected_components) and every row gets a verdict.

    Within-cluster comparison is the SemDeDup approximation BY DESIGN:
    cross-cluster near-dups are not sought (at embedding thresholds
    worth deduping, near-dups co-locate with their cluster centroid).
    Scale shape: pair space is sum of squared CELL sizes, not corpus
    size squared — at 100 TB pick k proportional to n (SemDeDup uses
    ~n/10k cells) so cells stay bounded; the cell self-join shuffles
    on cluster_id, and AQE's skew split handles a hot cell.

    Returns (id, cluster_id, canonical_id, is_duplicate).
    """
    from nosql_join_stream_spark.operators.dedup import dedup_resolve

    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    assign = cluster_assign(df, k=k, id_col=id_col, vec=vec)
    vecs = df.select(F.col(id_col).alias("id"),
                     F.transform(vec, lambda x: x.cast("double"))
                      .alias("v"))
    cells = (assign.select(F.col(id_col).alias("id"), "cluster_id")
                   .join(vecs, "id"))

    # within-cell verification as ONE numpy GEMM per cell (grouped
    # map): a cell's pair count is bounded by its size squared, and
    # k ∝ n keeps cells small, so each Arrow group is a small dense
    # matrix — measured ~2x the whole operator vs the per-pair
    # interpreted Column aggregate this replaces.  np.round(·, 6)
    # matches the engines' 6-dp rounding (same precedent as
    # cluster_assign / pq_encode).
    thr = float(threshold)

    def cell_pairs(pdf):
        import numpy as np
        import pandas as pd
        if len(pdf) < 2:
            return pd.DataFrame({"id1": pd.Series(dtype="int64"),
                                 "id2": pd.Series(dtype="int64")})
        pdf = pdf.sort_values("id")
        x = np.stack(pdf["v"].to_list()).astype("float64")
        n = np.linalg.norm(x, axis=1, keepdims=True)
        n[n == 0] = 1.0
        s = np.round((x / n) @ (x / n).T, 6)
        iu = np.triu_indices(len(pdf), 1)
        mask = s[iu] >= thr
        ids = pdf["id"].to_numpy()
        return pd.DataFrame({"id1": ids[iu[0][mask]],
                             "id2": ids[iu[1][mask]]})

    pairs = (cells.groupBy("cluster_id")
                  .applyInPandas(cell_pairs, "id1 long, id2 long"))
    verdicts = dedup_resolve(df.select(F.col(id_col).alias("id")),
                             pairs, "id")
    return (verdicts.join(assign.select(F.col(id_col).alias("id"),
                                        "cluster_id"), "id")
                    .select("id", "cluster_id", "canonical_id",
                            "is_duplicate"))


def _cell_assign_kernel(bc, n_meta: int):
    """mapInPandas kernel assigning each vector to its argmax-cosine
    cell (zero-norm guard included), passing ``n_meta`` trailing
    metadata columns through untouched — shared by the index build and
    the append maintenance op so their layouts can never drift."""
    def assign(batches):
        import numpy as _np
        import pandas as _pd
        c = bc.value
        for part in batches:
            if len(part) == 0:
                continue
            v = _np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = _np.linalg.norm(v, axis=1, keepdims=True)
            nv[nv == 0] = 1.0  # zero vector -> cell 0, not NaN-argmax
            cell = ((v / nv) @ c.T).argmax(axis=1).astype("int32")
            out = {"__cid": part.iloc[:, 0], "__cell": cell,
                   "__cv": part.iloc[:, 1]}
            for j in range(n_meta):
                out[part.columns[2 + j]] = part.iloc[:, 2 + j]
            yield _pd.DataFrame(out)
    return assign


def _cell_schema(df: DataFrame, vec: str, meta_cols) -> str:
    types = dict(df.dtypes)
    extra = "".join(f", {c} {types[c]}" for c in meta_cols)
    return f"__cid long, __cell int, __cv {types[vec]}{extra}"


def ann_ivf_append(new_corpus: DataFrame, location: str,
                   corpus_id: str = "c_id",
                   vec: str = "embedding",
                   meta_cols=()) -> int:
    """Append a batch of NEW vectors to a standing cell-partitioned IVF
    index (``ann_ivf_partitioned``'s build output) — the
    index-maintenance twin of the incremental-dedup standing index:
    daily embedding ingest must not rebuild a 100 TB index.

    Contract (standard IVF maintenance): the PERSISTED centroids are
    read back and do NOT retrain — cell geometry is fixed at build
    time, so existing cell files are untouched and a probe's
    PartitionFilters pruning (and cost) is unchanged; the batch gets
    one mapInPandas assignment pass (same kernel as the build, same
    zero-norm guard) and its rows APPEND into the ``__cell=N/`` hive
    partitions.  Retraining is a rebuild, deliberately a different
    call.  At 100 TB: append cost tracks the BATCH size only — the
    standing corpus is never read, never shuffled.

    A re-ingested id that was previously tombstoned by
    ``ann_ivf_delete`` becomes visible again: the (tiny) tombstone
    table is rewritten minus the appended ids, so append+delete
    compose in either order without a rebuild.

    ``meta_cols`` must name the same metadata columns the index was
    built with (``ann_ivf_partitioned(meta_cols=...)``) so appended
    rows carry the filterable columns a filtered probe reads.

    The batch is cached through the assignment pass, so its SOURCE is
    scanned exactly once even though the op both writes and counts it
    — safe against read-once ingest sources (e.g. a drained queue) and
    non-deterministic upstreams (sample/limit): the count returned is
    the rows actually written.
    """
    import os

    import numpy as np

    from nosql_join_stream_spark.sinks import write_table

    spark = new_corpus.sparkSession
    cent_path = os.path.join(location, "centroids.parquet")
    index_path = os.path.join(location, "corpus_cells")
    if not os.path.isdir(index_path):
        raise ValueError(
            f"no standing IVF index at {location}; build one first "
            "(ann_ivf_partitioned rebuild=True)")
    cent_pdf = spark.read.parquet(cent_path).orderBy("cell").toPandas()
    cents = np.stack(cent_pdf["cv"].to_list()).astype("float64")
    bc = spark.sparkContext.broadcast(cents)

    assigned = (new_corpus
                .select(F.col(corpus_id), F.col(vec),
                        *[F.col(c) for c in meta_cols])
                .mapInPandas(_cell_assign_kernel(bc, len(meta_cols)),
                             schema=_cell_schema(new_corpus, vec, meta_cols))
                .persist())
    try:
        write_table(assigned, index_path, mode="append",
                    partition_by=["__cell"])
        n = assigned.count()  # served from the cache the write populated
        _clear_tombstones_for(assigned.select("__cid"), location)
    finally:
        assigned.unpersist()
    return n


def ann_ivf_delete(ids: DataFrame, location: str,
                   corpus_id: str = "c_id") -> int:
    """Delete vectors from the standing IVF index WITHOUT rewriting it:
    the ids append to a tombstone table next to the index, and probes
    anti-join tombstones (broadcast — deletions are tiny relative to a
    100 TB index) before reranking.  Parquet files are immutable and a
    delete must not rewrite petabytes, so tombstoning is the honest
    Spark-first shape (it is what table formats do under the hood);
    ``compact='...'`` semantics belong to a rebuild, which folds
    tombstones in by construction.  Returns the number of ids appended.
    """
    import os

    if not os.path.isdir(os.path.join(location, "corpus_cells")):
        raise ValueError(
            f"no standing IVF index at {location}; build one first "
            "(ann_ivf_partitioned rebuild=True)")
    tomb_path = os.path.join(location, "tombstones.parquet")
    out = ids.select(F.col(corpus_id).cast("long").alias("__cid"))
    out.write.mode("append").parquet(tomb_path)
    return out.count()


def ann_ivf_compact(location: str) -> int:
    """PARTIAL compaction of the standing IVF index: fold outstanding
    tombstones into the index by rewriting ONLY the cell partitions
    that actually contain tombstoned rows — the maintenance step that
    keeps long-lived indexes healthy without the full-rebuild cost.

    Deletes accumulate as tombstones (``ann_ivf_delete``), which cost
    every probe one broadcast anti-join; a rebuild folds them in but
    rewrites the whole index.  This op is the middle path a 100 TB
    deployment runs on a schedule: one broadcast semi-join finds the
    affected cells (a bounded driver list — cells, not rows), a
    dynamic partition overwrite rewrites exactly those ``__cell=N/``
    directories minus the dead rows, untouched cells keep their files
    byte-identical, and the tombstone table is removed — restoring
    the probe's no-tombstone fast path.  Centroids are untouched
    (geometry never changes), so probe pruning and recall are
    unaffected.  Returns the number of cells rewritten.
    """
    import os
    import shutil

    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    index_path = os.path.join(location, "corpus_cells")
    tomb_path = os.path.join(location, "tombstones.parquet")
    if not os.path.isdir(index_path):
        raise ValueError(
            f"no standing IVF index at {location}; build one first "
            "(ann_ivf_partitioned rebuild=True)")
    if not os.path.isdir(tomb_path):
        return 0  # nothing outstanding — compaction is a no-op
    tombs = spark.read.parquet(tomb_path).distinct()
    index = spark.read.parquet(index_path)
    affected = [r["__cell"] for r in
                (index.join(F.broadcast(tombs), "__cid", "left_semi")
                      .select("__cell").distinct().collect())]
    if affected:
        # localCheckpoint materializes the survivors BEFORE the write:
        # Spark (rightly) refuses to overwrite a path its own plan is
        # reading, and checkpointing bounds what's held to the affected
        # cells only — the partitions being rewritten anyway
        survivors = (index.filter(F.col("__cell").isin(affected))
                     .join(F.broadcast(tombs), "__cid", "left_anti")
                     .localCheckpoint())
        (survivors.write.mode("overwrite")
                  .option("partitionOverwriteMode", "dynamic")
                  .partitionBy("__cell")
                  .parquet(index_path))
    shutil.rmtree(tomb_path, ignore_errors=True)
    return len(affected)


def _apply_tombstones(index: DataFrame, location: str) -> DataFrame:
    """Anti-join the index scan against the tombstone table, if one
    exists — broadcast, so the probe plan gains one map-side filter.
    The dir's absence is the steady-state fast path: append/rebuild
    delete it when the last tombstone is cleared, so a probe on an
    index with no outstanding deletes pays nothing here.  When the
    dir is PRESENT no recovery is needed (the dangerous crash state
    is its mid-swap absence; a stale ``tombstones_old`` only matters
    to the next swap, which repairs first) — recovery runs only when
    the dir is missing, so an interrupted ``_clear_tombstones_for``
    rename is never misread as 'no tombstones'."""
    import os

    tomb_path = os.path.join(location, "tombstones.parquet")
    if not os.path.isdir(tomb_path):
        _recover_tombstone_swap_dir(location)
    if not os.path.isdir(tomb_path):
        return index
    spark = index.sparkSession
    tombs = spark.read.parquet(tomb_path).distinct()
    return index.join(F.broadcast(tombs), "__cid", "left_anti")


def _recover_tombstone_swap_dir(location: str) -> None:
    """Repair an interrupted ``_clear_tombstones_for`` swap.  A crash
    between the two renames leaves ``tombstones.parquet`` absent with
    ``tombstones_old.parquet`` present: rename the old (SUPERSET) dir
    back, so recovery errs toward keeping tombstones and a purged doc
    can never be resurrected by the crash.  A crash after the second
    rename leaves a stale ``tombstones_old.parquet`` beside the
    committed set: remove it so the next swap starts clean.  Directory
    mirror of ``dedup._recover_tombstone_swap``."""
    import os
    import shutil

    old = os.path.join(location, "tombstones_old.parquet")
    if not os.path.isdir(old):
        return
    tomb_path = os.path.join(location, "tombstones.parquet")
    if os.path.isdir(tomb_path):
        shutil.rmtree(old, ignore_errors=True)
    else:
        # concurrent probes can race on the repair: the loser's rename
        # finds the source already gone — the other repairer reaching
        # the same end state is success, not an error (r8-ADVICE)
        try:
            os.rename(old, tomb_path)
        except (FileNotFoundError, OSError):
            if not os.path.isdir(tomb_path):
                raise


def _clear_tombstones_for(ids: DataFrame, location: str) -> None:
    """Rewrite the tombstone table minus ``ids`` — a deleted id that
    is later legitimately re-ingested via append must become
    probe-visible again without a full rebuild.  Survivors are STAGED
    to a sibling dir and swapped in with directory renames (atomic on
    a posix filesystem; object stores get either the old or the new
    complete dir), and the survivors never pass through the driver:
    the anti-join writes distributively, so a mass purge costs one
    broadcast anti-join + write, not a driver collect.  The two-step
    rename leaves a crash window where the tombstone dir is transiently
    absent; it is closed on the READ side — this function and
    ``_apply_tombstones`` both run ``_recover_tombstone_swap_dir``
    first, restoring the old (superset) dir when only it survives, so
    the mid-swap state is never misread as 'no tombstones'.  An
    emptied table is removed entirely, restoring the probe's
    no-tombstone fast path."""
    import os
    import shutil

    _recover_tombstone_swap_dir(location)
    tomb_path = os.path.join(location, "tombstones.parquet")
    if not os.path.isdir(tomb_path):
        return
    spark = ids.sparkSession
    tombs = spark.read.parquet(tomb_path).distinct()
    # no forced broadcast: the re-ingest batch can be arbitrarily
    # large — AQE picks broadcast when it actually fits
    survivors = tombs.join(ids, "__cid", "left_anti")
    n_surv = survivors.count()
    if n_surv == tombs.count():
        return  # nothing cleared; leave the table untouched
    if n_surv == 0:
        shutil.rmtree(tomb_path, ignore_errors=True)
        return
    staging = os.path.join(location, "tombstones_staging.parquet")
    old = os.path.join(location, "tombstones_old.parquet")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    # one file for the takedown-sized common case; natural partitioning
    # above that so a mass purge never funnels through a single task
    staged = survivors if n_surv > 1_000_000 else survivors.coalesce(1)
    staged.write.mode("overwrite").parquet(staging)
    os.rename(tomb_path, old)
    os.rename(staging, tomb_path)
    shutil.rmtree(old, ignore_errors=True)


def ann_ivf_partitioned(queries: DataFrame, corpus: DataFrame,
                        k: int = 5, n_cells: int | None = 16,
                        nprobe: int = 4,
                        query_id: str = "q_id", corpus_id: str = "c_id",
                        vec: str = "embedding",
                        location: str | None = None,
                        rebuild: bool = True,
                        meta_cols=(),
                        corpus_filter=None) -> DataFrame:
    """IVF ANN over a STANDING cell-partitioned index — the production
    form of ``ann_ivf_topk``: the cell assignment is a one-time write,
    and each probe READS only its cells.

    Build (``rebuild=True``): deterministic centroids (same bounded-
    sample Lloyd as ``ann_ivf_topk``) persist as a tiny parquet next to
    the corpus assignment, which is written hive-partitioned by
    ``__cell`` (sinks.write_table) — ``__cell=N/`` directories.

    ``n_cells`` sizes the one-time build only; pass ``None`` on a
    ``rebuild=False`` probe-only call to make the 'unused when not
    rebuilding' contract explicit (the persisted index carries its own
    cell count via the centroids table).

    Probe: queries assign to their ``nprobe`` nearest cells; the union
    of probed cell ids (≤ |queries|·nprobe ints — a bounded driver
    list, NOT a corpus collect) becomes an ``IN`` literal filter that
    Catalyst turns into PartitionFilters, so the scan touches
    ~nprobe/n_cells of the index files (asserted in tests).  Then the
    same broadcast cell equi-join + exact cosine rerank.  Results are
    identical to the inline form given the same centroids.

    At 100 TB: the index write is one linear pass; every query batch
    afterwards is a pruned scan of the probed cells only — scan cost
    tracks query selectivity, not corpus size.

    FILTERED search: ``meta_cols`` carries metadata columns (labels,
    source, license, date) into the cell partitions at build time, and
    ``corpus_filter`` (a Column or SQL string) restricts a probe to
    matching vectors — the predicate lands on the index scan as
    PushedFilters NEXT TO the cell PartitionFilters, so a filtered
    probe reads only matching row groups of the probed cells and the
    exact rerank sees only eligible vectors (classic pre-filtered IVF:
    recall against the filtered exact top-k degrades gracefully as the
    filter sharpens, since probed cells may hold fewer than k eligible
    vectors — raise nprobe to compensate).  ``ann_ivf_append`` takes
    the same ``meta_cols`` so maintenance preserves the layout.
    """
    import os
    import tempfile

    import numpy as np

    from nosql_join_stream_spark.sinks import write_table

    spark = corpus.sparkSession
    if location is None:
        location = os.path.join(tempfile.gettempdir(),
                                f"nsjs_ivf_{os.getpid()}")
    cent_path = os.path.join(location, "centroids.parquet")
    index_path = os.path.join(location, "corpus_cells")

    if rebuild:
        if n_cells is None:
            raise ValueError("n_cells is required when rebuild=True")
        # a rebuild folds deletions in by construction — stale
        # tombstones must not shadow legitimately re-ingested ids
        import shutil
        shutil.rmtree(os.path.join(location, "tombstones.parquet"),
                      ignore_errors=True)
        cents = _ivf_centroids(corpus, vec, corpus_id, n_cells)
        cent_rows = [(i, [float(x) for x in cents[i]])
                     for i in range(len(cents))]
        spark.createDataFrame(cent_rows, "cell int, cv array<double>") \
             .coalesce(1).write.mode("overwrite").parquet(cent_path)
        bc = spark.sparkContext.broadcast(cents)
        assigned = (corpus
                    .select(F.col(corpus_id), F.col(vec),
                            *[F.col(c) for c in meta_cols])
                    .mapInPandas(_cell_assign_kernel(bc, len(meta_cols)),
                                 schema=_cell_schema(corpus, vec, meta_cols)))
        write_table(assigned, index_path, partition_by=["__cell"])

    return ann_ivf_probe(queries, location, k=k, nprobe=nprobe,
                         query_id=query_id, corpus_id=corpus_id,
                         vec=vec, corpus_filter=corpus_filter)


def ann_ivf_probe(queries: DataFrame, location: str,
                  k: int = 5, nprobe: int = 4,
                  query_id: str = "q_id", corpus_id: str = "c_id",
                  vec: str = "embedding",
                  corpus_filter=None) -> DataFrame:
    """Probe a STANDING IVF index without a corpus handle — the true
    client call of the standing-index story (``ann_ivf_partitioned``
    delegates here after its optional build): read the persisted
    centroids, assign each query to its nprobe nearest cells, turn the
    probed cell set into an ``IN`` literal Catalyst prunes to
    PartitionFilters, broadcast the (tiny) query assignment against
    the pruned cells, exact-cosine rerank.  Tombstones anti-join
    broadcast; ``corpus_filter`` restricts to eligible vectors
    (PushedFilters — see ann_ivf_partitioned's filtered-search notes).
    Batch-shaped, so it drops straight into ``foreachBatch`` for the
    streaming query-service form (streaming.stream_ann_probe)."""
    import os

    import numpy as np

    spark = queries.sparkSession
    cent_path = os.path.join(location, "centroids.parquet")
    index_path = os.path.join(location, "corpus_cells")
    if not os.path.isdir(index_path):
        raise ValueError(
            f"no standing IVF index at {location}; build one first "
            "(ann_ivf_partitioned rebuild=True)")
    vec_t = dict(queries.dtypes)[vec]
    cent_pdf = spark.read.parquet(cent_path).orderBy("cell").toPandas()
    cents = np.stack(cent_pdf["cv"].to_list()).astype("float64")
    bc_q = spark.sparkContext.broadcast(cents)
    np_probe = min(nprobe, len(cents))

    def assign_queries(batches):
        import numpy as _np
        import pandas as _pd
        c = bc_q.value
        for part in batches:
            if len(part) == 0:
                continue
            v = _np.stack(part.iloc[:, 1].to_list()).astype("float64")
            nv = _np.linalg.norm(v, axis=1, keepdims=True)
            nv[nv == 0] = 1.0  # zero vector -> cell 0, not NaN-argmax
            vn = v / nv
            order = _np.argsort(-(vn @ c.T), axis=1)[:, :np_probe]
            out = part.loc[part.index.repeat(np_probe)]
            yield _pd.DataFrame({"__qid": out.iloc[:, 0],
                                 "__cell": order.reshape(-1).astype("int32"),
                                 "__qv": out.iloc[:, 1]})

    # lazy: the collect below is the materializing action (one job
    # instead of checkpoint-job + collect-job); later joins reuse the
    # persisted RDD
    q_assigned = (queries.select(F.col(query_id), F.col(vec))
                  .mapInPandas(assign_queries,
                               schema=f"__qid long, __cell int, __qv {vec_t}")
                  .localCheckpoint(eager=False))
    probed_cells = [r["__cell"] for r in
                    q_assigned.select("__cell").distinct().collect()]
    index = _apply_tombstones(
        spark.read.parquet(index_path)
             .filter(F.col("__cell").isin(probed_cells)),
        location)
    if corpus_filter is not None:
        # plain column predicate -> PushedFilters on the cell scan,
        # evaluated alongside the PartitionFilters pruning
        index = index.filter(corpus_filter)
    # Per-cell GEMM rerank (r15): the original broadcast-join +
    # Catalyst array-cosine materialized every (query, candidate)
    # pair ROW through a deep interpreted expression — the r47 cost
    # class, measured 60 s at the margin-mining 10x probe (22M
    # pairs).  The cogrouped kernel computes the same 6-dp micro
    # sims as ONE numpy GEMM per cell and emits only each query's
    # per-cell top-k (the global top-k is a subset of the per-cell
    # top-k union, so the final window is exact over a k*nprobe-
    # bounded candidate set).  Selection order inside the kernel is
    # the same composite (micro desc, cid asc) integer key as
    # exact_knn_avg_micro.  Cost: one Exchange of the PROBED cells
    # only (bytes track probe selectivity, not corpus size — the
    # celled-GEMM discipline of embedding_near_dup_pairs).
    k_local = int(k)

    def rerank(left, right):
        import numpy as _np
        import pandas as _pd
        empty = _pd.DataFrame({
            "__qid": _pd.Series([], dtype="int64"),
            "__cid": _pd.Series([], dtype="int64"),
            "micro": _pd.Series([], dtype="int64")})
        if len(left) == 0 or len(right) == 0:
            return empty
        qids = left["__qid"].to_numpy().astype("int64")
        qv = _np.stack(left["__qv"].to_list()).astype("float64")
        cids = right["__cid"].to_numpy().astype("int64")
        cv = _np.stack(right["__cv"].to_list()).astype("float64")
        qn = _np.linalg.norm(qv, axis=1, keepdims=True)
        qn[qn == 0] = 1.0
        cn = _np.linalg.norm(cv, axis=1, keepdims=True)
        cn[cn == 0] = 1.0
        micro = _np.rint(_np.round((qv / qn) @ (cv / cn).T, 6)
                         * 1e6).astype("int64")
        nc = len(cids)
        order = _np.empty(nc, dtype="int64")
        order[_np.argsort(cids, kind="stable")] = _np.arange(nc)
        keys = micro * nc - order[None, :]        # unique per column
        sentinel = -(2 ** 62)
        keys[cids[None, :] == qids[:, None]] = sentinel   # self
        kk = min(k_local, nc)
        top = _np.argsort(-keys, axis=1)[:, :kk]
        sel = _np.take_along_axis(keys, top, axis=1) \
                 .reshape(-1) != sentinel
        return _pd.DataFrame({
            "__qid": _np.repeat(qids, kk)[sel],
            "__cid": cids[top.reshape(-1)][sel],
            "micro": _np.take_along_axis(micro, top,
                                         axis=1).reshape(-1)[sel]})

    cand = (q_assigned.groupBy("__cell")
            .cogroup(index.groupBy("__cell"))
            .applyInPandas(rerank,
                           schema="__qid long, __cid long, micro long"))
    scored = cand.withColumn("sim",
                             F.round(F.col("micro") / 1e6, 6))
    w = Window.partitionBy("__qid").orderBy(F.col("sim").desc(),
                                            F.col("__cid"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(F.col("__qid").alias(query_id),
                          F.col("__cid").alias(corpus_id), "sim", "rank"))


def exact_knn_avg_micro(df: DataFrame, id_col: str = "vec_id",
                        vec: str = "embedding", k: int = 4):
    """Exact k-NN cosine SUM per vector in integer micro-units — the
    GEMM tier of the brute all-pairs kNN (the margin-mining
    denominator).

    ``cosine_topk`` with queries == corpus materializes n² pair ROWS
    through a Catalyst expression cosine — measured 97 s at sf0.1
    (5.5k² pairs), the exact r47 cost class (deep interpreted
    expression tree over array columns).  This kernel computes the
    same numbers as ONE numpy GEMM per Arrow batch against a
    broadcast unit-normalized corpus matrix: no pair rows exist
    anywhere, output is one row per vector.

    EXACT-TIER CONTRACT: the corpus matrix is collected and
    broadcast (id + unit vector; MBs at oracle scales) — the same
    data ``cosine_topk`` already ships via its broadcast side.  At
    100 TB the margin denominator comes from the IVF kNN probe
    instead (ann_ivf_partitioned); this tier exists to be
    oracle-exact.

    Determinism: sims round to 6 dp then convert to int64
    micro-units (values sit within 1e-9 of integers, so the cast is
    exact); top-k selects on (micro desc, neighbor id asc) — the
    same (ROUND(sim,6) DESC, id) order as _rank_topk — and the
    returned ``knn_sum_micro`` is an INTEGER sum, so engines agree
    bit-for-bit with no float-summation-order hazard.  Self-matches
    excluded by id.  Returns (id_col, knn_sum_micro).
    """
    import numpy as np

    spark = df.sparkSession
    pdf = df.select(id_col, vec).toPandas()
    ids = pdf[id_col].to_numpy().astype("int64")
    m = np.stack(pdf[vec].to_list()).astype("float64")
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    bc = spark.sparkContext.broadcast((ids, m / norms))

    def op(batches):
        import numpy as _np
        import pandas as _pd
        all_ids, mn = bc.value
        n = len(all_ids)
        # composite total order (higher = better): micro desc, then
        # corpus id asc via each id's dense rank — keys are UNIQUE,
        # so the top-k SET is deterministic and np.argpartition
        # (O(n) per row, fully vectorized) replaces the per-row
        # lexsort that measured ×52 at the 10x probe (55k rows x
        # an O(n log n) python-loop sort each)
        id_rank = _np.empty(n, dtype="int64")
        id_rank[_np.argsort(all_ids, kind="stable")] = _np.arange(n)
        for part in batches:
            if len(part) == 0:
                continue
            qid = part[id_col].to_numpy().astype("int64")
            v = _np.stack(part[vec].to_list()).astype("float64")
            nv = _np.linalg.norm(v, axis=1, keepdims=True)
            nv[nv == 0] = 1.0
            vn = v / nv
            sums = _np.empty(len(qid), dtype="int64")
            for lo in range(0, len(qid), 256):   # bound key memory
                hi = min(lo + 256, len(qid))
                micro = _np.rint(_np.round(vn[lo:hi] @ mn.T, 6)
                                 * 1e6).astype("int64")
                keys = micro * n - id_rank[None, :]
                self_mask = all_ids[None, :] == qid[lo:hi, None]
                # sentinel must survive the argpartition negation:
                # int64.min wraps under unary minus and would sort
                # self-matches INTO the top-k
                keys[self_mask] = -(2 ** 62)
                top = _np.argpartition(-keys, k - 1, axis=1)[:, :k]
                sums[lo:hi] = _np.take_along_axis(
                    micro, top, axis=1).sum(axis=1)
            yield _pd.DataFrame({id_col: qid, "knn_sum_micro": sums})

    return (df.select(id_col, vec)
            .mapInPandas(op, schema=f"{id_col} long, knn_sum_micro long"))
