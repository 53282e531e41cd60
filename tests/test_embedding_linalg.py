"""Embedding linear algebra (r10): covariance / JL projection / PCA.

Validation is against independent numpy recomputations on synthetic
data (the tests are not the code), plus plan-shape assertions for the
scale contracts the docstrings claim (JL/PCA projection shuffle-free;
covariance one map-side-combined exchange)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nosql_join_stream_spark.operators import similarity


def _emb_df(spark, M):
    rows = [(i, [float(x) for x in row]) for i, row in enumerate(M)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _synth(n=400, d=8, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: one planted dominant direction + small noise
    axis = rng.normal(size=d)
    axis /= np.linalg.norm(axis)
    M = (rng.normal(size=(n, 1)) * 3.0) @ axis[None, :] \
        + rng.normal(size=(n, d)) * 0.3 + rng.normal(size=d)
    return M


def test_covariance_matches_numpy(spark):
    M = _synth()
    got = {(r.i, r.j): r.cov for r in
           similarity.embedding_covariance(_emb_df(spark, M)).collect()}
    exp = np.cov(M, rowvar=False, bias=True)  # population
    assert len(got) == 64
    for (i, j), v in got.items():
        assert v == pytest.approx(exp[i - 1, j - 1], abs=2e-6), (i, j)
    # dims slice restricts the pair space
    got3 = similarity.embedding_covariance(_emb_df(spark, M), dims=3)
    assert got3.count() == 9


def test_jl_project_values_and_no_shuffle(spark):
    M = _synth(n=50)
    k = 4
    df = _emb_df(spark, M)
    out = similarity.jl_project(df, out_dim=k)
    got = {(r.vec_id, r.j): r.y for r in out.collect()}
    d = M.shape[1]
    W = np.array([[_sign(i, j) for j in range(k)]
                  for i in range(d)]) / np.sqrt(k)
    exp = M @ W
    for (vid, j), y in got.items():
        assert y == pytest.approx(exp[vid, j], abs=2e-6)
    # row-local: the executed plan has no Exchange
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    with pytest.raises(ValueError, match="out_dim"):
        similarity.jl_project(df, out_dim=0)


def test_jl_preserves_distances_on_average(spark):
    # sanity on the JL promise (loose bound: mean relative distortion)
    M = _synth(n=60, d=8, seed=9)
    k = 6
    out = similarity.jl_project(_emb_df(spark, M), out_dim=k)
    Y = np.zeros((60, k))
    for r in out.collect():
        Y[r.vec_id, r.j] = r.y
    rng = np.random.default_rng(1)
    dist = []
    for _ in range(300):
        a, b = rng.integers(0, 60, 2)
        if a == b:
            continue
        do = np.linalg.norm(M[a] - M[b])
        dp = np.linalg.norm(Y[a] - Y[b])
        dist.append(dp / do)
    assert 0.7 < float(np.mean(dist)) < 1.3


def _sign(i, j):
    """Independent reimplementation of the JL matrix entry: two
    middle-square rounds over the 16-bit affine seed, HIGH bit."""
    h = (i * 25173 + j * 13849 + 7919) % 65536
    h = ((h * h) >> 8) % 65536
    h = ((h * h) >> 8) % 65536
    return 1 - 2 * ((h >> 8) & 1)


def test_jl_matrix_no_structural_deficiency():
    """The projection matrix must actually mix i and j.  History:
    draft 1 was parity(i+j) — RANK 1; draft 2 took a LOW bit of one
    bounded square — bit 7 of h² depends only on h mod 2⁸, so the
    matrix was 256-periodic with a hard rank ceiling of 120 (fine on
    small pinned shapes, deficient at encoder shapes; r10 review
    catch).  Pin: full rank across the screening shapes in use AND
    the encoder-class shapes the ceiling broke, plus the periodicity
    itself (rows 256 apart must differ)."""
    for d, k in ((64, 4), (64, 8), (64, 16), (64, 32), (32, 16),
                 (16, 8), (128, 64), (96, 24), (16, 12), (12, 7),
                 (768, 128), (512, 128), (300, 256)):
        W = np.array([[_sign(i, j) for j in range(k)]
                      for i in range(d)], dtype=float)
        assert np.linalg.matrix_rank(W) == min(d, k), (d, k)
    # no 256-periodicity in the row index (draft 2's failure mode)
    col = np.array([[_sign(i, j) for j in range(8)]
                    for i in range(520)])
    assert not np.array_equal(col[0:8], col[256:264])
    # bias sanity: a Rademacher-like entry, not a constant-leaning bit
    big = np.array([[_sign(i, j) for j in range(128)]
                    for i in range(768)], dtype=float)
    assert abs(big.mean()) < 0.05


def test_ann_jl_topk_on_structured_embeddings(spark):
    """The JL screen's honest regime: clustered embeddings (planted
    centers + small noise), where neighbor gaps exceed the JL
    distortion — the screened-then-reranked top-k must recover most
    of the exact top-k, far above the random-pool baseline."""
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 64)) * 2.0
    M = np.vstack([centers[g % 8] + rng.normal(size=64) * 0.25
                   for g in range(300)])
    df = _emb_df(spark, M)
    q = df.filter("vec_id < 10").selectExpr("vec_id AS q_id", "embedding")
    c = df.selectExpr("vec_id AS c_id", "embedding")
    exact = {(r.q_id, r.c_id) for r in
             similarity.cosine_topk(q, c, k=5).collect()}
    jl_rows = similarity.ann_jl_topk(q, c, k=5, out_dim=16,
                                     pool=30).collect()  # one job,
    # reused for both assertions (the screen+rerank is the slowest
    # plan in this module)
    jl = {(r.q_id, r.c_id) for r in jl_rows}
    recall = len(exact & jl) / len(exact)
    random_baseline = 30 / 300
    assert recall >= 0.8, (recall, "expected near-exact on clustered "
                           "data; random-pool baseline is "
                           f"{random_baseline}")
    # rerank is exact full-space cosine: every emitted sim matches the
    # brute-force sim for that pair
    brute = {(r.q_id, r.c_id): r.sim for r in
             similarity.cosine_topk(q, c, k=300).collect()}
    for r in jl_rows:
        assert brute[(r.q_id, r.c_id)] == r.sim


def test_ann_jl_topk_rejects_pool_below_k():
    with pytest.raises(ValueError, match="pool"):
        similarity.ann_jl_topk(None, None, k=10, pool=5)


def test_pca_recovers_planted_axis_and_eigenvalues(spark):
    M = _synth(n=600, d=8, seed=5)
    df = _emb_df(spark, M)
    comps, eig, mean = similarity.pca_components(df, k=3)
    assert comps.shape == (3, 8) and eig.shape == (3,)
    # numpy reference
    exp_cov = np.cov(M, rowvar=False, bias=True)
    w, v = np.linalg.eigh(exp_cov)
    order = np.argsort(w)[::-1][:3]
    assert np.allclose(eig, w[order], atol=1e-6)
    for ours, theirs in zip(comps, v[:, order].T):
        assert abs(float(np.dot(ours, theirs))) > 1 - 1e-9
    # deterministic sign convention
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    assert np.allclose(mean, M.mean(axis=0), atol=1e-9)

    # projection: per-component variance == eigenvalue; shuffle-free
    # when components are passed in (train-once/apply-many)
    proj = similarity.pca_project(df, k=3, components=comps, mean=mean)
    Y = np.zeros((600, 3))
    for r in proj.collect():
        Y[r.vec_id, r.comp] = r.y
    assert np.allclose(Y.var(axis=0), eig, rtol=1e-4)
    assert abs(float(Y.mean(axis=0).max())) < 1e-5  # centered
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    # whitening: unit variance per component, same shuffle-free plan
    white = similarity.pca_project(df, k=3, components=comps,
                                   mean=mean, whiten_eigenvalues=eig)
    Z = np.zeros((600, 3))
    for r in white.collect():
        Z[r.vec_id, r.comp] = r.y
    assert np.allclose(Z.var(axis=0), 1.0, rtol=1e-4)
    with pytest.raises(ValueError, match="whiten_eigenvalues"):
        similarity.pca_project(df, k=3, components=comps, mean=mean,
                               whiten_eigenvalues=eig[:2])


def test_pca_project_whiten_true_in_apply_mode_raises(spark):
    M = _synth(n=50, d=8, seed=9)
    df = _emb_df(spark, M)
    comps, eig, mean = similarity.pca_components(df, k=2)
    with pytest.raises(ValueError, match="whiten_eigenvalues"):
        similarity.pca_project(df, 2, components=comps, mean=mean,
                               whiten_eigenvalues=True)
    # apply-mode whitening with the ACTUAL eigenvalues works and
    # matches train-mode whitening
    a = similarity.pca_project(df, 2, components=comps, mean=mean,
                               whiten_eigenvalues=eig).collect()
    b = similarity.pca_project(df, 2,
                               whiten_eigenvalues=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
