"""Tests for the r10 mergeable-sketch operators (expectations.py):
KLL quantiles, theta set algebra, frequent-items heavy hitters.

Strategy mirrors the HLL precedent (sketch_cardinality_by_group): the
EXACT values are the oracle-checked truth; these tests pin (a) the
witness is LIVE (an impossible tolerance flips it to False — it is a
real in-plan check, not a constant), (b) the sentinel guards fail
loudly, and (c) hand-computable edge shapes (disjoint cohorts, planted
skew, null groups).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_join_stream_spark.operators.expectations import (
    sketch_heavy_hitters,
    sketch_quantiles_by_group,
    sketch_set_overlap,
)


@pytest.fixture(scope="module")
def values(spark):
    # 3 groups x 400 deterministic values with distinct scales so the
    # per-group quantiles differ and the merged __ALL__ row is a real
    # mixture, plus a NULL group
    rows = []
    for g, scale in (("a", 1.0), ("b", 10.0), ("c", 100.0)):
        rows += [(g, scale * ((i * 37) % 400)) for i in range(400)]
    rows += [(None, 5.0), (None, 6.0)]
    return spark.createDataFrame(rows, "grp_in string, v double")


class TestKllQuantiles:
    def test_exact_quantiles_and_witness(self, values):
        out = sketch_quantiles_by_group(
            values, "grp_in", "v").orderBy("grp").collect()
        grps = [r["grp"] for r in out]
        assert grps == ["<NULL>", "__ALL__", "a", "b", "c"]
        by = {r["grp"]: r for r in out}
        # group a holds 0..399 step-37 mod 400 == a permutation of
        # 0..399, so the exact median is 199.5
        assert by["a"]["q_05"] == pytest.approx(199.5)
        assert by["b"]["q_05"] == pytest.approx(1995.0)
        # every witness true at the honest default tolerance
        assert all(r["kll_ok"] for r in out)

    def test_witness_is_live(self, spark):
        # a deliberately starved sketch (k=8) over 10k distinct values
        # with zero tolerance: the sketch's ~10% rank error cannot fit
        # in the 1/n-wide tie interval, so the witness must flip —
        # proving the rank re-check is a real in-plan computation,
        # not a constant
        df = spark.createDataFrame(
            [("g", float((i * 7919) % 10000)) for i in range(10000)],
            "grp_in string, v double")
        out = sketch_quantiles_by_group(
            df, "grp_in", "v", qs=(0.25, 0.5, 0.75), rank_err=0.0,
            sketch_k=8).collect()
        assert any(not r["kll_ok"] for r in out)

    def test_ties_do_not_false_flag(self, spark):
        # 99% duplicated mass: rank_le(median value) = 0.99 with
        # rank_lt = 0 — the interval check must accept it (a point
        # check against rank_le alone would wrongly flag legitimate
        # skew)
        rows = [("g", 1.0)] * 990 + [("g", 2.0)] * 10
        df = spark.createDataFrame(rows, "grp_in string, v double")
        out = sketch_quantiles_by_group(df, "grp_in", "v").collect()
        assert all(r["kll_ok"] for r in out)
        assert {r["grp"]: r["q_05"] for r in out}["g"] == 1.0

    def test_all_sentinel_collision_raises(self, spark):
        df = spark.createDataFrame(
            [("__ALL__", 1.0), ("x", 2.0)], "grp_in string, v double")
        with pytest.raises(Exception, match="__ALL__"):
            sketch_quantiles_by_group(df, "grp_in", "v").collect()


class TestSentinelGuardsLive:
    """r10 regression pins: the original guards were assert_true side
    columns that got PRUNED with their drop — collisions silently
    returned two conflicting __ALL__ rows.  The guard now lives inside
    the surviving grp expression; these tests keep it alive."""

    def test_hll_all_collision_raises(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_cardinality_by_group)
        df = spark.createDataFrame(
            [("__ALL__", 1), ("x", 2)], "g string, v int")
        with pytest.raises(Exception, match="__ALL__"):
            sketch_cardinality_by_group(df, "g", "v").collect()

    def test_hll_null_string_collision_raises(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_cardinality_by_group)
        df = spark.createDataFrame(
            [("<NULL>", 1), ("x", 2)], "g string, v int")
        with pytest.raises(Exception, match="<NULL>"):
            sketch_cardinality_by_group(df, "g", "v").collect()

    def test_hll_real_null_group_still_reports(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_cardinality_by_group)
        df = spark.createDataFrame(
            [(None, 1), (None, 2), ("x", 2)], "g string, v int")
        out = {r["grp"]: r["n_distinct"]
               for r in sketch_cardinality_by_group(df, "g",
                                                    "v").collect()}
        assert out == {"<NULL>": 2, "x": 1, "__ALL__": 2}


class TestThetaOverlap:
    def test_exact_counts_and_witness(self, spark):
        # users 0..29 view, 20..44 purchase -> |A|=30 |B|=25 |A∩B|=10
        rows = ([("view", u) for u in range(30)]
                + [("purchase", u) for u in range(20, 45)]
                + [("view", u) for u in range(5)])  # dup rows collapse
        df = spark.createDataFrame(rows, "et string, uid long")
        r = sketch_set_overlap(df, "et", "uid", "view",
                               "purchase").collect()[0]
        assert (r["n_a"], r["n_b"], r["n_intersect"], r["n_union"],
                r["n_a_only"]) == (30, 25, 10, 45, 20)
        assert r["theta_ok"]

    def test_disjoint_cohorts(self, spark):
        df = spark.createDataFrame(
            [("view", 1), ("view", 2), ("purchase", 3)],
            "et string, uid long")
        r = sketch_set_overlap(df, "et", "uid", "view",
                               "purchase").collect()[0]
        assert r["n_intersect"] == 0 and r["n_a_only"] == 2
        assert r["theta_ok"]  # exact-mode sketch estimates 0 == 0

    def test_other_groups_ignored(self, spark):
        df = spark.createDataFrame(
            [("view", 1), ("purchase", 1), ("click", 99)],
            "et string, uid long")
        r = sketch_set_overlap(df, "et", "uid", "view",
                               "purchase").collect()[0]
        assert r["n_union"] == 1 and r["n_intersect"] == 1


class TestHeavyHitters:
    def test_planted_skew_exact_topk(self, spark):
        # token frequencies 50/30/20/... with an alphabetical tie pair
        rows = ([("zz",)] * 50 + [("mm",)] * 30 + [("aa",)] * 20
                + [("tie1",)] * 7 + [("tie0",)] * 7 + [("x",)] * 1)
        df = spark.createDataFrame(rows, "tok string")
        out = sketch_heavy_hitters(df, "tok", k=5).collect()
        assert [(r["item"], r["cnt"], r["rank"]) for r in out] == [
            ("zz", 50, 1), ("mm", 30, 2), ("aa", 20, 3),
            ("tie0", 7, 4), ("tie1", 7, 5)]
        assert all(r["hh_ok"] for r in out)

    def test_witness_respects_error_bound(self, spark):
        # max_tracked far below the distinct count: the sketch may
        # misestimate tail items, but every retained ESTIMATE must
        # stay within 3.5 N / max_tracked of truth for the true
        # heavy hitter, so the planted 40% hitter stays ok=True
        rows = [("hot",)] * 400 + [(f"t{i}",) for i in range(600)]
        df = spark.createDataFrame(rows, "tok string")
        out = sketch_heavy_hitters(df, "tok", k=1, max_tracked=8)
        r = out.collect()[0]
        assert r["item"] == "hot" and r["cnt"] == 400
        assert r["hh_ok"]


class TestStreamSketchQuantiles:
    def test_multi_batch_merge_and_witness(self, spark, sf_dir, tmp_path):
        from nosql_join_stream_spark.catalog import table_path
        from nosql_join_stream_spark.streaming.log_stream import (
            stream_sketch_quantiles)
        out = stream_sketch_quantiles(
            spark, table_path(sf_dir, "events"),
            str(tmp_path / "run")).orderBy("q").collect()
        assert [r["q"] for r in out] == [0.25, 0.5, 0.75, 0.9]
        assert all(r["kll_ok"] for r in out)
        assert all(r["n_batches"] == 4 for r in out)

    def test_redrain_is_idempotent(self, spark, sf_dir, tmp_path):
        # second drain against the same run_dir finds the checkpoint
        # complete, appends NO new sketch rows, and returns the same
        # answer (the restart contract of the standing sketch table)
        from nosql_join_stream_spark.catalog import table_path
        from nosql_join_stream_spark.streaming.log_stream import (
            stream_sketch_quantiles)
        rd = str(tmp_path / "run")
        first = stream_sketch_quantiles(
            spark, table_path(sf_dir, "events"), rd).orderBy("q").collect()
        second = stream_sketch_quantiles(
            spark, table_path(sf_dir, "events"), rd).orderBy("q").collect()
        assert first == second

    def test_single_batch_drain_raises(self, spark, sf_dir, tmp_path):
        from nosql_join_stream_spark.catalog import table_path
        from nosql_join_stream_spark.streaming.log_stream import (
            stream_sketch_quantiles)
        with pytest.raises(Exception, match="single-batch"):
            stream_sketch_quantiles(
                spark, table_path(sf_dir, "events"),
                str(tmp_path / "run1"), n_splits=1).collect()


class TestOverlapMatrix:
    def test_hand_case_including_zero_pair(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_overlap_matrix)
        # A={1..10}, B={6..15}, C={100} -> AB=5, AC=0, BC=0
        rows = ([("A", u) for u in range(1, 11)]
                + [("B", u) for u in range(6, 16)]
                + [("C", 100)])
        df = spark.createDataFrame(rows, "g string, v long")
        out = {(r["g1"], r["g2"]): (r["n_intersect"], r["theta_ok"])
               for r in sketch_overlap_matrix(df, "g", "v").collect()}
        assert out == {("A", "B"): (5, True), ("A", "C"): (0, True),
                       ("B", "C"): (0, True)}

    def test_duplicates_do_not_inflate(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_overlap_matrix)
        rows = [("A", 1)] * 50 + [("B", 1)] * 50 + [("B", 2)]
        df = spark.createDataFrame(rows, "g string, v long")
        r = sketch_overlap_matrix(df, "g", "v").collect()[0]
        assert (r["g1"], r["g2"], r["n_intersect"]) == ("A", "B", 1)
        assert r["theta_ok"]


class TestHeavyHittersByGroup:
    def test_group_and_combined_truth(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_heavy_hitters_by_group)
        rows = ([("s1", "a")] * 10 + [("s1", "b")] * 5
                + [("s2", "b")] * 9 + [("s2", "c")] * 2)
        df = spark.createDataFrame(rows, "src string, tok string")
        out = [(r["grp"], r["item"], r["cnt"], r["rank"], r["hh_ok"])
               for r in sketch_heavy_hitters_by_group(
                   df, "src", "tok", k=2).collect()]
        # __ALL__ combines: b=14 > a=10 > c=2
        assert out == [
            ("__ALL__", "b", 14, 1, True), ("__ALL__", "a", 10, 2, True),
            ("s1", "a", 10, 1, True), ("s1", "b", 5, 2, True),
            ("s2", "b", 9, 1, True), ("s2", "c", 2, 2, True)]

    def test_sentinel_collision_raises(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            sketch_heavy_hitters_by_group)
        df = spark.createDataFrame(
            [("__ALL__", "a"), ("x", "b")], "src string, tok string")
        with pytest.raises(Exception, match="__ALL__"):
            sketch_heavy_hitters_by_group(df, "src", "tok").collect()


class TestDistributionDriftPsi:
    def test_identical_distributions_score_zero(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi)
        df = spark.createDataFrame(
            [(float(i),) for i in range(1000)], "value double")
        out = {r["bucket"]: r["psi_term"]
               for r in distribution_drift_psi(df, df,
                                               "value").collect()}
        assert out[-1] == 0.0
        assert len(out) == 11

    def test_shifted_distribution_flags(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi)
        old = spark.createDataFrame(
            [(float(i),) for i in range(1000)], "value double")
        new = spark.createDataFrame(
            [(float(i),) for i in range(800, 1800)], "value double")
        rows = {r["bucket"]: r for r in distribution_drift_psi(
            old, new, "value").collect()}
        # 80% of the new mass sits above the old p90 cutpoint: the
        # top bucket holds it all, every lower bucket is eps-clamped
        assert rows[9]["new_frac"] > 0.8
        assert rows[-1]["psi_term"] > 0.2  # "drifted" by the
        # industry reading pinned in the docstring
        # vanished buckets are materialized, not dropped
        assert rows[0]["new_frac"] == 0.0

    def test_old_side_is_uniform_baseline(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi)
        old = spark.createDataFrame(
            [(float(i),) for i in range(1000)], "value double")
        rows = distribution_drift_psi(old, old, "value").collect()
        fr = [r["old_frac"] for r in rows if r["bucket"] >= 0]
        assert all(abs(f - 0.1) < 0.02 for f in fr)


def test_stream_sketch_batch_replay_is_idempotent(spark, sf_dir,
                                                  tmp_path):
    """A retried micro-batch must REPLACE its sketch row, not append a
    duplicate that double-counts the slice in the merge (r10 review
    catch: the first sink was a blind append)."""
    import os

    from nosql_join_stream_spark.catalog import table_path
    from nosql_join_stream_spark.streaming.log_stream import (
        stream_sketch_quantiles)
    rd = str(tmp_path / "run")
    out1 = stream_sketch_quantiles(
        spark, table_path(sf_dir, "events"), rd).orderBy("q").collect()
    sk_dir = os.path.join(rd, "sketches")
    before = spark.read.parquet(sk_dir).count()
    # simulate a foreachBatch replay of batch 2: rewrite its partition
    # the way the sink does and assert the row count is unchanged
    part = os.path.join(sk_dir, "batch_id=2")
    src = spark.read.parquet(part)
    rows = src.collect()  # materialize before overwriting the source
    spark.createDataFrame(rows, src.schema) \
        .write.mode("overwrite").parquet(part)
    after = spark.read.parquet(sk_dir)
    assert after.count() == before == 4
    assert [r["q"] for r in out1] == [0.25, 0.5, 0.75, 0.9]


class TestDistributionDriftPsiByGroup:
    def test_per_group_isolation(self, spark):
        """One drifted cohort among stable ones must flag ONLY itself
        — the localized shift a global PSI dilutes."""
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi_by_group)
        old = spark.createDataFrame(
            [("a", float(i % 100)) for i in range(1000)]
            + [("b", float(i % 100)) for i in range(1000)],
            "g string, v double")
        new = spark.createDataFrame(
            [("a", float(i % 100)) for i in range(1000)]
            + [("b", float(i % 100) + 500.0) for i in range(1000)],
            "g string, v double")
        out = {r["grp"]: r for r in distribution_drift_psi_by_group(
            old, new, "g", "v").collect()}
        assert not out["a"]["drifted"] and out["a"]["psi"] < 0.05
        assert out["b"]["drifted"] and out["b"]["psi"] > 0.2

    def test_appearing_and_vanishing_cohorts(self, spark):
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi_by_group)
        old = spark.createDataFrame(
            [("gone", float(i)) for i in range(50)]
            + [("stays", float(i)) for i in range(50)],
            "g string, v double")
        new = spark.createDataFrame(
            [("fresh", float(i)) for i in range(50)]
            + [("stays", float(i)) for i in range(50)],
            "g string, v double")
        out = {r["grp"]: r for r in distribution_drift_psi_by_group(
            old, new, "g", "v").collect()}
        assert set(out) == {"gone", "stays", "fresh"}
        assert out["gone"]["psi"] is None and out["gone"]["drifted"]
        assert out["fresh"]["psi"] is None and out["fresh"]["drifted"]
        assert out["gone"]["n_new"] == 0 and out["fresh"]["n_old"] == 0
        # an appearing cohort's REAL volume must be reported — the
        # first cut inner-joined the cuts and counted a flood as 0
        # (r10 review catch)
        assert out["fresh"]["n_new"] == 50
        assert out["gone"]["n_old"] == 50
        assert not out["stays"]["drifted"]


class TestStandingPsiBaseline:
    def test_standing_baseline_equals_direct_form(self, spark,
                                                  tmp_path):
        """write_psi_baseline + psi_against_baseline must equal the
        direct two-frame distribution_drift_psi_by_group on the same
        split — equality IS the standing-artifact claim (the baseline
        raw data is never re-scanned at score time)."""
        from nosql_join_stream_spark.operators.expectations import (
            distribution_drift_psi_by_group, psi_against_baseline,
            write_psi_baseline)
        rows = ([("a", float((i * 13) % 97)) for i in range(800)]
                + [("b", float((i * 7) % 53) + 100.0)
                   for i in range(800)])
        df = spark.createDataFrame(rows, "g string, v double") \
                  .withColumn("rid", F.monotonically_increasing_id())
        old = df.filter(F.col("rid") % 2 == 0)
        new = df.filter(F.col("rid") % 2 == 1)
        direct = distribution_drift_psi_by_group(
            old, new, "g", "v").collect()
        path = str(tmp_path / "baseline")
        write_psi_baseline(old, path, "v", group_col="g")
        standing = psi_against_baseline(
            spark, path, new, "v", group_col="g").collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple,
                                                        standing))

    def test_ungrouped_baseline_and_new_cohort(self, spark, tmp_path):
        from nosql_join_stream_spark.operators.expectations import (
            psi_against_baseline, write_psi_baseline)
        old = spark.createDataFrame(
            [(float(i % 50),) for i in range(500)], "v double")
        path = str(tmp_path / "b2")
        write_psi_baseline(old, path, "v")
        same = psi_against_baseline(spark, path, old, "v").collect()
        assert len(same) == 1 and same[0]["grp"] == "__ALL__"
        assert same[0]["psi"] == 0.0 and not same[0]["drifted"]
        shifted = spark.createDataFrame(
            [(float(i % 50) + 500.0,) for i in range(500)], "v double")
        out = psi_against_baseline(spark, path, shifted, "v").collect()
        assert out[0]["drifted"] and out[0]["psi"] > 0.2


def test_psi_baseline_group_mismatch_raises(spark, tmp_path):
    """A scorer invoked with a different grouping than the artifact
    was written with must fail fast — the first cut silently reported
    every cohort as appeared/vanished (r10 review catch)."""
    from nosql_join_stream_spark.operators.expectations import (
        psi_against_baseline, write_psi_baseline)
    df = spark.createDataFrame(
        [("a", float(i % 20)) for i in range(100)],
        "src string, v double")
    path = str(tmp_path / "b3")
    write_psi_baseline(df, path, "v")  # ungrouped
    with pytest.raises(ValueError, match="group_col"):
        psi_against_baseline(spark, path, df, "v", group_col="src")


def test_psi_baseline_appearing_cohort_counts(spark, tmp_path):
    from nosql_join_stream_spark.operators.expectations import (
        psi_against_baseline, write_psi_baseline)
    old = spark.createDataFrame(
        [("a", float(i % 20)) for i in range(100)],
        "src string, v double")
    new = spark.createDataFrame(
        [("a", float(i % 20)) for i in range(100)]
        + [("c", float(i)) for i in range(77)],
        "src string, v double")
    path = str(tmp_path / "b4")
    write_psi_baseline(old, path, "v", group_col="src")
    out = {r["grp"]: r for r in psi_against_baseline(
        spark, path, new, "v", group_col="src").collect()}
    assert out["c"]["psi"] is None and out["c"]["drifted"]
    assert out["c"]["n_new"] == 77 and out["c"]["n_old"] == 0
    assert not out["a"]["drifted"] and out["a"]["n_new"] == 100


def test_drift_psi_standing_query_reuses_baseline(spark, sf_dir):
    """The registered drift_psi_standing query must materialize its
    PSI baseline ONCE per (process, sf) and serve every later
    invocation from the standing artifact — invocation 2 returns
    identical rows without rewriting a single baseline file (r15
    optimization: the first cut re-scanned the baseline half of
    events and rewrote the artifact on every call)."""
    import glob
    import os

    from nosql_join_stream_spark.queries import REGISTRY, artifact_dir
    from nosql_join_stream_spark.queries import sf_tag

    first = sorted(map(tuple, REGISTRY["drift_psi_standing"]
                       .fn(spark, sf_dir).collect()))
    path = artifact_dir("nsjs_psibase", sf_tag(sf_dir))
    files = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(path, "*"))}
    assert files, "baseline artifact missing after first invocation"
    second = sorted(map(tuple, REGISTRY["drift_psi_standing"]
                        .fn(spark, sf_dir).collect()))
    assert first == second
    after = {f: os.path.getmtime(f)
             for f in glob.glob(os.path.join(path, "*"))}
    assert after == files, "baseline was rewritten on reuse"
