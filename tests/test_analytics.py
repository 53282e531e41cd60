"""Semantic invariants for the analytics surface (SURVEY §2.6 —
beyond-reference, graded as first-class). Value-level correctness is
covered by tools/check_correctness.py against DuckDB."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_join_stream_spark.queries import REGISTRY


def _run(name, spark, sf_dir):
    return REGISTRY[name].fn(spark, sf_dir)


def test_topk_bounded_per_group(spark, sf_dir):
    df = _run("window_topk_per_group", spark, sf_dir)
    per = df.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] <= 3 for r in per)
    assert df.filter(F.col("rn") > 3).count() == 0


def test_sessionize_bounds(spark, sf_dir):
    df = _run("sessionize", spark, sf_dir).collect()
    for r in df:
        assert 1 <= r.n_sessions <= r.n_events


def test_asof_never_after(spark, sf_dir):
    df = _run("asof_join", spark, sf_dir)
    assert df.filter(F.col("last_click_ts") > F.col("purchase_ts")).count() == 0


def test_rollup_grand_total(spark, sf_dir, engine):
    df = _run("rollup_region_nation", spark, sf_dir)
    grand = df.filter(F.col("region").isNull() & F.col("nation").isNull()).collect()
    assert len(grand) == 1
    assert grand[0].n_customers == engine.table("customer").count()


def test_pivot_row_sums(spark, sf_dir, engine):
    df = _run("pivot_priority_status", spark, sf_dir)
    tot = (df.select((F.col("n_open") + F.col("n_filled") + F.col("n_pending"))
                     .alias("t")).agg(F.sum("t")).collect()[0][0])
    assert tot == engine.table("orders").count()


def test_set_ops_excludes_pending(spark, sf_dir, engine):
    out = {r.o_custkey for r in _run("set_ops", spark, sf_dir).collect()}
    pend = {r.o_custkey for r in engine.table("orders")
            .filter("o_orderstatus = 'P'").select("o_custkey").collect()}
    assert not (out & pend)


def test_approx_percentiles_close_to_exact(spark, engine):
    li = engine.table("lineitem")
    approx = {r.l_returnflag: r.approx_pcts for r in
              li.groupBy("l_returnflag")
                .agg(F.approx_percentile("l_extendedprice",
                                         F.lit([0.5, 0.9, 0.99]),
                                         F.lit(10000)).alias("approx_pcts"))
                .collect()}
    exact = {r.l_returnflag: r.pcts for r in
             li.groupBy("l_returnflag")
               .agg(F.percentile("l_extendedprice",
                                 F.lit([0.5, 0.9, 0.99])).alias("pcts"))
               .collect()}
    assert set(approx) == set(exact)
    for flag, ap in approx.items():
        for a, x in zip(ap, exact[flag]):
            assert abs(a - x) <= max(abs(x) * 0.02, 1.0)


def test_funnel_stages_monotone_nonincreasing(spark, sf_dir):
    from nosql_join_stream_spark.queries import REGISTRY
    rows = {r.stage: r.n_users for r in
            REGISTRY["funnel_view_click_purchase"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"view", "view>click", "view>click>purchase"}
    assert rows["view"] >= rows["view>click"] >= rows["view>click>purchase"]
    assert rows["view"] > 0


def test_rate_spikes_all_above_3_sigma(spark, sf_dir):
    rows = _run("events_rate_spikes", spark, sf_dir).collect()
    assert all(r.zscore > 3.0 for r in rows)
    assert all(r.n > r.mu + 3 * r.sd - 1e-6 for r in rows)
    # spikes are by construction rare for every type
    total_hours = (_run("events_time_rollup", spark, sf_dir)
                   .filter("day IS NOT NULL AND hour IS NOT NULL").count())
    assert len(rows) < 0.05 * max(total_hours, 1)
