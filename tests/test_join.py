"""Join semantics — mirrors reference JoinMongoSpec / JoinCassandraSpec:
deterministic-count golden assertions (join output = programmersSize,
JoinMongoSpec.scala:75; = measureSize × sensors.size,
JoinCassandraSpec.scala:80-82)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_join_stream_spark.operators.join import inner_join


def test_fk_join_count_equals_fact_rows(engine):
    """Every lineitem row has a matching supplier (FK integrity) →
    inner-join count == fact-side count (the reference's
    measures×sensors invariant)."""
    supplier = engine.table("supplier")
    lineitem = engine.table("lineitem")
    joined = inner_join(supplier, lineitem,
                        on=supplier["s_suppkey"] == lineitem["l_suppkey"],
                        broadcast_outer=True)
    assert joined.count() == lineitem.count()


def test_inner_join_drops_unmatched(engine, spark):
    """Inner semantics: outer rows with no match emit nothing
    (JoinCassandraSpec.scala:80-82)."""
    supplier = engine.table("supplier")
    ghost = spark.range(1).select(
        F.lit(10**9).alias("l_suppkey"), F.lit(1.0).alias("l_quantity"))
    joined = inner_join(supplier, ghost,
                        on=supplier["s_suppkey"] == ghost["l_suppkey"])
    assert joined.count() == 0


def test_mapper_projection(engine):
    """mapper: (Record, Record) ⇒ A arbitrary projection
    (join/package.scala:56) as Column expressions."""
    nation = engine.table("nation")
    customer = engine.table("customer")
    out = inner_join(
        nation, customer,
        on=nation["n_nationkey"] == customer["c_nationkey"],
        mapper=lambda j: [F.concat(j["c_name"], F.lit(" uses "),
                                   j["n_name"]).alias("msg")])
    row = out.limit(1).collect()
    assert out.columns == ["msg"]
    assert len(row) == 1 and " uses " in row[0].msg


def test_one_to_many_multiplicity(engine):
    """One-to-many: per-key output count == per-key inner count."""
    supplier = engine.table("supplier")
    lineitem = engine.table("lineitem")
    per_key_inner = {r["l_suppkey"]: r["cnt"] for r in
                     lineitem.groupBy("l_suppkey").agg(F.count("*").alias("cnt")).collect()}
    joined = inner_join(supplier, lineitem,
                        on=supplier["s_suppkey"] == lineitem["l_suppkey"])
    per_key_join = {r["s_suppkey"]: r["cnt"] for r in
                    joined.groupBy("s_suppkey").agg(F.count("*").alias("cnt")).collect()}
    assert per_key_join == per_key_inner


def test_theta_join_non_equi(engine):
    """Non-equi correlated predicate (DSL allows $gt against outer
    values) → theta join."""
    nation = engine.table("nation").filter(F.col("n_nationkey") < 3)
    customer = engine.table("customer").filter(F.col("c_custkey") < 20)
    out = inner_join(nation, customer,
                     on=customer["c_nationkey"] > nation["n_nationkey"])
    expected = (nation.crossJoin(customer.select("c_nationkey", "c_custkey"))
                .filter(F.col("c_nationkey") > F.col("n_nationkey")).count())
    assert out.count() == expected


def test_range_join_binned_equals_theta_and_avoids_bnlj(engine, spark):
    from pyspark.sql import functions as F

    from nosql_join_stream_spark.operators.join import range_join_binned
    ev = engine.table("events")
    left = (ev.filter(F.col("event_type") == "purchase")
              .select(F.col("event_id").alias("l_id"),
                      F.col("user_id").alias("l_user"),
                      F.col("ts").alias("l_ts")))
    right = ev.select(F.col("event_id").alias("r_id"),
                      F.col("user_id").alias("r_user"),
                      F.col("ts").alias("r_ts"))
    m = 60_000_000
    binned = range_join_binned(left, right, "l_ts", "r_ts", -m, m,
                               condition=F.col("r_user") != F.col("l_user"))
    theta = left.join(
        right,
        (F.unix_micros("r_ts") >= F.unix_micros("l_ts") - m)
        & (F.unix_micros("r_ts") <= F.unix_micros("l_ts") + m)
        & (F.col("r_user") != F.col("l_user")))
    got = {(r.l_id, r.r_id) for r in binned.collect()}
    want = {(r.l_id, r.r_id) for r in theta.collect()}
    assert got == want and len(got) > 0
    # the point of binning: an equi-join plan, not a nested loop
    plan = binned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # inverted bounds must fail fast
    import pytest
    with pytest.raises(ValueError):
        range_join_binned(left, right, "l_ts", "r_ts", m, -m)


def test_runtime_bloom_filter_prunes_fact_scan(spark, engine):
    """100 TB join-pruning evidence: with a selective dim-side filter,
    Catalyst injects a runtime bloom filter (bloom_filter_agg on the
    dim key -> might_contain on the fact scan) so the big side drops
    non-joining rows BEFORE the shuffle — the declarative form of a
    hand-built semi-join reduction.  Thresholds are tuned down to
    test scale; at production scale the defaults trigger on their
    own.  Results must equal the un-filtered plan's."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = engine.table("orders").filter("o_totalprice > 450000")
        li = engine.table("lineitem")
        j = (li.join(o, li.l_orderkey == o.o_orderkey)
               .select("l_orderkey", "o_totalprice"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        with_bloom = sorted((r.l_orderkey, r.o_totalprice)
                            for r in j.collect())
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    plain = sorted((r.l_orderkey, r.o_totalprice) for r in
                   engine.table("lineitem")
                   .join(engine.table("orders")
                         .filter("o_totalprice > 450000"),
                         F.col("l_orderkey") == F.col("o_orderkey"))
                   .select("l_orderkey", "o_totalprice").collect())
    assert with_bloom == plain and len(plain) > 0


def test_asof_join_backward_forward_nearest_hand_case(spark):
    from nosql_join_stream_spark.operators.join import asof_join

    trades = spark.createDataFrame(
        [("a", 10, 1), ("a", 25, 2), ("b", 5, 3), ("c", 7, 4)],
        "sym string, t_ts long, trade_id int")
    quotes = spark.createDataFrame(
        [("a", 8, 100.0), ("a", 10, 101.0), ("a", 30, 102.0),
         ("b", 9, 200.0)],
        "sym string, q_ts long, px double")

    back = {r.trade_id: (r.asof_q_ts, r.asof_px)
            for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts",
                               payload=["px"],
                               direction="backward").collect()}
    # equal-ts quote included (<=); no earlier quote for b's t=5; no
    # quotes at all for sym c
    assert back[1] == (10, 101.0)
    assert back[2] == (10, 101.0)
    assert back[3] == (None, None)
    assert back[4] == (None, None)

    fwd = {r.trade_id: (r.asof_q_ts, r.asof_px)
           for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts",
                              payload=["px"],
                              direction="forward").collect()}
    assert fwd[1] == (10, 101.0)      # equal-ts inclusive (>=)
    assert fwd[2] == (30, 102.0)
    assert fwd[3] == (9, 200.0)
    assert fwd[4] == (None, None)

    near = {r.trade_id: r.asof_q_ts
            for r in asof_join(trades, quotes, "sym", "t_ts", "q_ts",
                               direction="nearest").collect()}
    # t=25: back dt 15 vs fwd dt 5 -> 30; t=5: only forward exists
    assert near[1] == 10 and near[2] == 30 and near[3] == 9
    assert near[4] is None


def test_asof_join_tolerance_and_tie_break(spark):
    from nosql_join_stream_spark.operators.join import asof_join

    trades = spark.createDataFrame([("a", 100, 1)],
                                   "sym string, t_ts long, trade_id int")
    quotes = spark.createDataFrame(
        [("a", 10, 5.0), ("a", 95, 7.0), ("a", 95, 9.0)],
        "sym string, q_ts long, px double")
    # tolerance 3s: the t=95 quotes are 5s away -> NO match
    r = asof_join(trades, quotes, "sym", "t_ts", "q_ts", payload=["px"],
                  direction="backward",
                  tolerance_us=3_000_000).collect()[0]
    assert (r.asof_q_ts, r.asof_px) == (None, None)
    # tolerance 10s: matches, and the SAME-timestamp tie resolves to
    # the greatest payload (struct comparison — deterministic)
    r = asof_join(trades, quotes, "sym", "t_ts", "q_ts", payload=["px"],
                  direction="backward",
                  tolerance_us=10_000_000).collect()[0]
    assert (r.asof_q_ts, r.asof_px) == (95, 9.0)
