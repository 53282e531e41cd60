"""Stream combinators — reference semantics:
zip stops at shorter (PartitionedLogCassandraSpec.scala:116-152 asserts
domainSize-15 pairs), either preserves the combined multiset
(IntegrationMongoClientSpec.scala:181-206 asserts total count 5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_join_stream_spark.operators.combinators import (
    concat_streams, either_merge, zip_streams)


def test_zip_stops_at_shorter(engine):
    a = engine.log_from("events", key=3).select("event_id")
    b = engine.log_from("events", key=5).select("event_id").limit(5)
    z = zip_streams(a, b, ["event_id"], ["event_id"])
    assert z.count() == min(a.count(), 5)


def test_zip_is_positional(engine, spark):
    a = spark.createDataFrame([(10,), (20,), (30,)], "x int")
    b = spark.createDataFrame([(1,), (2,)], "y int")
    z = zip_streams(a, b, ["x"], ["y"]).orderBy("l_x")
    assert [(r.l_x, r.r_y) for r in z.collect()] == [(10, 1), (20, 2)]


def test_either_total_count(engine):
    left = engine.table("customer").select(F.col("c_name").alias("name"))
    right = engine.table("supplier").select(F.col("s_name").alias("name"))
    m = either_merge(left, right)
    assert m.count() == left.count() + right.count()
    sides = {r.side for r in m.select("side").distinct().collect()}
    assert sides == {"left", "right"}


def test_either_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, 3.0)], "id int, b double")
    m = either_merge(a, b)
    assert set(m.columns) == {"id", "a", "b", "side"}
    assert m.count() == 2


def test_concat_order(spark):
    a = spark.createDataFrame([(2,), (1,)], "seq int")
    b = spark.createDataFrame([(1,), (0,)], "seq int")
    out = concat_streams(a, b, order_col="seq").select("seq").collect()
    assert [r.seq for r in out] == [1, 2, 0, 1]


def test_pipe_and_tee(engine):
    from nosql_join_stream_spark.operators.combinators import pipe, tee
    from pyspark.sql import functions as F
    orders = engine.table("orders")
    out = pipe(orders,
               lambda d: d.filter("o_totalprice > 0"),
               lambda d: d.select("o_orderkey", "o_orderstatus"))
    assert out.columns == ["o_orderkey", "o_orderstatus"]
    assert out.count() == orders.filter("o_totalprice > 0").count()
    t = tee(orders.select("o_custkey"), orders.select("o_custkey"),
            lambda l, r: l.intersect(r))
    assert t.count() == orders.select("o_custkey").distinct().count()
