"""Live-connector smoke (reference storage.scala:593-616,644-658).

Round-3 review called the connector pass-through the one untested seam:
option assembly is unit-tested, but nothing exercised `Engine.load`
through Spark's DataSource resolution.  This smoke closes as much of
that seam as a hermetic container allows:

- no connector jar on the classpath  -> the test SKIPS (documented
  environment limitation, mirrors the reference's it-tagged
  integration specs that need an embedded DB);
- jar present, no server             -> the read must fail with a
  CONNECTION error that carries the URI we passed — proving the
  options crossed Engine.load -> DataFrameReader -> connector intact
  (a ClassNotFound/unresolved-source error here would mean the seam is
  broken, and fails the test);
- jar present AND a live server      -> the read returns rows.
"""

from __future__ import annotations

import pytest

from nosql_join_stream_spark.engine import Engine


_SMOKE_URI = "mongodb://127.0.0.1:27017"
_UNRESOLVED = ("failed to find data source", "classnotfound",
               "cannot find catalog plugin", "data source provider")


def _mongo_source_available(spark) -> bool:
    """True iff the mongo-spark-connector resolves as a DataSource.

    Resolution is probed by attempting a read with a 1ms server
    selection timeout: an unresolved-source error means no jar; any
    connector-side error (server selection, auth, ...) means the jar
    is present and the probe doubles as the actual smoke.
    """
    try:
        (spark.read.format("mongodb")
         .option("connection.uri",
                 _SMOKE_URI + "/?serverSelectionTimeoutMS=1")
         .option("database", "smoke").option("collection", "smoke")
         .load().limit(1).collect())
        return True  # a live server answered — full end-to-end
    except Exception as ex:  # noqa: BLE001 — classify, don't mask
        msg = str(ex).lower()
        return not any(tok in msg for tok in _UNRESOLVED)


def test_jdbc_derby_end_to_end(spark):
    """The one non-file DataSource that EXECUTES in this container:
    embedded Derby ships in Spark's jars dir, so the full
    Engine.load → DataFrameReader → connector seam — the exact
    option-forwarding path the mongo/cassandra smokes can only probe
    — runs end-to-end: write through the jdbc DataSource, read back
    through Engine.load, and verify the predicate PUSHES DOWN into the
    JDBCRelation scan (the reference's query-to-server contract,
    storage.scala:593-616, expressed Spark-side)."""
    import os

    from pyspark.sql import functions as F
    from nosql_join_stream_spark.engine import QueryValidationError

    url = f"jdbc:derby:memory:smoke{os.getpid()};create=true"
    df = spark.range(5).select(F.col("id").alias("k"),
                               (F.col("id") * 2).alias("v"))
    (df.write.format("jdbc").option("url", url)
       .option("dbtable", "t_smoke").mode("overwrite").save())

    eng = Engine(spark)
    back = eng.load(fmt="jdbc", url=url, dbtable="t_smoke")
    assert sorted((r.k, r.v) for r in back.collect()) == \
        [(i, 2 * i) for i in range(5)]

    # predicate reaches the scan: JDBC → WHERE on the server side
    flt = back.filter("k >= 3")
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,3)" in plan
    assert sorted(r.k for r in flt.collect()) == [3, 4]

    # fail-fast builder validation BEFORE any I/O
    with pytest.raises(QueryValidationError, match="requires options"):
        eng.load(fmt="jdbc", dbtable="t_smoke")
    with pytest.raises(QueryValidationError, match="exactly one"):
        eng.load(fmt="jdbc", url=url)
    with pytest.raises(QueryValidationError, match="exactly one"):
        eng.load(fmt="jdbc", url=url, dbtable="t", query="SELECT 1")
    with pytest.raises(QueryValidationError, match="takes no path"):
        eng.load(path="/tmp/x", fmt="jdbc", url=url, dbtable="t_smoke")


def test_mongodb_read_end_to_end_or_skip(spark):
    if not _mongo_source_available(spark):
        pytest.skip("mongo-spark-connector jar not on the classpath "
                    "(hermetic container); option-assembly coverage "
                    "lives in test_engine_errors")
    eng = Engine(spark)
    try:
        rows = eng.load(
            fmt="mongodb",
            **{"connection.uri":
                   _SMOKE_URI + "/?serverSelectionTimeoutMS=200",
               "database": "smoke", "collection": "smoke"},
        ).limit(1).collect()
    except Exception as ex:  # noqa: BLE001
        msg = str(ex).lower()
        # No server in this environment: the error must be a
        # connector-side connection failure that echoes our target —
        # i.e. the options Engine.load forwarded were used for I/O.
        assert not any(tok in msg for tok in _UNRESOLVED), (
            f"DataSource resolution broke after Engine.load: {ex}")
        assert "27017" in msg or "timed out" in msg or "connection" in msg, (
            f"expected a connection error carrying the URI target: {ex}")
    else:
        assert isinstance(rows, list)  # live server: genuine end-to-end
