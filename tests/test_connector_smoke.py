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
