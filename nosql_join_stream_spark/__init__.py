"""nosql_join_stream_spark — a PySpark-native analytics engine with the
query & data-processing capabilities of haghard/nosql-join-stream.

The reference (see /root/reference, SURVEY.md) exposes MongoDB/Cassandra
collections as backpressured record streams and performs correlated
(index nested-loop) inner joins and partitioned event-log scans over
them.  This engine re-expresses those capabilities Spark-first:

- ``StorageModule`` family (reference join/package.scala:18,25-41)
  → a single :class:`Engine` over DataFrames; batch vs streaming is
  ``spark.read`` vs ``spark.readStream``.
- ``Join[M].inner`` (reference join/package.scala:52-63)
  → :func:`operators.join.inner_join` — a distributed equi/theta join
  replacing the reference's one-DB-query-per-outer-row pattern.
- Free-monad query DSL (reference dsl/package.scala, mongo/package.scala:82-120)
  → :mod:`dsl` Column-expression builder.
- MQL string parser (reference mongo/mqlparser/package.scala:67-235)
  → :mod:`mql` translator to Spark Columns.
- Partitioned event-log scan (reference log/package.scala:56-62)
  → :mod:`operators.log` filter+orderBy with partition pruning, and
  :mod:`streaming.log_stream` for the unbounded form.

Beyond-reference, scale-oriented operators (dedup, similarity search,
text analysis, multimodal columns) live under :mod:`operators`.
"""

from nosql_join_stream_spark.catalog import TABLES, load_table
from nosql_join_stream_spark.dsl import Q, q
from nosql_join_stream_spark.engine import (Engine, QueryTimeoutError,
                                            QueryValidationError)
from nosql_join_stream_spark.mql import MQLParseError, mql_to_column
from nosql_join_stream_spark.session import get_session
from nosql_join_stream_spark.sinks import compact, write_bucketed, write_table

__all__ = ["Engine", "get_session", "load_table", "TABLES",
           "Q", "q", "mql_to_column",
           "QueryValidationError", "QueryTimeoutError", "MQLParseError",
           "write_table", "write_bucketed", "compact"]
