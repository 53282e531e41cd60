"""Typed projection contract — reference ``column[B]`` / ``as[T]``
Option semantics (decode failure => None, never an error;
mongotypes/package.scala:73-205)."""

from __future__ import annotations

from pyspark.sql import types as T

from nosql_join_stream_spark.typed import as_schema, column


def test_as_schema_null_on_failure_and_missing(spark):
    df = spark.createDataFrame(
        [("12", "1.5"), ("abc", "x"), (None, "2.0")], "a string, b string")
    out = as_schema(df, {"a": "int", "b": "double", "missing": "string"})
    rows = out.collect()
    assert [r.a for r in rows] == [12, None, None]       # bad cast -> None
    assert [r.b for r in rows] == [1.5, None, 2.0]
    assert all(r.missing is None for r in rows)          # absent -> typed NULL
    assert dict(out.dtypes) == {"a": "int", "b": "double",
                                "missing": "string"}


def test_as_schema_structtype_and_column(spark):
    df = spark.createDataFrame([("7", "x")], "k string, junk string")
    st = T.StructType([T.StructField("k", T.LongType())])
    out = as_schema(df, st)
    assert out.columns == ["k"] and out.collect()[0].k == 7
    c = column(df, "k", "int")
    assert c.columns == ["k"] and c.collect()[0].k == 7
