"""Stream combinators — reference ScalazStreamsOps surface.

Reference (mongo/channel/package.scala:49-204): ``map``/``flatMap``
(→ select/withColumn/explode, free in Spark), plus three with no
direct relational analog, implemented here:

- ``zip``/``zipWith`` (:92-108,143,153): deterministic pairwise
  interleave of two streams, stops at the shorter ("querying
  one-to-one relations").  Stream position is not a relational
  concept, so the Spark form is ORDER-DEFINED: callers supply sort
  keys, we assign ``row_number()`` per side and inner-join on it.
  At scale this is two range-partitioned sorts + one equi-join on a
  dense int key — no skew (keys are unique), AQE-coalesced.
- ``either`` (:129-131): nondeterministic merge of two streams into
  ``A \\/ B`` — relationally a tagged union; we tag with a ``side``
  column and unionByName with missing-column fill.
- ``++`` concat (SportCenterSpec.scala:88): union preserving an
  explicit order key when sequence matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_pos(df: DataFrame, order_by: Sequence[str], pos_col: str) -> DataFrame:
    """Assign 1-based global positions by ``order_by`` — scalably.

    An unpartitioned ``row_number()`` window funnels every row through
    one task (the classic 100 TB cliff).  Instead, the two-pass dense
    global index (what RDD ``zipWithIndex`` does, kept in DataFrame
    land so codegen survives):

    1. range-repartition + sort within partitions on the order key —
       partitions now hold disjoint, internally-sorted key ranges;
    2. within-partition ``row_number`` over a window partitioned by
       ``spark_partition_id()`` — fully parallel;
    3. per-partition row counts (a partitions-sized aggregate) →
       cumulative offsets via a tiny single-partition window —
       broadcast-joined back.

    Global position = offset + within-partition rank.  Range
    partitioning puts equal keys in one partition, so the index
    matches the single-window result for any total ``order_by``.
    """
    cols = [F.col(c) for c in order_by]
    d = (df.repartitionByRange(*cols)
           .sortWithinPartitions(*cols)
           .withColumn("__pid", F.spark_partition_id()))
    w_in = Window.partitionBy("__pid").orderBy(*cols)
    d = d.withColumn("__rn", F.row_number().over(w_in))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (d.groupBy("__pid").agg(F.count("*").alias("__n"))
                .withColumn("__off", F.coalesce(F.sum("__n").over(w_off),
                                                F.lit(0)))
                .select("__pid", "__off"))
    return (d.join(F.broadcast(offsets), "__pid")
             .withColumn(pos_col, (F.col("__off") + F.col("__rn")).cast("int"))
             .drop("__pid", "__rn", "__off"))


def zip_streams(left: DataFrame, right: DataFrame,
                left_order: Sequence[str], right_order: Sequence[str],
                prefix: tuple[str, str] = ("l_", "r_")) -> DataFrame:
    """Reference ``zip`` (mongo/channel/package.scala:92-108): pair the
    i-th row of each side (by the given orders), stop at the shorter —
    PartitionedLogCassandraSpec.scala:116-152 asserts exactly
    min(|left|,|right|) pairs."""
    lp, rp = prefix
    lcols = [F.col(c).alias(lp + c) for c in left.columns]
    rcols = [F.col(c).alias(rp + c) for c in right.columns]
    lt = _with_pos(left.select(*lcols), [lp + c for c in left_order], "__pos")
    rt = _with_pos(right.select(*rcols), [rp + c for c in right_order], "__pos")
    return lt.join(rt, "__pos", "inner").drop("__pos")


def zip_with(left: DataFrame, right: DataFrame,
             left_order: Sequence[str], right_order: Sequence[str],
             mapper) -> DataFrame:
    """Reference ``zipWith(stream)(f)`` — zip then arbitrary projection."""
    zipped = zip_streams(left, right, left_order, right_order)
    cols = mapper(zipped) if callable(mapper) else list(mapper)
    return zipped.select(*cols)


def either_merge(left: DataFrame, right: DataFrame,
                 tags: tuple[str, str] = ("left", "right"),
                 tag_col: str = "side") -> DataFrame:
    """Reference ``either`` (wye.either nondeterministic merge,
    mongo/channel/package.scala:129-131) → tagged union.  The
    reference only guarantees that all elements of both streams
    appear (IntegrationMongoClientSpec.scala:181-206 asserts total
    count); order is explicitly nondeterministic, which matches
    Spark union semantics exactly."""
    lt = left.withColumn(tag_col, F.lit(tags[0]))
    rt = right.withColumn(tag_col, F.lit(tags[1]))
    return lt.unionByName(rt, allowMissingColumns=True)


def pipe(df: DataFrame, *fns) -> DataFrame:
    """Reference ``|>`` transducer fusion (mongo/channel/package.scala:
    53-55): feed the stream through a chain of stream-to-stream
    functions.  Spark-first this is just function composition over the
    lazy plan — each ``fn: DataFrame -> DataFrame``; Catalyst fuses the
    stages exactly as scalaz fuses ``Process1``."""
    for fn in fns:
        df = fn(df)
    return df


def tee(left: DataFrame, right: DataFrame, transducer) -> DataFrame:
    """Reference ``tee(other)(t)`` (mongo/channel/package.scala:118-119)
    — a custom two-input transducer.  Relationally the general form is
    any function of two DataFrames (join/union/zip compose the common
    cases, SURVEY.md §2.5 C5); provided for API parity."""
    return transducer(left, right)


def concat_streams(first: DataFrame, second: DataFrame,
                   order_col: str | None = None) -> DataFrame:
    """Reference ``++`` sequential concat (SportCenterSpec.scala:88).
    Spark unions are unordered; when downstream consumers need the
    "first then second" sequence, a ``__src`` rank + order key defines
    it relationally."""
    f = first.withColumn("__src", F.lit(0))
    s = second.withColumn("__src", F.lit(1))
    out = f.unionByName(s, allowMissingColumns=True)
    if order_col is not None:
        out = out.orderBy("__src", order_col)
    return out
