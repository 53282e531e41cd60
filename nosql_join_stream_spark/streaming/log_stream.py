"""Streaming event-log — the unbounded form of ``Log[M].from``.

Reference: the event log is consumed as an unbounded resumable scan
from ``offset`` (log/package.scala:56-62) with demand-driven paging
(CassandraAsyncStage.scala:29-100, page 512) and backpressure
(SURVEY.md §2.7 T1-T2).  Structured Streaming replaces all of it:
``readStream`` + ``startingOffsets``-analog filter, trigger pacing
(``maxFilesPerTrigger``) instead of Rx ``request(n)``, and
``Trigger.AvailableNow`` for run-to-completion tests.

The reference has NO watermark/event-time semantics (§2.7 T6); we
expose them anyway (windowed_counts) because any 100 TB streaming
deployment needs bounded state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.LongType()),  # nanos-as-long (catalog note)
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def read_log_stream(spark: SparkSession, path: str, key=None, offset: int = 0,
                    max_files_per_trigger: int | None = None) -> DataFrame:
    """Unbounded scan of the events log (reference S7/S8).

    ``key``/``offset`` mirror ``Log[M].from(query, key, offset)``;
    backpressure (Rx request(n) pages of 8, Akka buffers 32/64 —
    BASELINE.md) becomes declarative trigger pacing.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if os.path.isfile(path):
        # the file-stream source monitors a directory; point it at the
        # parent and glob-filter to the one log file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    df = reader.load(path)
    df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if key is not None:
        df = df.filter(F.col("user_id") == F.lit(key))
    if offset:
        df = df.filter(F.col("event_id") >= F.lit(int(offset)))
    return df


def windowed_counts(stream: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Event-time tumbling-window aggregate with bounded state.
    Beyond-reference (§2.7 T6) but required at scale: the watermark
    caps state-store size; without it a 100 TB stream grows state
    forever."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window), F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select(F.col("window.start").alias("w_start"),
                    F.col("event_type"), F.col("n_events"), F.col("sum_value")))


def run_available_now(agg: DataFrame, query_name: str,
                      output_mode: str = "complete") -> None:
    """Drain everything currently in the source and stop — the batch
    test harness for streaming queries (Trigger.AvailableNow).

    Default ``complete`` mode: with a finite backfill, append mode
    withholds windows the watermark hasn't passed, so complete mode is
    the one whose final memory-sink contents equal the batch answer.
    """
    q = (agg.writeStream.outputMode(output_mode)
         .format("memory").queryName(query_name)
         .trigger(availableNow=True).start())
    q.awaitTermination()
