"""Streaming event-log (reference S7/S8 unbounded scan → Structured
Streaming). Batch-equivalence: draining the finite backfill with
AvailableNow must reproduce the batch answer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_join_stream_spark.catalog import table_path
from nosql_join_stream_spark.streaming.log_stream import (
    read_log_stream, run_available_now, windowed_counts)


def test_stream_scan_offset_matches_batch(spark, engine, sf_dir):
    stream = read_log_stream(spark, table_path(sf_dir, "events"), key=7, offset=100)
    q = (stream.writeStream.outputMode("append")
         .format("memory").queryName("t_scan")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.table("t_scan").count()
    want = engine.log_from("events", key=7, offset=100).count()
    assert got == want


def test_windowed_counts_match_batch(spark, engine, sf_dir):
    stream = read_log_stream(spark, table_path(sf_dir, "events"))
    run_available_now(windowed_counts(stream), "t_win")
    got = {(r.w_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.table("t_win").collect()}
    batch = (engine.table("events")
             .groupBy(F.window("ts", "1 hour"), "event_type")
             .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("s"))
             .select(F.col("window.start").alias("w_start"), "event_type", "n", "s"))
    want = {(r.w_start, r.event_type): (r.n, r.s) for r in batch.collect()}
    assert got == want
