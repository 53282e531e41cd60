"""The audit tooling must itself be verified: WINDOW_OK (r11 VERDICT
lead #4) is only trustworthy if the detector actually trips on the
hazard it allowlists — a single-task window over a row-proportional
frame — and stays quiet on the partitioned-but-unordered windows that
share its plan-text shape (the false-positive class that made a naive
bracket count useless)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import WINDOW_OK, unpartitioned_windows  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_detector_trips_on_row_proportional_global_window(spark):
    """The negative control: a row_number over the whole input with no
    partitioning — exactly the 100 TB-killer — must be counted."""
    df = (spark.range(1000)
          .withColumn("rn", F.row_number().over(Window.orderBy("id"))))
    assert unpartitioned_windows(_plan(df)) == 1


def test_detector_ignores_partitioned_windows(spark):
    """Partitioned windows — ordered or NOT (the unordered form prints
    the same two bracket groups as an unpartitioned one) — are fine."""
    df = spark.range(1000).withColumn("g", F.col("id") % 7)
    ordered = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    unordered = df.withColumn(
        "mx", F.max("id").over(Window.partitionBy("g")))
    assert unpartitioned_windows(_plan(ordered)) == 0
    assert unpartitioned_windows(_plan(unordered)) == 0


def test_detector_counts_frame_only_spec(spark):
    """No partition AND no order (frame-first spec) is still a
    single-task window."""
    df = spark.range(100).withColumn(
        "total", F.sum("id").over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)))
    assert unpartitioned_windows(_plan(df)) == 1


def test_window_ok_entries_state_a_bound():
    """Every allowlist entry must SAY why its frame is bounded — an
    empty reason is an unaudited exemption."""
    assert WINDOW_OK, "allowlist unexpectedly empty"
    for name, reason in WINDOW_OK.items():
        assert reason and len(reason) > 8, (name, reason)
