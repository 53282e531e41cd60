"""Custom function surface: scalar / aggregate (UDAF) / table (UDTF).

The reference's whole "UDF surface" is closures passed to map/flatMap
and the join mapper (SURVEY.md §2.8 — no UDAF or UDTF concept exists
there).  Spark-first policy, in priority order:

1. scalar logic = Column expression composition (JVM, codegen) —
   ``normalize_text`` below;
2. custom aggregates = Arrow-batched GROUPED_AGG pandas_udf — one
   numpy reduction per group partition, map-side partials preserved —
   ``geometric_mean`` below;
3. row-set producers = Python UDTF (Spark 4) — ``SentenceSplit``
   below, the lateral-view generator form.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType


def epoch_us(col):
    """Microseconds since epoch for TIMESTAMP *and* TIMESTAMP_NTZ.

    Parquet timestamps written without a timezone (isAdjustedToUTC =
    false) load as TIMESTAMP_NTZ, which ``unix_micros`` / numeric casts
    reject outright.  Casting NTZ -> TIMESTAMP interprets the naive
    value in the session timezone (pinned to UTC in session.py), so the
    result equals DuckDB's ``epoch_us(ts)`` on the same naive value.
    """
    return F.unix_micros(F.col(col).cast("timestamp")
                         if isinstance(col, str) else col.cast("timestamp"))


def normalize_text(col):
    """Scalar normalization as pure Column composition (whole-stage
    codegen, no Python): lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


# a DataType instance, not a DDL string: string return types are parsed
# through the ACTIVE SparkContext at decoration time, which would make
# this module unimportable before a session exists
@pandas_udf(DoubleType())
def geometric_mean(v: "pd.Series") -> float:
    """GROUPED_AGG pandas UDAF: exp(mean(ln x)) over positive values.
    Arrow ships each group's column once; numpy reduces it — the
    sanctioned custom-aggregate shape (vs a row-at-a-time UDAF)."""
    import numpy as np
    x = v[v > 0]
    return float(np.exp(np.log(x).mean())) if len(x) else float("nan")


@udtf(returnType="sentence string, n_words int", useArrow=True)
class SentenceSplit:
    """Python UDTF (table function): one row per '.'-terminated
    sentence with its word count — the generator/lateral-view form the
    reference expresses only as flatMap closures.

    ``useArrow`` is pinned True rather than left to the session conf:
    the conf is read at DECORATION time, so importing this module
    before a SparkSession exists (as a driver harness typically does)
    silently downgrades the UDTF to row-at-a-time BatchEvalPython —
    caught by tools/explain_audit.py."""

    def eval(self, text: str):
        for raw in (text or "").split("."):
            s = raw.strip()
            if s:
                yield s, len(s.split())
