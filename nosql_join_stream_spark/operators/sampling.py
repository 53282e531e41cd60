"""Deterministic sampling for training-data mixture control.

Beyond the reference (no sampling surface): a training pipeline
resamples strata (language, source, quality bucket) to target mixture
weights.  ``sample()``-style RNG sampling is neither reproducible
across engines nor stable under retries; instead we hash the row id
with a fixed multiplicative hash (Knuth 2654435761 mod 2^32) and keep
rows whose bucket falls under the stratum's rate.  The decision is a
pure JVM expression on each row — no shuffle, no driver round-trip,
fully pushdown-friendly — and any engine (DuckDB oracle included) can
replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761
MOD = 4294967296  # 2^32
RED = 2147483648  # 2^31 — pre-multiply reduction
BUCKETS = 1000


def hash_bucket(id_col: Column) -> Column:
    """Deterministic per-mille bucket of a non-negative integer id.

    The id is reduced mod 2^31 BEFORE the Knuth multiply so the
    product stays < 2^63 for any 64-bit id: without the reduction,
    ids ≥ ~3.5e9 (routine at 100 TB) overflow signed int64 — Spark
    under ANSI mode throws, DuckDB silently promotes to int128, and
    the two engines diverge.  Same formula on both sides."""
    r = id_col.cast("long") % F.lit(RED)
    return ((r * F.lit(KNUTH)) % F.lit(MOD)) % F.lit(BUCKETS)


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      rates_per_mille: dict[str, int],
                      default_per_mille: int = 1000) -> DataFrame:
    """Keep each row iff hash_bucket(id) < rate(stratum); attach
    ``weight`` = 1000/rate so downstream aggregates stay unbiased
    (Horvitz-Thompson).  Rates are per-mille (0..1000)."""
    for name, r in [("default", default_per_mille), *rates_per_mille.items()]:
        if not 0 <= r <= BUCKETS:
            raise ValueError(
                f"rate for {name!r} must be in [0, {BUCKETS}] per-mille, "
                f"got {r}")
    rate = F.lit(float(default_per_mille))
    for value, r in sorted(rates_per_mille.items()):
        rate = F.when(F.col(strata_col) == value, F.lit(float(r))) \
                .otherwise(rate)
    bucket = hash_bucket(F.col(id_col))
    return (df.withColumn("_rate", rate)
              .filter(bucket < F.col("_rate"))
              .withColumn("weight",
                          F.round(F.lit(float(BUCKETS)) / F.col("_rate"), 6))
              .drop("_rate"))
