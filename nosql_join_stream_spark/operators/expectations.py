"""Data-quality expectations — declarative constraint checking.

Beyond the reference (which trusts its fixtures; SURVEY §5): a 100 TB
ingest needs machine-checked contracts — null rates, value ranges,
uniqueness, referential integrity — evaluated as a handful of
map-side-combinable aggregates, never a row-by-row validator.  The
pattern is public (Deequ / Great Expectations-style constraint
suites); the implementation here is plain DataFrame aggregation.

Three rule kinds, one report schema (rule, n_rows, n_violations,
passed):

- ``row_rule(name, predicate)`` — predicate must hold per row; the
  violation count is one SUM over the negated predicate (NULL counts
  as a violation: an unevaluable constraint is a broken one).
- ``unique_rule(name, cols)`` — violations = rows beyond the first of
  each duplicated key (n_rows − n_distinct): one partial-agg distinct.
- ``fk_rule(name, ref_df, key, ref_key)`` — referential integrity:
  violations = rows whose key has no match (left-anti join; broadcast
  when the reference side is a dimension).

Each rule is a tiny 1-row aggregate; the report unions them —
evaluation cost is one scan per source table (Spark shares the scan
across same-table rules via plan reuse), and the report is a handful
of rows regardless of data size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class _Rule:
    name: str
    frame: DataFrame  # 1-row (rule, n_rows, n_violations)


def row_rule(name: str, df: DataFrame, predicate: Column) -> _Rule:
    """Per-row constraint; NULL predicate = violation (an unevaluable
    constraint is a broken one, not a pass)."""
    viol = F.sum(F.when(F.coalesce(predicate, F.lit(False)), 0)
                  .otherwise(1)).cast("long")
    return _Rule(name, df.agg(
        F.lit(name).alias("rule"),
        F.count("*").alias("n_rows"),
        F.coalesce(viol, F.lit(0)).alias("n_violations")))


def unique_rule(name: str, df: DataFrame, cols: list[str]) -> _Rule:
    """Key-uniqueness: violations = rows beyond the first per key."""
    return _Rule(name, df.agg(
        F.lit(name).alias("rule"),
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("long").alias("n_violations")))


def fk_rule(name: str, df: DataFrame, ref: DataFrame,
            key: str, ref_key: str) -> _Rule:
    """Referential integrity: violations = rows whose key value has no
    match in the reference table (broadcast anti-join — reference
    sides are dimensions)."""
    orphans = df.join(F.broadcast(ref.select(F.col(ref_key).alias(key))
                                     .distinct()),
                      key, "left_anti")
    return _Rule(name, df.agg(F.count("*").alias("n_rows")).crossJoin(
        orphans.agg(F.count("*").cast("long").alias("n_violations")))
        .select(F.lit(name).alias("rule"), "n_rows", "n_violations"))


def table_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """ANALYZE-style column profile in ONE aggregate pass: per column
    — null count, exact distinct count (NULLs excluded, both engines'
    COUNT DISTINCT convention), numeric min/max via try_cast to
    double (non-numeric values profile as NULL bounds, never error).
    The single .agg computes every statistic map-side-combinable in
    one scan; ``stack`` unpivots the 1-row result into one row per
    column — at 100 TB this is one pass over the table regardless of
    how many columns are profiled, the profile that drives
    partition-size planning, skew checks, and expectations-rule
    thresholds."""
    if not cols:
        raise ValueError("table_profile needs at least one column")
    aggs = [F.count("*").alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.round(F.min(F.col(c).try_cast("double")), 4)
             .alias(f"__mn_{c}"),
            F.round(F.max(F.col(c).try_cast("double")), 4)
             .alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n_nulls, n_distinct, min_num, max_num)",
        "__n AS n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_num", "max_num")


def expectations_report(rules: list[_Rule]) -> DataFrame:
    """Union the rule aggregates into one (rule, n_rows, n_violations,
    passed) report — a handful of rows regardless of data size."""
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    out = rules[0].frame
    for r in rules[1:]:
        out = out.unionByName(r.frame)
    return out.withColumn("passed", (F.col("n_violations") == 0))


def sketch_cardinality_by_group(df, group_col: str, value_col: str,
                                rel_err: float = 0.05):
    """Mergeable distinct-count sketches (Apache DataSketches HLL via
    Spark's ``hll_sketch_agg``) with an IN-PLAN accuracy witness —
    the cardinality machinery a 100 TB deployment actually runs:
    exact ``COUNT(DISTINCT)`` re-shuffles the full value stream every
    time, while per-partition/per-day sketches are KBs that MERGE
    without re-scanning history.

    Returns one row per group plus an ``__ALL__`` row:
    (group, n_distinct, hll_ok) where ``n_distinct`` is the exact
    count (the oracle-checkable truth) and ``hll_ok`` asserts the
    sketch estimate is within ``rel_err`` of it.  The ``__ALL__``
    row's estimate comes from UNION-MERGING the per-group sketches
    (``hll_union_agg``) — the mergeability property itself under
    test, not just the per-group accuracy.  DataSketches HLL is
    hash-deterministic and order-independent, so the witness is
    stable across runs and engines.
    """
    from pyspark.sql import functions as F

    per = df.groupBy(group_col).agg(
        F.count_distinct(value_col).alias("n_distinct"),
        F.hll_sketch_agg(value_col).alias("sk"))
    # NULL groups report as the '<NULL>' group: without the coalesce
    # the sentinel guard below evaluates to NULL and assert_true
    # throws its (misleading) collision error for a legitimate group.
    # A REAL string group named '<NULL>' would be indistinguishable
    # from the null group, so it gets the same in-plan guard as
    # '__ALL__' (null-safe: <=> FALSE when the group IS null).
    grp_str = F.col(group_col).cast("string")
    per_rows = per.select(
        F.coalesce(grp_str, F.lit("<NULL>")).alias("grp"),
        "n_distinct",
        F.hll_sketch_estimate("sk").alias("est"),
        F.assert_true(~grp_str.eqNullSafe("<NULL>"),
                      F.lit("group value '<NULL>' collides with the "
                            "null-group sentinel")).alias("__chk0")
        ).drop("__chk0")
    # the merged-total row uses the in-band sentinel '__ALL__': a real
    # group with that name would alias it, so fail IN-PLAN (per-row
    # assert, no extra job) rather than return two conflicting rows
    per_rows = (per_rows.withColumn(
                    "__chk",
                    F.assert_true(F.col("grp") != "__ALL__",
                                  F.lit("group value '__ALL__' collides "
                                        "with the merged-total sentinel")))
                .drop("__chk"))
    total_exact = df.agg(F.count_distinct(value_col).alias("n_distinct"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    all_row = (total_exact.crossJoin(F.broadcast(merged))
               .select(F.lit("__ALL__").alias("grp"), "n_distinct", "est"))
    ok = (F.abs(F.col("est") - F.col("n_distinct"))
          <= F.lit(rel_err) * F.col("n_distinct"))
    return (per_rows.unionByName(all_row)
            .select("grp", "n_distinct", ok.alias("hll_ok")))


def profile_drift(old: DataFrame, new: DataFrame,
                  null_rate_tol: float = 0.05,
                  range_tol: float = 0.5) -> DataFrame:
    """Day-2 drift detection between two :func:`table_profile`
    outputs (e.g. yesterday's ingest vs today's): per column, the
    null-rate delta, distinct-ratio change, and numeric-range
    movement, each with a boolean flag — the automated "did the
    upstream change under us" check that catches silently-broken
    extractors before they poison a training run.

    Flags: ``null_drift`` — |null rate delta| > ``null_rate_tol``;
    ``range_drift`` — min/max moved by more than ``range_tol`` ×
    the OLD range (a new out-of-domain tail); ``appeared`` /
    ``vanished`` — column profiled on only one side (schema drift).
    Inputs are profile outputs (rows = columns), so the comparison
    is a join of two tiny frames — free at any data size; the cost
    was the two profile passes, already paid.
    """
    o = old.select(
        F.col("col_name"),
        (F.col("n_nulls") / F.col("n_rows")).alias("o_null_rate"),
        F.col("n_distinct").alias("o_distinct"),
        F.col("min_num").alias("o_min"), F.col("max_num").alias("o_max"))
    n = new.select(
        F.col("col_name"),
        (F.col("n_nulls") / F.col("n_rows")).alias("n_null_rate"),
        F.col("n_distinct").alias("n_distinct_new"),
        F.col("min_num").alias("n_min"), F.col("max_num").alias("n_max"))
    j = o.join(n, "col_name", "full_outer")
    # in-schema drift signals are only meaningful when BOTH profiles
    # carry the column; an appeared/vanished column already signals
    # schema drift, and treating its missing side as rate 0 would
    # raise a false null_drift for any column with NULLs
    both = F.col("o_null_rate").isNotNull() & F.col("n_null_rate").isNotNull()
    null_delta = F.when(
        both, F.round(F.col("n_null_rate") - F.col("o_null_rate"), 4))
    old_range = F.col("o_max") - F.col("o_min")
    moved = F.greatest(F.abs(F.col("n_min") - F.col("o_min")),
                       F.abs(F.col("n_max") - F.col("o_max")))
    range_drift = F.when(
        F.col("o_min").isNull() | F.col("n_min").isNull(), F.lit(False)
    ).otherwise(
        F.when(old_range > 0, moved > range_tol * old_range)
         .otherwise(moved > 0))
    return j.select(
        "col_name",
        null_delta.alias("null_rate_delta"),
        F.coalesce(F.abs(null_delta) > null_rate_tol,
                   F.lit(False)).alias("null_drift"),
        F.round(F.col("n_distinct_new")
                / F.col("o_distinct"), 4).alias("distinct_ratio"),
        range_drift.alias("range_drift"),
        F.col("o_null_rate").isNull().alias("appeared"),
        F.col("n_null_rate").isNull().alias("vanished"))
