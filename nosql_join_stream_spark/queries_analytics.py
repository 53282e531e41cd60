"""Aggregation / window / set-op query surface (SURVEY §2.6).

The reference has NO aggregations, windows, or scalar function library
(SURVEY.md §2.6 — its only 'aggregations' are test-side folds,
AkkaJoinCassandraSpec.scala:75).  Capability parity for a Spark engine
means exposing the full built-in surface; every query here is pure
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen) — no UDFs.

Float policy: every aggregate double is rounded in BOTH engines (see
queries.py module doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nosql_join_stream_spark.functions import epoch_us
from nosql_join_stream_spark.queries import _engine, register


def _dec(col: str | F.Column) -> F.Column:
    """Cast a money expression to decimal(38,6) for ORDER-DETERMINISTIC
    summation.

    ``SUM(double)`` depends on accumulation order; TESTDATA money
    columns sit on the 2-dp grid, so 4-to-6-dp products like
    ``price*(1-disc)`` sum to values that land EXACTLY on the half-cent
    boundary routinely (r11: six of tpch_q11's 222 sums, e.g.
    311622.9935 — ``ROUND(...,2)`` then flips a cent between Spark's
    partial-agg order and DuckDB's, or between two partitionings of the
    same Spark query).  Decimal sums are exact and order-free, and the
    per-row double→decimal(38,6) cast is itself deterministic: no
    double at these magnitudes lies exactly halfway on the 6-dp grid
    (0.0000005 is not binary-representable), so both engines round the
    same row value to the same decimal.  Oracle twin:
    ``SUM(CAST(x AS DECIMAL(38,6)))``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(38,6)")


def _money_sum(col: str | F.Column, dp: int = 2) -> F.Column:
    """``ROUND(SUM(double), dp)`` made order-deterministic (see _dec).
    Oracle twin: ``ROUND(SUM(CAST(x AS DECIMAL(38,6))), dp)::DOUBLE``.
    """
    return F.round(F.sum(_dec(col)), dp).cast("double")


@register(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                  AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                             AS sum_base_price,
           ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE              AS sum_disc_price,
           ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                          AS DECIMAL(38,6))), 2)::DOUBLE              AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                  AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                             AS avg_price,
           ROUND(AVG(l_discount), 4)                                  AS avg_disc,
           COUNT(*)                                                   AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-shaped pricing summary: hash aggregate with partial "
        "(map-side) + final phases — Catalyst default; at 100 TB this is "
        "one shuffle on the 2-col group key (6 distinct groups → salting "
        "unnecessary, partial agg collapses virtually all rows map-side).",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        _money_sum(disc).alias("sum_disc_price"),
        _money_sum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    ))


@register(
    "agg_count_distinct",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders GROUP BY o_orderstatus
    """,
    doc="COUNT DISTINCT: Catalyst expands to a two-phase distinct "
        "aggregate (partial dedup per partition before the shuffle).",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("orders").groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    ))


@register(
    "agg_approx_distinct",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(*) AS n_rows,
           1 AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB path for "
        "cardinality — no exact distinct shuffle. HLL estimates are "
        "engine-specific, so the sketch value itself can't be hashed "
        "across engines; instead the query ASSERTS the sketch in-plan "
        "(|approx - exact| <= 3*rsd*exact, rsd=0.02) and emits the "
        "boolean alongside the exact count — a full value oracle.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("lineitem").groupBy("l_returnflag").agg(
                F.approx_count_distinct("l_partkey", 0.02)
                 .alias("approx_parts"),
                F.count_distinct("l_partkey").alias("exact_parts"),
                F.count("*").alias("n_rows"))
            .select("l_returnflag", "exact_parts", "n_rows",
                    (F.abs(F.col("approx_parts") - F.col("exact_parts"))
                     <= 0.06 * F.col("exact_parts"))
                    .cast("int").alias("approx_within_tol")))


@register(
    "agg_stats_funcs",
    """
    SELECT o_orderstatus,
           ROUND(MIN(o_totalprice), 2) AS min_price,
           ROUND(MAX(o_totalprice), 2) AS max_price,
           ROUND(AVG(o_totalprice), 4) AS avg_price,
           ROUND(STDDEV_SAMP(o_totalprice), 4) AS sd_price
    FROM orders GROUP BY o_orderstatus
    """,
    doc="Scalar/statistical aggregate library (absent from the reference, "
        "SURVEY §2.6): min/max/avg/stddev in one hash aggregate.",
)
def agg_stats_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("orders").groupBy("o_orderstatus").agg(
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
    ))


@register(
    "rollup_region_nation",
    """
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    doc="ROLLUP over a 3-table star join: both dims broadcast (tiny), "
        "single shuffle for the rollup aggregate.",
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    c, n, r = e.table("customer"), e.table("nation"), e.table("region")
    j = (c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
          .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]))
    return (j.rollup(r["r_name"].alias("region"), n["n_name"].alias("nation"))
             .agg(F.count("*").alias("n_customers"),
                  F.round(F.sum("c_acctbal"), 2).alias("total_bal")))


@register(
    "cube_flags",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (free from Spark; absent in reference §2.6).",
)
def cube_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("lineitem").cube("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("qty")))


@register(
    "pivot_priority_status",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_filled,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
    FROM orders GROUP BY o_orderpriority
    """,
    doc="PIVOT (status → columns). Spark .pivot with explicit value list "
        "avoids the extra distinct-values job — the scale-safe form.",
)
def pivot_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("orders")
            .groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["O", "F", "P"])
            .agg(F.count(F.lit(1)))
            .withColumnsRenamed({"O": "n_open", "F": "n_filled", "P": "n_pending"})
            .na.fill(0, ["n_open", "n_filled", "n_pending"]))


@register(
    "window_topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders)
    WHERE rn <= 3
    """,
    doc="Top-K per group: ranking window + filter. Catalyst inserts a "
        "WindowGroupLimit (partial top-k before the shuffle) — the "
        "scalable form of per-group top-k.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (e.table("orders")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn"))


@register(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS running_value,
           ROUND(value - lag(value) OVER (PARTITION BY user_id ORDER BY event_id), 2)
             AS delta
    FROM events
    """,
    doc="Frame-based running aggregate + lag over the event log — the "
        "per-key ordered-state pattern; partitions by key so state "
        "never crosses executors.",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("event_id")
    return (e.table("events").select(
        "event_id", "user_id",
        F.round(F.sum("value").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
         .alias("running_value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    ))


@register(
    "local_supplier_volume",
    """
    SELECT n.n_name AS nation,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-shaped six-table star join (local supplier volume): "
        "dimension chain broadcast, fact joins shuffle on their keys, "
        "Catalyst reorders and pushes both filters to the scans — the "
        "multi-join optimization showcase.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    r = e.table("region").filter(F.col("r_name") == "ASIA")
    n = e.table("nation")
    c = e.table("customer")
    o = e.table("orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
    l = e.table("lineitem")
    s = e.table("supplier")
    joined = (r.join(n, n["n_regionkey"] == r["r_regionkey"])
               .join(c, c["c_nationkey"] == n["n_nationkey"])
               .join(o, o["o_custkey"] == c["c_custkey"])
               .join(l, l["l_orderkey"] == o["o_orderkey"])
               .join(s, (s["s_suppkey"] == l["l_suppkey"])
                     & (s["s_nationkey"] == c["c_nationkey"])))
    return (joined.groupBy(n["n_name"].alias("nation"))
            .agg(_money_sum(l["l_extendedprice"] * (1 - l["l_discount"]))
                  .alias("revenue"),
                 F.count("*").alias("n_items")))


@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_quantity, 0.5), 4) AS p50,
           ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS price_p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles per group (Spark percentile == "
        "SQL quantile_cont semantics); the approx_percentile sketch is "
        "the 100 TB form — same plan shape, bounded state.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("lineitem").groupBy("l_returnflag")
            .agg(F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("p50"),
                 F.round(F.percentile("l_quantity", F.lit(0.95)), 4).alias("p95"),
                 F.round(F.percentile("l_extendedprice", F.lit(0.99)), 4)
                  .alias("price_p99")))


@register(
    "window_lead_lag",
    """
    SELECT user_id, event_id, value,
           ROUND(lag(value) OVER w, 2) AS prev_value,
           ROUND(lead(value) OVER w, 2) AS next_value
    FROM events WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Navigation window functions (lag/lead) per user ordered by "
        "event time — one shuffle on user_id.",
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.table("events").filter("event_type = 'purchase'")
            .select("user_id", "event_id", "value",
                    F.round(F.lag("value").over(w), 2).alias("prev_value"),
                    F.round(F.lead("value").over(w), 2).alias("next_value")))


@register(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS (the general form behind rollup/cube), "
        "via the SQL front end — one expand + one aggregate shuffle.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return e.sql("""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n, ROUND(SUM(l_quantity), 2) AS qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "window_moving_avg",
    """
    SELECT user_id, event_id, value,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
             AS mavg4
    FROM events WHERE event_type = 'purchase'
    """,
    doc="Frame-based moving average (ROWS BETWEEN 3 PRECEDING AND "
        "CURRENT ROW) per user — the bounded-frame window family, "
        "shuffle on user_id only.",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
               .rowsBetween(-3, 0))
    return (e.table("events").filter("event_type = 'purchase'")
            .select("user_id", "event_id", "value",
                    F.round(F.avg("value").over(w), 4).alias("mavg4")))


def _with_session_idx(events: DataFrame) -> DataFrame:
    """events + a ``session_idx`` column: the 30-min-gap session cut
    (lag flag + running sum per user) — ONE definition shared by every
    sessionized query so the rule can't silently fork."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    ns = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        1).otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
                 .rowsBetween(Window.unboundedPreceding, 0))
    return events.withColumn("session_idx",
                             F.sum(ns).over(run).cast("bigint"))


@register(
    "events_session_assign",
    """
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS ns
      FROM events)
    SELECT event_id, user_id,
           CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS session_idx
    FROM g
    """,
    doc="Per-EVENT session assignment (30-min gap): lag flag + running "
        "sum gives each event its (user_id, session_idx) key - the "
        "grouping key sessionized training examples are built on "
        "(sessionize aggregates the same cut; this emits the "
        "assignment). Per-user windows parallelize across the "
        "cluster; no global window.",
)
def events_session_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (_with_session_idx(e.table("events"))
            .select("event_id", "user_id", "session_idx"))


@register(
    "sessionize",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
    FROM gaps GROUP BY user_id
    """,
    doc="Sessionization (30-min inactivity gap): lag + cumulative flag — "
        "the batch twin of streaming session_window.",
)
def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval comparison, not epoch casts: works for TIMESTAMP and
    # TIMESTAMP_NTZ alike (parquet timestamps without tz load as NTZ,
    # which Spark refuses to cast to BIGINT) and mirrors the oracle's
    # `ts - lag(ts) > INTERVAL 30 MINUTE` exactly.
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")),
        1).otherwise(0)
    return (e.table("events")
            .withColumn("new_session", new_sess)
            .groupBy("user_id")
            .agg(F.sum("new_session").alias("n_sessions"),
                 F.count("*").alias("n_events")))


@register(
    "session_window_agg",
    """
    WITH g AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS ns
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS sid
      FROM g)
    SELECT user_id, MIN(ts) AS s_start,
           MAX(ts) + INTERVAL 30 MINUTE AS s_end,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
    doc="Native session_window (30-min gap) per-session aggregate — the "
        "operator form of sessionize; session end = last event + gap. "
        "Oracle reconstructs sessions with lag + running sum.",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("events")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("sum_value"))
            .select("user_id",
                    F.col("session_window.start").alias("s_start"),
                    F.col("session_window.end").alias("s_end"),
                    "n_events", "sum_value"))


@register(
    "set_ops",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
    doc="INTERSECT/EXCEPT set ops (absent in reference §2.5 C8; free in "
        "Spark as left-semi/anti joins after aggregate).",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    o = e.table("orders")
    open_ = o.filter("o_orderstatus = 'O'").select("o_custkey")
    filled = o.filter("o_orderstatus = 'F'").select("o_custkey")
    pend = o.filter("o_orderstatus = 'P'").select("o_custkey")
    return open_.intersect(filled).exceptAll(pend.distinct())


@register(
    "asof_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id AS user_id, p.ts AS purchase_ts,
           (SELECT max(c.ts) FROM events c
            WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts)
             AS last_click_ts
    FROM events p WHERE p.event_type = 'purchase'
    """,
    doc="As-of join (no native Spark operator — SURVEY build plan M6 / "
        "pyspark guide): for each purchase, the most recent click at or "
        "before it, same user. Implemented scalably as a tagged union + "
        "running MAX window (one shuffle on user_id, no per-key loops, no "
        "N+1 lookups) instead of applyInPandas merge_asof.",
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    clicks = ev.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("ts"), F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_p"), F.lit(None).cast("long").alias("event_id"))
    # null literal typed to whatever ts actually is (TIMESTAMP vs
    # TIMESTAMP_NTZ depends on how the parquet was written) so the
    # union branches agree
    ts_type = ev.schema["ts"].dataType
    purch = ev.filter("event_type = 'purchase'").select(
        "user_id", "ts", F.lit(None).cast(ts_type).alias("click_ts"),
        F.lit(1).alias("is_p"), "event_id")
    u = clicks.unionByName(purch)
    # order clicks before purchases at equal ts (asof is <=)
    w = (Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("is_p"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = (u.withColumn("last_click_ts", F.max("click_ts").over(w))
            .filter(F.col("is_p") == 1))
    return out.select(F.col("event_id").alias("purchase_id"), "user_id",
                      F.col("ts").alias("purchase_ts"), "last_click_ts")


@register(
    "skew_key_profile",
    """
    WITH c AS (
      SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey)
    SELECT COUNT(*) AS n_keys,
           ROUND(AVG(n), 4) AS avg_rows,
           quantile_cont(n, 0.5) AS p50,
           quantile_cont(n, 0.9) AS p90,
           quantile_cont(n, 0.99) AS p99,
           MAX(n) AS max_rows
    FROM c
    """,
    doc="Join-key skew diagnostic (run before choosing broadcast/"
        "salt/AQE strategy): per-key row counts -> count quantiles + "
        "max. Two cheap shuffles (partial agg both); the profile that "
        "justifies salted_join's existence.",
)
def skew_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    cnt = (e.table("lineitem").groupBy("l_suppkey")
            .agg(F.count("*").alias("n")))
    return cnt.agg(
        F.count("*").alias("n_keys"),
        F.round(F.avg("n"), 4).alias("avg_rows"),
        F.percentile("n", F.lit(0.5)).alias("p50"),
        F.percentile("n", F.lit(0.9)).alias("p90"),
        F.percentile("n", F.lit(0.99)).alias("p99"),
        F.max("n").alias("max_rows"))


@register(
    "schemaless_json_extract",
    """
    SELECT event_type,
           COUNT(*) AS n,
           COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT))
             AS n_with_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             AS avg_k
    FROM events
    GROUP BY event_type
    """,
    doc="Schemaless dynamic-payload handling (SURVEY §7.3 risk 4: "
        "Mongo documents have no fixed schema; reference decodes "
        "per-row into Option fields, mongotypes/package.scala:77-105): "
        "JSON props column -> typed field extraction with NULL on "
        "missing/mistyped, then relational aggregation. "
        "get_json_object is JVM-side codegen; at 100 TB prefer "
        "from_json with a partial schema so pruning applies.",
)
def schemaless_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (e.table("events")
            .groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.count(k).alias("n_with_k"),
                 F.sum(k).alias("sum_k"),
                 F.round(F.avg(k), 4).alias("avg_k")))


@register(
    "funnel_view_click_purchase",
    """
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id)
    SELECT 'view' AS stage, (SELECT COUNT(*) FROM v) AS n_users
    UNION ALL
    SELECT 'view>click', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 'view>click>purchase', (SELECT COUNT(*) FROM p)
    """,
    doc="Ordered funnel (view -> click -> purchase): each stage is "
        "the min event time strictly after the previous stage's, per "
        "user — three key-local aggregates + two equi-joins on "
        "user_id, all shuffles on the same key so AQE can reuse the "
        "exchange; counts roll up to one row per stage.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    v = (ev.filter(F.col("event_type") == "view")
           .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (ev.filter(F.col("event_type") == "click")
           .join(v, "user_id")
           .filter(F.col("ts") > F.col("t1"))
           .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (ev.filter(F.col("event_type") == "purchase")
           .join(c, "user_id")
           .filter(F.col("ts") > F.col("t2"))
           .groupBy("user_id").agg(F.min("ts").alias("t3")))
    def stage(df, name):
        return df.agg(F.count("*").alias("n_users")) \
                 .select(F.lit(name).alias("stage"), "n_users")
    return (stage(v, "view")
            .unionByName(stage(c, "view>click"))
            .unionByName(stage(p, "view>click>purchase")))


@register(
    "agg_approx_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS exact_p50,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS exact_p90,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS exact_p99,
           1 AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="approx_percentile (accuracy 10000) per group — the 100 TB "
        "quantile path: sketches merge map-side, no global sort, "
        "memory O(accuracy) per group vs exact percentile's full "
        "per-group sort. Sketch values are engine-specific, so the "
        "query ASSERTS the sketch in-plan (each approx within 1% of "
        "the exact interpolated percentile) and emits the boolean "
        "alongside the exact values — a full value oracle.",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    qs = F.lit([0.5, 0.9, 0.99])
    base = (e.table("lineitem")
            .groupBy("l_returnflag")
            .agg(F.approx_percentile("l_extendedprice", qs, F.lit(10000))
                  .alias("p"),
                 F.percentile("l_extendedprice", qs).alias("x")))
    ok = None
    for i in (1, 2, 3):
        c = (F.abs(F.element_at("p", i) - F.element_at("x", i))
             <= 0.01 * F.element_at("x", i))
        ok = c if ok is None else (ok & c)
    return base.select(
        "l_returnflag",
        F.round(F.element_at("x", 1), 4).alias("exact_p50"),
        F.round(F.element_at("x", 2), 4).alias("exact_p90"),
        F.round(F.element_at("x", 3), 4).alias("exact_p99"),
        ok.cast("int").alias("approx_within_tol"))


@register(
    "events_interarrival_stats",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_gaps,
           ROUND(AVG(gap_us) / 1e6, 4) AS avg_gap_s,
           ROUND(MIN(gap_us) / 1e6, 4) AS min_gap_s,
           ROUND(MAX(gap_us) / 1e6, 4) AS max_gap_s
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Per-user inter-arrival stats (avg/min/max gap): the event-"
        "sequence feature pass behind session models and burstiness "
        "filters. One shuffle on user_id serves BOTH the lag window "
        "and the aggregate (exchange reuse); micros stay integer until "
        "the final rounding.",
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (e.table("events")
            .select("user_id",
                    (epoch_us("ts")
                     - F.lag(epoch_us("ts")).over(w)).alias("gap_us"))
            .filter(F.col("gap_us").isNotNull()))
    return (gaps.groupBy("user_id")
            .agg(F.count("*").alias("n_gaps"),
                 F.round(F.avg("gap_us") / 1e6, 4).alias("avg_gap_s"),
                 F.round(F.min("gap_us") / 1e6, 4).alias("min_gap_s"),
                 F.round(F.max("gap_us") / 1e6, 4).alias("max_gap_s")))


@register(
    "events_time_rollup",
    """
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(hour(ts) AS INTEGER) AS hour,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP (day, hour)
    """,
    doc="Hypertable-style continuous-aggregate rollup: hourly event "
        "stats with day and grand totals in ONE pass (GROUP BY ROLLUP "
        "on the time hierarchy — partial aggregation map-side, no "
        "second scan for the coarser grain). At 100 TB this is the "
        "materialized rollup a time-series store maintains; here it's "
        "a single declarative plan.",
)
def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("events")
            .rollup(F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
                    F.hour("ts").alias("hour"))
            .agg(F.count("*").alias("n_events"),
                 F.count_distinct("user_id").alias("n_users"),
                 F.round(F.sum("value"), 2).alias("sum_value")))


@register(
    "events_rate_spikes",
    """
    WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                      COUNT(*) AS n
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, AVG(n) AS mu, STDDEV_SAMP(n) AS sd
          FROM h GROUP BY 1)
    SELECT h.event_type, h.hr, h.n,
           ROUND(s.mu, 4) AS mu, ROUND(s.sd, 4) AS sd,
           ROUND((h.n - s.mu) / s.sd, 4) AS zscore
    FROM h JOIN s USING (event_type)
    WHERE h.n > s.mu + 3 * s.sd
    """,
    doc="Rate-anomaly monitor: hours where an event type's count "
        "exceeds its own mean + 3 sigma — the ops alarm over the "
        "ingest log. Hourly rollup (map-side partial agg), per-type "
        "stats are a types-sized table that broadcasts back; two "
        "shuffles total, both on keys that stay tiny at any scale.",
)
def events_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    h = (e.table("events")
          .groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("hr"))
          .agg(F.count("*").alias("n")))
    s = h.groupBy("event_type").agg(F.avg("n").alias("_mu"),
                                    F.stddev_samp("n").alias("_sd"))
    return (h.join(F.broadcast(s), "event_type")
             .filter(F.col("n") > F.col("_mu") + 3 * F.col("_sd"))
             .select("event_type", "hr", "n",
                     F.round("_mu", 4).alias("mu"),
                     F.round("_sd", 4).alias("sd"),
                     F.round((F.col("n") - F.col("_mu")) / F.col("_sd"), 4)
                      .alias("zscore")))


@register(
    "events_cohort_retention",
    """
    WITH f AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id),
    a AS (
      SELECT e.user_id, f.cohort,
             date_diff('day', f.cohort,
                       CAST(date_trunc('day', e.ts) AS DATE)) AS day_offset
      FROM events e JOIN f USING (user_id))
    SELECT cohort, day_offset, COUNT(DISTINCT user_id) AS n_users
    FROM a GROUP BY cohort, day_offset
    """,
    doc="Cohort retention triangle: users grouped by first-seen day, "
        "activity counted at each day offset — the engagement view "
        "behind every usage dashboard. First-seen table is users-"
        "sized (broadcasts); events scan once; two shuffles total "
        "(user min, cohort/offset rollup).",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    f = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("cohort"))
    a = (ev.join(F.broadcast(f), "user_id")
           .select("user_id", "cohort",
                   F.datediff(F.to_date(F.date_trunc("day", F.col("ts"))),
                              F.col("cohort")).alias("day_offset")))
    return (a.groupBy("cohort", "day_offset")
             .agg(F.count_distinct("user_id").alias("n_users")))


@register(
    "events_coactivity_range_join",
    """
    SELECT p.event_id, COUNT(*) AS n_coactive
    FROM events p JOIN events o
      ON o.user_id <> p.user_id
     AND epoch_us(o.ts) BETWEEN epoch_us(p.ts) - 60000000
                            AND epoch_us(p.ts) + 60000000
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id
    """,
    doc="Range join via time-bin equi-join (operators/join.py "
        "range_join_binned): for every purchase, count events by OTHER "
        "users within +-60 s. A raw theta join on the time window "
        "compiles to BroadcastNestedLoopJoin (O(n*m), the 100 TB "
        "killer); binning makes it one partitioned hash join on the "
        "bin key with constant per-row fan-out and a residual filter.",
)
def events_coactivity_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nosql_join_stream_spark.operators.join import range_join_binned
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .select(F.col("event_id").alias("p_event_id"),
                           F.col("user_id").alias("p_user_id"),
                           F.col("ts").alias("p_ts")))
    others = ev.select(F.col("user_id").alias("o_user_id"),
                       F.col("ts").alias("o_ts"))
    minute = 60_000_000
    pairs = range_join_binned(
        purchases, others, "p_ts", "o_ts",
        lower_us=-minute, upper_us=minute,
        condition=F.col("o_user_id") != F.col("p_user_id"))
    return (pairs.groupBy(F.col("p_event_id").alias("event_id"))
                 .agg(F.count("*").alias("n_coactive")))


@register(
    "latest_event_per_user",
    """
    WITH r AS (
      SELECT user_id, event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    SELECT user_id, event_id AS last_event_id,
           event_type AS last_type, value AS last_value
    FROM r WHERE rn = 1
    """,
    doc="CDC-style compaction: latest record per key by event time "
        "(deterministic event_id tiebreak) — the upsert-view pattern "
        "over an append-only log. One shuffle on the key; at 100 TB "
        "write the log bucketed by user_id and the window needs no "
        "exchange at all.",
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (e.table("events")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.col("event_type").alias("last_type"),
                    F.col("value").alias("last_value")))


@register(
    "integrity_orphan_check",
    """
    SELECT 'lineitem_orphans' AS check_name,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_bad
    UNION ALL
    SELECT 'order_custkey_orphans',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    """,
    doc="Referential-integrity audit before joins are trusted: "
        "left-anti probes (FK without parent) per relationship. "
        "Anti-joins broadcast the key side when small; a nonzero "
        "count is the signal to quarantine an ingest batch.",
)
def integrity_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li_bad = (e.table("lineitem")
              .join(e.table("orders"),
                    F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
              .agg(F.count("*").alias("n_bad"))
              .select(F.lit("lineitem_orphans").alias("check_name"), "n_bad"))
    o_bad = (e.table("orders")
             .join(e.table("customer"),
                   F.col("o_custkey") == F.col("c_custkey"), "left_anti")
             .agg(F.count("*").alias("n_bad"))
             .select(F.lit("order_custkey_orphans").alias("check_name"),
                     "n_bad"))
    return li_bad.unionByName(o_bad)


@register(
    "window_rank_distributions",
    """
    SELECT o_orderkey, o_totalprice,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           ntile(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey)
    """,
    doc="Rank-distribution window surface (percent_rank / cume_dist / "
        "ntile) partitioned by status — per-partition parallel, "
        "deterministic total order via the key tiebreak.",
)
def window_rank_distributions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    w = (Window.partitionBy("o_orderstatus")
               .orderBy("o_totalprice", "o_orderkey"))
    return (e.table("orders")
            .select("o_orderkey", "o_totalprice",
                    F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
                    F.round(F.cume_dist().over(w), 6).alias("cume"),
                    F.ntile(4).over(w).alias("quartile")))


@register(
    "unpivot_order_metrics",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
           l_quantity AS value FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
    """,
    doc="Unpivot (wide -> long): lineitem metrics melt to (key, "
        "metric, value) rows — the layout metric stores and feature "
        "pipelines ingest; Spark's native unpivot is a zero-shuffle "
        "row-local expansion (the SQL UNION mirror rescans; the "
        "DataFrame form does not).",
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return (e.table("lineitem")
            .unpivot(["l_orderkey", "l_linenumber"],
                     ["l_quantity", "l_extendedprice", "l_discount"],
                     "metric", "value")
            .withColumn("metric",
                        F.regexp_replace("metric", "^l_", "")))


@register(
    "asof_join_nearest",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT p.event_id, max(c.ts) AS bts
      FROM p JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
      GROUP BY p.event_id),
    f AS (
      SELECT p.event_id, min(c.ts) AS fts
      FROM p JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts >= p.ts
      GROUP BY p.event_id)
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN b.bts IS NULL THEN f.fts
                WHEN f.fts IS NULL THEN b.bts
                WHEN (epoch_us(p.ts) - epoch_us(b.bts))
                     <= (epoch_us(f.fts) - epoch_us(p.ts)) THEN b.bts
                ELSE f.fts END AS nearest_click_ts
    FROM p LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id)
    """,
    doc="Nearest-direction as-of join: for each purchase, the closest "
        "click in EITHER direction (ties to the earlier click) — "
        "merge_asof(direction='nearest') semantics. One tagged union "
        "and ONE shuffle on user_id: a running MAX window finds the "
        "last click at-or-before and a reverse running MIN the first "
        "click after; a row-local CASE picks the nearer. No range "
        "join, no per-key loops.",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nosql_join_stream_spark.operators.join import asof_join
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    purch = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    out = asof_join(purch, clicks, "user_id", "ts", "ts",
                    direction="nearest")
    return out.select(F.col("event_id").alias("purchase_id"), "user_id",
                      F.col("ts").alias("purchase_ts"),
                      F.col("asof_ts").alias("nearest_click_ts"))


@register(
    "asof_join_backward",
    """
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    b AS (
      SELECT p.event_id, max(c.ts) AS m
      FROM p JOIN events c
        ON c.user_id = p.user_id AND c.event_type = 'click'
       AND c.ts <= p.ts
       AND epoch_us(p.ts) - epoch_us(c.ts) <= 3600000000
      GROUP BY p.event_id)
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           b.m AS asof_click_ts
    FROM p LEFT JOIN b USING (event_id)
    """,
    doc="Backward as-of join with tolerance (join.asof_join — pandas "
        "merge_asof(direction='backward', tolerance=1h) semantics, "
        "the trade-x-quote default): each purchase attaches the "
        "latest click at-or-before it, or NULL if none lands inside "
        "the hour.  One tagged union + one key shuffle + one ordered "
        "window — no range join, no bin fan-out, no pair space; cost "
        "is a per-key sort at any skew.",
)
def asof_join_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nosql_join_stream_spark.operators.join import asof_join
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    purch = ev.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts")
    clicks = ev.filter("event_type = 'click'").select("user_id", "ts")
    out = asof_join(purch, clicks, "user_id", "ts", "ts",
                    direction="backward", tolerance_us=3_600_000_000)
    return out.select(F.col("event_id").alias("purchase_id"), "user_id",
                      F.col("ts").alias("purchase_ts"),
                      F.col("asof_ts").alias("asof_click_ts"))


@register(
    "events_session_sequences",
    """
    WITH g AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS ns
      FROM events),
    s AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(SUM(ns) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_idx
      FROM g)
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
    FROM s GROUP BY user_id, session_idx
    """,
    doc="Behavioral-sequence training examples: each (user, session) "
        "becomes one ordered event-type sequence — the logs-to-"
        "sequence-model layout (next-action prediction, session "
        "embeddings). Session cut = the events_session_assign lag "
        "flag + running sum; the sequence itself is "
        "sort_array(collect_list(struct(ts,event_id,type))) so "
        "ordering is deterministic under ANY shuffle placement — "
        "never an order-dependent collect_list. Per-user windows and "
        "one (user,session) agg; no global window, sessions bound "
        "the array size.",
)
def events_session_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    seq = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(
                F.struct("ts", "event_id", "event_type"))),
            lambda s: s["event_type"]), " ")
    return (_with_session_idx(e.table("events"))
            .groupBy("user_id", "session_idx")
            .agg(F.count("*").alias("n_events"), seq.alias("seq")))


@register(
    "events_resample_ffill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hr,
             ROUND(SUM(value), 2) AS hr_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, MIN(hr) AS lo, MAX(hr) AS hi
      FROM hourly GROUP BY user_id),
    grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
               AS hr
      FROM bounds),
    joined AS (
      SELECT g.user_id, g.hr, h.hr_value
      FROM grid g LEFT JOIN hourly h
        ON g.user_id = h.user_id AND g.hr = h.hr)
    SELECT user_id, hr,
           last_value(hr_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hr
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           hr_value IS NULL AS filled
    FROM joined
    """,
    doc="Time-series regularization: hourly resample of each user's "
        "event values onto a gap-free grid with forward fill — the "
        "shape feature pipelines need before windowed models (ragged "
        "event times -> regular tensor rows). Grid = per-user "
        "sequence() explode (bounded by the user's own span, never a "
        "global calendar join); fill = last_value(ignoreNulls) over "
        "the per-user hour order. One agg + one explode + one window, "
        "all user-partitioned — no global structure at any size.",
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    hourly = (e.table("events")
              .groupBy("user_id", F.date_trunc("hour", "ts").alias("hr"))
              .agg(F.round(F.sum("value"), 2).alias("hr_value")))
    grid = (hourly.groupBy("user_id")
            .agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
            .select("user_id",
                    F.explode(F.sequence(
                        "lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr")))
    joined = grid.join(hourly, ["user_id", "hr"], "left")
    w = (Window.partitionBy("user_id").orderBy("hr")
         .rowsBetween(Window.unboundedPreceding, 0))
    return joined.select(
        "user_id", "hr",
        F.last("hr_value", ignorenulls=True).over(w).alias("value"),
        F.col("hr_value").isNull().alias("filled"))


# --- TPC-H anchor queries (r10, completed r11) ------------------------
# Externally recognizable benchmark shapes over the TESTDATA tables, so
# BENCH numbers are comparable against published TPC-H plans:
# agg_pricing_summary is the Q1 analog and local_supplier_volume the Q5
# analog; with the r10 anchors (Q3/Q4/Q6/Q8/Q10/Q14/Q17/Q18/Q19) and
# the r11 anchors (Q2/Q7/Q9/Q11/Q12/Q13/Q15/Q16/Q20/Q21/Q22) the set
# covers ALL 22 TPC-H planner shapes.  The schema has no
# o_shippriority / partsupp / l_shipmode / commit-receipt dates, so
# each query projects the columns TESTDATA carries (the doc of each
# anchor names its substitution).  No broadcast hints on scale-linear
# tables anywhere — fixed-cardinality nation/region only (r10 VERDICT
# lead #2).


@register(
    "tpch_q3_shipping_priority",
    """
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 analog (shipping priority): segment-filtered customer "
        "dimension broadcasts into orders, the order->lineitem fact join "
        "shuffles on the order key, and the top-10 is "
        "TakeOrderedAndProject (per-partition heaps, no global sort) — "
        "at 100 TB the only full-data movement is the one fact shuffle, "
        "and both date filters reach the parquet scans.  Ties at the "
        "LIMIT cut are broken by (rounded revenue, date, orderkey) so "
        "the cut is total and engine-independent.",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    c = e.table("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = e.table("orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp"))
    l = e.table("lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp"))
    return (c.join(o, o["o_custkey"] == c["c_custkey"])
             .join(l, l["l_orderkey"] == o["o_orderkey"])
             .groupBy(l["l_orderkey"].alias("orderkey"),
                      o["o_orderdate"], o["o_orderpriority"])
             .agg(_money_sum(l["l_extendedprice"]
                             * (1 - l["l_discount"])).alias("revenue"))
             .select("orderkey", "revenue", "o_orderdate", "o_orderpriority")
             .orderBy(F.desc("revenue"), "o_orderdate", "orderkey")
             .limit(10))


@register(
    "tpch_q10_returned_items",
    """
    SELECT c.c_custkey AS custkey, c.c_name,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal,
           n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 analog (returned-item reporting): one quarter of "
        "orders joins returned lineitems, grouped back to the customer "
        "with the nation dimension broadcast.  The quarter predicate "
        "prunes the orders scan before the fact join; the customer "
        "group key is high-cardinality but the partial aggregate "
        "collapses it map-side; top-20 via TakeOrderedAndProject with "
        "a custkey tiebreaker.",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    c = e.table("customer")
    n = e.table("nation")
    o = e.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp")))
    l = e.table("lineitem").filter(F.col("l_returnflag") == "R")
    return (c.join(o, o["o_custkey"] == c["c_custkey"])
             .join(l, l["l_orderkey"] == o["o_orderkey"])
             .join(n, n["n_nationkey"] == c["c_nationkey"])
             .groupBy(c["c_custkey"].alias("custkey"), c["c_name"],
                      c["c_acctbal"], n["n_name"].alias("nation"))
             .agg(_money_sum(l["l_extendedprice"]
                             * (1 - l["l_discount"])).alias("revenue"))
             .select("custkey", "c_name", "revenue",
                     F.round("c_acctbal", 2).alias("acctbal"), "nation")
             .orderBy(F.desc("revenue"), "custkey")
             .limit(20))


@register(
    "tpch_q18_large_volume",
    """
    SELECT c.c_name, c.c_custkey AS custkey, o.o_orderkey AS orderkey,
           o.o_orderdate, ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY totalprice DESC, o_orderdate, orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 analog (large-volume customer): the IN subquery is a "
        "grouped HAVING filter over the fact table expressed as a LEFT "
        "SEMI join — Catalyst plans the same shape for the SQL form.  "
        "Both the qualifier aggregate and the semi join shuffle on "
        "l_orderkey, so AQE can reuse the exchange; the re-aggregation "
        "after the semi join touches only qualifying orders (~1% of "
        "keys).  Ordered by the exact parquet double o_totalprice (no "
        "float arithmetic at the cut) with date+key tiebreakers.",
)
def tpch_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem")
    # the qualifier is a SELF-join against lineitem: alias both sides
    # and use qualified string refs so attribute resolution is
    # unambiguous (Spark's ambiguous-self-join check rejects raw
    # df["col"] refs that trace to the same scan)
    qualifying = (li.groupBy("l_orderkey")
                  .agg(F.sum("l_quantity").alias("__q"))
                  .filter(F.col("__q") > 250)
                  .select(F.col("l_orderkey").alias("__qk")))
    c = e.table("customer")
    o = e.table("orders").join(
        qualifying, F.col("o_orderkey") == F.col("__qk"), "left_semi")
    fact = li.alias("fact")
    return (c.join(o, F.col("o_custkey") == F.col("c_custkey"))
             .join(fact, F.col("fact.l_orderkey") == F.col("o_orderkey"))
             .groupBy(F.col("c_name"), F.col("c_custkey").alias("custkey"),
                      F.col("o_orderkey").alias("orderkey"),
                      F.col("o_orderdate"), F.col("o_totalprice"))
             .agg(F.round(F.sum(F.col("fact.l_quantity")), 2)
                  .alias("sum_qty"))
             .select("c_name", "custkey", "orderkey", "o_orderdate",
                     F.round("o_totalprice", 2).alias("totalprice"),
                     "sum_qty")
             .orderBy(F.desc("totalprice"), "o_orderdate", "orderkey")
             .limit(100))


@register(
    "tpch_q6_forecast_revenue",
    """
    SELECT ROUND(SUM(CAST(l_extendedprice * l_discount
                          AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 analog (forecast revenue change): the pure-scan "
        "anchor — every predicate reaches the parquet scan as a "
        "PushedFilter (range on shipdate, between on discount, "
        "comparison on quantity), the aggregate is one map-side "
        "partial SUM, and the exchange carries one row per "
        "partition.  The simplest possible 100 TB shape: cost == "
        "bytes scanned after row-group pruning.",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00")
         .cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00")
           .cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24))
    return li.agg(
        _money_sum(F.col("l_extendedprice") * F.col("l_discount"))
        .alias("revenue"),
        F.count("*").alias("n_lines"))


@register(
    "tpch_q14_promo_effect",
    """
    SELECT ROUND(100.0 * SUM(CAST(CASE WHEN p.p_type = 'PROMO'
                                  THEN l.l_extendedprice * (1 - l.l_discount)
                                  ELSE 0 END AS DECIMAL(38,6)))::DOUBLE
                 / SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                            AS DECIMAL(38,6)))::DOUBLE, 4)
             AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-09-01 00:00:00'
    """,
    doc="TPC-H Q14 analog (promotion effect): date-windowed fact scan "
        "joins the part dimension — small side broadcasts, the "
        "conditional revenue share is one map-side-combinable "
        "aggregate over the join output (no second pass for the "
        "denominator).  TESTDATA's p_type carries the literal class "
        "('PROMO'), so the promo test is an equality, not LIKE.",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00")
         .cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-09-01 00:00:00")
           .cast("timestamp")))
    p = e.table("part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(p),
                    F.col("p_partkey") == F.col("l_partkey"))
            .agg(F.round(100.0 * F.sum(_dec(F.when(F.col("p_type") == "PROMO",
                                                   rev).otherwise(0.0)))
                         .cast("double")
                         / F.sum(_dec(rev)).cast("double"), 4)
                 .alias("promo_pct"),
                 F.count("*").alias("n_lines")))


@register(
    "tpch_q19_discounted_revenue",
    """
    SELECT ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#4'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 35)
    """,
    doc="TPC-H Q19 analog (discounted revenue, disjunctive predicate): "
        "the OR-of-ANDs straddles BOTH join sides, the planner shape "
        "none of the other anchors exercise.  Catalyst's "
        "PushExtraPredicateThroughJoin extracts the convertible "
        "per-side residues — p_brand IN (...) AND p_size <= 35 reaches "
        "the part scan, l_quantity BETWEEN 1 AND 35 reaches the "
        "lineitem scan as PushedFilters (plan-audited) — so at 100 TB "
        "the fact scan drops ~30%% of rows at the row-group level "
        "before the broadcast join evaluates the exact disjunction.",
)
def tpch_q19_discounted_revenue(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem")
    p = e.table("part").select("p_partkey", "p_brand", "p_size")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    cond = (arm("Brand#4", 15, 1, 15)
            | arm("Brand#19", 25, 10, 25)
            | arm("Brand#25", 35, 20, 35))
    return (li.join(F.broadcast(p),
                    F.col("p_partkey") == F.col("l_partkey"))
            .filter(cond)
            .agg(_money_sum(F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))
                 .alias("revenue"),
                 F.count("*").alias("n_lines")))


@register(
    "tpch_q4_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > TIMESTAMP '1997-10-01 00:00:00')
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="TPC-H Q4 analog (order-priority checking): the correlated "
        "EXISTS (the reference's per-record innerQ, "
        "join/package.scala:72-76, executed N+1 there) decorrelates "
        "into one LEFT SEMI hash join — expressed here in DataFrame "
        "form (vs sql_exists_decorrelated's raw-SQL passthrough) and "
        "rolled up to the 5-row priority histogram.  TESTDATA carries "
        "no commitdate/receiptdate, so Q4's late-delivery predicate "
        "becomes a late-shipment one; same plan shape.  Both date "
        "filters reach their parquet scans; the semi join shuffles "
        "only qualifying-quarter orders against date-pruned lineitems.",
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    o = e.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00")
         .cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00")
           .cast("timestamp")))
    late = (e.table("lineitem")
            .filter(F.col("l_shipdate") > F.lit("1997-10-01 00:00:00")
                    .cast("timestamp"))
            .select("l_orderkey"))
    return (o.join(late, F.col("o_orderkey") == F.col("l_orderkey"),
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q17_small_quantity",
    """
    SELECT ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6)))::DOUBLE
                 / 7.0, 2) AS avg_yearly,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
    doc="TPC-H Q17 analog (small-quantity-order revenue): the "
        "correlated SCALAR subquery — the one planner shape the other "
        "anchors don't exercise.  Catalyst decorrelates it into a "
        "per-partkey aggregate joined back to the fact (exactly the "
        "DataFrame form below): the qualifier aggregate shuffles on "
        "l_partkey once, and the brand filter reaches both the part "
        "scan and — through the join — prunes the aggregate's probe "
        "side.  No explicit broadcast hints: part and the per-partkey "
        "threshold both grow linearly with scale, so join strategy is "
        "left to autoBroadcastJoinThreshold/AQE, which picks BHJ at "
        "small sf and degrades gracefully to shuffle at 100× instead "
        "of pinning an OOM-bound broadcast (r10 VERDICT lead #2).  "
        "The reference's shape for this is N+1 scalar innerQ calls "
        "(join/package.scala:72-76); here it is one pass.",
)
def tpch_q17_small_quantity(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem")
    p = e.table("part").filter(F.col("p_brand") == "Brand#4") \
         .select("p_partkey")
    thresh = (li.groupBy(F.col("l_partkey").alias("__pk"))
              .agg((F.lit(0.2) * F.avg("l_quantity")).alias("__lim")))
    return (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(thresh.join(p, F.col("__pk") == F.col("p_partkey"))
                  .select("__pk", "__lim"),
                  F.col("l_partkey") == F.col("__pk"))
            .filter(F.col("l_quantity") < F.col("__lim"))
            .agg(F.round(F.sum(_dec("l_extendedprice")).cast("double")
                         / 7.0, 2)
                 .alias("avg_yearly"),
                 F.count("*").alias("n_lines")))


@register(
    "tpch_q8_market_share",
    """
    WITH all_l AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN part p      ON p.p_partkey = l.l_partkey
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = cn.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
    SELECT CAST(o_year AS BIGINT) AS o_year,
           ROUND(SUM(CAST(CASE WHEN supp_nation = 'NATION_7'
                          THEN volume ELSE 0 END AS DECIMAL(38,6)))::DOUBLE
                 / SUM(CAST(volume AS DECIMAL(38,6)))::DOUBLE, 6)
             AS mkt_share,
           COUNT(*) AS n_lines
    FROM all_l GROUP BY o_year ORDER BY o_year
    """,
    doc="TPC-H Q8 analog (national market share): the deepest join "
        "tree in the anchor set — the lineitem fact against SIX "
        "dimension scans, with nation playing TWO roles (customer "
        "side, region-restricted; supplier side, the share "
        "numerator).  Only the FIXED-cardinality dimensions carry "
        "broadcast hints (nation=25 rows, region=5 at every sf); "
        "part/customer/supplier grow linearly with scale, so their "
        "join strategy is left to autoBroadcastJoinThreshold/AQE — "
        "BHJ at small sf, graceful shuffle at 100× instead of a "
        "pinned-plan OOM (r10 VERDICT lead #2).  The aggregate is "
        "map-side-combinable, so the only guaranteed full-data "
        "movement is the 2-row-per-year exchange.  Both date bounds "
        "and the type filter reach the scans.",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = e.table("lineitem")
    p = e.table("part").filter(F.col("p_type") == "PROMO") \
         .select("p_partkey")
    o = e.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00")
         .cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00")
           .cast("timestamp"))) \
        .select("o_orderkey", "o_custkey", "o_orderdate")
    c = e.table("customer").select("c_custkey", "c_nationkey")
    cn = e.table("nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"))
    r = e.table("region").filter(F.col("r_name") == "ASIA") \
         .select("r_regionkey")
    s = e.table("supplier").select("s_suppkey", "s_nationkey")
    sn = e.table("nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (li.join(p, F.col("p_partkey") == F.col("l_partkey"))
              .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
              .join(c, F.col("c_custkey") == F.col("o_custkey"))
              .join(F.broadcast(cn),
                    F.col("cn_key") == F.col("c_nationkey"))
              .join(F.broadcast(r),
                    F.col("r_regionkey") == F.col("cn_region"))
              .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
              .join(F.broadcast(sn),
                    F.col("sn_key") == F.col("s_nationkey")))
    return (joined
            .select(F.year("o_orderdate").cast("long").alias("o_year"),
                    vol.alias("volume"), "supp_nation")
            .groupBy("o_year")
            .agg(F.round(F.sum(_dec(F.when(F.col("supp_nation")
                                           == "NATION_7",
                                           F.col("volume")).otherwise(0.0)))
                         .cast("double")
                         / F.sum(_dec("volume")).cast("double"), 6)
                 .alias("mkt_share"),
                 F.count("*").alias("n_lines"))
            .orderBy("o_year"))


@register(
    "tpch_q21_waiting_suppliers",
    """
    WITH l1 AS (
      SELECT l.l_orderkey, l.l_suppkey,
             l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F')
    SELECT s.s_name, COUNT(*) AS numwait
    FROM l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE l1.late
      AND n.n_name = 'NATION_3'
      AND EXISTS (SELECT 1 FROM l1 l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM l1 l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
    doc="TPC-H Q21 analog (suppliers who kept orders waiting): the "
        "MULTI-EXISTS planner shape — a positive AND a negative "
        "correlated EXISTS against the same derived fact, the one "
        "correlation pattern the other anchors don't exercise.  The "
        "reference's per-record innerQ (join/package.scala:72-76) "
        "generalizes here to TWO inner queries per record, one "
        "negated; on Spark each decorrelates to a hash semi/anti "
        "self-join on l_orderkey (the supplier inequality rides the "
        "join as a residual predicate — still hash, never BNLJ).  "
        "TESTDATA has no commit/receipt dates, so 'kept waiting' is "
        "shipped >60 days after order date; same plan shape.  The "
        "status filter reaches the orders scan; the fact derives "
        "once per side from the same pruned 3-column scan, and the "
        "supplier/nation probe side is left to AQE (supplier is "
        "scale-linear — no pinned broadcast, r10 VERDICT lead #2).",
)
def tpch_q21_waiting_suppliers(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    orders_f = (e.table("orders")
                .filter(F.col("o_orderstatus") == "F")
                .select("o_orderkey", "o_orderdate"))
    base = (e.table("lineitem")
            .select("l_orderkey", "l_suppkey", "l_shipdate")
            .join(orders_f, F.col("o_orderkey") == F.col("l_orderkey"))
            .select("l_orderkey", "l_suppkey",
                    (F.col("l_shipdate")
                     > F.col("o_orderdate")
                     + F.expr("INTERVAL 60 DAYS")).alias("late")))
    supp = (e.table("supplier")
            .join(F.broadcast(e.table("nation")
                              .filter(F.col("n_name") == "NATION_3")
                              .select("n_nationkey")),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .select("s_suppkey", "s_name"))
    probe = (base.filter(F.col("late"))
             .join(supp, F.col("s_suppkey") == F.col("l_suppkey")))
    other = base.select(F.col("l_orderkey").alias("o_k"),
                        F.col("l_suppkey").alias("s_k"),
                        F.col("late").alias("o_late"))
    # EXISTS: some line on the order from a DIFFERENT supplier
    probe = probe.join(
        other,
        (F.col("o_k") == F.col("l_orderkey"))
        & (F.col("s_k") != F.col("l_suppkey")),
        "left_semi")
    # NOT EXISTS: no OTHER supplier was also late on that order
    probe = probe.join(
        other.filter(F.col("o_late")),
        (F.col("o_k") == F.col("l_orderkey"))
        & (F.col("s_k") != F.col("l_suppkey")),
        "left_anti")
    return (probe.groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name"))


@register(
    "tpch_q22_dormant_balance",
    """
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
    thresh AS (SELECT AVG(c_acctbal) AS a FROM pool WHERE c_acctbal > 0)
    SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM pool, thresh
    WHERE c_acctbal > thresh.a
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_orderdate
                            >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY cntry
    ORDER BY cntry
    """,
    doc="TPC-H Q22 analog (global sales opportunity): the NOT-IN + "
        "scalar-average planner shape — a single-row aggregate "
        "threshold attached to a filtered dimension, then an ANTI "
        "join against the fact.  TESTDATA carries no c_phone, so the "
        "country-code substring becomes the nation-key pool, and "
        "'never ordered' (every customer here has orders) becomes "
        "'dormant since 2000' — the date filter reaches the orders "
        "scan, so the anti join probes only recent orders.  The "
        "1-row threshold attaches via a broadcast (the standard "
        "scalar-subquery BNLJ); the anti join is hash on o_custkey.  "
        "Reference shape: a negated innerQ with a driver-side fold "
        "for the average (join/package.scala:72-76, "
        "AkkaJoinCassandraSpec.scala:75) — N+1 there, two scans here.",
)
def tpch_q22_dormant_balance(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    pool = (e.table("customer")
            .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
            .select("c_custkey", "c_nationkey", "c_acctbal"))
    thresh = (pool.filter(F.col("c_acctbal") > 0)
              .agg(F.avg("c_acctbal").alias("__a")))
    recent = (e.table("orders")
              .filter(F.col("o_orderdate")
                      >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
              .select("o_custkey"))
    return (pool.join(F.broadcast(thresh))
            .filter(F.col("c_acctbal") > F.col("__a"))
            .join(recent, F.col("o_custkey") == F.col("c_custkey"),
                  "left_anti")
            .groupBy(F.col("c_nationkey").alias("cntry"))
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cntry"))


@register(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey)
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    doc="TPC-H Q13 analog (customer order-count distribution): the "
        "LEFT-OUTER grouped-count shape — the join-side filter lives "
        "in the ON clause (customers whose every order is urgent "
        "must survive with c_count=0, so the filter cannot move to a "
        "WHERE), then a double aggregate: per-customer order count, "
        "then the histogram of those counts.  TESTDATA has no "
        "o_comment, so Q13's NOT LIKE becomes a priority exclusion — "
        "same plan: the priority filter pushes into the orders scan "
        "(it is join-side-only, so pushing it preserves outer rows), "
        "one shuffle on custkey shared by the join and the first "
        "aggregate, then a near-free second shuffle on the ~20 "
        "distinct counts.  COUNT(o_orderkey) not COUNT(*): unmatched "
        "customers count 0, not 1.",
)
def tpch_q13_order_distribution(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    c = e.table("customer").select("c_custkey")
    o = (e.table("orders")
         .filter(F.col("o_orderpriority") != "1-URGENT")
         .select("o_custkey", "o_orderkey"))
    per_cust = (c.join(o, F.col("o_custkey") == F.col("c_custkey"),
                       "left_outer")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH pc AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    m AS (SELECT l_partkey AS mk, MIN(unit_cost) AS mn
          FROM pc GROUP BY l_partkey)
    SELECT s.s_name, n.n_name AS nation, pc.l_partkey AS partkey,
           ROUND(pc.unit_cost, 4) AS unit_cost
    FROM pc
    JOIN m  ON m.mk = pc.l_partkey AND pc.unit_cost = m.mn
    JOIN part p     ON p.p_partkey = pc.l_partkey
                   AND p.p_brand = 'Brand#7'
    JOIN supplier s ON s.s_suppkey = pc.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
                   AND r.r_name = 'ASIA'
    ORDER BY partkey, s.s_name
    """,
    doc="TPC-H Q2 analog (minimum-cost supplier): the per-group "
        "MIN-join-back shape — Q2's correlated 'cost = (SELECT "
        "MIN(...) for this part)' subquery, decorrelated into an "
        "aggregate joined back on (key, min) equality.  TESTDATA has "
        "no partsupp, so the part×supplier cost relation derives from "
        "the fact itself (unit cost = min extendedprice/quantity per "
        "(part, supplier) pair — both engines compute the identical "
        "IEEE double, so the equality join-back replays exactly; the "
        "ROUND is output-only).  Two shuffles on l_partkey that AQE "
        "can plan back-to-back, then dimension joins the optimizer "
        "sizes itself — no pinned broadcasts on the scale-linear "
        "part/supplier sides; region/nation filters reach their "
        "scans.  Reference shape: N+1 scalar innerQ per outer record "
        "(join/package.scala:72-76).",
)
def tpch_q2_min_cost_supplier(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    pc = (e.table("lineitem")
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
               .alias("unit_cost")))
    m = (pc.groupBy(F.col("l_partkey").alias("mk"))
         .agg(F.min("unit_cost").alias("mn")))
    p = e.table("part").filter(F.col("p_brand") == "Brand#7") \
         .select("p_partkey")
    s = e.table("supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = e.table("nation").select("n_nationkey", "n_regionkey",
                                 F.col("n_name").alias("nation"))
    r = e.table("region").filter(F.col("r_name") == "ASIA") \
         .select("r_regionkey")
    return (pc.join(m, (F.col("mk") == F.col("l_partkey"))
                    & (F.col("unit_cost") == F.col("mn")))
            .join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(n),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .join(F.broadcast(r),
                  F.col("r_regionkey") == F.col("n_regionkey"))
            .select("s_name", "nation",
                    F.col("l_partkey").alias("partkey"),
                    F.round("unit_cost", 4).alias("unit_cost"))
            .orderBy("partkey", "s_name"))


@register(
    "tpch_q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          AS DECIMAL(38,6))), 2)::DOUBLE
             AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    doc="TPC-H Q7 analog (volume shipping between a nation pair): "
        "nation in two roles again (Q8's trick) plus the shape Q8 "
        "lacks — a DISJUNCTIVE cross-filter over the two role columns "
        "((s=A and c=B) or (s=B and c=A)) that can only apply after "
        "both dimension joins, so the planner must keep it residual "
        "while still pushing the date bounds to the fact scan.  "
        "Fixed-size nation broadcasts by hint; orders/customer/"
        "supplier are AQE's call (scale-linear).  One "
        "map-side-combinable aggregate on (nation, nation, year) — "
        "4 groups.",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = (e.table("lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1998-01-01 00:00:00").cast("timestamp")))
          .select("l_orderkey", "l_suppkey", "l_shipdate",
                  "l_extendedprice", "l_discount"))
    o = e.table("orders").select("o_orderkey", "o_custkey")
    c = e.table("customer").select("c_custkey", "c_nationkey")
    cn = e.table("nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"))
    s = e.table("supplier").select("s_suppkey", "s_nationkey")
    sn = e.table("nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    pair = (((F.col("supp_nation") == "NATION_1")
             & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2")
               & (F.col("cust_nation") == "NATION_1")))
    return (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(cn),
                  F.col("cn_key") == F.col("c_nationkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(sn),
                  F.col("sn_key") == F.col("s_nationkey"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(_money_sum(F.col("l_extendedprice")
                            * (1 - F.col("l_discount")))
                 .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@register(
    "tpch_q11_important_stock",
    """
    WITH v AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,6))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
                     AND n.n_name IN ('NATION_1', 'NATION_2',
                                      'NATION_3')
      GROUP BY l.l_partkey)
    SELECT l_partkey AS partkey, ROUND(val, 2)::DOUBLE AS value
    FROM v WHERE val * 10000 > (SELECT SUM(val) * 9 FROM v)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 analog (important stock identification): the "
        "HAVING-against-a-global-scalar shape — per-group totals "
        "kept only when they exceed a FRACTION OF THE GRAND TOTAL, "
        "i.e. a scalar subquery over the same aggregate feeding its "
        "own filter.  Spark computes the per-part aggregate once, "
        "derives the 1-row grand total from it (re-aggregation of "
        "the 2000-row group table, not a second fact scan), and "
        "attaches it via a 1-row broadcast.  TESTDATA has no "
        "partsupp, so 'stock value' is discounted lineitem revenue "
        "restricted to a 3-nation supplier group; same plan shape as "
        "value×supplycost.",
)
def tpch_q11_important_stock(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    sup = (e.table("supplier")
           .join(F.broadcast(
               e.table("nation")
               .filter(F.col("n_name").isin("NATION_1", "NATION_2",
                                            "NATION_3"))
               .select("n_nationkey")),
               F.col("n_nationkey") == F.col("s_nationkey"))
           .select("s_suppkey"))
    # Decimal-grain sums + an integer-scaled threshold (val > 0.0009·tot
    # ⟺ 10000·val > 9·tot) keep BOTH the cent rounding and the borderline
    # membership test exact — the r11 driver-hash flake hit six parts
    # whose double sums landed exactly on the half-cent grid (see _dec).
    v = (e.table("lineitem")
         .join(sup, F.col("s_suppkey") == F.col("l_suppkey"))
         .groupBy("l_partkey")
         .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                    .cast("decimal(18,6)"))
              .alias("val")))
    thresh = v.agg((F.sum("val") * F.lit(9)).alias("__lim9"))
    return (v.join(F.broadcast(thresh))
            .filter(F.col("val") * F.lit(10000) > F.col("__lim9"))
            .select(F.col("l_partkey").alias("partkey"),
                    F.round("val", 2).cast("double").alias("value"))
            .orderBy(F.desc("value"), "partkey"))


@register(
    "tpch_q15_top_supplier",
    """
    WITH r AS (
      SELECT l_suppkey,
             ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                            AS DECIMAL(38,6))), 2)::DOUBLE
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS suppkey, s.s_name, r.total_rev
    FROM supplier s JOIN r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM r)
    ORDER BY suppkey
    """,
    doc="TPC-H Q15 analog (top supplier): the view-plus-scalar-MAX "
        "join-back — Q15's revenue view materializes as a per-"
        "supplier aggregate (100 groups), its 1-row MAX re-derives "
        "from that aggregate (never a second fact scan), and the "
        "equality join-back is a broadcast HASH join on the rounded "
        "revenue value (rounding happens in the aggregate on BOTH "
        "sides, so the equality is exact by construction).  Ties all "
        "surface, per the spec.  The quarter filter reaches the "
        "fact scan.",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    r = (e.table("lineitem")
         .filter((F.col("l_shipdate")
                  >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate")
                    < F.lit("1997-04-01 00:00:00").cast("timestamp")))
         .groupBy("l_suppkey")
         .agg(_money_sum(F.col("l_extendedprice")
                         * (1 - F.col("l_discount")))
              .alias("total_rev")))
    mx = r.agg(F.max("total_rev").alias("__mx"))
    return (e.table("supplier").select("s_suppkey", "s_name")
            .join(r, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(F.broadcast(mx), F.col("total_rev") == F.col("__mx"))
            .select(F.col("s_suppkey").alias("suppkey"), "s_name",
                    "total_rev")
            .orderBy("suppkey"))


@register(
    "tpch_q16_supplier_counts",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 analog (part-supplier relationship counts): "
        "COUNT(DISTINCT) over a NOT-IN exclusion — the two-expansion "
        "aggregate (Catalyst plans distinct-count as a double "
        "aggregate) composed with an anti join against a filtered "
        "dimension (s_suppkey is non-null, so NOT IN == LEFT ANTI "
        "with no null-semantics trap; the complaint filter reaches "
        "the supplier scan).  The negated brand predicate and the "
        "size IN-list both push into the part scan.  TESTDATA's "
        "lineitem stands in for partsupp as the part×supplier "
        "relation.",
)
def tpch_q16_supplier_counts(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    p = (e.table("part")
         .filter((F.col("p_brand") != "Brand#3")
                 & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (e.table("supplier").filter(F.col("s_acctbal") < 0)
           .select("s_suppkey"))
    return (e.table("lineitem").select("l_partkey", "l_suppkey")
            .join(bad, F.col("s_suppkey") == F.col("l_suppkey"),
                  "left_anti")
            .join(p, F.col("p_partkey") == F.col("l_partkey"))
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type",
                     "p_size"))


@register(
    "tpch_q20_excess_shippers",
    """
    WITH q AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey),
    t AS (SELECT l_partkey AS tk, SUM(sq) AS tot FROM q
          GROUP BY l_partkey)
    SELECT s.s_name, n.n_name AS nation
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE s.s_suppkey IN (
      SELECT q.l_suppkey FROM q
      JOIN t ON t.tk = q.l_partkey
      JOIN part p ON p.p_partkey = q.l_partkey
                 AND p.p_type = 'SMALL'
      WHERE q.sq * 100 > 35 * t.tot)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 analog (suppliers with excess share): the NESTED "
        "semi-join chain — an IN whose subquery itself joins two "
        "aggregates of the same fact slice against a per-key "
        "threshold (supplier shipped >35% of a part's year volume; "
        "TESTDATA has no partsupp availqty, so the threshold derives "
        "from the shipped totals).  The per-(part,supplier) aggregate "
        "and the per-part rollup share one shuffle key; the part-type "
        "filter prunes the qualifier before the threshold join; the "
        "outer supplier probe is one LEFT SEMI hash join — never a "
        "per-supplier subquery (the reference's N+1 innerQ shape, "
        "join/package.scala:72-76).",
)
def tpch_q20_excess_shippers(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    q = (e.table("lineitem")
         .filter((F.col("l_shipdate")
                  >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                 & (F.col("l_shipdate")
                    < F.lit("1998-01-01 00:00:00").cast("timestamp")))
         .groupBy("l_partkey", "l_suppkey")
         .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)"))
              .alias("sq")))
    t = (q.groupBy(F.col("l_partkey").alias("tk"))
         .agg(F.sum("sq").alias("tot")))
    psmall = (e.table("part").filter(F.col("p_type") == "SMALL")
              .select("p_partkey"))
    # sq > 0.35·tot as exact decimal arithmetic (100·sq > 35·tot): a
    # supplier at exactly 35% share must land the same side in every
    # engine/partitioning — double sums put that membership one ulp
    # from flipping (the q11 rounding class, applied to a filter).
    qual = (q.join(t, F.col("tk") == F.col("l_partkey"))
            .join(psmall, F.col("p_partkey") == F.col("l_partkey"))
            .filter(F.col("sq") * F.lit(100) > F.lit(35) * F.col("tot"))
            .select("l_suppkey"))
    return (e.table("supplier")
            .join(qual, F.col("l_suppkey") == F.col("s_suppkey"),
                  "left_semi")
            .join(F.broadcast(e.table("nation")
                              .select("n_nationkey",
                                      F.col("n_name").alias("nation"))),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .select("s_name", "nation")
            .orderBy("s_name"))


@register(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                          - l.l_quantity * p.p_retailprice * 0.1
                          AS DECIMAL(38,6))), 2)::DOUBLE
             AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
                   AND p.p_name LIKE '%gear%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 analog (product-type profit): profit rollup by "
        "supplier nation × order year with a LIKE-filtered part "
        "probe — the substring predicate can't push as a parquet "
        "filter (it prunes post-scan), so the plan's efficiency "
        "rests on column pruning + the part join halving the fact "
        "before orders joins in.  TESTDATA has no partsupp, so "
        "supply cost is a retail-price fraction — same expression "
        "shape (two fact columns × one dimension column inside the "
        "aggregate).  No hints on scale-linear sides.",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    p = (e.table("part").filter(F.col("p_name").like("%gear%"))
         .select("p_partkey", "p_retailprice"))
    s = e.table("supplier").select("s_suppkey", "s_nationkey")
    n = e.table("nation").select("n_nationkey",
                                 F.col("n_name").alias("nation"))
    o = e.table("orders").select("o_orderkey", "o_orderdate")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - F.col("l_quantity") * F.col("p_retailprice") * 0.1)
    return (e.table("lineitem")
            .select("l_orderkey", "l_partkey", "l_suppkey",
                    "l_quantity", "l_extendedprice", "l_discount")
            .join(p, F.col("p_partkey") == F.col("l_partkey"))
            .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
            .join(F.broadcast(n),
                  F.col("n_nationkey") == F.col("s_nationkey"))
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("nation",
                     F.year("o_orderdate").cast("long").alias("o_year"))
            .agg(_money_sum(profit).alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l.l_returnflag AS shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority
                              IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority
                         NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY shipmode
    ORDER BY shipmode
    """,
    doc="TPC-H Q12 analog (shipping modes / order priority): the "
        "complementary conditional-count pair — one pass, two CASE "
        "aggregates whose predicates partition the priority domain "
        "(high = urgent|high, low = everything else), grouped by the "
        "mode column (l_returnflag stands in for the absent "
        "l_shipmode; the absent receipt/commit dates become a "
        "shipdate year).  Both halves fold map-side; the date bounds "
        "reach the lineitem scan; 3 output rows mean the final "
        "exchange is free.",
)
def tpch_q12_shipmode_priority(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    li = (e.table("lineitem")
          .filter((F.col("l_shipdate")
                   >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
                  & (F.col("l_shipdate")
                     < F.lit("1998-01-01 00:00:00").cast("timestamp")))
          .select("l_orderkey", "l_returnflag"))
    o = e.table("orders").select("o_orderkey", "o_orderpriority")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy(F.col("l_returnflag").alias("shipmode"))
            .agg(F.sum(F.when(hi, 1).otherwise(0))
                 .alias("high_line_count"),
                 F.sum(F.when(~hi, 1).otherwise(0))
                 .alias("low_line_count"))
            .orderBy("shipmode"))
