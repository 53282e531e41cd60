"""The join — reference parity for ``Join[M].inner``.

Reference semantics (join/package.scala:52-63,66-68,74-132): for each
outer record, interpret ``innerQ(outerRecord)`` into a fresh per-key DB
query and emit ``mapper(outer, inner)`` per matching pair — an index
nested-loop, one-to-many INNER join costing one DB round-trip per
outer row (the N+1 pattern, storage.scala:390-391,628-631).

Spark-first replacement: a single distributed join.  In every
reference usage the correlated predicate is an equality against the
outer record (``"lang" $eq outer.get("index")`` JoinMongoSpec.scala:55;
``fk("sensor", r.getLong("sensor"))`` JoinCassandraSpec.scala:40-43),
i.e. an equi-join — Catalyst then chooses broadcast-hash vs
sort-merge vs shuffled-hash.  Non-equi correlated predicates (the DSL
allows ``$gt`` etc. against outer values) are theta joins.

Scale notes (100 TB):
- the small (dimension) side should be broadcast — pass
  ``broadcast_outer=True`` or rely on AQE + autoBroadcastJoinThreshold;
- output order is NOT the reference's outer-order-with-contiguous-inner
  groups (flatMapConcat, mongo/channel/package.scala:45-46); callers
  needing determinism add an explicit orderBy (SURVEY.md §7.3.1) —
  correctness parity is defined on multisets.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def inner_join(
    outer: DataFrame,
    inner: DataFrame,
    on: str | Sequence[str] | Column,
    mapper: Callable[[DataFrame], list[Column]] | Sequence[Column] | None = None,
    how: str = "inner",
    broadcast_outer: bool = False,
    broadcast_inner: bool = False,
) -> DataFrame:
    """Distributed replacement for ``Join[M].inner(...)(mapper)``.

    - ``on``: join key name(s) for an equi-join, or an arbitrary Column
      condition for a theta join (reference correlated predicate).
    - ``mapper``: projection over the joined row — the reference's
      arbitrary ``(Record, Record) ⇒ A`` closure (join/package.scala:56)
      becomes a list of Column expressions (JVM-side, codegen'd) or a
      callable receiving the joined DataFrame.
    - ``how``: the reference only has "inner"; Spark gives the rest
      (left/right/full/semi/anti/cross) for free — exposed here.
    """
    if broadcast_outer:
        outer = F.broadcast(outer)
    if broadcast_inner:
        inner = F.broadcast(inner)
    if isinstance(on, str):
        cond = outer[on] == inner[on]
    elif isinstance(on, (list, tuple)):
        cond = None
        for k in on:
            c = outer[k] == inner[k]
            cond = c if cond is None else (cond & c)
    else:
        cond = on
    joined = outer.join(inner, cond, how)
    if mapper is None:
        return joined
    cols = mapper(joined) if callable(mapper) else list(mapper)
    return joined.select(*cols)


def _auto_num_salts(left: DataFrame, keys: Sequence[str],
                    sample_mod: int = 127) -> int:
    """Pick a salt count from the observed hot-key share, mirroring
    AQE's skew rule (a partition is skewed when it holds far more
    than its fair 1/parallelism share): sample ~1/``sample_mod`` of
    the left side's rows, measure the hottest key's row share, and
    choose the smallest salt count that spreads that key back to a
    fair per-reducer share — ``ceil(hot_share × parallelism)``,
    clamped to [1, parallelism].

    The sample must be POSITION- and VALUE-independent.  A bounded
    ``limit`` prefix reads whatever keys happen to live in the first
    input splits — on key-clustered data (the common layout) it sees
    either 100% or 0% of the hot key and mis-sizes in both directions
    (a probe caught exactly this: a range-partitioned fact with the
    hot rows up front sampled as hot_share=1.0 at every skew level).
    Hashing key VALUES is worse — every copy of the hot key shares
    the hash, so it is sampled all-or-nothing.  Hashing
    ``monotonically_increasing_id`` (partition ordinal, no shuffle,
    deterministic for a given partitioning) gives an unbiased row
    sample for free.  Cost: one column-pruned scan of the keys with a
    ~1/mod-sampled partial aggregate — the stats pass AQE gets from
    shuffle files, paid explicitly because salting exists for joins
    AQE cannot rewrite.  Overestimating costs a few extra right-side
    replicas; a uniform key distribution yields hot_share ≈ 1/keys
    and salts = 1 — the salt columns then degenerate to constants and
    the join plans like the unsalted one.  An empty sample (tiny
    input) falls back to the exact frequency pass, which is cheap
    precisely when the sample is empty."""
    import math

    def agg_of(df):
        return (df.groupBy(*keys).count()
                .agg(F.max("count").alias("hot"),
                     F.sum("count").alias("n")).collect()[0])

    sampled = (left.select(*keys)
               .withColumn("__mid", F.monotonically_increasing_id())
               .where(F.pmod(F.xxhash64("__mid"),
                             F.lit(int(sample_mod))) == 0)
               .drop("__mid"))
    row = agg_of(sampled)
    # a hot-share estimate from a handful of rows is noise — a 1-row
    # sample reads hot_share = 1.0 and would size salts to the FULL
    # parallelism for a join with zero skew, replicating the whole
    # right side (r10 review catch).  Below a minimum support, run
    # the exact frequency pass instead: it is cheap precisely when
    # the sample is this small.
    _MIN_SAMPLE = 100
    if (row["n"] or 0) < _MIN_SAMPLE:
        row = agg_of(left.select(*keys))
        if not row["n"]:
            return 1
    hot_share = row["hot"] / row["n"]
    parallelism = int(left.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    return max(1, min(math.ceil(hot_share * parallelism), parallelism))


def salted_join(left: DataFrame, right: DataFrame,
                on: str | Sequence[str], num_salts: int | str = 16,
                how: str = "inner") -> DataFrame:
    """Skew-resilient equi-join — result-identical to
    ``left.join(right, on, how)``, execution-resilient to hot keys.

    A hot join key (one key holding a large share of rows — the classic
    100 TB failure mode AQE's skew-join split can miss when the hot key
    is a single shuffle block on the build side) pins the whole key to
    one reducer.  Salting splits it: each left row gets a deterministic
    salt in ``[0, num_salts)`` hashed from the full row, the right side
    is replicated once per salt value, and the shuffle key becomes
    ``(key, salt)`` — a hot key now spreads over ``num_salts``
    reducers.  Each left row meets exactly one copy of each matching
    right row, so the joined multiset is unchanged (asserted against
    the plain-join oracle).

    Cost model: right-side shuffle volume × ``num_salts`` — use when
    right is the small/dimension side and left is the skewed fact.
    Supported ``how``: inner / left / left_semi / left_anti (unmatched
    right rows would otherwise surface once per salt).

    ``num_salts="auto"`` samples the left side's key frequencies
    (bounded prefix, one tiny job) and sizes the salt count from the
    hot-key share — see :func:`_auto_num_salts`.  A fixed count is
    blind in both directions: 16 salts saturate when one key holds
    most of a 16×-grown fact (its per-reducer share still exceeds
    everyone else's), and over-replicate the right side when the keys
    are uniform.

    WHEN to salt (measured — SCALING.md probe r38, AQE-only vs
    salted-only vs both on a hot key growing to a 98% row share):
    for a plain batch shuffle join, DON'T — AQE's skew-join split
    rewrites it at runtime and matches or beats salting at every skew
    level without paying the right-side ×num_salts replication.
    Salting earns its cost exactly where AQE cannot re-plan: a skewed
    key feeding a window / groupBy-key ``applyInPandas`` stage,
    stream-stream and stream-static joins (no adaptive re-plan in
    Structured Streaming), shuffled-hash build-side hot blocks, or
    any pipeline running with AQE disabled.  (And if the right side
    broadcasts, there is no skew problem at all — always the first
    choice.)  Within the salted regime, prefer ``"auto"`` over a
    blind fixed count (probe r32).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(f"salted_join does not support how={how!r}: "
                         "unmatched right rows would appear once per salt")
    keys = [on] if isinstance(on, str) else list(on)
    if num_salts == "auto":
        num_salts = _auto_num_salts(left, keys)
    elif not isinstance(num_salts, int) or num_salts < 1:
        raise ValueError(
            f"num_salts must be a positive int or 'auto', got {num_salts!r}")
    if num_salts == 1:
        # no skew to fix: degenerate to the plain join — same result,
        # and the plan carries no salt column or right-side replication
        return left.join(right, keys, how)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                  F.lit(num_salts)).cast("int")
    l_s = left.withColumn("__salt", salt)
    r_s = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))))
    return l_s.join(r_s, keys + ["__salt"], how).drop("__salt")


def range_join_binned(left: DataFrame, right: DataFrame,
                      left_ts: str, right_ts: str,
                      lower_us: int, upper_us: int,
                      bin_us: int | None = None,
                      condition=None) -> DataFrame:
    """Scalable time-range join: all (left, right) pairs with
    ``right_ts − left_ts ∈ [lower_us, upper_us]`` (microsecond
    timestamps), executed as an EQUI-join on time bins instead of the
    BroadcastNestedLoopJoin a raw theta join compiles to.

    Each left row explodes to the bins its window [ts+lower, ts+upper]
    overlaps (``(upper−lower)/bin + 2`` rows — constant fan-out); the
    right side keys by its single bin; the bin equi-join shuffles both
    sides once and the exact range predicate filters residuals inside
    the join.  This is the standard interval/range-join binning
    technique: at 100 TB the theta form is O(|L|·|R|) and
    single-node-ish, the binned form is one partitioned hash join
    whose cost tracks the TRUE match count.  ``bin_us`` defaults to
    the window width (fan-out 3).  ``condition`` optionally adds a
    residual predicate over the joined columns (e.g. different user).

    Both inputs must have fully disjoint column names — including the
    two timestamp columns (prefix/alias beforehand).
    """
    if upper_us < lower_us:
        raise ValueError(f"upper_us ({upper_us}) < lower_us ({lower_us})")
    if bin_us is None:
        bin_us = max(1, upper_us - lower_us)
    if bin_us < 1:
        raise ValueError(f"bin_us must be >= 1, got {bin_us}")
    from nosql_join_stream_spark.functions import epoch_us
    l_us = epoch_us(left_ts)
    r_us = epoch_us(right_ts)
    lo_bin = F.floor((l_us + lower_us) / bin_us)
    hi_bin = F.floor((l_us + upper_us) / bin_us)
    l_b = left.withColumn("__bin", F.explode(F.sequence(lo_bin, hi_bin)))
    r_b = right.withColumn("__bin", F.floor(r_us / bin_us))
    cond = ((r_us >= l_us + lower_us) & (r_us <= l_us + upper_us))
    if condition is not None:
        cond = cond & condition
    return l_b.join(r_b, "__bin").filter(cond).drop("__bin")


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str] | str,
              left_ts: str, right_ts: str,
              payload: Sequence[str] = (),
              direction: str = "backward",
              tolerance_us: int | None = None) -> DataFrame:
    """As-of join — pandas ``merge_asof`` semantics, distributed: for
    each left row, attach the single right row whose ``right_ts`` is
    the latest at-or-before (``backward``, the trade×quote default),
    the earliest at-or-after (``forward``), or the closest in either
    direction (``nearest``, ties backward) — per ``on`` key, both
    bounds inclusive, optionally within ``tolerance_us`` microseconds.

    Scale shape — why this is NOT a range join: both sides tag-union
    and shuffle ONCE on the key; one ordered per-key window computes a
    running ``max``/``min`` over the right-row struct (NULL on left
    rows, so aggregates skip them), and a row-local projection reads
    the match out.  No pair space, no per-key loops, no bin fan-out —
    cost is a sort within each key partition, the same as any
    windowed metric, at ANY key cardinality/skew mix (a hot key costs
    its own sort, never a cross product).

    ``payload``: right columns to carry onto the match (returned as
    ``asof_<name>``; the matched timestamp returns as
    ``asof_<right_ts>``).  Tie-break when several right rows share
    the asof timestamp: the struct comparison decides — greatest
    payload for ``backward``, least for ``forward`` — deterministic
    across runs/engines (never first-seen order).

    Left and right may share column names (only ``on`` + ``right_ts``
    + ``payload`` are read from the right side).
    """
    from nosql_join_stream_spark.functions import epoch_us

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = list(left.columns)
    rv = F.struct(F.col(right_ts).alias("t"),
                  *[F.col(c).alias(c) for c in payload])
    r2 = right.select(*keys, F.col(right_ts).alias("__t"),
                      rv.alias("__rv"), F.lit(0).alias("__is_l"))
    l2 = (left.withColumn("__t", F.col(left_ts))
              .withColumn("__is_l", F.lit(1)))
    u = l2.unionByName(r2, allowMissingColumns=True)

    # equal-ts inclusion: backward (<=) needs right rows FIRST at a
    # tied timestamp so the running window sees them; forward (>=)
    # needs them AFTER.  nearest uses the backward layout — an
    # equal-ts right row lands in the backward window with |dt| = 0,
    # which wins the CASE regardless.
    tie = F.col("__is_l").asc() if direction in ("backward", "nearest") \
        else F.col("__is_l").desc()
    w_back = (Window.partitionBy(*keys).orderBy(F.col("__t").asc(), tie)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_fwd = (Window.partitionBy(*keys).orderBy(F.col("__t").asc(), tie)
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))

    out = u
    if direction in ("backward", "nearest"):
        out = out.withColumn("__b", F.max("__rv").over(w_back))
    if direction in ("forward", "nearest"):
        out = out.withColumn("__f", F.min("__rv").over(w_fwd))
    out = out.filter(F.col("__is_l") == 1)

    def _gate(m):
        if tolerance_us is None:
            return m
        dt = F.abs(epoch_us(F.col("__t")) - epoch_us(m["t"]))
        return F.when(dt <= tolerance_us, m)

    if direction == "backward":
        m = _gate(F.col("__b"))
    elif direction == "forward":
        m = _gate(F.col("__f"))
    else:
        b, f = _gate(F.col("__b")), _gate(F.col("__f"))
        dt_b = epoch_us(F.col("__t")) - epoch_us(b["t"])
        dt_f = epoch_us(f["t"]) - epoch_us(F.col("__t"))
        m = (F.when(b.isNull(), f)
              .when(f.isNull(), b)
              .when(dt_b <= dt_f, b)
              .otherwise(f))
    return out.select(
        *lcols,
        m["t"].alias(f"asof_{right_ts}"),
        *[m[c].alias(f"asof_{c}") for c in payload])
