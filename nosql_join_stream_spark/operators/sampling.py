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

from pyspark.sql import Column, DataFrame, Window
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


def order_hash(id_col: Column) -> Column:
    """60-bit deterministic ordering hash of an id: first 15 hex chars
    of SHA-256, parsed as an int.  Identical formula in DuckDB
    (``cast('0x' || substr(sha256(id::varchar),1,15) as bigint)``), so
    hash-ordered selections replay bit-for-bit across engines."""
    return F.conv(F.substring(F.sha2(id_col.cast("string"), 256), 1, 15),
                  16, 10).cast("long")


#: 2^60 — order_hash's range, the denominator of the hash-uniform
HASH_SPACE = 1 << 60


def weighted_sample_no_replacement(df: DataFrame, id_col: str,
                                   weight_col: str, k: int,
                                   group_col: str | None = None
                                   ) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic — the
    Efraimidis–Spirakis A-ES scheme (IPL 2006, public literature) with
    hash-uniforms instead of RNG: each row gets
    ``u = (order_hash(id)+1) / 2^60 ∈ (0, 1]`` and selection key
    ``ln(u) / w`` (the log form of u^(1/w) — monotone-equivalent,
    numerically tame); the k LARGEST keys win, per group when
    ``group_col`` is given.  Inclusion probability is proportional to
    weight, successive draws are without replacement, and — because u
    is a hash, not a random — the draw is reproducible across engines,
    runs, and retries, and replays as plain SQL (the oracle).

    Keys round to 9 dp before ranking with an id tie-break, so the
    order is engine-invariant (libm ulp differences sit ~1e-15, far
    under the grain).  Weights must be > 0: NULL/zero/negative rows
    raise in-plan rather than silently skewing the draw.

    Scale shape: one window per group over hash-keyed rows; for a
    known global k the same count-prefilter as ``cap_per_group``
    applies (not needed here — k is small).  Returns the selected
    rows + ``es_key`` and per-group ``draw_rank``.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    wcheck = F.when(
        F.col(weight_col).isNull() | (F.col(weight_col) <= 0),
        F.raise_error(F.concat(
            F.lit(f"weighted_sample_no_replacement: {weight_col} must "
                  "be > 0, got "),
            F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL"))))
    ).otherwise(F.col(weight_col).cast("double"))
    u = (order_hash(F.col(id_col)) + F.lit(1)).cast("double") \
        / F.lit(float(HASH_SPACE))
    key = F.round(F.log(u) / wcheck, 9)
    parts = [group_col] if group_col else []
    w = Window.partitionBy(*parts).orderBy(F.col("es_key").desc(),
                                           F.col(id_col))
    return (df.withColumn("es_key", key)
              .withColumn("draw_rank", F.row_number().over(w))
              .filter(F.col("draw_rank") <= k))


def cap_per_group(df: DataFrame, group_col: str, id_col: str,
                  cap: int) -> DataFrame:
    """Keep at most ``cap`` rows per group — the mixture-control
    downsampler (cap docs per domain/source/lang before training).
    Selection is the ``cap`` smallest ``order_hash(id)`` per group:
    deterministic, engine-replayable, unbiased w.r.t. content.

    Scale shape: a naive per-group ``row_number`` ranks EVERY row of
    the largest group in one task.  Instead, group counts (tiny —
    one row per group) broadcast back, and groups bigger than 4x cap
    are prefiltered to hashes under a 4x-oversampled threshold
    (hash is uniform on [0, 2^60)), so the rank window sees O(cap)
    rows per group no matter how skewed the corpus.  The final
    row_number is exact on the survivors; the prefilter drops a
    should-have-survived row only if fewer than ``cap`` of n hashes
    land under a 4x-proportional cutoff — vanishing for any real
    group size (Chernoff), and deterministic either way.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    h = order_hash(F.col(id_col))
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    thresh = ((F.lit(4.0 * cap) / F.col("__n")) * F.lit(float(1 << 60))) \
        .cast("long")
    surv = (df.withColumn("__h", h)
              .join(F.broadcast(counts), group_col)
              .filter((F.col("__n") <= F.lit(4 * cap))
                      | (F.col("__h") < thresh)))
    w = Window.partitionBy(group_col).orderBy("__h", id_col)
    return (surv.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= cap)
                .drop("__h", "__n", "__rn"))


def budget_per_group(df: DataFrame, group_col: str, id_col: str,
                     weight_col: str, budget: int,
                     oversample: float = 4.0) -> DataFrame:
    """Keep rows per group in deterministic hash order until a WEIGHT
    budget is spent — the token-budget mixture draw: given per-source
    token budgets (e.g. from temperature re-weighting), materialize
    the actual training subset.  A row is kept iff the summed weight
    of all earlier-hashed rows in its group is still under ``budget``
    (so the draw overshoots by at most one document — the standard
    convention; taking ``<= budget`` instead would undershoot).

    Scale shape (same design as cap_per_group): per-group totals (one
    tiny row per group) broadcast back; groups within budget keep
    everything and SKIP the cutoff entirely; over-budget groups
    prefilter to hashes under an ``oversample``-proportional COUNT
    cutoff before the exclusive prefix-sum window.  The cutoff is on
    row count, not weight: weights are >= 1 (the precondition), so a
    winner's exclusive prefix weight < budget implies fewer than
    ``budget`` rows hash before it — winner rank <= budget — and the
    Chernoff argument of cap_per_group applies verbatim (a true winner
    is dropped only if under budget of n uniform hashes land below an
    oversample-proportional cutoff).  A weight-based cutoff is NOT
    sound: a heavy row sitting late in hash order after a light
    prefix is a winner at any hash value (caught by the property
    test).  The cumsum is exact on the survivors, and an oracle
    replaying the same cutoff gets the same rows.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    h = order_hash(F.col(id_col))
    # The count-based prefilter is sound ONLY under the documented
    # precondition weights >= 1 (winner rank <= budget needs it);
    # enforce it in-plan rather than trusting the caller: a violating
    # row poisons its group's draw silently otherwise.  raise_error is
    # evaluated per-row inside the plan — no extra pass over the data.
    # NULL must raise too: NULL < 1 is NULL (row would pass the check),
    # then SUM skips it in the prefix sum — consuming zero budget while
    # still emittable, the exact silent violation this guard exists for.
    wcheck = F.when(
        F.col(weight_col).isNull() | (F.col(weight_col) < 1),
        F.raise_error(F.concat(
            F.lit(f"budget_per_group: {weight_col} must be >= 1, got "),
            F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL"))))
    ).otherwise(F.col(weight_col))
    df = df.withColumn(weight_col, wcheck)
    totals = df.groupBy(group_col).agg(F.sum(weight_col).alias("__tot"),
                                       F.count("*").alias("__n"))
    frac = F.least(F.lit(1.0),
                   F.lit(float(oversample) * budget) / F.col("__n"))
    thresh = (frac * F.lit(float(1 << 60))).cast("long")
    surv = (df.withColumn("__h", h)
              .join(F.broadcast(totals), group_col)
              .filter((F.col("__tot") <= F.lit(budget))
                      | (F.col("__h") < thresh)))
    w = (Window.partitionBy(group_col).orderBy("__h", id_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    spent = F.coalesce(F.sum(weight_col).over(w), F.lit(0))
    return (surv.withColumn("__spent", spent)
                .filter((F.col("__tot") <= F.lit(budget))
                        | (F.col("__spent") < F.lit(budget)))
                .drop("__h", "__tot", "__n", "__spent"))


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


def global_shuffle(df: DataFrame, id_col: str,
                   pos_col: str = "shuffle_pos") -> DataFrame:
    """Deterministic global training-order shuffle: rows enumerated
    1..N in sha2-60 hash order of their id — the reproducible
    permutation training runs need (same order on every rerun and
    every engine, no RNG state to ship).

    Scale shape: hash order via ``repartitionByRange`` + the two-pass
    dense index (combinators._with_pos) — an unpartitioned
    ``row_number`` window would funnel the whole corpus through one
    task; this form's only global structure is a partitions-sized
    offset table that broadcasts.  Ties (60-bit hash collisions are
    birthday-real at billions of rows) break on the id, keeping the
    order total and the position unique.
    """
    from nosql_join_stream_spark.operators.combinators import _with_pos
    d = df.withColumn("__sh", order_hash(F.col(id_col)))
    return _with_pos(d, ["__sh", id_col], pos_col).drop("__sh")


def interleave_by_weight(df: DataFrame, group_col: str, id_col: str,
                         pos_col: str = "train_pos") -> DataFrame:
    """Proportional source INTERLEAVING — the ordering half of mixture
    design: temperature weights decide how much of each source to
    draw, this decides WHERE in the training order it lands, spreading
    every source evenly instead of concatenating them (which front-
    loads one distribution and starves the others until late
    training).  Stride scheduling: the r-th doc of source s (hash
    order) gets key ``r / w_s`` with ``w_s = sqrt(n_s)`` (the α = 0.5
    temperature); sorting by key yields each source at a cadence
    proportional to its weight, deterministically.

    sqrt — not pow(·, α) — is deliberate: IEEE sqrt is correctly
    rounded in every engine, so the keys (and therefore the ORDER)
    replay bit-for-bit in SQL; a general pow can differ by 1 ulp
    across libm implementations and silently permute near-ties.

    Scale shape: per-source rank windows parallelize by group; group
    sizes ride a broadcast; the global enumeration is the two-pass
    dense index (no single-task window).  Returns df + ``pos_col``
    (1..N).
    """
    from pyspark.sql import Window

    from nosql_join_stream_spark.operators.combinators import _with_pos

    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    w = Window.partitionBy(group_col).orderBy(
        order_hash(F.col(id_col)), id_col)
    ranked = (df.join(F.broadcast(counts), group_col)
                .withColumn("__rk", F.row_number().over(w))
                .withColumn("__key", F.col("__rk") / F.sqrt("__n")))
    return (_with_pos(ranked, ["__key", group_col, id_col], pos_col)
            .drop("__rk", "__n", "__key"))


def weighted_acceptance_sample(df: DataFrame, id_col: str,
                               weight_col: str, seed: int = 0,
                               beta: float = 0.5,
                               validate: bool = True) -> DataFrame:
    """Deterministic weighted ACCEPTANCE sampling (Bernoulli thinning):
    keep each row independently with probability
    ``p = (w / w_max) ** beta`` — the soft, size-proportional cousin of
    the hard quota operators (cap_per_group keeps exactly N;
    weighted_sample_no_replacement draws a fixed k; this keeps an
    EXPECTED fraction, preserving the weight distribution's shape at
    ``beta`` temperature).  Accepted rows carry ``ht_weight = 1/p``,
    the Horvitz-Thompson inverse-inclusion weight that keeps any
    downstream aggregate unbiased.

    No RNG: the coin is the 52-bit prefix of ``sha256(seed || ':' ||
    id)`` compared against ``p * 2**52`` — replayable, engine-portable
    (52 bits convert to double EXACTLY; DuckDB mirrors the arithmetic
    bit-for-bit), and a different ``seed`` gives an independent draw.
    ``beta`` 0.5 / 1.0 route through ``sqrt`` / identity (both
    IEEE-exact across libms); other exponents use ``pow`` and rely on
    the 9-dp rounding of ``p`` to absorb any last-ulp libm divergence.

    One scan + a 1-row broadcast max — no shuffle of the data rows at
    any corpus size.

    Weight domain: ``w`` must be non-null, non-NaN and > 0.  A NaN
    weight slips past null/sign checks (NaN <= 0 is false) yet makes
    ``p`` NaN, and Spark's NaN-is-largest ordering then silently KEEPS
    the row — so the validator tests ``isnan`` explicitly.  A NULL or
    zero
    weight makes ``p`` NULL/0 and the row vanishes WITHOUT its 1/p
    weight ever existing; a NEGATIVE weight is worse — ``sqrt`` gives
    NaN and Spark's NaN-is-largest ordering then KEEPS the row with a
    NaN acceptance weight.  Either way corrupt weight data silently
    biases the sample (r12 advisor).  With ``validate=True`` (default)
    a bounded 1-row aggregate counts offending rows up front and
    raises; pass ``validate=False`` only when the caller has already
    asserted the domain (the check is one extra scan).
    """
    if validate:
        bad = df.agg(F.sum(
            F.when(F.col(weight_col).isNull()
                   | F.isnan(F.col(weight_col).cast("double"))
                   | (F.col(weight_col).cast("double") <= 0.0), 1)
            .otherwise(0)).alias("n")).first()["n"]
        if bad:
            raise ValueError(
                f"weighted_acceptance_sample: {bad} row(s) have NULL, NaN "
                f"or non-positive {weight_col!r}; acceptance probability is "
                "undefined there and the rows would be dropped silently. "
                "Filter or repair the weight column first.")
    wmax = df.agg(F.max(F.col(weight_col).cast("double")).alias("__wmax"))
    ratio = F.col(weight_col).cast("double") / F.col("__wmax")
    if beta == 0.5:
        p_raw = F.sqrt(ratio)
    elif beta == 1.0:
        p_raw = ratio
    else:
        p_raw = F.pow(ratio, F.lit(float(beta)))
    tagged = F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))
    h52 = F.conv(F.substring(F.sha2(tagged, 256), 1, 13), 16, 10) \
           .cast("long")
    return (df.crossJoin(F.broadcast(wmax))
              .withColumn("__p", F.round(p_raw, 9))
              .filter(h52.cast("double")
                      < F.col("__p") * F.lit(float(1 << 52)))
              .withColumn("accept_p", F.col("__p"))
              .withColumn("ht_weight", F.round(1.0 / F.col("__p"), 6))
              .drop("__wmax", "__p"))
