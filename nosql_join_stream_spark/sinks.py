"""Sinks — the write side the reference leaves to its tests.

Reference S10 (SURVEY.md §2.1): the library ships NO sinks; tests
attach buffer sinks / ``Sink.seq`` / ``runFold``
(JoinMongoSpec.scala:62, PartitionedLogAkkaSpec.scala:52,
AkkaJoinCassandraSpec.scala:75).  Spark-first, a sink is
``df.write`` / ``df.writeStream`` — these helpers add the three
layout decisions that matter at 100 TB:

- **partitioning** (``partition_by``): directory-level pruning for
  every downstream scan that filters on the partition column;
- **bucketing** (``write_bucketed``): pre-shuffled layout so a later
  equi-join/agg on the bucket key is shuffle-free (sort-merge join
  reads co-located buckets directly);
- **z-ordering** (``write_zordered``): Morton-curve clustering so
  row-group min/max stats prune range filters on several columns at
  once, not just a sort's leading column.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: Sequence[str] | None = None,
                sort_by: Sequence[str] | None = None) -> None:
    """Batch sink: write ``df`` to ``path`` (reference S10 analog).

    ``partition_by`` produces hive-style ``col=value`` directories —
    the partition-pruning contract downstream scans rely on.
    ``sort_by`` sorts within output files so parquet row-group min/max
    stats become selective — range filters on the sort key then skip
    whole row groups at scan time (data skipping without an index).
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            sort_by: Sequence[str] | None = None) -> int:
    """Small-file compaction — the unglamorous operator every 100 TB
    lake needs: streaming sinks and fine-grained partitions produce
    thousands of KB-sized files whose per-file open/footer cost
    dominates scans.  Rewrites ``path`` into ``ceil(bytes/target)``
    files (optionally re-sorted for stats selectivity) and returns the
    new file count.  The rewrite stages into ``path + '.compact'``
    then swaps, so a failed job never leaves ``path`` half-written.
    """
    import glob
    import os
    import shutil

    total = sum(os.path.getsize(f)
                for f in glob.glob(os.path.join(path, "**", "*.parquet"),
                                   recursive=True))
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by) \
               .sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_files)
    tmp = path.rstrip("/") + ".compact"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(path)
    os.rename(tmp, path)
    return n_files


def write_bucketed(df: DataFrame, table: str, bucket_cols: Sequence[str],
                   num_buckets: int = 32,
                   sort_by: Sequence[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_cols) so
    repeated equi-joins/aggs on those keys skip the shuffle entirely —
    the bulk-synchronous answer to the reference's per-key index
    lookups (N+1 pattern, storage.scala:390-391).  Requires
    ``saveAsTable`` (bucket metadata lives in the session catalog).
    """
    w = (df.write.format("parquet").mode(mode)
           .bucketBy(num_buckets, *bucket_cols))
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def _zorder_value(cols: Sequence[Column], bits: int = 16) -> Column:
    """Interleave the bits of pre-normalized [0, 2^bits) integer
    columns into one Morton (Z-curve) key — pure JVM shift/or
    expressions, codegen-friendly."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def write_zordered(df: DataFrame, path: str, cols: Sequence[str],
                   n_files: int = 16, bits: int = 16) -> None:
    """Z-order layout: cluster rows along a Morton space-filling curve
    over ``cols`` so parquet min/max stats stay selective for range
    filters on ANY of the columns — multi-dimensional data skipping
    where a plain sort helps only its leading column.

    Each column min/max-normalizes to a ``bits``-bit integer via a
    1-row broadcast aggregate (no driver round-trip), bits interleave
    into the Morton key, and ``repartitionByRange`` + per-file sort on
    that key give every output file a tight bounding box in
    (col1, col2, ...) space.  At 100 TB this is the difference between
    a box query touching a handful of row groups and touching all of
    them; the write itself is one range-partitioned shuffle, the same
    cost as any global sort.
    """
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; "
                         "use write_table(sort_by=...) for one")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__max_{c}")]
    ranges = df.agg(*aggs)
    top = F.lit(float((1 << bits) - 1))
    normed = []
    for c in cols:
        span = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        frac = F.when(span > 0,
                      (F.col(c).cast("double") - F.col(f"__min_{c}")) / span) \
                .otherwise(F.lit(0.0))
        normed.append(F.round(frac * top).cast("long"))
    out = (df.crossJoin(F.broadcast(ranges))
             .withColumn("__z", _zorder_value(normed, bits))
             .repartitionByRange(n_files, "__z")
             .sortWithinPartitions("__z")
             .drop("__z", *[f"__{m}_{c}" for c in cols
                            for m in ("min", "max")]))
    out.write.mode("overwrite").parquet(path)


def write_log_rolled(df: DataFrame, path: str, order_col: str,
                     max_partition_rows: int = 5_000_000,
                     fmt: str = "parquet") -> None:
    """Partition-rolling event-log writer — the reference's
    ``maxPartitionSize = 5000000L`` log layout (log/package.scala:59:
    the Akka-persistence journal rolls to a new partition every N
    sequence numbers) done as a batch layout decision.

    Rows are enumerated in ``order_col`` order with the two-pass dense
    index (no single-task global window) and land in hive partition
    ``log_part = seq_no // max_partition_rows``; within a file they
    stay sorted by ``order_col``, so a reader doing
    ``log_from(key, offset)`` prunes to ``offset // N ..`` partitions
    at the directory level and row-group min/max finish the job —
    the same O(1)-seek contract the reference's partitioned log gives
    its resumable readers.
    """
    from nosql_join_stream_spark.operators.combinators import _with_pos

    if max_partition_rows < 1:
        raise ValueError(
            f"max_partition_rows must be >= 1, got {max_partition_rows}")
    indexed = _with_pos(df, [order_col], "__seq")
    rolled = (indexed.withColumn(
        "log_part", ((F.col("__seq") - 1) / max_partition_rows)
        .cast("long")).drop("__seq"))
    (rolled.repartition("log_part")
           .sortWithinPartitions(order_col)
           .write.mode("overwrite")
           .partitionBy("log_part").format(fmt).save(path))


# ---------------------------------------------------------------------------
# Keyed standing table with partition-level MERGE (CDC upsert)
# ---------------------------------------------------------------------------

_KB = "__kb"


def _key_bucket(key_col: str, num_buckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


def latest_per_key(df: DataFrame, key_col: str,
                   order_by: Sequence[str]) -> DataFrame:
    """Keep-latest compaction: one row per key, the maximum of
    ``order_by`` (compared in sequence, descending) — the in-memory
    form of the CDC upsert-view.  One shuffle on the key."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_by])
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def write_keyed(df: DataFrame, path: str, key_col: str,
                num_buckets: int = 32) -> None:
    """Materialize a keyed standing table: hive partitions on
    ``__kb = hash(key) mod num_buckets``.  The bucket directory is the
    MERGE unit — ``upsert_keyed`` rewrites only the buckets a batch
    touches, so ``num_buckets`` should scale with table size until one
    bucket is a comfortable rewrite quantum (e.g. a few GB).  ``df``
    must already be one-row-per-key (use :func:`latest_per_key`).

    The bucket layout is recorded in a ``_nsjs_meta`` sidecar INSIDE
    the table dir (leading underscore → invisible to parquet scans),
    written LAST so it doubles as the bootstrap-commit marker: a
    crash mid-write leaves no meta, and both ``upsert_keyed`` and
    ``keyed_table_exists`` treat the table as absent.  Reading it
    through Spark (not ``os.path``) keeps every check valid on
    HDFS/S3 paths, not just the local filesystem."""
    (df.withColumn(_KB, _key_bucket(key_col, num_buckets))
       .repartition(_KB)
       .write.mode("overwrite").partitionBy(_KB).parquet(path))
    _write_meta(df.sparkSession, path, key_col, num_buckets)


def _write_meta(spark: SparkSession, path: str, key_col: str,
                num_buckets: int) -> None:
    """One JSON line via the Hadoop FileSystem API — filesystem-
    agnostic like a Spark write, but with NO job (a 1-row
    createDataFrame→write.json costs seconds of session round-trips
    for 50 bytes of metadata)."""
    import json

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path + "/_nsjs_meta/meta.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(p, True)
    out.write(bytearray(json.dumps(
        {"key_col": key_col, "num_buckets": num_buckets}).encode()))
    out.close()


def _read_meta(spark: SparkSession, path: str):
    """The table's layout row, or None if the table was never
    completely written (no meta == no table).  Explicit schema — a
    schema-inference pass would double the (per-micro-batch) cost."""
    from pyspark.errors import AnalysisException

    try:
        return (spark.read.schema("key_col string, num_buckets int")
                .json(path + "/_nsjs_meta").first())
    except AnalysisException:
        return None


def keyed_table_exists(spark: SparkSession, path: str) -> bool:
    """True iff a COMPLETELY-written keyed table lives at ``path``
    (the meta sidecar is written last — partial bootstrap leaves
    none).  Filesystem-agnostic: goes through Spark's readers."""
    return _read_meta(spark, path) is not None


def read_keyed(spark: SparkSession, path: str) -> DataFrame:
    """Read a keyed standing table, hiding the bucket column."""
    return spark.read.parquet(path).drop(_KB)


def upsert_keyed(spark: SparkSession, path: str, batch: DataFrame,
                 key_col: str, order_by: Sequence[str],
                 num_buckets: int | None = None,
                 count_rows: bool = True) -> dict:
    """Partition-level CDC MERGE without a table format: upsert
    ``batch`` into the standing table at ``path``, keeping per key the
    row with the greatest ``order_by`` (sequence/event-time ordering;
    ties prefer the incoming batch).  The physical counterpart of the
    ``latest_event_per_user`` upsert VIEW — compaction moves from
    every read to each write.

    Scale shape: the batch is localCheckpointed ONCE (safe for
    read-once ingest sources — kafka-fed batches are never scanned
    twice); its touched bucket list (bounded by ``num_buckets``, never
    rows) prunes the standing-table scan to exactly those hive
    partitions (PartitionFilters); one keep-latest window shuffles
    only touched-buckets + batch; a dynamic partition overwrite
    rewrites exactly the touched ``__kb=N/`` directories — untouched
    buckets keep their files byte-identical.  Cost tracks batch
    locality, not table size: a 100 TB table with 4096 buckets absorbs
    a skewed daily batch by rewriting only the buckets it lands in.

    Returns ``{"buckets_touched": k, "rows_written": n}``.
    """
    from pyspark.sql import Window

    if not order_by:
        raise ValueError("upsert_keyed needs >= 1 order_by column")
    meta = _read_meta(spark, path)
    if meta is None:
        raise ValueError(
            f"no completely-written keyed table at {path} "
            "(write_keyed it first — its meta sidecar is the marker)")
    if meta.key_col != key_col:
        raise ValueError(
            f"keyed table at {path} is keyed on {meta.key_col!r}, "
            f"not {key_col!r}")
    # the STORED layout wins: hashing a batch with a different bucket
    # count than the table was built with would strand a key's old row
    # in a bucket the merge never reads — silent duplicate keys
    if num_buckets is not None and num_buckets != meta.num_buckets:
        raise ValueError(
            f"keyed table at {path} has {meta.num_buckets} buckets; "
            f"upsert requested {num_buckets}")
    num_buckets = int(meta.num_buckets)
    b = (batch.withColumn(_KB, _key_bucket(key_col, num_buckets))
              .withColumn("__src", F.lit(1))
              .localCheckpoint())
    touched = [r[_KB] for r in b.select(_KB).distinct().collect()]
    if not touched:
        return {"buckets_touched": 0, "rows_written": 0}
    existing = (spark.read.parquet(path)
                .filter(F.col(_KB).isin(touched))
                .withColumn("__src", F.lit(0)))
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("__src").desc())
    # localCheckpoint: the plan reads `path` and the write overwrites
    # it — materialize survivors first (the compact()/ann_ivf_compact
    # pattern), bounded by touched buckets only
    latest = (existing.unionByName(b)
              .withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn", "__src")
              .localCheckpoint())
    (latest.repartition(_KB)
           .write.mode("overwrite")
           .option("partitionOverwriteMode", "dynamic")
           .partitionBy(_KB).parquet(path))
    # rows_written scans the checkpointed merge result (cheap, no
    # recompute); per-micro-batch callers skip even that one job
    return {"buckets_touched": len(touched),
            "rows_written": latest.count() if count_rows else -1}


def retention_expire(spark: SparkSession, path: str, partition_col: str,
                     keep_from) -> int:
    """Partition-level retention: DROP hive partitions of ``path``
    whose ``partition_col`` value sorts below ``keep_from`` — the
    other half of the lifecycle story next to :func:`compact` (a log
    that only ever grows isn't a deployment, it's a liability).

    Deleting a directory is the entire operation — no rewrite, no
    scan of surviving data, cost proportional to expired partitions
    only.  This is exactly why the log/stream sinks here partition by
    time bucket / batch id: retention becomes an O(dirs) metadata
    action.  Values compare as strings (zero-pad numeric partition
    values at write time — ``write_log_rolled`` does).  Returns the
    number of partitions dropped.
    """
    import glob
    import os
    import shutil

    prefix = f"{partition_col}="
    dropped = 0
    for d in sorted(glob.glob(os.path.join(path, prefix + "*"))):
        if not os.path.isdir(d):
            continue
        val = os.path.basename(d)[len(prefix):]
        if val < str(keep_from):
            shutil.rmtree(d)
            dropped += 1
    return dropped


# ---------------------------------------------------------------------------
# Versioned keyed table: snapshot-isolated MERGE via immutable manifests
# ---------------------------------------------------------------------------
#
# upsert_keyed rewrites bucket dirs IN PLACE (dynamic partition
# overwrite) — correct for a single writer, but a reader scanning
# mid-merge can see a mix of old and new buckets.  The versioned form
# is the poor-man's table format that fixes it the way Iceberg/Delta
# do: data files are IMMUTABLE (each merge writes its buckets under a
# fresh v<N>/ dir), and a tiny numbered manifest maps each bucket to
# the version that last wrote it.  Readers resolve the highest
# manifest ONCE and read only dirs it references — a merge landing
# mid-query changes nothing they hold; publishing is one atomic
# rename of a new manifest file; rollback is deleting it.  GC drops
# version dirs no longer referenced.

_MANIFEST_SCHEMA = ("key_col string, num_buckets int, version int, "
                    "buckets array<struct<kb:int,v:string>>")


def _manifest_dir(path: str) -> str:
    return path + "/_nsjs_manifests"


def _list_manifests(spark: SparkSession, path: str) -> list:
    jvm = spark._jvm
    d = jvm.org.apache.hadoop.fs.Path(_manifest_dir(path))
    fs = d.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(d):
        return []
    out = []
    for st in fs.listStatus(d):
        name = st.getPath().getName()
        if name.startswith("manifest-v") and name.endswith(".json"):
            out.append(int(name[len("manifest-v"):-len(".json")]))
    return sorted(out)


def _write_manifest(spark: SparkSession, path: str, version: int,
                    key_col: str, num_buckets: int,
                    buckets: dict) -> None:
    """Publish manifest v<version>: write to a tmp name, fs.rename to
    the final (previously-absent) name — the atomic commit point."""
    import json

    jvm = spark._jvm
    final = jvm.org.apache.hadoop.fs.Path(
        f"{_manifest_dir(path)}/manifest-v{version}.json")
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{_manifest_dir(path)}/.manifest-v{version}.json.tmp")
    fs = final.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps(
        {"key_col": key_col, "num_buckets": num_buckets,
         "version": version,
         "buckets": [{"kb": int(k), "v": v}
                     for k, v in sorted(buckets.items())]}).encode()))
    out.close()
    if not fs.rename(tmp, final):
        raise RuntimeError(f"manifest publish failed: v{version} "
                           "already exists (concurrent writer?)")


def _read_manifest(spark: SparkSession, path: str,
                   version: int | None = None):
    """A committed manifest as (version, key_col, num_buckets,
    {kb: version_dir}) — the latest, or an explicit ``version`` (time
    travel); None if never written, ValueError for a version that was
    never committed or already GC'd."""
    import json

    versions = _list_manifests(spark, path)
    if not versions:
        return None
    if version is None:
        v = versions[-1]
    elif version in versions:
        v = version
    else:
        raise ValueError(
            f"no committed manifest v{version} at {path} "
            f"(available: {versions} — GC'd or never written)")
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(
        f"{_manifest_dir(path)}/manifest-v{v}.json")
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.open(p)
    # py4j cannot fill a Python buffer in place (byte[] args copy) —
    # use a RETURNING read
    data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    stream.close()
    m = json.loads(bytes(data).decode())
    return (m["version"], m["key_col"], m["num_buckets"],
            {int(b["kb"]): b["v"] for b in m["buckets"]})


def _written_buckets(df: DataFrame, key_col: str,
                     num_buckets: int) -> list[int]:
    return sorted(
        r[_KB] for r in df.select(
            _key_bucket(key_col, num_buckets).alias(_KB))
        .distinct().collect())


def write_keyed_snapshot(df: DataFrame, path: str, key_col: str,
                         num_buckets: int = 32) -> int:
    """Bootstrap a versioned keyed table (version 1).  ``df`` must be
    one-row-per-key (:func:`latest_per_key`).  Returns the version."""
    spark = df.sparkSession
    stamped = df.withColumn(_KB, _key_bucket(key_col, num_buckets))
    (stamped.repartition(_KB)
     .write.mode("overwrite").partitionBy(_KB).parquet(path + "/v1"))
    kbs = _written_buckets(df, key_col, num_buckets)
    _write_manifest(spark, path, 1, key_col, num_buckets,
                    {kb: "v1" for kb in kbs})
    return 1


def read_keyed_snapshot(spark: SparkSession, path: str,
                        version: int | None = None) -> DataFrame:
    """Read a committed snapshot — the latest, or ``version`` for
    TIME TRAVEL (any manifest still inside the GC retention window):
    reproduce the exact table a training run saw, diff two ingest
    days, or audit a bad merge.  The manifest is resolved EAGERLY —
    the returned DataFrame keeps reading exactly these (immutable)
    files even if merges land while the query runs."""
    man = _read_manifest(spark, path, version)
    if man is None:
        raise ValueError(f"no committed snapshot at {path}")
    _, _, _, buckets = man
    by_ver: dict[str, list[int]] = {}
    for kb, ver in buckets.items():
        by_ver.setdefault(ver, []).append(kb)
    parts = []
    for ver, kbs in sorted(by_ver.items()):
        base = f"{path}/{ver}"
        dirs = [f"{base}/{_KB}={kb}" for kb in sorted(kbs)]
        parts.append(spark.read.option("basePath", base).parquet(*dirs))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.drop(_KB)


def upsert_keyed_snapshot(spark: SparkSession, path: str, batch: DataFrame,
                          key_col: str, order_by: Sequence[str]) -> dict:
    """Snapshot-isolated MERGE: keep-latest semantics of
    :func:`upsert_keyed`, but touched buckets are written under a NEW
    immutable ``v<N>/`` dir and the merge becomes visible only at the
    atomic manifest publish — readers mid-flight keep their resolved
    snapshot, a crash before publish leaves the table exactly at
    v<N-1> (the orphan dir is GC'd), and rollback is deleting one
    manifest file.  Cost is identical to the in-place form: touched
    buckets only."""
    from pyspark.sql import Window

    man = _read_manifest(spark, path)
    if man is None:
        raise ValueError(
            f"no committed snapshot at {path}; write_keyed_snapshot first")
    version, m_key, num_buckets, buckets = man
    if m_key != key_col:
        raise ValueError(f"table keyed on {m_key!r}, not {key_col!r}")
    b = (batch.withColumn(_KB, _key_bucket(key_col, num_buckets))
              .withColumn("__src", F.lit(1))
              .localCheckpoint())
    touched = [r[_KB] for r in b.select(_KB).distinct().collect()]
    if not touched:
        return {"version": version, "buckets_touched": 0}
    by_ver: dict[str, list[int]] = {}
    for kb in touched:
        if kb in buckets:
            by_ver.setdefault(buckets[kb], []).append(kb)
    existing_parts = []
    for ver, kbs in sorted(by_ver.items()):
        base = f"{path}/{ver}"
        dirs = [f"{base}/{_KB}={kb}" for kb in sorted(kbs)]
        existing_parts.append(
            spark.read.option("basePath", base).parquet(*dirs))
    merged = b
    for p in existing_parts:
        merged = merged.unionByName(p.withColumn("__src", F.lit(0)))
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_by], F.col("__src").desc())
    latest = (merged.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn", "__src"))
    new_ver = version + 1
    (latest.repartition(_KB)
     .write.mode("overwrite").partitionBy(_KB)
     .parquet(f"{path}/v{new_ver}"))
    new_map = dict(buckets)
    for kb in touched:
        new_map[kb] = f"v{new_ver}"
    _write_manifest(spark, path, new_ver, key_col, num_buckets, new_map)
    return {"version": new_ver, "buckets_touched": len(touched)}


def gc_keyed_snapshots(spark: SparkSession, path: str,
                       keep_manifests: int = 1) -> int:
    """Drop version dirs not referenced by the ``keep_manifests``
    newest manifests (and the older manifest files themselves).
    Returns the number of version dirs removed.  Run on a schedule,
    with ``keep_manifests`` sized to the longest query/reader you
    allow — the snapshot-isolation retention window."""
    import json

    versions = _list_manifests(spark, path)
    if not versions:
        return 0
    keep, drop = versions[-keep_manifests:], versions[:-keep_manifests]
    jvm = spark._jvm
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
        spark._jsc.hadoopConfiguration())
    referenced = set()
    for v in keep:
        p = jvm.org.apache.hadoop.fs.Path(
            f"{_manifest_dir(path)}/manifest-v{v}.json")
        stream = fs.open(p)
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
        stream.close()
        referenced |= {b["v"]
                       for b in json.loads(bytes(data).decode())["buckets"]}
    removed = 0
    for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(path)):
        name = st.getPath().getName()
        if (st.isDirectory() and name.startswith("v")
                and name[1:].isdigit() and name not in referenced):
            fs.delete(st.getPath(), True)
            removed += 1
    for v in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(
            f"{_manifest_dir(path)}/manifest-v{v}.json"), False)
    return removed
