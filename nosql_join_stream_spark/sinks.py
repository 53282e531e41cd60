"""Sinks — the write side the reference leaves to its tests.

Reference S10 (SURVEY.md §2.1): the library ships NO sinks; tests
attach buffer sinks / ``Sink.seq`` / ``runFold``
(JoinMongoSpec.scala:62, PartitionedLogAkkaSpec.scala:52,
AkkaJoinCassandraSpec.scala:75).  Spark-first, a sink is
``df.write`` / ``df.writeStream`` — these helpers add the two layout
decisions that matter at 100 TB:

- **partitioning** (``partition_by``): directory-level pruning for
  every downstream scan that filters on the partition column;
- **bucketing** (``write_bucketed``): pre-shuffled layout so a later
  equi-join/agg on the bucket key is shuffle-free (sort-merge join
  reads co-located buckets directly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: Sequence[str] | None = None) -> None:
    """Batch sink: write ``df`` to ``path`` (reference S10 analog).

    ``partition_by`` produces hive-style ``col=value`` directories —
    the partition-pruning contract downstream scans rely on.  Parquet
    default: columnar + stats for min/max skipping.
    """
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


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
