"""Pure-Python custom DataSource — the connector seam WITHOUT jars.

The reference's sources are live Mongo/Cassandra connectors
(storage.scala:593-658); this container ships no connector jars, so
that seam runs only against embedded Derby (JDBC) today.  Spark 4's
Python DataSource API closes the remaining distance: a document-store
reader written in pure Python that the SAME ``Engine.load`` →
``DataFrameReader.format(...)`` path executes end-to-end in-container
— partition planning, schema declaration, per-partition cursor scan,
exactly the structural shape a Mongo connector has, minus the wire
protocol.

``JsonDocsDataSource`` reads a directory of JSON-lines files as a
document collection:

- **partition planning**: one input partition per ``.jsonl`` file
  (the analog of one partition per Mongo chunk / Cassandra token
  range) — Spark schedules each to an executor, so parallelism comes
  from layout, not the driver;
- **schemaless documents**: the declared schema carries typed top
  columns plus a ``props`` JSON-string column for the untyped rest —
  the same contract as the parquet stand-in (decode downstream via
  ``typed.variant_decode``);
- **missing fields → typed NULLs** (the Option-decode contract,
  mongotypes/package.scala:73-205): a document lacking a declared
  field yields NULL, never an error.

Registration is per-session (``register_json_docs(spark)``), then
``spark.read.format("json_docs").option("path", dir)`` or
``Engine.load(fmt="json_docs", path=dir)`` reads it like any source.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    InputPartition)

FORMAT_NAME = "json_docs"

_SCHEMA = ("doc_id long, source string, lang string, text string, "
           "props string")
_TOP = ["doc_id", "source", "lang", "text"]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class JsonDocsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs requires .option('path', <dir or file>)")

    def partitions(self):
        # one partition per file — the chunk/token-range analog; a
        # directory of N files scans N-wide
        if os.path.isfile(self.path):
            return [_FilePartition(self.path)]
        files = sorted(
            os.path.join(self.path, f) for f in os.listdir(self.path)
            if f.endswith(".jsonl"))
        if not files:
            raise ValueError(f"no .jsonl files under {self.path}")
        return [_FilePartition(f) for f in files]

    def read(self, partition):
        # per-partition cursor scan, executed ON THE EXECUTOR — the
        # driver never touches document bytes
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                doc = json.loads(line)
                rest = {k: v for k, v in doc.items() if k not in _TOP}
                did = doc.get("doc_id")
                yield (int(did) if did is not None else None,
                       doc.get("source"), doc.get("lang"),
                       doc.get("text"),
                       json.dumps(rest, sort_keys=True) if rest else None)


def _read_jsonl(path: str):
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            doc = json.loads(line)
            rest = {k: v for k, v in doc.items() if k not in _TOP}
            did = doc.get("doc_id")
            yield (int(did) if did is not None else None,
                   doc.get("source"), doc.get("lang"), doc.get("text"),
                   json.dumps(rest, sort_keys=True) if rest else None)


class JsonDocsStreamReader(DataSourceStreamReader):
    """Unbounded twin — the reference's async paged log scan (S8) as
    a pure-Python streaming source, EXECUTOR-SIDE: the offset is a
    FILENAME HIGH-WATERMARK over the lexicographically-sorted
    directory listing (the resumable-cursor analog of the reference's
    sequence-number offsets).  The driver only LISTS filenames
    (``latestOffset``) and plans one :class:`InputPartition` per new
    file between committed offsets; document bytes are read on
    executors by ``read``, so a micro-batch of N files scans N-wide
    and the driver's memory never sees a row — the
    partition-per-chunk shape a Mongo/Kafka connector has.  Replay
    after a crash re-plans the same committed span over the same
    (immutable) files — exactly-once with a deterministic
    directory."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs requires .option('path', <dir>)")

    def initialOffset(self):
        return {"last": ""}

    def latestOffset(self):
        files = sorted(f for f in os.listdir(self.path)
                       if f.endswith(".jsonl"))
        return {"last": files[-1]} if files else {"last": ""}

    def partitions(self, start, end):
        files = sorted(
            f for f in os.listdir(self.path)
            if f.endswith(".jsonl")
            and f > start["last"] and f <= end["last"])
        # an empty batch still needs a plan: zero partitions is legal
        return [_FilePartition(os.path.join(self.path, f))
                for f in files]

    def read(self, partition):
        return _read_jsonl(partition.path)

    def commit(self, end):
        pass  # offsets are filenames; nothing to release


class JsonDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return JsonDocsReader(self.options)

    def streamReader(self, schema):
        return JsonDocsStreamReader(self.options)


def register_json_docs(spark) -> None:
    """Register the source with this session (idempotent)."""
    spark.dataSource.register(JsonDocsDataSource)
