"""Write path of the pure-Python json_docs DataSource — the connector
seam's SINK half (the reference's sinks are live-store inserts,
storage.scala:661-699; here: staged tmp files + driver rename-commit).
Covers: batch round-trip fidelity (typed tops + schemaless props,
NULL = absent field), overwrite/append commit semantics, the stats
sidecar maintained transactionally (file skipping works on freshly
written collections with no extra pass), append names staying above
the streaming watermark, the streaming sink producing a valid stream
SOURCE directory, and loud schema validation."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture()
def registered(spark):
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    return spark


def _docs_df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string, "
              "props string")


_ROWS = [
    (1, "web", "en", "hello world", json.dumps({"n_chars": 11})),
    (2, "web", None, "guten tag", json.dumps({"n_chars": 9, "x": "y"})),
    (3, "book", "en", None, None),
]


def test_batch_write_round_trip(registered, tmp_path):
    spark = registered
    d = str(tmp_path / "out")
    _docs_df(spark, _ROWS).write.format("json_docs") \
        .option("path", d).mode("overwrite").save()
    back = (spark.read.format("json_docs").option("path", d).load()
            .collect())
    canon = lambda p: (json.dumps(json.loads(p), sort_keys=True)
                       if p else None)
    got = {(r.doc_id, r.source, r.lang, r.text, canon(r.props))
           for r in back}
    assert got == {
        (1, "web", "en", "hello world", canon('{"n_chars": 11}')),
        (2, "web", None, "guten tag", canon('{"n_chars": 9, "x": "y"}')),
        (3, "book", "en", None, None),
    }
    # no tmp leftovers; stats sidecar written in the same commit
    names = os.listdir(d)
    assert not [f for f in names if "inprogress" in f]
    assert "_stats.json" in names
    stats = json.load(open(os.path.join(d, "_stats.json")))["files"]
    assert sum(s["n"] for s in stats.values()) == 3
    assert set(stats) == {f for f in names if f.endswith(".jsonl")}


def test_overwrite_replaces_append_adds(registered, tmp_path):
    spark = registered
    d = str(tmp_path / "out")
    df1 = _docs_df(spark, _ROWS)
    df1.write.format("json_docs").option("path", d) \
       .mode("overwrite").save()
    df1.write.format("json_docs").option("path", d) \
       .mode("overwrite").save()
    rd = spark.read.format("json_docs").option("path", d)
    assert rd.load().count() == 3  # overwrite did not stack
    extra = _docs_df(spark, [(9, "web", "en", "more", None)])
    extra.write.format("json_docs").option("path", d) \
         .mode("append").save()
    assert rd.load().count() == 4
    # appended names sort strictly ABOVE every pre-existing name (the
    # streaming source's increasing-filenames contract)
    files = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
    got = {r.doc_id for r in spark.read.format("json_docs")
           .option("path", os.path.join(d, files[-1])).load().collect()}
    assert got == {9}


def test_written_sidecar_prunes_files(registered, tmp_path):
    """The stats written at commit must drive file skipping with no
    extra write_docs_stats pass: disjoint doc_id ranges per partition
    → a point predicate plans one file."""
    spark = registered
    d = str(tmp_path / "out")
    rows = [(i, "s", "en", f"t{i}", None) for i in range(40)]
    (_docs_df(spark, rows).repartitionByRange(4, "doc_id")
     .write.format("json_docs").option("path", d)
     .mode("overwrite").save())
    from nosql_join_stream_spark.pydocsource import JsonDocsReader
    rdr = JsonDocsReader({"path": d})
    from pyspark.sql.datasource import EqualTo
    leftover = list(rdr.pushFilters([EqualTo(("doc_id",), 7)]))
    assert leftover == []
    assert len(rdr.partitions()) == 1
    q = (spark.read.format("json_docs").option("path", d).load()
         .filter("doc_id = 7"))
    assert [r.doc_id for r in q.collect()] == [7]


def test_stream_sink_round_trip(registered, tmp_path):
    """readStream json_docs → writeStream json_docs: the sink's
    directory is itself a valid collection (batch-readable) AND its
    names encode the batch id monotonically."""
    spark = registered
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    with open(os.path.join(src, "0001.jsonl"), "w") as fh:
        for r in [dict(doc_id=1, source="s", text="a"),
                  dict(doc_id=2, source="s", text="b")]:
            fh.write(json.dumps(r) + "\n")
    stream = (spark.readStream.format("json_docs")
              .option("path", src).load())
    q = (stream.writeStream.format("json_docs")
         .option("path", dst).option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    back = spark.read.format("json_docs").option("path", dst).load()
    assert {(r.doc_id, r.text) for r in back.collect()} \
        == {(1, "a"), (2, "b")}
    files = [f for f in os.listdir(dst) if f.endswith(".jsonl")]
    assert files and all(f.startswith("b") for f in files)
    # second drain with the same checkpoint: no new data, no new files
    q2 = (spark.readStream.format("json_docs").option("path", src)
          .load().writeStream.format("json_docs")
          .option("path", dst).option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    assert back.count() == 2


def test_writer_rejects_unknown_columns(registered, tmp_path):
    spark = registered
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_chars long")
    with pytest.raises(Exception, match="unknown columns"):
        df.write.format("json_docs") \
          .option("path", str(tmp_path / "o")).mode("overwrite").save()


def test_writer_requires_path(registered, tmp_path):
    spark = registered
    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(Exception, match="path"):
        df.write.format("json_docs").mode("overwrite").save()


def test_gzip_write_round_trip_and_pruning(registered, tmp_path):
    """compression=gzip publishes .jsonl.gz members through the same
    staged-commit path; readers need no option (the cursor dispatches
    on each file's suffix), and the sidecar written at commit prunes
    gz members exactly like plain ones."""
    spark = registered
    d = str(tmp_path / "gz")
    (_docs_df(spark, _ROWS).repartition(2)
     .write.format("json_docs").option("path", d)
     .option("compression", "gzip").mode("overwrite").save())
    names = sorted(f for f in os.listdir(d) if f != "_stats.json")
    assert names and all(f.endswith(".jsonl.gz") for f in names)
    with open(os.path.join(d, names[0]), "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"  # really gzip bytes
    back = (spark.read.format("json_docs").option("path", d).load()
            .collect())
    assert sorted(r.doc_id for r in back) == [1, 2, 3]
    # file skipping works on the freshly written gz collection
    sel = (spark.read.format("json_docs").option("path", d).load()
           .filter("doc_id >= 10"))
    assert sel.count() == 0 and sel.rdd.getNumPartitions() <= 1


def test_mixed_plain_and_gzip_members_one_collection(
        registered, tmp_path):
    """Plain and gz members mix freely: ordering and stream offsets go
    by FULL filename, and a live tailer picks up an appended gz batch
    as an ordinary new arrival."""
    import json as _json

    spark = registered
    d = tmp_path / "mix"
    d.mkdir()
    (d / "0001.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "plain"}) + "\n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def drain():
        q = (spark.readStream.format("json_docs")
             .option("path", str(d)).load()
             .writeStream.format("parquet").option("path", out)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    import gzip as _gzip
    with _gzip.open(d / "0002.jsonl.gz", "wt", encoding="utf-8") as fh:
        fh.write(_json.dumps({"doc_id": 2, "text": "zipped"}) + "\n")
    drain()
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {1, 2} and len(rows) == 2
    # batch read sees both members too
    got = (spark.read.format("json_docs").option("path", str(d)).load()
           .collect())
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_compaction_preserves_gzip_target(registered, tmp_path):
    """A group whose MAX name is gzipped stages gzipped bytes (the
    staged tmp becomes the target verbatim via os.replace), so the
    compacted member stays a valid .jsonl.gz."""
    import gzip as _gzip
    import json as _json

    from nosql_join_stream_spark.pydocsource import compact_json_docs

    spark = registered
    d = tmp_path / "gzc"
    d.mkdir()
    (d / "0001.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "a"}) + "\n")
    with _gzip.open(d / "0002.jsonl.gz", "wt", encoding="utf-8") as fh:
        fh.write(_json.dumps({"doc_id": 2, "text": "b"}) + "\n")
    res = compact_json_docs(str(d))
    assert res["targets"] == ["0002.jsonl.gz"]
    with open(d / "0002.jsonl.gz", "rb") as fh:
        assert fh.read(2) == b"\x1f\x8b"
    got = (spark.read.format("json_docs").option("path", str(d)).load()
           .collect())
    assert sorted(r.doc_id for r in got) == [1, 2]


def test_unknown_compression_raises(registered, tmp_path):
    with pytest.raises(Exception, match="unsupported compression"):
        (_docs_df(registered, _ROWS).write.format("json_docs")
         .option("path", str(tmp_path / "x"))
         .option("compression", "zstd").mode("overwrite").save())


def test_stream_sink_gzip_members(registered, tmp_path):
    """The streaming sink honors compression=gzip too: per-batch
    staged gzipped bytes published under batch-id-monotone .jsonl.gz
    names — the relay directory stays a valid (mixed-member) stream
    source."""
    spark = registered
    src = str(tmp_path / "src")
    _docs_df(spark, _ROWS).write.format("json_docs") \
        .option("path", src).mode("overwrite").save()
    relay = str(tmp_path / "relay")
    q = (spark.readStream.format("json_docs").option("path", src).load()
         .writeStream.format("json_docs").option("path", relay)
         .option("compression", "gzip")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    names = [f for f in os.listdir(relay) if f != "_stats.json"]
    assert names and all(f.endswith(".jsonl.gz") for f in names)
    back = (spark.read.format("json_docs").option("path", relay).load()
            .collect())
    assert sorted(r.doc_id for r in back) == [1, 2, 3]
