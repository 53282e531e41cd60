"""Filter/projection pushdown in the pure-Python json_docs DataSource
(pydocsource.JsonDocsReader.pushFilters) — the analog of the reference
pushing find(qs.query) into the document store (storage.scala:597-602):
row skipping with SQL NULL semantics, sidecar-driven file skipping,
plan-level proof that pushed predicates leave no Spark-side Filter,
and the streaming watermark's loud-failure contract."""

from __future__ import annotations

import json
import os

import pytest


def _write_files(d, file_rows):
    os.makedirs(d, exist_ok=True)
    for fname, rows in file_rows.items():
        with open(os.path.join(d, fname), "w", encoding="utf-8") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")


@pytest.fixture()
def docs_dir(tmp_path):
    """4 files with DISJOINT doc_id ranges (10 docs each) so range
    predicates can prove whole files out via the stats sidecar."""
    from nosql_join_stream_spark.pydocsource import write_docs_stats

    d = str(tmp_path / "docs")
    rows = [dict(doc_id=i, source=f"src{i % 3}",
                 lang=("en" if i % 2 else "de"),
                 text=f"doc number {i}", n_chars=10 + i)
            for i in range(40)]
    _write_files(d, {f"{fi:04d}.jsonl": rows[fi * 10:(fi + 1) * 10]
                     for fi in range(4)})
    write_docs_stats(d)
    return d, rows


def _load(spark, d, **options):
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    r = spark.read.format("json_docs").option("path", d)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_pushed_filters_leave_no_spark_filter_node(spark, docs_dir):
    d, rows = docs_dir
    q = _load(spark, d).filter("doc_id >= 25 AND lang = 'en'")
    exp = {r["doc_id"] for r in rows
           if r["doc_id"] >= 25 and r["lang"] == "en"}
    assert {r.doc_id for r in q.collect()} == exp and exp
    # fully absorbed: the optimized plan is the bare relation — the
    # scan IS the query
    assert "Filter" not in _optimized_plan(q)


def test_unsupported_predicate_stays_spark_side(spark, docs_dir):
    d, rows = docs_dir
    # a % 2 = 0 is not a pushable Filter — Spark must keep a Filter
    # node and the combined answer must still be exact
    q = _load(spark, d).filter("doc_id >= 25 AND doc_id % 2 = 0")
    exp = {r["doc_id"] for r in rows
           if r["doc_id"] >= 25 and r["doc_id"] % 2 == 0}
    assert {r.doc_id for r in q.collect()} == exp and exp
    assert "Filter" in _optimized_plan(q)


def test_sidecar_prunes_files_and_answers_match(spark, docs_dir):
    d, rows = docs_dir
    q = _load(spark, d).filter("doc_id >= 25")
    # files 0000/0001 hold doc_id 0-19: stats prove them out, so the
    # scan plans 2 of 4 partitions
    assert q.rdd.getNumPartitions() == 2
    with_stats = sorted(r.doc_id for r in q.collect())
    os.remove(os.path.join(d, "_stats.json"))
    no_stats = _load(spark, d).filter("doc_id >= 25")
    assert no_stats.rdd.getNumPartitions() == 4  # nothing to prune by
    assert sorted(r.doc_id for r in no_stats.collect()) == with_stats
    assert with_stats == [i for i in range(25, 40)]


def test_in_and_string_predicates_push_correctly(spark, docs_dir):
    d, rows = docs_dir
    q = _load(spark, d).filter(
        "source IN ('src0', 'src2') AND text LIKE 'doc number 3%'")
    exp = {r["doc_id"] for r in rows
           if r["source"] in ("src0", "src2")
           and r["text"].startswith("doc number 3")}
    assert {r.doc_id for r in q.collect()} == exp and exp
    assert "Filter" not in _optimized_plan(q)
    q2 = _load(spark, d).filter("text LIKE '%number 31'")
    assert [r.doc_id for r in q2.collect()] == [31]
    q3 = _load(spark, d).filter("text LIKE '%umber 3%'")
    assert {r.doc_id for r in q3.collect()} == {
        r["doc_id"] for r in rows if "umber 3" in r["text"]}


def test_null_semantics_match_sql(spark, tmp_path):
    """A document MISSING a field is NULL there: comparisons are
    UNKNOWN (dropped), IS NULL keeps it, <> never resurrects it."""
    from nosql_join_stream_spark.pydocsource import write_docs_stats

    d = str(tmp_path / "nulls")
    _write_files(d, {"0000.jsonl": [
        dict(doc_id=1, lang="en", text="a"),
        dict(doc_id=2, text="b"),            # lang missing -> NULL
        dict(doc_id=3, lang="de", text="c"),
    ]})
    write_docs_stats(d)
    df = _load(spark, d)
    assert {r.doc_id for r in df.filter("lang = 'en'").collect()} == {1}
    assert {r.doc_id for r in df.filter("lang <> 'en'").collect()} == {3}
    assert {r.doc_id for r in df.filter("lang IS NULL").collect()} == {2}
    assert {r.doc_id for r in
            df.filter("lang IS NOT NULL").collect()} == {1, 3}
    assert {r.doc_id for r in
            df.filter("lang <=> 'de'").collect()} == {3}
    # and the same answers with Spark evaluating (no pushdown path):
    # parquet round-trip of the same rows as the independent oracle
    oracle = df.sparkSession.createDataFrame(
        [(1, None, "en", "a", None), (2, None, None, "b", None),
         (3, None, "de", "c", None)],
        "doc_id long, source string, lang string, text string, "
        "props string")
    assert ({r.doc_id for r in oracle.filter("lang <> 'en'").collect()}
            == {3})


def test_all_null_file_pruned_for_comparisons(spark, tmp_path):
    from nosql_join_stream_spark.pydocsource import write_docs_stats

    d = str(tmp_path / "allnull")
    _write_files(d, {
        "0000.jsonl": [dict(doc_id=1, text="x")],     # lang all-NULL
        "0001.jsonl": [dict(doc_id=2, lang="en", text="y")],
    })
    write_docs_stats(d)
    q = _load(spark, d).filter("lang = 'en'")
    assert q.rdd.getNumPartitions() == 1  # all-null file proven out
    assert [r.doc_id for r in q.collect()] == [2]
    qn = _load(spark, d).filter("lang IS NULL")
    assert [r.doc_id for r in qn.collect()] == [1]


def test_columns_projection_option(spark, docs_dir):
    d, rows = docs_dir
    df = _load(spark, d, columns="doc_id,lang")
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == 40
    # projection composes with pushdown
    q = df.filter("lang = 'de' AND doc_id < 10")
    assert sorted(r.doc_id for r in q.collect()) == [0, 2, 4, 6, 8]
    assert "Filter" not in _optimized_plan(q)
    with pytest.raises(Exception, match="unknown columns"):
        _load(spark, d, columns="doc_id,nope").count()


def test_stream_late_file_below_watermark_raises(tmp_path):
    """The streaming offset is a filename high-watermark: a file
    landing at-or-below it would be silently unread — the reader must
    fail loudly instead (ADVICE r6: multi-producer / unpadded-name
    hazard)."""
    from nosql_join_stream_spark.pydocsource import JsonDocsStreamReader

    d = str(tmp_path / "stream")
    _write_files(d, {"0005.jsonl": [dict(doc_id=5, text="x")]})
    rdr = JsonDocsStreamReader({"path": d})
    assert rdr.latestOffset() == {"last": "0005.jsonl"}
    # a later, higher name is fine
    _write_files(d, {"0007.jsonl": [dict(doc_id=7, text="y")]})
    assert rdr.latestOffset() == {"last": "0007.jsonl"}
    # a file below the watermark is data loss -> loud failure
    _write_files(d, {"0006.jsonl": [dict(doc_id=6, text="z")]})
    with pytest.raises(RuntimeError, match="below the committed "
                                           "watermark"):
        rdr.latestOffset()


def test_stream_columns_projection_matches_schema(spark, tmp_path):
    """r7-ADVICE: .option('columns', ...) narrowed the declared schema
    for streaming reads while the stream still emitted full 5-field
    tuples — arity mismatch.  The stream must project like the batch
    reader: schema and rows agree end-to-end."""
    from nosql_join_stream_spark.pydocsource import register_json_docs

    d = str(tmp_path / "stream")
    _write_files(d, {"0001.jsonl": [dict(doc_id=1, lang="en", text="a"),
                                    dict(doc_id=2, lang="de", text="b")]})
    register_json_docs(spark)
    stream = (spark.readStream.format("json_docs")
              .option("path", d).option("columns", "doc_id,lang").load())
    assert stream.columns == ["doc_id", "lang"]
    q = (stream.writeStream.format("memory")
         .queryName("pyds_cols_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(r.doc_id, r.lang)
           for r in spark.table("pyds_cols_stream").collect()}
    assert got == {(1, "en"), (2, "de")}


def test_stream_rejects_batch_cursor_options(tmp_path):
    """sort/skip/limit are bounded-cursor options; a stream must
    refuse them loudly instead of silently ignoring them."""
    from nosql_join_stream_spark.pydocsource import JsonDocsStreamReader

    d = str(tmp_path / "stream")
    _write_files(d, {"0001.jsonl": [dict(doc_id=1, text="x")]})
    for opt in ("sort", "skip", "limit"):
        with pytest.raises(ValueError, match="batch reads only"):
            JsonDocsStreamReader({"path": d, opt: "doc_id"})


def test_stream_state_dir_rearms_watermark_across_restart(tmp_path):
    """r7-ADVICE: the late-file guard lived only in driver memory, so
    a file landing at-or-below the committed offset while the query
    was DOWN was silently never read.  With .option('stateDir', ...)
    the committed watermark + seen set persist across restarts and the
    landed-while-down file raises exactly like a live late arrival."""
    from nosql_join_stream_spark.pydocsource import JsonDocsStreamReader

    d = str(tmp_path / "stream")
    state = str(tmp_path / "state")
    _write_files(d, {"0005.jsonl": [dict(doc_id=5, text="x")],
                     "0007.jsonl": [dict(doc_id=7, text="y")]})
    rdr = JsonDocsStreamReader({"path": d, "statedir": state})
    end = rdr.latestOffset()
    assert end == {"last": "0007.jsonl"}
    rdr.partitions({"last": ""}, end)
    rdr.commit(end)

    # while the query is down, a below-watermark file lands
    _write_files(d, {"0006.jsonl": [dict(doc_id=6, text="z")]})

    # restart WITHOUT state: indistinguishable -> silently absorbed
    fresh = JsonDocsStreamReader({"path": d})
    fresh.latestOffset()  # no raise: the documented weaker behavior

    # restart WITH state: the landed-while-down file fails loudly
    rdr2 = JsonDocsStreamReader({"path": d, "statedir": state})
    with pytest.raises(RuntimeError, match="below the committed"):
        rdr2.latestOffset()


def test_stream_checkpointed_restart_real_call_order(tmp_path):
    """r8 regression guard: on a checkpointed resume Spark calls
    ``partitions(committed_start, end)`` BEFORE ``latestOffset()`` on
    a FRESH reader instance.  Seeding the watermark from the committed
    start without also seeding the seen set made every committed file
    look like a late arrival and every restart without stateDir raise.
    Committed files must be absorbed; a file genuinely landing below
    the watermark AFTER the restart must still raise."""
    from nosql_join_stream_spark.pydocsource import JsonDocsStreamReader

    d = str(tmp_path / "stream")
    _write_files(d, {"0003.jsonl": [dict(doc_id=3, text="a")],
                     "0005.jsonl": [dict(doc_id=5, text="b")]})

    # fresh instance after a restart, no stateDir — Spark replays the
    # committed span first, then polls for new data
    rdr = JsonDocsStreamReader({"path": d})
    parts = rdr.partitions({"last": "0005.jsonl"}, {"last": "0005.jsonl"})
    assert parts == []  # nothing between committed offsets
    assert rdr.latestOffset() == {"last": "0005.jsonl"}  # must NOT raise

    # the guard stays armed for genuinely-late post-restart arrivals
    _write_files(d, {"0004.jsonl": [dict(doc_id=4, text="z")]})
    with pytest.raises(RuntimeError, match="below the committed"):
        rdr.latestOffset()


def _corrupt_dir(tmp_path):
    d = str(tmp_path / "corrupt")
    os.makedirs(d)
    with open(os.path.join(d, "0000.jsonl"), "w", encoding="utf-8") as fh:
        fh.write(json.dumps(dict(doc_id=1, lang="en", text="good")) + "\n")
        fh.write('{"doc_id": 2, "lang": "en", "text": "trunc...\n')
        fh.write("not json at all\n")
        fh.write(json.dumps(dict(doc_id=3, lang="de", text="fine")) + "\n")
    return d


def test_mode_failfast_default_raises_with_location(spark, tmp_path):
    """T4 error propagation stays the DEFAULT: a malformed line fails
    the read loudly, naming the file and line (unlike Spark's json
    reader, whose default is PERMISSIVE — a store surfaces a broken
    document as a query error, not a silent hole)."""
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    d = _corrupt_dir(tmp_path)
    df = spark.read.format("json_docs").option("path", d).load()
    with pytest.raises(Exception, match="line 2"):
        df.collect()


def test_mode_dropmalformed_skips(spark, tmp_path):
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    d = _corrupt_dir(tmp_path)
    rows = (spark.read.format("json_docs").option("path", d)
            .option("mode", "DROPMALFORMED").load().collect())
    assert sorted(r.doc_id for r in rows) == [1, 3]


def test_mode_permissive_routes_corrupt_record(spark, tmp_path):
    """Corrupt lines yield all-NULL typed columns with the raw line
    under _corrupt_record in props; pushed filters three-value them
    away exactly like Spark drops corrupt rows failing a data-column
    filter; sort keys land them in the null group."""
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    d = _corrupt_dir(tmp_path)
    rows = (spark.read.format("json_docs").option("path", d)
            .option("mode", "PERMISSIVE").load().collect())
    assert len(rows) == 4
    corrupt = [r for r in rows if r.doc_id is None]
    assert len(corrupt) == 2
    raws = {json.loads(r.props)["_corrupt_record"] for r in corrupt}
    assert raws == {'{"doc_id": 2, "lang": "en", "text": "trunc...',
                    "not json at all"}
    # a pushed filter on a typed column drops corrupt rows (3-valued)
    filtered = (spark.read.format("json_docs").option("path", d)
                .option("mode", "PERMISSIVE").load()
                .filter("lang = 'en'").collect())
    assert sorted(r.doc_id for r in filtered) == [1]


def test_mode_option_in_stream_and_unknown_mode_raises(spark, tmp_path):
    from nosql_join_stream_spark.pydocsource import (JsonDocsStreamReader,
                                                     register_json_docs)
    register_json_docs(spark)
    d = _corrupt_dir(tmp_path)
    # stream twin honors the same policy through its shared cursor
    rdr = JsonDocsStreamReader({"path": d, "mode": "DROPMALFORMED"})
    end = rdr.latestOffset()
    parts = rdr.partitions({"last": ""}, dict(end))
    got = {row[0] for p in parts for row in rdr.read(p)}
    assert got == {1, 3}
    with pytest.raises(ValueError, match="unknown mode"):
        JsonDocsStreamReader({"path": d, "mode": "LENIENT"})


def test_stats_builder_tolerates_corrupt_lines(tmp_path):
    """write_docs_stats must not raise on a corrupt line, and must set
    has_null conservatively (a PERMISSIVE reader yields NULL typed
    columns for it, so IS NULL probes may not skip the file)."""
    from nosql_join_stream_spark.pydocsource import write_docs_stats

    d = _corrupt_dir(tmp_path)
    stats = write_docs_stats(d)
    e = stats["0000.jsonl"]
    assert e["n"] == 4
    assert e["doc_id"]["has_null"] and e["lang"]["has_null"]
    assert e["doc_id"]["min"] == 1 and e["doc_id"]["max"] == 3
