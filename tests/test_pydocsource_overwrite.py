"""Crash-atomic ``mode('overwrite')`` for the json_docs writer (r10).

Before r10 the overwrite commit was a bare delete-old + rename-new
sequence — a crash inside the window left a mixed directory (the
documented directory-as-table caveat).  Now the driver publishes an
intent manifest AFTER all task files are staged, and that atomic
rename is the commit point:

  * BEFORE the manifest lands, readers see the OLD collection intact
    (staged tmps are invisible);
  * AFTER it, readers resolve the manifest — doomed names skipped,
    still-staged finals read through their tmp paths (compression
    magic-sniffed), manifest-carried stats override the on-disk
    sidecar (which may describe doomed files under REUSED names);
  * recovery (_recover_overwrite) rolls the physical work forward
    from ANY crash point, idempotently; every writer/compactor/stat
    pass settles a pending manifest before mutating.

The property test drives a randomized crash point (arbitrary subsets
of deletes and renames already performed) and asserts the reader's
view is exactly the new rows at every point, and that recovery
converges to the clean final state.
"""
from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from nosql_join_stream_spark.pydocsource import (JsonDocsReader,
                                                 JsonDocsWriter,
                                                 _OVERWRITE_MANIFEST,
                                                 _recover_overwrite)

_SCHEMA = StructType([StructField("doc_id", LongType()),
                      StructField("text", StringType())])


def _read_all(path: str) -> set[tuple]:
    rdr = JsonDocsReader({"path": path})
    out = set()
    for p in rdr.partitions():
        for row in rdr.read(p):
            out.add((row[0], row[3]))  # doc_id, text of _ALL_COLS
    return out


def _stage_overwrite(path: str, rows_by_task: list[list[tuple]],
                     gz: bool = False):
    """Stage an overwrite exactly as Spark would: tasks write, then
    build the manifest the driver's commit would publish — but leave
    the roll-forward to the caller (simulating crash points)."""
    opts = {"path": path}
    if gz:
        opts["compression"] = "gzip"
    w = JsonDocsWriter(opts, _SCHEMA, overwrite=True)
    msgs = [w.write(iter(shard)) for shard in rows_by_task]
    live = [m for m in msgs if m.tmp_name is not None]
    ext = ".jsonl.gz" if gz else ".jsonl"
    existing = sorted(f for f in os.listdir(path)
                      if f.endswith(".jsonl") or f.endswith(".jsonl.gz"))
    publish = {m.tmp_name: f"{i:08d}{ext}" for i, m in enumerate(live)}
    man = {"delete": existing, "publish": publish,
           "stats": {publish[m.tmp_name]: m.stats for m in live},
           "bytes": {publish[m.tmp_name]: os.path.getsize(
               os.path.join(path, m.tmp_name)) for m in live}}
    return w, msgs, man


def _publish_manifest(path: str, man: dict) -> None:
    mp = os.path.join(path, _OVERWRITE_MANIFEST)
    with open(mp + ".tmp", "w", encoding="utf-8") as fh:
        json.dump(man, fh, sort_keys=True)
    os.replace(mp + ".tmp", mp)


def _seed_old(path: str, n: int = 3) -> set[tuple]:
    os.makedirs(path, exist_ok=True)
    old = set()
    for i in range(n):
        with open(os.path.join(path, f"{i:08d}.jsonl"), "w") as fh:
            fh.write(json.dumps({"doc_id": 100 + i, "text": "old"})
                     + "\n")
        old.add((100 + i, "old"))
    # a sidecar describing the OLD files — the reused-final-names trap
    stats = {f"{i:08d}.jsonl":
             {"n": 1, "doc_id": {"min": 100 + i, "max": 100 + i,
                                 "has_null": False},
              "source": {"min": None, "max": None, "has_null": True},
              "lang": {"min": None, "max": None, "has_null": True}}
             for i in range(n)}
    with open(os.path.join(path, "_stats.json"), "w") as fh:
        json.dump({"files": stats}, fh)
    return old


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data(), gz=st.booleans())
def test_overwrite_reader_view_atomic_at_every_crash_point(
        tmp_path_factory, data, gz):
    d = str(tmp_path_factory.mktemp("ow") / "docs")
    old = _seed_old(d)
    new_rows = [[(i * 10 + j, f"new{i}{j}") for j in range(2)]
                for i in range(data.draw(st.integers(1, 3),
                                         label="n_tasks"))]
    new = {(r[0], f"new{r[0] // 10}{r[0] % 10}")
           for shard in new_rows for r in shard}
    w, msgs, man = _stage_overwrite(d, new_rows, gz)

    # staged but NOT committed: readers still see the old collection
    assert _read_all(d) == old

    _publish_manifest(d, man)
    # committed, zero physical progress: readers see the NEW rows
    assert _read_all(d) == new

    # crash mid-roll: an arbitrary subset of deletes and renames done
    dels = data.draw(st.sets(st.sampled_from(man["delete"])),
                     label="deletes_done") if man["delete"] else set()
    for f in dels:
        os.remove(os.path.join(d, f))
    pairs = sorted(man["publish"].items())
    k = data.draw(st.integers(0, len(pairs)), label="renames_done")
    for tmp, final in pairs[:k]:
        os.replace(os.path.join(d, tmp), os.path.join(d, final))
    assert _read_all(d) == new, "mid-roll reader view broke"

    # recovery from this exact crash point converges
    _recover_overwrite(d)
    assert not os.path.exists(os.path.join(d, _OVERWRITE_MANIFEST))
    assert _read_all(d) == new
    names = sorted(f for f in os.listdir(d)
                   if f.endswith(".jsonl") or f.endswith(".jsonl.gz"))
    assert names == sorted(man["publish"].values())
    sidecar = json.load(open(os.path.join(d, "_stats.json")))["files"]
    assert set(sidecar) == set(names), "sidecar != final collection"
    assert sum(s["n"] for s in sidecar.values()) == len(new)
    # no staged leftovers
    assert not [f for f in os.listdir(d) if f.endswith(".inprogress")]


def test_full_commit_path_and_filter_pruning_during_window(spark,
                                                           tmp_path):
    """End-to-end through Spark: overwrite commits atomically, and —
    the reused-names trap — a reader planning DURING the window with
    a pushed filter must prune against the manifest's stats, not the
    stale sidecar describing the doomed files under the same names."""
    from pyspark.sql.datasource import EqualTo

    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    d = str(tmp_path / "docs")
    _seed_old(d)

    df = spark.createDataFrame(
        [(7, "s", "en", "seven", None), (8, "s", "en", "eight", None)],
        "doc_id long, source string, lang string, text string, "
        "props string")
    df.write.format("json_docs").option("path", d) \
        .mode("overwrite").save()
    back = spark.read.format("json_docs").option("path", d).load()
    assert {(r.doc_id, r.text) for r in back.collect()} \
        == {(7, "seven"), (8, "eight")}

    # now rebuild the mid-window state by hand and plan a filtered read
    w, msgs, man = _stage_overwrite(
        d, [[(21, "a")], [(22, "b")]])
    _publish_manifest(d, man)
    rdr = JsonDocsReader({"path": d})
    leftover = list(rdr.pushFilters([EqualTo(("doc_id",), 21)]))
    assert leftover == []
    parts = rdr.partitions()
    assert len(parts) == 1, "manifest stats must prune to one file"
    got = [row[0] for row in rdr.read(parts[0])]
    assert got == [21]
    _recover_overwrite(d)


def test_append_and_compact_settle_pending_overwrite(spark, tmp_path):
    """A crashed overwrite is settled by the NEXT writer or compactor
    before it mutates — append names must stack above the overwrite's
    finals, and compaction must never merge doomed originals."""
    from nosql_join_stream_spark.pydocsource import (compact_json_docs,
                                                     register_json_docs)
    register_json_docs(spark)
    d = str(tmp_path / "docs")
    _seed_old(d)
    w, msgs, man = _stage_overwrite(d, [[(31, "x")], [(32, "y")]])
    _publish_manifest(d, man)

    # compactor settles, then merges only the new collection
    res = compact_json_docs(d)
    assert not os.path.exists(os.path.join(d, _OVERWRITE_MANIFEST))
    assert _read_all(d) == {(31, "x"), (32, "y")}

    # a fresh crashed overwrite, then an APPEND — the append settles
    # it and lands above the finals
    w2, msgs2, man2 = _stage_overwrite(d, [[(41, "p")]])
    _publish_manifest(d, man2)
    extra = spark.createDataFrame([(50, None, None, "z", None)],
                                  "doc_id long, source string, "
                                  "lang string, text string, "
                                  "props string")
    extra.write.format("json_docs").option("path", d) \
        .mode("append").save()
    assert _read_all(d) == {(41, "p"), (50, "z")}
    names = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
    assert names[-1].startswith("00000000_"), names


def test_gzip_staged_final_reads_through_sniffing(tmp_path):
    """A gz overwrite's staged tmp has no .gz suffix — the reader
    must gunzip it by magic bytes when planning mid-window."""
    d = str(tmp_path / "docs")
    _seed_old(d)
    w, msgs, man = _stage_overwrite(d, [[(61, "gzrow")]], gz=True)
    _publish_manifest(d, man)
    assert _read_all(d) == {(61, "gzrow")}
    _recover_overwrite(d)
    assert _read_all(d) == {(61, "gzrow")}
    assert sorted(os.listdir(d))[0] == "00000000.jsonl.gz"


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data())
def test_reader_options_equivalent_during_window(tmp_path_factory,
                                                 data):
    """The full reader OPTION surface (sort/skip/limit/columns) over a
    mid-roll overwrite must answer exactly like the settled directory
    — in particular the limit-based file pruning, which consults the
    manifest's stats instead of the stale sidecar."""
    d = str(tmp_path_factory.mktemp("owopt") / "docs")
    _seed_old(d, n=2)
    shards, nid = [], 0
    for _ in range(data.draw(st.integers(1, 3), label="tasks")):
        n = data.draw(st.integers(1, 4), label="rows")
        shards.append([(nid + i, f"t{nid + i}") for i in range(n)])
        nid += n
    w, msgs, man = _stage_overwrite(d, shards)
    _publish_manifest(d, man)

    opts = {"path": d}
    if data.draw(st.booleans(), label="sorted"):
        opts["sort"] = data.draw(st.sampled_from(
            ["doc_id asc", "doc_id desc", "text asc"]), label="sort")
        if data.draw(st.booleans(), label="limited"):
            opts["limit"] = str(data.draw(st.integers(1, 6),
                                          label="limit"))
            opts["skip"] = str(data.draw(st.integers(0, 2),
                                         label="skip"))
    if data.draw(st.booleans(), label="projected"):
        opts["columns"] = "doc_id,text"

    def run(path_opts):
        rdr = JsonDocsReader(dict(path_opts))
        rows = []
        for p in rdr.partitions():
            rows.extend(tuple(r) for r in rdr.read(p))
        return rows

    during = run(opts)
    _recover_overwrite(d)
    settled = run(opts)
    # the mid-roll view and the settled directory share the same
    # logical files, the same stats (manifest stats == final sidecar)
    # and the same bytes (rename never rewrites) — so EVERY option
    # combination, including pushed sort/skip/limit with its
    # stats-driven file pruning, must answer identically
    assert sorted(during) == sorted(settled)
    if "limit" in opts:
        # and the emitted superset really contains the global top-k
        k = int(opts["skip"]) + int(opts["limit"])
        col = opts["sort"].split()[0]
        idx = 0 if col == "doc_id" else (1 if "columns" in opts else 3)
        full = run({"path": d} | (
            {"columns": opts["columns"]} if "columns" in opts else {}))
        full.sort(key=lambda t: t[0])                  # doc_id tiebreak
        full.sort(key=lambda t: t[idx],
                  reverse=opts["sort"].endswith("desc"))
        assert set(full[:k]) <= set(during)


def test_live_tailer_fails_loudly_on_overwrite(tmp_path):
    """mode('overwrite') under a live tailer is undefined — reused
    names below the watermark would be silently absorbed by the seen
    set. Both the next poll and a checkpointed replay must raise
    while the manifest is present (mid-commit or crashed)."""
    from nosql_join_stream_spark.pydocsource import JsonDocsStreamReader

    d = str(tmp_path / "docs")
    _seed_old(d)
    rdr = JsonDocsStreamReader({"path": d})
    end = rdr.latestOffset()
    rdr.partitions({"last": ""}, dict(end))
    rdr.commit(dict(end))

    w, msgs, man = _stage_overwrite(d, [[(91, "fresh")]])
    _publish_manifest(d, man)
    with pytest.raises(RuntimeError, match="overwrite manifest"):
        rdr.latestOffset()
    rdr2 = JsonDocsStreamReader({"path": d})
    with pytest.raises(RuntimeError, match="overwrite manifest"):
        rdr2.partitions({"last": ""}, dict(end))
    # settling the manifest does NOT un-poison the tailer's state —
    # it demonstrates WHY the guard must be loud: the overwrite reuses
    # consumed names below the watermark, so without the guard the
    # fresh rows would be silently ABSORBED by the seen set (the
    # deleted-then-recreated ghost rule) and never delivered
    _recover_overwrite(d)
    end2 = rdr.latestOffset()
    parts = rdr.partitions(dict(end), dict(end2))
    delivered = [row[0] for p in parts for row in rdr.read(p)]
    assert delivered == [], (
        "fresh overwrite rows leaked through stale tailer state")


def test_stream_sink_failed_batch_replay_through_real_spark(
        spark, tmp_path):
    """End-to-end through REAL Spark driver-restart replay (the model
    fuzz's other schedule, on actual machinery): the first run's sink
    task fails (file-flag injected inside write(), and local mode has
    no task retries, so the BATCH fails and Spark aborts the epoch —
    staged tmps removed, nothing published), then a second run on the
    same checkpoint replays the batch id and commits — rows exactly
    once, batch-id-monotone names, sidecar exact."""
    import json as _json
    import os as _os

    from pyspark.sql.datasource import (DataSource,
                                        DataSourceStreamWriter,
                                        WriterCommitMessage)

    from nosql_join_stream_spark.pydocsource import (JsonDocsStreamWriter,
                                                     register_json_docs)
    register_json_docs(spark)
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    ckpt = str(tmp_path / "ckpt")
    flag = str(tmp_path / "failed_once")
    _os.makedirs(src)
    _os.makedirs(dst)
    with open(_os.path.join(src, "0001.jsonl"), "w") as fh:
        for i in range(6):
            fh.write(_json.dumps({"doc_id": i, "text": f"r{i}"}) + "\n")

    class FlakyWriter(JsonDocsStreamWriter):
        def write(self, iterator):
            rows = list(iterator)
            if rows and int(rows[0][0]) == 0 \
                    and not _os.path.exists(flag):
                open(flag, "w").close()
                raise RuntimeError("injected first-attempt failure")
            return super().write(iter(rows))

    class FlakyJsonDocs(DataSource):
        @classmethod
        def name(cls):
            return "flaky_json_docs"

        def schema(self):
            return ("doc_id long, source string, lang string, "
                    "text string, props string")

        def streamWriter(self, schema, overwrite):
            return FlakyWriter({"path": dst}, schema, overwrite)

    spark.dataSource.register(FlakyJsonDocs)

    def run():
        return (spark.readStream.format("json_docs")
                .option("path", src).load().repartition(2, "doc_id")
                .writeStream.format("flaky_json_docs")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start())

    # run 1: the injected task failure aborts the batch (no retries
    # in local mode) — the epoch's staged tmps are aborted, nothing
    # publishes
    q = run()
    with pytest.raises(Exception, match="injected first-attempt"):
        q.awaitTermination(120)
    assert _os.path.exists(flag), "injection never fired"
    assert not [f for f in _os.listdir(dst) if f.endswith(".jsonl")], \
        "a failed batch published files"

    # run 2: same checkpoint replays the batch id; flag exists so the
    # write succeeds and the replay commits exactly once
    q2 = run()
    q2.awaitTermination(120)
    back = spark.read.format("json_docs").option("path", dst).load()
    got = sorted(r.doc_id for r in back.collect())
    assert got == [0, 1, 2, 3, 4, 5], "task retry lost or doubled rows"
    names = sorted(f for f in _os.listdir(dst) if f.endswith(".jsonl"))
    assert all(n.startswith("b") for n in names)
    # the failed attempt's orphan tmp may remain; it must be inert
    from nosql_join_stream_spark.pydocsource import _is_doc_file
    for f in _os.listdir(dst):
        if f.endswith(".inprogress"):
            assert not _is_doc_file(f)
    stats = _json.load(open(_os.path.join(dst, "_stats.json")))["files"]
    assert set(stats) == set(names)


def test_recovery_raises_on_external_tampering(tmp_path):
    """Both the staged tmp and its final missing = someone deleted
    committed data externally; recovery must fail LOUDLY, never
    silently shrink the overwrite."""
    d = str(tmp_path / "docs")
    _seed_old(d)
    w, msgs, man = _stage_overwrite(d, [[(71, "q")]])
    _publish_manifest(d, man)
    os.remove(os.path.join(d, list(man["publish"])[0]))
    with pytest.raises(RuntimeError, match="external interference"):
        _recover_overwrite(d)


def test_partition_falls_back_when_tmp_rolled_forward(tmp_path):
    """A partition planned against a staged overwrite tmp may lose a
    rename race (roll-forward) between planning and the task's open —
    the task must read the SAME bytes under the fallback final name,
    not crash the query (r10 review catch).  Drives the PRODUCTION
    JsonDocsReader.read() fallback branch, not a reimplementation."""
    from nosql_join_stream_spark.pydocsource import (_FilePartition,
                                                     JsonDocsReader)
    p = tmp_path / "c"
    p.mkdir()
    final = p / "part-0.jsonl"
    tmp = p / "part-0.jsonl.__ow_tmp"
    tmp.write_text('{"doc_id": 1, "text": "x", "lang": "en", '
                   '"source": "s", "n_chars": 1}\n')
    reader = JsonDocsReader({"path": str(p)})
    part = _FilePartition(str(tmp), fallback=str(final))
    os.replace(tmp, final)  # the roll-forward wins the race
    rows = list(reader.read(part))
    assert len(rows) == 1 and rows[0][0] == 1  # doc_id survives
    # without a fallback the same race is a real error, not a silent
    # empty read
    with pytest.raises(FileNotFoundError):
        list(reader.read(_FilePartition(str(tmp))))
