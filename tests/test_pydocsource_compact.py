"""Small-file compaction for the json_docs document collection
(pydocsource.compact_json_docs) — the connector-side analog of
``sinks.compact`` (a document store compacts its chunks server-side;
a rolled log's consumer does it here).  Covers: merge-into-max-name
with row fidelity and sidecar folding, the ``upto`` fence, crash
recovery BOTH ways around the ``os.replace`` commit point (rollback
when the staged tmp survives, roll-forward when it doesn't — readers
skip the doomed originals in the meantime, so the crash window never
double-reads), a checkpointed stream tailing across a compaction of
its committed prefix, and overwrite settling a stale manifest before
reusing names."""

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


def _rows(lo, hi):
    return [dict(doc_id=i, source=f"src{i % 3}",
                 lang=("en" if i % 2 else "de"),
                 text=f"doc number {i}") for i in range(lo, hi)]


@pytest.fixture()
def docs_dir(tmp_path):
    """4 files, 10 docs each, disjoint doc_id ranges, sidecar built."""
    from nosql_join_stream_spark.pydocsource import write_docs_stats

    d = str(tmp_path / "docs")
    _write_files(d, {f"{fi:04d}.jsonl": _rows(fi * 10, (fi + 1) * 10)
                     for fi in range(4)})
    write_docs_stats(d)
    return d


@pytest.fixture()
def registered(spark):
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    return spark


def _read_ids(spark, d):
    df = spark.read.format("json_docs").option("path", d).load()
    return sorted(r.doc_id for r in df.collect())


def test_compact_merges_into_max_name(registered, docs_dir):
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    res = compact_json_docs(docs_dir)
    assert res["merged"] == 4 and res["targets"] == ["0003.jsonl"]
    assert res["files_before"] == 4 and res["files_after"] == 1
    names = sorted(os.listdir(docs_dir))
    assert [f for f in names if f.endswith(".jsonl")] == ["0003.jsonl"]
    assert "_compact_manifest.json" not in names
    # row fidelity through the batch reader
    assert _read_ids(registered, docs_dir) == list(range(40))
    # sidecar folded: one entry spanning the union, row count summed
    stats = json.load(open(os.path.join(docs_dir, "_stats.json")))["files"]
    assert set(stats) == {"0003.jsonl"}
    e = stats["0003.jsonl"]
    assert e["n"] == 40
    assert e["doc_id"]["min"] == 0 and e["doc_id"]["max"] == 39


def test_compact_upto_fences_newer_files(registered, docs_dir):
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    res = compact_json_docs(docs_dir, upto="0001.jsonl")
    assert res["merged"] == 2 and res["targets"] == ["0001.jsonl"]
    jsonl = sorted(f for f in os.listdir(docs_dir)
                   if f.endswith(".jsonl"))
    assert jsonl == ["0001.jsonl", "0002.jsonl", "0003.jsonl"]
    assert _read_ids(registered, docs_dir) == list(range(40))


def test_compact_noop_below_two_files(tmp_path):
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    d = str(tmp_path / "one")
    _write_files(d, {"0000.jsonl": _rows(0, 5)})
    res = compact_json_docs(d)
    assert res["merged"] == 0 and res["targets"] == []
    assert sorted(os.listdir(d)) == ["0000.jsonl"]


def test_compact_group_bytes_preserves_read_parallelism(
        registered, docs_dir):
    """The scale knob: sized groups each merge into their OWN maximum
    name, so a large collection keeps a bounded-but-plural file count
    (partition-per-file read parallelism survives) and every
    surviving name was already watermarked past by any tailer."""
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    sizes = {f: os.path.getsize(os.path.join(docs_dir, f))
             for f in sorted(os.listdir(docs_dir)) if f.endswith(".jsonl")}
    # threshold = two files' worth -> the 4 files split into 2 groups
    thresh = sizes["0000.jsonl"] + sizes["0001.jsonl"]
    res = compact_json_docs(docs_dir, group_bytes=thresh)
    assert res["merged"] == 4 and res["files_after"] == 2
    assert res["targets"] == ["0001.jsonl", "0003.jsonl"]
    jsonl = sorted(f for f in os.listdir(docs_dir)
                   if f.endswith(".jsonl"))
    assert jsonl == ["0001.jsonl", "0003.jsonl"]
    assert _read_ids(registered, docs_dir) == list(range(40))
    # sidecar folded per group: pruning stats stay disjoint and exact
    stats = json.load(open(os.path.join(docs_dir, "_stats.json")))["files"]
    assert stats["0001.jsonl"]["doc_id"] == {
        "min": 0, "max": 19, "has_null": False}
    assert stats["0003.jsonl"]["doc_id"] == {
        "min": 20, "max": 39, "has_null": False}
    # re-running at the same threshold is a TRUE no-op: each compacted
    # file now fills a group alone, and 1-file groups never "merge"
    res2 = compact_json_docs(docs_dir, group_bytes=thresh)
    assert res2["merged"] == 0 and res2["targets"] == []
    assert res2["files_after"] == 2
    assert _read_ids(registered, docs_dir) == list(range(40))


def test_file_pruning_survives_compaction(registered, docs_dir):
    """The folded sidecar must keep SKIPPING files at plan time: after
    a grouped compaction, a doc_id range predicate plans only the one
    surviving file whose folded min/max can match — no re-stat pass,
    no conservative scan-everything fallback."""
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    sizes = {f: os.path.getsize(os.path.join(docs_dir, f))
             for f in sorted(os.listdir(docs_dir)) if f.endswith(".jsonl")}
    compact_json_docs(
        docs_dir,
        group_bytes=sizes["0000.jsonl"] + sizes["0001.jsonl"])
    # 2 files survive: ids 0-19 in 0001, 20-39 in 0003
    sel = (registered.read.format("json_docs")
           .option("path", docs_dir).load()
           .filter("doc_id >= 25"))
    assert sel.rdd.getNumPartitions() == 1  # 0001.jsonl pruned by stats
    assert sorted(r.doc_id for r in sel.collect()) == list(range(25, 40))


def test_crash_before_commit_rolls_back(registered, docs_dir):
    """Manifest + staged tmp on disk = the crash happened BEFORE the
    commit point: nothing is doomed, readers see every original, and
    recovery drops the staging without touching the directory."""
    from nosql_join_stream_spark.pydocsource import (
        _compact_pending_deletes, _recover_compact)

    tmp_name = "_tmp-compact-deadbeef.inprogress"
    with open(os.path.join(docs_dir, tmp_name), "w") as fh:
        fh.write("{}\n")
    with open(os.path.join(docs_dir, "_compact_manifest.json"),
              "w") as fh:
        json.dump({"tmp": tmp_name, "target": "0003.jsonl",
                   "delete": ["0000.jsonl", "0001.jsonl",
                              "0002.jsonl"]}, fh)

    assert _compact_pending_deletes(docs_dir) == set()
    assert _read_ids(registered, docs_dir) == list(range(40))

    _recover_compact(docs_dir)
    names = sorted(os.listdir(docs_dir))
    assert "_compact_manifest.json" not in names
    assert tmp_name not in names
    assert [f for f in names if f.endswith(".jsonl")] == [
        "0000.jsonl", "0001.jsonl", "0002.jsonl", "0003.jsonl"]
    assert _read_ids(registered, docs_dir) == list(range(40))


def test_crash_after_commit_skips_doomed_then_rolls_forward(
        registered, docs_dir):
    """Manifest present, tmp gone = the merged rows already live in
    the target; the doomed originals are duplicates.  Readers must
    skip them DURING the crash window (no double-read), and recovery
    finishes the deletes and folds the sidecar."""
    from nosql_join_stream_spark.pydocsource import (
        _compact_pending_deletes, _recover_compact)

    # simulate the post-commit state by hand: target holds 0000+0001
    # rows plus its own, originals still on disk, manifest published
    merged = _rows(0, 20)
    with open(os.path.join(docs_dir, "0001.jsonl"), "w",
              encoding="utf-8") as fh:
        for r in merged:
            fh.write(json.dumps(r) + "\n")
    with open(os.path.join(docs_dir, "_compact_manifest.json"),
              "w") as fh:
        json.dump({"tmp": "_tmp-compact-gone.inprogress",
                   "target": "0001.jsonl",
                   "delete": ["0000.jsonl"]}, fh)

    assert _compact_pending_deletes(docs_dir) == {"0000.jsonl"}
    # crash window: 0000 skipped, every doc exactly once
    assert _read_ids(registered, docs_dir) == list(range(40))

    _recover_compact(docs_dir)
    jsonl = sorted(f for f in os.listdir(docs_dir)
                   if f.endswith(".jsonl"))
    assert jsonl == ["0001.jsonl", "0002.jsonl", "0003.jsonl"]
    assert not os.path.exists(
        os.path.join(docs_dir, "_compact_manifest.json"))
    stats = json.load(open(os.path.join(docs_dir, "_stats.json")))["files"]
    assert set(stats) == {"0001.jsonl", "0002.jsonl", "0003.jsonl"}
    assert stats["0001.jsonl"]["n"] == 20
    assert stats["0001.jsonl"]["doc_id"]["min"] == 0
    assert stats["0001.jsonl"]["doc_id"]["max"] == 19
    assert _read_ids(registered, docs_dir) == list(range(40))


def test_stream_tails_across_compaction_of_committed_prefix(
        registered, tmp_path):
    """The filename contract survives compaction: merged-away names
    vanish like rotation, the surviving name is the group's max (at
    the committed watermark), so a checkpointed resume neither raises
    a late-arrival error nor re-reads — only genuinely new files
    arrive."""
    from nosql_join_stream_spark.pydocsource import (
        compact_json_docs, stream_committed_watermark)

    spark = registered
    d = tmp_path / "docs"
    d.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, name in enumerate(["a.jsonl", "b.jsonl"]):
        (d / name).write_text(
            json.dumps({"doc_id": i, "text": f"t{i}"}) + "\n")

    def drain():
        q = (spark.readStream.format("json_docs")
             .option("path", str(d)).load()
             .writeStream.format("parquet").option("path", out)
             .outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination()

    drain()
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {0, 1}

    # compact everything the stream has committed past — the safe
    # fence read from Spark's OWN commit/offset WALs in the
    # checkpoint, not guessed from the directory
    wm = stream_committed_watermark(ckpt)
    assert wm == "b.jsonl"
    res = compact_json_docs(str(d), upto=wm)
    assert res["merged"] == 2 and res["targets"] == ["b.jsonl"]
    (d / "c.jsonl").write_text(
        json.dumps({"doc_id": 2, "text": "t2"}) + "\n")

    drain()  # resumes from the checkpoint over the compacted directory
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {0, 1, 2} and len(rows) == 3


class _CrashPoint(Exception):
    pass


def _crash_compact(d, fn_name, nth):
    """Run compact_json_docs with the nth call to os.<fn_name> made to
    raise — a process death at that exact step boundary.  The patch is
    scoped to the compact call only."""
    import nosql_join_stream_spark.pydocsource as pds
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    real = getattr(pds.os, fn_name)
    n = 0

    def wrapper(*a, **k):
        nonlocal n
        n += 1
        if n == nth:
            raise _CrashPoint(f"{fn_name} call #{nth}")
        return real(*a, **k)

    setattr(pds.os, fn_name, wrapper)
    try:
        with pytest.raises(_CrashPoint):
            compact_json_docs(d)
    finally:
        setattr(pds.os, fn_name, real)


@pytest.mark.parametrize("fn_name,nth,label", [
    # full-run call order: replace#1 = manifest publish, replace#2 =
    # the COMMIT (tmp -> target), replace#3 = sidecar fold;
    # remove#1..3 = the doomed deletes, remove#4 = manifest removal
    ("replace", 1, "staged, no manifest"),
    ("replace", 2, "manifest published, uncommitted"),
    ("remove", 1, "committed, all deletes pending"),
    ("remove", 4, "deletes+sidecar done, manifest lingers"),
])
def test_crash_matrix_exactly_once_at_every_boundary(
        registered, docs_dir, fn_name, nth, label):
    """Kill the compactor at EVERY step boundary: at each intermediate
    state the batch reader must still see every doc exactly once, and
    the next compact call must repair the directory and converge."""
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    _crash_compact(docs_dir, fn_name, nth)
    # invariant under the crashed state: exactly-once, no loss, no dup
    assert _read_ids(registered, docs_dir) == list(range(40)), label

    # recovery: the next maintenance run settles the directory
    compact_json_docs(docs_dir)
    names = sorted(os.listdir(docs_dir))
    assert "_compact_manifest.json" not in names, label
    assert not [f for f in names if f.endswith(".inprogress")], label
    assert [f for f in names if f.endswith(".jsonl")] == \
        ["0003.jsonl"], label
    assert _read_ids(registered, docs_dir) == list(range(40)), label


def _reader_view_ids(d):
    """What any reader observes: every row of every .jsonl file minus
    the manifest's pending deletes — as a MULTISET, so a double-read
    (duplicate) fails the invariant as loudly as a loss."""
    from nosql_join_stream_spark.pydocsource import (
        _compact_pending_deletes)

    doomed = _compact_pending_deletes(d)
    out = []
    for f in sorted(os.listdir(d)):
        if not f.endswith(".jsonl") or f in doomed:
            continue
        with open(os.path.join(d, f), encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    out.append(json.loads(line)["doc_id"])
    return sorted(out)


def test_compact_crash_fuzz_random_shapes_and_crash_points(tmp_path):
    """Randomized superset of the fixed crash matrix: arbitrary file
    shapes (including empty files), arbitrary upto fence and group
    size, and a crash injected at EVERY os.replace/os.remove call
    index in turn.  At every intermediate state the reader-view
    multiset equals the original rows (no loss, no duplicate), and a
    recovery run converges to a clean directory."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import nosql_join_stream_spark.pydocsource as pds
    from nosql_join_stream_spark.pydocsource import compact_json_docs

    counter = 0

    @settings(max_examples=120, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(sizes=st.lists(st.integers(0, 4), min_size=1, max_size=7),
           upto_idx=st.one_of(st.none(), st.integers(0, 6)),
           grouped=st.booleans(),
           crash_at=st.one_of(st.none(), st.integers(1, 14)))
    def run(sizes, upto_idx, grouped, crash_at):
        nonlocal counter
        counter += 1
        d = str(tmp_path / f"fz{counter}")
        os.makedirs(d)
        nid = 0
        for i, n in enumerate(sizes):
            rows = []
            for _ in range(n):
                rows.append(dict(doc_id=nid, text="t"))
                nid += 1
            _write_files(d, {f"{i:04d}.jsonl": rows})
        all_ids = sorted(range(nid))
        upto = (pds.ALL if upto_idx is None
                else f"{min(upto_idx, len(sizes) - 1):04d}.jsonl")
        gb = 60 if grouped else None  # ~2 tiny rows per group

        real_rep, real_rem = pds.os.replace, pds.os.remove
        calls = 0

        def mk(real):
            def wrapper(*a, **k):
                nonlocal calls
                calls += 1
                if crash_at is not None and calls == crash_at:
                    raise _CrashPoint(f"oscall #{crash_at}")
                return real(*a, **k)
            return wrapper

        pds.os.replace, pds.os.remove = mk(real_rep), mk(real_rem)
        try:
            try:
                compact_json_docs(d, upto=upto, group_bytes=gb)
            except _CrashPoint:
                pass
        finally:
            pds.os.replace, pds.os.remove = real_rep, real_rem

        # invariant holds in whatever state the crash left behind
        assert _reader_view_ids(d) == all_ids

        # recovery converges: clean directory, same rows, and a
        # second run is a no-op on the already-compacted groups
        compact_json_docs(d, upto=upto, group_bytes=gb)
        names = os.listdir(d)
        assert "_compact_manifest.json" not in names
        assert not [f for f in names if f.endswith(".inprogress")]
        assert _reader_view_ids(d) == all_ids

    run()


def test_committed_watermark_none_before_first_commit(tmp_path):
    """No commits yet (fresh or absent checkpoint) = nothing is safe
    to compact: the fence is None, and compact(upto=None) is a NO-OP —
    the natural composition compact(upto=stream_committed_watermark(c))
    must never merge a live tailer's planned-but-uncommitted files.
    Compacting everything takes the explicit ALL sentinel (the
    default when no fence argument is passed at all)."""
    from nosql_join_stream_spark.pydocsource import (
        ALL, compact_json_docs, stream_committed_watermark)

    assert stream_committed_watermark(str(tmp_path / "nope")) is None
    (tmp_path / "ckpt" / "commits").mkdir(parents=True)
    assert stream_committed_watermark(str(tmp_path / "ckpt")) is None

    d = str(tmp_path / "docs")
    os.makedirs(d)
    _write_files(d, {"0000.jsonl": [dict(doc_id=0, text="a")],
                     "0001.jsonl": [dict(doc_id=1, text="b")]})
    # the composition with a pre-first-commit fence: no-op, files intact
    res = compact_json_docs(
        d, upto=stream_committed_watermark(str(tmp_path / "ckpt")))
    assert res["merged"] == 0 and res["files_after"] == 2
    assert sorted(os.listdir(d)) == ["0000.jsonl", "0001.jsonl"]
    # the explicit all-files form still merges
    res = compact_json_docs(d, upto=ALL)
    assert res["merged"] == 2 and res["files_after"] == 1
    assert _reader_view_ids(d) == [0, 1]


def test_committed_watermark_multi_source_index(registered, tmp_path):
    """A union of two json_docs streams checkpoints ONE offsets file
    with one offset line per source (plan order); source_index selects
    the right fence for each directory, and an out-of-range index or a
    non-json_docs offset fails loudly instead of fencing the wrong
    collection."""
    import json as _json

    from nosql_join_stream_spark.pydocsource import (
        stream_committed_watermark)

    spark = registered
    d1, d2 = tmp_path / "a", tmp_path / "b"
    d1.mkdir(), d2.mkdir()
    (d1 / "a1.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "x"}) + "\n")
    (d2 / "b7.jsonl").write_text(
        _json.dumps({"doc_id": 2, "text": "y"}) + "\n")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    s1 = (spark.readStream.format("json_docs")
          .option("path", str(d1)).load())
    s2 = (spark.readStream.format("json_docs")
          .option("path", str(d2)).load())
    q = (s1.unionByName(s2)
         .writeStream.format("parquet").option("path", out)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination()

    assert stream_committed_watermark(ckpt, source_index=0) == "a1.jsonl"
    assert stream_committed_watermark(ckpt, source_index=1) == "b7.jsonl"
    with pytest.raises(ValueError, match="no index 2"):
        stream_committed_watermark(ckpt, source_index=2)


def test_overwrite_settles_stale_manifest(registered, docs_dir):
    """A committed-but-unfinished compaction must not survive an
    overwrite: the manifest's delete-list would otherwise doom NEW
    files that reuse the old names."""
    spark = registered
    with open(os.path.join(docs_dir, "_compact_manifest.json"),
              "w") as fh:
        json.dump({"tmp": "_tmp-compact-gone.inprogress",
                   "target": "0001.jsonl",
                   "delete": ["0000.jsonl"]}, fh)

    df = spark.createDataFrame(
        [(100, "web", "en", "fresh", None)],
        "doc_id long, source string, lang string, text string, "
        "props string")
    (df.coalesce(1).write.format("json_docs")
       .option("path", docs_dir).mode("overwrite").save())

    assert not os.path.exists(
        os.path.join(docs_dir, "_compact_manifest.json"))
    assert _read_ids(spark, docs_dir) == [100]
    # a later recovery pass is a no-op, not a deletion of new data
    from nosql_join_stream_spark.pydocsource import _recover_compact
    _recover_compact(docs_dir)
    assert _read_ids(spark, docs_dir) == [100]
