"""Fault fuzz of the json_docs STREAMING SINK's commit protocol.

The batch writer's staged-tmp/rename-commit protocol is fuzzed in
test_pydocsource_write/compact; the stream sink (JsonDocsStreamWriter)
had only the happy-path relay test.  This drives the sink directly
through randomized fault schedules — task retries that orphan staged
tmps, a driver crash INSIDE the commit window after some renames, a
replay that shards the same rows into a DIFFERENT number of task
files — and asserts the invariants the exactly-once claim actually
needs (reference resource-safety discipline, storage.scala:661-699):

  * a replayed batch id never double-publishes: the final directory
    holds exactly one attempt's files per batch, and the row multiset
    equals the logical batch contents exactly once;
  * published filenames stay batch-id monotone (the directory remains
    a valid json_docs STREAM SOURCE);
  * failed-task tmps are inert: invisible to readers, never renamed;
  * the stats sidecar tracks exactly the live doc files (no stale
    entries for retracted partials, no missing entries).

No SparkSession needed: the writer's write() consumes plain row
tuples and commit()/abort() are driver-local filesystem protocol.
"""
from __future__ import annotations

import json
import os

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

from nosql_join_stream_spark.pydocsource import (JsonDocsStreamWriter,
                                                 _is_doc_file, _open_doc)

_SCHEMA = StructType([StructField("doc_id", LongType()),
                      StructField("text", StringType())])


def _mk_writer(path: str, gz: bool = False) -> JsonDocsStreamWriter:
    opts = {"path": path}
    if gz:
        opts["compression"] = "gzip"
    return JsonDocsStreamWriter(opts, _SCHEMA, overwrite=False)


def _run_tasks(w: JsonDocsStreamWriter, rows: list[tuple],
               n_tasks: int, fail_tasks: set[int]) -> list:
    """One batch attempt: shard ``rows`` over ``n_tasks`` tasks; a
    task in ``fail_tasks`` stages its tmp then "dies" (its commit
    message never reaches the driver) and is retried immediately —
    exactly Spark's task-retry shape, which leaves the first
    attempt's uuid tmp orphaned on disk."""
    msgs = []
    for t in range(n_tasks):
        shard = [r for i, r in enumerate(rows) if i % n_tasks == t]
        if t in fail_tasks:
            w.write(iter(shard))        # attempt 1: message lost
        msgs.append(w.write(iter(shard)))
    return msgs


def _read_dir(path: str) -> list[int]:
    """doc_ids across every published doc file (multiset)."""
    out = []
    for f in sorted(os.listdir(path)):
        if not _is_doc_file(f):
            continue
        with _open_doc(os.path.join(path, f)) as fh:
            for line in fh:
                if line.strip():
                    out.append(json.loads(line)["doc_id"])
    return out


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(data=st.data(), gz=st.booleans())
def test_stream_sink_exactly_once_under_fault_schedule(
        tmp_path_factory, data, gz):
    d = str(tmp_path_factory.mktemp("sink_fault") / "dst")
    os.makedirs(d)
    expected: list[int] = []       # one copy per batch, in batch order
    next_id = 0

    n_batches = data.draw(st.integers(1, 5), label="n_batches")
    for batch_id in range(n_batches):
        n_rows = data.draw(st.integers(0, 7), label="n_rows")
        rows = [(next_id + i, f"b{batch_id}r{i}") for i in range(n_rows)]
        next_id += n_rows
        expected.extend(r[0] for r in rows)

        # --- attempt 1: tasks run (some fail+retry), then either the
        # batch aborts, the driver crashes mid-commit, or it commits
        w = _mk_writer(d, gz)
        n_tasks = data.draw(st.integers(1, 4), label="n_tasks")
        fails = set(data.draw(
            st.lists(st.integers(0, n_tasks - 1), max_size=2),
            label="fail_tasks"))
        msgs = _run_tasks(w, rows, n_tasks, fails)
        fate = data.draw(st.sampled_from(
            ["commit", "abort_retry", "crash_mid_commit"]), label="fate")

        if fate == "commit":
            w.commit(msgs, batch_id)
            continue

        if fate == "abort_retry":
            w.abort(msgs, batch_id)   # Spark aborts the failed epoch
        else:
            # crash INSIDE the commit window: the first k staged files
            # were already renamed to their final b<id>-* names (and
            # folded into the sidecar) when the driver died — replay
            # must retract them, not stack on top
            k = data.draw(st.integers(0, n_tasks), label="renamed_k")
            live = [m for m in msgs if m.tmp_name is not None]
            import nosql_join_stream_spark.pydocsource as pyds
            ext = ".jsonl.gz" if gz else ".jsonl"
            pyds._publish_files(
                d, live[:k], lambda i: f"b{batch_id:012d}-{i:05d}{ext}")
            # the un-renamed remainder stays staged; the dead driver
            # never calls abort for them (orphan tmps)

        # --- attempt 2 (replay of the SAME batch id): fresh task run,
        # possibly different sharding, then a clean commit
        w2 = _mk_writer(d, gz)
        n_tasks2 = data.draw(st.integers(1, 4), label="n_tasks2")
        msgs2 = _run_tasks(w2, rows, n_tasks2, set())
        w2.commit(msgs2, batch_id)

    got = _read_dir(d)
    assert sorted(got) == sorted(expected), (
        "replayed batches double-published or lost rows")
    # filenames are batch-id monotone and carry each id exactly once
    # per surviving attempt
    doc_files = sorted(f for f in os.listdir(d) if _is_doc_file(f))
    batch_of = [int(f[1:13]) for f in doc_files]
    assert batch_of == sorted(batch_of)
    # sidecar tracks exactly the live doc files
    sidecar = os.path.join(d, "_stats.json")
    if doc_files:
        stats = json.load(open(sidecar))["files"]
        assert set(stats) == set(doc_files), (
            "sidecar stale after retraction/republish")
        assert sum(s["n"] for s in stats.values()) == len(expected)
    # orphan tmps (failed tasks / crashed commits) are inert —
    # invisible to _is_doc_file — but must never be published
    for f in os.listdir(d):
        if f.endswith(".inprogress"):
            assert not _is_doc_file(f)


def test_replay_with_fewer_tasks_retracts_surplus(tmp_path):
    """The concrete double-publish vector: the crashed attempt
    published 3 task files; the replay shards the same rows into 1.
    Without retraction the directory keeps b0-00001/b0-00002 from the
    dead attempt alongside the replay's b0-00000 — rows duplicated."""
    import nosql_join_stream_spark.pydocsource as pyds

    d = str(tmp_path / "dst")
    os.makedirs(d)
    rows = [(i, f"r{i}") for i in range(6)]
    w = _mk_writer(d)
    msgs = _run_tasks(w, rows, 3, set())
    # crashed attempt: ALL three files renamed, commit log not written
    pyds._publish_files(d, msgs, lambda i: f"b{0:012d}-{i:05d}.jsonl")
    assert len([f for f in os.listdir(d) if _is_doc_file(f)]) == 3

    w2 = _mk_writer(d)
    msgs2 = _run_tasks(w2, rows, 1, set())
    w2.commit(msgs2, 0)
    files = [f for f in os.listdir(d) if _is_doc_file(f)]
    assert files == ["b000000000000-00000.jsonl"]
    assert sorted(_read_dir(d)) == [0, 1, 2, 3, 4, 5]
    stats = json.load(open(os.path.join(d, "_stats.json")))["files"]
    assert set(stats) == set(files)


def test_commit_of_new_batch_never_touches_other_batches(tmp_path):
    """Retraction is namespaced by the batch prefix: committing batch
    7 must not disturb batch 6's published files even when 6's names
    share every other character."""
    d = str(tmp_path / "dst")
    os.makedirs(d)
    w = _mk_writer(d)
    w.commit(_run_tasks(w, [(1, "a")], 1, set()), 6)
    w.commit(_run_tasks(w, [(2, "b")], 1, set()), 7)
    files = sorted(f for f in os.listdir(d) if _is_doc_file(f))
    assert files == ["b000000000006-00000.jsonl",
                     "b000000000007-00000.jsonl"]
    assert sorted(_read_dir(d)) == [1, 2]
