"""LIVE writer × compactor × checkpointed tailer — simultaneously.

The r9 verdict's remaining lifecycle gap: compaction crash-fuzz and
the offset-protocol fuzz each drive ONE actor; nothing drove all
three concurrently from threads.  This does, with randomized
interleavings (seeded sleeps):

  * a WRITER thread appends monotone-named doc files (atomic
    tmp+rename publish, the JsonDocsWriter discipline);
  * a TAILER thread runs the real JsonDocsStreamReader protocol
    (latestOffset → partitions → read → commit) against a persisted
    stateDir, with occasional clean restarts (a new reader instance
    resuming from the same state — Spark's restart shape);
  * a COMPACTOR thread repeatedly compacts at the tailer's LAST
    COMMITTED watermark (the stream_committed_watermark discipline)
    with randomized group sizing.

Invariants asserted per schedule:
  * no thread raises (loud-guard RuntimeErrors included: a correctly
    fenced compactor must never trip the tailer's late-file guard);
  * the tailer's delivered doc_id multiset equals the written
    multiset exactly once (exactly-once end to end, under concurrent
    shrinking of the directory it is tailing);
  * the final directory still holds every row (compaction merged,
    never lost) — batch-read equivalence.

Reference parity: the resource-safety discipline of the reference's
storage lifecycle (storage.scala:595-608) at whole-lifecycle scale.
"""
from __future__ import annotations

import json
import os
import random
import threading
import time

import pytest

from nosql_join_stream_spark.pydocsource import (JsonDocsStreamReader,
                                                 _open_doc,
                                                 compact_json_docs)

N_FILES = 40


def _publish(d: str, name: str, rows: list[dict]) -> None:
    """Atomic publish: stage + rename, so the tailer never reads a
    torn file (the writer protocol's contract)."""
    tmp = os.path.join(d, f"_tmp-{name}.inprogress")
    with open(tmp, "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
    os.replace(tmp, os.path.join(d, name))


@pytest.mark.parametrize("seed", range(8))
def test_writer_compactor_tailer_threads(tmp_path, seed):
    d = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    os.makedirs(d)
    rng_w = random.Random(seed)
    rng_t = random.Random(seed + 1000)
    rng_c = random.Random(seed + 2000)

    errors: list[BaseException] = []
    stop = threading.Event()
    committed_wm: list[str | None] = [None]   # tailer → compactor
    delivered: list[int] = []                 # tailer's output multiset
    written: list[int] = []

    def writer():
        try:
            seq = 0
            for i in range(N_FILES):
                n_rows = rng_w.randint(1, 3)
                rows = [dict(doc_id=len(written) + j, text=f"w{i}")
                        for j in range(n_rows)]
                seq += rng_w.randint(1, 2)   # gaps allowed: rolled logs
                _publish(d, f"{seq:05d}.jsonl", rows)
                written.extend(r["doc_id"] for r in rows)
                if rng_w.random() < 0.6:
                    time.sleep(rng_w.random() * 0.004)
        except BaseException as e:  # noqa: BLE001 — surface to main
            errors.append(e)
            stop.set()

    def tailer():
        try:
            rdr = JsonDocsStreamReader({"path": d, "statedir": state})
            committed = {"last": ""}
            deadline = time.monotonic() + 60
            while time.monotonic() < deadline and not stop.is_set():
                if rng_t.random() < 0.15:
                    # clean restart: new instance, same persisted state
                    rdr = JsonDocsStreamReader({"path": d,
                                                "statedir": state})
                # Observe writer-death BEFORE polling: a file published
                # between latestOffset() and an is_alive() check would
                # otherwise be abandoned (poll sees up to F, writer
                # publishes F+1 and exits, empty-poll + dead-writer →
                # return, F+1 never drained — seed-6 flake).  Dead
                # before the poll ⇒ every publish is visible to it.
                writer_done = not writer_t.is_alive()
                end = rdr.latestOffset()
                if end["last"] > committed["last"]:
                    parts = rdr.partitions(dict(committed), dict(end))
                    for p in parts:
                        for row in rdr.read(p):
                            delivered.append(row[0])
                    rdr.commit(dict(end))
                    committed = end
                    committed_wm[0] = end["last"]
                elif writer_done:
                    return               # drained after writer finished
                time.sleep(rng_t.random() * 0.003)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
            stop.set()

    merged_total = [0]

    def compactor():
        try:
            while not stop.is_set():
                wm = committed_wm[0]
                grp = rng_c.choice([None, 120, 400])
                # upto=None is the documented no-op; passing it
                # exercises the pre-first-commit guard too
                merged_total[0] += compact_json_docs(
                    d, upto=wm, group_bytes=grp)["merged"]
                if tailer_t is not None and not tailer_t.is_alive() \
                        and not writer_t.is_alive():
                    return
                time.sleep(rng_c.random() * 0.005)
        except BaseException as e:  # noqa: BLE001
            errors.append(e)
            stop.set()

    writer_t = threading.Thread(target=writer, name="writer")
    tailer_t = threading.Thread(target=tailer, name="tailer")
    compactor_t = threading.Thread(target=compactor, name="compactor")
    for t in (writer_t, tailer_t, compactor_t):
        t.start()
    for t in (writer_t, tailer_t, compactor_t):
        t.join(timeout=120)
        assert not t.is_alive(), f"{t.name} wedged"

    assert not errors, (
        f"thread raised under schedule seed={seed}: {errors!r}")
    assert sorted(delivered) == sorted(written), (
        "tailer's delivered multiset diverges from the written "
        f"multiset (seed={seed}): extra="
        f"{sorted(set(delivered) - set(written))} missing="
        f"{sorted(set(written) - set(delivered))} "
        f"dups={len(delivered) - len(set(delivered))}")

    # the directory itself still holds every row exactly once
    # (compaction merged, never lost/duplicated)
    on_disk = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".jsonl"):
            with _open_doc(os.path.join(d, f)) as fh:
                for line in fh:
                    if line.strip():
                        on_disk.append(json.loads(line)["doc_id"])
    assert sorted(on_disk) == sorted(written)
    # no manifest/tmp may linger
    assert not [f for f in os.listdir(d)
                if f.startswith("_tmp-compact-")
                or f == "_compact_manifest.json"], "compactor leftovers"

    # a deterministic full compaction over the concurrent history:
    # whatever interleaving happened, one fenced merge-to-one must
    # still preserve the multiset and actually shrink the tail
    files_before = len([f for f in os.listdir(d) if f.endswith(".jsonl")])
    res = compact_json_docs(d, upto=committed_wm[0])
    assert res["files_after"] <= files_before
    if files_before >= 2 and committed_wm[0] is not None:
        assert res["merged"] >= 2 or merged_total[0] > 0, (
            "no merge ever happened — the schedule never exercised "
            "compaction")
    final = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".jsonl"):
            with _open_doc(os.path.join(d, f)) as fh:
                final.extend(json.loads(ln)["doc_id"]
                             for ln in fh if ln.strip())
    assert sorted(final) == sorted(written)
