"""Stateful fuzz of the json_docs streaming reader's offset protocol.

The r8 regression lived exactly in the gap between the unit tests and
Spark's REAL call sequence on a checkpointed restart (``partitions``
on a fresh instance BEFORE ``latestOffset``).  This fuzz drives a
reader through randomized op sequences — land a file, run a
micro-batch, crash before commit, restart with/without stateDir,
rotate old files — while a reference model tracks what an
exactly-once filename-high-watermark source must do:

  * every file landed ABOVE the watermark is delivered exactly once
    (replays after a crash re-deliver the same batch id, which the
    sink dedups — modeled as a dict keyed by batch id);
  * a file landing at-or-below a LIVE reader's watermark raises at
    the next ``latestOffset`` (never silent loss);
  * landed-while-down below-watermark files raise iff ``stateDir``
    persisted the seen set (the documented weaker in-memory contract
    absorbs them silently);
  * rotation (deleting committed files) never disturbs delivery,
    and the persisted seen set stays bounded by the live directory;
  * compaction at the committed fence (compact_json_docs with
    upto = the committed offset, the stream_committed_watermark
    discipline) is invisible to delivery: merged-away names vanish
    like rotation, the surviving group-max names were already seen,
    and replays never observe merged content (files at-or-below the
    committed offset are never re-planned).

Reference parity: the reference's resumable sequence-number cursor
(log/package.scala) has the same exactly-once-across-replay
obligation; this is its adversarial schedule check.
"""
from __future__ import annotations

import json
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from nosql_join_stream_spark.pydocsource import (JsonDocsStreamReader,
                                                 compact_json_docs)


def _land(d: str, name: str, rows: list[dict]) -> None:
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w", encoding="utf-8") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


# Op alphabet.  Weights favor the interesting interleavings (restart
# and crash) over plain landings so short sequences still hit them.
_OPS = st.lists(
    st.sampled_from(
        ["land", "land", "batch", "batch", "batch_crash",
         "restart", "rotate", "land_late", "compact"]),
    min_size=3, max_size=14)


@settings(max_examples=60, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_OPS, use_state=st.booleans(), data=st.data())
def test_stream_reader_exactly_once_under_adversarial_schedule(
        tmp_path_factory, ops, use_state, data):
    base = tmp_path_factory.mktemp("pyds_fuzz")
    d = str(base / "docs")
    state = str(base / "state")
    os.makedirs(d, exist_ok=True)

    opts = {"path": d}
    if use_state:
        opts["statedir"] = state

    rdr = JsonDocsStreamReader(dict(opts))
    alive = True                      # False after a modeled crash
    committed = {"last": ""}          # checkpointed committed offset
    planned = None                    # offset-log entry not yet committed
    next_seq = 1                      # next monotone filename number
    landed_live: dict[str, int] = {}  # name -> doc_id, expected delivered
    sink: dict[str, set[int]] = {}    # batch end-offset -> doc_ids (dedup)
    guard_tripped = False             # reader raised; directory is poisoned
    rotated_pending: set[str] = set()  # deleted since the last commit

    def do_commit(reader, end):
        """commit prunes the persisted seen set to the live directory,
        so rotations before it are absorbed into the bound."""
        reader.commit(dict(end))
        rotated_pending.clear()

    def run_batch(reader, start, end):
        """partitions + read, into the sink keyed by batch offset —
        an exactly-once sink SKIPS a batch id it already holds, so
        first write wins and replays are no-ops."""
        parts = reader.partitions(dict(start), dict(end))
        got = set()
        for p in parts:
            for row in reader.read(p):
                got.add(row[0])       # doc_id is first of _ALL_COLS
        sink.setdefault(end["last"], got)

    for op in ops:
        if guard_tripped:
            break
        if op in ("batch", "batch_crash", "land_late") and not alive:
            continue                  # a crashed driver runs nothing
        if op == "land":
            name = f"{next_seq:04d}.jsonl"
            next_seq += 1
            _land(d, name, [dict(doc_id=next_seq * 1000, text="t")])
            landed_live[name] = next_seq * 1000
        elif op == "land_late":
            # a name at-or-below the reader's watermark, if any gap
            # exists: must trip the guard at the next latestOffset
            wm = rdr._watermark
            gaps = [f"{i:04d}.jsonl" for i in range(1, next_seq)
                    if f"{i:04d}.jsonl" <= wm
                    and not os.path.exists(os.path.join(d, f"{i:04d}.jsonl"))]
            if not gaps:
                continue
            name = data.draw(st.sampled_from(gaps), label="late_name")
            _land(d, name, [dict(doc_id=-1, text="late")])
            if name in rdr._seen:
                # deleted-then-recreated while the live reader still
                # remembers consuming it: silently skipped (the first
                # copy WAS delivered), a ghost — never re-read
                rdr.latestOffset()
            else:
                with pytest.raises(RuntimeError,
                                   match="below the committed"):
                    rdr.latestOffset()
                guard_tripped = True
        elif op in ("batch", "batch_crash"):
            end = rdr.latestOffset()
            if end["last"] <= committed["last"]:
                continue              # nothing new; no batch planned
            planned = end
            run_batch(rdr, committed, end)
            if op == "batch":
                do_commit(rdr, end)
                committed = end
                planned = None
            else:
                # offset log has `planned`, commit log does not, and
                # the driver is gone — only restart revives the query
                alive = False
        elif op == "restart":
            rdr = JsonDocsStreamReader(dict(opts))
            alive = True
            if planned is not None:
                # Spark's actual resume order: replay the uncommitted
                # batch (partitions BEFORE any latestOffset), commit it
                run_batch(rdr, committed, planned)
                do_commit(rdr, planned)
                committed = planned
                planned = None
        elif op == "rotate":
            olds = sorted(f for f in os.listdir(d)
                          if f.endswith(".jsonl")
                          and f <= committed["last"])
            if olds:
                os.remove(os.path.join(d, olds[0]))
                rotated_pending.add(olds[0])
        elif op == "compact":
            # the safe fence: only files the COMMIT log covers (what
            # stream_committed_watermark reads from a real checkpoint)
            if not committed["last"]:
                continue
            before = {f for f in os.listdir(d) if f.endswith(".jsonl")}
            grp = data.draw(st.sampled_from([None, 40]),
                            label="group_bytes")
            compact_json_docs(d, upto=committed["last"],
                              group_bytes=grp)
            after = {f for f in os.listdir(d) if f.endswith(".jsonl")}
            # merged-away names vanish like rotation: absorbed into
            # the persisted-seen bound until the next commit prunes
            rotated_pending.update(before - after)

    if guard_tripped:
        return  # loud failure IS the contract; delivery checks moot

    # drain whatever is still pending so delivery can be asserted
    if not alive:
        rdr = JsonDocsStreamReader(dict(opts))
        alive = True
        if planned is not None:
            run_batch(rdr, committed, planned)
            do_commit(rdr, planned)
            committed = planned
            planned = None
    end = rdr.latestOffset()
    if end["last"] > committed["last"]:
        run_batch(rdr, committed, end)
        do_commit(rdr, end)
        committed = end

    delivered = set().union(*sink.values()) if sink else set()
    assert delivered == set(landed_live.values()), (
        "exactly-once violated: delivered doc_ids diverge from the "
        "monotone landings")
    # replay keyed by batch id never double-counts: each doc_id
    # appears in exactly one batch's final sink slot
    per_batch = [sink[k] for k in sink]
    flat = [i for s in per_batch for i in s]
    assert len(flat) == len(set(flat)), "a doc_id spans two batch ids"

    if use_state and os.path.isdir(state):
        st_file = os.path.join(state, "json_docs_stream_state.json")
        if os.path.exists(st_file):
            with open(st_file, encoding="utf-8") as fh:
                persisted = json.load(fh)
            live = {f for f in os.listdir(d) if f.endswith(".jsonl")}
            from nosql_join_stream_spark.pydocsource import (
                _decode_name_set)
            assert _decode_name_set(
                persisted["seen"]) <= live | rotated_pending, (
                "persisted seen set leaked filenames rotated away "
                "before the last commit (prune bound broken)")


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(down_kind=st.sampled_from(["below", "above"]),
       use_state=st.booleans())
def test_landed_while_down_contract(tmp_path_factory, down_kind,
                                    use_state):
    """The restart matrix in one property: a file landing WHILE THE
    QUERY IS DOWN is (a) above the committed watermark → delivered
    normally on resume, (b) below it → raises iff stateDir persisted
    the seen set, else silently absorbed (documented weaker mode) —
    and absorbed means absorbed: the resumed reader keeps streaming
    later landings."""
    base = tmp_path_factory.mktemp("pyds_down")
    d = str(base / "docs")
    state = str(base / "state")
    opts = {"path": d}
    if use_state:
        opts["statedir"] = state

    _land(d, "0002.jsonl", [dict(doc_id=2, text="a")])
    _land(d, "0004.jsonl", [dict(doc_id=4, text="b")])
    rdr = JsonDocsStreamReader(dict(opts))
    end = rdr.latestOffset()
    rdr.partitions({"last": ""}, dict(end))
    rdr.commit(dict(end))

    name = "0003.jsonl" if down_kind == "below" else "0005.jsonl"
    _land(d, name, [dict(doc_id=9, text="z")])

    rdr2 = JsonDocsStreamReader(dict(opts))
    # clean restart (last batch committed): Spark polls latestOffset
    # first, then plans (committed, latest]
    if down_kind == "below" and use_state:
        with pytest.raises(RuntimeError, match="below the committed"):
            rdr2.latestOffset()
        return
    new_end = rdr2.latestOffset()
    parts = rdr2.partitions(dict(end), dict(new_end))
    got = {row[0] for p in parts for row in rdr2.read(p)}
    if down_kind == "above":
        assert got == {9}
    else:
        assert got == set()  # absorbed, not re-read, not raised
    rdr2.commit(dict(new_end))
    # the guard re-arms for live late arrivals after the resume
    _land(d, "0001.jsonl", [dict(doc_id=1, text="late")])
    with pytest.raises(RuntimeError, match="below the committed"):
        rdr2.latestOffset()


@pytest.mark.parametrize("use_state", [True, False])
def test_crash_between_planning_and_commit_intruder(tmp_path, use_state):
    """A batch is planned (offset log written), the driver crashes
    before commit, and a file lands INSIDE the planned span while the
    query is down.  Replaying the batch would deliver different data
    under the same batch id — which an exactly-once sink skips, i.e.
    silent loss.  With stateDir the planning-time WAL makes the
    replay's ``partitions`` raise loudly; without it the weaker
    documented mode absorbs the intruder (indistinguishable from a
    committed file)."""
    d = str(tmp_path / "docs")
    state = str(tmp_path / "state")
    opts = {"path": d}
    if use_state:
        opts["statedir"] = state

    _land(d, "0002.jsonl", [dict(doc_id=2, text="a")])
    rdr = JsonDocsStreamReader(dict(opts))
    end1 = rdr.latestOffset()
    rdr.partitions({"last": ""}, dict(end1))
    rdr.commit(dict(end1))

    _land(d, "0004.jsonl", [dict(doc_id=4, text="b")])
    end2 = rdr.latestOffset()          # batch 2 planned: (0002, 0004]
    assert end2 == {"last": "0004.jsonl"}
    # CRASH before partitions/commit; while down, 0003 lands in-span
    _land(d, "0003.jsonl", [dict(doc_id=3, text="intruder")])

    rdr2 = JsonDocsStreamReader(dict(opts))
    if use_state:
        with pytest.raises(RuntimeError, match="already-planned span"):
            rdr2.partitions(dict(end1), dict(end2))
    else:
        parts = rdr2.partitions(dict(end1), dict(end2))
        got = {row[0] for p in parts for row in rdr2.read(p)}
        assert got == {3, 4}  # replay differs: the documented hole


# --- persisted-state size bound (r10): run-length-encoded seen set ---


@settings(max_examples=150, deadline=None)
@given(names=st.sets(st.one_of(
    # conforming rolled-log names (varied prefix/pad/suffix)
    st.builds(lambda p, w, v, s: f"{p}{str(v).zfill(w)}{s}",
              st.sampled_from(["", "log-", "events.", "p9"]),
              st.integers(1, 6), st.integers(0, 99999),
              st.sampled_from([".jsonl", ".jsonl.gz"])),
    # oddballs: no digits, digits mid-name, weird tails
    st.sampled_from(["nodigits.jsonl", "a1b.jsonl", "x.jsonl.gz",
                     "UPPER-7-x.jsonl", "0.j", "123", "..jsonl"]))))
def test_seen_state_encoding_lossless_roundtrip(names):
    """encode∘decode is the identity on ANY filename set — the late-
    arrival guard's membership test survives the compression exactly
    (a gap name inside a run's span must decode ABSENT)."""
    from nosql_join_stream_spark.pydocsource import (_decode_name_set,
                                                     _encode_name_set)
    assert _decode_name_set(_encode_name_set(names)) == names


def test_seen_state_is_o1_on_rolled_log_and_guard_exact(tmp_path):
    """A 10k-file sequence-numbered rolled log persists O(1) stream
    state (one run, state file under 1 KB — the r9 VERDICT lead: the
    commit used to rewrite all 10k names every micro-batch), restarts
    losslessly, and the below-watermark guard still catches a GAP name
    that a lossy watermark-only encoding would wave through."""
    from nosql_join_stream_spark.pydocsource import (JsonDocsStreamReader,
                                                     _decode_name_set)

    d, state = str(tmp_path / "docs"), str(tmp_path / "state")
    os.makedirs(d)
    # 10k files, one deliberate gap at 5000 (rotated away mid-log)
    for i in range(10_000):
        if i == 5000:
            continue
        with open(os.path.join(d, f"{i:05d}.jsonl"), "w") as fh:
            fh.write(json.dumps({"doc_id": i, "text": "t"}) + "\n")

    rdr = JsonDocsStreamReader({"path": d, "statedir": state})
    end = rdr.latestOffset()
    assert end["last"] == "09999.jsonl"
    st_file = os.path.join(state, "json_docs_stream_state.json")
    size = os.path.getsize(st_file)
    assert size < 1024, f"state file is {size} B for 10k files"
    enc = json.load(open(st_file))["seen"]
    assert len(enc["runs"]) == 2 and enc["names"] == []  # split at the gap

    # lossless restart: the decoded set is exactly the 9 999 files
    rdr2 = JsonDocsStreamReader({"path": d, "statedir": state})
    assert len(rdr2._seen) == 9_999
    assert "05000.jsonl" not in rdr2._seen

    # guard exactness: landing the GAP name below the watermark while
    # down must still raise — the run encoding knows 05000 was absent
    _land(d, "05000.jsonl", [dict(doc_id=-1, text="late")])
    with pytest.raises(RuntimeError, match="below the committed"):
        rdr2.latestOffset()


def test_seen_state_old_list_format_still_restores(tmp_path):
    """Pre-r10 state files persisted the seen set as a plain list;
    a reader restarting from one must restore it unchanged."""
    d, state = str(tmp_path / "docs"), str(tmp_path / "state")
    os.makedirs(d), os.makedirs(state)
    _land(d, "0001.jsonl", [dict(doc_id=1, text="a")])
    with open(os.path.join(state, "json_docs_stream_state.json"),
              "w") as fh:
        json.dump({"watermark": "0001.jsonl",
                   "seen": ["0001.jsonl"]}, fh)
    rdr = JsonDocsStreamReader({"path": d, "statedir": state})
    assert rdr._seen == {"0001.jsonl"}
    assert rdr._watermark == "0001.jsonl"
    assert rdr.latestOffset() == {"last": "0001.jsonl"}
