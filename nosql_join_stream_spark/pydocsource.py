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
  field yields NULL, never an error;
- **FILTER PUSHDOWN** (Spark 4.1 ``DataSourceReader.pushFilters``):
  Catalyst hands the scan its conjunctive predicates; every
  comparison/IN/NULL-test/LIKE-prefix on a declared top column is
  absorbed into the source (the analog of the reference pushing
  ``find(qs.query)`` into the server, storage.scala:597-602) and
  evaluated with SQL three-valued-NULL semantics:
  - **row skipping** executor-side: a non-matching document is
    dropped before its props JSON is ever serialized;
  - **file skipping** driver-side: when the collection carries a
    ``_stats.json`` sidecar (:func:`write_docs_stats` — per-file
    min/max + null flags, the analog of a store's chunk metadata),
    ``partitions()`` plans ONLY files whose stats admit a match, so
    a selective probe of a 10k-file collection schedules a handful
    of tasks instead of 10k.  Pruning is conservative — stats prove
    absence, never presence;
- **projection pushdown by contract**: ``.option("columns",
  "doc_id,lang")`` narrows the declared schema and the per-document
  decode to those columns (the analog of a find() projection) — in
  particular a scan that does not request ``props`` never pays the
  rest-of-document JSON re-serialization.  Spark's Python DS API has
  no automatic required-columns hook yet, so this is an explicit
  reader option rather than a Catalyst-driven one;
- **sort/skip/limit pushdown by contract** (``sort``/``skip``/
  ``limit`` options — the rest of the reference's server-side query
  shape, ``find(q).sort(s).skip(n).limit(m)``,
  storage.scala:597-602): with a sort column and a limit, each file's
  cursor emits only its LOCAL top ``skip+limit`` rows under the
  deterministic order (sort column, then ``doc_id`` as tiebreak;
  NULLS FIRST ascending / NULLS LAST descending, Spark's defaults),
  so a top-40 over a million-document file ships 40 rows, not a
  million; with the stats sidecar, files that provably cannot reach
  the global top — at least ``skip+limit`` rows live in files whose
  sort-column range lies STRICTLY before theirs — are never planned
  at all (limit-based file pruning; applied only when no row-dropping
  filter is pushed, since filters make preceding-row counts
  unprovable).  The source emits a superset of the answer (per-file
  tops); :func:`read_docs_topk` composes the reader options with the
  Spark-side global merge (orderBy + offset + limit over at most
  ``files × (skip+limit)`` rows) — the same split a Mongo driver
  performs when it merge-sorts per-shard cursors.

Registration is per-session (``register_json_docs(spark)``), then
``spark.read.format("json_docs").option("path", dir)`` or
``Engine.load(fmt="json_docs", path=dir)`` reads it like any source.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter, DataSourceWriter,
                                    EqualNullSafe, EqualTo, GreaterThan,
                                    GreaterThanOrEqual, In, InputPartition,
                                    IsNotNull, IsNull, LessThan,
                                    LessThanOrEqual, Not, StringContains,
                                    StringEndsWith, StringStartsWith,
                                    WriterCommitMessage)

FORMAT_NAME = "json_docs"

_ALL_COLS = ["doc_id", "source", "lang", "text", "props"]
_TYPES = {"doc_id": "long", "source": "string", "lang": "string",
          "text": "string", "props": "string"}
_TOP = ["doc_id", "source", "lang", "text"]
_STATS_FILE = "_stats.json"
_STATS_COLS = ("doc_id", "source", "lang")  # text min/max would be huge
_DOC_SUFFIXES = (".jsonl", ".jsonl.gz")  # rolled logs ship gzipped


def _is_doc_file(name: str) -> bool:
    return name.endswith(_DOC_SUFFIXES)


# Final digit run + non-digit tail: "events-0042.jsonl.gz" parses to
# ("events-", "0042", ".jsonl.gz") — the rolled-log sequence-number
# convention the stream source's producer contract mandates.
_SEQ_NAME_RE = re.compile(r"(.*?)(\d+)(\D*)")


def _encode_name_set(names) -> dict:
    """LOSSLESS run-length encoding of a filename set, exploiting the
    stream source's producer contract (zero-padded sequence numbers):
    consecutive same-pattern names collapse to one ``[prefix, suffix,
    width, lo, hi]`` run, non-conforming names stay literal.  A 10k-
    file rolled log encodes to ONE run, so the persisted stream state
    is O(gaps + oddballs), not O(files) — while membership stays
    EXACT: a name inside a run's span that was never present (a gap)
    decodes absent, so the late-arrival guard loses nothing."""
    runs: list[list] = []
    literals: list[str] = []
    parsed: list[tuple] = []
    for n in names:
        m = _SEQ_NAME_RE.fullmatch(n)
        if not m:
            literals.append(n)
            continue
        pre, digits, suf = m.groups()
        parsed.append((pre, suf, len(digits), int(digits)))
    for pre, suf, w, v in sorted(parsed):
        if (runs and runs[-1][0] == pre and runs[-1][1] == suf
                and runs[-1][2] == w and v == runs[-1][4] + 1):
            runs[-1][4] = v
        else:
            runs.append([pre, suf, w, v, v])
    return {"runs": runs, "names": sorted(literals)}


def _decode_name_set(enc) -> set[str]:
    """Inverse of :func:`_encode_name_set`.  Also accepts the pre-r10
    plain-list form (old persisted state files keep restoring)."""
    if isinstance(enc, list):
        return set(enc)
    out = set(enc.get("names", []))
    for pre, suf, w, lo, hi in enc.get("runs", []):
        for i in range(lo, hi + 1):
            out.add(f"{pre}{str(i).zfill(w)}{suf}")
    return out


def _open_doc(path: str, mode: str = "rt"):
    """Text handle for a collection file, transparently gunzipping —
    every cursor (batch, stream, stats, compaction) shares it, so
    ``.jsonl`` and ``.jsonl.gz`` members mix freely in one directory
    (ordering and offsets are by FULL filename either way).  Names
    without the ``.gz`` suffix are magic-sniffed: a reader planned
    over a pending overwrite's STAGED files (suffix ``.inprogress``
    regardless of compression) must still gunzip gzipped bytes, and a
    plain-text ``.jsonl`` can never begin with gzip's 0x1f 0x8b."""
    import gzip
    if path.endswith(".gz"):
        return gzip.open(path, mode, encoding="utf-8")
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, mode, encoding="utf-8")
    return open(path, mode, encoding="utf-8")


class _FilePartition(InputPartition):
    def __init__(self, path: str, fallback: str | None = None):
        self.path = path
        # alternate name holding the SAME bytes: a partition planned
        # against a staged overwrite tmp may be renamed to its final
        # name (roll-forward) between planning and the task's open —
        # the task then falls back instead of crashing the query
        self.fallback = fallback


def _doc_value(doc: dict, col: str):
    v = doc.get(col)
    if col == "doc_id" and v is not None:
        v = int(v)
    return v


def _supported_filter(f) -> bool:
    """Pushable: a comparison/IN/NULL-test/LIKE on ONE declared top
    column (and NOT over such a child — Catalyst sends `a <> 1` as
    Not(EqualTo)).  Anything else stays Spark-side."""
    if isinstance(f, Not):
        return _supported_filter(f.child)
    if not isinstance(f, (EqualTo, EqualNullSafe, GreaterThan,
                          GreaterThanOrEqual, LessThan, LessThanOrEqual,
                          In, IsNull, IsNotNull, StringStartsWith,
                          StringEndsWith, StringContains)):
        return False
    attr = f.attribute
    return len(attr) == 1 and attr[0] in _TOP


def _eval_filter(f, doc: dict):
    """SQL three-valued logic: True / False / None (UNKNOWN).  A row
    survives the scan only if every pushed filter is True — UNKNOWN
    drops it, exactly as Catalyst's Filter would have."""
    if isinstance(f, Not):
        v = _eval_filter(f.child, doc)
        return None if v is None else (not v)
    col = f.attribute[0]
    val = _doc_value(doc, col)
    if isinstance(f, IsNull):
        return val is None
    if isinstance(f, IsNotNull):
        return val is not None
    if isinstance(f, EqualNullSafe):
        return val == f.value  # never UNKNOWN: NULL <=> NULL is True
    if val is None:
        return None
    if isinstance(f, EqualTo):
        return val == f.value
    if isinstance(f, GreaterThan):
        return val > f.value
    if isinstance(f, GreaterThanOrEqual):
        return val >= f.value
    if isinstance(f, LessThan):
        return val < f.value
    if isinstance(f, LessThanOrEqual):
        return val <= f.value
    if isinstance(f, In):
        return val in f.value
    if isinstance(f, StringStartsWith):
        return str(val).startswith(f.value)
    if isinstance(f, StringEndsWith):
        return str(val).endswith(f.value)
    if isinstance(f, StringContains):
        return f.value in str(val)
    raise AssertionError(f"unreachable: {f!r}")  # guarded by _supported


def _file_may_match(f, stats: dict) -> bool:
    """Conservative file-level pruning against sidecar stats
    ({col: {"min":…, "max":…, "has_null":…, "n":…}}).  True unless
    the stats PROVE no row in the file can satisfy ``f``."""
    if isinstance(f, Not):
        return True  # negations don't prune (min/max can't refute)
    col = f.attribute[0]
    s = stats.get(col)
    if s is None:
        return True
    lo, hi = s.get("min"), s.get("max")
    if isinstance(f, IsNull):
        return bool(s.get("has_null", True))
    if isinstance(f, IsNotNull):
        return lo is not None  # min present iff any non-null value
    if isinstance(f, EqualNullSafe) and f.value is None:
        # col <=> NULL MATCHES null rows (unlike every other
        # comparison), so file-level pruning must agree with
        # _eval_filter: the file may match iff it contains nulls
        return bool(s.get("has_null", True))
    if lo is None or hi is None:
        # all-null file: no comparison/IN/LIKE can be True there
        # (the <=> NULL case already returned above)
        return False
    if isinstance(f, (EqualTo, EqualNullSafe)):
        return f.value is not None and lo <= f.value <= hi
    if isinstance(f, GreaterThan):
        return hi > f.value
    if isinstance(f, GreaterThanOrEqual):
        return hi >= f.value
    if isinstance(f, LessThan):
        return lo < f.value
    if isinstance(f, LessThanOrEqual):
        return lo <= f.value
    if isinstance(f, In):
        return any(v is not None and lo <= v <= hi for v in f.value)
    if isinstance(f, StringStartsWith):
        p = f.value
        return str(lo)[:len(p)] <= p <= str(hi)[:len(p)]
    return True  # EndsWith/Contains: min/max can't refute


def write_docs_stats(path: str) -> dict:
    """Build the collection's ``_stats.json`` sidecar — per ``.jsonl``
    file, min/max/has_null/row-count for the prunable top columns —
    the analog of the chunk metadata a document store keeps serverside
    (and of parquet footer stats).  One sequential pass per file at
    ingest time buys file skipping on every subsequent filtered scan.
    Returns the stats dict."""
    _recover_overwrite(path)  # never stat a mid-roll overwrite's mix
    doomed = _compact_pending_deletes(path)
    files = sorted(f for f in os.listdir(path)
                   if _is_doc_file(f) and f not in doomed)
    out: dict[str, dict] = {}
    for fname in files:
        colstats = {c: {"min": None, "max": None, "has_null": False}
                    for c in _STATS_COLS}
        n = 0
        with _open_doc(os.path.join(path, fname)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                n += 1
                try:
                    doc = json.loads(line)
                except json.JSONDecodeError:
                    doc = None
                if not isinstance(doc, dict):
                    # a malformed line (unparseable OR a non-object
                    # top-level value) reads as all-NULL under
                    # mode=PERMISSIVE, so the sidecar must carry the
                    # null flags or IS NULL probes could wrongly skip
                    # the file; min/max stay untouched (conservative)
                    for c in _STATS_COLS:
                        colstats[c]["has_null"] = True
                    continue
                for c in _STATS_COLS:
                    v = _doc_value(doc, c)
                    cs = colstats[c]
                    if v is None:
                        cs["has_null"] = True
                    else:
                        if cs["min"] is None or v < cs["min"]:
                            cs["min"] = v
                        if cs["max"] is None or v > cs["max"]:
                            cs["max"] = v
        out[fname] = {"n": n, **{c: colstats[c] for c in _STATS_COLS}}
    # atomic publish (tmp + rename, like _publish_files and the
    # compaction fold): a crash mid-write must leave the old sidecar
    # or none — a TORN one would poison every subsequent scan
    sidecar = os.path.join(path, _STATS_FILE)
    tmp = sidecar + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"files": out}, fh, sort_keys=True)
    os.replace(tmp, sidecar)
    return out


_COMPACT_MANIFEST = "_compact_manifest.json"


def _compact_pending_deletes(path: str) -> set[str]:
    """Filenames a crashed-but-COMMITTED compaction still owes
    deletion for.  The commit point is the staged tmp file's
    disappearance (``os.replace`` into the target consumes it):
    manifest present + tmp present = uncommitted (directory
    untouched, manifest is dead intent); manifest present + tmp
    absent = committed (the target already holds the merged rows, so
    the doomed originals are duplicates and readers must skip them).
    Because recovery ROLLS BACK by removing the manifest first and
    the tmp second, "tmp absent" alone is ambiguous against a racing
    rollback — so after observing tmp absence we re-read the manifest
    and only trust the delete-list if the SAME intent is still
    published (manifest gone or replaced = that intent was settled or
    superseded; retry against the new one).  Non-mutating — safe
    under concurrent readers."""
    man = os.path.join(path, _COMPACT_MANIFEST)
    for _ in range(8):
        try:
            with open(man, encoding="utf-8") as fh:
                m = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return set()  # no intent (or it was settled mid-read)
        if os.path.exists(os.path.join(path, m["tmp"])):
            return set()   # uncommitted: directory is untouched
        try:
            with open(man, encoding="utf-8") as fh:
                m2 = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return set()   # a rollback/finish consumed the intent
        if m2 == m:
            return set(m["delete"])   # still the same committed intent
        # a new compaction published between our two reads — re-check
    # 8 reads each observed a DIFFERENT manifest: there is no settled
    # delete-set to trust, and guessing empty could plan a committed
    # compaction's doomed originals ALONGSIDE the merged target
    # (duplicate rows — r10 review catch).  Fail loudly; the caller
    # retries against a quieter directory.
    raise RuntimeError(
        "compaction manifests kept superseding each other across 8 "
        "reads; no settled delete-set — retry the read")


def _finish_compact_deletes(path: str, m: dict) -> None:
    """Roll a committed compaction forward: delete the doomed
    originals and fold their sidecar entries into the target's.
    Idempotent — every step tolerates having already happened."""
    for f in m["delete"]:
        try:
            os.remove(os.path.join(path, f))
        except FileNotFoundError:
            pass
    sidecar = os.path.join(path, _STATS_FILE)
    if not os.path.isfile(sidecar):
        return
    with open(sidecar, encoding="utf-8") as fh:
        stats = json.load(fh).get("files", {})
    entries = [stats.get(f) for f in m["delete"] + [m["target"]]]
    if any(e is None for e in entries):
        # a merged-away file had no stats entry: the merged target's
        # true min/max are unknown — drop its entry (a file with no
        # entry is always scanned; pruning stays conservative)
        stats.pop(m["target"], None)
    else:
        merged = {"n": sum(e.get("n", 0) for e in entries)}
        for c in _STATS_COLS:
            vals = [e[c] for e in entries]
            mins = [v["min"] for v in vals if v["min"] is not None]
            maxs = [v["max"] for v in vals if v["max"] is not None]
            merged[c] = {"min": min(mins) if mins else None,
                         "max": max(maxs) if maxs else None,
                         "has_null": any(v["has_null"] for v in vals)}
        stats[m["target"]] = merged
    for f in m["delete"]:
        stats.pop(f, None)
    tmp = sidecar + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"files": stats}, fh, sort_keys=True)
    os.replace(tmp, sidecar)


def _recover_compact(path: str) -> None:
    """Repair a crashed compaction, forward or back, before starting
    a new one.  Tolerates losing a repair race to a concurrent
    repairer (the other one reaching the same end state is success —
    the similarity.py/dedup.py recovery convention)."""
    man = os.path.join(path, _COMPACT_MANIFEST)
    if not os.path.isfile(man):
        return
    try:
        with open(man, encoding="utf-8") as fh:
            m = json.load(fh)
    except FileNotFoundError:
        return
    tmp = os.path.join(path, m["tmp"])
    if os.path.exists(tmp):
        # uncommitted: roll BACK.  Retract the INTENT first, then the
        # staging — in the reverse order, a reader (or a racing
        # repairer) observing "manifest present + tmp absent" in the
        # gap would misread this dead intent as COMMITTED and skip
        # (or delete) the never-merged originals.  A crash between
        # the two removals strands only an orphan tmp, which the
        # pre-intent orphan sweep in compact_json_docs reclaims.
        try:
            os.remove(man)
        except FileNotFoundError:
            pass                # a concurrent repairer beat us to it
        try:
            os.remove(tmp)
        except FileNotFoundError:
            pass
    else:
        # tmp absence alone is ambiguous against a racing rollback
        # (which now removes the manifest before the tmp): re-verify
        # the SAME intent is still published before rolling forward
        try:
            with open(man, encoding="utf-8") as fh:
                m2 = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return              # intent already settled by someone else
        if m2 != m:
            return _recover_compact(path)   # superseded: settle THAT one
        _finish_compact_deletes(path, m)   # committed: roll FORWARD
        try:
            os.remove(man)
        except FileNotFoundError:
            pass


_OVERWRITE_MANIFEST = "_overwrite_manifest.json"


def _overwrite_pending(path: str) -> dict | None:
    """Non-mutating read of a pending overwrite intent (r10).  The
    manifest is the COMMIT POINT of ``mode('overwrite')``: once it is
    durably published (atomic tmp+rename), the overwrite has happened
    logically — the delete-list names are doomed duplicates and the
    ``publish`` map's staged files ARE the collection, wherever the
    physical roll-forward got to.  Returns the manifest dict, or None
    when no overwrite is in flight."""
    man = os.path.join(path, _OVERWRITE_MANIFEST)
    try:
        with open(man, encoding="utf-8") as fh:
            return json.load(fh)
    except (FileNotFoundError, json.JSONDecodeError):
        return None  # absent, or torn mid-publish (tmp not yet renamed)


def _finish_overwrite(path: str, m: dict) -> None:
    """Roll a committed overwrite forward: rename each staged tmp to
    its final name, delete the doomed previous files, rewrite the
    stats sidecar from the manifest's carried stats (the overwrite
    REPLACES the collection, so the sidecar is exactly the new
    files'), and retract the manifest.  Every step is idempotent —
    safe to re-run from any crash point and under a losing repair
    race (the compaction-recovery convention).

    Ordering is load-bearing: overwrite FINALS REUSE the doomed
    files' names (both are ``00000000.jsonl``…), so renames must run
    FIRST — ``os.replace`` atomically clobbers a doomed name with its
    replacement — and a delete-list name that doubles as a final must
    NEVER be explicitly deleted (a recovery re-running after a crash
    between the sidecar write and the manifest retraction would
    otherwise delete the NEW file: tmp already consumed, final just
    removed — unrecoverable data loss; the first fuzz draft had
    exactly this order and the property test caught it)."""
    finals = set(m["publish"].values())
    for tmp, final in m["publish"].items():
        tp, fp = os.path.join(path, tmp), os.path.join(path, final)
        try:
            os.replace(tp, fp)
        except FileNotFoundError:
            # tmp gone: either this rename already ran (idempotent
            # re-entry) or someone deleted committed data externally.
            # The final name may be occupied by the doomed OLD file
            # (names are reused), so "final exists" alone cannot
            # distinguish — the manifest's staged byte size can.
            expect = m.get("bytes", {}).get(final)
            if not os.path.exists(fp) or (
                    expect is not None
                    and os.path.getsize(fp) != expect):
                raise RuntimeError(
                    f"overwrite recovery: staged file {tmp} for "
                    f"final {final} is missing under {path} and the "
                    "final name does not hold the staged bytes — "
                    "external interference; the committed overwrite "
                    "cannot be completed") from None
    for f in m["delete"]:
        if f in finals:
            continue  # already atomically replaced by its successor
        try:
            os.remove(os.path.join(path, f))
        except FileNotFoundError:
            pass
    sidecar = os.path.join(path, _STATS_FILE)
    tmp_sc = sidecar + ".tmp"
    with open(tmp_sc, "w", encoding="utf-8") as fh:
        json.dump({"files": m["stats"]}, fh, sort_keys=True)
    os.replace(tmp_sc, sidecar)
    try:
        os.remove(os.path.join(path, _OVERWRITE_MANIFEST))
    except FileNotFoundError:
        pass  # a concurrent repairer finished first — same end state


def _recover_overwrite(path: str) -> None:
    """Settle a crashed overwrite before any other mutation.  Unlike
    compaction (whose manifest can be UNcommitted while its staged
    tmp survives), the overwrite manifest is only ever written after
    every task file is staged, so a present manifest always means
    COMMITTED — recovery only rolls forward."""
    m = _overwrite_pending(path)
    if m is not None:
        _finish_overwrite(path, m)


def stream_committed_watermark(checkpoint_dir: str,
                               source_index: int = 0) -> str | None:
    """The filename high-watermark a ``json_docs`` STREAM has durably
    COMMITTED past, read from its query's checkpoint — the safe
    ``upto`` for :func:`compact_json_docs` when a live tailer shares
    the directory (files at-or-below it can never be re-planned, so
    merging them cannot change a replayed batch).

    Reads Spark's own offset/commit WALs (``<ckpt>/commits/<n>`` marks
    batch *n* fully committed; ``<ckpt>/offsets/<n>`` line 3+ holds
    each source's serialized offset — ``{"last": <filename>}`` for
    this source).  Returns None when no batch has committed yet
    (compact nothing).  ``source_index`` selects the source for
    multi-source queries (the offsets file carries one line per
    source, in plan order)."""
    cdir = os.path.join(checkpoint_dir, "commits")
    if not os.path.isdir(cdir):
        return None
    ids = [int(f) for f in os.listdir(cdir) if f.isdigit()]
    if not ids:
        return None
    with open(os.path.join(checkpoint_dir, "offsets", str(max(ids))),
              encoding="utf-8") as fh:
        lines = [ln for ln in fh.read().splitlines() if ln.strip()]
    # line 0 = "v1", line 1 = batch metadata, line 2+ = per-source
    sources = lines[2:]
    if source_index >= len(sources):
        raise ValueError(
            f"checkpoint {checkpoint_dir}: batch {max(ids)} has "
            f"{len(sources)} source offset(s), no index {source_index}")
    off = json.loads(sources[source_index])
    if not isinstance(off, dict) or "last" not in off:
        raise ValueError(
            f"checkpoint {checkpoint_dir}: source {source_index} "
            f"offset {off!r} is not a json_docs filename watermark")
    return off["last"] or None


def _compact_group(path: str, eligible: list[str]) -> None:
    """Merge one consecutive group of files into its MAXIMUM name via
    the stage → manifest → commit → finish sequence.  At most one
    group is ever in flight (groups run sequentially), so a crash
    leaves exactly one manifest for recovery to settle."""
    import uuid

    target, doomed = eligible[-1], eligible[:-1]
    tmp_name = f"_tmp-compact-{uuid.uuid4().hex}.inprogress"
    tmp = os.path.join(path, tmp_name)
    # the staged bytes become the TARGET via os.replace, so they must
    # carry the target's compression; members gunzip transparently
    if target.endswith(".gz"):
        import gzip
        out_ctx = gzip.open(tmp, "wt", encoding="utf-8")
    else:
        out_ctx = open(tmp, "w", encoding="utf-8")
    with out_ctx as out:
        for f in eligible:   # name order == scan order; rows verbatim
            with _open_doc(os.path.join(path, f)) as fh:
                for line in fh:
                    if line.strip():
                        out.write(line if line.endswith("\n")
                                  else line + "\n")
    m = {"tmp": tmp_name, "target": target, "delete": doomed}
    man = os.path.join(path, _COMPACT_MANIFEST)
    man_tmp = man + ".tmp"
    with open(man_tmp, "w", encoding="utf-8") as fh:
        json.dump(m, fh)
    os.replace(man_tmp, man)    # intent is durable before any mutation
    # COMMIT: target now holds every row
    os.replace(tmp, os.path.join(path, target))
    _finish_compact_deletes(path, m)
    try:
        os.remove(man)
    except FileNotFoundError:
        pass  # a concurrent repairer rolled us forward first — same end state


class _CompactAll:
    """Singleton sentinel: compact the WHOLE collection (no fence)."""
    def __repr__(self):
        return "ALL"


#: Explicit "no fence — compact every file" marker for
#: :func:`compact_json_docs`.  Distinct from ``None`` on purpose:
#: ``stream_committed_watermark`` returns None for "no batch committed
#: yet", and compacting EVERYTHING in that state would merge files a
#: live tailer has planned but not committed, silently changing the
#: replayed batch (the replay guard checks only filenames).  With ALL
#: as the sentinel, the natural composition
#: ``compact_json_docs(d, upto=stream_committed_watermark(ckpt))`` is
#: a safe no-op until the first commit.
ALL = _CompactAll()


def compact_json_docs(path: str, upto=ALL,
                      group_bytes: int | None = None) -> dict:
    """Small-file compaction for a document collection — the
    connector-side analog of ``sinks.compact`` (a store compacts its
    chunks server-side; a rolled log's consumer does it here).  Merges
    every ``.jsonl`` file at-or-below ``upto`` (every file when
    ``upto=ALL``, the default; a NO-OP when ``upto=None``, which is
    what ``stream_committed_watermark`` returns before any batch has
    committed — "nothing is fenced yet" must never widen to
    "everything")
    into the group's MAXIMUM name, preserving both row content and
    the streaming source's filename contract: the surviving name is
    the group's max, so a tailing ``json_docs`` stream's watermark
    and seen set stay valid — merged-away names vanish like rotation
    (pruned at the stream's next commit), the target name was already
    seen, and nothing ever re-lands below the watermark.

    Crash-safe via an intent manifest: rows are staged to an
    invisible tmp file, the manifest (tmp, target, delete-list) is
    published atomically, and ``os.replace(tmp, target)`` is the
    commit point — a crash before it rolls back, after it rolls
    forward (readers skip the doomed originals meanwhile via
    ``_compact_pending_deletes``, so even the crash window never
    double-reads).  Compact only files the stream has COMMITTED past
    (``upto`` = the checkpointed watermark) if a live tailer shares
    the directory — merging files an in-flight batch still references
    would change that batch under replay.  A concurrent BATCH scan
    planned in the instant between the commit point and the deletes
    can still observe both an original and the merged target — the
    usual directory-as-table caveat (same window as the writer's
    overwrite commit); run compaction write-quiesced.  ONE compactor
    at a time (it is a maintenance op): the orphan sweep below would
    pull the staging out from under a concurrent compactor — which
    fails that compactor loudly and harmlessly (its manifest is
    published after staging, so no recovery path can misread the
    swept state as committed), but the run is wasted.

    ``group_bytes`` bounds the merge — consecutive files accumulate
    into a group until its bytes reach the threshold, and each group
    merges into ITS OWN maximum name.  This is the scale knob: the
    source plans one partition per file, so compacting a large
    collection to a single file would serialize its scan; sized
    groups keep read parallelism while still collapsing the
    small-file tail.  Every group's surviving name is a name the
    stream already watermarked past, so the contract holds per group.
    ``group_bytes=None`` (the default) merges everything eligible
    into one file."""
    if upto is None:
        # the un-committed-tailer guard: see the ALL sentinel's note
        files0 = sorted(f for f in os.listdir(path) if _is_doc_file(f))
        return {"merged": 0, "targets": [], "files_before": len(files0),
                "files_after": len(files0)}
    _recover_compact(path)
    _recover_overwrite(path)  # a mid-roll overwrite owns its files
    # sweep pre-intent orphans: a crash BEFORE the manifest published
    # leaves staging files no recovery path owns (invisible to
    # readers — not .jsonl — but they'd accumulate forever)
    for f in os.listdir(path):
        if (f.startswith("_tmp-compact-") and f.endswith(".inprogress")
                or f == _COMPACT_MANIFEST + ".tmp"):
            try:
                os.remove(os.path.join(path, f))
            except FileNotFoundError:
                pass
    files = sorted(f for f in os.listdir(path) if _is_doc_file(f))
    eligible = [f for f in files if upto is ALL or f <= upto]
    if group_bytes is None:
        groups = [eligible]
    else:
        groups, cur, cur_bytes = [], [], 0
        for f in eligible:
            cur.append(f)
            cur_bytes += os.path.getsize(os.path.join(path, f))
            if cur_bytes >= group_bytes:
                groups.append(cur)
                cur, cur_bytes = [], 0
        if cur:
            groups.append(cur)
    groups = [g for g in groups if len(g) >= 2]
    if not groups:
        return {"merged": 0, "targets": [], "files_before": len(files),
                "files_after": len(files)}
    for g in groups:
        _compact_group(path, g)
    merged = sum(len(g) for g in groups)
    return {"merged": merged, "targets": [g[-1] for g in groups],
            "files_before": len(files),
            "files_after": len(files) - (merged - len(groups))}


def _parse_sort_options(options):
    """Parse ``sort`` ("col" / "col asc" / "col desc"), ``skip`` and
    ``limit`` reader options.  Returns (col, ascending, skip, limit)
    with col=None when no sort was requested."""
    sort_opt = options.get("sort")
    skip = int(options.get("skip", 0))
    limit = options.get("limit")
    limit = int(limit) if limit is not None else None
    if skip < 0:
        raise ValueError("json_docs: skip must be >= 0")
    if limit is not None and limit < 0:
        raise ValueError("json_docs: limit must be >= 0")
    if not sort_opt:
        if skip:
            raise ValueError("json_docs: skip requires a sort option "
                             "(a skip without an order is undefined)")
        return None, True, skip, limit
    parts = sort_opt.strip().split()
    if len(parts) not in (1, 2) or (
            len(parts) == 2 and parts[1].lower() not in ("asc", "desc")):
        raise ValueError(
            f"json_docs: bad sort option {sort_opt!r}; expected "
            "'<col>', '<col> asc' or '<col> desc'")
    col = parts[0]
    if col not in _TOP:
        raise ValueError(
            f"json_docs: sort column {col!r} not in {_TOP}")
    ascending = len(parts) == 1 or parts[1].lower() == "asc"
    return col, ascending, skip, limit


def _sort_doc_key(doc: dict, col: str):
    """Deterministic per-document order key matching the Spark-side
    finish (sort col with Spark default null placement, doc_id asc
    tiebreak).  Two-level tuples keep None comparable: the flag
    decides the null group, the value only compares within it."""
    v = _doc_value(doc, col)
    did = _doc_value(doc, "doc_id")
    return ((v is not None, v if v is not None else 0),
            (did is not None, did if did is not None else 0))


def _local_topk_pairs(rows_with_keys, ascending: bool, k: int):
    """Top-``k`` (row, key) pairs of one file under the deterministic
    order.  Two stable sorts: tiebreak (doc_id asc) first, then the
    sort column — ``reverse`` for descending flips ONLY the main key
    (stable sort keeps equal-key rows in doc_id-asc order) and, with
    the not-null flag leading the key, lands nulls FIRST ascending /
    LAST descending, Spark's defaults."""
    rows_with_keys.sort(key=lambda rk: rk[1][1])
    rows_with_keys.sort(key=lambda rk: rk[1][0], reverse=not ascending)
    return rows_with_keys[:k]


_MODES = ("FAILFAST", "DROPMALFORMED", "PERMISSIVE")


def _parse_mode_option(options) -> str:
    """Malformed-line policy, Spark's json reader vocabulary with the
    OPPOSITE default: FAILFAST (the reference's fail-fast error
    propagation, mongo/package.scala onError — a store surfaces a
    broken document as a query error, not a silent hole).
    DROPMALFORMED skips bad lines; PERMISSIVE yields them with every
    typed column NULL and the raw line under ``_corrupt_record`` in
    the schemaless ``props`` JSON (the fixed-schema analog of
    columnNameOfCorruptRecord).  Malformed = the LINE fails to parse
    as JSON or parses to a non-object top-level value; type drift
    inside a valid document is the decode contract's territory
    (Option-safe NULLs), not this option's."""
    mode = (options.get("mode") or "FAILFAST").upper()
    if mode not in _MODES:
        raise ValueError(
            f"json_docs: unknown mode {options.get('mode')!r}; "
            f"expected one of {list(_MODES)}")
    return mode


def _malformed_doc(mode: str, path: str, lineno: int, line: str,
                   err: Exception) -> dict | None:
    """Resolve one malformed line under ``mode``: raise, skip (None),
    or a marker doc that flows through the NORMAL row machinery —
    every typed column reads as missing (NULL, filters three-valued to
    dropped, sort keys to the null group) and the raw line lands in
    props."""
    if mode == "FAILFAST":
        raise ValueError(
            f"json_docs: malformed JSON at {path} line {lineno}: {err} "
            "(mode=FAILFAST is the default; use DROPMALFORMED to skip "
            "or PERMISSIVE to keep the raw line)") from err
    if mode == "DROPMALFORMED":
        return None
    return {"_corrupt_record": line}


def _parse_compression_option(options) -> bool:
    """Writer-side: ``.option('compression', 'gzip')`` publishes
    ``.jsonl.gz`` members (staged gzipped, renamed at commit — the
    same transactional shape); 'none'/absent writes plain.  Readers
    need no option: the cursor dispatches on each file's suffix."""
    comp = (options.get("compression") or "none").lower()
    if comp in ("none", "uncompressed"):
        return False
    if comp == "gzip":
        return True
    raise ValueError(
        f"json_docs: unsupported compression {options.get('compression')!r};"
        " expected 'gzip' or 'none'")


def _parse_columns_option(options) -> list[str]:
    cols_opt = options.get("columns")
    if not cols_opt:
        return list(_ALL_COLS)
    cols = [c.strip() for c in cols_opt.split(",") if c.strip()]
    bad = [c for c in cols if c not in _ALL_COLS]
    if bad:
        raise ValueError(
            f"json_docs: unknown columns {bad}; available: {_ALL_COLS}")
    return cols


class JsonDocsReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs requires .option('path', <dir or file>)")
        self.columns = _parse_columns_option(options)
        self.mode = _parse_mode_option(options)
        (self.sort_col, self.ascending,
         self.skip, self.limit) = _parse_sort_options(options)
        self.pushed: list = []

    def pushFilters(self, filters):
        # absorb what the store can evaluate; yield back the rest for
        # Spark to re-check (the contract: returned = still-needed)
        for f in filters:
            if _supported_filter(f):
                self.pushed.append(f)
            else:
                yield f

    def _stats(self):
        sidecar = os.path.join(self.path, _STATS_FILE)
        if not os.path.isfile(sidecar):
            return None
        with open(sidecar, encoding="utf-8") as fh:
            return json.load(fh).get("files", {})

    def partitions(self):
        # one partition per file — the chunk/token-range analog; a
        # directory of N files scans N-wide.  With a stats sidecar,
        # files the pushed filters prove empty are never planned.
        if os.path.isfile(self.path):
            return [_FilePartition(self.path)]
        ow = _overwrite_pending(self.path)
        if ow is not None:
            # a COMMITTED overwrite is mid-roll: the manifest IS the
            # collection.  Plan exactly its publish set — final names
            # already renamed read in place, still-staged ones read
            # through their tmp path (same bytes; _open_doc sniffs
            # compression) — and never the doomed previous files.
            # The manifest's carried stats are the authoritative
            # sidecar: the on-disk one may still describe the doomed
            # files under REUSED final names.
            paths = {}
            fallbacks = {}
            for tmp, final in ow["publish"].items():
                tp = os.path.join(self.path, tmp)
                # prefer the tmp WHILE IT EXISTS: finals reuse doomed
                # names, so "final exists" may be the doomed OLD file
                # (rename not yet run) — the tmp's existence is the
                # unambiguous signal
                paths[final] = tp if os.path.exists(tp) \
                    else os.path.join(self.path, final)
                fallbacks[final] = os.path.join(self.path, final)
            files = sorted(paths)
            stats = ow["stats"]
        else:
            doomed = _compact_pending_deletes(self.path)
            files = sorted(f for f in os.listdir(self.path)
                           if _is_doc_file(f) and f not in doomed)
            paths = {f: os.path.join(self.path, f) for f in files}
            fallbacks = {}
            stats = self._stats()
        if not files:
            raise ValueError(
                f"no .jsonl/.jsonl.gz files under {self.path}")
        if stats is not None and self.pushed:
            files = [f for f in files
                     if all(_file_may_match(p, stats.get(f, {}))
                            for p in self.pushed)]
        files = self._prune_by_limit(files, stats)
        return [_FilePartition(paths[f], fallbacks.get(f))
                for f in files]

    def _prune_by_limit(self, files, stats):
        """Limit-based file pruning: drop file F when at least
        ``skip+limit`` rows live in files whose sort-column range
        lies STRICTLY before F's — those rows beat every row of F
        under any tiebreak, so F cannot reach the global top.  Only
        sound when no pushed filter drops rows (a filter makes the
        preceding-row counts unprovable) and every preceding file is
        null-free on the sort column (ascending: an unknown null
        count can't prove precedence under NULLS LAST... conversely a
        candidate file that may HOLD nulls sorts some rows first
        ascending, so it is never pruned)."""
        if (stats is None or self.pushed or self.limit is None
                or self.sort_col not in _STATS_COLS):
            return files
        k = self.skip + self.limit
        kept = []
        for f in files:
            s = (stats.get(f) or {}).get(self.sort_col) or {}
            lo, hi = s.get("min"), s.get("max")
            if lo is None or hi is None or s.get("has_null", True):
                kept.append(f)  # unknown range / may hold nulls:
                continue        # nulls sort first asc, keep the file
            preceding = 0
            for g in files:
                if g == f:
                    continue
                gs = (stats.get(g) or {}).get(self.sort_col) or {}
                glo, ghi = gs.get("min"), gs.get("max")
                if glo is None or ghi is None or gs.get(
                        "has_null", True):
                    continue  # can't prove this file precedes
                if (ghi < lo) if self.ascending else (glo > hi):
                    preceding += int((stats.get(g) or {}).get("n", 0))
            if preceding < k:
                kept.append(f)
        return kept

    def read(self, partition):
        # per-partition cursor scan, executed ON THE EXECUTOR — the
        # driver never touches document bytes; pushed filters drop
        # non-matching docs BEFORE any output assembly (in particular
        # before the props JSON re-serialization)
        if partition is None:
            # every file was pruned: batch planning coerced the empty
            # partition list to one None partition — an empty scan
            return
        cols, pushed = self.columns, self.pushed
        sort_col, limit = self.sort_col, self.limit
        k = (self.skip + limit) if limit is not None else None
        kept: list = []  # (row, key) when truncating to a local top-k
        try:
            fh_ctx = _open_doc(partition.path)
        except FileNotFoundError:
            # the planned tmp was rolled forward to its final name
            # between planning and this open (r10 review catch) —
            # same bytes under the fallback name, or a real error
            if not (partition.fallback
                    and os.path.exists(partition.fallback)):
                raise
            fh_ctx = _open_doc(partition.fallback)
        with fh_ctx as fh:
            for lineno, line in enumerate(fh, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    doc = json.loads(line)
                except json.JSONDecodeError as e:
                    doc = _malformed_doc(self.mode, partition.path,
                                         lineno, line, e)
                    if doc is None:
                        continue
                else:
                    if not isinstance(doc, dict):
                        doc = _malformed_doc(
                            self.mode, partition.path, lineno, line,
                            ValueError("top-level JSON value is not "
                                       "an object"))
                        if doc is None:
                            continue
                if any(_eval_filter(p, doc) is not True for p in pushed):
                    continue
                row = []
                for c in cols:
                    if c == "props":
                        rest = {k2: v for k2, v in doc.items()
                                if k2 not in _TOP}
                        row.append(json.dumps(rest, sort_keys=True)
                                   if rest else None)
                    else:
                        row.append(_doc_value(doc, c))
                if k is None:
                    yield tuple(row)
                elif sort_col is None:
                    # limit without sort: ANY k rows satisfy the
                    # contract — stop the cursor at k (early exit)
                    yield tuple(row)
                    k -= 1
                    if k <= 0:
                        return
                else:
                    kept.append((tuple(row),
                                 _sort_doc_key(doc, sort_col)))
                    if len(kept) >= 2 * k:
                        # bound the cursor's memory at O(k): compact
                        # to the running top-k (amortized O(n log k))
                        kept = _local_topk_pairs(
                            kept, self.ascending, k)
        if k is not None and sort_col is not None:
            yield from (r for r, _ in
                        _local_topk_pairs(kept, self.ascending, k))


def _read_jsonl(path: str, cols=None, mode: str = "FAILFAST"):
    """Per-file cursor yielding tuples in ``cols`` order (default: the
    full declared schema) — the stream reader shares it, so a
    ``columns``-narrowed schema and the emitted row arity always agree
    (r7-ADVICE: the stream used to emit full 5-tuples regardless)."""
    cols = list(_ALL_COLS) if cols is None else cols
    with _open_doc(path) as fh:
        for lineno, line in enumerate(fh, 1):
            line = line.strip()
            if not line:
                continue
            try:
                doc = json.loads(line)
            except json.JSONDecodeError as e:
                doc = _malformed_doc(mode, path, lineno, line, e)
                if doc is None:
                    continue
            else:
                if not isinstance(doc, dict):
                    doc = _malformed_doc(
                        mode, path, lineno, line,
                        ValueError("top-level JSON value is not "
                                   "an object"))
                    if doc is None:
                        continue
            row = []
            for c in cols:
                if c == "props":
                    rest = {k: v for k, v in doc.items() if k not in _TOP}
                    row.append(json.dumps(rest, sort_keys=True)
                               if rest else None)
                else:
                    row.append(_doc_value(doc, c))
            yield tuple(row)


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
    directory.

    **Producer contract: filenames must arrive in lexicographically
    INCREASING order** (zero-padded sequence numbers, as a rolled log
    writes them).  A file landing at-or-below the current watermark
    (multi-producer races, retried uploads, unpadded names) would
    otherwise be silently unread forever — so ``latestOffset``
    tracks the filenames it has already watermarked past and RAISES
    on a late-arriving below-watermark name instead of losing data
    silently.

    The detection state is driver-memory by default, which bounds the
    guarantee (r7-ADVICE): after a query RESTART the in-memory state
    is empty, so a file that landed at-or-below the committed offset
    while the query was DOWN is indistinguishable from one that was
    already read, and restarts re-arm the guard only against late
    arrivals that happen afterwards.  ``.option('stateDir', <dir>)``
    closes that hole: the watermark + seen set persist there (atomic
    tmp-file + rename) at PLANNING time (``latestOffset``) and again
    at ``commit`` — the ``FileStreamSource`` WAL discipline —
    ``__init__`` restores them, a below-watermark file present at
    restart raises exactly like a live late arrival, and a file that
    landed INSIDE a planned-but-uncommitted span while the query was
    down trips ``partitions``'s replay-determinism guard instead of
    silently changing the batch a retried sink would skip.  Without
    ``stateDir`` the weaker in-memory behavior is documented, not
    promised away.

    Supports ``.option('columns', ...)`` with the same projection
    contract as the batch reader (the declared schema and the emitted
    row arity always agree) and ``.option('mode', ...)`` with the same
    malformed-line policy (FAILFAST default / DROPMALFORMED /
    PERMISSIVE).  ``sort``/``skip``/``limit`` are cursor-shape options
    with no streaming meaning and raise."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs requires .option('path', <dir>)")
        for opt in ("sort", "skip", "limit"):
            if options.get(opt):
                raise ValueError(
                    f"json_docs: .option('{opt}', ...) applies to batch "
                    "reads only — a stream has no bounded cursor to "
                    "sort/skip/limit; apply the operation on the "
                    "streaming DataFrame instead")
        self.columns = _parse_columns_option(options)
        self.mode = _parse_mode_option(options)
        self._seen: set[str] = set()
        self._watermark = ""
        self._state_dir = options.get("statedir") or options.get("stateDir")
        if self._state_dir:
            st = os.path.join(self._state_dir, "json_docs_stream_state.json")
            if os.path.exists(st):
                with open(st, encoding="utf-8") as fh:
                    state = json.load(fh)
                self._seen = _decode_name_set(state["seen"])
                self._watermark = state["watermark"]

    def initialOffset(self):
        return {"last": ""}

    def _guard_overwrite(self):
        """mode('overwrite') under a live tailer is UNDEFINED: the
        overwrite reuses filenames at-or-below the tailer's watermark,
        so its files would be silently absorbed by the seen set (the
        deleted-then-recreated ghost rule) and never delivered.  A
        present overwrite manifest — mid-commit or crashed — makes
        every subsequent poll and replay fail loudly instead (r10)."""
        if _overwrite_pending(self.path) is not None:
            raise RuntimeError(
                f"json_docs stream at {self.path}: an overwrite "
                "manifest is present — mode('overwrite') replaced the "
                "collection under a live tailer, whose watermark/seen "
                "state no longer describes the directory.  Restart "
                "the query with a fresh checkpoint (overwrite+tail is "
                "undefined; use append, whose names land above the "
                "watermark)")

    def latestOffset(self):
        self._guard_overwrite()
        doomed = _compact_pending_deletes(self.path)
        files = sorted(f for f in os.listdir(self.path)
                       if _is_doc_file(f) and f not in doomed)
        late = [f for f in files
                if f <= self._watermark and f not in self._seen]
        if late:
            raise RuntimeError(
                f"json_docs stream at {self.path}: file(s) {late} "
                f"arrived at or below the committed watermark "
                f"'{self._watermark}' and would never be read — the "
                "source requires lexicographically increasing "
                "filenames (zero-padded sequence numbers); re-land "
                "the data under a name above the watermark")
        changed = (not set(files) <= self._seen
                   or bool(files and files[-1] > self._watermark))
        self._seen.update(files)
        if files:
            self._watermark = max(self._watermark, files[-1])
        # WAL at PLANNING time, not just commit (the FileStreamSource
        # discipline): a crash between planning a batch and committing
        # it must not forget which files the batch contained, or a
        # file landing inside the planned span while the query is down
        # would be silently folded into the replay — which an
        # exactly-once sink then skips wholesale (silent loss).  With
        # the planning-time WAL, the restart restores the planned
        # watermark+seen and the intruder trips the guard instead.
        if self._state_dir and changed:
            self._persist_state()
        return {"last": files[-1]} if files else {"last": ""}

    def partitions(self, start, end):
        # the restored committed offset is the floor of the guard:
        # never let the watermark sit below what is already committed —
        # and files at-or-below a COMMITTED offset are by definition
        # already read, so they must count as seen, or the next
        # latestOffset() after a checkpointed restart would misread
        # every committed file as a late arrival and raise
        self._guard_overwrite()
        doomed = _compact_pending_deletes(self.path)
        if start["last"] > self._watermark:
            self._watermark = start["last"]
            self._seen.update(
                f for f in os.listdir(self.path)
                if _is_doc_file(f) and f <= start["last"])
        files = sorted(
            f for f in os.listdir(self.path)
            if _is_doc_file(f) and f not in doomed
            and f > start["last"] and f <= end["last"])
        # Replay determinism guard (stateDir only — without persisted
        # state a restart cannot tell an intruder from a committed
        # file): a file inside the replayed span that the planning-time
        # WAL never saw means the batch's content would silently differ
        # from what the sink already (maybe) committed under this batch
        # id.  Raise rather than re-deliver a different batch.
        if self._state_dir:
            intruders = [f for f in files
                         if f <= self._watermark and f not in self._seen]
            if intruders:
                raise RuntimeError(
                    f"json_docs stream at {self.path}: file(s) "
                    f"{intruders} landed inside the already-planned "
                    f"span (start {start['last']!r}, end "
                    f"{end['last']!r}] after planning — replaying "
                    "this batch would deliver different data under "
                    "the same batch id; re-land the data above the "
                    "watermark")
        # an empty batch still needs a plan: zero partitions is legal
        return [_FilePartition(os.path.join(self.path, f))
                for f in files]

    def read(self, partition):
        return _read_jsonl(partition.path, self.columns, self.mode)

    def _persist_state(self) -> None:
        os.makedirs(self._state_dir, exist_ok=True)
        st = os.path.join(self._state_dir, "json_docs_stream_state.json")
        tmp = st + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            # run-length-encoded (lossless): O(gaps + oddball names)
            # on disk for a sequence-numbered rolled log, not O(files)
            json.dump({"watermark": self._watermark,
                       "seen": _encode_name_set(self._seen)}, fh)
        os.replace(tmp, st)  # atomic: a crash leaves old or new, never half

    def commit(self, end):
        if not self._state_dir:
            return  # offsets are filenames; nothing to release
        # Bound the persisted seen-set to files still in the directory
        # (r8-ADVICE: unbounded growth for a long-lived rolled log).
        # State is O(current files), not O(files ever): a seen file
        # that rotation deleted is dropped, and if the same name ever
        # RE-LANDS below the watermark it raises as a late arrival —
        # the loud behavior, since a deleted-then-recreated name means
        # a retried upload whose first copy was already consumed.
        current = {f for f in os.listdir(self.path)
                   if _is_doc_file(f)}
        self._seen &= current
        self._persist_state()


class _JsonDocsCommit(WriterCommitMessage):
    """Per-task commit message: the staged tmp filename plus the
    per-file column stats computed while writing (so the driver can
    maintain the ``_stats.json`` sidecar without re-reading files).
    Must be picklable — plain attributes only."""

    def __init__(self, tmp_name: str | None, n: int, stats: dict):
        self.tmp_name = tmp_name
        self.n = n
        self.stats = stats


def _row_to_doc(row, fields: list[str]) -> dict:
    """One output document from one Row: typed top columns become
    fields (NULL → field ABSENT, the reader's missing-field contract
    in reverse), and a ``props`` JSON string splats its keys back as
    schemaless fields (the reader packs non-top keys into props; the
    writer reverses it, so read → write → read is the identity).  Top
    columns win over a conflicting props key."""
    doc: dict = {}
    props_raw = None
    for name, val in zip(fields, row):
        if name == "props":
            props_raw = val
        elif val is not None:
            doc[name] = int(val) if name == "doc_id" else val
    if props_raw:
        rest = json.loads(props_raw)
        if not isinstance(rest, dict):
            raise ValueError(
                "json_docs writer: props must be a JSON object string, "
                f"got {props_raw!r}")
        for k, v in rest.items():
            if k not in _TOP and v is not None:
                doc[k] = v
    return doc


def _file_stats_accumulate(doc: dict, colstats: dict) -> None:
    for c in _STATS_COLS:
        v = _doc_value(doc, c)
        cs = colstats[c]
        if v is None:
            cs["has_null"] = True
        else:
            if cs["min"] is None or v < cs["min"]:
                cs["min"] = v
            if cs["max"] is None or v > cs["max"]:
                cs["max"] = v


def _validate_write_schema(schema) -> list[str]:
    fields = [f.name for f in schema.fields]
    bad = [c for c in fields if c not in _ALL_COLS]
    if bad:
        raise ValueError(
            f"json_docs writer: unknown columns {bad}; a document "
            f"collection has {_ALL_COLS} (put schemaless fields in a "
            "props JSON-object string)")
    return fields


def _write_task_file(path: str, fields: list[str],
                     iterator, gz: bool = False) -> _JsonDocsCommit:
    """Executor-side write of one task's rows to a uniquely-named tmp
    file under ``path`` (never visible to readers: no ``.jsonl``
    suffix until the driver's commit renames it).  Computes sidecar
    stats in the same pass.  ``gz`` stages gzipped bytes — the
    driver's commit then publishes under a ``.jsonl.gz`` name."""
    import uuid

    os.makedirs(path, exist_ok=True)
    colstats = {c: {"min": None, "max": None, "has_null": False}
                for c in _STATS_COLS}
    n = 0
    tmp_name = f"_tmp-{uuid.uuid4().hex}.jsonl.inprogress"
    tmp = os.path.join(path, tmp_name)
    if gz:
        import gzip
        ctx = gzip.open(tmp, "wt", encoding="utf-8")
    else:
        ctx = open(tmp, "w", encoding="utf-8")
    with ctx as fh:
        for row in iterator:
            doc = _row_to_doc(row, fields)
            _file_stats_accumulate(doc, colstats)
            fh.write(json.dumps(doc, sort_keys=True) + "\n")
            n += 1
    if n == 0:  # empty task → no file (a reader partition costs a task)
        os.remove(tmp)
        return _JsonDocsCommit(None, 0, {})
    return _JsonDocsCommit(tmp_name, n,
                           {"n": n, **{c: colstats[c]
                                       for c in _STATS_COLS}})


def _publish_files(path: str, messages, name_for) -> None:
    """Driver-side commit: rename each staged tmp file to its final
    ``.jsonl`` name (task-index order → deterministic names) and fold
    the tasks' stats into the ``_stats.json`` sidecar atomically.  A
    partial sidecar stays CORRECT: the reader scans any file it has
    no entry for (pruning is conservative), so a crash between the
    renames and the sidecar write only costs pruning, never rows."""
    os.makedirs(path, exist_ok=True)  # zero-task batch still commits
    sidecar = os.path.join(path, _STATS_FILE)
    stats: dict = {}
    if os.path.isfile(sidecar):
        with open(sidecar, encoding="utf-8") as fh:
            stats = json.load(fh).get("files", {})
    i = 0
    for m in messages:
        if m is None or m.tmp_name is None:
            continue
        final = name_for(i)
        os.replace(os.path.join(path, m.tmp_name),
                   os.path.join(path, final))
        stats[final] = m.stats
        i += 1
    tmp = sidecar + ".tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump({"files": stats}, fh, sort_keys=True)
    os.replace(tmp, sidecar)


def _abort_files(path: str, messages) -> None:
    for m in messages:
        if m is not None and m.tmp_name is not None:
            try:
                os.remove(os.path.join(path, m.tmp_name))
            except FileNotFoundError:
                pass  # never written, or another cleaner got it


class JsonDocsWriter(DataSourceWriter):
    """Batch write path for the document collection — the connector
    seam's SINK half (the reference's sinks are live-store inserts,
    storage.scala:661-699; same staged-commit shape here, minus the
    wire protocol).  Executor tasks stage uniquely-named tmp files in
    parallel; the driver's ``commit`` renames them to their final
    names and updates the stats sidecar, so a FAILED JOB never
    publishes partial data (tmp names are invisible to readers and
    removed by ``abort``).

    ``mode('overwrite')`` is crash-ATOMIC via an intent manifest
    (r10; previously the delete-old + rename-new sequence could leave
    a mixed directory): after every task file is staged, the driver
    publishes ``_overwrite_manifest.json`` (delete-list + tmp→final
    map + new sidecar stats) with an atomic rename — THAT is the
    commit point.  Before it, readers see the old collection intact;
    after it, readers resolve the manifest (skipping doomed names and
    reading still-staged finals through their tmp paths), recovery
    rolls the physical roll-forward to completion from any crash
    point, and every writer/compactor settles a pending manifest
    before mutating.  ``append``
    names new files strictly ABOVE every existing name (the stem of
    the current maximum + ``_<seq>``), preserving the streaming
    source's lexicographically-increasing-filenames contract, so a
    live ``json_docs`` stream on the same directory picks appended
    batches up as ordinary new arrivals."""

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs writer requires .option('path', <dir>)")
        self.fields = _validate_write_schema(schema)
        self.overwrite = overwrite
        self.gz = _parse_compression_option(options)

    def write(self, iterator):
        return _write_task_file(self.path, self.fields, iterator,
                                gz=self.gz)

    def commit(self, messages):
        os.makedirs(self.path, exist_ok=True)  # empty-input write
        # settle any crashed compaction/overwrite first: a stale
        # manifest's delete-list must never outlive THIS commit, or
        # its later roll-forward would delete new files reusing
        # doomed names
        _recover_compact(self.path)
        _recover_overwrite(self.path)
        existing = sorted(f for f in os.listdir(self.path)
                          if _is_doc_file(f))
        ext = ".jsonl.gz" if self.gz else ".jsonl"
        if self.overwrite:
            live = [m for m in messages
                    if m is not None and m.tmp_name is not None]
            publish = {m.tmp_name: f"{i:08d}{ext}"
                       for i, m in enumerate(live)}
            man = {"delete": existing, "publish": publish,
                   "stats": {publish[m.tmp_name]: m.stats
                             for m in live},
                   # staged byte sizes: recovery's discriminator for
                   # "rename already ran" vs "tmp deleted externally"
                   # on the reused final names
                   "bytes": {publish[m.tmp_name]: os.path.getsize(
                       os.path.join(self.path, m.tmp_name))
                       for m in live}}
            man_path = os.path.join(self.path, _OVERWRITE_MANIFEST)
            tmp = man_path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as fh:
                json.dump(man, fh, sort_keys=True)
            os.replace(tmp, man_path)  # ← the overwrite commit point
            _finish_overwrite(self.path, man)
            return
        if existing:
            stem = existing[-1]
            for suf in _DOC_SUFFIXES:
                if stem.endswith(suf):
                    stem = stem[: -len(suf)]
                    break
            prefix = stem + "_"
        else:
            prefix = ""
        _publish_files(self.path, messages,
                       lambda i: f"{prefix}{i:08d}{ext}")

    def abort(self, messages):
        _abort_files(self.path, messages)


def _retract_batch(path: str, batchId: int) -> None:
    """Remove any published ``b<batchId>-*`` doc files (and their
    sidecar entries) left by a CRASHED earlier commit attempt of the
    same batch.  A replay re-runs the batch's tasks, and nothing
    guarantees the retry shards rows into the same number of task
    files — without this retraction a retry that publishes FEWER
    files than the crashed attempt leaves the stale surplus in place,
    i.e. duplicated rows under the exactly-once claim.  Retract-then-
    publish makes the replayed commit wholesale idempotent: the batch
    prefix ``b<batchId:012d>-`` namespaces exactly the files this
    attempt owns, so nothing else is ever touched."""
    prefix = f"b{batchId:012d}-"
    stale = [f for f in os.listdir(path)
             if f.startswith(prefix) and _is_doc_file(f)]
    if not stale:
        return
    for f in stale:
        try:
            os.remove(os.path.join(path, f))
        except FileNotFoundError:
            pass
    sidecar = os.path.join(path, _STATS_FILE)
    if os.path.isfile(sidecar):
        with open(sidecar, encoding="utf-8") as fh:
            stats = json.load(fh).get("files", {})
        for f in stale:
            stats.pop(f, None)
        tmp = sidecar + ".tmp"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"files": stats}, fh, sort_keys=True)
        os.replace(tmp, sidecar)


class JsonDocsStreamWriter(DataSourceStreamWriter):
    """Streaming sink twin: each micro-batch's tasks stage tmp files;
    ``commit(messages, batchId)`` publishes them under
    ``b<batchId>-<task>.jsonl`` — batch ids are monotonically
    increasing, so filenames stay lexicographically increasing across
    batches and the directory remains a valid ``json_docs`` STREAM
    SOURCE (a materialized changelog another query can tail).

    Fault contract (reference resource-safety discipline,
    storage.scala:661-699, under sink replay):

    - a FAILED TASK's staged tmp never publishes (only messages that
      reach the driver are renamed; its retry stages a fresh
      uuid-named tmp, so the orphan is inert — invisible to readers);
    - a FAILED BATCH's surviving tmps are removed by ``abort``;
    - a REPLAYED batch id (driver crashed inside the commit window
      after some renames) first RETRACTS the crashed attempt's
      ``b<batchId>-*`` files, then publishes its own — the retry may
      shard rows into a different number of task files, so without
      the retraction a stale surplus file would double-publish rows.
      Spark's sink commit log guarantees ``commit`` is not re-run for
      a batch it recorded as committed, so retraction only ever sees
      partial crashed attempts, never a durably-committed batch.
    """

    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "json_docs writer requires .option('path', <dir>)")
        self.fields = _validate_write_schema(schema)
        self.gz = _parse_compression_option(options)

    def write(self, iterator):
        return _write_task_file(self.path, self.fields, iterator,
                                gz=self.gz)

    def commit(self, messages, batchId):
        ext = ".jsonl.gz" if self.gz else ".jsonl"
        os.makedirs(self.path, exist_ok=True)
        _retract_batch(self.path, batchId)
        _publish_files(
            self.path, messages,
            lambda i: f"b{batchId:012d}-{i:05d}{ext}")

    def abort(self, messages, batchId):
        _abort_files(self.path, messages)


class JsonDocsDataSource(DataSource):
    @classmethod
    def name(cls):
        return FORMAT_NAME

    def schema(self):
        cols = _parse_columns_option(self.options)
        return ", ".join(f"{c} {_TYPES[c]}" for c in cols)

    def reader(self, schema):
        return JsonDocsReader(self.options)

    def streamReader(self, schema):
        return JsonDocsStreamReader(self.options)

    def writer(self, schema, overwrite):
        return JsonDocsWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite):
        return JsonDocsStreamWriter(self.options, schema, overwrite)


def read_docs_topk(spark, path: str, order_by: str, limit: int,
                   skip: int = 0, ascending: bool = True,
                   columns: str | None = None):
    """The complete reference query shape against the Python
    document source — ``find(q).sort(s).skip(n).limit(m)``
    (storage.scala:597-602) — as pushdown + global merge: the reader
    options push the order/limit into the source (per-file top
    ``skip+limit`` cursors, limit-based file pruning against the
    stats sidecar), and the Spark-side ``orderBy + offset + limit``
    merges at most ``files × (skip+limit)`` survivors — the same
    split a document-store driver performs when it merge-sorts
    per-shard cursors.  Determinism: ``doc_id`` ascending breaks
    ties both source-side and here, so the returned SET is stable
    under any partitioning (the contract an oracle can value-check).

    ``columns`` (optional projection) must retain ``order_by`` and
    ``doc_id`` — the merge needs both."""
    from pyspark.sql import functions as F

    register_json_docs(spark)
    if columns is not None:
        have = [c.strip() for c in columns.split(",")]
        need = {order_by, "doc_id"} - set(have)
        if need:
            raise ValueError(
                f"read_docs_topk: columns must include {sorted(need)} "
                "(sort key + tiebreak)")
    r = (spark.read.format(FORMAT_NAME).option("path", path)
         .option("sort", f"{order_by} {'asc' if ascending else 'desc'}")
         .option("skip", str(skip)).option("limit", str(limit)))
    if columns is not None:
        r = r.option("columns", columns)
    key = (F.col(order_by).asc_nulls_first() if ascending
           else F.col(order_by).desc_nulls_last())
    return (r.load().orderBy(key, F.col("doc_id").asc())
            .offset(skip).limit(limit))


def register_json_docs(spark) -> None:
    """Register the source with this session (idempotent) and enable
    Python-DataSource filter pushdown (a runtime SQL conf, default
    false in Spark 4.1 — without it a reader implementing
    ``pushFilters`` is rejected at planning time).

    The reader object is cloudpickled to executor Python workers; by
    default that pickles the class BY REFERENCE and requires this
    package importable on every worker's PYTHONPATH.  Registering the
    module for by-value pickling makes the source self-contained —
    the driver ships the code with the plan, the deployment story a
    connector needs on a 1000-executor cluster with no repo checkout
    on the workers (this module only imports stdlib + pyspark, so the
    by-value closure is tiny and dependency-free)."""
    import sys

    try:  # pyspark vendors cloudpickle; fall back quietly if moved
        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(
            sys.modules[register_json_docs.__module__])
    except (ImportError, AttributeError):
        pass
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonDocsDataSource)
