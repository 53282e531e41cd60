"""Property fuzz of the json_docs reader's OPTION surface.

The unit tests pin each option alone; this fuzz drives random
COMBINATIONS — parse mode × column projection × a pushed predicate ×
mixed plain/gzip members × planted corrupt lines — against an
independent pure-Python model (read every line, apply the mode, apply
the predicate with SQL three-valued logic, project), so an interaction
bug between any two features (e.g. a corrupt marker doc leaking
through a filter, a projection mis-binding on gz members) falls out as
a row-set divergence rather than needing its own bespoke test."""

from __future__ import annotations

import gzip
import json
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

_LANGS = [None, "en", "de"]
_SOURCES = [None, "web", "book"]


@pytest.fixture()
def registered(spark):
    from nosql_join_stream_spark.pydocsource import register_json_docs
    register_json_docs(spark)
    return spark


_DOC = st.fixed_dictionaries({
    "doc_id": st.one_of(st.none(), st.integers(-3, 30)),
    "lang": st.sampled_from(_LANGS),
    "source": st.sampled_from(_SOURCES),
    "text": st.one_of(st.none(), st.text(alphabet="ab ", max_size=6)),
    "extra": st.one_of(st.none(), st.integers(0, 5)),
})

# includes VALID JSON whose top-level value is not an object — those
# must count as malformed too (a list has no fields to decode), which
# the fuzz's model enforced before the source handled them
_CORRUPT = st.sampled_from(["not json", "{trunc", '["array"] tail', "}{",
                            '["array"]', "42", '"just a string"', "null"])

_LINE = st.one_of(_DOC, _CORRUPT)

_FILES = st.lists(
    st.tuples(st.booleans(),                      # gz member?
              st.lists(_LINE, max_size=4)),       # its lines
    min_size=1, max_size=4)


def _write(d, files):
    os.makedirs(d)
    for i, (gz, lines) in enumerate(files):
        name = f"{i:04d}.jsonl" + (".gz" if gz else "")
        opener = (lambda p: gzip.open(p, "wt", encoding="utf-8")) if gz \
            else (lambda p: open(p, "w", encoding="utf-8"))
        with opener(os.path.join(d, name)) as fh:
            for ln in lines:
                if isinstance(ln, dict):
                    doc = {k: v for k, v in ln.items() if v is not None}
                    fh.write(json.dumps(doc) + "\n")
                else:
                    fh.write(ln + "\n")


def _model_rows(files, mode, cols, pred):
    """Independent re-implementation of the read contract."""
    out = []
    for gz, lines in files:
        for ln in lines:
            if isinstance(ln, dict):
                doc = {k: v for k, v in ln.items() if v is not None}
            elif mode == "DROPMALFORMED":
                continue
            elif mode == "PERMISSIVE":
                doc = {"_corrupt_record": ln}
            else:
                raise AssertionError("model only runs non-FAILFAST")
            if pred is not None:
                col, val = pred
                dv = doc.get(col)
                if dv is None or not dv >= val:   # 3VL: UNKNOWN drops
                    continue
            row = []
            for c in cols:
                if c == "props":
                    rest = {k: v for k, v in doc.items()
                            if k not in ("doc_id", "source", "lang",
                                         "text")}
                    row.append(json.dumps(rest, sort_keys=True)
                               if rest else None)
                elif c == "doc_id":
                    v = doc.get(c)
                    row.append(int(v) if v is not None else None)
                else:
                    row.append(doc.get(c))
            out.append(tuple(row))
    return sorted(out, key=repr)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(files=_FILES,
       mode=st.sampled_from(["DROPMALFORMED", "PERMISSIVE"]),
       cols=st.sampled_from([None, "doc_id,lang", "doc_id,props",
                             "lang,text"]),
       pred=st.one_of(st.none(), st.integers(-1, 8)),
       data=st.data())
def test_reader_options_compose_against_model(
        tmp_path_factory, registered, files, mode, cols, pred, data):
    spark = registered
    d = str(tmp_path_factory.mktemp("optfuzz") / "docs")
    _write(d, files)

    r = (spark.read.format("json_docs").option("path", d)
         .option("mode", mode))
    if cols:
        r = r.option("columns", cols)
    df = r.load()
    predicate = None
    if pred is not None and (cols is None or "doc_id" in cols):
        df = df.filter(f"doc_id >= {pred}")  # only if projected
        predicate = ("doc_id", pred)
    got = sorted((tuple(row) for row in df.collect()), key=repr)

    col_list = cols.split(",") if cols else \
        ["doc_id", "source", "lang", "text", "props"]
    want = _model_rows(files, mode, col_list, predicate)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(files=_FILES)
def test_failfast_raises_iff_any_corrupt_line(
        tmp_path_factory, registered, files):
    """FAILFAST is exact: raises when (and only when) some line is
    malformed — a clean collection never pays a false alarm."""
    spark = registered
    d = str(tmp_path_factory.mktemp("ffuzz") / "docs")
    _write(d, files)
    has_corrupt = any(not isinstance(ln, dict)
                      for _, lines in files for ln in lines)
    df = spark.read.format("json_docs").option("path", d).load()
    if has_corrupt:
        with pytest.raises(Exception, match="malformed JSON"):
            df.collect()
    else:
        df.collect()  # must not raise
