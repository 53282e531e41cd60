"""MQL (Mongo query language) string front end → Spark Column.

Reference: a PackratParser grammar parsing a Mongo-JSON query string
into a ``BasicDBObject``, throwing ``MongoException`` on bad input
(mongo/mqlparser/package.scala:67-235, entry ``parse`` :227-234), used
by the channel API at build time so parse errors fail the stream
before execution (mongo/channel/package.scala:216-229).

Grammar surface reproduced here (SURVEY.md §2.9):
- range ops ``$gte|$gt|$lte|$lt|$ne`` and implicit ``:`` equality
  (mqlparser :79-89), with ``$eq`` unwrapping (:72,184-191);
- set ops ``$in|$all|$nin`` (:91-96);
- operator negation ``$not`` (listed among the range tokens, :79) with
  Mongo's missing-field semantics (NULL rows match the negation);
- boolean ``$and|$or`` over arrays of sub-queries (:98-99,221-223);
- typed literals: int, double, bool, string, ISO date
  ``"dd MMM yyyy hh:mm:ss:SSS a z"`` (mongo/package.scala:133), and
  homogeneous arrays (:101-144);
- dotted field paths ``user.age`` (:146-156);
- multi-selector fields ``{"$gt": 39, "$lt": 42}`` (:173-200).

Spark-first: instead of producing a DBObject we produce a single
``Column`` predicate, so Catalyst can push it into the parquet scan.
"""

from __future__ import annotations

import datetime
import json
import re

from pyspark.sql import Column
from pyspark.sql import functions as F


class MQLParseError(ValueError):
    """Reference throws MongoException on parse failure
    (mqlparser/package.scala:232-234)."""


# reference date literal format: "dd MMM yyyy hh:mm:ss:SSS a z"
_DATE_RE = re.compile(
    r"^\d{1,2} [A-Za-z]{3} \d{4} \d{1,2}:\d{2}:\d{2}:\d{3} (AM|PM) [A-Za-z]+$")
_DATE_FMT = "%d %b %Y %I:%M:%S:%f %p"

_RANGE_OPS = {
    "$eq": lambda c, v: c == v,
    "$gt": lambda c, v: c > v,
    "$gte": lambda c, v: c >= v,
    "$lt": lambda c, v: c < v,
    "$lte": lambda c, v: c <= v,
    "$ne": lambda c, v: c != v,
}


def _literal(v):
    """Typed literal → python value Spark lit() accepts; date strings in
    the reference's format become timestamps (mqlparser :133-144)."""
    if isinstance(v, str) and _DATE_RE.match(v):
        body, _tz = v.rsplit(" ", 1)  # zone name parsed but collapsed to UTC
        try:
            return datetime.datetime.strptime(body, _DATE_FMT)
        except ValueError:
            # Java's SimpleDateFormat is lenient: hour "00" with AM/PM is
            # accepted (== 12 AM). %I is strict (1-12), so normalize.
            day, mon, yr, hms, ampm = body.split(" ")
            if hms.startswith("00:"):
                try:
                    return datetime.datetime.strptime(
                        " ".join([day, mon, yr, "12" + hms[2:], ampm]), _DATE_FMT)
                except ValueError:
                    pass
            raise MQLParseError(f"bad date literal {v!r}")
    if isinstance(v, (int, float, bool, str)):
        return v
    raise MQLParseError(f"unsupported literal {v!r}")


def _field_predicate(field: str, spec) -> Column:
    col = F.col(field)  # dotted paths resolve to nested struct fields
    if isinstance(spec, dict):
        if not spec:
            raise MQLParseError(f"empty selector for field {field!r}")
        pred = None
        # multi-selector: {"$gt": 39, "$lt": 42} — conjunction (:173-200)
        for op, val in spec.items():
            if op in _RANGE_OPS:
                c = _RANGE_OPS[op](col, F.lit(_literal(val)))
            elif op == "$in":
                c = col.isin(*[_literal(x) for x in _as_array(op, val)])
            elif op == "$nin":
                c = ~col.isin(*[_literal(x) for x in _as_array(op, val)])
            elif op == "$all":
                lits = F.array(*[F.lit(_literal(x)) for x in _as_array(op, val)])
                c = F.size(F.array_except(lits, col)) == F.lit(0)
            elif op == "$not":
                # operator negation (mqlparser :79 lists $not among the
                # range tokens): value is an operator sub-selector,
                # e.g. {"age": {"$not": {"$gt": 5}}}.  Mongo's $not also
                # matches documents MISSING the field — under SQL
                # three-valued logic a bare ~(col > 5) drops NULL rows,
                # so null-ness is OR-ed in explicitly.
                if not isinstance(val, dict):
                    raise MQLParseError(
                        f"$not expects an operator object for field "
                        f"{field!r}, got {val!r}")
                c = ~_field_predicate(field, val) | col.isNull()
            elif op == "$exists":
                # the reference parser's own TODO (mqlparser :98 —
                # 'support for other boolean ops "$not" | $exists').
                # Mongo semantics are field PRESENCE in a schemaless
                # document; on a relational frame absent == NULL, the
                # same equivalence the variant/schemaless decode path
                # uses (typed.py): {"f": {"$exists": true}} keeps rows
                # where f is set, false keeps rows where it is not.
                if not isinstance(val, bool):
                    raise MQLParseError(
                        f"$exists expects a boolean for field "
                        f"{field!r}, got {val!r}")
                c = col.isNotNull() if val else col.isNull()
            else:
                raise MQLParseError(f"unknown operator {op!r} for field {field!r}")
            pred = c if pred is None else (pred & c)
        return pred
    # implicit equality  {"field": literal}  (":" = $eq, :79-89)
    return col == F.lit(_literal(spec))


def _as_array(op, val):
    if not isinstance(val, list) or not val:
        raise MQLParseError(f"{op} expects a non-empty array, got {val!r}")
    types = {bool if isinstance(x, bool) else type(x) for x in val}
    if len(types) > 1 and types != {int, float}:
        raise MQLParseError(f"{op} expects a homogeneous array (:101-131), got {val!r}")
    return val


def _query(obj) -> Column:
    if not isinstance(obj, dict) or not obj:
        raise MQLParseError(f"query must be a non-empty object, got {obj!r}")
    pred = None
    for key, val in obj.items():
        if key in ("$and", "$or"):
            if not isinstance(val, list) or not val:
                raise MQLParseError(f"{key} expects a non-empty array of sub-queries")
            subs = [_query(s) for s in val]
            c = subs[0]
            for s in subs[1:]:
                c = (c & s) if key == "$and" else (c | s)
        elif key.startswith("$"):
            raise MQLParseError(f"unknown top-level operator {key!r}")
        else:
            c = _field_predicate(key, val)
        pred = c if pred is None else (pred & c)
    return pred


def mql_to_column(line: str) -> Column:
    """Entry point — reference ``parse(line): BasicDBObject``
    (mqlparser/package.scala:227-234); bad input raises MQLParseError
    before any execution."""
    try:
        obj = json.loads(line)
    except json.JSONDecodeError as e:
        raise MQLParseError(f"invalid MQL: {e}") from e
    return _query(obj)
