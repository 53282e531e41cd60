"""MQL parser — grammar surface from reference
mongo/mqlparser/package.scala:67-235 (SURVEY.md §2.9)."""

from __future__ import annotations

import pytest

from nosql_join_stream_spark.mql import MQLParseError, mql_to_column


def _count(engine, table, mql):
    return engine.table(table).filter(mql_to_column(mql)).count()


def test_implicit_eq(engine):
    n = _count(engine, "orders", '{"o_orderstatus": "F"}')
    assert n == engine.read("orders", where="o_orderstatus = 'F'").count()


def test_multi_selector_range(engine):
    n = _count(engine, "lineitem", '{"l_quantity": {"$gt": 10, "$lt": 20}}')
    assert n == engine.read(
        "lineitem", where="l_quantity > 10 AND l_quantity < 20").count()


def test_in_nin(engine):
    n_in = _count(engine, "lineitem", '{"l_linenumber": {"$in": [1, 2]}}')
    n_nin = _count(engine, "lineitem", '{"l_linenumber": {"$nin": [1, 2]}}')
    assert n_in + n_nin == engine.table("lineitem").count()


def test_and_or(engine):
    mql = ('{"$or": [{"o_orderstatus": "F"}, '
           '{"$and": [{"o_orderstatus": "O"}, {"o_totalprice": {"$gte": 10000}}]}]}')
    n = _count(engine, "orders", mql)
    sql = ("o_orderstatus = 'F' OR (o_orderstatus = 'O' AND o_totalprice >= 10000)")
    assert n == engine.read("orders", where=sql).count()


def test_ne(engine):
    n = _count(engine, "orders", '{"o_orderstatus": {"$ne": "F"}}')
    assert n == engine.read("orders", where="o_orderstatus <> 'F'").count()


def test_date_literal():
    col = mql_to_column('{"ts": {"$gte": "12 Aug 2015 10:30:00:000 PM UTC"}}')
    assert col is not None  # parsed, typed as timestamp


@pytest.mark.parametrize("bad", [
    "not json at all",
    "{}",
    '{"f": {"$frobnicate": 3}}',
    '{"f": {"$in": []}}',
    '{"f": {"$in": [1, "a"]}}',  # heterogeneous array (:101-131)
    '{"$and": []}',
])
def test_parse_errors(bad):
    with pytest.raises(MQLParseError):
        mql_to_column(bad)


def test_eq_unwrapping(engine):
    # {"f": {"$eq": v}} must equal {"f": v} (UNNECESSARY_NAME_OP,
    # mqlparser :72,184-191,209-211)
    a = _count(engine, "orders", '{"o_orderstatus": {"$eq": "F"}}')
    b = _count(engine, "orders", '{"o_orderstatus": "F"}')
    assert a == b > 0


def test_all_on_array_column(spark, engine):
    from nosql_join_stream_spark.mql import mql_to_column
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [2, 3]), (3, [1, 3, 4])], "id int, xs array<int>")
    got = {r.id for r in
           df.filter(mql_to_column('{"xs": {"$all": [1, 3]}}')).collect()}
    assert got == {1, 3}


def test_dotted_field_path(spark):
    from nosql_join_stream_spark.mql import mql_to_column
    df = spark.createDataFrame([(1, {"age": 41}), (2, {"age": 17})],
                               "id int, user struct<age:int>")
    got = {r.id for r in
           df.filter(mql_to_column('{"user.age": {"$gte": 18}}')).collect()}
    assert got == {1}


def test_not_negates_operator_expression(engine):
    # {"f": {"$not": {"$gt": v}}} ≡ complement of {"f": {"$gt": v}} on
    # a non-null column: the two counts partition the table
    a = _count(engine, "orders", '{"o_totalprice": {"$gt": 100000.0}}')
    b = _count(engine, "orders", '{"o_totalprice": {"$not": {"$gt": 100000.0}}}')
    total = _count(engine, "orders", '{"o_totalprice": {"$gte": 0.0}}')
    assert a > 0 and b > 0 and a + b == total


def test_not_matches_null_rows(spark):
    from nosql_join_stream_spark.mql import mql_to_column
    df = spark.createDataFrame([(1, 10), (2, 3), (3, None)],
                               "id int, age int")
    got = {r.id for r in
           df.filter(mql_to_column('{"age": {"$not": {"$gt": 5}}}')).collect()}
    # Mongo $not semantics: rows missing the field match the negation
    assert got == {2, 3}


def test_not_requires_operator_object():
    with pytest.raises(MQLParseError):
        mql_to_column('{"age": {"$not": 5}}')


def test_exists_true_and_false(spark):
    # the reference parser's own TODO (mqlparser :98): $exists maps
    # field PRESENCE to NULL-ness on a relational frame
    from nosql_join_stream_spark.mql import mql_to_column
    df = spark.createDataFrame([(1, 10), (2, None), (3, 7)],
                               "id int, age int")
    got = {r.id for r in
           df.filter(mql_to_column('{"age": {"$exists": true}}')).collect()}
    assert got == {1, 3}
    got = {r.id for r in
           df.filter(mql_to_column('{"age": {"$exists": false}}')).collect()}
    assert got == {2}


def test_exists_composes_in_multi_selector(spark):
    from nosql_join_stream_spark.mql import mql_to_column
    df = spark.createDataFrame([(1, 10), (2, None), (3, 7)],
                               "id int, age int")
    got = {r.id for r in df.filter(mql_to_column(
        '{"age": {"$exists": true, "$gt": 8}}')).collect()}
    assert got == {1}


def test_exists_requires_boolean():
    with pytest.raises(MQLParseError):
        mql_to_column('{"age": {"$exists": 1}}')
