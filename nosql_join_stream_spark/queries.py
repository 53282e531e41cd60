"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 gets a named entry here:
a PySpark builder ``fn(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) a DuckDB oracle string over the same parquet tables.
Column names/aliases are kept identical on both sides — the driver
sorts columns by name and hash-compares values (see repo README /
driver contract in __spark_entry__.py).

Float policy: any aggregate/derived float column is rounded (usually
2-6 dp) IN BOTH the Spark query and the oracle, so summation-order
differences between engines can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nosql_join_stream_spark.engine import Engine
from nosql_join_stream_spark.dsl import q
from nosql_join_stream_spark.operators.join import inner_join


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible (driver rows-only check)
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(name, fn, oracle, doc)
        return fn
    return deco


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    return Engine(spark, sf_dir)


# ---------------------------------------------------------------------------
# Reference parity: the join (SURVEY §2.2 J1/J2)
# ---------------------------------------------------------------------------

@register(
    "join_fk_inner",
    """
    SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
           l.l_orderkey AS l_orderkey, l.l_linenumber AS l_linenumber,
           l.l_quantity AS l_quantity,
           s.s_name || ' measured ' || CAST(l.l_quantity AS VARCHAR) AS msg
    FROM supplier s JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    """,
    doc="Flagship: reference Join[CassandraProcess].inner sensors⋈temperature "
        "(JoinCassandraSpec.scala:36-47) — one-to-many FK equi-join with a "
        "string-interpolation mapper; broadcast the dimension side.",
)
def join_fk_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    supplier = e.table("supplier")
    lineitem = e.table("lineitem")
    return inner_join(
        supplier, lineitem,
        on=supplier["s_suppkey"] == lineitem["l_suppkey"],
        mapper=lambda j: [
            j["s_suppkey"].alias("s_suppkey"),
            j["s_name"].alias("s_name"),
            j["l_orderkey"].alias("l_orderkey"),
            j["l_linenumber"].alias("l_linenumber"),
            j["l_quantity"].alias("l_quantity"),
            F.concat(j["s_name"], F.lit(" measured "),
                     j["l_quantity"].cast("string")).alias("msg"),
        ],
        broadcast_outer=True,
    )


@register(
    "join_outer_filtered",
    """
    SELECT n.n_nationkey AS n_nationkey, n.n_name AS n_name,
           c.c_custkey AS c_custkey,
           c.c_name || ' uses ' || n.n_name AS msg
    FROM (SELECT * FROM nation WHERE n_nationkey BETWEEN 0 AND 5) n
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    """,
    doc="Reference JoinMongoSpec flagship: outer langs filtered "
        "'index' $gte 0 $lte 5 (JoinMongoSpec.scala:41-45), inner "
        "programmers matched on the FK, mapper interpolates names.",
)
def join_outer_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    nation = e.read("nation", where=q("n_nationkey").gte(0).lte(5))
    customer = e.table("customer")
    return inner_join(
        nation, customer,
        on=nation["n_nationkey"] == customer["c_nationkey"],
        mapper=lambda j: [
            j["n_nationkey"].alias("n_nationkey"),
            j["n_name"].alias("n_name"),
            j["c_custkey"].alias("c_custkey"),
            F.concat(j["c_name"], F.lit(" uses "), j["n_name"]).alias("msg"),
        ],
        broadcast_outer=True,
    )


# ---------------------------------------------------------------------------
# Reference parity: predicates / sort / skip / limit (SURVEY §2.3-2.4)
# ---------------------------------------------------------------------------

@register(
    "pred_surface",
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size >= 10 AND p_size <= 40
      AND p_brand <> 'Brand#3'
      AND (p_size IN (11, 13, 17, 19, 23) OR p_retailprice > 1500.0)
      AND p_size NOT IN (29, 31)
    """,
    doc="DSL predicate surface P1-P5,P7 (mongo/package.scala:82-120): "
        "gte+lte chain, ne, isin, nin, and/or composition.",
)
def pred_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    pred = (q("p_size").gte(10).lte(40)
            & q("p_brand").ne("Brand#3")
            & (q("p_size").isin(11, 13, 17, 19, 23) | q("p_retailprice").gt(1500.0))
            & q("p_size").nin(29, 31))
    return e.read("part", where=pred).select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")


@register(
    "pred_all_array",
    """
    SELECT doc_id, n_chars
    FROM documents
    WHERE list_has_all(string_split(text, ' '), ['spark', 'join'])
    """,
    doc="$all array-containment (reference mongo/package.scala:89) over a "
        "tokenized text column; compiles to array_except == [] JVM-side.",
)
def pred_all_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    docs = e.table("documents").withColumn("toks", F.split(F.col("text"), " "))
    return (docs.filter(q("toks").all("spark", "join").column())
                .select("doc_id", "n_chars"))


@register(
    "sort_skip_limit",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    OFFSET 10 LIMIT 25
    """,
    doc="sort + skip + limit (reference O1-O3, dsl/package.scala:48-58, "
        "applied at storage.scala:598-602); unique tie-break key makes the "
        "row set deterministic. Catalyst: TakeOrderedAndProject.",
)
def sort_skip_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return e.read(
        "orders",
        sort=[("o_totalprice", False), ("o_orderkey", True)],
        skip=10, limit=25,
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "mql_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_quantity >= 30 AND l_returnflag = 'R'
      AND l_linenumber IN (1, 2, 3)
    """,
    doc="MQL string front end (reference mqlparser/package.scala:67-235): "
        "multi-selector + implicit-eq + $in, parsed to one pushed-down Column.",
)
def mql_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    mql = '{"l_quantity": {"$gte": 30}, "l_returnflag": "R", "l_linenumber": {"$in": [1, 2, 3]}}'
    return e.read("lineitem", where=mql).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@register(
    "typed_as_projection",
    """
    SELECT event_id,
           CAST(user_id AS VARCHAR) AS user_str,
           TRY_CAST(event_type AS DOUBLE) AS et_num,
           CAST(NULL AS INTEGER) AS missing_field
    FROM events
    """,
    doc="as[T] typed projection (reference mongo/channel/package.scala:194-203, "
        "mongotypes/package.scala:73-205): null-on-failure casts (try_cast), "
        "missing fields become typed NULLs, never errors.",
)
def typed_as_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    ev = e.table("events")
    return ev.select(
        F.col("event_id"),
        F.col("user_id").cast("string").alias("user_str"),
        F.col("event_type").try_cast("double").alias("et_num"),
        F.lit(None).cast("int").alias("missing_field"),
    )


# ---------------------------------------------------------------------------
# Reference parity: partitioned event-log scan (SURVEY §2.1 S7-S8, §3.3)
# ---------------------------------------------------------------------------

@register(
    "log_scan_offset",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE user_id = 7 AND event_id >= 100
    ORDER BY event_id
    """,
    doc="Log[M].from(query, key, offset) (reference log/package.scala:56-62): "
        "forward scan of one key from an offset; partition hopping replaced "
        "by predicate pushdown + partition pruning.",
)
def log_scan_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _engine(spark, sf_dir)
    return e.log_from("events", key=7, offset=100).select(
        "event_id", "user_id", "event_type", "value")
