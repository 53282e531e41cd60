"""Typed projection — reference ``column[B]`` and ``as[T]``.

Reference: ``stream.column[B]("name")`` casts one field per record
(mongo/channel/package.scala:181-188); ``stream.as[T]`` derives a
case-class decoder matching field names, returning ``Option[T]`` —
decode failure ⇒ None, never an error (mongo/channel/package.scala:
194-203, mongotypes/package.scala:73-205).

Spark-first: ``try_cast`` gives exactly the null-on-failure contract
(SURVEY.md §7.3.3); missing fields surface as NULL literal columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def column(df: DataFrame, name: str, dtype: str | T.DataType) -> DataFrame:
    """Single-field extraction + safe cast (reference P11)."""
    return df.select(F.col(name).try_cast(dtype).alias(name))


def variant_decode(df: DataFrame, json_col: str,
                   fields: dict[str, tuple[str, str]],
                   keep: list[str] | None = None) -> DataFrame:
    """Schemaless-document decode via Spark's VARIANT type — the
    faithful form of the reference's Mongo contract (SURVEY §1.3,
    §7.3.4: `DBObject` is a schemaless nested map; our fixed
    StructType stand-in loses that).  The JSON payload parses ONCE to
    a binary variant (``parse_json``), then each requested field
    extracts with ``try_variant_get`` — missing path or mistyped
    value ⇒ typed NULL, never an error: exactly the reference's
    ``Option[T]`` decode (`mongotypes/package.scala:77-105`) applied
    to truly dynamic payloads instead of fixed columns.

    ``fields``: {out_name: (variant_path, sql_type)}, e.g.
    ``{"k_int": ("$.k", "int")}``.  ``keep``: passthrough columns.

    At 100 TB: variant is a binary columnar encoding — parse once,
    extract many, no per-field JSON re-parse, and extraction is
    JVM-side expression work (shredding/pushdown improves further as
    Spark's variant support evolves) — versus regexp/json_tuple
    re-parsing the string per field.
    """
    v = F.parse_json(F.col(json_col))
    cols = [F.col(c) for c in (keep or [])]
    cols += [F.try_variant_get(v, path, dtype).alias(name)
             for name, (path, dtype) in fields.items()]
    return df.select(*cols)


def as_schema(df: DataFrame, schema: T.StructType | dict) -> DataFrame:
    """Multi-field name-matched projection with null-safe casts
    (reference P12).  ``schema``: StructType or {name: dtype} dict.
    Fields absent from ``df`` become typed NULL columns (the
    reference's None), mistyped fields become NULL via try_cast."""
    if isinstance(schema, dict):
        items = list(schema.items())
    else:
        items = [(f.name, f.dataType) for f in schema.fields]
    existing = set(df.columns)
    cols = []
    for name, dtype in items:
        if name in existing:
            cols.append(F.col(name).try_cast(dtype).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    return df.select(*cols)
