"""Nested-document helpers: flatten + field dropping (P7/P8).

Reference: `_flatten_document` does a one-level {a:{b:1}} -> {a_b:1}
flatten (reference mongo_loader.py:178-187) and
`_delete_fields_from_doc` removes dotted paths (mongo_loader.py:83-115)
— both driver-side per-row Python. Spark-first: schema-driven column
expressions (pure projection, zero Python in the data path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def flatten_structs(df: DataFrame, sep: str = "_", recursive: bool = True) -> DataFrame:
    """Flatten struct columns into top-level `parent{sep}child` columns.

    Default recursive=True flattens until no struct columns remain.
    Reference parity (`_flatten_document` lifts exactly ONE level,
    mongo_loader.py:178-187) needs recursive=False — which is what
    sources/mongo.py passes, JSON-stringifying whatever stays nested.
    """
    while True:
        struct_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(F.col(f"{f.name}.{sub.name}").alias(f"{f.name}{sep}{sub.name}"))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)
        if not recursive:
            return df


def drop_field_paths(df: DataFrame, paths: list[str]) -> DataFrame:
    """Drop columns or nested field paths ('a.b.c' style, reference
    fields_to_delete semantics)."""
    for path in paths:
        if "." not in path:
            df = df.drop(path)
            continue
        top, rest = path.split(".", 1)
        if top in df.columns:
            df = df.withColumn(top, F.col(top).dropFields(rest))
    return df
