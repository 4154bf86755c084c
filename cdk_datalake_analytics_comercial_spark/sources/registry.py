"""Schema registry: logical column specs → ``StructType``.

Replaces the reference's DynamoDB-backed stage schema registry
(`common_jobs_functions.py:124-217`, content shape
`utils/download_dynamodb/datalake_columns_bigmagic.csv`) with a local
JSON/dict registry. It is the single source of truth for the empty-table
fallback (SURVEY §7.3.9): a fabricated empty DataFrame must match the schema
the real table would have, or downstream joins silently drop columns.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Logical type → Spark type, mirroring `common_jobs_functions.py:179-188`
# (unknown names fall back to StringType, as in the reference `:187`).
_SIMPLE_TYPES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "varchar": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "smallint": T.ShortType(),
    "bigint": T.LongType(),
    "double": T.DoubleType(),
    # the reference registry folds float→double (its ERP columns are all
    # "double"); we keep FloatType so array<float> embedding schemas survive
    "float": T.FloatType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def parse_type(name: str) -> T.DataType:
    """Parse a logical type name (incl. ``numeric(p,s)``/``decimal(p,s)``,
    ``array<...>``) into a Spark type; unknown → string."""
    n = name.strip().lower()
    if n in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[n]
    if n.startswith(("numeric", "decimal")) and "(" in n:
        inner = n[n.index("(") + 1 : n.rindex(")")]
        p, s = (int(x) for x in inner.split(","))
        return T.DecimalType(p, s)
    if n in ("numeric", "decimal"):
        return T.DecimalType(38, 12)
    if n.startswith("array<") and n.endswith(">"):
        return T.ArrayType(parse_type(n[6:-1]))
    try:
        # accept any DDL Spark understands (struct<...>, map<...>)
        return T.StructType.fromDDL(f"c {name}")[0].dataType
    except Exception:
        return T.StringType()


@dataclass
class SchemaRegistry:
    """``{table: [(column, logical_type), ...]}`` registry."""

    tables: dict[str, list[tuple[str, str]]] = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str) -> "SchemaRegistry":
        with open(path) as f:
            raw = json.load(f)
        return cls({t: [(c["name"], c["type"]) for c in cols] for t, cols in raw.items()})

    def to_json(self, path: str) -> None:
        raw = {
            t: [{"name": c, "type": ty} for c, ty in cols]
            for t, cols in self.tables.items()
        }
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(raw, f, indent=2)

    def register(self, table: str, columns: list[tuple[str, str]]) -> None:
        self.tables[table] = list(columns)

    def schema(self, table: str) -> T.StructType:
        if table not in self.tables:
            raise KeyError(f"table '{table}' not in schema registry")
        return T.StructType(
            [T.StructField(c, parse_type(ty), True) for c, ty in self.tables[table]]
        )

    def empty_dataframe(self, spark: SparkSession, table: str) -> DataFrame:
        """Empty DF with the registered schema — the reference's fallback when
        a stage table has no instances yet
        (`_create_empty_dataframe_from_dynamodb`,
        `common_jobs_functions.py:124-217`), so downstream joins still run."""
        return spark.createDataFrame([], self.schema(table))
