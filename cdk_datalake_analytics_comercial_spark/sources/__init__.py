from .registry import SchemaRegistry
from .reader import read_table, read_csv, read_jdbc_partitioned, table_exists
from .writer import write_table, insert_into_table, merge_upsert, merge_update_only
from . import txlog

__all__ = [
    "SchemaRegistry",
    "read_table",
    "read_csv",
    "read_jdbc_partitioned",
    "table_exists",
    "write_table",
    "insert_into_table",
    "merge_upsert",
    "merge_update_only",
    "txlog",
]
