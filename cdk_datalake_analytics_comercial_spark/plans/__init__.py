"""Query plan registry: every implemented operator from SURVEY.md §2 (plus
the training-data extensions) exposed as a named query over the synthetic
testdata tables, with a DuckDB oracle SQL where SQL can express it.

``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name] -> str``
feed ``__spark_entry__.py`` directly.
"""

from . import relational, docs, events

QUERIES = {}
ORACLES = {}
for mod in (relational, docs, events):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
