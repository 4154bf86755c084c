"""The full 53-job workload on the transactional table format: one session
conf (``spark.datalake.tableFormat=txlog``) routes every job write through
the versioned-manifest format — the reference's production layout, where
every domain/analytics table is Delta (`common_jobs_functions.py:271-319`).
Outputs must be row-identical to the parquet run, and the Delta-surface
capabilities (version history, time travel, CDF) must hold on real job
tables across two pipeline runs."""

import os
import pytest

# slow tier (end-to-end pipeline on txlog storage) — skipped unless SPARK_GRAFT_SLOW_TESTS=1;
# fast-tier coverage of the same operators lives in the unit modules
pytestmark = pytest.mark.slow
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from cdk_datalake_analytics_comercial_spark.core.catalog import Catalog, Layer
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX
from cdk_datalake_analytics_comercial_spark.sources.writer import FORMAT_CONF


def _tables(root: str, layer: str) -> list[str]:
    base = os.path.join(root, layer)
    if not os.path.isdir(base):
        return []
    return sorted(
        d for d in os.listdir(base)
        if os.path.isdir(os.path.join(base, d)) and not d.startswith(("_", "."))
    )


def _rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.collect()
    )


def test_full_pipeline_on_txlog_matches_parquet(spark, tmp_path):
    from run_full_pipeline import run

    # reference run on the default parquet format
    root_pq = str(tmp_path / "lake_parquet")
    dr, ar = run(spark, root_pq)
    assert not [r for r in dr + ar if r.status != "succeeded"]

    # same workload, every table created as txlog via the one conf switch
    root_tx = str(tmp_path / "lake_txlog")
    spark.conf.set(FORMAT_CONF, "txlog")
    try:
        dr1, ar1 = run(spark, root_tx)
        assert not [r for r in dr1 + ar1 if r.status != "succeeded"]
        v_first = TX.current_version(
            spark, os.path.join(root_tx, "domain", "t_venta")
        )
        # the nightly rerun — txlog merges must be a fixed point too
        dr2, ar2 = run(spark, root_tx)
        assert not [r for r in dr2 + ar2 if r.status != "succeeded"]
    finally:
        spark.conf.unset(FORMAT_CONF)

    lake_tx = Catalog(root=root_tx)

    # every job output landed as a REAL txlog table…
    for layer in ("domain", "analytics"):
        tables = _tables(root_tx, layer)
        assert tables, f"no {layer} tables written"
        for t in tables:
            assert TX.is_txlog_table(spark, os.path.join(root_tx, layer, t)), (
                f"{layer}/{t} is not txlog-format"
            )

    # …and is row-identical to the parquet run, table by table
    assert _tables(root_pq, "domain") == _tables(root_tx, "domain")
    assert _tables(root_pq, "analytics") == _tables(root_tx, "analytics")
    for layer, enum_layer in (("domain", Layer.DOMAIN), ("analytics", Layer.ANALYTICS)):
        for t in _tables(root_pq, layer):
            pq = spark.read.parquet(os.path.join(root_pq, layer, t))
            tx = TX.tx_read(spark, lake_tx.table_path(enum_layer, t))
            assert sorted(pq.columns) == sorted(tx.columns), f"{layer}/{t} schema"
            cols = sorted(pq.columns)
            assert _rows(pq.select(*cols)) == _rows(tx.select(*cols)), (
                f"{layer}/{t} rows differ between parquet and txlog runs"
            )

    # Delta-surface capabilities on a real job table across the two runs:
    venta_path = lake_tx.table_path(Layer.DOMAIN, "t_venta")
    v_latest = TX.current_version(spark, venta_path)
    assert v_latest > v_first  # the rerun committed new versions
    # time travel: the first run's snapshot is still readable and equals the
    # rerun's (the workload is a fixed point)
    first_snap = _rows(TX.tx_read(spark, venta_path, version=v_first))
    last_snap = _rows(TX.tx_read(spark, venta_path))
    assert first_snap == last_snap
    # CDF: zero row-level changes between the two nightly runs
    diff = TX.tx_diff(spark, venta_path, keys=["id_venta"], v_from=v_first)
    assert diff.count() == 0
    # history records every commit with its operation
    ops = [m["op"] for m in TX.tx_history(spark, venta_path)]
    assert len(ops) == v_latest and all(o in ("overwrite", "append", "merge", "overwrite_dynamic") for o in ops)
