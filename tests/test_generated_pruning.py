"""Generated-column partition pruning (SURVEY §4a by name) + partition-
value file skipping for DML: a WHERE on the BASE column (`ts`) of a
`p GENERATED ALWAYS AS date_format(ts,'yyyyMM')` partition column derives
[f(lo), f(hi)] bounds on `p` (monotone shapes only), so period-
partitioned tables prune files on the SQL face, in tx_read, and in
DELETE/UPDATE — Delta's generated-column partition filter. File counts
are asserted, not assumed."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.core.sql_dml import sql_dml
from cdk_datalake_analytics_comercial_spark.core.sql_serving import (
    register_txlog_table,
)
from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def _files(spark, p):
    cur = TX.current_version(spark, p)
    return sorted(f["path"] for f in TX.read_manifest(spark, p, cur)["files"])


def _month_table(spark, tmp_path, name="gen"):
    """3 month-partitions via p = date_format(ts, 'yyyyMM')."""
    p = str(tmp_path / name)
    rows = []
    for m in (1, 2, 3):
        for d in (5, 15, 25):
            rows.append((m * 100 + d, dt.date(2024, m, d), f"2024{m:02d}"))
    df = spark.createDataFrame(rows, "id long, ts date, p string").coalesce(1)
    TX.tx_write(spark, df, p, partition_by=["p"], stats_for=["id"])
    TX.tx_add_generated_column(
        spark, p, "p", "date_format(ts, 'yyyyMM')"
    )
    return p


def test_gen_monotone_shapes():
    mono = TX._gen_monotone
    col, f = mono("date_format(ts, 'yyyyMM')")
    assert col == "ts" and f("2024-02-10") == "202402"
    assert f(dt.date(2024, 2, 10)) == "202402"
    assert f("not a date") is None  # unparseable bound: no derivation
    col, f = mono("year(`ts`)")
    assert col == "ts" and f("2024-02-10") == 2024
    col, f = mono("to_date(ts)")
    assert f(dt.datetime(2024, 2, 10, 12, 30)) == dt.date(2024, 2, 10)
    col, f = mono("CAST(ts AS DATE)")
    assert f("2024-02-10 08:00:00") == dt.date(2024, 2, 10)
    # non-monotone / unknown shapes refuse to derive
    assert mono("date_format(ts, 'MM')") is None
    assert mono("date_format(ts, 'dd-MM-yyyy')") is None
    assert mono("month(ts)") is None
    assert mono("upper(lang)") is None


def test_derive_generated_hints():
    manifest = {
        "properties": {"generated.p": "date_format(ts, 'yyyyMM')"},
    }
    out = TX._derive_generated_hints(
        manifest, {"ts": ("2024-02-01", "2024-02-29")}, None
    )
    assert out["p"] == ("202402", "202402")
    assert out["ts"] == ("2024-02-01", "2024-02-29")  # base hint kept
    # equality probe on the base derives a point range on the generated
    out = TX._derive_generated_hints(manifest, None, {"ts": "2024-03-05"})
    assert out["p"] == ("202403", "202403")
    # an explicit hint on the generated column is never overridden
    out = TX._derive_generated_hints(
        manifest, {"p": ("202401", "202401"), "ts": ("2024-02-01", None)}, None
    )
    assert out["p"] == ("202401", "202401")
    # open-ended base bounds derive open-ended generated bounds
    out = TX._derive_generated_hints(manifest, {"ts": ("2024-02-01", None)}, None)
    assert out["p"] == ("202402", None)


def test_delete_prunes_generated_partitions(spark, tmp_path):
    """DELETE WHERE ts-range touching one month rewrites ONLY that
    month's partition file(s); the other partitions carry by reference."""
    p = _month_table(spark, tmp_path)
    before = _files(spark, p)
    assert len(before) == 3  # one file per month partition
    TX.tx_delete(
        spark, p,
        where={"ts": (dt.date(2024, 2, 1), dt.date(2024, 2, 20))},
        condition="ts >= date'2024-02-01' AND ts <= date'2024-02-20'",
    )
    after = _files(spark, p)
    assert len(set(before) & set(after)) == 2  # Jan + Mar untouched
    assert len(set(after) - set(before)) == 1  # Feb rewritten
    assert all("p=202402" in f for f in set(after) - set(before))
    left = sorted(r.id for r in TX.tx_read(spark, p).select("id").collect())
    assert left == [105, 115, 125, 225, 305, 315, 325]


def test_update_dv_prunes_generated_partitions(spark, tmp_path):
    """The DV path prunes by derived generated bounds too: only the
    matching partition's file gains a DV reference."""
    p = _month_table(spark, tmp_path, "gendv")
    TX.tx_delete(
        spark, p,
        where={"ts": (dt.date(2024, 3, 1), dt.date(2024, 3, 31))},
        condition="ts >= date'2024-03-01'",
        use_dv=True,
    )
    cur = TX.current_version(spark, p)
    dvd = [f["path"] for f in TX.read_manifest(spark, p, cur)["files"] if f.get("dv")]
    assert len(dvd) == 1 and "p=202403" in dvd[0]


def test_plain_partition_value_pruning_dml(spark, tmp_path):
    """Partition-VALUE skipping for DML on a regular (non-generated)
    hive-partitioned table: DELETE WHERE lang = 'en' rewrites only the
    en partition — previously every file was a rewrite candidate because
    partition columns carry no stats."""
    p = str(tmp_path / "plainpart")
    TX.tx_write(
        spark,
        spark.createDataFrame(
            [(i, ["en", "de", "fr"][i % 3]) for i in range(12)],
            "id long, lang string",
        ),
        p,
        partition_by=["lang"],
    )
    before = _files(spark, p)
    TX.tx_delete(
        spark, p,
        where_equals={"lang": "en"},
        condition="lang = 'en' AND id >= 0",
    )
    after = _files(spark, p)
    untouched_before = [f for f in before if "lang=en" not in f]
    assert set(untouched_before) <= set(after)  # de/fr carried by reference
    assert all("lang=en" not in f for f in set(after) - set(before))
    assert TX.tx_read(spark, p).filter("lang = 'en'").count() == 0
    assert TX.tx_read(spark, p).count() == 8


def test_tx_read_prunes_generated_partitions(spark, tmp_path):
    p = _month_table(spark, tmp_path, "genread")
    got = TX.tx_read(
        spark, p, where={"ts": (dt.date(2024, 1, 1), dt.date(2024, 1, 31))}
    )
    assert sorted(r.id for r in got.collect()) == [105, 115, 125]
    opened = got.inputFiles()
    assert len(opened) == 1 and "p=202401" in opened[0]


def test_sql_face_generated_pruning(spark, tmp_path):
    """The SQL pushdown path: a registered period-partitioned table with
    a generated partition column prunes files from a WHERE on the base
    column (pushFilters → derived hints → partition-value skip), and the
    routed DELETE by name prunes the same way."""
    p = _month_table(spark, tmp_path, "gensql")
    register_txlog_table(spark, "gendb", "t", p)
    q = spark.sql(
        "SELECT id FROM gendb.t "
        "WHERE ts BETWEEN date'2024-03-01' AND date'2024-03-31'"
    )
    assert sorted(r.id for r in q.collect()) == [305, 315, 325]
    before = _files(spark, p)
    sql_dml(
        spark,
        "DELETE FROM gendb.t WHERE ts >= date'2024-01-01' "
        "AND ts <= date'2024-01-31'",
    )
    after = _files(spark, p)
    assert len(set(before) & set(after)) == 2  # Feb+Mar carried
    assert spark.sql("SELECT COUNT(*) AS n FROM gendb.t").collect()[0].n == 6


def test_gen_monotone_period_convention():
    """The reference's period convention — (year·100 + month)[::string]
    (`plans/common.period_yyyymm`) — derives like date_format yyyyMM."""
    mono = TX._gen_monotone
    col, f = mono("year(ts) * 100 + month(ts)")
    assert col == "ts" and f("2024-02-10") == 202402
    col, f = mono("CAST(year(od)*100 + month(od) AS STRING)")
    assert col == "od" and f(dt.date(2023, 11, 2)) == "202311"
    col, f = mono("cast(year(x) * 100 + month(x) as int)")
    assert f("2024-01-05") == 202401
    # mismatched base columns never derive
    assert mono("year(a)*100 + month(b)") is None


def test_widen_under_column_mapping_and_optimize(spark, tmp_path):
    """Type widening composes with column mapping (rename first) and
    OPTIMIZE materializes the wide physical type in compacted files."""
    p = str(tmp_path / "widemap")
    TX.tx_write(
        spark,
        spark.createDataFrame([(1, 5), (2, 6)], "k long, n int"),
        p,
    )
    TX.tx_rename_column(spark, p, "n", "amount")  # activates mapping
    TX.tx_widen_column(spark, p, "amount", "bigint")
    got = TX.tx_read(spark, p)
    assert dict(got.dtypes)["amount"] == "bigint"
    assert sorted(tuple(r) for r in got.collect()) == [(1, 5), (2, 6)]
    # compaction rewrites through the logical read → wide physicals
    TX.tx_compact(spark, p)
    got = TX.tx_read(spark, p)
    assert dict(got.dtypes)["amount"] == "bigint"
    assert sorted(tuple(r) for r in got.collect()) == [(1, 5), (2, 6)]


def test_derived_hints_coerce_to_declared_type():
    """Derived bounds coerce to the generated column's DECLARED type
    (year() yields ints; a string-declared column needs string bounds or
    the stat/partition compare would raise or mistype); uncoercible
    mismatches drop the hint instead of crashing."""
    import json as _json

    schema = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "ts", "type": "date", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
            {"name": "y", "type": "long", "nullable": True, "metadata": {}},
        ],
    })
    man = {
        "schema": schema,
        "properties": {
            "generated.p": "year(ts)*100 + month(ts)",  # int fn, string col
            "generated.y": "date_format(ts, 'yyyyMM')",  # str fn, long col
        },
    }
    out = TX._derive_generated_hints(man, {"ts": ("2024-02-01", "2024-03-05")}, None)
    assert out["p"] == ("202402", "202403")  # coerced int -> string
    assert out["y"] == (202402, 202403)      # coerced str -> long


def test_gen_monotone_forecast_date_not_confused_by_cast_substring():
    col, f = TX._gen_monotone("year(forecast_date)*100 + month(forecast_date)")
    assert col == "forecast_date" and f("2024-05-01") == 202405
