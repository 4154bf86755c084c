"""Table properties (Delta TBLPROPERTIES twin) with enforced appendOnly
(delta.appendOnly): while true, every row-removing commit — DELETE,
UPDATE, MERGE, overwrite, compaction, RESTORE, and the DV soft-delete
paths — refuses loudly; plain appends proceed. Properties are last-write-
wins per key, unset by None, and survive checkpointing and vacuum."""

import pytest
from pyspark.sql import functions as F

from cdk_datalake_analytics_comercial_spark.sources import txlog as TX


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def _df(spark, *ks):
    return spark.createDataFrame([(k, f"v{k}") for k in ks], "k long, v string")


def _tbl(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1, 2, 3), p)
    TX.tx_set_properties(spark, p, {"appendOnly": "true", "owner": "ingest"})
    return p


def test_properties_roundtrip_and_unset(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    assert TX.tx_properties(spark, p) == {
        "appendOnly": "true",
        "owner": "ingest",
    }
    TX.tx_set_properties(spark, p, {"owner": None, "team": "ml"})
    assert TX.tx_properties(spark, p) == {"appendOnly": "true", "team": "ml"}


def test_append_only_allows_appends_blocks_everything_else(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    TX.tx_write(spark, _df(spark, 4), p, mode="append")  # appends fine
    TX.tx_write(spark, _df(spark, 5), p, mode="append", txn=("job", 1))
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_delete(spark, p, where={"k": (1, 1)})
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_delete(spark, p, where={"k": (1, 1)}, use_dv=True)
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_update(spark, p, where={"k": (1, 1)}, assignments={"v": F.lit("X")})
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_merge(spark, _df(spark, 1), p, keys=["k"])
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_merge(spark, _df(spark, 1), p, keys=["k"], use_dv=True)
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_write(spark, _df(spark, 9), p, mode="overwrite")
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_compact(spark, p, n_files=1)
    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX.tx_restore(spark, p, 1)
    # nothing above committed; the table is intact
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,), (3,), (4,), (5,)]


def test_unset_append_only_reenables_dml(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    TX.tx_set_properties(spark, p, {"appendOnly": None})
    TX.tx_delete(spark, p, where={"k": (2, 2)})
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (3,)]


def test_properties_survive_checkpoint_and_vacuum(spark, tmp_path):
    p = _tbl(spark, tmp_path)
    for i in range(TX._CHECKPOINT_EVERY + 2):
        TX.tx_write(spark, _df(spark, 100 + i), p, mode="append")
    TX.tx_vacuum(spark, p, keep_versions=2, retain_hours=0)
    assert TX.tx_properties(spark, p)["appendOnly"] == "true"
    with pytest.raises(TX.TxPropertyViolation):
        TX.tx_delete(spark, p, where={"k": (1, 1)})


def test_set_properties_requires_keys_and_table(spark, tmp_path):
    with pytest.raises(ValueError):
        TX.tx_set_properties(spark, str(tmp_path / "t"), {})
    with pytest.raises(FileNotFoundError):
        TX.tx_set_properties(spark, str(tmp_path / "nope"), {"a": "1"})


# --------------------------------------------------------------------------
# Persistent CHECK constraints (ALTER TABLE ADD CONSTRAINT twin): stored as
# check.<name> properties, enforced on EVERY write path until dropped.


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1, 2, -3), p)
    with pytest.raises(TX.TxCheckViolation, match="positive"):
        TX.tx_add_constraint(spark, p, "positive", "k > 0")
    # the failed attempt stored nothing
    assert TX.tx_properties(spark, p) == {}
    TX.tx_delete(spark, p, where={"k": (-3, -3)})
    TX.tx_add_constraint(spark, p, "positive", "k > 0")
    assert TX.tx_properties(spark, p) == {"check.positive": "k > 0"}


def _constrained(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1, 2), p)
    TX.tx_add_constraint(spark, p, "positive", "k > 0")
    return p


def test_constraint_binds_every_write_path(spark, tmp_path):
    p = _constrained(spark, tmp_path)
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(spark, _df(spark, -4), p, mode="append")
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(spark, _df(spark, -4), p, mode="overwrite")
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_merge(spark, _df(spark, -4), p, keys=["k"])
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_merge(spark, _df(spark, -4), p, keys=["k"], use_dv=True)
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_update(
            spark, p, where={"k": (2, 2)}, assignments={"k": F.lit(-9)}
        )
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_update(
            spark, p, where={"k": (2, 2)}, assignments={"k": F.lit(-9)},
            use_dv=True,
        )
    # nothing committed, no orphans left behind
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,)]
    from tools.table_doctor import doctor

    rep = doctor(spark, p)
    assert rep["errors"] == [] and rep["orphans"] == []
    # valid writes still flow (call-site checks compose on top)
    TX.tx_write(spark, _df(spark, 5), p, mode="append")
    TX.tx_merge(spark, _df(spark, 6), p, keys=["k"])
    TX.tx_update(spark, p, where={"k": (5, 5)}, assignments={"k": F.lit(7)})
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,), (6,), (7,)]


def test_drop_constraint_reenables(spark, tmp_path):
    p = _constrained(spark, tmp_path)
    TX.tx_drop_constraint(spark, p, "positive")
    TX.tx_write(spark, _df(spark, -4), p, mode="append")
    assert (-4, "v-4") in set(tuple(r) for r in TX.tx_read(spark, p).collect())


def test_constrained_column_cannot_be_renamed_or_dropped(spark, tmp_path):
    p = _constrained(spark, tmp_path)
    with pytest.raises(ValueError, match="CHECK constraint"):
        TX.tx_rename_column(spark, p, "k", "id")
    with pytest.raises(ValueError, match="CHECK constraint"):
        TX.tx_drop_column(spark, p, "k")
    # an unconstrained column still renames freely, and the constraint
    # keeps binding afterwards (its column name stayed physical==logical)
    TX.tx_rename_column(spark, p, "v", "label")
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(
            spark,
            spark.createDataFrame([(-1, "x")], "k long, label string"),
            p,
            mode="append",
        )


def test_constraint_name_validation(spark, tmp_path):
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1), p)
    with pytest.raises(ValueError):
        TX.tx_add_constraint(spark, p, "a.b", "k > 0")
    with pytest.raises(ValueError):
        TX.tx_add_constraint(spark, p, "", "k > 0")


def test_clone_copies_properties_and_constraints_not_txn_marks(
    spark, tmp_path
):
    """Delta CLONE parity: table properties (and therefore stored CHECK
    constraints and appendOnly) follow the clone; txn high-water marks do
    NOT (a clone is a new table — replaying a sink into it must not
    silently no-op, the same caveat Delta documents)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    TX.tx_write(spark, _df(spark, 1, 2), src, txn=("sink", 5))
    TX.tx_add_constraint(spark, src, "positive", "k > 0")
    TX.tx_clone(spark, src, dst)
    assert TX.tx_properties(spark, dst) == {"check.positive": "k > 0"}
    with pytest.raises(TX.TxCheckViolation):
        TX.tx_write(spark, _df(spark, -1), dst, mode="append")
    assert TX.tx_txn_version(spark, dst, "sink") is None


def test_append_only_rechecked_per_commit_attempt(spark, tmp_path):
    """A tx_set_properties(appendOnly=true) landing DURING another writer's
    CAS retry window must gate that writer's NEXT attempt — the check runs
    against each attempt's snapshot, never a stale pre-loop one. Simulated
    deterministically: the racing delete's build callback commits the
    property flip right before returning its first record, so its claim
    loses and the retry re-validates under the new properties."""
    p = str(tmp_path / "t")
    TX.tx_write(spark, _df(spark, 1, 2, 3), p)
    injected = {"done": False}

    def build(cur):
        if not injected["done"]:
            injected["done"] = True
            TX.tx_set_properties(spark, p, {"appendOnly": "true"})
        return {
            "op": "delete",
            "schema": TX.read_manifest(spark, p, cur)["schema"],
            "add": [],
            "remove": [f["path"] for f in TX.read_manifest(spark, p, cur)["files"]],
            "truncate": False,
        }

    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX._commit(spark, p, build)
    # nothing committed by the loser; data intact, property in force
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,), (3,)]


def test_record_carrying_properties_cannot_bypass_append_only(spark, tmp_path):
    """Only the metadata-only set_properties op skips the appendOnly gate.
    A clone/restore-shaped record that merely CARRIES properties (tx_clone
    racing into a just-created appendOnly destination) must still refuse
    to truncate it."""
    p = _tbl(spark, tmp_path)  # appendOnly=true

    def build(cur):
        return {
            "op": "clone",
            "schema": TX.read_manifest(spark, p, cur)["schema"],
            "add": [],
            "remove": [],
            "truncate": True,
            "properties": {"owner": "other"},
        }

    with pytest.raises(TX.TxPropertyViolation, match="appendOnly"):
        TX._commit(spark, p, build)
    assert rows(TX.tx_read(spark, p).select("k")) == [(1,), (2,), (3,)]


def test_history_dv_metrics_seeded_across_vacuum_truncation(spark, tmp_path):
    """DESCRIBE HISTORY's num_dv_deleted_rows replays dv_count deltas; on a
    vacuum-truncated log the replay must seed from the grounding snapshot
    so a later commit re-adding a DV'd entry is charged only its true
    delta, and the grounding record flags its own DV metric approximate."""
    p = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame([(k, f"v{k}") for k in range(10)], "k long, v string"),
        p,
    )
    TX.tx_delete(spark, p, where={"k": (0, 2)}, use_dv=True)  # dv_count=3
    pre = TX.tx_history(spark, p)
    assert pre[-1]["operation_metrics"]["num_dv_deleted_rows"] == 3
    TX.tx_vacuum(spark, p, keep_versions=1, retain_hours=0.0)
    TX.tx_delete(spark, p, where={"k": (3, 4)}, use_dv=True)  # cumulative 5
    hist = TX.tx_history(spark, p)
    assert [h["version"] for h in hist] == [2, 3]
    ground, newer = hist
    # grounding commit's pre-state is gone: metric reads 0, flagged approx
    assert ground["operation_metrics"]["num_dv_deleted_rows"] == 0
    assert ground["operation_metrics"]["dv_metrics_approximate"] is True
    # the post-vacuum delete is charged its TRUE delta (2), not the
    # cumulative dv_count (5) its manifest entry carries
    assert newer["operation_metrics"]["num_dv_deleted_rows"] == 2
    assert "dv_metrics_approximate" not in newer["operation_metrics"]


def test_data_skipping_columns_property_defaults(spark, tmp_path):
    """dataSkippingColumns / bloomFilterColumns table properties: every
    write and rewrite that passes no stats_for/bloom_for records stats
    for the declared columns — OPTIMIZE and DML can never silently strip
    the table's skipping indexes. Explicit arguments still win."""
    p = str(tmp_path / "t")
    TX.tx_write(
        spark,
        spark.createDataFrame([(k, f"v{k}") for k in range(20)], "k long, v string"),
        p,
    )
    TX.tx_set_properties(
        spark, p, {"dataSkippingColumns": "k", "bloomFilterColumns": "v"}
    )

    def entries():
        cur = TX.current_version(spark, p)
        return TX.read_manifest(spark, p, cur)["files"]

    # v1's files predate the property: no stats. A plain append records both.
    TX.tx_write(spark, _df(spark, 100), p, mode="append")
    fresh = [f for f in entries() if f.get("stats")]
    assert fresh and all("k" in f["stats"] for f in fresh)
    assert all(f.get("bloom", {}).get("v") for f in fresh)
    # full OPTIMIZE (tx_write overwrite underneath) keeps them
    TX.tx_compact(spark, p, n_files=2)
    assert all("k" in f.get("stats", {}) for f in entries())
    assert all(f.get("bloom", {}).get("v") for f in entries())
    # DML rewrite keeps them too
    TX.tx_update(spark, p, where={"k": (3, 3)}, assignments={"v": F.lit("X")})
    assert all("k" in f.get("stats", {}) for f in entries())
    # and a ranged read actually skips: only one file can contain k=100
    hit = [
        f for f in entries()
        if TX._file_overlaps(f, {"k": (100, 100)})
    ]
    assert len(hit) < len(entries())
