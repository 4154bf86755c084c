"""txlog table consistency checker (operational FSCK).

Validates a versioned delta-log table the way an on-call runbook would
before/after maintenance:

- version chain: contiguous numbering, each commit record parseable,
  schema present
- snapshot grounding: the oldest retained version resolves (checkpoint +
  tail), and the snapshot can be rolled forward through every delta
- checkpoints: each checkpoint's file listing matches the incrementally
  resolved snapshot at its version (drift = a broken checkpoint writer)
- file references: every file of the CURRENT snapshot exists on disk
  (errors); files referenced only by older kept versions that are missing
  are warnings (a vacuum raced a reader or a restore target was reaped)
- orphans: data files no kept version references (uncommitted crash
  leftovers — normal, reaped by tx_vacuum; reported with total bytes)
- stats/bloom entries: structurally well-formed (tagged min/max, hex
  bitsets of the expected width)

Exit 0 when the CURRENT version is fully readable (orphans are a
warning, not an error); exit 1 on dangling references or malformed
records.

Usage: python tools/table_doctor.py <table_path>
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def _validate_entry(report: dict, TX, v: int, f: dict) -> None:
    bloom = f.get("bloom") or {}
    for col, hexset in bloom.items():
        if len(hexset) != TX._BLOOM_BITS // 4 or any(
            c not in "0123456789abcdef" for c in hexset
        ):
            report["errors"].append(
                f"v{v}: malformed bloom bitset for {col} in {f['path']}"
            )
    for col, st in (f.get("stats") or {}).items():
        if "t" not in st or "min" not in st or "max" not in st:
            report["errors"].append(
                f"v{v}: malformed stats entry for {col} in {f['path']}"
            )


def doctor(spark, path: str) -> dict:
    from cdk_datalake_analytics_comercial_spark.sources import txlog as TX

    report: dict = {"path": path, "errors": [], "warnings": []}
    versions, checkpoints = TX._log_listing(spark, path)
    report["versions"] = versions
    report["checkpoints"] = checkpoints
    if not versions:
        report["errors"].append("no committed versions")
        return report
    expect = list(range(versions[0], versions[0] + len(versions)))
    if versions != expect:
        report["warnings"].append(
            f"version chain has gaps (vacuumed history?): {versions}"
        )

    root = path.rstrip("/")

    # ground at the oldest retained version (checkpoint + tail when the
    # log was vacuumed), then roll the snapshot forward one delta record
    # at a time — O(checkpoint + versions), never O(versions * snapshot)
    try:
        state = {
            f["path"]: f
            for f in TX.read_manifest(spark, path, versions[0])["files"]
        }
    except TX.TxProtocolError as e:
        report["errors"].append(f"protocol: {e}")
        return report
    except Exception as e:
        report["errors"].append(f"v{versions[0]}: unresolvable snapshot: {e}")
        return report
    for f in state.values():
        _validate_entry(report, TX, versions[0], f)
    try:
        proto = TX.tx_protocol(spark, path)
        report["protocol"] = proto
        report["properties"] = TX.tx_properties(spark, path)
        unknown_r = set(proto.get("reader_features", ())) - set(
            TX.SUPPORTED_READER_FEATURES
        )
        unknown_w = set(proto.get("writer_features", ())) - set(
            TX.SUPPORTED_WRITER_FEATURES
        )
        if unknown_r:
            report["errors"].append(
                f"table requires unknown reader feature(s): {sorted(unknown_r)}"
            )
        if unknown_w:
            report["warnings"].append(
                f"table requires unknown writer feature(s): {sorted(unknown_w)}"
            )
    except TX.TxProtocolError as e:
        report["errors"].append(str(e))
    # identity allocator consistency: a mark BEHIND the data means the
    # next allocation would mint duplicate ids — that is corruption, not
    # style (one max/min aggregate per declared column)
    try:
        cur = versions[-1]
        snap = TX.read_manifest(spark, path, cur)
        idents = TX._identity_cols(snap.get("properties", {}))
        marks = snap.get("identity", {})
        if idents:
            report["identity"] = dict(marks)
            from pyspark.sql import functions as F

            live = TX.tx_read(spark, path)
            for c, decl in idents.items():
                step = int(decl.get("step", 1))
                agg = live.agg(F.max(c).alias("mx"), F.min(c).alias("mn")).collect()[0]
                ext = agg["mx"] if step > 0 else agg["mn"]
                if c not in marks:
                    report["errors"].append(
                        f"identity column {c!r} declared but no allocation "
                        "mark in the manifest"
                    )
                elif ext is not None and (
                    (step > 0 and int(ext) > int(marks[c]))
                    or (step < 0 and int(ext) < int(marks[c]))
                ):
                    report["errors"].append(
                        f"identity mark for {c!r} ({marks[c]}) is behind the "
                        f"data ({ext}) — next allocation would duplicate ids"
                    )
    except Exception as e:  # doctor must report, never crash
        report["warnings"].append(f"identity check skipped: {e}")
    referenced_all: set[str] = set(state)
    for v in versions[1:]:
        try:
            rec = TX.read_commit(spark, path, v, check_protocol=False)
        except Exception as e:
            report["errors"].append(f"v{v}: unreadable commit record: {e}")
            continue
        if "schema" not in rec:
            report["errors"].append(f"v{v}: commit record missing schema")
        for f in rec.get("add", []) + rec.get("files", []):
            _validate_entry(report, TX, v, f)
        state = TX._apply_commit(state, rec)
        referenced_all.update(state)
        if v in checkpoints:
            try:
                cp = TX._load_checkpoint(spark, path, v)
                cp_paths = {f["path"] for f in cp.get("files", [])}
                if cp_paths != set(state):
                    report["errors"].append(
                        f"c{v}: checkpoint drifts from the delta chain "
                        f"(+{len(cp_paths - set(state))}/"
                        f"-{len(set(state) - cp_paths)} files)"
                    )
            except Exception as e:
                report["errors"].append(f"c{v}: unreadable checkpoint: {e}")

    # one existence probe per distinct referenced path; severity depends
    # on whether the CURRENT snapshot still needs the file
    for pth in sorted(referenced_all):
        full, _bd = TX._resolve_file(root, pth)
        if not TX._exists(spark, full):
            sev = "errors" if pth in state else "warnings"
            report[sev].append(f"dangling file reference {pth}")

    # deletion-vector sidecars the CURRENT snapshot depends on must exist
    for pth, entry in sorted(state.items()):
        for ref in entry.get("dv", ()) if isinstance(entry, dict) else ():
            if not TX._exists(spark, f"{root}/{ref}"):
                report["errors"].append(
                    f"missing deletion-vector sidecar {ref} (referenced by "
                    f"{pth}) — reads would resurrect deleted rows"
                )

    data_root = f"{root}/{TX._DATA}"
    orphans = []
    orphan_bytes = 0
    if TX._exists(spark, data_root):
        dfs, dp, _ = TX._fs(spark, data_root)
        prefix = dfs.makeQualified(dp).toString()
        it = dfs.listFiles(dp, True)
        while it.hasNext():
            st = it.next()
            full = st.getPath().toString()
            name = st.getPath().getName()
            if not name.endswith(".parquet") or name.startswith(("_", ".")):
                continue
            # manifest paths are relative (data/<batch>/...); normalize the
            # listing's qualified URI the same way tx_vacuum does
            rel = f"{TX._DATA}/" + full[len(prefix) :].lstrip("/")
            if rel not in referenced_all and full not in referenced_all:
                orphans.append(full[len(prefix) :].lstrip("/"))
                orphan_bytes += st.getLen()
    if orphans:
        report["warnings"].append(
            f"{len(orphans)} orphan data file(s), {orphan_bytes} bytes "
            "(uncommitted leftovers; tx_vacuum reaps them)"
        )
    report["orphans"] = orphans

    # the ultimate check: the current snapshot actually reads
    try:
        n = TX.tx_read(spark, path).count()
        report["current_rows"] = n
    except Exception as e:
        report["errors"].append(f"current snapshot unreadable: {e}")
    return report


def main() -> None:
    from cdk_datalake_analytics_comercial_spark.core import get_spark

    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(2)
    spark = get_spark("table-doctor")
    rep = doctor(spark, sys.argv[1])
    print(json.dumps(rep, indent=1))
    sys.exit(1 if rep["errors"] else 0)


if __name__ == "__main__":
    main()
