"""txlog table consistency checker (operational FSCK).

Validates a versioned-manifest table the way an on-call runbook would
before/after maintenance:

- version chain: contiguous numbering, each manifest parseable, schema
  present
- file references: every file in every kept manifest exists on disk
  (a dangling reference means a vacuum raced a reader or a restore
  target was reaped)
- orphans: data files no kept manifest references (uncommitted crash
  leftovers — normal, reaped by tx_vacuum; reported with total bytes)
- stats/bloom entries: structurally well-formed (tagged min/max, hex
  bitsets of the expected width)

Exit 0 when the CURRENT version is fully readable (orphans are a
warning, not an error); exit 1 on dangling references or malformed
manifests.

Usage: python tools/table_doctor.py <table_path>
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def doctor(spark, path: str) -> dict:
    from cdk_datalake_analytics_comercial_spark.sources import txlog as TX

    report: dict = {"path": path, "errors": [], "warnings": []}
    versions = TX.list_versions(spark, path)
    report["versions"] = versions
    if not versions:
        report["errors"].append("no committed versions")
        return report
    expect = list(range(versions[0], versions[0] + len(versions)))
    if versions != expect:
        report["warnings"].append(
            f"version chain has gaps (vacuumed history?): {versions}"
        )

    fs, root_p, _ = TX._fs(spark, path.rstrip("/"))
    root = path.rstrip("/")
    # manifest-side paths are relative (data/<batch>/...) or absolute for
    # shallow clones; keep BOTH forms so the orphan test below can compare
    # the listing's qualified URIs against the same normalization tx_vacuum
    # uses (a qualified-vs-unqualified mismatch previously reported every
    # live file as an orphan)
    referenced: set[str] = set()
    referenced_rel: set[str] = set()
    for v in versions:
        try:
            m = TX.read_manifest(spark, path, v)
        except Exception as e:
            report["errors"].append(f"v{v}: unreadable manifest: {e}")
            continue
        if "schema" not in m:
            report["errors"].append(f"v{v}: manifest missing schema")
        for f in m.get("files", []):
            full, _bd = TX._resolve_file(root, f["path"])
            referenced.add(full)
            referenced_rel.add(f["path"])
            if not TX._exists(spark, full):
                sev = "errors" if v == versions[-1] else "warnings"
                report[sev].append(f"v{v}: dangling file reference {f['path']}")
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
            rel = f"{TX._DATA}/" + full[len(prefix) :].lstrip("/")
            if rel not in referenced_rel and full not in referenced:
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
    import json

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
