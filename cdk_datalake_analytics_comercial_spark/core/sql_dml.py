"""SQL DML by TABLE NAME over txlog tables — the serving layer's write
face.

The reference's consumption surface is SQL-by-name (Glue catalog →
Athena, `stacks/cdk_datalake_analytics_stack.py:483-522`); Delta gives that
persona ``UPDATE``/``DELETE``/``MERGE INTO``/``INSERT OVERWRITE`` by
table name. The engine has every writer already —
``txlog.tx_update/tx_delete/tx_merge/tx_write`` — but until this module
a SQL-only consumer could not express the engine's own GDPR
point-delete. :func:`sql_dml` parses the statement head, resolves the
catalog name back to its txlog path through the pinned-format registry,
and dispatches to the native writer; anything it does not recognize
passes through ``spark.sql`` unchanged, so it can serve as the single
SQL entry point.

Supported statements (``db.table`` names registered by
``sql_serving.register_txlog_table`` / ``register_sql``):

- ``DELETE FROM db.t WHERE <pred>`` — including the GDPR
  bulk-delete-by-list shape ``WHERE k IN (SELECT …) [AND …]``: small
  key sets inline to a literal IN-list (file pruning intact), large
  ones route as a distributed merge-delete (``_delete_subquery``).
- ``UPDATE db.t SET c = <expr>, ... [WHERE <pred>]`` — the redact-by-
  list shape ``WHERE k IN (SELECT …)`` routes the same two tiers as
  the subquery DELETE.
- ``INSERT INTO db.t REPLACE WHERE <pred> <query>`` — Delta's
  replaceWhere: ONE atomic commit deletes the predicate's rows
  (file-pruned) and lands the query's rows, every incoming row
  validated to satisfy the predicate.
- ``MERGE INTO db.t [AS a] USING <table|(query)> [AS b] ON <equi-keys>
  WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
  [WHEN NOT MATCHED BY SOURCE THEN DELETE]`` — plus Delta's GENERAL
  clause forms (``_merge_general`` → ``tx_merge(clauses=…)``):
  ``WHEN MATCHED [AND <cond>] THEN UPDATE SET col = expr, … | DELETE``,
  ``WHEN NOT MATCHED [AND <cond>] THEN INSERT (cols) VALUES (exprs)``,
  ``WHEN NOT MATCHED BY SOURCE [AND <cond>] THEN DELETE | UPDATE SET …``
  — first-match clause order, expressions over both sides, the whole
  merge one Catalyst plan. CASE expressions inside clause conditions
  and assignments parse correctly: the splitter treats everything
  between CASE and END as not-top-level, so a CASE's WHEN/THEN never
  collide with the clause grammar.
- ``INSERT INTO db.t [(cols)] <query|VALUES …>`` — atomic append via
  ``tx_write`` (unlike the Python-Data-Source INSERT path, this honors
  identity/default/generated columns, CHECK constraints, bloom
  upkeep, row tracking and column mapping, because ``tx_write`` is the
  enforcing writer).
- ``INSERT OVERWRITE [TABLE] db.t [PARTITION (p = v [, q])] [(cols)]
  <query|VALUES …>`` — on a hive-partitioned table this is DYNAMIC
  partition overwrite (K1, `common_jobs_functions.py:312`): ONLY the
  partitions present in the incoming rows are replaced, in one atomic
  commit; unpartitioned tables get the full snapshot replace (column
  subsets NULL-fill the unlisted columns, SQL semantics). A static
  ``PARTITION (p = v)`` spec pins the literal (the query omits the
  column) and replaces exactly that partition.
- Maintenance by name (Delta's SQL utility surface): ``OPTIMIZE db.t
  [WHERE part = v] [ZORDER BY (cols)]`` (incremental bin-pack /
  re-cluster via ``tx_compact``; the WHERE form scopes both shapes to
  the matching partitions), ``VACUUM db.t [RETAIN n HOURS] [DRY RUN]``
  (→ reaped-paths DataFrame), ``DESCRIBE HISTORY db.t`` (commit log +
  operation metrics as a DataFrame), ``RESTORE TABLE db.t TO VERSION
  AS OF n`` (metadata-only restore commit), ``DESCRIBE DETAIL db.t``
  (snapshot facts: version, files, bytes, live rows, partitioning,
  properties), ``TRUNCATE TABLE db.t`` (an all-rows delete COMMIT —
  time-travelable/undoable, properties and constraints survive).
- DDL by name: ``ALTER TABLE db.t ADD COLUMN(s) … | RENAME COLUMN a TO
  b | DROP COLUMN c | ADD CONSTRAINT n CHECK (…) | DROP CONSTRAINT n |
  ALTER COLUMN c SET NOT NULL | DROP NOT NULL | SET DEFAULT <expr> |
  DROP DEFAULT | SET TBLPROPERTIES (…)`` — the metadata-only schema writers, with
  automatic catalog re-registration so SELECT sees the new shape; and
  ``SHOW TBLPROPERTIES db.t`` served from the txlog property record.
- ``CREATE [OR REPLACE] TABLE db.t USING txlog [LOCATION '…']
  [PARTITIONED BY (…)] AS <query>`` — CTAS, external or managed; and
  the empty-table DDL form ``CREATE TABLE db.t (col TYPE, …) USING
  txlog [LOCATION '…'] [PARTITIONED BY (…)]`` (version 1 commits the
  schema with zero rows) — column items accept the full Delta DDL
  surface: ``NOT NULL``, ``DEFAULT <expr>``, ``GENERATED {ALWAYS|BY
  DEFAULT} AS IDENTITY [(START WITH n [INCREMENT BY s])]``,
  ``GENERATED ALWAYS AS (expr)`` and table-level ``CONSTRAINT name
  CHECK (expr)``, each applied as a metadata commit so the invariants
  hold from the first INSERT.
- ``CONVERT TO TXLOG parquet.`/path`` [PARTITIONED BY (cols)]`` —
  Delta's CONVERT TO DELTA: in-place, metadata-only conversion of an
  existing parquet directory (files referenced where they sit, rows
  from footers; zero data moved).
- ``CREATE TABLE db.t2 SHALLOW CLONE db.t [VERSION AS OF n]
  [LOCATION '…']`` — metadata-only branch via ``tx_clone`` (zero data
  copied even for a petabyte source; the clone evolves independently).
- ``SELECT … FROM db.t VERSION AS OF n | TIMESTAMP AS OF ts`` anywhere
  a table reference appears — rewritten onto auto-registered frozen
  catalog twins.

Scale: the WHERE clause is decomposed into top-level conjuncts;
sargable ones (``col = lit``, ``col >|>=|<|<= lit``, ``col BETWEEN a
AND b``, ``col IN (lits)``) become the structured ``where``/
``where_equals`` specs that drive FILE PRUNING (range stats + Bloom
bitsets — a point DELETE on a bloom-indexed 100 TB table rewrites only
the files that can contain the key), and the FULL predicate text rides
along as the row-level ``condition``. Non-sargable predicates still
execute correctly — they just scan every live file, exactly Delta's
behavior for an unselective DELETE.

Concurrency: every dispatched statement inherits the writer's
optimistic CAS — a racing ``tx_write`` overlapping the predicate raises
``TxConflictError``, never silent loss (tested in
``tests/test_sql_dml.py``).

:func:`sql_script` runs a multi-statement ``.sql`` text through the
same router (top-level ``;`` split, ``--`` comments stripped).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.txlog import _quoted_spans, _sub_outside_quotes  # noqa: F401

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*|`[^`]+`"
_TBL = rf"(?:{_IDENT})(?:\.(?:{_IDENT}))?"


def _unquote(ident: str) -> str:
    ident = ident.strip()
    return ident[1:-1] if ident.startswith("`") else ident


class SqlDmlError(ValueError):
    """A DML statement addressed a txlog table but could not be routed."""


def txlog_table_path(spark: SparkSession, table: str) -> tuple[str, dict] | None:
    """Resolve ``db.t`` to its txlog ``(path, pinned extra options)`` via
    the in-process pinned-format registry, or ``None`` when the name is
    not a txlog-backed catalog table (plain parquet tables, views, CTEs
    all return None and take the passthrough path)."""
    from ..streaming.source import _PINNED_SOURCES

    parts = [_unquote(p) for p in table.split(".")]
    fq = ".".join(parts)
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()
    except Exception:
        return None
    provider = next(
        (
            r.data_type
            for r in rows
            if r.col_name in ("Provider", "Name")
            and str(r.data_type).startswith("txlog")
        ),
        None,
    )
    if provider is None:
        # READ-OPTIMIZED registrations serve through a native parquet
        # relation (core/sql_serving._native_register); the txlog storage
        # path rides in TBLPROPERTIES, so DML on the name keeps routing to
        # the transactional writers in any process that can see the
        # catalog entry (the properties persist, unlike Python data source
        # provider classes).
        from .sql_serving import _NATIVE_PROP_EXTRA, _NATIVE_PROP_PATH

        is_parquet = any(
            r.col_name == "Provider" and str(r.data_type) == "parquet"
            for r in rows
        )
        if not is_parquet:
            return None
        try:
            props = {
                r.key: r.value
                for r in spark.sql(f"SHOW TBLPROPERTIES {fq}").collect()
            }
        except Exception:
            return None
        tpath = props.get(_NATIVE_PROP_PATH)
        if not tpath:
            return None
        import json as _json

        try:
            extra = _json.loads(props.get(_NATIVE_PROP_EXTRA) or "{}")
        except ValueError:
            extra = {}
        return tpath, extra
    pinned = _PINNED_SOURCES.get(provider)
    if pinned is None:
        raise SqlDmlError(
            f"{fq} is a txlog table (provider {provider}) but its pinned "
            "format is not registered in this process — re-run "
            "register_sql/register_txlog_table first (registration is "
            "metadata-only and idempotent)"
        )
    return pinned


def _split_top(text: str, sep: str) -> list[str]:
    """Split on a top-level keyword/char ``sep`` (regex, case-insens.),
    respecting single-quoted strings, backquoted identifiers and
    parentheses. ``BETWEEN … AND …`` keeps its AND; anything inside a
    ``CASE … END`` expression is NOT top-level (its WHEN/THEN/AND/OR
    belong to the CASE, never to the surrounding clause grammar)."""
    out, depth, last, i = [], 0, 0, 0
    between = 0
    case_depth = 0
    rx = re.compile(sep, re.IGNORECASE)
    n = len(text)
    while i < n:
        c = text[i]
        if c in ("'", '"'):  # "…" is a string literal in Spark SQL too
            j = i + 1
            while j < n:
                if text[j] == c:
                    if j + 1 < n and text[j + 1] == c:
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
            continue
        if c == "`":
            j = text.find("`", i + 1)
            i = (j if j != -1 else n) + 1
            continue
        if c == "(":
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            continue
        if _at_word_boundary(text, i):
            m = re.match(r"CASE\b", text[i:], re.IGNORECASE)
            if m:
                case_depth += 1
                i += m.end()
                continue
            m = re.match(r"END\b", text[i:], re.IGNORECASE)
            if m and case_depth > 0:
                case_depth -= 1
                i += m.end()
                continue
        if depth == 0 and case_depth == 0:
            m = re.match(r"BETWEEN\b", text[i:], re.IGNORECASE)
            if m and _at_word_boundary(text, i):
                between += 1
                i += m.end()
                continue
            m = rx.match(text, i)
            if m and (
                not m.group()[:1].isalpha() or _at_word_boundary(text, i)
            ):
                if between and re.match(r"AND\b", text[i:], re.IGNORECASE):
                    between -= 1  # the AND belongs to BETWEEN
                    i = m.end()
                    continue
                out.append(text[last:i])
                last = m.end()
                i = m.end()
                continue
        i += 1
    out.append(text[last:])
    return out


def _at_word_boundary(text: str, i: int) -> bool:
    return i == 0 or not (text[i - 1].isalnum() or text[i - 1] in "_`")


def _parse_literal(tok: str):
    """A SQL literal as a Python value, or the sentinel None for
    'not a literal' (NULL itself is not sargable for pruning)."""
    tok = tok.strip()
    if re.fullmatch(r"-?\d+", tok):
        return int(tok)
    m = re.fullmatch(r"(?is)date\s*'(\d{4}-\d{2}-\d{2})'", tok)
    if m:
        import datetime as _dt

        try:
            return _dt.date.fromisoformat(m.group(1))
        except ValueError:  # calendar-invalid (DATE '2023-02-30')
            return None
    m = re.fullmatch(r"(?is)timestamp\s*'([^']+)'", tok)
    if m:
        import datetime as _dt

        try:
            return _dt.datetime.fromisoformat(m.group(1).strip())
        except ValueError:
            return None
    if re.fullmatch(r"-?\d*\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+", tok):
        return float(tok)
    if (
        len(tok) >= 2
        and tok.startswith("'")
        and tok.endswith("'")
        and "'" not in tok[1:-1].replace("''", "")
    ):
        if "\\" in tok:
            # F.expr treats backslash as an escape; mirroring its full
            # escape table here is fragile, and a MISMATCHED value in a
            # pruning/equality probe silently loses rows — so a
            # backslash-bearing literal is simply not sargable (the
            # conjunct rides as the row-level condition, scan-all)
            return None
        return tok[1:-1].replace("''", "'")
    return None


_CMP = re.compile(
    rf"^\s*({_IDENT})\s*(=|>=|<=|>|<)\s*(.+?)\s*$", re.DOTALL
)
_BETWEEN = re.compile(
    rf"^\s*({_IDENT})\s+BETWEEN\s+(.+?)\s+AND\s+(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_IN = re.compile(
    rf"^\s*({_IDENT})\s+IN\s*\((.+)\)\s*$", re.IGNORECASE | re.DOTALL
)


def parse_predicate(pred: str) -> tuple[dict, dict, str | None]:
    """Decompose a WHERE clause into file-pruning hints + the residual
    row-level condition: ``(where ranges, where_equals probes,
    condition)``. Sargable top-level conjuncts feed the hints; the FULL
    predicate is returned as ``condition`` unless every conjunct was
    captured structurally (then ``None`` — the structured spec alone is
    complete, and keeps working on column-mapped tables where free-form
    text cannot be soundly rebound)."""
    if len(_split_top(pred, r"OR\b")) > 1:
        # SQL precedence: AND binds tighter than OR, so NO top-level-AND
        # conjunct of an OR-bearing clause is unconditional — `a OR b AND
        # c` means `a OR (b AND c)`, and pruning on `c` alone would lose
        # `a`-rows. Any top-level OR therefore suppresses ALL hints: file
        # pruning degrades to scan-every-live-file (sound, just
        # unselective) and the whole clause rides as the row condition.
        return {}, {}, pred
    where: dict[str, tuple] = {}
    where_equals: dict = {}
    all_sargable = True
    for conj in _split_top(pred, r"AND\b"):
        conj = conj.strip()
        while (
            conj.startswith("(")
            and conj.endswith(")")
            and _balanced(conj[1:-1])  # parens wrap the WHOLE conjunct
        ):
            conj = conj[1:-1].strip()
        m = _BETWEEN.match(conj)
        if m:
            col, lo, hi = _unquote(m.group(1)), *m.group(2, 3)
            lo_v, hi_v = _parse_literal(lo), _parse_literal(hi)
            if lo_v is not None and hi_v is not None:
                if not _merge_range(where, col, lo_v, hi_v):
                    all_sargable = False
                continue
            all_sargable = False
            continue
        m = _IN.match(conj)
        if m:
            col = _unquote(m.group(1))
            vals = [_parse_literal(v) for v in _split_top(m.group(2), r",")]
            if vals and all(v is not None for v in vals):
                try:
                    # the [min, max] ENVELOPE is a pruning hint only —
                    # it over-keeps, so the IN itself must always stay
                    # in the row-level residual condition
                    _merge_range(where, col, min(vals), max(vals))
                except TypeError:
                    pass
            all_sargable = False
            continue
        m = _CMP.match(conj)
        if m:
            col, op, rhs = _unquote(m.group(1)), m.group(2), m.group(3)
            v = _parse_literal(rhs)
            if v is not None:
                if op == "=":
                    prior = where_equals.setdefault(col, v)
                    if prior != v or not _merge_range(where, col, v, v):
                        # conflicting equality probes (a = 1 AND a = 'x'):
                        # same-type conflicts leave an empty range that
                        # prunes soundly, but MIXED-type ones cannot merge
                        # — keep the full predicate row-level so the
                        # original (vacuous) semantics are re-applied
                        all_sargable = False
                elif op in (">", ">="):
                    # strict treated as inclusive: sound (over-keeps),
                    # but the residual condition must then re-apply it
                    if not _merge_range(where, col, v, None):
                        all_sargable = False
                    all_sargable = all_sargable and op == ">="
                elif op in ("<", "<="):
                    if not _merge_range(where, col, None, v):
                        all_sargable = False
                    all_sargable = all_sargable and op == "<="
                continue
        all_sargable = False  # unparsed conjunct stays row-level only
    condition = None if all_sargable and (where or where_equals) else pred
    return where, where_equals, condition


def _balanced(s: str) -> bool:
    d = 0
    for c in s:
        d += c == "("
        d -= c == ")"
        if d < 0:
            return False
    return d == 0


def _merge_range(where: dict, col: str, lo, hi) -> bool:
    """Intersect ``[lo, hi]`` into ``where[col]``. Returns False when the
    bounds are type-incomparable with the existing ones (mixed-type
    conjuncts): the first bound is kept as an over-keeping hint, and the
    CALLER must then demote the clause to row-level-only — the structured
    spec alone no longer captures the predicate."""
    cur = where.setdefault(col, (None, None))
    new_lo, new_hi = cur
    try:
        if lo is not None and (new_lo is None or lo > new_lo):
            new_lo = lo
        if hi is not None and (new_hi is None or hi < new_hi):
            new_hi = hi
    except TypeError:
        return False  # mixed types across conjuncts: keep the first bound
    where[col] = (new_lo, new_hi)
    return True


_DELETE = re.compile(
    rf"^\s*DELETE\s+FROM\s+({_TBL})\s*(?:WHERE\s+(.*))?$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE = re.compile(
    rf"^\s*OPTIMIZE\s+({_TBL})\s*"
    r"(?:WHERE\s+(.*?))?\s*"
    rf"(?:ZORDER\s+BY\s*\(((?:\s*(?:{_IDENT})\s*,?)+)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_VACUUM = re.compile(
    rf"^\s*VACUUM\s+({_TBL})"
    r"(?:\s+RETAIN\s+(\d+(?:\.\d+)?)\s+HOURS)?(\s+DRY\s+RUN)?\s*$",
    re.IGNORECASE,
)
_HISTORY = re.compile(
    rf"^\s*DESCRIBE\s+HISTORY\s+({_TBL})\s*$", re.IGNORECASE
)
_DETAIL = re.compile(
    rf"^\s*DESCRIBE\s+DETAIL\s+({_TBL})\s*$", re.IGNORECASE
)
_TRUNCATE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+({_TBL})\s*$", re.IGNORECASE
)
_RESTORE = re.compile(
    rf"^\s*RESTORE\s+(?:TABLE\s+)?({_TBL})\s+TO\s+(VERSION|TIMESTAMP)"
    r"\s+AS\s+OF\s+(\d+|'(?:[^']|'')*')\s*$",
    re.IGNORECASE,
)
_ALTER = re.compile(
    rf"^\s*ALTER\s+TABLE\s+({_TBL})\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_SHOW_PROPS = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+({_TBL})\s*$", re.IGNORECASE
)
_CONVERT = re.compile(
    rf"^\s*CONVERT\s+TO\s+TXLOG\s+"
    rf"(?:parquet\s*\.\s*`([^`]+)`|({_TBL}))"
    r"(?:\s+PARTITIONED\s+BY\s*\((.*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_CLONE = re.compile(
    rf"^\s*CREATE\s+TABLE\s+({_TBL})\s+SHALLOW\s+CLONE\s+({_TBL})"
    r"(?:\s+VERSION\s+AS\s+OF\s+(\d+))?"
    r"(?:\s+LOCATION\s+'((?:[^']|'')*)')?\s*$",
    re.IGNORECASE,
)
_CTAS = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+({_TBL})\s+USING\s+txlog\b"
    r"(.*?)\s+AS\s+(SELECT|WITH|VALUES|TABLE)\b(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CREATE_EMPTY = re.compile(
    rf"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+({_TBL})\s*"
    r"\((.*)\)\s*USING\s+txlog\b(.*)$",
    re.IGNORECASE | re.DOTALL,
)
_CTAS_LOCATION = re.compile(
    r"LOCATION\s+'((?:[^']|'')*)'", re.IGNORECASE
)
_CTAS_PARTITIONED = re.compile(
    rf"PARTITIONED\s+BY\s*\(((?:\s*(?:{_IDENT})\s*,?)+)\)", re.IGNORECASE
)
_UPDATE = re.compile(
    rf"^\s*UPDATE\s+({_TBL})\s+SET\s+(.*)$", re.IGNORECASE | re.DOTALL
)
_MERGE = re.compile(
    rf"^\s*MERGE\s+(WITH\s+SCHEMA\s+EVOLUTION\s+)?INTO\s+({_TBL})"
    rf"(?:\s+AS)?(?:\s+({_IDENT}))?\s+USING\s+",
    re.IGNORECASE,
)
_INSERT = re.compile(
    rf"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?({_TBL})\s*"
    rf"(?:PARTITION\s*\(([^)]*)\)\s*)?"
    rf"(\((?:\s*(?:{_IDENT})\s*,?)+\))?\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)


_COPY_INTO = re.compile(
    rf"^\s*COPY\s+INTO\s+({_TBL})\s+FROM\s+'((?:[^']|'')*)'\s+"
    r"FILEFORMAT\s*=\s*(\w+)\s*(.*)$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_option_list(table: str, clause: str, body: str) -> dict:
    """``'k' = 'v', …`` inside FORMAT_OPTIONS/COPY_OPTIONS parens."""
    out: dict[str, str] = {}
    for item in _split_top(body, r","):
        if not item.strip():
            continue
        m = re.match(
            r"^\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$", item
        )
        if not m:
            raise SqlDmlError(
                f"COPY INTO {table}: cannot parse {clause} item "
                f"{item.strip()!r} (expected 'key' = 'value')"
            )
        out[m.group(1).replace("''", "'")] = m.group(2).replace("''", "'")
    return out


def _copy_into(
    spark: SparkSession, table: str, src: str, fmt: str, tail: str
):
    """``COPY INTO db.t FROM '<path>' FILEFORMAT = PARQUET|CSV|JSON
    [PATTERN = '<glob>'] [FORMAT_OPTIONS ('k' = 'v', …)]
    [COPY_OPTIONS ('force' = 'true')]`` — Delta's idempotent bulk-file
    ingestion by name, routed onto :func:`txlog.tx_copy_into` (each
    source file lands exactly once across reruns; the ledger rides the
    same atomic commit as the rows)."""
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        raise SqlDmlError(
            f"COPY INTO {table}: not a registered txlog table (COPY INTO "
            "routes to the transactional writer)"
        )
    path, extra = _writable(table, pinned)
    pattern: str | None = None
    fopts: dict = {}
    copts: dict = {}
    rest = tail.strip()
    while rest:
        m = re.match(
            r"^PATTERN\s*=\s*'((?:[^']|'')*)'\s*(.*)$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            pattern = m.group(1).replace("''", "'")
            rest = m.group(2).strip()
            continue
        m = re.match(
            r"^(FORMAT_OPTIONS|COPY_OPTIONS)\s*\(([^)]*)\)\s*(.*)$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            parsed = _parse_option_list(table, m.group(1).upper(), m.group(2))
            if m.group(1).upper() == "FORMAT_OPTIONS":
                fopts.update(parsed)
            else:
                copts.update(parsed)
            rest = m.group(3).strip()
            continue
        raise SqlDmlError(
            f"COPY INTO {table}: cannot parse clause {rest[:60]!r} "
            "(expected PATTERN = '…', FORMAT_OPTIONS (…), COPY_OPTIONS (…))"
        )
    unknown_copts = set(copts) - {"force"}
    if unknown_copts:
        raise SqlDmlError(
            f"COPY INTO {table}: unsupported COPY_OPTIONS "
            f"{sorted(unknown_copts)} (supported: 'force')"
        )
    from ..sources.txlog import tx_copy_into

    return tx_copy_into(
        spark,
        path,
        src.replace("''", "'"),
        fmt,
        pattern=pattern,
        format_options=fopts or None,
        force=copts.get("force", "false").strip().lower() == "true",
    )


_TRAVEL = re.compile(
    rf"\b(FROM|JOIN|USING)\s+({_TBL})\s+(VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"('(?:[^']|'')*'|[0-9][-0-9.:TZ+]*)",
    re.IGNORECASE,
)




def _rewrite_time_travel(spark: SparkSession, stmt: str) -> str:
    """Delta's SQL time travel — ``SELECT … FROM db.t VERSION AS OF 3``
    / ``TIMESTAMP AS OF '2026-08-16'`` — rewritten onto FROZEN catalog
    twins: each travel clause auto-registers ``db.t__asof_…`` pinned at
    that version (idempotent, metadata-only) and the statement text is
    substituted to read from it. Works anywhere a table reference can
    appear (plain SELECTs, MERGE USING sources, INSERT SELECT)."""

    def sub(m: re.Match) -> str:
        kw, tbl, kind, lit = m.groups()
        pinned = txlog_table_path(spark, tbl)
        if pinned is None:
            raise SqlDmlError(
                f"{tbl}: {kind.upper()} AS OF needs a registered txlog "
                "table (plain parquet tables keep no version history)"
            )
        path, _ = pinned
        from .sql_serving import register_txlog_table

        parts = [_unquote(p) for p in tbl.split(".")]
        db = (
            parts[0]
            if len(parts) == 2
            else spark.catalog.currentDatabase()
        )
        base = parts[-1]
        val = _parse_literal(lit)
        if val is None:
            raise SqlDmlError(
                f"{tbl}: cannot parse {kind.upper()} AS OF literal {lit!r}"
            )
        # frozen twins are SELECT-only catalog objects created by this
        # rewriter, so the read-optimized native relation is always safe
        # (ineligible snapshots — DVs, mapping — still fall back)
        if kind.lower() == "version":
            if not isinstance(val, int):
                raise SqlDmlError(
                    f"{tbl}: VERSION AS OF takes an integer, got {lit!r}"
                )
            frozen = f"{base}__asof_v{val}"
            register_txlog_table(
                spark, db, frozen, path, version=val, read_optimized=True
            )
        else:
            import hashlib

            tag = hashlib.sha1(str(val).encode()).hexdigest()[:10]
            frozen = f"{base}__asof_t{tag}"
            register_txlog_table(
                spark, db, frozen, path, timestamp=val, read_optimized=True
            )
        return f"{kw} {db}.{frozen}"

    return _sub_outside_quotes(_TRAVEL, sub, stmt)


def sql_dml(spark: SparkSession, statement: str):
    """Execute one SQL statement by table name. DML/DDL targeting a
    registered txlog table dispatches to the native transactional
    writer and returns the committed VERSION (int) — except CTAS
    (returns the registered name) and VACUUM / DESCRIBE HISTORY / SHOW
    TBLPROPERTIES (return DataFrames). Everything else — including all
    reads — passes through ``spark.sql`` and returns its DataFrame.
    ``VERSION AS OF`` / ``TIMESTAMP AS OF`` table clauses are rewritten
    onto frozen catalog twins first."""
    stmt = statement.strip().rstrip(";")
    m = _RESTORE.match(stmt)  # before _TRAVEL: RESTORE … VERSION AS OF
    if m:
        return _restore(spark, *m.group(1, 2, 3))
    if _TRAVEL.search(stmt):
        stmt = _rewrite_time_travel(spark, stmt)
    m = _CONVERT.match(stmt)
    if m:
        return _convert(spark, m.group(1), m.group(2), m.group(3))
    m = _COPY_INTO.match(stmt)
    if m:
        return _copy_into(spark, *m.group(1, 2, 3, 4))
    m = _CLONE.match(stmt)
    if m:
        return _clone(spark, *m.group(1, 2, 3, 4))
    m = _CTAS.match(stmt)
    if m:
        return _ctas(
            spark,
            bool(m.group(1)),
            m.group(2),
            m.group(3),
            m.group(4) + m.group(5),
        )
    m = _CREATE_EMPTY.match(stmt)
    if m:
        ddl_parts, col_opts = _parse_create_columns(
            m.group(2), _split_top(m.group(3), r",")
        )
        try:
            empty = spark.createDataFrame([], ", ".join(ddl_parts))
        except Exception as e:
            raise SqlDmlError(
                f"CREATE TABLE {m.group(2)}: cannot parse column list "
                f"{m.group(3)!r} as a DDL schema ({e})"
            )
        fq = _ctas(
            spark, bool(m.group(1)), m.group(2), m.group(4), None, df=empty
        )
        if col_opts:
            _apply_create_options(spark, fq, col_opts)
        return fq
    m = _OPTIMIZE.match(stmt)
    if m:
        return _optimize(spark, m.group(1), m.group(3), m.group(2))
    m = _VACUUM.match(stmt)
    if m:
        return _vacuum(spark, m.group(1), m.group(2), bool(m.group(3)))
    m = _HISTORY.match(stmt)
    if m:
        r = _history(spark, m.group(1))
        if r is not None:
            return r
    m = _DETAIL.match(stmt)
    if m:
        r = _detail(spark, m.group(1))
        if r is not None:
            return r
    m = _TRUNCATE.match(stmt)
    if m:
        r = _truncate(spark, m.group(1))
        if r is not None:
            return r
    m = _ALTER.match(stmt)
    if m:
        r = _alter(spark, m.group(1), m.group(2))
        if r is not None:
            return r
    m = _SHOW_PROPS.match(stmt)
    if m:
        r = _show_properties(spark, m.group(1))
        if r is not None:
            return r
    m = _DELETE.match(stmt)
    if m:
        r = _delete(spark, m.group(1), m.group(2))
        return r if r is not None else spark.sql(stmt)
    m = _UPDATE.match(stmt)
    if m:
        r = _update(spark, m.group(1), m.group(2))
        return r if r is not None else spark.sql(stmt)
    m = _MERGE.match(stmt)
    if m:
        return _merge(spark, stmt, m)
    m = _INSERT.match(stmt)
    if m:
        r = _insert(spark, *m.group(1, 2, 4, 5), part_spec=m.group(3))
        return r if r is not None else spark.sql(stmt)
    return spark.sql(stmt)


def sql_script(spark: SparkSession, script: str) -> list:
    """Execute a multi-statement SQL script (the ``.sql``-file persona):
    statements split on TOP-LEVEL semicolons (quoted literals, backquoted
    identifiers and parenthesized subqueries keep theirs), line comments
    (``-- …``) stripped, each statement routed through :func:`sql_dml`.
    Returns the per-statement results in order; the first failing
    statement raises (no savepoints — the txlog writers are each
    atomic, so a failed script leaves every completed statement
    committed, exactly Delta's multi-statement semantics)."""
    decommented = "\n".join(
        _strip_line_comment(ln) for ln in script.splitlines()
    )
    out = []
    for stmt in _split_top(decommented, r";"):
        if stmt.strip():
            out.append(sql_dml(spark, stmt))
    return out


def _strip_line_comment(line: str) -> str:
    """Drop a ``-- comment`` tail unless the dashes sit inside a quoted
    region."""
    m = re.search(r"--", line)
    while m:
        if any(a <= m.start() < b for a, b in _quoted_spans(line)):
            m = re.compile(r"--").search(line, m.end())
            continue
        return line[: m.start()]
    return line


def _has_select_outside_quotes(pred: str) -> bool:
    """True when the predicate carries a SELECT token OUTSIDE quoted
    literals — ``WHERE note = 'SELECT me'`` is a plain predicate, not a
    subquery, and must not route to the subquery tier."""
    spans = _quoted_spans(pred)
    return any(
        not any(a <= m.start() < b for a, b in spans)
        for m in re.finditer(r"\bSELECT\b", pred, re.IGNORECASE)
    )


def _delete(spark: SparkSession, table: str, pred: str | None):
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    path, extra = _writable(table, pinned)
    from ..sources.txlog import tx_delete

    if not pred or not pred.strip():
        raise SqlDmlError(
            f"DELETE FROM {table} without WHERE would truncate the table; "
            "say WHERE true to mean it"
        )
    if _has_select_outside_quotes(pred):
        return _delete_subquery(spark, table, path, pred)
    where, where_equals, condition = parse_predicate(pred)
    return tx_delete(
        spark,
        path,
        where=where or None,
        where_equals=where_equals or None,
        condition=condition,
    )


_IN_SUBQ = re.compile(
    rf"^\s*({_IDENT})\s+(NOT\s+)?IN\s*\(\s*(SELECT\b.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
# the point-DML-by-list path stays file-pruned up to this many keys;
# larger subquery results route through the distributed merge
_SUBQ_INLINE_MAX = 1000


_EXISTS_CONJ = re.compile(
    r"^\s*EXISTS\s*\(\s*(SELECT\b.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_CORR_EQ = re.compile(
    rf"^\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*=\s*"
    rf"(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*$",
    re.DOTALL,
)


def _exists_to_in(table: str, pred: str) -> str | None:
    """Mechanically rewrite ONE top-level ``EXISTS (SELECT … FROM src
    WHERE <inner>)`` conjunct whose inner WHERE carries exactly one
    correlated equality ``t.k = <src side>`` (the OUTER side must be
    qualified by the target name — an unqualified name inside the
    subquery scope binds to the source) into the routable ``k IN
    (SELECT <src side> FROM src [WHERE rest])`` shape — semantically
    identical for equality correlation (NULLs match neither way).
    Returns the rewritten predicate, or None when the shape does not
    fit (the caller keeps the loud refusal)."""
    parts = [_unquote(p) for p in table.split(".")]
    outer = {parts[-1].lower(), ".".join(parts).lower()}

    def is_outer(q: str | None) -> bool:
        return q is not None and _unquote(q).lower() in outer

    out_conjs: list[str] = []
    rewrote = False
    for conj in _split_top(pred, r"AND\b"):
        m = _EXISTS_CONJ.match(conj)
        if not m:
            out_conjs.append(conj.strip())
            continue
        if rewrote:
            return None  # two EXISTS conjuncts — not routable
        halves = _split_top(m.group(1), r"WHERE\b")
        if len(halves) != 2:
            return None
        head, inner_where = halves[0].strip(), halves[1]
        fparts = _split_top(head, r"FROM\b")
        if len(fparts) != 2:
            return None  # select list carries its own FROM (subquery)
        from_part = fparts[1].strip()
        corr: tuple[str, str] | None = None
        rest: list[str] = []
        for ic in _split_top(inner_where, r"AND\b"):
            cm = _CORR_EQ.match(ic)
            if cm:
                lq, lc, rq, rc = cm.groups()
                if is_outer(lq) and not is_outer(rq):
                    if corr is not None:
                        return None  # two correlated equalities
                    corr = (
                        _unquote(lc),
                        f"{rq}.{rc}" if rq else rc,
                    )
                    continue
                if is_outer(rq) and not is_outer(lq):
                    if corr is not None:
                        return None
                    corr = (
                        _unquote(rc),
                        f"{lq}.{lc}" if lq else lc,
                    )
                    continue
            # any OTHER reference to the outer table inside the
            # subquery would dangle after the rewrite — not routable.
            # Qualifiers may be one OR two parts (t.col / db.t.col).
            def refs_outer(txt: str) -> bool:
                for qm in re.finditer(
                    rf"(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*\.\s*{_IDENT}",
                    txt,
                ):
                    quals = {_unquote(qm.group(2)).lower()}
                    if qm.group(1):
                        quals.add(
                            f"{_unquote(qm.group(1)).lower()}"
                            f".{_unquote(qm.group(2)).lower()}"
                        )
                    if quals & outer:
                        return True
                return False

            if refs_outer(ic):
                return None
            rest.append(ic.strip())
        if corr is None:
            return None
        sub = f"SELECT {corr[1]} FROM {from_part}"
        if rest:
            sub += " WHERE " + " AND ".join(rest)
        out_conjs.append(f"{corr[0]} IN ({sub})")
        rewrote = True
    return " AND ".join(out_conjs) if rewrote else None


def _parse_in_subquery(
    table: str, verb: str, pred: str
) -> tuple[str, str, list[str]]:
    """Decompose ``<pred>`` into (key column, subquery SQL, residual
    conjuncts) for the routable ``k IN (SELECT …) [AND …]`` shape, or
    refuse loudly (OR-combined, NOT IN/NOT EXISTS, multiple
    subqueries). A correlated-equality ``EXISTS`` rewrites onto the
    same IN tier first (:func:`_exists_to_in`)."""
    if len(_split_top(pred, r"OR\b")) > 1:
        raise SqlDmlError(
            f"{verb} {table}: subquery predicates cannot combine "
            "with top-level OR — split the statement"
        )
    if re.search(r"\bNOT\s+EXISTS\s*\(", pred, re.IGNORECASE):
        raise SqlDmlError(
            f"{verb} {table}: NOT EXISTS is refused — use MERGE … WHEN "
            "NOT MATCHED BY SOURCE for anti-join semantics"
        )
    if re.search(r"\bEXISTS\s*\(", pred, re.IGNORECASE):
        rewritten = _exists_to_in(table, pred)
        if rewritten is None:
            raise SqlDmlError(
                f"{verb} {table}: this EXISTS shape is not routable — "
                "supported: one EXISTS (SELECT … FROM src WHERE "
                f"{_unquote(table.split('.')[-1])}.k = <src column> "
                "[AND <src-only conjuncts>]); otherwise rewrite as "
                "k IN (SELECT …) or as MERGE … WHEN MATCHED"
            )
        return _parse_in_subquery(table, verb, rewritten)
    subq = None
    residual: list[str] = []
    for conj in _split_top(pred, r"AND\b"):
        m = _IN_SUBQ.match(conj.strip())
        if m:
            if m.group(2):
                raise SqlDmlError(
                    f"{verb} {table}: NOT IN (SELECT …) is refused "
                    "(NULL in the subquery silently matches nothing in "
                    "SQL) — use MERGE … WHEN NOT MATCHED BY SOURCE for "
                    "anti-join semantics"
                )
            if subq is not None:
                raise SqlDmlError(
                    f"{verb} {table}: at most one IN (SELECT …) "
                    "conjunct is routable per statement"
                )
            subq = (_unquote(m.group(1)), m.group(3))
            continue
        if _has_select_outside_quotes(conj):
            raise SqlDmlError(
                f"{verb} {table}: cannot route subquery in "
                f"{conj.strip()!r} (supported: one top-level "
                "k IN (SELECT …) conjunct)"
            )
        residual.append(conj.strip())
    assert subq is not None  # caller saw SELECT; conjuncts covered it
    return subq[0], subq[1], residual


def _subquery_keys_tier(
    spark: SparkSession, table: str, verb: str, col: str, sql: str
):
    """Run the IN-subquery once and pick the tier: returns
    ``("inline", [literal strings])`` when ≤ ``_SUBQ_INLINE_MAX``
    renderable distinct keys (file pruning stays intact), else
    ``("merge", keys_df)`` for the distributed hash semi-join path.
    An empty/all-NULL key list returns ``("empty", None)``."""
    keys_df = spark.sql(sql)
    if len(keys_df.columns) != 1:
        raise SqlDmlError(
            f"{verb} {table}: IN subquery must produce exactly one "
            f"column, got {len(keys_df.columns)}"
        )
    sample = keys_df.distinct().limit(_SUBQ_INLINE_MAX + 1).collect()
    vals = [r[0] for r in sample if r[0] is not None]
    if len(sample) <= _SUBQ_INLINE_MAX:
        if not vals:
            return "empty", None
        lits = [_render_literal(v) for v in vals]
        if all(s is not None for s in lits):
            return "inline", lits
    return "merge", keys_df.toDF(col).distinct()


def _delete_subquery(spark: SparkSession, table: str, path: str, pred: str):
    """``DELETE FROM t WHERE k IN (SELECT …) [AND …]`` — the GDPR
    bulk-delete-by-list shape. Two-tier:

    - ≤ ``_SUBQ_INLINE_MAX`` distinct keys: inlined as a literal IN-list
      and routed through the normal predicate path, so range-stats +
      Bloom FILE PRUNING still applies (a bulk point-delete on a
      bloom-indexed 100 TB table rewrites only the files that can
      contain the keys);
    - larger: routed as ``MERGE INTO t USING keys ON t.k = s.k WHEN
      MATCHED THEN DELETE`` — a distributed hash semi-join delete, no
      driver materialization beyond the tier probe.

    ``NOT IN (SELECT …)`` and ``EXISTS`` are refused loudly (NOT IN's
    null semantics are a trap; express the intent as WHEN NOT MATCHED BY
    SOURCE THEN DELETE via MERGE)."""
    from ..sources.txlog import current_version, tx_delete, tx_merge

    col, sql, residual = _parse_in_subquery(table, "DELETE FROM", pred)
    tier, payload = _subquery_keys_tier(spark, table, "DELETE FROM", col, sql)
    if tier == "empty":  # IN matches nothing
        return current_version(spark, path)
    if tier == "inline":
        inlined = f"{col} IN ({', '.join(payload)})"
        where, where_equals, condition = parse_predicate(
            " AND ".join([inlined] + residual)
        )
        return tx_delete(
            spark, path,
            where=where or None,
            where_equals=where_equals or None,
            condition=condition,
        )
    tgt_cols = _table_columns(spark, table) if residual else []
    cond = (
        " AND ".join(f"({_qualify_target(c, tgt_cols)})" for c in residual)
        if residual
        else None
    )
    return tx_merge(
        spark, payload, path, keys=[col],
        clauses={"matched": [{"cond": cond, "action": "delete"}]},
    )


def _update_subquery(
    spark: SparkSession,
    table: str,
    path: str,
    pred: str,
    set_items: dict[str, str],
):
    """``UPDATE t SET c = expr, … WHERE k IN (SELECT …) [AND …]`` — the
    GDPR redact-by-list shape, same two tiers as the subquery DELETE:
    inline literal IN-list (file-pruned ``tx_update``) or a merge with a
    conditional ``WHEN MATCHED THEN UPDATE SET`` clause (assignments and
    residual conjuncts qualified onto the target side — they reference
    no source column, the key list only selects rows)."""
    from ..sources.txlog import current_version, tx_merge, tx_update

    col, sql, residual = _parse_in_subquery(table, "UPDATE", pred)
    tier, payload = _subquery_keys_tier(spark, table, "UPDATE", col, sql)
    if tier == "empty":
        return current_version(spark, path)
    if tier == "inline":
        inlined = f"{col} IN ({', '.join(payload)})"
        where, where_equals, condition = parse_predicate(
            " AND ".join([inlined] + residual)
        )
        return tx_update(
            spark, path,
            assignments={c: F.expr(e) for c, e in set_items.items()},
            where=where or None,
            where_equals=where_equals or None,
            condition=condition,
        )
    tgt_cols = _table_columns(spark, table)
    cond = (
        " AND ".join(f"({_qualify_target(c, tgt_cols)})" for c in residual)
        if residual
        else None
    )
    return tx_merge(
        spark, payload, path, keys=[col],
        clauses={"matched": [{
            "cond": cond,
            "action": "update",
            "set": {
                c: _qualify_target(e, tgt_cols)
                for c, e in set_items.items()
            },
        }]},
    )


def _render_literal(v) -> str | None:
    """A Python value as a SQL literal, or None when not renderable."""
    import datetime as _dt

    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, _dt.datetime):  # before date — datetime IS a date
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        # the rendered list is re-parsed by F.expr, where backslash is
        # an escape character (escapedStringLiterals default) — escape
        # it FIRST, then double the quotes, or keys containing \ would
        # round-trip to a different value and silently miss rows
        return "'" + v.replace("\\", "\\\\").replace("'", "''") + "'"
    return None


def _qualify_target(conj: str, tgt_cols: list[str]) -> str:
    """Qualify references to ACTUAL target-table columns of a residual
    DELETE/UPDATE conjunct onto the merge's target side (``t.``). Only
    names present in ``tgt_cols`` are rewritten (mirroring
    ``_make_rebinder``'s schema-membership rule) — SQL keywords,
    function names, INTERVAL units (``INTERVAL 1 DAY``) and
    ``extract(year FROM d)`` tokens are left as written, so valid SQL
    that uses them never turns into bogus ``t.``-column refs. Quoted
    regions are data."""
    low = {c.lower(): c for c in tgt_cols}

    def sub(m: re.Match) -> str:
        first, dot, _second = m.group(1), m.group(2), m.group(3)
        if dot:
            return m.group(0)  # already qualified — leave as written
        col = low.get(_unquote(first).lower())
        if col is None:
            return m.group(0)  # not a target column — keyword/unit/etc.
        return f"t.`{col}`"

    def guarded(m: re.Match) -> str:
        rest = conj[m.end():].lstrip()
        if rest.startswith("("):
            return m.group(0)  # function call
        return sub(m)

    return _sub_outside_quotes(_EXPR_REF, guarded, conj)


def _table_columns(spark: SparkSession, table: str) -> list[str]:
    """Column names of a registered table (``db.t`` or bare), unquoted."""
    return spark.table(
        ".".join(_unquote(p) for p in table.split("."))
    ).columns


def _update(spark: SparkSession, table: str, set_and_where: str):
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    path, extra = _writable(table, pinned)
    from ..sources.txlog import tx_update

    parts = _split_top(set_and_where, r"WHERE\b")
    set_part = parts[0]
    pred = parts[1].strip() if len(parts) > 1 else None
    if len(parts) > 2:
        raise SqlDmlError(f"UPDATE {table}: more than one top-level WHERE")
    set_items: dict[str, str] = {}
    for item in _split_top(set_part, r","):
        m = re.match(
            rf"^\s*({_IDENT})\s*=\s*(.+?)\s*$", item, re.DOTALL
        )
        if not m:
            raise SqlDmlError(
                f"UPDATE {table}: cannot parse assignment {item.strip()!r}"
            )
        set_items[_unquote(m.group(1))] = m.group(2)
    if pred and _has_select_outside_quotes(pred):
        return _update_subquery(spark, table, path, pred, set_items)
    assignments = {c: F.expr(e) for c, e in set_items.items()}
    if pred:
        where, where_equals, condition = parse_predicate(pred)
    else:
        # SQL UPDATE without WHERE touches every row
        where, where_equals, condition = {}, {}, "true"
    return tx_update(
        spark,
        path,
        assignments=assignments,
        where=where or None,
        where_equals=where_equals or None,
        condition=condition,
    )


_MERGE_TAIL = re.compile(
    r"^ON\s+(.*?)\s+"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*"
    r"(WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE\s*)?$",
    re.IGNORECASE | re.DOTALL,
)


def _merge(spark: SparkSession, stmt: str, head: re.Match):
    """``MERGE [WITH SCHEMA EVOLUTION] INTO t USING s ON <equi-keys>
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` —
    the upsert shape ``tx_merge`` implements (source wins on every
    column; K3). ``WITH SCHEMA EVOLUTION`` is Delta's clause for
    drifting upstream schemas: new source columns EXTEND the table
    schema (existing rows null-pad) instead of refusing — threaded as
    ``tx_merge(schema_evolution=True)``. The optional ``WHEN NOT
    MATCHED BY SOURCE THEN DELETE`` maps to
    ``not_matched_by_source='delete'`` (full-sync semantics)."""
    evolve = bool(head.group(1))
    table, tgt_alias = head.group(2), head.group(3)
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        raise SqlDmlError(
            f"MERGE INTO {table}: not a registered txlog table (MERGE is "
            "only routable to the transactional writer)"
        )
    path, extra = _writable(table, pinned)
    rest = stmt[head.end():].strip()
    # source: `(subquery)` or a table name, optionally aliased
    if rest.startswith("("):
        depth, j = 0, 0
        for j, c in enumerate(rest):
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
        src_sql, rest2 = rest[1:j], rest[j + 1:]
    else:
        m = re.match(rf"\s*({_TBL})", rest)
        if not m:
            raise SqlDmlError(f"MERGE INTO {table}: cannot parse USING source")
        src_sql, rest2 = f"SELECT * FROM {m.group(1)}", rest[m.end():]
    m = re.match(rf"\s*(?:AS\s+)?({_IDENT})\s+(?=ON\b)", rest2, re.IGNORECASE)
    src_alias = None
    if m:
        src_alias = _unquote(m.group(1))
        rest2 = rest2[m.end():]
    from ..sources.txlog import tx_merge

    tail = _MERGE_TAIL.match(rest2.strip())
    if tail:
        # the upsert-all fast path (K3): source wins every column
        on, nmbs = tail.group(1), tail.group(2)
        keys = _merge_on_keys(on, table)
        source = spark.sql(src_sql)
        v = tx_merge(
            spark,
            source,
            path,
            keys=keys,
            not_matched_by_source="delete" if nmbs else None,
            schema_evolution=evolve,
        )
        if evolve:
            # the catalog relation pins the registration-time schema —
            # re-register so a new column is immediately visible by name
            # (same refresh ALTER TABLE ADD COLUMN performs)
            from .sql_serving import register_txlog_table

            parts = [_unquote(p) for p in table.split(".")]
            db = (
                parts[0]
                if len(parts) == 2
                else spark.catalog.currentDatabase()
            )
            register_txlog_table(spark, db, parts[-1], path)
        return v
    if evolve:
        # tx_merge refuses clauses+schema_evolution (explicit column
        # lists pin the shape) — surface that as a router-level refusal
        raise SqlDmlError(
            f"MERGE INTO {table}: WITH SCHEMA EVOLUTION is only "
            "supported on the UPDATE SET * / INSERT * shape — general "
            "WHEN clauses pin explicit columns; add the column with "
            "ALTER TABLE ADD COLUMN first"
        )
    return _merge_general(
        spark, table, path, rest2.strip(), src_sql, tgt_alias, src_alias
    )


def _merge_on_keys(on: str, table: str) -> list[str]:
    keys = []
    for conj in _split_top(on, r"AND\b"):
        m = re.match(
            rf"^\s*(?:({_IDENT})\.)?({_IDENT})\s*=\s*"
            rf"(?:({_IDENT})\.)?({_IDENT})\s*$",
            conj,
        )
        ok = False
        if m:
            lq, lc, rq, rc = (
                _unquote(g) if g else None for g in m.groups()
            )
            # same column name on both sides, and when both sides are
            # qualified they must name DIFFERENT relations (t.k = t.k
            # is a self-comparison, not a join key)
            ok = lc == rc and not (lq is not None and lq == rq)
        if not ok:
            raise SqlDmlError(
                f"MERGE INTO {table}: ON must be equi-join conjuncts "
                f"t.k = s.k on the same column name (got {conj.strip()!r})"
            )
        keys.append(lc)
    return keys


# clause HEADS (everything before the case-aware top-level THEN split):
# conditions are greedy-safe here because the action text is gone
_M_HEAD = re.compile(
    r"^MATCHED(?:\s+AND\s+(?P<cond>.+))?$", re.IGNORECASE | re.DOTALL
)
_NMBS_HEAD = re.compile(
    r"^NOT\s+MATCHED\s+BY\s+SOURCE(?:\s+AND\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_NM_HEAD = re.compile(
    r"^NOT\s+MATCHED(?:\s+BY\s+TARGET)?(?:\s+AND\s+(?P<cond>.+))?$",
    re.IGNORECASE | re.DOTALL,
)
_ACT_UPDATE = re.compile(
    r"^UPDATE\s+SET\s+(?P<set>.+)$", re.IGNORECASE | re.DOTALL
)
_ACT_INSERT = re.compile(
    r"^INSERT\s+(?P<ins>.+)$", re.IGNORECASE | re.DOTALL
)
_INS_COLS_VALS = re.compile(
    rf"^\((?P<cols>(?:\s*(?:{_IDENT})\s*,?)+)\)\s*"
    r"VALUES\s*\((?P<vals>.+)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_EXPR_REF = re.compile(
    rf"(?<![\w.`])({_IDENT})(\s*\.\s*({_IDENT}))?"
)


def _make_rebinder(
    table: str,
    tgt_names: set,
    src_names: set,
    tgt_cols: list[str],
    src_cols: list[str],
):
    """Expression canonicalizer for WHEN-clause conditions/assignments:
    alias-qualified references rewrite onto the fixed ``t.``/``s.``
    namespace ``tx_merge`` binds; BARE references resolve by schema
    membership (one side → qualified to it; both → refused as ambiguous;
    neither → left alone: function names, SQL keywords, type names).
    Quoted literals are data and never rewritten."""
    t_low = {c.lower(): c for c in tgt_cols}
    s_low = {c.lower(): c for c in src_cols}

    def rebind(expr: str) -> str:
        def sub(m: re.Match) -> str:
            first, dot, second = m.group(1), m.group(2), m.group(3)
            rest = expr[m.end():].lstrip()
            if dot:
                q = _unquote(first).lower()
                col = _unquote(second)
                if q in tgt_names:
                    return f"t.`{col}`"
                if q in src_names:
                    return f"s.`{col}`"
                raise SqlDmlError(
                    f"MERGE INTO {table}: unknown qualifier {q!r} in "
                    f"{expr.strip()!r} (target: {sorted(tgt_names)}, "
                    f"source: {sorted(src_names)})"
                )
            if rest.startswith("("):
                return m.group(0)  # function call
            name = _unquote(first)
            in_t, in_s = name.lower() in t_low, name.lower() in s_low
            if in_t and in_s:
                raise SqlDmlError(
                    f"MERGE INTO {table}: reference {name!r} in "
                    f"{expr.strip()!r} is ambiguous — qualify it with the "
                    "target or source alias"
                )
            if in_t:
                return f"t.`{t_low[name.lower()]}`"
            if in_s:
                return f"s.`{s_low[name.lower()]}`"
            return m.group(0)  # keyword / literal-adjacent token

        return _sub_outside_quotes(_EXPR_REF, sub, expr)

    return rebind


def _merge_general(
    spark: SparkSession,
    table: str,
    path: str,
    tail_text: str,
    src_sql: str,
    tgt_alias: str | None,
    src_alias: str | None,
):
    """Delta's general MERGE: ``ON <equi-keys>`` followed by any mix of
    ``WHEN MATCHED [AND cond] THEN UPDATE SET col = expr, … | UPDATE SET
    * | DELETE``, ``WHEN NOT MATCHED [BY TARGET] [AND cond] THEN INSERT
    (cols) VALUES (exprs) | INSERT *`` and ``WHEN NOT MATCHED BY SOURCE
    [AND cond] THEN DELETE | UPDATE SET …`` — first matching clause per
    row, routed onto ``tx_merge(clauses=…)``. Conditions/expressions may
    reference columns bare (when unambiguous) or qualified by the
    statement's aliases; both forms canonicalize to ``t.``/``s.``."""
    from ..sources.txlog import tx_merge

    pieces = _split_top(tail_text, r"WHEN\b")
    on_part = pieces[0].strip()
    if not on_part.upper().startswith("ON") or len(pieces) < 2:
        raise SqlDmlError(
            f"MERGE INTO {table}: expected ON <equi-keys> followed by "
            "WHEN clauses"
        )
    keys = _merge_on_keys(on_part[2:], table)
    source = spark.sql(src_sql)
    tgt_parts = [_unquote(p) for p in table.split(".")]
    tgt_names = {tgt_parts[-1].lower(), ".".join(tgt_parts).lower()}
    if tgt_alias:
        tgt_names.add(_unquote(tgt_alias).lower())
    src_names = set()
    if src_alias:
        src_names.add(_unquote(src_alias).lower())
    sm = re.match(rf"^SELECT \* FROM ({_TBL})$", src_sql)
    if sm:  # direct table source: its (unqualified) name also qualifies
        sp = [_unquote(x) for x in sm.group(1).split(".")]
        src_names.update({sp[-1].lower(), ".".join(sp).lower()})
    overlap = tgt_names & src_names
    if overlap:
        raise SqlDmlError(
            f"MERGE INTO {table}: alias {sorted(overlap)} names both "
            "sides — give the source a distinct alias"
        )
    tgt_cols = spark.table(".".join(tgt_parts)).columns
    rebind = _make_rebinder(
        table, tgt_names, src_names, tgt_cols, source.columns
    )
    tgt_low = {c.lower(): c for c in tgt_cols}

    def parse_set(set_text: str) -> dict[str, str]:
        if set_text.strip() == "*":
            return {c: f"s.`{c}`" for c in tgt_cols}
        out: dict[str, str] = {}
        for item in _split_top(set_text, r","):
            m = re.match(
                rf"^\s*(?:({_IDENT})\s*\.\s*)?({_IDENT})\s*=\s*(.+?)\s*$",
                item,
                re.DOTALL,
            )
            if not m:
                raise SqlDmlError(
                    f"MERGE INTO {table}: cannot parse assignment "
                    f"{item.strip()!r}"
                )
            if m.group(1) and _unquote(m.group(1)).lower() not in tgt_names:
                raise SqlDmlError(
                    f"MERGE INTO {table}: SET target {item.strip()!r} must "
                    "name a TARGET column"
                )
            col = tgt_low.get(_unquote(m.group(2)).lower())
            if col is None:
                raise SqlDmlError(
                    f"MERGE INTO {table}: SET names unknown column "
                    f"{_unquote(m.group(2))!r}"
                )
            out[col] = rebind(m.group(3))
        return out

    clauses: dict[str, list] = {
        "matched": [], "not_matched": [], "not_matched_by_source": [],
    }
    for piece in pieces[1:]:
        piece = piece.strip()
        # the clause's own THEN is the first TOP-LEVEL one (a CASE
        # expression's THENs belong to the CASE — _split_top skips them)
        parts = _split_top(piece, r"THEN\b")
        if len(parts) != 2:
            raise SqlDmlError(
                f"MERGE INTO {table}: expected exactly one THEN in "
                f"{('WHEN ' + piece)[:120]!r}"
            )
        head, action = parts[0].strip(), parts[1].strip()

        def parse_action(allow: tuple[str, ...]) -> dict:
            if action.upper() == "DELETE" and "delete" in allow:
                return {"action": "delete", "set": None}
            am = _ACT_UPDATE.match(action)
            if am and "update" in allow:
                return {"action": "update", "set": parse_set(am.group("set"))}
            am = _ACT_INSERT.match(action)
            if am and "insert" in allow:
                ins = am.group("ins").strip()
                if ins == "*":
                    values = {c: f"s.`{c}`" for c in tgt_cols}
                else:
                    cm = _INS_COLS_VALS.match(ins)
                    if not cm:
                        raise SqlDmlError(
                            f"MERGE INTO {table}: INSERT clause must be "
                            f"INSERT * or INSERT (cols) VALUES (exprs), "
                            f"got {ins[:80]!r}"
                        )
                    cols = [
                        _unquote(c)
                        for c in _split_top(cm.group("cols"), r",")
                    ]
                    vals = _split_top(cm.group("vals"), r",")
                    if len(cols) != len(vals):
                        raise SqlDmlError(
                            f"MERGE INTO {table}: INSERT lists {len(cols)} "
                            f"column(s) but {len(vals)} value(s)"
                        )
                    unknown = [c for c in cols if c.lower() not in tgt_low]
                    if unknown:
                        raise SqlDmlError(
                            f"MERGE INTO {table}: INSERT names unknown "
                            f"column(s) {unknown}"
                        )
                    values = {
                        tgt_low[c.lower()]: rebind(v)
                        for c, v in zip(cols, vals)
                    }
                return {"action": "insert", "values": values}
            raise SqlDmlError(
                f"MERGE INTO {table}: clause action {action[:80]!r} is "
                f"not one of {allow}"
            )

        m = _NMBS_HEAD.match(head)
        if m:
            clauses["not_matched_by_source"].append({
                "cond": rebind(m.group("cond")) if m.group("cond") else None,
                **parse_action(("delete", "update")),
            })
            continue
        m = _NM_HEAD.match(head)
        if m:
            clauses["not_matched"].append({
                "cond": rebind(m.group("cond")) if m.group("cond") else None,
                **parse_action(("insert",)),
            })
            continue
        m = _M_HEAD.match(head)
        if m:
            clauses["matched"].append({
                "cond": rebind(m.group("cond")) if m.group("cond") else None,
                **parse_action(("delete", "update")),
            })
            continue
        raise SqlDmlError(
            f"MERGE INTO {table}: cannot parse WHEN clause "
            f"{('WHEN ' + piece)[:120]!r}"
        )
    return tx_merge(
        spark, source, path, keys=keys,
        clauses={k: v for k, v in clauses.items() if v},
    )


def _insert(
    spark: SparkSession,
    kind: str,
    table: str,
    col_list: str | None,
    query: str,
    part_spec: str | None = None,
):
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    path, extra = _writable(table, pinned)
    from ..sources import txlog as TX

    query = query.strip()
    if not query:
        raise SqlDmlError(f"INSERT {kind.upper()} {table}: missing query")
    rw = re.match(r"^REPLACE\s+WHERE\s+(.*)$", query, re.IGNORECASE | re.DOTALL)
    if rw:
        if kind.lower() != "into" or col_list or part_spec:
            raise SqlDmlError(
                f"INSERT {table}: REPLACE WHERE takes the plain "
                "`INSERT INTO t REPLACE WHERE <pred> <query>` form "
                "(no OVERWRITE, column list or PARTITION spec)"
            )
        return _insert_replace_where(spark, table, path, rw.group(1))
    df = spark.sql(query)
    cur = TX.current_version(spark, path)
    if cur is None:
        raise SqlDmlError(f"{table}: no committed txlog version at {path}")
    manifest = TX.read_manifest(spark, path, cur)
    import json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(manifest["schema"]))
    target_cols = [f.name for f in schema.fields]
    types = {f.name: f.dataType for f in schema.fields}
    # partition columns are TABLE metadata (property-recorded, survives
    # TRUNCATE's zero-file state; legacy tables derive from file paths)
    partition_by = TX.table_partition_columns(manifest)
    # static/dynamic PARTITION spec: `PARTITION (p = v [, q])` pins the
    # static columns to literals (the query must NOT produce them) and
    # declares the rest dynamic; the spec must name exactly the table's
    # partition columns (Spark/Hive static-partition INSERT semantics)
    static: dict[str, object] = {}
    if part_spec is not None:
        dyn: list[str] = []
        for item in _split_top(part_spec, r","):
            item = item.strip()
            if not item:
                continue
            pm = re.match(rf"^({_IDENT})\s*=\s*(.+)$", item, re.DOTALL)
            if pm:
                v = _parse_literal(pm.group(2))
                if v is None:
                    raise SqlDmlError(
                        f"INSERT {table} PARTITION: cannot parse literal "
                        f"{pm.group(2).strip()!r}"
                    )
                static[_unquote(pm.group(1))] = v
            elif re.fullmatch(_IDENT, item):
                dyn.append(_unquote(item))
            else:
                raise SqlDmlError(
                    f"INSERT {table} PARTITION: cannot parse spec item "
                    f"{item!r} (expected col = literal, or col for dynamic)"
                )
        spec_cols = sorted(list(static) + dyn)
        if spec_cols != sorted(partition_by):
            raise SqlDmlError(
                f"INSERT {table} PARTITION: spec names {spec_cols} but "
                f"the table's partition columns are {sorted(partition_by)}"
            )
    if col_list:
        names = [
            _unquote(c) for c in _split_top(col_list.strip()[1:-1], r",")
        ]
        unknown = [c for c in names if c not in target_cols]
        if unknown:
            raise SqlDmlError(
                f"INSERT into {table}: unknown column(s) {unknown}"
            )
        clash = [c for c in names if c in static]
        if clash:
            raise SqlDmlError(
                f"INSERT into {table}: column(s) {clash} are pinned by the "
                "static PARTITION spec and cannot appear in the column list"
            )
    else:
        names = [c for c in target_cols if c not in static]
    if len(df.columns) != len(names):
        raise SqlDmlError(
            f"INSERT into {table}: query produces {len(df.columns)} "
            f"column(s), target list has {len(names)}"
        )
    if len(set(names)) != len(names):
        raise SqlDmlError(
            f"INSERT into {table}: duplicate target column in {names}"
        )
    # positional rename + cast to the target type (SQL INSERT semantics).
    # toDF renames BY POSITION — by-name alignment breaks when the query
    # emits duplicate auto-generated names (SELECT CAST(2 AS BIGINT),
    # CAST(2 AS BIGINT) names both columns identically)
    aligned = df.toDF(*names).select(
        *(F.col(f"`{c}`").cast(types[c]).alias(c) for c in names)
    )
    if static:
        provided = set(names) | set(static)
        aligned = aligned.select(
            *(
                F.lit(static[c]).cast(types[c]).alias(c)
                if c in static
                else F.col(f"`{c}`")
                for c in target_cols
                if c in provided
            )
        )
        names = [c for c in target_cols if c in provided]
    if kind.lower() == "into":
        mode = "append"
    elif partition_by:
        # K1 by name: replace ONLY the partitions present in the rows
        mode = "overwrite_dynamic"
    else:
        mode = "overwrite"
    if mode == "overwrite" and len(names) < len(target_cols):
        # plain overwrite replaces the table schema with the frame's, so
        # unlisted columns must NULL-fill here (SQL semantics) or they
        # would silently vanish from the table — EXCEPT columns with a
        # DEFAULT / IDENTITY / GENERATED definition, which the enforcing
        # writer fills when omitted (padding would mask them). Append and
        # dynamic overwrite keep unlisted columns via schema merge.
        props = manifest.get("properties", {})
        special = (
            set(TX._column_defaults(props))
            | set(TX._identity_cols(props))
            | set(TX._generated_cols(props))
        )
        aligned = aligned.select(
            *(
                F.col(c) if c in names else F.lit(None).cast(types[c]).alias(c)
                for c in target_cols
                if c in names or c not in special
            )
        )
    return TX.tx_write(
        spark, aligned, path, mode=mode,
        partition_by=partition_by or None,
    )


_GEN_IDENTITY = re.compile(
    r"\bGENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
    r"(?:\s*\(\s*START\s+WITH\s+(-?\d+)(?:\s+INCREMENT\s+BY\s+(-?\d+))?"
    r"\s*\))?",
    re.IGNORECASE,
)
_GEN_EXPR = re.compile(
    r"\bGENERATED\s+ALWAYS\s+AS\s*\((.*)\)\s*$", re.IGNORECASE | re.DOTALL
)
_COL_DEFAULT = re.compile(
    r"\bDEFAULT\s+(.+?)\s*$", re.IGNORECASE | re.DOTALL
)
_TBL_CHECK = re.compile(
    rf"^\s*CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COL_HEAD = re.compile(rf"^\s*({_IDENT})\s+", re.DOTALL)


def _parse_create_columns(
    table: str, items: list[str]
) -> tuple[list[str], list[tuple]]:
    """Split CREATE TABLE column items into the plain DDL parts Spark's
    schema parser accepts (``name type [NOT NULL]``) and the declarative
    options applied as metadata commits after version 1: ``GENERATED
    {ALWAYS|BY DEFAULT} AS IDENTITY [(START WITH n [INCREMENT BY s])]``
    (both spellings serve the engine's BY-DEFAULT identity semantics),
    ``GENERATED ALWAYS AS (expr)``, ``DEFAULT <expr>``, and table-level
    ``CONSTRAINT name CHECK (expr)`` — the full Delta column-DDL surface
    at create time."""
    ddl, opts = [], []
    for item in items:
        item = item.strip()
        m = _TBL_CHECK.match(item)
        if m:
            opts.append(("check", (_unquote(m.group(1)), m.group(2).strip())))
            continue
        cm = _COL_HEAD.match(item)
        if not cm:
            raise SqlDmlError(
                f"CREATE TABLE {table}: cannot parse column item {item!r}"
            )
        name = _unquote(cm.group(1))
        rest = item
        m = _GEN_IDENTITY.search(rest)
        if m:
            start = int(m.group(2)) if m.group(2) else 1
            step = int(m.group(3)) if m.group(3) else 1
            opts.append(("identity", (name, start, step)))
            rest = rest[: m.start()] + rest[m.end():]
        else:
            m = _GEN_EXPR.search(rest)
            if m:
                opts.append(("generated", (name, m.group(1).strip())))
                rest = rest[: m.start()] + rest[m.end():]
        m = _COL_DEFAULT.search(rest)
        if m:
            opts.append(("default", (name, m.group(1).strip())))
            rest = rest[: m.start()] + rest[m.end():]
        ddl.append(" ".join(rest.split()))
    return ddl, opts


def _apply_create_options(
    spark: SparkSession, fq: str, col_opts: list[tuple]
) -> None:
    """Apply the parsed column options to the freshly created (empty)
    table — each a metadata-only commit through the declaring writers,
    so the invariants hold from the table's FIRST data write."""
    from ..sources import txlog as TX

    pinned = txlog_table_path(spark, fq)
    assert pinned is not None  # _ctas just registered it
    path = pinned[0]
    for kind, payload in col_opts:
        if kind == "identity":
            col, start, step = payload
            TX.tx_add_identity(spark, path, col, start=start, step=step)
        elif kind == "generated":
            TX.tx_add_generated_column(spark, path, *payload)
        elif kind == "default":
            TX.tx_set_default(spark, path, *payload)
        else:  # check
            TX.tx_add_constraint(spark, path, *payload)


def _convert(
    spark: SparkSession,
    path: str | None,
    table: str | None,
    part_spec: str | None,
):
    """``CONVERT TO TXLOG parquet.`/path` | db.plain_table [PARTITIONED
    BY (col TYPE, …)]`` — Delta's CONVERT TO DELTA, both address forms.
    The by-NAME form resolves a crawler-registered external parquet
    table's location, converts it in place, and RE-REGISTERS the same
    name over the txlog pinned format — the catalog consumer keeps the
    name and gains the transactional surface (DML, travel, OPTIMIZE)."""
    from ..sources.txlog import tx_convert

    cols: list[str] | None = None
    types: dict[str, str] = {}
    if part_spec:
        # Delta's CONVERT spec declares partition TYPES (the hive
        # dirs carry only strings): `PARTITIONED BY (g BIGINT)`
        cols = []
        for item in _split_top(part_spec, r","):
            pm = re.match(
                rf"^\s*({_IDENT})(?:\s+(.+?))?\s*$", item, re.DOTALL
            )
            if not pm:
                raise SqlDmlError(
                    f"CONVERT TO TXLOG: cannot parse PARTITIONED BY "
                    f"item {item.strip()!r}"
                )
            name = _unquote(pm.group(1))
            cols.append(name)
            if pm.group(2):
                types[name] = pm.group(2)
    if path is not None:
        return tx_convert(
            spark, path, partition_by=cols, partition_types=types or None
        )
    # by-name: resolve the registered parquet table's storage location
    if txlog_table_path(spark, table) is not None:
        raise SqlDmlError(
            f"CONVERT TO TXLOG {table}: already a txlog table"
        )
    parts = [_unquote(p) for p in table.split(".")]
    fq = ".".join(parts)
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {fq}").collect()
    except Exception as e:
        raise SqlDmlError(
            f"CONVERT TO TXLOG {table}: cannot describe ({e})"
        )
    loc = next(
        (str(r.data_type) for r in rows if r.col_name == "Location"), None
    )
    if loc is None:
        raise SqlDmlError(
            f"CONVERT TO TXLOG {table}: no storage Location (views and "
            "temp tables have no files to convert)"
        )
    loc = loc.removeprefix("file:")
    v = tx_convert(
        spark, loc, partition_by=cols, partition_types=types or None
    )
    from .sql_serving import register_txlog_table

    db = parts[0] if len(parts) == 2 else spark.catalog.currentDatabase()
    register_txlog_table(spark, db, parts[-1], loc)
    return v


def _split_replace_where(table: str, text: str) -> tuple[str, str]:
    """Split ``<pred> <query>`` at the FIRST top-level SELECT / VALUES /
    WITH / TABLE keyword — none of which can open a predicate conjunct
    (subquery SELECTs sit inside parentheses, which the scanner skips)."""
    parts = _split_top(text, r"(?:SELECT|VALUES|WITH|TABLE)\b")
    if len(parts) < 2 or not parts[0].strip():
        raise SqlDmlError(
            f"INSERT INTO {table} REPLACE WHERE: expected "
            "<pred> followed by SELECT/VALUES/WITH/TABLE"
        )
    pred = parts[0].strip()
    query = text[len(parts[0]):].strip()
    return pred, query


def _insert_replace_where(
    spark: SparkSession, table: str, path: str, text: str
):
    """``INSERT INTO db.t REPLACE WHERE <pred> <query>`` — Delta's
    arbitrary-predicate atomic overwrite (`tx_replace_where`): one
    commit deletes the predicate's rows (file-pruned) and lands the
    query's rows, which must all SATISFY the predicate."""
    from ..sources import txlog as TX

    pred, query = _split_replace_where(table, text)
    if re.search(r"\bSELECT\b", pred, re.IGNORECASE):
        raise SqlDmlError(
            f"INSERT INTO {table} REPLACE WHERE: subqueries in the "
            "replace predicate are not routable"
        )
    df = spark.sql(query)
    cur = TX.current_version(spark, path)
    if cur is None:
        raise SqlDmlError(f"{table}: no committed txlog version at {path}")
    manifest = TX.read_manifest(spark, path, cur)
    import json as _json

    from pyspark.sql.types import StructType

    schema = StructType.fromJson(_json.loads(manifest["schema"]))
    target_cols = [f.name for f in schema.fields]
    if len(df.columns) != len(target_cols):
        raise SqlDmlError(
            f"INSERT INTO {table} REPLACE WHERE: query produces "
            f"{len(df.columns)} column(s), table has {len(target_cols)}"
        )
    aligned = df.toDF(*target_cols).select(
        *(
            F.col(f"`{f.name}`").cast(f.dataType).alias(f.name)
            for f in schema.fields
        )
    )
    where, where_equals, condition = parse_predicate(pred)
    return TX.tx_replace_where(
        spark, aligned, path,
        where=where or None,
        where_equals=where_equals or None,
        condition=condition,
        partition_by=TX.table_partition_columns(manifest) or None,
    )


def _clone(
    spark: SparkSession,
    target: str,
    source: str,
    version: str | None,
    location: str | None,
) -> str:
    """``CREATE TABLE db.t2 SHALLOW CLONE db.t [VERSION AS OF n]
    [LOCATION '…']`` → ``tx_clone``: a NEW table whose v1 references the
    source snapshot's files by absolute path — zero data copied,
    metadata-only even for a petabyte source; the clone then evolves
    independently (Delta's SHALLOW CLONE, including the documented
    vacuum-the-source caveat). Without LOCATION the clone is managed
    under the target's layer database."""
    import os

    from ..sources import txlog as TX
    from .sql_serving import ensure_database, register_txlog_table

    pinned = txlog_table_path(spark, source)
    if pinned is None:
        raise SqlDmlError(
            f"SHALLOW CLONE {source}: not a registered txlog table"
        )
    src_path, _ = pinned
    parts = [_unquote(p) for p in target.split(".")]
    db = parts[0] if len(parts) == 2 else spark.catalog.currentDatabase()
    name = parts[-1]
    if location:
        dst = location.replace("''", "'")
    else:
        ensure_database(spark, db)
        db_loc = (
            spark.sql(f"DESCRIBE DATABASE {db}")
            .filter("info_name = 'Location'")
            .collect()[0]
            .info_value
        )
        dst = os.path.join(db_loc.removeprefix("file:"), f"{name}__txlog")
    TX.tx_clone(
        spark, src_path, dst,
        version=int(version) if version is not None else None,
    )
    return register_txlog_table(spark, db, name, dst)


def _ctas(
    spark: SparkSession,
    replace: bool,
    table: str,
    opts_text: str,
    query: str | None,
    df: DataFrame | None = None,
) -> str:
    """``CREATE [OR REPLACE] TABLE db.t USING txlog [LOCATION '…']
    [PARTITIONED BY (cols)] AS <query>`` — the SQL-only table
    lifecycle's missing first step: run the query, commit it as version
    1 (or a replace) through ``tx_write``, and register the catalog
    name over the pinned format. Without LOCATION the table is MANAGED:
    data lands under the layer database's directory (Delta's managed
    CTAS), still a plain txlog dir that survives the catalog. The
    empty-table DDL form passes ``df`` (a zero-row frame carrying the
    declared schema) instead of a query. Returns the fully-qualified
    registered name."""
    import os

    from ..sources import txlog as TX
    from .sql_serving import ensure_database, register_txlog_table

    parts = [_unquote(p) for p in table.split(".")]
    db = parts[0] if len(parts) == 2 else spark.catalog.currentDatabase()
    name = parts[-1]
    mloc = _CTAS_LOCATION.search(opts_text)
    mpart = _CTAS_PARTITIONED.search(opts_text)
    partition_by = (
        [_unquote(c) for c in _split_top(mpart.group(1), r",")]
        if mpart
        else None
    )
    leftover = _CTAS_LOCATION.sub(
        "", _CTAS_PARTITIONED.sub("", opts_text)
    ).strip()
    if leftover:
        raise SqlDmlError(
            f"CREATE TABLE {table} USING txlog: unsupported clause(s) "
            f"{leftover!r} (supported: LOCATION, PARTITIONED BY)"
        )
    # CREATE OR REPLACE of an EXISTING txlog registration must land as a
    # commit in the SAME log (Delta reuses the table's location): prior
    # versions stay travelable through the name and nothing is orphaned.
    # Only the live registration counts — replacing over a frozen/CDF
    # twin is refused by _writable.
    existing = txlog_table_path(spark, f"{db}.{name}") if replace else None
    if existing is not None:
        existing_path = _writable(f"{db}.{name}", existing)[0]
    if mloc:
        path = mloc.group(1).replace("''", "'")
        if existing is not None and path.rstrip("/") != existing_path.rstrip("/"):
            raise SqlDmlError(
                f"CREATE OR REPLACE TABLE {db}.{name}: LOCATION {path!r} "
                f"differs from the table's current location "
                f"{existing_path!r} — a replace is a commit in the same "
                "log (drop the table first to relocate it)"
            )
    elif existing is not None:
        path = existing_path
    else:
        ensure_database(spark, db)
        db_loc = (
            spark.sql(f"DESCRIBE DATABASE {db}")
            .filter("info_name = 'Location'")
            .collect()[0]
            .info_value
        )
        # "__txlog"-suffixed so the data dir never collides with the
        # catalog's default managed-table location for db.name (Spark
        # refuses CREATE TABLE when that exact dir already exists)
        path = os.path.join(db_loc.removeprefix("file:"), f"{name}__txlog")
    exists_in_catalog = spark.catalog.tableExists(f"{db}.{name}")
    has_commits = TX.current_version(spark, path) is not None
    if not replace and (exists_in_catalog or has_commits):
        raise SqlDmlError(
            f"CREATE TABLE {db}.{name}: already exists "
            f"({'catalog entry' if exists_in_catalog else path}) — use "
            "CREATE OR REPLACE TABLE to overwrite"
        )
    if df is None:
        df = spark.sql(query)
    TX.tx_write(
        spark, df, path, mode="overwrite", partition_by=partition_by
    )
    return register_txlog_table(spark, db, name, path)


_ALTER_FORMS = [
    (
        re.compile(
            r"^ADD\s+COLUMNS?\s+(.*)$", re.IGNORECASE | re.DOTALL
        ),
        "add_column",
    ),
    (
        re.compile(
            rf"^RENAME\s+COLUMN\s+({_IDENT})\s+TO\s+({_IDENT})\s*$",
            re.IGNORECASE,
        ),
        "rename_column",
    ),
    (
        re.compile(
            rf"^DROP\s+COLUMN\s+({_IDENT})\s*$", re.IGNORECASE
        ),
        "drop_column",
    ),
    (
        re.compile(
            rf"^ADD\s+CONSTRAINT\s+({_IDENT})\s+CHECK\s*\((.*)\)\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
        "add_constraint",
    ),
    (
        re.compile(
            rf"^DROP\s+CONSTRAINT\s+({_IDENT})\s*$", re.IGNORECASE
        ),
        "drop_constraint",
    ),
    (
        re.compile(
            r"^SET\s+TBLPROPERTIES\s*\((.*)\)\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
        "set_properties",
    ),
    (
        re.compile(
            rf"^ALTER\s+COLUMN\s+({_IDENT})\s+SET\s+NOT\s+NULL\s*$",
            re.IGNORECASE,
        ),
        "set_not_null",
    ),
    (
        re.compile(
            rf"^ALTER\s+COLUMN\s+({_IDENT})\s+DROP\s+NOT\s+NULL\s*$",
            re.IGNORECASE,
        ),
        "drop_not_null",
    ),
    (
        re.compile(
            rf"^ALTER\s+COLUMN\s+({_IDENT})\s+SET\s+DEFAULT\s+(.+?)\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
        "set_default",
    ),
    (
        re.compile(
            rf"^ALTER\s+COLUMN\s+({_IDENT})\s+DROP\s+DEFAULT\s*$",
            re.IGNORECASE,
        ),
        "drop_default",
    ),
    (
        re.compile(
            rf"^ALTER\s+COLUMN\s+({_IDENT})\s+TYPE\s+(.+?)\s*$",
            re.IGNORECASE | re.DOTALL,
        ),
        "widen_type",
    ),
]


def _alter(spark: SparkSession, table: str, action: str):
    """``ALTER TABLE db.t <action>`` routed to the metadata-only DDL
    writers: ADD COLUMN(s) (null-padded on read, zero files moved),
    RENAME/DROP COLUMN (column mapping — physical names immutable),
    ADD/DROP CONSTRAINT (full-table validation then persisted
    ``check.<name>``), SET TBLPROPERTIES. Schema-changing forms
    RE-REGISTER the catalog entry afterwards (the Python Data Source
    captures the schema at CREATE time), so ``SELECT`` by name sees the
    new shape immediately. Non-txlog targets return None → Spark's own
    ALTER handles external parquet tables."""
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    path, extra = _writable(table, pinned)
    from ..sources import txlog as TX
    from .sql_serving import register_txlog_table

    action = action.strip().rstrip(";")
    for rx, kind in _ALTER_FORMS:
        m = rx.match(action)
        if not m:
            continue
        reregister = True
        if kind == "add_column":
            spec = m.group(1).strip()
            if spec.startswith("(") and spec.endswith(")"):
                spec = spec[1:-1]
            # column items accept the same declarative options as CREATE
            # (DEFAULT / GENERATED … / IDENTITY / CHECK); NOT NULL is NOT
            # among them — adding a NOT NULL column to a non-empty table
            # is unsatisfiable and tx_add_column refuses it
            ddl_parts, col_opts = _parse_create_columns(
                table, _split_top(spec, r",")
            )
            v = None
            for item in ddl_parts:
                cm = re.match(
                    rf"^\s*({_IDENT})\s+(.+?)\s*$", item, re.DOTALL
                )
                if not cm:
                    raise SqlDmlError(
                        f"ALTER TABLE {table} ADD COLUMN: cannot parse "
                        f"{item.strip()!r} (expected: name type)"
                    )
                v = TX.tx_add_column(
                    spark, path, _unquote(cm.group(1)), cm.group(2)
                )
            if v is None and not col_opts:
                raise SqlDmlError(
                    f"ALTER TABLE {table} ADD COLUMN: empty column list"
                )
            if col_opts:
                _apply_create_options(spark, f"{table}", col_opts)
                v = TX.current_version(spark, path)
        elif kind == "rename_column":
            v = TX.tx_rename_column(
                spark, path, _unquote(m.group(1)), _unquote(m.group(2))
            )
        elif kind == "drop_column":
            v = TX.tx_drop_column(spark, path, _unquote(m.group(1)))
        elif kind == "add_constraint":
            v = TX.tx_add_constraint(
                spark, path, _unquote(m.group(1)), m.group(2).strip()
            )
            reregister = False
        elif kind == "drop_constraint":
            v = TX.tx_drop_constraint(spark, path, _unquote(m.group(1)))
            reregister = False
        elif kind == "set_not_null":
            # Delta's NOT NULL is a validated invariant: full-table check
            # then enforced on every write, exactly a named CHECK
            col = _unquote(m.group(1))
            v = TX.tx_add_constraint(
                spark, path, f"notnull_{col}", f"{col} IS NOT NULL"
            )
            reregister = False
        elif kind == "drop_not_null":
            v = TX.tx_drop_constraint(
                spark, path, f"notnull_{_unquote(m.group(1))}"
            )
            reregister = False
        elif kind == "set_default":
            v = TX.tx_set_default(
                spark, path, _unquote(m.group(1)), m.group(2)
            )
            reregister = False
        elif kind == "drop_default":
            v = TX.tx_drop_default(spark, path, _unquote(m.group(1)))
            reregister = False
        elif kind == "widen_type":
            # Delta's type widening: metadata-only, lossless widenings
            # only (tx_widen_column refuses narrowing/cross-family)
            v = TX.tx_widen_column(
                spark, path, _unquote(m.group(1)), m.group(2)
            )
        else:  # set_properties
            props = {}
            for item in _split_top(m.group(1), r","):
                pm = re.match(
                    r"^\s*'((?:[^']|'')*)'\s*=\s*'((?:[^']|'')*)'\s*$",
                    item,
                )
                if not pm:
                    raise SqlDmlError(
                        f"ALTER TABLE {table} SET TBLPROPERTIES: cannot "
                        f"parse {item.strip()!r} (expected 'k' = 'v')"
                    )
                props[pm.group(1).replace("''", "'")] = pm.group(2).replace(
                    "''", "'"
                )
            v = TX.tx_set_properties(spark, path, props)
            reregister = False
        if reregister:
            parts = [_unquote(p) for p in table.split(".")]
            db = (
                parts[0]
                if len(parts) == 2
                else spark.catalog.currentDatabase()
            )
            register_txlog_table(spark, db, parts[-1], path)
        return v
    raise SqlDmlError(
        f"ALTER TABLE {table}: unsupported action {action!r} (supported: "
        "ADD COLUMN, RENAME COLUMN, DROP COLUMN, ADD CONSTRAINT name "
        "CHECK (expr), DROP CONSTRAINT, SET TBLPROPERTIES)"
    )


def _show_properties(spark: SparkSession, table: str) -> DataFrame | None:
    """``SHOW TBLPROPERTIES db.t`` served from the TXLOG property record
    (the catalog's own store drops properties for Python data source
    tables)."""
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    from ..sources.txlog import tx_properties

    props = tx_properties(spark, pinned[0])
    return spark.createDataFrame(
        sorted((str(k), str(v)) for k, v in props.items()),
        "key string, value string",
    )


def _require_txlog(spark: SparkSession, table: str, what: str) -> str:
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        raise SqlDmlError(
            f"{what} {table}: not a registered txlog table (plain parquet "
            "tables have no transaction log)"
        )
    return _writable(table, pinned)[0]


def _optimize(
    spark: SparkSession,
    table: str,
    zorder_cols: str | None,
    where: str | None = None,
) -> int:
    """``OPTIMIZE db.t [WHERE part = v] [ZORDER BY (c1, c2)]`` →
    ``tx_compact``: plain form bin-packs small files incrementally
    (128 MiB threshold — right-sized files carry forward by reference,
    the only OPTIMIZE that survives 100 TB); ZORDER re-clusters on the
    named columns (Morton key for ≥2, lexicographic for 1) so ranged
    reads prune files. ``WHERE`` (Delta's partition-scoped OPTIMIZE)
    takes equality predicates on PARTITION columns and limits both
    forms to the matching partitions — the daily maintenance shape."""
    from ..sources import txlog as TX

    path = _require_txlog(spark, table, "OPTIMIZE")
    partition_where = None
    if where:
        w, eq, cond = parse_predicate(where)
        extra_ranges = {
            c for c, (lo, hi) in w.items() if c not in eq or (lo, hi) != (eq[c], eq[c])
        }
        if cond is not None or extra_ranges or not eq:
            raise SqlDmlError(
                f"OPTIMIZE {table} WHERE: only equality predicates on "
                f"partition columns are supported (got {where.strip()!r})"
            )
        partition_where = eq
    if zorder_cols:
        cols = [_unquote(c) for c in _split_top(zorder_cols, r",")]
        return TX.tx_compact(
            spark, path, cluster_by=cols, zorder=len(cols) >= 2,
            partition_where=partition_where,
        )
    # size-targeted bin count (Delta's binPacking): the under-threshold
    # bytes decide how many right-sized outputs the rewrite packs into
    thr = 128 << 20
    cur = TX.current_version(spark, path)
    if cur is None:
        raise SqlDmlError(f"{table}: no committed txlog version at {path}")
    manifest = TX.read_manifest(spark, path, cur)
    scope = manifest["files"]
    if partition_where:
        pcols = TX.table_partition_columns(manifest)
        bad = sorted(set(partition_where) - set(pcols))
        if bad:
            raise SqlDmlError(
                f"OPTIMIZE {table} WHERE: {bad} are not partition "
                f"column(s) (partitions: {pcols})"
            )
        probe = {k: TX._hive_enc(v) for k, v in partition_where.items()}
        scope = [
            f
            for f in scope
            if all(f["partition"].get(k) == v for k, v in probe.items())
        ]
    small_total = sum(
        int(f.get("bytes") or 0)
        for f in scope
        if f.get("dv") or f.get("bytes") is None or f["bytes"] < thr
    )
    n_files = max(1, -(-small_total // thr))
    return TX.tx_compact(
        spark, path, small_bytes=thr, n_files=n_files,
        partition_where=partition_where,
    )


def _vacuum(
    spark: SparkSession, table: str, hours: str | None, dry: bool
) -> DataFrame:
    """``VACUUM db.t [RETAIN n HOURS] [DRY RUN]`` → ``tx_vacuum``;
    returns the reaped (or reapable, for DRY RUN) paths as a 1-column
    DataFrame, Delta-style."""
    from ..sources.txlog import tx_vacuum

    path = _require_txlog(spark, table, "VACUUM")
    reaped = tx_vacuum(
        spark,
        path,
        retain_hours=float(hours) if hours is not None else 168.0,
        dry_run=dry,
    )
    return spark.createDataFrame(
        [(p,) for p in reaped], "path string"
    )


def _history(spark: SparkSession, table: str) -> DataFrame | None:
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None  # plain DESCRIBE HISTORY on non-txlog: passthrough
    from ..sources.txlog import tx_history

    path, _ = pinned
    import json as _json

    rows = [
        (
            int(r.get("version", -1)),
            str(r.get("op", "")),
            int(r.get("ts_ms", 0)),
            _json.dumps(r.get("operation_metrics", {}), sort_keys=True),
        )
        for r in tx_history(spark, path)
    ]
    return spark.createDataFrame(
        rows,
        "version long, operation string, ts_ms long, "
        "operation_metrics string",
    )


def _detail(spark: SparkSession, table: str) -> DataFrame | None:
    """``DESCRIBE DETAIL db.t`` (Delta's twin): one row of snapshot
    facts from the manifest — version, live file count, total bytes,
    rows (footer-recorded), partition columns, properties — all
    metadata-only."""
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    import json as _json

    from ..sources import txlog as TX

    path, _ = pinned
    cur = TX.current_version(spark, path)
    m = TX.read_manifest(spark, path, cur)
    files = m["files"]
    part_cols = TX.table_partition_columns(m)
    row = (
        path,
        int(cur),
        len(files),
        int(sum(int(f.get("bytes") or 0) for f in files)),
        int(sum(int(f.get("rows") or 0) for f in files))
        - int(sum(int(f.get("dv_count") or 0) for f in files)),
        _json.dumps(part_cols),
        _json.dumps(m.get("properties", {}), sort_keys=True),
    )
    return spark.createDataFrame(
        [row],
        "location string, version long, num_files long, "
        "size_bytes long, num_rows long, partition_columns string, "
        "properties string",
    )


def _truncate(spark: SparkSession, table: str):
    """``TRUNCATE TABLE db.t``: one committed version with zero live
    rows — a normal (undoable, time-travelable) delete commit, never a
    log wipe. Routed as an all-rows delete so table properties,
    constraints and identity state survive."""
    pinned = txlog_table_path(spark, table)
    if pinned is None:
        return None
    path, _ = _writable(table, pinned)
    from ..sources.txlog import tx_delete

    return tx_delete(spark, path, condition="true")


def _restore(spark: SparkSession, table: str, kind: str, lit: str) -> int:
    """``RESTORE TABLE db.t TO VERSION AS OF n | TIMESTAMP AS OF 'ts'``
    → ``tx_restore`` (metadata-only: commits a NEW version whose file
    list is the target's; the restore itself is time-travelable and
    undoable). The timestamp form resolves to the newest version
    committed at-or-before it, Delta's resolution."""
    from ..sources.txlog import tx_restore, version_at_timestamp

    path = _require_txlog(spark, table, "RESTORE")
    if kind.lower() == "version":
        if not lit.isdigit():
            raise SqlDmlError(
                f"RESTORE {table}: VERSION AS OF takes an integer, got "
                f"{lit!r}"
            )
        version = int(lit)
    else:
        ts = _parse_literal(lit)
        if not isinstance(ts, str):
            raise SqlDmlError(
                f"RESTORE {table}: TIMESTAMP AS OF takes a quoted "
                f"timestamp string, got {lit!r}"
            )
        version = version_at_timestamp(spark, path, ts)
    return tx_restore(spark, path, version)


def _writable(table: str, pinned: tuple[str, dict]) -> tuple[str, dict]:
    path, extra = pinned
    if str(extra.get("readchangefeed", "false")).lower() == "true":
        raise SqlDmlError(
            f"{table} is a CHANGE-FEED table — change rows are a derived "
            "read surface, not a writable relation"
        )
    if "versionasof" in extra or "timestampasof" in extra:
        raise SqlDmlError(
            f"{table} is a FROZEN time-travel table — DML must target "
            "the live table registration"
        )
    return path, extra
