"""SQL DML statements over transaction-log tables — the front door
that closes the ``USING txlog_table`` story round-trip (round-6
verdict #2): a user who arrives with ``MERGE INTO`` / ``UPDATE`` /
``DELETE FROM`` / ``INSERT INTO`` / ``OPTIMIZE`` / ``VACUUM`` drives
the SAME verbs (:func:`operators.txlog.merge`, ``update_rows``,
``delete_where``, ``append``, ``optimize_small_files``, ``vacuum``)
the Python API exposes — one statement, one transactional commit,
identical lock-free semantics. Reads stay Spark SQL's job
(``CREATE TEMPORARY VIEW ... USING txlog_table``); this module
handles exactly the write verbs Spark's parser cannot route to an
external Python table format.

The parser is deliberately SMALL: a top-level keyword splitter that
respects quotes and parentheses, plus the statement grammars below.
Everything inside a condition or SET expression passes through
verbatim to the engine (they are Spark SQL expressions), so the
expression language is Spark's, not a re-implementation. Reference
for the statement surface: Delta Lake's SQL DML — the reference
engine itself has no DML statements (it is a read-only ETL script),
so this surface exists for the north-star table-format parity.

Table references resolve through the ``tables`` mapping
(``{name: table_dir}``) or a backtick-quoted literal directory
(`` `/path/to/table` `` — Delta's ``delta.`path``` shape without the
scheme). MERGE sources additionally resolve to Spark temp views or a
parenthesized subquery (run through ``spark.sql``).

Supported grammar (case-insensitive keywords)::

    MERGE INTO t [AS a] USING src [AS b] ON a.k = b.k
        WHEN MATCHED [AND cond] THEN UPDATE SET *
      | WHEN MATCHED [AND cond] THEN UPDATE SET c = expr[, ...]
      | WHEN MATCHED [AND cond] THEN DELETE
      | WHEN NOT MATCHED [AND cond] THEN INSERT *
    UPDATE t SET c = expr[, ...] [WHERE cond]
    DELETE FROM t [WHERE cond]
    INSERT INTO t <select ...>
    OPTIMIZE t [WHERE col = val [AND ...]]
    VACUUM t [RETAIN n HOURS] [DRY RUN]

MERGE's ON clause must be a single equi-key (``a.k = b.k`` with the
same column name on both sides) — the engine's merge key contract;
clause conditions and SET expressions may reference both sides and
are rewritten from the statement's aliases to the engine's ``t.`` /
``s.`` namespaces.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession


class TxSqlError(ValueError):
    """A statement the DML front door cannot parse or route."""


# ---------------------------------------------------------------------------
# top-level scanning: quote/paren-aware keyword search
# ---------------------------------------------------------------------------


def _top_level_spans(s: str):
    """Indexes of ``s`` at paren depth 0 and outside string/backtick
    literals."""
    depth = 0
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "'":
            i += 1
            while i < n and s[i] != "'":
                i += 2 if s[i] == "\\" else 1
        elif c == "`":
            i += 1
            while i < n and s[i] != "`":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            yield i
        i += 1


def _find_kw(s: str, kw: str, start: int = 0) -> int:
    """First top-level, word-bounded, case-insensitive occurrence of
    the (possibly multi-word) keyword; -1 if absent."""
    pat = re.compile(
        r"\b" + r"\s+".join(re.escape(w) for w in kw.split()) + r"\b",
        re.IGNORECASE,
    )
    tops = set(_top_level_spans(s))
    for m in pat.finditer(s):
        if m.start() >= start and m.start() in tops:
            return m.start()
    return -1


def _split_kw(s: str, kw: str) -> tuple[str, str] | None:
    """(before, after) around the first top-level keyword, or None."""
    i = _find_kw(s, kw)
    if i < 0:
        return None
    return s[:i].strip(), s[i + len(kw):].strip()


def _split_commas(s: str) -> list[str]:
    """Split on top-level commas."""
    tops = set(_top_level_spans(s))
    out, last = [], 0
    for i, c in enumerate(s):
        if c == "," and i in tops:
            out.append(s[last:i].strip())
            last = i + 1
    out.append(s[last:].strip())
    return [p for p in out if p]


_IDENT = r"[A-Za-z_][A-Za-z0-9_.$]*"


def _rewrite_alias(expr: str, alias: str, to: str) -> str:
    """``alias.col`` → ``to.col`` outside string literals (the engine
    evaluates merge conditions in its own ``t``/``s`` namespaces);
    with ``to=""`` the qualifier is stripped entirely (single-table
    statements bind bare columns)."""
    if alias == to:
        return expr
    tops = set(_top_level_spans(expr))  # also excludes quoted text
    pat = re.compile(
        r"\b" + re.escape(alias) + r"\s*\.", re.IGNORECASE
    )
    out, last = [], 0
    for m in pat.finditer(expr):
        if m.start() in tops:
            # not preceded by a dot (x.alias.col is a struct path)
            j = m.start() - 1
            while j >= 0 and expr[j].isspace():
                j -= 1
            if j >= 0 and expr[j] == ".":
                continue
            out.append(expr[last:m.start()])
            out.append(to + "." if to else "")
            last = m.end()
    out.append(expr[last:])
    return "".join(out)


# ---------------------------------------------------------------------------
# reference resolution
# ---------------------------------------------------------------------------


def _parse_table_ref(s: str) -> tuple[str, str, str]:
    """Leading table reference of ``s`` → (ref, alias, rest).
    ``ref`` is a bare name or a backtick-quoted path; ``alias`` is the
    optional ``[AS] ident`` (falls back to the bare name / path
    basename)."""
    s = s.strip()
    m = re.match(r"`([^`]+)`\s*", s)
    if m:
        ref, rest = m.group(1), s[m.end():]
        default_alias = ref.rstrip("/").rsplit("/", 1)[-1]
    else:
        m = re.match(_IDENT, s)
        if not m:
            raise TxSqlError(f"expected a table reference at: {s[:40]!r}")
        ref, rest = m.group(0), s[m.end():].strip()
        default_alias = ref
    am = re.match(
        r"(?:AS\s+)?(" + _IDENT + r")\b", rest, re.IGNORECASE
    )
    reserved = {
        "using", "on", "when", "set", "where", "values", "select",
        "retain", "dry", "then",
    }
    if am and am.group(1).lower() not in reserved:
        return ref, am.group(1), rest[am.end():].strip()
    return ref, default_alias, rest


def _table_dir(ref: str, tables: dict[str, str] | None) -> str:
    if ref.startswith("/") or "/" in ref:
        return ref  # backtick path form
    if tables and ref in tables:
        return tables[ref]
    raise TxSqlError(
        f"unknown table {ref!r}: pass tables={{'{ref}': <table_dir>}} "
        "or use a backtick-quoted directory"
    )


def _resolve_source(
    spark: SparkSession, spec: str, tables: dict[str, str] | None
):
    """MERGE source → (DataFrame, alias). A parenthesized subquery
    runs through spark.sql; a bare name resolves to a txlog table
    (snapshot) or an existing Spark view/table."""
    from etl_sentinel_imagery_spark.operators.txlog import snapshot

    spec = spec.strip()
    if spec.startswith("("):
        depth, i = 0, 0
        for i, c in enumerate(spec):
            depth += c == "("
            depth -= c == ")"
            if depth == 0:
                break
        inner, rest = spec[1:i], spec[i + 1:].strip()
        am = re.match(
            r"(?:AS\s+)?(" + _IDENT + r")\b", rest, re.IGNORECASE
        )
        if not am:
            raise TxSqlError("a subquery source requires an alias")
        return spark.sql(inner), am.group(1), rest[am.end():].strip()
    ref, alias, rest = _parse_table_ref(spec)
    if tables and ref in tables:
        return snapshot(spark, tables[ref]), alias, rest
    if "/" in ref:
        return snapshot(spark, ref), alias, rest
    return spark.table(ref), alias, rest


# ---------------------------------------------------------------------------
# statement handlers
# ---------------------------------------------------------------------------


def _parse_assignments(s: str, rewrites) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in _split_commas(s):
        m = re.match(r"(" + _IDENT + r")\s*=\s*(.+)$", part, re.DOTALL)
        if not m:
            raise TxSqlError(f"bad SET assignment: {part!r}")
        col = m.group(1)
        # target-qualified LHS (t.col = ...) binds the bare column
        col = col.split(".")[-1]
        expr = m.group(2).strip()
        for a, to in rewrites:
            expr = _rewrite_alias(expr, a, to)
        out[col] = expr
    return out


def _do_merge(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import merge

    body = _split_kw(stmt, "MERGE INTO")[1]
    sp = _split_kw(body, "USING")
    if not sp:
        raise TxSqlError("MERGE requires USING")
    tref_s, rest = sp
    tref, talias, extra = _parse_table_ref(tref_s)
    if extra:
        raise TxSqlError(f"unexpected tokens after target: {extra!r}")
    sp = _split_kw(rest, "ON")
    if not sp:
        raise TxSqlError("MERGE requires ON")
    src_spec, rest = sp
    source, salias, extra = _resolve_source(spark, src_spec, tables)
    if extra:
        raise TxSqlError(f"unexpected tokens after source: {extra!r}")
    # the ON condition: a single same-name equi-key (engine contract)
    i = _find_kw(rest, "WHEN")
    on = rest if i < 0 else rest[:i]
    clauses = "" if i < 0 else rest[i:]
    om = re.match(
        r"\s*(" + _IDENT + r")\s*\.\s*(" + _IDENT + r")\s*=\s*"
        r"(" + _IDENT + r")\s*\.\s*(" + _IDENT + r")\s*$",
        on,
    )
    if not om:
        raise TxSqlError(
            f"MERGE ON must be '<t>.<key> = <s>.<key>', got {on!r}"
        )
    a1, k1, a2, k2 = om.groups()
    if {a1, a2} != {talias, salias} or k1 != k2:
        raise TxSqlError(
            "MERGE ON must equate the SAME key column across the two "
            f"aliases ({talias!r}, {salias!r}); got {on.strip()!r}"
        )
    key_col = k1
    rewrites = [(talias, "t"), (salias, "s")]

    when_matched: list = []
    when_not_matched: list = []
    # split the clause tail on top-level WHEN
    spans = []
    j = 0
    while True:
        j = _find_kw(clauses, "WHEN", j)
        if j < 0:
            break
        spans.append(j)
        j += 4
    spans.append(len(clauses))
    for a, b in zip(spans, spans[1:]):
        cl = clauses[a:b].strip()
        m = re.match(
            r"WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.*?))?\s*THEN\s+(.*)$",
            cl,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise TxSqlError(f"bad WHEN clause: {cl!r}")
        negated, cond, action = m.groups()
        if cond:
            for al, to in rewrites:
                cond = _rewrite_alias(cond, al, to)
        action = action.strip()
        if negated:
            if not re.fullmatch(
                r"INSERT\s*\*", action, re.IGNORECASE
            ):
                raise TxSqlError(
                    "WHEN NOT MATCHED supports 'INSERT *' (the engine "
                    "inserts the whole source row)"
                )
            when_not_matched.append(("insert", cond))
        elif re.fullmatch(r"DELETE", action, re.IGNORECASE):
            when_matched.append(("delete", cond))
        else:
            um = re.match(
                r"UPDATE\s+SET\s+(.*)$", action, re.IGNORECASE | re.DOTALL
            )
            if not um:
                raise TxSqlError(f"bad matched action: {action!r}")
            sets = um.group(1).strip()
            if sets == "*":
                when_matched.append(("update_all", cond))
            else:
                when_matched.append(
                    ("update", cond, _parse_assignments(sets, rewrites))
                )
    return merge(
        spark,
        _table_dir(tref, tables),
        source,
        key_col,
        when_matched=when_matched,
        when_not_matched=when_not_matched,
    )


def _do_update(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import update_rows

    body = _split_kw(stmt, "UPDATE")[1]
    tref, alias, rest = _parse_table_ref(body)
    sp = _split_kw(rest, "SET")
    if sp is None or sp[0]:
        raise TxSqlError("UPDATE requires SET")
    rest = sp[1]
    wh = _split_kw(rest, "WHERE")
    sets, cond = (rest, "true") if wh is None else (wh[0], wh[1])
    # single-table statement: alias-qualified refs bind bare columns
    assigns = _parse_assignments(sets, [(alias, "")])
    cond = _rewrite_alias(cond, alias, "")
    return update_rows(spark, _table_dir(tref, tables), cond, assigns)


def _do_delete(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import delete_where

    body = _split_kw(stmt, "DELETE FROM")[1]
    tref, alias, rest = _parse_table_ref(body)
    wh = _split_kw(rest, "WHERE")
    cond = "true" if wh is None else wh[1]
    cond = _rewrite_alias(cond, alias, "")
    return delete_where(spark, _table_dir(tref, tables), cond)


def _do_insert(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import append

    body = _split_kw(stmt, "INSERT INTO")[1]
    tref, _alias, rest = _parse_table_ref(body)
    if not rest:
        raise TxSqlError("INSERT INTO requires a SELECT or VALUES body")
    if re.match(r"VALUES\b", rest, re.IGNORECASE):
        # VALUES must carry a column alias (`VALUES (1) v(k)`) —
        # append() merges schemas BY NAME, so unnamed col1/col2 would
        # silently evolve the table instead of inserting
        df = spark.sql(f"SELECT * FROM {rest}")
    else:
        df = spark.sql(rest)
    return append(spark, _table_dir(tref, tables), df)


def _partition_pred(s: str) -> dict:
    out: dict = {}
    for part in re.split(r"\bAND\b", s, flags=re.IGNORECASE):
        m = re.match(
            r"\s*(" + _IDENT + r")\s*=\s*(.+?)\s*$", part
        )
        if not m:
            raise TxSqlError(
                f"OPTIMIZE WHERE supports 'col = value [AND ...]', "
                f"got {part.strip()!r}"
            )
        col, val = m.group(1), m.group(2).strip()
        if val.startswith("'") and val.endswith("'"):
            val = val[1:-1]
        else:
            try:
                val = int(val)
            except ValueError:
                try:
                    val = float(val)
                except ValueError:
                    pass
        out[col] = val
    return out


def _do_optimize(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import (
        optimize_small_files,
    )

    body = _split_kw(stmt, "OPTIMIZE")[1]
    tref, _alias, rest = _parse_table_ref(body)
    wh = _split_kw(rest, "WHERE")
    part = None if wh is None else _partition_pred(wh[1])
    return optimize_small_files(
        spark, _table_dir(tref, tables), partition=part
    )


def _do_vacuum(spark, stmt, tables):
    from etl_sentinel_imagery_spark.operators.txlog import vacuum

    body = _split_kw(stmt, "VACUUM")[1]
    tref, _alias, rest = _parse_table_ref(body)
    min_age = None
    rm = re.search(
        r"\bRETAIN\s+(\d+(?:\.\d+)?)\s+HOURS?\b", rest, re.IGNORECASE
    )
    if rm:
        min_age = float(rm.group(1)) * 3600.0
    dry = re.search(r"\bDRY\s+RUN\b", rest, re.IGNORECASE) is not None
    return vacuum(
        _table_dir(tref, tables), min_age_seconds=min_age, dry_run=dry
    )


_HANDLERS = [
    ("MERGE INTO", _do_merge),
    ("UPDATE", _do_update),
    ("DELETE FROM", _do_delete),
    ("INSERT INTO", _do_insert),
    ("OPTIMIZE", _do_optimize),
    ("VACUUM", _do_vacuum),
]


def tx_sql(
    spark: SparkSession,
    statement: str,
    tables: dict[str, str] | None = None,
):
    """Execute one DML statement against transaction-log tables.

    ``tables`` maps statement table names to table directories;
    backtick-quoted directories work without it. Returns exactly what
    the underlying verb returns: the committed version for MERGE /
    UPDATE / DELETE / INSERT, ``(version, stats)`` for OPTIMIZE, and
    the removed/would-remove path list for VACUUM. Every statement is
    ONE transactional commit with the Python verbs' lock-free
    concurrency semantics — this is routing, not a second engine."""
    stmt = statement.strip().rstrip(";").strip()
    for kw, fn in _HANDLERS:
        if re.match(
            r"\s*" + r"\s+".join(kw.split()) + r"\b",
            stmt,
            re.IGNORECASE,
        ):
            return fn(spark, stmt, tables)
    raise TxSqlError(
        "unsupported statement (MERGE INTO / UPDATE / DELETE FROM / "
        f"INSERT INTO / OPTIMIZE / VACUUM): {stmt[:60]!r}"
    )
