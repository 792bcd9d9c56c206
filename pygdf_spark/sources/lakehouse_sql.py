"""Delta-style SQL statement surface over deltalite tables.

``sql(spark, statement, catalog)`` parses the lakehouse DDL/DML
dialect a Delta/Iceberg user drives their tables with and dispatches
onto the engine-native deltalite API — so the whole transaction
protocol (snapshot reads, time travel, DV deletes, copy-on-write
UPDATE, OPTIMIZE/ZORDER, partition + schema evolution, constraints,
RESTORE, VACUUM, history) is reachable from SQL strings, not just
Python calls. Statements:

    SELECT <cols|*> FROM t [VERSION AS OF n | TIMESTAMP AS OF 'ts']
        [WHERE <pred>]
    INSERT INTO t <any Spark SQL SELECT over registered views>
    DELETE FROM t WHERE <pred>
    UPDATE t SET a = expr[, ...] WHERE <pred>
    OPTIMIZE t [WHERE <pred>] [ZORDER BY (c1[, ...])]
    VACUUM t [RETAIN n VERSIONS]
    COPY INTO t FROM '<glob>' [FILEFORMAT = <fmt>]
    RESTORE TABLE t TO VERSION AS OF n
    ALTER TABLE t RENAME COLUMN a TO b
    ALTER TABLE t DROP COLUMN a
    ALTER TABLE t ALTER COLUMN a TYPE <type>
    ALTER TABLE t SET PARTITION SPEC (c1[, ...])
    ALTER TABLE t ADD CONSTRAINT name CHECK (expr)
    ALTER TABLE t DROP CONSTRAINT name
    DESCRIBE HISTORY t
    DESCRIBE DETAIL t
    SHOW PARTITIONS t

Table resolution: ``catalog`` maps logical names to table paths; a
name absent from the catalog is treated as a filesystem path verbatim
(the ``delta.`/path/``` convention without the quoting ceremony).

WHERE clauses that are conjunctions of ``col <op> literal`` compile to
the engine's ``(col, op, literal)`` predicate tuples — so SQL deletes
and selects get FILE-LEVEL STATS PRUNING and the metadata-only
partition fast path, exactly like the Python API. Anything more
complex falls back to a raw Spark SQL boolean expression (full scan,
still correct); SELECT-with-complex-WHERE filters post-read.

This is intentionally a STATEMENT dispatcher, not a SQL engine —
query bodies (joins, aggregates) belong to ``spark.sql`` over
DataFrames/views, which Catalyst already serves. Only the statements
that must run through the TRANSACTION PROTOCOL live here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from pygdf_spark.sources import deltalite as dl

_OPS_RE = r"(<=|>=|!=|==|=|<|>)"
# a single conjunct: identifier op literal (number / 'string' / bool)
_CONJ_RE = re.compile(
    r"^\s*`?(?P<col>[A-Za-z_][A-Za-z0-9_]*)`?\s*"
    rf"(?P<op>{_OPS_RE})\s*"
    r"(?P<lit>-?\d+\.\d+|-?\d+|'(?:[^']|'')*'|true|false)\s*$",
    re.IGNORECASE,
)
_NULL_RE = re.compile(
    r"^\s*`?(?P<col>[A-Za-z_][A-Za-z0-9_]*)`?\s+IS\s+"
    r"(?P<not>NOT\s+)?NULL\s*$",
    re.IGNORECASE,
)


def _lit(tok: str):
    low = tok.lower()
    if low == "true":
        return True
    if low == "false":
        return False
    if tok.startswith("'"):
        return tok[1:-1].replace("''", "'")
    return float(tok) if "." in tok else int(tok)


def _parse_where(clause: str):
    """AND-conjunction of simple comparisons → (col, op, lit) tuples
    (stats-prunable); anything else → the raw expression string."""
    tuples = []
    for part in re.split(r"\s+AND\s+", clause, flags=re.IGNORECASE):
        m = _CONJ_RE.match(part)
        if m:
            tuples.append((m["col"], m["op"], _lit(m["lit"])))
            continue
        m = _NULL_RE.match(part)
        if m:
            tuples.append((m["col"], "isnull" if not m["not"] else "notnull",
                           None))
            continue
        return clause  # not a simple conjunction: raw expr fallback
    return tuples


def _split_set(clause: str) -> dict[str, str]:
    """``a = expr, b = expr`` → {col: expr} with comma splitting that
    respects parentheses and quoted strings."""
    out, depth, q, start = {}, 0, False, 0
    parts = []
    for i, ch in enumerate(clause):
        if ch == "'":
            q = not q
        elif not q and ch in "([":
            depth += 1
        elif not q and ch in ")]":
            depth -= 1
        elif not q and ch == "," and depth == 0:
            parts.append(clause[start:i])
            start = i + 1
    parts.append(clause[start:])
    for p in parts:
        col, eq, expr = p.partition("=")
        if not eq:
            raise ValueError(f"malformed SET assignment: {p!r}")
        out[col.strip().strip("`")] = expr.strip()
    return out


def _cols_list(body: str) -> list[str]:
    return [c.strip().strip("`") for c in body.split(",") if c.strip()]


def sql(
    spark: SparkSession, statement: str,
    catalog: dict[str, str] | None = None,
) -> DataFrame | dict | int | list:
    """Execute one lakehouse SQL statement (see module docstring).
    Reads return a DataFrame; DML returns the engine's result dict;
    DDL returns the committed version."""
    stmt = statement.strip().rstrip(";").strip()
    cat = catalog or {}

    def t(name: str) -> str:
        return cat.get(name.strip().strip("`"), name.strip().strip("`"))

    m = re.match(
        r"SELECT\s+(?P<cols>.+?)\s+FROM\s+(?P<t>\S+)"
        r"(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?"
        r"(?:\s+TIMESTAMP\s+AS\s+OF\s+'(?P<ts>[^']+)')?"
        r"(?:\s+WHERE\s+(?P<w>.+))?$",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        pred = _parse_where(m["w"]) if m["w"] else None
        kw = {}
        if m["v"] is not None:
            kw["version"] = int(m["v"])
        if m["ts"] is not None:
            kw["timestamp"] = m["ts"]
        if isinstance(pred, list):
            kw["predicate"] = pred
        df = dl.read_table(spark, t(m["t"]), **kw)
        if isinstance(pred, str):
            df = df.filter(pred)  # complex WHERE: post-read filter
        if m["cols"].strip() != "*":
            df = df.select(*_cols_list(m["cols"]))
        return df

    m = re.match(r"INSERT\s+INTO\s+(?P<t>\S+)\s+(?P<q>SELECT\s+.+)$",
                 stmt, re.IGNORECASE | re.DOTALL)
    if m:
        df = spark.sql(m["q"])
        table = t(m["t"])
        if dl.table_version(table) >= 0:
            # the SQL INSERT contract: incoming columns coerce to the
            # target table's declared types (a 9.0 literal is a Spark
            # DECIMAL — landing it verbatim into a double column would
            # fork the schema instead of inserting)
            import json as _json

            from pyspark.sql import functions as F
            from pyspark.sql import types as ST

            decl = dl._snapshot(table, dl.table_version(table))["schema"]
            if decl:
                want = {
                    f.name: f.dataType
                    for f in ST.StructType.fromJson(_json.loads(decl)).fields
                }
                df = df.select(*[
                    F.col(c).cast(want[c]).alias(c) if c in want
                    else F.col(c)
                    for c in df.columns
                ])
        return dl.append(df, table)

    m = re.match(r"DELETE\s+FROM\s+(?P<t>\S+)\s+WHERE\s+(?P<w>.+)$",
                 stmt, re.IGNORECASE | re.DOTALL)
    if m:
        return dl.delete_where(spark, t(m["t"]), _parse_where(m["w"]))

    m = re.match(
        r"UPDATE\s+(?P<t>\S+)\s+SET\s+(?P<s>.+?)\s+WHERE\s+(?P<w>.+)$",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        return dl.update_where(
            spark, t(m["t"]), _parse_where(m["w"]), _split_set(m["s"])
        )

    m = re.match(
        r"OPTIMIZE\s+(?P<t>\S+)"
        r"(?:\s+WHERE\s+(?P<w>.+?))?"
        r"(?:\s+ZORDER\s+BY\s+\((?P<z>[^)]+)\))?$",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m and (m["t"].upper() not in ("TABLE",)):
        table = t(m["t"])
        if m["z"]:
            if m["w"]:
                raise ValueError("OPTIMIZE: WHERE and ZORDER BY together "
                                 "are not supported")
            return dl.compact_zorder(spark, table, _cols_list(m["z"]))
        if m["w"]:
            pred = _parse_where(m["w"])
            if not isinstance(pred, list):
                raise ValueError(
                    "OPTIMIZE WHERE requires a simple conjunction "
                    "(col op literal) — file selection is log-only"
                )
            return dl.compact_where(spark, table, pred)
        return dl.compact_small_files(spark, table)

    m = re.match(
        r"VACUUM\s+(?P<t>\S+)(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?$",
        stmt, re.IGNORECASE,
    )
    if m:
        return dl.vacuum(t(m["t"]), keep_versions=int(m["n"] or 1))

    m = re.match(
        r"RESTORE\s+TABLE\s+(?P<t>\S+)\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)$",
        stmt, re.IGNORECASE,
    )
    if m:
        return dl.restore(t(m["t"]), int(m["v"]))

    m = re.match(
        r"ALTER\s+TABLE\s+(?P<t>\S+)\s+(?P<rest>.+)$",
        stmt, re.IGNORECASE | re.DOTALL,
    )
    if m:
        table, rest = t(m["t"]), m["rest"].strip()
        m2 = re.match(r"RENAME\s+COLUMN\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$",
                      rest, re.IGNORECASE)
        if m2:
            return dl.rename_column(table, m2[1], m2[2])
        m2 = re.match(r"DROP\s+COLUMN\s+`?(\w+)`?$", rest, re.IGNORECASE)
        if m2:
            return dl.drop_column(table, m2[1])
        m2 = re.match(r"ALTER\s+COLUMN\s+`?(\w+)`?\s+TYPE\s+(\w+)$",
                      rest, re.IGNORECASE)
        if m2:
            # SQL type synonyms → Spark simpleString names
            syn = {"bigint": "long", "int": "integer",
                   "smallint": "short", "tinyint": "byte", "real": "float"}
            ty = m2[2].lower()
            return dl.widen_column(table, m2[1], syn.get(ty, ty))
        m2 = re.match(r"SET\s+PARTITION\s+SPEC\s*\(([^)]*)\)$",
                      rest, re.IGNORECASE)
        if m2:
            return dl.set_partition_spec(table, _cols_list(m2[1]))
        m2 = re.match(
            r"ADD\s+CONSTRAINT\s+`?(\w+)`?\s+CHECK\s*\((.+)\)$",
            rest, re.IGNORECASE | re.DOTALL,
        )
        if m2:
            return dl.add_check_constraint(spark, table, m2[1], m2[2])
        m2 = re.match(r"DROP\s+CONSTRAINT\s+`?(\w+)`?$", rest, re.IGNORECASE)
        if m2:
            return dl.drop_check_constraint(table, m2[1])
        raise ValueError(f"unsupported ALTER TABLE clause: {rest!r}")

    m = re.match(
        r"COPY\s+INTO\s+(?P<t>\S+)\s+FROM\s+'(?P<src>[^']+)'"
        r"(?:\s+FILEFORMAT\s*=\s*(?P<f>\w+))?$",
        stmt, re.IGNORECASE,
    )
    if m:
        return dl.copy_into(spark, t(m["t"]), m["src"],
                            file_format=(m["f"] or "parquet").lower())

    m = re.match(r"DESCRIBE\s+HISTORY\s+(?P<t>\S+)$", stmt, re.IGNORECASE)
    if m:
        return dl.history_df(spark, t(m["t"]))

    m = re.match(r"DESCRIBE\s+DETAIL\s+(?P<t>\S+)$", stmt, re.IGNORECASE)
    if m:
        table = t(m["t"])
        st = dl.table_stats(table)
        return spark.createDataFrame(
            [(
                "deltalite", table, int(dl.table_version(table)),
                int(st["files"]), int(st["bytes"]), int(st["rows"]),
                bool(st["rows_exact"]),
                ",".join(dl.table_partition_by(table) or []),
            )],
            "format string, location string, version long, num_files long, "
            "size_bytes long, num_rows long, rows_exact boolean, "
            "partition_columns string",
        )

    m = re.match(r"SHOW\s+PARTITIONS\s+(?P<t>\S+)$", stmt, re.IGNORECASE)
    if m:
        return dl.show_partitions(spark, t(m["t"]))

    raise ValueError(f"unsupported lakehouse statement: {stmt[:80]!r}")
