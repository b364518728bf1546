"""Text-format sinks (SURVEY.md §2.3 edge formats).

≙ Text file output (textfileoutput/TextFileOutput.java) -> write_csv;
JSON output (jsonoutput/JsonOutput.java) -> write_json; SQL file output
(sqlfileoutput/SQLFileOutput.java) -> INSERT-statement text emission.
Thin by design: Ray Data's writers already shard one file per block
(split-every-N-rows ≙ block size).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def write_csv(ds, path: str, **kw):
    return ds.write_csv(path, **kw)


def write_json(ds, path: str, **kw):
    return ds.write_json(path, **kw)


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


def sql_statements(ds, table: str, *, columns: Sequence[str] | None = None):
    """Rows -> a Dataset of INSERT statements (SQLFileOutput semantics).
    Consume with ``.write_csv``/iteration or feed to a DB shell."""

    def _fmt(t: pa.Table) -> pa.Table:
        cols = list(columns) if columns else t.column_names
        col_list = ", ".join(cols)
        stmts = []
        for row in t.select(cols).to_pylist():
            vals = ", ".join(_sql_literal(row[c]) for c in cols)
            stmts.append(f"INSERT INTO {table} ({col_list}) "
                         f"VALUES ({vals});")
        return pa.table({"statement": pa.array(stmts, type=pa.string())})

    return ds.map_batches(_fmt, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
