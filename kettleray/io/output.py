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

    def _literal_array(col: pa.Array) -> pa.Array:
        """Vectorized SQL-literal rendering of one column."""
        import pyarrow.compute as pc
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if pa.types.is_boolean(col.type):
            lit = pc.if_else(col, "TRUE", "FALSE")
        elif pa.types.is_integer(col.type) or \
                pa.types.is_floating(col.type):
            lit = pc.cast(col, pa.string())
        else:
            esc = pc.replace_substring(pc.cast(col, pa.string()),
                                       "'", "''")
            lit = pc.binary_join_element_wise("'", esc, "'", "")
        return pc.coalesce(lit, "NULL")

    def _fmt(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = list(columns) if columns else t.column_names
        col_list = ", ".join(cols)
        prefix = f"INSERT INTO {table} ({col_list}) VALUES ("
        lits = [_literal_array(t[c]) for c in cols]
        parts: list = [prefix]
        for i, la in enumerate(lits):
            if i:
                parts.append(", ")
            parts.append(la)
        parts.append(");")
        stmts = pc.binary_join_element_wise(*parts, "")
        return pa.table({"statement": stmts})

    return ds.map_batches(_fmt, batch_format="pyarrow",
                          zero_copy_batch=True, batch_size=None)
