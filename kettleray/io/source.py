"""Sources (SURVEY.md §2.2) — Ray Data readers with Kettle-step options.

≙ CSV file input (csvinput/CsvInput.java — parallel by block for free),
Text file input (fileinput/text/TextFileInput.java — bad-row routing),
JSON input (jsoninput/JsonInput.java — JSONPath-ish field extraction),
Fixed file input (fixedinput/FixedInput.java), Generate rows
(rowgenerator/RowGenerator.java), Data grid (datagrid/DataGrid.java),
Get file names (getfilenames/GetFileNames.java), Load file content
(loadfileinput/LoadFileInput.java), Parquet input (big-data plugin).
"""

from __future__ import annotations

import json
from typing import Any, Mapping, Sequence

import pyarrow as pa

import ray.data


def read_parquet(paths, *, columns: Sequence[str] | None = None,
                 filter_expr=None, **kw):
    """Primary source: column pruning + row-group predicate pushdown."""
    return ray.data.read_parquet(paths, columns=list(columns)
                                 if columns else None,
                                 filter=filter_expr, **kw)


def read_csv(paths, **kw):
    return ray.data.read_csv(paths, **kw)


def read_text_with_errors(paths, parse_fn, *, error_col: str = "_error"):
    """≙ Text file input with reject routing: parse_fn(line) -> dict or
    raise; failures become rows with the raw line + error message in an
    error dataset (StepErrorMeta semantics). Returns (good, bad)."""
    lines = ray.data.read_text(paths)

    def _good(batch: dict) -> pa.Table:
        rows = []
        for line in batch["text"]:
            try:
                rows.append(parse_fn(line))
            except Exception:
                pass
        return pa.Table.from_pylist(rows) if rows else _empty_from(parse_fn)

    def _bad(batch: dict) -> pa.Table:
        out_line, out_err = [], []
        for line in batch["text"]:
            try:
                parse_fn(line)
            except Exception as ex:
                out_line.append(line)
                out_err.append(f"{type(ex).__name__}: {ex}")
        return pa.table({"line": pa.array(out_line, type=pa.string()),
                         error_col: pa.array(out_err, type=pa.string())})

    return (lines.map_batches(_good, batch_format="numpy"),
            lines.map_batches(_bad, batch_format="numpy"))


def _empty_from(parse_fn):
    return pa.Table.from_pylist([])


def read_json_lines(paths, *, fields: Mapping[str, str] | None = None):
    """≙ JSON input: one JSON object per line; optional dotted-path field
    extraction ({"out_col": "a.b.c"})."""
    lines = ray.data.read_text(paths)

    def _parse(batch: dict) -> pa.Table:
        objs = [json.loads(x) for x in batch["text"]]
        if not fields:
            return pa.Table.from_pylist(objs)
        out = {}
        for col, path in fields.items():
            parts = path.split(".")
            vals = []
            for o in objs:
                v: Any = o
                for p in parts:
                    v = v.get(p) if isinstance(v, dict) else None
                    if v is None:
                        break
                vals.append(v)
            out[col] = vals
        return pa.Table.from_pylist(
            [dict(zip(out, t)) for t in zip(*out.values())]) \
            if out else pa.Table.from_pylist([])

    return lines.map_batches(_parse, batch_format="numpy")


def read_xml(paths, record_path: str,
             fields: Mapping[str, str]):
    """≙ Get data from XML (getxmldata/GetXMLData.java): per file, find
    record elements by ElementTree path, extract fields by relative
    path / ``@attr`` / ``text()``. Whole-file parse per task (XML is not
    splittable); many files parallelize across tasks."""
    import xml.etree.ElementTree as ET

    files = ray.data.read_binary_files(paths, include_paths=True)

    def _parse(batch: dict) -> pa.Table:
        rows = []
        for payload in batch["bytes"]:
            root = ET.fromstring(payload)
            for rec in root.findall(record_path):
                row = {}
                for col, path in fields.items():
                    if path == "text()":
                        row[col] = (rec.text or "").strip()
                    elif path.startswith("@"):
                        row[col] = rec.get(path[1:])
                    else:
                        el = rec.find(path)
                        row[col] = None if el is None \
                            else (el.text or "").strip()
                rows.append(row)
        return pa.Table.from_pylist(rows) if rows else \
            pa.table({c: pa.array([], type=pa.string()) for c in fields})

    return files.map_batches(_parse, batch_format="numpy")


def read_fixed_width(paths, field_specs: Sequence[tuple[str, int, int]]):
    """≙ Fixed file input: (name, start, end) byte slices per line."""
    lines = ray.data.read_text(paths)

    def _slice(batch: dict) -> pa.Table:
        cols = {name: [ln[s:e].strip() for ln in batch["text"]]
                for name, s, e in field_specs}
        return pa.table({k: pa.array(v, type=pa.string())
                         for k, v in cols.items()})

    return lines.map_batches(_slice, batch_format="numpy")


def generate_rows(n: int, constants: Mapping[str, Any]):
    """≙ Generate rows: N copies of a constant row."""
    ds = ray.data.range(n)

    def _fn(batch: dict) -> pa.Table:
        m = len(batch["id"])
        return pa.table({k: pa.array([v] * m) for k, v in constants.items()}
                        | {"id": pa.array(batch["id"])})

    return ds.map_batches(_fn, batch_format="numpy")


def data_grid(rows: Sequence[Mapping[str, Any]]):
    """≙ Data grid: inline literal table."""
    return ray.data.from_arrow(pa.Table.from_pylist(list(rows)))


def get_file_names(root: str, *, pattern: str = "**/*"):
    """≙ Get file names: directory listing as rows (driver-side listing,
    distributed downstream)."""
    import glob
    import os
    files = sorted(glob.glob(os.path.join(root, pattern), recursive=True))
    rows = [{"path": f, "name": os.path.basename(f),
             "size": os.path.getsize(f)} for f in files
            if os.path.isfile(f)]
    return ray.data.from_items(rows)


def load_file_content(paths):
    """≙ Load file content in memory: whole file -> one binary row."""
    return ray.data.read_binary_files(paths, include_paths=True)


def generate_random_values(n: int, fields: Mapping[str, str], *,
                           seed: int = 42, num_blocks: int | None = None):
    """≙ Generate random value (generaterandomvalue/RandomValue.java):
    n rows of seeded random columns. Types: 'number' (uniform [0,1)),
    'integer' (int64), 'string' (16-hex chars), 'uuid'.

    Deterministic AND distribution-friendly: value = pure function of
    (row index, column, seed) via splitmix64 — no RNG state shared
    across blocks, so any partitioning yields the same table."""
    from kettleray.gen.synthetic import _mix64, _unit
    import numpy as np

    ds = ray.data.range(n, override_num_blocks=num_blocks)

    def _fn(batch: dict) -> pa.Table:
        idx = batch["id"].astype(np.int64)
        cols: dict[str, pa.Array] = {"id": pa.array(idx)}
        for j, (name, typ) in enumerate(sorted(fields.items())):
            salt = seed * 1000 + j
            if typ == "number":
                cols[name] = pa.array(_unit(idx, salt))
            elif typ == "integer":
                cols[name] = pa.array(
                    _mix64(idx, salt).astype(np.int64))
            elif typ == "string":
                h = _mix64(idx, salt)
                cols[name] = pa.array(
                    [format(int(v), "016x") for v in h],
                    type=pa.string())
            elif typ == "uuid":
                import uuid
                h1, h2 = _mix64(idx, salt), _mix64(idx, salt + 1)
                cols[name] = pa.array(
                    [str(uuid.UUID(int=(int(a) << 64) | int(b)))
                     for a, b in zip(h1, h2)], type=pa.string())
            else:
                raise ValueError(f"unknown random type {typ!r}")
        return pa.table(cols)

    return ds.map_batches(_fn, batch_format="numpy")


def get_system_info(fields: Sequence[str] = ("system_date", "hostname",
                                             "os_name", "cpu_count")):
    """≙ Get system info (systemdata/SystemData.java): one row of system
    facts — driver-evaluated once (system data is per-run constant, not
    per-record)."""
    import datetime
    import os
    import platform
    import socket

    vals: dict[str, Any] = {}
    for f in fields:
        if f == "system_date":
            vals[f] = datetime.datetime.now()
        elif f == "system_date_utc":
            vals[f] = datetime.datetime.utcnow()
        elif f == "hostname":
            vals[f] = socket.gethostname()
        elif f == "os_name":
            vals[f] = platform.system()
        elif f == "os_version":
            vals[f] = platform.release()
        elif f == "python_version":
            vals[f] = platform.python_version()
        elif f == "cpu_count":
            vals[f] = os.cpu_count()
        elif f == "pid":
            vals[f] = os.getpid()
        elif f == "cwd":
            vals[f] = os.getcwd()
        else:
            raise ValueError(f"unknown system info field {f!r}")
    return ray.data.from_items([vals])


# ---------------------------------------------------------------------------
# Binlog/WAL-tail ingestion: Debezium-style change-event envelopes.
# (Public format: debezium.io "change event envelope" — payload with
# before/after row images, op code c/u/d/r, source metadata w/ LSN.)
# ---------------------------------------------------------------------------

_ENVELOPE_FIELDS = ("repo", "path", "commit", "lang", "content")
_ENVELOPE_OP_CODES = ("c", "r", "u", "d")          # create/read/update/delete
_ENVELOPE_OP_CANON = ("insert", "insert", "update", "delete")


def write_cdc_envelope(events: "ray.data.Dataset", out_dir: str,
                       ) -> None:
    """Encode canonical change events (repo, path, commit, lang, content,
    op, commit_seq) as line-delimited Debezium-style envelopes:
    ``{"payload": {"before": row|null, "after": row|null, "op": "c|u|d",
    "ts_ms": seq, "source": {"lsn": seq}}}``. Deletes carry the row image
    in ``before`` (after=null); upserts the inverse. Vectorized: struct
    arrays built from the event columns, no per-row Python."""
    import pyarrow.compute as pc

    def _enc(t: pa.Table) -> pa.Table:
        is_del = pc.equal(t["op"], "delete").combine_chunks()
        cols = [t[c].combine_chunks() for c in _ENVELOPE_FIELDS]
        after = pa.StructArray.from_arrays(
            cols, names=list(_ENVELOPE_FIELDS),
            mask=is_del)                       # null where delete
        before = pa.StructArray.from_arrays(
            cols, names=list(_ENVELOPE_FIELDS),
            mask=pc.invert(is_del))            # null where upsert
        idx = pc.index_in(t["op"], value_set=pa.array(
            ["insert", "update", "delete"]))
        op = pc.take(pa.array(["c", "u", "d"]), idx).combine_chunks()
        seq = t["commit_seq"].combine_chunks()
        source = pa.StructArray.from_arrays([seq], names=["lsn"])
        payload = pa.StructArray.from_arrays(
            [before, after, op, seq, source],
            names=["before", "after", "op", "ts_ms", "source"])
        return pa.table({"payload": payload})

    events.map_batches(_enc, batch_format="pyarrow",
                       zero_copy_batch=True).write_json(out_dir)


def read_cdc_envelope(paths, *, seq_path: Sequence[str] = ("source", "lsn"),
                      **kw) -> "ray.data.Dataset":
    """≙ binlog/WAL tail: parse Debezium-style envelope JSONL into the
    canonical change-event schema ready for ``cdc.parse_validate`` /
    ``cdc.replay_lww``. Row images are taken from ``after`` (``before``
    for deletes); ``commit_seq`` from ``payload.source.lsn`` (falling
    back to ``ts_ms``). Vectorized: pyarrow JSON block parse +
    ``struct_field`` extraction + per-column ``if_else`` — no per-row
    Python. Unknown op codes raise (strict, like the validator)."""
    import pyarrow.compute as pc

    ds = ray.data.read_json(paths, **kw)

    def _sf(arr, path):
        """struct_field that degrades to all-null strings when a level is
        absent or JSON-inferred as null type (e.g. a block with no
        deletes infers ``before`` as null)."""
        try:
            out = pc.struct_field(arr, list(path))
        except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError):
            return pa.nulls(len(arr), type=pa.string())
        if pa.types.is_null(out.type):
            return pa.nulls(len(arr), type=pa.string())
        return out

    def _dec(t: pa.Table) -> pa.Table:
        pay = t["payload"].combine_chunks()
        op_raw = _sf(pay, ["op"])
        idx = pc.index_in(op_raw, value_set=pa.array(
            list(_ENVELOPE_OP_CODES)))
        if pc.any(pc.is_null(idx)).as_py() and len(t):
            bad = pc.unique(op_raw.filter(pc.is_null(idx))).to_pylist()
            raise ValueError(f"unknown envelope op codes: {bad}")
        op = pc.take(pa.array(list(_ENVELOPE_OP_CANON)), idx)
        is_del = pc.equal(op, "delete")
        out = {}
        for c in _ENVELOPE_FIELDS:
            out[c] = pc.if_else(is_del, _sf(pay, ["before", c]),
                                _sf(pay, ["after", c]))
        out["op"] = op
        seq = _sf(pay, list(seq_path))
        if pa.types.is_null(seq.type) or pc.all(
                pc.is_null(seq)).as_py() and len(t):
            seq = _sf(pay, ["ts_ms"])
        out["commit_seq"] = pc.cast(seq, pa.int64())
        return pa.table(out)

    return ds.map_batches(_dec, batch_format="pyarrow",
                          zero_copy_batch=True)
