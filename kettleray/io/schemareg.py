"""Versioned schema registry with compatibility modes.

≙ the contract layer Kettle leaves implicit (every .ktr pins its field
list via StepMeta.getFields(); a producer changing its output silently
breaks downstream hops at runtime) and what Confluent Schema Registry /
Delta `ALTER TABLE` make explicit: each table root carries a durable,
append-only history of Arrow schemas, and a new producer generation is
admitted only if it satisfies the table's compatibility mode.

Layout (under ``<root>/_schemas/``)::

    schema_0001.json      {"version": 1, "ipc": <base64 Arrow IPC>,
                           "fields": [[name, type-str], ...],
                           "compatibility": "BACKWARD"}
    schema_0002.json
    LATEST                {"version": 2}

Schemas round-trip through Arrow IPC bytes (lossless, including
nullability); the ``fields`` list is a human-readable summary only.
Registration reaps crash orphans above LATEST before allocating
LATEST + 1 (single-writer registry; see ``_reap_orphans``), so the
version chain is hole-free and history walks are sound.

Compatibility is defined operationally over ``cdc.conform_table``'s
actual read behavior. ``can_read(reader, writer)`` is True iff a batch
written under ``writer`` conforms losslessly to ``reader``:

* a reader field present in writer needs an identical or WIDENING cast
  (int32->int64, int->float, float32->float64, string->large_string);
* a reader field absent from writer must be nullable (backfilled null);
* writer-only fields are projected away (never a read failure).

Modes (Confluent nomenclature):

* ``NONE``                  — anything goes.
* ``BACKWARD``              — new schema can read data written under the
                              PREVIOUS schema: add nullable columns,
                              widen types; drops of non-nullable data or
                              narrowing are rejected.
* ``BACKWARD_TRANSITIVE``   — ... under ALL previous schemas.
* ``FORWARD``               — previous schema can still read data
                              written under the new one (new columns are
                              fine — old readers project them away; a
                              drop is fine only if old readers tolerate
                              the null backfill).
* ``FORWARD_TRANSITIVE``    — ... for all previous schemas.
* ``FULL`` / ``FULL_TRANSITIVE`` — both directions.

Scale note: the registry is METADATA — a handful of small JSON files per
table, read once per ingest job on the driver and enforced inside
``map_batches`` via the existing zero-copy ``conform_table`` kernel. No
per-row or per-batch registry I/O ever happens.
"""
from __future__ import annotations

import base64
import json
import os

import pyarrow as pa

from kettleray.io.sink import atomic_write_json

_MODES = ("NONE", "BACKWARD", "BACKWARD_TRANSITIVE", "FORWARD",
          "FORWARD_TRANSITIVE", "FULL", "FULL_TRANSITIVE")

# widening casts conform_table applies losslessly (superset relation is
# shared with cdc._WIDENINGS; duplicated here to keep io -> ops imports
# one-directional at module load)
_WIDENINGS = {
    (pa.int32(), pa.int64()), (pa.int32(), pa.float64()),
    (pa.int64(), pa.float64()), (pa.float32(), pa.float64()),
    (pa.string(), pa.large_string()),
}


class SchemaIncompatibleError(ValueError):
    """New producer schema violates the table's compatibility mode."""


def _sdir(root: str) -> str:
    return os.path.join(root, "_schemas")


def _spath(root: str, v: int) -> str:
    return os.path.join(_sdir(root), f"schema_{v:04d}.json")


def _castable(writer_t: pa.DataType, reader_t: pa.DataType) -> bool:
    if writer_t == reader_t:
        return True
    if (writer_t, reader_t) in _WIDENINGS:
        return True
    return pa.types.is_integer(writer_t) and pa.types.is_floating(reader_t)


def can_read(reader: pa.Schema, writer: pa.Schema) -> "str | None":
    """None if data written under ``writer`` conforms to ``reader``
    (see module docstring); else a human-readable reason string."""
    by_name = {f.name: f for f in writer}
    for f in reader:
        w = by_name.get(f.name)
        if w is None:
            if not f.nullable:
                return (f"required column '{f.name}' missing from "
                        f"writer schema (no null backfill)")
            continue
        if not _castable(w.type, f.type):
            return (f"column '{f.name}': {w.type} -> {f.type} is not a "
                    f"widening cast")
    return None


def _check_mode(mode: str, new: pa.Schema,
                history: "list[pa.Schema]") -> None:
    """Raise SchemaIncompatibleError if ``new`` violates ``mode``
    against ``history`` (oldest first, last = current latest)."""
    if mode not in _MODES:
        raise ValueError(f"unknown compatibility mode {mode!r}; "
                         f"want one of {_MODES}")
    if mode == "NONE" or not history:
        return
    prevs = history if mode.endswith("_TRANSITIVE") else history[-1:]
    for prev in prevs:
        if mode.startswith(("BACKWARD", "FULL")):
            why = can_read(new, prev)
            if why is not None:
                raise SchemaIncompatibleError(
                    f"{mode}: new schema cannot read v-old data: {why}")
        if mode.startswith(("FORWARD", "FULL")):
            why = can_read(prev, new)
            if why is not None:
                raise SchemaIncompatibleError(
                    f"{mode}: old schema cannot read new data: {why}")


def _encode(schema: pa.Schema) -> str:
    return base64.b64encode(schema.serialize().to_pybytes()).decode()


def _decode(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(s)))


def latest_version(root: str) -> "int | None":
    p = os.path.join(_sdir(root), "LATEST")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def _reap_orphans(root: str) -> int:
    """Delete schema files above LATEST (crash remnants of a
    registration that died between the file write and the pointer
    write) and return the next free version. The registry is
    single-writer per table (enforced loudly in register_schema), so an
    above-LATEST file can only be such a remnant — reaping it keeps the
    version chain hole-free and keeps schema_history() sound (it walks
    1..LATEST and must never surface a never-activated generation)."""
    cur = latest_version(root) or 0
    d = _sdir(root)
    if os.path.isdir(d):
        for n in os.listdir(d):
            if n.startswith("schema_") and n.endswith(".json") \
                    and int(n[7:11]) > cur:
                os.unlink(os.path.join(d, n))
    return cur + 1


def get_schema(root: str, version: "int | None" = None) -> "pa.Schema | None":
    v = version if version is not None else latest_version(root)
    if v is None:
        return None
    with open(_spath(root, v)) as f:
        return _decode(json.load(f)["ipc"])


def schema_history(root: str) -> "list[tuple[int, pa.Schema]]":
    """All registered (version, schema), oldest first, up to LATEST
    (crash orphans above LATEST are invisible, as with sink versions)."""
    cur = latest_version(root)
    if cur is None:
        return []
    return [(v, get_schema(root, v)) for v in range(1, cur + 1)]


def register_schema(root: str, schema: pa.Schema, *,
                    compatibility: str = "BACKWARD") -> int:
    """Admit ``schema`` as the table's next generation (checked against
    the history per ``compatibility``) and return its version. Re-
    registering the exact current schema is a no-op returning the
    current version."""
    hist = schema_history(root)
    if hist and hist[-1][1] == schema:
        return hist[-1][0]
    _check_mode(compatibility, schema, [s for _, s in hist])
    os.makedirs(_sdir(root), exist_ok=True)
    v = _reap_orphans(root)
    path = _spath(root, v)
    atomic_write_json(path, {
        "version": v, "ipc": _encode(schema),
        "fields": [[f.name, str(f.type)] for f in schema],
        "compatibility": compatibility})
    atomic_write_json(os.path.join(_sdir(root), "LATEST"), {"version": v})
    return v


def _union_target(latest: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Evolution target = latest with shared columns widened as needed
    and incoming-only columns appended (order: latest first — readers
    see a stable prefix). Raises on non-widenable type drift."""
    fields = []
    latest_names = set()
    inc_by_name = {f.name: f for f in incoming}
    for f in latest:
        latest_names.add(f.name)
        g = inc_by_name.get(f.name)
        if g is None or _castable(g.type, f.type):
            fields.append(f)
        elif _castable(f.type, g.type):
            fields.append(pa.field(f.name, g.type))
        else:
            raise SchemaIncompatibleError(
                f"column '{f.name}': {g.type} and {f.type} have no "
                f"widening direction")
    for f in incoming:
        if f.name not in latest_names:
            fields.append(pa.field(f.name, f.type))   # force nullable
    return pa.schema(fields)


def ingest_guard(root: str, events: "ray.data.Dataset", *,
                 compatibility: str = "BACKWARD",
                 auto_register: bool = True,
                 ) -> "tuple[ray.data.Dataset, int]":
    """Gate an ingest batch through the registry: returns
    ``(conformed_events, schema_version)``.

    * First ever batch registers v1 (when ``auto_register``).
    * A batch matching / readable-by the latest schema conforms up to
      it (null-backfill + widening via ``cdc.evolve_to_schema`` — a
      zero-copy-in map_batches stage, no extra pass).
    * A batch carrying NEW or widened columns attempts to register the
      union schema under ``compatibility``; success bumps the registry
      and conforms to the new generation, failure raises
      ``SchemaIncompatibleError`` BEFORE any data moves — the whole
      check is driver-side metadata, so a rejected producer costs no
      cluster work.
    """
    from kettleray.ops.cdc import evolve_to_schema

    incoming = events.schema().base_schema
    latest = get_schema(root)
    if latest is None:
        if not auto_register:
            raise SchemaIncompatibleError(
                f"no schema registered under {root} and "
                f"auto_register=False")
        v = register_schema(root, incoming, compatibility=compatibility)
        return events, v
    if incoming == latest:
        return events, latest_version(root)
    if can_read(latest, incoming) is None and \
            all(f.name in {g.name for g in latest} for f in incoming):
        # old-generation producer: conform up, no registry change
        return evolve_to_schema(events, latest), latest_version(root)
    target = _union_target(latest, incoming)
    if not auto_register and target != latest:
        raise SchemaIncompatibleError(
            f"producer schema requires evolution to {target} but "
            f"auto_register=False")
    v = register_schema(root, target, compatibility=compatibility)
    return evolve_to_schema(events, target), v
