"""Declarative table constraints enforced at ingest.

≙ Kettle's Data Validator step (validator/Validator.java) hoisted from a
per-pipeline step into a TABLE-LEVEL contract (Delta `ALTER TABLE ADD
CONSTRAINT` / `NOT NULL` semantics): constraints are declared ONCE on
the state root, persist across jobs in ``<root>/CONSTRAINTS.json``, and
every guarded apply evaluates them vectorized per Arrow batch. Rows
violating any constraint are routed to a quarantine log (append-only,
never compacted) with an ``error_constraint`` column naming the first
violated rule — the same audit discipline as late-data quarantine
(``sink.apply_with_quarantine``), instead of Delta's abort-the-commit,
because at CDC scale one poisoned upstream row must not stall the
stream.

Constraint forms (JSON-durable)::

    {"name": "lang_set",   "kind": "not_null", "col": "lang"}
    {"name": "seq_pos",    "kind": "check", "expr": ["commit_seq", ">=", 0]}
    {"name": "known_op",   "kind": "in",   "col": "op",
     "values": ["upsert", "delete"]}

``check`` reuses the sink's pruning-triple grammar (col, op, literal)
with op in ==,!=,<,<=,>,>=. NULL semantics follow SQL CHECK: a NULL
comparison does NOT violate a ``check``/``in`` constraint (declare
``not_null`` separately to reject nulls).

Scale: constraint evaluation is a pure ``pyarrow.compute`` mask inside
the existing ingest ``map_batches`` pass — zero extra shuffles, zero
extra reads; the split into good/quarantine streams shares one routed
materialization exactly like the watermark router.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kettleray.io import sink as _sink

_CHECK_FNS = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater,
              ">=": pc.greater_equal}


def _cpath(root: str) -> str:
    return os.path.join(root, "CONSTRAINTS.json")


def _validate_rule(r: dict) -> None:
    kind = r.get("kind")
    if "name" not in r:
        raise ValueError(f"constraint missing 'name': {r!r}")
    if kind == "not_null":
        if "col" not in r:
            raise ValueError(f"not_null needs 'col': {r!r}")
    elif kind == "check":
        e = r.get("expr")
        if (not isinstance(e, (list, tuple)) or len(e) != 3
                or e[1] not in _CHECK_FNS):
            raise ValueError(
                f"check needs expr=(col, op, literal) with op in "
                f"{sorted(_CHECK_FNS)}: {r!r}")
    elif kind == "in":
        if "col" not in r or not r.get("values"):
            raise ValueError(f"in needs 'col' and 'values': {r!r}")
    else:
        raise ValueError(f"unknown constraint kind {kind!r}: {r!r}")


def set_constraints(root: str, rules: "list[dict]") -> None:
    """Declare (replace) the root's constraint set. Validation is eager
    so a typo'd rule fails at declaration, not mid-ingest."""
    for r in rules:
        _validate_rule(r)
    if len({r["name"] for r in rules}) != len(rules):
        raise ValueError("duplicate constraint names")
    os.makedirs(root, exist_ok=True)
    _sink.atomic_write_json(_cpath(root), {"constraints": rules})


def get_constraints(root: str) -> "list[dict]":
    p = _cpath(root)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)["constraints"]


def _rule_ok(t: pa.Table, r: dict) -> pa.Array:
    """Per-row satisfied-mask for one rule (SQL CHECK null semantics:
    a NULL comparison passes check/in; not_null is the null gate)."""
    kind = r["kind"]
    if kind == "not_null":
        return pc.is_valid(t[r["col"]])
    if kind == "check":
        col, op, val = r["expr"]
        return pc.fill_null(_CHECK_FNS[op](t[col], val), True)
    # kind == "in" — pc.is_in yields a VALID False for a null input
    # (unlike the comparison kernels' null), so the SQL pass-on-null
    # needs an explicit is_null OR
    col = t[r["col"]]
    return pc.or_(pc.is_null(col),
                  pc.is_in(col, value_set=pa.array(r["values"])))


def violations(t: pa.Table, rules: "list[dict]",
               ) -> "tuple[pa.Array, np.ndarray]":
    """(bad_mask, first-violated-name per row) — one vectorized pass."""
    ok = pa.array(np.ones(t.num_rows, dtype=bool))
    name = np.full(t.num_rows, None, dtype=object)
    for r in rules:
        m = _rule_ok(t, r)
        bad_here = pc.and_(ok, pc.invert(m)).to_numpy(zero_copy_only=False)
        name[bad_here] = r["name"]
        ok = pc.and_(ok, m)
    return pc.invert(ok), name


def apply_with_constraints(state_root: str, quarantine_root: str,
                           events: "ray.data.Dataset", *,
                           mode: str = "mor",
                           num_buckets: int = 64,
                           num_partitions: int = 16,
                           bucket_cols: tuple = ("repo", "path"),
                           ) -> "tuple[_sink.Manifest, _sink.Manifest | None, int]":
    """Guarded ingest: rows satisfying every declared constraint upsert
    through the chosen incremental path; violators append to the
    quarantine log carrying ``error_constraint``. Returns
    ``(state_manifest, quarantine_manifest | None, n_quarantined)``.

    The constraint masks run INSIDE the routing map_batches (no extra
    pass); the routed stream is materialized once and both branches
    read it, mirroring ``sink.apply_with_quarantine``. A key whose
    newest event is quarantined keeps its previous good state — exactly
    the replay-on-filtered-log semantics the oracle reproduces.
    """
    rules = get_constraints(state_root)
    if not rules:
        apply_fn = {"bucketed": _sink.apply_incremental_bucketed,
                    "mor": _sink.apply_incremental_mor}[mode]
        man = apply_fn(state_root, events, num_buckets=num_buckets,
                       num_partitions=num_partitions,
                       bucket_cols=bucket_cols)
        return man, None, 0

    def _route(t: pa.Table) -> pa.Table:
        bad, names = violations(t, rules)
        return t.append_column(
            "error_constraint", pa.array(names, type=pa.string())) \
            .append_column("_bad", bad)

    routed = events.map_batches(_route, batch_format="pyarrow",
                                batch_size=None,
                                zero_copy_batch=True).materialize()
    good = routed.map_batches(
        lambda b: b.filter(pc.invert(b["_bad"])).drop_columns(
            ["_bad", "error_constraint"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    bad = routed.map_batches(
        lambda b: b.filter(b["_bad"]).drop_columns(["_bad"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    apply_fn = {"bucketed": _sink.apply_incremental_bucketed,
                "mor": _sink.apply_incremental_mor}[mode]
    state_man = apply_fn(state_root, good, num_buckets=num_buckets,
                         num_partitions=num_partitions,
                         bucket_cols=bucket_cols)
    n_bad = bad.count()
    q_man = None
    if n_bad:
        q_man = _sink.append_log(
            quarantine_root, bad,
            metrics={"constraint_rows": n_bad,
                     "constraints": [r["name"] for r in rules]})
    return state_man, q_man, n_bad
