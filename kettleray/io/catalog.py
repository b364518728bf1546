"""Snapshot catalog: atomic multi-table visibility over sink roots.

A CDC ingest rarely maintains ONE table — a replay commit typically
lands state + a quarantine table + an SCD2 dimension together, and
readers joining them must not observe half of a batch. Each sink root's
commit is already atomic, but CROSS-table atomicity needs a level above:
this catalog pins (table → version) tuples in an immutable snapshot
file and flips a CURRENT pointer by rename — readers resolve every
table through one snapshot, so they see all of a batch's commits or
none (≙ what Iceberg/Nessie catalogs provide over per-table metadata;
Kettle's analog is a transformation-scoped DB transaction around
multiple Table Outputs).

Layout:
    catalog_root/
      CURRENT              -> {"snapshot": N}
      snap_0000N.json      -> {"tables": {name: {"root": ..., "version": M}},
                               "parent": N-1, "note": ...}

Usage:
    with catalog.transaction(croot) as tx:
        m1 = sink.apply_incremental_bucketed(state_root, fresh, ...)
        m2 = sink.apply_incremental_scd2(dim_root, fresh, ...)
        tx.pin("state", state_root, m1.version)
        tx.pin("dim", dim_root, m2.version)
    # readers before the `with` exit keep the old consistent pair

Crash model: per-table commits that happened before a crash are durable
but INVISIBLE through the catalog until a snapshot pins them; the next
transaction's watermark filters make re-applying the same batch a
no-op, so retrying the whole transaction is exactly-once.
"""

from __future__ import annotations

import json
import os
import time

from kettleray.io import sink as _sink


def _snap_path(root: str, n: int) -> str:
    return os.path.join(root, f"snap_{n:05d}.json")


def current_snapshot_id(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["snapshot"]


def _max_snapshot_on_disk(root: str) -> int | None:
    """Highest committed snap_N.json, INCLUDING one a crashed writer
    linked but never published via CURRENT. A linked snapshot file is
    always complete (it was fsynced before the os.link claim), so it is
    safe to rebase on / roll forward to."""
    mx = None
    if not os.path.isdir(root):
        return None
    for fn in os.listdir(root):
        if fn.startswith("snap_") and fn.endswith(".json"):
            try:
                n = int(fn[5:-5])
            except ValueError:
                continue
            mx = n if mx is None else max(mx, n)
    return mx


def _advance_current(root: str) -> int:
    """Publish CURRENT = max snapshot on disk, re-verifying after the
    write: between reading and writing, a later committer may publish a
    higher snapshot — a one-shot forward-only check would then REGRESS
    the pointer and readers would resolve a stale snapshot. Looping
    until the pointer is at least the on-disk max makes the advance
    race-free (pointer value only ever increases across iterations;
    rolling forward to an unpublished-but-linked snapshot is safe —
    see _max_snapshot_on_disk)."""
    while True:
        mx = _max_snapshot_on_disk(root)
        cur = current_snapshot_id(root)
        if mx is None or (cur is not None and cur >= mx):
            return cur if cur is not None else 0
        _sink.atomic_write_json(os.path.join(root, "CURRENT"),
                                {"snapshot": mx})


def read_snapshot(root: str, snapshot: int | None = None, *,
                  ref: str | None = None) -> dict:
    if ref is not None:
        if snapshot is not None:
            raise ValueError("pass snapshot or ref, not both")
        snapshot = resolve_ref(root, ref)
    n = snapshot if snapshot is not None else current_snapshot_id(root)
    if n is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    with open(_snap_path(root, n)) as f:
        return json.load(f)


def commit_snapshot(root: str, tables: dict[str, tuple[str, int]], *,
                    note: str = "") -> int:
    """Atomically publish a new snapshot pinning ``{name: (table_root,
    version)}``. Tables absent from ``tables`` carry forward from the
    parent snapshot (partial updates compose).

    Concurrent committers are safe: the snapshot file is claimed with
    ``os.link`` (fails with EEXIST instead of clobbering — unlike
    rename-over-file); the loser re-reads the NEW parent and retries, so
    both writers' pins land, serialized (optimistic concurrency, ≙ an
    Iceberg catalog's compare-and-swap)."""
    import uuid

    os.makedirs(root, exist_ok=True)
    while True:
        # Rebase on the max snapshot ON DISK, not CURRENT alone: if a
        # prior winner crashed after linking snap_N but before writing
        # CURRENT, deriving from CURRENT would recompute the same N and
        # busy-spin on FileExistsError forever. The linked file is
        # complete (fsynced before the link), so its pins roll forward.
        cur = current_snapshot_id(root)
        mx = _max_snapshot_on_disk(root)
        parent = mx if mx is not None else cur
        merged: dict[str, dict] = {}
        if parent is not None:
            merged.update(read_snapshot(root, parent)["tables"])
        for name, (troot, version) in tables.items():
            merged[name] = {"root": os.path.abspath(troot),
                            "version": int(version)}
        n = 1 if parent is None else parent + 1
        snap = {"snapshot": n, "parent": parent, "tables": merged,
                "note": note, "ts": time.time()}
        tmp = _snap_path(root, n) + f".{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, _snap_path(root, n))   # exclusive claim
        except FileExistsError:
            os.unlink(tmp)                      # lost the race: rebase
            continue
        os.unlink(tmp)
        # publish: forward-only with post-write re-verify (TOCTOU-safe)
        _advance_current(root)
        return n


def read_table(root: str, name: str, *, snapshot: int | None = None,
               ref: str | None = None):
    """Open one table AT THE SNAPSHOT-PINNED VERSION (never the table
    root's own CURRENT — that may already be ahead of the snapshot).
    ``ref`` resolves a named tag/branch instead of an explicit id."""
    entry = read_snapshot(root, snapshot, ref=ref)["tables"][name]
    return _sink.read_state(entry["root"], entry["version"])


def pinned_versions(root: str, *, keep_last: int = 2
                    ) -> dict[str, set[int]]:
    """Versions still referenced by the newest ``keep_last`` snapshots —
    the set a table-level gc_versions must NOT expire. Feed each table's
    pins into gc decisions when tables are catalog-managed."""
    cur = current_snapshot_id(root)
    if cur is None:
        return {}
    keep = set(range(max(1, cur - keep_last + 1), cur + 1))
    # named refs protect their snapshots regardless of age: a tagged
    # audit state or a lagging "prod" branch must survive gc
    keep.update(int(r["snapshot"]) for r in list_refs(root).values())
    out: dict[str, set[int]] = {}
    for n in sorted(keep):
        p = _snap_path(root, n)
        if not os.path.exists(p):
            continue
        for name, e in read_snapshot(root, n)["tables"].items():
            out.setdefault(e["root"], set()).add(e["version"])
    return out


# ---------------------------------------------------------------------------
# Named refs: tags (immutable) + branches (movable pointers).
# ---------------------------------------------------------------------------
# ≙ Iceberg table refs / Nessie named references, scoped to this
# catalog's single LINEAR snapshot chain: commit_snapshot always
# extends the one chain; a ref NAMES a position on it. That covers the
# serving patterns ("prod" pinned at the last validated snapshot while
# ingest advances CURRENT; "nightly-2026-08-19" tags an auditable
# state) without divergent-history merge semantics, which are out of
# scope and documented as such.

def _ref_path(root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"bad ref name {name!r}")
    return os.path.join(root, "refs", f"{name}.json")


def create_tag(root: str, name: str, *,
               snapshot: int | None = None) -> int:
    """Immutable named pointer. Creation is exclusive (os.link claim):
    re-tagging an existing name raises instead of silently moving —
    delete_ref first if you really mean it."""
    import uuid
    n = snapshot if snapshot is not None else current_snapshot_id(root)
    if n is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    read_snapshot(root, n)                  # must exist
    p = _ref_path(root, name)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    tmp = f"{p}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as f:
        json.dump({"type": "tag", "snapshot": n, "ts": time.time()}, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, p)
    except FileExistsError:
        raise FileExistsError(f"ref {name!r} already exists") from None
    finally:
        os.unlink(tmp)
    return n


def create_branch(root: str, name: str, *,
                  snapshot: int | None = None) -> int:
    """Movable named pointer, created at ``snapshot`` (default: the
    current one). Move it with advance_branch."""
    n = snapshot if snapshot is not None else current_snapshot_id(root)
    if n is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    read_snapshot(root, n)
    p = _ref_path(root, name)
    if os.path.exists(p):
        raise FileExistsError(f"ref {name!r} already exists")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    _sink.atomic_write_json(p, {"type": "branch", "snapshot": n,
                                "ts": time.time()})
    return n


def advance_branch(root: str, name: str, snapshot: int, *,
                   expect: int | None = None) -> None:
    """Move a branch to ``snapshot``. Tags refuse. With ``expect``,
    compare-and-swap: raises if the branch moved since you read it —
    the optimistic-concurrency handshake for promotion pipelines
    (validate snapshot N, then advance prod N-1 -> N iff still N-1)."""
    ref = _read_ref(root, name)
    if ref["type"] != "branch":
        raise ValueError(f"ref {name!r} is a tag (immutable)")
    if expect is not None and ref["snapshot"] != expect:
        raise RuntimeError(
            f"branch {name!r} moved: at {ref['snapshot']}, "
            f"expected {expect}")
    read_snapshot(root, snapshot)           # must exist
    _sink.atomic_write_json(_ref_path(root, name),
                            {"type": "branch", "snapshot": int(snapshot),
                             "ts": time.time()})


def _read_ref(root: str, name: str) -> dict:
    p = _ref_path(root, name)
    if not os.path.exists(p):
        raise FileNotFoundError(f"no ref {name!r} under {root}")
    with open(p) as f:
        return json.load(f)


def resolve_ref(root: str, name: str) -> int:
    return int(_read_ref(root, name)["snapshot"])


def delete_ref(root: str, name: str) -> None:
    os.unlink(_ref_path(root, name))


def list_refs(root: str) -> dict[str, dict]:
    d = os.path.join(root, "refs")
    if not os.path.isdir(d):
        return {}
    out = {}
    for fn in sorted(os.listdir(d)):
        if fn.endswith(".json"):
            with open(os.path.join(d, fn)) as f:
                out[fn[:-5]] = json.load(f)
    return out


class _Tx:
    def __init__(self, root: str, note: str):
        self.root, self.note = root, note
        self._pins: dict[str, tuple[str, int]] = {}

    def pin(self, name: str, table_root: str, version: int) -> None:
        self._pins[name] = (table_root, version)


class transaction:
    """Context manager: per-table commits inside the block stay
    invisible to catalog readers until the block exits cleanly, at
    which point ONE snapshot pins them all. On exception nothing is
    published (the table commits remain durable; the retried
    transaction's watermark filters no-op them — exactly-once)."""

    def __init__(self, root: str, *, note: str = ""):
        self._tx = _Tx(root, note)

    def __enter__(self) -> _Tx:
        return self._tx

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None and self._tx._pins:
            commit_snapshot(self._tx.root, self._tx._pins,
                            note=self._tx.note)
        return False
