"""Exactly-once Parquet state sink: staged writes, manifests, checkpoints.

≙ Table Output's transactional commit (tableoutput/TableOutput.java batch
commit) re-expressed for a lake: there is no transactional layer over
plain Parquet, so exactly-once is built from

  1. staged directory writes (write to a writer-unique ``_stage_vN.<id>``
     dir, fsync-free atomic ``rename`` to ``vN`` — a crashed writer leaves
     only garbage stages, and concurrent writers can never touch each
     other's stage),
  2. a JSON manifest per committed version: high-watermark commit offset,
     schema, per-file lineage (rows/bytes), metrics,
  3. a CURRENT pointer file updated by atomic rename,
  4. idempotent replay: ``apply_incremental`` filters incoming events to
     ``commit_seq > watermark``, so re-applied batches are harmless.

Layout:
  root/
    CURRENT            -> {"version": N}
    v0001/ *.parquet
    v0001/manifest.json

Scale note: version dirs reuse unchanged files via HARDLINKS — the
local-filesystem materialization of what a manifest-pointer table format
(Iceberg/Delta) does by listing shared data files in metadata. On an
object store (no hardlinks) the same design ports by making the manifest
the authority: a version's file list references absolute object keys and
"hardlink forward" becomes "repeat the key in the new manifest" — an
O(files-listed) metadata write, no data movement, exactly like here. All
read paths (read_state, read_changes, lookup_state, IVM) consume file
LISTS, so they are already manifest-shaped.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from kettleray.ops import cdc


@dataclass
class Manifest:
    version: int
    watermark: int                      # max commit_seq applied (incl. deletes)
    schema: str
    files: list[dict] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, default=str)

    @staticmethod
    def from_json(s: str) -> "Manifest":
        return Manifest(**json.loads(s))


def _version_dir(root: str, v: int) -> str:
    return os.path.join(root, f"v{v:04d}")


def atomic_write_json(path: str, payload: dict) -> None:
    """Write a small JSON pointer/snapshot file durably: tmp + flush +
    fsync + rename (rename alone does not guarantee CONTENT hit disk).
    The tmp name is UNIQUE per writer — a fixed ``path + '.tmp'`` made
    concurrent pointer writers collide (one renames the tmp the other
    is still writing, or crashes on the rename after the other's rename
    already consumed it; caught by the catalog contention stress)."""
    tmp = f"{path}.{uuid.uuid4().hex[:12]}.tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


# zone-map stats: JSON-safe scalar types eligible for manifest min/max
# entries (strings capped — a multi-KB `content` value must not bloat the
# manifest, and a truncated upper bound would be unsound).
_STATS_MAX_STR = 64


def _json_stat(v) -> "int | float | str | bool | None":
    if v is None or isinstance(v, (int, float, bool)):
        return v
    if isinstance(v, bytes):
        try:
            v = v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, str):
        return v
    return None


def _file_stats(md: "pq.FileMetaData") -> dict:
    """Per-column [min, max] across all row groups from the parquet
    footer (metadata-only — no data pages read). A bound is dropped
    (null) when any row group lacks stats for the column, when the type
    isn't JSON-scalar, or when a string bound exceeds the manifest cap
    (a truncated min stays a valid lower bound; a truncated max would be
    UNSOUND, so long-string columns simply become unprunable). Null
    presence never blocks pruning: a null row can't satisfy any
    comparison predicate, so [min, max] over non-null values is exactly
    the envelope pruning needs."""
    mins: dict = {}
    maxs: dict = {}
    dead: set = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            cc = g.column(i)
            name = cc.path_in_schema
            if name in dead or "." in name:      # skip nested leaves
                continue
            st = cc.statistics
            if st is None or not st.has_min_max:
                dead.add(name)
                continue
            lo, hi = _json_stat(st.min), _json_stat(st.max)
            if lo is None or hi is None:
                dead.add(name)
                continue
            if isinstance(lo, str) and len(lo) > _STATS_MAX_STR:
                lo = lo[:_STATS_MAX_STR]        # still a lower bound
            if isinstance(hi, str) and len(hi) > _STATS_MAX_STR:
                dead.add(name)                  # no sound truncation up
                continue
            if name not in mins:
                mins[name], maxs[name] = lo, hi
            else:
                mins[name] = min(mins[name], lo)
                maxs[name] = max(maxs[name], hi)
    return {n: [mins[n], maxs[n]] for n in mins if n not in dead}


def _stage_lineage(stage: str) -> list[dict]:
    """Per-file lineage entries (rel path, rows, bytes, zone-map stats)
    of a staged version dir — the manifest's files list. Stats come from
    the parquet FOOTERS the writer already produced (metadata-only
    reads), so lineage cost stays proportional to the files this commit
    touched, not to their bytes."""
    out = []
    for fp in _parquet_files(stage):
        md = pq.read_metadata(fp)
        out.append({"file": os.path.relpath(fp, stage),
                    "rows": md.num_rows, "bytes": os.path.getsize(fp),
                    "stats": _file_stats(md)})
    return out


def current_version(root: str) -> int | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)["version"]


def read_manifest(root: str, version: int | None = None) -> Manifest | None:
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    with open(os.path.join(_version_dir(root, v), "manifest.json")) as f:
        return Manifest.from_json(f.read())


def _next_version(root: str) -> int:
    """Next free version slot = max(existing version dirs, CURRENT) + 1.

    Allocating from CURRENT alone bricks the sink after a crash BETWEEN
    the stage->vN rename and the CURRENT pointer write: vN exists but
    CURRENT still names vN-1, so every retry recomputes the same N,
    collides on the rename and recurses forever (redoing the full stage
    write each level). Scanning the dirs skips the orphan — readers only
    trust CURRENT, so the orphan is invisible, and gc_versions reaps it
    once it ages past the stage window (same discipline as
    ops.incdedup._next_version / gc_lsh)."""
    vs = [int(n[1:]) for n in os.listdir(root)
          if n.startswith("v") and n[1:].isdigit()] \
        if os.path.isdir(root) else []
    cur = current_version(root)
    if cur is not None:
        vs.append(cur)
    return (max(vs) + 1) if vs else 1


def _check_layout_stable(man: "Manifest | None", num_buckets: int,
                         bucket_cols: tuple) -> None:
    """The bucketed layouts rely on every commit using the SAME bucket
    function: changing num_buckets or bucket_cols mid-table would make
    touched-bucket discovery (COW) and the co-partitioned read merge
    (MOR) silently wrong. Fail loudly instead."""
    if man is None:
        return
    snb = man.metrics.get("num_buckets")
    if snb is not None and int(snb) != int(num_buckets):
        raise ValueError(
            f"state was committed with num_buckets={snb}; re-bucketing to "
            f"{num_buckets} requires a full rewrite (read_state + fresh "
            f"root), not an incremental commit")
    sbc = man.metrics.get("bucket_cols")
    if sbc is not None and tuple(sbc) != tuple(bucket_cols):
        raise ValueError(
            f"state was committed with bucket_cols={tuple(sbc)}; "
            f"got {tuple(bucket_cols)}")
    if man.metrics.get("num_buckets") is None:
        # non-bucketed version (plain apply_incremental / commit_state):
        # a bucketed writer would hardlink only bucket= dirs and silently
        # DROP any flat data files. An all-empty flat version (the
        # documented empty first commit) is safe to build on.
        flat_rows = sum(f["rows"] for f in man.files
                        if os.sep not in f["file"] and "/" not in f["file"])
        if flat_rows:
            raise ValueError(
                "current version holds non-bucketed data files; bucketed "
                "incremental writers would drop them — rewrite via "
                "rebucket_state (or keep using apply_incremental)")


def _fresh_stats(fresh: "ray.data.Dataset",
                 ) -> tuple[int, int | None, set[int]]:
    """(row count, max commit_seq, touched bucket set) of a materialized
    fresh-event dataset in ONE map-only pass — per-block partials pulled
    to the driver are ≤(1 row + num_buckets ints) per block. The naive
    alternative (`fresh.count()` + `fresh.max()` + a touched-bucket scan)
    costs three driver jobs per micro-commit, one with a hash-aggregate
    actor pool — fixed latency that dominates trickle commits."""
    import pyarrow.compute as pc

    def _s(t: pa.Table) -> pa.Table:
        mx = pc.max(t["commit_seq"]).as_py() if t.num_rows else None
        bk = (pc.unique(t["bucket"]).to_pylist()
              if "bucket" in t.column_names else [])
        return pa.table({
            "n": pa.array([t.num_rows], type=pa.int64()),
            "mx": pa.array([mx], type=pa.int64()),
            "buckets": pa.array([bk], type=pa.list_(pa.int64()))})

    rows = fresh.map_batches(_s, batch_format="pyarrow", batch_size=None,
                             zero_copy_batch=True).take_all()
    total = sum(r["n"] for r in rows)
    seqs = [r["mx"] for r in rows if r["mx"] is not None]
    touched = {b for r in rows for b in (r["buckets"] or [])}
    return total, (max(seqs) if seqs else None), touched


def _state_rows_as_events(b: pa.Table) -> pa.Table:
    """Re-shape committed state rows as pseudo insert events so they can
    union with a fresh event batch ahead of an LWW replay."""
    b = b.drop_columns([c for c in ("content_sha256", "bucket")
                        if c in b.column_names])
    b = b.rename_columns([c if c != "last_commit_seq" else "commit_seq"
                          for c in b.column_names])
    return b.append_column("op", pa.array(["insert"] * b.num_rows))


def _read_pruned(f: str, want: "list[str] | None") -> pa.Table:
    """pq.read_table with the wanted columns intersected against the
    file's actual schema (schema evolution: older files may lack some)."""
    if want is None:
        return pq.read_table(f)
    names = pq.read_schema(f).names
    return pq.read_table(f, columns=[c for c in want if c in names])


def merged_bucket_state(base_files: list[str],
                        delta_files: list[str], *,
                        columns: "list[str] | None" = None,
                        with_sha: bool = True,
                        colmap: "dict | None" = None) -> pa.Table:
    """One bucket's merged state rows: base rows LWW-merged with its
    delta events (merge-on-read), tombstone winners dropped. Runs inside
    a task — base and deltas are co-partitioned by the bucket function,
    so no key ever needs another bucket's files. With no deltas the base
    is returned as-is (bucket column included, if stored).

    Stored ``content_sha256`` digests are CARRIED through the merge;
    only winners arriving from deltas (no stored digest) are hashed —
    re-hashing every base row's content on every read would put
    table-sized CPU on the hot read path. ``columns`` prunes the file
    reads to (keys + seq + op + columns) for aggregate-only consumers
    (pair with ``with_sha=False``)."""
    want_base = want_delta = None
    if columns is not None:
        # pruned reads must accept any PHYSICAL alias a logical column
        # carries in pre-rename files (column mapping)
        cols_phys = [a for c in columns
                     for a in sorted(physical_aliases(colmap, c))]
        want_base = list(dict.fromkeys(
            [*cdc.KEY_COLS, "last_commit_seq", *cols_phys]))
        want_delta = list(dict.fromkeys(
            [*cdc.KEY_COLS, cdc.SEQ_COL, "op", *cols_phys]))
    base_t = pa.concat_tables(
        [apply_column_mapping(_read_pruned(f, want_base), colmap)
         for f in base_files],
        promote_options="permissive") if base_files else None
    if not delta_files:
        return base_t if base_t is not None else pa.table({})
    parts = []
    if base_t is not None and base_t.num_rows:
        # pseudo-events KEEPING the stored digest (unlike
        # _state_rows_as_events, whose replay consumers recompute)
        p = base_t.drop_columns([c for c in ("bucket",)
                                 if c in base_t.column_names])
        p = p.rename_columns(
            [c if c != "last_commit_seq" else cdc.SEQ_COL
             for c in p.column_names])
        parts.append(p.append_column(
            "op", pa.array(["insert"] * p.num_rows)))
    for f in delta_files:
        dt = apply_column_mapping(_read_pruned(f, want_delta), colmap)
        if "bucket" in dt.column_names:
            dt = dt.drop_columns(["bucket"])
        parts.append(dt)
    merged = pa.concat_tables(parts, promote_options="permissive")
    win = cdc.finalize_state_table(cdc.lww_reduce_table(merged),
                                   with_sha=False)
    if with_sha:
        win = cdc.fill_missing_sha(win)
    return win


def _parquet_files(vdir: str) -> list[str]:
    out = []
    for base, _, names in os.walk(vdir):
        for n in sorted(names):
            if n.endswith(".parquet"):
                out.append(os.path.join(base, n))
    return sorted(out)


def _split_base_delta(vdir: str) -> tuple[list[str], list[str]]:
    """Partition a version dir's parquet files into (base, delta): delta
    files live under the ``delta/`` subtree (merge-on-read layout)."""
    delta_root = os.path.join(vdir, "delta")
    base, delta = [], []
    for f in _parquet_files(vdir):
        (delta if f.startswith(delta_root + os.sep) else base).append(f)
    return base, delta


def _bucket_file_groups(vdir: str) -> "dict[str, dict[str, list[str]]]":
    """{bucket_dir_name: {"base": [...], "delta": [...]}} for a version
    dir (shared by read_changes' identity pruning and the join-view's
    touched-bucket discovery)."""
    out: dict[str, dict[str, list[str]]] = {}
    base, delta = _split_base_delta(vdir)
    for f in base:
        name = os.path.basename(os.path.dirname(f))
        out.setdefault(name, {"base": [], "delta": []})["base"].append(f)
    for f in delta:
        name = os.path.basename(os.path.dirname(f))
        out.setdefault(name, {"base": [], "delta": []})["delta"].append(f)
    return out


def _bucket_identity(g: "dict[str, list[str]] | None") -> list[tuple]:
    """Inode-level identity of one bucket's files — equal identity means
    the bucket's bytes are untouched between versions (COW hardlinks),
    so it can be pruned without opening a file."""
    if g is None:
        return []
    out = []
    for kind in ("base", "delta"):
        for f in g[kind]:
            st = os.stat(f)
            out.append((kind, os.path.basename(f), st.st_dev, st.st_ino))
    return sorted(out)


def changed_bucket_names(root: str, from_version: int,
                         to_version: int) -> "set[str] | None":
    """Bucket dir names whose file identity differs between two
    committed versions (metadata-only: stat/inode comparison, no file
    opened). Returns ``None`` when the bucket LAYOUT changed between
    the versions (rebucket boundary) — names no longer correspond and
    the caller must fall back to a full resync."""
    def _layout(m: "Manifest | None"):
        return ((m.metrics.get("num_buckets"),
                 tuple(m.metrics.get("bucket_cols", ("repo", "path"))))
                if m else None)

    if _layout(read_manifest(root, from_version)) != \
            _layout(read_manifest(root, to_version)):
        return None
    g1 = _bucket_file_groups(_version_dir(root, from_version))
    g2 = _bucket_file_groups(_version_dir(root, to_version))
    return {name for name in set(g1) | set(g2)
            if _bucket_identity(g1.get(name))
            != _bucket_identity(g2.get(name))}


def state_schema(root: str, version: int | None = None) -> pa.Schema:
    """The unified FINAL-STATE schema of a committed version, computed
    from parquet footers only (no data read): per-bucket base schemas
    may legitimately differ after schema-evolving commits, and MOR
    deltas may carry evolved columns — unify across all of them, the
    same way read_state builds its merge target."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    vdir = _version_dir(root, v)
    base_files, delta_files = _split_base_delta(vdir)
    groups = _bucket_file_groups(vdir)
    ev_schemas = []
    for g in groups.values():
        if g["base"]:
            ev_schemas.append(_state_rows_as_events(
                pq.read_schema(g["base"][0]).empty_table()).schema)
    for f in delta_files[:1]:
        dsch = pq.read_schema(f)
        if dsch.get_field_index("bucket") >= 0:
            dsch = dsch.remove(dsch.get_field_index("bucket"))
        ev_schemas.append(dsch)
    if not ev_schemas and base_files:
        # flat (non-bucketed) layout
        ev_schemas.append(_state_rows_as_events(
            pq.read_schema(base_files[0]).empty_table()).schema)
    if not ev_schemas:
        raise FileNotFoundError(f"version {v} under {root} has no files")
    cm = read_column_mapping(root)
    if cm:
        # physical file schemas may predate a rename — unify in LOGICAL
        # space or a renamed column would appear twice
        ev_schemas = [apply_column_mapping(s.empty_table(), cm).schema
                      for s in ev_schemas]
    from kettleray.ops.cdc import unify_event_schemas
    target_ev = unify_event_schemas(ev_schemas)
    return cdc.finalize_state_table(target_ev.empty_table()).schema


# ---------------------------------------------------------------------------
# Column mapping: metadata-only RENAME / DROP (≙ Delta column mapping /
# Iceberg schema evolution beyond add+widen; Kettle expresses renames as
# Select Values, engine/.../steps/selectvalues — here they are TABLE
# metadata so 100 TB of committed files never rewrite).
# ---------------------------------------------------------------------------

# columns the engine itself addresses by name: keys (bucket routing,
# blooms), LWW ordering + tie-break, op routing, the sha invariant and
# its source. Renaming/dropping any of these would corrupt merge
# semantics, so alter refuses.
_PROTECTED_COLS = frozenset(("repo", "path", "commit", "op", "bucket",
                             "commit_seq", "last_commit_seq",
                             "content", "content_sha256"))


def read_column_mapping(root: str) -> "dict | None":
    """The table's column mapping — {"renames": [[old, new], ...],
    "dropped": [...]} — or None. A root-level pointer file (like
    CURRENT), NOT per-version manifest state: committers never need to
    carry it forward, and GC of the version that performed the alter
    cannot lose it. One tiny JSON read; callers cache per operation."""
    p = os.path.join(root, "COLUMNS")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def apply_column_mapping(t: pa.Table, cm: "dict | None") -> pa.Table:
    """Present a physical table in logical column space. CONDITIONAL on
    purpose: files written before a rename carry the old name, files
    written after carry the new one — each rename applies only where
    its old name exists and its new name doesn't, so any mix of file
    generations logicalizes to the same schema. Drops are stored in
    logical (post-rename) space and applied after."""
    if not cm:
        return t
    names = list(t.column_names)
    for old, new in cm.get("renames", ()):
        if old in names and new not in names:
            names[names.index(old)] = new
    if names != t.column_names:
        t = t.rename_columns(names)
    drops = [c for c in cm.get("dropped", ()) if c in t.column_names]
    return t.drop_columns(drops) if drops else t


def physical_aliases(cm: "dict | None", col: str) -> "set[str]":
    """Every physical name a logical column may carry on disk (the
    rename chain closed transitively) — zone-map lookups and pruned
    column reads must accept any of them."""
    out = {col}
    if cm:
        changed = True
        while changed:
            changed = False
            for old, new in cm.get("renames", ()):
                if new in out and old not in out:
                    out.add(old)
                    changed = True
    return out


def _read_files_logical(files: list[str], cm: "dict",
                        with_bucket: bool = True) -> "ray.data.Dataset":
    """Per-file read tasks that logicalize BEFORE any cross-file concat.
    A fused multi-file read task may unify a renamed column under BOTH
    its old and new names (null-filled halves), which the conditional
    mapping cannot repair — so under an active mapping each file maps
    individually. ``with_bucket`` re-adds the hive partition column the
    plain ``read_parquet`` path would have inferred."""
    items = [{"f": f} for f in files]

    def _rd(t: pa.Table) -> pa.Table:
        tabs = []
        for f in t["f"].to_pylist():
            ft = apply_column_mapping(pq.read_table(f), cm)
            bname = os.path.basename(os.path.dirname(f))
            if with_bucket and bname.startswith("bucket=") \
                    and "bucket" not in ft.column_names:
                ft = ft.append_column("bucket", pa.array(
                    [bname.split("=", 1)[1]] * ft.num_rows,
                    type=pa.string()))
            tabs.append(ft)
        return pa.concat_tables(tabs, promote_options="permissive")

    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
        _rd, batch_format="pyarrow", batch_size=None)


def alter_table_columns(root: str, *, rename: "dict[str, str] | None" =
                        None, drop: "list | tuple | None" = None) -> dict:
    """Metadata-only column RENAME / DROP: appends to the table's
    mapping pointer — zero data files touched, O(1) at any table size.
    Readers logicalize lazily; files rewritten later (compaction,
    clustering, rebucket, incremental merges of touched buckets)
    naturally carry logical names, and the conditional application
    makes retained old files and already-rewritten ones coexist.

    Renames/drops resolve against the CURRENT logical schema; engine
    columns (:data:`_PROTECTED_COLS`) are refused, as is renaming onto
    a live or previously-used name (old physical names must stay
    unambiguous for the conditional application to be sound)."""
    rename = dict(rename or {})
    drop = list(drop or ())
    if not rename and not drop:
        raise ValueError("alter_table_columns: nothing to do")
    live = set(state_schema(root).names) - {"bucket"}
    cm = read_column_mapping(root) or {"renames": [], "dropped": []}
    used = ({o for o, _ in cm["renames"]} | {n for _, n in cm["renames"]}
            | set(cm["dropped"]))
    for old, new in rename.items():
        if old in _PROTECTED_COLS or new in _PROTECTED_COLS:
            raise ValueError(f"cannot rename engine column {old!r}->"
                             f"{new!r} (protected: sorted set of "
                             f"{sorted(_PROTECTED_COLS)})")
        if old not in live:
            raise ValueError(f"rename source {old!r} is not a live "
                             f"column (have {sorted(live)})")
        if new in live or new in used or new in rename:
            raise ValueError(f"rename target {new!r} collides with a "
                             "live or previously-used column name")
    for c in drop:
        if c in _PROTECTED_COLS:
            raise ValueError(f"cannot drop engine column {c!r}")
        eff = rename.get(c, c)
        if eff not in (live - set(rename)) | set(rename.values()):
            raise ValueError(f"drop target {c!r} is not a live column")
    cm["renames"].extend([o, n] for o, n in rename.items())
    cm["dropped"].extend(rename.get(c, c) for c in drop
                         if rename.get(c, c) not in cm["dropped"])
    atomic_write_json(os.path.join(root, "COLUMNS"), cm)
    return cm


def read_state(root: str, version: int | None = None, *,
               num_partitions: int = 16) -> "ray.data.Dataset | None":
    """Read a committed state version (default CURRENT). Passing an older
    retained ``version`` is snapshot time travel over the SINK layout —
    every version is immutable (copy-on-write buckets / append-only
    deltas), so old reads are consistent even while new commits land.

    Transparent over both layouts: a version holding merge-on-read delta
    files (``apply_incremental_mor``) is merged at read via the same
    distributed LWW replay the writer would have run — callers see final
    state rows either way."""
    v = version if version is not None else current_version(root)
    if v is None:
        return None
    vdir = _version_dir(root, v)
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {v} not found under {root} (GC'd or never committed)")
    base_files, delta_files = _split_base_delta(vdir)
    cm = read_column_mapping(root)
    if not delta_files:
        files = _parquet_files(vdir)
        if cm and files:
            return _read_files_logical(files, cm)
        return ray.data.read_parquet(files)
    return _mor_merge_ds(base_files, delta_files, colmap=cm)


def _mor_merge_ds(base_files: list[str],
                  delta_files: list[str], *,
                  colmap: "dict | None" = None) -> "ray.data.Dataset":
    # Merge-on-read: base and deltas were BUCKETED BY THE SAME KEY
    # FUNCTION (the writers enforce num_buckets/bucket_cols stability),
    # so every key's base row and delta events live in ONE bucket — the
    # merge is a zero-shuffle per-bucket map task, never an all-to-all
    # exchange. num_partitions is unused here (kept for signature
    # stability); parallelism = one task per bucket.
    def _bname(f: str) -> str:
        return os.path.basename(os.path.dirname(f))

    groups: dict[str, dict] = {}
    for f in base_files:
        # skip flat files (e.g. the 0-row empty-first-commit parquet at
        # the version root — the layout guard keeps flat files rowless)
        if not _bname(f).startswith("bucket="):
            continue
        groups.setdefault(_bname(f), {"base": [], "delta": []})[
            "base"].append(f)
    for f in delta_files:
        groups.setdefault(_bname(f), {"base": [], "delta": []})[
            "delta"].append(f)
    items = [{"bucket": int(name.split("=", 1)[1]),
              "base": g["base"], "delta": g["delta"]}
             for name, g in sorted(groups.items())]

    # one state-target schema across all tasks (delta-holding buckets
    # gain evolved columns; delta-free buckets must null-backfill them).
    # Sampled one file PER BUCKET: after a schema-evolving compaction,
    # rewritten and hardlinked-through buckets legitimately differ —
    # sampling a single file would silently drop the evolved columns.
    ev_schemas = []
    for g in groups.values():
        if g["base"]:
            ev_schemas.append(_state_rows_as_events(apply_column_mapping(
                pq.read_schema(g["base"][0]).empty_table(),
                colmap)).schema)
    dsch = pq.read_schema(delta_files[0])
    if dsch.get_field_index("bucket") >= 0:
        dsch = dsch.remove(dsch.get_field_index("bucket"))
    dsch = apply_column_mapping(dsch.empty_table(), colmap).schema
    ev_schemas.append(dsch)
    from kettleray.ops.cdc import unify_event_schemas
    target_ev = unify_event_schemas(ev_schemas)
    # bucket rides as STRING to match the hive-path inference the plain
    # (delta-free) read path produces — identical reader schema per layout
    state_sch = cdc.finalize_state_table(
        target_ev.empty_table()).schema.append(
        pa.field("bucket", pa.string()))

    def _merge_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for i in range(t.num_rows):
            bkt = t["bucket"][i].as_py()
            bf = t["base"][i].as_py()
            df = t["delta"][i].as_py()
            win = merged_bucket_state(bf, df, colmap=colmap)
            if "bucket" not in win.column_names:
                win = win.append_column(
                    "bucket",
                    pa.array([str(bkt)] * win.num_rows, type=pa.string()))
            outs.append(cdc.conform_table(win, state_sch))
        return pa.concat_tables(outs) if outs \
            else state_sch.empty_table()

    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
        _merge_bucket, batch_format="pyarrow", batch_size=None)


def lookup_state(root: str, repo: str, path: str, *,
                 version: int | None = None, use_blooms: bool = True,
                 report: "dict | None" = None) -> pa.Table:
    """Point lookup on the bucketed state: route the key to its bucket
    (same crc32 routing the writer used) and scan ONLY that bucket's
    files with a parquet predicate — O(one bucket), not O(table). This is
    the read side of a CDC-ingested serving table; no Ray tasks needed
    for a single key.

    With ``use_blooms`` (default), files whose key-Bloom sidecar
    (:mod:`kettleray.io.blooms`, built by ``build_key_blooms``) proves
    the key absent are skipped — base and delta alike; a bloom skip is
    a proof of absence, so the MOR merge result is unchanged. Files
    without a sidecar are always read. ``report`` (optional dict) gets
    ``files_bloom_probed`` / ``files_bloom_skipped``."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    nb = man.metrics.get("num_buckets") if man else None
    vdir = _version_dir(root, v)
    delta_files: list[str] = []
    if nb is None:
        # non-bucketed layout: predicate scan over all files
        files = _parquet_files(vdir)
    else:
        key = pa.table({"repo": pa.array([repo]), "path": pa.array([path])})
        b = int(cdc.stable_key_buckets(key, ("repo", "path"), int(nb))[0])
        bdir = os.path.join(vdir, f"bucket={b}")
        files = _parquet_files(bdir) if os.path.isdir(bdir) else []
        ddir = os.path.join(vdir, "delta", f"bucket={b}")
        delta_files = _parquet_files(ddir) if os.path.isdir(ddir) else []
    if use_blooms:
        from kettleray.io import blooms as _blooms
        kv = {"repo": repo, "path": path}
        files = _blooms.filter_files_by_key(files, kv, report)
        delta_files = _blooms.filter_files_by_key(delta_files, kv, report)
    import pyarrow.dataset as pads
    cm = read_column_mapping(root)
    flt = (pads.field("repo") == repo) & (pads.field("path") == path)
    if files:
        if cm:
            # per-file under an active column mapping (mixed-generation
            # schemas must logicalize before concat)
            base_t = pa.concat_tables(
                [apply_column_mapping(
                    pads.dataset(f).to_table(filter=flt), cm)
                 for f in files], promote_options="permissive")
        else:
            base_t = pads.dataset(files).to_table(filter=flt)
    else:
        # empty-bucket miss: return an EMPTY table with the same state
        # schema a hit would have (callers index expected columns on
        # both paths) — borrow the schema from any committed BASE file
        # of this version rather than a schema-less pa.table({})
        other_base, other_delta = _split_base_delta(vdir)
        if other_base:
            base_t = apply_column_mapping(
                pq.read_schema(other_base[0]).empty_table(), cm)
        elif other_delta and not delta_files:
            # delta-only version: synthesize the final-state schema the
            # merge path below would produce
            base_t = cdc.finalize_state_table(cdc.lww_reduce_table(
                apply_column_mapping(
                    pq.read_schema(other_delta[0]).empty_table(), cm)))
        else:
            base_t = pa.table({})
    if not delta_files:
        return base_t
    if cm:
        delta_t = pa.concat_tables(
            [apply_column_mapping(pads.dataset(f).to_table(filter=flt),
                                  cm) for f in delta_files],
            promote_options="permissive")
    else:
        delta_t = pads.dataset(delta_files).to_table(filter=flt)
    return _merge_point(base_t, delta_t)


def _merge_point(base_t: pa.Table, delta_t: pa.Table) -> pa.Table:
    """Merge-on-read for a point lookup: fold one key's delta events
    over its base row locally (a handful of rows — no Ray tasks). No
    bucket column on purpose: raw-file point reads don't infer the hive
    partition either, so both layouts return the same schema."""
    if "bucket" in delta_t.column_names:
        delta_t = delta_t.drop_columns(["bucket"])
    ev = [delta_t]
    if base_t.num_rows:
        ev.append(_state_rows_as_events(
            base_t.drop_columns([c for c in ("bucket",)
                                 if c in base_t.column_names])))
    merged = pa.concat_tables(ev, promote_options="permissive")
    return cdc.finalize_state_table(cdc.lww_reduce_table(merged))


class StateReader:
    """Cached serving handle over ONE committed state version — the
    point-lookup hot path for a CDC-maintained serving table (≙ the
    reader side of Kettle's Dimension Lookup, steps/dimensionlookup,
    but against the lake instead of a DB).

    ``lookup_state`` re-reads the manifest and rebuilds parquet dataset
    objects on every call (~7 ms fixed overhead at any table size);
    this class resolves version, manifest, bucket routing, per-bucket
    file lists, per-file dataset handles and IN-MEMORY Bloom sidecars
    once, so a repeated lookup costs a few numpy bit tests plus ONE
    cached single-file predicate read (~1 ms, 100 TB or not — the
    bucket count and file sizes are bounded by compaction, not by
    table size).

    Versions are immutable (COW commits), so the cache can never go
    stale; open a new reader to see a newer commit. Typical use: one
    reader per serving actor, refreshed on a changefeed notification.
    """

    def __init__(self, root: str, *, version: int | None = None,
                 use_blooms: bool = True):
        self.root = root
        v = version if version is not None else current_version(root)
        if v is None:
            raise FileNotFoundError(f"no committed state under {root}")
        self.version = v
        self.manifest = read_manifest(root, v)
        self.colmap = read_column_mapping(root)
        m = self.manifest.metrics if self.manifest else {}
        self.num_buckets = m.get("num_buckets")
        self.use_blooms = use_blooms
        self._vdir = _version_dir(root, v)
        self._bucket_files: dict = {}
        self._ds: dict = {}
        self._blooms: dict = {}
        self._empty: "pa.Table | None" = None

    def _files_for(self, b) -> tuple[list, list]:
        hit = self._bucket_files.get(b)
        if hit is None:
            if b is None:
                hit = (_parquet_files(self._vdir), [])
            else:
                bdir = os.path.join(self._vdir, f"bucket={b}")
                ddir = os.path.join(self._vdir, "delta", f"bucket={b}")
                hit = (_parquet_files(bdir) if os.path.isdir(bdir) else [],
                       _parquet_files(ddir) if os.path.isdir(ddir) else [])
            self._bucket_files[b] = hit
        return hit

    def _kept(self, files: list, kv: dict, report) -> list:
        if not self.use_blooms:
            return files
        from kettleray.io import blooms as _blooms
        kept = []
        for f in files:
            sc = self._blooms.get(f, False)
            if sc is False:
                sc = _blooms.load_sidecar(f)
                self._blooms[f] = sc
            if sc is None or sc.might_contain(kv):
                kept.append(f)
        if report is not None:
            report["files_bloom_probed"] = report.get(
                "files_bloom_probed", 0) + len(files)
            report["files_bloom_skipped"] = report.get(
                "files_bloom_skipped", 0) + len(files) - len(kept)
        return kept

    def _read(self, files: list, flt) -> "pa.Table | None":
        import pyarrow.dataset as pads
        tabs = []
        for f in files:
            d = self._ds.get(f)
            if d is None:
                d = self._ds[f] = pads.dataset(f)
            tabs.append(apply_column_mapping(d.to_table(filter=flt),
                                             self.colmap))
        return pa.concat_tables(tabs, promote_options="permissive") \
            if tabs else None

    def _empty_table(self) -> pa.Table:
        if self._empty is None:
            self._empty = state_schema(
                self.root, self.version).empty_table()
            drop = [c for c in ("bucket",) if c in self._empty.column_names]
            if drop:
                self._empty = self._empty.drop_columns(drop)
        return self._empty

    def lookup(self, repo: str, path: str, *,
               report: "dict | None" = None) -> pa.Table:
        """Same contract and result as :func:`lookup_state` on this
        reader's pinned version."""
        import pyarrow.dataset as pads
        if self.num_buckets is None:
            b = None
        else:
            key = pa.table({"repo": pa.array([repo]),
                            "path": pa.array([path])})
            b = int(cdc.stable_key_buckets(
                key, ("repo", "path"), int(self.num_buckets))[0])
        base_files, delta_files = self._files_for(b)
        kv = {"repo": repo, "path": path}
        base_files = self._kept(base_files, kv, report)
        delta_files = self._kept(delta_files, kv, report)
        flt = (pads.field("repo") == repo) & (pads.field("path") == path)
        base_t = self._read(base_files, flt)
        if base_t is None:
            base_t = self._empty_table()
        elif "bucket" in base_t.column_names:
            base_t = base_t.drop_columns(["bucket"])
        delta_t = self._read(delta_files, flt)
        if delta_t is None:
            return base_t
        return _merge_point(base_t, delta_t)


# ---------------------------------------------------------------------------
# Zone-map pruned scans (manifest file-skipping) + clustered layout.
# ---------------------------------------------------------------------------

_PRUNE_OPS = ("==", "!=", "<", "<=", ">", ">=")


def _file_prunable(stats: "dict | None", col: str, op: str, val) -> bool:
    """True iff the manifest stats PROVE no row of the file can satisfy
    ``col op val``. Missing stats (old manifests, unstated columns,
    long-string bounds) → never prunable. Nulls in the column are
    irrelevant: a null can satisfy no comparison, so the non-null
    [min, max] envelope is sufficient evidence."""
    if not stats or col not in stats:
        return False
    lo, hi = stats[col]
    try:
        if op == "==":
            return (lo is not None and val < lo) or \
                   (hi is not None and val > hi)
        if op == "!=":
            return lo is not None and hi is not None and lo == hi == val
        if op == "<":
            return lo is not None and lo >= val
        if op == "<=":
            return lo is not None and lo > val
        if op == ">":
            return hi is not None and hi <= val
        if op == ">=":
            return hi is not None and hi < val
    except TypeError:
        return False                 # cross-type comparison: keep the file
    return False


def _residual_mask(t: pa.Table, filters) -> pa.Array:
    """AND of all filters evaluated exactly on a batch (the residual
    predicate applied after file-level pruning)."""
    import pyarrow.compute as pc
    fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
          "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}
    mask = None
    for col, op, val in filters:
        m = fn[op](t[col], val)
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def _drop_bucket(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda b: b.drop_columns(
            [c for c in ("bucket",) if c in b.column_names]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)


def scan_state(root: str, filters, *, version: int | None = None,
               columns: "list[str] | None" = None,
               use_blooms: bool = True,
               report: "dict | None" = None) -> "ray.data.Dataset":
    """Predicate scan over a committed state version with MANIFEST-LEVEL
    FILE SKIPPING (zone maps, ≙ Iceberg/Delta data skipping): base files
    whose footer [min, max] envelope provably excludes the (ANDed)
    ``filters`` are never opened. Pair with :func:`cluster_state` —
    hash-bucketed files interleave every value, so skipping only bites
    once files are range-clustered by the filter column.

    ``filters``: list of ``(col, op, literal)`` with op in
    ``==,!=,<,<=,>,>=``; all residual-checked exactly after pruning, so
    pruning is a pure optimization, never a semantics change.

    MOR safety: delta files are NEVER zone-map pruned (a delta row may
    be the LWW winner that moves a key into/out of the predicate
    range), and pruned-base buckets still merge their deltas — a base
    row whose file was pruned either cannot match (stats proof) or is
    superseded by an always-read delta row. The residual filter runs on
    MERGED rows.

    Bloom pruning (``use_blooms``): when the ANDed ``==`` filters pin
    EVERY key column a file's Bloom sidecar was built over (see
    :mod:`kettleray.io.blooms`), files whose bloom proves that exact
    key absent are skipped — base AND delta, which is sound even under
    MOR: every row that could survive the residual filter carries that
    key, and a bloom skip proves the file holds no row with it. A
    sidecar recording columns the filters don't pin keeps its file
    (unprunable, never unsound). This is the equality complement of the
    zone maps, which are blind on hash-distributed key columns.

    Output: final-state rows (no bucket column — pruning can collapse
    the hive depth, so the inferred partition column is stripped for a
    stable schema). ``report`` (optional dict) is filled with
    ``files_total / files_pruned / delta_files / rows_kept_files``.
    """
    for f in filters:
        if len(f) != 3 or f[1] not in _PRUNE_OPS:
            raise ValueError(f"bad filter {f!r}: want (col, op, literal) "
                             f"with op in {_PRUNE_OPS}")
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    vdir = _version_dir(root, v)
    man = read_manifest(root, v)
    cm = read_column_mapping(root)
    stats_by_rel = {e["file"]: e.get("stats") for e in (man.files if man
                                                        else [])}
    base_files, delta_files = _split_base_delta(vdir)
    # column mapping: a pre-rename file's stats live under the OLD
    # physical name — a file is prunable if the proof holds under ANY
    # alias (each file records exactly one of them)
    kept = [f for f in base_files
            if not any(any(_file_prunable(
                stats_by_rel.get(os.path.relpath(f, vdir)), a, op, val)
                for a in physical_aliases(cm, c))
                for c, op, val in filters)]
    # only string literals probe soundly (the builder hashes
    # pc.cast(col, string); str(1.0) != cast repr for non-strings)
    key_eq = {c: val for c, op, val in filters
              if op == "==" and isinstance(val, str)}
    # sidecars are built over bucket_cols — skip the per-file header
    # reads entirely unless the filters pin that whole key
    bcols = (man.metrics.get("bucket_cols") if man else None) or \
        ("repo", "path")
    if not set(bcols) <= set(key_eq):
        key_eq = {}
    if use_blooms and key_eq:
        from kettleray.io import blooms as _blooms
        # probe_sidecar keeps any file whose sidecar records a key
        # column the filters don't pin, so passing the == subset is
        # always sound
        kept = _blooms.filter_files_by_key(kept, key_eq, report)
        delta_files = _blooms.filter_files_by_key(delta_files, key_eq,
                                                  report)
    if report is not None:
        rows_by_rel = {e["file"]: e.get("rows", 0)
                       for e in (man.files if man else [])}
        report.update({
            "files_total": len(base_files),
            "files_pruned": len(base_files) - len(kept),
            "delta_files": len(delta_files),
            "rows_kept_files": sum(
                rows_by_rel.get(os.path.relpath(f, vdir), 0)
                for f in kept)})
    if not kept and not delta_files:
        ds = ray.data.from_arrow(
            state_schema(root, v).empty_table())
    elif delta_files:
        ds = _mor_merge_ds(kept, delta_files, colmap=cm)
    elif cm:
        ds = _read_files_logical(kept, cm, with_bucket=False)
    else:
        ds = ray.data.read_parquet(kept)
    ds = _drop_bucket(ds)

    def _apply(t: pa.Table) -> pa.Table:
        out = t.filter(_residual_mask(t, filters)) if filters else t
        return out.select(columns) if columns else out

    return ds.map_batches(_apply, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def _zorder_codes(tbl: pa.Table, cluster_by: "list[str]",
                  bits: int = 16) -> "np.ndarray":
    """Morton (Z-order) sort key per row: each cluster column is dense-
    ranked within the table, quantized to ``bits`` bits, and the bit
    planes are interleaved — so sorting by the code gives every output
    file a bounded envelope in EVERY cluster dimension, not just the
    leading one (lexicographic sort concentrates only the first
    column). Vectorized: one dense rank per column + bits x ncols shift/
    or passes; strings rank lexicographically, numerics numerically,
    nulls rank lowest. ``bits`` is clamped to ``64 // ncols`` so the
    interleaved bit positions never exceed the uint64 code (a shift
    >= 64 is undefined in numpy and would silently garble the order)."""
    import numpy as _np
    import pyarrow.compute as pc
    n = tbl.num_rows
    ncols = len(cluster_by)
    if ncols > 64:
        raise ValueError(
            f"_zorder_codes: {ncols} cluster columns exceed the 64-bit "
            f"Morton code budget (max 64)")
    bits = max(1, min(bits, 64 // ncols))
    code = _np.zeros(n, dtype=_np.uint64)
    if n == 0:
        return code
    for ci, c in enumerate(cluster_by):
        col = tbl[c]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # dense 0-based rank via Arrow (handles every column type incl.
        # strings with nulls, where np.unique raises on None<str)
        inv = (pc.rank(col, sort_keys="ascending",
                       null_placement="at_start",
                       tiebreaker="dense")
               .to_numpy(zero_copy_only=False).astype(_np.uint64)
               - _np.uint64(1))
        nd = int(inv.max()) + 1
        q = ((inv * _np.uint64((1 << bits) - 1)) //
             _np.uint64(max(nd - 1, 1))) if nd > 1 else \
            _np.zeros(n, _np.uint64)
        for b in range(bits):
            code |= ((q >> _np.uint64(b)) & _np.uint64(1)) << \
                _np.uint64(b * ncols + ci)
    return code


def cluster_state(root: str, cluster_by: "tuple | list", *,
                  rows_per_file: int = 250_000,
                  num_buckets: int | None = None,
                  build_blooms: bool = False,
                  order: str = "lex") -> Manifest:
    """Range-cluster every bucket by ``cluster_by`` (≙ Delta OPTIMIZE
    ZORDER / Iceberg sort-order rewrite): each bucket's rows are
    reordered by the cluster columns and written as ~``rows_per_file``
    chunks with DISJOINT value ranges, so the zone maps
    :func:`scan_state` reads become selective — a hash-bucketed file
    interleaves every value and prunes nothing. Key-bucket routing is
    unchanged (clustering reorders WITHIN buckets), so incremental
    commits, changefeed diffs, and lookups keep working.

    ``order='lex'`` sorts lexicographically — maximal pruning on the
    LEADING column, none on trailing ones once the leading column
    varies within a file. ``order='zorder'`` sorts by the Morton
    interleave of per-column dense ranks (:func:`_zorder_codes`), the
    true multi-dimensional OPTIMIZE ZORDER: every output file gets a
    bounded min/max envelope in EVERY cluster column, so range filters
    on ANY of them prune files (at ~sqrt selectivity per dim for two
    columns instead of all-or-nothing).

    One Ray task per bucket (no shuffle — clustering is bucket-local);
    deltas are folded first via ``compact_mor`` so positions/latest
    values are in the base. Commits a new version atomically."""
    if order not in ("lex", "zorder"):
        raise ValueError(f"cluster_state: unknown order {order!r}")
    cluster_by = list(cluster_by)
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    if _split_base_delta(_version_dir(root, v))[1]:
        compact_mor(root)
        v = current_version(root)
    man = read_manifest(root, v)
    prev_dir = _version_dir(root, v)
    nv = _next_version(root)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()

    buckets = [n for n in sorted(os.listdir(prev_dir))
               if n.startswith("bucket=")]
    items = [{"name": n, "files": _parquet_files(
        os.path.join(prev_dir, n))} for n in buckets]

    cl_cm = read_column_mapping(root)

    def _cluster_one(t: pa.Table) -> pa.Table:
        import pyarrow as _pa
        outs = []
        for i in range(t.num_rows):
            name = t["name"][i].as_py()
            files = t["files"][i].as_py()
            tbl = pa.concat_tables(
                [apply_column_mapping(pq.read_table(f), cl_cm)
                 for f in files], promote_options="permissive")
            if "bucket" in tbl.column_names:
                tbl = tbl.drop_columns(["bucket"])
            if order == "zorder":
                import numpy as _np
                z = _zorder_codes(tbl, cluster_by)
                tbl = tbl.take(pa.array(
                    _np.argsort(z, kind="stable"), type=pa.int64()))
            else:
                tbl = tbl.sort_by([(c, "ascending") for c in cluster_by])
            dst = os.path.join(stage, name)
            os.makedirs(dst, exist_ok=True)
            nfiles = 0
            for off in range(0, max(tbl.num_rows, 1), rows_per_file):
                chunk = tbl.slice(off, rows_per_file)
                pq.write_table(chunk, os.path.join(
                    dst, f"clustered-{off // rows_per_file}.parquet"))
                nfiles += 1
            outs.append({"name": name, "files_out": nfiles,
                         "rows": tbl.num_rows})
        return _pa.Table.from_pylist(outs) if outs else _pa.table(
            {"name": _pa.array([], type=_pa.string()),
             "files_out": _pa.array([], type=_pa.int64()),
             "rows": _pa.array([], type=_pa.int64())})

    res = ray.data.from_items(items, override_num_blocks=max(
        len(items), 1)).map_batches(
        _cluster_one, batch_format="pyarrow", batch_size=None)
    done = res.to_pandas()          # one row per bucket — metadata-sized
    files = _stage_lineage(stage)
    man2 = Manifest(
        version=nv, watermark=man.watermark, schema=man.schema,
        files=files,
        metrics={**{k: man.metrics[k] for k in
                    ("num_buckets", "bucket_cols", "mode")
                    if k in man.metrics},
                 "write_sec": round(time.time() - t0, 3),
                 "cluster_by": cluster_by,
                 "cluster_order": order,
                 "rows_per_file": rows_per_file,
                 "clustered_buckets": int(len(done)),
                 "total_rows": sum(f["rows"] for f in files),
                 "delta_rows": 0, "delta_files": 0,
                 "clustering_of": v})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, nv))
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)
        if os.path.isdir(_version_dir(root, nv)):
            raise RuntimeError(
                f"cluster_state: version v{nv:04d} under {root} was "
                f"committed concurrently — table services are "
                f"single-writer; re-run to cluster on top of it")
        raise
    _write_current(root, nv)
    if build_blooms:
        # serving tables: refresh key-Bloom sidecars right after the
        # rewrite (only the new files are missing one — untouched
        # buckets' sidecars rode the hardlinks)
        from kettleray.io.blooms import build_key_blooms
        build_key_blooms(root, version=nv)
    return man2


def commit_state(ds: "ray.data.Dataset", root: str, *, watermark: int,
                 metrics: dict | None = None) -> Manifest:
    """Stage-write ``ds`` as the next state version and atomically commit.

    Idempotent: if the target version dir already exists (a concurrent or
    prior identical commit), the stage is discarded and the existing
    manifest returned.
    """
    os.makedirs(root, exist_ok=True)
    prev = current_version(root)
    v = 1 if prev is None else prev + 1
    final_dir = _version_dir(root, v)
    if os.path.exists(final_dir):
        # Adopting an existing vN (identical retry, or a crash landed
        # between the rename and the pointer write): repair CURRENT
        # forward-only so the adopted commit is actually visible.
        cur = current_version(root)
        if cur is None or cur < v:
            _write_current(root, v)
        return read_manifest(root, v)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    ds.write_parquet(stage)
    os.makedirs(stage, exist_ok=True)   # empty ds writes no files at all
    if not any(n.endswith(".parquet") for n in os.listdir(stage)):
        # write an explicit typed empty file so read_state of an empty
        # version works instead of read_parquet([]) blowing up
        try:
            sch = ds.schema()
            arrow_schema = getattr(sch, "base_schema", None)
            if arrow_schema is not None:
                pq.write_table(arrow_schema.empty_table(),
                               os.path.join(stage, "empty-0.parquet"))
        except Exception:
            pass
    try:                         # per-stage Ray execution stats -> lineage
        stats_tail = ds.stats()[-1800:]
    except Exception:
        stats_tail = ""
    files = []
    for name in sorted(os.listdir(stage)):
        fp = os.path.join(stage, name)
        md = pq.read_metadata(fp)
        files.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(fp)})
    schema = str(pq.read_schema(os.path.join(stage, files[0]["file"]))) \
        if files else ""
    man = Manifest(version=v, watermark=watermark, schema=schema,
                   files=files,
                   metrics={"write_sec": round(time.time() - t0, 3),
                            "total_rows": sum(f["rows"] for f in files),
                            "ray_stats_tail": stats_tail,
                            **(metrics or {})})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man.to_json())
    try:
        os.rename(stage, final_dir)         # atomic commit of the version
    except OSError:
        # concurrent writer won the rename race: discard our stage and
        # return the committed manifest (the documented idempotent path).
        if os.path.exists(final_dir):
            shutil.rmtree(stage, ignore_errors=True)
            return read_manifest(root, v)
        raise
    _write_current(root, v)
    return man


def _write_current(root: str, v: int) -> None:
    """Atomically advance the CURRENT pointer.

    This is the ONE choke point every committer funnels through to make
    a version visible, so it is where writer-lease fencing lives: if
    this process holds a :mod:`kettleray.io.lease` epoch for ``root``
    that a newer acquirer has superseded, raise FencedWriterError
    instead of publishing — the staged version stays an invisible
    orphan (readers trust only CURRENT) that _next_version skips and
    gc_versions reaps."""
    from kettleray.io import lease as _lease
    _lease.check_registered(root)
    atomic_write_json(os.path.join(root, "CURRENT"), {"version": v})


def apply_incremental(root: str, events: "ray.data.Dataset", *,
                      num_partitions: int = 64) -> Manifest:
    """Apply a (micro-)batch of change events on top of the current state.

    Exactly-once: events at or below the committed watermark are filtered
    out (idempotent re-application); the new watermark is the max
    commit_seq across the incoming filtered events (deletes included).
    """
    import pyarrow.compute as pc

    man = read_manifest(root)
    wm = man.watermark if man else -1

    def _above(b):
        return b.filter(pc.greater(b["commit_seq"], wm))

    import pyarrow as pa

    from kettleray.ops.cdc import evolve_to_schema, unify_event_schemas

    fresh = events.map_batches(_above, batch_format="pyarrow",
                               zero_copy_batch=True)
    try:
        new_wm = int(fresh.max("commit_seq"))
    except (TypeError, ValueError):
        new_wm = wm
    if new_wm <= wm and man is not None:
        return man                      # nothing new — no-op commit

    state = read_state(root)
    if state is not None:
        pseudo = state.map_batches(_state_rows_as_events,
                                   batch_format="pyarrow")
        # schema evolution across generations: additive columns backfill
        # null, widening casts apply, on BOTH sides before the union
        target = unify_event_schemas(
            [pseudo.schema().base_schema, fresh.schema().base_schema])
        merged = evolve_to_schema(pseudo, target).union(
            evolve_to_schema(fresh, target))
    else:
        merged = fresh
    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    return commit_state(final, root, watermark=new_wm,
                        metrics={"prev_watermark": wm})


# ---------------------------------------------------------------------------
# Bucketed state: rewrite only the buckets a batch touches (copy-on-write
# file groups, ≙ a lake-upsert layout). Untouched buckets are HARDLINKED
# into the new version — resumable output per SURVEY.md §7.2.5.
# ---------------------------------------------------------------------------

def add_bucket_column(ds: "ray.data.Dataset", num_buckets: int,
                      col: str = "bucket",
                      bucket_cols: tuple = ("repo", "path"),
                      ) -> "ray.data.Dataset":
    """Stable key bucket: crc32 of the \\x00-joined ``bucket_cols`` % B
    (process-independent, unlike Python's salted hash); crc32 computed
    once per UNIQUE key via dictionary encoding (cdc.stable_key_buckets).

    ``bucket_cols`` must be a prefix-compatible grouping of the upsert
    key (repo, path): the default buckets by the full key (uniform
    spread); ``("repo",)`` aligns buckets with commit locality — a
    micro-batch touching few repos rewrites few buckets — at the cost of
    hot-repo bucket skew (compact those via compact_state)."""

    def _fn(t):
        import pyarrow as pa
        from kettleray.ops.cdc import stable_key_buckets
        b = stable_key_buckets(t, bucket_cols, num_buckets)
        return t.append_column(col, pa.array(b))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)


def apply_incremental_bucketed(root: str, events: "ray.data.Dataset", *,
                               num_buckets: int = 64,
                               num_partitions: int = 16,
                               bucket_cols: tuple = ("repo", "path"),
                               ) -> Manifest:
    """Incremental upsert over a bucket-partitioned state layout.

    Only buckets containing keys touched by this batch are re-replayed
    and rewritten; every other bucket's files are hardlinked from the
    previous version (O(1) per file). At 10^10 events with micro-batches
    touching a small key subset, this turns each commit from a full
    table rewrite into work proportional to the touched buckets.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    man = read_manifest(root)
    _check_layout_stable(man, num_buckets, bucket_cols)
    wm = man.watermark if man else -1

    def _above(b):
        return b.filter(pc.greater(b["commit_seq"], wm))

    fresh = events.map_batches(_above, batch_format="pyarrow",
                               batch_size=None, zero_copy_batch=True)
    fresh = add_bucket_column(fresh, num_buckets,
                              bucket_cols=bucket_cols).materialize()
    n_fresh, new_wm, touched_set = _fresh_stats(fresh)
    if n_fresh == 0:
        if man is not None:
            return man
        # first-ever commit with nothing above the (empty) watermark:
        # commit an empty v0001 with the FINAL-STATE schema (not the raw
        # event schema) so later versions and readers agree.
        empty_state = ray.data.from_arrow(pa.table({
            c: pa.array([], type=pa.int64()
                        if c == "last_commit_seq" else pa.string())
            for c in cdc.FINAL_STATE_COLS}))
        return commit_state(empty_state, root, watermark=wm)
    touched = sorted(touched_set)

    prev_v = current_version(root)
    os.makedirs(root, exist_ok=True)
    v = _next_version(root)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)

    t0 = time.time()
    if prev_v is not None:
        prev_dir = _version_dir(root, prev_v)
        # hardlink untouched bucket dirs into the stage
        for name in sorted(os.listdir(prev_dir)):
            if not name.startswith("bucket="):
                continue
            b = int(name.split("=", 1)[1])
            if b in touched:
                continue
            os.makedirs(os.path.join(stage, name), exist_ok=True)
            for f in os.listdir(os.path.join(prev_dir, name)):
                os.link(os.path.join(prev_dir, name, f),
                        os.path.join(stage, name, f))
        # merge touched buckets: old rows of those buckets + fresh events
        touched_dirs = [os.path.join(prev_dir, f"bucket={b}")
                        for b in touched
                        if os.path.isdir(os.path.join(prev_dir,
                                                      f"bucket={b}"))]
        old_files = [f for d in touched_dirs for f in _parquet_files(d)]
        if old_files:
            cm = read_column_mapping(root)
            old = _read_files_logical(old_files, cm, with_bucket=False) \
                if cm else ray.data.read_parquet(old_files)
            pseudo = old.map_batches(_state_rows_as_events,
                                     batch_format="pyarrow",
                                     batch_size=None)
            from kettleray.ops.cdc import (evolve_to_schema,
                                           unify_event_schemas)
            fresh_e = fresh.drop_columns(["bucket"])
            target = unify_event_schemas(
                [pseudo.schema().base_schema, fresh_e.schema().base_schema])
            merged = evolve_to_schema(pseudo, target).union(
                evolve_to_schema(fresh_e, target))
        else:
            merged = fresh.drop_columns(["bucket"])
    else:
        touched = list(range(num_buckets))
        merged = fresh.drop_columns(["bucket"])

    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    final = add_bucket_column(final, num_buckets, bucket_cols=bucket_cols)
    final.write_parquet(stage, partition_cols=["bucket"])

    files = _stage_lineage(stage)
    man2 = Manifest(
        version=v, watermark=new_wm,
        schema=str(pq.read_schema(_parquet_files(stage)[0]))
        if files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "total_rows": sum(f["rows"] for f in files),
                 "touched_buckets": len(touched),
                 "num_buckets": num_buckets,
                 "bucket_cols": list(bucket_cols),
                 "prev_watermark": wm})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, v))
    except OSError:
        if os.path.isdir(_version_dir(root, v)):
            # Concurrent writer committed this version first. Unlike
            # commit_state (identical-input retries), our batch may hold
            # DIFFERENT events than the winner's — discard the stage and
            # re-apply against the new CURRENT: the watermark filter
            # keeps exactly the not-yet-applied suffix, so the retry is
            # exactly-once (a same-batch retry no-ops to the winner's
            # manifest).
            shutil.rmtree(stage, ignore_errors=True)
            return apply_incremental_bucketed(
                root, events, num_buckets=num_buckets,
                num_partitions=num_partitions, bucket_cols=bucket_cols)
        raise
    _write_current(root, v)
    return man2


def append_log(root: str, ds: "ray.data.Dataset",
               metrics: dict | None = None) -> Manifest:
    """Append-only log table: each call commits ONE version holding just
    this batch (never rewriting prior versions) — read the whole log
    with ``read_log``. Used for quarantine/audit streams where history
    must never be compacted away. GC with a large keep_last (or not at
    all): expiring versions here DROPS ROWS.

    NOT commit_state: its rename-race idempotency (loser adopts the
    winner's manifest) would silently DROP the loser's rows here, since
    concurrent appenders carry different batches. The loser instead
    renames its already-written stage to the next free version — both
    batches land."""
    try:
        wm = int(ds.max("commit_seq"))
    except Exception:
        wm = -1
    os.makedirs(root, exist_ok=True)
    stage = os.path.join(root, f"_stage_log.{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    ds.write_parquet(stage)
    os.makedirs(stage, exist_ok=True)
    files = _stage_lineage(stage)
    v = (current_version(root) or 0) + 1
    man = Manifest(version=v, watermark=wm,
                   schema=str(pq.read_schema(
                       os.path.join(stage, files[0]["file"])))
                   if files else "",
                   files=files,
                   metrics={"append_only": True,
                            "write_sec": round(time.time() - t0, 3),
                            "total_rows": sum(f["rows"] for f in files),
                            **(metrics or {})})
    while True:
        man.version = v
        with open(os.path.join(stage, "manifest.json"), "w") as f:
            f.write(man.to_json())
        try:
            os.rename(stage, _version_dir(root, v))
            break
        except OSError:
            if os.path.isdir(_version_dir(root, v)):
                v += 1                 # lost the race: take the next slot
                continue
            raise
    cur = current_version(root)
    if cur is None or v > cur:
        _write_current(root, v)
    return man


def read_log(root: str) -> "ray.data.Dataset | None":
    """Union of every retained version of an append-only log."""
    cur = current_version(root)
    if cur is None:
        return None
    files = []
    for n in sorted(os.listdir(root)):
        if n.startswith("v") and n[1:].isdigit():
            files.extend(_parquet_files(os.path.join(root, n)))
    return ray.data.read_parquet(files)


def apply_with_quarantine(state_root: str, quarantine_root: str,
                          events: "ray.data.Dataset", *,
                          mode: str = "bucketed",
                          num_buckets: int = 64,
                          num_partitions: int = 16,
                          bucket_cols: tuple = ("repo", "path"),
                          ) -> tuple[Manifest, Manifest | None]:
    """End-to-end late-data handling: route each event against the
    state's committed watermark — fresh events upsert through the
    chosen incremental path, late ones (at/below the watermark: already
    covered by state; re-applying would be a redelivery) are APPENDED to
    a quarantine log for audit instead of silently dropped. Returns
    (state manifest, quarantine manifest or None when nothing was late).
    """
    from kettleray.ops import cdc as _cdc

    man = read_manifest(state_root)
    wm = man.watermark if man else -1
    routed = _cdc.split_on_watermark(events, wm).materialize()
    import pyarrow.compute as pc
    fresh = routed.map_batches(
        lambda b: b.filter(pc.equal(b["route"], "fresh")).drop_columns(
            ["route"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    late = routed.map_batches(
        lambda b: b.filter(pc.equal(b["route"], "late")).drop_columns(
            ["route"]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    apply_fn = {"bucketed": apply_incremental_bucketed,
                "mor": apply_incremental_mor}[mode]
    state_man = apply_fn(state_root, fresh, num_buckets=num_buckets,
                         num_partitions=num_partitions,
                         bucket_cols=bucket_cols)
    n_late = late.count()
    q_man = None
    if n_late:
        q_man = append_log(quarantine_root, late,
                           metrics={"late_rows": n_late,
                                    "state_watermark": wm})
    return state_man, q_man


def apply_incremental_scd2(root: str, events: "ray.data.Dataset", *,
                           num_buckets: int = 64,
                           num_partitions: int = 16,
                           bucket_cols: tuple = ("repo", "path"),
                           ) -> Manifest:
    """Incrementally maintained SCD2 dimension table (≙ Dimension
    Lookup/Update as Kettle actually runs it — per-load history updates,
    not a full rebuild): each commit APPENDS new versions / closes
    current rows for exactly the keys in the batch.

    Shape: watermark filter → bucket column → ONE batch-sized hash
    exchange on the bucket → per-bucket append task (reads its own
    bucket's history, reconstructs the event skeleton, re-runs the
    standard SCD2 kernel over skeleton ∪ fresh — ops/cdc.py::
    scd2_append_table) → bucketed COW write with untouched buckets
    hardlinked. History IO per commit ∝ touched buckets; shuffle volume
    ∝ the micro-batch, never the table."""
    import pyarrow.compute as pc

    man = read_manifest(root)
    _check_layout_stable(man, num_buckets, bucket_cols)
    wm = man.watermark if man else -1

    fresh = events.map_batches(
        lambda b: b.filter(pc.greater(b["commit_seq"], wm)),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    fresh = add_bucket_column(fresh, num_buckets,
                              bucket_cols=bucket_cols).materialize()
    n_fresh, new_wm, touched_set = _fresh_stats(fresh)
    if n_fresh == 0:
        if man is not None:
            return man
        empty_hist = ray.data.from_arrow(pa.table(
            {c: pa.array([], type=cdc._scd2_type(c))
             for c in cdc.SCD2_COLS}))
        return commit_state(empty_hist, root, watermark=wm)
    touched = sorted(touched_set)

    prev_v = current_version(root)
    os.makedirs(root, exist_ok=True)
    v = _next_version(root)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    old_by_bucket: dict[int, list[str]] = {}
    if prev_v is not None:
        prev_dir = _version_dir(root, prev_v)
        for name in sorted(os.listdir(prev_dir)):
            if not name.startswith("bucket="):
                continue
            b = int(name.split("=", 1)[1])
            if b in touched_set:
                old_by_bucket[b] = _parquet_files(
                    os.path.join(prev_dir, name))
                continue
            os.makedirs(os.path.join(stage, name), exist_ok=True)
            for f in os.listdir(os.path.join(prev_dir, name)):
                os.link(os.path.join(prev_dir, name, f),
                        os.path.join(stage, name, f))

    scd2_cm = read_column_mapping(root)

    def _append(t: pa.Table) -> pa.Table:
        outs = []
        for bkt in pc.unique(t["bucket"]).to_pylist():
            sub = t.filter(pc.equal(t["bucket"], bkt))
            old_files = old_by_bucket.get(int(bkt), [])
            hist = pa.concat_tables(
                [apply_column_mapping(pq.read_table(f), scd2_cm)
                 for f in old_files],
                promote_options="permissive") if old_files else None
            h = cdc.scd2_append_table(hist, sub)
            outs.append(h.append_column(
                "bucket", pa.array([bkt] * h.num_rows, type=pa.int64())))
        if outs:
            return pa.concat_tables(outs)
        return pa.table({**{c: pa.array([], type=cdc._scd2_type(c))
                            for c in cdc.SCD2_COLS},
                         "bucket": pa.array([], type=pa.int64())})

    out = fresh.repartition(
        min(num_partitions, max(len(touched), 1)),
        keys=["bucket"]).map_batches(
        _append, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    out.write_parquet(stage, partition_cols=["bucket"])

    files = _stage_lineage(stage)
    man2 = Manifest(
        version=v, watermark=new_wm,
        schema=str(pq.read_schema(_parquet_files(stage)[0]))
        if files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "mode": "scd2", "num_buckets": num_buckets,
                 "bucket_cols": list(bucket_cols),
                 "touched_buckets": len(touched),
                 "total_rows": sum(f["rows"] for f in files),
                 "prev_watermark": wm})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, v))
    except OSError:
        if os.path.isdir(_version_dir(root, v)):
            shutil.rmtree(stage, ignore_errors=True)
            return apply_incremental_scd2(
                root, events, num_buckets=num_buckets,
                num_partitions=num_partitions, bucket_cols=bucket_cols)
        raise
    _write_current(root, v)
    return man2


# ---------------------------------------------------------------------------
# Merge-on-read state (deletion-vector-style deltas): a commit APPENDS
# per-bucket delta files instead of rewriting touched buckets — commit IO
# is proportional to the BATCH, not to the touched buckets' size. Reads
# merge base + deltas with the same distributed LWW replay the writer
# would have run; compact_mor folds deltas into the base out-of-band.
# ---------------------------------------------------------------------------

def apply_incremental_mor(root: str, events: "ray.data.Dataset", *,
                          num_buckets: int = 64,
                          num_partitions: int = 16,
                          bucket_cols: tuple = ("repo", "path"),
                          ) -> Manifest:
    """Merge-on-read incremental upsert (≙ Iceberg v2 / Hudi MOR).

    The copy-on-write path (``apply_incremental_bucketed``) re-replays and
    rewrites every touched bucket per commit — right when commits are
    large relative to buckets, wasteful for trickle micro-batches where a
    10-row commit rewrites a multi-GB bucket. Here the batch is map-side
    LWW-combined (no shuffle), written as per-bucket DELTA files under
    ``vN/delta/bucket=K/``, and every prior base + delta file is
    hardlinked forward (O(1) per file). ``read_state`` transparently
    merges deltas at read; ``compact_mor`` folds them back into the base.

    Deltas keep the raw event shape (op + commit_seq), so tombstones are
    first-class: a delete costs one delta row, never a bucket rewrite.
    Delta files must stay schema-uniform for a single ``read_parquet`` —
    a batch arriving with a DIFFERENT event schema triggers an automatic
    ``compact_mor`` first (clearing old-schema deltas), then commits.
    """
    import pyarrow.compute as pc

    from kettleray.ops.cdc import lww_reduce_table

    man = read_manifest(root)
    _check_layout_stable(man, num_buckets, bucket_cols)
    wm = man.watermark if man else -1

    fresh = events.map_batches(
        lambda b: lww_reduce_table(b.filter(pc.greater(b["commit_seq"],
                                                       wm))),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    fresh = add_bucket_column(fresh, num_buckets,
                              bucket_cols=bucket_cols).materialize()
    n_fresh, new_wm, _ = _fresh_stats(fresh)
    if n_fresh == 0:
        if man is not None:
            return man
        empty_state = ray.data.from_arrow(pa.table({
            c: pa.array([], type=pa.int64()
                        if c == "last_commit_seq" else pa.string())
            for c in cdc.FINAL_STATE_COLS}))
        return commit_state(empty_state, root, watermark=wm)

    prev_v = current_version(root)
    if prev_v is None:
        # first commit: write a plain base (no deltas to merge yet)
        final = cdc.replay_lww(fresh.drop_columns(["bucket"]),
                               num_partitions=num_partitions)
        final = add_bucket_column(final, num_buckets,
                                  bucket_cols=bucket_cols)
        return _commit_mor_stage(
            root, _next_version(root), final, watermark=new_wm,
            num_buckets=num_buckets, bucket_cols=bucket_cols,
            delta_rows=0, prev_watermark=wm)

    event_schema = str(fresh.drop_columns(["bucket"]).schema().base_schema)
    stored = (man.metrics or {}).get("event_schema")
    _, prev_deltas = _split_base_delta(_version_dir(root, prev_v))
    if prev_deltas and stored and stored != event_schema:
        compact_mor(root, num_partitions=num_partitions)
        prev_v = current_version(root)

    v = _next_version(root)
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    prev_dir = _version_dir(root, prev_v)
    for base, _, names in os.walk(prev_dir):      # hardlink EVERYTHING
        rel = os.path.relpath(base, prev_dir)
        for n in names:
            if not n.endswith(".parquet"):
                continue
            dst_dir = os.path.join(stage, rel) if rel != "." else stage
            os.makedirs(dst_dir, exist_ok=True)
            os.link(os.path.join(base, n), os.path.join(dst_dir, n))
    # fresh deltas: write bucket-partitioned, then move under delta/ with
    # version-stamped names (so fragments stay attributable per commit)
    tmp = os.path.join(stage, "_fresh")
    fresh.write_parquet(tmp, partition_cols=["bucket"])
    delta_rows = 0
    for name in sorted(os.listdir(tmp)):
        if not name.startswith("bucket="):
            continue
        dst_dir = os.path.join(stage, "delta", name)
        os.makedirs(dst_dir, exist_ok=True)
        for i, f in enumerate(sorted(os.listdir(os.path.join(tmp, name)))):
            src = os.path.join(tmp, name, f)
            delta_rows += pq.read_metadata(src).num_rows
            os.rename(src, os.path.join(
                dst_dir, f"delta-v{v:04d}-{i}.{uuid.uuid4().hex[:6]}"
                         f".parquet"))
    shutil.rmtree(tmp)

    files = _stage_lineage(stage)
    base_files, delta_files = _split_base_delta(stage)
    man2 = Manifest(
        version=v, watermark=new_wm,
        schema=str(pq.read_schema(base_files[0])) if base_files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "mode": "mor", "num_buckets": num_buckets,
                 "bucket_cols": list(bucket_cols),
                 "event_schema": event_schema,
                 "delta_rows": delta_rows,
                 "delta_files": len(delta_files),
                 "total_rows": sum(f["rows"] for f in files),
                 "prev_watermark": wm})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, v))
    except OSError:
        if os.path.isdir(_version_dir(root, v)):
            # lost the rename race — same exactly-once retry as the COW
            # path: the watermark filter keeps only the unapplied suffix
            shutil.rmtree(stage, ignore_errors=True)
            return apply_incremental_mor(
                root, events, num_buckets=num_buckets,
                num_partitions=num_partitions, bucket_cols=bucket_cols)
        raise
    _write_current(root, v)
    return man2


def _commit_mor_stage(root: str, v: int, state_ds: "ray.data.Dataset",
                      *, watermark: int,
                      num_buckets: int, bucket_cols: tuple,
                      delta_rows: int, prev_watermark: int,
                      extra_metrics: dict | None = None) -> Manifest:
    """Write ``state_ds`` (bucket column included) as version ``v``'s
    base with no deltas, committing atomically (MOR first-commit and
    compaction both land here)."""
    stage = os.path.join(root, f"_stage_v{v:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    state_ds.write_parquet(stage, partition_cols=["bucket"])
    files = _stage_lineage(stage)
    man = Manifest(
        version=v, watermark=watermark,
        schema=str(pq.read_schema(_parquet_files(stage)[0]))
        if files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "mode": "mor", "num_buckets": num_buckets,
                 "bucket_cols": list(bucket_cols),
                 "delta_rows": delta_rows, "delta_files": 0,
                 "total_rows": sum(f["rows"] for f in files),
                 "prev_watermark": prev_watermark,
                 **(extra_metrics or {})})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man.to_json())
    os.rename(stage, _version_dir(root, v))
    _write_current(root, v)
    return man


def rebucket_state(root: str, *, num_buckets: int,
                   bucket_cols: tuple = ("repo", "path"),
                   num_partitions: int = 16) -> Manifest:
    """Layout evolution: rewrite CURRENT into a new version with a
    DIFFERENT bucket count / bucket columns (the full-rewrite operation
    the incremental writers' layout guard points at). Merge-on-read
    deltas are folded in the same pass (the rewrite reads merged state).
    One shuffle-free read + one bucketed write; commits atomically, so
    readers switch layouts at a version boundary."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    state = read_state(root, v)
    if "bucket" in [f.name for f in state.schema().base_schema]:
        state = state.drop_columns(["bucket"])
    state = add_bucket_column(state, num_buckets, bucket_cols=bucket_cols)
    return _commit_mor_stage(
        root, _next_version(root), state, watermark=man.watermark,
        num_buckets=num_buckets, bucket_cols=bucket_cols,
        delta_rows=0, prev_watermark=man.watermark,
        extra_metrics={"rebucket_of": v})


def fsck_state(root: str, version: int | None = None, *,
               check_rows: bool = False) -> dict:
    """Audit a committed version against its manifest (lake table-service
    `fsck`): missing files, files on disk the manifest doesn't list,
    byte-size drift, and (optionally) per-file row-count drift from the
    parquet footers. Returns a report dict; report["ok"] is the verdict.
    Never mutates anything."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    vdir = _version_dir(root, v)
    on_disk = {os.path.relpath(f, vdir) for f in _parquet_files(vdir)}
    listed = {f["file"]: f for f in man.files}
    missing = sorted(set(listed) - on_disk)
    unlisted = sorted(on_disk - set(listed))
    size_drift, row_drift = [], []
    for rel, entry in listed.items():
        fp = os.path.join(vdir, rel)
        if not os.path.exists(fp):
            continue
        if os.path.getsize(fp) != entry["bytes"]:
            size_drift.append(rel)
        elif check_rows and pq.read_metadata(fp).num_rows != entry["rows"]:
            row_drift.append(rel)
    return {"version": v, "files_listed": len(listed),
            "files_on_disk": len(on_disk), "missing": missing,
            "unlisted": unlisted, "size_drift": size_drift,
            "row_drift": row_drift,
            "ok": not (missing or unlisted or size_drift or row_drift)}


def mor_delta_stats(root: str, version: int | None = None) -> dict:
    """Read-amplification telemetry of a committed version, from the
    manifest alone (no file IO): delta rows/bytes vs base, and the worst
    per-bucket delta file count."""
    man = read_manifest(root, version)
    if man is None:
        raise FileNotFoundError(f"no committed state under {root}")
    base_rows = delta_rows = delta_bytes = 0
    per_bucket: dict[str, int] = {}
    for f in man.files:
        rel = f["file"]
        if rel.startswith("delta" + os.sep) or rel.startswith("delta/"):
            delta_rows += f["rows"]
            delta_bytes += f["bytes"]
            b = rel.split(os.sep)[1] if os.sep in rel else \
                rel.split("/")[1]
            per_bucket[b] = per_bucket.get(b, 0) + 1
        else:
            base_rows += f["rows"]
    return {"base_rows": base_rows, "delta_rows": delta_rows,
            "delta_bytes": delta_bytes,
            "delta_ratio": delta_rows / max(base_rows, 1),
            "max_delta_files_per_bucket": max(per_bucket.values(),
                                              default=0)}


def maybe_compact_mor(root: str, *, max_delta_ratio: float = 0.2,
                      max_delta_files_per_bucket: int = 8,
                      num_partitions: int = 16) -> Manifest | None:
    """Compaction POLICY for merge-on-read state (the table-service
    scheduling knob): fold deltas when read amplification crosses either
    bound — delta rows exceeding ``max_delta_ratio`` of the base, or any
    bucket accumulating more than ``max_delta_files_per_bucket`` delta
    fragments (per-file open cost dominates tiny trickle deltas long
    before row counts do). Returns the compaction manifest, or None when
    below both bounds. Cheap to call after every commit: the decision
    reads only the manifest."""
    s = mor_delta_stats(root)
    if s["delta_rows"] == 0:
        return None
    if (s["delta_ratio"] <= max_delta_ratio and
            s["max_delta_files_per_bucket"] <= max_delta_files_per_bucket):
        return None
    return compact_mor(root, num_partitions=num_partitions)


def compact_mor(root: str, *, num_partitions: int = 16,
                build_blooms: bool = False) -> Manifest:
    """Fold merge-on-read deltas into the base: buckets WITH delta files
    are re-replayed (base-as-events ∪ deltas → LWW) and rewritten; every
    delta-free bucket is hardlinked forward untouched. Commits a new
    version with zero deltas — the out-of-band table service that bounds
    read amplification."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    vdir = _version_dir(root, v)
    base_files, delta_files = _split_base_delta(vdir)
    if not delta_files:
        if build_blooms:
            from kettleray.io.blooms import build_key_blooms
            build_key_blooms(root, version=v)
        return man
    nb = int(man.metrics.get("num_buckets", 64))
    bc = tuple(man.metrics.get("bucket_cols", ("repo", "path")))
    delta_buckets = {os.path.basename(os.path.dirname(f))
                     for f in delta_files}
    touched_base = [f for f in base_files
                    if os.path.basename(os.path.dirname(f)) in
                    delta_buckets]

    mor_cm = read_column_mapping(root)
    deltas = (_read_files_logical(delta_files, mor_cm, with_bucket=False)
              if mor_cm else ray.data.read_parquet(delta_files)) \
        .map_batches(
        lambda b: b.drop_columns(
            [c for c in ("bucket",) if c in b.column_names]),
        batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    if touched_base:
        pseudo = (_read_files_logical(touched_base, mor_cm,
                                      with_bucket=False)
                  if mor_cm else ray.data.read_parquet(touched_base)) \
            .map_batches(
            _state_rows_as_events, batch_format="pyarrow", batch_size=None)
        from kettleray.ops.cdc import evolve_to_schema, unify_event_schemas
        target = unify_event_schemas(
            [pseudo.schema().base_schema, deltas.schema().base_schema])
        merged = evolve_to_schema(pseudo, target).union(
            evolve_to_schema(deltas, target))
    else:
        merged = deltas
    final = cdc.replay_lww(merged, num_partitions=num_partitions)
    final = add_bucket_column(final, nb, bucket_cols=bc)

    nv = _next_version(root)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    linked = 0
    for f in base_files:                       # delta-free buckets ride
        name = os.path.basename(os.path.dirname(f))
        if name in delta_buckets:
            continue
        dst = os.path.join(stage, name)
        os.makedirs(dst, exist_ok=True)
        os.link(f, os.path.join(dst, os.path.basename(f)))
        linked += 1
    final.write_parquet(stage, partition_cols=["bucket"])
    files = _stage_lineage(stage)
    man2 = Manifest(
        version=nv, watermark=man.watermark,
        schema=str(pq.read_schema(_parquet_files(stage)[0]))
        if files else "",
        files=files,
        metrics={"write_sec": round(time.time() - t0, 3),
                 "mode": "mor", "num_buckets": nb,
                 "bucket_cols": list(bc),
                 "delta_rows": 0, "delta_files": 0,
                 "compacted_buckets": len(delta_buckets),
                 "linked_files": linked,
                 "total_rows": sum(f["rows"] for f in files),
                 "compaction_of": v})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    os.rename(stage, _version_dir(root, nv))
    _write_current(root, nv)
    if build_blooms:
        from kettleray.io.blooms import build_key_blooms
        build_key_blooms(root, version=nv)
    return man2


def read_changes(root: str, from_version: int,
                 to_version: int | None = None, *,
                 include_identical: bool = False,
                 num_partitions: int = 16) -> "ray.data.Dataset":
    """Change data feed (the table → binlog direction, ≙ Delta CDF /
    Merge Rows over the sink's own history): one flagged row per key
    that differs between two committed versions — 'new' / 'changed'
    (compare-side row) / 'deleted' (reference-side row).

    Scale shape: both versions share the bucket function, so (1) buckets
    whose base+delta file identity is UNCHANGED between the versions are
    skipped without opening a file (hardlink inode equality — the
    overwhelming majority under trickle commits), and (2) each changed
    bucket diffs independently in one co-partitioned task — no shuffle.
    Works across COW and MOR versions (deltas are merged per side first).
    """
    import pyarrow.compute as pc

    v2 = to_version if to_version is not None else current_version(root)
    if v2 is None:
        raise FileNotFoundError(f"no committed state under {root}")
    d1, d2 = _version_dir(root, from_version), _version_dir(root, v2)
    for d, v in ((d1, from_version), (d2, v2)):
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"version {v} not found under {root} (GC'd?)")

    def _layout(m: "Manifest | None"):
        return ((m.metrics.get("num_buckets"),
                 tuple(m.metrics.get("bucket_cols", ("repo", "path"))))
                if m else None)

    if _layout(read_manifest(root, from_version)) != \
            _layout(read_manifest(root, v2)):
        # rebucket boundary: bucket NAMES no longer correspond, so the
        # per-bucket diff would fabricate deleted/new pairs for every
        # moved key. Fall back to the layout-independent key-shuffle
        # diff over both versions' state (correct; costs one exchange).
        from kettleray.ops.cdc import diff_snapshots

        def _nb(ds):
            return ds.map_batches(
                lambda t: t.drop_columns(
                    [c for c in ("bucket",) if c in t.column_names]),
                batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)

        flagged = diff_snapshots(_nb(read_state(root, from_version)),
                                 _nb(read_state(root, v2)),
                                 num_partitions=num_partitions)
        if include_identical:
            return flagged
        return flagged.map_batches(
            lambda t: t.filter(pc.not_equal(t["change_type"],
                                            "identical")),
            batch_format="pyarrow", batch_size=None,
            zero_copy_batch=True)

    g1, g2 = _bucket_file_groups(d1), _bucket_file_groups(d2)

    items = []
    for name in sorted(set(g1) | set(g2)):
        e1, e2 = g1.get(name), g2.get(name)
        # bucket untouched -> no changes; prunable without opening a
        # file. include_identical must NOT prune (identical rows of
        # untouched buckets are part of the requested feed).
        if not include_identical and \
                _bucket_identity(e1) == _bucket_identity(e2):
            continue
        items.append({
            "base1": e1["base"] if e1 else [],
            "delta1": e1["delta"] if e1 else [],
            "base2": e2["base"] if e2 else [],
            "delta2": e2["delta"] if e2 else []})

    from kettleray.ops.cdc import classify_tagged_diff
    feed_cm = read_column_mapping(root)

    def _diff_bucket(t: pa.Table) -> pa.Table:
        outs = []
        for i in range(t.num_rows):
            old = merged_bucket_state(t["base1"][i].as_py(),
                                      t["delta1"][i].as_py(),
                                      colmap=feed_cm)
            new = merged_bucket_state(t["base2"][i].as_py(),
                                      t["delta2"][i].as_py(),
                                      colmap=feed_cm)
            parts = []
            for side, tbl in ((0, old), (1, new)):
                # keep 0-row tables too: a bucket whose merged state is
                # empty on both sides must still emit a SCHEMA'D empty
                # block — a zero-column pa.table({}) poisons downstream
                # keyed ops (map_batches is skipped on schema-less
                # empties, so consumers cannot repair it)
                if tbl.num_columns:
                    if "bucket" in tbl.column_names:
                        tbl = tbl.drop_columns(["bucket"])
                    parts.append(tbl.append_column(
                        "__side",
                        pa.array([side] * tbl.num_rows, type=pa.int8())))
            if not parts:
                continue
            flagged = classify_tagged_diff(
                pa.concat_tables(parts, promote_options="permissive"))
            if not include_identical:
                import pyarrow.compute as pc
                flagged = flagged.filter(
                    pc.not_equal(flagged["change_type"], "identical"))
            outs.append(flagged)
        if outs:
            return pa.concat_tables(outs, promote_options="permissive")
        return pa.table({})

    if not items:
        items = [{"base1": [], "delta1": [], "base2": [], "delta2": []}]
    return ray.data.from_items(
        items, override_num_blocks=len(items)).map_batches(
        _diff_bucket, batch_format="pyarrow", batch_size=None)


class ChangeSubscription:
    """Cursor-based consumption of the change data feed — the consumer
    side of CDC-out. ``poll()`` returns the flagged changes between the
    acked cursor and CURRENT (or None when caught up); ``ack()`` durably
    advances the cursor ONLY when called, so a consumer that crashes
    mid-processing re-polls the same window — at-least-once delivery
    with exactly-once effect if the consumer applies changes through an
    idempotent path (e.g. another kettleray sink, keyed by the same
    (repo, path))."""

    def __init__(self, root: str, cursor_path: str):
        self.root, self.cursor_path = root, cursor_path
        self._pending: int | None = None

    def _cursor(self) -> int | None:
        if not os.path.exists(self.cursor_path):
            return None
        with open(self.cursor_path) as f:
            return json.load(f)["version"]

    def poll(self, *, include_identical: bool = False
             ) -> "ray.data.Dataset | None":
        cur = current_version(self.root)
        if cur is None:
            return None
        last = self._cursor()
        if last is not None and last >= cur:
            return None                     # caught up
        self._pending = cur
        if last is None:
            # first poll: the whole current state arrives as 'new'
            ds = read_state(self.root, cur)

            def _flag(t: pa.Table) -> pa.Table:
                if "bucket" in t.column_names:
                    t = t.drop_columns(["bucket"])
                return t.append_column(
                    "change_type", pa.array(["new"] * t.num_rows))
            return ds.map_batches(_flag, batch_format="pyarrow",
                                  batch_size=None, zero_copy_batch=True)
        return read_changes(self.root, last, cur,
                            include_identical=include_identical)

    def ack(self) -> None:
        """Durably advance the cursor to the version the last poll
        covered (fsync + rename, same discipline as CURRENT)."""
        if self._pending is None:
            return
        atomic_write_json(self.cursor_path, {"version": self._pending})
        self._pending = None


def lookup_many(root: str, keys: "ray.data.Dataset", *,
                version: int | None = None,
                num_partitions: int | None = None) -> "ray.data.Dataset":
    """Distributed bulk point-lookup — the batch-serving complement of
    :class:`StateReader` (≙ Kettle's Database Lookup step run against
    the lake, engine/.../steps/databaselookup, cache-all mode): given a
    Dataset of requested ``(repo, path)`` keys, route each to its
    bucket with the writer's own hash, shuffle ONLY the keys, then one
    task per touched bucket reads that bucket's base+delta files once
    (parquet ``isin`` pushdown on the requested values), MOR-merges,
    and left-semi-joins the requested keys exactly.

    Scale shape: IO ∝ touched buckets, exchange ∝ keys + hits — never
    a full-table scan and never a driver-side loop; enriching a 100M-key
    stream against a 100 TB state touches each bucket once.
    """
    import pyarrow.dataset as pads
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    nb = man.metrics.get("num_buckets") if man else None
    vdir = _version_dir(root, v)

    def _distinct_keys(t: pa.Table) -> pa.Table:
        return t.select(["repo", "path"]).group_by(
            ["repo", "path"]).aggregate([])

    lm_cm = read_column_mapping(root)

    if nb is None:
        # flat layout: one filtered read over the version's files
        def _flat(t: pa.Table) -> pa.Table:
            kt = _distinct_keys(t)
            files = _parquet_files(vdir)
            if not files or kt.num_rows == 0:
                return state_schema(root, v).empty_table()
            flt = (pads.field("repo").isin(kt["repo"].to_pylist())
                   & pads.field("path").isin(kt["path"].to_pylist()))
            if lm_cm:
                st = pa.concat_tables(
                    [apply_column_mapping(
                        pads.dataset(f).to_table(filter=flt), lm_cm)
                     for f in files], promote_options="permissive")
            else:
                st = pads.dataset(files).to_table(filter=flt)
            return st.join(kt, keys=["repo", "path"],
                           join_type="left semi")
        return keys.repartition(1).map_batches(
            _flat, batch_format="pyarrow", batch_size=None)

    nb = int(nb)

    def _assign(t: pa.Table) -> pa.Table:
        kt = _distinct_keys(t)
        b = cdc.stable_key_buckets(kt, ("repo", "path"), nb)
        return kt.append_column("bucket_id",
                                pa.array(b, type=pa.int32()))

    keyed = keys.map_batches(_assign, batch_format="pyarrow",
                             zero_copy_batch=True)

    def _probe(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return state_schema(root, v).empty_table()
        b = group["bucket_id"][0].as_py()
        kt = group.drop_columns(["bucket_id"]).group_by(
            ["repo", "path"]).aggregate([])
        bdir = os.path.join(vdir, f"bucket={b}")
        ddir = os.path.join(vdir, "delta", f"bucket={b}")
        files = _parquet_files(bdir) if os.path.isdir(bdir) else []
        dfiles = _parquet_files(ddir) if os.path.isdir(ddir) else []
        # isin pushdown overselects pairs (r1,p2) — exact semantics come
        # from the semi-join below; the filter only bounds the IO
        flt = (pads.field("repo").isin(kt["repo"].to_pylist())
               & pads.field("path").isin(kt["path"].to_pylist()))
        if files and lm_cm:
            base_t = pa.concat_tables(
                [apply_column_mapping(
                    pads.dataset(f).to_table(filter=flt), lm_cm)
                 for f in files], promote_options="permissive")
        elif files:
            base_t = pads.dataset(files).to_table(filter=flt)
        else:
            base_t = state_schema(root, v).empty_table()
        if "bucket" in base_t.column_names:
            base_t = base_t.drop_columns(["bucket"])
        if dfiles:
            if lm_cm:
                delta_t = pa.concat_tables(
                    [apply_column_mapping(
                        pads.dataset(f).to_table(filter=flt), lm_cm)
                     for f in dfiles], promote_options="permissive")
            else:
                delta_t = pads.dataset(dfiles).to_table(filter=flt)
            merged = _merge_point(base_t, delta_t)
        else:
            merged = base_t
        return merged.join(kt, keys=["repo", "path"],
                           join_type="left semi")

    return keyed.groupby("bucket_id").map_groups(
        _probe, batch_format="pyarrow")


def table_history(root: str) -> pa.Table:
    """≙ Delta ``DESCRIBE HISTORY`` / the Iceberg snapshots metadata
    table: one row per committed version still on disk, manifest reads
    only (no data IO — metadata-sized at any table scale). ``bytes``
    counts manifest-listed bytes; hardlinked carry-forward files are
    listed in every version that references them (logical size)."""
    rows = []
    cur = current_version(root)
    vs = sorted(int(n[1:]) for n in os.listdir(root)
                if n.startswith("v") and n[1:].isdigit()) \
        if os.path.isdir(root) else []
    for v in vs:
        try:
            man = read_manifest(root, v)
        except FileNotFoundError:
            continue
        if man is None:
            continue
        m = man.metrics or {}
        rows.append({
            "version": v,
            "watermark": man.watermark,
            "rows": sum(e.get("rows", 0) for e in man.files),
            "files": len(man.files),
            "bytes": sum(e.get("bytes", 0) for e in man.files),
            "delta_files": sum(1 for e in man.files
                               if "delta" in e.get("file", "")),
            "operation": m.get("operation",
                               "compact" if "compaction_of" in m
                               else "commit"),
            "is_current": v == cur,
            "metrics": json.dumps(m, default=str),
        })
    return pa.Table.from_pylist(rows) if rows else pa.table({
        "version": pa.array([], pa.int64())})


def key_history(root: str, repo: str, path: str, *,
                from_version: int | None = None,
                to_version: int | None = None,
                use_blooms: bool = True) -> pa.Table:
    """Per-key audit trail across the sink's retained version chain —
    Delta CDF restricted to one key / row-granularity DESCRIBE HISTORY
    (≙ the audit question Kettle answers by re-running Merge Rows per
    snapshot pair, engine/.../steps/mergerows): one row per retained
    version where the key's LWW state CHANGED, flagged new / changed /
    deleted, with the winner's payload (the previous winner's payload
    for deletes, matching read_changes's reference-side convention).
    The oldest retained version emits 'new' if the key exists there
    (same contract as ChangeSubscription's first poll).

    Scale shape: driver-side and bucket-pruned — the key routes to ONE
    bucket with the writer's own hash, and versions whose bucket file
    identity is unchanged from the previous inspected version are
    skipped WITHOUT opening a file (hardlink inode equality — the
    overwhelming majority under trickle commits). Each inspected
    version costs one bloom-gated point lookup, so the walk is
    O(versions that touched the key's bucket), never O(table)."""
    v_hi = to_version if to_version is not None else current_version(root)
    if v_hi is None:
        raise FileNotFoundError(f"no committed state under {root}")
    vs = sorted(int(n[1:]) for n in os.listdir(root)
                if n.startswith("v") and n[1:].isdigit()
                and os.path.exists(os.path.join(root, n, "manifest.json")))
    vs = [v for v in vs if v <= v_hi
          and (from_version is None or v >= from_version)]

    key = pa.table({"repo": pa.array([repo]), "path": pa.array([path])})

    def _ident(v: int) -> tuple:
        """(layout, inode identity) of the key's bucket at version v —
        equal tuples mean the key's state cannot have changed."""
        man = read_manifest(root, v)
        nb = man.metrics.get("num_buckets") if man else None
        if nb is None:
            # non-bucketed version: identity = every file's inode
            return (None, _bucket_identity(
                {"base": _parquet_files(_version_dir(root, v)),
                 "delta": []}))
        b = int(cdc.stable_key_buckets(key, ("repo", "path"), int(nb))[0])
        vdir = _version_dir(root, v)
        bdir = os.path.join(vdir, f"bucket={b}")
        ddir = os.path.join(vdir, "delta", f"bucket={b}")
        return ((int(nb), b), _bucket_identity(
            {"base": _parquet_files(bdir) if os.path.isdir(bdir) else [],
             "delta": _parquet_files(ddir) if os.path.isdir(ddir)
             else []}))

    out_rows: list[dict] = []
    prev_row: "dict | None" = None
    prev_ident: "tuple | None" = None
    for v in vs:
        ident = _ident(v)
        if prev_ident is not None and ident == prev_ident:
            continue                      # bucket bytes untouched
        prev_ident = ident
        t = lookup_state(root, repo, path, version=v,
                         use_blooms=use_blooms)
        row = t.to_pylist()[0] if t.num_rows else None
        if row is not None:
            row.pop("bucket", None)
        if row is None and prev_row is None:
            continue
        if row is None:
            out_rows.append({"version": v, "change_type": "deleted",
                             **prev_row})
        elif prev_row is None:
            out_rows.append({"version": v, "change_type": "new", **row})
        elif row.get("content_sha256") != prev_row.get("content_sha256"):
            out_rows.append({"version": v, "change_type": "changed",
                             **row})
        prev_row = row
    if not out_rows:
        return pa.table({"version": pa.array([], pa.int64()),
                         "change_type": pa.array([], pa.string())})
    return pa.Table.from_pylist(out_rows)


def table_files(root: str, version: int | None = None) -> pa.Table:
    """≙ the Iceberg ``files`` metadata table: one row per
    manifest-listed file of one version, with zone-map stats as JSON.
    Manifest-only read."""
    v = version if version is not None else current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    rows = []
    for e in (man.files if man else []):
        rows.append({
            "version": v,
            "file": e.get("file", ""),
            "rows": e.get("rows", 0),
            "bytes": e.get("bytes", 0),
            "is_delta": "delta" in e.get("file", ""),
            "stats": json.dumps(e.get("stats"), default=str)
            if e.get("stats") is not None else None,
        })
    return pa.Table.from_pylist(rows) if rows else pa.table({
        "version": pa.array([], pa.int64())})


def gc_versions(root: str, *, keep_last: int = 2,
                stage_min_age_s: float = 3600.0,
                pinned: "set[int] | None" = None) -> list[int]:
    """Expire old state versions (a lake 'vacuum'): delete version dirs
    older than the newest ``keep_last``, never CURRENT and never a
    version in ``pinned`` (catalog-managed tables must pass
    ``catalog.pinned_versions(...)[root]`` — a snapshot that readers
    resolve through must keep its table versions alive). Safe with the
    bucketed layout's hardlinks — deleting an old version only drops
    link counts; files shared with surviving versions remain. Leftover
    ``_stage_*`` dirs from crashed writers are removed too — but ONLY
    when older than ``stage_min_age_s`` (a young stage may belong to a
    concurrently running commit; deleting it mid-write would corrupt
    that commit). Returns the deleted version numbers."""
    cur = current_version(root)
    if cur is None:
        return []
    versions = sorted(
        int(n[1:]) for n in os.listdir(root)
        if n.startswith("v") and n[1:].isdigit())
    cutoff = max(versions[-keep_last:][0] if len(versions) >= keep_last
                 else versions[0], 1)
    keep = pinned or set()
    deleted = []
    now = time.time()
    for v in versions:
        if v < cutoff and v != cur and v not in keep:
            shutil.rmtree(_version_dir(root, v))
            deleted.append(v)
        elif v > cur and v not in keep and \
                now - os.path.getmtime(_version_dir(root, v)) \
                >= stage_min_age_s:
            # crash orphan: the stage->vN rename landed but the writer
            # died before the CURRENT pointer write. Invisible to
            # readers (they only trust CURRENT) and skipped by
            # _next_version, so reaping is safe — but only past the
            # stage age window (a YOUNG above-CURRENT dir may be a
            # commit mid-flight between its rename and pointer write).
            shutil.rmtree(_version_dir(root, v))
            deleted.append(v)
    for n in os.listdir(root):
        p = os.path.join(root, n)
        if n.startswith("_stage_") and \
                now - os.path.getmtime(p) >= stage_min_age_s:
            shutil.rmtree(p, ignore_errors=True)
        elif n.endswith(".tmp") and \
                now - os.path.getmtime(p) >= stage_min_age_s:
            # pointer tmp from a writer that crashed mid-write
            # (atomic_write_json names these uniquely per writer)
            os.unlink(p)
    # prune view-partial caches (ops.ivm) for expired versions, plus any
    # stale cache stages — caches are rebuildable, so this is always safe
    agg_root = os.path.join(root, "_agg")
    if os.path.isdir(agg_root):
        for view in os.listdir(agg_root):
            vd = os.path.join(agg_root, view)
            for n in os.listdir(vd):
                p = os.path.join(vd, n)
                stale_stage = (n.endswith(".stage") and
                               now - os.path.getmtime(p) >= stage_min_age_s)
                expired = (n.startswith("v") and n[1:].isdigit()
                           and int(n[1:]) in deleted)
                if stale_stage or expired:
                    shutil.rmtree(p, ignore_errors=True)
    return deleted


def compact_state(root: str, *, max_files_per_bucket: int = 4) -> Manifest:
    """Compaction for the bucketed layout: buckets accumulating more than
    ``max_files_per_bucket`` fragments (one per incremental commit) are
    rewritten as a single file; small buckets are hardlinked through.
    Commits a new version atomically — the LSM merge step of the state
    store, run out-of-band like any lake table service."""
    v = current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    man = read_manifest(root, v)
    prev_dir = _version_dir(root, v)
    if _split_base_delta(prev_dir)[1]:
        raise ValueError(
            "current version holds merge-on-read delta files — run "
            "compact_mor() (compact_state only walks base buckets and "
            "would drop the deltas)")
    nv = _next_version(root)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    os.makedirs(stage)
    t0 = time.time()
    cm = read_column_mapping(root)
    compacted = linked = 0
    for name in sorted(os.listdir(prev_dir)):
        if not name.startswith("bucket="):
            continue
        src = os.path.join(prev_dir, name)
        dst = os.path.join(stage, name)
        os.makedirs(dst, exist_ok=True)
        frags = _parquet_files(src)
        if len(frags) > max_files_per_bucket:
            # streaming merge: copy row groups fragment-by-fragment into
            # one ParquetWriter — peak memory is ONE row group, not the
            # whole bucket (a hot bucket can exceed worker heap at scale)
            writer = None
            try:
                for f in frags:
                    pf = pq.ParquetFile(f)
                    for rg in range(pf.num_row_groups):
                        # logicalize: rewritten fragments physicalize an
                        # active column mapping (mixed-generation frags
                        # must converge on ONE writer schema)
                        t = apply_column_mapping(pf.read_row_group(rg),
                                                 cm)
                        if writer is None:
                            writer = pq.ParquetWriter(
                                os.path.join(dst, "compacted-0.parquet"),
                                t.schema)
                        writer.write_table(t)
            finally:
                if writer is not None:
                    writer.close()
            compacted += 1
        else:
            for f in frags:
                os.link(f, os.path.join(dst, os.path.basename(f)))
            linked += 1
    files = _stage_lineage(stage)
    man2 = Manifest(version=nv, watermark=man.watermark,
                    schema=man.schema, files=files,
                    metrics={"write_sec": round(time.time() - t0, 3),
                             "total_rows": sum(f["rows"] for f in files),
                             "compacted_buckets": compacted,
                             "linked_buckets": linked,
                             "compaction_of": v})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    os.rename(stage, _version_dir(root, nv))
    _write_current(root, nv)
    return man2


def _link_version_tree(src_vdir: str, stage: str) -> int:
    """Hardlink every parquet file of a committed version dir into
    ``stage``, preserving the relative layout (bucket=K/, delta/,
    quarantine sub-dirs all ride along). Metadata-only: no data bytes
    move; COW discipline everywhere else means neither side can later
    mutate a shared file in place. Returns files linked."""
    n = 0
    for base, _, names in os.walk(src_vdir):
        rel = os.path.relpath(base, src_vdir)
        for name in names:
            if not name.endswith(".parquet"):
                continue
            dst = stage if rel == "." else os.path.join(stage, rel)
            os.makedirs(dst, exist_ok=True)
            os.link(os.path.join(base, name), os.path.join(dst, name))
            n += 1
    return n


def clone_state(src_root: str, dst_root: str, *,
                version: int | None = None) -> Manifest:
    """Zero-copy shallow clone: publish ``src_root``'s committed
    version (CURRENT by default) as ``dst_root``'s v0001 by
    hardlinking its data files — O(files) metadata ops, zero data
    bytes, regardless of table size (same filesystem; the object-store
    analog is manifest-level file sharing). Clone and source then
    evolve independently: every writer in this module stages new files
    and never mutates committed ones, so shared files stay immutable
    until the LAST table referencing them gc's its version (the
    hardlink refcount is the share count — same mechanism
    gc_versions already relies on across versions).

    ≙ the lakehouse "shallow clone / snapshot export" (Kettle has no
    table-state analog; closest is Copy rows to result as a dev-time
    handoff). Use cases: dev/test forks of a production table,
    experiment baselines, pre-migration safety copies."""
    v = version if version is not None else current_version(src_root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {src_root}")
    man = read_manifest(src_root, v)
    if os.path.exists(os.path.join(dst_root, "CURRENT")):
        raise FileExistsError(
            f"clone_state: {dst_root} already has committed state")
    os.makedirs(dst_root, exist_ok=True)
    stage = os.path.join(dst_root, f"_stage_v0001.{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    linked = _link_version_tree(_version_dir(src_root, v), stage)
    src_cm = read_column_mapping(src_root)
    if src_cm:
        atomic_write_json(os.path.join(dst_root, "COLUMNS"), src_cm)
    man2 = Manifest(version=1, watermark=man.watermark,
                    schema=man.schema, files=man.files,
                    metrics={**man.metrics,
                             "write_sec": round(time.time() - t0, 3),
                             "cloned_from": f"{src_root}@v{v}",
                             "cloned_files": linked})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(dst_root, 1))
    except OSError:
        shutil.rmtree(stage, ignore_errors=True)
        raise
    _write_current(dst_root, 1)
    return man2


def restore_version(root: str, version: int) -> Manifest:
    """RESTORE TABLE ... TO VERSION AS OF — re-commit an OLD version's
    exact content as a NEW version (roll-forward undo). History is
    preserved: the bad versions stay readable for time travel until
    gc_versions expires them, and the restore itself is one hardlink
    commit (O(files), no data rewrite). The manifest watermark reverts
    to the restored version's, so replay/feed cursors resume from the
    restored point and the change feed between CURRENT-1 and CURRENT
    shows exactly the rows the restore changed back."""
    src_vdir = _version_dir(root, version)
    if not os.path.isdir(src_vdir):
        raise FileNotFoundError(
            f"restore_version: v{version:04d} not found under {root} "
            f"(expired by gc_versions?)")
    man = read_manifest(root, version)
    nv = _next_version(root)
    stage = os.path.join(root, f"_stage_v{nv:04d}.{uuid.uuid4().hex[:8]}")
    t0 = time.time()
    linked = _link_version_tree(src_vdir, stage)
    man2 = Manifest(version=nv, watermark=man.watermark,
                    schema=man.schema, files=man.files,
                    metrics={**man.metrics,
                             "write_sec": round(time.time() - t0, 3),
                             "restored_from": version,
                             "restored_files": linked})
    with open(os.path.join(stage, "manifest.json"), "w") as f:
        f.write(man2.to_json())
    try:
        os.rename(stage, _version_dir(root, nv))
    except OSError:
        if os.path.isdir(_version_dir(root, nv)):
            shutil.rmtree(stage, ignore_errors=True)
            raise RuntimeError(
                f"restore_version: v{nv} committed concurrently "
                f"(single-writer table) — re-check and retry")
        raise
    _write_current(root, nv)
    return man2
