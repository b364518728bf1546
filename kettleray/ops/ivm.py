"""Incremental materialized-view maintenance over the bucketed CDC state.

A grouped algebraic aggregate decomposes over the bucket partition:
``A = merge_b(P_b)`` where ``P_b`` is the partial aggregate of bucket b.
``io.sink.apply_incremental_bucketed`` rewrites ONLY the buckets a commit
touches and hardlinks the rest — so view maintenance can reuse every
untouched bucket's cached partial (hardlinked forward exactly like the
data files) and recompute only the touched ones. Merge-on-read layouts
(``apply_incremental_mor``) work too: a bucket's identity includes its
delta files, and delta-holding buckets aggregate the MERGED state in one
co-partitioned task each (same zero-shuffle shape as sink.read_state). Maintenance cost per
commit is proportional to the TOUCHED buckets, not the table: the classic
self-maintainable-view property for count/sum/min/max
(≙ what Kettle pipelines rebuild with a full Group By after every load;
ref: engine/.../steps/groupby/GroupBy.java — here the reload becomes an
incremental delta).

Cache layout (beside the version dirs; a cache, not part of the manifest
contract — safe to delete, rebuilt on demand; kept OUT of vN/ so
state readers never confuse partials with data files):

    root/_agg/<view_id>/v000N/spec.json
    root/_agg/<view_id>/v000N/bucket=<b>/*.parquet   one partial per bucket

Aggregate spec: ``aggs = {out_name: (fn, value)}`` with fn in
{"count", "sum", "min", "max"} and value = None (count rows) | a column
name | a callable ``pa.Table -> pa.Array`` (derived value, e.g.
``lambda t: pc.utf8_length(t["content"])``).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from kettleray.io import sink as _sink

_PARTIAL_FN = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
_BLOCK_FN = {"count": "count", "sum": "sum", "min": "min", "max": "max"}


def _norm_aggs(aggs: Mapping[str, tuple]) -> dict[str, tuple]:
    out = {}
    for name, (fn, value) in aggs.items():
        if fn not in _PARTIAL_FN:
            raise ValueError(
                f"unsupported agg fn {fn!r} (self-maintainable fns only: "
                f"{sorted(_PARTIAL_FN)})")
        out[name] = (fn, value)
    return out


def _spec_fingerprint(group_cols: Sequence[str],
                      aggs: Mapping[str, tuple]) -> dict:
    """Stable description of the view for cache-consistency checks.
    Callables are fingerprinted by qualified name (the caller owns
    keeping view_id -> definition stable)."""
    def _v(value):
        if value is None:
            return None
        if isinstance(value, str):
            return value
        return f"<callable {getattr(value, '__qualname__', repr(value))}>"
    return {"group_cols": list(group_cols),
            "aggs": {k: [fn, _v(v)] for k, (fn, v) in aggs.items()}}


def _derive_values(t: pa.Table, group_cols: Sequence[str],
                   aggs: Mapping[str, tuple],
                   extra_cols: Sequence[str] = ()) -> pa.Table:
    """Project a state block to group cols + one value column per agg."""
    cols: dict[str, pa.Array | pa.ChunkedArray] = {}
    for c in (*extra_cols, *group_cols):
        cols[c] = t[c]
    for name, (fn, value) in aggs.items():
        if fn == "count":
            cols[name] = pa.array([1] * t.num_rows, type=pa.int64())
        elif isinstance(value, str):
            cols[name] = t[value]
        else:
            cols[name] = value(t)
    return pa.table(cols)


def _group_table(t: pa.Table, group_cols: Sequence[str],
                 aggs: Mapping[str, tuple], fns: Mapping[str, str]
                 ) -> pa.Table:
    """Arrow-native grouped aggregate of a (derived) block; output columns
    keep the agg's out name."""
    specs = [(name, fns[fn]) for name, (fn, _) in aggs.items()]
    g = pa.TableGroupBy(t, list(group_cols)).aggregate(specs)
    # pyarrow names results "<col>_<fn>"; restore the out names
    rename = {f"{name}_{fns[fn]}": name for name, (fn, _) in aggs.items()}
    return g.rename_columns(
        [rename.get(c, c) for c in g.column_names])


def _bucket_dirs(vdir: str) -> dict[str, str]:
    out = {}
    for name in sorted(os.listdir(vdir)):
        if name.startswith("bucket=") and os.path.isdir(
                os.path.join(vdir, name)):
            out[name] = os.path.join(vdir, name)
    return out


def _file_identity(d: str) -> list[tuple]:
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".parquet"):
            st = os.stat(os.path.join(d, f))
            out.append((f, st.st_dev, st.st_ino))
    return out


def _cache_dir(root: str, view_id: str, v: int) -> str:
    return os.path.join(root, "_agg", view_id, f"v{v:04d}")


def _prev_cached_version(root: str, view_id: str, v: int) -> int | None:
    for pv in range(v - 1, 0, -1):
        if not os.path.isdir(_sink._version_dir(root, pv)):
            continue
        if os.path.isdir(_cache_dir(root, view_id, pv)):
            return pv
    return None


def ensure_partials(root: str, view_id: str, group_cols: Sequence[str],
                    aggs: Mapping[str, tuple], *,
                    version: int | None = None,
                    num_partitions: int = 8,
                    read_columns: Sequence[str] | None = None) -> str:
    """Build (or reuse) the per-bucket partial-aggregate cache for a state
    version. Buckets whose data files are byte-identical to the previous
    cached version (hardlink inode check — exactly the untouched set) get
    their partials HARDLINKED forward; only changed buckets are scanned,
    in ONE distributed pass. Returns the cache dir. Idempotent (atomic
    staged rename; a concurrent loser discards its stage)."""
    aggs = _norm_aggs(aggs)
    v = version if version is not None else _sink.current_version(root)
    if v is None:
        raise FileNotFoundError(f"no committed state under {root}")
    vdir = _sink._version_dir(root, v)
    cache = _cache_dir(root, view_id, v)
    spec = _spec_fingerprint(group_cols, aggs)
    if os.path.isdir(cache):
        with open(os.path.join(cache, "spec.json")) as f:
            if json.load(f) != spec:
                raise ValueError(
                    f"view_id {view_id!r} already cached with a different "
                    "spec — pick a distinct view_id per definition")
        return cache

    stage = cache + ".stage"
    shutil.rmtree(stage, ignore_errors=True)
    os.makedirs(stage)

    buckets = _bucket_dirs(vdir)
    deltas = (_bucket_dirs(os.path.join(vdir, "delta"))
              if os.path.isdir(os.path.join(vdir, "delta")) else {})
    pv = _prev_cached_version(root, view_id, v)
    prev_vdir = _sink._version_dir(root, pv) if pv is not None else None
    prev_cache = (_cache_dir(root, view_id, pv)
                  if pv is not None else None)
    if prev_cache is not None:
        with open(os.path.join(prev_cache, "spec.json")) as f:
            if json.load(f) != spec:
                prev_cache = prev_vdir = None

    def _identity(base_vdir, bname):
        """Combined base+delta file identity of one bucket (merge-on-read
        deltas count as bucket content: a new delta invalidates the
        cached partial exactly like a COW rewrite would)."""
        ident = []
        bdir = os.path.join(base_vdir, bname)
        if os.path.isdir(bdir):
            ident += _file_identity(bdir)
        ddir = os.path.join(base_vdir, "delta", bname)
        if os.path.isdir(ddir):
            ident += [("delta", *e) for e in _file_identity(ddir)]
        return ident

    changed_files: list[str] = []
    mor_items: list[dict] = []
    scanned_mor_bytes = 0
    reused = 0
    for bname in sorted(set(buckets) | set(deltas)):
        prev_partial = (os.path.join(prev_cache, bname)
                        if prev_cache is not None else None)
        if (prev_vdir is not None and prev_partial is not None
                and os.path.isdir(prev_partial)
                and _identity(vdir, bname) == _identity(prev_vdir, bname)):
            # untouched bucket: hardlink its cached partial forward
            os.makedirs(os.path.join(stage, bname))
            for f in sorted(os.listdir(prev_partial)):
                os.link(os.path.join(prev_partial, f),
                        os.path.join(stage, bname, f))
            reused += 1
        elif bname not in deltas:
            bdir = buckets[bname]
            changed_files.extend(
                os.path.join(bdir, f) for f in sorted(os.listdir(bdir))
                if f.endswith(".parquet"))
        else:
            # delta-holding bucket: the partial must aggregate the MERGED
            # state (base ∪ deltas LWW), one co-partitioned task per
            # bucket — same zero-shuffle shape as sink.read_state
            bf = (_sink._parquet_files(buckets[bname])
                  if bname in buckets else [])
            df = _sink._parquet_files(deltas[bname])
            scanned_mor_bytes += sum(os.path.getsize(f)
                                     for f in (*bf, *df))
            mor_items.append({"bucket": bname.split("=", 1)[1],
                              "base": bf, "delta": df})

    # read_columns prunes the scan to the view's inputs (derive the
    # full column set automatically when every value is a plain
    # column name; callables need the caller to name their inputs —
    # a wide state column like `content` otherwise dominates the IO).
    cols = None
    if read_columns is not None:
        cols = list(dict.fromkeys([*group_cols, *read_columns]))
    else:
        named = [v for _, v in aggs.values() if isinstance(v, str)]
        if all(v is None or isinstance(v, str)
               for _, v in aggs.values()):
            cols = list(dict.fromkeys([*group_cols, *named]))

    if changed_files:
        # one distributed pass over ONLY the changed buckets: per-block
        # partial (map-side combine), one narrow exchange keyed on the
        # bucket, per-bucket merge, partition-dir write matching the data
        # layout. 'bucket' arrives via hive-path inference (string).
        read_cols = None if cols is None else \
            [*cols, "bucket"] if "bucket" not in cols else cols
        ivm_cm = _sink.read_column_mapping(root)
        if ivm_cm:
            # column mapping active: per-file pruned reads accepting any
            # physical alias, logicalized before the partial kernel
            want = None if read_cols is None else list(dict.fromkeys(
                [a for c in read_cols
                 for a in sorted(_sink.physical_aliases(ivm_cm, c))]))

            def _rd_logical(t: pa.Table) -> pa.Table:
                tabs = []
                for f in t["f"].to_pylist():
                    ft = _sink.apply_column_mapping(
                        _sink._read_pruned(f, want), ivm_cm)
                    bname = os.path.basename(os.path.dirname(f))
                    if bname.startswith("bucket=") and \
                            "bucket" not in ft.column_names:
                        ft = ft.append_column("bucket", pa.array(
                            [bname.split("=", 1)[1]] * ft.num_rows,
                            type=pa.string()))
                    tabs.append(ft)
                return pa.concat_tables(tabs,
                                        promote_options="permissive")

            ds = ray.data.from_items(
                [{"f": f} for f in changed_files],
                override_num_blocks=len(changed_files)).map_batches(
                _rd_logical, batch_format="pyarrow", batch_size=None)
        else:
            ds = ray.data.read_parquet(changed_files, columns=read_cols)

        def _block_partial(t: pa.Table) -> pa.Table:
            d = _derive_values(t, group_cols, aggs, extra_cols=("bucket",))
            return _group_table(d, ["bucket", *group_cols], aggs, _BLOCK_FN)

        def _bucket_merge(t: pa.Table) -> pa.Table:
            return _group_table(t, ["bucket", *group_cols], aggs,
                                _PARTIAL_FN)

        partials = (ds.map_batches(_block_partial, batch_format="pyarrow",
                                   batch_size=None, zero_copy_batch=True)
                    .repartition(min(num_partitions, len(changed_files)),
                                 keys=["bucket"])
                    .map_batches(_bucket_merge, batch_format="pyarrow",
                                 batch_size=None, zero_copy_batch=True))
        partials.write_parquet(stage, partition_cols=["bucket"])

    if mor_items:
        # a view reading content_sha256 needs content too: delta winners
        # carry no stored digest, so theirs must be computed
        want_sha = cols is not None and "content_sha256" in cols
        mor_cols = (list(dict.fromkeys([*cols, "content"]))
                    if want_sha else cols)

        ivm_mor_cm = _sink.read_column_mapping(root)

        def _mor_partial(t: pa.Table) -> pa.Table:
            outs = []
            for i in range(t.num_rows):
                # same column pruning as the COW scan: the merge reads
                # only keys + seq + op + the view's inputs, and hashes
                # nothing unless the view consumes the digest
                st = _sink.merged_bucket_state(t["base"][i].as_py(),
                                               t["delta"][i].as_py(),
                                               columns=mor_cols,
                                               with_sha=want_sha,
                                               colmap=ivm_mor_cm)
                st = st.append_column(
                    "bucket", pa.array([t["bucket"][i].as_py()]
                                       * st.num_rows, type=pa.string()))
                d = _derive_values(st, group_cols, aggs,
                                   extra_cols=("bucket",))
                outs.append(_group_table(d, ["bucket", *group_cols],
                                         aggs, _BLOCK_FN))
            return pa.concat_tables(outs)

        mor_partials = ray.data.from_items(
            mor_items, override_num_blocks=len(mor_items)).map_batches(
            _mor_partial, batch_format="pyarrow", batch_size=None)
        mor_partials.write_parquet(stage, partition_cols=["bucket"])

    with open(os.path.join(stage, "spec.json"), "w") as f:
        json.dump(spec, f)
    scanned_bytes = sum(os.path.getsize(f)
                        for f in changed_files) + scanned_mor_bytes
    total_bytes = sum(os.path.getsize(os.path.join(d, f))
                      for d in (*buckets.values(), *deltas.values())
                      for f in os.listdir(d) if f.endswith(".parquet"))
    with open(os.path.join(stage, "_metrics.json"), "w") as f:
        json.dump({"buckets": len(buckets), "reused_partials": reused,
                   "scanned_files": len(changed_files),
                   "scanned_bytes": scanned_bytes,
                   "state_bytes": total_bytes}, f)
    try:
        os.rename(stage, cache)
    except OSError:
        # concurrent builder won the rename; our stage is redundant
        shutil.rmtree(stage, ignore_errors=True)
    return cache


def partials_metrics(root: str, view_id: str,
                     version: int | None = None) -> dict:
    v = version if version is not None else _sink.current_version(root)
    p = os.path.join(_cache_dir(root, view_id, v), "_metrics.json")
    with open(p) as f:
        return json.load(f)


def _merge_partials_dataset(ds: "ray.data.Dataset",
                            group_cols: Sequence[str],
                            aggs: Mapping[str, tuple]
                            ) -> "ray.data.Dataset":
    """Merge partial-aggregate rows: per-block Arrow merge, ONE plain
    concat repartition (the input is B×G partial rows — metadata-sized),
    final Arrow merge. Deliberately avoids Ray's hash-aggregate operator:
    its aggregator-actor pool costs seconds of fixed spawn time, ~100%
    overhead at this input size."""

    def _merge(t: pa.Table) -> pa.Table:
        return _group_table(t, group_cols, aggs, _PARTIAL_FN)

    return (ds.map_batches(_merge, batch_format="pyarrow",
                           batch_size=None, zero_copy_batch=True)
            .repartition(1)
            .map_batches(_merge, batch_format="pyarrow",
                         batch_size=None, zero_copy_batch=True))


def read_view(root: str, view_id: str, group_cols: Sequence[str],
              aggs: Mapping[str, tuple], *,
              version: int | None = None,
              read_columns: Sequence[str] | None = None
              ) -> "ray.data.Dataset":
    """The maintained aggregate: merge the per-bucket partials (ensuring
    the cache first). The merge input is B×G partial rows — metadata-
    sized, never data-sized — merged distributed (map-side merge + one
    concat exchange) so nothing lands on the driver."""
    aggs = _norm_aggs(aggs)
    cache = ensure_partials(root, view_id, group_cols, aggs,
                            version=version, read_columns=read_columns)
    files = []
    for bname in sorted(os.listdir(cache)):
        bdir = os.path.join(cache, bname)
        if bname.startswith("bucket=") and os.path.isdir(bdir):
            files.extend(os.path.join(bdir, f)
                         for f in sorted(os.listdir(bdir))
                         if f.endswith(".parquet"))
    ds = ray.data.read_parquet(files).drop_columns(["bucket"])
    return _merge_partials_dataset(ds, group_cols, aggs)


def recompute_view(root: str, group_cols: Sequence[str],
                   aggs: Mapping[str, tuple], *,
                   version: int | None = None,
                   read_columns: Sequence[str] | None = None
                   ) -> "ray.data.Dataset":
    """Full-scan reference implementation (for tests / cache audits).
    Applies the same column pruning as the incremental path; the
    aggregate itself is map-side per-block combine + the same tiny merge
    (group count is view-sized, so no hash-aggregate pool is needed)."""
    aggs = _norm_aggs(aggs)
    v = version if version is not None else _sink.current_version(root)
    vdir = _sink._version_dir(root, v)
    base_files, delta_files = _sink._split_base_delta(vdir)
    cols = None
    if read_columns is not None:
        cols = list(dict.fromkeys([*group_cols, *read_columns]))
    elif all(v_ is None or isinstance(v_, str) for _, v_ in aggs.values()):
        cols = list(dict.fromkeys(
            [*group_cols, *(v_ for _, v_ in aggs.values()
                            if isinstance(v_, str))]))

    def _project(t: pa.Table) -> pa.Table:
        return _derive_values(t, group_cols, aggs)

    def _block_partial(t: pa.Table) -> pa.Table:
        return _group_table(_project(t), group_cols, aggs, _BLOCK_FN)

    if delta_files:
        # merge-on-read layout: aggregate the MERGED state (raw files
        # would mix state rows with event-shaped deltas); column pruning
        # can't push below the merge — acceptable for a reference path
        ds = _sink.read_state(root, v)
    else:
        rv_cm = _sink.read_column_mapping(root)
        if rv_cm:
            want = None if cols is None else list(dict.fromkeys(
                [a for c in cols
                 for a in sorted(_sink.physical_aliases(rv_cm, c))]))

            def _rv_read(t: pa.Table) -> pa.Table:
                return pa.concat_tables(
                    [_sink.apply_column_mapping(
                        _sink._read_pruned(f, want), rv_cm)
                     for f in t["f"].to_pylist()],
                    promote_options="permissive")

            ds = ray.data.from_items(
                [{"f": f} for f in base_files],
                override_num_blocks=len(base_files)).map_batches(
                _rv_read, batch_format="pyarrow", batch_size=None)
        else:
            ds = ray.data.read_parquet(base_files, columns=cols)
    ds = ds.map_batches(_block_partial, batch_format="pyarrow",
                        batch_size=None)
    return _merge_partials_dataset(ds, group_cols, aggs)
