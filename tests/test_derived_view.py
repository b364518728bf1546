"""Changefeed-driven derived tables (ops/derived.py): bootstrap +
incremental sync equals full recompute, delete propagation, exactly-once
re-sync, cursor crash-recovery."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from kettleray.io import sink
from kettleray.ops.derived import sync_derived_view, _applied_version


def _events(n=60):
    rows = {"repo": [], "path": [], "commit": [], "lang": [],
            "content": [], "op": [], "commit_seq": []}
    langs = ["en", "de", "es", "fr", "zh"]
    for i in range(n):
        for v in range(1 + i % 3):
            is_del = (v == i % 3) and (i % 3 > 0) and (i % 7 == 0)
            rows["repo"].append(f"r{i % 5}")
            rows["path"].append(f"f{i}.txt")
            rows["commit"].append(f"c{i}v{v}")
            rows["lang"].append(langs[i % 5])
            rows["content"].append("" if is_del else f"body {i} v{v}")
            rows["op"].append("delete" if is_del
                              else ("insert" if v == 0 else "update"))
            rows["commit_seq"].append(v * 1000 + i)
    t = pa.table({k: pa.array(v, type=pa.int64()
                              if k == "commit_seq" else pa.string())
                  for k, v in rows.items()})
    return rd.from_arrow(t)


FAM = {"en": "germanic", "de": "germanic", "es": "romance",
       "fr": "romance", "zh": "sinitic"}


def _enrich(events):
    def _fn(t):
        lf = pa.array([FAM.get(v, "other")
                       for v in t["lang"].to_pylist()], type=pa.string())
        t = t.append_column("lang_family", lf)
        return t.append_column(
            "content_len",
            pc.cast(pc.utf8_length(t["content"]), pa.int64()))
    return events.map_batches(_fn, batch_format="pyarrow",
                              zero_copy_batch=True)


def _view_df(dst):
    t = (sink.read_state(dst)
         .to_pandas()[["repo", "path", "lang", "lang_family",
                       "content", "content_len"]])
    return t.sort_values(["repo", "path"]).reset_index(drop=True)


@pytest.fixture()
def roots(tmp_path):
    return (os.path.join(str(tmp_path), "src"),
            os.path.join(str(tmp_path), "dst"))


def test_bootstrap_plus_feed_equals_recompute(roots):
    src, dst = roots
    ev = _events()
    b1 = ev.map_batches(
        lambda b: b.filter(pc.less(b["commit_seq"], 1000)),
        batch_format="pyarrow", zero_copy_batch=True)
    sink.apply_incremental_bucketed(src, b1, num_buckets=4,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    assert _applied_version(dst) == 1
    sink.apply_incremental_bucketed(src, ev, num_buckets=4,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    got = _view_df(dst)
    # recompute reference: full replay then enrich
    from kettleray.ops import cdc
    ref_state = cdc.replay_lww(ev, num_partitions=2)
    ref = _enrich(ref_state.map_batches(
        lambda t: t.append_column("content_len_src", t["content"]),
        batch_format="pyarrow",
        zero_copy_batch=True)).to_pandas()[
        ["repo", "path", "lang", "lang_family", "content",
         "content_len"]].sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert got.equals(ref)
    # deleted keys propagated: i%7==0 with i%3>0 are absent
    dead = {f"f{i}.txt" for i in range(60) if i % 3 > 0 and i % 7 == 0}
    assert not set(got["path"]) & dead


def test_resync_is_noop_and_crash_safe(roots):
    src, dst = roots
    ev = _events()
    sink.apply_incremental_bucketed(src, ev, num_buckets=4,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    v_dst = sink.current_version(dst)
    before = _view_df(dst)
    # caught-up sync: no new downstream version
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    assert sink.current_version(dst) == v_dst
    # crash between apply and cursor write: rewind the cursor and
    # re-sync — the downstream watermark makes it value-idempotent
    sink.apply_incremental_bucketed(
        src, _events(80), num_buckets=4, num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    after = _view_df(dst)
    with open(os.path.join(dst, "SYNC_CURSOR.json"), "w") as f:
        json.dump({"src_version": 1}, f)   # pretend cursor write lost
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    assert _applied_version(dst) == sink.current_version(src)
    assert _view_df(dst).equals(after)
    assert len(after) >= len(before)


def test_sync_across_rebucket_boundary(roots):
    """An upstream rebucket makes read_changes fall back to the
    layout-independent diff (key+sha+flag only); the sync must full-
    resync instead of crashing, and still propagate deletes."""
    src, dst = roots
    ev = _events(60)
    b1 = ev.map_batches(
        lambda b: b.filter(pc.less(b["commit_seq"], 1000)),
        batch_format="pyarrow", zero_copy_batch=True)
    sink.apply_incremental_bucketed(src, b1, num_buckets=4,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    # rebucket upstream, then apply the remaining events
    sink.rebucket_state(src, num_buckets=8, num_partitions=2)
    sink.apply_incremental_bucketed(src, ev, num_buckets=8,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    got = _view_df(dst)
    from kettleray.ops import cdc
    ref = _enrich(cdc.replay_lww(ev, num_partitions=2)).to_pandas()[
        ["repo", "path", "lang", "lang_family", "content",
         "content_len"]].sort_values(
        ["repo", "path"]).reset_index(drop=True)
    assert got.equals(ref)
    dead = {f"f{i}.txt" for i in range(60) if i % 3 > 0 and i % 7 == 0}
    assert not set(got["path"]) & dead


def test_cursor_ahead_rejected(roots):
    src, dst = roots
    sink.apply_incremental_bucketed(src, _events(20), num_buckets=4,
                                    num_partitions=2)
    sync_derived_view(src, dst, _enrich, num_buckets=4,
                      num_partitions=2)
    with open(os.path.join(dst, "SYNC_CURSOR.json"), "w") as f:
        json.dump({"src_version": 99}, f)
    with pytest.raises(ValueError):
        sync_derived_view(src, dst, _enrich, num_buckets=4,
                          num_partitions=2)
