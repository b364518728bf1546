"""Incrementally maintained join views (ops/derived.py::sync_join_view):
bootstrap == full join recompute, delta propagation from either side,
delete tombstones (incl. deleted-from-both-sides keys only the feeds
know about), left-join nulls, exactly-once re-sync."""

import os

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from kettleray.io import sink
from kettleray.ops.derived import sync_join_view


def _ev(rows, seq0=0):
    cols = {"repo": [], "path": [], "commit": [], "lang": [],
            "content": [], "op": [], "commit_seq": []}
    for i, (repo, path, lang, content, op) in enumerate(rows):
        cols["repo"].append(repo)
        cols["path"].append(path)
        cols["commit"].append(f"c{seq0 + i}")
        cols["lang"].append(lang)
        cols["content"].append(content)
        cols["op"].append(op)
        cols["commit_seq"].append(seq0 + i)
    t = pa.table({k: pa.array(v, type=pa.int64()
                              if k == "commit_seq" else pa.string())
                  for k, v in cols.items()})
    return rd.from_arrow(t)


def _recompute(a_root, b_root, how):
    a = sink.read_state(a_root).to_pandas()
    b = sink.read_state(b_root).to_pandas()
    keep_a = ["repo", "path", "commit", "lang", "content"]
    keep_b = ["repo", "path", "commit", "lang", "content"]
    m = a[keep_a].merge(b[keep_b], on=["repo", "path"],
                        how=("inner" if how == "inner" else "left"),
                        suffixes=("", "_r"))
    return m.sort_values(["repo", "path"]).reset_index(drop=True)


def _view(dst, how):
    cols = ["repo", "path", "commit", "lang", "content",
            "commit_r", "lang_r", "content_r"]
    df = sink.read_state(dst).to_pandas()[cols]
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def _check(dst, a_root, b_root, how):
    got, want = _view(dst, how), _recompute(a_root, b_root, how)
    pd.testing.assert_frame_equal(got, want, check_like=True)


@pytest.fixture()
def roots(tmp_path):
    return (str(tmp_path / "a"), str(tmp_path / "b"),
            str(tmp_path / "view"))


KW = dict(num_partitions=4)
NB = dict(num_buckets=4, num_partitions=4)


def _seed(a_root, b_root):
    a = _ev([(f"r{i % 3}", f"f{i}", "en", f"a{i}", "insert")
             for i in range(12)], seq0=1)
    # B covers keys 0..8 only -> inner join drops f9..f11
    b = _ev([(f"r{i % 3}", f"f{i}", "de", f"b{i}", "insert")
             for i in range(9)], seq0=1)
    sink.apply_incremental_bucketed(a_root, a, **NB)
    sink.apply_incremental_bucketed(b_root, b, **NB)


def test_bootstrap_inner_equals_full_join(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    _check(dst, a_root, b_root, "inner")
    assert len(_view(dst, "inner")) == 9


def test_incremental_updates_both_sides_and_deletes(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    # A-side update + A-side delete of a joined key
    sink.apply_incremental_bucketed(a_root, _ev(
        [("r0", "f0", "en", "a0-v2", "update"),
         ("r1", "f1", "en", "", "delete")], seq0=100), **NB)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    _check(dst, a_root, b_root, "inner")
    df = _view(dst, "inner")
    assert "f1" not in set(df["path"])
    assert df[df["path"] == "f0"]["content"].iloc[0] == "a0-v2"
    # B-side update propagates into joined rows
    sink.apply_incremental_bucketed(b_root, _ev(
        [("r2", "f2", "fr", "b2-v2", "update")], seq0=200), **NB)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    _check(dst, a_root, b_root, "inner")
    assert _view(dst, "inner").set_index("path").loc["f2",
                                                     "content_r"] \
        == "b2-v2"


def test_deleted_from_both_sides_needs_the_feed(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    # drop f3 from BOTH tables: current states no longer mention the
    # key at all — only the change feeds carry the tombstone
    sink.apply_incremental_bucketed(a_root, _ev(
        [("r0", "f3", "en", "", "delete")], seq0=300), **NB)
    sink.apply_incremental_bucketed(b_root, _ev(
        [("r0", "f3", "de", "", "delete")], seq0=300), **NB)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    _check(dst, a_root, b_root, "inner")
    assert "f3" not in set(_view(dst, "inner")["path"])


def test_left_join_nulls_and_b_only_keys_absent(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    # B-only key must never appear in an A-keyed left view
    sink.apply_incremental_bucketed(b_root, _ev(
        [("r9", "only-in-b", "de", "x", "insert")], seq0=50), **NB)
    sync_join_view(dst, a_root, b_root, how="left", **KW)
    _check(dst, a_root, b_root, "left")
    df = _view(dst, "left")
    assert len(df) == 12
    assert "only-in-b" not in set(df["path"])
    assert df[df["path"] == "f11"]["content_r"].isna().all()


def test_resync_is_noop_and_crash_retry_is_exactly_once(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    v1 = sink.current_version(dst)
    # caught up -> no new version
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    assert sink.current_version(dst) == v1
    # crash AFTER downstream commit but BEFORE cursor write: retry
    # re-applies the same epoch; the watermark filter no-ops it
    sink.apply_incremental_bucketed(a_root, _ev(
        [("r0", "f0", "en", "a0-v9", "update")], seq0=400), **NB)
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    os.remove(os.path.join(dst, "JOIN_CURSOR.json"))
    sync_join_view(dst, a_root, b_root, how="inner", **KW)
    _check(dst, a_root, b_root, "inner")


def test_mor_apply_roundtrip(roots):
    a_root, b_root, dst = roots
    _seed(a_root, b_root)
    sync_join_view(dst, a_root, b_root, how="inner", apply="mor", **KW)
    _check(dst, a_root, b_root, "inner")
    sink.apply_incremental_bucketed(a_root, _ev(
        [("r0", "f0", "en", "a0-mor", "update"),
         ("r1", "f4", "en", "", "delete")], seq0=500), **NB)
    sync_join_view(dst, a_root, b_root, how="inner", apply="mor", **KW)
    _check(dst, a_root, b_root, "inner")
    assert "f4" not in set(_view(dst, "inner")["path"])


def test_layout_mismatch_rejected(roots, tmp_path):
    a_root, b_root, dst = roots
    sink.apply_incremental_bucketed(
        a_root, _ev([("r0", "f0", "en", "a", "insert")], seq0=1), **NB)
    sink.apply_incremental_bucketed(
        b_root, _ev([("r0", "f0", "de", "b", "insert")], seq0=1),
        num_buckets=8, num_partitions=4)
    with pytest.raises(ValueError, match="co-partitioned"):
        sync_join_view(dst, a_root, b_root, **KW)
