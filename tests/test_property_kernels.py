"""Property-based tests: random event logs vs the oracle replayer.

Goes beyond the reference's example-based tests (SURVEY.md §5 notes the
reference has no randomized testing): hypothesis generates adversarial
little logs — duplicate seqs across keys, redeliveries, delete-then-
reinsert chains — and the vectorized kernels must match the
single-threaded oracle on every one.
"""

import hashlib

import pyarrow as pa
from hypothesis import given, settings, strategies as st

from kettleray.gen.oracle import replay_oracle, scd2_oracle
from kettleray.ops import cdc

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c")]


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for i in range(n):
        k = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["insert", "update", "update", "delete"]))
        content = "" if op == "delete" else draw(
            st.text(alphabet="abcxyz ", min_size=0, max_size=8))
        rows.append({
            "repo": k[0], "path": k[1],
            "commit": f"c{i:04d}", "lang": "py",
            "content": content, "op": op, "commit_seq": i,
        })
    # redeliver a random subset verbatim (exactly-once fodder)
    dup_idx = draw(st.lists(st.integers(0, n - 1), max_size=5))
    for i in dup_idx:
        rows.append(dict(rows[i]))
    return pa.Table.from_pylist(rows)


def _lww_via_kernels(t: pa.Table) -> dict:
    """Apply the same kernels the distributed pipeline runs, single-block
    (block boundaries are covered by the Ray-level tests)."""
    r = cdc.lww_reduce_table(t)
    r = cdc.finalize_state_table(r)
    return {(row["repo"], row["path"]): row for row in r.to_pylist()}


@settings(max_examples=150, deadline=None)
@given(event_logs())
def test_lww_kernel_matches_oracle(t):
    got = _lww_via_kernels(t)
    want = replay_oracle(t)
    assert set(got) == set(want)
    for k in want:
        assert got[k]["content_sha256"] == want[k]["content_sha256"]
        assert got[k]["last_commit_seq"] == want[k]["last_commit_seq"]


@settings(max_examples=100, deadline=None)
@given(event_logs())
def test_scd2_kernel_matches_oracle(t):
    got = cdc.scd2_history_table(t).to_pylist()
    want = scd2_oracle(t)
    gk = {(r["repo"], r["path"], r["version"]): r for r in got}
    wk = {(r["repo"], r["path"], r["version"]): r for r in want}
    assert set(gk) == set(wk)
    for k in wk:
        for col in ("valid_from_seq", "valid_to_seq", "is_current",
                    "content_sha256"):
            assert gk[k][col] == wk[k][col], (k, col)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(min_size=0, max_size=20), min_size=0, max_size=30))
def test_sha256_buffer_path_matches_hashlib(vals):
    arr = pa.array(vals, type=pa.string())
    got = cdc.sha256_hex_array(arr).to_pylist()
    want = [hashlib.sha256(v.encode("utf-8")).hexdigest() for v in vals]
    assert got == want
