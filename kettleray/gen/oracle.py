"""Single-threaded Python oracle replayer (tests' ground truth).

Mirrors the reference's end state: a dict keyed by (repo, path) holding
the last-writer row by commit_seq, deletes removing the key
(≙ SynchronizeAfterMerge applying Merge Rows flags transactionally), and
an SCD2 version-history builder (≙ DimensionLookup type-2 chains).
Deliberately naive — correctness yardstick only.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def replay_oracle(events: pa.Table) -> dict[tuple[str, str], dict]:
    """Final state: {(repo, path): row-with-content_sha256-and-last_commit_seq}."""
    rows = events.to_pylist()
    rows.sort(key=lambda r: (r["commit_seq"], r["commit"]))
    state: dict[tuple[str, str], dict] = {}
    seen: set[tuple[str, str, int]] = set()
    for r in rows:
        k = (r["repo"], r["path"])
        ek = (r["repo"], r["path"], r["commit_seq"])
        if ek in seen:  # redelivered event — exactly-once
            continue
        seen.add(ek)
        if r["op"] == "delete":
            state.pop(k, None)
        else:
            state[k] = {
                "repo": r["repo"], "path": r["path"], "commit": r["commit"],
                "lang": r["lang"], "content": r["content"],
                "content_sha256": _sha(r["content"]),
                "last_commit_seq": r["commit_seq"],
            }
    return state


def scd2_oracle(events: pa.Table) -> list[dict]:
    """Type-2 history rows, same rules as kettleray.ops.cdc.scd2_history."""
    rows = events.to_pylist()
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit_seq"]))
    out: list[dict] = []
    seen: set[tuple[str, str, int]] = set()
    dedup = []
    for r in rows:
        ek = (r["repo"], r["path"], r["commit_seq"])
        if ek in seen:
            continue
        seen.add(ek)
        dedup.append(r)
    i = 0
    while i < len(dedup):
        j = i
        key = (dedup[i]["repo"], dedup[i]["path"])
        while j < len(dedup) and (dedup[j]["repo"], dedup[j]["path"]) == key:
            j += 1
        version = 0
        for k in range(i, j):
            r = dedup[k]
            nxt = dedup[k + 1]["commit_seq"] if k + 1 < j else None
            if r["op"] == "delete":
                continue
            version += 1
            out.append({
                "repo": r["repo"], "path": r["path"], "version": version,
                "valid_from_seq": r["commit_seq"], "valid_to_seq": nxt,
                "is_current": nxt is None, "commit": r["commit"],
                "lang": r["lang"], "content_sha256": _sha(r["content"]),
            })
        i = j
    return out


def diff_oracle(old: pa.Table, new: pa.Table,
                value_col: str = "content_sha256") -> dict[tuple[str, str], str]:
    o = {(r["repo"], r["path"]): r for r in old.to_pylist()}
    n = {(r["repo"], r["path"]): r for r in new.to_pylist()}
    out = {}
    for k in o.keys() | n.keys():
        if k not in n:
            out[k] = "deleted"
        elif k not in o:
            out[k] = "new"
        elif o[k][value_col] == n[k][value_col]:
            out[k] = "identical"
        else:
            out[k] = "changed"
    return out
