"""Schema evolution across incremental state generations: a later batch
adds an additive column; the new state version carries it, old keys
backfilled null (north-rule requirement)."""

import pyarrow as pa
import ray.data

from kettleray.io import sink


def _events(rows):
    return ray.data.from_arrow(pa.Table.from_pylist(rows))


def _row(repo, path, seq, content, op="insert", **extra):
    return {"repo": repo, "path": path, "commit": f"c{seq}",
            "lang": "py", "content": content, "op": op,
            "commit_seq": seq, **extra}


def test_additive_column_across_generations(tmp_path):
    root = str(tmp_path / "state")
    b1 = [_row("r", "a", 0, "alpha"), _row("r", "b", 1, "beta")]
    sink.apply_incremental(root, _events(b1), num_partitions=2)

    b2 = [_row("r", "a", 2, "alpha2", op="update", author="ada"),
          _row("r", "c", 3, "gamma", author="bob")]
    sink.apply_incremental(root, _events(b2), num_partitions=2)

    state = {(r["repo"], r["path"]): r
             for r in sink.read_state(root).take_all()}
    assert state[("r", "a")]["author"] == "ada"
    assert state[("r", "c")]["author"] == "bob"
    assert state[("r", "b")]["author"] is None       # backfilled null
    assert state[("r", "b")]["content"] == "beta"
    assert state[("r", "a")]["content"] == "alpha2"


def test_third_generation_keeps_evolved_column(tmp_path):
    root = str(tmp_path / "state")
    sink.apply_incremental(root, _events([_row("r", "a", 0, "x")]),
                           num_partitions=2)
    sink.apply_incremental(
        root, _events([_row("r", "b", 1, "y", author="eve")]),
        num_partitions=2)
    # generation 3 WITHOUT the column: state still carries it
    sink.apply_incremental(root, _events([_row("r", "a", 2, "x2",
                                               op="update")]),
                           num_partitions=2)
    state = {(r["repo"], r["path"]): r
             for r in sink.read_state(root).take_all()}
    assert state[("r", "b")]["author"] == "eve"
    assert state[("r", "a")]["author"] is None
    assert state[("r", "a")]["content"] == "x2"
