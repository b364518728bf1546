"""Table constraints: declaration, vectorized masks, guarded ingest."""
import pyarrow as pa
import pytest
import ray

from kettleray.io import constraints as ct
from kettleray.io import sink


def _events(rows):
    cols = {"repo": [], "path": [], "commit": [], "lang": [],
            "content": [], "op": [], "commit_seq": []}
    for r in rows:
        for k in cols:
            cols[k].append(r[k])
    t = pa.table({**{k: cols[k] for k in
                     ("repo", "path", "commit", "lang", "content", "op")},
                  "commit_seq": pa.array(cols["commit_seq"], pa.int64())})
    return ray.data.from_arrow(t)


def _ev(seq, path="a.txt", lang="en", content="x", op="upsert"):
    return {"repo": "r1", "path": path, "commit": f"c{seq}",
            "lang": lang, "content": content, "op": op,
            "commit_seq": seq}


class TestDeclaration:
    def test_validation(self, tmp_path):
        root = str(tmp_path)
        with pytest.raises(ValueError):
            ct.set_constraints(root, [{"kind": "not_null", "col": "x"}])
        with pytest.raises(ValueError):
            ct.set_constraints(root, [{"name": "a", "kind": "check",
                                       "expr": ["x", "LIKE", "y"]}])
        with pytest.raises(ValueError):
            ct.set_constraints(root, [{"name": "a", "kind": "wat"}])
        with pytest.raises(ValueError):    # duplicate names
            ct.set_constraints(root, [
                {"name": "a", "kind": "not_null", "col": "x"},
                {"name": "a", "kind": "not_null", "col": "y"}])
        rules = [{"name": "lang_set", "kind": "not_null", "col": "lang"},
                 {"name": "seq_pos", "kind": "check",
                  "expr": ["commit_seq", ">=", 0]},
                 {"name": "known_op", "kind": "in", "col": "op",
                  "values": ["upsert", "delete"]}]
        ct.set_constraints(root, rules)
        got = ct.get_constraints(root)
        assert [r["name"] for r in got] == ["lang_set", "seq_pos",
                                            "known_op"]

    def test_empty_when_undeclared(self, tmp_path):
        assert ct.get_constraints(str(tmp_path)) == []


class TestMasks:
    RULES = [{"name": "lang_set", "kind": "not_null", "col": "lang"},
             {"name": "seq_pos", "kind": "check",
              "expr": ["commit_seq", ">=", 0]},
             {"name": "known_op", "kind": "in", "col": "op",
              "values": ["upsert", "delete"]}]

    def test_first_violation_wins(self):
        t = pa.table({"lang": [None, "en", "en", None],
                      "commit_seq": pa.array([-1, -2, 3, 4], pa.int64()),
                      "op": ["upsert", "nope", "upsert", "nope"]})
        bad, names = ct.violations(t, self.RULES)
        assert bad.to_pylist() == [True, True, False, True]
        assert list(names) == ["lang_set", "seq_pos", None, "lang_set"]

    def test_null_passes_check_and_in(self):
        """SQL CHECK semantics: NULL comparisons never violate."""
        t = pa.table({"lang": ["en"],
                      "commit_seq": pa.array([None], pa.int64()),
                      "op": pa.array([None], pa.string())})
        bad, names = ct.violations(t, self.RULES)
        assert bad.to_pylist() == [False]


class TestGuardedApply:
    def test_split_and_fallback_to_previous_good(self, tmp_path):
        state = str(tmp_path / "state")
        quar = str(tmp_path / "quar")
        ct.set_constraints(state, [
            {"name": "lang_set", "kind": "not_null", "col": "lang"}])
        ev = _events([
            _ev(1, path="a.txt", lang="en", content="v1"),
            _ev(2, path="a.txt", lang=None, content="v2"),  # quarantined
            _ev(3, path="b.txt", lang="fr", content="w1"),
        ])
        man, qman, n_bad = ct.apply_with_constraints(
            state, quar, ev, mode="mor", num_buckets=4, num_partitions=2)
        assert n_bad == 1 and qman is not None
        st = {r["path"]: r for r in
              sink.read_state(state).take_all()}
        # a.txt keeps its previous GOOD version — the violating newest
        # event never applied
        assert st["a.txt"]["content"] == "v1"
        assert st["b.txt"]["content"] == "w1"
        q = sink.read_log(quar).take_all()
        assert len(q) == 1
        assert q[0]["error_constraint"] == "lang_set"
        assert q[0]["content"] == "v2"

    def test_no_rules_passthrough(self, tmp_path):
        state = str(tmp_path / "state")
        quar = str(tmp_path / "quar")
        man, qman, n_bad = ct.apply_with_constraints(
            state, quar, _events([_ev(1)]), mode="bucketed",
            num_buckets=4, num_partitions=2)
        assert n_bad == 0 and qman is None
        assert sink.read_state(state).count() == 1

    def test_quarantine_accumulates_across_commits(self, tmp_path):
        state = str(tmp_path / "state")
        quar = str(tmp_path / "quar")
        ct.set_constraints(state, [
            {"name": "seq_pos", "kind": "check",
             "expr": ["commit_seq", ">=", 0]}])
        for seq in (-5, -6):
            ct.apply_with_constraints(
                state, quar, _events([_ev(seq), _ev(abs(seq) + 10)]),
                mode="mor", num_buckets=4, num_partitions=2)
        assert sink.read_log(quar).count() == 2   # append-only audit
        assert sink.read_state(state).count() == 1
