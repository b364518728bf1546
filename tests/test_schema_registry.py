"""Schema registry: compatibility modes, ingest_guard evolution path."""
import pyarrow as pa
import pytest
import ray

from kettleray.io import schemareg as sr


def _s(**cols):
    return pa.schema([pa.field(k, v) for k, v in cols.items()])


V1 = _s(repo=pa.string(), n=pa.int32())


class TestCanRead:
    def test_identical(self):
        assert sr.can_read(V1, V1) is None

    def test_additive_nullable_ok(self):
        v2 = _s(repo=pa.string(), n=pa.int32(), extra=pa.string())
        assert sr.can_read(v2, V1) is None          # backfill null

    def test_required_missing_rejected(self):
        v2 = pa.schema([pa.field("repo", pa.string()),
                        pa.field("n", pa.int32()),
                        pa.field("extra", pa.string(), nullable=False)])
        assert "required column 'extra'" in sr.can_read(v2, V1)

    def test_widening_ok_narrowing_not(self):
        wide = _s(repo=pa.string(), n=pa.int64())
        assert sr.can_read(wide, V1) is None
        assert "not a widening cast" in sr.can_read(V1, wide)

    def test_projection_always_ok(self):
        v2 = _s(repo=pa.string(), n=pa.int32(), extra=pa.string())
        assert sr.can_read(V1, v2) is None          # extra projected away


class TestRegister:
    def test_versions_and_roundtrip(self, tmp_path):
        root = str(tmp_path)
        assert sr.latest_version(root) is None
        assert sr.register_schema(root, V1) == 1
        # exact re-register is a no-op
        assert sr.register_schema(root, V1) == 1
        v2 = _s(repo=pa.string(), n=pa.int64(), extra=pa.string())
        assert sr.register_schema(root, v2) == 2
        assert sr.get_schema(root) == v2
        assert sr.get_schema(root, 1) == V1
        assert [v for v, _ in sr.schema_history(root)] == [1, 2]

    def test_backward_rejects_narrowing(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, _s(n=pa.int64()))
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.register_schema(root, _s(n=pa.int32()))

    def test_backward_allows_drop_forward_rejects_add(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, V1)
        # BACKWARD: dropping a (nullable) column is fine — new schema
        # still reads old data by projection
        dropped = _s(repo=pa.string())
        sr.register_schema(root, dropped, compatibility="BACKWARD")
        # FORWARD from {repo}: adding non-nullable breaks old readers
        req = pa.schema([pa.field("repo", pa.string()),
                         pa.field("z", pa.int64(), nullable=False)])
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.register_schema(root, req, compatibility="FULL")
        # nullable add passes FULL (old reader backfills null... no —
        # old reader never sees z; NEW reader of OLD data backfills)
        ok = _s(repo=pa.string(), z=pa.int64())
        sr.register_schema(root, ok, compatibility="FULL")

    def test_transitive_checks_all_history(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, pa.schema(
            [pa.field("a", pa.int64(), nullable=False)]))
        sr.register_schema(root, _s(b=pa.int64()))   # BACKWARD vs last ok?
        # v2 dropped required 'a' — fine vs NONE-history? can_read(v2, v1)
        # projects 'a' away and backfills b=null... b nullable → ok.
        bad = pa.schema([pa.field("a", pa.int64(), nullable=False),
                         pa.field("b", pa.int64())])
        # vs last only: can_read(bad, v2) needs required 'a' from v2 → fails
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.register_schema(root, bad, compatibility="BACKWARD")
        # NONE admits anything
        sr.register_schema(root, bad, compatibility="NONE")

    def test_unknown_mode(self, tmp_path):
        with pytest.raises(ValueError):
            sr.register_schema(str(tmp_path), V1, compatibility="SIDEWAYS")

    def test_crash_orphan_reaped(self, tmp_path):
        """A schema_N file above LATEST (crash between file write and
        pointer write) is invisible to reads and is reaped by the next
        registration, which takes its slot — no hole, no stale content
        surfacing in schema_history."""
        root = str(tmp_path)
        sr.register_schema(root, V1)
        import json
        orphan_schema = _s(repo=pa.string(), orphan=pa.bool_())
        with open(sr._spath(root, 2), "w") as f:
            json.dump({"version": 2, "ipc": sr._encode(orphan_schema),
                       "fields": [], "compatibility": "BACKWARD"}, f)
        assert sr.latest_version(root) == 1
        assert [v for v, _ in sr.schema_history(root)] == [1]
        v2 = _s(repo=pa.string(), n=pa.int32(), extra=pa.string())
        assert sr.register_schema(root, v2) == 2
        assert sr.get_schema(root, 2) == v2   # orphan content gone


class TestIngestGuard:
    def _ds(self, tbl):
        return ray.data.from_arrow(tbl)

    def test_first_batch_registers(self, tmp_path):
        root = str(tmp_path)
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int32())})
        out, v = sr.ingest_guard(root, self._ds(t))
        assert v == 1 and out.take_all() == [{"repo": "r", "n": 1}]

    def test_old_producer_conforms_up(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, _s(repo=pa.string(), n=pa.int64(),
                                    extra=pa.string()))
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int32())})
        out, v = sr.ingest_guard(root, self._ds(t))
        assert v == 1
        got = out.take_all()[0]
        assert got == {"repo": "r", "n": 1, "extra": None}
        assert out.schema().base_schema.field("n").type == pa.int64()

    def test_new_column_auto_registers(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, V1)
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int32()),
                      "branch": ["main"]})
        out, v = sr.ingest_guard(root, self._ds(t))
        assert v == 2
        assert sr.get_schema(root).names == ["repo", "n", "branch"]
        assert out.take_all() == [{"repo": "r", "n": 1, "branch": "main"}]

    def test_incompatible_raises_before_data_moves(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, _s(repo=pa.string(), n=pa.string()))
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int32())})
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.ingest_guard(root, self._ds(t))

    def test_auto_register_false_rejects_evolution(self, tmp_path):
        root = str(tmp_path)
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.ingest_guard(root, self._ds(pa.table({"a": [1]})),
                            auto_register=False)
        sr.register_schema(root, V1)
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int32()),
                      "branch": ["main"]})
        with pytest.raises(sr.SchemaIncompatibleError):
            sr.ingest_guard(root, self._ds(t), auto_register=False)

    def test_widened_producer_bumps_registry(self, tmp_path):
        root = str(tmp_path)
        sr.register_schema(root, V1)
        t = pa.table({"repo": ["r"], "n": pa.array([1], pa.int64())})
        out, v = sr.ingest_guard(root, self._ds(t))
        assert v == 2
        assert sr.get_schema(root).field("n").type == pa.int64()
