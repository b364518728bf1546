"""Pipeline registry / config-driven builder + source readers."""

import json
import os

import pyarrow as pa
import ray.data

from kettleray.io import source
from kettleray.pipeline import Pipeline, get_operator, operators


def test_registry_has_core_operators():
    ops = operators()
    for name in ("replay_lww", "scd2_history", "filter_rows", "group_by",
                 "split_field_to_rows", "exact_dedup", "paragraph_dedup",
                 "dedup_corpus", "lsh_probe", "abort_after",
                 "write_to_log"):
        assert name in ops
    assert callable(get_operator("replay_lww"))


def test_config_driven_pipeline_runs():
    from kettleray.ops.rowops import Cond
    t = pa.table({"a": [1, 2, 3, 4], "b": ["x", "y", "x", "z"]})
    pipe = Pipeline.from_config([
        {"op": "filter_rows", "condition": Cond("a", ">", 1)},
        {"op": "value_mapper", "field": "b",
         "mapping": {"x": "ex"}, "target_field": "b2"},
    ])
    out = pipe.run(ray.data.from_arrow(t)).take_all()
    assert len(out) == 3
    assert {r["b2"] for r in out} == {"ex", "y", "z"}


def test_read_json_lines_with_paths(tmp_path):
    p = tmp_path / "data.jsonl"
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"a": i, "nest": {"v": i * 10}}) + "\n")
    ds = source.read_json_lines(str(p), fields={"a": "a", "v": "nest.v"})
    rows = sorted(ds.take_all(), key=lambda r: r["a"])
    assert rows[2] == {"a": 2, "v": 20}


def test_read_text_with_error_routing(tmp_path):
    p = tmp_path / "data.txt"
    with open(p, "w") as f:
        f.write("1,ok\nbad-line\n2,fine\n")

    def parse(line):
        num, word = line.split(",")
        return {"num": int(num), "word": word}

    good, bad = source.read_text_with_errors(str(p), parse)
    g = sorted(good.take_all(), key=lambda r: r["num"])
    b = bad.take_all()
    assert [r["num"] for r in g] == [1, 2]
    assert len(b) == 1 and "bad-line" in b[0]["line"]


def test_fixed_width_and_generate_and_grid(tmp_path):
    p = tmp_path / "fixed.txt"
    with open(p, "w") as f:
        f.write("alpha 123\nbeta  456\n")
    ds = source.read_fixed_width(str(p), [("name", 0, 6), ("num", 6, 9)])
    rows = sorted(ds.take_all(), key=lambda r: r["num"])
    assert rows[0] == {"name": "alpha", "num": "123"}

    g = source.generate_rows(4, {"k": "const"}).take_all()
    assert len(g) == 4 and all(r["k"] == "const" for r in g)

    grid = source.data_grid([{"a": 1}, {"a": 2}]).take_all()
    assert sorted(r["a"] for r in grid) == [1, 2]


def test_get_file_names(tmp_path):
    for name in ("x.txt", "y.txt"):
        with open(os.path.join(tmp_path, name), "w") as f:
            f.write("data")
    rows = source.get_file_names(str(tmp_path), pattern="*.txt").take_all()
    assert {r["name"] for r in rows} == {"x.txt", "y.txt"}
    assert all(r["size"] == 4 for r in rows)


def test_read_xml(tmp_path):
    p = tmp_path / "data.xml"
    p.write_text(
        "<catalog>"
        "<book id='1'><title>Ray</title><price>10</price></book>"
        "<book id='2'><title>Arrow</title><price>20</price></book>"
        "</catalog>")
    ds = source.read_xml(str(p), "book",
                         {"id": "@id", "title": "title", "price": "price"})
    rows = sorted(ds.take_all(), key=lambda r: r["id"])
    assert rows == [{"id": "1", "title": "Ray", "price": "10"},
                    {"id": "2", "title": "Arrow", "price": "20"}]


def test_sessionize_gap_logic():
    import pyarrow as pa
    import ray.data as rd
    from kettleray.ops import aggregates as ag
    t = pa.table({
        "user": ["u", "u", "u", "v"],
        "ts": pa.array([0, 10, 1_000_000, 5], type=pa.timestamp("us")),
    })
    out = ag.sessionize(rd.from_arrow(t), "user", "ts", gap_us=100,
                        num_partitions=2).take_all()
    by = {(r["user"], r["ts"].microsecond + r["ts"].second * 10**6):
          r["session_id"] for r in out}
    assert by[("u", 0)] == 1 and by[("u", 10)] == 1
    assert by[("u", 1_000_000)] == 2
    assert by[("v", 5)] == 1


def test_pipeline_from_json(tmp_path):
    import json as _json
    spec = [{"op": "add_constants", "constants": {"tag": "x"}}]
    p = tmp_path / "pipe.json"
    p.write_text(_json.dumps(spec))
    import pyarrow as pa
    import ray.data as rd
    out = Pipeline.from_json(str(p)).run(
        rd.from_arrow(pa.table({"a": [1, 2]}))).take_all()
    assert all(r["tag"] == "x" for r in out)


def test_sql_statements_output():
    import pyarrow as pa
    import ray.data as rd
    from kettleray.io import output
    t = pa.table({"id": [1], "name": ["O'Hara"], "x": [None]})
    stmts = output.sql_statements(rd.from_arrow(t), "people").take_all()
    assert stmts[0]["statement"] == \
        "INSERT INTO people (id, name, x) VALUES (1, 'O''Hara', NULL);"


def test_generate_random_values_deterministic_and_partition_invariant():
    from kettleray.io import source
    a = source.generate_random_values(
        100, {"x": "number", "k": "integer", "s": "string", "u": "uuid"},
        seed=7, num_blocks=1).take_all()
    b = source.generate_random_values(
        100, {"x": "number", "k": "integer", "s": "string", "u": "uuid"},
        seed=7, num_blocks=8).take_all()
    key = lambda r: r["id"]
    assert sorted(a, key=key) == sorted(b, key=key)
    xs = [r["x"] for r in a]
    assert all(0.0 <= x < 1.0 for x in xs)
    assert len({r["u"] for r in a}) == 100


def test_get_system_info_row():
    from kettleray.io import source
    rows = source.get_system_info(["hostname", "os_name", "cpu_count",
                                   "pid"]).take_all()
    assert len(rows) == 1
    assert rows[0]["cpu_count"] >= 1


def test_pipeline_variable_substitution(tmp_path):
    import json
    from kettleray.pipeline import Pipeline
    spec = [
        {"op": "filter_rows", "cond": ["v", ">=", "${MIN_V}"]},
        {"op": "add_constants", "constants": {"source": "${SRC}-copy"}},
    ]
    p = tmp_path / "spec.json"
    p.write_text(json.dumps(spec))
    import pyarrow as pa
    import ray.data
    from kettleray.ops.rowops import Cond

    pipe = Pipeline.from_json(str(p), variables={"MIN_V": 5, "SRC": "s3"})
    # whole-string ${MIN_V} keeps its native int; embedded ${SRC} templatess
    assert pipe.steps[0]["cond"][2] == 5
    assert pipe.steps[1]["constants"]["source"] == "s3-copy"
    # unknown variable fails loudly
    import pytest
    with pytest.raises(KeyError):
        Pipeline.from_json(str(p), variables={"MIN_V": 5})
    ds = ray.data.from_arrow(pa.table({"v": list(range(10))}))
    cond = pipe.steps[0]["cond"]
    out = Pipeline.from_config([
        {"op": "filter_rows", "condition": Cond(cond[0], cond[1], cond[2])},
        pipe.steps[1],
    ]).run(ds).take_all()
    assert sorted(r["v"] for r in out) == [5, 6, 7, 8, 9]
    assert all(r["source"] == "s3-copy" for r in out)


def test_formula_op_vectorized_and_sandboxed():
    import pytest
    import pyarrow as pa
    import ray.data
    from kettleray.ops.formula import compile_formula, formula
    ds = ray.data.from_arrow(pa.table({
        "a": [1.0, 5.0, 10.0], "b": [2.0, 2.0, 2.0]}))
    out = formula(ds, "c", "a * b if a > 4 else a + b").take_all()
    assert [r["c"] for r in out] == [3.0, 10.0, 20.0]
    out2 = formula(ds, "f", "sqrt(maximum(a, b)) + 1",
                   round_to=4).take_all()
    assert out2[2]["f"] == round(10 ** 0.5 + 1, 4)
    for bad in ("__import__('os')", "a.__class__", "open('x')",
                "[1 for _ in a]", "a[0]"):
        with pytest.raises(ValueError):
            compile_formula(bad)


def test_run_module_end_to_end(tmp_path):
    """python -m kettleray.run: the `ray job submit` entrypoint shape."""
    import json
    import subprocess
    import sys
    spec = [{"op": "replay_lww", "num_partitions": 4}]
    sp = tmp_path / "spec.json"
    sp.write_text(json.dumps(spec))
    # materialize a small derived event stream to parquet as job input
    from kettleray.gen.derive import derive_events
    inp = str(tmp_path / "events")
    derive_events("/root/testdata/sf0.001").write_parquet(inp)
    out = str(tmp_path / "state")
    r = subprocess.run(
        [sys.executable, "-m", "kettleray.run", "--spec", str(sp),
         "--input", inp, "--output", out, "--output-mode", "state",
         "--num-cpus", "4"],
        capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["version"] == 1 and res["rows"] == 452
    from kettleray.io import sink
    man = sink.read_manifest(out)
    assert man.watermark == res["watermark"] >= 0


def test_output_writers_roundtrip(tmp_path):
    """Text/JSON/SQL output sinks: write, read back, verify."""
    import duckdb
    import pyarrow as pa
    import ray.data
    from kettleray.io import output, source
    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int64()),
                  "s": pa.array(["a", "b'c", None])})
    ds = ray.data.from_arrow(t)
    csv_dir = str(tmp_path / "csv")
    output.write_csv(ds, csv_dir)
    back = source.read_csv(csv_dir).take_all()
    assert sorted(r["k"] for r in back) == [1, 2, 3]
    json_dir = str(tmp_path / "json")
    output.write_json(ds, json_dir)
    back2 = ray.data.read_json(json_dir).take_all()
    assert sorted(r["k"] for r in back2) == [1, 2, 3]
    stmts = [r["statement"]
             for r in output.sql_statements(ds, "tgt").take_all()]
    assert len(stmts) == 3
    con = duckdb.connect()
    con.execute("CREATE TABLE tgt (k BIGINT, s VARCHAR)")
    for s in stmts:
        con.execute(s)
    got = con.execute("SELECT k, s FROM tgt ORDER BY k").fetchall()
    assert got == [(1, "a"), (2, "b'c"), (3, None)]


def test_cdc_envelope_roundtrip(tmp_path):
    """Debezium-envelope encode -> decode is lossless, including an
    all-insert file (JSON infers `before` as null type) and deletes
    (row image carried in `before`)."""
    import pyarrow as pa
    import ray.data
    from kettleray.io import source
    ev = pa.table({
        "repo": ["r1", "r1", "r2", "r2"],
        "path": ["a", "a", "b", "b"],
        "commit": ["c1", "c2", "c3", "c4"],
        "lang": ["py", "py", None, "go"],
        "content": ["x", "", "y", "z"],
        "op": ["insert", "delete", "insert", "update"],
        "commit_seq": pa.array([1, 2, 3, 4], type=pa.int64()),
    })
    out = str(tmp_path / "env")
    # two single-block writes: one all-insert file, one with the delete
    source.write_cdc_envelope(
        ray.data.from_arrow(ev.slice(2, 2)), out)
    source.write_cdc_envelope(
        ray.data.from_arrow(ev.slice(0, 2)), out)
    back = sorted(source.read_cdc_envelope(out + "/").take_all(),
                  key=lambda r: r["commit_seq"])
    orig = sorted(ev.to_pylist(), key=lambda r: r["commit_seq"])
    assert back == orig


def test_cdc_envelope_rejects_unknown_op(tmp_path):
    import json
    import pytest
    import ray.data
    from kettleray.io import source
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"payload": {
        "before": None, "after": {"repo": "r", "path": "p",
                                  "commit": "c", "lang": "l",
                                  "content": "x"},
        "op": "t", "ts_ms": 1, "source": {"lsn": 1}}}) + "\n")
    with pytest.raises(Exception, match="unknown envelope op"):
        source.read_cdc_envelope(str(p)).take_all()


def test_sub_pipeline_nested_spec():
    """sub_pipeline (≙ Mapping / Trans-Executor): nested spec with its
    own ${VAR} bindings, nested two levels deep."""
    from kettleray.ops.rowops import Cond
    t = pa.table({"a": [1, 2, 3, 4, 5], "b": ["x", "y", "x", "z", "x"]})
    pipe = Pipeline.from_config([
        {"op": "filter_rows", "condition": Cond("a", ">", 1)},
        {"op": "sub_pipeline",
         "steps": [
             {"op": "value_mapper", "field": "b",
              "mapping": {"x": "${X_OUT}"}, "target_field": "b2"},
             {"op": "sub_pipeline",
              "steps": [{"op": "filter_rows",
                         "condition": Cond("b2", "<>", "z")}]},
         ],
         "variables": {"X_OUT": "ex"}},
    ])
    out = sorted(pipe.run(ray.data.from_arrow(t)).take_all(),
                 key=lambda r: r["a"])
    assert [r["a"] for r in out] == [2, 3, 5]
    assert [r["b2"] for r in out] == ["y", "ex", "ex"]


def test_flow_utilities_dummy_log_delay_abort(caplog):
    import logging
    import time

    import pytest

    from kettleray.ops import rowops

    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64())})
    ds = ray.data.from_arrow(t)
    assert rowops.dummy(ds) is ds
    with caplog.at_level(logging.INFO, logger="kettleray.rows"):
        out = rowops.write_to_log(ds, fields=["a"], limit=2).take_all()
    assert len(out) == 3          # pass-through intact
    t0 = time.time()
    assert len(rowops.delay(ds, seconds_per_block=0.2).take_all()) == 3
    assert time.time() - t0 >= 0.2
    assert rowops.abort_after(ds, max_rows=3) is not None
    with pytest.raises(rowops.AbortError, match="2 rows > 1"):
        rowops.abort_after(ds.limit(2), max_rows=1)
