"""Per-step runtime metrics (≙ Kettle BaseStep counters + StepStatus +
StepPerformanceSnapShot — the reference's only perf instrumentation)."""

import pyarrow as pa
import ray.data

from kettleray.metrics import PipelineMetrics
from kettleray.pipeline import Pipeline


def _events(n=1000):
    def _mk(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        return pa.table({
            "repo": pa.array([f"r{i % 7}" for i in ids]),
            "path": pa.array([f"p{i % 13}" for i in ids]),
            "n": pa.array(ids, pa.int64()),
        })
    return ray.data.range(n).map_batches(_mk, batch_format="pyarrow")


def test_step_status_counts_match_execution():
    m = PipelineMetrics("t1", snapshot_interval_s=0.25)
    pipe = Pipeline.from_config([
        {"op": "filter_rows", "condition": {
            "field": "n", "op": "<", "value": 500}},
        {"op": "select_values", "select": ["repo", "n"]},
    ])
    out = pipe.run(_events(1000), metrics=m)
    n_out = out.count()                      # executes the pipeline
    assert n_out == 500

    st = m.step_status()
    rows = {r["step"]: r for r in st.to_pylist()}
    assert list(st["step"].to_pylist()) == [
        "input", "0:filter_rows", "1:select_values"]
    assert rows["input"]["lines_written"] == 1000
    assert rows["0:filter_rows"]["lines_read"] == 1000
    assert rows["0:filter_rows"]["lines_written"] == 500
    assert rows["1:select_values"]["lines_read"] == 500
    assert rows["1:select_values"]["lines_written"] == 500
    # projection dropped a column -> fewer bytes than the filter step
    assert (rows["1:select_values"]["bytes_written"]
            < rows["0:filter_rows"]["bytes_written"])
    for r in rows.values():
        assert r["lines_rejected"] == 0
        assert r["speed_rows_per_s"] > 0


def test_counter_is_passthrough():
    m = PipelineMetrics("t2")
    ds = _events(200)
    counted = m.count(ds, "x")
    a = ds.to_pandas().sort_values(["repo", "path", "n"]).reset_index(
        drop=True)
    b = counted.to_pandas().sort_values(["repo", "path", "n"]).reset_index(
        drop=True)
    assert a.equals(b)


def test_rejected_channel_counts_error_stream():
    from kettleray.ops.rowops import Rule, data_validator
    m = PipelineMetrics("t3")
    ds = _events(300)
    good, bad = data_validator(ds, [Rule(field="n", max_val=249)])
    good = m.count(ds=good, step="validate")
    bad = m.count_rejected(bad, "validate")
    assert good.count() == 250
    assert bad.count() == 50
    st = {r["step"]: r for r in m.step_status().to_pylist()}
    assert st["validate"]["lines_written"] == 250
    assert st["validate"]["lines_rejected"] == 50


def test_performance_snapshots_sum_to_totals():
    m = PipelineMetrics("t4", snapshot_interval_s=0.2)
    pipe = Pipeline.from_config([
        {"op": "select_values", "select": ["repo", "n"], "name": "proj"},
    ])
    out = pipe.run(_events(2000), metrics=m)
    assert out.count() == 2000
    snaps = m.performance_snapshots()
    per_step: dict[str, int] = {}
    for r in snaps.to_pylist():
        per_step[r["step"]] = per_step.get(r["step"], 0) + r["rows"]
        assert r["t_offset_s"] >= 0.0
    assert per_step["input"] == 2000
    assert per_step["proj"] == 2000


def test_reset_clears_counters():
    m = PipelineMetrics("t5")
    m.count(_events(50), "a").count()
    assert {r["step"]: r["lines_written"]
            for r in m.step_status().to_pylist()}["a"] == 50
    m.reset()
    assert m.step_status().num_rows == 0
