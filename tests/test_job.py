"""Job orchestration: conditional hops, retries, result rows."""

from kettleray.job import Entry, Job, Result


def test_success_path_carries_rows():
    j = Job([
        Entry("load", lambda r: [1, 2, 3], on_success="sum"),
        Entry("sum", lambda r: Result(True, rows=sum(r.rows))),
    ])
    out = j.run()
    assert out.success and out.rows == 6
    assert [e["entry"] for e in j.log] == ["load", "sum"]


def test_failure_routes_to_failure_hop():
    def boom(r):
        raise RuntimeError("nope")

    j = Job([
        Entry("try", boom, on_success="good", on_failure="cleanup"),
        Entry("good", lambda r: "unreachable"),
        Entry("cleanup", lambda r: Result(True, rows="cleaned")),
    ])
    out = j.run()
    assert out.success and out.rows == "cleaned"
    assert j.log[0]["success"] is False and "nope" in j.log[0]["error"]


def test_retries_then_succeed():
    calls = {"n": 0}

    def flaky(r):
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("transient")
        return "ok"

    j = Job([Entry("flaky", flaky, retries=5)])
    out = j.run()
    assert out.success and out.rows == "ok" and calls["n"] == 3
    assert len(j.log) == 3


def test_retries_exhausted_fails():
    def always(r):
        raise ValueError("hard")

    j = Job([Entry("always", always, retries=2)])
    out = j.run()
    assert not out.success and len(j.log) == 3
