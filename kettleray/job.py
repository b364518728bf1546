"""Job orchestration (≙ Kitchen: JobMeta/Job, SURVEY.md §3.2).

Kettle jobs are a sequential DAG of entries with hops conditioned on the
upstream Result (success / failure / unconditional), plus row passing
between entries (Copy rows to result). The Ray-native equivalent is
ordinary Python control flow on the driver; this module gives it the
same declared shape so job definitions stay data (and can carry retries,
conditional routing and result rows like JobEntryTrans chains).
"""

from __future__ import annotations

import time
import traceback
from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Sequence


@dataclass
class Result:
    """≙ org.pentaho.di.core.Result: success flag + carried rows/metrics."""
    success: bool = True
    rows: Any = None                  # ≙ copy-rows-to-result payload
    metrics: dict[str, Any] = field(default_factory=dict)
    error: str | None = None


@dataclass
class Entry:
    """One job entry. ``fn(result_from_upstream) -> Result | Any``
    (a non-Result return means success with that value as rows)."""
    name: str
    fn: Callable[[Result], Any]
    on_success: str | None = None     # next entry name
    on_failure: str | None = None
    retries: int = 0
    retry_delay_s: float = 0.0


class Job:
    """Sequential conditional-hop executor.

    entries run one at a time starting at ``start``; each entry's Result
    picks the success or failure hop. A missing hop ends the job. Every
    entry outcome is recorded in the job log (≙ job metrics/log tables).
    """

    def __init__(self, entries: Sequence[Entry], *, start: str | None = None):
        self.entries = {e.name: e for e in entries}
        if len(self.entries) != len(entries):
            raise ValueError("duplicate entry names")
        self.start = start or entries[0].name
        self.log: list[dict] = []

    def run(self, init: Result | None = None) -> Result:
        cur: str | None = self.start
        result = init or Result()
        seen_budget = len(self.entries) * 10  # loop guard
        while cur is not None and seen_budget > 0:
            seen_budget -= 1
            entry = self.entries[cur]
            attempt = 0
            while True:
                t0 = time.time()
                try:
                    out = entry.fn(result)
                    result = out if isinstance(out, Result) \
                        else Result(success=True, rows=out)
                except Exception as ex:
                    result = Result(success=False,
                                    error="".join(
                                        traceback.format_exception_only(
                                            type(ex), ex)).strip())
                dt = round(time.time() - t0, 3)
                self.log.append({"entry": entry.name,
                                 "attempt": attempt,
                                 "success": result.success,
                                 "sec": dt,
                                 "error": result.error})
                if result.success or attempt >= entry.retries:
                    break
                attempt += 1
                if entry.retry_delay_s:
                    time.sleep(entry.retry_delay_s)
            cur = entry.on_success if result.success else entry.on_failure
        return result
