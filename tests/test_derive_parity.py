"""The Ray-side derived event stream must match DERIVED_EVENTS_SQL exactly
(this is what makes the whole CDC core DuckDB-oracle-checkable)."""

import duckdb
import pytest

from kettleray.gen.derive import DERIVED_EVENTS_SQL, derive_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.sql(f"CREATE VIEW documents AS SELECT * FROM "
          f"read_parquet('{SF_DIR}/documents.parquet')")
    return c


def test_derived_events_match_sql(con):
    ray_rows = derive_events(SF_DIR).take_all()
    sql = f'WITH {DERIVED_EVENTS_SQL} SELECT * FROM ev'
    duck = con.sql(sql).fetchall()
    cols = ["repo", "path", "commit", "lang", "content", "op", "commit_seq"]
    a = sorted(tuple(r[c] for c in cols) for r in ray_rows)
    b = sorted(duck)
    assert len(a) == len(b) and a == b
