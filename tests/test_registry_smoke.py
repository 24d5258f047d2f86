"""Registry-wide smoke: EVERY __ray_entry__ queries() entry runs at sf0.001
and returns a well-formed result, and every oracle_sql() entry parses in
DuckDB (cheap EXPLAIN, no execution).  Catches a broken import, a renamed
column constant, or a stale oracle the moment it lands — the full value
comparison lives in tools/check_oracles.py and the driver's gate."""

import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_every_query_runs_and_every_oracle_parses(ray_session):
    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for a query that does not exist"

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    for name, sql in oracles.items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as ex:  # pragma: no cover - the assert carries the name
            raise AssertionError(f"oracle for {name} does not parse: {ex}") from ex
    con.close()

    failures = []
    for name, fn in qs.items():
        try:
            out = fn(SF)
            df = out if isinstance(out, pd.DataFrame) else (
                out.to_pandas() if isinstance(out, pa.Table) else out.to_pandas()
            )
            assert df is not None and len(df) >= 0
            if len(df):
                assert len(df.columns) > 0
        except Exception as ex:
            failures.append(f"{name}: {type(ex).__name__}: {ex}")
    assert not failures, "\n".join(failures)
