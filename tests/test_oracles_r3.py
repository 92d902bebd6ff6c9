"""Round-3 oracle guards: the queries that were `no_oracle` in
CORRECTNESS_r02 now replay in DuckDB — this mirrors the driver's
compare (sorted columns, exact value equality) at sf0.001 so the
contract can't drift between rounds."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _compare(name, got, exp):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    got, exp = _canon(got), _canon(exp)
    assert list(got.columns) == list(exp.columns), name
    assert len(got) == len(exp), name
    for c in got.columns:
        a, b = got[c].to_numpy(), exp[c].to_numpy()
        if a.dtype.kind == "f":
            assert (a == b.astype(float)).all(), (name, c)
        else:
            assert (a == b).all(), (name, c)


R3_ORACLED = [
    "gtfs_envelope",
    "gtfs_line_features",
    "gtfs_convex_hull",
]


@pytest.mark.parametrize("name", R3_ORACLED)
def test_r3_oracle_matches(ray_session, con, name):
    import __ray_entry__ as e
    from geotile.queries import QUERIES

    sql = e.oracle_sql()[name]
    _compare(name, QUERIES[name](SF), con.execute(sql).df())
