"""Mirror of the driver's correctness gate: run every queries() entry that
has an oracle_sql() and compare against DuckDB on the same parquet —
row count, column names, and order-insensitive values (columns sorted by
name, rows sorted, floats compared exactly after the 4-decimal rounding
both sides apply)."""

import math

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.01"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as m

    return m


def _pairs(contract):
    qs, oracles = contract.queries(), contract.oracle_sql()
    return sorted(oracles.keys() & qs.keys())


def test_every_oracle_has_query():
    import __ray_entry__ as m

    assert set(m.oracle_sql()) <= set(m.queries())


def _all_pairs():
    # collection-time list: every oracle is parity-tested automatically
    # (oracle_sql() needs no Ray session; it only materializes the image
    # metadata mirror)
    import __ray_entry__ as m

    return sorted(set(m.oracle_sql()) & set(m.queries()))


@pytest.mark.parametrize("name", _all_pairs())
def test_oracle_parity(name, con, contract):
    got = _canon(_to_pandas(contract.queries()[name](SF)))
    want = _canon(con.execute(contract.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        # dtype drift guard: the driver's schema_match compares dtypes, so
        # an int64 column silently promoted to float64 (e.g. by a pandas
        # .where/ffill) must fail HERE, not in CORRECTNESS
        assert a.dtype.kind == b.dtype.kind, (
            f"{name}.{c}: dtype {a.dtype} != oracle {b.dtype}"
        )
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            assert (
                (a.astype(float) - b.astype(float)).abs().max() or 0.0
            ) < 1e-9, f"{name}.{c} differs"
        else:
            same = (a.astype(str).to_numpy() == b.astype(str).to_numpy())
            assert same.all(), f"{name}.{c} differs at {(~same).argmax()}"


def test_entry_smoke(contract):
    res = _to_pandas(contract.entry())
    assert len(res) >= 0 and "l_orderkey" in res.columns
