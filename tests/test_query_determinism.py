"""Every queries() entry must be deterministic across runs — the driver's
correctness gate runs each once, but the resume contract and the recorded
row hashes assume re-execution reproduces results exactly (no
arrival-order top-k, no unseeded sampling, no scheduler-dependent
selections)."""

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _canon(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


def _names():
    import __ray_entry__ as m

    return sorted(m.queries())


@pytest.mark.parametrize("name", _names())
def test_query_deterministic(name, ray_session):
    import __ray_entry__ as m

    q = m.queries()[name]
    a = _canon(q(SF))
    b = _canon(q(SF))
    pd.testing.assert_frame_equal(a, b)
