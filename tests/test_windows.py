"""Session-window sessionization: correctness vs a pandas reference at a
key count (15k) where any per-key dispatch would dominate — the stage must
produce O(num_partitions) Ray groups regardless of key count
(stages/windows.py). bench.py --scaling measures the wall-clock shape."""

import numpy as np
import pandas as pd


def _reference_sessions(df, gap_s):
    out = []
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("ts", kind="stable")
        gaps = g["ts"].diff().dt.total_seconds()
        sess = ((gaps.isna()) | (gaps > gap_s)).astype(int).cumsum() - 1
        for sid, sg in g.groupby(sess):
            out.append((uid, sid,
                        int(sg["ts"].astype("datetime64[ns]").astype("int64").min()
                            // 1_000_000_000),
                        len(sg)))
    return sorted(out)


def test_session_windows_many_keys(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.windows import session_windows

    rng = np.random.default_rng(3)
    n = 40_000
    n_keys = 15_000
    uid = rng.integers(0, n_keys, size=n)
    ts = pd.to_datetime(
        rng.integers(0, 3_000_000, size=n), unit="s"
    )
    df = pd.DataFrame({"user_id": uid, "ts": ts})
    ds = rd.from_pandas(df).repartition(8)
    got = session_windows(ds, key="user_id", ts="ts", gap_seconds=600.0,
                          value=None).to_pandas()
    got_t = sorted(
        (int(r.user_id), int(r.session_id), int(r.session_start),
         int(r.n_events))
        for r in got.itertuples()
    )
    assert got_t == _reference_sessions(df, 600.0)
