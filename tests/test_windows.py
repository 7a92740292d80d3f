"""Session-window sessionization: correctness vs a pandas reference at a
key count (15k) where any per-key dispatch would dominate — the stage must
produce O(num_partitions) Ray groups regardless of key count
(stages/windows.py). bench.py --scaling measures the wall-clock shape."""

import pytest
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


@pytest.mark.parametrize("seed,gap", [(3, 60.0), (11, 600.0), (29, 5.0)])
def test_session_windows_randomized_differential(ray_session, seed, gap):
    """Randomized sessionization differential vs an independent per-key
    pandas reference: random keys, duplicate timestamps, varied gaps —
    parameterizations the fixed DuckDB oracle never exercises."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from jsschema_ray.stages.windows import session_windows

    rng = np.random.default_rng(seed)
    n = 3000
    pdf = pd.DataFrame({
        "user_id": rng.integers(0, 97, size=n),
        "ts": pd.to_datetime(
            rng.integers(0, 200_000, size=n), unit="s"
        ),
        "value": np.round(rng.normal(50, 10, size=n), 2),
    })
    got = session_windows(
        rd.from_pandas(pdf).repartition(4), gap_seconds=gap,
        num_partitions=8,
    ).to_pandas().sort_values(["user_id", "session_id"]).reset_index(
        drop=True)

    # independent reference: per-key loop (intentionally naive)
    rows = []
    for uid, g in pdf.sort_values("ts", kind="stable").groupby("user_id"):
        sess, start, cnt, vx = -1, None, 0, 0
        prev = None
        out_g = []
        for _, r in g.iterrows():
            t = r["ts"].timestamp()
            if prev is None or (t - prev) > gap:
                if sess >= 0:
                    out_g.append((uid, sess, int(start), cnt, vx))
                sess += 1
                start, cnt, vx = t, 0, 0
            cnt += 1
            vx += int(np.sign(r["value"]) * np.floor(abs(r["value"]) * 100 + 0.5))
            prev = t
        out_g.append((uid, sess, int(start), cnt, vx))
        rows.extend(out_g)
    want = pd.DataFrame(
        rows, columns=["user_id", "session_id", "session_start",
                       "n_events", "value_sum_x100"]
    ).sort_values(["user_id", "session_id"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        got[want.columns].astype("int64"), want.astype("int64")
    )
