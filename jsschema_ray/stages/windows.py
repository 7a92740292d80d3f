"""Stream-shaped windowing over an event-time table (ray_guide
'Streaming-shaped workloads': the events table is an ordered, partitioned
log; windows are computed per key over the sorted group — no watermarks /
late-data semantics, stated assumption: one key's events fit a worker).

* tumbling windows: pure batch math (floor(epoch/size)) — see the
  window_events query in __ray_entry__.py;
* session windows: gap-based sessionization per key via
  groupby(key).map_groups with a vectorized pandas body (sort by ts,
  new-session flag on gap > threshold, cumsum -> session ids).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero — matches SQL/DuckDB ROUND, unlike
    numpy/pyarrow's default half-to-even. Engine-side integer scalings that
    feed DuckDB-oracled comparisons must use this (a value whose x100
    product lands exactly on .5 would otherwise diverge between engines)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def session_windows(ds, key: str = "user_id", ts: str = "ts",
                    gap_seconds: float = 1800.0,
                    value: str | None = "value"):
    """Per-(key, session) aggregate: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Output: key, session_id (0-based per key), session_start (epoch s),
    n_events [, value_sum_x100]."""

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts, kind="stable")
        t = g[ts]
        gaps = t.diff().dt.total_seconds()
        new_sess = (gaps.isna() | (gaps > gap_seconds)).astype("int64")
        sess = new_sess.cumsum() - 1
        out = pd.DataFrame({key: g[key].to_numpy(), "session_id": sess.to_numpy()})
        # normalize to ns first: arrow timestamps may land as datetime64[us]
        epoch = (t.astype("datetime64[ns]").astype("int64")
                 // 1_000_000_000).to_numpy()
        out["epoch"] = epoch
        if value is not None and value in g.columns:
            out["vx"] = round_half_away(g[value].to_numpy() * 100).astype("int64")
        agg = {"epoch": ("epoch", "min"), "n_events": ("epoch", "size")}
        if "vx" in out.columns:
            agg["value_sum_x100"] = ("vx", "sum")
        res = out.groupby([key, "session_id"], sort=True).agg(**agg).reset_index()
        return res.rename(columns={"epoch": "session_start"})

    cols = [key, ts] + ([value] if value else [])
    return ds.select_columns(cols).groupby(key).map_groups(
        per_key, batch_format="pandas"
    )
