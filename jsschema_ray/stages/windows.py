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

from jsschema_ray.stages._blocks import arrow_out


def round_half_away(x: np.ndarray) -> np.ndarray:
    """Round-half-away-from-zero — matches SQL/DuckDB ROUND, unlike
    numpy/pyarrow's default half-to-even. Engine-side integer scalings that
    feed DuckDB-oracled comparisons must use this (a value whose x100
    product lands exactly on .5 would otherwise diverge between engines)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _arrow_sorted(t, cols):
    """Sort an Arrow table by ``cols`` ascending with C-level sort_indices
    + take (single-chunk output). Replaces np.lexsort over pandas object
    arrays in the per-partition window bodies — measured 3.1x faster at a
    2M-row partition and byte-order-identical for int and utf-8 string
    keys (UTF-8 byte order preserves codepoint order, which is what both
    Python str comparison and np.lexsort use)."""
    import pyarrow.compute as pc

    si = pc.sort_indices(t, sort_keys=[(c, "ascending") for c in cols])
    return t.take(si).combine_chunks()


def _key_block_starts(arr) -> np.ndarray:
    """Start offsets of each equal-key run in an already-sorted Arrow
    array — adjacent not_equal in C, no Python comparisons. Adjacent NULL
    keys are ONE run (r5 ADVICE fix: SQL PARTITION BY puts all NULLs in
    one partition; the previous fill_null(True) matched pandas NaN != NaN
    and gave every NULL-keyed row its own window partition). A run starts
    where the values differ (both valid) or where validity flips."""
    import pyarrow as pa
    import pyarrow.compute as pc

    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if len(a) <= 1:
        return np.zeros(min(len(a), 1), dtype=np.int64)
    lo, hi = a.slice(0, len(a) - 1), a.slice(1)
    neq = pc.fill_null(pc.not_equal(hi, lo), False)
    vflip = pc.xor(pc.is_valid(hi), pc.is_valid(lo))
    starts = pc.or_(neq, vflip).to_numpy(zero_copy_only=False)
    return np.r_[0, np.flatnonzero(starts) + 1].astype(np.int64)


def hopping_windows(ds, ts: str = "ts", length_s: int = 7200,
                    hop_s: int = 3600, group_col: str = "event_type",
                    value: str | None = "value",
                    batch_size: int = 65536):
    """Hopping (sliding) window aggregate: windows of ``length_s`` starting
    every ``hop_s`` (length must be a multiple of hop). Each event belongs
    to length/hop windows — the explode happens INSIDE map_batches (k
    int-array copies, no Python loop) and lands in the same map-side
    combined grouped_sums as the tumbling path, so the shuffle carries
    per-(batch, window, group) partials, not exploded events. Output:
    window_start (hop-grid units), group, sum_value_x100, n_events."""
    import pyarrow as pa

    from jsschema_ray.stages.aggregates import grouped_sums

    assert length_s % hop_s == 0
    k = length_s // hop_s

    def prep(batch: "pa.Table") -> "pa.Table":
        us = batch.column(ts).combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        slot = us // (hop_s * 1_000_000)
        groups = batch.column(group_col).combine_chunks()
        cols = {
            "window_start": pa.array(
                np.concatenate([slot - i for i in range(k)])
            ),
            group_col: pa.chunked_array([groups] * k).combine_chunks(),
        }
        if value is not None:
            vx = round_half_away(
                batch.column(value).to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            cols["vx"] = pa.array(np.tile(vx, k))
        return pa.table(cols)

    exploded = ds.select_columns(
        [ts, group_col] + ([value] if value else [])
    ).map_batches(prep, batch_format="pyarrow", batch_size=batch_size,
                  zero_copy_batch=True)
    sums = {"sum_value_x100": "vx"} if value is not None else {}
    out = grouped_sums(exploded, ["window_start", group_col], sums,
                       count_alias="n_events")
    return out.sort(["window_start", group_col])


def rolling_windows(ds, key: str = "user_id", ts: str = "ts",
                    value: str | None = "value",
                    window_seconds: float = 600.0,
                    num_partitions: int = 64):
    """Per-key rolling time-RANGE aggregate — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN INTERVAL W
    PRECEDING AND CURRENT ROW)``.  Output one row per DISTINCT (key, ts):
    ``w_sum_x100`` (int64, x100 half-away scaling so the sum is
    integer-exact on both engines) and ``w_n`` (events in the window).
    Rows sharing (key, ts) have identical RANGE frames by definition, so
    collapsing them first is lossless AND makes the frame math peer-safe.

    Scale shape (same contract as session_windows): keys hash-partition
    into ``num_partitions`` coarse groups; each partition is computed in
    ONE vectorized pass with NO per-key loop — collapse to per-(key, ts)
    rows, sort, then block-encode (key_rank * span + ts_offset) so a
    single ``np.searchsorted`` finds every row's window start inside its
    own key's block (the W-clamp keeps queries from crossing key
    boundaries), and the windowed sums fall out of one global cumsum
    difference.  The block encoding bounds keys-per-partition x time-span
    to int64; the guard RAISES loudly (raise num_partitions) instead of
    wrapping."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    w_ns = int(round(window_seconds * 1e9))
    cols = [key, ts] + ([value] if value else [])

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    import pyarrow.compute as pc

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body: C sort by (key, ts), then the pandas
        # groupby([key, ts]) collapse becomes run detection over the
        # sorted pair (adjacent not_equal OR) + np.add.reduceat; the
        # block-encoded searchsorted frame math is unchanged.
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            return pa.table({
                key: g.column(key), ts: g.column(ts),
                "w_sum_x100": pa.array([], type=pa.int64()),
                "w_n": pa.array([], type=pa.int64()),
            })
        g = _arrow_sorted(g, [key, ts])
        n = g.num_rows
        vx = (round_half_away(
                  g.column(value).to_numpy(zero_copy_only=False) * 100
              ).astype("int64")
              if value else np.zeros(n, dtype="int64"))
        karr = g.column(key).combine_chunks()
        tarr = g.column(ts).combine_chunks()
        key_starts = _key_block_starts(karr)
        key_change = np.zeros(n, dtype=bool)
        key_change[key_starts] = True
        ts_change = np.ones(n, dtype=bool)
        if n > 1:
            ts_change[1:] = pc.fill_null(
                pc.not_equal(tarr.slice(1), tarr.slice(0, n - 1)), True
            ).to_numpy(zero_copy_only=False)
        run_starts = np.flatnonzero(key_change | ts_change)
        # collapsed per-(key, ts) rows
        run_vx = np.add.reduceat(vx, run_starts)
        run_c = np.diff(np.r_[run_starts, n]).astype("int64")
        tnum = (tarr.cast(pa.timestamp("ns")).cast(pa.int64())
                .to_numpy(zero_copy_only=False))[run_starts]
        # key rank over collapsed rows: count key changes at run starts
        kr = (np.cumsum(key_change[run_starts]) - 1).astype("int64")
        n_keys = int(kr[-1]) + 1
        tmin = int(tnum.min())
        span = int(tnum.max()) - tmin + w_ns + 2
        if n_keys and span > (2 ** 62) // n_keys:
            raise ValueError(
                f"rolling_windows block encoding would overflow int64: "
                f"{n_keys} keys x {span} ns span in one partition — "
                f"raise num_partitions (got {num_partitions})"
            )
        off = tnum - tmin
        comp = kr * span + off
        compq = kr * span + np.maximum(off - w_ns, 0)
        left = np.searchsorted(comp, compq, side="left")
        cs = np.concatenate([[0], np.cumsum(run_vx)])
        cn = np.concatenate([[0], np.cumsum(run_c)])
        idx = np.arange(len(run_starts))
        return pa.table({
            key: karr.take(run_starts),
            ts: tarr.take(run_starts),
            "w_sum_x100": pa.array((cs[idx + 1] - cs[left]).astype("int64")),
            "w_n": pa.array((cn[idx + 1] - cn[left]).astype("int64")),
        })

    return ds.select_columns(cols).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def rolling_rows_windows(ds, key: str = "user_id", ts: str = "ts",
                         tiebreak: str = "event_id",
                         value: str | None = "value",
                         n_rows: int | None = 5,
                         num_partitions: int = 64):
    """Per-key rolling ROWS-frame aggregate — SQL's
    ``SUM(v) OVER (PARTITION BY key ORDER BY ts, tiebreak
    ROWS BETWEEN n_rows-1 PRECEDING AND CURRENT ROW)``.  Unlike the
    RANGE frame (rolling_windows above), a ROWS frame is only
    well-defined under a TOTAL order, so a unique ``tiebreak`` column is
    required and becomes part of the output identity — one row per input
    event, with ``w_sum_x100`` (int64, x100 half-away scaling) and
    ``w_n`` (rows in the frame, < n_rows only near the key's start).
    ``n_rows=None`` makes the frame UNBOUNDED PRECEDING — per-key
    running totals (the cumulative-history feature), same single pass
    with the left edge pinned to the key-block start.

    Scale shape: keys hash-partition into ``num_partitions`` coarse
    groups (the only shuffle); each partition is one vectorized pass —
    lexsort by (key, ts, tiebreak), find key-block starts from adjacent
    inequality, then every frame is a cumsum difference with the left
    edge ``max(i - (n_rows-1), key_start)``.  No per-key loop, no block
    encoding needed (row offsets can't overflow)."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    if n_rows is not None and n_rows < 1:
        raise ValueError(f"n_rows must be >= 1 or None, got {n_rows}")
    cols = [key, ts, tiebreak] + ([value] if value else [])

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body (r3 VERDICT item 7): C-level sort + adjacent
        # not_equal replace the np.lexsort-over-object-arrays pandas body;
        # the frame math is the same cumsum difference.
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            return pa.table({
                key: g.column(key), tiebreak: g.column(tiebreak),
                "w_sum_x100": pa.array([], type=pa.int64()),
                "w_n": pa.array([], type=pa.int64()),
            })
        g = _arrow_sorted(g, [key, ts, tiebreak])
        n = g.num_rows
        vx = (round_half_away(
                  g.column(value).to_numpy(zero_copy_only=False) * 100
              ).astype("int64")
              if value else np.zeros(n, dtype="int64"))
        starts = _key_block_starts(g.column(key))
        key_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        idx = np.arange(n)
        left = (key_start if n_rows is None
                else np.maximum(idx - (n_rows - 1), key_start))
        cs = np.concatenate([[0], np.cumsum(vx)])
        return pa.table({
            key: g.column(key), tiebreak: g.column(tiebreak),
            "w_sum_x100": pa.array((cs[idx + 1] - cs[left]).astype("int64")),
            "w_n": pa.array((idx + 1 - left).astype("int64")),
        })

    return ds.select_columns(cols).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def event_deltas(ds, key: str = "user_id", ts: str = "ts",
                 tiebreak: str = "event_id", num_partitions: int = 64):
    """Per-key inter-arrival time — SQL's
    ``ts - LAG(ts) OVER (PARTITION BY key ORDER BY ts, tiebreak)`` as an
    int64 microsecond delta (NULL on each key's first event).  The
    sessionization/burst-detection feature primitive, exposed as its own
    per-event operator.  Same scale shape as rolling_rows_windows: one
    hash(key) shuffle, then per partition a single lexsort and one
    adjacent difference masked at key-block boundaries — no per-key
    loop."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    cols = [key, ts, tiebreak]

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body: sort + adjacent difference in C; each key
        # block's first row gets NULL via the pa.array mask.
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            return pa.table({
                key: g.column(key), tiebreak: g.column(tiebreak),
                "delta_us": pa.array([], type=pa.int64()),
            })
        g = _arrow_sorted(g, [key, ts, tiebreak])
        n = g.num_rows
        tus = (g.column(ts).cast(pa.timestamp("us")).cast(pa.int64())
               .to_numpy(zero_copy_only=False))
        delta = np.empty(n, dtype="int64")
        delta[0] = 0
        delta[1:] = tus[1:] - tus[:-1]
        starts = _key_block_starts(g.column(key))
        first = np.zeros(n, dtype=bool)
        first[starts] = True
        return pa.table({
            key: g.column(key), tiebreak: g.column(tiebreak),
            "delta_us": pa.array(delta, type=pa.int64(), mask=first),
        })

    return ds.select_columns(cols).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def ntile(ds, key: str = "user_id", ts: str = "ts",
          tiebreak: str = "event_id", k: int = 4,
          num_partitions: int = 64):
    """SQL ``NTILE(k) OVER (PARTITION BY key ORDER BY ts, tiebreak)`` —
    per-key equal-ish buckets under a total order (SQL sizing: with
    n = q*k + r, the first r tiles get q+1 rows).  The per-key
    train/val/test or curriculum-split primitive.  Same one-shuffle
    shape as rolling_rows_windows: lexsort per partition, per-row rank
    and key size from block starts, tile from the closed-form SQL
    sizing — no per-key loop.  Output: (key, tiebreak, tile 1..k)."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body: C sort + block starts; tile math unchanged.
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            return pa.table({
                key: g.column(key), tiebreak: g.column(tiebreak),
                "tile": pa.array([], type=pa.int64()),
            })
        g = _arrow_sorted(g, [key, ts, tiebreak])
        starts = _key_block_starts(g.column(key))
        sizes = np.diff(np.r_[starts, g.num_rows])
        key_start = np.repeat(starts, sizes)
        n = np.repeat(sizes, sizes).astype("int64")
        rank0 = np.arange(g.num_rows, dtype="int64") - key_start
        q, r = n // k, n % k
        big = r * (q + 1)  # rows covered by the q+1-sized leading tiles
        tile = np.where(
            rank0 < big,
            rank0 // np.maximum(q + 1, 1),
            r + np.where(q > 0, (rank0 - big) // np.maximum(q, 1), 0),
        ) + 1
        return pa.table({
            key: g.column(key), tiebreak: g.column(tiebreak),
            "tile": pa.array(tile.astype("int64")),
        })

    return ds.select_columns([key, ts, tiebreak]).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def window_ranks(ds, key: str = "user_id", order: str = "ts",
                 tiebreak: str = "event_id", num_partitions: int = 64):
    """The SQL rank family in one pass — per key, ordered by ``order``:

    * ``row_number``   — 1..n under the (order, tiebreak) TOTAL order;
    * ``rank``         — ties on ``order`` share the FIRST position of
      their run (gaps after ties);
    * ``dense_rank``   — ties share consecutive positions (no gaps);
    * ``percent_rank`` — (rank-1)/(n-1), 0.0 for a single-row key (SQL
      PERCENT_RANK; exact float parity — both engines divide the same
      small integers, IEEE division is correctly rounded);
    * ``cume_dist``    — (#rows whose order value <= current)/n (SQL
      CUME_DIST: the current tie-run's END over the key size).

    Same one-shuffle shape as the other per-key window ops: hash(key)
    partitions; per partition one lexsort, then key-block starts and
    order-value-change flags give all five ranks as vectorized cumsum /
    repeat arithmetic — no per-key loop.  Output: (key, tiebreak,
    row_number, rank, dense_rank, percent_rank, cume_dist)."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    import pyarrow.compute as pc

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body: one C sort, then key-change and order-change
        # flags from adjacent not_equal give all three ranks as the same
        # cumsum/repeat arithmetic as before.
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if not n:
            empty = pa.array([], type=pa.int64())
            emptyf = pa.array([], type=pa.float64())
            return pa.table({
                key: g.column(key), tiebreak: g.column(tiebreak),
                "row_number": empty, "rank": empty, "dense_rank": empty,
                "percent_rank": emptyf, "cume_dist": emptyf,
            })
        g = _arrow_sorted(g, [key, order, tiebreak])
        idx = np.arange(n, dtype="int64")
        starts = _key_block_starts(g.column(key))
        key_change = np.zeros(n, dtype=bool)
        key_change[starts] = True
        key_start = np.repeat(starts, np.diff(np.r_[starts, n]))
        row_number = idx - key_start + 1
        # a rank run begins where the key OR the order value changes
        o = g.column(order).combine_chunks()
        o_change = np.ones(n, dtype=bool)
        if n > 1:
            o_change[1:] = pc.fill_null(
                pc.not_equal(o.slice(1), o.slice(0, n - 1)), True
            ).to_numpy(zero_copy_only=False)
        run_start_flag = key_change | o_change
        run_starts = np.flatnonzero(run_start_flag)
        run_start = np.repeat(run_starts,
                              np.diff(np.r_[run_starts, n]))
        rank = run_start - key_start + 1
        # dense: count run boundaries since the key started (inclusive)
        sizes = np.diff(np.r_[starts, n])
        dense = np.cumsum(run_start_flag)
        dense_rank = dense - np.repeat(dense[starts], sizes) + 1
        # percent_rank / cume_dist: key size and tie-run END per row
        nk = np.repeat(sizes, sizes).astype("int64")
        run_len = np.diff(np.r_[run_starts, n])
        run_end = np.repeat(np.r_[run_starts, n][1:], run_len)
        percent_rank = np.where(nk > 1, (rank - 1) / np.maximum(nk - 1, 1),
                                0.0)
        cume_dist = (run_end - key_start) / nk
        return pa.table({
            key: g.column(key), tiebreak: g.column(tiebreak),
            "row_number": pa.array(row_number.astype("int64")),
            "rank": pa.array(rank.astype("int64")),
            "dense_rank": pa.array(dense_rank.astype("int64")),
            "percent_rank": pa.array(percent_rank.astype("float64")),
            "cume_dist": pa.array(cume_dist.astype("float64")),
        })

    return ds.select_columns([key, order, tiebreak]).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def first_last_per_key(ds, key: str, order: str, tiebreak: str,
                       cols: list[str], num_partitions: int = 64):
    """Per-key FIRST_VALUE / LAST_VALUE under the (order, tiebreak)
    total order — first-touch / last-touch attribution.  Output one row
    per key: (key, first_<col>..., last_<col>...).

    Scale shape (r4: pre-trim added, Arrow body): each batch first sorts
    and keeps only its LOCAL first+last row per key — the global
    first/last under a total order is always among the per-batch
    firsts/lasts, so at most 2 rows per (key, batch) cross the one
    hash(key) shuffle regardless of how wide ``cols`` is; each partition
    replays the same boundary-row take over the survivors."""
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    def boundary_rows(t: "pa.Table") -> "pa.Table":
        """Sorted (key, order, tiebreak) -> each key block's first+last
        row (deduped when a key has one row)."""
        t = _arrow_sorted(t, [key, order, tiebreak])
        starts = _key_block_starts(t.column(key))
        ends = np.r_[starts[1:] - 1, t.num_rows - 1]
        idx = np.union1d(starts, ends)  # sorted, unique
        return t.take(idx)

    def pre_trim(batch: "pa.Table") -> "pa.Table":
        if not batch.num_rows:
            return batch.append_column(
                "__part", pa.array([], type=pa.int32()))
        b = boundary_rows(batch)
        part = (hash64(b.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            data = {key: g.column(key)}
            for c in cols:
                data[f"first_{c}"] = g.column(c)
                data[f"last_{c}"] = g.column(c)
            return pa.table(data)
        g = _arrow_sorted(g, [key, order, tiebreak])
        starts = _key_block_starts(g.column(key))
        ends = np.r_[starts[1:] - 1, g.num_rows - 1]
        data = {key: g.column(key).take(starts)}
        for c in cols:
            v = g.column(c)
            data[f"first_{c}"] = v.take(starts)
            data[f"last_{c}"] = v.take(ends)
        return pa.table(data)

    want = [key, order, tiebreak] + [c for c in cols
                                     if c not in (key, order, tiebreak)]
    return ds.select_columns(want).map_batches(
        pre_trim, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def session_windows(ds, key: str = "user_id", ts: str = "ts",
                    gap_seconds: float = 1800.0,
                    value: str | None = "value",
                    num_partitions: int = 64):
    """Per-(key, session) aggregate: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Output: key, session_id (0-based per key), session_start (epoch s),
    n_events [, value_sum_x100].

    Scale shape: keys are HASH-PARTITIONED into ``num_partitions`` coarse
    groups and each partition is sessionized in ONE vectorized pandas pass
    (sort by key+ts, key-change|gap flag, per-key cumsum, one groupby
    aggregate) — O(num_partitions) Ray groups instead of O(keys), so
    millions of user keys cost the same dispatch as 64. Partitioning
    assumption: one coarse partition (≈ n_rows / num_partitions rows)
    fits a worker's heap; raise num_partitions with cluster size."""
    import numpy as _np
    import pyarrow as pa

    from jsschema_ray.state.hll import hash64

    cols = [key, ts] + ([value] if value else [])

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % _np.uint64(num_partitions)).astype(_np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        # Arrow-native body: after the C sort by (key, ts), sessions are
        # contiguous runs, so the whole pandas groupby becomes run
        # detection (gap > threshold OR key change) + np.add.reduceat —
        # one row per session, already in (key, session_id) order.
        g = g.drop_columns(["__part"])
        if not g.num_rows:
            return pa.table({
                key: g.column(key),
                "session_id": pa.array([], type=pa.int64()),
                "session_start": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                **({"value_sum_x100": pa.array([], type=pa.int64())}
                   if value else {}),
            })
        g = _arrow_sorted(g, [key, ts])
        n = g.num_rows
        karr = g.column(key).combine_chunks()
        tns = (g.column(ts).combine_chunks().cast(pa.timestamp("ns"))
               .cast(pa.int64()).to_numpy(zero_copy_only=False))
        key_starts = _key_block_starts(karr)
        new_sess = np.zeros(n, dtype=bool)
        new_sess[key_starts] = True
        if n > 1:
            new_sess[1:] |= (tns[1:] - tns[:-1]) > gap_seconds * 1e9
        sess_starts = np.flatnonzero(new_sess)
        # per-key 0-based session id: session ordinal minus the ordinal of
        # its key's first session
        sess_of_key = np.searchsorted(sess_starts, key_starts)
        n_sess_per_key = np.diff(np.r_[sess_of_key, len(sess_starts)])
        session_id = (np.arange(len(sess_starts), dtype="int64")
                      - np.repeat(sess_of_key, n_sess_per_key))
        cols_out = {
            key: karr.take(sess_starts),
            "session_id": pa.array(session_id),
            "session_start": pa.array(tns[sess_starts] // 1_000_000_000),
            "n_events": pa.array(
                np.diff(np.r_[sess_starts, n]).astype("int64")),
        }
        if value is not None:
            vx = round_half_away(
                g.column(value).to_numpy(zero_copy_only=False) * 100
            ).astype("int64")
            cols_out["value_sum_x100"] = pa.array(
                np.add.reduceat(vx, sess_starts))
        return pa.table(cols_out)

    return ds.select_columns(cols).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def lag_lead(ds, key: str, order: str, tiebreak: str, col: str,
             lags: tuple = (1,), leads: tuple = (1,),
             num_partitions: int = 64):
    """Generic SQL ``LAG(col, n)`` / ``LEAD(col, n)`` per key under the
    (order, tiebreak) total order — the feature-engineering neighbor
    lookup generalizing :func:`event_deltas` (which is the lag-1 ts
    delta). Output: (key, tiebreak, lag<n>_<col>..., lead<n>_<col>...),
    NULL where the offset crosses the key boundary, any column type
    (values move via Arrow take, never through numpy casts).

    Scale shape: the standard one-shuffle per-key window — hash(key)
    partitions, one C sort per partition, then each offset is ONE
    vectorized take with a boundary mask. No per-key loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    for n in list(lags) + list(leads):
        if n < 1:
            raise ValueError(f"lag/lead offsets must be >= 1, got {n}")

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"])
        n = g.num_rows
        vals = g.column(col).combine_chunks()
        if not n:
            cols = {key: g.column(key), tiebreak: g.column(tiebreak)}
            for off in lags:
                cols[f"lag{off}_{col}"] = vals
            for off in leads:
                cols[f"lead{off}_{col}"] = vals
            return pa.table(cols)
        g = _arrow_sorted(g, [key, order, tiebreak])
        vals = g.column(col).combine_chunks()
        starts = _key_block_starts(g.column(key))
        sizes = np.diff(np.r_[starts, n])
        key_start = np.repeat(starts, sizes)
        key_end = key_start + np.repeat(sizes, sizes)
        idx = np.arange(n, dtype=np.int64)
        cols = {key: g.column(key), tiebreak: g.column(tiebreak)}

        def shifted(off: int, lead: bool):
            src = idx + off if lead else idx - off
            ok = (src < key_end) if lead else (src >= key_start)
            src = np.where(ok, src, 0)
            taken = vals.take(pa.array(src))
            return pc.if_else(pa.array(ok), taken,
                              pa.nulls(n, vals.type))

        for off in lags:
            cols[f"lag{off}_{col}"] = shifted(off, lead=False)
        for off in leads:
            cols[f"lead{off}_{col}"] = shifted(off, lead=True)
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys([key, order, tiebreak, col]))
    ).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def funnel_stages(ds, key: str, order: str, tiebreak: str,
                  stage_col: str, stages: list,
                  num_partitions: int = 64):
    """Ordered funnel matching — for each key, greedily match the stage
    sequence (``stages[0]`` then the first ``stages[1]`` STRICTLY after
    it under the (order, tiebreak) total order, then ...): the
    conversion-funnel / curriculum-progress primitive. Output one row
    per key: (key, reached int64 = stages completed in order,
    match<i>_<tiebreak> nullable int64 = the matched event per stage).
    First-match (greedy) semantics — the same chain SQL expresses as a
    cascade of QUALIFY ROW_NUMBER()=1 self-joins, which is the oracle.

    Scale shape: the standard one-shuffle per-key window; per partition
    ONE C sort, then one masked ``np.minimum.reduceat`` segmented min
    per stage (len(stages) passes over index arrays, never values) — no
    per-key loop. Greedy is optimal here: the earliest valid match never
    hurts later stages (matching later can only shrink the suffix)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    if len(stages) < 1:
        raise ValueError("stages must be non-empty")
    if len(set(stages)) != len(stages):
        raise ValueError("stages must be distinct")

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"])
        n = g.num_rows
        out_cols = [f"match{i + 1}_{tiebreak}"
                    for i in range(len(stages))]
        if not n:
            cols = {key: g.column(key),
                    "reached": pa.array([], pa.int64())}
            for c in out_cols:
                cols[c] = pa.array([], g.column(tiebreak).type)
            return pa.table(cols)
        g = _arrow_sorted(g, [key, order, tiebreak])
        starts = _key_block_starts(g.column(key))
        sizes = np.diff(np.r_[starts, n])
        nkeys = len(starts)
        key_start = np.repeat(starts, sizes)
        idx = np.arange(n, dtype=np.int64)
        svals = g.column(stage_col).combine_chunks()
        INF = np.int64(n)  # sentinel: no match
        # prev match position per KEY (start: one before the key block)
        prev = starts - 1
        matches = []
        for s in stages:
            ok = pc.fill_null(pc.equal(svals, s), False).to_numpy(
                zero_copy_only=False) & (idx > np.repeat(prev, sizes)) \
                & (np.repeat(prev, sizes) < INF)
            cand = np.where(ok, idx, INF)
            # segmented min per key block: first valid position
            m = np.minimum.reduceat(np.r_[cand, INF], starts)[:nkeys] \
                if n else cand
            matches.append(m)
            prev = m
        reached = np.zeros(nkeys, dtype=np.int64)
        for m in matches:
            reached += (m < INF).astype(np.int64)
        tb = g.column(tiebreak).combine_chunks()
        cols = {key: g.column(key).take(pa.array(starts)),
                "reached": pa.array(reached)}
        for c, m in zip(out_cols, matches):
            hit = m < INF
            taken = tb.take(pa.array(np.where(hit, m, 0)))
            cols[c] = pc.if_else(pa.array(hit), taken,
                                 pa.nulls(nkeys, tb.type))
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys([key, order, tiebreak, stage_col]))
    ).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def cohort_retention(ds, key: str = "user_id", ts: str = "ts",
                     period_us: int = 604_800_000_000,
                     num_partitions: int = 64, batch_size: int = 65536):
    """Cohort retention matrix — the activation/retention report every
    event-analytics pipeline runs: bucket each key's FIRST-ever activity
    period as its cohort, then count distinct keys active at each offset
    (cohort_week, offset_weeks, n_users). period_us defaults to one week
    of timestamp[us] ticks; rows with a NULL key or NULL ts drop.

    Exactness contract: period index = epoch_us // period_us in int64 —
    but numpy's ``//`` floors while DuckDB's ``//`` truncates toward
    zero, so NEGATIVE epochs (pre-1970 timestamps) would silently
    diverge; this stage raises on them instead (the repo's
    fail-loud-on-domain-edge discipline).

    Scale shape: NO join — a key's cohort is derivable from its own
    rows, so each batch pre-trims to distinct (key, period) pairs (one
    ``pyarrow.Table.group_by``, map-side combine), pairs hash-partition
    on key (the ONLY wide shuffle — distinct pairs, never raw events),
    and each partition computes per-key min-period + offsets in one C
    sort + ``np.repeat`` (no per-key loop). Every surviving pair is a
    distinct (key, offset) observation, so the final count is one
    map-side-combined grouped_sums COUNT(*) over width-2 rows."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.stages.aggregates import grouped_sums
    from jsschema_ray.state.hll import hash64

    if period_us <= 0:
        raise ValueError("period_us must be positive")

    def pre_trim(batch: "pa.Table") -> "pa.Table":
        keep = pc.and_(pc.is_valid(batch.column(key)),
                       pc.is_valid(batch.column(ts)))
        b = batch.select([key, ts]).filter(keep)
        # normalize to µs ticks FIRST: parquet carries timestamp[us] but
        # pandas-origin blocks carry timestamp[ns], and a bare int64 cast
        # of ns ticks would silently shift every period index 1000x
        tsv = b.column(ts).combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(tsv) and tsv.min() < 0:
            raise ValueError(
                "cohort_retention: negative epoch timestamps — numpy "
                "floor division and SQL truncating division disagree "
                "below 1970; shift the timeline or pre-filter")
        pairs = pa.table({
            key: b.column(key),
            "__wk": pa.array(tsv // np.int64(period_us)),
        }).group_by([key, "__wk"]).aggregate([])
        part = (hash64(pairs.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return pairs.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"]).group_by(
            [key, "__wk"]).aggregate([])
        n = g.num_rows
        if not n:
            return pa.table({
                "cohort_week": pa.array([], pa.int64()),
                "offset_weeks": pa.array([], pa.int64()),
            })
        g = _arrow_sorted(g, [key, "__wk"])
        starts = _key_block_starts(g.column(key))
        sizes = np.diff(np.r_[starts, n])
        wk = g.column("__wk").combine_chunks() \
            .to_numpy(zero_copy_only=False)
        cohort = np.repeat(wk[starts], sizes)
        return pa.table({
            "cohort_week": pa.array(cohort),
            "offset_weeks": pa.array(wk - cohort),
        })

    pairs = ds.select_columns([key, ts]).map_batches(
        pre_trim, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")
    return grouped_sums(pairs, ["cohort_week", "offset_weeks"], {},
                        count_alias="n_users", batch_size=batch_size)


def hopping_distinct(ds, ts: str = "ts", key: str = "user_id",
                     length_s: int = 7200, hop_s: int = 3600,
                     num_partitions: int = 64, batch_size: int = 65536):
    """Sliding-window COUNT(DISTINCT key): distinct actives per hopping
    window of ``length_s`` starting every ``hop_s`` — the
    concurrent-users / rolling-actives metric. Output:
    (window_start hop-grid units, n_distinct). Rows with NULL ts or
    NULL key drop (SQL COUNT(DISTINCT) semantics on both sides).

    Scale shape: the hopping explode happens INSIDE map_batches (k
    int-array copies like hopping_windows), and the exploded pairs feed
    aggregates.grouped_count_distinct, whose per-batch pre-trim
    collapses to DISTINCT (window, key) pairs before the one
    hash(window) shuffle — so the wire carries distinct pairs, never
    exploded events."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.stages.aggregates import grouped_count_distinct

    assert length_s % hop_s == 0
    k = length_s // hop_s

    def prep(batch: "pa.Table") -> "pa.Table":
        keep = pc.and_(pc.is_valid(batch.column(ts)),
                       pc.is_valid(batch.column(key)))
        b = batch.select([ts, key]).filter(keep)
        us = b.column(ts).combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy(zero_copy_only=False)
        slot = us // (hop_s * 1_000_000)
        keys = b.column(key).combine_chunks()
        return pa.table({
            "window_start": pa.array(
                np.concatenate([slot - i for i in range(k)])),
            key: pa.chunked_array([keys] * k).combine_chunks(),
        })

    exploded = ds.select_columns([ts, key]).map_batches(
        prep, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True)
    return grouped_count_distinct(exploded, "window_start", key,
                                  num_partitions=num_partitions,
                                  batch_size=batch_size)


def transition_counts(ds, key: str, order: str, tiebreak: str, col: str,
                      num_partitions: int = 64):
    """First-order transition matrix of ``col`` per key — SQL
    ``LAG(col) OVER (PARTITION BY key ORDER BY order, tiebreak)`` rolled
    up to (from_value, to_value, n_transitions): the Markov-chain /
    user-journey summary of event analytics. Pairs crossing a key
    boundary drop (LAG's NULL row), as do pairs with a NULL on either
    side (the oracle spells the same IS NOT NULL filter).

    Scale shape: the standard one-shuffle per-key window (hash(key)
    partitions, one C sort per partition, prev = one vectorized take
    with a boundary mask), then each partition collapses to its local
    (from, to) COUNT partials via one pyarrow group_by, so the second
    (tiny) shuffle moves O(distinct transitions x partitions) rows
    through grouped_sums — never the event pairs themselves."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.stages.aggregates import grouped_sums
    from jsschema_ray.state.hll import hash64

    def add_part(batch: "pa.Table") -> "pa.Table":
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"])
        n = g.num_rows
        empty = pa.table({"from_value": g.column(col).slice(0, 0),
                          "to_value": g.column(col).slice(0, 0)})
        if not n:
            return empty
        g = _arrow_sorted(g, [key, order, tiebreak])
        vals = g.column(col).combine_chunks()
        starts = _key_block_starts(g.column(key))
        prev_idx = np.arange(n, dtype=np.int64) - 1
        keep = np.ones(n, dtype=bool)
        keep[starts] = False  # first row of each key has no LAG
        prev = vals.take(pa.array(np.where(keep, prev_idx, 0)))
        keep &= pc.is_valid(prev).to_numpy(zero_copy_only=False)
        keep &= pc.is_valid(vals).to_numpy(zero_copy_only=False)
        return pa.table({"from_value": prev, "to_value": vals}).filter(
            pa.array(keep))

    pairs = ds.select_columns(
        list(dict.fromkeys([key, order, tiebreak, col]))
    ).map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")
    return grouped_sums(pairs, ["from_value", "to_value"], {},
                        count_alias="n_transitions")


def interval_coverage(ds, key: str, start: str, end: str,
                      num_partitions: int = 64,
                      batch_size: int = 65536):
    """Per-key total length of the UNION of [start, end) int64 intervals
    — the classic sweep-line "covered time" statistic (machine
    utilization, stitched session seconds, speech/VAD coverage). SQL
    mirror: ``MAX(e) OVER (PARTITION BY key ORDER BY s, e ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` as the running previous-max,
    then ``SUM(GREATEST(e - GREATEST(s, COALESCE(pm, s)), 0))``.
    Emits (key, covered, n_intervals) — all int64-exact, so the SQL
    mirror is bit-equal. Rows with NULL start/end drop (SQL arithmetic
    on NULL yields NULL and GREATEST/SUM skip them only per-expression —
    callers wanting SQL-literal NULL rows must not pre-filter; this
    operator documents the drop). Intervals with end <= start contribute
    0 but still count in n_intervals, matching the mirror.

    Scale shape (the rolling_windows contract): keys hash-co-partition;
    each partition runs ONE Arrow C sort by (key, s, e) and ONE
    vectorized sweep — the segmented running max is a single
    ``np.maximum.accumulate`` over ``e + key_rank * span`` (monotone
    block encoding: cross-key carry is impossible because every later
    key's block sits strictly above the previous key's maximum), and the
    per-key sums fall out of ``np.add.reduceat``. The block encoding
    bounds keys-per-partition x value-span to int64; the guard RAISES
    (raise num_partitions) instead of wrapping."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    def add_part(batch: "pa.Table") -> "pa.Table":
        b = batch.select([key, start, end]).filter(
            pc.and_(pc.is_valid(batch.column(start)),
                    pc.is_valid(batch.column(end))))
        part = (hash64(b.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return b.append_column("__part", pa.array(part))

    def per_partition(g: "pa.Table") -> "pa.Table":
        g = g.drop_columns(["__part"])
        kt = g.schema.field(key).type
        if not g.num_rows:
            return pa.table({
                key: pa.array([], type=kt),
                "covered": pa.array([], type=pa.int64()),
                "n_intervals": pa.array([], type=pa.int64()),
            })
        g = _arrow_sorted(g, [key, start, end])
        n = g.num_rows
        s = g.column(start).to_numpy(zero_copy_only=False).astype(np.int64)
        e = g.column(end).to_numpy(zero_copy_only=False).astype(np.int64)
        karr = g.column(key).combine_chunks()
        key_starts = _key_block_starts(karr)
        kr = np.zeros(n, dtype=np.int64)
        kr[key_starts] = 1
        kr = np.cumsum(kr) - 1
        n_keys = int(kr[-1]) + 1
        lo = int(min(e.min(), s.min()))
        span = int(e.max()) - lo + 2
        if n_keys and span > (2 ** 62) // n_keys:
            raise ValueError(
                f"interval_coverage block encoding would overflow int64: "
                f"{n_keys} keys x {span} value span in one partition — "
                f"raise num_partitions (got {num_partitions})")
        cm = np.maximum.accumulate((e - lo) + kr * span) - kr * span + lo
        # previous-max: inclusive cummax shifted one row; key-start rows
        # have no predecessor -> GREATEST(s, COALESCE(pm, s)) == clamp at s
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = cm[:-1]
        prev[key_starts] = np.iinfo(np.int64).min
        contrib = np.maximum(e - np.maximum(s, prev), 0)
        covered = np.add.reduceat(contrib, key_starts)
        counts = np.diff(np.r_[key_starts, n]).astype(np.int64)
        return pa.table({
            key: karr.take(key_starts),
            "covered": pa.array(covered.astype(np.int64)),
            "n_intervals": pa.array(counts),
        })

    return ds.select_columns([key, start, end]).map_batches(
        add_part, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def monotonicity_violations(ds, key: str, order: str, tiebreak: str,
                            col: str, strict: bool = False,
                            num_partitions: int = 64):
    """SEQUENCE-VALIDITY audit: per key, how many ADJACENT steps of
    ``col`` go BACKWARDS under the (order, tiebreak) total order? The
    ingest sanity check of an event/metrics pipeline (timestamps out of
    order, counters decreasing, versions regressing) — a cross-row
    constraint the single-value reference cannot express
    (/root/reference/validator/validator.go:57; extends SURVEY §2.C to
    ordered-sequence form). Output one row per key:

        (key, n_pairs int64, n_violations int64)

    where n_pairs counts adjacent in-key pairs (rows-with-a-predecessor
    = group size - 1) and a violation is ``value < prev``
    (``strict=True`` audits strictly-increasing sequences and counts
    ``value <= prev``). Rows with NULL ``col`` drop FIRST (SQL LAG over
    a filtered CTE), so the mirror

        WITH f AS (SELECT ... WHERE col IS NOT NULL),
        l AS (SELECT key, col, LAG(col) OVER (
                  PARTITION BY key ORDER BY order, tiebreak) AS prev
              FROM f)
        SELECT key, COUNT(prev) AS n_pairs,
               CAST(SUM(CASE WHEN col < prev THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations
        FROM l GROUP BY key

    is exactly reproduced (comparisons are exact on any orderable type —
    the values themselves never round-trip through floats). A key with
    one surviving row reports (0, 0), like the SQL. NULL keys form ONE
    group (SQL PARTITION BY; the _key_block_starts contract). The
    (order, tiebreak) pair must be a TOTAL order per key — with
    duplicate (order, tiebreak) rows the adjacent pairing is ambiguous
    in BOTH engines.

    Scale shape: the standard one-shuffle per-key window (lag_lead's) —
    hash(key) partitions, ONE Arrow C sort per partition, then the
    whole audit is one vectorized ``pc.less`` over adjacent slices +
    one np.add.reduceat per key. No per-key loop, no per-row Python."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    def add_part(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(col)))
        part = (hash64(batch.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column("__part", pa.array(part))

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if not n:
            e = pa.array([], pa.int64())
            return pa.table({key: g.column(key),
                             "n_pairs": e, "n_violations": e})
        g = _arrow_sorted(g, [key, order, tiebreak])
        vals = g.column(col).combine_chunks()
        starts = _key_block_starts(g.column(key))
        sizes = np.diff(np.r_[starts, n])
        cmp = pc.less_equal if strict else pc.less
        viol = np.zeros(n, dtype=np.int64)
        if n > 1:
            viol[1:] = pc.fill_null(
                cmp(vals.slice(1), vals.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
        viol[starts] = 0  # pairs never cross a key boundary
        return pa.table({
            key: g.column(key).take(pa.array(starts)),
            "n_pairs": pa.array(sizes - 1),
            "n_violations": pa.array(np.add.reduceat(viol, starts)),
        })

    return ds.select_columns([key, order, tiebreak, col]).map_batches(
        add_part, batch_format="pyarrow", batch_size=262144,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def longest_streaks(ds, key: str, ts_col: str,
                    unit_us: int = 86_400_000_000,
                    num_partitions: int = 64):
    """GAPS-AND-ISLANDS activity audit: per key, the longest run of
    CONSECUTIVE active units (days by default) plus the total distinct
    active units and the number of maximal runs — the retention /
    engagement-continuity statistic of an event log, and the classic
    SQL "islands" problem (day - ROW_NUMBER() OVER (... ORDER BY day)
    groups consecutive days). A cross-row constraint the single-value
    reference cannot express (/root/reference/validator/validator.go:57;
    extends SURVEY §2.C to ordered-sequence form alongside
    monotonicity_violations). Output one row per key:

        (key, n_units int64, n_streaks int64, longest_streak int64)

    where unit = floor-division of the epoch-microsecond timestamp by
    ``unit_us`` (exact int64 arithmetic — the value never touches a
    float), duplicates within a unit collapse (DISTINCT), and a streak
    is a maximal run of units with consecutive values. Rows with NULL
    ``ts_col`` drop FIRST (mirror: WHERE ts IS NOT NULL); NULL keys
    form ONE group (SQL PARTITION BY). The SQL mirror

        WITH d AS (SELECT DISTINCT key,
                          epoch_us(ts) // <unit_us> AS unit
                   FROM t WHERE ts IS NOT NULL),
        r AS (SELECT key, unit, unit - ROW_NUMBER() OVER (
                  PARTITION BY key ORDER BY unit) AS grp FROM d),
        s AS (SELECT key, grp, COUNT(*) AS len FROM r GROUP BY key, grp)
        SELECT key, SUM(len) AS n_units, COUNT(*) AS n_streaks,
               MAX(len) AS longest_streak
        FROM s GROUP BY key

    is int64-exact (note DuckDB ``//`` truncates toward zero while this
    floor-divides — identical for the non-negative epochs this targets;
    a pre-1970 timestamp RAISES rather than silently diverging).

    Scale shape: per-batch (key, unit) DISTINCT partials via one Arrow
    group_by (map-side combine — raw event rows never shuffle), ONE
    hash(key) co-partition of the distinct partials, then per partition
    one Arrow C sort + vectorized run detection (np.diff over unit,
    run/key starts via flatnonzero, lengths via np.diff of starts,
    per-key max via np.maximum.reduceat). No per-key loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    def add_part(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(ts_col)))
        ts = batch.column(ts_col).combine_chunks()
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            ts = ts.cast(pa.int64())
        if len(ts) and pc.min(ts).as_py() < 0:
            raise ValueError(
                "longest_streaks requires non-negative epochs (pre-1970 "
                "timestamps floor-divide differently from SQL's //)")
        unit = pc.divide(ts, pa.scalar(unit_us, pa.int64()))
        t = pa.table({key: batch.column(key), "__unit": unit})
        # map-side DISTINCT partial: collapse this batch's duplicates
        t = t.group_by([key, "__unit"], use_threads=False).aggregate([])
        part = (hash64(t.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        # merge cross-batch duplicates, then ONE C sort
        g = g.group_by([key, "__unit"], use_threads=False).aggregate([])
        n = g.num_rows
        if not n:
            e = pa.array([], pa.int64())
            return pa.table({key: g.column(key), "n_units": e,
                             "n_streaks": e, "longest_streak": e})
        g = _arrow_sorted(g, [key, "__unit"])
        units = g.column("__unit").to_numpy(zero_copy_only=False)
        kstarts = _key_block_starts(g.column(key))
        # a run starts at every key start and wherever the unit step != 1
        breaks = np.flatnonzero(np.diff(units) != 1) + 1
        return _run_stats_table(
            g.column(key), kstarts, np.union1d(kstarts, breaks), n,
            key, ("n_units", "n_streaks", "longest_streak"))

    return ds.select_columns([key, ts_col]).map_batches(
        add_part, batch_format="pyarrow", batch_size=262144,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")


def _run_stats_table(keycol, kstarts: np.ndarray, rstarts: np.ndarray,
                     n: int, key_name: str, names: tuple) -> "pa.Table":
    """Per-key run statistics over a key-sorted column: given the start
    offsets of each key block (``kstarts``) and of each maximal run
    (``rstarts``, a superset of ``kstarts``), emit one row per key with
    (rows-in-key, runs-in-key, longest-run) under ``names`` — all
    vectorized (np.diff / searchsorted / maximum.reduceat, no per-key
    loop). Shared by longest_streaks (runs = consecutive units) and
    value_runs (runs = equal adjacent values)."""
    import pyarrow as pa

    rlens = np.diff(np.r_[rstarts, n])
    # index of each key's first run inside rstarts (kstarts ⊆ rstarts)
    kfirst = np.searchsorted(rstarts, kstarts)
    return pa.table({
        key_name: keycol.take(pa.array(kstarts)),
        names[0]: pa.array(np.diff(np.r_[kstarts, n])),
        names[1]: pa.array(np.diff(np.r_[kfirst, len(rstarts)])),
        names[2]: pa.array(np.maximum.reduceat(rlens, kfirst)),
    })


def value_runs(ds, key: str, order: str, tiebreak: str, value: str,
               num_partitions: int = 64):
    """RUN-LENGTH audit (gaps-and-islands by VALUE CHANGE): per key,
    order the rows by the (order, tiebreak) total order and collapse
    maximal runs of EQUAL adjacent ``value`` — emitting row count, run
    count, and the longest run per key. The state-dwell / flapping
    statistic of an event log (how long does a user stay on one event
    type before switching), and the other classic SQL islands shape
    (cumulative SUM over a LAG-change flag). A cross-row ordered
    constraint the single-value reference cannot express
    (/root/reference/validator/validator.go:57; completes the ordered-
    sequence family alongside monotonicity_violations and
    longest_streaks). Output one row per key:

        (key, n_rows int64, n_runs int64, longest_run int64)

    Semantics, mirrored bit-exactly by the SQL islands idiom: rows with
    a NULL ``order`` or ``tiebreak`` drop FIRST (the mirror's WHERE);
    NULL keys form ONE group (SQL PARTITION BY); NULL values compare by
    IS DISTINCT FROM (adjacent NULLs extend a run — exactly DuckDB's
    LAG(value) IS DISTINCT FROM value change flag). (order, tiebreak)
    must be a total order within each key for the run structure to be
    deterministic — same contract as monotonicity_violations. All
    outputs are pure int64 counts, so engine == SQL bit-equal.

    Scale shape: ONE hash(key) co-partition of the projected rows (the
    ordering is per key, so raw rows must co-locate — the stated
    assumption: one key-hash partition fits a worker), then per
    partition one Arrow C sort by (key, order, tiebreak) and vectorized
    run detection shared with longest_streaks (_run_stats_table). No
    per-key loop; no driver-side state."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from jsschema_ray.state.hll import hash64

    def add_part(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.is_valid(batch.column(order)),
                       pc.is_valid(batch.column(tiebreak)))
        t = batch.select([key, order, tiebreak, value]).filter(keep)
        part = (hash64(t.column(key).combine_chunks())
                % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column("__part", pa.array(part))

    def per_partition(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["__part"])
        n = g.num_rows
        if not n:
            e = pa.array([], pa.int64())
            return pa.table({key: g.column(key), "n_rows": e,
                             "n_runs": e, "longest_run": e})
        g = _arrow_sorted(g, [key, order, tiebreak])
        kstarts = _key_block_starts(g.column(key))
        # a run starts at every key start and wherever the value IS
        # DISTINCT FROM its predecessor (_key_block_starts is exactly
        # that predicate: not_equal on valid pairs OR a validity flip)
        vstarts = _key_block_starts(g.column(value))
        return _run_stats_table(
            g.column(key), kstarts, np.union1d(kstarts, vstarts), n,
            key, ("n_rows", "n_runs", "longest_run"))

    return ds.select_columns([key, order, tiebreak, value]).map_batches(
        add_part, batch_format="pyarrow", batch_size=262144,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(per_partition, batch_format="pyarrow")
