"""Global uniqueness constraint: a key column's value may appear exactly
once across the whole dataset; violation rows = ALL rows of any duplicated
key (SURVEY.md §2.C; reference analogue is row-local uniqueItems only,
test/arrayunique*.json — the global form is new, BASELINE axes A+B).

Scale design (SURVEY.md §7 hard part 3 — Zipf-skewed phash):
  1. per-block pre-aggregation: `pc.value_counts` inside map_batches emits
     (key, partial_count) pairs — a hot key leaves each block as ONE row no
     matter how many times it appears there, so the shuffle payload is
     O(distinct keys per block), not O(rows); this is the skew-salting
     effect without explicit salts (the block is the salt);
  2. partial counts hash-bucket into ~num_buckets groups, each reduced by
     ONE vectorized pandas groupby (not a per-key Ray aggregate);
  3. keys with total > 1 are collected (bounded: duplicate KEYS are rare
     even when duplicate ROWS are many) and broadcast via `ray.put`; a
     final map_batches pass flags member rows with a vectorized `pc.is_in`
     — no second all-to-all shuffle ever touches the raw rows.

The wide `bytes` column never enters the shuffle: step 1 projects to the
key column only (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _pack(tbl: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue().to_pybytes()


def _unpack(b: bytes) -> pa.Table:
    return pa.ipc.open_stream(pa.BufferReader(b)).read_all()


def _precount(column: str, num_buckets: int):
    from jsschema_ray.state.hll import hash64, normalize_zeros

    def fn(batch: pa.Table) -> pa.Table:
        # -0.0/+0.0 float keys must count as ONE key (SQL GROUP BY merges
        # them; value_counts hashes them apart)
        vc = pc.value_counts(
            normalize_zeros(batch.column(column).combine_chunks()))
        values = vc.field("values")
        counts = vc.field("counts").cast(pa.int64())
        bucket = (hash64(values) % np.uint64(num_buckets)).astype(np.int32)
        order = np.argsort(bucket, kind="stable")
        tbl = pa.table({column: values, "partial_count": counts}).take(
            pa.array(order)
        )
        sb = bucket[order]
        bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
        out_b, out_blob = [], []
        for b in range(num_buckets):
            lo, hi = bounds[b], bounds[b + 1]
            if lo == hi:
                continue
            out_b.append(b)
            out_blob.append(_pack(tbl.slice(lo, hi - lo)))
        return pa.table(
            {
                "bucket": pa.array(out_b, type=pa.int32()),
                "blob": pa.array(out_blob, type=pa.binary()),
            }
        )

    return fn


def duplicate_keys(ds, column: str, batch_size: int = 262144,
                   num_buckets: int = 64):
    """Dataset of (column, dup_count) for keys appearing more than once.

    Reduce strategy: per-batch partial counts are packed into ONE Arrow IPC
    blob per (batch, bucket), so the all-to-all exchange moves
    O(batches × buckets) rows instead of O(distinct keys) — Ray's shuffle
    cost is per-row, and a mostly-unique key column would otherwise ship
    every key as its own row (measured 8.5s -> ~2s on 4M unique keys).
    Each bucket then reduces with one vectorized pandas groupby — never a
    per-key Ray aggregate (order-of-magnitude slower, measured).
    Size ``num_buckets`` ≈ cluster cores so every core gets one reduce."""
    partials = ds.select_columns([column]).map_batches(
        _precount(column, num_buckets), batch_format="pyarrow",
        batch_size=batch_size, zero_copy_batch=True,
    )

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        # arrow-native reduce (r5 fix): the pandas groupby promoted an
        # int64 key to float64 whenever the bucket held a NULL key
        # (value_counts emits null as a countable value), collapsing
        # distinct large ints; pyarrow group_by keeps exact dtypes and
        # groups nulls together
        tbl = pa.concat_tables(_unpack(b) for b in g["blob"])
        tot = tbl.group_by(column).aggregate([("partial_count", "sum")])
        dup = tot.filter(pc.greater(tot.column("partial_count_sum"), 1))
        return pa.table({column: dup.column(column),
                         "dup_count": dup.column("partial_count_sum")})

    return partials.groupby("bucket").map_groups(
        reduce_bucket, batch_format="pandas"
    )


def duplicate_keys_multi(ds, columns: list[str], batch_size: int = 262144,
                         num_buckets: int = 64) -> dict[str, pa.Table]:
    """duplicate_keys for several key columns in ONE pass and ONE shuffle:
    each column's partial counts are packed per (column, bucket) and the
    bucket reduce handles all columns — halves the fixed all-to-all cost
    when a schema checks uniqueness on multiple keys (image_id + phash)."""
    from jsschema_ray.state.hll import hash64, normalize_zeros

    def fn(batch: pa.Table) -> pa.Table:
        out_b, out_c, out_blob = [], [], []
        for ci, column in enumerate(columns):
            vc = pc.value_counts(
                normalize_zeros(batch.column(column).combine_chunks()))
            values = vc.field("values")
            counts = vc.field("counts").cast(pa.int64())
            bucket = (hash64(values) % np.uint64(num_buckets)).astype(np.int32)
            order = np.argsort(bucket, kind="stable")
            tbl = pa.table({"key": values, "partial_count": counts}).take(
                pa.array(order)
            )
            sb = bucket[order]
            bounds = np.searchsorted(sb, np.arange(num_buckets + 1))
            for b in range(num_buckets):
                lo, hi = bounds[b], bounds[b + 1]
                if lo == hi:
                    continue
                out_b.append(b * len(columns) + ci)
                out_c.append(ci)
                out_blob.append(_pack(tbl.slice(lo, hi - lo)))
        return pa.table(
            {
                "bucket": pa.array(out_b, type=pa.int32()),
                "col_idx": pa.array(out_c, type=pa.int32()),
                "blob": pa.array(out_blob, type=pa.binary()),
            }
        )

    partials = ds.select_columns(columns).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )

    def reduce_bucket(g: pd.DataFrame) -> pa.Table:
        # arrow-native reduce (same exact-dtype rationale as
        # duplicate_keys.reduce_bucket), RE-PACKED as one IPC blob:
        # different columns carry different key TYPES (string image_id
        # vs int64 phash), so typed `key` blocks from different buckets
        # cannot unify into one Dataset schema — the blob keeps each
        # column's exact type opaque to the block layer
        ci = int(g["col_idx"].iloc[0])
        tbl = pa.concat_tables(_unpack(b) for b in g["blob"])
        tot = tbl.group_by("key").aggregate([("partial_count", "sum")])
        dup = tot.filter(pc.greater(tot.column("partial_count_sum"), 1))
        out_tbl = pa.table({"key": dup.column("key"),
                            "dup_count": dup.column("partial_count_sum")})
        return pa.table(
            {
                "col_idx": pa.array([ci], type=pa.int32()),
                "blob": pa.array([_pack(out_tbl)], type=pa.binary()),
            }
        )

    rows = partials.groupby("bucket").map_groups(
        reduce_bucket, batch_format="pandas"
    ).take_all()
    schema_types = {n: t for n, t in zip(ds.schema().names,
                                         ds.schema().types)}
    out: dict[str, pa.Table] = {}
    for ci, column in enumerate(columns):
        tabs = [_unpack(r["blob"]) for r in rows if r["col_idx"] == ci]
        if tabs:
            merged_t = pa.concat_tables(tabs)
            out[column] = pa.table(
                {column: merged_t.column("key"),
                 "dup_count": merged_t.column("dup_count").cast(
                     pa.int64())})
        else:
            out[column] = pa.table(
                {column: pa.array([], type=schema_types[column]),
                 "dup_count": pa.array([], type=pa.int64())})
    return out


def top_duplicates(ds, column: str, k: int = 20, batch_size: int = 65536):
    """Top-k heaviest duplicate keys — the skew report feeding salting
    decisions (SURVEY.md §2.D sorts/limits). Key is the tie-breaker so the
    selection is a total order (deterministic across runs)."""
    return duplicate_keys(ds, column, batch_size).sort(
        ["dup_count", column], descending=[True, False]
    ).limit(k)


def uniqueness_violations(
    ds,
    column: str,
    keep_columns: Optional[list[str]] = None,
    batch_size: int = 65536,
    max_broadcast_keys: int = 5_000_000,
    strategy: str = "auto",
):
    """All rows whose ``column`` value is duplicated, with ``keep_columns``
    projected (never the wide payload columns unless asked).

    ``strategy='auto'`` (default, VERDICT r2 item #4): the duplicated-key
    DATASET is materialized (distributed, never driver-side) and counted;
    at or under ``max_broadcast_keys`` the broadcast path runs, beyond it
    the op switches to 'shuffle' automatically instead of raising.
    ``strategy='broadcast'``: the duplicated-key set is collected and
    broadcast (`ray.put` once, read per task); ``max_broadcast_keys``
    guards the driver — beyond it we raise. ``strategy='shuffle'``:
    semi-join the rows against the duplicated-keys DATASET (partitioned
    hash join, stages/join.py): no key set ever reaches the driver, the
    right shape when duplicate KEYS themselves are web-scale."""
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    dup = None
    if strategy == "auto":
        dup = duplicate_keys(ds, column, batch_size).materialize()
        strategy = ("shuffle" if dup.count() > max_broadcast_keys
                    else "broadcast")
    if strategy == "shuffle":
        from jsschema_ray.stages.join import hash_join

        proj = keep_columns or [c for c in ds.columns() if c != "bytes"]
        if column not in proj:
            proj = proj + [column]
        if dup is None:
            dup = duplicate_keys(ds, column, batch_size)
        dup = dup.select_columns([column])

        def rename(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(["__dupkey"])

        dup = dup.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)
        return hash_join(ds.select_columns(proj), dup, key=column,
                         right_key="__dupkey", how="semi",
                         batch_size=batch_size)
    if dup is None:
        dup = duplicate_keys(ds, column, batch_size)
    dup_rows = dup.take_all()  # small: distinct duplicated keys only
    if len(dup_rows) > max_broadcast_keys:
        raise ValueError(
            f"{len(dup_rows)} duplicated keys on {column!r} exceeds the "
            f"broadcast bound ({max_broadcast_keys}); use "
            "strategy='shuffle' or consume duplicate_keys() directly"
        )
    schema = ds.schema()
    pa_schema = getattr(schema, "base_schema", schema)  # ray Schema wrapper
    if isinstance(pa_schema, pa.Schema):
        col_type = pa_schema.field(column).type
    else:  # pandas-block dataset: infer the arrow type from a 1-row sample
        col_type = pa.Table.from_pandas(
            ds.limit(1).to_pandas()
        ).schema.field(column).type
    keys = pa.array([r[column] for r in dup_rows], type=col_type)
    if len(keys) == 0:
        proj = keep_columns or [c for c in ds.columns() if c != "bytes"]
        return ds.select_columns(proj).limit(0)
    key_ref = ray.put(keys)

    proj = keep_columns or [c for c in ds.columns() if c != "bytes"]

    def flag_dupes(batch: pa.Table) -> pa.Table:
        # stateless task: the broadcast key set is a zero-copy plasma read
        keys = ray.get(key_ref)
        m = pc.is_in(batch.column(column).combine_chunks(), value_set=keys)
        return batch.filter(pc.fill_null(m, False))

    return ds.select_columns(proj).map_batches(
        flag_dupes, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def uniqueness_report(ds, column: str, batch_size: int = 65536) -> dict[str, Any]:
    """Summary numbers for the manifest: distinct duplicated keys and total
    violating rows, computed from the pre-aggregated counts only."""
    dup = duplicate_keys(ds, column, batch_size)
    rows = dup.take_all()
    return {
        "column": column,
        "dup_keys": len(rows),
        "dup_rows": int(sum(r["dup_count"] for r in rows)),
    }


def distinct_rows(ds, columns: Optional[list[str]] = None,
                  batch_size: int = 262144, num_parts: int = 64):
    """SQL ``SELECT DISTINCT`` over ``columns`` (default: all columns) —
    the set-op companion to duplicate_keys (r3 §2.D completion).

    Scale shape: map-side `drop_duplicates` PRE-TRIM per batch (the
    shuffle then moves at most batches × distinct-per-batch rows, the
    block-is-the-salt pattern), hash co-partition on a combined rolling
    key hash, and ONE vectorized drop_duplicates per partition. Float
    columns are signed-zero-normalized first so -0.0/+0.0 collapse to one
    row with a +0.0 output, matching DuckDB DISTINCT; NaNs merge to one
    row on both sides (pandas and SQL agree)."""
    from jsschema_ray.state.hll import hash64, normalize_zeros

    cols = columns  # None -> all

    def pretrim(batch: pa.Table) -> pa.Table:
        sel = cols or batch.column_names
        out = batch.select(sel)
        for c in sel:
            t = out.schema.field(c).type
            if pa.types.is_nested(t):
                raise ValueError(
                    f"distinct_rows supports primitive columns only; "
                    f"{c!r} is {t} — hash or serialize nested values first"
                )
        for c in sel:
            col = out.column(c).combine_chunks()
            norm = normalize_zeros(col)
            if norm is not col:
                out = out.set_column(out.column_names.index(c), c, norm)
        df = out.to_pandas().drop_duplicates()
        out = pa.Table.from_pandas(df, preserve_index=False,
                                   schema=out.schema)
        h = None
        for c in sel:
            hk = hash64(out.column(c).combine_chunks())
            with np.errstate(over="ignore"):
                h = hk if h is None else h * np.uint64(1000003) + hk
        part = (h % np.uint64(num_parts)).astype(np.int32) if len(out) \
            else np.empty(0, dtype=np.int32)
        return out.append_column("__part", pa.array(part))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop(columns=["__part"]).drop_duplicates()

    return ds.map_batches(
        pretrim, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).groupby("__part").map_groups(finish, batch_format="pandas")


def candidate_keys(ds, combos: list[list[str]],
                   batch_size: int = 262144, num_parts: int = 64):
    """UNIQUE-KEY candidacy profile (the key-discovery scan of classic
    data-profiling systems — Metanome/HyUCC lineage, public literature):
    for each candidate column combination, the exact distinct-combination
    count versus the table row count, and whether the combo is a key.
    One output row per combo:

        (combo utf8, n_rows int64, n_distinct int64, is_key bool)

    where ``combo`` is the comma-joined column list. NULLs compare equal
    inside DISTINCT (Arrow group_by and SQL SELECT DISTINCT agree), so a
    combo with duplicated NULL tuples is correctly NOT a key. All counts
    are exact int64 — bit-equal to the SQL mirror by construction.

    Scale shape: each combo runs as its own distributed aggregate —
    distinct_rows (map-side drop_duplicates pre-trim, ONE hash
    co-partition of the pre-trimmed tuples, per-partition dedup) counted
    without materializing rows to the driver, plus one metadata-cheap
    ds.count(). The driver-side loop is over the COMBO LIST (plan-level,
    bounded by the caller), never over data rows. Returns a pandas
    DataFrame (|combos| rows — a report, not a dataset)."""
    import pandas as pd

    n_rows = ds.count()
    out = []
    for combo in combos:
        nd = distinct_rows(ds, list(combo), batch_size=batch_size,
                           num_parts=num_parts).count()
        out.append((",".join(combo), n_rows, nd, nd == n_rows))
    return pd.DataFrame(out, columns=["combo", "n_rows", "n_distinct",
                                      "is_key"]).sort_values("combo") \
        .reset_index(drop=True)


def group_size_histogram(ds, key_cols: list[str],
                         batch_size: int = 262144):
    """KEY-CARDINALITY degree distribution (the hot-key / skew
    detector): how many distinct keys have exactly k rows — the
    histogram every shuffle-planning decision wants BEFORE picking a
    partitioning key (a heavy tail here predicts a straggler reducer at
    100 TB; the repo's join salting and bucket strategies key off it).
    Output one row per observed group size:

        (group_size int64, n_keys int64)

    Pure int64 counts — engine == SQL mirror (GROUP BY key → COUNT(*),
    then GROUP BY that count) bit-equal. NULL keys form ONE group (SQL
    GROUP BY semantics; Arrow group_by agrees).

    Scale shape: stage 1 is the ONLY wide op — per-key counts via
    map-side-combined grouped_sums (each batch collapses to its
    distinct keys first, so the shuffle carries distinct-per-batch
    partials, never raw rows); stage 2 re-aggregates the O(keys) count
    table by count VALUE — output is O(distinct sizes), tiny by
    construction. No driver-side data loop."""
    from jsschema_ray.stages.aggregates import grouped_sums

    per_key = grouped_sums(ds.select_columns(list(key_cols)),
                           list(key_cols), {}, count_alias="__n",
                           batch_size=batch_size)
    out = grouped_sums(per_key.select_columns(["__n"]), ["__n"], {},
                       count_alias="n_keys", batch_size=batch_size)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["group_size" if c == "__n" else c for c in t.column_names])

    return out.map_batches(rename, batch_format="pyarrow",
                           batch_size=batch_size)


def _setop_rows(left, right, how: str, columns: Optional[list[str]] = None,
                batch_size: int = 262144, num_parts: int = 64):
    """Shared engine for SQL EXCEPT / INTERSECT (both DISTINCT set ops):
    tag each side, reuse distinct_rows' map-side pre-trim + normalized
    combined-key hash so equal rows from BOTH inputs co-locate in one
    partition, then one vectorized pandas merge per partition (pandas
    matches NULL/NaN keys to each other, the SQL set-op duplicate-
    elimination semantics where NULLs compare equal)."""
    from jsschema_ray.state.hll import hash64, normalize_zeros

    cols = columns  # None -> all of LEFT's columns

    def make_pretrim(side: int, sel_override=None):
        def pretrim(batch: pa.Table) -> pa.Table:
            sel = sel_override or cols or batch.column_names
            out = batch.select(sel)
            for c in sel:
                t = out.schema.field(c).type
                if pa.types.is_nested(t):
                    raise ValueError(
                        f"{how}_rows supports primitive columns only; "
                        f"{c!r} is {t} — hash or serialize nested first"
                    )
            for c in sel:
                col = out.column(c).combine_chunks()
                norm = normalize_zeros(col)
                if norm is not col:
                    out = out.set_column(out.column_names.index(c), c,
                                         norm)
            # Arrow-native per-batch distinct (r3 ADVICE fix: the previous
            # pandas round-trip turned nullable int64 into float64, losing
            # precision above 2^53 before the cast back — equal rows could
            # then fail to co-partition). group_by with no aggregates keeps
            # exact dtypes and treats nulls as equal, like the SQL set op.
            out = out.group_by(out.column_names).aggregate([])
            # RIGHT side aligns to the left's output column names so the
            # union and per-partition merge see one schema
            if sel_override is not None and cols is not None:
                out = out.rename_columns(cols)
            h = None
            for c in out.column_names:
                hk = hash64(out.column(c).combine_chunks())
                with np.errstate(over="ignore"):
                    h = hk if h is None else h * np.uint64(1000003) + hk
            part = (h % np.uint64(num_parts)).astype(np.int32) \
                if len(out) else np.empty(0, dtype=np.int32)
            out = out.append_column("__part", pa.array(part))
            return out.append_column(
                "__side",
                pa.array(np.full(len(out), side, dtype=np.int8)))
        return pretrim

    return left, right, make_pretrim


def _run_setop(left, right, how: str, columns, right_columns,
               batch_size: int, num_parts: int):
    import pandas as pd

    if right_columns is not None and columns is None:
        raise ValueError(
            "right_columns requires explicit left columns (the output "
            "schema) so the right side can be renamed onto it"
        )
    left, right, make_pretrim = _setop_rows(
        left, right, how, columns, batch_size, num_parts
    )
    lt = left.map_batches(make_pretrim(0), batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
    rt = right.map_batches(make_pretrim(1, right_columns),
                           batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        # ArrowDtype-backed pandas (r5 fix): the plain pandas conversion
        # promotes an int64 column to float64 whenever THIS partition
        # holds a null — large ints then collapse (2^60 and 2^60+1 are
        # float-equal) both inside the merge and in the OUTPUT block.
        # ArrowDtype keeps exact int64 + NA while pandas merge still
        # matches NA keys to each other (the set-op NULL semantics).
        g = t.to_pandas(types_mapper=pd.ArrowDtype)
        sel = [c for c in g.columns if c not in ("__part", "__side")]
        lf = g[g["__side"] == 0][sel].drop_duplicates()
        rf = g[g["__side"] == 1][sel].drop_duplicates()
        if how == "intersect":
            out = lf.merge(rf, on=sel, how="inner")
        else:
            m = lf.merge(rf, on=sel, how="left", indicator=True)
            out = m[m["_merge"] == "left_only"][sel]
        # strip the pandas metadata: it would reconstruct ArrowDtype
        # columns (<NA> instead of None) on the consumer's to_pandas
        return pa.Table.from_pandas(
            out[sel], preserve_index=False).replace_schema_metadata(None)

    return lt.union(rt).groupby("__part").map_groups(
        finish, batch_format="pyarrow"
    )


def _run_setop_all(left, right, how: str, columns, right_columns,
                   batch_size: int, num_parts: int):
    """Shared engine for SQL EXCEPT ALL / INTERSECT ALL (BAG semantics:
    output multiplicity = max(0, count_left − count_right) /
    min(count_left, count_right)). Same normalization + combined-key
    hash co-partitioning as the DISTINCT set ops, but the map side
    pre-aggregates per-batch (row → count) partials — the shuffle
    carries at most one row per distinct value per batch, never the raw
    duplicates — and the per-partition finish sums counts per side and
    REPEATS surviving rows to their multiplicity (np.repeat, no Python
    loop). NULLs compare equal, floats signed-zero-normalized."""
    import numpy as np
    import pandas as pd

    from jsschema_ray.state.hll import hash64, normalize_zeros

    if right_columns is not None and columns is None:
        raise ValueError(
            "right_columns requires explicit left columns (the output "
            "schema) so the right side can be renamed onto it"
        )
    cols = columns

    def make_pretrim(side: int, sel_override=None):
        def pretrim(batch: pa.Table) -> pa.Table:
            sel = sel_override or cols or batch.column_names
            out = batch.select(sel)
            for c in sel:
                t = out.schema.field(c).type
                if pa.types.is_nested(t):
                    raise ValueError(
                        f"{how}_rows supports primitive columns only; "
                        f"{c!r} is {t} — hash or serialize nested first"
                    )
            for c in sel:
                col = out.column(c).combine_chunks()
                norm = normalize_zeros(col)
                if norm is not col:
                    out = out.set_column(out.column_names.index(c), c,
                                         norm)
            # Arrow-native per-batch (row -> count) partial: exact dtypes
            # preserved, nulls group together (the distinct_rows r3 fix
            # applies here too — never round-trip the KEYS through pandas
            # before the co-partition hash)
            out = out.group_by(out.column_names).aggregate(
                [([], "count_all")])
            out = out.rename_columns(
                ["__n" if c == "count_all" else c
                 for c in out.column_names])
            if sel_override is not None and cols is not None:
                ren = dict(zip(sel_override, cols))
                out = out.rename_columns(
                    [ren.get(c, c) for c in out.column_names])
            h = None
            for c in out.column_names:
                if c == "__n":
                    continue
                hk = hash64(out.column(c).combine_chunks())
                with np.errstate(over="ignore"):
                    h = hk if h is None else h * np.uint64(1000003) + hk
            part = (h % np.uint64(num_parts)).astype(np.int32) \
                if len(out) else np.empty(0, dtype=np.int32)
            out = out.append_column("__part", pa.array(part))
            return out.append_column(
                "__side",
                pa.array(np.full(len(out), side, dtype=np.int8)))
        return pretrim

    lt = left.map_batches(make_pretrim(0), batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
    rt = right.map_batches(make_pretrim(1, right_columns),
                           batch_format="pyarrow",
                           batch_size=batch_size, zero_copy_batch=True)

    def finish(t: pa.Table) -> pa.Table:
        # ArrowDtype-backed pandas: same exact-int64/NA rationale as the
        # DISTINCT set-op finish (see _run_setop)
        g = t.to_pandas(types_mapper=pd.ArrowDtype)
        sel = [c for c in g.columns
               if c not in ("__part", "__side", "__n")]
        lf = (g[g["__side"] == 0]
              .groupby(sel, dropna=False, sort=False, as_index=False)
              ["__n"].sum().rename(columns={"__n": "__nl"}))
        rf = (g[g["__side"] == 1]
              .groupby(sel, dropna=False, sort=False, as_index=False)
              ["__n"].sum().rename(columns={"__n": "__nr"}))
        m = lf.merge(rf, on=sel, how="left")
        nr = m["__nr"].fillna(0).to_numpy(dtype=np.int64)
        nl = m["__nl"].to_numpy(dtype=np.int64)
        if how == "intersect_all":
            k = np.minimum(nl, nr)
        else:
            k = np.maximum(nl - nr, 0)
        out = m.loc[np.repeat(m.index.to_numpy(), k)][sel].reset_index(
            drop=True)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    return lt.union(rt).groupby("__part").map_groups(
        finish, batch_format="pyarrow"
    )


def except_all_rows(left, right, columns: Optional[list[str]] = None,
                    right_columns: Optional[list[str]] = None,
                    batch_size: int = 262144, num_parts: int = 64):
    """SQL ``EXCEPT ALL`` (bag difference): each row of ``left`` survives
    max(0, left_count − right_count) times. See _run_setop_all for the
    distribution shape."""
    return _run_setop_all(left, right, "except_all", columns,
                          right_columns, batch_size, num_parts)


def intersect_all_rows(left, right, columns: Optional[list[str]] = None,
                       right_columns: Optional[list[str]] = None,
                       batch_size: int = 262144, num_parts: int = 64):
    """SQL ``INTERSECT ALL`` (bag intersection): each row appears
    min(left_count, right_count) times; same shape as except_all_rows."""
    return _run_setop_all(left, right, "intersect_all", columns,
                          right_columns, batch_size, num_parts)


def except_rows(left, right, columns: Optional[list[str]] = None,
                right_columns: Optional[list[str]] = None,
                batch_size: int = 262144, num_parts: int = 64):
    """SQL ``EXCEPT`` (set difference with DISTINCT output): the distinct
    rows of ``left`` (projected to ``columns``) that do not appear in
    ``right`` (projected to ``right_columns``, default the same names).
    NULLs compare equal, floats signed-zero-normalized — DuckDB parity.

    Scale shape: both sides pre-trim map-side to per-batch distinct rows,
    co-partition on the same combined key hash, one merge per partition —
    the shuffle carries at most distinct rows, never the raw inputs."""
    return _run_setop(left, right, "except", columns, right_columns,
                      batch_size, num_parts)


def intersect_rows(left, right, columns: Optional[list[str]] = None,
                   right_columns: Optional[list[str]] = None,
                   batch_size: int = 262144, num_parts: int = 64):
    """SQL ``INTERSECT`` (DISTINCT rows present in BOTH inputs); same
    distribution and NULL/zero semantics as except_rows."""
    return _run_setop(left, right, "intersect", columns, right_columns,
                      batch_size, num_parts)
