"""Join operators (SURVEY.md §2.D joins/lookups).

Two strategies, chosen by ref-side size (ray_guide 'Joins and lookups'):

* broadcast_join — the small side is collected once, `ray.put` once, and
  merged into every batch with a vectorized pandas merge. No shuffle; the
  right strategy for dimension tables (nation/region/customer-sized).
* hash_join — both sides large: add ``bucket = hash(key) % B`` to both,
  co-shuffle with ONE groupby over the union, and join matching buckets
  pairwise inside map_groups (explicit partitioned hash join). Skewed keys
  can be salted by raising B; B defaults to 64 and should be ~2× cluster
  cores. Partitioning assumption: any single bucket's rows (both sides) fit
  a worker's heap.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from jsschema_ray.state.hll import hash64


def broadcast_join(ds, small, key: str, how: str = "inner",
                   batch_size: int = 65536, small_key: Optional[str] = None):
    """Join a Dataset against a small pandas/arrow table (or small Dataset)
    by broadcasting the small side."""
    import ray.data as rd

    if isinstance(small, rd.Dataset):
        small = small.to_pandas()
    elif isinstance(small, pa.Table):
        small = small.to_pandas()
    if small_key and small_key != key:
        small = small.rename(columns={small_key: key})
    ref = ray.put(small)

    def fn(batch: pa.Table) -> pd.DataFrame:
        sm = ray.get(ref)
        return batch.to_pandas().merge(sm, on=key, how=how)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)


def hash_join(left, right, key: str, num_buckets: int = 64,
              how: str = "inner", batch_size: int = 65536,
              right_key: Optional[str] = None):
    """Partitioned hash join of two Datasets on ``key``: bucket both sides,
    union, one shuffle, per-bucket pandas merge."""
    rk = right_key or key
    lcols = list(left.columns())
    rcols = [key if c == rk else c for c in right.columns()]
    overlap = (set(lcols) & set(rcols)) - {key}
    if overlap:
        raise ValueError(
            f"non-key column names must be disjoint, overlapping: {overlap}"
        )
    all_cols = lcols + [c for c in rcols if c != key]

    def _types(ds) -> dict:
        s = ds.schema()
        base = getattr(s, "base_schema", None)
        if isinstance(base, pa.Schema):
            return {f.name: f.type for f in base}
        out = dict(zip(s.names, s.types))
        if all(isinstance(t, pa.DataType) for t in out.values()):
            return out
        # ray Schema may carry Python types (e.g. from_pandas datasets):
        # infer exact Arrow types from a one-row sample instead
        sample = pa.Table.from_pandas(ds.limit(1).to_pandas())
        return {f.name: f.type for f in sample.schema}

    col_types = dict(_types(left))
    for name, t in _types(right).items():
        col_types[key if name == rk else name] = t

    def tag(side: int, colname: str):
        def fn(batch: pa.Table) -> pa.Table:
            col = batch.column(colname).combine_chunks()
            bucket = (hash64(col) % np.uint64(num_buckets)).astype(np.int32)
            out = batch
            if colname != key:
                out = out.rename_columns(
                    [key if c == colname else c for c in out.column_names]
                )
            # pad to the combined schema (typed nulls) so union is clean
            for c in all_cols:
                if c not in out.column_names:
                    out = out.append_column(
                        c, pa.nulls(len(out), type=col_types[c])
                    )
            out = out.select(all_cols)
            return out.append_column(
                "__bucket", pa.array(bucket)
            ).append_column(
                "__side", pa.array(np.full(len(batch), side, dtype=np.int8))
            )

        return fn

    tagged = left.map_batches(tag(0, key), batch_format="pyarrow",
                              batch_size=batch_size).union(
        right.map_batches(tag(1, rk), batch_format="pyarrow",
                          batch_size=batch_size)
    )

    int_cols = [c for c, t in col_types.items()
                if pa.types.is_integer(t) and c in all_cols]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["__side"] == 0, lcols]
        r = g.loc[g["__side"] == 1, rcols]
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame({c: pd.Series([], dtype=object)
                                 for c in all_cols})
        out = l.merge(r, on=key, how=how)[all_cols]
        # the null-padded union promoted int columns to float64 in pandas;
        # restore integer dtype wherever no nulls survived the join
        for c in int_cols:
            if out[c].dtype.kind == "f" and not out[c].isna().any():
                out[c] = out[c].astype("int64")
        for c in all_cols:  # unmatched outer-join cells: NaN -> proper null
            if out[c].dtype == object:
                out[c] = out[c].where(out[c].notna(), None)
        return out

    return tagged.groupby("__bucket").map_groups(
        join_bucket, batch_format="pandas"
    )
