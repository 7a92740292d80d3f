"""Pre-aggregated grouped sums: the map-side-combine pattern for wide
aggregations (SURVEY.md §4 / ray_guide "Aggregation at scale").

A bare ``groupby(keys).aggregate(Sum(col))`` shuffles every row; here each
batch first collapses to one row per key via a vectorized
``pyarrow.Table.group_by`` (map-side combine), so the all-to-all exchange
carries O(distinct keys × batches) tiny partial rows. Averages are derived
from (sum, count) after the final merge — never averaged across partials.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

from ray.data.aggregate import Sum


def grouped_sums(
    ds,
    keys: list[str],
    sum_cols: dict[str, str],
    count_alias: Optional[str] = "n",
    batch_size: int = 65536,
):
    """groupby(keys) with SUM over ``sum_cols`` ({out_name: in_col}) and an
    optional COUNT(*) — partial-aggregated per batch before the shuffle.
    Returns the merged (still lazy) Dataset with columns keys + out_names
    [+ count_alias]."""
    in_cols = list(dict.fromkeys(sum_cols.values()))

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in in_cols]
        if count_alias:
            # ([], "count_all") is pyarrow's COUNT(*): row count per group,
            # independent of any column's nulls (and valid when sum_cols
            # is empty — a pure count-per-group aggregate)
            aggs.append(([], "count_all"))
        g = batch.select(keys + in_cols).group_by(keys).aggregate(aggs)
        # rename pyarrow's col_sum/count_all to target names
        renames = {f"{c}_sum": out for out, c in sum_cols.items()}
        if count_alias:
            renames["count_all"] = count_alias
        return g.rename_columns(
            [renames.get(name, name) for name in g.column_names]
        )

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    aggs = [Sum(out, alias_name=out) for out in sum_cols]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)

def pivot_counts(ds, row_key: str, col_key: str, categories: list,
                 prefix: str = "n_", batch_size: int = 65536):
    """Crosstab / pivot: per-``row_key`` counts of each ``col_key``
    category as a WIDE int64 table (one column per category).  A
    distributed wide output needs a FIXED schema, so the column domain is
    declared up front via ``categories``; values outside it are dropped —
    exactly a SQL conditional aggregation
    (``COUNT(*) FILTER (WHERE col = cat)``), which is the oracle.

    Scale shape: each batch folds into ONE ``np.bincount`` over the
    combined index ``row_rank * K + cat_idx`` and emits one wide partial
    row per distinct row_key in the batch; the only shuffle moves those
    width-(K+1) partials through grouped_sums.  K (category count) must
    be small — it is a SCHEMA width, not data."""
    import numpy as np
    import pyarrow.compute as pc

    cats = list(categories)
    k = len(cats)
    if not k:
        raise ValueError("categories must be non-empty")
    if len(set(cats)) != k:
        raise ValueError("categories must be distinct")
    out_cols = [f"{prefix}{c}" for c in cats]
    cat_arr = pa.array(cats)

    def partial(batch: pa.Table) -> pa.Table:
        ci = pc.index_in(
            batch.column(col_key).combine_chunks(), value_set=cat_arr
        )
        keep = ci.is_valid()
        ci_np = pc.filter(ci, keep).to_numpy(zero_copy_only=False)
        rows = pc.filter(
            batch.column(row_key).combine_chunks(), keep
        ).to_numpy(zero_copy_only=False)
        if not len(rows):
            return pa.table(
                {row_key: batch.column(row_key).slice(0, 0)}
                | {c: pa.array([], pa.int64()) for c in out_cols}
            )
        uniq, rk = np.unique(rows, return_inverse=True)
        counts = np.bincount(
            rk.astype(np.int64) * k + ci_np.astype(np.int64),
            minlength=len(uniq) * k,
        ).reshape(len(uniq), k)
        return pa.table(
            {row_key: pa.array(uniq)}
            | {c: pa.array(counts[:, j].astype(np.int64))
               for j, c in enumerate(out_cols)}
        )

    parts = ds.select_columns([row_key, col_key]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    return grouped_sums(parts, [row_key], {c: c for c in out_cols},
                        count_alias=None)
