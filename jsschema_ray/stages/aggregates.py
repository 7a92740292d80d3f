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
