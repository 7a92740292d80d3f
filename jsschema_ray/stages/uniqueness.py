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
  2. a tiny `groupby(key).sum(partial_count)` merges partial counts;
  3. keys with total > 1 are collected (bounded: duplicate KEYS are rare
     even when duplicate ROWS are many) and broadcast via `ray.put`; a
     final map_batches pass flags member rows with a vectorized `pc.is_in`
     — no second all-to-all shuffle ever touches the raw rows.

The wide `bytes` column never enters the shuffle: step 1 projects to the
key column only (SURVEY.md §7 hard part 4).
"""

from __future__ import annotations

from typing import Any, Optional

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data.aggregate import Sum


def _precount(column: str):
    def fn(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(column).combine_chunks())
        return pa.table(
            {column: vc.field("values"), "partial_count": vc.field("counts").cast(pa.int64())}
        )

    return fn


def duplicate_keys(ds, column: str, batch_size: int = 65536):
    """Dataset of (column, dup_count) for keys appearing more than once."""
    partials = ds.select_columns([column]).map_batches(
        _precount(column), batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )
    totals = partials.groupby(column).aggregate(
        Sum("partial_count", alias_name="dup_count")
    )
    return totals.filter(expr="dup_count > 1")


def top_duplicates(ds, column: str, k: int = 20, batch_size: int = 65536):
    """Top-k heaviest duplicate keys — the skew report feeding salting
    decisions (SURVEY.md §2.D sorts/limits)."""
    return duplicate_keys(ds, column, batch_size).sort(
        "dup_count", descending=True
    ).limit(k)


def uniqueness_violations(
    ds,
    column: str,
    keep_columns: Optional[list[str]] = None,
    batch_size: int = 65536,
    max_broadcast_keys: int = 5_000_000,
):
    """All rows whose ``column`` value is duplicated, with ``keep_columns``
    projected (never the wide payload columns unless asked).

    The duplicated-key set is collected and broadcast (`ray.put` once, read
    per task). ``max_broadcast_keys`` guards the driver: beyond it the data
    is so dirty that a report of per-key counts (duplicate_keys) is the
    right artifact, and we raise with that advice rather than OOM."""
    dup = duplicate_keys(ds, column, batch_size)
    dup_rows = dup.take_all()  # small: distinct duplicated keys only
    if len(dup_rows) > max_broadcast_keys:
        raise ValueError(
            f"{len(dup_rows)} duplicated keys on {column!r} exceeds the "
            f"broadcast bound ({max_broadcast_keys}); consume "
            "duplicate_keys() directly or raise max_broadcast_keys"
        )
    schema = ds.schema()
    pa_schema = getattr(schema, "base_schema", schema)  # ray Schema wrapper
    col_type = pa_schema.field(column).type
    keys = pa.array([r[column] for r in dup_rows], type=col_type)
    if len(keys) == 0:
        proj = keep_columns or [c for c in ds.columns() if c != "bytes"]
        return ds.select_columns(proj).limit(0)
    key_ref = ray.put(keys)

    proj = keep_columns or [c for c in ds.columns() if c != "bytes"]

    class FlagDupes:
        def __init__(self):
            self.keys = ray.get(key_ref)  # once per actor/worker

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column(column).combine_chunks(), value_set=self.keys)
            return batch.filter(pc.fill_null(m, False))

    return ds.select_columns(proj).map_batches(
        FlagDupes, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, concurrency=(1, 8),
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
