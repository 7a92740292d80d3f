"""Schema-driven transforms.

``apply_defaults`` gives the draft-04 ``default`` annotation (reference
interface.go:92, carried but never applied by the reference validator) a
runtime meaning useful in data pipelines: null cells of a column whose
property schema declares a default are filled with it — vectorized
`pc.fill_null` per batch, SQL-equivalent to COALESCE(col, default).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from jsschema_ray.schema.compiler import compile_schema


def apply_defaults(ds, schema: dict[str, Any], batch_size: int = 65536):
    """Fill nulls with per-column schema defaults (properties with a
    ``default`` keyword). Columns without defaults pass through untouched."""
    dag = compile_schema(schema)
    defaults = {
        name: sub.deref().default
        for name, sub in (dag.properties or {}).items()
        if sub.deref().has_default
    }

    def fn(batch: pa.Table) -> pa.Table:
        for name, value in defaults.items():
            if name not in batch.column_names:
                continue
            col = batch.column(name)
            if col.null_count == 0:
                continue
            idx = batch.column_names.index(name)
            batch = batch.set_column(
                idx, name, pc.fill_null(col, pa.scalar(value, col.type))
            )
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            var_name: str = "name", value_name: str = "value",
            batch_size: int = 65536):
    """Wide→long reshape (SQL UNPIVOT / pandas melt): one output row per
    (input row × value column), columns (id_cols..., var_name,
    value_name).  The inverse of aggregates.pivot_counts.  A pure
    per-batch stateless reshape — no shuffle, no state; output is
    value_cols× the input rows but streams block-by-block.  All value
    columns must share (or be castable to) a common Arrow type; the
    first value column's type wins, mirroring SQL UNPIVOT's
    common-supertype rule closely enough for homogeneous numerics."""
    import pyarrow as pa

    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    overlap = set(id_cols) & set(value_cols)
    if overlap:
        raise ValueError(f"columns cannot be both id and value: {overlap}")

    def melt(batch: pa.Table) -> pa.Table:
        target = batch.column(value_cols[0]).type
        pieces = []
        for c in value_cols:
            v = batch.column(c).combine_chunks()
            if v.type != target:
                v = v.cast(target)
            pieces.append(pa.table(
                {k: batch.column(k) for k in id_cols}
                | {var_name: pa.array([c] * batch.num_rows),
                   value_name: v}
            ))
        return pa.concat_tables(pieces)

    return ds.select_columns(list(id_cols) + list(value_cols)).map_batches(
        melt, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def unnest_list(ds, list_col: str, id_cols: list[str],
                pos_name: str = "pos", value_name: str = "value",
                batch_size: int = 65536):
    """List→rows explode (SQL UNNEST ... WITH ORDINALITY): one output row
    per list element, columns (id_cols..., pos_name 0-based int64,
    value_name = element). Completes the reshape family
    (pivot/unpivot/unnest); the embedding-component table this produces
    is the input shape for per-dimension stats/drift over vector
    columns. NULL lists and empty lists produce no rows (DuckDB UNNEST
    semantics); element NULLs pass through.

    Scale shape: a pure per-batch stateless reshape — the flattened
    values buffer is ZERO-COPY (`ListArray.flatten`), id columns
    replicate via one vectorized take on parent indices; no shuffle, no
    state, output streams block-by-block."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def explode(batch: pa.Table) -> pa.Table:
        col = batch.column(list_col).combine_chunks()
        # parent index per element + 0-based ordinality from offsets
        parents = pc.list_parent_indices(col)
        flat = col.flatten()
        import numpy as np

        par = parents.to_numpy(zero_copy_only=False)
        lengths = pc.list_value_length(col).fill_null(0) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
        pos = np.arange(len(par), dtype=np.int64) - starts[par]
        cols = {c: batch.column(c).take(parents) for c in id_cols}
        cols[pos_name] = pa.array(pos)
        cols[value_name] = flat
        return pa.table(cols)

    return ds.select_columns(
        list(dict.fromkeys(id_cols + [list_col]))
    ).map_batches(explode, batch_format="pyarrow", batch_size=batch_size,
                  zero_copy_batch=True)
