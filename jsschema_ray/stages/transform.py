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
