"""Block-format helper: emit Arrow blocks from pandas-bodied group fns.

``map_groups(fn, batch_format="pandas")`` stages that RETURN a DataFrame
produce pandas blocks downstream, which (a) make every later shuffle carry
``PandasBlockSchema`` objects Ray cannot hash (the "Failed to hash the
schemas (for deduplication)" warning on every reduce task), and (b) embed
pandas schema metadata in any later Arrow conversion, which resurrects
pandas-only dtypes (e.g. nullable Int64) across to_pandas round-trips.
Wrapping the fn with :func:`arrow_out` converts the result to a
metadata-free Arrow table once, at the stage boundary — downstream
operators then flow zero-copy Arrow blocks."""

from __future__ import annotations

import functools

import pandas as pd
import pyarrow as pa


def arrow_out(fn):
    """Wrap a pandas->pandas group fn so it emits a metadata-free
    ``pyarrow.Table`` block instead."""

    @functools.wraps(fn)
    def wrapper(df: pd.DataFrame) -> pa.Table:
        out = fn(df)
        if isinstance(out, pd.DataFrame):
            t = pa.Table.from_pandas(out, preserve_index=False)
            return t.replace_schema_metadata(None)
        return out

    return wrapper
