"""Referential-integrity constraint: FK column values must be contained in
a reference key set (SURVEY.md §2.C; no reference-repo analogue — $ref
lookup there is compile-time, schema.go:204-269).

Design: broadcast semi-join. The reference key set (a dimension table
column or a literal list from the schema's ``x-referential`` entry) is
deduplicated ONCE — per-batch `unique` partials unioned on the driver, no
shuffle — then `ray.put` once and read in every task's state; membership is
a vectorized `pc.is_in` per batch. This is the right join strategy whenever
the ref side fits a worker heap (dimension tables, codec lists, vocab).
For a genuinely large ref side, the documented fallback is the partitioned
hash anti-join (bucket both sides on hash(key) % B and anti-join per
bucket); not needed for any BASELINE constraint, where ref sides are small.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pyarrow as pa
import pyarrow.compute as pc

import ray


def _ref_key_array(ref, ref_column: Optional[str], batch_size: int) -> pa.Array:
    if isinstance(ref, (list, tuple)):
        return pa.array(list(dict.fromkeys(ref)))
    if isinstance(ref, (pa.Array, pa.ChunkedArray)):
        from jsschema_ray.state.hll import normalize_zeros

        return pc.unique(normalize_zeros(
            ref if isinstance(ref, pa.Array) else ref.combine_chunks()))
    # ray Dataset: per-batch unique partials, union on the driver (the ref
    # side is small by contract; no all-to-all `unique` shuffle needed)
    assert ref_column is not None, "ref_column required for a Dataset ref side"
    parts = ref.select_columns([ref_column]).map_batches(
        lambda t: pa.table(
            {ref_column: pc.unique(t.column(ref_column).combine_chunks())}
        ),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True,
    )
    merged = pa.concat_tables(
        parts.iter_batches(batch_size=batch_size, batch_format="pyarrow")
    )
    from jsschema_ray.state.hll import normalize_zeros

    return pc.unique(
        normalize_zeros(merged.column(ref_column).combine_chunks()))


def referential_violations(
    ds,
    column: str,
    ref: Union["ray.data.Dataset", Sequence, pa.Array],
    ref_column: Optional[str] = None,
    keep_columns: Optional[list[str]] = None,
    allow_null: bool = True,
    batch_size: int = 65536,
    strategy: str = "auto",
    max_broadcast_keys: int = 5_000_000,
):
    """Rows whose ``column`` value is NOT in the reference key set.
    ``strategy='auto'`` (default, VERDICT r2 item #4): a Dataset ref side
    is counted (row count — a conservative upper bound on its distinct
    keys, computed distributed); at or under ``max_broadcast_keys`` the
    broadcast path runs, beyond it the op switches to 'shuffle'
    automatically. Non-Dataset refs (sequence / Arrow array) are already
    driver-side and always broadcast.
    ``strategy='broadcast'``: anti-semi-join via broadcast + is_in — right
    whenever the deduped ref keys fit a worker heap.
    ``strategy='shuffle'``: partitioned hash ANTI-join (stages/join.py) for
    a genuinely large ref side — both sides bucket on hash(key), nothing
    is ever collected to the driver. Nulls pass by default (absent ≡ null,
    kernels/columnar.py)."""
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "auto":
        import ray.data as rd

        if isinstance(ref, rd.Dataset) and ref_column is not None:
            # project + materialize ONCE: the count and the chosen path
            # (broadcast key-collect or shuffle join) then reuse the same
            # blocks instead of re-executing the ref-side lineage
            ref = ref.select_columns([ref_column]).materialize()
            strategy = ("shuffle" if ref.count() > max_broadcast_keys
                        else "broadcast")
        else:
            strategy = "broadcast"
    if strategy == "shuffle":
        import ray.data as rd

        from jsschema_ray.stages.join import hash_join

        if not isinstance(ref, rd.Dataset) or ref_column is None:
            raise ValueError(
                "strategy='shuffle' needs a Dataset ref side + ref_column"
            )
        proj = keep_columns or [c for c in ds.columns() if c != "bytes"]
        if column not in proj:
            proj = proj + [column]
        out = hash_join(
            ds.select_columns(proj),
            ref.select_columns([ref_column]),
            key=column, right_key=ref_column, how="anti",
            batch_size=batch_size,
        )
        # Acero anti: null keys never match, so they surface as violations;
        # under allow_null they must pass instead
        if allow_null:
            def drop_nulls(batch: pa.Table) -> pa.Table:
                return batch.filter(
                    batch.column(column).combine_chunks().is_valid()
                )

            out = out.map_batches(drop_nulls, batch_format="pyarrow",
                                  zero_copy_batch=True)
        return out
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy {strategy!r}")
    keys = _ref_key_array(ref, ref_column, batch_size)
    key_ref = ray.put(keys)
    proj = keep_columns or [c for c in ds.columns() if c != "bytes"]

    def anti_join(batch: pa.Table) -> pa.Table:
        # stateless task: ray.get on a shared object is a zero-copy plasma
        # read, so there is no per-actor state worth a pool spin-up, and
        # tasks scale to every core instead of a fixed pool of 8
        from jsschema_ray.state.hll import normalize_zeros

        keys = ray.get(key_ref)
        col = normalize_zeros(batch.column(column).combine_chunks())
        hit = pc.is_in(col, value_set=keys)
        bad = pc.invert(pc.fill_null(hit, False))
        if allow_null:
            bad = pc.and_(bad, col.is_valid())
        else:
            bad = pc.or_(bad, col.is_null())
        return batch.filter(bad)

    return ds.select_columns(proj).map_batches(
        anti_join, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    )


def referential_check(ds, column: str, ref, ref_column: Optional[str] = None,
                      batch_size: int = 65536) -> dict:
    """Count-only variant for the manifest: number of violating rows and a
    sample of missing keys, via per-batch partial counts (no row shipping)."""
    keys = _ref_key_array(ref, ref_column, batch_size)
    key_ref = ray.put(keys)

    def count_bad(batch: pa.Table) -> pa.Table:
        from jsschema_ray.state.hll import normalize_zeros

        col = normalize_zeros(batch.column(column).combine_chunks())
        hit = pc.is_in(col, value_set=ray.get(key_ref))
        bad = pc.and_(pc.invert(pc.fill_null(hit, False)), col.is_valid())
        missing = pc.unique(col.filter(bad))
        return pa.table(
            {
                "n_bad": pa.array([pc.sum(bad).as_py() or 0], type=pa.int64()),
                "sample": pa.array(
                    [missing.slice(0, 5).to_pylist()],
                    type=pa.list_(col.type),
                ),
            }
        )

    parts = ds.select_columns([column]).map_batches(
        count_bad, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True,
    ).take_all()
    sample: list = []
    for p in parts:
        for v in p["sample"]:
            if v not in sample and len(sample) < 10:
                sample.append(v)
    return {
        "column": column,
        "n_violations": int(sum(p["n_bad"] for p in parts)),
        "missing_sample": sample,
    }
