"""Vectorized columnar evaluation of a ConstraintDAG over Arrow data.

This is the hot path: each draft-04 keyword becomes a pyarrow.compute /
numpy kernel producing a per-row boolean pass mask; masks compose with
boolean algebra exactly as the combinators compose row-locally (SURVEY.md
§1.3). One evaluation == one `map_batches` body over a zero-copy Arrow
batch; no Python-per-row loops on primitive columns.

Null semantics (SURVEY.md §7 hard part 2): a fixed Arrow table has every
column "present" in every row, so we define **absent ≡ null** — a null
value vacuously passes every value constraint, and presence constraints
(`required`, `dependencies`, min/maxProperties) test non-null-ness. This is
the documented tabular projection of draft-04's key-presence semantics
(reference test/objectproprequired*.json, objectpropdepend*.json).

Type semantics: the Arrow column type decides most of the draft-04 `type`
keyword at compile time (a string column can never fail `type: string`);
the only runtime type check is `integer` over a float column —
``floor(x) == x`` — mirroring draft-04's value-not-lexical integer rule
(reference test/integer_fail001.json).

Regex dialect: `pc.match_substring_regex` is RE2 — the same engine family
as Go's regexp used by the reference (marshal.go:143-169), so `pattern`
semantics match by construction.
"""

from __future__ import annotations

import numbers
from typing import Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from jsschema_ray.kernels.formats import FORMAT_CHECKERS, FORMAT_REGEXES
from jsschema_ray.schema.nodes import (
    ALLOW,
    FORBID,
    ConstraintNode,
)

Mask = np.ndarray  # bool, True == row passes

# leaf result for violation attribution: (schema_path, keyword, fail_indices)
Collector = Optional[list]


def _np_bool(arr: pa.Array, fill: bool) -> Mask:
    """pa.BooleanArray -> np.bool_ with nulls replaced by ``fill``."""
    if arr.null_count:
        arr = pc.fill_null(arr, fill)
    return arr.to_numpy(zero_copy_only=False).astype(bool, copy=False)


def _valid_mask(arr: pa.Array) -> Mask:
    if arr.null_count == 0:
        return np.ones(len(arr), dtype=bool)
    return _np_bool(arr.is_valid(), False)


def _collect(collector: Collector, path: str, keyword: str, mask: Mask,
             valid: Mask) -> None:
    """Record failing row indices for a leaf constraint (only rows where the
    value is present can fail). Zero-failure results are recorded too so the
    summary stage counts checked rows correctly."""
    if collector is not None:
        collector.append((path, keyword, np.flatnonzero(~mask & valid)))


def _draft_types_of(dtype: pa.DataType) -> frozenset[str]:
    """Static draft-04 type(s) of an Arrow column type."""
    if pa.types.is_boolean(dtype):
        return frozenset({"boolean"})
    if pa.types.is_integer(dtype):
        return frozenset({"integer", "number"})
    if pa.types.is_floating(dtype) or pa.types.is_decimal(dtype):
        return frozenset({"number"})
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return frozenset({"string"})
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype) \
            or pa.types.is_fixed_size_list(dtype):
        return frozenset({"array"})
    if pa.types.is_struct(dtype) or pa.types.is_map(dtype):
        return frozenset({"object"})
    if pa.types.is_null(dtype):
        return frozenset({"null"})
    if pa.types.is_timestamp(dtype) or pa.types.is_date(dtype):
        return frozenset({"string"})  # timestamps validate as date-time strings
    # binary (image payloads) and anything else: opaque — matches no draft type
    return frozenset()


def _is_stringy(dtype: pa.DataType) -> bool:
    return pa.types.is_string(dtype) or pa.types.is_large_string(dtype)


def _is_numeric(dtype: pa.DataType) -> bool:
    return (pa.types.is_integer(dtype) or pa.types.is_floating(dtype)
            or pa.types.is_decimal(dtype))


def eval_array(node: ConstraintNode, arr: pa.Array, path: str = "#",
               collector: Collector = None) -> Mask:
    """Per-row pass mask of ``node`` over one Arrow array. Null rows pass
    (absent ≡ null)."""
    node = node.deref()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()
    n = len(arr)
    valid = _valid_mask(arr)
    mask = np.ones(n, dtype=bool)
    dtype = arr.type
    static_types = _draft_types_of(dtype)

    # ---- type ------------------------------------------------------------
    if node.types is not None:
        allowed = set(node.types)
        if "number" in allowed:
            allowed.add("integer")  # integers are numbers
        if static_types and static_types & allowed:
            pass  # statically satisfied
        elif ("integer" in allowed and "number" in static_types
              and pa.types.is_floating(dtype)):
            f = arr.to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                m = np.floor(f) == f
            m = np.where(np.isnan(f), False, m)
            mask &= np.where(valid, m, True)
            _collect(collector, path, "type", np.where(valid, m, True), valid)
        elif "null" in allowed and len(allowed) == 1:
            # only nulls pass; non-null rows fail
            m = ~valid
            mask &= np.where(valid, m, True)
            _collect(collector, path, "type", np.where(valid, m, True), valid)
        else:
            m = np.zeros(n, dtype=bool)
            mask &= np.where(valid, m, True)
            _collect(collector, path, "type", np.where(valid, m, True), valid)

    # ---- enum ------------------------------------------------------------
    if node.enum is not None:
        vals = _compatible_enum_values(node.enum, dtype)
        if vals is None:  # nothing in the enum can live in this column type
            m = np.zeros(n, dtype=bool)
        elif vals == "__python__":  # nested types: slow-path per row
            from jsschema_ray.kernels.json_eval import _canon
            cs = {_canon(e) for e in node.enum}
            m = np.fromiter(
                ((v is None) or (_canon(v) in cs) for v in arr.to_pylist()),
                dtype=bool, count=n)
        else:
            cand = arr
            if pa.types.is_floating(dtype):
                # pc.is_in matches by hash, where -0.0 != 0.0; JSON number
                # equality says they are equal — normalize signed zeros on
                # both sides (x + 0.0 maps -0.0 to +0.0, found by fuzzing)
                cand = pc.add(arr, pa.scalar(0.0, dtype))
                vals = [v + 0.0 if isinstance(v, float) else v for v in vals]
            m = _np_bool(pc.is_in(cand, value_set=pa.array(vals, type=dtype)), True)
        em = np.where(valid, m, True)
        mask &= em
        _collect(collector, path, "enum", em, valid)

    # ---- numeric ---------------------------------------------------------
    if _is_numeric(dtype):
        x = None
        if node.multiple_of is not None or node.minimum is not None \
                or node.maximum is not None:
            x = arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        if node.multiple_of is not None:
            k = float(node.multiple_of)
            if pa.types.is_integer(dtype) and k.is_integer():
                # exact integer modulo (matches the row-wise evaluator's
                # int path; float division is lossy above 2^53)
                xi = arr.fill_null(0).to_numpy(zero_copy_only=False)
                m = (xi % int(k)) == 0  # python-int divisor: no dtype promotion
            else:
                with np.errstate(invalid="ignore", divide="ignore"):
                    q = x / k
                    m = np.abs(q - np.round(q)) <= 1e-9
                m = np.where(np.isnan(x), False, m)
            em = np.where(valid, m, True)
            mask &= em
            _collect(collector, path, "multipleOf", em, valid)
        if node.minimum is not None:
            lo = float(node.minimum)
            with np.errstate(invalid="ignore"):
                m = (x > lo) if node.exclusive_minimum else (x >= lo)
            em = np.where(valid, np.where(np.isnan(x), False, m), True)
            mask &= em
            _collect(collector, path, "minimum", em, valid)
        if node.maximum is not None:
            hi = float(node.maximum)
            with np.errstate(invalid="ignore"):
                m = (x < hi) if node.exclusive_maximum else (x <= hi)
            em = np.where(valid, np.where(np.isnan(x), False, m), True)
            mask &= em
            _collect(collector, path, "maximum", em, valid)

    # ---- string ----------------------------------------------------------
    if _is_stringy(dtype):
        if node.min_length is not None or node.max_length is not None:
            ln = pc.utf8_length(arr)  # codepoints (test/strlen*.json)
            if node.min_length is not None:
                em = _np_bool(pc.greater_equal(ln, node.min_length), True)
                mask &= em
                _collect(collector, path, "minLength", em, valid)
            if node.max_length is not None:
                em = _np_bool(pc.less_equal(ln, node.max_length), True)
                mask &= em
                _collect(collector, path, "maxLength", em, valid)
        if node.pattern is not None:
            em = _np_bool(pc.match_substring_regex(arr, node.pattern), True)
            mask &= em
            _collect(collector, path, "pattern", em, valid)
        if node.format is not None:
            em = _format_mask(node.format, arr, valid)
            mask &= em
            _collect(collector, path, "format", em, valid)

    # ---- array (list columns) ---------------------------------------------
    if pa.types.is_list(dtype) or pa.types.is_large_list(dtype):
        mask &= _eval_list(node, arr, valid, path, collector)
    elif pa.types.is_fixed_size_list(dtype):
        mask &= _eval_list(node, arr.cast(pa.list_(dtype.value_type)), valid,
                           path, collector)

    # ---- object (struct columns) ------------------------------------------
    if pa.types.is_struct(dtype):
        mask &= _eval_struct(node, arr, valid, path, collector)

    # ---- object (map columns: runtime keys) --------------------------------
    if pa.types.is_map(dtype):
        mask &= _eval_map(node, arr, valid, path, collector)

    # ---- combinators -------------------------------------------------------
    if node.all_of is not None:
        for i, sub in enumerate(node.all_of):
            mask &= eval_array(sub, arr, f"{path}/allOf/{i}", collector)
    if node.any_of is not None:
        m = np.zeros(n, dtype=bool)
        for i, sub in enumerate(node.any_of):
            m |= eval_array(sub, arr, f"{path}/anyOf/{i}", None)
        em = np.where(valid, m, True)
        mask &= em
        _collect(collector, path, "anyOf", em, valid)
    if node.one_of is not None:
        hits = np.zeros(n, dtype=np.int32)
        for sub in node.one_of:
            hits += eval_array(sub, arr, path, None)
        em = np.where(valid, hits == 1, True)
        mask &= em
        _collect(collector, path, "oneOf", em, valid)
    if node.not_ is not None:
        em = np.where(valid, ~eval_array(node.not_, arr, path, None), True)
        mask &= em
        _collect(collector, path, "not", em, valid)

    mask[~valid] = True  # absent ≡ null passes everything at this level
    return mask


def _compatible_enum_values(enum: list, dtype: pa.DataType):
    """Subset of enum values representable in the column's type, or None if
    empty, or '__python__' when the column is nested (slow path)."""
    if pa.types.is_nested(dtype):
        return "__python__"
    out = []
    for e in enum:
        if isinstance(e, bool):
            if pa.types.is_boolean(dtype):
                out.append(e)
        elif isinstance(e, numbers.Real):
            if _is_numeric(dtype):
                if pa.types.is_integer(dtype):
                    try:
                        iv = int(e)
                        if e == iv:  # exact-integer valued member
                            pa.scalar(iv, type=dtype)  # range check
                            out.append(iv)
                    except (OverflowError, ValueError, pa.lib.ArrowInvalid):
                        pass  # huge/out-of-range int: no column value equals it
                else:
                    try:
                        fv = float(e)
                        # exact representability: 10^17+1 must NOT alias to
                        # 1e17 (int/float equality in JSON is exact)
                        if fv == e and np.isfinite(fv):
                            out.append(fv)
                    except OverflowError:
                        pass
        elif isinstance(e, str):
            if _is_stringy(dtype):
                out.append(e)
        # null / nested enum values: nulls pass anyway; nested can't match a
        # flat column
    return out or None


def _format_mask(fmt: str, arr: pa.Array, valid: Mask) -> Mask:
    rx = FORMAT_REGEXES.get(fmt)
    if rx is not None:
        base = _np_bool(pc.match_substring_regex(arr, rx), True)
        if fmt in ("date-time", "hostname"):
            # regex prefilter, strict check only on regex-passing rows
            # (date-time: real calendar parse; hostname: the <=253 total
            # length RE2 cannot express without lookahead)
            checker = FORMAT_CHECKERS[fmt]
            idx = np.flatnonzero(base & valid)
            if len(idx):
                vals = arr.take(pa.array(idx)).to_pylist()
                strict = np.fromiter((checker(v) for v in vals), dtype=bool,
                                     count=len(idx))
                base[idx[~strict]] = False
        return np.where(valid, base, True)
    checker = FORMAT_CHECKERS.get(fmt)
    if checker is None:
        return np.ones(len(arr), dtype=bool)  # unknown format: pass
    m = np.fromiter(((v is None) or checker(v) for v in arr.to_pylist()),
                    dtype=bool, count=len(arr))
    return np.where(valid, m, True)


def _segment_all(elem_mask: Mask, offsets: np.ndarray) -> Mask:
    """Per-row AND-reduction of an element mask using list offsets (empty
    rows reduce to True)."""
    c = np.zeros(len(elem_mask) + 1, dtype=np.int64)
    np.cumsum(elem_mask, out=c[1:])
    starts, ends = offsets[:-1], offsets[1:]
    return (c[ends] - c[starts]) == (ends - starts)


def _eval_list(node: ConstraintNode, arr: pa.Array, valid: Mask, path: str,
               collector: Collector) -> Mask:
    n = len(arr)
    mask = np.ones(n, dtype=bool)
    # absolute offsets into arr.values (null rows contribute empty/ignored
    # segments and are forced to pass at the end of eval_array)
    rel = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = rel[1:] - rel[:-1]
    flat = arr.values

    if node.min_items is not None:
        em = np.where(valid, lengths >= node.min_items, True)
        mask &= em
        _collect(collector, path, "minItems", em, valid)
    if node.max_items is not None:
        em = np.where(valid, lengths <= node.max_items, True)
        mask &= em
        _collect(collector, path, "maxItems", em, valid)

    if node.unique_items and len(flat):
        em = np.where(valid, _rowwise_unique(flat, rel), True)
        mask &= em
        _collect(collector, path, "uniqueItems", em, valid)

    if node.items is not None:
        if not node.items.tuple_mode:
            sub = node.items.schemas[0]
            elem_mask = eval_array(sub, flat, f"{path}/items", None)
            em = np.where(valid, _segment_all(elem_mask, rel), True)
            mask &= em
            _collect(collector, path, "items", em, valid)
        else:
            spec = node.items.schemas
            for i, sub in enumerate(spec):
                has = lengths > i
                idx = rel[:-1][has] + i
                if len(idx) == 0:
                    continue
                pos_vals = flat.take(pa.array(idx))
                pos_mask = eval_array(sub, pos_vals, f"{path}/items/{i}", None)
                em = np.ones(n, dtype=bool)
                em[np.flatnonzero(has)[~pos_mask]] = False
                em = np.where(valid, em, True)
                mask &= em
                _collect(collector, path, f"items/{i}", em, valid)
            ai = node.additional_items
            if ai is FORBID:
                em = np.where(valid, lengths <= len(spec), True)
                mask &= em
                _collect(collector, path, "additionalItems", em, valid)
            elif isinstance(ai, ConstraintNode):
                # validate elements beyond the tuple positions
                extra_rows = np.flatnonzero(lengths > len(spec))
                if len(extra_rows):
                    idxs = np.concatenate([
                        np.arange(rel[r] + len(spec), rel[r + 1])
                        for r in extra_rows
                    ])
                    ex_vals = flat.take(pa.array(idxs))
                    ex_mask = eval_array(ai, ex_vals, f"{path}/additionalItems",
                                         None)
                    if not ex_mask.all():
                        bad_parents = np.unique(
                            np.repeat(
                                extra_rows,
                                (lengths[extra_rows] - len(spec)),
                            )[~ex_mask]
                        )
                        em = np.ones(n, dtype=bool)
                        em[bad_parents] = False
                        em = np.where(valid, em, True)
                        mask &= em
                        _collect(collector, path, "additionalItems", em, valid)
    return mask


def _rowwise_unique(flat: pa.Array, rel: np.ndarray) -> Mask:
    """True per row iff the row's list has no duplicate elements (row-local
    uniqueItems, test/arrayunique*.json — distinct from global uniqueness)."""
    n = len(rel) - 1
    flat = flat.slice(rel[0], rel[-1] - rel[0])  # align with offset window
    rel = rel - rel[0]
    parents = np.repeat(np.arange(n, dtype=np.int64), rel[1:] - rel[:-1])
    if pa.types.is_nested(flat.type):
        from jsschema_ray.kernels.json_eval import _canon
        vals = [_canon(v) for v in flat.to_pylist()]
        out = np.ones(n, dtype=bool)
        seen: dict = {}
        last_parent = -1
        cur: set = set()
        for p, v in zip(parents, vals):
            if p != last_parent:
                cur = set()
                last_parent = p
            if v in cur:
                out[p] = False
            cur.add(v)
        return out
    import pandas as pd
    df = pd.DataFrame({"p": parents, "v": flat.to_pandas()})
    dup = df.duplicated(["p", "v"]).to_numpy()
    out = np.ones(n, dtype=bool)
    bad = np.unique(parents[dup])
    out[bad] = False
    return out


# --------------------------------------------------------------------------
# object evaluation over a "field accessor" — shared by struct columns and
# whole tables (a table is an object whose keys are its columns)
# --------------------------------------------------------------------------

class _Fields:
    """Uniform view: named child arrays + per-row presence (non-null AND
    parent-valid)."""

    def __init__(self, names: list[str], get: Callable[[str], pa.Array],
                 parent_valid: Mask, nrows: int):
        self.names = names
        self._get = get
        self.parent_valid = parent_valid
        self.nrows = nrows
        self._cache: dict[str, pa.Array] = {}

    def col(self, name: str) -> Optional[pa.Array]:
        if name not in self.names:
            return None
        if name not in self._cache:
            self._cache[name] = self._get(name)
        return self._cache[name]

    def present(self, name: str) -> Mask:
        arr = self.col(name)
        if arr is None:
            return np.zeros(self.nrows, dtype=bool)
        return _valid_mask(arr) & self.parent_valid


def eval_object(node: ConstraintNode, fields: _Fields, path: str,
                collector: Collector) -> Mask:
    """Object-level keywords over named fields (absent ≡ null)."""
    node = node.deref()
    n = fields.nrows
    mask = np.ones(n, dtype=bool)

    if node.required:
        for r in node.required:
            em = fields.present(r)
            em = np.where(fields.parent_valid, em, True)
            mask &= em
            _collect(collector, f"{path}/required", r, em, fields.parent_valid)

    matched: set[str] = set()
    if node.properties:
        for name, sub in node.properties.items():
            matched.add(name)
            arr = fields.col(name)
            if arr is None:
                continue  # absent column: vacuous (unless required, above)
            em = eval_array(sub, arr, f"{path}/properties/{name}", collector)
            mask &= np.where(fields.parent_valid, em, True)
    if node.pattern_properties:
        for rx, sub in node.pattern_props_re():
            for name in fields.names:
                if rx.search(name):
                    matched.add(name)
                    em = eval_array(
                        sub, fields.col(name),
                        f"{path}/patternProperties/{rx.pattern}:{name}",
                        collector)
                    mask &= np.where(fields.parent_valid, em, True)

    ap = node.additional_properties
    if ap is not ALLOW:
        for name in fields.names:
            if name in matched:
                continue
            if ap is FORBID:
                em = ~fields.present(name)
                em = np.where(fields.parent_valid, em, True)
                mask &= em
                _collect(collector, f"{path}/additionalProperties", name, em,
                         fields.parent_valid)
            else:
                em = eval_array(ap, fields.col(name),
                                f"{path}/additionalProperties:{name}", collector)
                mask &= np.where(fields.parent_valid, em, True)

    if node.min_properties is not None or node.max_properties is not None:
        cnt = np.zeros(n, dtype=np.int32)
        for name in fields.names:
            cnt += fields.present(name)
        if node.min_properties is not None:
            em = np.where(fields.parent_valid, cnt >= node.min_properties, True)
            mask &= em
            _collect(collector, path, "minProperties", em, fields.parent_valid)
        if node.max_properties is not None:
            em = np.where(fields.parent_valid, cnt <= node.max_properties, True)
            mask &= em
            _collect(collector, path, "maxProperties", em, fields.parent_valid)

    if node.dependencies is not None:
        for k, names in node.dependencies.names.items():
            has_k = fields.present(k)
            for dep in names:
                em = ~has_k | fields.present(dep)
                em = np.where(fields.parent_valid, em, True)
                mask &= em
                _collect(collector, f"{path}/dependencies/{k}", dep, em,
                         fields.parent_valid)
        for k, sub in node.dependencies.schemas.items():
            has_k = fields.present(k)
            sub_mask = eval_object(sub, fields, f"{path}/dependencies/{k}", None)
            em = np.where(fields.parent_valid, ~has_k | sub_mask, True)
            mask &= em
            _collect(collector, f"{path}/dependencies/{k}", "schema", em,
                     fields.parent_valid)

    if node.all_of is not None:
        for i, sub in enumerate(node.all_of):
            mask &= eval_object(sub, fields, f"{path}/allOf/{i}", collector)
    if node.any_of is not None:
        m = np.zeros(n, dtype=bool)
        for i, sub in enumerate(node.any_of):
            m |= eval_object(sub, fields, f"{path}/anyOf/{i}", None)
        em = np.where(fields.parent_valid, m, True)
        mask &= em
        _collect(collector, path, "anyOf", em, fields.parent_valid)
    if node.one_of is not None:
        hits = np.zeros(n, dtype=np.int32)
        for sub in node.one_of:
            hits += eval_object(sub, fields, path, None)
        em = np.where(fields.parent_valid, hits == 1, True)
        mask &= em
        _collect(collector, path, "oneOf", em, fields.parent_valid)
    if node.not_ is not None:
        em = np.where(fields.parent_valid,
                      ~eval_object(node.not_, fields, path, None), True)
        mask &= em
        _collect(collector, path, "not", em, fields.parent_valid)

    mask[~fields.parent_valid] = True
    return mask


def _eval_struct(node: ConstraintNode, arr: pa.StructArray, valid: Mask,
                 path: str, collector: Collector) -> Mask:
    names = [f.name for f in arr.type]

    # children under a null struct row may hold garbage; harmless because
    # eval_object forces rows with parent_valid == False to pass
    fields = _Fields(names, arr.field, valid, len(arr))
    return eval_object(node, fields, path, collector)


def _eval_map(node: ConstraintNode, arr: pa.MapArray, valid: Mask,
              path: str, collector: Collector) -> Mask:
    """Object keywords over pa.map_ columns — keys exist at RUNTIME (unlike
    struct columns, whose keys are the compile-time field names): key-count
    bounds via offsets, required/dependencies via per-row key membership,
    properties/patternProperties/additionalProperties applied to values by
    matching flat keys (uniformly typed values, so one sub-mask per rule)."""
    n = len(arr)
    mask = np.ones(n, dtype=bool)
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    rel = off - off[0]
    counts = rel[1:] - rel[:-1]
    # child arrays are full buffers with absolute offsets; slice to window
    flat_keys = arr.keys.slice(off[0], off[-1] - off[0])
    flat_vals = arr.items.slice(off[0], off[-1] - off[0])

    if node.min_properties is not None:
        em = np.where(valid, counts >= node.min_properties, True)
        mask &= em
        _collect(collector, path, "minProperties", em, valid)
    if node.max_properties is not None:
        em = np.where(valid, counts <= node.max_properties, True)
        mask &= em
        _collect(collector, path, "maxProperties", em, valid)

    ks = np.asarray(flat_keys.to_pylist(), dtype=object)
    par = np.repeat(np.arange(n, dtype=np.int64), counts)

    def _present(name: str) -> Mask:
        hit = np.zeros(n, dtype=bool)
        sel = np.flatnonzero(ks == name)
        hit[par[sel]] = True
        return hit

    if node.required:
        for r in node.required:
            em = np.where(valid, _present(r), True)
            mask &= em
            _collect(collector, f"{path}/required", r, em, valid)

    if node.dependencies is not None:
        for k, names in node.dependencies.names.items():
            has_k = _present(k)
            for dep in names:
                em = np.where(valid, ~has_k | _present(dep), True)
                mask &= em
                _collect(collector, f"{path}/dependencies/{k}", dep, em, valid)

    props = node.properties or {}
    pprops = node.pattern_props_re() if node.pattern_properties else []
    ap = node.additional_properties
    if props or pprops or ap is not ALLOW:
        matched_any = np.zeros(len(ks), dtype=bool)

        def _apply(sel: np.ndarray, sub: ConstraintNode, sub_path: str):
            nonlocal mask
            if len(sel) == 0:
                return
            vmask = eval_array(sub, flat_vals.take(pa.array(sel)), sub_path,
                               None)
            bad_parents = np.unique(par[sel[~vmask]])
            if len(bad_parents):
                em = np.ones(n, dtype=bool)
                em[bad_parents] = False
                em = np.where(valid, em, True)
                mask &= em
                _collect(collector, sub_path, "value", em, valid)

        for name, sub in props.items():
            sel = np.flatnonzero(ks == name)
            matched_any[sel] = True
            _apply(sel, sub, f"{path}/properties/{name}")
        for rx, sub in pprops:
            hits = np.fromiter((bool(rx.search(k)) for k in ks), dtype=bool,
                               count=len(ks))
            sel = np.flatnonzero(hits)
            matched_any[sel] = True
            _apply(sel, sub, f"{path}/patternProperties/{rx.pattern}")
        unmatched = np.flatnonzero(~matched_any)
        if ap is FORBID and len(unmatched):
            bad_parents = np.unique(par[unmatched])
            em = np.ones(n, dtype=bool)
            em[bad_parents] = False
            em = np.where(valid, em, True)
            mask &= em
            _collect(collector, f"{path}/additionalProperties", "map-key", em,
                     valid)
        elif isinstance(ap, ConstraintNode):
            _apply(unmatched, ap, f"{path}/additionalProperties")
    return mask


def eval_table(node: ConstraintNode, table: pa.Table,
               collector: Collector = None, path: str = "#") -> Mask:
    """Per-row pass mask of an (object-rooted) ConstraintDAG over a table:
    the table IS the draft-04 object instance, columns are its keys."""
    node_eff = node.deref()
    if node_eff.types is not None and "object" not in node_eff.types:
        raise ValueError(
            f"table validation needs an object-rooted schema, got type={node_eff.types}"
        )
    n = table.num_rows
    fields = _Fields(
        table.column_names,
        lambda name: table.column(name).combine_chunks(),
        np.ones(n, dtype=bool),
        n,
    )
    return eval_object(node, fields, path, collector)
