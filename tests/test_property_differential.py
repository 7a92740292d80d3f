"""Property-based differential testing: random draft-04 schemas × random
Arrow columns — the vectorized columnar kernels must agree row-by-row with
the corpus-pinned row-wise evaluator (absent ≡ null translation).

Hypothesis widens coverage beyond the hand-written cases in
tests/test_columnar.py (derandomized: deterministic in CI)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from jsschema_ray import compile_schema
from jsschema_ray.kernels import evaluate
from jsschema_ray.kernels.columnar import eval_array

import os

# FUZZ_EXAMPLES raises the budget for one-off deep sweeps (e.g. 2000);
# derandomize keeps CI deterministic either way
settings.register_profile(
    "ci", max_examples=int(os.environ.get("FUZZ_EXAMPLES", "120")),
    deadline=None,
    derandomize=os.environ.get("FUZZ_RANDOM", "") != "1",
)
settings.load_profile("ci")


# -- schema strategies (keyword combinations the kernels must compose) ------

num_schema = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(["integer", "number"]),
        "minimum": st.integers(-50, 50),
        "maximum": st.integers(-50, 50),
        "exclusiveMinimum": st.booleans(),
        "exclusiveMaximum": st.booleans(),
        "multipleOf": st.sampled_from([2, 3, 5, 7, 2.5]),
        "enum": st.lists(st.integers(-50, 50), min_size=1, max_size=5),
    },
)

str_schema = st.fixed_dictionaries(
    {},
    optional={
        "type": st.just("string"),
        "minLength": st.integers(0, 8),
        "maxLength": st.integers(0, 12),
        "pattern": st.sampled_from(["^a", "b$", "[0-9]+", "^[a-c]{2,4}$"]),
        "enum": st.lists(st.text("abc019 ", max_size=6), min_size=1,
                         max_size=4),
    },
)


def combinator_of(base):
    return st.one_of(
        base,
        st.fixed_dictionaries({"allOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"anyOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"oneOf": st.lists(base, min_size=1, max_size=3)}),
        st.fixed_dictionaries({"not": base}),
    )


num_values = st.lists(
    st.one_of(
        st.none(),
        st.integers(-60, 60),
        st.floats(-60, 60, allow_nan=False),
        # float64-exact specials: signed zeros (the fuzz find behind the
        # enum normalization) and large power-of-two magnitudes
        st.sampled_from([-0.0, 0.0, 2.0**53, -(2.0**60)]),
    ),
    min_size=0, max_size=40,
)
str_values = st.lists(
    st.one_of(st.none(), st.text("abc019 ", max_size=10)),
    min_size=0, max_size=40,
)


def _check(schema, values, arrow_type):
    dag = compile_schema(schema)
    arr = pa.array(values, type=arrow_type)
    got = eval_array(dag, arr)
    # arrow may coerce values (e.g. float -> float64); compare against the
    # ARROW-side values so both paths see identical data
    pyvals = arr.to_pylist()
    want = np.array(
        [True if v is None else evaluate(dag, v) for v in pyvals]
    )
    assert got.tolist() == want.tolist(), (
        f"schema={schema} values={pyvals} got={got.tolist()} want={want.tolist()}"
    )


@given(combinator_of(num_schema), num_values)
def test_numeric_schemas_agree(schema, values):
    _check(schema, values, pa.float64())


@given(combinator_of(num_schema),
       st.lists(st.one_of(st.none(), st.integers(-60, 60),
                          # beyond-2^53: float shortcuts lie about
                          # divisibility/equality (exact-path territory)
                          st.integers(-(10**18), 10**18)),
                max_size=40))
def test_integer_column_schemas_agree(schema, values):
    _check(schema, values, pa.int64())


@given(combinator_of(str_schema), str_values)
def test_string_schemas_agree(schema, values):
    _check(schema, values, pa.string())


@given(
    st.fixed_dictionaries(
        {},
        optional={
            "minItems": st.integers(0, 4),
            "maxItems": st.integers(0, 6),
            "uniqueItems": st.booleans(),
            "items": st.one_of(
                num_schema,
                st.lists(num_schema, min_size=1, max_size=3),
            ),
            "additionalItems": st.one_of(st.booleans(), num_schema),
        },
    ),
    st.lists(
        st.one_of(
            st.none(),
            st.lists(st.integers(-20, 20), max_size=6),
        ),
        max_size=25,
    ),
)
def test_list_schemas_agree(schema, values):
    _check(schema, values, pa.list_(pa.int64()))


struct_values = st.lists(
    st.one_of(
        st.none(),
        st.fixed_dictionaries(
            {},
            optional={
                "a": st.one_of(st.none(), st.integers(-20, 20)),
                "b": st.one_of(st.none(), st.text("xy", max_size=4)),
                "c": st.one_of(st.none(), st.integers(-20, 20)),
            },
        ),
    ),
    max_size=25,
)


@given(
    st.fixed_dictionaries(
        {},
        optional={
            "required": st.lists(st.sampled_from(["a", "b", "c"]),
                                 max_size=2, unique=True),
            "minProperties": st.integers(0, 3),
            "maxProperties": st.integers(0, 3),
            "dependencies": st.just({"a": ["b"]}),
            "properties": st.just({"a": {"minimum": 0},
                                   "b": {"maxLength": 2}}),
            "additionalProperties": st.sampled_from(
                [True, False, {"maximum": 5}]),
        },
    ),
    struct_values,
)
def test_struct_schemas_agree(schema, values):
    t = pa.struct([("a", pa.int64()), ("b", pa.string()), ("c", pa.int64())])
    # normalize: missing dict keys become nulls (absent ≡ null)
    rows = [None if v is None else
            {"a": v.get("a"), "b": v.get("b"), "c": v.get("c")} for v in values]
    arr = pa.array(rows, type=t)
    dag = compile_schema(schema)
    got = eval_array(dag, arr)
    want = np.array([
        True if v is None else evaluate(
            dag, {k: x for k, x in v.items() if x is not None})
        for v in arr.to_pylist()
    ])
    assert got.tolist() == want.tolist(), (
        f"schema={schema} rows={arr.to_pylist()}"
    )
