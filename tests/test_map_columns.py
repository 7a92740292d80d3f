"""Object keywords over pa.map_ columns (runtime keys) — differential
against the row-wise evaluator (maps decode to dicts via to_pylist)."""

import numpy as np
import pyarrow as pa
import pytest

from jsschema_ray import compile_schema
from jsschema_ray.kernels import evaluate
from jsschema_ray.kernels.columnar import eval_array


def _mk(rows):
    return pa.array(rows, type=pa.map_(pa.string(), pa.int64()))


def _agree(schema, arr):
    dag = compile_schema(schema)
    got = eval_array(dag, arr)
    want = [
        True if v is None else evaluate(dag, dict(v)) for v in arr.to_pylist()
    ]
    assert got.tolist() == want, (
        f"{schema} {arr.to_pylist()} got={got.tolist()} want={want}"
    )


ROWS = [
    {"a": 1, "b": 2},
    {"a": -5},
    {"x": 7, "y": 8, "z": 9, "w": 0},
    {},
    None,
    {"credit_card": 1, "billing_address": 2},
    {"credit_card": 1},
    {"S_alpha": 3, "I_beta": -1},
]


@pytest.mark.parametrize(
    "schema",
    [
        {"minProperties": 1, "maxProperties": 2},
        {"required": ["a"]},
        {"required": ["a", "b"]},
        {"dependencies": {"credit_card": ["billing_address"]}},
        {"properties": {"a": {"minimum": 0}}},
        {"patternProperties": {"^S_": {"minimum": 0}, "^I_": {"maximum": 0}}},
        {"properties": {"a": {"minimum": 0}}, "additionalProperties": False},
        {"properties": {"a": {}}, "additionalProperties": {"minimum": 0}},
        {"minProperties": 1, "required": ["a"],
         "properties": {"a": {"multipleOf": 1}}},
    ],
    ids=range(9),
)
def test_map_object_keywords(schema):
    _agree(schema, _mk(ROWS))


def test_map_sliced():
    arr = _mk(ROWS).slice(1, 5)
    _agree({"required": ["x"], "minProperties": 1}, arr)


def test_map_in_table():
    from jsschema_ray.kernels.columnar import eval_table

    t = pa.table({"id": [1, 2, 3],
                  "props": _mk([{"a": 1}, {"b": 2}, {"a": -1}])})
    dag = compile_schema(
        {"type": "object",
         "properties": {"props": {"required": ["a"],
                                  "properties": {"a": {"minimum": 0}}}}}
    )
    assert eval_table(dag, t).tolist() == [True, False, False]


# ---- randomized differential (hypothesis; FUZZ_EXAMPLES/FUZZ_RANDOM as in
# test_property_differential) --------------------------------------------
import os

from hypothesis import given, settings, strategies as st

settings.register_profile(
    "maps", max_examples=int(os.environ.get("FUZZ_EXAMPLES", "60")),
    deadline=None, derandomize=os.environ.get("FUZZ_RANDOM", "") != "1",
)
settings.load_profile("maps")

_KEYS = ["a", "b", "c", "S_x", "I_y"]

_MAP_SCHEMA = st.fixed_dictionaries(
    {},
    optional={
        "minProperties": st.integers(0, 4),
        "maxProperties": st.integers(0, 5),
        "required": st.lists(st.sampled_from(_KEYS), max_size=3, unique=True),
        "dependencies": st.fixed_dictionaries(
            {}, optional={"a": st.lists(st.sampled_from(["b", "c"]),
                                        min_size=1, max_size=2, unique=True)}
        ),
        "properties": st.fixed_dictionaries(
            {},
            optional={
                "a": st.fixed_dictionaries(
                    {}, optional={"minimum": st.integers(-5, 5),
                                  "multipleOf": st.sampled_from([2, 3])}
                ),
                "b": st.fixed_dictionaries(
                    {}, optional={"maximum": st.integers(-5, 5)}
                ),
            },
        ),
        "patternProperties": st.fixed_dictionaries(
            {}, optional={"^S_": st.just({"minimum": 0}),
                          "^I_": st.just({"maximum": 0})}
        ),
        "additionalProperties": st.booleans(),
    },
)

_MAP_ROWS = st.lists(
    st.one_of(
        st.none(),
        st.dictionaries(st.sampled_from(_KEYS), st.integers(-10, 10),
                        max_size=5),
    ),
    max_size=20,
)


@given(schema=_MAP_SCHEMA, rows=_MAP_ROWS)
def test_map_object_keywords_fuzz(schema, rows):
    _agree(schema, _mk(rows))


def test_unnest_list_semantics(ray_session):
    """unnest_list: null/empty lists drop, element nulls pass through,
    0-based ordinality, id replication, layout independence."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from jsschema_ray.stages.transform import unnest_list

    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "xs": pa.array([[1.5, None, 3.0], [], None, [7.0]],
                       pa.list_(pa.float64())),
    })
    for blocks in (1, 3):
        ds = ray.data.from_arrow(t).repartition(blocks)
        out = unnest_list(ds, "xs", ["id"]).to_pandas() \
            .sort_values(["id", "pos"]).reset_index(drop=True)
        assert out.id.tolist() == [1, 1, 1, 4]
        assert out.pos.tolist() == [0, 1, 2, 0]
        assert out.value[0] == 1.5 and np.isnan(out.value[1]) \
            and out.value[3] == 7.0
