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
