"""Differential test: the vectorized columnar kernels must agree row-by-row
with the corpus-verified row-wise evaluator (tests/test_conformance.py pins
that one against /root/reference/test). Translation rule: absent ≡ null —
null cells are dropped from the row dict before row-wise evaluation."""

import numpy as np
import pyarrow as pa
import pytest

from jsschema_ray import compile_schema
from jsschema_ray.kernels import evaluate
from jsschema_ray.kernels.columnar import eval_array, eval_table


def _drop_nulls(v):
    if isinstance(v, dict):
        return {k: _drop_nulls(x) for k, x in v.items() if x is not None}
    if isinstance(v, list):
        return [_drop_nulls(x) for x in v]
    return v


def _assert_column_agrees(schema, arr):
    dag = compile_schema(schema)
    got = eval_array(dag, arr)
    want = np.array(
        [True if v is None else evaluate(dag, _drop_nulls(v))
         for v in arr.to_pylist()]
    )
    assert got.tolist() == want.tolist(), (
        f"schema={schema} values={arr.to_pylist()} got={got.tolist()} want={want.tolist()}"
    )


CASES = [
    # numeric range / exclusivity (test/numrange*.json semantics)
    ({"minimum": 0, "maximum": 100, "exclusiveMaximum": True},
     pa.array([0, 10, 99, 100, 101, -1, None], type=pa.int32())),
    ({"minimum": 1.4142135623, "maximum": 3.1415926535},
     pa.array([2.0, 2.2360679775, 1.0, 4.0, None], type=pa.float64())),
    # multipleOf + combinators (allof/oneof fixtures)
    ({"allOf": [{"multipleOf": 5}, {"multipleOf": 3}]},
     pa.array([15, 10, 9, 30, None])),
    ({"oneOf": [{"multipleOf": 5}, {"multipleOf": 3}]},
     pa.array([10, 9, 15, 7, None])),
    ({"not": {"multipleOf": 5}}, pa.array([3, 5, None])),
    ({"anyOf": [{"minimum": 100}, {"maximum": 10}]},
     pa.array([5, 50, 150, None])),
    # integer as value constraint on a float column (test/integer_fail001)
    ({"type": "integer"}, pa.array([3.0, 3.1415926, -1.0, None])),
    ({"type": "integer"}, pa.array([1, 2, None], type=pa.int64())),
    ({"type": "string"}, pa.array([1, 2, None])),
    ({"type": ["number", "null"]}, pa.array([1.5, None])),
    # enum incl. type-mismatched members
    ({"enum": ["png", "jpeg", "webp"]},
     pa.array(["png", "gif", "webp", None])),
    ({"enum": [1, 2, "x"]}, pa.array([1, 3, None], type=pa.int64())),
    ({"enum": [1.5, 2]}, pa.array([1.5, 2.0, 2.5, None])),
    ({"enum": [True]}, pa.array([True, False, None])),
    # string length / pattern / format
    ({"minLength": 5, "maxLength": 10},
     pa.array(["hello!!!!!", "hello, world!", "hi", "héllo", None])),
    ({"pattern": "^(\\([0-9]{3}\\))?[0-9]{3}-[0-9]{4}$"},
     pa.array(["555-1212", "(888)555-1212", "(888)555-1212 ext. 532",
               "(800)FLOWERS", None])),
    ({"format": "email"}, pa.array(["a@b.co", "nope", None])),
    ({"format": "ipv4"}, pa.array(["1.2.3.4", "300.1.1.1", "x", None])),
    ({"format": "date-time"},
     pa.array(["2024-01-01T10:00:00Z", "2024-13-01T10:00:00Z", "nope", None])),
    ({"format": "uri"}, pa.array(["http://a.b/c", "not a uri", None])),
    # arrays: length, unique, items list mode
    ({"minItems": 2, "maxItems": 3},
     pa.array([[1, 2], [1, 2, 3], [], [1], [1, 2, 3, 4], None],
              type=pa.list_(pa.int64()))),
    ({"uniqueItems": True},
     pa.array([[1, 2, 3], [1, 2, 2], [], None], type=pa.list_(pa.int64()))),
    ({"uniqueItems": True},
     pa.array([["a", "b"], ["a", "a"], None], type=pa.list_(pa.string()))),
    ({"items": {"type": "integer", "minimum": 0}},
     pa.array([[1, 2], [-1, 2], [], None], type=pa.list_(pa.int64()))),
    # tuple mode + additionalItems (arraytuple fixtures)
    ({"items": [{"minimum": 100}, {"enum": ["Street", "Avenue"]}]},
     pa.array([["1600", "Avenue"], ["1600", "Drive"], ["1600"], [], None],
              type=pa.list_(pa.string()))),
    ({"items": [{"pattern": "^a"}], "additionalItems": False},
     pa.array([["ax"], ["ax", "extra"], [], None],
              type=pa.list_(pa.string()))),
    ({"items": [{"pattern": "^a"}], "additionalItems": {"maxLength": 2}},
     pa.array([["ax", "yy"], ["ax", "toolong"], None],
              type=pa.list_(pa.string()))),
]


@pytest.mark.parametrize("schema,arr", CASES, ids=range(len(CASES)))
def test_column_kernels_agree(schema, arr):
    _assert_column_agrees(schema, arr)


def test_struct_object_keywords():
    t = pa.struct(
        [("name", pa.string()), ("email", pa.string()),
         ("credit_card", pa.float64()), ("billing_address", pa.string())]
    )
    arr = pa.array(
        [
            {"name": "n", "email": "e@x.co", "credit_card": 1.0,
             "billing_address": "addr"},
            {"name": "n", "email": None, "credit_card": None,
             "billing_address": None},                      # required email fails
            {"name": "n", "email": "e@x.co", "credit_card": 1.0,
             "billing_address": None},                      # dependency fails
            None,                                           # null struct passes
        ],
        type=t,
    )
    schema = {
        "type": "object",
        "required": ["name", "email"],
        "dependencies": {"credit_card": ["billing_address"]},
        "properties": {"email": {"format": "email"}},
    }
    _assert_column_agrees(schema, arr)


def test_struct_propsize_and_additional():
    t = pa.struct([("a", pa.int64()), ("b", pa.int64()), ("c", pa.int64())])
    arr = pa.array(
        [{"a": 1, "b": 2, "c": 3}, {"a": 1, "b": None, "c": None},
         {"a": 1, "b": 2, "c": None}, None],
        type=t,
    )
    _assert_column_agrees({"minProperties": 2, "maxProperties": 2}, arr)
    _assert_column_agrees(
        {"properties": {"a": {"type": "integer"}}, "additionalProperties": False},
        arr,
    )


def test_table_eval_matches_rowwise():
    table = pa.table(
        {
            "image_id": ["img-000000000001", "img-000000000002", "bad id", None],
            "w": pa.array([100, 5000, 64, 32], type=pa.int32()),
            "fmt": ["png", "gif", "webp", "jpeg"],
            "caption": ["a caption here", "x", "another caption", "ok caption"],
        }
    )
    schema = {
        "type": "object",
        "required": ["image_id", "w"],
        "properties": {
            "image_id": {"type": "string", "pattern": "^img-[0-9]{12}$"},
            "w": {"type": "integer", "minimum": 16, "maximum": 4096},
            "fmt": {"enum": ["png", "jpeg", "webp"]},
            "caption": {"type": "string", "minLength": 5, "maxLength": 200},
        },
    }
    dag = compile_schema(schema)
    got = eval_table(dag, table)
    want = [
        evaluate(dag, _drop_nulls({k: v for k, v in row.items()}))
        for row in table.to_pylist()
    ]
    assert got.tolist() == want
    assert got.tolist() == [True, False, False, False]


def test_table_collector_attribution():
    table = pa.table({"w": pa.array([10, 200], type=pa.int32())})
    dag = compile_schema(
        {"type": "object", "properties": {"w": {"minimum": 16, "maximum": 100}}}
    )
    collector = []
    eval_table(dag, table, collector)
    found = {(p, kw): idx.tolist() for p, kw, idx in collector}
    assert found[("#/properties/w", "minimum")] == [0]
    assert found[("#/properties/w", "maximum")] == [1]


def test_missing_required_column():
    table = pa.table({"w": pa.array([1, 2], type=pa.int32())})
    dag = compile_schema({"type": "object", "required": ["image_id"]})
    assert eval_table(dag, table).tolist() == [False, False]


def test_pattern_properties_on_column_names():
    # objectpatterns family (test/objectpatterns*.json) at table level:
    # ^S_ -> string, ^I_ -> integer, additionalProperties: false
    schema = {
        "type": "object",
        "patternProperties": {
            "^S_": {"type": "string"},
            "^I_": {"type": "integer"},
        },
        "additionalProperties": False,
    }
    dag = compile_schema(schema)
    ok = eval_table(dag, pa.table({"S_0": ["x"], "I_42": [7]}))
    assert ok.tolist() == [True]
    bad_type = eval_table(dag, pa.table({"S_0": [3]}))
    assert bad_type.tolist() == [False]
    extra = eval_table(dag, pa.table({"S_0": ["x"], "keyword": ["v"]}))
    assert extra.tolist() == [False]


def test_sliced_list_and_chunked_inputs():
    arr = pa.array([[1, 2], [3], [4, 4], [5]], type=pa.list_(pa.int64()))
    sliced = arr.slice(1, 3)
    dag = compile_schema({"uniqueItems": True, "minItems": 1})
    assert eval_array(dag, sliced).tolist() == [True, False, True]
    chunked = pa.chunked_array([arr.slice(0, 2), arr.slice(2, 2)])
    assert eval_array(dag, chunked).tolist() == [True, True, False, True]


def test_table_level_object_keywords():
    # dependencies / min-maxProperties with COLUMNS as the object's keys
    table = pa.table(
        {
            "credit_card": pa.array([1.0, None, 2.0], type=pa.float64()),
            "billing_address": pa.array(["a", None, None], type=pa.string()),
            "name": pa.array(["x", "y", None], type=pa.string()),
        }
    )
    dag = compile_schema(
        {"type": "object",
         "dependencies": {"credit_card": ["billing_address"]},
         "minProperties": 1}
    )
    got = eval_table(dag, table)
    # row0: cc+addr ok; row1: no cc (vacuous) and 0 present keys -> minProps
    # fails? row1 has all nulls except name='y' -> 1 key present -> passes;
    # row2: cc present, addr null -> dependency fails
    assert got.tolist() == [True, True, False]


def test_multipleof_large_integers_exact():
    """Beyond 2^53, float division lies about divisibility (10^17+1 looks
    like a multiple of 10 in float64). Both evaluators now use exact
    integer modulo for integer values with an integral divisor — and must
    agree (round-2 ADVICE fix)."""
    vals = pa.array(
        [10**17, 10**17 + 1, 2**62, 2**62 + 6, -(10**17) - 1, 70, 71, None],
        type=pa.int64(),
    )
    for k in (10, 2, 7):
        _assert_column_agrees({"multipleOf": k}, vals)
    # the row-wise evaluator must give the exact answers, not float ones
    dag = compile_schema({"multipleOf": 10})
    assert evaluate(dag, 10**17) is True
    assert evaluate(dag, 10**17 + 1) is False  # float path would say True


def test_multipleof_huge_int_type_check():
    """10^400 against {'type':'integer'} must not raise (ADVICE: the old
    float(v) overflowed) and huge ints compare correctly against bounds."""
    from jsschema_ray.kernels import validate_value

    dag = compile_schema({"type": "integer", "maximum": 100})
    ok, vio = validate_value(dag, 10**400)
    assert not ok  # it IS an integer but exceeds the maximum
    dag2 = compile_schema({"type": "integer"})
    ok2, _ = validate_value(dag2, 10**400)
    assert ok2
    dag3 = compile_schema({"type": "integer", "minimum": 0})
    ok3, _ = validate_value(dag3, -(10**400))
    assert not ok3


def test_enum_signed_zero():
    """-0.0 equals 0 as a JSON number; Arrow is_in hashes them apart —
    the kernel must normalize signed zeros (found by randomized fuzzing)."""
    _assert_column_agrees(
        {"enum": [0]},
        pa.array([-0.0, 0.0, 1.0, None], type=pa.float64()),
    )
    _assert_column_agrees(
        {"enum": [-0.0, 2.5]},
        pa.array([0.0, -0.0, 2.5, -2.5, None], type=pa.float64()),
    )


def test_format_hostname_columnar():
    """format: hostname must run through the vectorized path — the original
    single-regex form used a lookahead that RE2 (Arrow's engine) rejects
    with ArrowInvalid, killing any job with a hostname constraint (found by
    a direct differential sweep of every format)."""
    _assert_column_agrees(
        {"format": "hostname"},
        pa.array(["example.com", "a" * 64 + ".com", "-bad.com",
                  "ok-host.org", "x", "a." * 130 + "io", "", None],
                 type=pa.string()),
    )


def test_enum_huge_and_inexact_integers():
    """Enum members beyond float/int64 range must not crash either path,
    and int/float equality is EXACT: enum [10^17+1] does not match a float
    column holding 1e17 (the old float() canon aliased them)."""
    _assert_column_agrees({"enum": [10**400, 5]},
                          pa.array([5, 7, None], type=pa.int64()))
    _assert_column_agrees({"enum": [10**17 + 1]},
                          pa.array([1e17, None], type=pa.float64()))
    _assert_column_agrees({"enum": [2**63]},  # out of int64 range
                          pa.array([5, None], type=pa.int64()))


def test_nan_fails_numeric_constraints_both_paths():
    """NaN satisfies no numeric constraint in either evaluator (Python's
    json.loads lets NaN through; comparisons are all-False so the old
    row-wise path silently PASSED NaN against minimum/maximum)."""
    nan = float("nan")
    for schema in ({"minimum": 0}, {"maximum": 10}, {"multipleOf": 2},
                   {"minimum": 0, "exclusiveMinimum": True}):
        _assert_column_agrees(
            schema, pa.array([nan, 1.0, None], type=pa.float64())
        )
        dag = compile_schema(schema)
        assert evaluate(dag, nan) is False, schema
