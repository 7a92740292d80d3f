"""Conformance against the reference's behavioral contract: 21 schema
families x pass/fail fixtures under /root/reference/test/, the same corpus
schema_test.go:35-105 drives. Fixture files are treated as DATA.

Contract: <family>.json compiles; every <family>_pass*.json validates;
every <family>_fail*.json does not (violation recall 1.0)."""

import glob
import json
import os

import pytest

from jsschema_ray import compile_schema
from jsschema_ray.kernels import validate_value
from tests.conftest import REFERENCE_TEST_DIR

# family list mirrors schema_test.go:36-58
FAMILIES = [
    "allof", "anyof", "array", "arraylength", "arraytuple",
    "arraytuple_disallow_additional", "arrayunique", "boolean", "business",
    "integer", "not", "null", "numrange", "numrange_exclmax",
    "objectpatterns", "objectpropdepend", "objectpropsize",
    "objectproprequired", "oneof", "strlen", "strpattern",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_TEST_DIR), reason="reference corpus not present"
)


def _fixtures(family, kind):
    return sorted(glob.glob(f"{REFERENCE_TEST_DIR}/{family}_{kind}*.json"))


@pytest.mark.parametrize("family", FAMILIES)
def test_family(family):
    dag = compile_schema(f"{REFERENCE_TEST_DIR}/{family}.json")
    passes = _fixtures(family, "pass")
    fails = _fixtures(family, "fail")
    assert passes or fails, f"no fixtures for {family}"
    for f in passes:
        # skip files belonging to a longer family name (e.g. arraytuple vs
        # arraytuple_disallow_additional share the arraytuple_ prefix — they
        # don't, but guard anyway via exact stem match)
        value = json.loads(open(f).read())
        ok, vio = validate_value(dag, value)
        assert ok, f"{f} should PASS but got {vio}"
    for f in fails:
        value = json.loads(open(f).read())
        ok, _ = validate_value(dag, value)
        assert not ok, f"{f} should FAIL but passed"


def test_fixture_coverage():
    """Every pass/fail fixture in the corpus belongs to a tested family."""
    all_fixtures = glob.glob(f"{REFERENCE_TEST_DIR}/*_pass*.json") + glob.glob(
        f"{REFERENCE_TEST_DIR}/*_fail*.json"
    )
    prefixes = sorted(FAMILIES, key=len, reverse=True)
    for f in all_fixtures:
        stem = os.path.basename(f)
        assert any(
            stem.startswith(p + "_pass") or stem.startswith(p + "_fail")
            for p in prefixes
        ), f"untested fixture {f}"


def test_parse_meta_schema():
    """The 4.4 KB draft-04 core meta-schema parses (schema_test.go:16-25)."""
    dag = compile_schema(f"{REFERENCE_TEST_DIR}/schema.json")
    assert dag.properties and "id" in dag.properties
    # the meta-schema is self-cyclic ("additionalProperties": {"$ref": "#"})
    assert dag.definitions and "schemaArray" in dag.definitions


def test_parse_qiita_schema():
    """40 KB real-world hyper-schema parses (schema_test.go:16-25)."""
    dag = compile_schema(f"{REFERENCE_TEST_DIR}/qiita.json")
    assert dag.properties and len(dag.properties) >= 10


def test_meta_schema_validates_family_schemas():
    """Bonus semantic check: every family schema is a valid instance of the
    draft-04 meta-schema per our evaluator."""
    meta = compile_schema(f"{REFERENCE_TEST_DIR}/schema.json")
    for family in FAMILIES:
        raw = json.loads(open(f"{REFERENCE_TEST_DIR}/{family}.json").read())
        ok, vio = validate_value(meta, raw)
        assert ok, f"{family}.json fails meta-schema: {vio}"
