"""Row-wise draft-04 evaluator over decoded JSON values.

Semantics are pinned by the reference's conformance corpus
(/root/reference/test/, 21 families, driven by schema_test.go:35-105); the
reference itself delegates execution to the external jsval library
(validator/validator.go:32-63), so the corpus IS the behavioral contract.

This evaluator serves two roles:
  1. conformance parity in tests — every reference pass/fail fixture must
     agree (tests/test_conformance.py);
  2. the per-row fallback operator for *dynamic* JSON columns (e.g. the
     ``events.props`` JSON-string column) where a fixed Arrow schema cannot
     be compiled — run inside map_batches with the compiled DAG held in
     actor state (stages/validate.py JsonColumnValidator).

The hot tabular path does NOT go through here; it uses the vectorized
columnar kernels in kernels/columnar.py.

Key draft-04 rules encoded (with corpus witnesses):
  * keywords only constrain values of their own type class — e.g. numeric
    keywords ignore strings (spec §5; corpus relies on this throughout);
  * ``integer`` is a value constraint: 3.1415926 fails, 42/-1 pass
    (test/integer_fail001.json, integer_pass00{1,2}.json);
  * booleans are not numbers; numbers are not booleans (test/boolean_*);
  * ``pattern`` is unanchored *search* (test/strpattern*.json);
  * string length counts codepoints (test/strlen*.json);
  * tuple ``items``: shorter instance passes, extras pass unless
    additionalItems forbids (test/arraytuple_pass00{2,3}.json,
    arraytuple_disallow_additional_fail001.json);
  * ``uniqueItems`` equality: 1 == 1.0 but 1 != true (spec §5.12);
  * ``required``/``dependencies`` are about key PRESENCE, not null-ness
    (test/objectproprequired*.json, objectpropdepend*.json);
  * ``oneOf`` = exactly one (test/oneof_fail001.json: 15 matches both).
"""

from __future__ import annotations

import numbers
from typing import Any, Optional

from jsschema_ray.kernels.formats import check_format
from jsschema_ray.schema.nodes import FORBID, ConstraintNode


class Violation:
    """One constraint failure: path into the schema + observed value."""

    __slots__ = ("path", "keyword", "observed", "expected")

    def __init__(self, path: str, keyword: str, observed: Any, expected: Any):
        self.path = path
        self.keyword = keyword
        self.observed = observed
        self.expected = expected

    def __repr__(self) -> str:
        return f"Violation({self.path}#{self.keyword}: got {self.observed!r}, want {self.expected!r})"


def _type_of(v: Any) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, numbers.Real):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, (list, tuple)):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise TypeError(f"not a JSON value: {type(v)!r}")


def _matches_type(v: Any, t: str) -> bool:
    tv = _type_of(v)
    if t == tv:
        return True
    if t == "integer" and tv == "number":
        # draft-04 integer is a value constraint (3.1415926 fails, 42 passes)
        if isinstance(v, int):
            return True
        try:
            return v == int(v)
        except (OverflowError, ValueError):  # inf / nan floats
            return False
    return False


def _canon(v: Any) -> Any:
    """Canonical hashable form for enum/uniqueItems equality: numbers compare
    by value (1 == 1.0) but not with booleans (1 != true)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, numbers.Real):
        # keep the value exact: Python guarantees hash/eq consistency
        # across int and float (1 == 1.0, hash equal), so no float() cast
        # is needed — and float() overflows on 10^400-scale ints while
        # silently aliasing 10^17+1 to 1e17
        return ("n", v)
    if isinstance(v, str):
        return ("s", v)
    if v is None:
        return ("z",)
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("o", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    raise TypeError(f"not a JSON value: {type(v)!r}")


def evaluate(
    node: ConstraintNode,
    value: Any,
    path: str = "#",
    violations: Optional[list[Violation]] = None,
) -> bool:
    """True iff ``value`` satisfies ``node``. Appends Violations (for error
    attribution) when a list is passed; combinator internals do not leak
    violations from non-selected branches."""
    node = node.deref()
    v = value
    ok = True

    def fail(keyword: str, observed: Any, expected: Any) -> None:
        nonlocal ok
        ok = False
        if violations is not None:
            violations.append(Violation(path, keyword, observed, expected))

    tv = _type_of(v)

    if node.types is not None and not any(_matches_type(v, t) for t in node.types):
        fail("type", tv, list(node.types))

    if node.enum is not None:
        cv = _canon(v)
        if not any(cv == _canon(e) for e in node.enum):
            fail("enum", v, node.enum)

    # numeric keywords apply only to numbers (booleans excluded)
    if tv == "number":
        try:
            f = float(v)
        except OverflowError:  # int beyond float range: compare as ±inf
            f = float("inf") if v > 0 else float("-inf")
        if node.multiple_of is not None:
            k = float(node.multiple_of)
            if isinstance(v, int) and k.is_integer():
                if v % int(k) != 0:
                    fail("multipleOf", v, node.multiple_of)
            elif f != f or f in (float("inf"), float("-inf")):
                # non-finite projection (huge int vs fractional divisor):
                # cannot verify divisibility — conservative violation
                fail("multipleOf", v, node.multiple_of)
            else:
                q = f / k
                if abs(q - round(q)) > 1e-9:
                    fail("multipleOf", v, node.multiple_of)
        # NaN (Python's json.loads accepts it; strict JSON has none) can
        # satisfy no numeric constraint — matching the columnar kernels,
        # which fail NaN rows on every numeric keyword
        is_nan = f != f
        if node.minimum is not None:
            if is_nan or f < node.minimum or (
                node.exclusive_minimum and f == node.minimum
            ):
                fail("minimum", v, node.minimum)
        if node.maximum is not None:
            if is_nan or f > node.maximum or (
                node.exclusive_maximum and f == node.maximum
            ):
                fail("maximum", v, node.maximum)

    if tv == "string":
        n = len(v)  # codepoints, matching utf8 rune count
        if node.min_length is not None and n < node.min_length:
            fail("minLength", n, node.min_length)
        if node.max_length is not None and n > node.max_length:
            fail("maxLength", n, node.max_length)
        if node.pattern is not None and not node.pattern_re().search(v):
            fail("pattern", v, node.pattern)
        if node.format is not None and not check_format(node.format, v):
            fail("format", v, node.format)

    if tv == "array":
        n = len(v)
        if node.min_items is not None and n < node.min_items:
            fail("minItems", n, node.min_items)
        if node.max_items is not None and n > node.max_items:
            fail("maxItems", n, node.max_items)
        if node.unique_items:
            seen = set()
            for x in v:
                c = _canon(x)
                if c in seen:
                    fail("uniqueItems", x, "unique elements")
                    break
                seen.add(c)
        if node.items is not None:
            if not node.items.tuple_mode:
                sub = node.items.schemas[0]
                for i, x in enumerate(v):
                    if not evaluate(sub, x, f"{path}/items", violations):
                        ok = False
            else:
                spec = node.items.schemas
                for i, x in enumerate(v):
                    if i < len(spec):
                        if not evaluate(spec[i], x, f"{path}/items/{i}", violations):
                            ok = False
                    else:
                        ai = node.additional_items
                        if ai is FORBID:
                            fail("additionalItems", i, f"<= {len(spec)} items")
                        elif isinstance(ai, ConstraintNode):
                            if not evaluate(
                                ai, x, f"{path}/additionalItems", violations
                            ):
                                ok = False
        elif node.additional_items is FORBID:
            # additionalItems without tuple items has no effect (spec §5.3.1)
            pass

    if tv == "object":
        n = len(v)
        if node.min_properties is not None and n < node.min_properties:
            fail("minProperties", n, node.min_properties)
        if node.max_properties is not None and n > node.max_properties:
            fail("maxProperties", n, node.max_properties)
        if node.required:
            for r in node.required:
                if r not in v:
                    fail("required", r, "present")
        props = node.properties or {}
        pprops = node.pattern_props_re() if node.pattern_properties else []
        for k, x in v.items():
            matched = False
            if k in props:
                matched = True
                if not evaluate(props[k], x, f"{path}/properties/{k}", violations):
                    ok = False
            for rx, sub in pprops:
                if rx.search(k):
                    matched = True
                    if not evaluate(
                        sub, x, f"{path}/patternProperties/{rx.pattern}", violations
                    ):
                        ok = False
            if not matched:
                ap = node.additional_properties
                if ap is FORBID:
                    fail("additionalProperties", k, "no additional properties")
                elif isinstance(ap, ConstraintNode):
                    if not evaluate(
                        ap, x, f"{path}/additionalProperties", violations
                    ):
                        ok = False
        if node.dependencies is not None:
            for k, names in node.dependencies.names.items():
                if k in v:
                    for dep in names:
                        if dep not in v:
                            fail("dependencies", k, f"requires {dep!r}")
            for k, sub in node.dependencies.schemas.items():
                if k in v and not evaluate(
                    sub, v, f"{path}/dependencies/{k}", violations
                ):
                    ok = False

    if node.all_of is not None:
        for i, sub in enumerate(node.all_of):
            if not evaluate(sub, v, f"{path}/allOf/{i}", violations):
                ok = False
    if node.any_of is not None:
        if not any(evaluate(sub, v, f"{path}/anyOf/{i}", None)
                   for i, sub in enumerate(node.any_of)):
            fail("anyOf", v, "at least one sub-schema")
    if node.one_of is not None:
        hits = sum(
            1 for i, sub in enumerate(node.one_of) if evaluate(sub, v, path, None)
        )
        if hits != 1:
            fail("oneOf", hits, "exactly one sub-schema")
    if node.not_ is not None:
        if evaluate(node.not_, v, path, None):
            fail("not", v, "must not match sub-schema")

    return ok


def validate_value(node: ConstraintNode, value: Any) -> tuple[bool, list[Violation]]:
    """Single-value verdict + violation list — the ``Validate(x) -> error``
    analogue (reference validator/validator.go:57-63; pass == empty list)."""
    vio: list[Violation] = []
    ok = evaluate(node, value, "#", vio)
    return ok, vio
