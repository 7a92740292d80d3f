"""ConstraintDAG node types.

The reference models a schema as one recursive struct holding every draft-04
keyword as a field (reference interface.go:85-134), with wrapper types that
distinguish "absent" from "zero" (Number/Integer/Bool{Initialized},
interface.go:49-67) and tri-state additionalItems/additionalProperties
(interface.go:137-144, marshal.go:590-626). We model the same vocabulary as a
Python node graph: ``None`` means "keyword absent"; the tri-states are
``ALLOW`` / ``FORBID`` / a sub-node; ``$ref`` is resolved at compile time into
a shared (possibly cyclic) node graph, so workers never resolve refs at
runtime (unlike the reference's lazy mutex-guarded memo, schema.go:204-269).

Unknown keywords are preserved verbatim in ``extras`` (reference
interface.go:133) — this is the extension surface where the global ``x-*``
constraint classes (uniqueness, referential integrity, drift, stats) plug in.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional


class SchemaError(ValueError):
    """Raised on malformed schema documents (bad keyword types, bad refs)."""


# Draft-04 primitive type names (reference interface.go:70-79,
# primitives.go:23-43). "any"/"unspecified" is represented by absence.
PRIMITIVE_TYPES = frozenset(
    {"null", "integer", "string", "object", "array", "boolean", "number"}
)

# Predefined format values (reference interface.go:38-45; "regex" appears in
# the embedded meta-schema, default.go:71-74).
KNOWN_FORMATS = frozenset(
    {"date-time", "email", "hostname", "ipv4", "ipv6", "uri", "regex"}
)


class _TriState:
    """Sentinel for additionalItems/additionalProperties tri-state.

    Pickle-stable: nodes cross process boundaries into Ray workers, so the
    sentinels must keep ``is`` identity after unpickling (``__reduce__``
    resolves back to the module-level singleton)."""

    __slots__ = ("name",)

    def __init__(self, name: str) -> None:
        self.name = name

    def __repr__(self) -> str:
        return f"<{self.name}>"

    def __reduce__(self):
        return (_tristate_by_name, (self.name,))


def _tristate_by_name(name: str) -> "_TriState":
    return ALLOW if name == "ALLOW" else FORBID


#: keyword absent -> additional items/properties allowed (marshal.go:590-626)
ALLOW = _TriState("ALLOW")
#: keyword == false -> additional items/properties forbidden
FORBID = _TriState("FORBID")
# the third state is a ConstraintNode: extras must validate against it


@dataclass
class ItemSpec:
    """``items`` keyword: list mode (one schema for every element) vs tuple
    mode (positional schemas). Reference interface.go:155-158,
    marshal.go:337-369."""

    tuple_mode: bool
    schemas: list["ConstraintNode"]


@dataclass
class DependencySpec:
    """``dependencies``: property-name lists and/or schema dependencies.
    Reference interface.go:149-152, marshal.go:371-390,431-459."""

    names: dict[str, list[str]] = field(default_factory=dict)
    schemas: dict[str, "ConstraintNode"] = field(default_factory=dict)

    def is_empty(self) -> bool:
        return not self.names and not self.schemas


@dataclass(eq=False)
class ConstraintNode:
    """One node of the compiled constraint DAG.

    Field-per-keyword mirror of the reference's Schema struct
    (interface.go:85-134); ``None`` == keyword absent (the reference's
    ``Initialized=false``)."""

    # annotations (no validation effect; interface.go:90-95)
    id: Optional[str] = None
    title: Optional[str] = None
    description: Optional[str] = None
    default: Any = None
    has_default: bool = False
    schema_uri: Optional[str] = None

    # $ref: kept for serialization; ``ref_target`` is the resolved node
    ref: Optional[str] = None
    ref_target: Optional["ConstraintNode"] = None

    definitions: Optional[dict[str, "ConstraintNode"]] = None

    # type / enum / format
    types: Optional[tuple[str, ...]] = None
    enum: Optional[list[Any]] = None
    format: Optional[str] = None

    # numeric (interface.go:101-106)
    multiple_of: Optional[float] = None
    minimum: Optional[float] = None
    maximum: Optional[float] = None
    exclusive_minimum: bool = False
    exclusive_maximum: bool = False

    # string (interface.go:108-110)
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    pattern: Optional[str] = None

    # array (interface.go:113-117)
    items: Optional[ItemSpec] = None
    additional_items: Any = ALLOW  # ALLOW | FORBID | ConstraintNode
    min_items: Optional[int] = None
    max_items: Optional[int] = None
    unique_items: bool = False

    # object (interface.go:120-126)
    min_properties: Optional[int] = None
    max_properties: Optional[int] = None
    required: Optional[list[str]] = None
    properties: Optional[dict[str, "ConstraintNode"]] = None
    pattern_properties: Optional[dict[str, "ConstraintNode"]] = None
    additional_properties: Any = ALLOW
    dependencies: Optional[DependencySpec] = None

    # combinators (interface.go:129-132)
    all_of: Optional[list["ConstraintNode"]] = None
    any_of: Optional[list["ConstraintNode"]] = None
    one_of: Optional[list["ConstraintNode"]] = None
    not_: Optional["ConstraintNode"] = None

    # unknown keywords, preserved verbatim (interface.go:133) — the extension
    # hook where x-* global constraints live
    extras: dict[str, Any] = field(default_factory=dict)

    # cached compiled regex for ``pattern``
    _pattern_re: Any = field(default=None, repr=False, compare=False)
    _pattern_props_re: Any = field(default=None, repr=False, compare=False)

    def pattern_re(self) -> "re.Pattern[str]":
        if self._pattern_re is None:
            self._pattern_re = re.compile(self.pattern)
        return self._pattern_re

    def pattern_props_re(self) -> list[tuple["re.Pattern[str]", "ConstraintNode"]]:
        if self._pattern_props_re is None:
            self._pattern_props_re = [
                (re.compile(p), n) for p, n in (self.pattern_properties or {}).items()
            ]
        return self._pattern_props_re

    def deref(self) -> "ConstraintNode":
        """Follow $ref chains to the effective node (resolved at compile
        time; the runtime analogue of reference schema.go:204-269 is a plain
        pointer chase)."""
        node = self
        seen = 0
        while node.ref_target is not None:
            node = node.ref_target
            seen += 1
            if seen > 64:
                raise SchemaError(f"$ref chain too deep / cyclic at {self.ref!r}")
        return node
