from jsschema_ray.schema.nodes import (
    ALLOW,
    FORBID,
    ConstraintNode,
    DependencySpec,
    ItemSpec,
    SchemaError,
)
from jsschema_ray.schema.compiler import compile_schema, to_json

__all__ = [
    "ALLOW",
    "FORBID",
    "ConstraintNode",
    "DependencySpec",
    "ItemSpec",
    "SchemaError",
    "compile_schema",
    "to_json",
]
