"""The flagship constraint schema for the input_hint image+caption table.

Draft-04 keywords carry the row-local constraints; the global constraint
classes (BASELINE.json axes A+B — uniqueness, referential integrity,
distribution drift, column statistics) plug in through the Extras
extension surface as ``x-*`` keywords (the tabular analogue of the
reference's preserved unknown keywords, interface.go:133 /
schema_test.go:107-123). The pipeline planner (pipelines/validate_pipeline)
routes each ``x-*`` entry to its Ray Data stage.
"""

IMAGE_SCHEMA: dict = {
    "$schema": "http://json-schema.org/draft-04/schema#",
    "title": "image+caption table contract",
    "type": "object",
    "required": ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
    "properties": {
        "image_id": {"type": "string", "pattern": "^img-[0-9]{12}$"},
        "bytes": {},  # opaque binary; decode invariant checked by x-decode
        "w": {"type": "integer", "minimum": 16, "maximum": 4096},
        "h": {"type": "integer", "minimum": 16, "maximum": 4096},
        "fmt": {"type": "string", "enum": ["png", "jpeg", "webp"]},
        "caption": {"type": "string", "minLength": 5, "maxLength": 200},
        "phash": {"type": "integer"},
    },
    # -- global constraints (x-* extension keywords) ------------------------
    "x-uniqueness": [
        {"column": "image_id"},
        # phash collisions are *reported* (near-dup analysis), not failed:
        {"column": "phash", "report_only": True},
    ],
    "x-referential": [
        # fmt must appear in the codec reference list (broadcast semi-join)
        {"column": "fmt", "ref_values": ["png", "jpeg", "webp", "bmp", "tiff"]}
    ],
    "x-stats": {
        "columns": ["w", "h", "phash", "fmt", "caption"],
        "distinct": ["image_id", "phash", "fmt"],
        "quantiles": ["w", "h"],
    },
    "x-drift": {
        "columns": ["w", "h", "caption_len"],
        "ks_threshold": 0.15,
    },
    "x-decode": {"column": "bytes", "fmt_column": "fmt", "min_psnr_db": 40.0},
}
