"""The validation pipeline is table-agnostic: drive it over a documents-like
dataset (no image columns at all) through the same CLI-equivalent path."""

import json

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_pipeline_on_documents_table(ray_session, tmp_path):
    from jsschema_ray.pipelines.validate_pipeline import ValidationPipeline

    src = tmp_path / "docs"
    src.mkdir()
    base = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    # inject violations + duplicates deterministically
    bad = base.head(5).copy()
    bad["lang"] = "xx"                        # enum violation
    dup = base.iloc[5:8].copy()               # duplicate doc_ids
    full = pd.concat([base, bad, dup], ignore_index=True)
    half = len(full) // 2
    pq.write_table(pa.Table.from_pandas(full.iloc[:half]), str(src / "a.parquet"))
    pq.write_table(pa.Table.from_pandas(full.iloc[half:]), str(src / "b.parquet"))

    schema = {
        "type": "object",
        "required": ["doc_id", "text"],
        "properties": {
            "lang": {"enum": ["en", "de", "fr", "es", "zh"]},
            "n_chars": {"type": "integer", "minimum": 1},
        },
        "x-uniqueness": [{"column": "doc_id"}],
        "x-stats": {"columns": ["n_chars"], "distinct": ["lang"],
                    "quantiles": ["n_chars"]},
    }
    out = tmp_path / "out"
    report = ValidationPipeline(schema, str(src), str(out),
                                key_column="doc_id", batch_size=256).run()
    assert not report["valid"]
    total_vio = sum(p["metrics"]["violation_rows"]
                    for p in report["partitions"].values())
    assert total_vio == 5  # the 'xx' rows
    uniq = report["uniqueness"][0]
    assert uniq["dup_keys"] == 8  # 5 bad copies + 3 dups share doc_ids
    assert report["stats"]["n_chars"]["count"] == len(full)
    assert report["stats"]["lang"]["distinct_est"] >= 5

    # resume works on this table too
    report2 = ValidationPipeline(schema, str(src), str(out),
                                 key_column="doc_id", batch_size=256).run()
    assert report2["partitions_resumed"] == 2
    # job report persisted
    assert json.load(open(out / "report.json"))["partitions_total"] == 2
