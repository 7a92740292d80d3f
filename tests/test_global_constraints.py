"""Global constraints over Ray: uniqueness (with skew) and referential
integrity, cross-checked against exact pandas computations."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.sources.synth import synth_image_table
from jsschema_ray.stages.referential import (
    referential_check,
    referential_violations,
)
from jsschema_ray.stages.uniqueness import (
    duplicate_keys,
    top_duplicates,
    uniqueness_report,
    uniqueness_violations,
)


@pytest.fixture(scope="module")
def img_ds(ray_session):
    import ray.data as rd

    table, manifest = synth_image_table(20_000, seed=42, violation_frac=0.03,
                                        with_bytes=False)
    return rd.from_arrow(table).repartition(8), table, manifest


def test_duplicate_keys_exact(img_ds):
    ds, table, manifest = img_ds
    got = {r["image_id"]: r["dup_count"] for r in
           duplicate_keys(ds, "image_id", batch_size=2048).take_all()}
    vc = pd.Series(table.column("image_id").to_pylist()).value_counts()
    want = vc[vc > 1].to_dict()
    assert got == want
    assert set(manifest["dup_image_id"]) <= set(got)


def test_uniqueness_violations_rows(img_ds):
    ds, table, manifest = img_ds
    vio = uniqueness_violations(ds, "image_id", batch_size=2048)
    rows = vio.take_all()
    ids = pd.Series(table.column("image_id").to_pylist())
    dup_ids = set(ids[ids.duplicated(keep=False)])
    assert {r["image_id"] for r in rows} == dup_ids
    # ALL rows of a duplicated key are returned
    assert len(rows) == int(ids.isin(dup_ids).sum())
    rep = uniqueness_report(ds, "image_id", batch_size=2048)
    assert rep["dup_keys"] == len(dup_ids) and rep["dup_rows"] == len(rows)


def test_phash_skew_top_duplicates(img_ds):
    ds, table, _ = img_ds
    top = top_duplicates(ds, "phash", k=5, batch_size=2048).take_all()
    vc = pd.Series(table.column("phash").to_pylist()).value_counts()
    assert top[0]["dup_count"] == int(vc.iloc[0])  # hottest key found
    assert top[0]["phash"] == int(vc.index[0])
    assert [r["dup_count"] for r in top] == sorted(
        [r["dup_count"] for r in top], reverse=True
    )
    # Zipf skew is real: hottest phash dominates
    assert top[0]["dup_count"] > 1000


def test_no_duplicates_empty_result(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"k": [f"u{i}" for i in range(5000)]}))
    assert duplicate_keys(ds, "k").count() == 0
    assert uniqueness_violations(ds, "k").count() == 0


def test_referential_violations(img_ds):
    ds, table, manifest = img_ds
    vio = referential_violations(
        ds, "fmt", ["png", "jpeg", "webp", "bmp", "tiff"], batch_size=2048
    )
    got = {r["image_id"] for r in vio.take_all()}
    assert got == set(manifest["fmt_enum"])  # the injected "gif" rows
    chk = referential_check(ds, "fmt", ["png", "jpeg", "webp", "bmp", "tiff"],
                            batch_size=2048)
    assert chk["n_violations"] == len(got) and "gif" in chk["missing_sample"]


def test_referential_against_dimension_dataset(ray_session):
    import ray.data as rd

    # lineitem.l_orderkey ⊆ orders.o_orderkey on real testdata
    li = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                         columns=["l_orderkey"])
    orders = rd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                             columns=["o_orderkey"])
    chk = referential_check(li, "l_orderkey", orders, ref_column="o_orderkey")
    assert chk["n_violations"] == 0

    # negative control: restrict the ref side -> violations appear
    some = rd.read_parquet("/root/testdata/sf0.001/orders.parquet",
                           columns=["o_orderkey"]).limit(100)
    chk2 = referential_check(li, "l_orderkey", some, ref_column="o_orderkey")
    assert chk2["n_violations"] > 0 and len(chk2["missing_sample"]) > 0


def test_referential_shuffle_strategy_matches_broadcast(ray_session):
    """The partitioned hash-anti-join fallback for large ref sides must
    produce exactly the broadcast path's violation rows, including the
    allow_null contract (null FKs pass)."""
    import pandas as pd

    import ray.data as rd

    from jsschema_ray.stages.referential import referential_violations

    fk = pd.DataFrame({
        "eid": range(12),
        "fk": [1, 2, 3, 99, None, 2, 98, 1, None, 97, 3, 96],
    })
    refd = pd.DataFrame({"k": [1, 2, 3, 4, 5]})
    ds = rd.from_pandas(fk).repartition(3)

    def rows(strategy):
        out = referential_violations(
            ds, "fk", rd.from_pandas(refd), ref_column="k",
            keep_columns=["eid", "fk"], strategy=strategy,
        ).to_pandas().sort_values("eid").reset_index(drop=True)
        return list(zip(out["eid"].astype(int), out["fk"].astype(int)))

    assert rows("shuffle") == rows("broadcast") == \
        [(3, 99), (6, 98), (9, 97), (11, 96)]


def test_uniqueness_shuffle_strategy_matches_broadcast(ray_session):
    """Semi-join fallback for web-scale duplicate-key sets: identical rows
    to the broadcast path on a table with injected duplicate keys."""
    import pandas as pd

    import ray.data as rd

    from jsschema_ray.stages.uniqueness import uniqueness_violations

    df = pd.DataFrame({"rid": range(20),
                       "k": [1, 2, 3, 4, 5, 1, 6, 7, 2, 8,
                             9, 10, 1, 11, 12, 13, 2, 14, 15, 16]})
    ds = rd.from_pandas(df).repartition(4)

    def rows(strategy):
        out = uniqueness_violations(ds, "k", keep_columns=["rid", "k"],
                                    strategy=strategy).to_pandas()
        return sorted(zip(out["rid"].astype(int), out["k"].astype(int)))

    want = sorted(
        (int(r.rid), int(r.k))
        for r in df.itertuples() if (df["k"] == r.k).sum() > 1
    )
    assert rows("shuffle") == rows("broadcast") == want


def test_stats_partition_grouping_arrow_native(ray_session):
    """r3: partition grouping is Arrow dictionary-encode + argsort (no
    pandas round-trip); null partition keys drop, matching the old pandas
    groupby semantics."""
    import pyarrow as pa
    import ray.data as rd

    from jsschema_ray.stages.stats import StatsSpec, collect_stats

    t = pa.table({
        "p": ["a", "b", None, "a", "b", None, "a"],
        "x": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
    })
    spec = StatsSpec(columns=["x"], partition_col="p")
    out = collect_stats(rd.from_arrow(t).repartition(2), spec)
    parts = {k[0] for k in out}
    assert parts == {"a", "b"}  # null keys dropped
    a = out[("a", "x")]
    assert a.count == 3 and a.min == 1.0 and a.max == 7.0 and a.sum == 12.0
