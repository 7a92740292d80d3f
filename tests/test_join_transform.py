"""Join operators + schema-default transform (locked-in regressions for the
pandas dtype-promotion and NaN-vs-null artifacts found during verification)."""

import pandas as pd
import pyarrow as pa
import pytest


def test_hash_join_matches_pandas(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.join import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 3, 5], "lv": list("abcde")})
    right = pd.DataFrame({"rk": [1, 3, 3, 9], "rv": list("wxyz")})
    got = hash_join(
        rd.from_pandas(left).repartition(2),
        rd.from_pandas(right).repartition(2),
        key="k", right_key="rk", num_buckets=4,
    ).to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True)
    want = left.merge(right.rename(columns={"rk": "k"}), on="k").sort_values(
        ["k", "lv", "rv"]
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want)
    assert got["k"].dtype.kind == "i"  # no float promotion


def test_hash_join_left_nulls(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.join import hash_join

    left = pd.DataFrame({"k": [1, 2], "lv": ["a", "b"]})
    right = pd.DataFrame({"k": [1], "rv": ["x"]})
    rows = hash_join(
        rd.from_pandas(left), rd.from_pandas(right), key="k", how="left"
    ).take_all()
    by_k = {r["k"]: r for r in rows}
    assert by_k[1]["rv"] == "x"
    assert by_k[2]["rv"] is None  # proper null, not float NaN


def test_hash_join_overlap_rejected(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.join import hash_join

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [2]}))
    with pytest.raises(ValueError, match="disjoint"):
        hash_join(ds, ds, key="k")


def test_broadcast_join(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.join import broadcast_join

    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 1], "v": [10, 20, 30]}))
    small = pd.DataFrame({"k": [1, 2], "name": ["one", "two"]})
    got = broadcast_join(big, small, key="k").to_pandas().sort_values("v")
    assert got["name"].tolist() == ["one", "two", "one"]


def test_apply_defaults(ray_session):
    import ray.data as rd

    from jsschema_ray.stages.transform import apply_defaults

    t = pa.table({"a": [1, None, 3], "b": ["x", None, None]})
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "default": 0},
            "b": {"type": "string", "default": "unk"},
        },
    }
    out = apply_defaults(rd.from_arrow(t), schema).to_pandas().sort_values("a")
    assert out["a"].tolist() == [0, 1, 3]
    assert set(out["b"]) == {"x", "unk"}
