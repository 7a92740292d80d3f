"""stages/similarity.similarity_join — the exact cosine pair audit op.
Full-corpus equality vs DuckDB is in test_oracle_parity; these pin the
operator contracts: LSH-subset consistency, the float-boundary guard, and
the quadratic-regime refusal."""

import numpy as np
import pyarrow as pa
import pytest

from jsschema_ray.stages.dedup import embedding_dedup
from jsschema_ray.stages.similarity import similarity_join


def _planted_corpus(n_base=40, d=16, seed=9):
    """Random unit vectors plus planted near-duplicates (base + tiny
    noise): every planted pair's cosine is ~0.999, far from 0.9."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_base, d))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    dups = base[: n_base // 4] + rng.normal(scale=1e-3,
                                            size=(n_base // 4, d))
    X = np.vstack([base, dups]).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(len(X)), pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
        }
    )


def test_finds_planted_pairs(ray_session):
    import ray.data as rd

    t = _planted_corpus()
    ds = rd.from_arrow(t).repartition(4)
    pairs = similarity_join(ds, threshold=0.9).to_pandas()
    got = set(zip(pairs.vec_a, pairs.vec_b))
    # every planted (i, 40+i) duplicate pair must be present, ordered once
    for i in range(10):
        assert (i, 40 + i) in got
    assert all(a < b for a, b in got)


def test_lsh_clusters_subset_of_exact_components(ray_session):
    """embedding_dedup (hyperplane LSH) may MISS pairs but must never
    invent them: every LSH cluster lies inside one connected component of
    the exact similarity_join pair graph at the same threshold."""
    import ray.data as rd

    t = _planted_corpus(seed=13)
    ds = rd.from_arrow(t)
    exact = similarity_join(ds, threshold=0.9).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(exact.vec_a, exact.vec_b):
        parent[find(a)] = find(b)
    res = embedding_dedup(ds, threshold=0.9, n_planes=6)
    assert res["clusters"], "planted dups should produce clusters"
    for cluster in res["clusters"]:
        roots = {find(k) for k in cluster}
        assert len(roots) == 1, f"LSH grouped unrelated keys: {cluster}"


def test_threshold_boundary_guard_raises(ray_session):
    import ray
    import ray.data as rd

    X = np.array([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    t = pa.table(
        {"vec_id": pa.array([0, 1], pa.int64()),
         "embedding": pa.array(list(X), pa.list_(pa.float32()))}
    )
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="float-order-sensitive"):
        similarity_join(rd.from_arrow(t), threshold=1.0).to_pandas()


def test_refuses_over_max_rows(ray_session):
    import ray.data as rd

    t = _planted_corpus()
    with pytest.raises(ValueError, match="quadratic audit path"):
        similarity_join(rd.from_arrow(t), threshold=0.9, max_rows=10)


def test_embedding_dedup_dup_storm_via_components(ray_session):
    """r4: cluster assembly goes through distributed connected_components
    — a dup-storm corpus (one giant cluster, O(n^2) verified pairs) still
    resolves to exactly one cluster with the right members, and the
    driver only ever holds (node, component) rows."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(5)
    base = rng.normal(size=16).astype("float32")
    n = 250
    # all n vectors identical -> every pair verifies at any threshold
    X = np.tile(base, (n, 1))
    # plus a few isolated singletons far away
    iso = rng.normal(size=(5, 16)).astype("float32") * 50
    allx = np.vstack([X, iso])
    t = pa.table({
        "vec_id": pa.array(np.arange(len(allx)), type=pa.int64()),
        "embedding": pa.array(list(allx), type=pa.list_(pa.float32())),
    })
    from jsschema_ray.stages.dedup import embedding_dedup

    res = embedding_dedup(rd.from_arrow(t).repartition(4),
                          threshold=0.999, n_planes=6, batch_size=64)
    assert res["n_pairs"] == n * (n - 1) // 2
    assert len(res["clusters"]) == 1
    assert res["clusters"][0] == list(range(n))
    assert res["drop_keys"] == list(range(1, n))


def test_max_rows_refusal_exact_boundary(ray_session):
    """r5: the refusal pins the EXACT boundary — n == max_rows runs,
    n == max_rows + 1 refuses (the guard is >, not >=)."""
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 12
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(rng.normal(size=(n, 8))
                                   .astype(np.float32)),
                              pa.list_(pa.float32())),
    })
    # at the boundary: runs (random gaussians at 0.95 threshold -> no
    # pairs is fine; completing without the refusal is the assertion)
    similarity_join(rd.from_arrow(t), threshold=0.95, max_rows=n) \
        .materialize()
    with pytest.raises(ValueError, match="quadratic audit path"):
        similarity_join(rd.from_arrow(t), threshold=0.95, max_rows=n - 1)
