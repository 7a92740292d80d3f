"""stages/dedup.exact_jaccard_pairs — the exact inverted-index
set-similarity join. Corpus equality vs DuckDB runs in test_oracle_parity;
these pin the distributed decomposition (layout independence), the
subset relation MinHash verification relies on, and the stop-gram refusal."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.stages.dedup import exact_jaccard_pairs, minhash_dedup


def _corpus(seed=7, n=60, dup_frac=0.3):
    """Random word docs plus near-duplicates made by editing one word."""
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = [" ".join(rng.choice(vocab, size=25)) for _ in range(n)]
    ids = list(range(n))
    for i in range(int(n * dup_frac)):
        words = docs[i].split()
        words[5] = "edited"
        docs.append(" ".join(words))
        ids.append(n + i)
    return pa.table({"doc_id": pa.array(ids, pa.int64()),
                     "text": pa.array(docs, pa.string())})


def _serial_pairs(table, threshold, k):
    from jsschema_ray.stages.dedup import _batch_shingles

    texts = table.column("text").to_pylist()
    ids = table.column("doc_id").to_pylist()
    g, gd = _batch_shingles(texts, k, full_only=True)
    sets = {}
    for gram, d in zip(g, gd):
        sets.setdefault(ids[d], set()).add(int(gram))
    out = set()
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 10000 >= int(threshold * 10000) * union:
                out.add((a, b))
    return out


def test_matches_serial_reference_any_layout(ray_session):
    import ray.data as rd

    t = _corpus()
    want = _serial_pairs(t, 0.6, k=3)
    assert want, "corpus should contain true near-dup pairs"
    for blocks in (1, 7):
        ds = rd.from_arrow(t).repartition(blocks)
        got = exact_jaccard_pairs(ds, threshold=0.6, k=3,
                                  num_parts=8).to_pandas()
        assert set(zip(got.doc_a, got.doc_b)) == want
        # union arithmetic: inter <= union, both positive
        assert (got.n_inter <= got.n_union).all()


def test_minhash_clusters_subset_of_exact_pairs(ray_session):
    """minhash_dedup verifies candidates with exact Jaccard, so its
    clusters must be connected components of a SUBSET of the exact pair
    graph at the same (threshold, shingle_k)."""
    import ray.data as rd

    t = _corpus(seed=11)
    ds = rd.from_arrow(t)
    exact = exact_jaccard_pairs(ds, threshold=0.7, k=3,
                                num_parts=8).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(exact.doc_a, exact.doc_b):
        parent[find(a)] = find(b)
    res = minhash_dedup(ds, threshold=0.7, num_perm=64, bands=16,
                        shingle_k=3)
    assert res["clusters"], "planted dups should cluster"
    for cluster in res["clusters"]:
        assert len({find(k) for k in cluster}) == 1


def test_short_docs_never_pair(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": ["a b", "a b", "a b c d e f g"]})
    got = exact_jaccard_pairs(rd.from_arrow(t), threshold=0.1,
                              k=5).to_pandas()
    # docs 0/1 have < k words -> zero grams -> no pairs despite equality
    assert len(got) == 0


def test_stop_gram_refusal(ray_session):
    import ray
    import ray.data as rd

    docs = ["common phrase here now again %d" % i for i in range(50)]
    t = pa.table({"doc_id": pa.array(range(50), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError),
                       match="max_gram_df"):
        exact_jaccard_pairs(rd.from_arrow(t), threshold=0.9, k=5,
                            max_gram_df=10).to_pandas()


def test_near_dedup_corpus_keeps_one_per_cluster(ray_session):
    """End-to-end survivor semantics: survivors = corpus minus every
    cluster member except the smallest id, verified against a serial
    union-find over the serial pair reference; singletons all survive."""
    import ray.data as rd

    t = _corpus()
    want_pairs = _serial_pairs(t, 0.6, k=3)
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in want_pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for x in list(parent):
        clusters.setdefault(find(x), set()).add(x)
    losers = {x for root, m in clusters.items() for x in m if x != min(m)}
    all_ids = set(t.column("doc_id").to_pylist())
    want_survivors = all_ids - losers

    from jsschema_ray.stages.dedup import near_dedup_corpus

    for blocks in (1, 5):
        out = near_dedup_corpus(rd.from_arrow(t).repartition(blocks),
                                threshold=0.6, k=3, num_parts=8,
                                num_buckets=4).to_pandas()
        assert set(out.doc_id) == want_survivors
        # output carries the input columns for surviving rows
        assert set(out.columns) == {"doc_id", "text"}
