"""stages/packing.pack_sequences: greedy offset packing via the two-scan
distributed prefix sum. The DuckDB window-SUM parity (test_oracle_parity)
pins the full corpus; these pin the semantics and the layout-independence
of the distributed decomposition."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.stages.packing import pack_sequences


def _serial_reference(order, weights, budget):
    idx = np.argsort(order)
    cum = 0
    seq, off = {}, {}
    for i in idx:
        seq[order[i]] = cum // budget
        off[order[i]] = cum % budget
        cum += weights[i]
    return seq, off


def _run(order, weights, budget, bin_width, ray_session, n_blocks=3):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array(order, pa.int64()),
                  "w": pa.array(weights, pa.int64())})
    ds = rd.from_arrow(t).repartition(n_blocks)
    out = pack_sequences(ds, "doc_id", "w", budget=budget,
                         bin_width=bin_width).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_matches_serial_reference(ray_session):
    rng = np.random.default_rng(3)
    order = rng.permutation(200)
    weights = rng.integers(0, 90, size=200)
    out = _run(order, weights, budget=128, bin_width=16, ray_session=None)
    seq, off = _serial_reference(order, weights, 128)
    assert out.seq_id.tolist() == [seq[d] for d in out.doc_id]
    assert out.seq_offset.tolist() == [off[d] for d in out.doc_id]


def test_layout_independent(ray_session):
    rng = np.random.default_rng(4)
    order = rng.permutation(150)
    weights = rng.integers(1, 50, size=150)
    a = _run(order, weights, 64, 8, None, n_blocks=1)
    b = _run(order, weights, 64, 8, None, n_blocks=7)
    pd.testing.assert_frame_equal(a, b)


def test_straddling_document(ray_session):
    # doc 1 (w=300) exceeds the 256 budget: doc 2 starts at cum=310,
    # landing in seq 1 at offset 54 — straddle spills, later docs shift
    out = _run([0, 1, 2], [10, 300, 5], budget=256, bin_width=4,
               ray_session=None)
    assert out.seq_id.tolist() == [0, 0, 1]
    assert out.seq_offset.tolist() == [0, 10, 310 - 256]


def test_zero_weight_rows_share_offset(ray_session):
    out = _run([0, 1, 2], [0, 0, 7], budget=8, bin_width=2,
               ray_session=None)
    assert out.seq_offset.tolist() == [0, 0, 0]
    assert out.seq_id.tolist() == [0, 0, 0]


def test_negative_weight_raises(ray_session):
    import ray
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "w": pa.array([-1], pa.int64())})
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        pack_sequences(rd.from_arrow(t), "doc_id", "w",
                       budget=8).to_pandas()


def test_bad_params_raise(ray_session):
    import ray.data as rd

    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "w": pa.array([1], pa.int64())})
    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), "doc_id", "w", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(rd.from_arrow(t), "doc_id", "w", budget=8,
                       bin_width=0)


def test_pack_sequences_many_bins_auto_coarsen(ray_session):
    """r4: driver state is hard-capped at max_bins — a bin universe far
    past the cap auto-coarsens in-cluster and the packing stays exactly
    the serial reference (same oracle arithmetic, coarser co-partition)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from jsschema_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(31)
    n = 4_000
    # sparse, huge order ids -> bin universe ~2^40 at bin_width=1;
    # max_bins=64 forces a large coarsen factor
    order = np.sort(rng.choice(1 << 40, size=n, replace=False))
    pdf = pd.DataFrame({
        "o": order.astype("int64"),
        "w": rng.integers(0, 900, n).astype("int64"),
    })
    got = pack_sequences(rd.from_pandas(pdf).repartition(7), "o", "w",
                         budget=2048, bin_width=1, batch_size=333,
                         max_bins=64).to_pandas()
    got = got.sort_values("o").reset_index(drop=True)
    ref = pdf.sort_values("o").reset_index(drop=True)
    cum = ref["w"].cumsum() - ref["w"]
    assert list(got["seq_id"]) == list(cum // 2048)
    assert list(got["seq_offset"]) == list(cum % 2048)
