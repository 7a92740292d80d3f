"""Round-5 final-session additions, part 3: functional_dependency
(GROUP BY det HAVING COUNT(DISTINCT dep) > 1 profiling constraint) and
id_gaps (sequence-completeness audit over a distinct int64 id set).
SQL parity for the two oracled queries (fd_source_lang, orderkey_gaps)
runs in test_oracle_parity; these pin edge cases, NULL semantics, the
distributed boundary stitching, and the refusal guards."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.stages.referential import functional_dependency, id_gaps


def _ds(table: dict, n_blocks=4):
    import ray.data as rd

    return rd.from_arrow(pa.table(table)).repartition(n_blocks)


class TestFunctionalDependency:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(31)
        n = 8000
        det = rng.choice([f"s{i}" for i in range(40)], n).astype(object)
        dep = rng.choice([f"L{i}" for i in range(6)], n).astype(object)
        # half the determinants actually hold the FD
        hold = det < "s2"
        dep[hold] = "Lfix"
        det[rng.random(n) < 0.01] = None
        dep[rng.random(n) < 0.03] = None
        df = pd.DataFrame({"det": det, "dep": dep})
        got = functional_dependency(
            _ds({"det": pa.array(det), "dep": pa.array(dep)}),
            "det", "dep",
        ).to_pandas().sort_values("det", na_position="first") \
            .reset_index(drop=True)
        exp = duckdb.sql("""
            SELECT det, COUNT(*) AS n_rows,
                   COUNT(DISTINCT dep) AS n_distinct_dep
            FROM df GROUP BY det HAVING COUNT(DISTINCT dep) > 1
            ORDER BY det NULLS FIRST
        """).df()
        assert len(got) == len(exp) > 0
        assert got["det"].fillna("∅").tolist() == \
            exp["det"].fillna("∅").tolist()
        for c in ("n_rows", "n_distinct_dep"):
            assert got[c].tolist() == exp[c].tolist(), c

    def test_fd_holds_empty(self, ray_session):
        out = functional_dependency(
            _ds({"det": pa.array(["a", "a", "b", "b"]),
                 "dep": pa.array(["x", "x", "y", "y"])}, 2),
            "det", "dep")
        # the Dataset schema stays typed even with zero rows (Ray's
        # to_pandas drops columns on a fully-empty dataset)
        assert out.schema().names == ["det", "n_rows", "n_distinct_dep"]
        assert out.count() == 0

    def test_null_dep_not_distinct_but_counted_in_rows(self, ray_session):
        # det 'a': rows (x, NULL, NULL) -> 1 distinct dep, NOT a
        # violation; det 'b': (x, y, NULL) -> 2 distinct, violation with
        # n_rows counting the NULL row (SQL COUNT(*) vs COUNT(DISTINCT))
        got = functional_dependency(
            _ds({"det": pa.array(["a", "a", "a", "b", "b", "b"]),
                 "dep": pa.array(["x", None, None, "x", "y", None])}, 3),
            "det", "dep").to_pandas()
        assert got["det"].tolist() == ["b"]
        assert got["n_rows"].tolist() == [3]
        assert got["n_distinct_dep"].tolist() == [2]

    def test_int64_above_2p53_deps_stay_distinct(self, ray_session):
        # two dep values that collapse under a float64 round-trip
        big = (1 << 53) + 1
        got = functional_dependency(
            _ds({"det": pa.array(["k"] * 4),
                 "dep": pa.array([big, big + 1, big, big + 1],
                                 type=pa.int64())}, 2),
            "det", "dep").to_pandas()
        assert got["n_distinct_dep"].tolist() == [2]


class TestIdGaps:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(47)
        # sparse, duplicated, negative-spanning ids + nulls
        ids = rng.choice(np.arange(-3000, 50000), 30000, replace=True)
        arr = pa.array(ids, type=pa.int64())
        arr = pa.concat_arrays([arr, pa.array([None] * 50, pa.int64())])
        got = id_gaps(_ds({"k": arr}, 8), "k").to_pandas() \
            .sort_values("gap_start").reset_index(drop=True)
        df = pd.DataFrame({"k": pd.array(arr.to_pylist(),
                                         dtype="Int64")})
        exp = duckdb.sql("""
            WITH d AS (SELECT DISTINCT k FROM df WHERE k IS NOT NULL),
            g AS (SELECT k, LEAD(k) OVER (ORDER BY k) nx FROM d)
            SELECT k+1 AS gap_start, nx-1 AS gap_end,
                   nx-k-1 AS n_missing
            FROM g WHERE nx > k+1 ORDER BY gap_start
        """).df()
        assert len(exp) > 100  # the fixture genuinely has gaps
        for c in ("gap_start", "gap_end", "n_missing"):
            assert got[c].tolist() == exp[c].tolist(), c

    def test_dense_sequence_no_gaps(self, ray_session):
        out = id_gaps(
            _ds({"k": pa.array(np.arange(5000), type=pa.int64())}, 6),
            "k")
        assert out.schema().names == ["gap_start", "gap_end", "n_missing"]
        assert out.count() == 0

    def test_duplicates_collapse(self, ray_session):
        got = id_gaps(
            _ds({"k": pa.array([1, 1, 1, 5, 5], type=pa.int64())}, 2),
            "k").to_pandas()
        assert got.values.tolist() == [[2, 4, 3]]

    def test_single_and_empty(self, ray_session):
        assert len(id_gaps(_ds({"k": pa.array([42], pa.int64())}, 1),
                           "k").to_pandas()) == 0
        assert len(id_gaps(
            _ds({"k": pa.array([None, None], pa.int64())}, 1),
            "k").to_pandas()) == 0

    def test_non_integer_refuses(self, ray_session):
        with pytest.raises(TypeError, match="integer id column"):
            id_gaps(_ds({"k": pa.array([1.0, 2.0])}, 1), "k")

    def test_cross_block_boundary_gap(self, ray_session):
        # two far-apart dense runs: the gap between them must survive the
        # range sort's block boundaries regardless of where blocks split
        ids = np.concatenate([np.arange(0, 4000),
                              np.arange(1_000_000, 1_004_000)])
        got = id_gaps(_ds({"k": pa.array(ids, pa.int64())}, 8),
                      "k").to_pandas()
        assert got.values.tolist() == [[4000, 999_999, 996_000]]


class TestMonotonicityViolations:
    def test_bit_identical_vs_duckdb(self, ray_session):
        from jsschema_ray.stages.windows import monotonicity_violations

        rng = np.random.default_rng(53)
        n = 12000
        df = pd.DataFrame({
            "k": rng.integers(0, 200, n),
            "o": rng.integers(0, 50, n),          # heavy order ties
            "tb": np.arange(n),                    # total-order tiebreak
            "v": rng.normal(0, 10, n).round(3),
        })
        df.loc[::17, "v"] = np.nan
        got = monotonicity_violations(
            _ds({c: pa.array(df[c]) for c in df}, 6),
            "k", "o", "tb", "v",
        ).to_pandas().sort_values("k").reset_index(drop=True)
        exp = duckdb.sql("""
            WITH f AS (SELECT k, o, tb, v FROM df WHERE v IS NOT NULL),
            l AS (SELECT k, v, LAG(v) OVER (PARTITION BY k
                                            ORDER BY o, tb) AS prev
                  FROM f)
            SELECT k, COUNT(prev) AS n_pairs,
                   CAST(SUM(CASE WHEN v < prev THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations
            FROM l GROUP BY k ORDER BY k
        """).df()
        assert got["n_violations"].sum() > 0  # fixture has violations
        for c in ("k", "n_pairs", "n_violations"):
            assert got[c].tolist() == exp[c].tolist(), c

    def test_strict_counts_plateaus(self, ray_session):
        from jsschema_ray.stages.windows import monotonicity_violations

        t = {"k": pa.array(["a"] * 4), "o": pa.array([1, 2, 3, 4]),
             "tb": pa.array([1, 2, 3, 4]),
             "v": pa.array([1.0, 1.0, 2.0, 1.5])}
        lax = monotonicity_violations(_ds(t, 2), "k", "o", "tb",
                                      "v").to_pandas()
        strict = monotonicity_violations(_ds(t, 2), "k", "o", "tb", "v",
                                         strict=True).to_pandas()
        assert lax["n_violations"].tolist() == [1]      # only 2.0 -> 1.5
        assert strict["n_violations"].tolist() == [2]   # plateau too

    def test_single_row_key_and_null_key_group(self, ray_session):
        from jsschema_ray.stages.windows import monotonicity_violations

        got = monotonicity_violations(
            _ds({"k": pa.array(["x", None, None]),
                 "o": pa.array([1, 1, 2]), "tb": pa.array([1, 2, 3]),
                 "v": pa.array([5.0, 9.0, 3.0])}, 2),
            "k", "o", "tb", "v",
        ).to_pandas()
        got = got.sort_values("k", na_position="first") \
            .reset_index(drop=True)
        # NULL keys form ONE group (9.0 -> 3.0 is its violation);
        # the single-row key reports (0, 0)
        assert got["n_pairs"].tolist() == [1, 0]
        assert got["n_violations"].tolist() == [1, 0]

    def test_monotone_sequence_clean(self, ray_session):
        from jsschema_ray.stages.windows import monotonicity_violations

        got = monotonicity_violations(
            _ds({"k": pa.array([7] * 100, pa.int64()),
                 "o": pa.array(np.arange(100)),
                 "tb": pa.array(np.arange(100)),
                 "v": pa.array(np.arange(100).astype(np.float64))}, 4),
            "k", "o", "tb", "v").to_pandas()
        assert got.values.tolist() == [[7, 99, 0]]
