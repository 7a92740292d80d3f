"""Round-5 final-session additions, part 2: grouped_gini (exact
rank-weighted inequality statistic) and chi_square_cells (contingency
independence cells). SQL parity for the two oracled queries
(revenue_gini, lang_source_chi2) runs in test_oracle_parity; these pin
edge cases, the bit-mirror contracts, and the refusal guards."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.stages.drift import chi_square_cells
from jsschema_ray.stages.quantiles import grouped_gini


def _ds(table: dict, n_blocks=4):
    import ray.data as rd

    return rd.from_arrow(pa.table(table)).repartition(n_blocks)


class TestGroupedGini:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(19)
        df = pd.DataFrame({"g": rng.choice(list("abcde"), 9000),
                           "x": rng.uniform(0, 500, 9000).round(2)})
        df.loc[::23, "x"] = np.nan
        got = grouped_gini(
            _ds({"g": pa.array(df["g"]), "x": pa.array(df["x"])}),
            "g", "x",
        ).to_pandas().sort_values("g").reset_index(drop=True)
        exp = duckdb.sql("""
            WITH s AS (SELECT g, CAST(ROUND(x*100) AS BIGINT) v
                       FROM df WHERE x IS NOT NULL),
            r AS (SELECT g, v,
                         ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) i
                  FROM s),
            m AS (SELECT g, COUNT(*) n, CAST(SUM(v) AS BIGINT) s1,
                         CAST(SUM(i*v) AS BIGINT) sw
                  FROM r GROUP BY g)
            SELECT g, n, s1, sw,
                   CASE WHEN CAST(n AS DOUBLE)*CAST(s1 AS DOUBLE) > 0
                   THEN (2.0*CAST(sw AS DOUBLE)
                         - (CAST(n AS DOUBLE)+1.0)*CAST(s1 AS DOUBLE))
                        / (CAST(n AS DOUBLE)*CAST(s1 AS DOUBLE))
                   ELSE NULL END AS gini
            FROM m ORDER BY g
        """).df()
        for c in ("n", "s1", "sw"):
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
        # bitwise float equality, not allclose
        assert np.array_equal(got["gini"].to_numpy(),
                              exp["gini"].to_numpy())

    def test_equal_values_gini_zero(self, ray_session):
        # perfect equality -> gini exactly 0 regardless of tie order
        got = grouped_gini(
            _ds({"g": pa.array(["z"] * 6),
                 "x": pa.array([7.0] * 6)}, 2), "g", "x").to_pandas()
        assert got["n"].tolist() == [6]
        assert got["gini"].tolist() == [0.0]

    def test_total_concentration_approaches_one(self, ray_session):
        # one holder of everything among n: gini = (n-1)/n
        got = grouped_gini(
            _ds({"g": pa.array(["a"] * 10),
                 "x": pa.array([0.0] * 9 + [100.0])}, 2),
            "g", "x").to_pandas()
        assert got["gini"].tolist() == [0.9]

    def test_all_zero_group_null(self, ray_session):
        got = grouped_gini(
            _ds({"g": pa.array(["a"] * 3),
                 "x": pa.array([0.0] * 3)}, 1), "g", "x").to_pandas()
        assert got["s1"].tolist() == [0]
        assert got["gini"].isna().all()

    def test_negative_values_refuse(self, ray_session):
        ds = _ds({"g": pa.array(["a", "a"]),
                  "x": pa.array([1.0, -2.0])}, 1)
        with pytest.raises(Exception, match="non-negative"):
            grouped_gini(ds, "g", "x").to_pandas()

    def test_overflow_guard_raises(self, ray_session):
        # huge value x large n would overflow the rank-weighted sum
        n = 5
        ds = _ds({"g": pa.array(["a"] * n),
                  "x": pa.array([float(1 << 52)] * n)}, 1)
        with pytest.raises(Exception, match="overflow"):
            grouped_gini(ds, "g", "x", scale=100).to_pandas()

    def test_tie_permutation_invariance(self, ray_session):
        # heavy ties: block order cannot change s1/sw (the mirror's
        # ROW_NUMBER tie order is arbitrary)
        rng = np.random.default_rng(7)
        x = rng.choice([1.0, 2.0, 2.0, 5.0], 4000)
        a = grouped_gini(_ds({"g": pa.array(["g"] * 4000),
                              "x": pa.array(x)}, 8), "g", "x").to_pandas()
        b = grouped_gini(_ds({"g": pa.array(["g"] * 4000),
                              "x": pa.array(x[::-1].copy())}, 3),
                         "g", "x").to_pandas()
        assert a["sw"].tolist() == b["sw"].tolist()
        assert a["gini"].tolist() == b["gini"].tolist()


class TestChiSquareCells:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(31)
        df = pd.DataFrame({
            "r": rng.choice(list("pqrs"), 12000,
                            p=[0.5, 0.3, 0.15, 0.05]),
            "c": rng.choice(list("XYZ"), 12000, p=[0.6, 0.3, 0.1]),
        })
        df.loc[::31, "r"] = None
        df.loc[::37, "c"] = None
        got = chi_square_cells(
            _ds({"r": pa.array(df["r"]), "c": pa.array(df["c"])}),
            "r", "c",
        ).to_pandas().sort_values(["r", "c"]).reset_index(drop=True)
        exp = duckdb.sql("""
            WITH c0 AS (SELECT r, c, COUNT(*) n FROM df
                        WHERE r IS NOT NULL AND c IS NOT NULL
                        GROUP BY r, c),
            w AS (SELECT r, c, n,
                         CAST(SUM(n) OVER (PARTITION BY r) AS BIGINT) row_n,
                         CAST(SUM(n) OVER (PARTITION BY c) AS BIGINT) col_n,
                         CAST(SUM(n) OVER () AS BIGINT) total_n
                  FROM c0),
            e AS (SELECT *, CAST(row_n AS DOUBLE)*CAST(col_n AS DOUBLE)
                                / CAST(total_n AS DOUBLE) AS expected
                  FROM w)
            SELECT r, c, n, row_n, col_n, total_n, expected,
                   (CAST(n AS DOUBLE)-expected)*(CAST(n AS DOUBLE)-expected)
                       / expected AS contrib
            FROM e ORDER BY r, c
        """).df()
        for col in ("n", "row_n", "col_n", "total_n"):
            assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
        for col in ("expected", "contrib"):
            assert np.array_equal(got[col].to_numpy(),
                                  exp[col].to_numpy()), col

    def test_independent_uniform_contrib_zero(self, ray_session):
        # perfectly balanced 2x2: expected == observed, contrib == 0
        got = chi_square_cells(
            _ds({"r": pa.array(["a", "a", "b", "b"] * 5),
                 "c": pa.array(["x", "y", "x", "y"] * 5)}, 2),
            "r", "c").to_pandas()
        assert len(got) == 4
        assert (got["contrib"].to_numpy() == 0.0).all()
        assert (got["expected"].to_numpy() == 5.0).all()

    def test_marginals_consistent(self, ray_session):
        rng = np.random.default_rng(2)
        got = chi_square_cells(
            _ds({"r": pa.array(rng.choice(["u", "v"], 600)),
                 "c": pa.array(rng.choice(["m", "n", "o"], 600))}, 4),
            "r", "c").to_pandas()
        assert got["n"].sum() == 600
        assert (got["total_n"] == 600).all()
        # row marginals: every cell of one row shares row_n == sum of its n
        for r, grp in got.groupby("r"):
            assert (grp["row_n"] == grp["n"].sum()).all()
