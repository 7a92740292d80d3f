"""Round-5 closing-session additions, part 7: rank_blend (PERCENT_RANK
ensemble scoring — the FineWeb-style multi-signal quality blend). SQL
parity for the oracled doc_quality_blend query runs in
test_oracle_parity; these pin the exact PERCENT_RANK arithmetic
(min-rank ties, n==1 edge, NULL drop, -0.0/0.0 merge) against DuckDB's
window function on adversarial inputs, and the bit-exactness of the
blend mean."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from jsschema_ray.stages.quantiles import rank_blend


def _ds(table, n_blocks=4):
    import ray.data as rd

    t = table if isinstance(table, pa.Table) else pa.table(table)
    return rd.from_arrow(t).repartition(n_blocks)


def _duck(df, cols):
    con = duckdb.connect()
    con.register("t", df)
    where = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    prs = ", ".join(
        f"PERCENT_RANK() OVER (ORDER BY {c}) AS pr_{c}" for c in cols)
    mean = " + ".join(f"pr_{c}" for c in cols)
    sql = f"""
        WITH r AS (SELECT id, {prs} FROM t WHERE {where})
        SELECT id, {', '.join('pr_' + c for c in cols)},
               ({mean}) / {float(len(cols))} AS blend
        FROM r ORDER BY id
    """
    return con.execute(sql).df()


class TestRankBlend:
    def test_vs_duckdb_ties_and_nulls(self, ray_session):
        rng = np.random.default_rng(7)
        n = 5000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "a": rng.integers(0, 40, n).astype("float64"),  # heavy ties
            "b": rng.normal(0, 1, n),
        })
        # NULLs in either signal drop the row from the ranked population
        df.loc[3, "a"] = np.nan
        df.loc[7, "b"] = np.nan
        # signed zeros must merge into one rank value
        df.loc[10, "b"] = -0.0
        df.loc[11, "b"] = 0.0
        got = (rank_blend(_ds(pa.Table.from_pandas(df)), ["id"],
                          ["a", "b"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        want = _duck(df, ["a", "b"])
        pd.testing.assert_frame_equal(got, want, check_exact=True)

    def test_single_row_population_pr_zero(self, ray_session):
        df = pd.DataFrame({"id": [1], "a": [42.0]})
        got = rank_blend(_ds(pa.Table.from_pandas(df), 1), ["id"],
                         ["a"]).to_pandas()
        assert got["pr_a"].tolist() == [0.0]
        assert got["blend"].tolist() == [0.0]
        want = _duck(df, ["a"])
        assert want["pr_a"].tolist() == [0.0]

    def test_three_signals_blend_order(self, ray_session):
        rng = np.random.default_rng(13)
        n = 2000
        df = pd.DataFrame({
            "id": np.arange(n, dtype=np.int64),
            "a": rng.integers(0, 9, n).astype("int64"),
            "b": rng.integers(0, 500, n).astype("int64"),
            "c": rng.normal(0, 1, n),
        })
        got = (rank_blend(_ds(pa.Table.from_pandas(df)), ["id"],
                          ["a", "b", "c"])
               .to_pandas().sort_values("id").reset_index(drop=True))
        want = _duck(df, ["a", "b", "c"])
        pd.testing.assert_frame_equal(got, want, check_exact=True)

    def test_guards(self, ray_session):
        df = pd.DataFrame({"id": [1], "a": [1.0]})
        ds = _ds(pa.Table.from_pandas(df), 1)
        for bad in ([], ["a", "a"]):
            try:
                rank_blend(ds, ["id"], bad)
                assert False, f"expected ValueError for cols={bad}"
            except ValueError:
                pass
