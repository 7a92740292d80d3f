"""Round-5 final-session additions, part 4: benford_digits (leading-
significant-digit distribution audit), longest_streaks (gaps-and-islands
per-key consecutive-day runs), value_runs (run-length islands by value
change), count_spikes (per-group daily-count z-score anomalies),
null_profile (whole-schema completeness scan), and candidate_keys
(exact unique-key candidacy profile). SQL parity for the six oracled
queries (benford_digits, longest_streaks, event_type_runs,
event_count_spikes, null_profile, candidate_keys) runs in
test_oracle_parity; these pin edge cases, NULL/zero/negative semantics,
the half-away rounding boundary, distributed batch-boundary merging,
and the refusal guards."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from jsschema_ray.stages.stats import benford_digits
from jsschema_ray.stages.windows import longest_streaks


def _ds(table: dict, n_blocks=4):
    import ray.data as rd

    return rd.from_arrow(pa.table(table)).repartition(n_blocks)


class TestBenfordDigits:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(53)
        # log-uniform magnitudes over 5 decades, signs, zeros, nulls
        v = np.power(10.0, rng.uniform(-2, 3, 20000))
        v = np.round(v * np.where(rng.random(20000) < 0.2, -1, 1), 2)
        v[rng.random(20000) < 0.02] = 0.0
        arr = pa.array(v, pa.float64())
        arr = pa.compute.if_else(
            pa.array(rng.random(20000) < 0.03), pa.scalar(None, pa.float64()),
            arr)
        got = benford_digits(_ds({"v": arr}, 8), "v").to_pandas() \
            .sort_values("digit").reset_index(drop=True)
        df = pd.DataFrame({"v": arr.to_pandas()})
        exp = duckdb.sql("""
            WITH c AS (
                SELECT CAST(LEFT(CAST(CAST(ABS(ROUND(v * 100)) AS BIGINT)
                           AS VARCHAR), 1) AS BIGINT) AS digit
                FROM df WHERE v IS NOT NULL
                  AND CAST(ROUND(v * 100) AS BIGINT) <> 0),
            g AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY digit)
            SELECT digit, n,
                   CAST(n AS DOUBLE)
                       / CAST(CAST(SUM(n) OVER () AS BIGINT) AS DOUBLE)
                       AS share
            FROM g ORDER BY digit
        """).df()
        assert got["digit"].tolist() == exp["digit"].tolist()
        assert got["n"].tolist() == exp["n"].tolist()
        # shares must be BIT-equal (one cast pair + one division each side)
        assert (got["share"].to_numpy() == exp["share"].to_numpy()).all()

    def test_zero_null_negative_semantics(self, ray_session):
        # zeros and NULLs drop; negatives audit by magnitude
        got = benford_digits(
            _ds({"v": pa.array([0.0, None, -3.21, 3.0, 0.004, -0.004],
                               pa.float64())}, 3),
            "v").to_pandas().sort_values("digit").reset_index(drop=True)
        # 0.004*100 = 0.4 -> rounds to 0 -> drops (both signs);
        # -3.21 -> 321 -> digit 3; 3.0 -> 300 -> digit 3
        assert got["digit"].tolist() == [3]
        assert got["n"].tolist() == [2]
        assert got["share"].tolist() == [1.0]

    def test_half_away_rounding_boundary(self, ray_session):
        # 0.005 * 100 = 0.5: half-AWAY rounds to 1 (digit 1); numpy's
        # default half-to-even would round to 0 and silently drop it
        got = benford_digits(
            _ds({"v": pa.array([0.005, -0.005], pa.float64())}, 1),
            "v").to_pandas()
        assert got["digit"].tolist() == [1]
        assert got["n"].tolist() == [2]

    def test_empty_keeps_schema(self, ray_session):
        out = benford_digits(
            _ds({"v": pa.array([0.0, None], pa.float64())}, 2), "v")
        assert out.schema().names == ["digit", "n", "share"]
        assert out.count() == 0

    def test_magnitude_guard_raises(self, ray_session):
        with pytest.raises(Exception, match="2\\^62"):
            benford_digits(
                _ds({"v": pa.array([2.0 ** 61], pa.float64())}, 1),
                "v").materialize()


class TestLongestStreaks:
    US_DAY = 86_400_000_000

    def _ts(self, days):
        return pa.array(
            [None if d is None else d * self.US_DAY + 12345 for d in days],
            pa.timestamp("us"))

    def test_known_islands(self, ray_session):
        # user 1: days {0,1,2, 5,6, 9} -> 6 units, 3 streaks, longest 3
        # user 2: single day -> 1/1/1
        days = [0, 1, 1, 2, 5, 6, 9, 9, 4]
        users = [1] * 8 + [2]
        got = longest_streaks(
            _ds({"u": pa.array(users, pa.int64()),
                 "ts": self._ts(days)}, 4),
            "u", "ts").to_pandas().sort_values("u").reset_index(drop=True)
        assert got["u"].tolist() == [1, 2]
        assert got["n_units"].tolist() == [6, 1]
        assert got["n_streaks"].tolist() == [3, 1]
        assert got["longest_streak"].tolist() == [3, 1]

    def test_duplicates_collapse_across_blocks(self, ray_session):
        # the same (user, day) repeated in EVERY block must count once —
        # pins the cross-batch DISTINCT merge inside per_partition
        days = [7, 8, 7, 8, 7, 8, 7, 8]
        got = longest_streaks(
            _ds({"u": pa.array([5] * 8, pa.int64()),
                 "ts": self._ts(days)}, 8),
            "u", "ts").to_pandas()
        assert got["n_units"].tolist() == [2]
        assert got["n_streaks"].tolist() == [1]
        assert got["longest_streak"].tolist() == [2]

    def test_null_ts_drops_null_key_one_group(self, ray_session):
        got = longest_streaks(
            _ds({"u": pa.array([None, None, 1, None], pa.int64()),
                 "ts": self._ts([3, 4, None, 6])}, 2),
            "u", "ts").to_pandas()
        # user 1's only event has NULL ts -> user 1 disappears entirely;
        # the two NULL keys form ONE SQL-style partition
        assert len(got) == 1
        assert pd.isna(got["u"].iloc[0])
        assert got["n_units"].tolist() == [3]
        assert got["n_streaks"].tolist() == [2]
        assert got["longest_streak"].tolist() == [2]

    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(59)
        n = 30000
        users = rng.integers(0, 200, n)
        days = rng.integers(0, 120, n)
        ts = days * self.US_DAY + rng.integers(0, self.US_DAY, n)
        tsa = pa.array(ts, pa.int64()).cast(pa.timestamp("us"))
        tsa = pa.compute.if_else(
            pa.array(rng.random(n) < 0.02),
            pa.scalar(None, pa.timestamp("us")), tsa)
        got = longest_streaks(
            _ds({"u": pa.array(users, pa.int64()), "ts": tsa}, 8),
            "u", "ts").to_pandas().sort_values("u").reset_index(drop=True)
        df = pd.DataFrame({"u": users, "ts": tsa.to_pandas()})
        exp = duckdb.sql("""
            WITH d AS (SELECT DISTINCT u,
                              epoch_us(ts) // 86400000000 AS unit
                       FROM df WHERE ts IS NOT NULL),
            r AS (SELECT u, unit, unit - ROW_NUMBER() OVER (
                      PARTITION BY u ORDER BY unit) AS grp FROM d),
            s AS (SELECT u, grp, COUNT(*) AS len FROM r GROUP BY u, grp)
            SELECT u, CAST(SUM(len) AS BIGINT) AS n_units,
                   COUNT(*) AS n_streaks,
                   CAST(MAX(len) AS BIGINT) AS longest_streak
            FROM s GROUP BY u ORDER BY u
        """).df()
        for c in ("u", "n_units", "n_streaks", "longest_streak"):
            assert got[c].tolist() == exp[c].tolist(), c

    def test_pre_1970_raises(self, ray_session):
        with pytest.raises(Exception, match="non-negative"):
            longest_streaks(
                _ds({"u": pa.array([1], pa.int64()),
                     "ts": pa.array([-5], pa.int64())}, 1),
                "u", "ts").materialize()


from jsschema_ray.stages.stats import count_spikes
from jsschema_ray.stages.windows import value_runs


class TestValueRuns:
    US = 1_000_000

    def test_known_runs(self, ray_session):
        # user 1 ordered by (ts, id): A A B B B A -> runs A(2) B(3) A(1)
        got = value_runs(
            _ds({"u": pa.array([1] * 6, pa.int64()),
                 "ts": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                 "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
                 "v": pa.array(["A", "A", "B", "B", "B", "A"])}, 3),
            "u", "ts", "id", "v").to_pandas()
        assert got["n_rows"].tolist() == [6]
        assert got["n_runs"].tolist() == [3]
        assert got["longest_run"].tolist() == [2 + 1]

    def test_tiebreak_orders_equal_ts(self, ray_session):
        # equal ts: id decides -> A B A = 3 runs, NOT A A B
        got = value_runs(
            _ds({"u": pa.array([1, 1, 1], pa.int64()),
                 "ts": pa.array([9, 9, 9], pa.int64()),
                 "id": pa.array([2, 1, 3], pa.int64()),
                 "v": pa.array(["B", "A", "A"])}, 2),
            "u", "ts", "id", "v").to_pandas()
        assert got["n_runs"].tolist() == [3]

    def test_adjacent_nulls_extend_a_run(self, ray_session):
        # IS DISTINCT FROM: NULL, NULL is NOT a change -> runs A (N N) A
        got = value_runs(
            _ds({"u": pa.array([1, 1, 1, 1], pa.int64()),
                 "ts": pa.array([1, 2, 3, 4], pa.int64()),
                 "id": pa.array([1, 2, 3, 4], pa.int64()),
                 "v": pa.array(["A", None, None, "A"])}, 2),
            "u", "ts", "id", "v").to_pandas()
        assert got["n_rows"].tolist() == [4]
        assert got["n_runs"].tolist() == [3]
        assert got["longest_run"].tolist() == [2]

    def test_null_order_rows_drop_null_key_one_group(self, ray_session):
        got = value_runs(
            _ds({"u": pa.array([None, None, 1], pa.int64()),
                 "ts": pa.array([1, 2, None], pa.int64()),
                 "id": pa.array([1, 2, 3], pa.int64()),
                 "v": pa.array(["A", "B", "C"])}, 2),
            "u", "ts", "id", "v").to_pandas()
        assert len(got) == 1 and pd.isna(got["u"].iloc[0])
        assert got["n_rows"].tolist() == [2]
        assert got["n_runs"].tolist() == [2]

    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(61)
        n = 20000
        u = rng.integers(0, 100, n)
        ts = rng.integers(0, 10**9, n)
        ids = rng.permutation(n).astype(np.int64)
        v = rng.choice(["a", "b", "c", None], n, p=[0.4, 0.3, 0.25, 0.05])
        got = value_runs(
            _ds({"u": pa.array(u, pa.int64()),
                 "ts": pa.array(ts, pa.int64()),
                 "id": pa.array(ids, pa.int64()),
                 "v": pa.array(v)}, 8),
            "u", "ts", "id", "v").to_pandas() \
            .sort_values("u").reset_index(drop=True)
        df = pd.DataFrame({"u": u, "ts": ts, "id": ids, "v": v})
        exp = duckdb.sql("""
            WITH l AS (SELECT u, v,
                     ROW_NUMBER() OVER (PARTITION BY u ORDER BY ts, id) AS rn,
                     CASE WHEN LAG(v) OVER (PARTITION BY u ORDER BY ts, id)
                              IS DISTINCT FROM v THEN 1 ELSE 0 END AS chg
                  FROM df),
            g AS (SELECT u, SUM(chg) OVER (PARTITION BY u ORDER BY rn)
                         AS grp FROM l),
            s AS (SELECT u, grp, COUNT(*) AS len FROM g GROUP BY u, grp)
            SELECT u, CAST(SUM(len) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_runs, CAST(MAX(len) AS BIGINT)
                       AS longest_run
            FROM s GROUP BY u ORDER BY u
        """).df()
        for c in exp.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestCountSpikes:
    US_DAY = 86_400_000_000

    def _ts(self, days):
        return pa.array([d * self.US_DAY + 7 for d in days],
                        pa.timestamp("us"))

    def test_flags_the_spike_day(self, ray_session):
        # type X: 9 days of 1 event + 1 day of 20 -> only the 20 flags
        days = list(range(9)) + [9] * 20
        got = count_spikes(
            _ds({"g": pa.array(["X"] * len(days)), "ts": self._ts(days)}, 4),
            "g", "ts").to_pandas()
        assert got["day"].tolist() == [9]
        assert got["n"].tolist() == [20]
        assert got["z"].iloc[0] > 2.0

    def test_zero_variance_and_single_day_emit_nothing(self, ray_session):
        days = [0, 1, 2, 0, 1, 2]          # type A: 2 events every day
        got = count_spikes(
            _ds({"g": pa.array(["A"] * 6 + ["B"]),
                 "ts": self._ts(days + [5])}, 3),
            "g", "ts").to_pandas()
        assert len(got) == 0

    def test_null_group_and_null_ts_drop(self, ray_session):
        days = list(range(9)) + [9] * 20
        tsa = self._ts(days)
        got = count_spikes(
            _ds({"g": pa.array(["X"] * len(days) + [None, "X"]),
                 "ts": pa.concat_arrays(
                     [tsa, pa.array([self.US_DAY, None],
                                    pa.timestamp("us"))])}, 4),
            "g", "ts").to_pandas()
        assert got["day"].tolist() == [9]   # unchanged by the 2 bad rows

    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(67)
        n = 40000
        g = rng.choice(["a", "b", "c", "d"], n)
        day = rng.integers(0, 60, n)
        # inject real spikes
        g = np.r_[g, ["a"] * 900]; day = np.r_[day, [13] * 900]
        ts = day * self.US_DAY + rng.integers(0, self.US_DAY, len(day))
        got = count_spikes(
            _ds({"g": pa.array(g), "ts": pa.array(ts, pa.int64())
                 .cast(pa.timestamp("us"))}, 8),
            "g", "ts").to_pandas() \
            .sort_values(["g", "day"]).reset_index(drop=True)
        df = pd.DataFrame({"g": g,
                           "ts": pd.to_datetime(ts, unit="us")})
        exp = duckdb.sql("""
            WITH c AS (SELECT g, epoch_us(ts) // 86400000000 AS day,
                              COUNT(*) AS n
                       FROM df WHERE ts IS NOT NULL AND g IS NOT NULL
                       GROUP BY g, day),
            gg AS (SELECT g, COUNT(*) AS n_days,
                          CAST(SUM(n) AS BIGINT) AS sum_n,
                          CAST(SUM(n*n) AS BIGINT) AS sum_n2
                   FROM c GROUP BY g),
            j AS (SELECT c.g, c.day, c.n,
                         CAST(c.n * gg.n_days - gg.sum_n AS DOUBLE)
                             / SQRT(CAST(gg.n_days * gg.sum_n2
                                    - gg.sum_n * gg.sum_n AS DOUBLE)) AS z
                  FROM c JOIN gg USING (g)
                  WHERE gg.n_days >= 2
                    AND gg.n_days * gg.sum_n2 - gg.sum_n * gg.sum_n > 0)
            SELECT g, day, n, z FROM j WHERE ABS(z) > 2.0
            ORDER BY g, day
        """).df()
        assert len(got) == len(exp) > 0
        for c in ("g", "day", "n"):
            assert got[c].tolist() == exp[c].tolist(), c
        assert (got["z"].to_numpy() == exp["z"].to_numpy()).all()

    def test_pre_1970_raises(self, ray_session):
        with pytest.raises(Exception, match="non-negative"):
            count_spikes(
                _ds({"g": pa.array(["a"]),
                     "ts": pa.array([-9], pa.int64())}, 1),
                "g", "ts").materialize()


from jsschema_ray.stages.stats import null_profile
from jsschema_ray.stages.uniqueness import candidate_keys


class TestNullProfile:
    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(71)
        n = 12000
        a = rng.integers(0, 100, n).astype(object)
        a[rng.random(n) < 0.15] = None
        b = rng.choice(["x", "y", None], n, p=[0.5, 0.3, 0.2])
        c = rng.random(n)
        got = null_profile(
            _ds({"a": pa.array(a, pa.int64()), "b": pa.array(b),
                 "c": pa.array(c, pa.float64())}, 8)
        ).to_pandas().sort_values("col_name").reset_index(drop=True)
        df = pd.DataFrame({"a": pd.array([x for x in a], dtype="Int64"),
                           "b": b, "c": c})
        exp = duckdb.sql("""
            WITH p AS (
                SELECT 'a' AS col_name, COUNT(*)-COUNT(a) AS n_nulls,
                       COUNT(*) AS n_rows FROM df
                UNION ALL SELECT 'b', COUNT(*)-COUNT(b), COUNT(*) FROM df
                UNION ALL SELECT 'c', COUNT(*)-COUNT(c), COUNT(*) FROM df)
            SELECT col_name, n_nulls, n_rows,
                   CAST(n_nulls AS DOUBLE)/CAST(n_rows AS DOUBLE)
                       AS null_frac
            FROM p ORDER BY col_name
        """).df()
        assert got["n_nulls"].tolist() == exp["n_nulls"].tolist()
        assert got["n_rows"].tolist() == exp["n_rows"].tolist()
        assert (got["null_frac"].to_numpy()
                == exp["null_frac"].to_numpy()).all()
        assert got["n_nulls"].sum() > 0  # the synthetic nulls were seen

    def test_column_subset_and_all_null(self, ray_session):
        got = null_profile(
            _ds({"x": pa.array([None, None, None], pa.int64()),
                 "y": pa.array([1, 2, 3], pa.int64())}, 2),
            columns=["x"]).to_pandas()
        assert got["col_name"].tolist() == ["x"]
        assert got["n_nulls"].tolist() == [3]
        assert got["null_frac"].tolist() == [1.0]


class TestCandidateKeys:
    def test_key_vs_nonkey_with_null_tuples(self, ray_session):
        # (a) alone duplicates; (a,b) is a key; (c) has two NULLs ->
        # NULLs compare EQUAL inside DISTINCT, so c is NOT a key
        got = candidate_keys(
            _ds({"a": pa.array([1, 1, 2, 2], pa.int64()),
                 "b": pa.array([1, 2, 1, 2], pa.int64()),
                 "c": pa.array([10, None, None, 30], pa.int64())}, 2),
            [["a"], ["a", "b"], ["c"]])
        got = got.set_index("combo")
        assert got.loc["a", "n_distinct"] == 2
        assert not got.loc["a", "is_key"]
        assert got.loc["a,b", "n_distinct"] == 4
        assert bool(got.loc["a,b", "is_key"])
        assert got.loc["c", "n_distinct"] == 3
        assert not got.loc["c", "is_key"]
        assert (got["n_rows"] == 4).all()

    def test_matches_duckdb_on_random(self, ray_session):
        rng = np.random.default_rng(73)
        n = 15000
        a = rng.integers(0, 500, n)
        b = rng.integers(0, 40, n)
        got = candidate_keys(
            _ds({"a": pa.array(a, pa.int64()),
                 "b": pa.array(b, pa.int64())}, 8),
            [["a"], ["a", "b"]])
        df = pd.DataFrame({"a": a, "b": b})
        exp = duckdb.sql("""
            WITH n AS (SELECT COUNT(*) AS n_rows FROM df),
            u AS (SELECT 'a' AS combo, (SELECT COUNT(*) FROM
                      (SELECT DISTINCT a FROM df)) AS n_distinct
                  UNION ALL SELECT 'a,b', (SELECT COUNT(*) FROM
                      (SELECT DISTINCT a, b FROM df)))
            SELECT u.combo, n.n_rows, u.n_distinct,
                   u.n_distinct = n.n_rows AS is_key
            FROM u CROSS JOIN n ORDER BY combo
        """).df()
        for c in exp.columns:
            assert got[c].tolist() == exp[c].tolist(), c


from jsschema_ray.stages.quantiles import grouped_trimmed_mean


class TestGroupedTrimmedMean:
    def test_known_trim(self, ray_session):
        # group 'a': values 1..10, p=0.1 -> k=1, keep 2..9, mean 5.5
        got = grouped_trimmed_mean(
            _ds({"g": pa.array(["a"] * 10),
                 "v": pa.array([float(i) for i in range(1, 11)],
                               pa.float64())}, 4),
            "g", "v", p=0.1).to_pandas()
        assert got["n_kept"].tolist() == [8]
        assert got["trimmed_mean"].tolist() == [5.5]

    def test_small_group_fully_trimmed_emits_nothing(self, ray_session):
        # n=2, p=0.5 is rejected; n=2, p=0.49 -> k=0 keeps both;
        # a 3-row group at p=0.34 -> k=1 keeps 1
        got = grouped_trimmed_mean(
            _ds({"g": pa.array(["a", "a", "b", "b", "b"]),
                 "v": pa.array([1.0, 9.0, 2.0, 4.0, 6.0], pa.float64())},
                2),
            "g", "v", p=0.34).to_pandas().sort_values("g") \
            .reset_index(drop=True)
        assert got["g"].tolist() == ["a", "b"]
        assert got["n_kept"].tolist() == [2, 1]
        assert got["trimmed_mean"].tolist() == [5.0, 4.0]

    def test_ties_trim_as_multiset(self, ray_session):
        # 1 1 1 5 9 9 9 with p=0.15 -> k=1: drop ONE 1 and ONE 9
        got = grouped_trimmed_mean(
            _ds({"g": pa.array(["x"] * 7),
                 "v": pa.array([1.0, 1.0, 1.0, 5.0, 9.0, 9.0, 9.0],
                               pa.float64())}, 3),
            "g", "v", p=0.15).to_pandas()
        assert got["n_kept"].tolist() == [5]
        assert got["trimmed_mean"].tolist() == [(1 + 1 + 5 + 9 + 9) / 5]

    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(79)
        n = 25000
        g = rng.choice(["p", "q", "r", "s"], n)
        v = np.round(rng.normal(500, 200, n), 2)
        v[rng.random(n) < 0.03] = np.nan
        arr = pa.array(v, pa.float64())
        got = grouped_trimmed_mean(
            _ds({"g": pa.array(g), "v": arr}, 8), "g", "v", p=0.1
        ).to_pandas().sort_values("g").reset_index(drop=True)
        df = pd.DataFrame({"g": g, "v": arr.to_pandas()})
        exp = duckdb.sql("""
            WITH f AS (SELECT g, CAST(ROUND(v*100) AS BIGINT) AS c
                       FROM df WHERE v IS NOT NULL),
            r AS (SELECT g, c, ROW_NUMBER() OVER (PARTITION BY g
                                                  ORDER BY c) AS rn,
                         COUNT(*) OVER (PARTITION BY g) AS n FROM f),
            k AS (SELECT *, CAST(FLOOR(CAST(n AS DOUBLE) * 0.1)
                                 AS BIGINT) AS k FROM r)
            SELECT g, COUNT(*) AS n_kept,
                   CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) / 100.0 AS trimmed_mean
            FROM k WHERE rn > k AND rn <= n - k
            GROUP BY g ORDER BY g
        """).df()
        assert got["n_kept"].tolist() == exp["n_kept"].tolist()
        assert (got["trimmed_mean"].to_numpy()
                == exp["trimmed_mean"].to_numpy()).all()

    def test_p_range_and_overflow_guards(self, ray_session):
        with pytest.raises(ValueError, match="p must be"):
            grouped_trimmed_mean(
                _ds({"g": pa.array(["a"]),
                     "v": pa.array([1.0], pa.float64())}, 1),
                "g", "v", p=0.5)
        with pytest.raises(Exception, match="2\\^62"):
            grouped_trimmed_mean(
                _ds({"g": pa.array(["a", "a", "a"]),
                     "v": pa.array([2.0 ** 61, 1.0, 2.0], pa.float64())},
                    1),
                "g", "v", p=0.1).materialize()


from jsschema_ray.stages.drift import exact_ks
from jsschema_ray.stages.stats import equiwidth_histogram


class TestEquiwidthHistogram:
    def test_known_bins_and_boundaries(self, ray_session):
        # [0, 10) in 5 bins of width 2.00 (200 cents); 9.99 -> bin 4,
        # 10.0 -> outside (drops), -0.01 -> outside, 2.00 -> bin 1
        got = equiwidth_histogram(
            _ds({"v": pa.array([0.0, 1.99, 2.0, 9.99, 10.0, -0.01, None],
                               pa.float64())}, 3),
            "v", 0.0, 10.0, 5).to_pandas().sort_values("bin") \
            .reset_index(drop=True)
        assert got["bin"].tolist() == [0, 1, 4]
        assert got["bin_lo_cents"].tolist() == [0, 200, 800]
        assert got["n"].tolist() == [2, 1, 1]

    def test_uneven_width_refuses(self, ray_session):
        with pytest.raises(ValueError, match="divide evenly"):
            equiwidth_histogram(
                _ds({"v": pa.array([1.0], pa.float64())}, 1),
                "v", 0.0, 10.0, 3)

    def test_matches_duckdb_random(self, ray_session):
        rng = np.random.default_rng(83)
        v = np.round(rng.normal(50, 30, 20000), 2)
        got = equiwidth_histogram(
            _ds({"v": pa.array(v, pa.float64())}, 8),
            "v", 0.0, 100.0, 20).to_pandas().sort_values("bin") \
            .reset_index(drop=True)
        df = pd.DataFrame({"v": v})
        exp = duckdb.sql("""
            WITH f AS (SELECT CAST(ROUND(v*100) AS BIGINT) AS c FROM df
                       WHERE v IS NOT NULL),
            b AS (SELECT (c - 0) // 500 AS bin FROM f
                  WHERE c >= 0 AND c < 10000)
            SELECT bin, 0 + bin * 500 AS bin_lo_cents, COUNT(*) AS n
            FROM b GROUP BY bin ORDER BY bin
        """).df()
        for c in exp.columns:
            assert got[c].tolist() == exp[c].tolist(), c


class TestExactKS:
    def test_identical_slices_ks_zero(self, ray_session):
        v = [1.0, 2.0, 3.0] * 4
        g = ["a"] * 6 + ["b"] * 6
        got = exact_ks(
            _ds({"g": pa.array(g), "v": pa.array(v, pa.float64())}, 3),
            "g", "v", "a", "b").to_pandas()
        assert got["ks"].tolist() == [0.0]
        assert got["n1"].tolist() == [6] and got["n2"].tolist() == [6]

    def test_disjoint_slices_ks_one(self, ray_session):
        got = exact_ks(
            _ds({"g": pa.array(["a", "a", "b", "b"]),
                 "v": pa.array([1.0, 2.0, 5.0, 6.0], pa.float64())}, 2),
            "g", "v", "a", "b").to_pandas()
        assert got["ks"].tolist() == [1.0]
        assert got["at_cents"].tolist() == [200]  # smallest argmax

    def test_empty_slice_raises(self, ray_session):
        with pytest.raises(Exception, match="undefined"):
            exact_ks(
                _ds({"g": pa.array(["a", "a"]),
                     "v": pa.array([1.0, 2.0], pa.float64())}, 1),
                "g", "v", "a", "zzz").materialize()

    def test_bit_identical_vs_duckdb(self, ray_session):
        rng = np.random.default_rng(89)
        n = 30000
        g = rng.choice(["a", "b", "c"], n)       # 'c' rows must drop
        v = np.round(np.where(g == "a",
                              rng.normal(100, 20, n),
                              rng.normal(104, 22, n)), 2)
        v[rng.random(n) < 0.02] = np.nan
        arr = pa.array(v, pa.float64())
        got = exact_ks(
            _ds({"g": pa.array(g), "v": arr}, 8),
            "g", "v", "a", "b").to_pandas()
        df = pd.DataFrame({"g": g, "v": arr.to_pandas()})
        exp = duckdb.sql("""
            WITH f AS (SELECT CASE WHEN g = 'a' THEN 1 ELSE 2 END AS side,
                              CAST(ROUND(v*100) AS BIGINT) AS c
                       FROM df WHERE v IS NOT NULL AND g IN ('a','b')),
            p AS (SELECT c,
                         CAST(SUM(CASE WHEN side=1 THEN 1 ELSE 0 END)
                              AS BIGINT) AS a,
                         CAST(SUM(CASE WHEN side=2 THEN 1 ELSE 0 END)
                              AS BIGINT) AS b
                  FROM f GROUP BY c),
            w AS (SELECT c,
                         CAST(SUM(a) OVER (ORDER BY c) AS BIGINT) AS ca,
                         CAST(SUM(b) OVER (ORDER BY c) AS BIGINT) AS cb,
                         CAST(SUM(a) OVER () AS BIGINT) AS n1,
                         CAST(SUM(b) OVER () AS BIGINT) AS n2
                  FROM p)
            SELECT n1, n2, c AS at_cents,
                   ABS(CAST(ca AS DOUBLE)/CAST(n1 AS DOUBLE)
                       - CAST(cb AS DOUBLE)/CAST(n2 AS DOUBLE)) AS ks
            FROM w ORDER BY ks DESC, at_cents LIMIT 1
        """).df()
        for c in exp.columns:
            assert got[c].tolist() == exp[c].tolist(), c
        assert (got["ks"].to_numpy() == exp["ks"].to_numpy()).all()


class TestNaNDropsLikeNull:
    """NaN (a VALUE in Arrow, but NULL once it round-trips through
    pandas/DuckDB) must drop exactly like NULL in every cents-scaling
    op — the _grouped_value_counts notna convention."""

    def test_benford_and_histogram_ignore_nan(self, ray_session):
        arr = pa.array([float("nan"), 3.21, float("nan")], pa.float64())
        got = benford_digits(_ds({"v": arr}, 2), "v").to_pandas()
        assert got["digit"].tolist() == [3]
        assert got["n"].tolist() == [1]
        h = equiwidth_histogram(_ds({"v": arr}, 2), "v",
                                0.0, 10.0, 5).to_pandas()
        assert h["n"].tolist() == [1]


from jsschema_ray.stages.uniqueness import group_size_histogram


class TestGroupSizeHistogram:
    def test_known_degrees_with_null_key(self, ray_session):
        # keys: a x3, b x1, NULL x2 -> sizes {3:1, 1:1, 2:1}
        got = group_size_histogram(
            _ds({"k": pa.array(["a", "a", "a", "b", None, None])}, 3),
            ["k"]).to_pandas().sort_values("group_size") \
            .reset_index(drop=True)
        assert got["group_size"].tolist() == [1, 2, 3]
        assert got["n_keys"].tolist() == [1, 1, 1]

    def test_multi_key_and_duckdb(self, ray_session):
        rng = np.random.default_rng(97)
        n = 20000
        a = rng.integers(0, 300, n)
        b = rng.integers(0, 5, n)
        got = group_size_histogram(
            _ds({"a": pa.array(a, pa.int64()),
                 "b": pa.array(b, pa.int64())}, 8),
            ["a", "b"]).to_pandas().sort_values("group_size") \
            .reset_index(drop=True)
        df = pd.DataFrame({"a": a, "b": b})
        exp = duckdb.sql("""
            WITH c AS (SELECT a, b, COUNT(*) AS n FROM df GROUP BY a, b)
            SELECT n AS group_size, COUNT(*) AS n_keys FROM c
            GROUP BY n ORDER BY n
        """).df()
        for c in exp.columns:
            assert got[c].tolist() == exp[c].tolist(), c


from jsschema_ray.stages.aggregates import pivot_sums


class TestPivotSums:
    def test_known_crosstab(self, ray_session):
        got = pivot_sums(
            _ds({"r": pa.array(["a", "a", "b", "a", "b"]),
                 "c": pa.array(["x", "y", "x", "x", "z"]),
                 "v": pa.array([1.0, 2.0, 3.0, 4.0, 99.0],
                               pa.float64())}, 3),
            "r", "c", "v", ["x", "y"]).to_pandas() \
            .sort_values("r").reset_index(drop=True)
        # 'z' rows drop entirely; b keeps only its x row
        assert got["r"].tolist() == ["a", "b"]
        assert got["sum_x_cents"].tolist() == [500, 300]
        assert got["sum_y_cents"].tolist() == [200, 0]

    def test_nan_null_drop_and_out_of_domain_only_key(self, ray_session):
        got = pivot_sums(
            _ds({"r": pa.array(["a", "a", "only_z"]),
                 "c": pa.array(["x", "x", "z"]),
                 "v": pa.array([1.5, None, 7.0], pa.float64())}, 2),
            "r", "c", "v", ["x"]).to_pandas()
        assert got["r"].tolist() == ["a"]       # only_z emits nothing
        assert got["sum_x_cents"].tolist() == [150]

    def test_matches_duckdb_random(self, ray_session):
        rng = np.random.default_rng(101)
        n = 20000
        r = rng.choice(["p", "q", "r"], n)
        c = rng.choice(["O", "F", "X"], n)
        v = np.round(rng.normal(100, 40, n), 2)
        got = pivot_sums(
            _ds({"r": pa.array(r), "c": pa.array(c),
                 "v": pa.array(v, pa.float64())}, 8),
            "r", "c", "v", ["O", "F"]).to_pandas() \
            .sort_values("r").reset_index(drop=True)
        df = pd.DataFrame({"r": r, "c": c, "v": v})
        exp = duckdb.sql("""
            WITH f AS (SELECT r, c,
                              CAST(ROUND(v*100) AS BIGINT) AS cents
                       FROM df WHERE v IS NOT NULL AND c IN ('O','F'))
            SELECT r,
                   CAST(SUM(CASE WHEN c='O' THEN cents ELSE 0 END)
                        AS BIGINT) AS sum_O_cents,
                   CAST(SUM(CASE WHEN c='F' THEN cents ELSE 0 END)
                        AS BIGINT) AS sum_F_cents
            FROM f GROUP BY r ORDER BY r
        """).df()
        for col in exp.columns:
            assert got[col].tolist() == exp[col].tolist(), col
