"""Distribution-drift constraint: per-partition t-digest histograms of
selected (possibly derived) columns compared against a reference profile
via Kolmogorov–Smirnov distance; a partition passes iff KS <= threshold for
every profiled column (SURVEY.md §2.C; BASELINE.json north_star drift term).

Flow: stats stage (stages/stats.py) produces per-partition digests without
shuffling raw rows; KS is computed driver-side from the merged digests —
O(partitions × columns × centroids), independent of row count.
"""

from __future__ import annotations

import base64
import json
from typing import Any, Optional

import pyarrow as pa

from jsschema_ray.stages.stats import StatsSpec, collect_stats
from jsschema_ray.state.tdigest import TDigest


class DriftProfile:
    """Reference digests per column (built from a clean/baseline dataset)."""

    def __init__(self, digests: dict[str, TDigest]):
        self.digests = digests

    def to_json(self) -> str:
        return json.dumps(
            {
                c: base64.b64encode(d.to_bytes()).decode()
                for c, d in self.digests.items()
            }
        )

    @classmethod
    def from_json(cls, s: str) -> "DriftProfile":
        raw = json.loads(s)
        return cls(
            {c: TDigest.from_bytes(base64.b64decode(b)) for c, b in raw.items()}
        )


def _spec_for(columns: list[str], partition_col: Optional[str]) -> StatsSpec:
    spec = StatsSpec(quantiles=list(columns), partition_col=partition_col)
    for name in columns:
        if name.endswith("_len"):
            spec.derived[name] = (name[:-4], "utf8_length")
    return spec


def build_profile(ds, columns: list[str], batch_size: int = 65536,
                  concurrency: Optional[int] = None) -> DriftProfile:
    """Global (partition-less) digests of the reference dataset."""
    stats = collect_stats(ds, _spec_for(columns, None), batch_size, concurrency)
    return DriftProfile(
        {col: cs.digest for (_, col), cs in stats.items() if cs.digest is not None}
    )


def _verdicts(stats, profile: DriftProfile, ks_threshold: float) -> pa.Table:
    rows: list[dict[str, Any]] = []
    for (part, col), cs in sorted(stats.items()):
        ref = profile.digests.get(col)
        if ref is None or cs.digest is None:
            continue
        ks = cs.digest.ks_distance(ref)
        rows.append(
            {
                "partition": part,
                "column": col,
                "ks": round(ks, 6),
                "n": cs.count,
                "passed": ks <= ks_threshold,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("partition", pa.string()),
                ("column", pa.string()),
                ("ks", pa.float64()),
                ("n", pa.int64()),
                ("passed", pa.bool_()),
            ]
        ),
    )


def drift_check_self(ds, columns: list[str], partition_col: str,
                     ks_threshold: float = 0.15, batch_size: int = 65536,
                     concurrency: Optional[int] = None
                     ) -> tuple[pa.Table, DriftProfile]:
    """Self-profiling drift in ONE scan: the per-partition digests are
    collected once, the global reference profile is their driver-side
    merge (t-digest merge is associative), and each partition's KS is
    computed against that merged profile. Halves the I/O of
    build_profile + drift_check over the same input. Returns
    (verdict_table, profile) so the profile can be persisted for later
    incremental checks."""
    stats = collect_stats(
        ds, _spec_for(columns, partition_col), batch_size, concurrency
    )
    merged: dict[str, TDigest] = {}
    for (_, col), cs in sorted(stats.items()):
        if cs.digest is None:
            continue
        if col in merged:
            merged[col] = merged[col].merge(cs.digest)
        else:
            merged[col] = TDigest(cs.digest.compression).merge(cs.digest)
    profile = DriftProfile(merged)
    return _verdicts(stats, profile, ks_threshold), profile


def drift_check(ds, profile: DriftProfile, columns: list[str],
                partition_col: str, ks_threshold: float = 0.15,
                batch_size: int = 65536,
                concurrency: Optional[int] = None) -> pa.Table:
    """Per-(partition, column) KS distance vs the profile -> verdict table
    (partition, column, ks, n, passed)."""
    stats = collect_stats(
        ds, _spec_for(columns, partition_col), batch_size, concurrency
    )
    rows: list[dict[str, Any]] = []
    for (part, col), cs in sorted(stats.items()):
        ref = profile.digests.get(col)
        if ref is None or cs.digest is None:
            continue
        ks = cs.digest.ks_distance(ref)
        rows.append(
            {
                "partition": part,
                "column": col,
                "ks": round(ks, 6),
                "n": cs.count,
                "passed": ks <= ks_threshold,
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("partition", pa.string()),
                ("column", pa.string()),
                ("ks", pa.float64()),
                ("n", pa.int64()),
                ("passed", pa.bool_()),
            ]
        ),
    )
