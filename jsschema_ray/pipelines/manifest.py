"""Per-partition checkpoint manifest: lineage + metrics, atomic commit,
resume-skip (BASELINE north_rule: "resumable from checkpoint with
per-partition lineage + metrics").

A partition == one input shard file (deterministic across runs: same file
-> same partition id, SURVEY.md §4 partitioning row). Commit protocol:
write ``<manifest_dir>/.tmp.<pid>.json`` then ``os.replace`` to
``<pid>.json`` — rename is atomic on POSIX, so a killed run leaves either
a committed partition or nothing, never a torn manifest. Resume = skip
partitions whose manifest file exists.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional


def partition_id_for(path: str) -> str:
    """Deterministic partition id for an input shard path (stem)."""
    return os.path.splitext(os.path.basename(path))[0]


class CheckpointManifest:
    def __init__(self, output_dir: str):
        self.dir = os.path.join(output_dir, "manifest")
        os.makedirs(self.dir, exist_ok=True)

    def committed(self) -> dict[str, dict[str, Any]]:
        out = {}
        for name in os.listdir(self.dir):
            if name.endswith(".json") and not name.startswith(".tmp"):
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
                out[rec["partition"]] = rec
        return out

    def commit_partition(
        self,
        partition: str,
        input_path: str,
        metrics: dict[str, Any],
        violation_files: Optional[list[str]] = None,
        verdict: Optional[bool] = None,
    ) -> dict[str, Any]:
        rec = {
            "partition": partition,
            "input_path": input_path,         # lineage: exactly which shard
            "committed_at": time.time(),
            "metrics": metrics,
            "violation_files": violation_files or [],
            "verdict": verdict,
        }
        tmp = os.path.join(self.dir, f".tmp.{partition}.json")
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.dir, f"{partition}.json"))
        return rec

    def write_job_report(self, report: dict[str, Any]) -> str:
        """Job-level record (global constraints span partitions, so their
        results live here, recomputed each run)."""
        path = os.path.join(os.path.dirname(self.dir), "report.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True, default=str)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        return path
