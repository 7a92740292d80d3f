"""End-to-end validation pipeline: the distributed analogue of the
reference CLI flow (cmd/jsschema/jsschema.go:34-91 — read schema, validate
data, report) planned per SURVEY.md §3.4:

  P1  row-local mask stage: stateless map_batches over zero-copy Arrow
      batches (kernels/columnar.py), violations + per-partition counts
  P2  stats/drift stage: sketch partials -> tiny merge (stages/stats.py)
  P3  global constraints: uniqueness pre-agg shuffle, referential
      broadcast semi-join (stages/uniqueness.py, stages/referential.py)
  P4  verdict assembly: per-partition manifest commit (atomic) + job report

The ``x-*`` extras of the schema (the Extras extension surface,
reference interface.go:133) select which P2/P3 stages run. Partition ==
input shard file; committed partitions are skipped on resume (P1 only —
global constraints always span the full input and are recomputed).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Optional

import pyarrow as pa

import ray.data as rd

from jsschema_ray.pipelines.manifest import CheckpointManifest, partition_id_for
from jsschema_ray.stages.drift import DriftProfile, build_profile, drift_check
from jsschema_ray.stages.referential import referential_check
from jsschema_ray.stages.stats import StatsSpec, collect_stats
from jsschema_ray.stages.uniqueness import top_duplicates, uniqueness_report
from jsschema_ray.stages.validate import ValidateBatch


class ValidationPipeline:
    def __init__(
        self,
        schema: dict[str, Any],
        input_dir: str,
        output_dir: str,
        key_column: str = "image_id",
        batch_size: int = 65536,
        drift_profile: Optional[DriftProfile] = None,
    ):
        self.schema = schema
        self.input_dir = input_dir
        self.output_dir = output_dir
        self.key_column = key_column
        self.batch_size = batch_size
        self.drift_profile = drift_profile
        self.manifest = CheckpointManifest(output_dir)

    # -- helpers -----------------------------------------------------------
    def _input_files(self) -> list[str]:
        files = sorted(glob.glob(os.path.join(self.input_dir, "*.parquet")))
        if not files:
            raise FileNotFoundError(f"no parquet shards in {self.input_dir}")
        return files

    def _non_payload_columns(self, files: list[str]) -> list[str]:
        import pyarrow.parquet as pq

        return [
            f.name
            for f in pq.read_schema(files[0])
            if f.name != "bytes"  # the wide payload never enters P1 kernels
        ]

    # -- run ---------------------------------------------------------------
    def run(self, resume: bool = True) -> dict[str, Any]:
        files = self._input_files()
        committed = self.manifest.committed() if resume else {}
        todo = [f for f in files if partition_id_for(f) not in committed]
        report: dict[str, Any] = {
            "input_dir": self.input_dir,
            "partitions_total": len(files),
            "partitions_resumed": len(files) - len(todo),
        }

        if todo:
            self._run_rowlocal(todo)
        report["partitions"] = self.manifest.committed()

        extras = {k: v for k, v in self.schema.items() if k.startswith("x-")}
        full = self._read(files)  # global constraints span ALL partitions
        if "x-uniqueness" in extras:
            report["uniqueness"] = self._run_uniqueness(full, extras["x-uniqueness"])
        if "x-referential" in extras:
            report["referential"] = [
                referential_check(
                    full, spec["column"], spec["ref_values"],
                    batch_size=self.batch_size,
                )
                for spec in extras["x-referential"]
            ]
        if "x-stats" in extras:
            report["stats"] = self._run_stats(full, extras)
        if "x-drift" in extras and self.drift_profile is not None:
            d = extras["x-drift"]
            verdicts = drift_check(
                self._read(files, with_partition=True),
                self.drift_profile,
                d.get("columns", []),
                partition_col="_partition",
                ks_threshold=d.get("ks_threshold", 0.15),
                batch_size=self.batch_size,
            )
            report["drift"] = verdicts.to_pylist()

        report["valid"] = (
            all(
                (p.get("metrics", {}).get("violation_rows", 0) == 0)
                for p in report["partitions"].values()
            )
            and all(
                u["dup_keys"] == 0
                for u in report.get("uniqueness", [])
                if not u.get("report_only")
            )
            and all(
                r["n_violations"] == 0 for r in report.get("referential", [])
            )
            and all(v["passed"] for v in report.get("drift", []))
        )
        self.manifest.write_job_report(report)
        return report

    def _read(self, files: list[str], with_partition: bool = False):
        cols = self._non_payload_columns(files)
        ds = rd.read_parquet(
            files, columns=cols, include_paths=with_partition
        )
        if with_partition:
            def add_part(batch: pa.Table) -> pa.Table:
                parts = [
                    partition_id_for(p) for p in batch.column("path").to_pylist()
                ]
                return batch.drop_columns(["path"]).append_column(
                    "_partition", pa.array(parts, type=pa.string())
                )

            ds = ds.map_batches(add_part, batch_format="pyarrow",
                                batch_size=self.batch_size)
        return ds

    def _schema_for_rowlocal(self) -> dict[str, Any]:
        """P1 never reads the wide payload column (pruned at the read,
        SURVEY.md §7 hard part 4), so its `required` check moves to the
        decode stage (stages/multimodal.py), which reads the bytes anyway."""
        schema = dict(self.schema)
        payload_cols = {"bytes"}
        if schema.get("required"):
            schema["required"] = [
                r for r in schema["required"] if r not in payload_cols
            ]
        return schema

    def _run_rowlocal(self, todo: list[str]) -> None:
        """P1 over the not-yet-committed shards as ONE streaming job;
        violations written partitioned by shard, manifests committed after
        the run (a killed run just redoes uncommitted shards)."""
        ds = self._read(todo, with_partition=True)
        stage = ValidateBatch(self._schema_for_rowlocal(), mode="violations",
                              key_column=self.key_column)

        def per_batch(batch: pa.Table) -> pa.Table:
            # a batch may coalesce blocks from different shards: evaluate per
            # partition value so violations are attributed to their shard
            import pyarrow.compute as pc

            parts_col = batch.column("_partition").combine_chunks()
            outs = []
            for part_val in pc.unique(parts_col).to_pylist():
                sub = batch.filter(pc.equal(parts_col, part_val))
                vio = stage(sub.drop_columns(["_partition"]))
                outs.append(
                    vio.append_column(
                        "partition",
                        pa.array([part_val] * vio.num_rows, type=pa.string()),
                    )
                )
            if not outs:
                vio = stage(batch.drop_columns(["_partition"]))
                outs = [vio.append_column("partition",
                                          pa.array([], type=pa.string()))]
            return pa.concat_tables(outs)

        vio_dir = os.path.join(self.output_dir, "violations")
        # idempotent re-run: clear this shard's old violation files first
        import shutil

        for f in todo:
            part_dir = os.path.join(vio_dir, f"partition={partition_id_for(f)}")
            shutil.rmtree(part_dir, ignore_errors=True)
        vio_ds = ds.map_batches(per_batch, batch_format="pyarrow",
                                batch_size=self.batch_size,
                                zero_copy_batch=True)
        vio_ds.write_parquet(vio_dir, partition_cols=["partition"])

        import collections

        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        vc: collections.Counter = collections.Counter()
        if os.path.isdir(vio_dir) and any(os.scandir(vio_dir)):
            written = pads.dataset(vio_dir, partitioning="hive")
            tbl = written.to_table(columns=["partition"])
            vc = collections.Counter(
                tbl.column("partition").cast(pa.string()).to_pylist()
            )
        for f in todo:
            pid = partition_id_for(f)
            n_vio = int(vc.get(pid, 0))
            n_rows = pq.ParquetFile(f).metadata.num_rows
            self.manifest.commit_partition(
                pid,
                f,
                metrics={"rows": n_rows, "violation_rows": n_vio},
                violation_files=[os.path.join(vio_dir, f"partition={pid}")],
                verdict=(n_vio == 0),
            )

    def _run_uniqueness(self, full, specs: list[dict]) -> list[dict]:
        out = []
        for spec in specs:
            rep = uniqueness_report(full, spec["column"],
                                    batch_size=self.batch_size)
            rep["report_only"] = bool(spec.get("report_only", False))
            if rep["dup_keys"]:
                rep["top_duplicates"] = top_duplicates(
                    full, spec["column"], k=10, batch_size=self.batch_size
                ).take_all()
            out.append(rep)
        return out

    def _run_stats(self, full, extras: dict) -> dict[str, Any]:
        spec = StatsSpec.from_schema_extras(extras)
        stats = collect_stats(full, spec, batch_size=self.batch_size)
        out = {}
        for (_, col), cs in sorted(stats.items()):
            entry: dict[str, Any] = {
                "count": cs.count, "nulls": cs.nulls,
                "min": cs.min if cs.min is not None else cs.smin,
                "max": cs.max if cs.max is not None else cs.smax,
                "mean": cs.mean,
            }
            if cs.distinct is not None:
                entry["distinct_est"] = cs.distinct
            if cs.digest is not None:
                entry["quantiles"] = {
                    str(q): cs.quantile(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)
                }
            out[col] = entry
        return out
