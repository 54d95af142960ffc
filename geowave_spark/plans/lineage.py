"""Checkpointed lineage: resumable multi-stage pipelines with per-partition
row counters.

The reference chains MapReduce jobs whose inputs/outputs are GeoWave tables
or HDFS sequence files — i.e. every analytic stage is durably checkpointed
and a failed run restarts from the last completed job
(`analytics/mapreduce/.../MapReduceJobController.java`, SURVEY.md §3.3), and
its ingest path transactionally updates row-count statistics per write
(`StatsCompositionTool.java`, A11).  This module is the Spark analog:

- each stage writes deterministic parquet under ``<root>/<stage>/`` and an
  atomic ``_manifest.json`` (rename-committed) recording the stage config
  fingerprint, total + per-partition row counts, schema, and wall time;
- per-partition counters come from the parquet footers (zero extra Spark
  jobs — one metadata read per file, the analog of per-tablet counts);
- on re-run, a stage whose manifest exists with a matching fingerprint is
  skipped and its checkpoint is read back — the pipeline resumes mid-flight;
  a changed fingerprint invalidates the stage and everything downstream.

At cluster scale the same layout works on any shared filesystem/object store
(manifest rename is the commit point; stage writes are idempotent because
the output path is deterministic and overwritten atomically-enough via a
fresh temp dir + rename).
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_manifest.json"


def _fingerprint(obj) -> str:
    import hashlib

    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def partition_counters(path: Path) -> dict[str, int]:
    """Per-partition (per-file) row counts from parquet footers, recursing
    into hive-style partition directories (stages written with partition_by
    put files under ``key=value/`` subtrees); keys are paths relative to the
    stage root so nested partitions stay distinguishable."""
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for f in sorted(path.rglob("*.parquet")):
        out[str(f.relative_to(path))] = pq.read_metadata(f).num_rows
    return out


@dataclass
class StageResult:
    name: str
    path: Path
    rows: int
    partitions: dict[str, int]
    skipped: bool
    wall_s: float


@dataclass
class Pipeline:
    """A named, resumable chain of DataFrame stages.

    >>> pipe = Pipeline(spark, root="/data/checkpoints/run1")
    >>> docs = pipe.stage("extract", config, lambda: with_geometry(raw))
    >>> joined = pipe.stage("pip", cfg2, lambda: pip_join(docs, zones))
    """

    spark: SparkSession
    root: str | Path
    results: list[StageResult] = field(default_factory=list)
    # set once any stage rebuilds: every later stage in invocation order
    # depends on it and must rebuild too, whatever its own manifest says
    _dirty: bool = False

    def stage(
        self,
        name: str,
        config: dict,
        build: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
    ) -> DataFrame:
        root = Path(self.root)
        out_dir = root / name
        mpath = out_dir / MANIFEST
        fp = _fingerprint({"name": name, "config": config})
        t0 = time.perf_counter()
        if not self._dirty and mpath.exists():
            m = json.loads(mpath.read_text())
            if m.get("fingerprint") == fp:
                self.results.append(
                    StageResult(
                        name, out_dir, m["rows"], m["partitions"], True, 0.0
                    )
                )
                return self.spark.read.parquet(str(out_dir))
        self._dirty = True  # this stage (and all downstream) rebuilds
        df = build()
        tmp = root / f"_tmp_{name}_{int(time.time() * 1000)}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(tmp))
        if out_dir.exists():
            shutil.rmtree(out_dir)
        tmp.rename(out_dir)
        parts = partition_counters(out_dir)
        rows = sum(parts.values())
        wall = time.perf_counter() - t0
        manifest = {
            "fingerprint": fp,
            "name": name,
            "config": config,
            "rows": rows,
            "partitions": parts,
            "schema": df.schema.simpleString(),
            "wall_s": round(wall, 3),
            "committed_at": time.time(),
        }
        tmp_m = out_dir / (MANIFEST + ".tmp")
        tmp_m.write_text(json.dumps(manifest, indent=1, default=str))
        tmp_m.rename(mpath)  # commit point
        self.results.append(StageResult(name, out_dir, rows, parts, False, wall))
        return self.spark.read.parquet(str(out_dir))

    def summary(self) -> list[dict]:
        return [
            {
                "stage": r.name,
                "rows": r.rows,
                "n_partitions": len(r.partitions),
                "skipped": r.skipped,
                "wall_s": round(r.wall_s, 3),
            }
            for r in self.results
        ]
