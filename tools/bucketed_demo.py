"""Measure the bucketed-storage join win at the scaling corpus.

Two 4.8M-point tables (disjoint fid spaces, same finest-tier cell keys) are
written twice: as plain parquet directories and as cell-bucketed catalog
tables (``sources/tables.write_bucketed``).  The big x big candidate
equi-join on `cell` — the first stage of every distance/dedup join the
engine runs between two large layers — is then timed both ways with
broadcast disabled (min-of-N after warmup), and the bucketed plan is
asserted Exchange-free.  At 100 TB this is the difference between
re-shuffling both layers per query and never shuffling either.

    python tools/bucketed_demo.py [replicas] [n_buckets]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from pyspark.sql import functions as F

    from geowave_spark.operators.indexing import with_point_cells
    from geowave_spark.session import get_spark
    from geowave_spark.sources.tables import read_bucketed, write_bucketed

    spark = get_spark("bucketed-demo")
    root = REPO / "data" / "geo" / f"scaling_x{replicas}"
    if not (root / "_DONE").exists():
        raise SystemExit(f"run bench.py --scaling-job once to build {root}")

    work = REPO / "data" / "geo" / f"bucketed_demo_x{replicas}"
    plain_a, plain_b = work / "plain_a", work / "plain_b"
    if not (work / "_DONE").exists():
        if work.exists():
            shutil.rmtree(work)
        # de-alias the replicas: the scaling corpus repeats each sf0.1 point
        # `replicas` times at identical coordinates, which would make every
        # cell key appear 20x per side and the join output (20x20 per key)
        # dwarf the shuffle being measured.  A deterministic per-row jitter
        # (~1e-4 deg, keyed on the already-unique fid) restores the real
        # corpus shape: ~unique cells, ~1:1 join.
        raw = spark.read.parquet(str(root))
        jit = (F.xxhash64("fid") % 100000).cast("double") / 1e9
        raw = raw.withColumn("lon", F.col("lon") + jit).withColumn(
            "lat", F.col("lat") + jit
        )
        pts = with_point_cells(raw).select("fid", "lon", "lat", "cell")
        a = pts
        b = pts.withColumn("fid", F.concat(F.lit("b:"), F.col("fid")))
        a.write.mode("overwrite").parquet(str(plain_a))
        b.write.mode("overwrite").parquet(str(plain_b))
        # bucketed twins built FROM the plain files so both layouts hold
        # byte-identical rows
        write_bucketed(
            spark.read.parquet(str(plain_a)), "bd_a", n_buckets,
            path=str(work / "bk_a"),
        )
        write_bucketed(
            spark.read.parquet(str(plain_b)), "bd_b", n_buckets,
            path=str(work / "bk_b"),
        )
        (work / "_DONE").touch()

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def join_count(a, b) -> tuple[int, object]:
        j = a.join(b, "cell").select(F.count("*").alias("n"))
        return j.collect()[0]["n"], j

    def timed(fn, repeats=3):
        fn()  # warmup
        best = float("inf")
        for _ in range(repeats):
            t0 = time.monotonic()
            n = fn()
            best = min(best, time.monotonic() - t0)
        return n, best

    pa, pb = spark.read.parquet(str(plain_a)), spark.read.parquet(str(plain_b))
    ba, bb = read_bucketed(spark, "bd_a"), read_bucketed(spark, "bd_b")

    plan = (
        ba.join(bb, "cell")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, "bucketed join plan still shuffles:\n" + plan

    n_plain, t_plain = timed(lambda: join_count(pa, pb)[0])
    n_bk, t_bk = timed(lambda: join_count(ba, bb)[0])
    assert n_plain == n_bk, (n_plain, n_bk)

    n_rows = pa.count()
    print(json.dumps({
        "metric": "cell equi-join, 2 x %.1fM rows" % (n_rows / 1e6),
        "replicas": replicas,
        "n_buckets": n_buckets,
        "join_rows": n_plain,
        "plain_sec": round(t_plain, 2),
        "bucketed_sec": round(t_bk, 2),
        "speedup": round(t_plain / t_bk, 2),
        "bucketed_plan_exchange_free": True,
    }))


if __name__ == "__main__":
    main()
