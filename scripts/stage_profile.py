"""Per-stage CPU/time attribution for one query (r10, guide §1/§7.1).

Usage:
  python scripts/stage_profile.py <query> [reps]

Runs <query> against $SPARK_GRAFT_SF_DIR with the bench's session config
(plus the UI enabled on an ephemeral port) and prints every stage of the
LAST rep sorted by executor CPU: stage id, name (first line), task count,
executorRunTime, executorCpuTime, shuffle read/write bytes, input bytes.
This is the empirical loop of guide §1.1 without needing a live browser.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    import bench
    from pyspark.sql import SparkSession

    builder = SparkSession.builder
    for k, v in bench._engine_session_confs().items():
        builder = builder.config(k, v)
    spark = (
        builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .appName("stage-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import (
        load_tables,
    )

    for df in load_tables(spark, SF_DIR).values():
        df.count()

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def stages_done() -> list[dict]:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    mark = max((s["stageId"] for s in stages_done()), default=-1)
    for rep in range(reps):
        spark.catalog.clearCache()
        if rep == reps - 1:
            mark = max((s["stageId"] for s in stages_done()), default=-1)
        c0 = bench.tree_cpu_seconds()
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        df.count() if df.columns else 0
        print(
            f"{name} rep{rep}: wall={time.perf_counter()-t0:.3f}s "
            f"cpu={bench.tree_cpu_seconds()-c0:.3f}s",
            flush=True,
        )
    rows = [s for s in stages_done() if s["stageId"] > mark]
    rows.sort(key=lambda s: -s.get("executorCpuTime", 0))
    print(
        f"{'stage':>6} {'tasks':>5} {'run_ms':>9} {'cpu_ms':>9} "
        f"{'input':>10} {'sh_read':>10} {'sh_write':>10}  name"
    )
    tot_run = tot_cpu = 0
    for s in rows:
        cpu_ms = s.get("executorCpuTime", 0) / 1e6  # ns -> ms
        run_ms = s.get("executorRunTime", 0)
        tot_run += run_ms
        tot_cpu += cpu_ms
        nm = (s.get("name") or "").split("\n")[0][:70]
        print(
            f"{s['stageId']:>6} {s['numCompleteTasks']:>5} {run_ms:>9.0f} "
            f"{cpu_ms:>9.0f} {s.get('inputBytes', 0):>10} "
            f"{s.get('shuffleReadBytes', 0):>10} "
            f"{s.get('shuffleWriteBytes', 0):>10}  {nm}"
        )
    print(f"TOTAL last-rep stages: run={tot_run/1000:.2f}s cpu={tot_cpu/1000:.2f}s")


if __name__ == "__main__":
    main()
