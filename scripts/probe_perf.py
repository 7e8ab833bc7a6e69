"""Per-query optimization probe (r9): plans + isolated timings.

Usage:
  python scripts/probe_perf.py explain <out_suffix> <query> [query ...]
      Dump .explain("formatted") for each query to plans/r10/<query>_<out_suffix>.txt
      (no execution — driver-side only).
  python scripts/probe_perf.py time <reps> <query> [query ...]
      Run each query <reps> times against $SPARK_GRAFT_SF_DIR (default
      sf0.1) with the bench's exact session config, timing the SAME action
      the bench times (df.count()) plus a noop-sink sample, and print
      wall/process-tree-CPU per rep.

The session config mirrors bench.py exactly so measured numbers are
comparable with BENCH_DETAIL files.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark():
    import bench
    from pyspark.sql import SparkSession

    builder = SparkSession.builder
    for k, v in bench._engine_session_confs().items():
        builder = builder.config(k, v)
    return (
        builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .appName("r9-probe")
        .getOrCreate()
    )


def main() -> None:
    mode = sys.argv[1]
    import bench  # for tree_cpu_seconds

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()

    if mode == "explain":
        suffix = sys.argv[2]
        names = sys.argv[3:]
        os.makedirs("/root/repo/plans/r10", exist_ok=True)
        for n in names:
            df = qs[n](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"/root/repo/plans/r10/{n}_{suffix}.txt", "w") as f:
                f.write(txt)
            print(f"wrote plans/r10/{n}_{suffix}.txt ({len(txt)} bytes)")
        return

    if mode == "time":
        reps = int(sys.argv[2])
        names = sys.argv[3:]
        from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import (
            load_tables,
        )

        for df in load_tables(spark, SF_DIR).values():
            df.count()
        for n in names:
            for r in range(reps):
                spark.catalog.clearCache()
                c0 = bench.tree_cpu_seconds()
                t0 = time.perf_counter()
                df = qs[n](spark, SF_DIR)
                df.count() if df.columns else 0
                wall = time.perf_counter() - t0
                cpu = bench.tree_cpu_seconds() - c0
                print(f"{n} rep{r}: wall={wall:.3f}s cpu={cpu:.3f}s", flush=True)
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
