"""Baseline: a straight, hand-written PySpark port of the reference's
execution pattern, for the SAME workload as bench.py's
``profile_database_scan`` headline (full default profile of every table at
$SPARK_GRAFT_SF_DIR).

This is what a direct translation of the reference would do (and what a
first-pass PySpark implementation typically looks like):

- one Spark job per (column, metric) — no scan sharing across metrics or
  columns (the reference gets per-table fusion only because Deequ's
  AnalysisRunner shares scans internally; a hand translation of
  addTextAnalyzers/addNumericAnalyzers per-analyzer loops does not);
- Distinctness via a per-column ``select(c).distinct().count()`` shuffle;
- tables processed sequentially (Main.scala:192-195 collect loop);
- the publish path's O(columns) ``filter(instance = c).collect()`` round
  trips (Main.scala:214-225).

Same metric set as the engine's default mode: Size; Completeness +
Distinctness per column; Maximum/Minimum/Sum/Mean/StandardDeviation on
numerics; MaxLength/MinLength on text. (Approx sketches excluded on both
sides.) BASELINE.md records the measured number; bench.py's
``profile_database_scan`` must stay within 2x of it — in practice the fused
engine beats this baseline by an order of magnitude, which is the point of
the comparison.

Prints ONE JSON line:
  {"metric": "baseline_database_scan", "value": <sec>, "unit": "sec",
   "jobs": <n_jobs>, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "decimal"}


def main() -> None:
    from pyspark.sql import functions as F

    from bench import build_spark
    from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import load_tables

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, SF_DIR)

    # warmup identical to bench.py so page cache/session startup cancel out
    for df in tables.values():
        df.count()

    jobs = 0
    t0 = time.perf_counter()
    for name, df in tables.items():
        metrics: list[tuple[str, str, str, float | None]] = []

        def one(entity, instance, metric, expr_df):
            nonlocal jobs
            v = expr_df.collect()[0][0]
            jobs += 1
            metrics.append((entity, instance, metric, v))

        one("Dataset", "*", "Size", df.agg(F.count(F.lit(1))))
        for f in df.schema.fields:
            c, t = f.name, f.dataType.simpleString()
            col = F.col(c)
            base = t.split("(")[0]
            if not (base in NUMERIC or base == "string"):
                continue
            one("Column", c, "Completeness",
                df.agg(F.try_divide(F.count(col), F.count(F.lit(1)))))
            # per-column distinct: its own shuffle job
            nn = df.select(col).where(col.isNotNull())
            d = nn.distinct().count()
            n = nn.count()
            jobs += 2
            metrics.append(("Column", c, "Distinctness", d / n if n else None))
            if base in NUMERIC:
                one("Column", c, "Maximum", df.agg(F.max(col)))
                one("Column", c, "Minimum", df.agg(F.min(col)))
                one("Column", c, "Sum", df.agg(F.sum(col.cast("double"))))
                one("Column", c, "Mean", df.agg(F.avg(col.cast("double"))))
                one("Column", c, "StandardDeviation",
                    df.agg(F.stddev_pop(col.cast("double"))))
            else:
                one("Column", c, "MaxLength", df.agg(F.max(F.length(col))))
                one("Column", c, "MinLength", df.agg(F.min(F.length(col))))

        # publish loop: metrics -> DataFrame, then one filter+collect per
        # column (Main.scala:206-225)
        mdf = spark.createDataFrame(
            [(e, i, m, float(v) if v is not None else None)
             for e, i, m, v in metrics],
            "entity string, instance string, name string, value double",
        )
        mdf.select("name", "value").where("entity = 'Dataset'").collect()
        cols_df = mdf.select("instance", "name", "value").where(
            "entity = 'Column'"
        )
        for row in cols_df.select("instance").dropDuplicates().collect():
            cols_df.where(F.col("instance") == row[0]).collect()
            jobs += 1

    elapsed = round(time.perf_counter() - t0, 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "baseline_database_scan",
        "value": elapsed,
        "unit": "sec",
        "jobs": jobs,
        "sf": sf_val,
    }))


if __name__ == "__main__":
    main()
