from __future__ import annotations

import json

from data_profiler_for_aws_glue_data_catalog_spark.cli import run


def test_cli_local_catalog_and_sinks(spark, tmp_path):
    df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    df.createOrReplaceTempView("cli_region")
    out = str(tmp_path / "metrics")
    cat_path = str(tmp_path / "catalog.json")
    rc = run(
        [
            "--dbName", "default",
            "--statsPrefix", "DQP",
            "--outputPrefix", out,
            "--catalogJson", cat_path,
        ],
        spark=spark,
    )
    assert rc == 0
    # parquet sink landed partitioned metrics for the temp view
    back = spark.read.parquet(out)
    assert back.where("table_name = 'cli_region'").count() > 0
    # local catalog got the delete-then-upsert parameters
    raw = json.load(open(cat_path))
    entry = raw["default"]["cli_region"]
    assert entry["parameters"]["DQP__Size"] == "5.0"
    assert entry["column_parameters"]["r_regionkey"]["DQP__Completeness"] == "1.0"
