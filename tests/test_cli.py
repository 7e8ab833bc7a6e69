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


class _FakeGlueE2E:
    """boto3-glue-shaped fake for the full --region lifecycle: two pages
    of one table each, both resolving to session temp views; records
    every update_table call (Main.scala:164-254 remote path)."""

    def __init__(self):
        self.pages = {None: (["cli_nation"], "p2"), "p2": (["cli_region2"], None)}
        self.tables = {
            n: {
                "Name": n,
                "DatabaseName": "tpch",  # read-only: must be dropped
                "Parameters": {"owner": "team-data"},
                "StorageDescriptor": {"Columns": cols},
            }
            for n, cols in {
                "cli_nation": [
                    {"Name": "n_nationkey", "Type": "bigint"},
                    {"Name": "n_name", "Type": "string"},
                    {"Name": "n_regionkey", "Type": "bigint"},
                    {"Name": "n_comment", "Type": "string"},
                ],
                "cli_region2": [
                    {"Name": "r_regionkey", "Type": "bigint"},
                    {"Name": "r_name", "Type": "string"},
                    {"Name": "r_comment", "Type": "string"},
                ],
            }.items()
        }
        self.updated = {}

    def get_tables(self, DatabaseName, NextToken=None):
        names, nxt = self.pages[NextToken]
        resp = {"TableList": [{"Name": n} for n in names]}
        if nxt:
            resp["NextToken"] = nxt
        return resp

    def get_table(self, DatabaseName, Name):
        return {"Table": self.tables[Name]}

    def update_table(self, DatabaseName, TableInput):
        self.updated[TableInput["Name"]] = (DatabaseName, TableInput)


def test_cli_region_mode_end_to_end(spark, tmp_path):
    """--region lifecycle against the fake Glue client: paginated
    enumerate -> one profile per table -> parameter publish
    (delete-then-upsert TableInput) + Parquet metrics sink."""
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet").createOrReplaceTempView(
        "cli_nation"
    )
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").createOrReplaceTempView(
        "cli_region2"
    )
    fake = _FakeGlueE2E()
    out = str(tmp_path / "metrics")
    rc = run(
        ["--dbName", "tpch", "--region", "eu-west-1", "--outputPrefix", out],
        spark=spark,
        glue_client=fake,
    )
    assert rc == 0
    # both pages of tables were profiled and published
    assert set(fake.updated) == {"cli_nation", "cli_region2"}
    db, ti = fake.updated["cli_nation"]
    assert db == "tpch"
    assert "DatabaseName" not in ti  # read-only field dropped
    assert ti["Parameters"]["owner"] == "team-data"  # user key survives
    assert ti["Parameters"]["DQP__Size"] == "25.0"
    cols = {c["Name"]: c for c in ti["StorageDescriptor"]["Columns"]}
    assert cols["n_name"]["Parameters"]["DQP__Completeness"] == "1.0"
    # parquet sink landed one partition per table
    back = spark.read.parquet(out)
    assert set(
        r["table_name"] for r in back.select("table_name").distinct().collect()
    ) == {"cli_nation", "cli_region2"}
