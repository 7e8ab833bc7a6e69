"""Snapshot reconciliation: keyed row diff between two tables.

profile_diff.py diffs METRICS between snapshots; this diffs the ROWS:
which keys were added, removed, or changed between two versions of a
table — the reconciliation primitive behind CDC validation, backfill
verification, and sink idempotency checks.

Semantics: rows pair on the key columns; a paired row is ``changed``
when ANY compared column differs under null-safe inequality
(``IS DISTINCT FROM`` — no fingerprint hashing, so cross-engine value
formatting never enters the comparison), otherwise ``unchanged``.
Keys present on one side only are ``added`` / ``removed``.

Plan shape: ONE full-outer sort-merge join on the key columns — the
minimal plan for a keyed diff; both sides shuffle once on the key, AQE
handles skew/size. The summary aggregates the (tiny) status column.

Scale notes (100 TB): if both snapshots are bucketed/partitioned on the
key, the join co-locates and the diff is shuffle-free; add a partition
predicate (e.g. updated date range) to diff increments instead of full
snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import sql_ident

DIFF_STATUS = ["added", "removed", "changed", "unchanged"]


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key columns..., status) per key seen on either side."""
    if not keys:
        raise ValueError("table_diff: need key columns")
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in keys]
    o = old.alias("o")
    n = new.alias("n")
    cond = None
    for k in keys:
        eq = o[k] == n[k]
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col(f"o.{keys[0]}").isNotNull()
    in_new = F.col(f"n.{keys[0]}").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | F.expr(
            f"o.{sql_ident(c)} IS DISTINCT FROM n.{sql_ident(c)}"
        )
    status = (
        F.when(in_old & ~in_new, F.lit("removed"))
        .when(~in_old & in_new, F.lit("added"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    key_cols = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys
    ]
    return joined.select(*key_cols, status.alias("status"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(status, n) counts — every status present, zero-filled."""
    d = table_diff(old, new, keys, compare_cols)
    counts = d.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
    all_status = d.sparkSession.createDataFrame(
        [(s,) for s in DIFF_STATUS], "status string"
    )
    return (
        all_status.join(counts, "status", "left")
        .select("status", F.coalesce(F.col("n"), F.lit(0)).alias("n"))
    )


def table_diff_sql(
    old_sql: str,
    new_sql: str,
    keys: list[str],
    compare_cols: list[str],
) -> str:
    """DuckDB mirror of table_diff over two snapshot subqueries."""
    on = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    changed = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in compare_cols
    )
    key_sel = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    return f"""
SELECT {key_sel},
  CASE
    WHEN o.{keys[0]} IS NOT NULL AND n.{keys[0]} IS NULL THEN 'removed'
    WHEN o.{keys[0]} IS NULL AND n.{keys[0]} IS NOT NULL THEN 'added'
    WHEN {changed} THEN 'changed'
    ELSE 'unchanged'
  END AS status
FROM ({old_sql}) o FULL OUTER JOIN ({new_sql}) n ON {on}
"""


def diff_summary_sql(
    old_sql: str,
    new_sql: str,
    keys: list[str],
    compare_cols: list[str],
) -> str:
    status_rows = " UNION ALL ".join(
        f"SELECT '{s}' AS status" for s in DIFF_STATUS
    )
    return f"""
WITH d AS ({table_diff_sql(old_sql, new_sql, keys, compare_cols)}),
st AS ({status_rows})
SELECT st.status, COALESCE(c.n, 0) AS n
FROM st LEFT JOIN (SELECT status, count(*) AS n FROM d GROUP BY status) c
ON st.status = c.status
"""


SCHEMA_DIFF_COLS = ["column", "old_type", "new_type", "change"]


def schema_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Schema evolution report between two frames: one row per column in
    either schema with (old_type, new_type, change), change in
    {added, removed, type_changed, unchanged}.

    Pure metadata — no scan of either table is planned; the report is a
    |columns|-sized local DataFrame (the reference reads schemas the same
    way, DataProfilerForAWSGlueDataCatalog.scala:267-270, but only logs them). Pair with
    table_diff (row-level) and profile_diff (metric-level) for the full
    three-layer drift story.
    """
    ot = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    nt = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    rows = []
    for c in sorted(set(ot) | set(nt)):
        o, n = ot.get(c), nt.get(c)
        change = (
            "added" if o is None
            else "removed" if n is None
            else "unchanged" if o == n
            else "type_changed"
        )
        rows.append((c, o, n, change))
    return old.sparkSession.createDataFrame(
        rows, "`column` string, old_type string, new_type string, change string"
    )
