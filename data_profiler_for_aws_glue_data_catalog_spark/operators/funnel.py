"""Ordered funnel analysis over event streams.

"How many users did view -> click -> purchase, in order?" — the funnel
primitive behind conversion analytics. First-match semantics: step k
matches its entity's EARLIEST event of that type occurring STRICTLY
after the step k-1 match (ties in timestamp do not advance the
funnel — the contract is strictly-increasing match times).

Plan shape: ONE ``groupBy(entity)`` — each entity's (ts, type) events
collect into an array, sort once, and a single ``aggregate`` fold walks
the sorted sequence with a (stage, last_ts) struct accumulator. All
built-in array functions inside codegen: no UDF and no per-step
self-join (the naive k-step formulation is k-1 joins) — one shuffle
total. Per-entity state is that entity's event list — bounded by
per-entity activity, the same assumption sessionization makes; cap
with a time-range filter for pathological entities.

The DuckDB mirror proves the semantics a second way: staged CTEs, each
step the min event time strictly after the previous step's join —
identical first-match results, so the fold is cross-checked against
the relational formulation rather than a re-encoding of itself.

``funnel`` emits per entity the deepest stage reached;
``funnel_summary`` per-stage survivor counts + conversion ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import sql_str

ROUND6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

_MIN_LONG = "-9223372036854775807"

FUNNEL_COLS = ["entity_id", "stages_reached"]


def funnel(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(entity_id, stages_reached) per entity with >= 1 event."""
    if not steps:
        raise ValueError("funnel: need at least one step")
    evs = (
        f"array_sort(collect_list(named_struct("
        f"'ts', cast({ts_col} AS long), 'tp', {type_col})))"
    )
    arms = " ".join(
        f"WHEN acc.k = {k} AND e.tp = {sql_str(s)} AND e.ts > acc.t "
        f"THEN named_struct('k', {k + 1}, 't', e.ts)"
        for k, s in enumerate(steps)
    )
    fold = (
        f"aggregate(evs, "
        f"named_struct('k', 0, 't', cast({_MIN_LONG} AS long)), "
        f"(acc, e) -> CASE {arms} ELSE acc END).k"
    )
    grouped = events.groupBy(
        F.col(entity_col).alias("entity_id")
    ).agg(F.expr(evs).alias("evs"))
    return grouped.selectExpr(
        "entity_id", f"{fold} AS stages_reached"
    ).select(*FUNNEL_COLS)


SUMMARY_COLS = ["stage", "step", "n_entities", "conversion"]


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per stage k (1-based): entities reaching >= k + conversion vs the
    total entity count."""
    f = funnel(events, steps, entity_col, ts_col, type_col)
    agg = f.selectExpr(
        "count(1) AS n_total",
        *[
            f"count(CASE WHEN stages_reached >= {k + 1} THEN 1 END) AS s_{k}"
            for k in range(len(steps))
        ],
    )
    structs = []
    for k, s in enumerate(steps):
        conv = f"cast(s_{k} AS double) / cast(n_total AS double)"
        structs.append(
            f"named_struct('stage', {k + 1}, 'step', {sql_str(s)}, "
            f"'n_entities', s_{k}, "
            f"'conversion', cast({ROUND6.format(x=conv)} AS double))"
        )
    return agg.selectExpr(
        f"inline(array({', '.join(structs)}))"
    ).select(*SUMMARY_COLS)


def _staged_ctes(
    table: str,
    steps: list[str],
    entity_col: str,
    ts_col: str,
    type_col: str,
) -> str:
    """ev + m1..mK CTE bodies: mK = each entity's step-k match time."""
    ctes = [
        f"ev AS (SELECT {entity_col} AS u, "
        f"CAST(floor(epoch({ts_col})) AS BIGINT) AS t, "
        f"{type_col} AS tp FROM {table})"
    ]
    for k, s in enumerate(steps, start=1):
        if k == 1:
            ctes.append(
                f"m1 AS (SELECT u, MIN(t) AS t FROM ev "
                f"WHERE tp = '{s}' GROUP BY u)"
            )
        else:
            ctes.append(
                f"m{k} AS (SELECT ev.u, MIN(ev.t) AS t "
                f"FROM ev JOIN m{k - 1} ON ev.u = m{k - 1}.u "
                f"WHERE ev.tp = '{s}' AND ev.t > m{k - 1}.t GROUP BY ev.u)"
            )
    return ",\n".join(ctes)


def funnel_sql(
    table: str,
    steps: list[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    """DuckDB mirror via the staged relational formulation."""
    stage_expr = "CASE " + " ".join(
        f"WHEN m{k}.u IS NOT NULL THEN {k}"
        for k in range(len(steps), 0, -1)
    ) + " ELSE 0 END"
    joins = " ".join(
        f"LEFT JOIN m{k} ON e.u = m{k}.u" for k in range(1, len(steps) + 1)
    )
    return f"""
WITH {_staged_ctes(table, steps, entity_col, ts_col, type_col)}
SELECT e.u AS entity_id, {stage_expr} AS stages_reached
FROM (SELECT DISTINCT u FROM ev) e {joins}
"""


def funnel_summary_sql(
    table: str,
    steps: list[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> str:
    sel = ", ".join(
        f"count(CASE WHEN stages_reached >= {k + 1} THEN 1 END) AS s_{k}"
        for k in range(len(steps))
    )
    parts = []
    for k, s in enumerate(steps):
        conv = f"CAST(s_{k} AS DOUBLE) / CAST(n_total AS DOUBLE)"
        parts.append(
            f"SELECT {k + 1} AS stage, '{s}' AS step, s_{k} AS n_entities, "
            f"CAST({ROUND6.format(x=conv)} AS DOUBLE) AS conversion FROM a"
        )
    return f"""
WITH f AS ({funnel_sql(table, steps, entity_col, ts_col, type_col)}),
a AS (SELECT count(*) AS n_total, {sel} FROM f)
{" UNION ALL ".join(parts)}
"""
