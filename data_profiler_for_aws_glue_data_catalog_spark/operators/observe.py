"""Zero-extra-scan profiling via the Observation API (SURVEY.md §4.3a).

``attach_scan_observation`` instruments a DataFrame so the scan-shareable
metrics are collected as a SIDE EFFECT of whatever action the caller runs
next — a sink write, an export, a downstream aggregation. At 100 TB the
dominant cost of profiling is the table scan itself; a pipeline that is
already scanning the table to move it gets the profile for free instead of
paying a second full scan.

Mechanics: ``df.observe(Observation, *agg_exprs)`` plants a CollectMetrics
node; executors accumulate the aggregates during the job and ship one tiny
metrics row to the driver when the first action on the observed frame
finishes. No extra job, no shuffle — the aggregation is purely accumulative
(the same partial-aggregate expressions the fused scan pass uses).

Covered metrics: Size, Completeness, Min/MaxLength, Maximum/Minimum/Sum/
Mean/StandardDeviation, ApproxCountDistinct, ApproxQuantiles — i.e. the
whole fused-scan surface of ``scan_metrics_long``. NOT covered (Spark
restriction: observed expressions cannot contain DISTINCT aggregates, and
frequency metrics need a groupBy shuffle): Distinctness, CountDistinct,
Entropy, Histogram, Uniqueness, UniqueValueRatio — run the frequency pass
for those; they are gated behind compute_expensive in the reference anyway
(README:58).

The observed expression list is the same SQL-string assembly as the fused
scan pass (one parse call, no per-expression py4j traffic); values return
to Python already aggregated, and the long metrics relation is built from
them as one tiny local DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators import types as T
from data_profiler_for_aws_glue_data_catalog_spark.operators.scan_metrics import (
    _det_sum_sql,
    _mean_sql,
    _stddev_pop_sql,
    quantile_name,
    quantile_points,
)
from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import (
    METRICS_SCHEMA,
    sql_ident,
)

Row = tuple  # (entity, instance, name, value, type)


@dataclass
class ScanObservation:
    """Handle returned by :func:`attach_scan_observation`.

    After the caller runs ANY action on the observed DataFrame, call
    :meth:`metrics` to get the long metrics relation. ``Observation.get``
    blocks until the action's metrics arrive, so no extra synchronization
    is needed.
    """

    observation: Observation
    _finishers: list[Callable[[dict], list[Row]]] = field(default_factory=list)

    def metrics(self, spark: SparkSession) -> DataFrame:
        got = self.observation.get
        rows = [r for fin in self._finishers for r in fin(got)]
        return spark.createDataFrame(rows, METRICS_SCHEMA)


def _f(v) -> float | None:
    return None if v is None else float(v)


def attach_scan_observation(
    df: DataFrame,
    config: ProfilerConfig | None = None,
    include_approx: bool = True,
) -> tuple[DataFrame, ScanObservation]:
    """(observed_df, handle): run your own action on observed_df, then read
    ``handle.metrics(spark)``.

    The returned frame is ``df`` plus a CollectMetrics node — same rows,
    same schema, same plan underneath; chain your write/transform on it.
    """
    config = config or ProfilerConfig()
    df = T.cast_convertibles(df, config)

    profiled = [
        (f.name, T.classify(f.dataType, config), f.dataType.simpleString())
        for f in df.schema.fields
    ]
    profiled = [(c, k, t) for c, k, t in profiled if k is not None]

    exprs: list[str] = []
    finishers: list[Callable[[dict], list[Row]]] = []
    n = 0

    def add(expr: str, fin: Callable[[dict, str], list[Row]]) -> None:
        nonlocal n
        n += 1
        a = f"m{n}"
        exprs.append(f"({expr}) AS {a}")
        finishers.append(lambda got, a=a, fin=fin: fin(got, a))

    def scalar(col: str, name: str, typ: str) -> Callable[[dict, str], list[Row]]:
        return lambda got, a: [("Column", col, name, _f(got[a]), typ)]

    add("count(1)", lambda got, a: [("Dataset", "*", "Size", _f(got[a]), None)])
    for c, kind, typ in profiled:
        q = sql_ident(c)
        add(f"try_divide(count({q}), count(1))", scalar(c, "Completeness", typ))
        if include_approx:
            add(
                f"approx_count_distinct({q}, {config.approx_distinct_rsd!r})",
                scalar(c, "ApproxCountDistinct", typ),
            )
        if kind == T.NUMERIC:
            add(f"max({q})", scalar(c, "Maximum", typ))
            add(f"min({q})", scalar(c, "Minimum", typ))
            add(_det_sum_sql(q), scalar(c, "Sum", typ))
            add(_mean_sql(q), scalar(c, "Mean", typ))
            add(_stddev_pop_sql(q), scalar(c, "StandardDeviation", typ))
            if include_approx:
                pts = quantile_points(config.n_quantiles)
                pts_sql = ", ".join(repr(p) for p in pts)

                def qfin(got, a, col=c, typ=typ, pts=pts):
                    arr = got[a]
                    return [
                        (
                            "Column",
                            col,
                            quantile_name(p),
                            _f(None if arr is None else arr[i]),
                            typ,
                        )
                        for i, p in enumerate(pts)
                    ]

                add(
                    f"percentile_approx({q}, array({pts_sql}), "
                    f"{config.quantile_accuracy})",
                    qfin,
                )
        else:
            add(f"max(length({q}))", scalar(c, "MaxLength", typ))
            add(f"min(length({q}))", scalar(c, "MinLength", typ))

    obs = Observation()
    observed = df.observe(obs, *[F.expr(e) for e in exprs])
    return observed, ScanObservation(obs, finishers)
