"""Scan-shareable metrics: ONE fused aggregation pass per table.

This reproduces the single real optimization in the reference stack — Deequ's
AnalysisRunner groups all "scan-shareable" analyzers into one aggregation
job (invoked at DataProfilerForAWSGlueDataCatalog.scala:295) — but natively:
we build every per-column aggregate expression up front and hand Catalyst a
single ``df.agg(*exprs)``. Spark plans it as partial HashAggregate on the
scan -> single-row exchange -> final aggregate, i.e. one pass over the data
regardless of column count, inside whole-stage codegen.

Metrics computed here (SURVEY.md §2.A):
  dataset: Size (#1)
  text + numeric: Completeness (#2), ApproxCountDistinct (#3, HLL++)
  text: MaxLength (#5), MinLength (#6)
  numeric: ApproxQuantiles (#12, KLL/GK sketch via percentile_approx),
           Maximum (#13), Mean (#14), Minimum (#15),
           StandardDeviation (#16, POPULATION stddev — Deequ parity),
           Sum (#17)

Determinism contract
--------------------
Double aggregation order in a distributed engine depends on partitioning, so
naive SUM/AVG/STDDEV over doubles is not reproducible run-to-run (nor
comparable against an external oracle). We therefore compute Sum / Mean /
StandardDeviation through EXACT decimal accumulation (values rounded to 6
decimal places, sums exact and associative), then convert the exact sums to
double and finish the arithmetic in a fixed expression shape. Re-running the
profiler on the same data yields bit-identical metrics at any partition
count — and matches an ANSI-SQL oracle computing the same expressions.
Cost: decimal aggregation is ~1.5-2x a double sum on the agg side; the scan
still dominates wall-clock for wide tables.

Scale notes (100 TB)
--------------------
- One job per ~64 columns (``max_fused_columns_per_pass``): hundreds of
  columns x ~10 aggregate expressions each stresses whole-stage codegen;
  batching keeps each job inside codegen limits. Each batch is still a
  full-scan single-pass agg.
- The agg is all map-side partial work + one single-row exchange — no
  data-volume shuffle at all. The scan is the cost; column pruning is
  irrelevant here (the profiler reads every profiled column by design).
- Sketches (HLL++, percentile_approx) keep per-column state bounded
  (~1.5 KB and ~accuracy entries respectively) so driver/executor memory is
  O(columns), independent of rows.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType, NumericType

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators import types as T
from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import (
    METRIC_COLS,
    metric_struct,
)

# Exact accumulation types: values are rounded to 6 decimal places on cast,
# sums stay exact (decimal add is associative -> partition-order invariant).
SUM_DECIMAL = "decimal(27,6)"  # sum fits decimal(37,6): ~1e31 headroom
SQ_DECIMAL = "decimal(18,6)"  # squares -> decimal(37,12), sum decimal(38,12)

# Value-domain guards for the exact-decimal paths. Inputs are try_cast so a
# value outside the decimal domain yields NULL instead of an ANSI error; the
# guard predicate (computed from max(abs(c)) IN THE SAME PASS) switches the
# finished metric to a plain-double fallback whenever any value is out of
# range. Inside the domain the decimal branch is bit-reproducible at any
# partitioning; outside it the fallback is standard IEEE aggregation
# (correct, but last-ulp partition-order dependent) — documented tradeoff.
SUM_GUARD = 1e21  # decimal(27,6) integral headroom
SQ_GUARD = 1e12  # decimal(18,6) integral headroom (squares)


@dataclass
class _Batch:
    """One fused-agg job: aliased agg expressions + row->structs builders."""

    exprs: list[Column] = field(default_factory=list)
    builders: list[Callable[[], list[Column]]] = field(default_factory=list)
    _n: int = 0

    def alias(self) -> str:
        self._n += 1
        return f"m{self._n}"

    def add(self, expr: Column, make_structs: Callable[[str], list[Column]]) -> None:
        a = self.alias()
        self.exprs.append(expr.alias(a))
        self.builders.append(lambda a=a: make_structs(a))


def _in_domain(c: str, limit: float) -> Column:
    # NULL max (all-null column) -> NULL predicate -> fallback branch,
    # which also returns NULL there. Coalesce keeps intent explicit.
    return F.coalesce(F.max(F.abs(F.col(c))) < F.lit(limit), F.lit(False))


def _deterministic_sum(c: str) -> Column:
    dec = F.sum(F.col(c).try_cast(SUM_DECIMAL)).cast("double")
    return F.when(_in_domain(c, SUM_GUARD), dec).otherwise(
        F.sum(F.col(c).cast("double"))
    )


def _mean_expr(c: str) -> Column:
    # try_divide: NULL (not an ANSI error) when the column is all-null/empty
    dec = F.try_divide(
        F.sum(F.col(c).try_cast(SUM_DECIMAL)).cast("double"), F.count(F.col(c))
    )
    return F.when(_in_domain(c, SUM_GUARD), dec).otherwise(
        F.avg(F.col(c).cast("double"))
    )


def _stddev_pop_expr(c: str) -> Column:
    """Population stddev from exact decimal moments, fixed expression shape.

    var = (sum(x^2) - sum(x)^2 / n) / n over the 6-dp-rounded values; both
    moments are exact decimals, the finishing arithmetic is a handful of
    IEEE ops -> deterministic. Deequ parity: POPULATION variance
    (NOT Spark's sample-stddev default). Values beyond the decimal domain
    (|x| >= 1e12) switch to the IEEE stddev_pop fallback — see SQ_GUARD.
    """
    xd = F.col(c).try_cast(SQ_DECIMAL)
    # sx is the SAME expression tree as _deterministic_sum's decimal branch,
    # so Catalyst dedups the two into one aggregate buffer (same value: both
    # round the input to 6 dp before the exact sum).
    sx = F.sum(F.col(c).try_cast(SUM_DECIMAL)).cast("double")
    sx2 = F.sum(xd * xd).cast("double")
    n = F.count(F.col(c)).cast("double")
    var = F.try_divide(sx2 - F.try_divide(sx * sx, n), n)
    dec = F.when(n > 0, F.sqrt(F.greatest(var, F.lit(0.0))))
    return F.when(_in_domain(c, SQ_GUARD), dec).otherwise(
        F.stddev_pop(F.col(c).cast("double"))
    )


def quantile_points(n_quantiles: int) -> list[float]:
    """i/q for i=1..q — includes 1.0, excludes 0.0 (Main.scala:335-337)."""
    return [i / n_quantiles for i in range(1, n_quantiles + 1)]


def quantile_name(p: float) -> str:
    # repr() gives the shortest round-trip form: '0.1' ... '1.0', matching
    # Deequ's Scala Double.toString naming (ApproxQuantiles-0.1 ... -1.0).
    return f"ApproxQuantiles-{p!r}"


def scan_metrics_long(
    df: DataFrame,
    config: ProfilerConfig | None = None,
    include_approx: bool = True,
    include_size: bool = True,
) -> DataFrame:
    """All scan-shareable metrics for every profilable column, as the long
    metrics relation, planned as ceil(columns/64) full-scan agg jobs.

    ``include_approx=False`` drops the sketch metrics (ApproxCountDistinct,
    ApproxQuantiles) — used by the oracle-checked correctness queries, since
    sketches are compared with tolerance, not hash equality.
    """
    config = config or ProfilerConfig()
    df = T.cast_convertibles(df, config)

    profiled = [
        (f.name, T.classify(f.dataType, config), f.dataType.simpleString())
        for f in df.schema.fields
    ]
    profiled = [(c, k, t) for c, k, t in profiled if k is not None]

    # Sketch aggregates (HLL++, percentile) are TypedImperativeAggregates:
    # one in a pass forces the WHOLE pass onto ObjectHashAggregateExec,
    # kicking every cheap codegen'd sum/min/max out of whole-stage codegen.
    # They get their own scan pass instead — two fast scans beat one slow one.
    # Exact count-distincts (for Distinctness — reference parity: emitted for
    # EVERY profiled column in every mode, addTextAnalyzers/addNumericAnalyzers
    # in Main.scala:314-348) also get their own pass: Spark plans multi-column
    # distinct aggregation with an Expand (one duplicated row per distinct
    # column), and mixing that into the cheap pass would multiply ITS input
    # too. One Expand pass for C columns still beats the reference's C
    # separate frequency jobs: one scan, one shuffle of per-partition
    # distinct values.
    batches: list[_Batch] = [_Batch()]
    sketch_batches: list[_Batch] = [_Batch()]
    distinct_batches: list[_Batch] = [_Batch()]
    if include_size:
        batches[0].add(
            F.count(F.lit(1)),
            lambda a: [metric_struct("Dataset", "*", "Size", F.col(a), None)],
        )

    per_batch = max(1, config.max_fused_columns_per_pass)
    for i, (c, kind, typ) in enumerate(profiled):
        if i and i % per_batch == 0:
            batches.append(_Batch())
            sketch_batches.append(_Batch())
            distinct_batches.append(_Batch())
        b = batches[-1]
        sb = sketch_batches[-1]
        db = distinct_batches[-1]
        col = F.col(c)

        def m(name: str, col_name=c, col_type=typ):
            def make(a: str, name=name):
                return [metric_struct("Column", col_name, name, F.col(a), col_type)]

            return make

        b.add(F.try_divide(F.count(col), F.count(F.lit(1))), m("Completeness"))
        # Distinctness = exact distinct non-null / non-null rows (Deequ's
        # frequency-table d/n), emitted for every profiled column in every
        # mode — reference parity (Main.scala:318,342).
        db.add(
            F.try_divide(F.count_distinct(col).cast("double"), F.count(col)),
            m("Distinctness"),
        )
        if include_approx:
            sb.add(
                F.approx_count_distinct(col, rsd=config.approx_distinct_rsd),
                m("ApproxCountDistinct"),
            )
        if kind == T.NUMERIC:
            b.add(F.max(col), m("Maximum"))
            b.add(F.min(col), m("Minimum"))
            b.add(_deterministic_sum(c), m("Sum"))
            b.add(_mean_expr(c), m("Mean"))
            b.add(_stddev_pop_expr(c), m("StandardDeviation"))
            if include_approx:
                pts = quantile_points(config.n_quantiles)
                sb.add(
                    F.percentile_approx(col, pts, config.quantile_accuracy),
                    lambda a, col_name=c, col_type=typ, pts=pts: [
                        metric_struct(
                            "Column",
                            col_name,
                            quantile_name(p),
                            F.element_at(F.col(a), i + 1),
                            col_type,
                        )
                        for i, p in enumerate(pts)
                    ],
                )
        else:  # text (and convertibles already cast to string)
            b.add(F.max(F.length(col)), m("MaxLength"))
            b.add(F.min(F.length(col)), m("MinLength"))
    batches += sketch_batches + distinct_batches

    parts: list[DataFrame] = []
    for b in batches:
        if not b.exprs:
            continue
        row = df.agg(*b.exprs)
        structs = [s for make in b.builders for s in make()]
        parts.append(
            row.select(F.explode(F.array(*structs)).alias("kv")).select("kv.*")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(*METRIC_COLS)
