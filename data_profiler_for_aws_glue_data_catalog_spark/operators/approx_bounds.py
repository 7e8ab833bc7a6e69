"""Sketch-accuracy verdict: prove the approx metrics honor their bounds.

The sketch metrics (ApproxCountDistinct via HLL++, ApproxQuantiles via
``percentile_approx``) cannot be hash-compared against a DuckDB oracle —
different engines, different sketch algorithms, legitimately different
estimates. Checking them "rows-only" documents that away; this operator
turns it into a REAL gate instead: compute sketch AND exact reference in
the same Spark job, emit one boolean verdict row per sketch metric, and
let the oracle assert the trivially-expressible truth — every verdict is
TRUE (reference Main.scala:314-348 attaches the sketch analyzers; their
published error envelopes are what we verify):

  - ApproxCountDistinct: |hll - exact| <= max(4*rsd*exact, 10)
    (rsd = config.approx_distinct_rsd, default 0.05 -> a 4-sigma band).
  - ApproxQuantiles-q: the sketch value must lie between the EXACT
    percentiles at q -/+ 2.5/accuracy (GK/KLL guarantee is rank error
    <= 1/accuracy; 2.5x slack absorbs interpolation discretization).
    Small inputs (n < 100) pass by fiat: below the sketch's resolution
    the rank window is narrower than one order statistic.

NaN values are treated as NULL on both the sketch and exact branches
(NaN ordering is engine-defined; the verdict is about sketch accuracy,
not NaN semantics — the float-specials fuzz axis covers those).

Scale note (100 TB): this is a VERIFICATION query — the exact branches
(count(DISTINCT), exact ``percentile``) deliberately pay the full price
the sketches avoid, so run it on samples/partitions at scale, not the
full corpus. The production profile path (scan_metrics_long) carries
only the sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_profiler_for_aws_glue_data_catalog_spark.config import ProfilerConfig
from data_profiler_for_aws_glue_data_catalog_spark.operators import types as T
from data_profiler_for_aws_glue_data_catalog_spark.operators.scan_metrics import (
    quantile_name,
    quantile_points,
)
from data_profiler_for_aws_glue_data_catalog_spark.plans.metrics_frame import sql_ident

APPROX_BOUNDS_COLS = ["entity", "instance", "name", "within_bounds"]

# rank-window half-width as a multiple of 1/accuracy (1.0 is the GK
# guarantee; extra slack covers exact-percentile interpolation landing
# between order statistics)
_RANK_SLACK = 2.5
# below this many non-null values the rank window is narrower than one
# order statistic — the sketch holds all points exactly there anyway
_SMALL_N = 100


def _nan_null(q: str, typ: str) -> str:
    """NaN -> NULL for float/double columns (see module docstring)."""
    if typ in ("float", "double"):
        return f"CASE WHEN isnan({q}) THEN NULL ELSE {q} END"
    return q


def approx_bounds_verdict(
    df: DataFrame, config: ProfilerConfig | None = None
) -> DataFrame:
    """One row per sketch metric of the standard profile surface:
    (entity='Column', instance, name, within_bounds). All-TRUE iff every
    sketch honors its error envelope against the exact value computed in
    the same job."""
    config = config or ProfilerConfig()
    df = T.cast_convertibles(df, config)
    profiled = [
        (f.name, T.classify(f.dataType, config), f.dataType.simpleString())
        for f in df.schema.fields
    ]
    profiled = [(c, k, t) for c, k, t in profiled if k is not None]

    pts = quantile_points(config.n_quantiles)
    eps = _RANK_SLACK / config.quantile_accuracy
    lo_sql = ", ".join(repr(max(p - eps, 0.0)) for p in pts)
    hi_sql = ", ".join(repr(min(p + eps, 1.0)) for p in pts)
    pts_sql = ", ".join(repr(p) for p in pts)

    exprs: list[str] = []       # aggregate expressions (one scan pass)
    verdicts: list[str] = []    # boolean columns over the agg row
    structs: list[str] = []     # final unpivot: simple column refs only,
    #                             so the Generate node stays codegen-small
    for i, (c, kind, typ) in enumerate(profiled):
        q = _nan_null(sql_ident(c), typ)
        lit_c = c.replace("'", "\\'")
        exprs.append(
            f"approx_count_distinct({q}, {config.approx_distinct_rsd!r}) AS a{i}"
        )
        exprs.append(f"count(DISTINCT {q}) AS d{i}")
        hll_ok = (
            f"abs(cast(a{i} AS double) - cast(d{i} AS double)) <= "
            f"greatest({4 * config.approx_distinct_rsd!r} * cast(d{i} AS double), 10.0D)"
        )
        verdicts.append(f"coalesce({hll_ok}, false) AS v{len(verdicts)}")
        structs.append(
            f"struct('Column' AS entity, '{lit_c}' AS instance, "
            f"'ApproxCountDistinct' AS name, v{len(structs)} AS within_bounds)"
        )
        if kind != T.NUMERIC:
            continue
        exprs.append(
            f"percentile_approx({q}, array({pts_sql}), "
            f"{config.quantile_accuracy}) AS pa{i}"
        )
        exprs.append(f"percentile({q}, array({lo_sql})) AS plo{i}")
        exprs.append(f"percentile({q}, array({hi_sql})) AS phi{i}")
        exprs.append(f"count({q}) AS n{i}")
        for j, p in enumerate(pts, start=1):
            v = f"cast(element_at(pa{i}, {j}) AS double)"
            ok = (
                # empty domain: sketch and exact agree there is nothing
                f"(pa{i} IS NULL AND plo{i} IS NULL) OR n{i} < {_SMALL_N} "
                f"OR ({v} >= element_at(plo{i}, {j}) "
                f"AND {v} <= element_at(phi{i}, {j}))"
            )
            verdicts.append(f"coalesce({ok}, false) AS v{len(verdicts)}")
            structs.append(
                f"struct('Column' AS entity, '{lit_c}' AS instance, "
                f"'{quantile_name(p)}' AS name, v{len(structs)} AS within_bounds)"
            )

    row = df.selectExpr(*exprs).selectExpr(*verdicts)
    return row.selectExpr(f"inline(array({', '.join(structs)}))").select(
        *APPROX_BOUNDS_COLS
    )
