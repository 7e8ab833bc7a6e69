"""Pairwise Pearson correlation matrix — ONE fused aggregation pass.

Deequ ships a two-column Correlation analyzer (public API; the reference
app never wires it). This operator computes the full upper-triangle
correlation matrix of a table's numeric columns in a single scan: for
every pair the six moment aggregates (pairwise-complete n, sum x, sum y,
sum xy, sum x^2, sum y^2) are emitted as conditional aggregate
expressions into one ``df.agg`` — O(pairs) expressions, O(1) passes,
map-side partials + a single-row exchange, exactly the scan_metrics
fusion shape.

Pairwise-complete semantics: a row contributes to (a, b) only when BOTH
are non-null (matches ``corr`` in SQL engines and pandas
``df.corr(min_periods=...)`` pairwise deletion).

Determinism contract: moments accumulate as exact decimals over values
cast to decimal(18,6) (scan_metrics policy, per-pair IEEE fallback
outside the |v| < 1e12 domain); the finishing expression

    corr = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2))

is a fixed double shape, 6-dp floor-rounded — the DuckDB mirror
(``correlation_sql``) reproduces it term-by-term (decimal(19,6) on the
DuckDB side forces the int128 multiply kernel; same values).

Scale notes (100 TB): column count is the knob — P pairs cost ~6P
aggregate buffers per task. ~30 columns (~435 pairs) stays comfortable;
beyond that, batch the pair list across several passes (the
max_fused_columns_per_pass pattern) — still O(batches) scans,
never O(pairs) jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

ROUND6 = "floor(({x}) * 1000000.0 + 0.5) / 1000000.0"

CORR_COLS = ["col_a", "col_b", "n_pairs", "corr"]


def _terms(a: str, b: str, dec: str, cast: str) -> dict[str, str]:
    both = f"({a} IS NOT NULL AND {b} IS NOT NULL)"
    xa = f"{cast}({a} AS {dec})"
    xb = f"{cast}({b} AS {dec})"
    return {
        "n": f"sum(CASE WHEN {both} THEN 1 ELSE 0 END)",
        "sx": f"sum(CASE WHEN {both} THEN {xa} END)",
        "sy": f"sum(CASE WHEN {both} THEN {xb} END)",
        "sxy": f"sum(CASE WHEN {both} THEN {xa} * {xb} END)",
        "sxx": f"sum(CASE WHEN {both} THEN {xa} * {xa} END)",
        "syy": f"sum(CASE WHEN {both} THEN {xb} * {xb} END)",
        "dom": (
            f"coalesce(max(CASE WHEN {both} THEN "
            f"greatest(abs({a}), abs({b})) END) < 1e12, false)"
        ),
        # IEEE fallback (|v| >= 1e12): everything in double — bigint
        # products would overflow (an error under ANSI mode)
        "nsx": f"sum(CASE WHEN {both} THEN {cast}({a} AS double) END)",
        "nsy": f"sum(CASE WHEN {both} THEN {cast}({b} AS double) END)",
        "nsxy": (
            f"sum(CASE WHEN {both} THEN "
            f"{cast}({a} AS double) * {cast}({b} AS double) END)"
        ),
        "nsxx": (
            f"sum(CASE WHEN {both} THEN "
            f"{cast}({a} AS double) * {cast}({a} AS double) END)"
        ),
        "nsyy": (
            f"sum(CASE WHEN {both} THEN "
            f"{cast}({b} AS double) * {cast}({b} AS double) END)"
        ),
    }


def _finish(p: str) -> tuple[str, str]:
    """(n_pairs_sql, corr_sql) over aliased moments for pair prefix p."""
    n = f"cast({p}_n AS double)"
    cov = f"({n} * {p}_sxy - {p}_sx * {p}_sy)"
    vx = f"({n} * {p}_sxx - {p}_sx * {p}_sx)"
    vy = f"({n} * {p}_syy - {p}_sy * {p}_sy)"
    den = f"(sqrt(greatest({vx}, 0.0D)) * sqrt(greatest({vy}, 0.0D)))"
    corr = f"try_divide({cov}, nullif({den}, 0.0D))"
    return n, corr


def correlation_matrix(df: DataFrame, columns: list[str]) -> DataFrame:
    """Upper-triangle Pearson correlations: (col_a, col_b, n_pairs, corr);
    corr is NULL for degenerate pairs (constant column / n < 2)."""
    pairs = [
        (columns[i], columns[j])
        for i in range(len(columns))
        for j in range(i + 1, len(columns))
    ]
    if not pairs:
        raise ValueError("correlation_matrix: need at least 2 columns")
    exprs: list[str] = []
    for k, (a, b) in enumerate(pairs):
        t = _terms(a, b, "decimal(18,6)", "try_cast")
        for key in ("n", "dom"):
            exprs.append(f"({t[key]}) AS p{k}_{key}")
        for key in ("sx", "sy", "sxy", "sxx", "syy"):
            exprs.append(
                f"(CASE WHEN ({t['dom']}) THEN cast({t[key]} AS double) "
                f"ELSE {t['n' + key]} END) AS p{k}_{key}"
            )
    row = df.selectExpr(*exprs)
    structs = []
    for k, (a, b) in enumerate(pairs):
        n, corr = _finish(f"p{k}")
        structs.append(
            "named_struct("
            f"'col_a', '{a}', 'col_b', '{b}', "
            f"'n_pairs', cast({n} AS bigint), "
            f"'corr', cast({ROUND6.format(x=corr)} AS double))"
        )
    return row.selectExpr(f"inline(array({', '.join(structs)}))").select(*CORR_COLS)


def correlation_sql(table: str, columns: list[str]) -> str:
    """DuckDB mirror of ``correlation_matrix`` (same moments, same finish)."""
    pairs = [
        (columns[i], columns[j])
        for i in range(len(columns))
        for j in range(i + 1, len(columns))
    ]
    m_parts: list[str] = []
    rows: list[str] = []
    for k, (a, b) in enumerate(pairs):
        t = _terms(a, b, "DECIMAL(19,6)", "CAST")
        m_parts.append(f"({t['n']}) AS p{k}_n")
        for key in ("sx", "sy", "sxy", "sxx", "syy"):
            m_parts.append(
                f"(CASE WHEN ({t['dom']}) THEN CAST({t[key]} AS DOUBLE) "
                f"ELSE {t['n' + key]} END) AS p{k}_{key}"
            )
        n = f"CAST(p{k}_n AS DOUBLE)"
        cov = f"({n} * p{k}_sxy - p{k}_sx * p{k}_sy)"
        vx = f"({n} * p{k}_sxx - p{k}_sx * p{k}_sx)"
        vy = f"({n} * p{k}_syy - p{k}_sy * p{k}_sy)"
        den = f"(SQRT(GREATEST({vx}, 0.0)) * SQRT(GREATEST({vy}, 0.0)))"
        corr = f"({cov} / NULLIF({den}, 0.0))"
        rows.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"CAST({n} AS BIGINT) AS n_pairs, "
            f"CAST({ROUND6.format(x=corr)} AS DOUBLE) AS corr FROM m"
        )
    m = ",\n    ".join(m_parts)
    body = "\nUNION ALL\n".join(rows)
    return f"WITH m AS (SELECT {m} FROM {table})\n{body}"
