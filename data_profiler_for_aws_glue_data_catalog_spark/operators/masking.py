"""Column masking / pseudonymization transforms.

Privacy-preserving dataset preparation: replace sensitive columns with
deterministic surrogates BEFORE data leaves the trust boundary.
Strategies (all map-side JVM expressions, schema-preserving types
noted):

- ``hash``      : md5 hex of seed||value — stable pseudonym, joinable
                  across tables sharing the seed (string out);
- ``prefix``    : keep the first k chars, mask the rest with '*'
                  (string out);
- ``null``      : redact entirely (type preserved);
- ``bucket``    : generalize numerics to bucket lower bounds of width w
                  (double out) — k-anonymity-style coarsening;
- ``year``      : generalize timestamps/dates to January 1st of their
                  year (date out).

NULL inputs stay NULL under every strategy (no fake values invented).

Plan shape: one ``select`` projection — zero shuffles, composes with
any downstream operator. Masking 100 TB costs exactly one scan-write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_col(c: Column, strategy: str, seed: int, k: int, width: float) -> Column:
    if strategy == "hash":
        return F.when(
            c.isNotNull(), F.md5(F.concat(F.lit(f"{seed}|"), c.cast("string")))
        )
    if strategy == "prefix":
        s = c.cast("string")
        return F.when(
            c.isNotNull(),
            F.concat(
                F.substring(s, 1, k),
                F.regexp_replace(F.substring(s, k + 1, 1000000), ".", "*"),
            ),
        )
    if strategy == "null":
        return F.when(F.lit(False), c)
    if strategy == "bucket":
        # specials AND huge finites pass through: Spark floor(double)
        # returns BIGINT and would saturate ±Inf to ±Long.Max, NaN to 0,
        # and any |d/width| >= Long.Max (e.g. 1e300) to ±Long.Max, while
        # the DuckDB mirror's floor stays double and propagates — and a
        # NaN/Inf/1e300 balance is already non-identifying, so
        # generalizing it is a no-op anyway (r9 guard extension).
        d = c.cast("double")
        return F.when(
            c.isNotNull(),
            F.when(
                F.isnan(d) | (F.abs(d / width) >= F.lit(9.0e18)), d
            ).otherwise((F.floor(d / width) * width).cast("double")),
        )
    if strategy == "year":
        return F.when(c.isNotNull(), F.trunc(c.cast("date"), "year"))
    raise ValueError(f"mask_columns: unknown strategy {strategy!r}")


def mask_columns(
    df: DataFrame,
    strategies: dict[str, str],
    seed: int = 0,
    prefix_keep: int = 2,
    bucket_width: float = 1000.0,
) -> DataFrame:
    """Apply per-column masking strategies; unlisted columns pass through."""
    out = []
    for c in df.columns:
        if c in strategies:
            out.append(
                _mask_col(
                    F.col(c), strategies[c], seed, prefix_keep, bucket_width
                ).alias(c)
            )
        else:
            out.append(F.col(c))
    return df.select(*out)


def mask_columns_sql(
    table: str,
    all_columns: list[str],
    strategies: dict[str, str],
    seed: int = 0,
    prefix_keep: int = 2,
    bucket_width: float = 1000.0,
) -> str:
    """DuckDB mirror of mask_columns."""
    outs = []
    for c in all_columns:
        s = strategies.get(c)
        if s is None:
            outs.append(c)
        elif s == "hash":
            outs.append(
                f"CASE WHEN {c} IS NOT NULL THEN"
                f" md5('{seed}|' || CAST({c} AS VARCHAR)) END AS {c}"
            )
        elif s == "prefix":
            outs.append(
                f"CASE WHEN {c} IS NOT NULL THEN"
                f" substring(CAST({c} AS VARCHAR), 1, {prefix_keep}) ||"
                f" regexp_replace(substring(CAST({c} AS VARCHAR),"
                f" {prefix_keep + 1}, 1000000), '.', '*', 'g') END AS {c}"
            )
        elif s == "null":
            outs.append(f"CASE WHEN FALSE THEN {c} END AS {c}")
        elif s == "bucket":
            # specials + huge finites pass through (engine parity with
            # the Spark BIGINT-floor saturation guard); + 0.0 normalizes
            # the -0.0 bucket DuckDB's double floor produces where
            # Spark's BIGINT floor yields +0 (rendering parity)
            outs.append(
                f"CASE WHEN {c} IS NOT NULL THEN "
                f"CASE WHEN isnan(CAST({c} AS DOUBLE)) "
                f"OR abs(CAST({c} AS DOUBLE) / {bucket_width!r}) >= 9.0e18 "
                f"THEN CAST({c} AS DOUBLE) "
                f"ELSE CAST(FLOOR(CAST({c} AS DOUBLE)"
                f" / {bucket_width!r}) * {bucket_width!r} + 0.0 AS DOUBLE) END "
                f"END AS {c}"
            )
        elif s == "year":
            outs.append(
                f"CASE WHEN {c} IS NOT NULL THEN"
                f" date_trunc('year', CAST({c} AS DATE)) END AS {c}"
            )
        else:
            raise ValueError(f"mask_columns_sql: unknown strategy {s!r}")
    return f"SELECT {', '.join(outs)} FROM {table}"
