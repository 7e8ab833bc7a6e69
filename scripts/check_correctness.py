"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 next to its
oracle_sql() and compares row count, sorted-by-name columns, and
order-insensitive values — BOTH numerically and as rendered strings.
The driver's hash is type/format-sensitive: r03 proved a query can be
value-exact yet hash-red when one engine renders "5.0" and the other
"5" (DuckDB HUGEINT->float64 vs Spark BIGINT), so a numeric-only local
gate gives false confidence.  Failures are classified:

  FAIL ... value mismatch   — genuinely different numbers
  FAIL ... format mismatch  — equal values, different rendering
                              (dtype landmine; see _ORACLE_OUTPUT_CASTS)

Usage:  python scripts/check_correctness.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

# Override to run the same gate against another table dir (e.g. a
# fuzz-generated one from scripts/fuzz_correctness.py).
SF = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")

# Fuzz mode (scripts/fuzz_correctness.py sets this): mutated content can
# legitimately hit the two DOCUMENTED cross-engine divergence classes that
# the fixed testdata never reaches —
#   ulp6:     a ROUND6 libm value landing on a .5-ulp rounding boundary
#             (JVM ln/sqrt vs libm differ by 1 in the 6th decimal);
#   sd_floor: StandardDeviation inside the single-pass-moment cancellation
#             floor (see oracle._stddev_sql / SURVEY §5.5) — bounded by
#             1e-7*sqrt(m2), <= 1e-3 at this data's magnitudes;
#   dec6:     double->decimal(_,6) conversion divergence on a 7th-digit
#             .5 boundary feeding a decimal sum (relative error <= 1e-11,
#             i.e. ulp-scale on the rollup; see _known_class).
# With TOLERANT=1 a mismatch whose every cell falls in a known class is
# reported as WARN, not FAIL. The strict default (the driver-gate replica)
# is unchanged: the driver hash has no tolerance, and the fixed testdata
# must stay byte-exact.
TOLERANT = os.environ.get("SPARK_GRAFT_CHECK_TOLERANT") == "1"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            fa, fb = float(a), float(b)
            if math.isnan(fa) and math.isnan(fb):
                return True
            return fa == fb
    except (TypeError, ValueError):
        pass
    return a == b


def _known_class(frame: pd.DataFrame, i: int, c, va, vb) -> str | None:
    try:
        diff = abs(float(va) - float(vb))
    except (TypeError, ValueError):
        return None
    if diff <= 1.05e-6:
        return "ulp6"
    # dec6: double->decimal(_,6) conversion divergence through a decimal
    # sum — Spark converts via the double's shortest decimal repr then
    # HALF_UP, DuckDB scales the binary value, and values on a 7th-digit
    # .5 boundary round apart (~1.5e-5 per conversion on arbitrary
    # doubles; surfaces only under content fuzz, never on the 2-dp
    # testdata). The footprint is a few 1e-6 quanta on a data-magnitude
    # rollup, i.e. relative error at the double-ulp scale — far below any
    # logic bug observed (woe was 2e-6 RELATIVE). Product sites found by
    # fuzz are pre-rounded at the source (operators/reconcile.py); this
    # class covers the raw-column long tail.
    try:
        scale = max(abs(float(va)), abs(float(vb)))
    except (TypeError, ValueError):
        return None
    if scale > 0 and diff / scale <= 1e-11:
        return "dec6"
    # the metrics relation carries the metric in `name`; the catalog
    # parameter sink carries it as `param_key` = '<prefix>StandardDeviation'
    metric = ""
    if "name" in frame.columns:
        metric = str(frame["name"].iloc[i])
    elif "param_key" in frame.columns:
        metric = str(frame["param_key"].iloc[i])
    if metric.endswith("StandardDeviation") and diff <= 1e-3:
        return "sd_floor"
    return None


def main() -> int:
    only = set(sys.argv[1:])
    builder = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
    )
    # the session-config fuzz axis overlays arbitrary confs (JSON dict) on
    # top of the defaults: results must be invariant to execution shape
    # (shuffle partitions, AQE, broadcast thresholds, split sizes)
    extra = os.environ.get("SPARK_GRAFT_CHECK_SPARK_CONF")
    if extra:
        import json as _json

        for k, v in _json.loads(extra).items():
            builder = builder.config(k, v)
    spark = builder.appName("check-correctness").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        # a table may be a single file OR a directory of part files (the
        # layout-fuzz axis shards tables); Spark reads both natively,
        # DuckDB needs the glob form for directories
        src = f"{SF}/{t}.parquet"
        if os.path.isdir(src):
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {str(ex)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {str(ex)[:300]}")
            failures += 1
            continue
        a, b = norm(sdf), norm(odf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        bad = []
        for i in range(len(a)):
            for c in a.columns:
                va, vb = a[c].iloc[i], b[c].iloc[i]
                if (pd.isna(va) and pd.isna(vb)):
                    continue
                if not cell_eq(va, vb):
                    bad.append((i, c, va, vb))
        if bad:
            if TOLERANT:
                kinds = [_known_class(a, i, c, va, vb) for i, c, va, vb in bad]
                if all(kinds):
                    from collections import Counter

                    print(
                        f"WARN  {name}: {len(bad)} known-class cells "
                        f"({dict(Counter(kinds))}) — documented divergence, "
                        f"not counted as failure"
                    )
                    continue
            print(f"FAIL  {name}: value mismatch, {len(bad)} cells; first: {bad[:5]}")
            failures += 1
            continue
        # format-sensitive pass (the driver's hash sees rendered values):
        # re-sort the RAW frames stringified so dtype differences that
        # round-trip to different text ("5.0" vs "5") are caught here,
        # not by the driver
        cols = sorted(sdf.columns)
        sa = sdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        sb = odf[cols].astype(str).sort_values(cols).reset_index(drop=True)
        if not sa.equals(sb):
            diff = (sa != sb).any(axis=1)
            i = int(diff.idxmax())
            mism = [
                (c, sa[c].iloc[i], sb[c].iloc[i])
                for c in cols
                if sa[c].iloc[i] != sb[c].iloc[i]
            ]
            print(
                f"FAIL  {name}: format mismatch (values equal), "
                f"{int(diff.sum())} rows; first: {mism[:3]}"
            )
            failures += 1
        else:
            print(f"OK    {name}: {len(a)} rows exact")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
