"""Plan-only cross-engine dtype-parity audit of the oracle-hashed surface.

The driver's correctness gate hashes Spark and DuckDB results through a
type/format-sensitive comparison: a DuckDB HUGEINT (what ``SUM(INTEGER)``
returns) leaves DuckDB's pandas conversion as **float64** and renders
``5.0`` while Spark's BIGINT renders ``5`` — rows+schema match, hash
doesn't.  Same class of landmine: Spark DecimalType output vs oracle
DOUBLE (``5.000000`` vs ``5.0``).

This audit catches the whole class WITHOUT executing anything expensive:

- Spark side: build each ``queries()`` DataFrame at sf0.001 and read its
  lazy ``.schema`` (no action is triggered for batch plans).
- DuckDB side: ``con.sql(oracle)`` binds/prepares the relation;
  ``.types`` / ``.columns`` come from the binder, not execution.

Each output column is mapped to the *pandas render class* it will have
after conversion, and any class mismatch is a violation.  Shared with
``tests/test_oracle_type_parity.py`` which fails the build on any hit.

Usage:  python scripts/audit_type_parity.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# DuckDB logical type id -> pandas render class.
# HUGEINT is deliberately NOT "int": duckdb's .df() materializes it as
# float64 (judge-verified: SUM(1+2) -> dtype float64, value 3.0).
_DUCK_CLASS = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "HUGEINT": "hugeint", "UHUGEINT": "hugeint",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool",
    "DATE": "date", "TIME": "time",
    "INTERVAL": "interval",
    "BLOB": "binary",
}


def duck_class(t) -> str:
    s = str(t).upper()
    if s.startswith("DECIMAL"):
        return "decimal"
    if s.startswith("TIMESTAMP"):
        return "timestamp"
    if s.endswith("[]") or s.startswith("LIST") or s.startswith("ARRAY"):
        return "array"
    if s.startswith("STRUCT"):
        return "struct"
    if s.startswith("MAP"):
        return "map"
    return _DUCK_CLASS.get(s, f"?{s}")


def spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, T.StructType):
        return "struct"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.BinaryType):
        return "binary"
    return f"?{dt.simpleString()}"


# (spark_class, duck_class) pairs that render identically despite the
# class names differing.  Empty on purpose: int-vs-hugeint and
# decimal-vs-float are exactly the bugs; everything else should agree.
_COMPATIBLE: set[tuple[str, str]] = set()


def audit(only: set[str] | None = None):
    """Yield (query, column, spark_type, duck_type) violations."""
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("audit-type-parity")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue  # rows-only contract: no cross-engine hash, no parity needed
        sdf = fn(spark, SF)
        rel = con.sql(oracles[name])
        s_types = {f.name: spark_class(f.dataType) for f in sdf.schema.fields}
        d_types = dict(zip(rel.columns, [duck_class(t) for t in rel.types]))
        d_raw = dict(zip(rel.columns, [str(t) for t in rel.types]))
        for col in sorted(set(s_types) | set(d_types)):
            sc, dc = s_types.get(col), d_types.get(col)
            if sc is None or dc is None:
                yield (name, col, sc or "<missing>", dc or "<missing>")
            elif sc != dc and (sc, dc) not in _COMPATIBLE:
                yield (name, col, sc, f"{dc} ({d_raw[col]})")


def main() -> int:
    only = set(sys.argv[1:]) or None
    bad = 0
    seen_q = set()
    for name, col, sc, dc in audit(only):
        print(f"MISMATCH  {name}.{col}: spark={sc} oracle={dc}")
        bad += 1
        seen_q.add(name)
    print(f"\n{bad} mismatched columns across {len(seen_q)} queries")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
