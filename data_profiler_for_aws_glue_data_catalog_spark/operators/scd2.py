"""SCD Type-2 snapshot merge: build validity-interval history.

The warehouse-standard slowly-changing-dimension update: given the
CURRENT history's open rows (old snapshot) and a NEW snapshot, emit
the next history state —

- unchanged keys keep their open row (valid_to = NULL);
- changed keys CLOSE the old row at ``new_ts`` and OPEN a new one;
- added keys open at ``new_ts``; removed keys close at ``new_ts``.

Output: key + tracked attributes + (valid_from, valid_to,
change_kind in {'kept','closed','opened'}); consumers append the
closed/opened rows to the durable history table.

Plan shape: ONE full-outer equi-join on the key (the table_diff
shape), map-side change classification via null-safe comparison
(``IS DISTINCT FROM`` per attribute), then a single inline fan-out
(changed keys emit 2 rows) — no second join, no window.

Scale notes (100 TB): one co-partitionable shuffle join; AQE handles
key skew. Attribute comparison is column-wise JVM codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCD2_META = ["valid_from", "valid_to", "change_kind"]


def scd2_merge(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    old_ts: str,
    new_ts: str,
) -> DataFrame:
    """Next-state SCD2 rows (see module docstring). ``old_ts``/``new_ts``
    are 'yyyy-MM-dd HH:mm:ss' literals — explicit, never now()."""
    o = old.select(
        *[F.col(c).alias(f"o_{c}") for c in key_cols + attr_cols]
    )
    n = new.select(
        *[F.col(c).alias(f"n_{c}") for c in key_cols + attr_cols]
    )
    cond = [o[f"o_{c}"].eqNullSafe(n[f"n_{c}"]) for c in key_cols]
    joined = o.join(n, cond, "full_outer")
    changed = " OR ".join(
        f"(o_{c} IS DISTINCT FROM n_{c})" for c in attr_cols
    )
    in_old = " AND ".join(f"o_{c} IS NOT NULL" for c in key_cols)
    in_new = " AND ".join(f"n_{c} IS NOT NULL" for c in key_cols)
    key_out = ", ".join(
        f"'{c}', coalesce(o_{c}, n_{c})" for c in key_cols
    )

    def row(prefix: str, vf: str, vt: str, kind: str) -> str:
        attrs = ", ".join(f"'{c}', {prefix}_{c}" for c in attr_cols)
        return (
            f"named_struct({key_out}, {attrs}, "
            f"'valid_from', {vf}, 'valid_to', {vt}, 'change_kind', '{kind}')"
        )

    o_ts, n_ts = f"'{old_ts}'", f"'{new_ts}'"
    null_s = "cast(NULL AS string)"
    branches = f"""
CASE
  WHEN ({in_old}) AND ({in_new}) AND NOT ({changed})
    THEN array({row('o', o_ts, null_s, 'kept')})
  WHEN ({in_old}) AND ({in_new})
    THEN array({row('o', o_ts, n_ts, 'closed')},
               {row('n', n_ts, null_s, 'opened')})
  WHEN ({in_new})
    THEN array({row('n', n_ts, null_s, 'opened')})
  ELSE array({row('o', o_ts, n_ts, 'closed')})
END
"""
    return joined.selectExpr(f"inline({branches})")


def scd2_merge_sql(
    old_sql: str,
    new_sql: str,
    key_cols: list[str],
    attr_cols: list[str],
    old_ts: str,
    new_ts: str,
) -> str:
    """DuckDB mirror (UNION arms instead of inline fan-out)."""
    on = " AND ".join(
        f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in key_cols
    )
    changed = " OR ".join(
        f"(o.{c} IS DISTINCT FROM n.{c})" for c in attr_cols
    )
    in_old = " AND ".join(f"o.{c} IS NOT NULL" for c in key_cols)
    in_new = " AND ".join(f"n.{c} IS NOT NULL" for c in key_cols)
    keys_o = ", ".join(f"COALESCE(o.{c}, n.{c}) AS {c}" for c in key_cols)
    o_attrs = ", ".join(f"o.{c} AS {c}" for c in attr_cols)
    n_attrs = ", ".join(f"n.{c} AS {c}" for c in attr_cols)
    return f"""
WITH o_side AS ({old_sql}), n_side AS ({new_sql}),
j AS (
  SELECT * FROM o_side o FULL OUTER JOIN n_side n ON {on}
)
SELECT * FROM (
  SELECT {keys_o}, {o_attrs}, '{old_ts}' AS valid_from,
    CAST(NULL AS VARCHAR) AS valid_to, 'kept' AS change_kind
  FROM o_side o JOIN n_side n ON {on}
  WHERE NOT COALESCE({changed}, FALSE)
  UNION ALL
  SELECT {keys_o}, {o_attrs}, '{old_ts}', '{new_ts}', 'closed'
  FROM o_side o JOIN n_side n ON {on}
  WHERE COALESCE({changed}, FALSE)
  UNION ALL
  SELECT {keys_o}, {n_attrs}, '{new_ts}', CAST(NULL AS VARCHAR), 'opened'
  FROM o_side o JOIN n_side n ON {on}
  WHERE COALESCE({changed}, FALSE)
  UNION ALL
  SELECT {keys_o}, {n_attrs}, '{new_ts}', CAST(NULL AS VARCHAR), 'opened'
  FROM n_side n LEFT JOIN o_side o ON {on} WHERE NOT ({in_old})
  UNION ALL
  SELECT {keys_o}, {o_attrs}, '{old_ts}', '{new_ts}', 'closed'
  FROM o_side o LEFT JOIN n_side n ON {on} WHERE NOT ({in_new})
)
"""
