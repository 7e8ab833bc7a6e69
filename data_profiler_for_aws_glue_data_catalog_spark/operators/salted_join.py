"""Skew-safe equi-join via key salting (manual AQE-skew-join analog).

When one join key carries a disproportionate share of the fact side
(hot users, null-ish defaults, viral documents), the reducer owning
that key becomes the straggler that defines the job's wall clock. AQE's
skew-join split handles sort-merge cases; this operator is the explicit
DataFrame-level strategy that also works where AQE can't see the skew
(pre-AQE plans, broadcast-disabled shuffles, or when you want a
deterministic layout):

  fact:  salt = pmod(hash(id-ish tie-break), S) added to the join key
  dim:   each row replicated S times (explode over 0..S-1)
  join:  on (key, salt) — the hot key now spreads across S reducers.

Results are IDENTICAL to the plain equi-join (the replicated dim row
matches exactly one salt per fact row); the oracle runs the plain join.

Cost model: dim side inflates S×. Right when |dim| * S stays far below
|fact| — the usual case (dims are small; that's why the hot key exists
on the fact side). For dims too big to replicate, salt ONLY the hot
keys (`hot_keys` list): fact rows with cold keys keep salt 0 and the
dim replicates only its hot rows — replication cost collapses to
|hot keys| * S.

Scale notes (100 TB): pair with skew.key_skew to pick S
(suggested_salt_buckets) and the hot-key list; AQE remains on — salting
composes with it rather than replacing it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _fact_salt(salt_source: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(salt_source), F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_source: str,
    n_salts: int = 8,
    hot_keys: list | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact.fact_key == dim.dim_key` with the hot-key shuffle
    spread over ``n_salts`` reducers per key.

    ``salt_source``: a fact column that VARIES WITHIN a key (a row id,
    line number, timestamp) — its hash spreads the hot key's rows
    across salts. Hashing the key itself would put the whole hot key
    back on one reducer, which is why this argument is required.
    ``hot_keys``: restrict salting to these key values — everything
    else joins with salt 0 and the dim replicates hot rows only.
    """
    salt = _fact_salt(F.col(salt_source), n_salts)
    if hot_keys is not None:
        salt = F.when(F.col(fact_key).isin(hot_keys), salt).otherwise(F.lit(0))
        dim_salts = F.when(
            F.col(dim_key).isin(hot_keys),
            F.sequence(F.lit(0), F.lit(n_salts - 1)),
        ).otherwise(F.array(F.lit(0)))
    else:
        dim_salts = F.sequence(F.lit(0), F.lit(n_salts - 1))
    f = fact.withColumn(SALT_COL, salt)
    d = dim.withColumn(SALT_COL, F.explode(dim_salts.cast("array<int>")))
    joined = f.join(
        d,
        (f[fact_key] == d[dim_key]) & (f[SALT_COL] == d[SALT_COL]),
        how=how,
    )
    return joined.drop(f[SALT_COL]).drop(d[SALT_COL])
