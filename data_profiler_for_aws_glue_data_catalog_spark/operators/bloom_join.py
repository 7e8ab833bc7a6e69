"""Hash-prefiltered semi join: sketch-prune a fact scan before the join.

At 100 TB the expensive part of ``fact SEMI JOIN keys`` is shuffling the
fact table; when the key set is selective but too large to broadcast,
the standard fix is a BROADCASTABLE approximation of the key set
applied map-side first. This operator uses the k=1 Bloom filter (a hash
slot table): ``pos = xxhash64(key) mod m`` — the distinct positions
relation is bounded by ``m`` no matter how many keys there are, so it
always broadcasts; fact rows whose position misses are dropped BEFORE
the exchange, and the exact semi join runs on the survivors. False
positives (slot collisions) only let extra rows through to the exact
join — the RESULT is identical to the plain semi join, which is why the
correctness contract is just ``WHERE IN``.

This is the manual form of the runtime bloom filter Spark's optimizer
can inject (spark.sql.optimizer.runtime.bloomFilter.enabled — the
``bloom_filter_agg`` expression behind it is internal-only, hence the
explicit construction); writing it in the plan pins the behavior
regardless of optimizer heuristics and across stages AQE cannot see.

Expected FP passthrough ~ |fact| * min(|keys|, m) / m: size ``m`` to
taste (2^20 slots ≈ 8 MB broadcast as longs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    key_col: str,
    num_slots: int = 1 << 20,
) -> DataFrame:
    """``fact`` rows whose ``fact_key`` appears in ``keys.key_col`` —
    exact semi-join semantics with a broadcast hash-slot prefilter."""
    slots = (
        keys.where(F.col(key_col).isNotNull())
        .select(F.pmod(F.xxhash64(key_col), F.lit(num_slots)).alias("_pos"))
        .distinct()
    )
    pruned = fact.join(
        F.broadcast(slots),
        F.pmod(F.xxhash64(fact_key), F.lit(num_slots)) == F.col("_pos"),
        "leftsemi",
    )
    return pruned.join(
        keys.select(F.col(key_col).alias(fact_key)).distinct(),
        fact_key,
        "leftsemi",
    )
