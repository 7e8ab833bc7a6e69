"""Content-fuzzed correctness gate: the full registered query surface vs
its DuckDB oracles on MUTATED testdata, not just the fixed tables.

The fixed-testdata gate (check_correctness.py) proves cross-engine
exactness on one specific dataset; this script perturbs that dataset —
seeded, reproducibly — and re-runs the same gate, so content assumptions
hiding in any of the ~205 hashed queries (tie-breaks that only hold for
unique keys, NULL handling that testdata never exercises, numeric edge
branches) surface as FAIL rows.

Mutations (all in DuckDB SQL under ``setseed``, so types — including
FLOAT[] embeddings and microsecond timestamps — survive unchanged):

  - row subsample WITHOUT replacement (primary keys stay unique);
  - numeric attribute scale/shift (guard domains preserved);
  - ~3% NULL injection into non-key attribute columns;
  - timestamp jitter within +/- 12h (windowed/retention queries stay
    populated, original month-scale range preserved);
  - elementwise noise + occasional all-zero vectors in embeddings.

Vocabularies (event_type, lang, o_orderstatus, ...) are untouched: many
queries filter on those literals, and the point is to fuzz content the
queries actually read.

Usage:
  python scripts/fuzz_correctness.py --seed 1 [--outdir DIR] [query ...]
  python scripts/fuzz_correctness.py --seed 1 --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --schema --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --layout --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --sparkconf --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --skew --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --specials --record FUZZ.json
  python scripts/fuzz_correctness.py --seed 1 --schema --layout ...  # combined
  python scripts/fuzz_correctness.py --seed 1 --specials --skew ...  # combined
  SPARK_GRAFT_FUZZ_SRC=/root/testdata/sf0.01 ...   # mutate at 10x scale
  (content randomization at larger scale is the axis that found the
  curriculum_documents percentile-edge flip — more rows, more chances
  for a value to land exactly on a quantile/fence boundary)

``--layout`` switches to the LAYOUT-mutation axis: identical values,
seeded physical layout per table (one giant row group / many tiny row
groups / a DIRECTORY of shard files / as-is, each optionally with a
seeded value-hash row order). The standard oracles apply unchanged, so
the FULL surface replays; what it probes is layout invariance — the
ensure_parallelism split estimator, directory-vs-file table resolution,
and input-order sensitivity (tie-breaks must be value-based).

``--skew`` switches to the SKEW axis: a seeded hot key per chosen table
is amplified 16-128x (every row of its group replicated) and optionally
~20% of one FK-ish column goes NULL, so the NULL group itself is the hot
bucket. Standard oracles recompute on the mutated tables (values change,
like the content axis); the gate proves every query's VALUES are
skew-invariant while wall-clock bounds candidate-generation blowups.

``--schema`` switches to the SCHEMA-mutation axis: instead of perturbing
cell values over the fixed star schema, the seed drives structural edits -
drop / rename / retype (int->bigint widen) / add columns, one all-NULL
column, optionally one single-row table - and replays the schema-driven
query families (profile incl. grouped/rollup/cube/windowed variants /
constraint-suggestion / diff / sinks) with
``SPARK_GRAFT_ORACLE_SCHEMA_DIR`` pointed at the mutated dir, so the
DuckDB oracles regenerate from the ACTUAL parquet footers exactly as the
engine profiles from ``df.schema`` (oracle.derive_schema_columns).
``orders`` is deliberately frozen: the verify/infer/candidate-keys/
schema-diff oracles hardcode its inventory by contract, and replaying
them against a mutated database proves DB-wide mutation cannot leak into
a frozen table's results.

Generates DIR (default /tmp/fuzzdata-seed<N>) then execs the standard
gate with SPARK_GRAFT_CHECK_SF=DIR; exit code is the gate's.

``--record PATH`` additionally appends one machine-checkable row per run
to a JSON seed matrix ({"runs": [...]}): seed, source dir, OK/WARN/
ROWS/FAIL counts, the WARN classes hit, and any failed query names —
so "seeds 1-9 + a 10x seed, zero failures" is an auditable artifact
(FUZZ.json), not README prose.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import shutil
import subprocess
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_FUZZ_SRC", "/root/testdata/sf0.001")

# (table, pk columns never nulled/perturbed, mutation select-list override)
# Columns not mentioned in OVERRIDES pass through unchanged.
NULLABLE = {
    "customer": ["c_acctbal", "c_mktsegment"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice", "p_type"],
    "orders": ["o_totalprice", "o_orderpriority"],
    "lineitem": ["l_quantity", "l_tax"],
    "events": ["value", "props"],
    "documents": ["lang", "source"],
}
PERTURB = {  # col -> expression template ({c} = column)
    "c_acctbal": "{c} * (0.5 + random()) - 500.0",
    "s_acctbal": "{c} * (0.5 + random())",
    "p_retailprice": "{c} * (0.8 + 0.4 * random())",
    "o_totalprice": "{c} * (0.5 + random())",
    "l_quantity": "CASE WHEN random() < 0.02 THEN 0.0 ELSE {c} END",
    "l_extendedprice": "{c} * (0.9 + 0.2 * random())",
    "value": "{c} * (2.0 * random()) - 0.5 * {c}",
    "n_chars": "GREATEST({c} + CAST(floor(random() * 21 - 10) AS BIGINT), 0)",
}
TS_JITTER = {
    "orders": "o_orderdate",
    "lineitem": "l_shipdate",
    "events": "ts",
}
SAMPLE_FRAC = {"region": 1.0, "nation": 1.0}  # tiny dims: keep whole

# ---------------------------------------------------------------- schema axis

# Queries replayed under schema mutation: the families whose BOTH sides are
# schema-driven (engine from df.schema, oracle from derive_schema_columns),
# plus the frozen-orders queries whose hardcoded oracles must stay exact
# amid DB-wide mutation.
SCHEMA_QUERIES = [
    "profile_region", "profile_nation", "profile_customer",
    "profile_supplier", "profile_part", "profile_orders",
    "profile_lineitem", "profile_events", "profile_documents",
    "profile_embeddings", "profile_database_scan", "profile_catalog_scan",
    "profile_lineitem_observed", "profile_orders_typed",
    "profile_lineitem_approx", "dataset_sizes",
    "publish_metrics_parquet", "catalog_params_sink",
    "suggest_constraints_customer",
    # grouped/windowed profiles: group keys (c_mktsegment, c_nationkey,
    # events.ts) are outside every structural-mutation candidate list;
    # the profiled column set tracks the mutated schema on both sides
    "profile_customer_by_segment", "rollup_profile_customer",
    "cube_profile_customer", "profile_events_windowed",
    # frozen-orders family (hardcoded-inventory oracles by contract)
    "verify_orders", "infer_types_orders", "candidate_keys_orders",
    "schema_diff_orders", "table_diff_orders", "diff_summary_orders",
]

# Structural-mutation candidates. ``orders`` never appears (frozen, see
# module docstring); every candidate column is outside the replayed
# queries' hardcoded references (group keys included). (table, column)
# pairs; the seed samples.
SCHEMA_DROP = [
    ("customer", "c_name"), ("part", "p_brand"),
    ("supplier", "s_name"), ("lineitem", "l_tax"),
    ("events", "props"), ("documents", "source"),
]
SCHEMA_RENAME = [
    ("customer", "c_name"), ("part", "p_type"), ("events", "value"),
    ("documents", "lang"), ("nation", "n_name"),
]
SCHEMA_RETYPE = [  # int32 -> int64 widen: values identical, footer changes
    ("nation", "n_nationkey"), ("customer", "c_nationkey"),
    ("part", "p_size"), ("supplier", "s_nationkey"),
    ("lineitem", "l_linenumber"),
]
SCHEMA_ALLNULL = [  # column kept, every value NULL (empty-domain metrics)
    ("supplier", "s_acctbal"), ("customer", "c_acctbal"),
    ("part", "p_retailprice"), ("documents", "source"),
]
SCHEMA_ADD_PK = {  # tables that can gain columns; pk drives the values
    "customer": "c_custkey", "part": "p_partkey",
    "events": "event_id", "supplier": "s_suppkey",
}
SCHEMA_SINGLE_ROW = [("supplier", "s_suppkey"), ("part", "p_partkey")]


def build_schema_dir(outdir: str, seed: int) -> list[str]:
    """Build a schema-mutated copy of SRC at ``outdir``; returns the
    human-readable mutation manifest (also recorded in FUZZ.json)."""
    import random

    rng = random.Random(seed)
    drops = set(rng.sample(SCHEMA_DROP, k=rng.randint(1, 2)))
    # a dropped column can't also be renamed (manifest must not lie)
    renames = {
        tc: f"{tc[1]}_fz"
        for tc in rng.sample(
            [x for x in SCHEMA_RENAME if x not in drops], k=rng.randint(1, 2)
        )
    }
    retype = rng.choice(SCHEMA_RETYPE)
    # a dropped column can't also be the all-NULL one (manifest must not lie)
    allnull = rng.choice([x for x in SCHEMA_ALLNULL if x not in drops])
    adds = rng.sample(sorted(SCHEMA_ADD_PK), k=2)
    single = rng.choice(SCHEMA_SINGLE_ROW) if rng.random() < 0.5 else None
    # a truncated table probes the opposite degenerate end: 1-row keeps
    # every metric defined, 0-row (empty) exercises the empty-domain
    # branches (NULL means, 0 sizes) through the full oracle comparison
    n_keep = rng.choice((0, 1)) if single else None

    manifest = (
        [f"drop {t}.{c}" for t, c in sorted(drops)]
        + [f"rename {t}.{c} -> {n}" for (t, c), n in sorted(renames.items())]
        + [f"retype {retype[0]}.{retype[1]} int->bigint"]
        + [f"allnull {allnull[0]}.{allnull[1]}"]
        + [f"add {t}.fz_note, {t}.fz_score" for t in sorted(adds)]
        + (
            [f"{'empty' if n_keep == 0 else 'single-row'} {single[0]}"]
            if single
            else []
        )
    )

    con = duckdb.connect()
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        desc = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        sel = []
        for name, dtyp, *_ in desc:
            if (t, name) in drops:
                continue
            if (t, name) == allnull and (t, name) not in renames:
                sel.append(f"CAST(NULL AS {dtyp}) AS {name}")
            elif (t, name) == retype:
                sel.append(f"CAST({name} AS BIGINT) AS {name}")
            elif (t, name) in renames:
                sel.append(f"{name} AS {renames[(t, name)]}")
            else:
                sel.append(name)
        if t in adds:
            pk = SCHEMA_ADD_PK[t]
            sel.append(
                f"CASE WHEN {pk} % 3 = 0 THEN 'alpha' "
                f"WHEN {pk} % 3 = 1 THEN 'beta' ELSE NULL END AS fz_note"
            )
            # % then / 8.0: exact binary fractions, render identically
            sel.append(f"CAST({pk} % 97 AS DOUBLE) / 8.0 AS fz_score")
        tail = (
            f"ORDER BY {single[1]} LIMIT {n_keep}"
            if single and single[0] == t
            else ""
        )
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet' {tail}) "
            f"TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows")
    con.close()
    for m in manifest:
        print(f"mutation: {m}")
    return manifest


# ----------------------------------------------------------------- conf axis

# The session-config axis mutates NOTHING about the data: it replays the
# full surface on the pristine source under a seeded Spark session shape.
# Results must be invariant to execution geometry — one-task shuffles,
# AQE on/off, broadcast joins disabled or forced tiny, scans split into
# many small byte ranges (64kb exercises the two-letter size-suffix parse
# in plans/partitioning.py). Anything that leaks partition count, task
# order, or join strategy into VALUES fails here and nowhere else; the
# engine's decimal-accumulation policy exists precisely to make sums
# order-invariant, and this axis is its gate.
CONF_AXIS: dict[str, list[str]] = {
    "spark.sql.shuffle.partitions": ["1", "7", "64"],
    "spark.sql.adaptive.enabled": ["true", "false"],
    "spark.sql.autoBroadcastJoinThreshold": ["10485760", "-1", "1024"],
    "spark.sql.files.maxPartitionBytes": ["128m", "1m", "64kb"],
    "spark.sql.files.openCostInBytes": ["4m", "0"],
}


def pick_conf(seed: int) -> dict[str, str]:
    """Seeded draw of one value per knob."""
    import random

    rng = random.Random(seed)
    return {k: rng.choice(vs) for k, vs in sorted(CONF_AXIS.items())}


# ----------------------------------------------------------------- skew axis

# The skew axis amplifies ONE seeded hot key per chosen table: every row
# of the key's group is replicated until the group is 16-128x its
# original size — the shape that breaks shuffle-based plans at scale
# (hot groupBy partitions, skewed join sides, an LSH/shingle bucket
# going quadratic, a single-key window holding most of the data) — and
# optionally NULLs out ~20% of one foreign-key-ish column, making the
# NULL group itself the hot bucket. Values change, so (like the content
# axis) the standard oracles recompute on the mutated tables: the gate
# proves every registered query is SKEW-INVARIANT in values, while the
# run's wall-clock bounds that no candidate generator degenerates into
# an all-pairs blowup on a hot bucket. All mutation choices are
# value-hash-seeded (no engine RNG), so a seed is fully reproducible.

SKEW_HOT = [  # (table, key column) hot-group candidates; seed samples
    ("lineitem", "l_orderkey"), ("lineitem", "l_suppkey"),
    ("orders", "o_custkey"), ("events", "user_id"),
    ("documents", "doc_id"), ("embeddings", "vec_id"),
]
SKEW_NULLKEY = [  # FK-ish keys safe to NULL (never PK/identity columns)
    ("lineitem", "l_suppkey"), ("orders", "o_custkey"),
    ("events", "user_id"),
]
SKEW_AMP = (16, 32, 64, 128)


def build_skew_dir(outdir: str, seed: int, src_dir: str | None = None) -> list[str]:
    """Build a skew-amplified copy of ``src_dir`` (default SRC) at
    ``outdir``; returns the mutation manifest (recorded in FUZZ.json).
    ``src_dir`` lets the combined --specials --skew mode amplify hot keys
    over ALREADY specials-injected tables — hot groups whose replicated
    rows carry NaN/±Inf, the one axis product no single axis poses."""
    import random

    src_dir = src_dir or SRC
    rng = random.Random(seed)
    # up to 3 hot targets, at most one per table
    targets: dict[str, str] = {}
    for t, c in rng.sample(SKEW_HOT, k=len(SKEW_HOT)):
        if t not in targets and len(targets) < 3:
            targets[t] = c
    amp = {t: rng.choice(SKEW_AMP) for t in targets}
    nullkey = rng.choice(SKEW_NULLKEY) if rng.random() < 0.5 else None
    if nullkey and targets.get(nullkey[0]) == nullkey[1]:
        nullkey = None  # can't NULL the column we replicate by

    con = duckdb.connect()
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    manifest: list[str] = []
    for t in tables:
        src = f"{src_dir}/{t}.parquet"
        cols = [
            r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        sel = list(cols)
        if nullkey and nullkey[0] == t:
            nk = nullkey[1]
            # value-hash-seeded ~20% NULL: the NULL group goes hot
            sel = [
                (
                    f"CASE WHEN hash({', '.join(cols)}, {seed}) % 5 = 0 "
                    f"THEN NULL ELSE {nk} END AS {nk}"
                    if c == nk
                    else c
                )
                for c in sel
            ]
            manifest.append(f"nullkey {t}.{nk} ~20%")
        body = f"SELECT {', '.join(sel)} FROM '{src}'"
        if t in targets:
            c, k = targets[t], amp[t]
            hot = con.sql(
                f"SELECT {c} FROM '{src}' WHERE {c} IS NOT NULL "
                f"GROUP BY 1 ORDER BY COUNT(*) DESC, 1 LIMIT 1"
            ).fetchone()[0]
            # only int/str hot keys render as valid SQL literals (repr of
            # a date/float would inject datetime.date(...) or lose bits);
            # quote-escape strings so a value containing ' can't break
            # the COPY query (round-8 advice)
            if isinstance(hot, bool) or not isinstance(hot, (int, str)):
                raise SystemExit(
                    f"SKEW_HOT column {t}.{c} has unsupported hot-key type "
                    f"{type(hot).__name__}; extend the literal rendering first"
                )
            hv = (
                "'" + hot.replace("'", "''") + "'"
                if isinstance(hot, str)
                else repr(hot)
            )
            g = con.sql(
                f"SELECT COUNT(*) FROM '{src}' WHERE {c} = {hv}"
            ).fetchone()[0]
            body = (
                f"SELECT * FROM ({body}) "
                f"UNION ALL "
                f"SELECT b.* FROM ({body}) b, range({k - 1}) "
                f"WHERE b.{c} = {hv}"
            )
            manifest.append(f"skew {t}.{c}={hot} x{k} ({g} -> {g * k} rows)")
        con.execute(
            f"COPY ({body}) TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows")
    con.close()
    for m in manifest:
        print(f"mutation: {m}")
    return manifest


# ------------------------------------------------------------- specials axis

# The float-specials axis injects NaN, +Inf, -Inf, -0.0 (and plain 0.0,
# so the -0.0/0.0 distinctness question is actually posed) into DOUBLE
# measure columns and FLOAT[] embedding elements — the one value domain
# no other axis touches. Spark and DuckDB have well-known divergences
# here (NaN ordering/equality, -0.0 grouping and rendering, floor()
# returning BIGINT vs DOUBLE, decimal-cast behavior on specials); the
# r8 probe of exactly these semantics drove three engine/oracle fixes
# before the axis ever ran (guarded ROUND6, oracle NaN-strip before
# decimal casts, STDDEV_POP specials fallback).
#
# Scope: like the schema axis, this replays a QUERY SUBSET — the
# families that read the injected columns. The TPC-H price formulas
# (l_extendedprice, l_discount) are deliberately NOT injected: their
# decimal-exact mirrors define behavior on the finite TPC-H domain by
# contract (plain CAST AS DECIMAL raises on specials in BOTH engines —
# divergence class `dec_domain`, documented in SURVEY §5).

SPECIALS_TARGETS = [  # (table, double column) injection candidates
    ("customer", "c_acctbal"),
    ("supplier", "s_acctbal"),
    ("events", "value"),
]
# r9 palette extension: HUGE FINITES join the specials (the r8 masking
# advice flagged them untested at axis level — |v| past the BIGINT-floor
# saturation point exercises every guarded floor/ROUND template, and
# 5e10 sits INSIDE the W1 1e12 value domain so Wasserstein's SPLIT_CAST
# term path gets end-to-end coverage, not just its unit test). Appended
# so list order is stable; per-seed target columns are drawn BEFORE the
# palette sample, so existing seeds keep their targets (their drawn
# VALUES may change — each FUZZ.json row records its own manifest).
SPECIALS = ["'NaN'::DOUBLE", "'Infinity'::DOUBLE", "'-Infinity'::DOUBLE",
            "-0.0::DOUBLE", "0.0::DOUBLE",
            "1.0e300::DOUBLE", "5.0e10::DOUBLE"]

# Queries replayed under specials injection: every registered query that
# reads c_acctbal / s_acctbal / events.value or the embedding vectors,
# plus the full profile surface (whose decimal paths are domain-guarded
# by design and must fall back, not crash).
SPECIALS_QUERIES = [
    # profile family over the injected tables (guarded decimal paths)
    "profile_customer", "profile_supplier", "profile_events",
    "profile_embeddings", "profile_database_scan", "profile_catalog_scan",
    "dataset_sizes", "db_health_summary", "profile_lineitem_approx",
    "profile_events_windowed", "profile_customer_by_segment",
    "rollup_profile_customer", "cube_profile_customer",
    "suggest_constraints_customer", "publish_metrics_parquet",
    "catalog_params_sink",
    # events.value consumers
    "zscore_events", "rolling_stats_events", "impute_events",
    "changepoint_events", "trend_slopes_events", "ohlc_events",
    "hourly_value_bands_events", "jsd_events_halves", "ks_events_halves",
    "w1_events_halves", "ab_compare_events", "wow_change_events",
    "drift_gate_events", "compact_events", "json_profile_events",
    "temporal_profile_events", "completeness_slices_events",
    "null_patterns_events", "rank_normalize_events",
    # c_acctbal / s_acctbal consumers
    "mask_customer", "k_anonymity_customer", "scd2_customer",
    "pareto_customers", "align_union_orders",
    # embedding consumers (vectors get specials too)
    "vector_dim_stats", "vector_norm_stats", "project_embeddings",
    "quantize_embeddings", "embedding_drift_halves",
    "pool_embeddings_by_label", "truncation_recall_embeddings",
    # similarity / clustering over the injected vectors (the normalize->
    # candidate->verify pipeline must agree on NaN ordering end-to-end)
    "dedup_embedding", "dedup_embedding_exact", "ann_cosine_topk",
    "ann_ivf_topk", "ann_lsh_topk", "knn_join_embeddings",
    "kmeans_step", "kmeans_train", "ivf_inertia_embeddings",
    "dedup_incremental_lsh",
]


def build_specials_dir(outdir: str, seed: int) -> list[str]:
    """Build a specials-injected copy of SRC at ``outdir``; returns the
    mutation manifest (recorded in FUZZ.json). Injection sites are
    value-hash-seeded (reproducible, no engine RNG): ~1% of rows per
    special per chosen column."""
    import random

    rng = random.Random(seed)
    targets = rng.sample(SPECIALS_TARGETS, k=rng.randint(2, len(SPECIALS_TARGETS)))
    specials = rng.sample(SPECIALS, k=rng.randint(3, len(SPECIALS)))
    emb_special = rng.choice(SPECIALS)

    con = duckdb.connect()
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    by_table = {}
    for t, c in targets:
        by_table.setdefault(t, []).append(c)
    manifest: list[str] = []
    for t in tables:
        src = f"{SRC}/{t}.parquet"
        cols = [
            r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        sel = []
        for c in cols:
            expr = c
            if c in by_table.get(t, []):
                # hash-seeded slot in [0, 100): one slot per special
                slot = f"hash({', '.join(cols)}, {seed}) % 100"
                arms = " ".join(
                    f"WHEN {slot} = {i} THEN {sp}"
                    for i, sp in enumerate(specials)
                )
                expr = f"CASE {arms} ELSE {c} END"
                manifest.append(
                    f"specials {t}.{c}: {len(specials)}% rows -> "
                    + ", ".join(specials)
                )
            if t == "embeddings" and c == "embedding":
                # ~1% of vectors get ONE special element (hash-picked dim)
                expr = (
                    f"CASE WHEN hash(vec_id, {seed}) % 100 = 0 THEN "
                    f"list_transform(range(1, len(embedding) + 1), "
                    f"i -> CASE WHEN i = 1 + hash(vec_id, {seed + 1}) "
                    f"% len(embedding) THEN CAST({emb_special} AS FLOAT) "
                    f"ELSE embedding[i] END) "
                    f"ELSE embedding END"
                )
                manifest.append(f"specials embeddings.embedding: 1% vectors, one element -> {emb_special}")
            sel.append(f"({expr}) AS {c}")
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{src}') "
            f"TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        a = con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        b = con.sql(f"DESCRIBE SELECT * FROM '{outdir}/{t}.parquet'").fetchall()
        if [(x[0], x[1]) for x in a] != [(x[0], x[1]) for x in b]:
            raise SystemExit(f"schema drift in specials {t}: {a} vs {b}")
        n = con.sql(f"SELECT COUNT(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows")
    con.close()
    for m in manifest:
        print(f"mutation: {m}")
    return manifest


# --------------------------------------------------------------- layout axis

# The layout axis rewrites every table with IDENTICAL values but a seeded
# physical layout: one giant row group, many tiny row groups, a DIRECTORY
# of shard files, and/or a scrambled row order. Values being equal, the
# standard oracles apply unchanged and the FULL surface replays; what it
# tests is everything that must be layout-invariant — scan parallelism and
# the ensure_parallelism split estimator (row-group math, directory
# listing), directory-vs-file table resolution in both engines, and any
# input-order sensitivity hiding in a query (tie-breaks must be
# value-based, never row-order; a top-k whose ties break "whichever task
# finished first" fails here and nowhere else).

LAYOUTS = ("giant_rg", "tiny_rg", "shards", "asis")


def build_layout_dir(outdir: str, seed: int, src_dir: str | None = None) -> list[str]:
    """Rewrite ``src_dir`` (default SRC) at ``outdir`` with seeded
    per-table physical layouts; values identical. Returns the per-table
    layout manifest. ``src_dir`` lets the combined --schema --layout mode
    layout-rewrite an already-schema-mutated directory."""
    import random

    import pyarrow.parquet as pq

    src_dir = src_dir or SRC
    rng = random.Random(seed)
    con = duckdb.connect()
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    manifest: list[str] = []
    for t in tables:
        src = f"{src_dir}/{t}.parquet"
        # the source table may itself be a shard DIRECTORY (a prior layout
        # run, or the schema stage of the combined axis): read via glob
        # and sum the part sizes — getsize() on a directory returns the
        # inode size and a plain-path DuckDB read fails
        if os.path.isdir(src):
            src_parts = [
                os.path.join(src, f)
                for f in os.listdir(src)
                if f.endswith(".parquet")
            ]
            if not src_parts:
                raise SystemExit(f"no .parquet parts in source table {src}")
            src_rd = f"{src}/*.parquet"
            src_size = sum(os.path.getsize(p) for p in src_parts)
        else:
            src_rd = src
            src_size = os.path.getsize(src)
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src_rd}'").fetchall()]
        n_rows = con.sql(f"SELECT COUNT(*) FROM '{src_rd}'").fetchone()[0]
        layout = rng.choice(LAYOUTS)
        shuffle = rng.random() < 0.5
        # seeded value-based total order: DuckDB hash() is variadic and
        # NULL-safe, so every row gets a deterministic scramble key
        order = (
            f"ORDER BY hash({', '.join(cols)}, {seed})" if shuffle else ""
        )
        dst = f"{outdir}/{t}.parquet"
        # a re-run may leave a prior layout behind (shards COPY refuses a
        # non-empty dir; a dir blocks a plain-file COPY): clear it
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.exists(dst):
            os.remove(dst)
        body = f"SELECT * FROM '{src_rd}' {order}"
        if layout == "giant_rg":
            con.execute(
                f"COPY ({body}) TO '{dst}' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE 100000000)"
            )
        elif layout == "tiny_rg":
            con.execute(
                f"COPY ({body}) TO '{dst}' (FORMAT PARQUET, ROW_GROUP_SIZE 2048)"
            )
        elif layout == "shards":
            # directory of part files: FILE_SIZE_BYTES rolls to a new file
            # once the current one passes the threshold (needs several row
            # groups per table for the roll to trigger)
            size = src_size
            con.execute(
                f"COPY ({body}) TO '{dst}' (FORMAT PARQUET, "
                f"FILE_SIZE_BYTES {max(size // 4, 16384)}, "
                f"ROW_GROUP_SIZE {max(2048, (n_rows // 16) + 1)})"
            )
        else:
            con.execute(f"COPY ({body}) TO '{dst}' (FORMAT PARQUET)")
        if os.path.isdir(dst):
            parts = sorted(
                os.path.join(dst, f)
                for f in os.listdir(dst)
                if f.endswith(".parquet")
            )
        else:
            parts = [dst]
        rgs = sum(pq.ParquetFile(p).num_row_groups for p in parts)
        got = con.sql(
            "SELECT COUNT(*) FROM "
            f"'{dst + '/*.parquet' if os.path.isdir(dst) else dst}'"
        ).fetchone()[0]
        if got != n_rows:
            raise SystemExit(f"layout rewrite dropped rows in {t}: {got} != {n_rows}")
        desc = f"{t}: {layout}{'+shuffle' if shuffle else ''}"
        desc += f" -> {len(parts)} file(s), {rgs} row group(s), {n_rows} rows"
        manifest.append(desc)
        print(f"built {desc}")
    con.close()
    return manifest


def build_dir(outdir: str, seed: int) -> None:
    con = duckdb.connect()
    # one seeded stream for the whole build: fully reproducible per seed
    con.execute(f"SELECT setseed({(seed % 997) / 997.0})")
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for t in tables:
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        sel = []
        for c in cols:
            expr = c
            if c in PERTURB:
                expr = PERTURB[c].format(c=c)
            if t in TS_JITTER and c == TS_JITTER[t]:
                expr = (
                    f"({c} + to_microseconds("
                    f"CAST(floor((random() * 24.0 - 12.0) * 3.6e9) AS BIGINT)))"
                )
            if t == "embeddings" and c == "embedding":
                expr = (
                    "CASE WHEN random() < 0.02 "
                    "THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT)) "
                    "ELSE list_transform(embedding, "
                    "x -> CAST(x + (random() - 0.5) * 0.01 AS FLOAT)) END"
                )
            if c in NULLABLE.get(t, []):
                expr = f"CASE WHEN random() < 0.03 THEN NULL ELSE ({expr}) END"
            sel.append(f"({expr}) AS {c}")
        frac = SAMPLE_FRAC.get(t, 0.7)
        where = "TRUE" if frac >= 1.0 else f"random() < {frac}"
        src_cols = ", ".join(sel)
        con.execute(
            f"COPY (SELECT {src_cols} FROM '{SRC}/{t}.parquet' WHERE {where}) "
            f"TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        # type check: mutated file must match the source schema exactly
        a = con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        b = con.sql(f"DESCRIBE SELECT * FROM '{outdir}/{t}.parquet'").fetchall()
        if [(x[0], x[1]) for x in a] != [(x[0], x[1]) for x in b]:
            raise SystemExit(f"schema drift in mutated {t}: {a} vs {b}")
        n = con.sql(f"SELECT COUNT(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows")
    con.close()


def _record_run(path: str, row: dict) -> None:
    """Append ``row`` to the seed matrix at ``path`` (replacing any prior
    row for the same (seed, src, mode, scope) so re-runs update in place).

    ``scope`` is part of the key by round-5 advice: a partial re-run with
    an explicit query subset must NOT overwrite a full-surface row — it
    records separately, visibly labeled by its query list."""
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {"runs": []}

    def key(r):
        return (r.get("seed"), r.get("src"), r.get("mode", "content"),
                tuple(r.get("scope") or ()))

    doc["runs"] = [r for r in doc.get("runs", []) if key(r) != key(row)] + [row]
    doc["runs"].sort(key=lambda r: (r.get("src", ""), r.get("mode", ""),
                                    r.get("seed", 0)))
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--schema", action="store_true",
                    help="schema-mutation axis (replays SCHEMA_QUERIES)")
    ap.add_argument("--layout", action="store_true",
                    help="layout-mutation axis (identical values, seeded "
                         "row groups / shard files / row order; full surface)")
    ap.add_argument("--sparkconf", action="store_true",
                    help="session-config axis (pristine data, seeded Spark "
                         "execution shape; full surface)")
    ap.add_argument("--skew", action="store_true",
                    help="skew axis (seeded hot-key amplification + "
                         "NULL-key groups; full surface)")
    ap.add_argument("--specials", action="store_true",
                    help="float-specials axis (seeded NaN/±Inf/-0.0 "
                         "injection into double measures + embeddings; "
                         "replays SPECIALS_QUERIES)")
    ap.add_argument("--record", default=None,
                    help="append a JSON seed-matrix row to this file")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    if args.sparkconf and (args.schema or args.layout or args.skew
                           or args.specials):
        ap.error("--sparkconf cannot combine with data-mutation axes")
    if args.skew and (args.schema or args.layout):
        ap.error("--skew combines only with --specials")
    if args.specials and (args.schema or args.layout):
        ap.error("--specials combines only with --skew")
    if args.sparkconf and args.outdir:
        ap.error("--outdir is meaningless with --sparkconf (no data written)")
    mode = ("schema+layout" if args.schema and args.layout
            else "specials+skew" if args.specials and args.skew
            else "schema" if args.schema else "layout" if args.layout
            else "conf" if args.sparkconf else "skew" if args.skew
            else "specials" if args.specials
            else "content")
    outdir = args.outdir or f"/tmp/fuzzdata-{mode}-seed{args.seed}"
    manifest: list[str] = []
    conf: dict[str, str] = {}
    if args.schema and args.layout:
        # cross-product axis: structural edits first, then a seeded
        # physical rewrite of the mutated database — the oracle schema
        # derivation must read sharded-directory footers correctly
        staged = f"{outdir}-schema-stage"
        manifest = build_schema_dir(staged, args.seed)
        manifest += build_layout_dir(outdir, args.seed, src_dir=staged)
        # the staged copy's content now lives (re-laid-out) in outdir;
        # don't accumulate mutated datasets in /tmp across seeds
        shutil.rmtree(staged)
        run_queries = args.queries or SCHEMA_QUERIES
    elif args.schema:
        manifest = build_schema_dir(outdir, args.seed)
        run_queries = args.queries or SCHEMA_QUERIES
    elif args.layout:
        manifest = build_layout_dir(outdir, args.seed)
        run_queries = args.queries
    elif args.specials and args.skew:
        # cross-product axis: specials injection first, then hot-key
        # amplification of the injected tables — replicated hot groups
        # whose rows carry NaN/±Inf, the interaction neither axis poses
        # alone (hot NaN groupBy partitions, skewed joins with special
        # keys' payloads, windows over amplified special runs)
        staged = f"{outdir}-specials-stage"
        manifest = build_specials_dir(staged, args.seed)
        manifest += build_skew_dir(outdir, args.seed, src_dir=staged)
        shutil.rmtree(staged)
        run_queries = args.queries or SPECIALS_QUERIES
    elif args.skew:
        manifest = build_skew_dir(outdir, args.seed)
        run_queries = args.queries
    elif args.specials:
        manifest = build_specials_dir(outdir, args.seed)
        run_queries = args.queries or SPECIALS_QUERIES
    elif args.sparkconf:
        outdir = SRC  # pristine data; the session shape is the mutation
        conf = pick_conf(args.seed)
        manifest = [f"conf {k}={v}" for k, v in conf.items()]
        for m in manifest:
            print(f"mutation: {m}")
        run_queries = args.queries
    else:
        build_dir(outdir, args.seed)
        run_queries = args.queries
    env = dict(
        os.environ,
        SPARK_GRAFT_CHECK_SF=outdir,
        SPARK_GRAFT_CHECK_TOLERANT="1",
    )
    if args.schema:
        env["SPARK_GRAFT_ORACLE_SCHEMA_DIR"] = outdir
    if conf:
        env["SPARK_GRAFT_CHECK_SPARK_CONF"] = json.dumps(conf)
    cmd = [sys.executable,
           os.path.join(os.path.dirname(__file__), "check_correctness.py"),
           *run_queries]
    if not args.record:
        return subprocess.call(cmd, env=env)
    proc = subprocess.run(cmd, env=env, stdout=subprocess.PIPE, text=True)
    sys.stdout.write(proc.stdout)
    counts = {"OK": 0, "WARN": 0, "ROWS": 0, "FAIL": 0}
    warn_classes: dict[str, int] = {}
    failed: list[str] = []
    # \r-split: a console progress bar can share a line with a result;
    # the two-space anchor keeps log4j "WARN Class:" lines out.
    for line in proc.stdout.replace("\r", "\n").splitlines():
        m = re.match(r"(OK|WARN|ROWS|FAIL)\s\s+(\S+?):", line)
        if not m:
            continue
        kind, qname = m.group(1), m.group(2)
        counts[kind] += 1
        if kind == "FAIL":
            failed.append(qname)
        elif kind == "WARN":
            for cls, n in re.findall(r"'(\w+)': (\d+)", line):
                warn_classes[cls] = warn_classes.get(cls, 0) + int(n)
    row = {
        "seed": args.seed,
        "src": SRC,
        "mode": mode,
        # a full-surface run (no explicit subset) records scope null;
        # anything narrower records its exact query list
        "scope": sorted(run_queries) if run_queries else None,
        "ok": counts["OK"],
        "warn": counts["WARN"],
        "rows_only": counts["ROWS"],
        "fail": counts["FAIL"],
        "warn_classes": warn_classes,
        "failed_queries": failed,
        "exit": proc.returncode,
    }
    if manifest:
        row["mutations"] = manifest
    _record_run(args.record, row)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main())
