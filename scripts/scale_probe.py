"""sf0.1 -> sf1 scale probe: measure, don't assume.

The repo's scale story ("one shuffle on the content hash", "candidate
join on band keys only", "map-side argmax over broadcast centroids") is
argued from plan shapes; this script MEASURES it one decade up. It
builds an sf1 dataset (10x sf0.1) by key-shifted replication — fact and
dimension keys offset per replica so cardinalities scale like a real
sf1; document text is word-order-rehashed per replica (fresh shingle
sets, so the near-dup rate does not degenerate into 10-way duplicate
clusters) and embeddings get per-replica hash noise (fresh vectors, same
distribution) — then runs the five scale-audited query families once at
each sf, recording wall seconds and shuffle read/write bytes from
Spark's status REST API, and writes SCALE.md.

Near-linear wall growth (~10x +/- the constant-overhead floor) and
near-linear shuffle-byte growth are the claims under test; a
super-linear jump flags a candidate-generation or shuffle-volume bug
the sf0.1 bench can't see.

Usage: python scripts/scale_probe.py [--outdir /tmp/scaledata-sf1]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time
import urllib.request

import duckdb

sys.path.insert(0, "/root/repo")

SRC = "/root/testdata/sf0.1"
REPLICAS = 10

# per-table key columns to offset per replica: {table: {col: base_table}}
# (the offset for col is REPLICA_INDEX * (max key in base_table + 1), so
# foreign keys track their dimension's shift)
KEY_SHIFTS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}

PROBE_QUERIES = [
    "profile_database_scan",   # fused-scan profile of every table
    "dedup_minhash_lsh",       # banded LSH self-join on documents
    "ann_ivf_topk",            # IVF-bucketed ANN on embeddings
    "sessionize_events",       # per-user session windows
    "q3_shipping_priority",    # star join orders x lineitem x customer
    "q5_local_supplier_volume",  # 6-way star join
    # r9: the exact-percentile family — the open scale question. These
    # top the bench because exact percentile()/rank sorts pay O(n log n)
    # per column; this measures whether the exact path stays viable one
    # decade up or percentile_approx must be the registered scale path.
    "equidepth_histogram_lineitem",  # exact equi-depth bin edges
    "spearman_lineitem",             # dense-rank both columns, corr
    "winsorized_stats_lineitem",     # exact p05/p95 clip + moments
]


def build_sf1(outdir: str) -> None:
    con = duckdb.connect()
    pathlib.Path(outdir).mkdir(parents=True, exist_ok=True)
    offsets: dict[tuple[str, str], int] = {}
    for t, shifts in KEY_SHIFTS.items():
        for col, (bt, bc) in shifts.items():
            if (bt, bc) not in offsets:
                offsets[(bt, bc)] = (
                    con.sql(
                        f"SELECT MAX({bc}) + 1 FROM '{SRC}/{bt}.parquet'"
                    ).fetchone()[0]
                )
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
            f"TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"built {t} (copied)")
    for t, shifts in KEY_SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()
        ]
        parts = []
        for i in range(REPLICAS):
            sel = []
            for c in cols:
                if c in shifts:
                    off = offsets[shifts[c]] * i
                    sel.append(f"({c} + {off}) AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # fresh shingles per replica WITHOUT changing word
                    # order: ~half the token occurrences gain a suffix
                    # keyed by hash(word, position, replica). Identical
                    # source texts mutate identically, so the source's
                    # near-dup structure replicates linearly within each
                    # replica, while across replicas the mutations differ
                    # and trigram overlap drops to ~12.5% (below the LSH
                    # threshold). (Sorting words instead — the first
                    # attempt — grouped repeated words into corpus-wide
                    # shared trigrams over the tiny synthetic vocabulary
                    # and produced a 3000-doc hot LSH bucket: a builder
                    # artifact, not engine behavior.)
                    sel.append(
                        "array_to_string(list_transform("
                        "range(1, len(string_split(text, ' ')) + 1), "
                        f"k -> CASE WHEN hash(string_split(text, ' ')[k], k, {i}) % 2 = 0 "
                        f"THEN string_split(text, ' ')[k] || '_' || "
                        f"CAST(hash(string_split(text, ' ')[k], k, {i}, 7) % 100000 AS VARCHAR) "
                        "ELSE string_split(text, ' ')[k] END), ' ') AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # fresh vectors, same distribution: +-0.05 hash noise
                    sel.append(
                        "list_transform(range(1, len(embedding) + 1), "
                        f"d -> CAST(embedding[d] + (CAST(hash(vec_id, d, {i}) "
                        "% 1000 AS BIGINT) - 500) / 10000.0 AS FLOAT)) AS embedding"
                    )
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet'"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{outdir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{outdir}/{t}.parquet'").fetchone()[0]
        print(f"built {t}: {n} rows")
    con.close()


# ------------------------------------------------------------- measurement

def _rest(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    app = spark.sparkContext.applicationId
    url = f"http://localhost:{port}/api/v1/applications/{app}/{path}"
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def _shuffle_totals(spark) -> tuple[int, int, int]:
    """(shuffle read bytes, shuffle write bytes, input bytes) summed over
    all completed stages so far. The status store updates asynchronously
    after an action returns, so poll until two consecutive reads agree."""
    def read():
        rd = wr = inp = 0
        for st in _rest(spark, "stages?status=complete"):
            rd += st.get("shuffleReadBytes", 0)
            wr += st.get("shuffleWriteBytes", 0)
            inp += st.get("inputBytes", 0)
        return rd, wr, inp

    prev = read()
    for _ in range(10):
        time.sleep(0.5)
        cur = read()
        if cur == prev:
            return cur
        prev = cur
    return prev


def _force(df) -> None:
    """Materialize EVERY output column: a bare count() lets Catalyst
    prune row-count-preserving operators (a window-only plan loses its
    whole shuffle), so hash-aggregate all columns instead."""
    cols = ", ".join(f"`{c}`" for c in df.columns)
    # bit_xor: overflow-free under ANSI (sum(hash) overflows BIGINT)
    df.selectExpr(f"bit_xor(xxhash64({cols}))").collect()


def run_probe(spark, qs, sf_dir: str) -> dict:
    from data_profiler_for_aws_glue_data_catalog_spark.sources.registry import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()  # warm file listing + page cache
    out = {}
    for name in PROBE_QUERIES:
        # untimed first run: JIT/codegen compilation inflates the first
        # execution of a plan by seconds — the probe compares warm runs
        spark.catalog.clearCache()
        _force(qs[name](spark, sf_dir))
        spark.catalog.clearCache()
        r0, w0, i0 = _shuffle_totals(spark)
        t0 = time.perf_counter()
        _force(qs[name](spark, sf_dir))
        wall = time.perf_counter() - t0
        r1, w1, i1 = _shuffle_totals(spark)
        out[name] = {
            "wall_s": round(wall, 2),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "input_mb": round((i1 - i0) / 1e6, 2),
        }
        print(sf_dir, name, out[name])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/scaledata-sf1")
    ap.add_argument("--skip-build", action="store_true")
    args = ap.parse_args()
    if not args.skip_build:
        build_sf1(args.outdir)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")  # REST API = shuffle metrics
        .config("spark.driver.memory", "48g")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .appName("data_profiler_for_aws_glue_data_catalog_spark-scale-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    small = run_probe(spark, qs, SRC)
    big = run_probe(spark, qs, args.outdir)

    lines = [
        "# SCALE — sf0.1 -> sf1 measured probe (r9)",
        "",
        "10x data (key-shifted replication; fresh document shingles and",
        "embedding noise per replica — see scripts/scale_probe.py), one",
        "timed run per query per sf on local[32]. Wall ratios carry the",
        "usual host noise band; shuffle bytes are exact task metrics.",
        "",
        "| query | wall sf0.1 (s) | wall sf1 (s) | ratio | shuffle w sf0.1 (MB) | shuffle w sf1 (MB) | ratio | input sf1/sf0.1 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in PROBE_QUERIES:
        s, b = small[name], big[name]
        wr = round(b["wall_s"] / s["wall_s"], 2) if s["wall_s"] else None
        sw = (
            round(b["shuffle_write_mb"] / s["shuffle_write_mb"], 2)
            if s["shuffle_write_mb"]
            else None
        )
        ir = (
            round(b["input_mb"] / s["input_mb"], 2) if s["input_mb"] else None
        )
        lines.append(
            f"| {name} | {s['wall_s']} | {b['wall_s']} | {wr} "
            f"| {s['shuffle_write_mb']} | {b['shuffle_write_mb']} | {sw} "
            f"| {ir} |"
        )
    lines += [
        "",
        f"Raw JSON: sf0.1 {json.dumps(small)}",
        f"sf1 {json.dumps(big)}",
        "",
    ]
    with open("/root/repo/SCALE.md", "w") as f:
        f.write("\n".join(lines))
    print("wrote SCALE.md")


if __name__ == "__main__":
    main()
