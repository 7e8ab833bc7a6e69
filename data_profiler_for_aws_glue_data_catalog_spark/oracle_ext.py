"""DuckDB-SQL mirrors of the LLM-pipeline extension operators.

Each builder returns SQL whose expressions reproduce the Spark operators in
``operators/text_analysis.py`` / ``operators/dedup.py`` /
``operators/similarity.py`` term-by-term — same normalization, same md5
hashing, same integer arithmetic, same fixed-shape double expressions, same
floor-based ROUND6 — so the driver's value-hash comparison passes exactly.

SQL-string helpers take the *text of an expression* (a column name or
nested SQL) and return the text of the derived expression.
"""

from __future__ import annotations

from data_profiler_for_aws_glue_data_catalog_spark.functions.text import (
    M32,
    MINHASH_A,
    MINHASH_B,
)
from data_profiler_for_aws_glue_data_catalog_spark.operators.text_analysis import (
    LANGS,
    STOPWORDS,
    TOKEN_EST_PATTERN,
)

HEX = "0123456789abcdef"


def norm_sql(c: str) -> str:
    return f"trim(regexp_replace(lower({c}), '[^a-z0-9]+', ' ', 'g'))"


def toks_sql(c: str) -> str:
    return f"list_filter(string_split({norm_sql(c)}, ' '), t -> t <> '')"


def round6_sql(x: str) -> str:
    # guarded like the engine's ROUND6 template: specials and huge
    # finites pass through unrounded on both sides (r8 specials axis)
    return (
        f"CASE WHEN abs({x}) < 9.0e12 "
        f"THEN floor(({x}) * 1000000.0 + 0.5) / 1000000.0 ELSE ({x}) END"
    )


def shingles_sql(toks: str, n: int) -> str:
    """Distinct word n-gram shingles of a token-list expression."""
    grams = (
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> array_to_string(({toks})[i:i + {n - 1}], ' '))"
    )
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN {grams} "
        f"ELSE CAST([] AS VARCHAR[]) END)"
    )


def seeded_hash_sql(s: str, seed: int) -> str:
    return f"md5('{seed}|' || ({s}))"


def hex32_to_long_sql(h: str) -> str:
    terms = " + ".join(
        f"(strpos('{HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"({terms})"


def hex60_to_long_sql(h: str) -> str:
    """First 15 hex digits as bigint — mirrors functions.text.hex60_to_long
    (conv-based in Spark; positional nibble sum here, same VALUE)."""
    terms = " + ".join(
        f"(strpos('{HEX}', substr({h}, {i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"({terms})"


def hashed_shingles_sql(toks: str, n: int) -> str:
    """Distinct 60-bit hashed word n-gram shingles — mirrors
    functions.text.hashed_word_shingles."""
    gram = f"array_to_string(({toks})[i:i + {n - 1}], ' ')"
    grams = (
        f"list_transform(range(1, len({toks}) - {n - 2}), "
        f"i -> {hex60_to_long_sql(f'md5({gram})')})"
    )
    return (
        f"list_distinct(CASE WHEN len({toks}) >= {n} THEN {grams} "
        f"ELSE CAST([] AS BIGINT[]) END)"
    )


def token_hashes32_sql(toks: str) -> str:
    return (
        f"list_transform(list_transform({toks}, t -> md5(t)), "
        f"h -> {hex32_to_long_sql('h')})"
    )


def simhash32_sql(hashes: str) -> str:
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform({hashes}, "
        f"v -> ((v >> {j}) & 1) * 2 - 1)) > 0 THEN {2 ** j} ELSE 0 END)"
        for j in range(32)
    )
    return f"(CASE WHEN len({hashes}) > 0 THEN {bits} ELSE 0 END)"


def stop_hits_sql(toks: str, lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks}, t -> list_contains([{lst}], t)))"


def _docs_with_tokens(table: str, text_col: str, id_col: str) -> str:
    return (
        f"SELECT {id_col}, {text_col} AS _text, {toks_sql(text_col)} AS _toks "
        f"FROM {table}"
    )


def text_stats_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    nt = "len(_toks)"
    nc = "length(_text)"
    return f"""
WITH base AS ({_docs_with_tokens(table, text_col, id_col)})
SELECT {id_col},
  {nc} AS n_chars,
  {nt} AS n_tokens,
  len(list_distinct(_toks)) AS n_distinct_tokens,
  {round6_sql(f"length(array_to_string(_toks, '')) / nullif({nt}, 0)")} AS avg_token_len,
  len(regexp_extract_all(lower(_text), '{TOKEN_EST_PATTERN}')) AS token_est,
  {round6_sql(f"len(regexp_extract_all(lower(_text), '[a-z]')) / nullif({nc}, 0)")} AS alpha_ratio,
  {round6_sql(f"len(regexp_extract_all(lower(_text), '[0-9]')) / nullif({nc}, 0)")} AS digit_ratio
FROM base
"""


def language_id_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    hit_cols = ",\n  ".join(
        f"{stop_hits_sql('_toks', lang)} AS hits_{lang}" for lang in LANGS
    )
    gm = "greatest(" + ", ".join(f"hits_{lang}" for lang in LANGS) + ")"
    pred = "CASE WHEN " + gm + " = 0 THEN 'und' "
    for lang in LANGS:
        pred += f"WHEN hits_{lang} = {gm} THEN '{lang}' "
    pred += "ELSE 'und' END"
    cols = ", ".join(f"hits_{lang}" for lang in LANGS)
    return f"""
WITH base AS ({_docs_with_tokens(table, text_col, id_col)}),
h AS (SELECT {id_col},
  {hit_cols}
FROM base)
SELECT {id_col}, {cols}, {pred} AS lang_pred FROM h
"""


def quality_score_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH base AS ({_docs_with_tokens(table, text_col, id_col)}),
c AS (SELECT {id_col},
  CAST(length(_text) AS DOUBLE) AS n_chars,
  len(_toks) AS n_tokens,
  {stop_hits_sql('_toks', 'en')} AS stop_hits,
  len(regexp_extract_all(lower(_text), '[0-9]')) AS digits
FROM base),
s AS (SELECT {id_col},
  least(n_chars / 500.0, 1.0) AS len_score,
  least(5.0 * coalesce(CAST(stop_hits AS DOUBLE) / nullif(CAST(n_tokens AS DOUBLE), 0), 0.0), 1.0) AS stop_score,
  coalesce(CAST(digits AS DOUBLE) / nullif(n_chars, 0), 0.0) AS digit_ratio
FROM c)
SELECT {id_col},
  {round6_sql('len_score')} AS len_score,
  {round6_sql('stop_score')} AS stop_score,
  {round6_sql('digit_ratio')} AS digit_ratio,
  {round6_sql('0.4 * len_score + 0.4 * stop_score + 0.2 * (1.0 - digit_ratio)')} AS quality
FROM s
"""


def dot_sql(a: str, b: str) -> str:
    """Left-fold dot product in index order — mirrors operators.dedup.dot
    (F.aggregate over zip_with): list_reduce folds ((p1+p2)+p3)..., which
    equals Spark's ((0.0+p1)+p2)... bit-for-bit."""
    return (
        f"list_reduce(list_transform(range(1, len({a}) + 1), "
        f"i -> ({a})[i] * ({b})[i]), (x, y) -> x + y)"
    )


def exact_duplicates_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH h AS (SELECT {id_col}, md5({norm_sql(text_col)}) AS content_md5 FROM {table})
SELECT {id_col}, content_md5,
  count(*) OVER (PARTITION BY content_md5) AS group_size,
  {id_col} = min({id_col}) OVER (PARTITION BY content_md5) AS is_keep
FROM h
"""


def stream_dedup_exact_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """Mirror of the streaming exact dedup's deterministic output: the
    distinct normalized-content hashes (survivor identity is
    arrival-order-dependent and excluded from the contract)."""
    return (
        f"SELECT DISTINCT md5({norm_sql(text_col)}) AS content_md5 FROM {table}"
    )


def stream_occurrence_index_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """Mirror of streaming/stateful_dedup.stream_occurrence_index under a
    single-micro-batch run: occurrence = rank of id within its content
    group."""
    return f"""
WITH h AS (SELECT {id_col} AS id, md5({norm_sql(text_col)}) AS content_md5 FROM {table})
SELECT id, content_md5,
  CAST(row_number() OVER (PARTITION BY content_md5 ORDER BY id) AS INT) AS occurrence
FROM h
"""


def sessionize_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_us: int = 4 * 3600 * 1_000_000,
) -> str:
    """Mirror of operators/sessions.sessionize: gaps-and-islands with the
    same exact-microsecond gap comparison and (ts, id) ordering.

    DUPLICATE-ROW DETERMINISM: rn is taken from the SAME named window
    that computes new_s (one sort), and the outer running sum orders by
    (ts, event_id, rn) — a TOTAL order. Without rn, fully duplicated
    rows (the skew axis' hot-key amplification) tie in (ts, event_id),
    and the two independent window sorts may disagree on tie order,
    nondeterministically splitting an island across session ids."""
    return f"""
WITH e AS (
  SELECT {id_col} AS event_id, {user_col} AS user_id, {ts_col} AS ts
  FROM {table} WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL),
g AS (
  SELECT event_id, user_id, ts,
    row_number() OVER w AS rn,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
      OR lag(ts) OVER w IS NULL
    THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id,
  CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id, rn
       ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq
FROM g
"""


def session_stats_sql(
    table: str = "events",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap_us: int = 4 * 3600 * 1_000_000,
) -> str:
    """Mirror of operators/sessions.session_stats: sessions from the same
    gaps-and-islands, session_end = last event + gap (Spark session-window
    semantics), decimal-deterministic value sum.

    DUPLICATE-ROW DETERMINISM: same rn discipline as sessionize_sql —
    new_s and rn come from ONE named window, the running sum orders by
    (ts, rn), a total order. Found by skew seed 6 (64 identical copies
    of a hot user's events made the two independent ts-sorts disagree on
    tie order and split one session 64/63 between runs)."""
    return f"""
WITH e AS (
  SELECT {user_col} AS user_id, {ts_col} AS ts, {value_col} AS v
  FROM {table} WHERE {ts_col} IS NOT NULL AND {user_col} IS NOT NULL),
g AS (
  SELECT user_id, ts, v,
    row_number() OVER w AS rn,
    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
      OR lag(ts) OVER w IS NULL
    THEN 1 ELSE 0 END AS new_s
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, v,
    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, rn
         ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + to_microseconds({gap_us}) AS session_end,
  COUNT(*) AS n_events,
  CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
"""


def asof_join_sql(
    table: str = "events",
    left_type: str = "click",
    right_type: str = "view",
) -> str:
    """Mirror of operators/asof.asof_join via DuckDB's native ASOF JOIN.

    Right rows are deduped to the max-event_id row per (user, ts) first —
    the same winner the Spark side's (ts, tag, order) sort selects — so
    tie handling is identical across engines."""
    return f"""
WITH l AS (SELECT event_id, user_id, ts FROM {table}
           WHERE event_type = '{left_type}' AND ts IS NOT NULL AND user_id IS NOT NULL),
r0 AS (SELECT user_id, ts, event_id, value FROM {table}
       WHERE event_type = '{right_type}' AND ts IS NOT NULL AND user_id IS NOT NULL),
r AS (SELECT user_id, ts, arg_max(event_id, event_id) AS event_id,
             arg_max(value, event_id) AS value
      FROM r0 GROUP BY user_id, ts)
SELECT l.event_id, l.user_id, l.ts,
       r.event_id AS event_id_matched, r.value AS value_matched
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def interval_join_sql(
    table: str = "events",
    point_type: str = "error",
    gap_us: int = 4 * 3600 * 1_000_000,
) -> str:
    """Mirror of operators/interval_join over session intervals: each
    ``point_type`` event joined to the containing [start, end) session of
    its user (sessions from session_stats_sql's gaps-and-islands)."""
    return f"""
WITH sess AS ({session_stats_sql(table, gap_us=gap_us)}),
p AS (SELECT user_id, ts, event_id FROM {table}
      WHERE event_type = '{point_type}' AND ts IS NOT NULL AND user_id IS NOT NULL)
SELECT p.user_id, p.event_id, p.ts, sess.session_start
FROM p JOIN sess ON p.user_id = sess.user_id
  AND p.ts >= sess.session_start AND p.ts < sess.session_end
"""


def _bucket_sql(id_col: str, seed: int) -> str:
    """Mirror of operators/sampling.hash_bucket: first 32 md5 bits of
    'seed|id' as a bigint."""
    return hex32_to_long_sql(
        f"md5('{seed}|' || CAST({id_col} AS VARCHAR))"
    )


def _threshold(rate: float) -> int:
    return int(rate * M32)


def sample_sql(
    rate: float,
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_bucket_sql(id_col, seed)} < {_threshold(rate)}"
    )


def train_test_split_sql(
    test_rate: float = 0.2,
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    return f"""
SELECT *, CASE WHEN {_bucket_sql(id_col, seed)} < {_threshold(test_rate)}
  THEN 'test' ELSE 'train' END AS split
FROM {table}
"""


def stratified_sample_sql(
    rates: dict[str, float],
    table: str = "documents",
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> str:
    thr = str(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = (
            f"CASE WHEN {strata_col} = '{value}' "
            f"THEN {_threshold(rate)} ELSE {thr} END"
        )
    return (
        f"SELECT * FROM {table} WHERE {_bucket_sql(id_col, seed)} < ({thr})"
    )


def sample_per_group_sql(
    k: int,
    table: str = "documents",
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """Mirror of sampling.sample_per_group: row_number over the same
    (bucket, id) ordering per group."""
    return f"""
SELECT * EXCLUDE (__rk) FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col}
    ORDER BY {_bucket_sql(id_col, seed)} ASC, {id_col} ASC
  ) AS __rk
  FROM {table}
) WHERE __rk <= {k}
"""


def chunk_documents_sql(
    chunk_tokens: int = 64,
    overlap: int = 16,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mirror of operators/chunking.chunk_documents: same tokenizer, same
    start-position arithmetic, same slicing (DuckDB list slices are
    1-based inclusive like Spark's slice(start, length) window)."""
    step = chunk_tokens - overlap
    return f"""
WITH d AS (SELECT {id_col} AS id, {toks_sql(text_col)} AS toks FROM {table}),
s AS (
  SELECT id, toks,
         unnest(range(1, greatest(len(toks), 0) + 1, {step})) AS start
  FROM d)
SELECT id,
  CAST((start - 1) / {step} AS INT) AS chunk_seq,
  CAST(len(toks[start : start + {chunk_tokens} - 1]) AS INT) AS n_tokens,
  array_to_string(toks[start : start + {chunk_tokens} - 1], ' ') AS chunk_text
FROM s
"""


def token_topk_sql(
    k: int = 100,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mirror of operators/vocabulary.token_topk (same tokenizer, same
    (occurrences DESC, token ASC) tie-break)."""
    return f"""
WITH pairs AS (
  SELECT id, token, COUNT(*) AS cnt FROM (
    SELECT {id_col} AS id, unnest({toks_sql(text_col)}) AS token FROM {table})
  GROUP BY id, token),
vocab AS (
  SELECT token, SUM(cnt) AS occurrences, COUNT(*) AS doc_freq
  FROM pairs GROUP BY token)
SELECT token, occurrences, doc_freq,
  CAST(row_number() OVER (ORDER BY occurrences DESC, token ASC) AS INT) AS rank
FROM vocab ORDER BY occurrences DESC, token ASC LIMIT {k}
"""


def clean_corpus_sql(
    min_quality: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mirror of operators/corpus.clean_corpus: the quality/lang/hash
    expressions come from the same builders the standalone oracles use
    (quality_score_sql / language_id_sql shapes), composed with the
    filter-then-dedup window."""
    langs_sql = ", ".join(f"'{l}'" for l in langs)
    return f"""
WITH q AS ({quality_score_sql(table, text_col, id_col)}),
l AS ({language_id_sql(table, text_col, id_col)}),
h AS (SELECT {id_col} AS id, md5({norm_sql(text_col)}) AS content_md5 FROM {table}),
s AS (
  SELECT h.id, l.lang_pred, q.quality, h.content_md5
  FROM h
  JOIN q ON q.{id_col} = h.id
  JOIN l ON l.{id_col} = h.id
  WHERE q.quality >= {min_quality} AND l.lang_pred IN ({langs_sql}))
SELECT id, lang_pred, quality, content_md5 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY content_md5 ORDER BY id)
    AS _rn FROM s)
WHERE _rn = 1
"""


def tfidf_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_freq: int = 1,
) -> str:
    """Mirror of operators/tfidf.tfidf: same tokenizer, exact integer
    tf/df, same fixed double expression ROUND6'd (ln is libm — the
    Entropy 6-dp precedent)."""
    df_filter = (
        f"HAVING COUNT(*) >= {min_doc_freq}" if min_doc_freq > 1 else ""
    )
    return f"""
WITH pairs AS (
  SELECT id, token, COUNT(*) AS tf FROM (
    SELECT {id_col} AS id, unnest({toks_sql(text_col)}) AS token FROM {table})
  GROUP BY id, token),
dfreq AS (
  SELECT token, COUNT(*) AS doc_freq FROM pairs GROUP BY token {df_filter}),
n AS (SELECT COUNT(*) AS _n FROM {table})
SELECT pairs.id, pairs.token, pairs.tf, dfreq.doc_freq,
  {round6_sql("CAST(pairs.tf AS DOUBLE) * ln(CAST(n._n AS DOUBLE) / dfreq.doc_freq)")} AS tfidf
FROM pairs JOIN dfreq USING (token) CROSS JOIN n
"""


def _shingle_sets_sql(table: str, text_col: str, id_col: str, n: int) -> str:
    # stage the token list as a COLUMN before shingling: hashed_shingles_sql
    # references its toks operand several times (len / range / slice), and
    # inlining the split+filter expression there makes DuckDB re-evaluate it
    # per reference — measured 123 s -> 11 s for the sf0.1 shingle sets.
    return f"""
SELECT id, sh, len(sh) AS sz FROM (
  SELECT id, {hashed_shingles_sql("_toks", n)} AS sh
  FROM (SELECT {id_col} AS id, {toks_sql(text_col)} AS _toks FROM {table})
) WHERE len(sh) > 0
"""


def _jaccard_sql(co: str, sa: str, sb: str) -> str:
    return round6_sql(
        f"CAST({co} AS DOUBLE) / CAST({sa} + {sb} - ({co}) AS DOUBLE)"
    )


def jaccard_near_duplicates_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 1000,
) -> str:
    cap = ""
    if max_shingle_df is not None:
        cap = (
            f"hot AS (SELECT shingle FROM inv0 GROUP BY shingle "
            f"HAVING count(*) > {max_shingle_df}),\n"
            f"inv AS (SELECT * FROM inv0 WHERE shingle NOT IN "
            f"(SELECT shingle FROM hot)),"
        )
    else:
        cap = "inv AS (SELECT * FROM inv0),"
    return f"""
WITH s AS ({_shingle_sets_sql(table, text_col, id_col, n)}),
inv0 AS (SELECT id, sz, unnest(sh) AS shingle FROM s),
{cap}
pairs AS (
  SELECT a.id AS doc_a, b.id AS doc_b, a.sz AS sa, b.sz AS sb, count(*) AS co
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b, {_jaccard_sql('co', 'sa', 'sb')} AS jaccard FROM pairs
) WHERE jaccard >= {threshold}
"""


def minhash_lsh_near_duplicates_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    n_hashes: int = 12,
    n_bands: int = 6,
    rows_per_band: int = 2,
    threshold: float = 0.5,
) -> str:
    # 32-bit shingle hash = low 32 bits of the 60-bit hashed shingle
    sig_items = ", ".join(
        f"list_aggregate(list_transform(hs, h -> "
        f"({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {M32}), 'min')"
        for i in range(n_hashes)
    )
    band_items = ", ".join(
        "'b{b}:' || ".format(b=b)
        + " || ':' || ".join(
            f"CAST(sig[{b * rows_per_band + r + 1}] AS VARCHAR)"
            for r in range(rows_per_band)
        )
        for b in range(n_bands)
    )
    # MATERIALIZED: sig is consumed 3x (bands + both verify-join sides);
    # DuckDB would otherwise inline the shingle+minhash computation per
    # reference — measured 478 s -> ~13 s for the sf0.1 pairs relation.
    return f"""
WITH s AS MATERIALIZED ({_shingle_sets_sql(table, text_col, id_col, n)}),
hashed AS (SELECT id, sh, sz, list_transform(sh, h -> h % {M32}) AS hs FROM s),
sig AS MATERIALIZED (SELECT id, sh, sz, [{sig_items}] AS sig FROM hashed),
bands AS (SELECT id, unnest([{band_items}]) AS bk FROM sig),
cand AS (
  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
  FROM bands a JOIN bands b ON a.bk = b.bk AND a.id < b.id
)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b,
    {_jaccard_sql('len(list_intersect(sa.sh, sb.sh))', 'sa.sz', 'sb.sz')} AS jaccard
  FROM cand JOIN sig sa ON cand.doc_a = sa.id JOIN sig sb ON cand.doc_b = sb.id
) WHERE jaccard >= {threshold}
"""


def simhash_fingerprints_sql(table: str = "documents", text_col: str = "text", id_col: str = "doc_id") -> str:
    return f"""
WITH base AS ({_docs_with_tokens(table, text_col, id_col)}),
w AS (SELECT {id_col} AS id, {token_hashes32_sql('_toks')} AS _th FROM base)
SELECT id, {simhash32_sql('_th')} AS simhash FROM w
"""


def simhash_near_duplicates_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    return f"""
WITH fp AS ({simhash_fingerprints_sql(table, text_col, id_col)}),
banded AS (
  SELECT id, simhash, unnest(list_transform([0, 1, 2, 3],
    i -> CAST(i AS VARCHAR) || ':' || CAST((simhash >> (8 * i)) & 255 AS VARCHAR)
  )) AS bk FROM fp
),
cand AS (
  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b,
         a.simhash AS ha, b.simhash AS hb
  FROM banded a JOIN banded b ON a.bk = b.bk AND a.id < b.id
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b, CAST(bit_count(xor(ha, hb)) AS INT) AS hamming FROM cand
) WHERE hamming <= {max_hamming}
"""


def _normed_vectors_sql(
    table: str, vec_col: str, id_col: str, finite_only: bool = False
) -> str:
    """One row per id (entity-key contract, dedup.entity_normed parity):
    duplicate-id rows collapse to the lexicographically smallest
    (v, nrm) representative, zero vectors dropped first — same filter
    order as the engine's with_norm -> groupBy(id).min(struct).

    ``finite_only`` mirrors similarity._normed's r9 finite-vectors
    policy (NaN/±Inf elements give a non-finite norm; `nrm < Inf`
    excludes them — NaN compares greatest in both engines). The
    similarity-family oracles set it; kmeans/dedup-embedding keep their
    own documented NaN policies and leave it off."""
    fin = " AND nrm < CAST('Infinity' AS DOUBLE)" if finite_only else ""
    return f"""
SELECT id, v, nrm FROM (
  SELECT id, v, nrm,
    row_number() OVER (PARTITION BY id ORDER BY v, nrm) AS _rn
  FROM (
    SELECT {id_col} AS id, v, sqrt({dot_sql('v', 'v')}) AS nrm
    FROM (SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v FROM {table})
  ) WHERE nrm > 0{fin}
) WHERE _rn = 1
"""


def _assigned_cells_sql(n_cells: int) -> str:
    """cents + assigned CTE bodies over a normed CTE named ``n`` — nearest
    centroid by (cosine DESC, cell ASC), mirroring similarity.assign_cells."""
    acos = round6_sql(f"({dot_sql('n.v', 'c.cv')}) / (n.nrm * c.cn)")
    return f"""
cents AS (SELECT id AS cell, v AS cv, nrm AS cn FROM n ORDER BY id LIMIT {n_cells}),
assigned AS (
  SELECT id, v, nrm, cell FROM (
    SELECT n.id, n.v, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.id ORDER BY {acos} DESC, c.cell ASC) AS rn
    FROM n CROSS JOIN cents c
  ) WHERE rn = 1
)"""


def kmeans_step_sql(
    n_cells: int = 16,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Mirror of operators/kmeans.kmeans_step: same assignment CTEs, then
    per-(cell, dimension) decimal-accumulated means, floor-ROUND6."""
    # NaN/Inf elements strip to NULL inside the decimal SUM only
    # (mirrors Spark try_cast; COUNT(*) still counts the row) —
    # r8 float-specials axis
    mean = "CAST(SUM(CAST((CASE WHEN isnan(x) OR isinf(x) THEN NULL ELSE x END) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)"
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col)}),
{_assigned_cells_sql(n_cells)},
by_dim AS (
  SELECT cell, CAST(u.i - 1 AS INT) AS dim, u.x
  FROM assigned, LATERAL (
    SELECT generate_subscripts(v, 1) AS i, unnest(v) AS x) u)
SELECT cell, dim, {round6_sql(mean)} AS value, COUNT(*) AS n_members
FROM by_dim GROUP BY cell, dim
"""


def embedding_near_duplicates_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.4,
    n_cells: int | None = 16,
) -> str:
    cos = round6_sql(f"({dot_sql('a.v', 'b.v')}) / (a.nrm * b.nrm)")
    if n_cells is None:
        return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col)})
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.id AS vec_a, b.id AS vec_b, {cos} AS cosine
  FROM n a JOIN n b ON a.id < b.id
) WHERE cosine >= {threshold}
"""
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col)}),
{_assigned_cells_sql(n_cells)}
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.id AS vec_a, b.id AS vec_b, {cos} AS cosine
  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
) WHERE cosine >= {threshold}
"""


def cosine_topk_sql(
    query_ids: list[int],
    k: int = 10,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = round6_sql(f"({dot_sql('q.qv', 'n.v')}) / (q.qn * n.nrm)")
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col, finite_only=True)}),
q AS (SELECT id AS query_id, v AS qv, nrm AS qn FROM n WHERE id IN ({ids})),
scored AS (
  SELECT q.query_id, n.id AS neighbor_id, {cos} AS cosine
  FROM n CROSS JOIN q WHERE n.id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def ivf_topk_sql(
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    acos = round6_sql(f"({dot_sql('n.v', 'c.cv')}) / (n.nrm * c.cn)")
    pcos = round6_sql(f"({dot_sql('q.qv', 'c.cv')}) / (q.qn * c.cn)")
    scos = round6_sql(f"({dot_sql('p.qv', 'a.v')}) / (p.qn * a.nrm)")
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col, finite_only=True)}),
cents AS (SELECT id AS cell, v AS cv, nrm AS cn FROM n ORDER BY id LIMIT {n_cells}),
assigned AS (
  SELECT id, v, nrm, cell FROM (
    SELECT n.id, n.v, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.id ORDER BY {acos} DESC, c.cell ASC) AS rn
    FROM n CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT id AS query_id, v AS qv, nrm AS qn FROM n WHERE id IN ({ids})),
probes AS (
  SELECT query_id, cell, qv, qn FROM (
    SELECT q.query_id, c.cell, q.qv, q.qn,
      row_number() OVER (PARTITION BY q.query_id ORDER BY {pcos} DESC, c.cell ASC) AS pr
    FROM q CROSS JOIN cents c
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.id AS neighbor_id, {scos} AS cosine
  FROM assigned a JOIN probes p USING (cell) WHERE a.id <> p.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def fingerprints_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> str:
    sh = shingles_sql("_toks", shingle_words)
    minh = (
        f"CASE WHEN len(_sh) > 0 THEN "
        f"list_aggregate(list_transform(_sh, s -> {seeded_hash_sql('s', 0)}), 'min') "
        f"ELSE NULL END"
    )
    return f"""
WITH base AS ({_docs_with_tokens(table, text_col, id_col)}),
w AS (SELECT {id_col}, _text, _toks, {sh} AS _sh,
      {token_hashes32_sql('_toks')} AS _th
FROM base)
SELECT {id_col},
  md5({norm_sql('_text')}) AS content_md5,
  {minh} AS min_shingle_hash,
  {simhash32_sql('_th')} AS simhash
FROM w
"""


# ------------------------------------------------------------- multimodal

# Binary fixture: documents.text re-encoded as an opaque payload, plus a
# duplicated slice so dedup has real groups (operators/multimodal.py).
# DuckDB strings are UTF-8, so strlen() (bytes) == Spark length(binary) of
# CAST(text AS BINARY), and md5(VARCHAR) hashes the same bytes as Spark's
# md5 over the binary payload.

def _binary_fixture_sql(table: str, text_col: str, id_col: str, dup_n: int) -> str:
    return f"""
SELECT {id_col} AS id, {text_col} AS payload_text FROM {table}
UNION ALL
SELECT {id_col} + 1000000 AS id, {text_col} AS payload_text
FROM {table} WHERE {id_col} < {dup_n}
"""


def binary_profile_sql(
    table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id", dup_n: int = 50,
) -> str:
    fx = _binary_fixture_sql(table, text_col, id_col, dup_n)
    nb = "strlen(payload_text)"

    def row(name, value):
        return (
            f"SELECT 'Column' AS entity, 'payload' AS instance, "
            f"'{name}' AS name, {value} AS value, 'binary' AS type FROM fx"
        )

    return f"""
WITH fx AS ({fx})
{row("Completeness", "CAST(COUNT(payload_text) AS DOUBLE) / COUNT(*)")}
UNION ALL
{row("MaxByteLength", f"CAST(MAX({nb}) AS DOUBLE)")}
UNION ALL
{row("MinByteLength", f"CAST(MIN({nb}) AS DOUBLE)")}
UNION ALL
{row("MeanByteLength", f"CAST(SUM({nb}) AS DOUBLE) / COUNT(payload_text)")}
UNION ALL
{row("SumBytes", f"CAST(SUM({nb}) AS DOUBLE)")}
"""


def binary_dedup_sql(
    table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id", dup_n: int = 50,
) -> str:
    fx = _binary_fixture_sql(table, text_col, id_col, dup_n)
    return f"""
WITH fx AS ({fx})
SELECT md5(payload_text) AS digest,
       CAST(strlen(payload_text) AS BIGINT) AS n_bytes,
       COUNT(*) AS n_copies,
       MIN(id) AS keeper_id
FROM fx
GROUP BY 1, 2
HAVING COUNT(*) > 1
"""


def decode_features_sql(
    table: str = "documents", text_col: str = "text",
    id_col: str = "doc_id", dup_n: int = 50,
) -> str:
    """Mirror of the DETERMINISTIC FAKE decoder (multimodal._fake_decode):
    dims derive from byte length only, so they are SQL-expressible; the
    mean_byte feature is excluded here (unit-tested in Python instead)."""
    fx = _binary_fixture_sql(table, text_col, id_col, dup_n)
    nb = "strlen(payload_text)"
    return f"""
WITH fx AS ({fx})
SELECT id,
       CAST(1 + {nb} % 512 AS INT) AS width,
       CAST(1 + ({nb} * 7) % 512 AS INT) AS height,
       3 AS channels,
       CAST({nb} AS BIGINT) AS n_bytes
FROM fx
"""


# --- metric-history anomaly detection (operators/anomaly.py) ------------

ANOMALY_RUN_TS = (
    "2026-01-01 00:00:00",
    "2026-01-02 00:00:00",
    "2026-01-03 00:00:00",
)


def anomaly_history_factor(i: int) -> float:
    """Run i's perturbation factor for even-length metric names: runs walk
    1.0, 1.5, 3.0 so even-name metrics jump on the last run (anomaly) while
    odd-name metrics stay constant (zero-variance, no anomaly)."""
    return 1.0 + 0.5 * (i - 1) * (i - 1)


def metric_anomalies_sql(
    profile_sql: str,
    z_threshold: float = 3.0,
    min_runs: int = 2,
) -> str:
    """Mirror of anomaly.detect_anomalies over the deterministic 3-run
    history built from a profile relation (same perturbation rule, same
    6-dp rounding, same decimal accumulation and finishing shapes)."""
    runs = "\nUNION ALL\n".join(
        f"SELECT entity, instance, name, "
        f"value * (CASE WHEN length(name) % 2 = 0 THEN {anomaly_history_factor(i)!r} "
        f"ELSE 1.0 END) AS value, TIMESTAMP '{ts}' AS ts FROM p"
        for i, ts in enumerate(ANOMALY_RUN_TS, start=1)
    )
    v6 = round6_sql("CAST(value AS DOUBLE)")
    base = "ts < mx"
    _ma = f"MAX(ABS(v)) FILTER (WHERE {base})"
    in_dom = f"COALESCE({_ma} < 1e12 AND ({_ma} >= 1e-3 OR {_ma} = 0), FALSE)"
    s_dec = f"CAST(SUM(TRY_CAST(v AS DECIMAL(27,6))) FILTER (WHERE {base}) AS DOUBLE)"
    sq = "CAST(TRY_CAST(v AS DECIMAL(18,6)) AS DECIMAL(19,6))"
    s2_dec = (
        f"CAST(SUM({sq} * {sq}) "
        f"FILTER (WHERE {base}) AS DOUBLE)"
    )
    mean_b = "(_s / NULLIF(_nb, 0.0))"
    var_b = f"(_s2 / NULLIF(_nb, 0.0)) - {mean_b} * {mean_b}"
    sd_b = f"SQRT(GREATEST({var_b}, 0.0))"
    z = (
        f"CASE WHEN _minb = _maxb THEN NULL "
        f"ELSE (current - {mean_b}) / NULLIF({sd_b}, 0.0) END"
    )
    anomaly = (
        f"_nb >= {min_runs} AND ("
        f"COALESCE(ABS({z}) > {z_threshold!r}, FALSE) "
        f"OR (_minb = _maxb AND current <> _minb))"
    )
    return f"""
WITH p AS ({profile_sql}),
runs AS ({runs}),
r6 AS (SELECT entity, instance, name, {v6} AS v, ts FROM runs),
w AS (SELECT *, MAX(ts) OVER (PARTITION BY entity, instance, name) AS mx FROM r6),
a AS (
  SELECT entity, instance, name,
    arg_max(v, ts) AS current,
    CAST(COUNT(v) AS DOUBLE) AS _n,
    CAST(COUNT(v) FILTER (WHERE {base}) AS DOUBLE) AS _nb,
    MIN(v) FILTER (WHERE {base}) AS _minb,
    MAX(v) FILTER (WHERE {base}) AS _maxb,
    CASE WHEN {in_dom} THEN {s_dec} ELSE SUM(v) FILTER (WHERE {base}) END AS _s,
    CASE WHEN {in_dom} THEN {s2_dec} ELSE SUM(v * v) FILTER (WHERE {base}) END AS _s2
  FROM w GROUP BY entity, instance, name)
SELECT instance, name,
  CAST(_n AS BIGINT) AS n_runs,
  current,
  CAST({round6_sql(mean_b)} AS DOUBLE) AS baseline_mean,
  CAST({round6_sql(z)} AS DOUBLE) AS z,
  COALESCE({anomaly}, FALSE) AS is_anomaly
FROM a
"""


def metric_changes_sql(
    profile_sql: str,
    max_abs_decrease: float = 10.0,
    max_abs_increase: float = 10.0,
    min_rate: float = 0.8,
    max_rate: float = 1.25,
) -> str:
    """Mirror of anomaly.detect_changes over the same deterministic 3-run
    history (AbsoluteChange / RelativeRateOfChange strategies)."""
    runs = "\nUNION ALL\n".join(
        f"SELECT entity, instance, name, "
        f"value * (CASE WHEN length(name) % 2 = 0 THEN {anomaly_history_factor(i)!r} "
        f"ELSE 1.0 END) AS value, TIMESTAMP '{ts}' AS ts FROM p"
        for i, ts in enumerate(ANOMALY_RUN_TS, start=1)
    )
    v6 = round6_sql("CAST(value AS DOUBLE)")
    base = "ts < mx"
    abs_change = "current - previous"
    rel_rate = (
        "CASE WHEN previous IS NULL OR previous = 0.0 THEN NULL "
        "ELSE current / previous END"
    )
    abs_anom = (
        f"CASE WHEN previous IS NULL THEN NULL "
        f"ELSE ({abs_change}) < {-float(max_abs_decrease)!r} "
        f"OR ({abs_change}) > {float(max_abs_increase)!r} END"
    )
    rel_anom = (
        f"CASE WHEN ({rel_rate}) IS NULL THEN NULL "
        f"ELSE ({rel_rate}) < {float(min_rate)!r} "
        f"OR ({rel_rate}) > {float(max_rate)!r} END"
    )
    return f"""
WITH p AS ({profile_sql}),
runs AS ({runs}),
r6 AS (SELECT entity, instance, name, {v6} AS v, ts FROM runs),
w AS (SELECT *, MAX(ts) OVER (PARTITION BY entity, instance, name) AS mx FROM r6),
a AS (
  SELECT entity, instance, name,
    CAST(COUNT(v) AS BIGINT) AS n_runs,
    arg_max(v, ts) AS current,
    arg_max(CASE WHEN {base} THEN v END, CASE WHEN {base} THEN ts END) AS previous
  FROM w GROUP BY entity, instance, name)
SELECT instance, name, n_runs, current, previous,
  CAST({round6_sql(abs_change)} AS DOUBLE) AS abs_change,
  CAST({round6_sql(rel_rate)} AS DOUBLE) AS rel_rate,
  COALESCE({abs_anom}, FALSE) AS abs_anomaly,
  COALESCE({rel_anom}, FALSE) AS rel_anomaly
FROM a
"""


def lsh_topk_sql(
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 16,
    n_bands: int = 4,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Mirror of similarity.lsh_topk: same deterministic planes (smallest
    ids), same sign-bit band tokens, same candidate rule (>=1 shared
    band), same exact-cosine ranking."""
    ids = ", ".join(str(i) for i in query_ids)
    bpb = n_planes // n_bands
    cos = round6_sql(f"({dot_sql('nn.v', 'qq.v')}) / (nn.nrm * qq.nrm)")
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col, finite_only=True)}),
pl AS (
  SELECT CAST(row_number() OVER (ORDER BY id) - 1 AS INT) AS pidx, v AS pv
  FROM (SELECT id, v FROM n ORDER BY id LIMIT {n_planes})),
bits AS (
  SELECT n.id, p.pidx,
         CASE WHEN ({dot_sql('n.v', 'p.pv')}) >= 0 THEN 1 ELSE 0 END AS bit
  FROM n CROSS JOIN pl p),
bands AS (
  SELECT id,
         CAST(SUM(bit * (1 << (pidx % {bpb}))) + (pidx // {bpb}) * {1 << bpb} AS INT) AS tok
  FROM bits GROUP BY id, pidx // {bpb}),
qb AS (SELECT id AS query_id, tok FROM bands WHERE id IN ({ids})),
cand AS (
  SELECT DISTINCT bands.id, qb.query_id
  FROM bands JOIN qb ON bands.tok = qb.tok
  WHERE bands.id <> qb.query_id),
scored AS (
  SELECT c.query_id, c.id AS neighbor_id, {cos} AS cosine
  FROM cand c
  JOIN n nn ON nn.id = c.id
  JOIN n qq ON qq.id = c.query_id)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def _assign_from_sql(cents_cte: str, out_name: str) -> str:
    """Assignment CTE body: nearest centroid from ``cents_cte`` by
    (round6 cosine DESC, cell ASC) — similarity.assign_cells parity."""
    acos = round6_sql(f"({dot_sql('n.v', 'c.cv')}) / (n.nrm * c.cn)")
    return f"""{out_name} AS (
  SELECT id, v, nrm, cell FROM (
    SELECT n.id, n.v, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.id ORDER BY {acos} DESC, c.cell ASC) AS rn
    FROM n CROSS JOIN {cents_cte} c
  ) WHERE rn = 1
)"""


def kmeans_train_sql(
    n_cells: int = 16,
    n_iters: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Mirror of kmeans.kmeans_train: the Lloyd trajectory unrolled as
    CTE chains — per round, assignment over the previous round's
    centroids, decimal per-(cell, dim) means, then centroid vectors
    rebuilt (values in dim order, left-fold norm, zero-norm dropped),
    exactly the floats the driver loop feeds back as literals."""
    # NaN/Inf elements strip to NULL inside the decimal SUM only
    # (mirrors Spark try_cast; COUNT(*) still counts the row) —
    # r8 float-specials axis
    mean = "CAST(SUM(CAST((CASE WHEN isnan(x) OR isinf(x) THEN NULL ELSE x END) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)"
    parts = [
        f"n AS ({_normed_vectors_sql(table, vec_col, id_col)})",
        f"cents0 AS (SELECT id AS cell, v AS cv, nrm AS cn FROM n ORDER BY id LIMIT {n_cells})",
    ]
    prev = "cents0"
    for i in range(1, n_iters + 1):
        parts.append(_assign_from_sql(prev, f"a{i}"))
        parts.append(
            f"""bd{i} AS (
  SELECT cell, CAST(u.i - 1 AS INT) AS dim, u.x
  FROM a{i}, LATERAL (
    SELECT generate_subscripts(v, 1) AS i, unnest(v) AS x) u)"""
        )
        parts.append(
            f"m{i} AS (SELECT cell, dim, {round6_sql(mean)} AS value, "
            f"COUNT(*) AS n_members FROM bd{i} GROUP BY cell, dim)"
        )
        if i < n_iters:
            parts.append(
                f"cv{i} AS (SELECT cell, list(value ORDER BY dim) AS cv "
                f"FROM m{i} GROUP BY cell)"
            )
            nrm = f"sqrt({dot_sql('cv', 'cv')})"
            parts.append(
                f"cents{i} AS (SELECT cell, cv, {nrm} AS cn FROM cv{i} "
                f"WHERE {nrm} > 0)"
            )
            prev = f"cents{i}"
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT cell, dim, value, n_members FROM m{n_iters}"


def lang_confusion_sql(
    table: str = "documents",
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Mirror of text_analysis.lang_confusion: language_id composition +
    per-label fractions."""
    frac = round6_sql("CAST(n AS DOUBLE) / CAST(n_label AS DOUBLE)")
    return f"""
WITH pred AS ({language_id_sql(table, text_col, id_col)}),
pairs AS (
  SELECT d.{label_col} AS label, p.lang_pred AS predicted, COUNT(*) AS n
  FROM {table} d JOIN pred p ON d.{id_col} = p.{id_col}
  GROUP BY 1, 2
)
SELECT label, predicted, n,
  CAST({frac} AS DOUBLE) AS frac_of_label
FROM (SELECT *, SUM(n) OVER (PARTITION BY label) AS n_label FROM pairs)
"""


def dedup_summary_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """Mirror of dedup.dedup_summary."""
    rate = round6_sql(
        "CAST(n_docs - n_distinct_contents AS DOUBLE)"
        " / NULLIF(CAST(n_docs AS DOUBLE), 0.0)"
    )
    return f"""
WITH groups AS (
  SELECT md5({norm_sql(text_col)}) AS m, COUNT(*) AS sz
  FROM {table} GROUP BY 1
),
agg AS (
  -- COALESCE/NULLIF: empty corpus -> zero counts + NULL rate (dedup.py parity)
  SELECT COALESCE(SUM(sz), 0) AS n_docs, COUNT(*) AS n_distinct_contents,
    COALESCE(SUM(CASE WHEN sz > 1 THEN sz ELSE 0 END), 0) AS n_dup_docs
  FROM groups
)
SELECT n_docs, n_distinct_contents, n_dup_docs,
  n_docs - n_distinct_contents AS n_redundant,
  CAST({rate} AS DOUBLE) AS dup_rate
FROM agg
"""


def sample_quotas_sql(
    quotas: dict[str, int],
    table: str = "documents",
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> str:
    """Mirror of sampling.sample_quotas."""
    quota = "0"
    for value, k in sorted(quotas.items()):
        quota = f"CASE WHEN {group_col} = '{value}' THEN {k} ELSE {quota} END"
    return f"""
SELECT * EXCLUDE (__rk) FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {group_col}
    ORDER BY {_bucket_sql(id_col, seed)} ASC, {id_col} ASC
  ) AS __rk
  FROM {table}
) WHERE __rk <= ({quota})
"""


def knn_join_sql(
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 2,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Oracle for similarity.knn_join: ivf_topk_sql with every vector as
    a query (same centroids, assignment, probes, rank order)."""
    acos = round6_sql(f"({dot_sql('n.v', 'c.cv')}) / (n.nrm * c.cn)")
    pcos = round6_sql(f"({dot_sql('q.qv', 'c.cv')}) / (q.qn * c.cn)")
    scos = round6_sql(f"({dot_sql('p.qv', 'a.v')}) / (p.qn * a.nrm)")
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col, finite_only=True)}),
cents AS (SELECT id AS cell, v AS cv, nrm AS cn FROM n ORDER BY id LIMIT {n_cells}),
assigned AS (
  SELECT id, v, nrm, cell FROM (
    SELECT n.id, n.v, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.id ORDER BY {acos} DESC, c.cell ASC) AS rn
    FROM n CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT id AS query_id, v AS qv, nrm AS qn FROM n),
probes AS (
  SELECT query_id, cell, qv, qn FROM (
    SELECT q.query_id, c.cell, q.qv, q.qn,
      row_number() OVER (PARTITION BY q.query_id ORDER BY {pcos} DESC, c.cell ASC) AS pr
    FROM q CROSS JOIN cents c
  ) WHERE pr <= {n_probe}
),
scored AS (
  SELECT p.query_id, a.id AS neighbor_id, {scos} AS cosine
  FROM assigned a JOIN probes p USING (cell) WHERE a.id <> p.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT query_id, neighbor_id, cosine, CAST(row_number() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def dedup_eval_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    integers_only: bool = False,
) -> str:
    """Oracle for operators.dedup.dedup_eval: the two pair relations'
    full-outer reconciliation.

    precision/recall mirror dedup.py's engine-stable integer-arithmetic
    rounding — round6(tp/d) = (2*tp*1e6 + d) // (2*d) / 1e6, an exact
    rational compare with no float division before the rounding step, so
    both engines agree bit-for-bit and the full output (not just the
    confusion-matrix integers) stays on the hashed surface.
    ``integers_only=True`` is retained for callers that only need the
    matrix."""
    truth = jaccard_near_duplicates_sql(table, text_col, id_col, n, threshold)
    pred = minhash_lsh_near_duplicates_sql(
        table, text_col, id_col, n, threshold=threshold
    )
    r6ratio = (
        "CAST((2 * tp * 1000000 + ({d})) // nullif(2 * ({d}), 0) AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE)"
    )
    return f"""
WITH truth AS MATERIALIZED (SELECT doc_a, doc_b, 1 AS _t FROM ({truth})),
pred AS MATERIALIZED (SELECT doc_a, doc_b, 1 AS _p FROM ({pred})),
j AS (
  SELECT COALESCE(t.doc_a, p.doc_a) AS doc_a,
         COALESCE(t.doc_b, p.doc_b) AS doc_b, _t, _p
  FROM truth t FULL OUTER JOIN pred p
    ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
),
c AS (
  -- COALESCE(sum, 0): empty pair relation -> zero matrix (dedup.py parity)
  SELECT COALESCE(SUM(COALESCE(_t, 0)), 0) AS n_truth,
    COALESCE(SUM(COALESCE(_p, 0)), 0) AS n_pred,
    COALESCE(SUM(CASE WHEN _t IS NOT NULL AND _p IS NOT NULL THEN 1 ELSE 0 END), 0) AS tp,
    COALESCE(SUM(CASE WHEN _t IS NULL THEN 1 ELSE 0 END), 0) AS fp,
    COALESCE(SUM(CASE WHEN _p IS NULL THEN 1 ELSE 0 END), 0) AS fn
  FROM j
)
SELECT n_truth, n_pred, tp, fp, fn{"" if integers_only else f''',
  {r6ratio.format(d='tp + fp')} AS precision,
  {r6ratio.format(d='tp + fn')} AS recall'''}
FROM c
"""


def truncation_recall_sql(
    query_ids: list[int],
    dim: int = 8,
    k: int = 10,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Oracle for similarity.truncation_recall (list slice == F.slice)."""
    full = cosine_topk_sql(query_ids, k, table, vec_col, id_col)
    trunc_table = (
        f"(SELECT {id_col}, {vec_col}[1:{dim}] AS _trunc FROM {table})"
    )
    trunc = cosine_topk_sql(query_ids, k, trunc_table, "_trunc", id_col)
    r6 = round6_sql
    return f"""
WITH full_tk AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM ({full})
),
trunc_tk AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM ({trunc})
),
per_q AS (SELECT query_id, COUNT(*) AS k FROM full_tk GROUP BY query_id),
ov AS (
  SELECT f.query_id, COUNT(*) AS n_overlap
  FROM full_tk f JOIN trunc_tk t
    ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
  GROUP BY f.query_id
)
SELECT p.query_id, p.k, COALESCE(o.n_overlap, 0) AS n_overlap,
  CAST({r6('CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / p.k')} AS DOUBLE) AS recall
FROM per_q p LEFT JOIN ov o ON p.query_id = o.query_id
"""


def ivf_inertia_sql(
    n_cells: int = 16,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Oracle for similarity.ivf_inertia (same assignment + cosine)."""
    acos = round6_sql(f"({dot_sql('n.v', 'c.cv')}) / (n.nrm * c.cn)")
    mcos = round6_sql(f"({dot_sql('a.v', 'c.cv')}) / (a.nrm * c.cn)")
    mean = round6_sql(
        "CAST(SUM(CAST((CASE WHEN isnan(cos) OR isinf(cos) THEN NULL "
        "ELSE cos END) AS DECIMAL(27,6))) AS DOUBLE) / COUNT(cos)"
    )
    return f"""
WITH n AS ({_normed_vectors_sql(table, vec_col, id_col, finite_only=True)}),
cents AS (SELECT id AS cell, v AS cv, nrm AS cn FROM n ORDER BY id LIMIT {n_cells}),
assigned AS (
  SELECT id, v, nrm, cell FROM (
    SELECT n.id, n.v, n.nrm, c.cell,
      row_number() OVER (PARTITION BY n.id ORDER BY {acos} DESC, c.cell ASC) AS rn
    FROM n CROSS JOIN cents c
  ) WHERE rn = 1
),
scored AS (
  SELECT a.cell, CAST({mcos} AS DOUBLE) AS cos
  FROM assigned a JOIN cents c ON a.cell = c.cell
)
SELECT cell, COUNT(*) AS n_vectors,
  CAST({mean} AS DOUBLE) AS mean_cos_to_centroid,
  MIN(cos) AS min_cos
FROM scored GROUP BY cell
"""
