"""Curation-operator (Spark, DuckDB-oracle) query pairs: PII redaction,
Gopher quality gates, repetition statistics.

The synthetic ``documents`` corpus is single-line word-soup with no PII, so
each pair injects the structure it measures *deterministically in-query*,
from ``doc_id`` alone, with the SAME SQL expression string evaluated by
Spark (``F.expr``) and DuckDB (CTE) — the ``_mut_docs`` pattern from
``driver_queries_td``. Only engine-portable functions appear in the shared
fragments (CASE/||/replace/chr/lpad/CAST AS STRING), so both engines build
byte-identical inputs.

Float discipline (CLAUDE.md invariants 1/4): every emitted ratio is a
single division of two exactly-representable integers, rounded to 6 on
both sides; no accumulation-order-sensitive float SUM exists anywhere in
these pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pair_helpers import SQL_FIXED6_LONG, SQL_WS_TOKENS
from .training_data import curation as C
from .training_data.textstats import TOKEN_RUN

# ---------------------------------------------------------------------------
# Shared injection fragments (valid in BOTH Spark SQL and DuckDB SQL).
# ---------------------------------------------------------------------------

# PII: ~1/3 of docs get an email, ~1/5 a NANP phone, ~1/7 an IPv4 — all
# derived from doc_id so both engines plant identical strings.
PII_TEXT_EXPR = (
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS STRING)"
    " || '@example.com now' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' call 555-'"
    " || lpad(CAST((doc_id * 7) % 1000 AS STRING), 3, '0') || '-'"
    " || lpad(CAST((doc_id * 13) % 10000 AS STRING), 4, '0') || ' today' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS STRING)"
    " || '.' || CAST((doc_id * 3) % 256 AS STRING)"
    " || '.' || CAST(doc_id % 100 AS STRING) || ' up' ELSE '' END"
)

# Line structure: the corpus word 'line' becomes a newline (giving every doc
# multi-line shape), plus deterministic bullet / ellipsis / symbol /
# stopword / duplicate-line injections keyed on doc_id.
CUR_TEXT_EXPR = (
    "CASE WHEN doc_id % 6 = 0 THEN '- bullet item' || chr(10) ELSE '' END"
    " || replace("
    "text"
    " || CASE WHEN doc_id % 9 = 0 THEN ' # # #' ELSE '' END"
    " || CASE WHEN doc_id % 2 = 0 THEN ' and that of' ELSE '' END"
    ", ' line ', chr(10))"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'to be continued...' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'repeated line marker'"
    " || chr(10) || 'repeated line marker' ELSE '' END"
)

_PII_CTE = f"pii AS (SELECT doc_id, {PII_TEXT_EXPR} AS text FROM documents)"
_CUR_CTE = f"cur AS (SELECT doc_id, {CUR_TEXT_EXPR} AS text FROM documents)"


def _injected(spark: SparkSession, sf_dir: str, expr: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", F.expr(expr).alias("text"))


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, PII_TEXT_EXPR)
    stats = C.pii_stats(injected)
    return stats.select(
        "doc_id",
        "n_emails",
        "n_phones",
        "n_ipv4",
        (F.length("text") - F.length("redacted")).cast("long").alias(
            "n_chars_removed"
        ),
        F.md5("redacted").alias("redacted_md5"),
    )


SQL_PII_REDACTION = rf"""
WITH {_PII_CTE},
red AS (
  SELECT doc_id, text,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{C.EMAIL_RE}', '<EMAIL>', 'g'),
             '{C.PHONE_RE}', '<PHONE>', 'g'),
           '{C.IPV4_RE}', '<IP>', 'g') AS redacted
  FROM pii
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{C.EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{C.PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{C.IPV4_RE}')) AS BIGINT) AS n_ipv4,
       CAST(length(text) - length(redacted) AS BIGINT) AS n_chars_removed,
       md5(redacted) AS redacted_md5
FROM red
"""


# ---------------------------------------------------------------------------
# Gopher quality gates
# ---------------------------------------------------------------------------
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, CUR_TEXT_EXPR)
    return C.gopher_quality(injected).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "frac_bullet_lines",
        "frac_ellipsis_lines",
        "frac_alpha_words",
        "n_stop_kinds",
        "passes",
    )


_STOP_SUM = " + ".join(
    f"CAST(list_contains(w, '{s}') AS BIGINT)" for s in C.REQUIRED_STOPWORDS
)

SQL_GOPHER_QUALITY = rf"""
WITH {_CUR_CTE},
base AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\s+') AS w,
         string_split(text, chr(10)) AS lines,
         text
  FROM cur
),
m AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
               / len(w), 6) AS mean_word_len,
         round(len(regexp_extract_all(text, '#|\.\.\.')) / len(w), 6)
           AS symbol_ratio,
         round(len(list_filter(lines, l -> l LIKE '- %')) / len(lines), 6)
           AS frac_bullet_lines,
         round(len(list_filter(lines, l -> l LIKE '%...')) / len(lines), 6)
           AS frac_ellipsis_lines,
         round(len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) / len(w), 6)
           AS frac_alpha_words,
         CAST({_STOP_SUM} AS BIGINT) AS n_stop_kinds
  FROM base
)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, frac_bullet_lines,
       frac_ellipsis_lines, frac_alpha_words, n_stop_kinds,
       CAST(CASE WHEN n_words >= {C.MIN_WORDS} AND n_words <= {C.MAX_WORDS}
             AND mean_word_len >= {C.MIN_MEAN_WORD_LEN}
             AND mean_word_len <= {C.MAX_MEAN_WORD_LEN}
             AND symbol_ratio <= {C.MAX_SYMBOL_RATIO}
             AND frac_bullet_lines <= {C.MAX_BULLET_LINE_FRAC}
             AND frac_ellipsis_lines <= {C.MAX_ELLIPSIS_LINE_FRAC}
             AND frac_alpha_words >= {C.MIN_ALPHA_WORD_FRAC}
             AND n_stop_kinds >= {C.MIN_STOPWORD_KINDS}
        THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM m
"""


# ---------------------------------------------------------------------------
# Repetition statistics
# ---------------------------------------------------------------------------
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, CUR_TEXT_EXPR)
    return C.repetition_stats(injected)


SQL_REPETITION_STATS = rf"""
WITH {_CUR_CTE},
base AS (
  SELECT doc_id,
         string_split(text, chr(10)) AS lines,
         regexp_split_to_array(trim(text), '\s+') AS w
  FROM cur
),
stats AS (
  SELECT doc_id,
         len(lines) AS n_lines,
         round((len(lines) - len(list_distinct(lines))) / len(lines), 6)
           AS dup_line_frac,
         CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
           AS word_chars,
         w
  FROM base
),
bg AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS bigram
  FROM stats, unnest(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
),
cnt AS (
  SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
),
win AS (
  SELECT doc_id, bigram, c,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, bigram ASC)
           AS rn
  FROM cnt
)
SELECT s.doc_id, s.n_lines, s.dup_line_frac,
       win.bigram AS top_bigram,
       round(win.c * (length(win.bigram) - 1) / s.word_chars, 6)
         AS top_bigram_frac
FROM stats s JOIN win ON win.doc_id = s.doc_id AND win.rn = 1
"""


# ---------------------------------------------------------------------------
# C4-style global line dedup: every occurrence of a line after its
# corpus-wide first (min (doc_id, idx)) is removed, documents reassembled.
# The injected corpus plants the same 'repeated line marker' lines across
# many docs AND twice within each, plus exact-dup documents — both the
# cross-doc and within-doc paths are exercised. The oracle encodes the
# first-occurrence owner as min(doc_id * 1e6 + idx) — equivalent to the
# Spark side's struct-min whenever idx < 1e6 (the operator itself uses the
# unbounded struct ordering).
# ---------------------------------------------------------------------------
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, CUR_TEXT_EXPR)
    return C.dedup_lines(injected).select(
        "doc_id", "n_lines_kept", F.md5("text").alias("text_md5")
    )


SQL_LINE_DEDUP = f"""
WITH {_CUR_CTE},
lines AS (
  SELECT doc_id, i - 1 AS idx, l[i] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM cur) s,
       unnest(range(1, len(l) + 1)) AS t(i)
),
firsts AS (
  SELECT line, min(doc_id * 1000000 + idx) AS k
  FROM lines WHERE length(line) >= 1 GROUP BY line
),
kept AS (
  SELECT l.doc_id, l.idx, l.line
  FROM lines l JOIN firsts f
    ON f.line = l.line AND l.doc_id * 1000000 + l.idx = f.k
  UNION ALL
  SELECT doc_id, idx, line FROM lines WHERE length(line) < 1
),
rebuilt AS (
  SELECT doc_id, count(*) AS n, string_agg(line, chr(10) ORDER BY idx) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(r.n, 0) AS BIGINT) AS n_lines_kept,
       md5(coalesce(r.text, '')) AS text_md5
FROM cur d LEFT JOIN rebuilt r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination (mixing.py): flag documents sharing any word
# 5-gram with the "benchmark" subset (doc_id % 83 == 0). n=5 instead of the
# published 13 because the synthetic docs are 10-60 words; the operator
# defaults to 13.
# ---------------------------------------------------------------------------
DECON_N = 5
DECON_EVAL_MOD = 83


def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    eval_docs = docs.filter(F.col("doc_id") % DECON_EVAL_MOD == 0)
    return M.decontaminate(docs, eval_docs, n=DECON_N)


SQL_DECONTAMINATION = rf"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(w[i:i + {DECON_N - 1}], ' ') AS ngram
  FROM w, unnest(range(1, len(w) - {DECON_N - 2})) AS t(i)
  WHERE len(w) >= {DECON_N}
),
ev AS (
  SELECT DISTINCT ngram FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0
),
hits AS (
  SELECT g.doc_id, count(*) AS h FROM g JOIN ev USING (ngram) GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(hits.h, 0) AS BIGINT) AS n_hits,
       CAST(CASE WHEN coalesce(hits.h, 0) > 0 THEN 1 ELSE 0 END AS BIGINT)
         AS contaminated
FROM documents d LEFT JOIN hits ON hits.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# Deterministic stratified sampling (mixing.py): per-language mixing rates,
# md5 hex-prefix thresholds — the keep/drop decision is a string compare
# both engines replay exactly.
# ---------------------------------------------------------------------------
MIX_RATES = {"en": 0.5, "fr": 0.25, "es": 0.125, "de": 1.0, "zh": 0.0}
MIX_SEED = "mix"


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return M.stratified_sample(docs, MIX_RATES, seed=MIX_SEED).select(
        "doc_id", "lang", "u8"
    )


def _mix_threshold_case() -> str:
    from .training_data.mixing import hex_threshold

    arms = " ".join(
        f"WHEN '{s}' THEN '{hex_threshold(r)}'"
        for s, r in sorted(MIX_RATES.items())
    )
    return f"CASE lang {arms} ELSE '{hex_threshold(0.0)}' END"


SQL_STRATIFIED_SAMPLE = f"""
SELECT doc_id, lang, u8 FROM (
  SELECT doc_id, lang,
         substr(md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS u8
  FROM documents
)
WHERE u8 < {_mix_threshold_case()}
"""


# ---------------------------------------------------------------------------
# Exact-count quota sampling (mixing.py): exactly 5 docs per language in
# deterministic hash order — the oracle replays the same md5 ranking.
# ---------------------------------------------------------------------------
QUOTA_K = 5


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return M.quota_sample(docs, QUOTA_K, seed=MIX_SEED).select(
        "doc_id", "lang", "u8", "rank"
    )


SQL_QUOTA_SAMPLE = f"""
SELECT doc_id, lang, u8, rank FROM (
  SELECT doc_id, lang, u8,
         CAST(row_number() OVER (
           PARTITION BY lang ORDER BY u8 DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM (
    SELECT doc_id, lang,
           substr(md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS u8
    FROM documents
  )
)
WHERE rank <= {QUOTA_K}
"""


# ---------------------------------------------------------------------------
# Skew-safe per-domain caps (mixing.py): top-3 docs per source by
# (n_chars DESC, doc_id ASC). The oracle is the naive single window — the
# two-phase salted plan must produce the identical relation.
# ---------------------------------------------------------------------------
DOMAIN_CAP_K = 3


def q_domain_top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "n_chars"
    )
    return M.domain_top_k(docs, DOMAIN_CAP_K).select(
        "source", "doc_id", "n_chars", "rank"
    )


SQL_DOMAIN_TOP_K = f"""
SELECT source, doc_id, n_chars, rank FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS BIGINT) AS rank
  FROM documents
)
WHERE rank <= {DOMAIN_CAP_K}
"""


# ---------------------------------------------------------------------------
# Sequence packing (mixing.py): concat-then-chunk over whitespace token
# counts in deterministic md5 order. Spark computes the global running
# token total as a bucketed distributed prefix sum; the oracle is the
# naive single window over the identical (hash, id) order — the two-phase
# plan must produce the identical relation. Window-sum output is CAST to
# BIGINT (HUGEINT serialization, invariant 1), and the oracle mirrors the
# operator's NULL contract (NULL ids dropped, NULL token counts packed as
# 0) so the pair stays green if NULLs ever enter the corpus.
# ---------------------------------------------------------------------------
PACK_SEQ_LEN = 512
_WS_TOKENS_SQL = SQL_WS_TOKENS.format(col="text")


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M
    from .training_data import textstats as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    toks = X.token_counts(docs).select(
        "doc_id", F.col("ws_tokens").alias("n_tokens")
    )
    return M.pack_sequences(toks, PACK_SEQ_LEN)


SQL_SEQUENCE_PACKING = f"""
WITH t AS (
  SELECT doc_id, COALESCE({_WS_TOKENS_SQL}, 0) AS n_tokens,
         md5('pack:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
  WHERE doc_id IS NOT NULL
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
                ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS prev
  FROM t
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       prev // {PACK_SEQ_LEN} AS chunk_id,
       prev % {PACK_SEQ_LEN} AS chunk_offset
FROM c
"""


# ---------------------------------------------------------------------------
# Corpus mix report (mixing.py): per-(lang, source) doc/token counts and
# token shares — the mixture audit a training run is configured from. The
# share is one exact-integer division rounded to 6 on both sides.
# ---------------------------------------------------------------------------
def q_corpus_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M
    from .training_data import textstats as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    toks = X.token_counts(docs).select(
        "lang", "source", F.col("ws_tokens").alias("n_tokens")
    )
    return M.mix_report(toks)


SQL_CORPUS_MIX_REPORT = f"""
WITH t AS (
  SELECT lang, source, COALESCE({_WS_TOKENS_SQL}, 0) AS n_tokens
  FROM documents
),
g AS (
  SELECT lang, source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
  FROM t GROUP BY lang, source
),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM g)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / tot.tot, 6) AS token_share
FROM g, tot
"""


# ---------------------------------------------------------------------------
# URL blocklist filter (curation.py): the documents corpus has no url
# column, so the pair injects deterministic urls from doc_id (the shared-
# expression pattern); ~1/11 of docs land on a subdomain of a blocked
# domain and ~1/7 on another, exercising both the suffix-chain and exact
# match paths. Spark joins the suffix explosion against a broadcast
# blocklist; the oracle replays the identical suffix chain in SQL.
# ---------------------------------------------------------------------------
URL_EXPR = (
    "'https://' || CASE WHEN doc_id % 11 = 0 THEN 'ads.tracker' "
    "WHEN doc_id % 7 = 0 THEN 'www.spam' "
    "ELSE 'site' || CAST(doc_id % 13 AS STRING) END "
    "|| '.example.com/p/' || CAST(doc_id AS STRING)"
)
BLOCKED_DOMAINS = ("tracker.example.com", "spam.example.com")


def q_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.expr(URL_EXPR).alias("url")
    )
    bl = spark.createDataFrame([(d,) for d in BLOCKED_DOMAINS], "domain string")
    return C.url_blocklist_filter(docs, bl)


_BL_LIST = ", ".join(f"'{d}'" for d in BLOCKED_DOMAINS)

SQL_URL_BLOCKLIST = f"""
WITH u AS (SELECT doc_id, {URL_EXPR} AS url FROM documents),
h AS (
  SELECT doc_id,
         lower(string_split(string_split(url, '/')[3], ':')[1]) AS host
  FROM u
),
sfx AS (
  SELECT doc_id, array_to_string(l[i:], '.') AS suffix
  FROM (SELECT doc_id, string_split(host, '.') AS l FROM h),
       unnest(range(1, len(l) + 1)) AS t(i)
),
bl AS (SELECT unnest([{_BL_LIST}]) AS suffix),
hits AS (SELECT DISTINCT doc_id FROM sfx JOIN bl USING (suffix))
SELECT h.doc_id, h.host,
       CAST(CASE WHEN hits.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS blocked
FROM h LEFT JOIN hits ON hits.doc_id = h.doc_id
"""


# ---------------------------------------------------------------------------
# Full Gopher repetition rule set (curation.py): dup line/paragraph
# (element + char) fractions, top-{2,3,4}-gram char fraction, dup-{5..10}-
# gram char coverage (position union). The injection plants every path:
# a repeated 10-gram (~1/3 of docs), a hot 2-gram run (~1/4), duplicate
# \n\n-paragraphs (~1/5) and duplicate lines (~1/7), on top of the 'line'
# -> newline rewrite the other curation pairs use.
# ---------------------------------------------------------------------------
REP_TEXT_EXPR = (
    "replace("
    "text"
    " || CASE WHEN doc_id % 3 = 0 THEN"
    " ' alpha beta gamma delta epsilon zeta eta theta iota kappa"
    " alpha beta gamma delta epsilon zeta eta theta iota kappa' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' spam spam spam spam spam spam'"
    " ELSE '' END"
    ", ' line ', chr(10))"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || chr(10) ||"
    " 'para block repeats' || chr(10) || chr(10) || 'para block repeats'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'same line twice'"
    " || chr(10) || 'same line twice' ELSE '' END"
)


def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, REP_TEXT_EXPR)
    return C.gopher_repetition(injected)


def _rep_gate_sql() -> str:
    # thresholds cross into DuckDB as strings CAST to DOUBLE (CLAUDE.md
    # invariant 1: a bare numeric literal routes through DECIMAL and can
    # perturb the last bits)
    return " AND ".join(
        f"{name} <= CAST('{bound!r}' AS DOUBLE)"
        for name, bound in C.REPETITION_THRESHOLDS.items()
    )


SQL_GOPHER_REPETITION = rf"""
WITH rep AS (SELECT doc_id, {REP_TEXT_EXPR} AS text FROM documents),
base AS (
  SELECT doc_id,
         CAST(coalesce(length(text), 0) AS BIGINT) AS n_chars,
         regexp_split_to_array(trim(text), '\s+') AS w,
         string_split(text, chr(10)) AS lines,
         string_split(text, chr(10) || chr(10)) AS paras
  FROM rep
),
lin AS (
  SELECT doc_id, n_chars, w,
         CAST(len(lines) AS BIGINT) AS nl,
         CAST(len(paras) AS BIGINT) AS np,
         CAST(len(lines) - len(list_distinct(lines)) AS BIGINT) AS dle,
         CAST(coalesce(list_sum(list_transform(list_distinct(lines),
           d -> (len(list_filter(lines, x -> x = d)) - 1) * length(d))), 0)
           AS BIGINT) AS dlc,
         CAST(len(paras) - len(list_distinct(paras)) AS BIGINT) AS dpe,
         CAST(coalesce(list_sum(list_transform(list_distinct(paras),
           d -> (len(list_filter(paras, x -> x = d)) - 1) * length(d))), 0)
           AS BIGINT) AS dpc
  FROM base
),
grams AS (
  SELECT doc_id, n, i - 1 AS pos, array_to_string(w[i:i + n - 1], ' ') AS gram
  FROM base, unnest([2, 3, 4, 5, 6, 7, 8, 9, 10]) AS tn(n),
       unnest(range(1, len(w) - n + 2)) AS t(i)
  WHERE len(w) >= n
),
firsts AS (
  SELECT doc_id, n, gram, count(*) AS cnt, min(pos) AS mp
  FROM grams GROUP BY doc_id, n, gram
),
tops AS (
  SELECT doc_id, n, cnt * length(gram) AS tc
  FROM (SELECT doc_id, n, gram, cnt,
          row_number() OVER (PARTITION BY doc_id, n
                             ORDER BY cnt DESC, gram ASC) AS rn
        FROM firsts WHERE n <= 4)
  WHERE rn = 1
),
tp AS (
  SELECT doc_id,
         max(CASE WHEN n = 2 THEN tc END) AS t2,
         max(CASE WHEN n = 3 THEN tc END) AS t3,
         max(CASE WHEN n = 4 THEN tc END) AS t4
  FROM tops GROUP BY doc_id
),
dup_occ AS (
  SELECT g.doc_id, g.n, g.pos
  FROM grams g JOIN firsts f USING (doc_id, n, gram)
  WHERE g.n >= 5 AND f.cnt > 1 AND g.pos > f.mp
),
cov AS (
  SELECT DISTINCT doc_id, n, u AS idx
  FROM dup_occ, unnest(range(pos, pos + n)) AS tu(u)
),
dch AS (
  SELECT c.doc_id, c.n, CAST(sum(length(b.w[c.idx + 1])) AS BIGINT) AS dc
  FROM cov c JOIN base b USING (doc_id)
  GROUP BY c.doc_id, c.n
),
dp AS (
  SELECT doc_id,
         max(CASE WHEN n = 5 THEN dc END) AS d5,
         max(CASE WHEN n = 6 THEN dc END) AS d6,
         max(CASE WHEN n = 7 THEN dc END) AS d7,
         max(CASE WHEN n = 8 THEN dc END) AS d8,
         max(CASE WHEN n = 9 THEN dc END) AS d9,
         max(CASE WHEN n = 10 THEN dc END) AS d10
  FROM dch GROUP BY doc_id
),
m AS (
  SELECT l.doc_id, l.n_chars,
    CASE WHEN nl > 0 THEN round(coalesce(dle, 0) / nl, 6) ELSE 0.0 END
      AS dup_line_frac,
    CASE WHEN np > 0 THEN round(coalesce(dpe, 0) / np, 6) ELSE 0.0 END
      AS dup_para_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(dlc, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_line_char_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(dpc, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_para_char_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(t2, 0) / n_chars, 6)
      ELSE 0.0 END AS top_2_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(t3, 0) / n_chars, 6)
      ELSE 0.0 END AS top_3_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(t4, 0) / n_chars, 6)
      ELSE 0.0 END AS top_4_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d5, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_5_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d6, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_6_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d7, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_7_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d8, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_8_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d9, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_9_gram_frac,
    CASE WHEN n_chars > 0 THEN round(coalesce(d10, 0) / n_chars, 6)
      ELSE 0.0 END AS dup_10_gram_frac
  FROM lin l LEFT JOIN tp USING (doc_id) LEFT JOIN dp USING (doc_id)
)
SELECT *,
       CAST(CASE WHEN {_rep_gate_sql()} THEN 1 ELSE 0 END AS BIGINT)
         AS passes_repetition
FROM m
"""


# ---------------------------------------------------------------------------
# LM quality scoring (curation.py): mean log-likelihood under the corpus-
# trained smoothed unigram LM (CCNet-style). Every probability is derived
# from exact integer counts cast to DOUBLE; per-word ln is rounded to 6
# once, per-doc accumulation is the fixed6 integer sum — both engines
# replay the scores bit-for-bit.
# ---------------------------------------------------------------------------
LM_MIN_COUNT = 5


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return C.lm_quality(docs, min_count=LM_MIN_COUNT)


SQL_LM_QUALITY = rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{C.LM_TOKEN_RUN}')) AS w
  FROM documents
),
cnt AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
tot AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n FROM cnt),
voc AS (SELECT w, c FROM cnt WHERE c >= {LM_MIN_COUNT}),
vs AS (SELECT count(*) AS v FROM voc),
st AS (
  SELECT CAST(tot.n + vs.v + 1 AS DOUBLE) AS den,
         round(ln(CAST(1 AS DOUBLE)
                  / CAST(tot.n + vs.v + 1 AS DOUBLE)), 6) AS unk_lp
  FROM tot, vs
),
lp AS (
  SELECT w, round(ln(CAST(c + 1 AS DOUBLE) / st.den), 6) AS lp FROM voc, st
),
sc AS (
  SELECT t.doc_id,
         CASE WHEN lp.lp IS NULL THEN 1 ELSE 0 END AS oov,
         coalesce(lp.lp, st.unk_lp) AS t_lp
  FROM toks t LEFT JOIN lp ON lp.w = t.w, st
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(oov) AS o,
         round(sum({SQL_FIXED6_LONG.format(col="t_lp")})
               / 1000000.0 / count(*), 6) AS m
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(agg.o, 0) AS BIGINT) AS n_oov,
       coalesce(agg.m, (SELECT unk_lp FROM st)) AS mean_logprob
FROM documents d LEFT JOIN agg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Per-language LM quality (CCNet §4.3 proper): one independent unigram LM
# per documents.lang — the same math as lm_quality with the stratum joined
# into every key. The oracle replays each language's own counts, floor and
# vocab lookups bit-for-bit.
# ---------------------------------------------------------------------------


def q_lm_quality_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    return C.lm_quality(docs, min_count=LM_MIN_COUNT, stratum_col="lang")


SQL_LM_QUALITY_BY_LANG = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '{C.LM_TOKEN_RUN}')) AS w
  FROM documents
),
cnt AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY lang, w),
tot AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY lang),
voc AS (SELECT lang, w, c FROM cnt WHERE c >= {LM_MIN_COUNT}),
vs AS (SELECT lang, count(*) AS v FROM voc GROUP BY lang),
st AS (
  SELECT t.lang,
         CAST(t.n + coalesce(vs.v, 0) + 1 AS DOUBLE) AS den,
         round(ln(CAST(1 AS DOUBLE)
                  / CAST(t.n + coalesce(vs.v, 0) + 1 AS DOUBLE)), 6) AS unk_lp
  FROM tot t LEFT JOIN vs USING (lang)
),
lp AS (
  SELECT voc.lang, voc.w,
         round(ln(CAST(c + 1 AS DOUBLE) / st.den), 6) AS lp
  FROM voc JOIN st USING (lang)
),
sc AS (
  SELECT t.doc_id,
         CASE WHEN lp.lp IS NULL THEN 1 ELSE 0 END AS oov,
         coalesce(lp.lp, st.unk_lp) AS t_lp
  FROM toks t
  LEFT JOIN lp ON lp.lang = t.lang AND lp.w = t.w
  JOIN st ON st.lang = t.lang
),
agg AS (
  SELECT doc_id, count(*) AS n, sum(oov) AS o,
         round(sum({SQL_FIXED6_LONG.format(col="t_lp")})
               / 1000000.0 / count(*), 6) AS m
  FROM sc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(agg.o, 0) AS BIGINT) AS n_oov,
       coalesce(agg.m, st.unk_lp) AS mean_logprob
FROM documents d
LEFT JOIN agg USING (doc_id)
LEFT JOIN st ON st.lang = d.lang
"""


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weights (mixing.py): target = the corpus's
# English subset, raw = the whole corpus; 4096 md5-prefix buckets. The
# oracle replays the identical bucket hashes, smoothed count ratios and
# fixed6 per-doc sums.
# ---------------------------------------------------------------------------
DSIR_TGT_LANG = "en"
DSIR_HEX = 3
_DSIR_B = 16**DSIR_HEX


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs = base.select("doc_id", "text")
    target = base.filter(F.col("lang") == DSIR_TGT_LANG).select(
        "doc_id", "text"
    )
    return M.dsir_weights(docs, target, bucket_hex_chars=DSIR_HEX)


SQL_DSIR_WEIGHTS = rf"""
WITH f AS (
  SELECT doc_id, lang,
         unnest(list_concat(w, CASE WHEN len(w) < 2 THEN [] ELSE
           list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1]) END))
           AS feat
  FROM (SELECT doc_id, lang,
               regexp_extract_all(lower(text), '{C.LM_TOKEN_RUN}') AS w
        FROM documents)
),
b AS (
  SELECT doc_id, lang, substr(md5('dsir:' || feat), 1, {DSIR_HEX}) AS b FROM f
),
raw AS (SELECT b, count(*) AS cr FROM b GROUP BY b),
tgt AS (
  SELECT b, count(*) AS ct FROM b WHERE lang = '{DSIR_TGT_LANG}' GROUP BY b
),
rt AS (SELECT count(*) AS crt FROM b),
tt AS (SELECT count(*) AS ctt FROM b WHERE lang = '{DSIR_TGT_LANG}'),
w AS (
  SELECT raw.b,
         round(ln((CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE)
                   * (CAST(rt.crt AS DOUBLE) + {_DSIR_B}))
                  / (CAST(raw.cr + 1 AS DOUBLE)
                     * (CAST(tt.ctt AS DOUBLE) + {_DSIR_B}))), 6) AS lw
  FROM raw LEFT JOIN tgt USING (b), rt, tt
),
sc AS (
  SELECT b.doc_id, count(*) AS nf,
         round(sum({SQL_FIXED6_LONG.format(col="lw")}) / 1000000.0, 6)
           AS lwsum
  FROM b JOIN w USING (b) GROUP BY b.doc_id
)
SELECT d.doc_id,
       CAST(coalesce(sc.nf, 0) AS BIGINT) AS n_feats,
       coalesce(sc.lwsum, 0.0) AS log_weight
FROM documents d LEFT JOIN sc USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Temperature-scaled mixing (mixing.py): α = 0.5 stratum flattening with
# the keep rates computed IN-PLAN from the language counts. sqrt/division
# are IEEE-correctly-rounded and the *2^32 scaling is exact, so the
# thresholds are bit-identical across engines.
# ---------------------------------------------------------------------------
TEMP_ALPHA = 0.5


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    return M.temperature_sample(docs, alpha=TEMP_ALPHA, seed=MIX_SEED).select(
        "doc_id", "lang", "u8i"
    )


SQL_TEMPERATURE_SAMPLE = f"""
WITH c AS (SELECT lang, count(*) AS c FROM documents
           WHERE lang IS NOT NULL GROUP BY lang),
m AS (SELECT min(c) AS cmin FROM c),
dims AS (
  SELECT lang,
         CASE WHEN c = m.cmin THEN 4294967296
              ELSE CAST(floor(sqrt(m.cmin / c) * 4294967296) AS BIGINT)
         END AS thr
  FROM c, m
),
u AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5('{MIX_SEED}:' || CAST(doc_id AS VARCHAR)),
                             1, 8) AS BIGINT) AS u8i
  FROM documents
)
SELECT u.doc_id, u.lang, u.u8i FROM u JOIN dims USING (lang) WHERE u8i < thr
"""


# ---------------------------------------------------------------------------
# Deterministic train/val/test split (mixing.py): md5 hash ranges carved in
# fraction order. The oracle's CASE thresholds are generated by the SAME
# python accumulation the operator runs, so float-sum drift in the
# cumulative fractions can never split the two sides apart.
# ---------------------------------------------------------------------------
SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
SPLIT_SEED = "split"


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import mixing as M

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return M.hash_split(docs, SPLIT_FRACTIONS, seed=SPLIT_SEED).select(
        "doc_id", "split"
    )


def _split_case() -> str:
    from .training_data.mixing import hex_threshold

    names = list(SPLIT_FRACTIONS)
    arms, cum = [], 0.0
    for name in names[:-1]:
        cum += SPLIT_FRACTIONS[name]
        arms.append(f"WHEN u8 < '{hex_threshold(cum)}' THEN '{name}'")
    return (
        "CASE WHEN doc_id IS NULL THEN NULL "
        + " ".join(arms)
        + f" ELSE '{names[-1]}' END"
    )


SQL_HASH_SPLIT = f"""
SELECT doc_id, {_split_case()} AS split
FROM (
  SELECT doc_id,
         substr(md5('{SPLIT_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS u8
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# C4 cleaning rules (curation.py c4_rules, Raffel et al. 2020 §2.2): the
# injection turns the word soup into punctuated/unpunctuated lines keyed on
# doc_id and plants javascript / short / lorem-ipsum / curly-bracket /
# unterminated lines, exercising every line and page rule on both sides.
# ---------------------------------------------------------------------------
C4_TEXT_EXPR = (
    "replace(text, ' line ', "
    "CASE WHEN doc_id % 3 = 0 THEN '.' || chr(10) "
    "WHEN doc_id % 3 = 1 THEN '?' || chr(10) ELSE chr(10) END)"
    " || CASE WHEN doc_id % 3 = 0 THEN '.'"
    " WHEN doc_id % 3 = 1 THEN '!' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN chr(10) ||"
    " 'this page uses javascript heavily today.' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'ok fine.' ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN chr(10) ||"
    " 'is this a question line with no mark' ELSE '' END"
    " || CASE WHEN doc_id % 11 = 0 THEN chr(10) ||"
    " 'classic lorem ipsum filler text here.' ELSE '' END"
    " || CASE WHEN doc_id % 13 = 0 THEN chr(10) ||"
    " 'code sample with { braces } inside it.' ELSE '' END"
)


def q_c4_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, C4_TEXT_EXPR)
    return C.c4_rules(injected).select(
        "doc_id",
        "n_lines",
        "n_lines_kept",
        "n_sentences",
        "has_lorem",
        "has_brace",
        F.md5("cleaned").alias("cleaned_md5"),
        "passes",
    )


SQL_C4_RULES = f"""
WITH c4 AS (SELECT doc_id, {C4_TEXT_EXPR} AS text FROM documents),
base AS (
  SELECT doc_id,
         string_split(coalesce(text, ''), chr(10)) AS lines,
         lower(coalesce(text, '')) AS lt,
         coalesce(text, '') AS t
  FROM c4
),
kf AS (
  SELECT doc_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         list_filter(lines, l ->
           right(l, 1) IN ({C.C4_TERMINAL_MARKS_SQL})
           AND len(regexp_extract_all(l, '\\S+')) >= {C.C4_MIN_WORDS_PER_LINE}
           AND NOT contains(lower(l), 'javascript')) AS kept,
         CAST(contains(lt, 'lorem ipsum') AS BIGINT) AS has_lorem,
         CAST(contains(t, '{{') AS BIGINT) AS has_brace
  FROM base
),
k AS (
  SELECT doc_id, n_lines,
         coalesce(array_to_string(kept, chr(10)), '') AS cleaned,
         CAST(len(kept) AS BIGINT) AS n_lines_kept,
         has_lorem, has_brace
  FROM kf
),
m AS (
  SELECT doc_id, n_lines, n_lines_kept,
         CAST(len(regexp_extract_all(cleaned, '{C.C4_SENTENCE_RE}'))
              AS BIGINT) AS n_sentences,
         has_lorem, has_brace, md5(cleaned) AS cleaned_md5
  FROM k
)
SELECT doc_id, n_lines, n_lines_kept, n_sentences, has_lorem, has_brace,
       cleaned_md5,
       CAST(CASE WHEN n_sentences >= {C.C4_MIN_SENTENCES}
                  AND has_lorem = 0 AND has_brace = 0
            THEN 1 ELSE 0 END AS BIGINT) AS passes
FROM m
"""


# ---------------------------------------------------------------------------
# ExactSubstr span dedup (curation.py dedup_spans, Lee et al. 2021): the
# injection appends a shared boilerplate run to every 4th doc (cross-doc
# duplicate windows; the global first occurrence keeps) and a self-repeating
# run to every 6th (within-doc windows + overlap union). n=8 tokens so the
# soup-sized docs carry plenty of windows.
# ---------------------------------------------------------------------------
SPAN_N = 8
SPAN_TEXT_EXPR = (
    "text"
    " || CASE WHEN doc_id % 4 = 0 THEN"
    " ' the shared boilerplate footer sentence repeats across many pages here'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN"
    " ' alpha beta gamma delta epsilon zeta eta theta"
    " alpha beta gamma delta epsilon zeta eta theta' ELSE '' END"
)


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, SPAN_TEXT_EXPR)
    out = C.dedup_spans(injected, n=SPAN_N)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        F.md5("text").alias("text_md5"),
    )


SQL_DEDUP_SPANS = f"""
WITH sp AS (SELECT doc_id, {SPAN_TEXT_EXPR} AS text FROM documents),
warr AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(coalesce(text, ''), '\\s+'),
                     x -> x <> '') AS w
  FROM sp
),
toks AS (
  SELECT doc_id, i - 1 AS pos, w[i] AS tok
  FROM warr, unnest(range(1, len(w) + 1)) AS t(i)
),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(w[i:i + {SPAN_N} - 1], ' ')) AS h
  FROM warr, unnest(range(1, len(w) - {SPAN_N} + 2)) AS t(i)
  WHERE len(w) >= {SPAN_N}
),
dup AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM wins
  ) WHERE rn > 1
),
covered AS (
  SELECT DISTINCT doc_id, u AS pos
  FROM dup, unnest(range(pos, pos + {SPAN_N})) AS t(u)
),
kept AS (
  SELECT t.doc_id, t.pos, t.tok
  FROM toks t ANTI JOIN covered c ON c.doc_id = t.doc_id AND c.pos = t.pos
),
rebuilt AS (
  SELECT doc_id, count(*) AS nk, string_agg(tok, ' ' ORDER BY pos) AS txt
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(tot.nt, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(tot.nt, 0) - coalesce(rebuilt.nk, 0) AS BIGINT)
         AS n_tokens_removed,
       md5(coalesce(rebuilt.txt, '')) AS text_md5
FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN rebuilt USING (doc_id)
"""


# ---------------------------------------------------------------------------
# BFF-style Bloom-filter paragraph dedup (curation.py bloom_dedup, Dolma /
# allenai/bff): the injection gives every doc newline paragraph structure,
# plants a shared boilerplate paragraph on every 3rd doc (cross-doc dups —
# global first occurrence keeps) and a twice-repeated footer on every 7th
# (within-doc dup). m/k are the pair's fixed filter geometry; md5-salted
# positions replay bit-for-bit in DuckDB (invariant 2). At sf<=0.1 the
# filter is sparse enough that drops are (almost) all true duplicates; the
# false-positive path exercises the same expressions and is unit-tested
# with a deliberately tiny m in test_curation.py.
# ---------------------------------------------------------------------------
BLOOM_M = 1 << 20
BLOOM_K = 4
BLOOM_SEED = "bff"
BLOOM_TEXT_EXPR = (
    "replace(text, ' line ', chr(10))"
    " || CASE WHEN doc_id % 3 = 0 THEN chr(10) ||"
    " 'subscribe to our newsletter for the latest updates' ELSE '' END"
    " || CASE WHEN doc_id % 7 = 0 THEN chr(10) ||"
    " 'all rights reserved legal footer' || chr(10) ||"
    " 'all rights reserved legal footer' ELSE '' END"
)


def q_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    injected = _injected(spark, sf_dir, BLOOM_TEXT_EXPR)
    out = C.bloom_dedup(injected, m_bits=BLOOM_M, k=BLOOM_K, seed=BLOOM_SEED)
    return out.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        F.md5("text").alias("text_md5"),
    )


SQL_BLOOM_DEDUP = f"""
WITH bl AS (SELECT doc_id, {BLOOM_TEXT_EXPR} AS text FROM documents),
parr AS (
  SELECT doc_id,
         list_filter(list_transform(string_split(coalesce(text, ''), chr(10)),
                                    x -> trim(x, ' ' || chr(9) || chr(13))),
                     x -> x <> '') AS p
  FROM bl
),
paras AS (
  SELECT doc_id, i - 1 AS pidx, p[i] AS para
  FROM parr, unnest(range(1, len(p) + 1)) AS t(i)
),
bits AS (
  SELECT doc_id, pidx,
         CAST('0x' || substr(md5('{BLOOM_SEED}:' || CAST(s AS VARCHAR)
                                 || ':' || para), 1, 8) AS BIGINT)
           % {BLOOM_M} AS bit
  FROM paras, unnest(range(0, {BLOOM_K})) AS t(s)
),
setter AS (
  SELECT bit, doc_id AS sd, pidx AS sp FROM (
    SELECT bit, doc_id, pidx,
           row_number() OVER (PARTITION BY bit ORDER BY doc_id, pidx) AS rn
    FROM bits
  ) WHERE rn = 1
),
dup AS (
  SELECT b.doc_id, b.pidx
  FROM bits b JOIN setter s USING (bit)
  GROUP BY b.doc_id, b.pidx
  HAVING min(CASE WHEN s.sd < b.doc_id
                    OR (s.sd = b.doc_id AND s.sp < b.pidx)
                  THEN 1 ELSE 0 END) = 1
),
kept AS (
  SELECT p.doc_id, p.pidx, p.para
  FROM paras p ANTI JOIN dup d ON d.doc_id = p.doc_id AND d.pidx = p.pidx
),
rebuilt AS (
  SELECT doc_id, count(*) AS nk,
         string_agg(para, chr(10) ORDER BY pidx) AS txt
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS np FROM paras GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(tot.np, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(tot.np, 0) - coalesce(rebuilt.nk, 0) AS BIGINT)
         AS n_dup_paras,
       md5(coalesce(rebuilt.txt, '')) AS text_md5
FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN rebuilt USING (doc_id)
"""


# ---------------------------------------------------------------------------
# TF-IDF keyword extraction (textstats.py tfidf_keywords): per-doc top-5
# terms by tf * ln(N/df) over the raw corpus (no injection needed — the
# word soup has real df variation). Ranking orders by the ROUNDED score
# with term-asc tiebreak, so a sub-1e-6 ln() discrepancy can never flip a
# rank (the term_stats idf precedent); every count is CAST to BIGINT.
# ---------------------------------------------------------------------------
TFIDF_K = 5


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return T.tfidf_keywords(docs, k=TFIDF_K)


SQL_TFIDF_KEYWORDS = f"""
WITH t AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
dfq AS (SELECT term, count(DISTINCT doc_id) AS dfreq FROM t GROUP BY term),
n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfq.dfreq,
         round(tf.tf * ln(n.n / dfq.dfreq), 6) AS score
  FROM tf JOIN dfq USING (term), n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS rnk
  FROM s
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
       CAST(tf AS BIGINT) AS tf, CAST(dfreq AS BIGINT) AS dfreq, score
FROM r WHERE rnk <= {TFIDF_K}
"""


# ---------------------------------------------------------------------------
# Bigram PMI collocations (textstats.py collocations): corpus-wide top-k
# adjacent-bigram collocations by pointwise mutual information (Church &
# Hanks 1990) with a min-count noise floor. One ln of one exact
# double expression (two left-assoc products, one divide — no
# accumulation), rounded to 6; ranking orders by the ROUNDED pmi with
# (w1, w2)-asc tiebreak (unique per bigram), so both engines rank
# identically; every count CAST to BIGINT (the DuckDB sum()->HUGEINT
# trap).
# ---------------------------------------------------------------------------
BIGRAM_K = 100
BIGRAM_MIN = 3


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    return T.collocations(docs, k=BIGRAM_K, min_count=BIGRAM_MIN)


SQL_BIGRAM_PMI = f"""
WITH wds AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM documents
),
bi AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM wds, unnest(range(1, len(w))) AS t(i)
  WHERE len(w) >= 2
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
n AS (SELECT CAST(sum(c12) AS BIGINT) AS nbi FROM c12),
s AS (
  SELECT c12.w1, c12.w2, c12.c12, c1.c1, c2.c2,
         round(ln((CAST(c12.c12 AS DOUBLE) * n.nbi)
                  / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 6) AS pmi
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
  WHERE c12.c12 >= {BIGRAM_MIN}
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rnk FROM s
)
SELECT CAST(rnk AS BIGINT) AS rnk, w1, w2, c12, c1, c2, pmi
FROM r WHERE rnk <= {BIGRAM_K}
"""


# ---------------------------------------------------------------------------
# Skip-gram PMI (textstats.py collocations, window=5): top-k word pairs by
# PMI over the ordered window-5 skip-gram stream — the word2vec/SGNS
# co-occurrence statistic (Levy & Goldberg 2014: SGNS factorizes the
# shifted PMI matrix of exactly this stream); document-LEVEL co-occurrence
# would be degenerate here (the 30-word soup puts nearly every term in
# nearly every doc, PMI ≈ 0 corpus-wide), while the positional window
# shows real variation. Same float discipline as bigram_pmi: one ln of
# one exact double expression rounded 6, ranking on the ROUNDED pmi with
# (w1, w2)-asc tiebreak, every count CAST to BIGINT.
# ---------------------------------------------------------------------------
SKIP_K = 100
SKIP_MIN = 5
SKIP_WINDOW = 5


def q_skipgram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("text")
    return T.collocations(docs, k=SKIP_K, min_count=SKIP_MIN, window=SKIP_WINDOW)


SQL_SKIPGRAM_PMI = f"""
WITH wds AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM documents
),
bi AS (
  SELECT w[i] AS w1, w[i + o] AS w2
  FROM wds,
       unnest(range(1, len(w))) AS t(i),
       unnest(range(1, {SKIP_WINDOW + 1})) AS t2(o)
  WHERE len(w) >= 2 AND i + o <= len(w)
),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bi GROUP BY w1, w2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
c2 AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS c2 FROM c12 GROUP BY w2),
n AS (SELECT CAST(sum(c12) AS BIGINT) AS nbi FROM c12),
s AS (
  SELECT c12.w1, c12.w2, c12.c12, c1.c1, c2.c2,
         round(ln((CAST(c12.c12 AS DOUBLE) * n.nbi)
                  / (CAST(c1.c1 AS DOUBLE) * c2.c2)), 6) AS pmi
  FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2), n
  WHERE c12.c12 >= {SKIP_MIN}
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rnk FROM s
)
SELECT CAST(rnk AS BIGINT) AS rnk, w1, w2, c12, c1, c2, pmi
FROM r WHERE rnk <= {SKIP_K}
"""


# ---------------------------------------------------------------------------
# Zipf rank-frequency stats (textstats.py zipf_stats): per-language vocab,
# token total, and the log-log Zipf slope + R² over the top-R terms — the
# distributional-anomaly report (Zipf 1949; Piantadosi 2014). Each
# (ln rank, ln count) point is quantized ONCE to integer micros
# (round(·1e6, 0) yields an integer-valued double — cast exact in both
# engines, unlike a raw double→bigint cast which truncates in Spark but
# rounds in DuckDB); the OLS sums are then pure BIGINT arithmetic
# (order-independent, invariant 4); slope/R² are single double
# expressions of those exact integers, rounded 6. Every count CAST to
# BIGINT (the DuckDB sum()->HUGEINT trap).
# ---------------------------------------------------------------------------
ZIPF_R = 200


def q_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("lang", "text")
    return T.zipf_stats(docs, r=ZIPF_R)


SQL_ZIPF_STATS = f"""
WITH tok AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS term
  FROM documents
),
tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY lang, term),
tot AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(cnt) AS BIGINT) AS total_tokens
  FROM tc GROUP BY lang
),
rk AS (
  SELECT lang, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term ASC) AS rnk
  FROM tc
),
pts AS (
  SELECT lang,
         {SQL_FIXED6_LONG.format(col="ln(CAST(rnk AS DOUBLE))")} AS x6,
         {SQL_FIXED6_LONG.format(col="ln(CAST(cnt AS DOUBLE))")} AS y6
  FROM rk WHERE rnk <= {ZIPF_R}
),
sums AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(y6 * y6) AS BIGINT) AS syy
  FROM pts GROUP BY lang HAVING count(*) >= 2
)
SELECT t.lang, t.vocab, t.total_tokens, s.n AS top_n,
       round((CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy)
             / (CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx), 6)
         AS zipf_slope,
       round(((CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy)
              * (CAST(s.n AS DOUBLE) * s.sxy - CAST(s.sx AS DOUBLE) * s.sy))
             / ((CAST(s.n AS DOUBLE) * s.sxx - CAST(s.sx AS DOUBLE) * s.sx)
                * (CAST(s.n AS DOUBLE) * s.syy - CAST(s.sy AS DOUBLE) * s.sy)), 6)
         AS r2
FROM tot t JOIN sums s USING (lang)
"""


# ---------------------------------------------------------------------------
# Heaps'-law vocabulary growth (textstats.py heaps_law): cumulative
# distinct word-3-gram count across 10 doc-id slices plus the log-log
# growth exponent — the index-size forecast (how does the postings
# dictionary grow when the corpus does 10x?). The unit is the md5 3-gram
# shingle (the shared _gram_hashes/_DUP_GRAM spelling) because the
# synthetic unigram vocabulary saturates in slice 1 (degenerate fit,
# memory-note trap); 3-grams show real sublinear growth at every SF.
# Same fixed6-integer OLS recipe as zipf_stats; window sums CAST to
# BIGINT (the DuckDB HUGEINT trap); zero-denominator guards spelled as
# CASE WHEN in the same expression on both sides.
# ---------------------------------------------------------------------------
HEAPS_N = 3
HEAPS_BUCKETS = 10
_HEAPS_GRAM = " || ' ' || ".join(f"w[i + {j}]" for j in range(HEAPS_N))


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return T.heaps_law(docs, n=HEAPS_N, buckets=HEAPS_BUCKETS)


_HEAPS_DEN = "(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
_HEAPS_DEN2 = "(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)"
_HEAPS_NUM = "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"

SQL_HEAPS_LAW = f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w
  FROM documents
),
mm AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM d),
dd AS (
  SELECT w,
         CAST(((doc_id - mm.lo) * {HEAPS_BUCKETS}) // (mm.hi - mm.lo + 1) + 1
              AS INTEGER) AS dc
  FROM d, mm
),
g AS (
  SELECT dc, md5({_HEAPS_GRAM}) AS h
  FROM dd, unnest(range(1, len(w) - {HEAPS_N - 2})) AS t(i)
  WHERE len(w) >= {HEAPS_N}
),
nv AS (
  SELECT dc, CAST(count(*) AS BIGINT) AS nv
  FROM (SELECT h, min(dc) AS dc FROM g GROUP BY h) GROUP BY dc
),
per AS (
  SELECT dc, CAST(count(*) AS BIGINT) AS docs,
         CAST(sum(greatest(len(w) - {HEAPS_N - 1}, 0)) AS BIGINT) AS grams
  FROM dd GROUP BY dc
),
cum AS (
  SELECT per.dc AS decile,
         CAST(sum(per.docs) OVER win AS BIGINT) AS n_docs,
         CAST(sum(per.grams) OVER win AS BIGINT) AS n_grams,
         CAST(sum(coalesce(nv.nv, 0)) OVER win AS BIGINT) AS vocab
  FROM per LEFT JOIN nv USING (dc)
  WINDOW win AS (ORDER BY per.dc ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
pts AS (
  SELECT {SQL_FIXED6_LONG.format(col="ln(CAST(n_grams AS DOUBLE))")} AS x6,
         {SQL_FIXED6_LONG.format(col="ln(CAST(vocab AS DOUBLE))")} AS y6
  FROM cum WHERE n_grams > 0 AND vocab > 0
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x6) AS BIGINT) AS sx, CAST(sum(y6) AS BIGINT) AS sy,
         CAST(sum(x6 * x6) AS BIGINT) AS sxx,
         CAST(sum(x6 * y6) AS BIGINT) AS sxy,
         CAST(sum(y6 * y6) AS BIGINT) AS syy
  FROM pts HAVING count(*) >= 2
),
fit AS (
  SELECT CASE WHEN {_HEAPS_DEN} <> 0
              THEN round({_HEAPS_NUM} / {_HEAPS_DEN}, 6) END AS heaps_beta,
         CASE WHEN {_HEAPS_DEN} <> 0 AND {_HEAPS_DEN2} <> 0
              THEN round(({_HEAPS_NUM} * {_HEAPS_NUM})
                         / ({_HEAPS_DEN} * {_HEAPS_DEN2}), 6) END AS heaps_r2
  FROM sums
)
SELECT decile, n_docs, n_grams, vocab, fit.heaps_beta, fit.heaps_r2
FROM cum, fit
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# n-gram duplication profile (textstats.py gram_dup_profile): per-language
# fraction of word 5-gram instances (and distinct 5-grams) occurring more
# than once — Lee et al. 2022's corpus duplication report. Grams are md5-
# hashed map-side (engine-portable, invariant 2; fixed-width shuffle key);
# the only floats are two single divides of exact BIGINTs, rounded 6.
# ---------------------------------------------------------------------------
DUP_N = 5
_DUP_GRAM = " || ' ' || ".join(f"w[i + {j}]" for j in range(DUP_N))


def q_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("lang", "text")
    return T.gram_dup_profile(docs, n=DUP_N)


SQL_DUP_PROFILE = f"""
WITH wds AS (
  SELECT lang, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM documents
),
grams AS (
  SELECT lang, md5({_DUP_GRAM}) AS h
  FROM wds, unnest(range(1, len(w) - {DUP_N - 2})) AS t(i)
  WHERE len(w) >= {DUP_N}
),
tc AS (SELECT lang, h, CAST(count(*) AS BIGINT) AS c FROM grams GROUP BY lang, h),
agg AS (
  SELECT lang,
         CAST(sum(c) AS BIGINT) AS total_grams,
         CAST(count(*) AS BIGINT) AS distinct_grams,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup_instances,
         CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_distinct
  FROM tc GROUP BY lang
)
SELECT lang, total_grams, distinct_grams, dup_instances, dup_distinct,
       round(CAST(dup_instances AS DOUBLE) / total_grams, 6) AS dup_instance_frac,
       round(CAST(dup_distinct AS DOUBLE) / distinct_grams, 6) AS dup_distinct_frac
FROM agg
"""


# ---------------------------------------------------------------------------
# Flesch reading-ease report (textstats.py readability): per-language mean
# FRE + counts in the standard 90/60/30 bands. Each doc's fre is one
# double expression of exact regex-count integers and three decimal
# literals (emitted as CAST('x' AS DOUBLE) strings — never bare float
# literals, which DuckDB would route through DECIMAL), rounded 6; the mean
# sums fixed6-quantized values in BIGINT; bands compare the ROUNDED fre.
# ---------------------------------------------------------------------------
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("lang", "text")
    return T.readability(docs)


SQL_READABILITY = f"""
WITH per_doc AS (
  SELECT lang,
         CAST(len(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS BIGINT) AS w,
         greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS s,
         CAST(list_sum(list_transform(regexp_extract_all(lower(text), '{TOKEN_RUN}'),
                t -> greatest(1, len(regexp_extract_all(t, '[aeiouy]+'))))) AS BIGINT)
           AS sy
  FROM documents
),
scored AS (
  SELECT lang,
         round(CAST('206.835' AS DOUBLE)
               - CAST('1.015' AS DOUBLE) * (CAST(w AS DOUBLE) / s)
               - CAST('84.6' AS DOUBLE) * (CAST(sy AS DOUBLE) / w), 6) AS fre
  FROM per_doc WHERE w > 0
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       round(CAST(sum({SQL_FIXED6_LONG.format(col="fre")}) AS DOUBLE)
             / (count(*) * 1e6), 6) AS avg_fre,
       CAST(sum(CASE WHEN fre >= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_very_easy,
       CAST(sum(CASE WHEN fre >= 60 AND fre < 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_standard,
       CAST(sum(CASE WHEN fre >= 30 AND fre < 60 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_difficult,
       CAST(sum(CASE WHEN fre < 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_very_hard
FROM scored GROUP BY lang
"""


# ---------------------------------------------------------------------------
# Cross-source shingle overlap (textstats.py source_overlap): exact 5-gram
# Jaccard between source pairs sharing >= 1 shingle (Broder 1997 exact
# resemblance; the syndication/redundancy matrix). md5 grams (invariant
# 2), distinct-first uniform keys, fan-out bounded by source-taxonomy²;
# the one float is a single divide of exact BIGINTs rounded 6.
# ---------------------------------------------------------------------------
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("source", "text")
    return T.source_overlap(docs, n=DUP_N)


SQL_SOURCE_OVERLAP = f"""
WITH wds AS (
  SELECT source, regexp_extract_all(lower(text), '{TOKEN_RUN}') AS w FROM documents
),
st AS (
  SELECT DISTINCT source, md5({_DUP_GRAM}) AS h
  FROM wds, unnest(range(1, len(w) - {DUP_N - 2})) AS t(i)
  WHERE len(w) >= {DUP_N}
),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM st GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM st a JOIN st b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT i.source_a, i.source_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union,
       round(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.source = i.source_a
JOIN sizes sb ON sb.source = i.source_b
"""


# ---------------------------------------------------------------------------
# BPE tokenizer training (training_data/bpe.py): the FULL iterative merge
# loop — vocabulary collapse, per-step pair counts, deterministic argmax
# (count desc, lhs asc, rhs asc), left-to-right literal-replace merge —
# replayed in DuckDB as chained CTEs (the ann_ivf_trained pattern). All
# integers/strings: no floats, no hashes, so the trained table is
# bit-identical by construction. bpe_tokenize then applies the trained
# rules to the vocabulary and emits the top subword frequencies.
# ---------------------------------------------------------------------------
BPE_MERGES_K = 8
BPE_TOP = 20


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import bpe as B

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return B.train_bpe_merges(docs, num_merges=BPE_MERGES_K)


def q_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import bpe as B

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = B.train_bpe_merges(docs, num_merges=BPE_MERGES_K)
    return B.subword_frequencies(docs, merges, top=BPE_TOP)


def _bpe_ctes(k: int) -> str:
    """w0 = |-encoded vocabulary; per step i: p_i pair counts, m_i argmax,
    w_i merged vocabulary. DuckDB arrays are 1-indexed; range(1, len(s)) is
    empty for single-symbol words, so no size guard is needed (Spark's side
    filters size >= 2 before sequence())."""
    cte = rf"""w0 AS (
  SELECT regexp_replace(word, '(.)', '|\1|', 'g') AS enc, freq FROM (
    SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RUN}')) AS word
      FROM documents
    ) GROUP BY word
  )
)"""
    for i in range(1, k + 1):
        cte += f""",
p{i} AS (
  SELECT s[i] AS lhs, s[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_count
  FROM (SELECT string_split(trim(enc, '|'), '||') AS s, freq FROM w{i - 1}),
       unnest(range(1, len(s))) AS t(i)
  GROUP BY s[i], s[i + 1]
),
m{i} AS (
  SELECT {i} AS step, lhs, rhs, lhs || rhs AS merged, pair_count
  FROM p{i} ORDER BY pair_count DESC, lhs ASC, rhs ASC LIMIT 1
),
w{i} AS (
  SELECT CASE WHEN m.lhs IS NULL THEN enc
              ELSE replace(enc, '|' || m.lhs || '||' || m.rhs || '|',
                           '|' || m.merged || '|') END AS enc, freq
  FROM w{i - 1} LEFT JOIN m{i} m ON TRUE
)"""
    return cte


SQL_BPE_MERGES = f"""
WITH {_bpe_ctes(BPE_MERGES_K)}
{" UNION ALL ".join(
    f"SELECT step, lhs, rhs, merged, pair_count FROM m{i}"
    for i in range(1, BPE_MERGES_K + 1)
)}
"""

SQL_BPE_TOKENIZE = f"""
WITH {_bpe_ctes(BPE_MERGES_K)}
SELECT token, CAST(sum(freq) AS BIGINT) AS tok_count
FROM (
  SELECT unnest(string_split(trim(enc, '|'), '||')) AS token, freq
  FROM w{BPE_MERGES_K}
)
GROUP BY token
ORDER BY tok_count DESC, token ASC
LIMIT {BPE_TOP}
"""


# ---------------------------------------------------------------------------
# Context-window chunking (textstats.chunk_documents): fixed-size sliding
# windows with overlap over each doc's whitespace token stream — the
# RAG-index / long-doc-pretraining prep step (sequence_packing is the
# cross-doc concat-and-split shape; this is the per-doc overlapped one).
# Pure strings + integers + md5 chunk hashes (invariant 2): bit-identical
# replay. No shuffle at all on the Spark side — one narrow map + explode.
# ---------------------------------------------------------------------------
CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def q_context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import textstats as X

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return X.chunk_documents(docs, size=CHUNK_SIZE, stride=CHUNK_STRIDE)


SQL_CONTEXT_CHUNKS = rf"""
WITH w AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS words
  FROM documents
),
s AS (SELECT doc_id, words, len(words) AS n FROM w WHERE len(words) >= 1)
SELECT doc_id,
       CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       CAST(start AS BIGINT) AS start_tok,
       CAST(len(list_slice(words, start + 1, start + {CHUNK_SIZE})) AS BIGINT)
         AS n_tok,
       md5(array_to_string(list_slice(words, start + 1, start + {CHUNK_SIZE}),
                           ' ')) AS chunk_hash
FROM s, unnest(range(0, n, {CHUNK_STRIDE})) AS t(start)
"""


# ---------------------------------------------------------------------------
# Tokenizer fertility by language (subword tokens per word under the
# trained BPE) — the metric a multilingual-tokenizer audit reads to spot
# languages the vocabulary underserves (fertility ~1 = well covered,
# high fertility = words shatter into many pieces). Trains the SAME
# 8-merge BPE as bpe_merges on the full corpus, then applies the rules to
# the per-(lang, word) vocabulary with the identical literal-replace
# chain on both sides; subword counts weight by exact word frequencies,
# so fertility is one divide of BIGINTs rounded 6. Segmenting the
# VOCABULARY (not the token stream) is the scale shape: cost is |vocab|,
# not corpus length, and the rejoin key (lang, word) is uniform.
# ---------------------------------------------------------------------------
def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .training_data import bpe as B

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = B.train_bpe_merges(docs, num_merges=BPE_MERGES_K)
    rules = B._merge_rules(merges)
    words = F.expr(f"regexp_extract_all(lower(text), '{TOKEN_RUN}', 0)")
    perword = (
        docs.select("lang", F.explode(words).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    enc = F.regexp_replace("word", "(.)", r"|$1|")
    for lhs, rhs in rules:
        enc = F.replace(
            enc, F.lit(f"|{lhs}||{rhs}|"), F.lit(f"|{lhs}{rhs}|")
        )
    n_sub = F.size(
        F.split(F.btrim(enc, F.lit("|")), r"\|\|")
    ).cast("long")
    return (
        perword.select("lang", "freq", n_sub.alias("n_sub"))
        .groupBy("lang")
        .agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(F.col("freq") * F.col("n_sub"))
            .cast("long")
            .alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            "n_subwords",
            F.round(
                F.col("n_subwords").cast("double")
                / F.col("n_words").cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("lang")
    )


def _bpe_fertility_sql() -> str:
    chain = r"""perword AS (
  SELECT lang, word, CAST(count(*) AS BIGINT) AS freq FROM (
    SELECT lang,
           unnest(regexp_extract_all(lower(text), '{tok}')) AS word
    FROM documents
  ) GROUP BY lang, word
),
v0 AS (
  SELECT lang, freq, regexp_replace(word, '(.)', '|\1|', 'g') AS enc
  FROM perword
)""".format(tok=TOKEN_RUN)
    for i in range(1, BPE_MERGES_K + 1):
        chain += f""",
v{i} AS (
  SELECT lang, freq,
         CASE WHEN m.lhs IS NULL THEN enc
              ELSE replace(enc, '|' || m.lhs || '||' || m.rhs || '|',
                           '|' || m.merged || '|') END AS enc
  FROM v{i - 1} LEFT JOIN m{i} m ON TRUE
)"""
    return f"""
WITH {_bpe_ctes(BPE_MERGES_K)},
{chain}
SELECT lang, CAST(sum(freq) AS BIGINT) AS n_words,
       CAST(sum(freq * len(string_split(trim(enc, '|'), '||')))
            AS BIGINT) AS n_subwords,
       round(CAST(CAST(sum(freq * len(string_split(trim(enc, '|'), '||')))
                       AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(freq) AS BIGINT) AS DOUBLE), 6) AS fertility
FROM v{BPE_MERGES_K}
GROUP BY lang
ORDER BY lang
"""


SQL_BPE_FERTILITY = _bpe_fertility_sql()


QUERIES_CUR = {
    "pii_redaction": q_pii_redaction,
    "gopher_quality": q_gopher_quality,
    "repetition_stats": q_repetition_stats,
    "line_dedup": q_line_dedup,
    "decontamination": q_decontamination,
    "stratified_sample": q_stratified_sample,
    "quota_sample": q_quota_sample,
    "domain_top_k": q_domain_top_k,
    "sequence_packing": q_sequence_packing,
    "corpus_mix_report": q_corpus_mix_report,
    "url_blocklist": q_url_blocklist,
    "gopher_repetition": q_gopher_repetition,
    "c4_rules": q_c4_rules,
    "dedup_spans": q_dedup_spans,
    "bloom_dedup": q_bloom_dedup,
    "tfidf_keywords": q_tfidf_keywords,
    "bigram_pmi": q_bigram_pmi,
    "zipf_stats": q_zipf_stats,
    "heaps_law": q_heaps_law,
    "skipgram_pmi": q_skipgram_pmi,
    "dup_profile": q_dup_profile,
    "readability": q_readability,
    "source_overlap": q_source_overlap,
    "lm_quality": q_lm_quality,
    "lm_quality_by_lang": q_lm_quality_by_lang,
    "dsir_weights": q_dsir_weights,
    "temperature_sample": q_temperature_sample,
    "hash_split": q_hash_split,
    "bpe_merges": q_bpe_merges,
    "bpe_tokenize": q_bpe_tokenize,
    "bpe_fertility": q_bpe_fertility,
    "context_chunks": q_context_chunks,
}

ORACLES_CUR = {
    "pii_redaction": SQL_PII_REDACTION,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "repetition_stats": SQL_REPETITION_STATS,
    "line_dedup": SQL_LINE_DEDUP,
    "decontamination": SQL_DECONTAMINATION,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "quota_sample": SQL_QUOTA_SAMPLE,
    "domain_top_k": SQL_DOMAIN_TOP_K,
    "sequence_packing": SQL_SEQUENCE_PACKING,
    "corpus_mix_report": SQL_CORPUS_MIX_REPORT,
    "url_blocklist": SQL_URL_BLOCKLIST,
    "gopher_repetition": SQL_GOPHER_REPETITION,
    "c4_rules": SQL_C4_RULES,
    "dedup_spans": SQL_DEDUP_SPANS,
    "bloom_dedup": SQL_BLOOM_DEDUP,
    "tfidf_keywords": SQL_TFIDF_KEYWORDS,
    "bigram_pmi": SQL_BIGRAM_PMI,
    "zipf_stats": SQL_ZIPF_STATS,
    "heaps_law": SQL_HEAPS_LAW,
    "skipgram_pmi": SQL_SKIPGRAM_PMI,
    "dup_profile": SQL_DUP_PROFILE,
    "readability": SQL_READABILITY,
    "source_overlap": SQL_SOURCE_OVERLAP,
    "lm_quality": SQL_LM_QUALITY,
    "lm_quality_by_lang": SQL_LM_QUALITY_BY_LANG,
    "dsir_weights": SQL_DSIR_WEIGHTS,
    "temperature_sample": SQL_TEMPERATURE_SAMPLE,
    "hash_split": SQL_HASH_SPLIT,
    "bpe_merges": SQL_BPE_MERGES,
    "bpe_tokenize": SQL_BPE_TOKENIZE,
    "bpe_fertility": SQL_BPE_FERTILITY,
    "context_chunks": SQL_CONTEXT_CHUNKS,
}
