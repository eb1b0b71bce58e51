"""Spellcheck service: dictionary build + distributed candidate generation.

The reference generates candidates with a pg_trgm LATERAL join per suspect
word (``app/api/main.py:36-56``): length band +-2, trigram-similar,
popularity >= 2.0, top-120 by (similarity DESC, popularity DESC). Here the
dictionary is a DataFrame; suspect words (a handful per query) broadcast
against it, trigram similarity is computed natively with array functions
(pg_trgm semantics: the word padded with two leading and one trailing
space, distinct trigrams, |intersection| / |union|), and the per-word top-k
is a window — the J7/T5 shape from SURVEY.md §2.3/§2.5.

Scale: the dictionary is ~10^5 rows (tiny); the suspect side is tinier and
always broadcast, so candidate generation never shuffles the dictionary.
The final choose/apply stage is driver-side on <= 120 rows/word, exactly
like the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..stopwords import STOPWORDS
from .engine import (
    TRUSTED_POPULARITY,
    WORD_RE,
    DictEntry,
    apply_case,
    choose_correction,
    normalize_word,
)

MIN_CANDIDATE_POPULARITY = 2.0  # main.py:68
MAX_CANDIDATES_PER_WORD = 120  # main.py:69

# pg_trgm-style padded trigram set: '  ' + word + ' '
_TRIGRAMS = (
    "array_distinct(transform(sequence(1, length({p}) - 2),"
    " i -> substring({p}, i, 3)))"
)


def _trigram_col(col: str) -> F.Column:
    padded = f"concat('  ', {col}, ' ')"
    return F.expr(_TRIGRAMS.format(p=padded))


def build_dictionary(documents: DataFrame, text_cols: tuple[str, ...] = ("title", "description", "content")) -> DataFrame:
    """(word, doc_frequency, total_frequency, external_frequency,
    popularity_score) — regex word mining over the doc corpus
    (``spellcheck_dictionary.py:124-147``; external frequencies = 0 absent
    the wordlist fixture) + popularity (``engine.py:103-108``)."""
    present = [c for c in text_cols if c in documents.columns]
    blob = F.lower(F.concat_ws(" ", *present))
    words = documents.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(blob, F.lit("[a-z]{2,32}"), F.lit(0))
        ).alias("word"),
    )
    # two-phase exact distinct: first shuffle on the uniform (word, doc_id)
    # key, then count collapsed pairs — head words never bottleneck one
    # reducer (see operators/term_stats.py)
    per_doc = words.groupBy("word", "doc_id").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    agg = per_doc.groupBy("word").agg(
        F.count(F.lit(1)).alias("doc_frequency"),
        F.sum("tf_doc").alias("total_frequency"),
    )
    pop = (
        F.log1p(F.col("doc_frequency").cast("double")) * 4.0
        + F.log1p(F.col("total_frequency").cast("double")) * 2.0
    )
    return agg.select(
        "word",
        "doc_frequency",
        "total_frequency",
        F.lit(0).alias("external_frequency"),
        pop.alias("popularity_score"),
    )


def trigram_candidates(
    dictionary: DataFrame,
    suspect_words: list[str],
    min_popularity: float = MIN_CANDIDATE_POPULARITY,
    limit: int = MAX_CANDIDATES_PER_WORD,
) -> DataFrame:
    """(input_word, word, similarity, doc_frequency, total_frequency,
    external_frequency, popularity_score) — per-suspect top-``limit``.

    Broadcast similarity join (J7) + per-input window top-k (T5): length
    band GREATEST(2, len-2)..len+2, pg_trgm similarity > 0, popularity
    floor, ORDER BY similarity DESC, popularity DESC (word ASC appended
    for a deterministic total order — Postgres leaves this tie unordered).
    """
    spark = dictionary.sparkSession
    # DISTINCT inputs (main.py:38-39): a word repeated in the query must not
    # duplicate candidate rows — row_number would count each candidate k
    # times and the top-`limit` cut would keep only ~limit/k distinct words
    distinct_words = sorted({normalize_word(w) for w in suspect_words})
    inputs = spark.createDataFrame(
        [(w,) for w in distinct_words], "input_word string"
    ).withColumn("_tg_i", _trigram_col("input_word"))
    dic = dictionary.withColumn("_tg_w", _trigram_col("word"))
    joined = (
        dic.join(F.broadcast(inputs))
        .filter(
            (F.col("popularity_score") >= min_popularity)
            & (
                F.length("word").between(
                    F.greatest(F.lit(2), F.length("input_word") - 2),
                    F.length("input_word") + 2,
                )
            )
        )
        .withColumn("_n_inter", F.size(F.array_intersect("_tg_w", "_tg_i")))
        .filter(F.col("_n_inter") > 0)
        .withColumn(
            "similarity",
            F.col("_n_inter")
            / (F.size("_tg_w") + F.size("_tg_i") - F.col("_n_inter")),
        )
    )
    w = Window.partitionBy("input_word").orderBy(
        F.desc("similarity"), F.desc("popularity_score"), F.asc("word")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .select(
            "input_word",
            "word",
            "similarity",
            "doc_frequency",
            "total_frequency",
            "external_frequency",
            "popularity_score",
        )
    )


def prefix_candidates(
    dictionary: DataFrame,
    suspect_words: list[str],
    min_popularity: float = MIN_CANDIDATE_POPULARITY,
    limit: int = MAX_CANDIDATES_PER_WORD,
) -> DataFrame:
    """J8 fallback candidate generator (``main.py:58-66``): length band,
    same first letter, popularity floor, top-``limit`` by popularity DESC
    (word ASC appended for determinism). The reference uses this when
    pg_trgm is unavailable; kept for surface parity and as the cheaper
    candidate path when trigram arrays are not materialized."""
    spark = dictionary.sparkSession
    inputs = spark.createDataFrame(
        [(w,) for w in sorted({normalize_word(w) for w in suspect_words})],
        "input_word string",
    )
    joined = dictionary.join(F.broadcast(inputs)).filter(
        (F.col("popularity_score") >= min_popularity)
        & (
            F.length("word").between(
                F.greatest(F.lit(2), F.length("input_word") - 2),
                F.length("input_word") + 2,
            )
        )
        & (F.substring("word", 1, 1) == F.substring("input_word", 1, 1))
    )
    w = Window.partitionBy("input_word").orderBy(
        F.desc("popularity_score"), F.asc("word")
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= limit)
        .select(
            "input_word",
            "word",
            "doc_frequency",
            "total_frequency",
            "external_frequency",
            "popularity_score",
        )
    )


def merge_frequency_sources(
    doc_words: DataFrame,
    news_words: DataFrame | None = None,
    external_words: DataFrame | None = None,
) -> DataFrame:
    """A10/U4: key-set union of the three frequency sources
    (``spellcheck_dictionary.py:151-194``), then the full popularity
    formula log1p(df)*4 + log1p(tf)*2 + log1p(ext)*3 (``engine.py:103-108``).

    doc_words: (word, doc_frequency, total_frequency); news_words:
    (word, total_frequency) — added into total_frequency like the
    reference's news corpus; external_words: (word, external_frequency).

    Shape: the reference spells this as two sequential ``FULL OUTER JOIN``s;
    here it is a 4-column union + one groupBy-sum instead. Semantically
    identical on per-word-unique inputs (each source contributes one row per
    word, so SUM over the union equals COALESCE over the joins), and
    strictly cheaper: a keyed full-outer join cannot broadcast, so even a
    4-row external list forced a full shuffle join of the merged relation —
    twice. The union shape is ONE shuffle with map-side partial aggregation
    (r02: 0.76 s -> 4.77 s regression traced to the double full-outer).
    """
    zero = F.lit(0).cast("long")
    parts = [
        doc_words.select(
            "word",
            F.col("doc_frequency").cast("long").alias("_df"),
            F.col("total_frequency").cast("long").alias("_tf"),
            zero.alias("_ext"),
        )
    ]
    if news_words is not None:
        parts.append(
            news_words.select(
                "word",
                zero.alias("_df"),
                F.col("total_frequency").cast("long").alias("_tf"),
                zero.alias("_ext"),
            )
        )
    if external_words is not None:
        parts.append(
            external_words.select(
                "word",
                zero.alias("_df"),
                zero.alias("_tf"),
                F.col("external_frequency").cast("long").alias("_ext"),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    # coalesce: a source row carrying a NULL count must merge as 0, like
    # the COALESCE in the reference's joined spelling (sum of an all-NULL
    # group is NULL, and log1p(NULL) would null the popularity score)
    merged = unioned.groupBy("word").agg(
        F.coalesce(F.sum("_df"), F.lit(0)).alias("doc_frequency"),
        F.coalesce(F.sum("_tf"), F.lit(0)).alias("total_frequency"),
        F.coalesce(F.sum("_ext"), F.lit(0)).alias("external_frequency"),
    )
    pop = (
        F.log1p(F.col("doc_frequency").cast("double")) * 4.0
        + F.log1p(F.col("total_frequency").cast("double")) * 2.0
        + F.log1p(F.col("external_frequency").cast("double")) * 3.0
    )
    return merged.withColumn("popularity_score", pop)


def load_external_wordlist(spark: SparkSession, path: str) -> DataFrame:
    """S8 analog: static word-frequency file -> (word, external_frequency).

    The reference fetches two HTTP wordlists at build time
    (``spellcheck_dictionary.py:32-110``) — a reproducibility hazard; here
    the list is a vendored fixture read with spark.read (no network).
    Format: ``word<TAB>count`` per line; malformed lines dropped.
    """
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return (
        lines.select(
            F.lower(F.trim(F.get(parts, 0))).alias("word"),
            F.get(parts, 1).cast("long").alias("external_frequency"),
        )
        .filter(
            F.col("word").rlike("^[a-z]{2,32}$")
            & F.col("external_frequency").isNotNull()
        )
        .groupBy("word")
        .agg(F.sum("external_frequency").alias("external_frequency"))
    )


class SpellcheckService:
    """suggest(q) -> corrected query string or None (main.py:97-197).

    The dictionary DataFrame is scanned once per suggest() for known-word
    lookup + candidates; the hot top-meta cache (S10) is a driver dict of
    the most popular ``meta_words`` entries, mirroring the reference's
    mtime-cached JSON meta file.
    """

    def __init__(
        self,
        spark: SparkSession,
        dictionary: DataFrame,
        meta_words: int = 120_000,
    ):
        self.spark = spark
        self.dictionary = dictionary
        rows = (
            dictionary.orderBy(F.desc("popularity_score"), F.asc("word"))
            .limit(meta_words)
            .collect()
        )
        self._meta: dict[str, DictEntry] = {
            r["word"]: DictEntry(
                word=r["word"],
                doc_frequency=r["doc_frequency"],
                total_frequency=r["total_frequency"],
                external_frequency=r["external_frequency"],
                popularity_score=r["popularity_score"],
            )
            for r in rows
        }

    def _lookup_known(self, words: list[str]) -> dict[str, DictEntry]:
        known = {w: self._meta[w] for w in words if w in self._meta}
        missing = [w for w in words if w not in known]
        if missing:
            for r in self.dictionary.filter(F.col("word").isin(missing)).collect():
                known[r["word"]] = DictEntry(
                    word=r["word"],
                    doc_frequency=r["doc_frequency"],
                    total_frequency=r["total_frequency"],
                    external_frequency=r["external_frequency"],
                    popularity_score=r["popularity_score"],
                )
        return known

    def suggest(self, q: str) -> str | None:
        words = [normalize_word(w) for w in WORD_RE.findall(q)]
        words = [w for w in words if w and w not in STOPWORDS]
        if not words:
            return None

        known = self._lookup_known(words)
        suspect = [
            w
            for w in words
            if not (
                w in known and known[w].popularity_score >= TRUSTED_POPULARITY
            )
        ]
        if not suspect:
            return None

        cand_rows = trigram_candidates(self.dictionary, suspect).collect()
        by_word: dict[str, dict[str, DictEntry]] = {}
        for r in cand_rows:
            by_word.setdefault(r["input_word"], {})[r["word"]] = DictEntry(
                word=r["word"],
                doc_frequency=r["doc_frequency"],
                total_frequency=r["total_frequency"],
                external_frequency=r["external_frequency"],
                popularity_score=r["popularity_score"],
            )

        corrected: dict[str, str] = {}
        for w in suspect:
            best = choose_correction(
                w, known.get(w), by_word.get(w, {}).values()
            )
            if best:
                corrected[w] = best
        if not corrected:
            return None

        def _replace(m) -> str:
            token = m.group(0)
            repl = corrected.get(token.lower())
            return apply_case(token, repl) if repl else token

        suggestion = WORD_RE.sub(_replace, q)
        return None if suggestion == q else suggestion
