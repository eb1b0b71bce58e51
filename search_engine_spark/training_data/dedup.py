"""Near-duplicate detection: MinHash+LSH, n-gram Jaccard, SimHash banding.

All three families work on word-shingle sets produced by :func:`shingles`.
Hashing is engine-portable: a shingle's "hash" is its md5 hex string (seeded
by prefixing ``"<seed>:"``), and MinHash takes the lexicographic minimum of
those strings — identical in any engine with md5, so the DuckDB oracle can
replay the exact signature. The reference has only the never-consumed Simhash
job (``app/batch/duplicate_detection.py:45-69``); everything else here is new
scale capability.

Scale notes (100 TB corpus):

- every groupBy below is a hash aggregation with map-side partial min/sum —
  the shuffle carries one row per (doc, seed) or (doc, band), never the raw
  shingle stream;
- candidate generation is strictly bucket-equality self-joins (band hash,
  16-bit SimHash band), so Catalyst plans them as shuffle-hash/sort-merge on
  a key whose cardinality grows with the corpus — no cross join anywhere;
- verification (exact Jaccard / Hamming) runs only on bucket-collision pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RUN = "[a-z0-9]{2,}"

# SimHash banding: 4 bands x 16 bits. By pigeonhole, any pair with Hamming
# distance <= 3 agrees exactly on at least one band, so the band join is a
# lossless candidate generator for the <=3 radius (and a high-recall one for
# slightly larger radii).
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = 16


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn(
        "_words",
        F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RUN}', 0)"),
    )


def shingles(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """(id_cols..., shingle) — distinct word k-grams per document.

    Word k-grams (space-joined) are the dedup unit; DISTINCT inside the doc so
    Jaccard is over *sets*, matching MinHash semantics.
    """
    terms = " || ' ' || ".join(f"_words[i + {j}]" for j in range(k))
    return (
        _words(df, text_col)
        .withColumn(
            "shingle",
            F.explode(
                F.expr(
                    f"CASE WHEN size(_words) < {k} THEN array() "
                    f"ELSE transform(sequence(0, size(_words) - {k}), i -> {terms}) END"
                )
            ),
        )
        .drop("_words", text_col)
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, id_col: str = "doc_id", num_perm: int = 9
) -> DataFrame:
    """(id, seed, minhash) — portable MinHash.

    h_seed(s) = md5(seed || ':' || s); signature = lexicographic MIN of the
    hex strings per seed. The seed table is tiny and broadcast; the min is
    computed with map-side partial aggregation, so the shuffle is
    |docs| * num_perm rows regardless of shingle count.
    """
    spark = shingle_df.sparkSession
    seeds = spark.range(num_perm).select(F.col("id").cast("int").alias("seed"))
    return (
        shingle_df.join(F.broadcast(seeds))
        .select(
            id_col,
            "seed",
            F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle"))).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 3,
) -> DataFrame:
    """(id_a, id_b) — docs whose signatures collide in >= 1 LSH band.

    The band count is num_perm / rows_per_band (derived from the seeds
    actually present — not a separate parameter that could silently
    disagree). Band hash = md5 of the band's row minhashes joined in seed
    order (order fixed via sort_array over (seed, minhash) structs —
    deterministic under any shuffle). Self-join on (band, band_hash) with
    id_a < id_b.
    """
    band_tbl = (
        signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    "|",
                    F.expr(
                        "transform(sort_array(collect_list(struct(seed, minhash))),"
                        " x -> x.minhash)"
                    ),
                )
            ).alias("band_hash")
        )
    )
    a = band_tbl.select(
        F.col(id_col).alias("id_a"), "band", F.col("band_hash").alias("bh_a")
    )
    b = band_tbl.select(
        F.col(id_col).alias("id_b"), "band", F.col("band_hash").alias("bh_b")
    )
    return (
        a.join(
            b,
            (a.band == b.band) & (a.bh_a == b.bh_b) & (a.id_a < b.id_b),
        )
        .select("id_a", "id_b")
        .distinct()
    )


def _per_doc_shingle_arrays(
    shingle_df: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """(_id, _shingles, n_shingles, _prefix) — per doc, the md5-canonically
    ordered shingle array, its size, and the first ``n - ceil(t*n) + 1``
    elements (the AllPairs prefix for threshold ``t``). One groupBy: sizes,
    arrays, and prefixes share the shuffle; no per-doc window sort."""
    return (
        shingle_df.groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.md5("shingle").alias("h"), F.col("shingle").alias("s"))
                )
            ).alias("_arr")
        )
        .select(
            F.col(id_col).alias("_id"),
            F.transform("_arr", lambda x: x["s"]).alias("_shingles"),
            F.size("_arr").alias("n_shingles"),
        )
        .withColumn(
            "_plen",
            F.col("n_shingles")
            - F.ceil(F.lit(threshold) * F.col("n_shingles"))
            + 1,
        )
        .withColumn(
            "_prefix", F.slice("_shingles", F.lit(1), F.col("_plen").cast("int"))
        )
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(id_a, id_b, jaccard) — EXACT set Jaccard >= threshold, via lossless
    prefix filtering (SSJoin/AllPairs family) instead of the all-pairs
    shingle self-join.

    Prefix principle: order the shingle universe by the canonical
    (md5(shingle), shingle) total order; a doc with n shingles keeps only
    its first ``n - ceil(t*n) + 1`` as join keys. Any pair with
    J(A,B) >= t shares >= t*max(|A|,|B|) elements, so it MUST collide
    inside both prefixes — the filter loses nothing, and at t=0.5 halves
    the join input while skipping every pair whose overlap is provably
    below threshold. Candidates are generated ids-only (invariant 6: no
    wide payloads through the skewed shingle key), then the exact
    intersection is recomputed per candidate pair over the FULL shingle
    sets via two uniform-key joins (id_a, then (id_b, shingle)) — work
    bounded by sum(|A|) over candidates, not over all co-occurring pairs.

    Output is identical to the brute-force join (the DuckDB oracle still
    computes it that way); only the plan shape changes. One groupBy
    produces, per doc, the md5-sorted shingle ARRAY, its size, and the
    sliced prefix — sizes and prefixes share the shuffle, and there is no
    per-doc window sort. Only prefixes are exploded for the candidate
    join; verification joins the two per-doc arrays (one row per
    candidate pair, uniform id keys) and intersects them JVM-side.
    """
    per_doc = _per_doc_shingle_arrays(shingle_df, id_col, threshold)
    prefix = per_doc.select("_id", F.explode("_prefix").alias("shingle"))
    cand = (
        prefix.select(F.col("_id").alias("id_a"), "shingle")
        .join(prefix.select(F.col("_id").alias("id_b"), "shingle"), "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    a = per_doc.select(
        F.col("_id").alias("id_a"),
        F.col("_shingles").alias("_sa"),
        F.col("n_shingles").alias("size_a"),
    )
    b = per_doc.select(
        F.col("_id").alias("id_b"),
        F.col("_shingles").alias("_sb"),
        F.col("n_shingles").alias("size_b"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def containment_pairs(
    shingle_df: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, overlap) — EXACT overlap coefficient
    ``|A∩B| / min(|A|,|B|) >= threshold``: subset/containment duplication
    that Jaccard misses (a short doc quoted whole inside a long one has
    overlap 1.0 but Jaccard only |A|/|B|) — the asymmetric complement of
    :func:`ngram_jaccard_pairs` for boilerplate/quotation dedup.

    Lossless candidate filter (smaller-side prefix): if overlap >= t, the
    smaller set A shares >= ceil(t*|A|) elements with B, so by pigeonhole
    A's first ``|A| - ceil(t*|A|) + 1`` shingles in the canonical
    (md5(shingle), shingle) order must hit B's FULL set. Candidates are
    therefore prefix(x) JOIN full(y) on shingle — ids only (invariant 6) —
    canonicalized to unordered (least, greatest) pairs; the exact
    intersection is then recomputed per candidate over the full per-doc
    arrays (two uniform-id joins, array_intersect JVM-side). Unlike the
    Jaccard filter both directions must probe the full side, so a head
    shingle's fan-out is (prefix occupancy) x (document frequency) — at
    t=0.9 prefixes keep ~10% of each doc, bounding the blow-up at ~0.1*df²
    per hot shingle versus the naive join's df².
    """
    per_doc = _per_doc_shingle_arrays(shingle_df, id_col, threshold)
    prefix = per_doc.select("_id", F.explode("_prefix").alias("shingle"))
    full = per_doc.select("_id", F.explode("_shingles").alias("shingle"))
    cand = (
        prefix.select(F.col("_id").alias("_pid"), "shingle")
        .join(full.select(F.col("_id").alias("_fid"), "shingle"), "shingle")
        .filter(F.col("_pid") != F.col("_fid"))
        .select(
            F.least("_pid", "_fid").alias("id_a"),
            F.greatest("_pid", "_fid").alias("id_b"),
        )
        .distinct()
    )
    a = per_doc.select(
        F.col("_id").alias("id_a"),
        F.col("_shingles").alias("_sa"),
        F.col("n_shingles").alias("size_a"),
    )
    b = per_doc.select(
        F.col("_id").alias("id_b"),
        F.col("_shingles").alias("_sb"),
        F.col("n_shingles").alias("size_b"),
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_common", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "overlap",
            F.round(
                F.col("n_common") / F.least("size_a", "size_b"),
                6,
            ),
        )
        .filter(F.col("overlap") >= threshold)
        .select("id_a", "id_b", "overlap")
    )


def canonical_representatives(
    components: DataFrame,
    scores: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """(component, canonical_doc, <score_col>, n_members) — per dup cluster,
    the member a curation pipeline KEEPS: argmax(score), ties to the min id
    (:func:`connected_components` picks min-id unconditionally; real
    pipelines keep the best-quality duplicate instead).

    Shape: one uniform-key join on the id (``components`` rows are ids
    only, invariant 6) and one shuffle on ``component``; the argmax is a
    struct-max aggregate — partial-aggregated map-side, no window sort, so
    a pathologically large dup cluster costs a hot reducer key but never a
    per-cluster sort.
    """
    joined = components.join(
        scores.select(F.col(id_col), F.col(score_col)), id_col
    )
    best = F.max(
        F.struct(F.col(score_col).alias("_s"), (-F.col(id_col)).alias("_nid"))
    ).alias("_best")
    return (
        joined.groupBy("component")
        .agg(best, F.count(F.lit(1)).alias("n_members"))
        .select(
            "component",
            (-F.col("_best._nid")).alias("canonical_doc"),
            F.col("_best._s").alias(score_col),
            "n_members",
        )
    )


# 16 md5 hex nibbles parsed ONCE per token (j=0 is the MSB of the first
# nibble; fingerprint position p = 63 - j so md5's leading bits land in
# the high bits including the sign, reproducing the reference's signed
# two's-complement wrap, ``duplicate_detection.py:11-14``)
_NIBS_SQL = (
    "transform(sequence(1, 16), i -> "
    "instr('0123456789abcdef', substring(_h, i, 1)) - 1)"
)


def _wide_votes(tokens: DataFrame) -> DataFrame:
    """(doc_id, v0..v63) — per-doc signed vote totals, one column per
    fingerprint position.

    tokens: (doc_id, term, tf). Bit j of md5(term) votes +tf / -tf at
    position p = 63 - j. WIDE-AGGREGATE formulation: the md5 nibbles are
    parsed once per token and the 64 positions are 64 SUM expressions in
    ONE whole-stage-codegen aggregate keyed by the uniform doc_id — no
    64x row explosion (the r02 shape expanded every token into 64 rows
    with per-row substring/instr work: at 10^6 tokens that is 6.4*10^7
    string probes and rows through the partial aggregate; here the
    shuffle carries one 65-column row per doc).
    """
    aggs = []
    for p in range(64):
        j = 63 - p
        bit = f"(shiftright(element_at(_nibs, {j // 4 + 1}), {3 - j % 4}) % 2)"
        aggs.append(F.sum(F.expr(f"tf * ({bit} * 2 - 1)")).alias(f"v{p}"))
    return (
        tokens.withColumn("_h", F.md5("term"))
        .withColumn("_nibs", F.expr(_NIBS_SQL))
        .groupBy("doc_id")
        .agg(*aggs)
    )


def _bit_if_positive(p: int, shift: int) -> F.Column:
    return F.expr(
        f"case when v{p} > 0 then shiftleft(cast(1 as bigint), {shift}) "
        f"else cast(0 as bigint) end"
    )


def simhash_fingerprints(tokens: DataFrame) -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash as signed BIGINT.

    Portable formulation (no Python UDF, md5-only bit math so the DuckDB
    oracle replays it exactly): set bit p where the position's vote total
    is positive; shiftleft(1L, 63) wraps negative in two's complement in
    both engines, matching the reference's signed storage.
    """
    fp = _bit_if_positive(0, 0)
    for p in range(1, 64):
        fp = fp + _bit_if_positive(p, p)
    return _wide_votes(tokens).select("doc_id", fp.alias("simhash"))


def simhash_bands(tokens: DataFrame) -> DataFrame:
    """(doc_id, band, band_value, simhash) — 4 x 16-bit band values + full
    fingerprint.

    Band values are built from the per-position votes directly (not by
    shifting the signed fingerprint) so no engine-specific signed-shift
    semantics are involved; the fingerprint is the same vote columns
    assembled at their absolute positions (bit 63 wraps into the sign).
    """
    wide = _wide_votes(tokens)
    band_cols = []
    for b in range(64 // SIMHASH_BAND_BITS):
        bv = _bit_if_positive(b * SIMHASH_BAND_BITS, 0)
        for i in range(1, SIMHASH_BAND_BITS):
            bv = bv + _bit_if_positive(b * SIMHASH_BAND_BITS + i, i)
        band_cols.append(bv.alias(f"_bv{b}"))
    fp = _bit_if_positive(0, 0)
    for p in range(1, 64):
        fp = fp + _bit_if_positive(p, p)
    n_bands = 64 // SIMHASH_BAND_BITS
    stack_args = ", ".join(f"{b}, _bv{b}" for b in range(n_bands))
    return wide.select("doc_id", fp.alias("simhash"), *band_cols).selectExpr(
        "doc_id",
        "simhash",
        f"stack({n_bands}, {stack_args}) as (band, band_value)",
    ).select("doc_id", "band", "band_value", "simhash")


def simhash_near_dup(tokens: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_a, id_b, hamming) — pairs within Hamming <= max_hamming.

    Candidate pairs via 16-bit band-equality self-join (lossless for
    radius <= 3 by pigeonhole over 4 bands), then exact bit_count(xor)
    verification. The band join shuffles on (band, band_value) — corpus-
    cardinality key, no cross join.
    """
    bt = simhash_bands(tokens)
    a = bt.select(
        F.col("doc_id").alias("id_a"),
        "band",
        F.col("band_value").alias("bv_a"),
        F.col("simhash").alias("f_a"),
    )
    b = bt.select(
        F.col("doc_id").alias("id_b"),
        "band",
        F.col("band_value").alias("bv_b"),
        F.col("simhash").alias("f_b"),
    )
    return (
        a.join(b, (a.band == b.band) & (a.bv_a == b.bv_b) & (a.id_a < b.id_b))
        .select("id_a", "id_b", F.expr("bit_count(f_a ^ f_b)").alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond", CC-MR family): every node attaches all its
    STRICTLY LARGER neighbors to the minimum of its closed neighborhood.
    Input/output: undirected edge set, one row per direction not required
    (bidirectionalized here)."""
    b = edges.select("u", "v").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        b.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", "u").alias("m"))
    )
    return (
        b.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: orient edges large->small; every node attaches
    its smaller-or-equal neighborhood (and itself) to the neighborhood
    minimum."""
    c = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = c.groupBy("u").agg(F.min("v").alias("m"))
    star = c.join(mins, "u").select(F.col("v").alias("u"), F.col("m").alias("v"))
    root = mins.select(F.col("u"), F.col("m").alias("v"))
    return (
        star.unionByName(root)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _edge_signature(edges: DataFrame) -> tuple:
    """(count, xor-ish hash sum) — cheap one-pass convergence check."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal(38,0) sum: 64-bit hash values would overflow a LongType
        # sum under ANSI mode
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component) — component = min id reachable via near-dup pairs.

    Alternating large-star / small-star contraction (Kiveris et al. 2014):
    converges in O(log^2 n) rounds REGARDLESS of component diameter —
    unlike plain min-label propagation, whose round count is the diameter
    and which silently truncated long chains at max_iter in r01. At
    convergence the edge set is a forest of stars (node -> component min);
    labels read straight off it. Each round is two group-aggregates + two
    joins on the uniformly distributed node id, localCheckpointed to keep
    lineage flat; convergence is detected by a one-pass (count, hash-sum)
    signature. Raises RuntimeError if max_iter rounds don't converge
    (never silently wrong; 50 rounds covers n far beyond 10^12).

    ``nodes``: optional (id) DataFrame; isolated nodes keep their own id as
    component. Deterministic: min/greatest are order-insensitive.
    """
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes is None:
        node_df = (
            edges.select(F.col("u").alias("id"))
            .unionByName(edges.select(F.col("v").alias("id")))
            .distinct()
        )
    else:
        node_df = nodes.select(F.col(id_col).alias("id")).distinct()

    sig = _edge_signature(edges)
    converged = sig[0] == 0
    for _ in range(max_iter):
        if converged:
            break
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _edge_signature(edges)
        converged = new_sig == sig
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"connected_components: star contraction did not converge in "
            f"{max_iter} rounds"
        )

    # converged edge set is (node -> its component's min id) stars
    child_root = edges.select(
        F.greatest("u", "v").alias("id"), F.least("u", "v").alias("root")
    )
    return (
        node_df.join(child_root, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("root", F.col("id")).alias("component"),
        )
    )


def dedup_keep_first(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop the higher-id member of every near-dup pair (greedy keep-first).

    Simple one-pass policy (not full connected components): any doc that
    appears as ``id_b`` in a pair is removed. Deterministic because pairs
    are always emitted with id_a < id_b.
    """
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")
