"""Embedding similarity search: brute-force cosine, kNN join, SRP-LSH ANN.

Vectors are ``array<float>`` columns; all arithmetic runs JVM-side through
Catalyst higher-order functions (``zip_with`` + ``aggregate``) in double
precision — no Python UDFs, no collect-and-loop.

The LSH family is sign-random-projection (SRP / random hyperplane): plane
component s(p, d) in {+1, -1} is derived from one md5 bit of the string
"<p>:<d>", so the hyperplanes are deterministic, identical across engines
(the DuckDB oracle re-derives them in SQL), and need no stored model.

Scale notes: brute-force kNN is probe-set x corpus (use only for small probe
sets or as the verifier); the SRP bucket join shuffles on the band value —
corpus-sized key space, no cross join — and exact cosine runs only on bucket
collisions. For 100 TB, raise ``n_planes``/``bands`` so buckets stay small
and pre-partition the corpus by bucket so repeated queries prune — that
layout is implemented (r04): ``write_srp_index`` writes the corpus
``partitionBy(band, bucket)`` and ``srp_index_probe`` serves each query
from a partition-pruned scan of its probe buckets (plan- and row-count-
asserted in tests/test_ann_layout.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..pair_helpers import fixed6_long


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array columns, computed in double."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def knn_join(
    probes: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 1,
) -> DataFrame:
    """(probe_id, nn_id, cosine, rank) — exact top-k neighbors per probe.

    Brute force: broadcast the (small) probe side against the corpus, rank
    per probe with a window. Ties broken by neighbor id ascending for
    determinism. Self-matches (same id) are excluded.
    """
    from pyspark.sql import Window

    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    c = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("_cv"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("nn_id"))
    return (
        F.broadcast(p)
        .join(c, F.col("probe_id") != F.col("nn_id"))
        .withColumn(
            "cosine", F.round(cosine_similarity_col(F.col("_pv"), F.col("_cv")), 6)
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "nn_id", "cosine", "rank")
    )


def srp_plane_sign(p: int, d: int) -> float:
    """Deterministic hyperplane component in {+1.0, -1.0}.

    Parity of the first hex nibble of md5("<p>:<d>") — replayable in SQL as
    (strpos('0123456789abcdef', substr(md5(p || ':' || d), 1, 1)) - 1) % 2.
    """
    nib = int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)
    return 1.0 if nib % 2 == 1 else -1.0


def srp_signs(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Adds ``srp_bits`` array<int>: sign bit per hyperplane (1 if dot > 0).

    Planes are embedded as literal arrays (driver computes the +-1 components
    from md5 — cheap, n_planes x dim values), so each sign is a single
    zip_with/aggregate over the vector; everything stays in codegen.
    """
    if dim is None:
        # note: inferring the dimension runs a job during plan construction;
        # pass dim explicitly in latency-sensitive paths
        first = df.select(vec_col).first()
        if first is None or first[0] is None:
            raise ValueError(
                "srp_signs: cannot infer vector dimension from an empty "
                "DataFrame — pass dim explicitly"
            )
        dim = len(first[0])
    # Formulation notes (both alternatives were measured SLOWER, r03):
    # a single transform() over one n_planes x dim literal evaluates the
    # same HOF machinery (no win), and unrolling the +-1 dots into a
    # 2048-term scalar chain blows past JIT/codegen method limits and
    # falls back to interpretation (10x slower). The per-plane
    # zip_with/aggregate fold below is the fastest Column spelling AND
    # the one whose summation order the DuckDB oracle replays
    # (list_sum(list_transform(...)), invariant 4). At 10^8+ vectors the
    # scale path is a bucket-partitioned store written once by this
    # expression, where per-row cost amortizes across queries.
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(srp_plane_sign(p, d)) for d in range(dim)])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), plane, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, 1).otherwise(0))
    return df.withColumn("srp_bits", F.array(*bits))


def srp_bucket(bits_col: Column, start: int, n_bits: int) -> Column:
    """Integer bucket from a slice [start, start+n_bits) of srp_bits."""
    expr = F.lit(0)
    for i in range(n_bits):
        expr = expr + F.element_at(bits_col, start + i + 1) * (1 << i)
    return expr


def srp_probe_buckets(
    vec: list[float], n_planes: int, bands: int
) -> list[tuple[int, int]]:
    """Driver-side (band, bucket) list for one probe vector.

    Same formula as the DataFrame path (dot of the double-cast vector with
    the md5-derived +-1 plane, left-to-right summation), so a probe's
    buckets can be computed without a Spark job and pushed into the scan as
    literal filters — at scale this prunes a bucket-partitioned index.
    """
    bits_per_band = n_planes // bands
    bits = []
    for p in range(n_planes):
        dot = 0.0
        for d, x in enumerate(vec):
            dot += float(x) * srp_plane_sign(p, d)
        bits.append(1 if dot > 0 else 0)
    out = []
    for b in range(bands):
        bucket = sum(
            bits[b * bits_per_band + i] << i for i in range(bits_per_band)
        )
        out.append((b, bucket))
    return out


def srp_banded(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """(id, band, bucket) — one row per band per vector."""
    bits_per_band = n_planes // bands
    sig = srp_signs(df, vec_col, n_planes, dim)
    return sig.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        srp_bucket(
                            F.col("srp_bits"), b * bits_per_band, bits_per_band
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def srp_bucketed_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 4,
    threshold: float = 0.995,
    dim: int | None = None,
) -> DataFrame:
    """(id_a, id_b, cosine) — near-dup pairs via banded SRP-LSH + exact verify.

    n_planes bits split into ``bands`` bands; id pairs colliding in any band
    (a *narrow* self-join — no vectors in the shuffle, ids deduped before the
    vectors are joined back for exact cosine verification). With 32 planes /
    4 8-bit bands a cosine-0.995 pair (theta ~= 0.1 rad) collides per band
    with p ~= 0.77 (miss-all ~2.8e-3), while random pairs (theta ~= pi/2)
    collide with p ~= 4e-3 per band, keeping the candidate set ~1000x smaller
    than the cross join. Raise ``bands`` for tighter recall; the unit suite
    checks planted-pair recall against brute force.
    """
    banded = srp_banded(df, id_col, vec_col, n_planes, bands, dim)
    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cand_ids = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn(
            "cosine", F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF: trained coarse quantizer (deterministic Lloyd k-means) + nprobe search
# ---------------------------------------------------------------------------
def _md5_rank(col: Column) -> Column:
    """Deterministic pseudo-random ordering key (no RNG, replayable)."""
    return F.md5(col.cast("string"))


def train_ivf_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic Lloyd k-means for the IVF coarse quantizer.

    - init: the k corpus vectors with the smallest md5(id) — a fixed
      pseudo-random sample, no RNG state, reproducible across runs/sessions.
    - assign: every vector to its max-cosine centroid (broadcast k
      centroid rows, JVM-side zip_with/aggregate math, map-side partial
      argmax via :func:`argmax_centroid`).
    - update: element-wise mean via posexplode to (cluster, dim) rows —
      map-side partial sums bound the shuffle at k*d rows per map
      partition; members are never collected. Empty clusters keep their
      previous centroid. Sums are FIXED-POINT (per-value micros, integer
      sum, double divide — the sum_fixed6 pattern): a float mean's
      accumulation order varies with partitioning, so borderline
      assignments could flip between runs; integer sums make the trained
      centroids bit-identical across runs, sessions AND engines (the
      ann_ivf_trained pair replays the whole loop in DuckDB). The 1e-6
      quantization of the means is far below assignment noise.

    The k x d centroid matrix lives on the driver between iterations
    (tiny); at 10^9+ vectors train on a deterministic sample (standard IVF
    practice: ~256*k vectors via the same md5 order) — assignment cost
    dominates and is the same one broadcast join either way.
    """
    spark = corpus.sparkSession
    seeds = (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(_md5_rank(F.col(id_col)), F.col(id_col))
        .limit(k)
        .collect()
    )
    cents: list[list[float]] = [[float(x) for x in r["v"]] for r in seeds]
    if not cents:
        raise ValueError("train_ivf_centroids: empty corpus")
    dim = len(cents[0])

    vecs = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cent_id int, cvec array<double>"
        )
        assigned = argmax_centroid(
            vecs.crossJoin(F.broadcast(cdf)).withColumn(
                "_csim", cosine_similarity_col(F.col("_v"), F.col("cvec"))
            ),
            "_id",
            ["cent_id", "_v"],
        )
        means = (
            assigned.select("cent_id", F.posexplode("_v").alias("pos", "x"))
            .groupBy("cent_id", "pos")
            .agg(
                F.sum(fixed6_long("x")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = [list(c) for c in cents]  # empty clusters keep centroids
        acc: dict[int, list[float]] = {}
        for r in means:
            acc.setdefault(r["cent_id"], [0.0] * dim)[r["pos"]] = r["s"] / (
                1000000.0 * r["n"]
            )
        for ci, vec in acc.items():
            new_cents[ci] = vec
        cents = new_cents
    return cents


def argmax_centroid(
    expanded: DataFrame, group_col: str, payload_cols: list[str]
) -> DataFrame:
    """(group, payload...) of each group's max-``_csim`` row, ties broken
    by smallest cent_id.

    A group-aggregate ``max_by`` over a lexicographic (similarity,
    -cent_id) key instead of the window row_number it replaced: the
    (vector x centroid) expansion is reduced by MAP-SIDE PARTIAL argmax,
    so only one partial row per (map partition, vector) reaches the
    shuffle — a window would shuffle AND sort the full k-fold expansion.
    Picks the identical row (same ordering tuple, tie-broken unique)."""
    best = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]),
        F.struct(F.col("_csim").alias("s"), (-F.col("cent_id")).alias("t")),
    )
    return expanded.groupBy(group_col).agg(best.alias("_b")).select(
        group_col, *[F.col(f"_b.{c}").alias(c) for c in payload_cols]
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, vec, cent_id): max-cosine centroid per vector. This is the
    partitioning a stored IVF index would write (partitionBy cent_id) so
    query-time nprobe scans prune to nprobe directories."""
    spark = corpus.sparkSession
    cdf = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], "cent_id int, cvec array<double>"
    )
    expanded = (
        corpus.select(id_col, vec_col)
        .crossJoin(F.broadcast(cdf))
        .withColumn("_csim", cosine_similarity_col(F.col(vec_col), F.col("cvec")))
    )
    return argmax_centroid(expanded, id_col, ["cent_id", vec_col]).select(
        id_col, vec_col, "cent_id"
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame | list,
    threshold: float = 0.995,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, representative, keep) — SemDeDup (Abbas et al. 2023): cluster
    embeddings with the IVF coarse quantizer, find within-cluster pairs
    with cosine >= ``threshold`` (rounded to 6 decimals first, so the
    keep/drop decision sits on the same grid in every engine), connect
    them transitively, and keep the min-id representative of each
    duplicate group. Every input row comes back with its group
    ``representative`` and a 0/1 ``keep`` flag (singletons keep
    themselves).

    ``centroids`` is either the list produced by
    :func:`train_ivf_centroids` or a (cent_id, cvec) DataFrame (a paired
    query keeps the quantizer in-plan that way — zero driver collects).

    Scale notes: the only wide shuffle keys on ``cent_id``; each vector
    crosses it exactly twice (once per join side), and candidate pairs
    materialize *inside* the joined partition, never in the shuffle —
    unlike banded LSH there is exactly one bucket per vector, so carrying
    the vector payload through this join is strictly cheaper than an
    ids-first/rejoin-later plan (which would add two more corpus-wide
    joins; invariant 6's ids-first rule targets multi-band fan-out).
    Per-task cost is O(c² · d) for a cluster of size c: SemDeDup
    prescribes k ∝ corpus_size / target_cluster_size, which bounds c —
    size k so the largest cluster's pair loop fits a task (e.g. 10⁹
    vectors, k = 10⁶ → c ≈ 1000 → 5·10⁵ cosines/task). The transitive
    closure is the O(log² n) star-contraction in
    :func:`dedup.connected_components`.
    """
    from .dedup import connected_components

    spark = corpus.sparkSession
    if not isinstance(centroids, DataFrame):
        centroids = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cent_id int, cvec array<double>",
        )
    expanded = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .join(F.broadcast(centroids.select("cent_id", "cvec")))
        .withColumn("_csim", cosine_similarity_col(F.col("_v"), F.col("cvec")))
    )
    assigned = argmax_centroid(expanded, "_id", ["cent_id", "_v"])
    a = assigned.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"), "cent_id")
    b = assigned.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), "cent_id")
    edges = (
        a.join(b, "cent_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), 6)
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b")
    )
    comp = connected_components(edges, id_col=id_col)
    rep = F.coalesce(F.col("component"), F.col(id_col))
    return (
        corpus.select(id_col)
        .join(comp, id_col, "left")
        .select(
            id_col,
            rep.alias("representative"),
            (rep == F.col(id_col)).cast("long").alias("keep"),
        )
    )


def embedding_diversity(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    q: int = 10_000,
) -> DataFrame:
    """(label, n, avg_norm, avg_cos) — per-cluster embedding diversity:
    member count, mean vector norm, and the EXACT mean pairwise cosine
    of the (quantized) unit vectors — the coherence/mode-collapse
    diagnostic an embedding-space curation pass reports per cluster
    (near-1 ⇒ collapsed/duplicate cluster, near-0 ⇒ isotropic noise).

    The n² pairwise mean collapses to one linear pass via the Gram
    identity ``Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖uᵢ‖²`` — no self-join, no
    pair materialization. Per label, the shuffle carries (a) three
    integer sums and (b) one row per (label, dim) for the vector sum:
    cost ∝ corpus·dim map-side, ≤ labels·dim after the partial
    aggregate. Zero-norm vectors are excluded (undefined direction).

    Float discipline (invariant 4): each unit vector is quantized ONCE
    to integer 1e-4 components (``round(x/‖v‖·q, 0)`` — an
    integer-valued double, cast exact in both engines); every
    corpus-sized sum is then PURE BIGINT (order-independent). ‖Σu‖²
    folds the per-dim squares in EXPLICIT dim order (one row per
    dimension — bounded) because s² can pass 2^53 for big clusters,
    where an order-unspecified double SUM would vary with partitioning;
    the final ratios are single double expressions, rounded 6. The statistic is *defined* on the quantized vectors, so
    both engines agree bit-for-bit; accuracy vs the unquantized mean
    cosine is ~1e-4 — far inside any curation threshold. Headroom: Σ‖û‖²
    ≈ n·dim·q² keeps BIGINT safe to ~10⁹ vectors at dim 64.
    """
    v = F.col(vec_col).cast("array<double>")
    nrm = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    base = (
        df.select(F.col(label_col).alias("label"), v.alias("_v"), nrm.alias("_n"))
        .filter(F.col("_n") > 0)
        .select(
            "label",
            fixed6_long(F.col("_n")).alias("norm6"),
            # the division is guarded by a lazy CaseWhen, not just the
            # filter: under ANSI, CollapseProject can evaluate this
            # projection as a subexpression of the _n > 0 predicate
            # itself, so a bare x / _n would raise DIVIDE_BY_ZERO on the
            # very rows the filter is about to drop
            F.transform(
                "_v",
                lambda x: F.round(
                    F.when(F.col("_n") > 0, x / F.col("_n") * q), 0
                ).cast("long"),
            ).alias("uq"),
        )
    )
    per = base.withColumn(
        "ssq",
        F.aggregate(
            "uq", F.lit(0).cast("long"), lambda a, x: a + x * x
        ),
    )
    sums = per.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("norm6").cast("long").alias("sum_norm6"),
        F.sum("ssq").cast("long").alias("sum_ssq"),
    )
    dims = (
        base.select("label", F.posexplode("uq").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.sum("x").cast("long").alias("s"))
    )
    # ordered fold over the dim-sorted (bounded: one row per dimension)
    # list: s^2 can pass 2^53 for big clusters, where an order-unspecified
    # double SUM would vary with partitioning (invariant 4) — the DuckDB
    # twin folds the same list(s ORDER BY dim)
    g = dims.groupBy("label").agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("dim", "s"))),
            F.lit(0.0),
            lambda acc, x: acc + x["s"].cast("double") * x["s"],
        ).alias("ssum_sq")
    )
    n_d = F.col("n").cast("double")
    return sums.join(g, "label").select(
        "label",
        "n",
        F.round(F.col("sum_norm6").cast("double") / (n_d * 1e6), 6).alias(
            "avg_norm"
        ),
        F.when(
            F.col("n") >= 2,
            F.round(
                (F.col("ssum_sq") - F.col("sum_ssq"))
                / (n_d * (n_d - 1) * float(q * q)),
                6,
            ),
        ).alias("avg_cos"),
    )


def _cosine_py(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb) if na and nb else 0.0


def ivf_probe_lists(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """Driver-side nprobe centroid selection — pure Python over the k x d
    matrix, zero Spark jobs per query (the bucket-prune pattern the SRP
    path uses)."""
    scored = sorted(
        range(len(centroids)),
        key=lambda i: (-_cosine_py(query_vec, centroids[i]), i),
    )
    return sorted(scored[:nprobe])


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF search: prune to the nprobe nearest lists (literal IN filter ->
    partition pruning on a cent_id-partitioned store), exact cosine re-rank
    inside them, top-k by (cosine desc, id asc)."""
    probes = ivf_probe_lists(query_vec, centroids, nprobe)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    out = assigned.filter(F.col("cent_id").isin(probes))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return (
        out.withColumn(
            "cosine", F.round(cosine_similarity_col(F.col(vec_col), qlit), 6)
        )
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )


# ---------------------------------------------------------------------------
# Bucket-partitioned ANN index layout (r04, VERDICT task 6): the scale
# path the module docstring promises — write the corpus once partitioned
# by (band, bucket), then serve each probe with a partition-PRUNED scan
# of its `bands` probe buckets plus an exact cosine re-rank. At 10^8+
# vectors a probe touches bands x |bucket| rows instead of the corpus;
# the pruning is plan-asserted in tests/test_ann_layout.py.
# ---------------------------------------------------------------------------
def write_srp_index(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 32,
    bands: int = 4,
    dim: int | None = None,
) -> None:
    """Materialize the SRP-LSH index: one row per (band, vector) with the
    full embedding payload, written ``partitionBy(band, bucket)`` so a
    probe's literal (band, bucket) filters become directory-level
    partition pruning (the term_bucket pattern from the postings store).
    Each vector is stored ``bands`` times — the classic LSH space-for-
    recall trade; the blowup factor is the band count, not corpus^2."""
    banded = srp_banded(df, id_col, vec_col, n_planes, bands, dim)
    (
        banded.join(df.select(F.col(id_col).alias("id"), vec_col), "id")
        .select("id", vec_col, "band", "bucket")
        .write.mode("overwrite")
        .partitionBy("band", "bucket")
        .parquet(path)
    )


def srp_index_probe(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 32,
    bands: int = 4,
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Top-k over the bucket-partitioned index: the probe's buckets come
    from the driver-side ``srp_probe_buckets`` twin (zero Spark jobs), so
    the scan filter is a literal (band, bucket) disjunction that prunes
    to ``bands`` directories; candidates collapse per id (a vector
    collides in up to ``bands`` buckets) and the exact cosine re-rank +
    top-k runs on the pruned slice only."""
    probes = srp_probe_buckets(query_vec, n_planes, bands)
    cond = None
    for band, bucket in probes:
        clause = (F.col("band") == band) & (F.col("bucket") == bucket)
        cond = clause if cond is None else (cond | clause)
    qlit = F.array(*[F.lit(float(x)) for x in query_vec])
    scan = spark.read.parquet(path).filter(cond)
    if exclude_id is not None:
        scan = scan.filter(F.col("id") != exclude_id)
    return (
        scan.dropDuplicates(["id"])
        .withColumn(
            "cosine", F.round(cosine_similarity_col(F.col(vec_col), qlit), 6)
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
        .select("id", "cosine")
    )
