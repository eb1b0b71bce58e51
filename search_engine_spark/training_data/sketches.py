"""Fixed-memory sketches for corpus-scale reporting.

At 100 TB, "how many distinct urls / tokens / hosts are in this crawl?"
cannot afford an exact distinct (a corpus-wide shuffle whose reduce side
is proportional to the answer). :func:`hll_distinct` is HyperLogLog
(Flajolet, Fusy, Gandon & Meunier 2007) expressed as a relation: the
"filter" state is a ``(stratum, register)`` table hard-bounded at
``strata x 2^b`` rows, so one fixed-size aggregation pass replaces the
distinct regardless of corpus size.

The frequency twin is :func:`cms_sketch` / :func:`cms_estimate` /
:func:`cms_heavy_hitters` — Count-Min (Cormode & Muthukrishnan 2005):
"which n-grams / domains / tokens dominate this crawl?" without the
(key -> count) shuffle whose reduce side is the full vocabulary. The
sketch is a ``(stratum, row, col)`` relation hard-bounded at
``strata x d x 2^b`` rows; estimates are pure-integer (count-sum +
min over d counters), so the heavy-hitter report — boilerplate-phrase
detection, nav-chrome tokens, hot domains — replays bit-for-bit in any
engine with md5 (invariant 2), with NO floats anywhere (invariant 4 by
omission).

Engine portability (CLAUDE.md invariant 2): the hash is md5-only and the
register arithmetic is integer-exact, so the DuckDB oracle — and a plain
Python simulator in the tests — replay the estimate BIT-FOR-BIT, not
just approximately. Spark's own ``approx_count_distinct`` is the same
algorithm but hashes with a JVM-private xxhash variant, which no other
engine reproduces; this implementation trades a constant factor of md5
cost for a verifiable, cross-engine-stable number.

Determinism of the float path (invariant 4): every register holds an
integer ``rho <= RHO_CAP``; the harmonic-mean denominator is the exact
integer ``sum(2^(RHO_CAP - rho))`` (each term a power of two <= 2^32,
summed as BIGINT — order-free), and the estimate is ONE division of one
double constant by that integer (plus one ``ln`` of an exact integer
ratio on the linear-counting branch), rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Classic HLL caps rho at the 32-bit-hash width + 1. We derive rho from a
# 60-bit md5 stream but keep the classic cap: the cap binds with
# probability 2^-33 per item, is applied identically by every replaying
# engine, and keeps 2^(RHO_CAP - rho) inside BIGINT with room for the
# register-count multiplier (4096 * 2^33 = 2^45).
RHO_CAP = 33

# Leading-zero-bit count of a hex nibble (after the leading-'0' run is
# stripped, the first nibble is 1..f). Shared Spark/DuckDB CASE.
SQL_NIBBLE_LZ = (
    "CASE WHEN {nib} = '1' THEN 3 "
    "WHEN {nib} IN ('2', '3') THEN 2 "
    "WHEN {nib} IN ('4', '5', '6', '7') THEN 1 ELSE 0 END"
)


def hll_alpha(m: int) -> float:
    """The HLL bias-correction constant for m >= 128 registers
    (Flajolet et al. 2007, fig. 3)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    key_col: str,
    stratum_col: str | None = None,
    b: int = 12,
    seed: str = "hll",
) -> DataFrame:
    """(stratum?, n_registers_set, est_distinct) — HyperLogLog distinct
    count of ``key_col`` per stratum (or one global row).

    Per key: ``h = md5(seed || ':' || key)``; the first ``b/4`` hex chars
    index one of ``m = 2^b`` registers, the next 15 hex chars are a
    60-bit stream whose leading-zero count (+1, capped at
    :data:`RHO_CAP`) is the register's candidate value; each register
    keeps its max. The estimate is the harmonic-mean formula with the
    small-range linear-counting correction (``E <= 2.5m`` and empty
    registers remain): ``m * ln(m / V)``.

    Scale shape: the ONLY shuffle keys on ``(stratum, register)`` — at
    most ``2^b`` rows per stratum survive, and map-side partial ``max``
    collapses every input partition to that bound before the exchange.
    No corpus-cardinality state anywhere; NULL keys are ignored (SQL
    COUNT DISTINCT semantics). Standard error ~ 1.04/sqrt(m) (1.6% at
    the default b=12).
    """
    if b % 4 != 0 or not 8 <= b <= 16:
        raise ValueError("b must be a multiple of 4 in [8, 16]")
    m = 1 << b
    hexc = b // 4
    strat = [stratum_col] if stratum_col else []

    h = F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string")))
    w = F.substring(h, hexc + 1, 15)
    z = F.length(F.regexp_extract(w, "^0*", 0))
    nib = F.substring(w, z + 1, 1)
    lz = F.expr(SQL_NIBBLE_LZ.format(nib="__nib"))
    regs = (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *strat,
            F.conv(F.substring(h, 1, hexc), 16, 10).cast("long").alias("reg"),
            z.alias("__z"),
            nib.alias("__nib"),
        )
        .select(
            *strat,
            "reg",
            F.least(
                F.when(F.col("__z") == 15, F.lit(61)).otherwise(
                    F.col("__z") * 4 + lz + 1
                ),
                F.lit(RHO_CAP),
            ).alias("rho"),
        )
        .groupBy(*strat, "reg")
        .agg(F.max("rho").alias("rho"))
    )
    alpha_repr = repr(hll_alpha(m))
    per = regs.groupBy(*strat).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers_set"),
        F.sum(
            F.expr(f"CAST(power(2.0, {RHO_CAP} - rho) AS BIGINT)")
        ).alias("__s"),
    )
    v = F.lit(m) - F.col("n_registers_set")
    denom = F.col("__s") + v.cast("long") * F.lit(1 << RHO_CAP).cast("long")
    raw = (
        F.expr(f"CAST('{alpha_repr}' AS DOUBLE)")
        * F.lit(float(m) * m * (1 << RHO_CAP))
        / denom
    )
    linear = F.lit(float(m)) * F.log(F.lit(m) / v.cast("double"))
    est = F.round(
        F.when((raw <= 2.5 * m) & (v > 0), linear).otherwise(raw), 6
    )
    return per.select(
        *strat, "n_registers_set", est.alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def _cms_col(seed: str, row, key, hexc: int):
    """Column index of ``key`` in sketch row ``row``: the first ``hexc``
    hex chars of ``md5(seed:row:key)`` — one md5 per (key, row), shared
    numerology with the DuckDB oracle.

    The ``coalesce`` is a nullability annotation, not a fallback: md5 of
    a non-null string always yields valid hex, but Catalyst types
    ``conv`` as nullable and would infer an ``isnotnull`` filter on the
    join-key side of :func:`cms_estimate` — forking the sketch subtree
    away from the totals branch and defeating the exchange reuse that
    keeps :func:`cms_heavy_hitters` at ONE corpus scan."""
    h = F.md5(
        F.concat(
            F.lit(seed + ":"),
            row.cast("string"),
            F.lit(":"),
            key.cast("string"),
        )
    )
    return F.coalesce(
        F.conv(F.substring(h, 1, hexc), 16, 10).cast("long"), F.lit(-1)
    )


def _cms_params(d: int, b: int) -> int:
    if b % 4 != 0 or not 8 <= b <= 16:
        raise ValueError("b must be a multiple of 4 in [8, 16]")
    if not 1 <= d <= 8:
        raise ValueError("d must be in [1, 8]")
    return b // 4


def cms_sketch(
    df: DataFrame,
    key_col: str,
    stratum_col: str | None = None,
    d: int = 4,
    b: int = 12,
    seed: str = "cms",
) -> DataFrame:
    """(stratum?, row, col, cnt) — a Count-Min sketch of the ``key_col``
    stream as a relation: ``d`` hash rows of ``2^b`` counters; every
    occurrence of a key increments one counter per row.

    Because counters are ADDITIVE, the sequential-update sketch has an
    exact order-free formulation — a ``groupBy(row, col).count()`` — so
    the "sketch" needs no mutable state and no merge protocol: map-side
    partial sums collapse each input partition to at most ``d * 2^b``
    rows before the only shuffle, whose reduce side is hard-bounded at
    ``strata x d x 2^b`` regardless of corpus size or vocabulary. NULL
    keys are ignored.
    """
    hexc = _cms_params(d, b)
    strat = [stratum_col] if stratum_col else []
    probes = df.filter(F.col(key_col).isNotNull()).select(
        *strat,
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row"),
    )
    return (
        probes.select(
            *strat,
            "row",
            _cms_col(seed, F.col("row"), F.col("__k"), hexc).alias("col"),
        )
        .groupBy(*strat, "row", "col")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    stratum_col: str | None = None,
    d: int = 4,
    b: int = 12,
    seed: str = "cms",
) -> DataFrame:
    """(stratum?, key, est_count) — the Count-Min frequency estimate of
    each candidate in ``items`` against a :func:`cms_sketch` built with
    the SAME (d, b, seed): ``min`` over the key's ``d`` counters.

    Guarantees (Cormode & Muthukrishnan 2005 thm. 1): never an
    underestimate; overshoot ``<= e/2^b * N`` with probability
    ``1 - e^-d``. The sketch is bounded (``d * 2^b`` rows per stratum)
    so it broadcasts — the candidate stream never shuffles; a probe
    that hits no counter row coalesces to 0 (an absent counter was
    never incremented).
    """
    hexc = _cms_params(d, b)
    strat = [stratum_col] if stratum_col else []
    probes = items.filter(F.col(key_col).isNotNull()).select(
        *strat,
        F.col(key_col).alias(key_col),
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("row"),
    )
    probes = probes.withColumn(
        "col", _cms_col(seed, F.col("row"), F.col(key_col), hexc)
    )
    joined = probes.join(
        F.broadcast(sketch), on=[*strat, "row", "col"], how="left"
    )
    return joined.groupBy(*strat, key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias(
            "est_count"
        )
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    candidates: DataFrame,
    stratum_col: str | None = None,
    d: int = 4,
    b: int = 12,
    seed: str = "cms",
    support_num: int = 1,
    support_den: int = 200,
) -> DataFrame:
    """(stratum?, key, est_count, n_total) — candidates whose Count-Min
    estimate reaches support ``support_num/support_den`` of the stream:
    ``est_count * support_den >= n_total * support_num``, ALL in BIGINT
    arithmetic (no float threshold can disagree between engines).

    ``candidates`` supplies the identities a sketch alone cannot (the
    standard two-pass idiom: candidates from a cheap deterministic
    sample — any true heavy hitter appears in every non-trivial sample
    — estimates from the full-stream sketch). ``n_total`` is recovered
    from the sketch itself: every hash row's counters sum to exactly
    the stream length, so ``sum(cnt) DIV d`` over the WHOLE sketch is
    N with no rounding — in-plan, never a driver ``.count()``, and
    deliberately NOT a ``row = 0`` slice: a filter would push below
    the sketch aggregation and fork the plan into a second corpus
    scan, while the whole-sketch sum keeps the totals branch's
    exchange byte-identical to the estimate branch's, so Spark's
    exchange reuse materializes the sketch (and reads the corpus)
    exactly once.
    """
    if support_num < 0 or support_den <= 0:
        raise ValueError("support must be a ratio with positive denominator")
    strat = [stratum_col] if stratum_col else []
    sketch = cms_sketch(df, key_col, stratum_col, d=d, b=b, seed=seed)
    est = cms_estimate(
        sketch, candidates, key_col, stratum_col, d=d, b=b, seed=seed
    )
    totals = sketch.groupBy(*strat).agg(
        F.expr(f"sum(cnt) DIV {d}").cast("long").alias("n_total")
    )
    if strat:
        withn = est.join(F.broadcast(totals), on=strat, how="inner")
    else:
        withn = est.crossJoin(F.broadcast(totals))
    return withn.filter(
        F.col("est_count") * F.lit(support_den)
        >= F.col("n_total") * F.lit(support_num)
    ).select(*strat, key_col, "est_count", "n_total")
