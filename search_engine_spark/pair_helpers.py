"""Shared building blocks for the paired (Spark, DuckDB-oracle) queries.

Three invariants from CLAUDE.md are centralized here so every pair gets them
by construction instead of by review:

- **invariant 3 (session independence)**: :func:`ntz_epoch_us` derives epoch
  microseconds from a TIMESTAMP_NTZ purely via wall-clock field extraction
  (``to_date`` + ``hour``/``minute`` + fractional ``date_part('SECOND')``),
  which never consults the session timezone. The obvious spellings all do:
  ``ts.cast('timestamp').cast('double')`` and even
  ``timestampdiff(MICROSECOND, ntz, ntz)`` route through the session tz and
  diverge by 3600 s from DuckDB's tz-less ``epoch_us`` for wall-clocks inside
  a DST spring-forward gap (verified empirically under America/New_York).
- **invariant 4 (float determinism)**: :func:`sum_fixed6` sums doubles as
  integer-scaled BIGINTs (exact, order-free) and divides back once, so a
  shuffled aggregation order can never flip a 6-decimal rounding. Exact for
  any input with <= 6 fractional decimal digits.
- **invariant 6 (skew discipline)**: :func:`doc_frequencies` is the
  two-phase exact-distinct shape (groupBy the uniform (key, doc) pair first,
  then re-aggregate the collapsed pairs) — never ``countDistinct`` keyed on a
  Zipf-skewed term/word column, which plans as Expand + a final exchange on
  the skewed key alone (measured anti-scaling in BENCH.md).

Each helper documents the DuckDB twin expression the oracle SQL must use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000
US_PER_MINUTE = 60_000_000
US_PER_SECOND = 1_000_000


def ntz_epoch_us(ts) -> F.Column:
    """Epoch microseconds (BIGINT) of a TIMESTAMP_NTZ wall-clock,
    timezone-invariant by construction.

    DuckDB twin: ``epoch_us(ts)``.
    """
    col = F.col(ts) if isinstance(ts, str) else ts
    return (
        F.datediff(F.to_date(col), F.to_date(F.lit("1970-01-01"))).cast("long")
        * F.lit(US_PER_DAY)
        + F.hour(col).cast("long") * F.lit(US_PER_HOUR)
        + F.minute(col).cast("long") * F.lit(US_PER_MINUTE)
        # date_part('SECOND') carries the microsecond fraction as
        # DECIMAL(8,6); scaling then casting is exact
        + (F.date_part(F.lit("SECOND"), col) * F.lit(US_PER_SECOND)).cast("long")
    )


def fixed6_long(col) -> F.Column:
    """A double scaled to integer micros (the invariant-4 fixed-point
    unit): ``round(x * 1e6)`` as BIGINT. Summing these is exact and
    order-independent; both engines round halves identically here.

    DuckDB twin: ``SQL_FIXED6_LONG``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(1000000.0), 0).cast("long")


SQL_FIXED6_LONG = "CAST(round({col} * 1000000.0) AS BIGINT)"


def sum_fixed6(col, alias: str) -> F.Column:
    """Order-deterministic SUM of a double column, exact for values with
    <= 6 fractional decimals: per-row scale to integer micros (fixed6_long),
    integer-sum, divide back, round to the 6-decimal grid.

    DuckDB twin:
    ``round(sum(CAST(round(col * 1000000.0) AS BIGINT)) / 1000000.0, 6)``.
    """
    return F.round(F.sum(fixed6_long(col)) / F.lit(1000000.0), 6).alias(alias)


SQL_SUM_FIXED6 = "round(sum(CAST(round({col} * 1000000.0) AS BIGINT)) / 1000000.0, 6)"

# DuckDB twin of textstats.token_counts' ws_tokens Column (split('')
# yields [''], so blank text must count 0). Shared by every oracle that
# tokenizes by whitespace — one spelling, never respelled per pair.
SQL_WS_TOKENS = (
    r"CASE WHEN length(trim({col})) = 0 THEN 0 "
    r"ELSE len(regexp_split_to_array(trim({col}), '\s+')) END"
)


def doc_frequencies(
    occurrences: DataFrame,
    key: str = "term",
    doc: str = "doc_id",
    with_ctf: bool = False,
    ctf_alias: str = "ctf",
) -> DataFrame:
    """(key, doc) occurrence rows -> per-key ``doc_frequency`` (exact
    COUNT DISTINCT doc), optionally with the collection frequency.

    Two-phase skew-free shape (CLAUDE.md invariant 6): phase 1 shuffles on
    the uniformly distributed (key, doc) pair; phase 2 re-aggregates the
    collapsed pairs with map-side partial aggregation, bounding every
    reducer at |vocab| rows per map partition. Identical result to
    ``countDistinct``, no Expand node, no head-term reducer.

    DuckDB twin: plain ``count(DISTINCT doc)`` (single-node, no skew).
    """
    per_doc = occurrences.groupBy(key, doc).agg(F.count(F.lit(1)).alias("_tf"))
    aggs = [F.count(F.lit(1)).alias("doc_frequency")]
    if with_ctf:
        aggs.append(F.sum("_tf").alias(ctf_alias))
    return per_doc.groupBy(key).agg(*aggs)


def scalar_count(df: DataFrame, alias: str = "_n", as_double: bool = True) -> DataFrame:
    """1-row COUNT(*) relation for in-plan scalar use: cross-join the
    (broadcast) result instead of calling ``df.count()`` on the driver,
    which would add a whole extra scan-and-collect pass per query
    (VERDICT r01 item 4). DuckDB twin: ``n AS (SELECT count(*) FROM ...)``
    cross-joined.
    """
    c = F.count(F.lit(1))
    return df.agg((c.cast("double") if as_double else c).alias(alias))
