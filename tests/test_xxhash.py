"""Pure-Python xxhash64 must be bit-identical to Spark's JVM expression."""

import random
import string

from pyspark.sql import functions as F

from search_engine_spark.xxhash import term_bucket, xxhash64


def test_xxhash64_matches_spark(spark):
    rng = random.Random(7)
    words = [""]
    for _ in range(200):
        n = rng.randint(1, 64)
        words.append(
            "".join(rng.choice(string.ascii_letters + string.digits + " /:._-")
                    for _ in range(n))
        )
    words += ["üñïçödé ≠ ascii", "中文字符串", "a" * 200, "b" * 31, "c" * 32, "d" * 33]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for w in words:
        assert xxhash64(w) == got[w], f"mismatch for {w!r}"


def test_term_bucket_matches_spark(spark):
    terms = ["spark", "data", "query", "the", "zz", "x" * 40]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select(
            "term", F.pmod(F.xxhash64("term"), F.lit(64)).cast("int").alias("b")
        ).collect()
    }
    for t in terms:
        assert term_bucket(t, 64) == got[t]
