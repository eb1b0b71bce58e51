"""Subprocess driver for the IcebergIO MERGE INTO branch test.

Runs in its OWN JVM because the row-level test catalog
(tests/java/RowLevelTestCatalog.java) must be on the driver classpath at
JVM launch. Exercises every IcebergIO operation — createOrReplace,
append, and the three MERGE INTO variants — against a DSv2 catalog that
supports group-based row-level operations (the same contract Iceberg's
SparkCatalog implements), and prints one JSON line of results for the
parent pytest process to assert on.

Usage: python tests/_iceberg_branch_driver.py <compiled-classes-dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    classes_dir = sys.argv[1]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraClassPath", classes_dir)
        .config("spark.sql.catalog.lake", "sesparktest.RowLevelTestCatalog")
        # the SAME catalog class in delta (merge-on-read) mode — the mode
        # Iceberg v2 tables default to on real clusters; MERGE plans as
        # WriteDelta instead of ReplaceData (r04 VERDICT task 5)
        .config("spark.sql.catalog.lakemor", "sesparktest.RowLevelTestCatalog")
        .config("spark.sql.catalog.lakemor.mode", "merge-on-read")
        .getOrCreate()
    )
    from search_engine_spark.news.feeds import ARTICLE_MERGE_SET, upsert_articles
    from search_engine_spark.sources.tableio import IcebergIO

    io = IcebergIO("lake", "search")
    out = {}

    # S7 replace (createOrReplace), append, existence
    io.replace(spark.createDataFrame([(1, "a")], "k long, v string"), "t")
    io.append(spark.createDataFrame([(5, "e")], "k long, v string"), "t")
    out["after_append"] = sorted(
        [list(r) for r in io.read(spark, "t").collect()]
    )
    out["exists"] = [io.exists(spark, "t"), io.exists(spark, "missing")]

    # S3 insert-if-absent: MERGE ... WHEN NOT MATCHED THEN INSERT *
    io.insert_if_absent(
        spark.createDataFrame([(1, "X"), (2, "b")], "k long, v string"), "t", "k"
    )
    out["after_insert_if_absent"] = sorted(
        [list(r) for r in io.read(spark, "t").collect()]
    )

    # S4/W6 upsert: MERGE ... WHEN MATCHED UPDATE SET * / NOT MATCHED INSERT
    io.upsert(
        spark.createDataFrame([(2, "NEW"), (3, "c")], "k long, v string"), "t", "k"
    )
    out["after_upsert"] = sorted(
        [list(r) for r in io.read(spark, "t").collect()]
    )

    # replace really truncates
    io.replace(spark.createDataFrame([(9, "z")], "k long, v string"), "t")
    out["after_replace"] = sorted(
        [list(r) for r in io.read(spark, "t").collect()]
    )

    # W6 column-merge: MERGE ... UPDATE SET <ARTICLE_MERGE_SET>, compared
    # against the operator spelling (upsert_articles) — the same parity
    # the parquet backend test asserts
    cols = (
        "url string, feed_url string, title string, description string, "
        "content string, author string, published_at_s long, image_url string"
    )
    old = spark.createDataFrame(
        [
            ("u1", "f1", "Old title", "old desc", "old content", "A", 100, "img1"),
            ("u2", "f1", "Keep", "d", "c", "B", 200, ""),
            ("u4", None, "Unattributed", "d4", "c4", "D", 400, ""),
        ],
        cols,
    )
    new = spark.createDataFrame(
        [
            ("u1", "f9", "", "new desc", "", "", None, "img2"),
            ("u3", "f2", "Brand new", "", "", "C", 300, ""),
            ("u4", "f4", "", "", "", "", None, ""),
        ],
        cols,
    )
    io.replace(old, "articles")
    io.merge_columns(new, "articles", "url", ARTICLE_MERGE_SET)
    via_io = sorted([list(r) for r in io.read(spark, "articles").collect()])
    via_op = sorted([list(r) for r in upsert_articles(old, new).collect()])
    out["articles_match"] = via_io == via_op
    out["articles_via_io"] = via_io

    # ---- the same MERGE sequence through the DELTA-BASED (merge-on-read)
    # contract: Spark rewrites these statements to WriteDelta (per-row
    # DELETE/UPDATE/INSERT instructions keyed by row identity) instead of
    # the copy-on-write ReplaceData. Results must be identical.
    mio = IcebergIO("lakemor", "search")
    mio.replace(spark.createDataFrame([(1, "a")], "k long, v string"), "t")
    mio.append(spark.createDataFrame([(5, "e")], "k long, v string"), "t")
    mio.insert_if_absent(
        spark.createDataFrame([(1, "X"), (2, "b")], "k long, v string"), "t", "k"
    )
    out["mor_after_insert_if_absent"] = sorted(
        [list(r) for r in mio.read(spark, "t").collect()]
    )
    mio.upsert(
        spark.createDataFrame([(2, "NEW"), (3, "c")], "k long, v string"), "t", "k"
    )
    out["mor_after_upsert"] = sorted(
        [list(r) for r in mio.read(spark, "t").collect()]
    )
    mio.replace(old, "articles")
    mio.merge_columns(new, "articles", "url", ARTICLE_MERGE_SET)
    out["mor_articles_match"] = (
        sorted([list(r) for r in mio.read(spark, "articles").collect()]) == via_op
    )

    # plan-level proof both row-level modes are actually exercised:
    # copy-on-write merges plan ReplaceData, merge-on-read plans WriteDelta
    spark.createDataFrame([(2, "zz")], "k long, v string").createOrReplaceTempView(
        "plansrc"
    )
    merge_tail = (
        "t USING plansrc s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    cow_plan = spark.sql(f"EXPLAIN MERGE INTO lake.search.t {merge_tail}").first()[0]
    mor_plan = spark.sql(f"EXPLAIN MERGE INTO lakemor.search.t {merge_tail}").first()[0]
    out["cow_plan_replace_data"] = (
        "ReplaceData" in cow_plan and "WriteDelta" not in cow_plan
    )
    out["mor_plan_write_delta"] = (
        "WriteDelta" in mor_plan and "ReplaceData" not in mor_plan
    )

    print("RESULT:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
