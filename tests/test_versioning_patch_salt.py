"""Version archiving, mkpatch round-trip, salted aggregation."""

from pyspark.sql import functions as F


def test_archive_versions_merge(spark):
    from ferenda_spark.operators.versioning import (archive_versions,
                                                    version_history)
    cur = spark.createDataFrame(
        [("a", "h1", 1), ("b", "h2", 3), ("c", "h3", 1)],
        "url string, content_hash string, version int")
    inc = spark.createDataFrame(
        [("a", "h1"),          # unchanged → keeps version 1
         ("b", "h2x"),         # changed → version 4, old row archived
         ("d", "h4")],         # new → version 1; c absent → kept
        "url string, content_hash string")
    new_current, archived = archive_versions(cur, inc)
    got = {r["url"]: r["version"] for r in new_current.collect()}
    assert got == {"a": 1, "b": 4, "c": 1, "d": 1}
    arch = [(r["url"], r["version"]) for r in archived.collect()]
    assert arch == [("b", 3)]
    hist = [(r["url"], r["version"], r["is_current"])
            for r in version_history(new_current, archived).collect()]
    assert hist == [("a", 1, True), ("b", 3, False), ("b", 4, True),
                    ("c", 1, True), ("d", 1, True)]


def test_archive_versions_first_load(spark):
    from ferenda_spark.operators.versioning import archive_versions
    inc = spark.createDataFrame([("a", "h1")],
                                "url string, content_hash string")
    new_current, archived = archive_versions(None, inc)
    assert [(r["url"], r["version"]) for r in new_current.collect()] == \
        [("a", 1)]
    assert archived.count() == 0


def test_make_patch_roundtrip():
    from ferenda_spark.patch import apply_unified_diff, make_patch, \
        maybe_rot13
    old = "line one\nline two\nline three\nline four\nline five"
    new = "line one\nline 2\nline three\nline four\nadded\nline five"
    diff = make_patch(old, new)
    assert apply_unified_diff(old, diff) == new
    r13 = make_patch(old, new, rot13=True)
    assert r13.startswith("ROT13:")
    assert apply_unified_diff(old, maybe_rot13(r13)) == new


def test_salted_agg_equals_plain_groupby(spark):
    from ferenda_spark.operators.util import salted_agg
    from ferenda_spark import pages as P
    pages = P.build_pages(spark, 120, 4).select(
        F.regexp_extract("url", r"^(https?://[^/]+)", 1).alias("host"),
        F.length("html").alias("n_bytes"))
    plain = {r["host"]: (r["n"], r["total"])
             for r in pages.groupBy("host")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("n_bytes").alias("total")).collect()}
    salted = {r["host"]: (r["n"], r["total"])
              for r in salted_agg(pages, ["host"],
                                  {"n": ("n_bytes", "count"),
                                   "total": ("n_bytes", "sum")}).collect()}
    assert salted == plain
    # the corpus's hot-host skew is present (the thing salting defuses)
    assert "http://hot.example.org" in plain
