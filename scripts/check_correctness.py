"""Local stand-in for the driver's correctness gate.

Runs each ``queries()`` entry at sf0.01 and its ``oracle_sql()`` twin in
DuckDB (driver parquet tables registered as views), then compares after
canonicalization (columns sorted by name, rows sorted by all columns).
Stricter than the driver on purpose: dtype mismatches are reported
separately because the driver's value hash is dtype-sensitive
(ADVICE.md round 1, stats_groupby).

Usage: python scripts/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_CHECK",
                        "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(pdf):
    import pandas as pd
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns),
                              kind="mergesort").reset_index(drop=True)
    return pdf


def value_hash(pdf) -> str:
    csv = pdf.to_csv(index=False)
    return hashlib.sha256(csv.encode()).hexdigest()[:16]


def main(selected):
    import duckdb

    import __spark_entry__ as entrymod
    from ferenda_spark.session import get_spark

    spark = get_spark("check_correctness", master="local[8]",
                      shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, t + ".parquet")
        if os.path.exists(p):
            con.execute(
                "CREATE VIEW %s AS SELECT * FROM read_parquet('%s')"
                % (t, p))

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = selected or list(qs)
    results = {}
    for name in names:
        t0 = time.time()
        rec = {}
        try:
            spdf = canon(qs[name](spark, SF_DIR).toPandas())
            rec["spark_rows"] = len(spdf)
        except Exception as exc:
            rec["err"] = "spark: %r" % exc
            results[name] = rec
            print(name, "SPARK-ERROR", repr(exc)[:200])
            continue
        if name not in oracles:
            rec["err"] = "no_oracle"
            results[name] = rec
            print("%-24s rows=%-6d no_oracle         (%.1fs)"
                  % (name, rec["spark_rows"], time.time() - t0))
            continue
        try:
            odf = canon(con.execute(oracles[name]).df())
        except Exception as exc:
            rec["err"] = "oracle: %r" % exc
            results[name] = rec
            print(name, "ORACLE-ERROR", repr(exc)[:300])
            continue
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(spdf) == len(odf)
        rec["schema_match"] = list(spdf.columns) == list(odf.columns)
        # int width doesn't affect the driver's value hash (round-1
        # window_topk: Spark int32 rank vs DuckDB int64, hash green);
        # int-vs-float does (stats_groupby) — normalize widths only
        norm = {"int32": "int64", "int8": "int64", "int16": "int64"}
        rec["dtype_match"] = (rec["schema_match"] and
                              [norm.get(str(d), str(d))
                               for d in spdf.dtypes] ==
                              [norm.get(str(d), str(d))
                               for d in odf.dtypes])
        rec["hash_match"] = (rec["rows_match"] and rec["schema_match"] and
                             value_hash(spdf) == value_hash(odf))
        ok = rec["hash_match"] and rec["dtype_match"]
        print("%-24s rows=%-6d %s (%.1fs)%s"
              % (name, rec["spark_rows"],
                 "OK   " if ok else "FAIL ", time.time() - t0,
                 "" if ok else " " + json.dumps(
                     {k: v for k, v in rec.items() if k != "spark_rows"})))
        if not ok and len(spdf) and len(odf):
            import pandas as pd
            with pd.option_context("display.width", 200):
                merged = spdf.merge(odf, how="outer", indicator=True)
                diff = merged[merged["_merge"] != "both"]
                if len(diff):
                    print(diff.head(10).to_string())
        results[name] = rec
    n_ok = sum(1 for r in results.values()
               if r.get("hash_match") and r.get("dtype_match"))
    print("== %d/%d green" % (n_ok, len(results)))
    return results


if __name__ == "__main__":
    main(sys.argv[1:])
