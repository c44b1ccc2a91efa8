"""Dev harness: run each queries() entry against its oracle_sql() the
same way the driver does (row count + sorted-values comparison)."""
import sys, os, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
os.environ["SF_DIR"] = SF_DIR  # __spark_entry__ resolves oracle twins from it
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.number):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(only=None):
    import __spark_entry__ as E
    from ferenda_spark.session import get_spark
    spark = get_spark("parity", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from read_parquet('{p}')")
    qs, oracles = E.queries(), E.oracle_sql()
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            results[name] = "SPARK FAIL: %r" % (exc,)
            print(name, results[name]); continue
        if name not in oracles:
            results[name] = "rows-only: %d rows" % len(sdf)
            print(name, results[name]); continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as exc:
            results[name] = "ORACLE FAIL: %r" % (exc,)
            print(name, results[name]); continue
        a, b = normalize(sdf), normalize(odf)
        if list(a.columns) != list(b.columns):
            results[name] = "SCHEMA MISMATCH %s vs %s" % (list(a.columns), list(b.columns))
        elif len(a) != len(b):
            results[name] = "ROWCOUNT %d vs %d" % (len(a), len(b))
        elif not a.equals(b):
            neq = (a != b).any(axis=1)
            results[name] = "VALUES DIFFER (%d rows)\n%s\n%s" % (
                neq.sum(), a[neq].head(3), b[neq].head(3))
        else:
            results[name] = "OK (%d rows)" % len(a)
        print(name, results[name])
    bad = {k: v for k, v in results.items()
           if not (v.startswith("OK") or v.startswith("rows-only"))}
    print(json.dumps({k: v.split("\n")[0] for k, v in results.items()}, indent=1))
    # VERDICT r4 #3: commit the full parity record as a round artifact
    # (PARITY_OUT=PARITY_r05.json) so the auditable record covers every
    # queries() entry, not just the driver's capped row sample
    out = os.environ.get("PARITY_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({
                "sf_dir": SF_DIR,
                "n_queries": len(results),
                "n_ok": sum(v.startswith("OK") for v in results.values()),
                "n_rows_only": sum(v.startswith("rows-only")
                                   for v in results.values()),
                "n_bad": len(bad),
                "loadavg_1m": round(os.getloadavg()[0], 2),
                "results": {k: v.split("\n")[0]
                            for k, v in results.items()},
            }, f, indent=1)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(set(sys.argv[1:]) or None)
