"""Two-parallelism-level scaling evidence for the north rule.

Runs the full KG pipeline (synthetic pages → extract → triples →
canonicalize, count) on IDENTICAL input at local[N] and local[4N] in
separate JVMs (fresh process per level so executor threads, codegen
caches, and shuffle pools don't leak between runs), reports docs/sec at
both plus efficiency = tput(4N) / (4 · tput(N)).

Usage: python scripts/bench_scaling.py [n_docs] [N_cores]
Writes BENCH_SCALING.json and prints the summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r'''
import json, os, sys, time
sys.path.insert(0, %(repo)r)
cores = int(sys.argv[1]); n_docs = int(sys.argv[2]); reps = int(sys.argv[3])
from ferenda_spark.session import get_spark
import ferenda_spark.pages as P
from ferenda_spark.operators.extract import extract_stage, triples_table
from ferenda_spark.operators.relate import canonicalize_triples
from ferenda_spark.uris import RepoConfig
spark = get_spark("scaling", master="local[%%d]" %% cores,
                  shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
cfg = RepoConfig(alias="doc", url="http://example.org/")

def run():
    pages = P.build_pages(spark, n_docs, cores * 2)
    t = triples_table(extract_stage(pages, cfg, P.COMMONDATA), "kg")
    return canonicalize_triples(t).count()

n_triples = run()  # warmup: JIT, codegen, Arrow init
best = None
for _ in range(reps):
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cores": cores, "n_docs": n_docs, "sec": best,
                  "docs_per_sec": n_docs / best, "n_triples": n_triples}))
'''


def run_level(repo: str, cores: int, n_docs: int, reps: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": repo},
         str(cores), str(n_docs), str(reps)],
        capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 8000
    n_cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    reps = int(os.environ.get("SCALING_REPS", "2"))
    lo = run_level(repo, n_cores, n_docs, reps)
    hi = run_level(repo, n_cores * 4, n_docs, reps)
    eff = hi["docs_per_sec"] / (4.0 * lo["docs_per_sec"])
    result = {
        "n_docs": n_docs,
        "low": lo, "high": hi,
        "scaling_efficiency": round(eff, 3),
        "criterion": "tput(4N) / (4 * tput(N)) >= 0.8",
        "passes": eff >= 0.8,
    }
    with open(os.path.join(repo, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
