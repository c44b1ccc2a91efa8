"""Multi-repo URL routing: request URI → owning repo + basefile.

The reference's WSGI front dispatches each request by iterating repos in
registration order and asking each repo's RequestHandler whether it
supports the URL (ref ferenda/wsgiapp.py:199-217, 269-285); ``supports``
matches the second path segment — suffix/query stripped — against the
repo alias (ref ferenda/requesthandler.py:86-102), and the owning repo
then recovers the document id with ``basefile_from_uri`` (ref
ferenda/documentrepository.py:694-717).

Here the same decision is one native CASE-chain column expression over a
URI column — no Python in the plan, so routing a 10^12-row request log
is a codegen projection. First matching repo wins (list order = the
reference's registration order); non-matching URIs route to NULL (the
404 path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..uris import RepoConfig


def _route_cols(uri: Column, configs: list[RepoConfig]) -> tuple[Column, Column, Column]:
    """(repo, kind, basefile) columns for one uri column."""
    repo = F.lit(None).cast("string")
    kind = F.lit(None).cast("string")
    basefile = F.lit(None).cast("string")
    # build the CASE chain in reverse so the FIRST config wins
    for cfg in reversed(configs):
        res_prefix = cfg.url + "res/" + cfg.alias + "/"
        ds_prefix = cfg.url + "dataset/" + cfg.alias
        is_res = uri.startswith(res_prefix)
        # dataset URIs carry an optional suffix or ?param=value after
        # the alias (ref requesthandler.py:89-99 strips both before the
        # alias comparison)
        is_ds = uri.startswith(ds_prefix) & F.substring(
            uri, len(ds_prefix) + 1, 1).isin("", ".", "?")
        repo = F.when(is_res | is_ds, F.lit(cfg.alias)).otherwise(repo)
        kind = (F.when(is_res, F.lit("res"))
                .when(is_ds, F.lit("dataset")).otherwise(kind))
        # basefile: path remainder, '#fragment' stripped first, else a
        # '.suffix' (ref documentrepository.py:706-711: fragment wins
        # over suffix; suffix split is on the FIRST dot)
        rest = F.substr(uri, F.lit(len(res_prefix) + 1))
        bf = (F.when(rest.contains("#"), F.split(rest, "#").getItem(0))
              .when(rest.contains("."),
                    F.split(rest, r"\.").getItem(0))
              .otherwise(rest))
        basefile = F.when(is_res, bf).otherwise(basefile)
    return repo, kind, basefile


def route_uris(uris: DataFrame, configs: list[RepoConfig],
               uri_col: str = "uri") -> DataFrame:
    """→ (uri, repo, kind, basefile): each URI routed to the first repo
    (list order) whose URI space claims it; kind ∈ {'res','dataset'};
    unclaimed URIs keep NULLs (the reference's 404 branch,
    wsgiapp.py:217)."""
    repo, kind, basefile = _route_cols(F.col(uri_col), configs)
    return uris.select(
        F.col(uri_col).alias("uri"),
        repo.alias("repo"), kind.alias("kind"), basefile.alias("basefile"))


def sql_route(uri_expr: str, configs: list[RepoConfig]) -> str:
    """The identical routing decision as ANSI SQL (DuckDB oracle twin).

    Generated from the same config list so Spark and SQL can never
    drift structurally; kept SQL-expressible deliberately (the driver's
    correctness gate runs it verbatim)."""
    def esc(s: str) -> str:
        return s.replace("'", "''")

    repo_w, kind_w, bf_w = [], [], []
    for cfg in configs:
        res_p, ds_p = (cfg.url + "res/" + cfg.alias + "/",
                       cfg.url + "dataset/" + cfg.alias)
        is_res = f"starts_with({uri_expr}, '{esc(res_p)}')"
        nxt = f"substr({uri_expr}, {len(ds_p) + 1}, 1)"
        is_ds = (f"(starts_with({uri_expr}, '{esc(ds_p)}') "
                 f"AND {nxt} IN ('', '.', '?'))")
        rest = f"substr({uri_expr}, {len(res_p) + 1})"
        repo_w.append(f"WHEN {is_res} OR {is_ds} THEN '{esc(cfg.alias)}'")
        kind_w.append(f"WHEN {is_res} THEN 'res' "
                      f"WHEN {is_ds} THEN 'dataset'")
        bf_w.append(
            f"WHEN {is_res} THEN (CASE"
            f" WHEN contains({rest}, '#') THEN split_part({rest}, '#', 1)"
            f" WHEN contains({rest}, '.') THEN split_part({rest}, '.', 1)"
            f" ELSE {rest} END)")
    return (f"CASE {' '.join(repo_w)} ELSE NULL END AS repo, "
            f"CASE {' '.join(kind_w)} ELSE NULL END AS kind, "
            f"CASE {' '.join(bf_w)} ELSE NULL END AS basefile")
