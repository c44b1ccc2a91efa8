"""Facet selector library + the TOC read path, Spark-native.

The reference's Facet class pairs every facet predicate with selector /
key / identificator functions applied per row in driver Python
(ref ferenda/facet.py:128-338, defaults table :440-540); TOC pagesets
and page document lists are built from them
(ref ferenda/documentrepository.py:2774-2921 toc_pagesets /
toc_select_for_pages). Here every selector is a native column
expression (JVM-side, codegen), so the whole TOC derivation is two
group-bys over the faceted table — no per-row Python:

- ``title_sortkey`` ≙ util.title_sortkey (ref ferenda/util.py:724-737)
- ``firstletter`` with the '-' degenerate fallback (ref facet.py:216-238)
- ``year`` accepting 19/10/7-char date strings, NULL (≙ skipped row)
  otherwise (ref facet.py:159-184)
- ``booleanvalue`` — only 'true' is True (ref facet.py:186-199)
- ``term`` ≙ util.uri_leaf with the space→underscore fallback
  (ref facet.py:296-316, util.py:621-637)
- ``qname`` against the registered namespaces (ref facet.py:318-338)
- ``resourcelabel``/``sortresource`` as a broadcast join against the
  commondata label table with the reference's predicate priority
  (rdfs:label → skos:prefLabel → skos:altLabel → dcterms:title →
  dcterms:alternative → foaf:name → bibo:identifier,
  ref facet.py:259-276)

Page ordering defaults to C-locale binary; the reference collates with
``locale.strxfrm`` under a configurable collate_locale
(ref ferenda/documentrepository.py:2843). For the reference's own
sv_SE case a pure-expression collation key is provided
(``collation="sv_SE"``): a translate() mapping that sorts å < ä < ö
after z (the 1-char codes {|} sit just past 'z' in binary order) and
folds é→e, ü→y at primary strength — no ICU/locale dependency, and the
key is a native column expression so ordering stays JVM-side. Other
locales: pass a custom key via the same translate pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..namespaces import NS

RDF_TYPE = NS["rdf"] + "type"
DCT = NS["dcterms"]

LABEL_PRIORITY = [
    NS["rdfs"] + "label",
    NS["skos"] + "prefLabel",
    NS["skos"] + "altLabel",
    DCT + "title",
    DCT + "alternative",
    NS["foaf"] + "name",
    NS["bibo"] + "identifier",
]


# ----------------------------------------------------------- collation
#
# The reference sorts TOC pages with locale.strxfrm under the repo's
# locale (ref documentrepository.py:2843). Each entry below is a
# strxfrm-equivalent sort key for LOWERCASED input (TOC keys are
# lowercased upstream): multi-char folds applied first (Danish aa→å,
# German ß→ss, French ligatures), then a translate() that places the
# locale's letters at their primary positions ({|} sort after z), then
# a \x00-separated secondary tail (the untranslated string) so words
# that fold to the same primary key keep glibc's base-before-accented
# order. Every table is cross-checked against a localedef-compiled
# glibc locale in tests/test_facetlib.py.
_COLLATIONS: dict[str, tuple[list, str, str]] = {
    # (multi-char replacements, translate-src, translate-dst)
    "sv_SE": ([], "åäöéü", "{|}ey"),
    "da_DK": ([("aa", "}")], "æøåäöü", "{|}{|y"),
    "de_DE": ([("ß", "ss")], "äöü", "aou"),
    "fr_FR": ([("œ", "oe"), ("æ", "ae")],
              "àâéèêëîïôùûüçÿ", "aaeeeeiiouuucy"),
    # r4 verdict #6 — the plausible next legal-corpus locales,
    # empirically derived from localedef-compiled glibc order:
    # nb_NO collates like da_DK (æ/ä, ø/ö, å after z; aa→å; ü≡y)
    # plus the ß→ss and ô→o primary folds; fi_FI is Swedish-shaped
    # (å, ä≡æ, ö≡ø after z) with NO aa-fold and NO v/w merge (glibc
    # drops the traditional SFS-4600 v≡w equivalence).
    "nb_NO": ([("aa", "}"), ("ß", "ss")], "æøåäöüô", "{|}{|yo"),
    "fi_FI": ([("ß", "ss")], "åäæöøüô", "{||}}yo"),
}


def collate_expr(col: Column, collation: str = "C") -> Column:
    """Sort-key expression for page/value ordering. "C" = binary (the
    default, what the driver oracles assume); otherwise one of the
    ``_COLLATIONS`` locales."""
    if collation == "C":
        return col
    if collation not in _COLLATIONS:
        raise ValueError("unknown collation %r" % collation)
    repl, src, dst = _COLLATIONS[collation]
    low = F.lower(col)
    prim = low
    for a, b in repl:
        prim = F.replace(prim, F.lit(a), F.lit(b))
    return F.concat(F.translate(prim, src, dst), F.lit("\x00"), low)


def collate_key(s: str, collation: str = "C") -> str:
    """Pure-Python twin of :func:`collate_expr` (golden/test use)."""
    if collation == "C":
        return s
    if collation not in _COLLATIONS:
        raise ValueError("unknown collation %r" % collation)
    repl, src, dst = _COLLATIONS[collation]
    low = s.lower()
    prim = low
    for a, b in repl:
        prim = prim.replace(a, b)
    return prim.translate(str.maketrans(src, dst)) + "\x00" + low


# ------------------------------------------------------ selector exprs

def title_sortkey_expr(col: Column) -> Column:
    # [^\p{L}\p{N}_] not \W: the reference's Python \W is
    # unicode-aware (ref ferenda/util.py:724-737 keeps å/ä/ö), Java's
    # \W is ASCII-only and would strip them
    s = F.lower(col)
    s = F.regexp_replace(s, r"^the ", "")
    return F.regexp_replace(s, r"[^\p{L}\p{N}_]+", "")


def firstletter_expr(col: Column) -> Column:
    key = title_sortkey_expr(col)
    return F.when(F.length(key) > 0, F.substring(key, 1, 1)) \
            .otherwise(F.lit("-"))


def year_expr(col: Column) -> Column:
    return F.when(F.length(col).isin(19, 10, 7), F.substring(col, 1, 4))


def booleanvalue_expr(col: Column) -> Column:
    return col == "true"


def term_expr(col: Column) -> Column:
    """util.uri_leaf: fragment/last-segment after '#', else '/', else
    ':'; a URI ending in the separator (or containing none) falls back
    to the space→underscore form."""
    fallback = F.regexp_replace(col, " ", "_")

    def leaf(ch: str) -> Column:
        return F.when(col.endswith(ch), fallback) \
                .otherwise(F.element_at(F.split(col, "\\" + ch), -1))

    return (F.when(col.contains("#"), leaf("#"))
            .when(col.contains("/"), leaf("/"))
            .when(col.contains(":"), leaf(":"))
            .otherwise(fallback))


def qname_expr(col: Column) -> Column:
    """prefix:local against the registered namespace table; longest
    namespace wins (≙ rdflib compute_qname)."""
    expr = col
    for prefix, ns in sorted(NS.items(), key=lambda kv: len(kv[1])):
        expr = F.when(col.startswith(ns),
                      F.concat(F.lit(prefix + ":"),
                               F.substring(col, len(ns) + 1, 4096))) \
                .otherwise(expr)
    return expr


def resource_label_table(labels: DataFrame) -> DataFrame:
    """labels(uri, predicate, label) → (res_uri, res_label): the best
    label per resource by LABEL_PRIORITY (broadcastable — authority
    tables are small)."""
    prio = F.array(*[F.lit(p) for p in LABEL_PRIORITY])
    ranked = (labels
              .withColumn("prio", F.array_position(prio, F.col("predicate")))
              .where(F.col("prio") > 0))
    w = Window.partitionBy("uri").orderBy("prio", "label")
    return (ranked.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("uri").alias("res_uri"),
                    F.col("label").alias("res_label")))


# ------------------------------------------------------------- facets

@dataclass
class Facet:
    """Data-only facet spec; selector/key/identificator name one of the
    expression builders above. Defaults per predicate mirror
    ref ferenda/facet.py:440-540."""
    predicate: str
    selector: str = "default"
    key: str = "default"
    # the reference's fallback identificator is the slug-like
    # lower+dash transform, not identity (ref facet.py:400-404)
    identificator: str = "defaultidentificator"
    use_for_toc: bool = False
    selector_descending: bool = False
    key_descending: bool = False
    label: str = "Sorted by %(term)s"
    pagetitle: str = "Documents where %(term)s = %(selected)s"

    @property
    def column(self) -> str:
        from .facets import qname_col
        return qname_col(self.predicate)

    @property
    def term(self) -> str:
        return self.column.split("_", 1)[-1]


_DEFAULTS = {
    RDF_TYPE: dict(selector="resourcelabel_or_qname", identificator="term",
                   use_for_toc=False,
                   pagetitle="All %(selected)s documents"),
    DCT + "title": dict(selector="firstletter", key="titlesortkey",
                        identificator="firstletter", use_for_toc=True,
                        pagetitle='Documents starting with "%(selected)s"'),
    DCT + "identifier": dict(selector="firstletter", key="titlesortkey",
                             identificator="firstletter", use_for_toc=False),
    DCT + "publisher": dict(selector="resourcelabel", key="resourcelabel",
                            identificator="term", use_for_toc=True,
                            pagetitle="Documents published by %(selected)s"),
    DCT + "issued": dict(selector="year", key="default",
                         identificator="year", use_for_toc=True,
                         label="Sorted by publication year",
                         pagetitle="Documents published in %(selected)s"),
    DCT + "subject": dict(selector="resourcelabel", key="resourcelabel",
                          identificator="term", use_for_toc=True),
    NS["schema"] + "free": dict(selector="booleanvalue", key="default",
                                use_for_toc=True),
}


def make_facet(predicate: str, **overrides) -> Facet:
    kw = dict(_DEFAULTS.get(predicate, {}))
    kw.update(overrides)
    return Facet(predicate, **kw)


def default_facets() -> list[Facet]:
    """ref ferenda/documentrepository.py:2151-2161."""
    return [make_facet(RDF_TYPE), make_facet(DCT + "title"),
            make_facet(DCT + "publisher"), make_facet(DCT + "identifier"),
            make_facet(DCT + "issued")]


def _selector_col(name: str, col: Column, labeled: Column | None) -> Column:
    if name == "default":
        return col
    if name == "defaultidentificator":
        # lower + space→dash (ref facet.py:142-155)
        return F.regexp_replace(F.lower(col), " ", "-")
    if name == "titlesortkey":
        return title_sortkey_expr(col)
    if name == "firstletter":
        return firstletter_expr(col)
    if name == "year":
        return year_expr(col)
    if name == "booleanvalue":
        return booleanvalue_expr(col).cast("string")
    if name == "term":
        return term_expr(col)
    if name == "qname":
        return qname_expr(col)
    if name == "resourcelabel":
        return F.coalesce(labeled, col)
    if name == "sortresource":
        return title_sortkey_expr(F.coalesce(labeled, col))
    if name == "resourcelabel_or_qname":
        return F.coalesce(labeled, qname_expr(col))
    raise ValueError("unknown selector %r" % name)


def _with_labels(faceted: DataFrame, facets: list[Facet],
                 labels: DataFrame | None) -> DataFrame:
    """Broadcast-join the best-label table onto every facet column that
    uses a resource-label selector/key; adds ``<column>__label``."""
    need = {f.column for f in facets
            if f.column in faceted.columns
            and ("resourcelabel" in (f.selector, f.key)
                 or "sortresource" in (f.selector, f.key)
                 or f.selector == "resourcelabel_or_qname")}
    if not need:
        return faceted
    lt = resource_label_table(labels) if labels is not None else None
    for c in sorted(need):
        if lt is None:
            faceted = faceted.withColumn(c + "__label",
                                         F.lit(None).cast("string"))
        else:
            faceted = (faceted
                       .join(F.broadcast(lt.withColumnRenamed(
                           "res_uri", c).withColumnRenamed(
                           "res_label", c + "__label")), c, "left"))
    return faceted


def melt_facets(src: DataFrame, facets: list[Facet],
                value_of, extra_fields=()) -> DataFrame:
    """Unpivot one row per (document, facet): explode an array of
    per-facet structs built by ``value_of(facet, col, label_col)``.

    This is the load-bearing shape choice for the TOC/news read paths:
    a union of per-facet branches re-scans (and re-pivots) the faceted
    subtree once PER FACET — measured 6-24 parquet scans per query —
    while the melt computes the faceted table once and explodes it, so
    the whole derivation is one scan + one shuffle regardless of facet
    count. NULL selector values yield NULL structs filtered after the
    explode (≙ the reference's KeyError-skip)."""
    structs = []
    for f in facets:
        col = F.col(f.column)
        lab = F.col(f.column + "__label") \
            if (f.column + "__label") in src.columns else None
        fields = value_of(f, col, lab)
        structs.append(
            F.when(col.isNotNull(),
                   F.struct(F.lit(f.column).alias("binding"), *fields)))
    melted = src.withColumn("e", F.explode(F.array(*structs)))
    return (melted
            .where(F.col("e").isNotNull() & F.col("e.value").isNotNull())
            .select(*src.columns, "e.*"))


def toc_pagesets(faceted: DataFrame, facets: list[Facet],
                 labels: DataFrame | None = None,
                 collation: str = "C") -> DataFrame:
    """→ (binding, pageset_label, value, urlfragment, pagetitle): one
    row per TOC page, pages ordered by value within each pageset
    (ref documentrepository.py:2774-2852; value ordering collated per
    ``collation``, ≙ the reference's locale.strxfrm sort). NULL
    selector values are skipped (≙ the KeyError-on-incomplete-row
    path)."""
    toc = [f for f in facets
           if f.use_for_toc and f.column in faceted.columns]
    if not toc:
        return faceted.sparkSession.createDataFrame(
            [], "binding string, pageset_label string, value string,"
                " urlfragment string, pagetitle string")
    src = _with_labels(faceted, facets, labels)
    labels_by_col = {f.column: f.label % {"term": f.term} for f in toc}
    titles_by_col = {f.column: f.pagetitle % {"term": f.term,
                                              "selected": "\x00"}
                     for f in toc}

    def fields(f, col, lab):
        return [_selector_col(f.selector, col, lab).alias("value"),
                _selector_col(f.identificator, col, lab)
                .alias("urlfragment")]

    melted = melt_facets(src, toc, fields)
    map_items = []
    for c in labels_by_col:
        map_items += [F.lit(c), F.lit(labels_by_col[c])]
    title_items = []
    for c in titles_by_col:
        title_items += [F.lit(c), F.lit(titles_by_col[c])]
    return (melted
            .groupBy("binding", "value")
            .agg(F.min("urlfragment").alias("urlfragment"))
            .select("binding",
                    F.element_at(F.create_map(*map_items),
                                 F.col("binding")).alias("pageset_label"),
                    "value", "urlfragment",
                    F.replace(F.element_at(F.create_map(*title_items),
                                           F.col("binding")),
                              F.lit("\x00"),
                              F.col("value")).alias("pagetitle"))
            .select("binding", "pageset_label", "value", "urlfragment",
                    "pagetitle")
            .orderBy("binding", collate_expr(F.col("value"), collation),
                     "value"))


def toc_documents(faceted: DataFrame, facets: list[Facet],
                  labels: DataFrame | None = None,
                  label_col: str = "dcterms_title",
                  top_n: int = 1000,
                  collation: str = "C") -> DataFrame:
    """→ (binding, value, pos, label, uri): the per-page ordered
    document lists, flattened (≙ toc_select_for_pages,
    ref documentrepository.py:2854-2916; toc_item :2918-2921 renders
    dcterms_title as link text). Within a page, documents order by the
    facet's key expression (asc/desc per facet, realized as one window
    per direction group over the melted rows, collated per
    ``collation``), uri as tiebreak."""
    toc = [f for f in facets
           if f.use_for_toc and f.column in faceted.columns]
    if not toc:
        return faceted.sparkSession.createDataFrame(
            [], "binding string, value string, pos int, label string,"
                " uri string")
    src = _with_labels(faceted, facets, labels)

    def fields(f, col, lab):
        return [_selector_col(f.selector, col, lab).alias("value"),
                _selector_col(f.key, col, lab).cast("string")
                .alias("_key")]

    out = None
    for descending in sorted({f.key_descending for f in toc}):
        group = [f for f in toc if f.key_descending is descending]
        melted = melt_facets(src, group, fields)
        key = collate_expr(F.col("_key"), collation)
        w = (Window.partitionBy("binding", "value")
             .orderBy(key.desc() if descending else key.asc(),
                      F.asc("uri")))
        part = (melted
                .withColumn("pos", F.row_number().over(w))
                .select("binding", "value", "pos",
                        F.col(label_col).alias("label"), "uri"))
        out = part if out is None else out.unionByName(part)
    return (out.where(F.col("pos") <= top_n)
            .orderBy("binding", "value", "pos"))
