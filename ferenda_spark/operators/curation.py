"""Corpus-curation operators: benchmark decontamination and
repetition/boilerplate statistics.

Two standard steps of a web-scale training-data pipeline that sit
between quality filtering (:mod:`.textops`) and dedup (:mod:`.dedup`):

- **decontamination** — flag corpus documents that share word n-grams
  with a benchmark/eval set, so evaluation data can be excluded from
  training corpora (the n-gram-overlap method used by the public
  GPT-3/PaLM/Llama decontamination write-ups);
- **repetition stats** — Gopher-style within-document repetition
  signals (duplicate-word fraction, duplicate n-gram fraction, top-word
  fraction) used to drop boilerplate and degenerate generations.

Reference analog: ferenda's parse stage has no corpus-level curation
(it operates per legal document), but its shingle/fulltext machinery
(ferenda/fulltextindex.py:120-152) is the same word-n-gram foundation;
these operators extend it to corpus scale the way `.dedup` extends the
exact-duplicate check.

Scale notes:

- ``decontaminate`` broadcasts the *benchmark* shingle set (eval sets
  are tiny — MMLU/GSM8K-scale, thousands of documents — while the
  corpus is the 100 TB side), so the corpus side sees one broadcast
  hash join plus one partial-aggregated groupBy on ``doc_id`` — rows
  already co-partitioned by the explode, no skew (a shingle hit count
  per document is bounded by document length).
- ``repetition_stats`` computes the array-based fractions as codegen
  projections (no shuffle) and the top-word fraction with a two-level
  aggregate (map-side partial combine on (doc_id, word)) — the
  canonical Spark shape for per-document modes; one Exchange on
  doc_id-hash regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _sql_shingles, shingle_table
from .textops import WS_SPLIT, words_col


def decontaminate(corpus: DataFrame, benchmark: DataFrame, n: int = 3,
                  threshold: float = 0.2, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-corpus-document benchmark n-gram contamination.

    → (doc_id, n_ngrams, n_hit, contamination, contaminated) for every
    corpus document: how many of its distinct word ``n``-grams appear
    anywhere in the benchmark set, the hit ratio, and a boolean flag at
    ``threshold``. Shingling reuses :func:`.dedup.shingle_table`
    (materialized Arrow stage — see its docstring for why arrays must
    be data, not expressions), so the oracle's
    regexp_split/list_distinct construction matches byte-for-byte.
    """
    corpus_sh = shingle_table(corpus, n=n, text_col=text_col,
                              id_col=id_col)
    bench_grams = (shingle_table(benchmark, n=n, text_col=text_col,
                                 id_col=id_col)
                   .select(F.explode("sh").alias("g")).distinct())
    hits = (corpus_sh.select("id", F.explode("sh").alias("g"))
            .join(F.broadcast(bench_grams), "g")
            .groupBy("id").agg(F.count("g").alias("n_hit")))
    base = corpus_sh.select(F.col("id"),
                            F.size("sh").cast("long").alias("n_ngrams"))
    ratio = (F.coalesce(F.col("n_hit"), F.lit(0)).cast("double") /
             F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double"))
    return (base.join(hits, "id", "left")
            .select(F.col("id").alias(id_col),
                    "n_ngrams",
                    F.coalesce(F.col("n_hit"), F.lit(0)).cast("long")
                     .alias("n_hit"),
                    F.round(ratio, 6).alias("contamination"),
                    (F.round(ratio, 6) >= threshold).alias("contaminated"))
            .orderBy(id_col))


def repetition_stats(df: DataFrame, n: int = 3, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Within-document repetition signals (Gopher-rule family).

    → (doc_id, n_words, dup_word_frac, dup_ngram_frac, top_word_frac):
    fraction of word occurrences that are repeats, fraction of word
    ``n``-gram occurrences that are repeats, and the frequency share of
    the single most common word. The array fractions are pure column
    expressions; the top-word share is the standard explode →
    two-level aggregate (partial combine map-side).
    """
    words = words_col(F.col(text_col))
    nw = F.size(words)
    grams = F.when(
        nw >= n,
        F.transform(F.sequence(F.lit(1), nw - (n - 1)),
                    lambda i: F.concat_ws(
                        " ", *[F.element_at(words, i + j)
                               for j in range(n)]))
    ).otherwise(F.array().cast("array<string>"))
    nwd = F.greatest(nw, F.lit(1)).cast("double")
    ng = F.size(grams)
    ngd = F.greatest(ng, F.lit(1)).cast("double")
    base = df.select(
        F.col(id_col),
        nw.cast("long").alias("n_words"),
        F.round(F.when(nw > 0,
                       F.lit(1.0) - F.size(F.array_distinct(words)) / nwd)
                 .otherwise(F.lit(0.0)), 6).alias("dup_word_frac"),
        F.round(F.when(ng > 0,
                       F.lit(1.0) - F.size(F.array_distinct(grams)) / ngd)
                 .otherwise(F.lit(0.0)), 6).alias("dup_ngram_frac"),
    )
    top = (df.select(F.col(id_col), F.explode(words).alias("w"))
           .groupBy(id_col, "w").count()
           .groupBy(id_col).agg(F.max("count").alias("top_cnt")))
    return (base.join(top, id_col, "left")
            .select(id_col, "n_words", "dup_word_frac", "dup_ngram_frac",
                    F.round(F.when(F.col("n_words") > 0,
                                   F.coalesce(F.col("top_cnt"), F.lit(0))
                                   .cast("double") / F.col("n_words"))
                             .otherwise(F.lit(0.0)), 6)
                    .alias("top_word_frac"))
            .orderBy(id_col))


# PII patterns, written in the common Java-regex / RE2 dialect subset
# (non-capturing groups, \b, bounded repetition) so the Spark and
# DuckDB twins compile the SAME string. Scrub order matters and is
# fixed: emails first (their local/domain parts contain digits and
# dots that the later patterns could partially claim), then IPv4
# (dotted digits that the phone pattern's [\d-] run could chew), then
# phones. Counts are taken on the text as it stands at each step, so a
# character sequence is attributed to exactly one category.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"
PII_PHONE = r"\+\d[\d-]{6,13}\d"
_PII_STEPS = (("n_emails", PII_EMAIL, "<EMAIL>"),
              ("n_ips", PII_IPV4, "<IP>"),
              ("n_phones", PII_PHONE, "<PHONE>"))


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers from web text.

    → (doc_id, clean_text, n_emails, n_ips, n_phones): the text with
    each PII span replaced by a typed placeholder, plus per-document
    match counts — the standard pre-training privacy scrub (the
    regex-rule family used by the public C4/CCNet/Dolma pipelines).

    Reference analog: none — ferenda normalizes legal-document text
    (ferenda/textreader.py) but never redacts; this extends the
    curation family the way ``decontaminate`` does.

    Scale notes: pure codegen projection — three
    ``regexp_count``/``regexp_replace`` pairs in one whole-stage
    codegen span, no UDF, no shuffle; at 100 TB this is a map-only
    pass whose cost is the parquet scan plus JVM regex time.
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for alias, pat, repl in _PII_STEPS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long")
                      .alias(alias))
        cur = F.regexp_replace(cur, pat, repl)
    return (df.select(F.col(id_col), cur.alias("clean_text"), *counts)
            .orderBy(id_col))


def oracle_sql_pii(table: str = "documents",
                   text_expr: str = "coalesce(text, '')") -> str:
    """DuckDB twin of :func:`pii_scrub` over ``text_expr`` (the driver
    query passes its PII-injection expression here)."""
    cur = text_expr
    counts = []
    for alias, pat, _repl in _PII_STEPS:
        counts.append("len(regexp_extract_all(%s, '%s'))::bigint AS %s"
                      % (cur, pat, alias))
        cur = "regexp_replace(%s, '%s', '%s', 'g')" % (cur, pat, _repl)
    return f"""
    SELECT doc_id, {cur} AS clean_text,
           {", ".join(counts)}
    FROM {table}
    ORDER BY doc_id
    """


def oracle_sql_decontaminate(table: str = "documents", n: int = 3,
                             threshold: float = 0.2,
                             bench_pred: str = "doc_id % 37 = 0") -> str:
    """DuckDB twin of :func:`decontaminate` with the benchmark side
    selected by ``bench_pred`` from the same table (the driver query's
    deterministic eval-set split)."""
    return f"""
    WITH sh AS (
      SELECT doc_id, {_sql_shingles(n)} AS sh
      FROM (SELECT doc_id,
                   CASE WHEN trim(coalesce(text, ''))='' THEN []::varchar[]
                        ELSE regexp_split_to_array(trim(coalesce(text, '')), '{WS_SPLIT}') END AS words
            FROM {table})
    ),
    bench AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE {bench_pred}),
    corpus AS (SELECT * FROM sh WHERE NOT ({bench_pred})),
    ex AS (SELECT doc_id, unnest(sh) AS g FROM corpus),
    hits AS (SELECT e.doc_id, count(*) AS n_hit
             FROM ex e JOIN bench b ON e.g = b.g GROUP BY e.doc_id)
    SELECT c.doc_id, len(c.sh)::bigint AS n_ngrams,
           coalesce(h.n_hit, 0)::bigint AS n_hit,
           round(coalesce(h.n_hit, 0)::double
                 / greatest(len(c.sh), 1), 6) AS contamination,
           round(coalesce(h.n_hit, 0)::double
                 / greatest(len(c.sh), 1), 6) >= {threshold} AS contaminated
    FROM corpus c LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id
    """


def oracle_sql_repetition(table: str = "documents", n: int = 3) -> str:
    gram = " || ' ' || ".join(f"words[i+{j}]" for j in range(n))
    grams = (f"CASE WHEN len(words) >= {n} THEN "
             f"[ {gram} for i in range(1, len(words) - {n - 2}) ] "
             f"ELSE []::varchar[] END")
    return f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN trim(coalesce(text, ''))='' THEN []::varchar[]
                  ELSE regexp_split_to_array(trim(coalesce(text, '')), '{WS_SPLIT}') END AS words
      FROM {table}
    ), feat AS (
      SELECT doc_id, len(words) AS nw,
             len(list_distinct(words)) AS nd,
             {grams} AS g
      FROM base
    ), top AS (
      SELECT doc_id, max(c) AS top_cnt
      FROM (SELECT doc_id, w, count(*) AS c
            FROM (SELECT doc_id, unnest(words) AS w FROM base)
            GROUP BY doc_id, w)
      GROUP BY doc_id
    )
    SELECT f.doc_id, f.nw::bigint AS n_words,
           round(CASE WHEN f.nw > 0
                 THEN 1.0 - f.nd::double / greatest(f.nw, 1)
                 ELSE 0.0 END, 6) AS dup_word_frac,
           round(CASE WHEN len(f.g) > 0
                 THEN 1.0 - len(list_distinct(f.g))::double
                      / greatest(len(f.g), 1)
                 ELSE 0.0 END, 6) AS dup_ngram_frac,
           round(CASE WHEN f.nw > 0
                 THEN coalesce(t.top_cnt, 0)::double / f.nw
                 ELSE 0.0 END, 6) AS top_word_frac
    FROM feat f LEFT JOIN top t USING (doc_id)
    ORDER BY doc_id
    """


# ----------------------------------------------------- text normalization

# ftfy-lite / CCNet-style cleanup chain. One ordered rule list shared
# by both engines (Java regex and RE2 both parse \x{...} classes and
# the explicit char classes below identically — same discipline as
# WS_SPLIT). Order matters and is fixed:
#   1. CR / CRLF → LF (so later newline rules see one convention)
#   2. delete remaining C0/C1-ish control chars (keep \t \n)
#   3. delete zero-width chars (ZWSP/ZWNJ/ZWJ/BOM)
#   4. NBSP → space
#   5. curly quotes / primes → ASCII quotes
#   6. en/em/horizontal-bar dashes → hyphen; ellipsis → "..."
#   7. collapse horizontal whitespace runs to one space
#   8. strip spaces around newlines
#   9. cap blank-line runs at one (\n{3,} → \n\n)
#  10. trim leading/trailing whitespace
NORM_STEPS = (
    (r"\r\n?", "\n"),
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    (r"[\x{200b}-\x{200d}\x{feff}]", ""),
    (r"\x{00a0}", " "),
    (r"[\x{2018}\x{2019}\x{201a}\x{2032}]", "'"),
    (r"[\x{201c}\x{201d}\x{201e}\x{2033}]", "\""),
    (r"[\x{2013}\x{2014}\x{2015}]", "-"),
    (r"\x{2026}", "..."),
    (r"[ \t]+", " "),
    (r" *\n *", "\n"),
    (r"\n{3,}", "\n\n"),
    (r"^[ \n]+|[ \n]+$", ""),
)


def normalize_text(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Unicode / whitespace normalization for scraped web text.

    → (doc_id, clean_text, changed, n_chars_delta): the text after the
    :data:`NORM_STEPS` chain, whether anything changed, and the
    character-count delta — the mojibake/controls/typography cleanup
    pass (ftfy-lite) every public web pipeline (CCNet, C4, Dolma) runs
    before tokenization.

    Reference analog: ferenda normalizes whitespace per text node
    (ferenda/textreader.py linearization + testutil normalize_space)
    but never at corpus scale; this is that step as a set operation.

    Scale notes: a fixed chain of ``regexp_replace`` calls — one
    whole-stage-codegen projection, no shuffle, no UDF; at 100 TB it
    is a map-only pass like :func:`pii_scrub`.
    """
    orig = F.coalesce(F.col(text_col), F.lit(""))
    cur = orig
    for pat, repl in NORM_STEPS:
        cur = F.regexp_replace(cur, pat, repl)
    return (df.select(
                F.col(id_col), cur.alias("clean_text"),
                (cur != orig).alias("changed"),
                (F.length(orig) - F.length(cur)).cast("long")
                .alias("n_chars_delta"))
            .orderBy(id_col))


def oracle_sql_normalize(table: str = "documents",
                         text_expr: str = "coalesce(text, '')") -> str:
    """DuckDB twin of :func:`normalize_text` — the same
    :data:`NORM_STEPS` chain through RE2 (patterns are written in the
    dialect intersection, so the strings interpolate verbatim)."""
    cur = text_expr
    for pat, repl in NORM_STEPS:
        # DuckDB single-quoted literals pass backslashes through
        # verbatim, so the shared patterns interpolate unchanged (the
        # WS_SPLIT convention); literal newlines become chr(10)
        cur = ("regexp_replace(%s, '%s', '%s', 'g')"
               % (cur, pat,
                  repl.replace("'", "''")
                      .replace("\n", "' || chr(10) || '")))
    return f"""
    SELECT doc_id, {cur} AS clean_text,
           {cur} <> {text_expr} AS changed,
           (length({text_expr}) - length({cur}))::bigint AS n_chars_delta
    FROM {table}
    ORDER BY doc_id
    """


# tracking parameters stripped by url canonicalization — the public
# utm/click-id family every crawl pipeline drops before refetch dedup
TRACKING_PARAM_RE = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="

# the shared parse regexes (dialect intersection of Spark's Java
# regex and DuckDB's RE2, like NORM_STEPS)
_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATHQ_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"


def canonical_url_col(url) -> "F.Column":
    """URL canonicalization as one native column expression: strip
    fragment; lowercase scheme + host; drop default ports (:80 http,
    :443 https); strip a leading ``www.``; strip trailing slashes on
    the path; drop tracking query params (:data:`TRACKING_PARAM_RE`)
    and sort the survivors. The standard refetch-normalization rules
    (RFC 3986 §6 syntax-based normalization + the crawl-pipeline
    extras). Non-URL input degrades deterministically (empty
    scheme/host), never errors.

    Query-param ordering note: array_sort here and list_sort in the
    SQL twin are both code-point orderings only for ASCII; params are
    percent-encoded ASCII in well-formed URLs, which is what keeps
    the two engines identical.
    """
    u = F.coalesce(url, F.lit(""))
    nofrag = F.regexp_replace(u, "#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(nofrag, _HOSTPORT_RE, 1))
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, ":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, ":443$", ""))
            .otherwise(hostport))
    host = F.regexp_replace(host, r"^www\.", "")
    pathq = F.regexp_extract(nofrag, _PATHQ_RE, 1)
    path = F.regexp_replace(F.regexp_extract(pathq, "^([^?]*)", 1),
                            "/+$", "")
    query = F.regexp_extract(pathq, r"[?](.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit(""))
         .otherwise(F.concat(F.lit("?"), qs)))


def url_dedup(df: DataFrame, id_col: str = "doc_id",
              url_col: str = "url") -> DataFrame:
    """Refetch dedup by canonical URL: the Common-Crawl-shaped input
    carries one row per (url, fetch), and mirrors/trackers/fragments
    make textually distinct urls point at one resource.

    → (doc_id, canonical_url, keep, dup_count): per fetched row, its
    canonical form, whether it is the cluster representative
    (min doc_id — deterministic), and the cluster size. Callers drop
    ``keep = false``.

    Scale notes: canonicalization is a map-only codegen projection;
    the verdict is ONE hash shuffle keyed by canonical_url (a window,
    not a self-join). Url-keyed groups are tiny (refetch multiplicity),
    so no skew handling is needed — unlike domain-keyed aggregations
    (cf. textops.url_stats).
    """
    from pyspark.sql import Window
    w = Window.partitionBy("canonical_url")
    return (df.select(F.col(id_col).alias("doc_id"),
                      canonical_url_col(F.col(url_col))
                      .alias("canonical_url"))
            .withColumn("keep",
                        F.col("doc_id") == F.min("doc_id").over(w))
            .withColumn("dup_count", F.count(F.lit(1)).over(w))
            .orderBy("doc_id"))


def oracle_sql_url_dedup(table: str = "documents",
                         url_expr: str = "url") -> str:
    """DuckDB twin of :func:`url_dedup` (same regex chain via RE2,
    list lambdas for the param sort)."""
    return f"""
    WITH raw AS (
      SELECT doc_id, regexp_replace(coalesce({url_expr}, ''),
                                    '#.*$', '') AS nofrag
      FROM {table}
    ), parts AS (
      SELECT doc_id,
        lower(regexp_extract(nofrag, '{_SCHEME_RE}', 1)) AS scheme,
        lower(regexp_extract(nofrag, '{_HOSTPORT_RE}', 1)) AS hostport,
        regexp_extract(nofrag, '{_PATHQ_RE}', 1) AS pathq
      FROM raw
    ), norm AS (
      SELECT doc_id, scheme,
        regexp_replace(
          CASE WHEN scheme = 'http'
               THEN regexp_replace(hostport, ':80$', '')
               WHEN scheme = 'https'
               THEN regexp_replace(hostport, ':443$', '')
               ELSE hostport END, '^www\\.', '') AS host,
        regexp_replace(regexp_extract(pathq, '^([^?]*)', 1),
                       '/+$', '') AS path,
        coalesce(array_to_string(list_sort(list_filter(
          string_split(regexp_extract(pathq, '\\?(.*)$', 1), '&'),
          x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_PARAM_RE}')
        )), '&'), '') AS qs
        -- coalesce: DuckDB's array_to_string([]) is NULL where
        -- Spark's array_join([]) is ''
      FROM parts
    ), canon AS (
      SELECT doc_id,
        scheme || '://' || host || path ||
        CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS canonical_url
      FROM norm
    )
    SELECT doc_id, canonical_url,
      doc_id = min(doc_id) OVER (PARTITION BY canonical_url) AS keep,
      count(*) OVER (PARTITION BY canonical_url) AS dup_count
    FROM canon ORDER BY doc_id
    """


def ngram_lm_perplexity(corpus: DataFrame, lm_corpus: DataFrame | None = None,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """CCNet-style LM quality signal: per-document bigram perplexity
    under a Laplace-smoothed word-bigram model trained on
    ``lm_corpus`` (defaults to ``corpus`` itself — self-perplexity,
    which surfaces boilerplate at the low end and garbage at the high
    end; CCNet trains on a clean reference corpus and keeps the low-ppl
    band).

    → (doc_id, n_words, n_oov, n_bigrams, log2_ppl): token count,
    tokens outside the LM vocabulary, scored bigram count, and the
    per-bigram mean of -log2 P(w2|w1) rounded to 6dp (NULL when the
    document has < 2 words). P(w2|w1) = (B(w1,w2)+1) / (U(w1)+V+1) —
    counts from the LM corpus, V its vocabulary size, +1 the OOV
    pseudo-word.

    Scale shape: everything is codegen — bigrams come from a LINEAR
    zip_with over two slices of the word array (never the O(len²)
    native-transform gram trap: bigrams are adjacent, not all pairs).
    The LM tables are count-aggregated (vocabulary-sized, orders of
    magnitude below the corpus); scoring is one join keyed by word
    (Zipf-skewed on stopwords — AQE skew split) and one keyed by
    (w1,w2) (near-uniform), then a partial-aggregated per-doc fold. V
    enters the plan as a broadcast one-row aggregate, not a collect.
    """
    lm = corpus if lm_corpus is None else lm_corpus
    lm_base = lm.select(words_col(F.col(text_col)).alias("ws"))
    uni = (lm_base.select(F.explode("ws").alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("u")))
    vdf = uni.agg(F.count(F.lit(1)).alias("v"))

    def pair_col():
        return F.when(
            F.size("ws") >= 2,
            F.zip_with(F.slice("ws", 1, F.size("ws") - 1),
                       F.slice(F.col("ws"), F.lit(2), F.size("ws") - 1),
                       lambda a, b: F.struct(a.alias("w1"),
                                             b.alias("w2"))))

    lm_bi = (lm_base.select(F.explode(pair_col()).alias("p"))
             .select("p.w1", "p.w2")
             .groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("b")))

    base = corpus.select(id_col, words_col(F.col(text_col)).alias("ws"))
    tok = (base.select(id_col, F.explode("ws").alias("w"))
           .join(uni, "w", "left")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_words"),
                F.sum(F.when(F.col("u").isNull(), 1).otherwise(0))
                .alias("n_oov")))
    prob = ((F.coalesce(F.col("b"), F.lit(0)) + 1).cast("double") /
            (F.coalesce(F.col("u"), F.lit(0)) + F.col("v") + 1)
            .cast("double"))
    bg = (base.select(id_col, F.explode(pair_col()).alias("p"))
          .select(id_col, "p.w1", "p.w2")
          .join(lm_bi, ["w1", "w2"], "left")
          .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
          .crossJoin(F.broadcast(vdf))
          .select(id_col, (-F.log2(prob)).alias("nll"))
          .groupBy(id_col)
          .agg(F.count(F.lit(1)).alias("n_bigrams"),
               F.round(F.sum("nll") / F.count(F.lit(1)), 6)
               .alias("log2_ppl")))
    return (base.select(id_col)
            .join(tok, id_col, "left").join(bg, id_col, "left")
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
                    F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
                    "log2_ppl")
            .orderBy(id_col))


def oracle_sql_lm_perplexity(table: str = "documents",
                             lm_table: str | None = None) -> str:
    """DuckDB twin of :func:`ngram_lm_perplexity` — identical word
    split, Laplace arithmetic in the same integer-then-double order,
    round 6dp."""
    from .textops import _sql_words
    lm = lm_table or table
    words = ("CASE WHEN trim(coalesce(text, ''))='' THEN []::varchar[] "
             "ELSE %s END" % _sql_words())
    bigrams = ("unnest([words[i] for i in range(1, len(words))]) AS w1, "
               "unnest([words[i+1] for i in range(1, len(words))]) AS w2")
    return f"""
    WITH lmbase AS (SELECT {words} AS words FROM {lm}),
    uni AS (
      SELECT w, count(*)::BIGINT AS u
      FROM (SELECT unnest(words) AS w FROM lmbase) GROUP BY w
    ),
    voc AS (SELECT count(*)::BIGINT AS v FROM uni),
    bi AS (
      SELECT w1, w2, count(*)::BIGINT AS b
      FROM (SELECT {bigrams} FROM lmbase WHERE len(words) >= 2)
      GROUP BY w1, w2
    ),
    base AS (SELECT doc_id, {words} AS words FROM {table}),
    tokj AS (
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(CASE WHEN u IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_oov
      FROM (SELECT doc_id, unnest(words) AS w FROM base) tok
      LEFT JOIN uni USING (w) GROUP BY doc_id
    ),
    bgj AS (
      SELECT doc_id, count(*)::BIGINT AS n_bigrams,
             round(sum(-log2((coalesce(b, 0) + 1)::DOUBLE /
                             (coalesce(u, 0) + v + 1)::DOUBLE))
                   / count(*), 6) AS log2_ppl
      FROM (SELECT doc_id, {bigrams} FROM base WHERE len(words) >= 2) bg
      LEFT JOIN bi USING (w1, w2)
      LEFT JOIN uni ON uni.w = bg.w1
      CROSS JOIN voc
      GROUP BY doc_id
    )
    SELECT base.doc_id,
           coalesce(n_words, 0) AS n_words,
           coalesce(n_oov, 0) AS n_oov,
           coalesce(n_bigrams, 0) AS n_bigrams,
           log2_ppl
    FROM base LEFT JOIN tokj USING (doc_id) LEFT JOIN bgj USING (doc_id)
    ORDER BY doc_id
    """


def nb_quality_classifier(corpus: DataFrame, labeled: DataFrame,
                          positive_label: str = "pos",
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          label_col: str = "label") -> DataFrame:
    """Trained quality filter (the GPT-3/LLaMA-style classifier step:
    positive = a curated reference corpus, negative = raw web text;
    documents are kept by classifier score): multinomial Naive Bayes
    over words with Laplace smoothing, trained and applied entirely
    set-at-a-time.

    → (doc_id, n_words, logit, pred): logit = log P(pos|doc) −
    log P(neg|doc) (prior + Σ per-token log-likelihood ratios, rounded
    6dp; 0.0 for empty docs), pred = logit > 0.

    Training is two aggregations (per-(label, word) token counts →
    pivoted to one vocabulary-sized table of per-word log-likelihood
    ratios; class totals enter as a broadcast one-row aggregate).
    Scoring is ONE word-keyed join of the corpus tokens against the
    vocabulary table (Zipf skew → AQE) + a per-doc partial-aggregated
    fold; OOV tokens contribute the constant unseen-word ratio. No
    Python runs anywhere.
    """
    is_pos = F.col(label_col) == positive_label
    toks = labeled.select(is_pos.alias("pos"),
                          F.explode(words_col(F.col(text_col)))
                          .alias("w"))
    wc = (toks.groupBy("w")
          .agg(F.sum(F.when(F.col("pos"), 1).otherwise(0)).alias("cp"),
               F.sum(F.when(F.col("pos"), 0).otherwise(1)).alias("cn")))
    tot = wc.agg(F.sum("cp").alias("tp"), F.sum("cn").alias("tn"),
                 F.count(F.lit(1)).alias("v"))
    prior = (labeled.agg(
        F.log(F.sum(is_pos.cast("long")).cast("double") /
              F.sum((~is_pos).cast("long")).cast("double"))
        .alias("prior")))
    # per-word log-likelihood ratio; the totals cross-join is a
    # broadcast one-row table, so this stays one narrow projection
    llr = (wc.crossJoin(F.broadcast(tot))
           .select("w",
                   (F.log((F.col("cp") + 1).cast("double") /
                          (F.col("tp") + F.col("v") + 1).cast("double"))
                    - F.log((F.col("cn") + 1).cast("double") /
                            (F.col("tn") + F.col("v") + 1)
                            .cast("double"))).alias("llr")))
    oov = (tot.select(
        (F.log(F.lit(1.0) / (F.col("tp") + F.col("v") + 1)
               .cast("double"))
         - F.log(F.lit(1.0) / (F.col("tn") + F.col("v") + 1)
                 .cast("double"))).alias("oov")))
    scores = (corpus
              .select(id_col, F.explode(words_col(F.col(text_col)))
                      .alias("w"))
              .join(llr, "w", "left")
              .crossJoin(F.broadcast(oov))
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_words"),
                   F.sum(F.coalesce("llr", "oov")).alias("s")))
    return (corpus.select(id_col)
            .join(scores, id_col, "left")
            .crossJoin(F.broadcast(prior))
            .select(id_col,
                    F.coalesce("n_words", F.lit(0)).alias("n_words"),
                    F.round(F.coalesce(F.col("s") + F.col("prior"),
                                       F.lit(0.0)), 6).alias("logit"))
            .withColumn("pred", F.col("logit") > 0)
            .orderBy(id_col))


def oracle_sql_nb_classifier(table: str = "documents",
                             labeled: str | None = None,
                             positive: str = "pos") -> str:
    """DuckDB twin of :func:`nb_quality_classifier`. ``labeled`` is a
    relation with (doc_id, text, label)."""
    from .textops import _sql_words
    words = ("CASE WHEN trim(coalesce(text, ''))='' THEN []::varchar[] "
             "ELSE %s END" % _sql_words())
    return f"""
    WITH lab AS (SELECT label = '{positive}' AS pos, {words} AS words
                 FROM {labeled}),
    wc AS (
      SELECT w, sum(CASE WHEN pos THEN 1 ELSE 0 END)::BIGINT AS cp,
             sum(CASE WHEN pos THEN 0 ELSE 1 END)::BIGINT AS cn
      FROM (SELECT pos, unnest(words) AS w FROM lab) GROUP BY w
    ),
    tot AS (SELECT sum(cp)::BIGINT AS tp, sum(cn)::BIGINT AS tn,
                   count(*)::BIGINT AS v FROM wc),
    prior AS (
      SELECT ln(sum(CASE WHEN pos THEN 1 ELSE 0 END)::DOUBLE /
                sum(CASE WHEN pos THEN 0 ELSE 1 END)::DOUBLE) AS prior
      FROM lab
    ),
    llr AS (
      SELECT w, ln((cp + 1)::DOUBLE / (tp + v + 1)::DOUBLE)
              - ln((cn + 1)::DOUBLE / (tn + v + 1)::DOUBLE) AS llr
      FROM wc CROSS JOIN tot
    ),
    oov AS (
      SELECT ln(1.0 / (tp + v + 1)::DOUBLE)
           - ln(1.0 / (tn + v + 1)::DOUBLE) AS oov
      FROM tot
    ),
    base AS (SELECT doc_id, {words} AS words FROM {table}),
    scores AS (
      SELECT doc_id, count(*)::BIGINT AS n_words,
             sum(coalesce(llr.llr, oov.oov)) AS s
      FROM (SELECT doc_id, unnest(words) AS w FROM base) t
      LEFT JOIN llr USING (w) CROSS JOIN oov
      GROUP BY doc_id
    )
    SELECT base.doc_id,
           coalesce(n_words, 0) AS n_words,
           round(coalesce(s + prior.prior, 0.0), 6) AS logit,
           round(coalesce(s + prior.prior, 0.0), 6) > 0 AS pred
    FROM base LEFT JOIN scores USING (doc_id) CROSS JOIN prior
    ORDER BY base.doc_id
    """


# jusText-style paragraph classification (Pomikálek 2011, simplified
# to a deterministic context-free rule set): a paragraph is content
# when it is long enough, reads like prose (enough function words)
# and is not link-dominated. The stopword list is the classifier's
# broadcastable model — rendered as a literal into BOTH engines.
BOILERPLATE_STOPWORDS = (
    "the", "of", "and", "a", "to", "in", "is", "was", "it", "for",
    "on", "with", "as", "by", "that", "this", "are", "be", "at",
    "from", "or", "an", "but", "not", "we", "his", "her", "they",
    "which", "you", "had", "has", "were", "their", "its", "have")

# anchor body for link-density: same no-lazy pattern family as
# textops.ANCHOR_RE, Java-regex/RE2 shared
_A_BODY_RE = "<a [^>]*>([^<]*)</a>"
_PARA_SPLIT_RE = "\\n{2,}"
_TAG_RE = "<[^>]*>"


def boilerplate_filter(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", min_words: int = 10,
                       max_link_density: float = 0.35,
                       min_stopword_frac: float = 0.25) -> DataFrame:
    """Boilerplate removal / main-content extraction over raw page
    text — the jusText/trafilatura step every web-corpus pipeline runs
    before quality filtering. Paragraphs (blank-line separated) are
    classified content vs boilerplate by three context-free rules
    (≥ ``min_words`` tag-stripped words, stopword fraction ≥
    ``min_stopword_frac``, anchor-text share of characters ≤
    ``max_link_density``); the content paragraphs are reassembled in
    order.

    → (doc_id, n_paras, n_kept, para_keep_ratio, main_text).

    Scale notes: the whole operator is ONE narrow codegen projection —
    nested higher-order array functions (split → filter → transform →
    array_join), no explode, no shuffle, no UDF, nothing on the
    driver; the stopword list is a literal array both engines inline.
    At 100 TB this runs at scan speed and composes with the quality /
    dedup passes downstream.
    """
    stop_arr = F.array(*[F.lit(w) for w in BOILERPLATE_STOPWORDS])

    def plain(p):
        return F.trim(F.regexp_replace(p, _TAG_RE, " "))

    def words(p):
        return F.filter(F.split(plain(p), WS_SPLIT),
                        lambda w: w != "")

    def keep(p):
        ws = words(p)
        nw = F.size(ws)
        stop_cnt = F.size(F.filter(
            ws, lambda w: F.array_contains(stop_arr, F.lower(w))))
        link_chars = F.length(F.array_join(
            F.regexp_extract_all(p, F.lit(_A_BODY_RE), 1), ""))
        plain_chars = F.greatest(F.length(plain(p)), F.lit(1))
        return ((nw >= min_words) &
                (stop_cnt / nw.cast("double") >= min_stopword_frac) &
                (link_chars / plain_chars.cast("double")
                 <= max_link_density))

    paras = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")),
                _PARA_SPLIT_RE),
        lambda p: F.trim(p) != "")
    kept = F.filter(paras, keep)
    n_paras = F.size(paras)
    n_kept = F.size(kept)
    return df.select(
        F.col(id_col),
        n_paras.cast("long").alias("n_paras"),
        n_kept.cast("long").alias("n_kept"),
        F.round(n_kept /
                F.greatest(n_paras, F.lit(1)).cast("double"), 6)
         .alias("para_keep_ratio"),
        F.array_join(F.transform(kept, plain), "\n\n")
         .alias("main_text")).orderBy(id_col)


def oracle_sql_boilerplate(table: str = "documents",
                           text_expr: str = "coalesce(text, '')",
                           min_words: int = 10,
                           max_link_density: float = 0.35,
                           min_stopword_frac: float = 0.25) -> str:
    """DuckDB twin of :func:`boilerplate_filter` — the same nested
    list lambdas, patterns and double arithmetic."""
    stop = "[%s]" % ", ".join("'%s'" % w for w in BOILERPLATE_STOPWORDS)
    plain = "trim(regexp_replace(p, '{0}', ' ', 'g'))".format(_TAG_RE)
    wrds = ("list_filter(regexp_split_to_array(%s, '%s'), "
            "w -> w <> '')" % (plain, WS_SPLIT))
    keep = f"""(
      len({wrds}) >= {min_words}
      AND len(list_filter({wrds}, w -> list_contains({stop}, lower(w))))
          / len({wrds})::DOUBLE >= {min_stopword_frac}
      AND length(coalesce(array_to_string(
            regexp_extract_all(p, '{_A_BODY_RE}', 1), ''), ''))
          / greatest(length({plain}), 1)::DOUBLE <= {max_link_density})"""
    return f"""
    WITH paras AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array({text_expr},
                                               '{_PARA_SPLIT_RE}'),
                         p -> trim(p) <> '') AS ps
      FROM {table}),
    marked AS (
      SELECT doc_id, ps, list_filter(ps, p -> {keep}) AS kept
      FROM paras)
    SELECT doc_id,
           len(ps)::BIGINT AS n_paras,
           len(kept)::BIGINT AS n_kept,
           round(len(kept) / greatest(len(ps), 1)::DOUBLE, 6)
             AS para_keep_ratio,
           array_to_string(list_transform(kept,
             p -> {plain}), chr(10) || chr(10)) AS main_text
    FROM marked ORDER BY doc_id
    """
