"""BPE tokenizer training and encoding over a distributed corpus.

Extends the single-statistic ``textops.bpe_pair_counts`` (the first
merge decision) to the full public algorithm (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"): learn
``num_merges`` merge rules from corpus word frequencies, then encode
the corpus with them. The reference has no tokenizer; this is part of
the training-data-pipeline extension surface (task brief), shaped the
way production tokenizer trainers work (HuggingFace ``tokenizers``
trains from a word-frequency table, not from raw text).

Scale shape (the 100 TB story):

- The corpus crosses the wire ONCE, as a word census — explode +
  groupBy(word) with map-side partial aggregation; web-text Zipf means
  the distinct vocabulary is orders of magnitude smaller than the
  corpus.
- The census is capped deterministically (min_count floor, then the
  top ``max_vocab`` by (count desc, utf8-bytes asc) — byte order ==
  code-point order in BOTH engines, unlike Java's UTF-16 comparator)
  and the merge loop runs on the driver over that capped table: the
  same bounded-driver-train pattern as IVF (operators/similarity.py).
  The loop is O(max_vocab · num_merges · avg_word_len) — independent
  of corpus size.
- Encoding again touches only the DISTINCT vocabulary inside Arrow
  (each word encodes once, weighted by its count); the token census is
  one more small shuffle keyed by token. Documents never re-cross into
  Python.

Correctness: the kernels (``learn_merges`` / ``encode_word``) are pure
functions shared by the Spark path and the single-threaded pandas twin
(annoracle scheme — cache keyed by input + kernel bytes), so the
driver comparison checks the distributed census/broadcast/explode
plumbing bit-for-bit; algorithm semantics are pinned by pytest goldens
(hand-traced merges on a toy corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .textops import py_words, words_col

END = "</w>"   # end-of-word marker, per the public algorithm


# ------------------------------------------------------- pure kernels

def learn_merges(word_counts, num_merges: int):
    """Classic BPE training loop over a (word, count) table.

    Each word is a symbol sequence (characters + trailing ``</w>``).
    Per round: count adjacent symbol pairs weighted by word frequency,
    merge the argmax pair everywhere. Deterministic tiebreak:
    (count desc, (left, right) lexicographic asc). Stops early when no
    pair occurs twice. → list of (left, right) in merge order.
    """
    vocab = [(tuple(w) + (END,), int(n)) for w, n in word_counts if w]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab:
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merged = a + b
        out = []
        for syms, n in vocab:
            i, acc = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    acc.append(merged)
                    i += 2
                else:
                    acc.append(syms[i])
                    i += 1
            out.append((tuple(acc), n))
        vocab = out
        merges.append((a, b))
    return merges


def encode_word(word: str, ranks: dict) -> list:
    """Encode one word with trained merges: repeatedly apply the
    lowest-rank applicable merge (the public greedy encoder)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


# --------------------------------------------------------- Spark path

def _word_census(df: DataFrame, text_col: str) -> DataFrame:
    return (df.select(F.explode(words_col(F.col(text_col)))
                      .alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("n")))


def _capped_vocab(wc: DataFrame, min_count: int, max_vocab: int):
    """Deterministic driver-side vocabulary: the utf8-bytes tiebreak
    keeps Spark's TakeOrdered and the pandas twin identical even on
    non-BMP words (Java strings order by UTF-16 code units)."""
    rows = (wc.where(F.col("n") >= min_count)
            .orderBy(F.desc("n"), F.asc(F.encode(F.col("word"), "utf-8")))
            .limit(max_vocab)
            .collect())
    return [(r["word"], r["n"]) for r in rows]


def bpe_train(df: DataFrame, num_merges: int = 60, min_count: int = 2,
              max_vocab: int = 10_000,
              text_col: str = "text") -> DataFrame:
    """→ (merge_rank int, lhs, rhs): the learned merge table, in merge
    order. One corpus shuffle (word census); the loop runs on the
    driver over the capped vocabulary (see module docstring)."""
    wc = _word_census(df, text_col)
    merges = learn_merges(_capped_vocab(wc, min_count, max_vocab),
                          num_merges)
    spark = df.sparkSession
    if not merges:
        return spark.createDataFrame(
            [], "merge_rank int, lhs string, rhs string")
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string")


def bpe_token_census(df: DataFrame, num_merges: int = 60,
                     min_count: int = 2, max_vocab: int = 10_000,
                     k: int = 200, text_col: str = "text") -> DataFrame:
    """Train (as :func:`bpe_train`), then encode the corpus and return
    the top-``k`` (token, token_count, vocab_occurrences) census —
    token_count = Σ word-frequency × occurrences-in-word,
    vocab_occurrences = the token's occurrences across the DISTINCT
    word vocabulary (unweighted).

    The encode stage maps over the DISTINCT word census (Arrow batch;
    merge ranks travel in the closure — a few KiB), so corpus text
    never re-enters Python; the final census is one token-keyed
    shuffle with map-side combine.
    """
    import pandas as pd

    from .util import ensure_parallelism

    wc = _word_census(df, text_col)
    merges = learn_merges(_capped_vocab(wc, min_count, max_vocab),
                          num_merges)
    ranks = {p: i for i, p in enumerate(merges)}

    def run(batches):
        for pdf in batches:
            toks, ns = [], []
            for w, n in zip(pdf["word"], pdf["n"]):
                for t in encode_word(w, ranks):
                    toks.append(t)
                    ns.append(n)
            yield pd.DataFrame({"token": toks,
                                "n": pd.array(ns, dtype="int64")})

    ex = ensure_parallelism(wc).mapInPandas(run, "token string, n long")
    # utf8-bytes tiebreak at the LIMIT boundary, same reason as
    # _capped_vocab (Java UTF-16 vs code-point string order)
    return (ex.groupBy("token")
            .agg(F.sum("n").alias("token_count"),
                 F.count(F.lit(1)).alias("vocab_occurrences"))
            .orderBy(F.desc("token_count"),
                     F.asc(F.encode(F.col("token"), "utf-8")))
            .limit(k))


# ------------------------------------------------- single-thread twin

def train_twin(sf_dir: str, num_merges: int = 60, min_count: int = 2,
               max_vocab: int = 10_000):
    """Pandas rerun of :func:`bpe_train` over documents.parquet —
    same kernels, same census, same cap rule."""
    import os

    import pandas as pd
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    counts: dict[str, int] = {}
    for t in docs["text"]:
        for w in py_words(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(
        ((w, n) for w, n in counts.items() if n >= min_count),
        key=lambda kv: (-kv[1], kv[0].encode("utf-8")))[:max_vocab]
    merges = learn_merges(vocab, num_merges)
    return pd.DataFrame({
        "merge_rank": pd.array(range(len(merges)), dtype="int32"),
        "lhs": [a for a, _ in merges],
        "rhs": [b for _, b in merges]})


def census_twin(sf_dir: str, num_merges: int = 60, min_count: int = 2,
                max_vocab: int = 10_000, k: int = 200):
    """Pandas rerun of :func:`bpe_token_census`."""
    import os

    import pandas as pd
    docs = pd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["text"])
    counts: dict[str, int] = {}
    for t in docs["text"]:
        for w in py_words(t):
            counts[w] = counts.get(w, 0) + 1
    vocab = sorted(
        ((w, n) for w, n in counts.items() if n >= min_count),
        key=lambda kv: (-kv[1], kv[0].encode("utf-8")))[:max_vocab]
    ranks = {p: i for i, p in enumerate(learn_merges(vocab, num_merges))}
    tok_n: dict[str, int] = {}
    tok_w: dict[str, int] = {}
    for w, n in counts.items():
        for t in encode_word(w, ranks):
            tok_n[t] = tok_n.get(t, 0) + n
            tok_w[t] = tok_w.get(t, 0) + 1
    rows = sorted(tok_n.items(),
                  key=lambda kv: (-kv[1], kv[0].encode("utf-8")))[:k]
    return pd.DataFrame({
        "token": [t for t, _ in rows],
        "token_count": pd.array([n for _, n in rows], dtype="int64"),
        "vocab_occurrences": pd.array([tok_w[t] for t, _ in rows],
                                      dtype="int64")})
