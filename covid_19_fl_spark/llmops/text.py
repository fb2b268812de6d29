"""Text analysis for training-data pipelines (SURVEY §2.13):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — at 100 TB these run
inside the parquet scan stage with zero shuffles and zero Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists — the n-gram-heuristic language
# identifier. Deterministic and oracle-expressible; accuracy is bounded
# by design (a real pipeline would swap in fastText behind the same
# column contract).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "de", "que", "pour"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "也"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the GPT-2-style split without the merges table.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_PATTERN = r"[,.!?;:]"


def words(col: Column) -> Column:
    """Whitespace tokenization (collapses runs)."""
    return F.split(F.trim(col), r"\s+")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_ish_count(col: Column) -> Column:
    """BPE-style pre-token count via regex extraction."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def stopword_hits(col: Column, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (non-distinct)."""
    vocab = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words(col), lambda w: F.array_contains(vocab, w)))


def language_id(col: Column) -> Column:
    """Argmax of per-language stopword-hit scores.

    Tie-break is the declared language priority (alphabetical via the
    CASE chain order): the first language whose score is >= all
    others wins — deterministic, and mirrored verbatim in oracle SQL.
    """
    langs = sorted(STOPWORDS)
    scores = {lang: stopword_hits(col, lang) for lang in langs}
    expr = None
    for lang in langs:
        others = [scores[o] for o in langs if o != lang]
        cond = scores[lang] >= F.greatest(*others)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def punct_count(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(PUNCT_PATTERN), F.lit(0)))


def quality_score(col: Column) -> Column:
    """Heuristic quality in [0,1]: stopword density + length credit −
    punctuation noise. The exact formula is arbitrary; what matters is
    that it is deterministic, cheap, and columnar."""
    n_words = token_count(col).cast("double")
    stop_ratio = stopword_hits(col, "en").cast("double") / n_words
    punct_ratio = punct_count(col).cast("double") / n_words
    length_credit = F.least(n_words / F.lit(100.0), F.lit(1.0))
    return F.round(
        F.lit(0.4) * stop_ratio + F.lit(0.4) * length_credit + F.lit(0.2) * (1 - punct_ratio),
        6,
    )


# PII scrub patterns, applied in order (email before phone before bare
# digit runs, so an email's digits are consumed by the email rule).
# RE2-compatible (no backrefs/lookarounds) so the same pattern strings
# run verbatim on Spark (Java regex) and DuckDB (RE2) for the oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\-. ]{7,}[0-9]", "<PHONE>"),
    (r"[0-9]+", "<NUM>"),
]


def redact_pii(col: Column) -> Column:
    """Chained regexp_replace PII scrub (emails, phone-shaped runs,
    bare digit runs). Pure codegen'd string expressions — at 100 TB
    this runs inside the scan stage; no UDF, no shuffle."""
    out = col
    for pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_hit_count(col: Column) -> Column:
    """Count of PII matches the scrub would redact, same rule order
    (each rule counts on the text left by the previous rules)."""
    total = F.lit(0)
    cur = col
    for pat, token in PII_PATTERNS:
        total = total + F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return total


def bigrams(col: Column) -> Column:
    """Adjacent word bigrams as ``"w1 w2"`` strings (empty array for
    single-word docs). Pure array HOFs — ``zip_with`` over two shifted
    slices — so the whole thing codegens inside the scan stage."""
    ws = words(col)
    n = F.size(ws)
    return F.when(
        n > 1,
        F.zip_with(
            F.slice(ws, F.lit(1), n - 1),
            F.slice(ws, F.lit(2), n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_scores(col: Column) -> list[Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), the
    standard filter for loop-generated / boilerplate text:

    - ``dup_word_frac``: 1 − distinct/total words;
    - ``dup_bigram_frac``: 1 − distinct/total adjacent bigrams;
    - ``top_word_frac``: share of the single most frequent word.

    All per-row array HOFs (no explode, no shuffle): at 100 TB these
    are scan-stage expressions like quality_score, and the quadratic
    top-word pass is bounded by document length, not corpus size."""
    ws = words(col)
    n = F.size(ws).cast("double")
    bg = bigrams(col)
    n_bg = F.size(bg).cast("double")
    dup_word = F.round(F.lit(1.0) - F.size(F.array_distinct(ws)) / n, 6)
    dup_bigram = F.round(
        F.when(n_bg > 0, F.lit(1.0) - F.size(F.array_distinct(bg)) / n_bg).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    top_count = F.array_max(
        F.transform(
            F.array_distinct(ws), lambda w: F.size(F.filter(ws, lambda x: x == w))
        )
    )
    top_word = F.round(top_count / n, 6)
    return [
        dup_word.alias("dup_word_frac"),
        dup_bigram.alias("dup_bigram_frac"),
        top_word.alias("top_word_frac"),
    ]


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: md5 of the whitespace-collapsed,
    trimmed, lower-cased text — the exact-dedup key.

    Collapse BEFORE trim: ``trim`` strips only ASCII spaces, so a
    tab/newline-only document would otherwise canonicalize to " " and
    fingerprint differently from the empty document (found by
    tests/test_degenerate_inputs.py)."""
    return F.md5(F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))))


def chunk_spans(
    df, text_col: str, id_col: str, size: int = 32, stride: int = 24
):
    """Fixed-size token chunking with overlap — the pretraining
    chunker. Emits one row per (doc, chunk): chunk index, 1-based
    start-token position, actual token count (final chunk may be
    short), and the chunk text.

    Pure per-row higher-order expressions: sequence → transform →
    explode, all inside the scan stage (the explode fans rows out
    ~n_tokens/stride× but never shuffles). ``stride < size`` gives
    overlapping chunks; the chunk count is 1 + ceil((n-size)/stride)
    clamped at 1, which covers every token and never emits an empty
    trailing chunk.
    """
    # Materialize the token array as a real column first (round 10):
    # the chunk HOF's lambda slices it twice per chunk, and an inlined
    # ``words(text)`` expression re-runs the regex split at every
    # reference (HOFs have no common-subexpression elimination — the
    # word_shingles let-binding lesson), making chunking O(chunks ×
    # split) per document instead of one split.
    base = df.select(F.col(id_col), words(F.col(text_col)).alias("_w"))
    w = F.col("_w")
    n = F.size(w)
    n_chunks = F.lit(1) + F.greatest(
        F.ceil((n - F.lit(size)) / F.lit(float(stride))), F.lit(0)
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    chunks = F.transform(
        starts,
        lambda i: F.struct(
            i.alias("chunk_idx"),
            (i * stride + 1).alias("start_tok"),
            F.size(F.slice(w, i * stride + 1, size)).alias("n_tok"),
            F.array_join(F.slice(w, i * stride + 1, size), " ").alias("chunk_text"),
        ),
    )
    return base.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_idx").cast("int").alias("chunk_idx"),
        F.col("c.start_tok").cast("int").alias("start_tok"),
        F.col("c.n_tok").alias("n_tok"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def inverted_index(
    df,
    text_col: str,
    id_col: str,
    min_df: int = 1,
    max_postings: int | None = None,
) -> "DataFrame":
    """Build an inverted index: one row per distinct lowercased term
    with its document frequency and the sorted posting list of doc
    ids — the retrieval-side twin of the TF-IDF pass.

    Plan shape: tokenize → ``array_distinct`` (per-doc dedup before the
    fan-out, so a term never leaves the scan stage more than once per
    doc) → explode → one shuffle on the term for the groupBy. At 100 TB
    the hazard is the head of the Zipf curve: a stopword's posting list
    is O(corpus) and would OOM a single reducer, so ``max_postings``
    truncates each list to the smallest-id prefix while ``doc_freq``
    stays exact — the standard impact-ordered-index compromise; a full
    index would instead range-bucket (term, doc_id) into segment files.
    ``min_df`` drops hapax terms post-agg (HAVING, not a second pass).
    """
    postings = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.array_distinct(words(F.lower(F.col(text_col))))).alias("term"),
    )
    agg = postings.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sort_array(F.collect_list("_doc")).alias("postings"),
    )
    if max_postings is not None:
        agg = agg.withColumn("postings", F.slice("postings", 1, max_postings))
    return agg.filter(F.col("doc_freq") >= min_df)


def unigram_logprob(df, text_col: str, id_col: str) -> "DataFrame":
    """Per-document mean unigram log-probability under the corpus's own
    unigram distribution — the KenLM-style perplexity-proxy quality
    signal (low mean log-prob ⇒ unusual/garbled text), with the n-gram
    LM swapped for its unigram reduction so the whole thing stays
    relational and oracle-checkable.

    Scale shape: tokenize-explode → groupBy(term) builds the vocab
    counts (one shuffle, map-side partial agg carries the Zipf head);
    the vocab is O(distinct terms) ≪ corpus, so it broadcasts back to
    the exploded stream, and the per-doc AVG reduces with partial aggs
    on doc_id (second shuffle). No Python, no driver materialization.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words(F.lower(F.col(text_col)))).alias("term"),
    )
    vocab = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    return (
        toks.join(F.broadcast(vocab), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("t"))), 6).alias("avg_logprob"),
        )
    )


def bm25_topk(
    df,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> "DataFrame":
    """BM25 retrieval: score every document against a bag of query
    terms and return the global top-k — the lexical ranker that pairs
    with the embedding-cosine ANN path (hybrid retrieval).

    Scale shape: per-term tf and the doc length are per-row
    higher-order expressions (no tokenize-explode shuffle over the
    corpus — only docs matching ≥1 query term leave the scan stage,
    and at most |q| rows each). Per-term document frequencies reduce
    to |q| rows and broadcast back; corpus totals (N, avgdl) ride a
    1-row broadcast. The final top-k is orderBy+limit on a strict
    total order (score rounded to 6dp, doc_id tiebreak), which
    Catalyst compiles to TakeOrderedAndProject — per-partition heaps
    + driver merge, never a global sort.
    """
    q = F.array(*[F.lit(t) for t in query_terms])
    # Token array materialized once per row (round 10): the per-term
    # lambda filters it |q| times, and an inlined ``words(lower(text))``
    # expression re-runs the regex split at every reference inside a
    # HOF (no common-subexpression elimination) — |q|+1 splits per doc.
    tok = df.select(
        F.col(id_col).alias("doc_id"),
        words(F.lower(F.col(text_col))).alias("_w"),
    )
    w = F.col("_w")
    per_term = F.filter(
        F.transform(
            q,
            lambda t: F.struct(
                t.alias("term"),
                F.size(F.filter(w, lambda x: x == t)).alias("tf"),
            ),
        ),
        lambda s: s["tf"] > 0,
    )
    base = tok.select(
        "doc_id",
        F.size(w).alias("dl"),
        F.explode(per_term).alias("m"),
    ).select("doc_id", "dl", F.col("m.term").alias("term"), F.col("m.tf").alias("tf"))

    stats = base.groupBy("term").agg(F.count("*").alias("df_t"))
    totals = df.select(F.size(words(F.lower(F.col(text_col)))).alias("_dl")).agg(
        F.count("*").alias("n_docs"), F.avg("_dl").alias("avgdl")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df_t") + F.lit(0.5)) / (F.col("df_t") + F.lit(0.5))
    )
    term_score = idf * (
        F.col("tf")
        * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        base.join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term_score), 6).alias("bm25"),
            F.count("*").alias("n_terms_hit"),
        )
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(k)


def boilerplate_ngram_stats(
    df,
    text_col: str,
    id_col: str,
    n: int = 5,
    min_docs: int = 3,
) -> "DataFrame":
    """C4/RefinedWeb-style corpus-level boilerplate detection: the
    fraction of each document's n-gram positions whose n-gram also
    appears in ≥ ``min_docs`` distinct documents (navboxes, license
    headers, templated spam — the spans C4 removes by exact-span
    lookup; the reference has no corpus-level operator, this extends
    cv.py's per-row dedup idiom to span granularity).

    Plan shape (two passes over the same scan-stage gram arrays):
    1. document frequency per gram — per-doc-distinct shingle hashes
       (``dedup.hashed_word_shingles``, so a gram crosses the exchange
       at most once per doc) → one partial-agg shuffle on the gram;
    2. coverage — positional gram hashes (``dedup.hashed_word_grams``)
       explode → left join against the df ≥ min_docs gram set → per-doc
       count shuffle.
    At 100 TB the boilerplate set is tiny relative to the gram universe
    (Zipf head), so AQE turns the probe join into a broadcast; the only
    O(tokens) shuffle is the document-frequency agg, which is map-side
    combinable. Gram identity is the engine-portable Horner hash over
    md5 token hashes (dedup.SHINGLE_BASE/PORTABLE_PRIME), so the DuckDB
    oracle reproduces identical gram keys.

    Short docs (< n tokens) have zero gram positions and report
    ``boiler_frac = 0.0``.
    """
    from . import dedup

    ids = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    dfreq = (
        ids.select("doc_id", F.explode(dedup.hashed_word_shingles(F.col("_t"), n)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("df"))
    )
    boiler = dfreq.filter(F.col("df") >= min_docs).select("g", F.lit(1).alias("_b"))
    pos = ids.select("doc_id", F.explode(dedup.hashed_word_grams(F.col("_t"), n)).alias("g"))
    cov = (
        pos.join(boiler, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("bigint").alias("n_boiler"),
        )
    )
    return (
        ids.select("doc_id")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce(F.col("n_boiler"), F.lit(0).cast("bigint")).alias("n_boiler"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.round(F.col("n_boiler") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("boiler_frac"),
        )
    )


def bigram_logprob(df, text_col: str, id_col: str) -> "DataFrame":
    """Per-document mean bigram conditional log-probability under the
    corpus's own bigram LM — the 2-gram refinement of unigram_logprob's
    perplexity proxy:  mean over positions of ln P(w2|w1), with
    P(w2|w1) = c(w1 w2) / c(w1 ·) and c(w1 ·) summed over observed
    bigram starts (so every in-corpus bigram has positive probability —
    no smoothing needed for a self-scored corpus).

    Scale shape: bigram arrays build in the scan stage (zip_with over
    shifted slices, no self-join) → explode → groupBy(bigram) counts
    (the one O(tokens) shuffle); prefix totals derive from the bigram
    counts, never from a second corpus pass. Both count tables are
    O(vocab²-observed) ≪ corpus and join back on their keys (AQE
    broadcasts when they fit). Docs with < 2 tokens have no bigram
    positions and are reported with n_bigrams=0, null avg_logprob.
    """
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(bigrams(F.lower(F.col(text_col)))).alias("bg"),
    )
    bg_counts = base.groupBy("bg").agg(F.count("*").alias("c_bg"))
    prefix_counts = bg_counts.groupBy(
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("c_bg").alias("c_w1"))
    scored = (
        base.join(bg_counts, "bg")
        .join(
            prefix_counts,
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)) == F.col("w1"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("c_bg") / F.col("c_w1"))), 6).alias(
                "avg_logprob"
            ),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("bigint")).alias("n_bigrams"),
            "avg_logprob",
        )
    )


def contamination_stats(
    df,
    text_col: str,
    id_col: str,
    is_bench,
    n: int = 5,
    flag_pct: int = 20,
) -> "DataFrame":
    """Benchmark-contamination audit: for every NON-benchmark document,
    the fraction of its word n-gram positions whose n-gram also occurs
    anywhere in the benchmark partition (``is_bench`` rows) — the
    decontamination check every eval-aware training pipeline runs
    before a corpus ships (the reference has no corpus-level operator;
    this extends cv.py's per-row membership idiom to span granularity,
    same family as boilerplate_ngram_stats).

    Plan shape: benchmark grams are per-doc-distinct shingle hashes
    globally deduped (one small agg — the benchmark is tiny relative
    to the corpus by construction), then probed by the training side's
    positional grams via a left join; at 100 TB AQE broadcasts the
    benchmark gram set and the only O(tokens) work is the scan-stage
    gram evaluation plus one per-doc count shuffle. Gram identity is
    the engine-portable Horner hash (dedup.SHINGLE_BASE mod
    PORTABLE_PRIME over md5 token hashes), so a DuckDB oracle
    reproduces identical keys.

    The contaminated flag uses the integer cross-multiplication
    ``n_contam·100 ≥ n_grams·flag_pct`` — no float share ever decides
    the boundary. Docs shorter than ``n`` tokens have zero gram
    positions: frac 0.0, never flagged.
    """
    from . import dedup

    ids = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
        is_bench.alias("_b"),
    )
    bench_grams = (
        ids.filter(F.col("_b"))
        .select(F.explode(dedup.hashed_word_shingles(F.col("_t"), n)).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    pos = ids.filter(~F.col("_b")).select(
        "doc_id", F.explode(dedup.hashed_word_grams(F.col("_t"), n)).alias("g")
    )
    cov = (
        pos.join(bench_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("bigint").alias("n_contam"),
        )
    )
    return (
        ids.filter(~F.col("_b"))
        .select("doc_id")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("bigint")).alias("n_grams"),
            F.coalesce(F.col("n_contam"), F.lit(0).cast("bigint")).alias("n_contam"),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.round(F.col("n_contam") / F.col("n_grams"), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("contam_frac"),
            (
                (F.coalesce(F.col("n_grams"), F.lit(0)) > 0)
                & (
                    F.coalesce(F.col("n_contam"), F.lit(0)) * 100
                    >= F.coalesce(F.col("n_grams"), F.lit(0)) * flag_pct
                )
            ).alias("contaminated"),
        )
    )


def bpe_merge_once(seq: Column, left: Column, right: Column) -> Column:
    """Apply ONE learned BPE merge (``left``,``right``) to a symbol
    sequence with the standard greedy leftmost non-overlapping rule —
    in "a a a a" merging ("a","a") yields ["aa","aa"], never
    ["aa","a","a"] or a re-merge of a just-created token.

    Pure ``F.aggregate`` fold over the array — JVM-side, codegen'd,
    zero shuffle, zero Python: the state struct carries the rewritten
    prefix plus a just-merged flag so a token created by this round
    can never act as the LEFT half of another merge in the same round
    (that is exactly the non-overlap rule)."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(False).alias("lm"),
    )

    def step(acc: Column, s: Column) -> Column:
        out, lm = acc.getField("out"), acc.getField("lm")
        can = (
            (~lm)
            & (F.size(out) > 0)
            & (F.element_at(out, -1) == left)
            & (s == right)
        )
        merged = F.concat(
            F.slice(out, 1, F.size(out) - 1),
            F.array(F.concat(left, right)),
        )
        return F.when(
            can,
            F.struct(merged.alias("out"), F.lit(True).alias("lm")),
        ).otherwise(
            F.struct(
                F.concat(out, F.array(s)).alias("out"),
                F.lit(False).alias("lm"),
            )
        )

    return F.aggregate(seq, init, step, lambda acc: acc.getField("out"))


def bpe_learn(docs, text_col: str, k: int) -> "DataFrame":
    """Learn the first ``k`` BPE merges of a tokenizer over a corpus,
    distributed (Sennrich et al. 2016, the algorithm behind GPT-2/LLaMA
    vocabularies).

    Returns one row per learned merge: (merge_rank, left_sym,
    right_sym, merged, pair_count).

    Scale shape — the part that matters at 100 TB:
      * the CORPUS is touched exactly once: whitespace-split + explode
        into a word-frequency table (one map-combined shuffle keyed by
        word). Everything after runs on the VOCABULARY (distinct
        words), which is bounded (~10M entries for web-scale text)
        regardless of corpus size.
      * each round is: one vocab-sized adjacent-pair explode +
        map-combined sum, a single TakeOrdered(1) for the winning pair
        (ties broken count DESC, then pair ASC — deterministic), a
        broadcast of that 1-row pair, and a narrow `bpe_merge_once`
        fold rewriting the sequences. No round ever shuffles the
        corpus.
      * `localCheckpoint(eager=False)` truncates lineage per round
        (the x_sssp_weighted recipe) so round r doesn't recompute
        rounds 1..r-1 for every action on the final union.

    Words are char-split with a trailing '</w>' end-of-word marker
    (multi-char, cannot collide with any single character), so merges
    distinguish word-final from word-internal pairs exactly as the
    published algorithm does."""
    words_df = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    seqs = words_df.select(
        "c",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ),
            F.array(F.lit("</w>")),
        ).alias("seq"),
    )
    merges = []
    for r in range(1, k + 1):
        # a fully-merged word (one symbol left) has no adjacent pairs —
        # and must be EXCLUDED before sequence(1, size-1): Spark's
        # sequence() silently DESCENDS on an empty range ([1,0]), and
        # element_at(seq, 2) on a 1-element array throws.
        pairs = seqs.filter(F.size("seq") >= 2).select(
            "c",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("seq") - 1),
                    lambda i: F.struct(
                        F.element_at("seq", i).alias("a"),
                        F.element_at("seq", i + 1).alias("b"),
                    ),
                )
            ).alias("p"),
        )
        pc = pairs.groupBy(
            F.col("p.a").alias("a"), F.col("p.b").alias("b")
        ).agg(F.sum("c").alias("w"))
        # The 1-row winner is referenced TWICE — as the broadcast pair
        # rewriting the sequences AND as the round's output branch in
        # the final union. Checkpointing it (round 10) shares the
        # vocab-sized pair explode + aggregation between the two
        # consumers instead of running it twice per round.
        top = (
            pc.orderBy(F.desc("w"), F.asc("a"), F.asc("b"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        merges.append(
            top.select(
                F.lit(r).cast("long").alias("merge_rank"),
                F.col("a").alias("left_sym"),
                F.col("b").alias("right_sym"),
                F.concat("a", "b").alias("merged"),
                F.col("w").cast("long").alias("pair_count"),
            )
        )
        seqs = (
            seqs.crossJoin(
                F.broadcast(
                    top.select(
                        F.col("a").alias("__ma"), F.col("b").alias("__mb")
                    )
                )
            )
            .select(
                "c",
                bpe_merge_once(
                    F.col("seq"), F.col("__ma"), F.col("__mb")
                ).alias("seq"),
            )
            .localCheckpoint(eager=False)
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out
