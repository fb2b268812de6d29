"""Round-5 suite additions, batch H: keyphrase extraction.

- ``tx_rake_keyphrases`` — RAKE (Rapid Automatic Keyword Extraction)
  over the English documents: candidate phrases are maximal
  stopword-delimited token runs, each word scores degree/frequency
  over the phrase corpus, and a phrase scores the sum of its word
  scores — the classic unsupervised keyphrase extractor, completing
  the text family (TF-IDF ranks single terms; RAKE surfaces
  multi-word phrases).

Determinism discipline unchanged: integer degree/frequency counts
across every shuffle, the per-phrase score sum as an ordered
left-to-right fold (≤ 3 terms), deterministic top-k tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .llmops.text import STOPWORDS, words
from .suite import _t, query

_RAKE_MAX_LEN = 3  # standard RAKE phrase-length cap
_RAKE_K = 15

_SW = STOPWORDS["en"]
_SW_SQL = ", ".join(f"'{w}'" for w in _SW)


@query(
    "tx_rake_keyphrases",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, t.tok, t.pos
      FROM documents,
           LATERAL (
             SELECT unnest(regexp_split_to_array(trim(text), '\\s+'))
                      AS tok,
                    generate_subscripts(
                      regexp_split_to_array(trim(text), '\\s+'), 1)
                      AS pos
           ) t
      WHERE lang = 'en'
    ), grouped AS (
      SELECT doc_id, tok, pos,
             tok IN ({_SW_SQL}) AS is_stop,
             CAST(SUM(CASE WHEN tok IN ({_SW_SQL}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS grp
      FROM toks
    ), phrases AS (
      SELECT doc_id, grp,
             string_agg(tok, ' ' ORDER BY pos) AS phrase,
             list(tok ORDER BY pos) AS ws,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM grouped WHERE NOT is_stop
      GROUP BY 1, 2
    ), kept AS (
      SELECT * FROM phrases WHERE plen <= {_RAKE_MAX_LEN}
    ), wstats AS (
      SELECT w AS word,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM kept, LATERAL (SELECT unnest(ws) AS w) u
      GROUP BY 1
    ), ptypes AS (
      SELECT phrase, ANY_VALUE(ws) AS ws,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM kept GROUP BY 1
    ), pw AS (
      SELECT p.phrase, p.n_occurrences, u.wpos, u.w
      FROM ptypes p, LATERAL (
        SELECT unnest(ws) AS w, generate_subscripts(ws, 1) AS wpos
      ) u
    ), folded AS (
      SELECT pw.phrase, pw.n_occurrences,
             list(CAST(s.deg AS DOUBLE) / s.freq ORDER BY pw.wpos) AS sws
      FROM pw JOIN wstats s ON s.word = pw.w
      GROUP BY 1, 2
    ), scored AS (
      SELECT phrase, n_occurrences,
             list_reduce(list_prepend(CAST(0 AS DOUBLE), sws),
                         (acc, x) -> acc + x) AS score
      FROM folded
    )
    SELECT phrase, n_occurrences, ROUND(score, 6) AS rake_score
    FROM scored
    ORDER BY score DESC, n_occurrences DESC, phrase ASC
    LIMIT {_RAKE_K}
    """,
)
def tx_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyphrase extraction over the English corpus: candidate
    phrases are the maximal stopword-delimited token runs (length ≤ 3,
    the standard cap), each word's salience is degree/frequency over
    the phrase corpus (degree = Σ lengths of phrases it appears in —
    co-occurrence reach; frequency = raw occurrences), and a phrase
    scores the sum of its words' saliences. The classic unsupervised
    multi-word keyphrase extractor (Rose et al. 2010), next to TF-IDF
    (single terms) and PMI collocations (2-grams only).

    Plan shape: one posexplode of the token arrays, the stopword
    run-splitting as a per-DOC running count (window partitioned by
    doc — never global), two map-combinable aggregates for word stats
    and phrase types, one broadcast-able word-stats join back. Scale:
    everything after the scan is vocabulary- or phrase-type-sized.
    Exactness: degree/freq are exact BIGINT; the per-phrase score sum
    folds left-to-right over ≤ 3 identical IEEE quotients on both
    engines; top-15 ties break (score, n, phrase)."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    toks = docs.select(
        "doc_id", F.posexplode(words(F.col("text"))).alias("pos", "tok")
    )
    is_stop = F.col("tok").isin(*_SW)
    wdoc = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    grouped = toks.select(
        "doc_id",
        "tok",
        "pos",
        is_stop.alias("is_stop"),
        F.sum(F.when(is_stop, 1).otherwise(0)).over(wdoc).cast("long").alias("grp"),
    )
    phrases = (
        grouped.filter(~F.col("is_stop"))
        .groupBy("doc_id", "grp")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "tok"))).alias("pw"),
            F.count("*").cast("long").alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
        .select(
            "doc_id",
            "grp",
            "plen",
            F.transform(F.col("pw"), lambda s: s["tok"]).alias("ws"),
        )
        .withColumn("phrase", F.concat_ws(" ", F.col("ws")))
    )
    wstats = (
        phrases.select(F.explode("ws").alias("word"), "plen")
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .withColumn("wscore", F.col("deg").cast("double") / F.col("freq"))
    )
    ptypes = phrases.groupBy("phrase").agg(
        F.any_value(F.col("ws")).alias("ws"),
        F.count("*").cast("long").alias("n_occurrences"),
    )
    # per-phrase word scores in POSITION order, then a left fold — the
    # ordered-fold recipe so the ≤3-term double sum matches the oracle
    pw = ptypes.select(
        "phrase", "n_occurrences", F.posexplode("ws").alias("wpos", "word")
    ).join(F.broadcast(wstats.select("word", "wscore")), "word")
    folded = pw.groupBy("phrase", "n_occurrences").agg(
        F.array_sort(F.collect_list(F.struct("wpos", "wscore"))).alias("sws")
    )
    score = F.aggregate(
        F.transform(F.col("sws"), lambda s: s["wscore"]),
        F.lit(0.0).cast("double"),
        lambda acc, x: acc + x,
    )
    return (
        folded.select(
            "phrase",
            "n_occurrences",
            score.alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("n_occurrences").desc(), F.col("phrase").asc())
        .limit(_RAKE_K)
        .select("phrase", "n_occurrences", F.round("score", 6).alias("rake_score"))
    )
