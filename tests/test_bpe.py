"""Unit tests for llmops.text.bpe_learn / bpe_merge_once.

The registry-wide DuckDB oracle sweep (test_suite_oracle.py) already
hash-checks tx_bpe_merges end to end; these tests pin the part the
oracle can't isolate — the greedy leftmost non-overlapping merge fold —
against a pure-Python reference on adversarial run-phase inputs
("a a a a" must become ["aa","aa"], never ["aa","a","a"]), plus the
learner's tie-break determinism.
"""

from __future__ import annotations

import collections
import re

import pytest
from pyspark.sql import functions as F

from covid_19_fl_spark.llmops import text as T


def _py_merge_once(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _py_bpe(texts: list[str], k: int) -> list[tuple]:
    wc: collections.Counter = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                wc[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in wc}
    out = []
    for r in range(1, k + 1):
        pc: collections.Counter = collections.Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((r, a, b, a + b, cnt))
        seqs = {w: _py_merge_once(s, a, b) for w, s in seqs.items()}
    return out


MERGE_CASES = [
    # run-phase: greedy leftmost pairs up disjoint occurrences
    (["a", "a", "a", "a"], "a", "a", ["aa", "aa"]),
    (["a", "a", "a"], "a", "a", ["aa", "a"]),
    (["a", "a", "a", "a", "a"], "a", "a", ["aa", "aa", "a"]),
    # a just-merged token must not act as the LEFT half again
    (["a", "b", "b"], "a", "b", ["ab", "b"]),
    # ...but may act as the RIGHT half's neighbor next round only
    (["x", "a", "b", "a", "b"], "a", "b", ["x", "ab", "ab"]),
    # no match
    (["q", "r"], "a", "b", ["q", "r"]),
    # single symbol
    (["a"], "a", "a", ["a"]),
]


@pytest.mark.parametrize("seq,a,b,want", MERGE_CASES)
def test_merge_once_greedy(spark, seq, a, b, want):
    df = spark.createDataFrame([(seq,)], "seq array<string>")
    got = df.select(
        T.bpe_merge_once(F.col("seq"), F.lit(a), F.lit(b)).alias("m")
    ).collect()[0]["m"]
    assert got == want == _py_merge_once(seq, a, b)


def test_bpe_learn_matches_python_reference(spark):
    texts = [
        "aaaa aaa aa a baab abab",
        "xy xy xyz zyx aaaa",
        "low lower lowest low low newest newer new",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = sorted(tuple(r) for r in T.bpe_learn(df, "text", 5).collect())
    assert got == sorted(_py_bpe(texts, 5))


def test_bpe_learn_tiebreak_deterministic(spark):
    # every pair count ties at 1 — winner must be the lexicographically
    # smallest pair, twice in a row
    df = spark.createDataFrame([("dc ba",)], "text string")
    got = sorted(tuple(r) for r in T.bpe_learn(df, "text", 2).collect())
    assert got == sorted(_py_bpe(["dc ba"], 2))
    assert got[0][1] == "a"  # ('a','</w>') is the smallest tied pair


def test_bpe_encode_counts_match_reference(spark):
    # encode = learn + apply; check per-source token totals against the
    # Python reference end to end
    texts = [
        ("s1", "aa aa ab"),
        ("s1", "aa b"),
        ("s2", "ab ab ab aa"),
    ]
    df = spark.createDataFrame(texts, "source string, text string")
    wc: collections.Counter = collections.Counter()
    for _, t in texts:
        for w in t.split():
            wc[w] += 1
    seqs = {w: list(w) + ["</w>"] for w in wc}
    for _, a, b, _, _ in _py_bpe([t for _, t in texts], 3):
        seqs = {w: _py_merge_once(s, a, b) for w, s in seqs.items()}
    want = {}
    for src in ("s1", "s2"):
        ws = [w for s, t in texts if s == src for w in t.split()]
        n_docs = sum(1 for s, _ in texts if s == src)
        bpe = sum(len(seqs[w]) for w in ws)
        want[src] = (n_docs, len(ws), bpe, round(bpe / len(ws), 6))

    from covid_19_fl_spark import suite_r6

    old = suite_r6._BPE_K
    try:
        suite_r6._BPE_K = 3  # small k for the tiny corpus
        import covid_19_fl_spark.suite as suite

        # drive the registered callable against a temp parquet dir
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            df.write.parquet(os.path.join(d, "documents.parquet"))
            got = {
                r["source"]: (
                    r["n_docs"],
                    r["ws_tokens"],
                    r["bpe_tokens"],
                    r["tokens_per_word"],
                )
                for r in suite.QUERIES["tx_bpe_encode"](spark, d).collect()
            }
    finally:
        suite_r6._BPE_K = old
    assert got == want
