"""Dup-dense oracle checks for the class-collapsed capped similarity
twins (suite_r6).

The driver corpora at sf0.001/sf0.01 contain NO duplicate texts (500
docs, 500 distinct), so the within-class branch of
``dd_jaccard_topm_join`` / ``dd_edit_topm_join`` — the whole point of
the class-collapse re-plan — would never execute under the driver's
own gate. These tests synthesize a replica-dense corpus (classes of
identical texts sized 1/2/4/6, plus cross-class near-duplicates that
qualify under both metrics) and run the SAME query-vs-DuckDB-oracle
comparison the driver runs, so the class decomposition, the
within/cross rank merge, and the m+1-slice truncation are all
hash-proven on data that actually exercises them.
"""

from __future__ import annotations

import os

import pytest

from covid_19_fl_spark import suite

from .oracle import compare

# Ten-token bases (mirrors the corpus's >=10-token invariant; 3-gram
# shingle sets are never empty). The first 24 chars of A/B/C differ by
# exactly one substitution ("alpha", "alphb", "alphc"), so the edit
# twin sees cross-class ed=1 partners; D is far from everything.
_BASE_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_BASE_B = "alphb beta gamma delta epsilon zeta eta theta iota kappa"
_BASE_C = "alphc beta gamma delta epsilon zeta eta theta iota kappa"
_BASE_D = "omega psi chi phi upsilon tau sigma rho pi omicron"
# A high-Jaccard neighbor of A: one trailing token changes 2 of the 8
# 3-gram shingles -> J = 6/10 = 0.6, exactly at the >=0.60 threshold.
_NEAR_A = "alpha beta gamma delta epsilon zeta eta theta iota lambda"


def _dup_corpus(spark, tmp_path) -> str:
    """Materialize a documents.parquet with replica classes and symlink
    the remaining sf0.001 tables so the oracle's view registration
    (tests.oracle.run_oracle binds every table) still succeeds."""
    texts = (
        [_BASE_A] * 6      # class size 6 > m+1: exercises the slice
        + [_BASE_B] * 4
        + [_BASE_C] * 2
        + [_NEAR_A] * 2
        + [_BASE_D] * 1    # singleton: no within-class partners
    )
    rows = [
        (i, t, "en", "synthetic", len(t)) for i, t in enumerate(texts)
    ]
    sf = str(tmp_path / "dup_sf")
    os.makedirs(sf)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.toPandas().to_parquet(os.path.join(sf, "documents.parquet"))
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        os.symlink(
            f"/root/testdata/sf0.001/{name}.parquet",
            os.path.join(sf, f"{name}.parquet"),
        )
    return sf


@pytest.mark.parametrize(
    "name", ["dd_jaccard_topm_join", "dd_edit_topm_join"]
)
def test_capped_twin_matches_oracle_on_dup_dense_corpus(
    spark, tmp_path, name
):
    sf = _dup_corpus(spark, tmp_path)
    df = suite.QUERIES[name](spark, sf)
    compare(df, suite.ORACLES[name], sf)


def test_dup_corpus_exercises_both_branches(spark, tmp_path):
    """The synthetic corpus must produce BOTH within-class (jaccard
    1.0 / ed 0) and cross-class partners, and at least one document
    whose top-m mixes the two — otherwise the parametrized check above
    proves nothing the driver gate doesn't."""
    sf = _dup_corpus(spark, tmp_path)
    ed = suite.QUERIES["dd_edit_topm_join"](spark, sf).collect()
    eds = {(r["doc_id"], r["ed"]) for r in ed}
    docs_with_ed0 = {d for d, e in eds if e == 0}
    docs_with_ed1 = {d for d, e in eds if e == 1}
    assert docs_with_ed0 and docs_with_ed1
    # the C-class docs (ids 10, 11) have 1 within-class partner and
    # must fill the remaining top-m slots with cross-class ed=1 rows
    assert 10 in docs_with_ed0 and 10 in docs_with_ed1
    ja = suite.QUERIES["dd_jaccard_topm_join"](spark, sf).collect()
    jvals = {r["jaccard"] for r in ja}
    assert 1.0 in jvals and any(v < 1.0 for v in jvals)
