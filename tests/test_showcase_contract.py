"""Driver-contract lints for __spark_entry__.SHOWCASE — the rotation
is hand-edited every round, so pin the invariants that keep the
driver's bounded prefix meaningful (round-8 verdict ask #8: prefix,
ledger, and registry must never disagree)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

from covid_19_fl_spark import suite  # noqa: E402

# Names allowed in SHOWCASE while absent from this container's
# registry: optional-dependency gates (clean machine-visible skips).
GATED = {"mm_jpeg_dims", "st_tws_running_totals"}


def test_showcase_has_no_duplicates():
    assert len(entry.SHOWCASE) == len(set(entry.SHOWCASE))


def test_showcase_names_are_registered_or_gated():
    unknown = [
        n for n in entry.SHOWCASE if n not in suite.QUERIES and n not in GATED
    ]
    assert unknown == [], f"SHOWCASE names not in the registry: {unknown}"


def test_showcase_covers_full_registry():
    # _ordered() appends unlisted names, so coverage is not required
    # for correctness — but a registered query missing from SHOWCASE
    # means someone added an operator without updating the rotation
    # (the exact drift ask #8 guards against).
    missing = sorted(set(suite.QUERIES) - set(entry.SHOWCASE))
    assert missing == [], f"registered but not in SHOWCASE: {missing}"


def test_queries_and_oracles_align():
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert list(qs)[: len(os_)]  # both non-empty, ordered dicts
    assert set(os_) <= set(qs)
    # every registered query is oracled (the registry has had zero
    # rows-only entries since round 6 — keep it that way loudly)
    assert set(os_) == set(qs), sorted(set(qs) - set(os_))


def test_showcase_prefix_leads_with_backlog_and_debuts():
    # the driver attests ~45-50 in order; the round-9 window must keep
    # the never-attested backlog inside the first 31 registered names
    registered_prefix = [n for n in entry.SHOWCASE if n in suite.QUERIES][:31]
    for name in (
        "x_time_travel_read",
        "x_time_travel_diff",
        "x_time_travel_vacuum",
        "mm_jpeg_header",
        "x_bucketed_join_agg",
        "x_zorder_layout",
        "cur_corpus_manifest",
        "x_year_over_year",
    ):
        assert name in registered_prefix, name
