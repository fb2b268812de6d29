"""CLI — the reference's script entry points as subcommands.

| Reference | Here |
|---|---|
| ``python cv-csv.py``          | ``python -m covid_19_fl_spark ingest --cases-csv … --counties-json … --store …`` |
| ``python cv-stats.py``        | ``python -m covid_19_fl_spark stats --store …`` |
| ``python cv-county-stats.py`` | ``python -m covid_19_fl_spark county-stats --counties-json … --store …`` |
"""

from __future__ import annotations

import argparse

from . import pipelines
from .session import get_spark


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="covid_19_fl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="CSV case-line ingest → florida table (cv-csv.py)")
    ing.add_argument("--cases-csv", required=True)
    ing.add_argument("--counties-json", required=True)
    ing.add_argument("--store", required=True)

    st = sub.add_parser("stats", help="growth curve + rates + projection (cv-stats.py)")
    st.add_argument("--store", required=True)
    st.add_argument("--sim-days", type=int, default=14)

    cs = sub.add_parser("county-stats", help="top-5 county per-capita curves (cv-county-stats.py)")
    cs.add_argument("--counties-json", required=True)
    cs.add_argument("--store", required=True)
    cs.add_argument("--top-k", type=int, default=5)

    cu = sub.add_parser("curate", help="training-data curation: dedup -> filter -> decontaminate -> sample -> chunk")
    cu.add_argument("--docs", required=True, help="documents parquet (doc_id, text)")
    cu.add_argument("--benchmark", default=None, help="optional eval-set parquet to decontaminate against")
    cu.add_argument("--out", required=True, help="output dir for chunk parquet")
    cu.add_argument("--sample-pct", type=int, default=None)

    args = p.parse_args(argv)
    spark = get_spark("covid_19_fl_spark-cli")
    if args.cmd == "ingest":
        n = pipelines.run_csv_ingest(spark, args.cases_csv, args.counties_json, args.store)
        print(f"new_records={n}")
    elif args.cmd == "stats":
        pipelines.run_stats_pipeline(spark, args.store, args.sim_days)
        print("florida_growth + florida_growth_rates refreshed")
    elif args.cmd == "county-stats":
        pipelines.run_county_stats_pipeline(spark, args.counties_json, args.store, args.top_k)
        print("top_five_counties refreshed")
    elif args.cmd == "curate":
        from .llmops import curation

        bench_df = spark.read.parquet(args.benchmark) if args.benchmark else None
        stages = curation.curate(
            spark.read.parquet(args.docs),
            bench_df,
            curation.CurationConfig(sample_pct=args.sample_pct),
        )
        stages["chunks"].write.mode("overwrite").parquet(args.out)
        for r in curation.funnel_report(stages).orderBy("stage_order").collect():
            print(f"{r.stage}: {r.n_docs}")


if __name__ == "__main__":
    main()
